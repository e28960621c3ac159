"""robots.txt parse + gate (RFC 9309) — hand-computed goldens for
grouping, precedence, wildcards, anchors, and agent selection."""

from __future__ import annotations

import pytest

from riko_spark.operators.robots import robots_gate_op, robots_rules_op

ROBOTS = {
    "a.com": "\n".join([
        "# site a",
        "User-agent: *",
        "Disallow: /private/",
        "Allow: /private/public$",
        "",
        "User-agent: badbot",
        "Disallow: /",
    ]),
    "b.com": "\n".join([
        "User-agent: mybot",
        "User-agent: otherbot",
        "Disallow: /tmp/*",
        "Allow: /tmp/keep",
        "Crawl-delay: 10",          # ignored, does not break the group
        "Sitemap: https://b.com/map.xml",
    ]),
    "c.com": "\n".join([
        "User-agent: *",
        "Disallow:",                 # empty path: allow-all, dropped
    ]),
    "d.com": "",                     # no robots body at all
    "e.com": "\n".join([
        "User-agent: *",
        "Disallow: /a_b/%x/",        # LIKE metachars must be literal
        "Disallow: /star/*/end$",
    ]),
}


@pytest.fixture(scope="module")
def parsed(spark):
    df = spark.createDataFrame(
        list(ROBOTS.items()), ["host", "content"])
    rules = robots_rules_op(df)
    rules.cache()
    return rules


def test_parse_groups_and_rules(parsed):
    rows = {(r["host"], r["agent"], r["rule"], r["path"])
            for r in parsed.collect()}
    assert rows == {
        ("a.com", "*", "disallow", "/private/"),
        ("a.com", "*", "allow", "/private/public$"),
        ("a.com", "badbot", "disallow", "/"),
        ("b.com", "mybot", "disallow", "/tmp/*"),
        ("b.com", "mybot", "allow", "/tmp/keep"),
        ("b.com", "otherbot", "disallow", "/tmp/*"),
        ("b.com", "otherbot", "allow", "/tmp/keep"),
        ("e.com", "*", "disallow", "/a_b/%x/"),
        ("e.com", "*", "disallow", "/star/*/end$"),
    }


URLS = [
    # a.com via '*' group (mybot has no group there)
    (0, "https://a.com/ok", True),
    (1, "https://a.com/private/x", False),
    (2, "https://a.com/private/public", True),    # anchored allow
    (3, "https://a.com/private/public2", False),  # anchor excludes
    # b.com: mybot group
    (4, "https://b.com/tmp/x", False),
    (5, "https://b.com/tmp/keep", True),          # longer allow wins
    (6, "https://b.com/tmp/keeper", True),        # prefix of allow
    (7, "https://b.com/other", True),
    # c.com: empty disallow dropped; d.com: no rules
    (8, "https://c.com/anything", True),
    (9, "https://d.com/anything", True),
    # e.com: LIKE metachars literal; wildcard + anchor combo
    (10, "https://e.com/a_b/%x/q", False),
    (11, "https://e.com/aXb/Yx/q", True),         # _ and % not wild
    (12, "https://e.com/star/zzz/end", False),
    (13, "https://e.com/star/zzz/end2", True),    # $ anchor
    # no path -> '/'; badbot-style root rule does not apply to mybot
    (14, "https://a.com", True),
]


def test_gate_mybot(parsed, spark):
    urls = spark.createDataFrame(
        [(i, u) for i, u, _ in URLS], ["doc_id", "url"])
    got = {r["doc_id"]: r["allowed"]
           for r in robots_gate_op(urls, rules=parsed,
                                   agent="mybot").collect()}
    for i, u, want in URLS:
        assert got[i] is want, (u, got[i], want)


def test_gate_badbot_exact_group_beats_star(parsed, spark):
    urls = spark.createDataFrame(
        [(0, "https://a.com/anything"), (1, "https://a.com/private/public")],
        ["doc_id", "url"])
    got = {r["doc_id"]: r["allowed"]
           for r in robots_gate_op(urls, rules=parsed,
                                   agent="badbot").collect()}
    # badbot's exact group (Disallow: /) replaces the '*' group
    # entirely — even the '*' group's allow rule no longer applies
    assert got == {0: False, 1: False}


def test_gate_reports_winning_rule(parsed, spark):
    urls = spark.createDataFrame(
        [(0, "https://a.com/private/x")], ["doc_id", "url"])
    row = robots_gate_op(urls, rules=parsed, agent="mybot").collect()[0]
    assert (row["rule"], row["path"]) == ("disallow", "/private/")
    urls2 = spark.createDataFrame(
        [(0, "https://d.com/x")], ["doc_id", "url"])
    row2 = robots_gate_op(urls2, rules=parsed, agent="mybot").collect()[0]
    assert row2["allowed"] is True and row2["rule"] is None


def test_gate_requires_rules(spark):
    urls = spark.createDataFrame([(0, "https://a.com/")],
                                 ["doc_id", "url"])
    with pytest.raises(ValueError):
        robots_gate_op(urls)


def test_sitemap_urls_goldens(spark):
    from riko_spark.operators.robots import sitemap_urls_op

    xml = (
        '<?xml version="1.0"?><urlset>'
        '<url><loc>https://s.com/a?x=1&amp;y=&lt;2&gt;</loc>'
        '<lastmod>2025-01-02</lastmod><changefreq>daily</changefreq>'
        '<priority>0.8</priority></url>'
        '<url>\n  <loc>\n    https://s.com/b\n  </loc></url>'
        '<url><priority>0.5</priority></url>'      # loc-less: dropped
        '<url><loc>https://s.com/c</loc>'
        '<priority>high</priority></url>'          # malformed priority
        '</urlset>'
    )
    idx = ('<sitemapindex><sitemap><loc>https://s.com/sm1.xml</loc>'
           '<lastmod>2025-02-03</lastmod></sitemap></sitemapindex>')
    df = spark.createDataFrame(
        [("s.com", xml), ("i.com", idx), ("e.com", None)],
        ["host", "content"])
    rows = {(r["host"], r["kind"], r["loc"]):
            (r["lastmod"], r["changefreq"], r["priority"])
            for r in sitemap_urls_op(df).collect()}
    assert rows == {
        ("s.com", "url", "https://s.com/a?x=1&y=<2>"):
            ("2025-01-02", "daily", 0.8),
        ("s.com", "url", "https://s.com/b"): (None, None, None),
        ("s.com", "url", "https://s.com/c"): (None, None, None),
        ("i.com", "sitemap", "https://s.com/sm1.xml"):
            ("2025-02-03", None, None),
    }


def test_gate_plan_shape(parsed, spark):
    # scale contract: both the agent-selection probe and the rules
    # table reach the URLs as broadcasts; the only exchange partitions
    # by the URL id for the winner window
    urls = spark.createDataFrame(
        [(i, f"https://a.com/p{i}") for i in range(10)],
        ["doc_id", "url"])
    plan = robots_gate_op(urls, rules=parsed, agent="mybot") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    # the rules x urls match itself must never be a shuffle join —
    # the only non-broadcast join is the winner join-back on the id
    # (whose exchange the window already created); so at most one
    # sort-merge join in the whole plan
    assert plan.count("SortMergeJoin") <= 1
