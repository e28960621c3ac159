"""Round-9 optimization parity tests.

Each optimization that changed an operator's internals gets a focused
check that the NEW physical shape computes the OLD answers:

* ``uniq`` first-seen via min_by aggregation (asc spines) must equal
  the row_number-window fallback (mixed spines) row for row.
* ``robots_gate``'s native prefix/equality matching (star-free rules)
  and the prefix-guarded LIKE (wildcard rules) must reproduce RFC 9309
  matching for paths containing the LIKE metacharacters the old code
  escaped (%, _, backslash) plus '*' wildcards and '$' anchors.
* ``sequence_match``'s stacked-window chain resolution must produce
  the documented earliest-completion matches for a 4-step pattern
  (nesting depth > 1, which the 3-step oracle query does not reach).
* 64-bit hash-chain window keys (span_dedupe) must agree with hashing
  the joined shingle string on equality structure.
"""

import pyspark.sql.functions as F

from riko_spark.operators.setops import uniq_op
from riko_spark.operators.robots import robots_gate_op, robots_rules_op
from riko_spark.streaming.cep import sequence_match


def test_uniq_minby_equals_window_fallback(spark):
    rows = [("a", 3, 30), ("b", 1, 10), ("a", 1, 11), ("c", 2, 20),
            ("b", 4, 40), (None, 5, 50), ("c", 0, 5), (None, 6, 60)]
    df = spark.createDataFrame(rows, "id string, seq long, v long")
    fast = uniq_op(df, {"uniq_key": "id"}, order_by=["seq"])
    # the desc-specced spine takes the window fallback; seq desc over
    # NEGATED values orders identically to seq asc, so the kept rows
    # must match the min_by path exactly
    slow = uniq_op(df.withColumn("negseq", -F.col("seq")),
                   {"uniq_key": "id"}, order_by=["negseq desc"]).drop("negseq")
    assert set(map(tuple, fast.collect())) == set(map(tuple, slow.collect()))
    got = {r["id"]: r["seq"] for r in fast.collect()}
    assert got == {"a": 1, "b": 1, "c": 0, None: 5}


def test_robots_gate_metacharacter_and_wildcard_paths(spark):
    robots = spark.createDataFrame(
        [("h.ex.com",
          "User-agent: *\n"
          "Disallow: /100%_off\n"          # literal % and _ in the path
          "Disallow: /a*b$\n"              # wildcard + anchor
          "Allow: /a*bc\n"                 # wildcard prefix rule
          "Disallow: /data\\raw\n")],      # literal backslash
        "host string, content string")
    rules = robots_rules_op(robots)
    urls = spark.createDataFrame(
        [(1, "https://h.ex.com/100%_off/sale"),   # literal-% prefix: deny
         (2, "https://h.ex.com/100Xyoff/sale"),   # % is NOT a wildcard: allow
         (3, "https://h.ex.com/aXXb"),            # matches /a*b$ anchored: deny
         (4, "https://h.ex.com/aXXbc"),           # /a*bc (len 5) beats /a*b$ (len 4): allow
         (5, "https://h.ex.com/aXXbX"),           # anchor: does not end in b: allow
         (6, "https://h.ex.com/data\\raw/x"),     # literal backslash: deny
         (7, "https://h.ex.com/other")],          # nothing matches: allow
        "doc_id long, url string")
    got = {r["doc_id"]: r["allowed"]
           for r in robots_gate_op(urls, rules=rules, agent="bot").collect()}
    assert got == {1: False, 2: True, 3: False, 4: True, 5: True,
                   6: False, 7: True}


def test_sequence_match_four_steps_stacked_windows(spark):
    # a -> b -> c -> d, two users; u1 completes twice from different
    # anchors (earliest-completion per anchor), u2's chain breaks at c
    rows = [
        (1, 100, "a", 1), (1, 200, "b", 2), (1, 300, "a", 3),
        (1, 400, "c", 4), (1, 500, "b", 5), (1, 600, "c", 6),
        (1, 700, "d", 7),
        (2, 100, "a", 11), (2, 200, "b", 12), (2, 900, "d", 13),
    ]
    df = spark.createDataFrame(
        [(u, F"2024-01-01 00:{m // 60:02d}:{m % 60:02d}", t, e)
         for u, m, t, e in rows],
        "user_id long, ts string, event_type string, event_id long",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = sequence_match(df, ["a", "b", "c", "d"], within="2 hours")
    got = sorted(
        (r["user_id"], r["step0_id"], r["step1_id"], r["step2_id"],
         r["step3_id"]) for r in out.collect())
    # anchor id=1: b=2, then first c after b is 4, then d=7
    # anchor id=3: b=5, c=6, d=7; u2 never reaches c
    assert got == [(1, 1, 2, 4, 7), (1, 3, 5, 6, 7)]


def test_word_shingle_hashes_equality_structure(spark):
    from riko_spark.operators.textstats import (
        word_shingle_hashes,
        word_shingles,
    )

    df = spark.createDataFrame(
        [(1, "w x y z w x y z"), (2, "a w x y q"), (3, "one two")],
        "doc_id long, text string")
    toks = F.filter(F.split(F.col("text"), r"\s+"), lambda x: x != F.lit(""))
    both = df.select(
        "doc_id",
        word_shingle_hashes(toks, 3).alias("hs"),
        F.transform(word_shingles(toks, 3), lambda s: F.xxhash64(s)).alias("ss"),
    ).collect()
    for r in both:
        hs, ss = r["hs"], r["ss"]
        assert len(hs) == len(ss)
        # identical equality structure: positions agree on equal/unequal
        for i in range(len(hs)):
            for j in range(len(hs)):
                assert (hs[i] == hs[j]) == (ss[i] == ss[j])
