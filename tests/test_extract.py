"""Byte-identity invariant: the distributed pandas-UDF extraction must
equal the reference extraction per url, byte for byte (BASELINE.json
``input_hint``)."""

import hashlib

import pyspark.sql.functions as F
import pytest

from riko_spark.plans.flow import Flow
from riko_spark.sources.pages import generate_pages, pages_fixture
from riko_spark.textref import extract_text, find_links, get_string, get_text


def test_get_string_reference_semantics():
    # mirrors riko/modules/fetchpage.py:45-53 quirks
    assert get_string("a<t>X</t>b", "<t>", "</t>") == "X"
    assert get_string("abcdef", "", "") == "abcdef"
    assert get_string("a<t>tail", "<t>", "</t>") == "tail"  # missing end


def test_get_text_detag_and_entity_drop():
    html = "<p>one &amp; two</p><a href='x'>three</a>"
    # each text node followed by \n; entity refs dropped (convert_charrefs=False)
    assert get_text(html) == "one \n two\nthree\n"


def test_extract_strip_and_token():
    html = b"<html><body> a<br/>b </body></html>"
    assert extract_text(html) == ["a\nb"]
    # reference split keeps the trailing empty piece (strip of ' \n' tail)
    assert extract_text(html, token="\n") == ["a", "b", ""]


def test_find_links_rss_only():
    html = (
        '<link rel="alternate" type="application/rss+xml" href="https://x/f.xml"/>'
        '<a href="https://y/page">z</a>'
    )
    assert find_links(html) == ["https://x/f.xml"]
    assert find_links(html, rss_only=False) == ["https://x/f.xml", "https://y/page"]


def test_pages_generator_deterministic():
    a = generate_pages(50, seed=7)
    b = generate_pages(50, seed=7)
    assert a.equals(b)
    assert a.column_names == ["url", "warc_ts", "html", "text", "lang"]


def test_extract_byte_identity(spark):
    """Distributed extraction == single-node reference, per url."""
    path = pages_fixture(n=500)
    df = spark.read.parquet(path)
    extracted = Flow(df).extract(None, field="html", assign="extracted").df
    got = {
        r["url"]: (r["extracted"], r["text"])
        for r in extracted.select("url", "extracted", "text").collect()
    }
    assert len(got) == 500
    for url, (ext, truth) in got.items():
        assert ext == truth, f"extraction diverged for {url}"
    # hash-level check (bytes, not just str equality)
    h = lambda s: hashlib.sha256(s.encode()).hexdigest()  # noqa: E731
    assert all(h(e) == h(t) for e, t in got.values())


def test_extract_plan_is_single_stage(spark):
    """The extract op must not introduce a shuffle."""
    path = pages_fixture(n=500)
    df = spark.read.parquet(path)
    plan = Flow(df).extract(None).df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_feed_discovery(spark):
    path = pages_fixture(n=100)
    df = spark.read.parquet(path)
    links = Flow(df).feedautodiscovery(None).df
    got = [r["link"] for r in links.collect()]
    assert len(got) == 100  # one RSS link per generated page
    assert all(l.endswith(".xml") for l in got)


def test_xpath_per_row_html5(spark):
    """Per-row html5-lite xpath over an html column (Arrow-batched):
    one JSON item per match."""
    import json

    from riko_spark.operators.webtext import xpath_op

    df = spark.createDataFrame(
        [(1, "<div><a href='/x'><img src='a.png'></a><a href='/y'>no img</a></div>")],
        "id long, html string",
    )
    out = xpath_op(df, {"xpath": "//a[img]", "html5": True}, field="html")
    items = [json.loads(r["content"]) for r in out.collect()]
    assert items == [{"href": "/x", "img": {"src": "a.png"}}]


def test_fast_detag_byte_identical_to_parser():
    """The regex fast path must be byte-identical to the HTMLParser
    ground truth on everything it accepts, and must decline (None) on
    the constructs whose parser behavior a flat split cannot mirror."""
    from riko_spark.functions.text import _BatchTextParser, _fast_detag

    parser = _BatchTextParser()

    def slow(s):
        parser.reset()
        parser.parts = []
        parser.feed(s)
        return "".join(p + "\n" for p in parser.parts).strip()

    must_fallback = [
        "<p>a & b</p>",                 # bare &
        "<p>x &amp y</p>",              # unterminated entity
        "<script>if (a<b) x();</script><p>t</p>",  # CDATA content model
        "<style>a<b{}</style>hello",
        "<!DOCTYPE html><p>z</p>",      # declaration
        "<![CDATA[raw<>]]><p>q</p>",
        "</p title='a>b'>weird",        # quotes in END tag: parser ignores them
        "<p>end &",
    ]
    for case in must_fallback:
        assert _fast_detag(case) is None, case

    fast_ok = [
        "text &amp; more", "&#65;&#x41; mid", "a &frac12; b",
        "<!-- c -- > still comment --><b>k</b>",   # --\\s*> comment close
        "<p title='a>b'>tricky</p>",               # quoted '>' in START tag
        "<p>unterminated <tag",                     # leftover '<' guard
        "<p a=b\"c>mix</p>",                        # guard: quote mid-tag
        "<1notag>data</p>", "<? pi ?>txt", "<p/>self", "< p>spaced",
        "<a href='x'>l</a>&gt;<i>e</i>", "<p>multi &amp;&amp; amp</p>",
        "<em a='1' b=\"2\" c=d>attrs</em>", "<p>ok</p>\r\nline",
    ]
    for case in fast_ok:
        got = _fast_detag(case)
        if got is not None:
            assert got == slow(case), case


def test_extract_token_split(spark):
    """fetchpage conf.token: detagged text splits into one stripped
    item per piece, empties kept (riko/modules/fetchpage.py:99-100)."""
    from riko_spark.operators.webtext import extract_op

    html = "<html><body><p>alpha | beta</p><p> | gamma</p></body></html>"
    df = spark.createDataFrame([(1, html)], "id long, html string")
    out = extract_op(df, {"token": "|"}, emit=True)
    got = [r["content"] for r in out.collect()]
    # detagged text = 'alpha |  beta\n |  gamma' -> split on '|' -> strip
    assert got == ["alpha", "beta", "gamma"]


def test_native_extract_col_byte_identity(spark):
    """extract_text_col (JVM-native variant) must equal the stored
    ground-truth text for fixture pages and the HTMLParser result on
    adversarial constructs (fallback path included)."""
    import pyspark.sql.functions as F

    from riko_spark.functions.text import _BatchTextParser, extract_text_col
    from riko_spark.sources.pages import pages_fixture
    from riko_spark.textref import get_string

    df = spark.read.parquet(pages_fixture(n=1_000))
    bad = df.select(
        (extract_text_col(F.col("html")) != F.col("text")).alias("m")
    ).filter("m").count()
    assert bad == 0

    cases = [
        "<p>a & b</p>", "<script>if (a<b) x();</script><p>t</p>",
        "<!-- c -- > still comment --><b>k</b>", "<p title='a>b'>tricky</p>",
        "x</b> <i>y", "<b></b><i></i>between", "  lead <b>mid</b> trail  ",
        "<p>multi &amp;&amp; amp</p>", "<1notag>data</p>", "<p>end &",
    ]
    wrapped = [f"<body>{c}</body>" for c in cases]
    cdf = spark.createDataFrame([(i, c) for i, c in enumerate(wrapped)],
                                "i long, html string")
    got = {r["i"]: r["n"] for r in
           cdf.select("i", extract_text_col(F.col("html")).alias("n")).collect()}
    parser = _BatchTextParser()
    for i, c in enumerate(wrapped):
        sliced = get_string(c, "<body>", "</body>")
        parser.reset()
        parser.parts = []
        parser.feed(sliced)
        want = "".join(p + "\n" for p in parser.parts).strip()
        assert got[i] == want, cases[i]
