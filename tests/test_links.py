"""extract_links — hand-computed goldens for anchor extraction,
cleanup and reference resolution."""

from __future__ import annotations

import pytest

from riko_spark.operators.webtext import extract_links_op

HTML = (
    '<html><body>'
    '<a href="https://b.com/x">Plain</a>'
    '<a class="k" href="/root/p">Nested <b>bold</b>\n  text</a>'
    '<a href="//cdn.net/a.js">proto</a>'
    '<a href="rel/path">relative</a>'
    '<a href="mailto:x@y.z">mail</a>'
    '<a name="no-href">skip me</a>'
    "<a href='single.html'>single-quoted skipped (documented)</a>"
    '<a href="HTTP://UP.COM/Q">caps scheme</a>'
    '</body></html>'
)


@pytest.fixture(scope="module")
def out(spark):
    df = spark.createDataFrame(
        [(1, "https://src.ex.com/page", HTML)],
        ["doc_id", "url", "html"])
    return extract_links_op(df).collect()


def test_extraction_and_cleanup(out):
    got = [(r["href"], r["anchor"]) for r in out]
    assert got == [
        ("https://b.com/x", "Plain"),
        ("/root/p", "Nested bold text"),   # tags stripped, ws folded
        ("//cdn.net/a.js", "proto"),
        ("rel/path", "relative"),
        ("mailto:x@y.z", "mail"),
        ("HTTP://UP.COM/Q", "caps scheme"),
    ]


def test_resolution(out):
    res = {r["href"]: r["resolved"] for r in out}
    assert res["https://b.com/x"] == "https://b.com/x"
    assert res["/root/p"] == "https://src.ex.com/root/p"
    assert res["//cdn.net/a.js"] == "https://cdn.net/a.js"
    assert res["rel/path"] is None
    assert res["mailto:x@y.z"] is None
    assert res["HTTP://UP.COM/Q"] == "HTTP://UP.COM/Q"


def test_empty_and_null_pages(spark):
    df = spark.createDataFrame(
        [(1, "https://s.com/", None), (2, "https://s.com/", "<p>no links</p>")],
        ["doc_id", "url", "html"])
    assert extract_links_op(df).count() == 0
