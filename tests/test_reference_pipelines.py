"""Run the reference's OWN JSON pipe definitions through our DAG
compiler against its OWN data fixtures, asserting its functional-test
goldens (tests/functional/test_basics.py).

Covered here (RSS sources parse natively via from_xml):
  * pipe_2de0e... ("simplest"): fetch(rss) → output; 17 items, first
    title golden (test_basics.py:306-315)
  * pipe_06c4c44... ("tail"): fetch(rss) → sort(title DESC) →
    tail(count=input terminal, default 5); 5 items, first title
    contains golden (test_basics.py:401-406)
"""

import json
import os

import pytest

from riko_spark.plans.dag import build_pipeline

REF = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(f"{REF}/tests/pipelines"), reason="reference not available"
)


@pytest.fixture(autouse=True)
def _data_root(monkeypatch):
    monkeypatch.setenv("RIKO_SPARK_DATA_ROOT", REF)


def _pipe(name):
    with open(f"{REF}/tests/pipelines/{name}.json") as f:
        return json.load(f)


def test_simplest_rss_pipeline(spark):
    out = build_pipeline(spark, _pipe("pipe_2de0e4517ed76082dcddf66f7b218057"))
    rows = out.collect()
    assert len(rows) == 17
    assert rows[0]["title"].startswith("Running “Native” Data Wrangling Applicati")


def test_tail_pipeline_with_input_terminal(spark):
    out = build_pipeline(
        spark, _pipe("pipe_06c4c44316efb0f5f16e4e7fa4589ba2"),
        order_by=None,
    )
    rows = out.collect()
    assert len(rows) == 5
    # sort title DESC then tail(5): riko emits the 5 smallest titles in
    # ascending position of the DESC order; the golden checks items[0]
    assert any("American woman is being held hostage" in r["title"] for r in rows)


def test_reverse_truncate_pipeline(spark):
    """pipe_58a53...: fetch(2 rss urls) + fetch(urlbuilder terminal url)
    → union → sort(title ASC) → truncate(3) → reverse; golden: 3 items,
    titles strictly descending (test_basics.py:389-398)."""
    out = build_pipeline(spark, _pipe("pipe_58a53262da5a095fe7a0d6d905cc4db6"))
    rows = out.collect()
    assert len(rows) == 3
    titles = [r["title"] for r in rows]
    assert titles == sorted(titles, reverse=True)


def test_itembuilder_pipeline_nested_paths(spark):
    """pipe_b9628...: two source itembuilders with dotted keys (nested
    structs) + a strconcat terminal → union; goldens at
    test_basics.py:409-424 (keys case-insensitive per riko DotDict)."""
    out = build_pipeline(spark, _pipe("pipe_b96287458de001ad62a637095df33ad5"))
    rows = [r.asDict(recursive=True) for r in out.collect()]
    assert len(rows) == 2
    first = next(r for r in rows if r["attr1"] == "val1")
    second = next(r for r in rows if r["attr1"] == "VAL1")
    assert first["attrpath"] == {"attr2": "val2", "attr3": "extVal"}
    assert first["longpath"] == {"attrpath": {"attr3": "val3"}}
    assert second["attrpath"]["attr2"] == "VAL2"


def test_csv_pipeline_with_loops(spark):
    """pipe_UuvYtuMe...: csv(col_names) → filter(Member contains input
    terminal 'Lancaster') → loop(rename copy Member→title) →
    loop(strconcat assign description) → loop(strconcat assign title);
    golden: exactly 1 item, title/description exact
    (test_basics.py:467-517)."""
    out = build_pipeline(spark, _pipe("pipe_UuvYtuMe3hGDsmRgPm7D0g"))
    rows = [r.asDict() for r in out.collect()]
    assert len(rows) == 1
    item = rows[0]
    assert item["Member"] == "Lancaster"
    assert item["firstName"] == "Mr Mark"
    assert item["title"] == "Mr Mark Lancaster"
    assert item["description"].startswith(
        "Total allowances claimed, inc travel: 151619<br>"
    )
    assert item["description"].endswith("Staffing Costs: 88283")
    assert item["StaffingCosts"] == "88283"


def test_forever_pipeline(spark):
    """pipe_forever: forever driver source bounded by truncate(3);
    golden: 3 x {'forever': True} (test_basics.py:333-340)."""
    out = build_pipeline(
        spark, _pipe("pipe_forever"), order_by=["event_seq"], streaming=False
    )
    rows = [r.asDict() for r in out.drop("event_seq").collect()]
    assert rows == [{"forever": True}] * 3


def test_tail_pipeline_count_override(spark):
    out = build_pipeline(
        spark, _pipe("pipe_06c4c44316efb0f5f16e4e7fa4589ba2"),
        inputs={"numberinput1": 3},
    )
    assert len(out.collect()) == 3


def test_xpath_cnn_rss_pipeline(spark):
    """pipe_a08134...: xpathfetchpage('//a[img]' over messy CNN html,
    html5-lite parser) → loop(strconcat description) → loop(rename
    href→link) → loop(rssitembuilder); goldens at
    test_basics.py:713-739 — 94 items, first item exact."""
    out = build_pipeline(spark, _pipe("pipe_a08134746e30a6dd3a7cb3c0cf098692"))
    rows = [r.asDict(recursive=True) for r in out.collect()]
    assert len(rows) == 94
    url = "i.cdn.turner.com/cnn/.e/img/3.0/global/header/intl/CNNi_Logo_new.png"
    first = rows[0]
    assert first["link"] == "/"
    assert first["description"] == f'<img src="http://{url}">'
    assert first["y_title"] == "CNN"
    assert first["media_content"] == {
        "height": "65", "type": "", "url": f"http://{url}", "width": "213",
    }
    assert first["media_thumbnail"] == {"height": "", "url": "", "width": ""}
    assert first["author"] == "" and first["y_id"] == "" and first["pubDate"] == ""


def test_xpath_sciencedaily_doctest(spark):
    """riko/modules/xpathfetchpage.py doctest: /html/head/title over
    sciencedaily.html -> 'Help Page -- ScienceDaily'."""
    from riko_spark.operators.webtext import xpath_op

    out = xpath_op(None, {"url": "file://riko/data/sciencedaily.html",
                          "xpath": "/html/head/title"}, spark=spark)
    got = [r.asDict() for r in out.collect()]
    assert got == [{"content": "Help Page -- ScienceDaily"}]


def test_reference_pipelines_through_codegen(spark):
    """Compile two of the reference's own pipe defs with the code
    generator and execute the generated functions — results must match
    the interpreter (covers codegen over real-world defs with loops,
    terminal wiring, and the xpath source)."""
    from riko_spark.plans.codegen import compile_pipe

    for name, n_rows in (
        ("pipe_UuvYtuMe3hGDsmRgPm7D0g", 1),       # csv + input terminal + loops
        ("pipe_a08134746e30a6dd3a7cb3c0cf098692", 94),  # xpath + 3 loops
    ):
        pd = _pipe(name)
        fn, _src = compile_pipe(pd, "ref")
        gen = fn(spark)
        interp = build_pipeline(spark, pd)
        got = sorted(map(str, (r.asDict(recursive=True) for r in gen.collect())))
        want = sorted(map(str, (r.asDict(recursive=True) for r in interp.collect())))
        assert len(got) == n_rows and got == want, name


def test_loops_fetchdata_per_row_as_fetch_join(spark):
    """The reference's test_loops_1 (pipe_125e9fe8...: itembuilder →
    loop(urlbuilder) → loop(fetchdata PER ROW, count=first, assign
    'info') → rename info.user_view_type → description; goldens at
    tests/functional/test_basics.py:134-143) re-expressed in the
    canonical data-parallel shape: each DISTINCT url fetched once into
    a broadcast dimension, joined back on the url column (fetch_join).
    Same rows, IO per distinct url instead of per item."""
    import pyspark.sql.functions as F

    from riko_spark.operators.structure import itembuilder_op, rename_op, urlbuilder_op
    from riko_spark.operators.webtext import fetch_join_op

    src = itembuilder_op(None, {"attrs": [{"key": "title", "value": "defunkt"}]},
                         spark=spark)
    with_url = urlbuilder_op(
        src,
        {"base": "api.github.com_search_users",
         "param": [{"key": "q", "subkey": "title"}],
         "ext": "json"},
        assign="api",
    )
    assert with_url.first()["api"] == "api.github.com_search_users_q=defunkt.json"
    fetched = fetch_join_op(
        with_url, {"url_field": "api", "path": "items",
                   "assign": "info", "count": "first"},
    )
    out = rename_op(fetched, {"rule": [
        {"field": "info.user_view_type", "newval": "description", "copy": True},
    ]})
    rows = out.collect()
    assert len(rows) == 1  # test_basics.py:138 expects 1 item
    item = rows[0]
    assert item["info"]["login"] == "defunkt"
    assert item["info"]["user_view_type"] == "public"
    assert item["description"] == "public"
