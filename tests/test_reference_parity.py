"""End-to-end parity against the reference's own data + documented
golden outputs.

Flow A (riko/collections.py:5-21 doctest):
    fetchdata(gigs.json, 'value.items') → sort(title)
    → tokenizer('<br>', field=description, emit) → count  == 169

Flow B (tests/pypipelines/pipe_gigs.py + functional golden at
tests/functional/test_basics.py:164-173):
    fetchdata → uniq(link) → filter(title !contains 'php')
    → sort(pubDate desc)  == 49 items, last item title/link fixed.
"""

import os

import pytest

from riko_spark.plans.flow import Flow
from riko_spark.operators.webtext import fetchdata_op

GIGS = "/root/reference/riko/data/gigs.json"

pytestmark = pytest.mark.skipif(
    not os.path.exists(GIGS), reason="reference data not available"
)


@pytest.fixture(scope="module")
def gigs(spark):
    return fetchdata_op(None, {"url": GIGS, "path": "value.items"}, spark=spark).cache()


def test_gigs_wordcount_169(spark, gigs):
    # sort(title) is order-only — irrelevant to the count, kept for shape
    out = (
        Flow(gigs)
        .sort({"rule": {"field": "title"}})
        .tokenizer({"delimiter": "<br>"}, field="description", emit=True)
        .count()
    )
    assert [r.asDict() for r in out.df.collect()] == [{"count": 169}]


def test_gigs_pipeline_49_rows_and_last_item(spark, gigs):
    out = (
        Flow(gigs, order_by=None)
        .uniq({"uniq_key": "link"})
        .filter({
            "combine": "or",
            "permit": False,
            "rule": [{"field": "title", "op": "contains", "value": "php"}],
        })
        .sort({"rule": [{"field": "pubDate", "dir": "DESC"}]})
    )
    rows = out.df.select("title", "link", "pubDate").collect()
    assert len(rows) == 49
    last = rows[-1]
    assert last["title"] == "Educational Android App"
    assert last["link"] == "http://www.guru.com/jobs/educational-android-app/1058980"
