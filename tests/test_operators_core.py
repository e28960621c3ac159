"""Golden tests for the core operator set.

Inputs/expected outputs are ported from the reference module doctests
(SURVEY.md §5.1): filter (riko/modules/filter.py:314-326), sort
multi-rule tie-break (sort.py:227-233), count grouping
(count.py:156-165), truncate (truncate.py:135-143), union
(union.py:133-139), join (join.py:195-217), tokenizer
(tokenizer.py:160-167), uniq, tail, reverse, sum.
"""

from decimal import Decimal

import pytest

from riko_spark.plans.flow import Flow
from tests.conftest import bag, rows


@pytest.fixture()
def kv(spark):
    # riko doctest stream: ({'x': x} for x in range(5)) with a spine
    return spark.createDataFrame([{"x": x, "event_seq": x} for x in range(5)])


def flow(df, order=("event_seq",)):
    return Flow(df, order_by=list(order))


# ------------------------------------------------------------- filter

def test_filter_atleast(kv):
    # riko/modules/filter.py:322-326: rule x >= 3 -> [{'x': 3}, {'x': 4}]
    out = flow(kv).filter({"rule": [{"field": "x", "op": "atleast", "value": 3}]})
    assert [r["x"] for r in rows(out.df.orderBy("x"))] == [3, 4]


def test_filter_contains_case_insensitive(spark):
    df = spark.createDataFrame(
        [{"title": "Google", "event_seq": 0}, {"title": "bing", "event_seq": 1}]
    )
    out = flow(df).filter({"rule": [{"field": "title", "op": "contains", "value": "GOO"}]})
    assert [r["title"] for r in rows(out.df)] == ["Google"]


def test_filter_contains_null_x_blocks(spark):
    # riko: 'x and y.lower() in x.lower()' -> falsy x never matches
    df = spark.createDataFrame([("a", 0), (None, 1)], "title string, event_seq long")
    permit = flow(df).filter({"rule": [{"field": "title", "op": "contains", "value": "a"}]})
    assert [r["title"] for r in rows(permit.df)] == ["a"]
    block = flow(df).filter(
        {"rule": [{"field": "title", "op": "doesnotcontain", "value": "z"}]}
    )
    # doesnotcontain also requires truthy x
    assert [r["title"] for r in rows(block.df)] == ["a"]


def test_filter_combine_or_and_permit_false(kv):
    conf = {
        "rule": [
            {"field": "x", "op": "is", "value": 0},
            {"field": "x", "op": "atleast", "value": 4},
        ],
        "combine": "or",
        "permit": False,
    }
    out = flow(kv).filter(conf)
    assert [r["x"] for r in rows(out.df.orderBy("x"))] == [1, 2, 3]


def test_filter_matches_regex(spark):
    df = spark.createDataFrame([{"t": "hello world", "event_seq": 0},
                                {"t": "goodbye", "event_seq": 1}])
    out = flow(df).filter({"rule": [{"field": "t", "op": "matches", "value": r"^h.*d$"}]})
    assert [r["t"] for r in rows(out.df)] == ["hello world"]


def test_filter_date_before(spark):
    df = spark.createDataFrame(
        [{"d": "2026-01-01", "event_seq": 0}, {"d": "2026-06-01", "event_seq": 1}]
    )
    out = flow(df).filter({"rule": [{"field": "d", "op": "before", "value": "2026-03-01"}]})
    assert [r["d"] for r in rows(out.df)] == ["2026-01-01"]


def test_filter_stop(kv):
    # stop=True: stream ends at first blocked row (riko filter.py:213-214)
    conf = {"rule": [{"field": "x", "op": "isnot", "value": 3}], "stop": True}
    out = flow(kv).filter(conf)
    assert [r["x"] for r in rows(out.df.orderBy("x"))] == [0, 1, 2]


def test_filter_truthy_falsy(spark):
    df = spark.createDataFrame(
        [("", 0), ("a", 1), (None, 2)], "t string, event_seq long"
    )
    assert [r["t"] for r in rows(flow(df).filter({"rule": [{"field": "t", "op": "truthy"}]}).df)] == ["a"]
    assert sorted(
        r["event_seq"] for r in rows(flow(df).filter({"rule": [{"field": "t", "op": "falsy"}]}).df)
    ) == [0, 2]


# --------------------------------------------------------------- sort

def test_sort_multi_rule_tiebreak(spark):
    # riko/modules/sort.py:227-233: primary rank asc, secondary num desc
    data = [
        {"rank": "a", "num": 3, "event_seq": 0},
        {"rank": "b", "num": 1, "event_seq": 1},
        {"rank": "a", "num": 1, "event_seq": 2},
    ]
    df = spark.createDataFrame(data)
    out = flow(df).sort({"rule": [{"field": "rank"}, {"field": "num", "dir": "desc"}]})
    got = [(r["rank"], r["num"]) for r in rows(out.df)]
    assert got == [("a", 3), ("a", 1), ("b", 1)]


def test_sort_missing_values_default(spark):
    # uncastable/missing keys -> type default (riko/utils.py:678-717)
    df = spark.createDataFrame(
        [("5", 0), (None, 1), ("not-a-number", 2)], "v string, event_seq long"
    )
    out = flow(df).sort({"rule": [{"field": "v", "type": "int"}]})
    # None and 'not-a-number' cast-default to 0, stable by event_seq
    assert [r["event_seq"] for r in rows(out.df)] == [1, 2, 0]


# ------------------------------------------------- truncate/tail/reverse

def test_truncate(kv):
    # riko/modules/truncate.py:135-143: count=2 -> first two
    out = flow(kv).truncate({"count": 2})
    assert [r["x"] for r in rows(out.df)] == [0, 1]
    out2 = flow(kv).truncate({"count": 2, "start": 1})
    assert [r["x"] for r in rows(out2.df)] == [1, 2]


def test_tail(kv):
    out = flow(kv).tail({"count": 2})
    assert [r["x"] for r in rows(out.df)] == [3, 4]


def test_reverse(kv):
    out = flow(kv).reverse(None)
    assert [r["x"] for r in rows(out.df)] == [4, 3, 2, 1, 0]


# ---------------------------------------------------------- count/sum

def test_count_plain(kv):
    assert rows(flow(kv).count().df) == [{"count": 5}]


def test_count_grouped_first_seen(spark):
    # riko/modules/count.py:156-165 group ordering = first seen
    data = [("b", 0), ("a", 1), ("b", 2), ("c", 3), ("a", 4)]
    df = spark.createDataFrame(data, "word string, event_seq long")
    out = flow(df).count({"count_key": "word"})
    got = [(r["word"], r["count"]) for r in rows(out.df)]
    assert got == [("b", 2), ("a", 2), ("c", 1)]


def test_count_missing_key_stringifies_none(spark):
    df = spark.createDataFrame([(None, 0), ("a", 1)], "word string, event_seq long")
    out = flow(df).count({"count_key": "word"})
    assert ("None", 1) in [(r["word"], r["count"]) for r in rows(out.df)]


def test_sum_decimal(spark):
    df = spark.createDataFrame(
        [("1.5", 0), ("2.5", 1)], "content string, event_seq long"
    )
    out = rows(flow(df).sum().df)
    assert out[0]["sum"] == Decimal("4")


def test_sum_grouped(spark):
    df = spark.createDataFrame(
        [("a", "1", 0), ("a", "2", 1), ("b", "5", 2)],
        "g string, amount string, event_seq long",
    )
    out = flow(df).sum({"sum_key": "amount", "group_key": "g"})
    got = {r["g"]: r["sum"] for r in rows(out.df)}
    assert got == {"a": Decimal("3"), "b": Decimal("5")}


# -------------------------------------------------------- union/join/uniq

def test_union_bag_semantics(spark, kv):
    # riko/modules/union.py:133-139: no dedupe, ragged dicts fine
    other = spark.createDataFrame([{"x": 0, "y": "extra"}])
    out = flow(kv).union(None, others=[other])
    assert out.df.count() == 6
    assert set(out.df.columns) == {"x", "event_seq", "y"}


def test_join_keyed(spark):
    # riko/modules/join.py:195-217
    left = spark.createDataFrame([{"x": "foo-1", "sum": 2}, {"x": "foo-2", "sum": 3}])
    right = spark.createDataFrame([{"y": "foo-1", "count": 7}])
    out = flow(left).join({"join_key": "x", "other_join_key": "y"}, other=right)
    got = rows(out.df)
    assert len(got) == 1 and got[0]["count"] == 7 and got[0]["sum"] == 2


def test_join_lower(spark):
    left = spark.createDataFrame([{"x": "FOO-1", "sum": 2}])
    right = spark.createDataFrame([{"y": "foo-1", "count": 7}])
    assert flow(left).join({"join_key": "x", "other_join_key": "y"}, other=right).df.count() == 0
    out = flow(left).join(
        {"join_key": "x", "other_join_key": "y", "lower": True}, other=right
    )
    assert out.df.count() == 1


def test_join_both_missing_keys_never_match(spark):
    # riko join _MISSING sentinel (riko/modules/join.py:95-103)
    left = spark.createDataFrame([(None, 2)], "x string, sum long")
    right = spark.createDataFrame([(None, 7)], "y string, count long")
    out = flow(left).join({"join_key": "x", "other_join_key": "y"}, other=right)
    assert out.df.count() == 0


def test_uniq_first_seen(spark):
    df = spark.createDataFrame(
        [("a", 0), ("b", 1), ("a", 2), ("c", 3)], "id string, event_seq long"
    )
    out = flow(df).uniq({"uniq_key": "id"})
    assert sorted((r["id"], r["event_seq"]) for r in rows(out.df)) == [
        ("a", 0), ("b", 1), ("c", 3),
    ]


def test_uniq_bounded_limit_readmits_evicted_key(spark):
    """riko/modules/uniq.py deque(maxlen=limit): once `limit` other
    distinct keys were kept after key k, k is readmitted (the
    1025th-distinct-value behavior at limit=3 scale)."""
    seq = [("u1", 1), ("u2", 2), ("u3", 3), ("u1", 4), ("u4", 5), ("u1", 6)]
    df = spark.createDataFrame(seq, "id string, event_seq long")
    out = flow(df).uniq({"uniq_key": "id", "limit": 3})
    kept = sorted(r["event_seq"] for r in rows(out.df))
    # 4 dropped (u1 still in deque); 5 evicts u1; 6 readmits u1
    assert kept == [1, 2, 3, 5, 6]
    # unbounded first-seen stays the distributed path
    out2 = flow(df).uniq({"uniq_key": "id"})
    assert sorted(r["event_seq"] for r in rows(out2.df)) == [1, 2, 3, 5]


def test_uniq_bounded_null_keys_dedupe(spark):
    """Null keys in a NUMERIC column arrive pandas-side as NaN, and
    NaN != NaN — without normalization every null row would pass and
    eat a deque slot.  riko's dict-backed deque dedupes None like any
    value (riko/modules/uniq.py), so the second null must drop."""
    seq = [(None, 1), (None, 2), (7, 3), (None, 4), (7, 5)]
    df = spark.createDataFrame(seq, "k long, event_seq long")
    out = flow(df).uniq({"uniq_key": "k", "limit": 3})
    kept = sorted(r["event_seq"] for r in rows(out.df))
    assert kept == [1, 3]


def test_split(kv):
    branches = flow(kv).split({"splits": 3})
    assert len(branches) == 3
    assert all(b.df.count() == 5 for b in branches)
