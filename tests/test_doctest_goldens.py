"""Additional goldens transcribed from reference module doctests not
already covered elsewhere: simplemath's full op table, typecast
variants, dateformat patterns, strfind 'at', tokenizer dedupe-order."""

from decimal import Decimal

import pytest

from riko_spark.plans.flow import Flow
from tests.conftest import rows


def one(spark, content, **extra):
    return Flow(spark.createDataFrame([{"content": content, **extra}]))


def val(flow, col):
    return rows(flow.df)[0][col]


@pytest.mark.parametrize(
    "op,other,expected",
    [
        ("add", 4, Decimal("14")),
        ("subtract", 4, Decimal("6")),
        ("multiply", 4, Decimal("40")),
        ("divide", 4, Decimal("2.5")),
        ("mean", 4, Decimal("7")),
        ("floor", 4, Decimal("2")),
        ("modulo", 4, Decimal("2")),
        ("power", 2, Decimal("100")),
    ],
)
def test_simplemath_all_ops(spark, op, other, expected):
    # riko/modules/simplemath.py:47-56 OPS table; input 10
    got = val(one(spark, "10").simplemath({"op": op, "other": other}), "simplemath")
    assert got == expected


@pytest.mark.parametrize(
    "cast_type,value,expected",
    [
        ("int", "5", 5),
        ("int", "bad", 0),
        ("float", "2.5", 2.5),
        ("text", "x", "x"),
        ("bool", "true", True),
    ],
)
def test_typecast_variants(spark, cast_type, value, expected):
    got = val(one(spark, value).typecast({"type": cast_type}), "typecast")
    assert got == expected


def test_typecast_float_nan_default(spark):
    import math

    got = val(one(spark, "bad").typecast({"type": "float"}), "typecast")
    assert math.isnan(got)  # riko float default = nan (riko/cast.py:280-292)


@pytest.mark.parametrize(
    "fmt,expected",
    [
        ("%m/%d/%Y", "05/04/2026"),
        ("%Y-%m-%d %H:%M", "2026-05-04 12:30"),
        ("%d %B %Y", "04 May 2026"),
        ("%a %b %d", "Mon May 04"),
    ],
)
def test_dateformat_patterns(spark, fmt, expected):
    got = val(one(spark, "2026-05-04 12:30:00").dateformat({"format": fmt}), "dateformat")
    assert got == expected


def test_strfind_at_quirk(spark):
    # riko/modules/strfind.py:64-67: word[pos:len(find)] — for a find
    # at position 0 this returns the find itself; elsewhere ''
    got = val(one(spark, "hello world").strfind(
        {"rule": [{"find": "hello", "location": "at"}]}), "strfind")
    assert got == "hello"
    # find at pos 4: word[4:5] == 'h' — faithful to the reference slice
    got2 = val(one(spark, "say hello").strfind(
        {"rule": [{"find": "hello", "location": "at"}]}), "strfind")
    assert got2 == "h"


def test_tokenizer_dedupe_keeps_first_occurrence(spark):
    # our documented divergence: deterministic first-occurrence order
    # (riko's set() is order-destroying unless sort=True)
    f = one(spark, "b,a,b,c,a").tokenizer({"dedupe": True})
    assert [r["content"] for r in rows(f.df)] == ["b", "a", "c"]


def test_count_no_items(spark):
    df = spark.createDataFrame([], "x long, event_seq long")
    assert rows(Flow(df).count().df) == [{"count": 0}]


def test_sum_skips_uncastable(spark):
    # try_cast NULLs uncastable values; sum ignores NULLs (riko raises
    # on truly non-numeric but the engine's never-raise policy wins —
    # documented)
    df = spark.createDataFrame(
        [("1.5", 0), ("xx", 1), ("2.5", 2)], "content string, event_seq long"
    )
    assert rows(Flow(df).sum().df)[0]["sum"] == Decimal("4")

def test_datebuilder_named_and_relative_forms(spark):
    """riko/modules/datebuilder.py doctest ('12/2/2014' -> year 2014)
    plus the named/relative vocabulary from riko/cast.py:217-272."""
    from datetime import datetime, timedelta

    from riko_spark.plans.flow import Flow

    rows = [{"content": c} for c in
            ["12/2/2014", "today", "tomorrow", "yesterday", "2 days",
             "-3 days", "not a date at all"]]
    df = spark.createDataFrame(rows)
    got = {r["content"]: r["datebuilder"]
           for r in Flow(df).datebuilder(None).df.collect()}
    # the riko doctest value: US-style parse via the dateutil fallback
    assert got["12/2/2014"].year == 2014 and got["12/2/2014"].month == 12
    today = datetime.now()
    assert got["today"].date() == today.date()
    assert got["tomorrow"].date() == (today + timedelta(days=1)).date()
    assert got["yesterday"].date() == (today - timedelta(days=1)).date()
    assert abs((got["2 days"] - today) - timedelta(days=2)) < timedelta(minutes=5)
    assert abs((today - got["-3 days"]) - timedelta(days=3)) < timedelta(minutes=5)
    assert got["not a date at all"] is None
