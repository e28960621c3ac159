"""Golden tests for string/structure transformer pipes, ported from the
reference doctests (see each operator's docstring for file:line)."""

from decimal import Decimal

import pytest

from riko_spark.plans.flow import Flow
from tests.conftest import rows


def one(spark, content="hello world", **extra):
    return Flow(spark.createDataFrame([{"content": content, **extra}]))


def val(flow, col):
    return rows(flow.df)[0][col]


# ---------------------------------------------------------------- regex

def test_regex_backrefs(spark):
    # riko/modules/regex.py doctest: (\w+)\s(\w+) -> $2wide => 'worldwide'
    conf = {"rule": [{"field": "content", "match": r"(\w+)\s(\w+)", "replace": "$2wide"}]}
    assert val(one(spark).regex(conf), "content") == "worldwide"


def test_regex_case_insensitive_default(spark):
    conf = {"rule": [{"field": "content", "match": "HELLO", "replace": "bye"}]}
    assert val(one(spark).regex(conf), "content") == "bye world"
    conf_cm = {"rule": [{"field": "content", "match": "HELLO", "replace": "bye", "casematch": True}]}
    assert val(one(spark).regex(conf_cm), "content") == "hello world"


def test_regex_singlelinematch_first_only(spark):
    conf = {"rule": [{"field": "content", "match": "o", "replace": "0", "singlelinematch": True}]}
    assert val(one(spark).regex(conf), "content") == "hell0 world"


# ----------------------------------------------------------- strreplace

def test_strreplace_every_first_last(spark):
    base = {"find": "l", "replace": "L"}
    assert val(one(spark).strreplace({"rule": [{**base, "param": "every"}]}), "strreplace") == "heLLo worLd"
    assert val(one(spark).strreplace({"rule": [{**base, "param": "first"}]}), "strreplace") == "heLlo world"
    assert val(one(spark).strreplace({"rule": [{**base, "param": "last"}]}), "strreplace") == "hello worLd"


def test_strreplace_doctest(spark):
    # riko/modules/strreplace.py doctest: hello -> bye
    conf = {"rule": [{"find": "hello", "replace": "bye"}]}
    assert val(one(spark).strreplace(conf), "strreplace") == "bye world"


# --------------------------------------------------------- strtransform

@pytest.mark.parametrize(
    "transform,args,expected",
    [
        ("upper", None, "HELLO WORLD"),
        ("capitalize", None, "Hello world"),
        ("title", None, "Hello World"),
        ("swapcase", None, "HELLO WORLD"),
        ("zfill", "13", "00hello world"),
        ("zfill", "3", "hello world"),  # width < len: no truncation (str.zfill)
        ("replace", "world,there", "hello there"),
        ("count", "l", 3),
        ("find", "world", 6),
    ],
)
def test_strtransform(spark, transform, args, expected):
    conf = {"rule": [{"transform": transform, "args": args}]}
    assert val(one(spark).strtransform(conf), "strtransform") == expected


def test_strtransform_strip(spark):
    conf = {"rule": [{"transform": "strip"}]}
    assert val(one(spark, content="\t hi \r\n").strtransform(conf), "strtransform") == "hi"


# ------------------------------------------------------------ strconcat

def test_strconcat(spark):
    conf = {"part": [{"value": "one"}, {"value": "two"}]}
    assert val(one(spark).strconcat(conf), "strconcat") == "onetwo"


def test_strconcat_subkey(spark):
    conf = {"part": [{"value": "id:"}, {"subkey": "content"}]}
    assert val(one(spark, content="x7").strconcat(conf), "strconcat") == "id:x7"


# -------------------------------------------------------------- strfind

def test_strfind_before_first(spark):
    # riko/modules/strfind.py doctest: find 'o' -> 'hell'
    assert val(one(spark).strfind({"rule": [{"find": "o"}]}), "strfind") == "hell"


def test_strfind_after_last(spark):
    conf = {"rule": [{"find": "o", "location": "after", "param": "last"}]}
    assert val(one(spark).strfind(conf), "strfind") == "rld"


def test_strfind_before_last(spark):
    conf = {"rule": [{"find": "o", "location": "before", "param": "last"}]}
    assert val(one(spark).strfind(conf), "strfind") == "hello w"


def test_strfind_not_found(spark):
    conf = {"rule": [{"find": "zzz"}]}
    assert val(one(spark).strfind(conf), "strfind") == ""
    conf_after = {"rule": [{"find": "zzz", "location": "after"}]}
    assert val(one(spark).strfind(conf_after), "strfind") == "hello world"


# --------------------------------------------------------------- refind

def test_refind_before_first(spark):
    assert val(one(spark).refind({"rule": [{"find": r"o"}]}), "refind") == "hell"


def test_refind_at_first(spark):
    conf = {"rule": [{"find": r"w\w+", "location": "at"}]}
    assert val(one(spark).refind(conf), "refind") == "world"


def test_refind_after_last(spark):
    conf = {"rule": [{"find": r"o", "location": "after", "param": "last"}]}
    assert val(one(spark).refind(conf), "refind") == "rld"


# --------------------------------------------------------------- substr

def test_substr(spark):
    # riko/modules/substr.py doctest: start 3 len 4 -> 'lo w'
    assert val(one(spark).substr({"start": 3, "length": 4}), "substr") == "lo w"
    assert val(one(spark).substr({"start": 6}), "substr") == "world"


# -------------------------------------------------------------- slugify

def test_slugify(spark):
    assert val(one(spark).slugify(), "slugify") == "hello-world"
    assert val(one(spark, content="  Hello,  World! ").slugify(), "slugify") == "hello-world"
    assert val(one(spark).slugify({"separator": "_"}), "slugify") == "hello_world"


# ----------------------------------------------------------------- hash

def test_hash_stable_int(spark):
    out = val(one(spark).hash(), "hash")
    assert isinstance(out, int)
    assert out == val(one(spark).hash(), "hash")


# ------------------------------------------------------------ tokenizer

def test_tokenizer_default_comma(spark):
    f = one(spark, content="Once,twice , thrice,no more").tokenizer()
    assert [r["content"] for r in rows(f.df)] == ["Once", "twice", "thrice", "no more"]


def test_tokenizer_prestrip_empties(spark):
    # riko keeps whitespace-only tokens (stripped to ''), drops true empties
    f = one(spark, content="a, ,b,,c").tokenizer()
    assert [r["content"] for r in rows(f.df)] == ["a", "", "b", "c"]


def test_tokenizer_dedupe_sort(spark):
    conf = {"dedupe": True, "sort": True, "delimiter": ","}
    f = one(spark, content="b,a,B,a").tokenizer(conf)
    assert [r["content"] for r in rows(f.df)] == ["a", "b", "B"] or [
        r["content"] for r in rows(f.df)
    ] == ["a", "B", "b"]


def test_tokenizer_token_key_and_assign_mode(spark):
    f = one(spark, content="x//y", other=1).tokenizer(
        {"delimiter": "//", "token_key": "token"}, emit=False
    )
    got = rows(f.df)
    assert [r["token"] for r in got] == ["x", "y"]
    assert all(r["other"] == 1 for r in got)


# ------------------------------------------------------- rename/typecast

def test_rename(spark):
    f = one(spark).rename({"rule": [{"field": "content", "newval": "greeting"}]})
    assert rows(f.df) == [{"greeting": "hello world"}]


def test_rename_copy(spark):
    f = one(spark).rename({"rule": [{"field": "content", "newval": "copy2", "copy": True}]})
    assert rows(f.df) == [{"content": "hello world", "copy2": "hello world"}]


def test_typecast_defaults(spark):
    f = one(spark, content="not-a-number").typecast({"type": "int"})
    assert val(f, "typecast") == 0
    f2 = one(spark, content="12").typecast({"type": "int"})
    assert val(f2, "typecast") == 12


# ----------------------------------------------------------- simplemath

def test_simplemath_divide(spark):
    f = one(spark, content="10").simplemath({"op": "divide", "other": 4})
    assert val(f, "simplemath") == Decimal("2.5")


def test_simplemath_subkey(spark):
    f = one(spark, content="10", other_col="3").simplemath(
        {"op": "modulo", "other": {"subkey": "other_col"}}
    )
    assert val(f, "simplemath") == Decimal("1")


# ----------------------------------------------------------- dateformat

def test_dateformat(spark):
    f = one(spark, content="2026-05-04 12:30:00").dateformat({"format": "%m/%d/%Y"})
    assert val(f, "dateformat") == "05/04/2026"


# ---------------------------------------------------- urlbuilder/urlparse

def test_urlbuilder(spark):
    # riko/modules/urlbuilder.py doctest
    conf = {
        "base": "http://finance.yahoo.com",
        "path": ["rss", "headline"],
        "param": [{"key": "s", "value": "gm"}],
    }
    f = one(spark).urlbuilder(conf)
    assert val(f, "urlbuilder") == "http://finance.yahoo.com/rss/headline?s=gm"


def test_urlparse(spark):
    f = one(spark, content="http://yahoo.com/path?q=1#frag").urlparse()
    got = {r["component"]: r["content"] for r in rows(f.df)}
    assert got["scheme"] == "http"
    assert got["netloc"] == "yahoo.com"
    assert got["path"] == "/path"
    assert got["query"] == "q=1"
    assert got["fragment"] == "frag"


# ------------------------------------------------------------ subelement

def test_subelement(spark):
    df = spark.createDataFrame(
        [{"stanzas": {"verses": ["verse1", "verse2"]}}]
    )
    f = Flow(df).subelement({"path": "stanzas.verses"})
    assert [r["content"] for r in rows(f.df)] == ["verse1", "verse2"]


# ----------------------------------------------------------- itembuilder

def test_itembuilder(spark):
    df = spark.createDataFrame([{"seed": 1}])
    f = Flow(df).itembuilder(
        {"attrs": [{"key": "title", "value": "t"}, {"key": "copy", "value": {"subkey": "seed"}}]}
    )
    assert rows(f.df) == [{"title": "t", "copy": 1}]


# ------------------------------------------------------------------ udf

def test_udf_mapinpandas(spark):
    df = spark.createDataFrame([{"x": 1}, {"x": 2}])

    def double(pdf):
        pdf["x"] = pdf["x"] * 2
        return pdf

    f = Flow(df).udf(None, func=double, schema="x bigint")
    assert sorted(r["x"] for r in rows(f.df)) == [2, 4]


def test_regex_multi_single_pass_parallel(spark):
    """riko regex `multi: true` (riko/utils.py:874-965): ALL rules run
    in one pass, so a later rule never sees an earlier rule's output —
    sequential application would produce 'c' here, single-pass 'b c'."""
    df = spark.createDataFrame([{"content": "a b"}])
    conf = {"multi": True,
            "rule": [{"field": "content", "match": "a", "replace": "b"},
                     {"field": "content", "match": "b", "replace": "c"}]}
    out = Flow(df).regex(conf).df
    assert out.collect()[0]["content"] == "b c"
    # sequential (multi off) for contrast: a->b then both b's -> c
    seq = Flow(df).regex({**conf, "multi": False}).df
    assert seq.collect()[0]["content"] == "c c"


def test_regex_multi_backrefs_remap(spark):
    """$n backrefs stay rule-local under the combined pattern."""
    df = spark.createDataFrame([{"content": "x1 y2"}])
    conf = {"multi": True,
            "rule": [{"field": "content", "match": r"x(\d)", "replace": "X$1"},
                     {"field": "content", "match": r"y(\d)", "replace": "Y$1"}]}
    out = Flow(df).regex(conf).df
    assert out.collect()[0]["content"] == "X1 Y2"


def test_urlbuilder_ext_substitutes_invalid_filechars(spark):
    """riko/modules/urlbuilder.py:115-117: conf.ext substitutes
    [<>:"/\\|*?%] with '_' across the whole url then appends '.ext'."""
    conf = {"base": "http://example.com", "path": ["a", "b"],
            "param": [{"key": "q", "value": "1"}], "ext": "json"}
    got = val(one(spark).urlbuilder(conf), "urlbuilder")
    assert got == "http___example.com_a_b_q=1.json"
