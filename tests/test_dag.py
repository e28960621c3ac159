"""JSON pipe-definition DAG compiler tests (riko/compile.py behavior)."""

import pytest

from riko_spark.operators import UnsupportedModuleError
from riko_spark.plans.dag import CyclicPipeError, build_pipeline, parse_pipe_def, topological_sort
from riko_spark.plans.confs import cast_literal, normalize_conf


def test_topological_sort_cycle():
    with pytest.raises(CyclicPipeError):
        topological_sort({"a": ["b"], "b": ["a"]})


def test_parse_linear_chaining_when_wires_omitted():
    pd = parse_pipe_def({"modules": [{"id": 1, "type": "a"}, {"id": 2, "type": "b"}]})
    assert pd["wires"][0]["src"]["moduleid"] == "1"
    assert pd["wires"][0]["tgt"]["moduleid"] == "2"


def test_normalize_conf_type_value_unwrap():
    # riko/dotdict.py:375-376 doctest
    conf = {"start": 0, "count": {"type": "int", "value": "5"}}
    assert normalize_conf(conf) == {"start": 0, "count": 5}


def test_cast_literal_defaults():
    assert cast_literal("bad", "int") == 0
    assert cast_literal("7", "int") == 7
    assert cast_literal(None, "text") == ""


def test_build_linear_pipeline(spark):
    df = spark.createDataFrame(
        [{"title": f"t{i}", "x": i, "event_seq": i} for i in range(10)]
    )
    pipe_def = {
        "modules": [
            {"id": "src", "type": "filter",
             "conf": {"rule": [{"field": "x", "op": "atleast", "value": 5}]}},
            {"id": "trunc", "type": "truncate", "conf": {"count": 3}},
            {"id": "out", "type": "output"},
        ],
    }
    out = build_pipeline(spark, pipe_def, sources={"src": df}, order_by=["event_seq"])
    assert [r["x"] for r in out.collect()] == [5, 6, 7]


def test_build_union_wire_others(spark):
    a = spark.createDataFrame([{"x": 1}])
    b = spark.createDataFrame([{"x": 2}])
    pipe_def = {
        "modules": [
            {"id": "a", "type": "filter", "conf": {}},
            {"id": "b", "type": "filter", "conf": {}},
            {"id": "u", "type": "union", "conf": {}},
        ],
        "wires": [
            {"src": {"moduleid": "a"}, "tgt": {"moduleid": "u", "id": "_INPUT"}},
            {"src": {"moduleid": "b"}, "tgt": {"moduleid": "u", "id": "_OTHER1"}},
        ],
    }
    out = build_pipeline(spark, pipe_def, sources={"a": a, "b": b})
    assert sorted(r["x"] for r in out.collect()) == [1, 2]


def test_build_join_wire_named_other(spark):
    left = spark.createDataFrame([{"k": "a", "v": 1}])
    right = spark.createDataFrame([{"k2": "a", "w": 9}])
    pipe_def = {
        "modules": [
            {"id": "l", "type": "filter", "conf": {}},
            {"id": "r", "type": "filter", "conf": {}},
            {"id": "j", "type": "join", "conf": {"join_key": "k", "other_join_key": "k2"}},
        ],
        "wires": [
            {"src": {"moduleid": "l"}, "tgt": {"moduleid": "j", "id": "_INPUT"}},
            {"src": {"moduleid": "r"}, "tgt": {"moduleid": "j", "id": "other"}},
        ],
    }
    out = build_pipeline(spark, pipe_def, sources={"l": left, "r": right})
    got = out.collect()
    assert len(got) == 1 and got[0]["w"] == 9


def test_build_loop_embed(spark):
    # loop(embed=strtransform) applies the embedded processor per row
    df = spark.createDataFrame([{"content": "hello"}])
    pipe_def = {
        "modules": [
            {"id": "s", "type": "filter", "conf": {}},
            {"id": "lp", "type": "loop",
             "embed": {"type": "strtransform",
                       "conf": {"rule": [{"transform": "upper"}]}}},
        ],
    }
    out = build_pipeline(spark, pipe_def, sources={"s": df})
    assert out.collect()[0]["strtransform"] == "HELLO"


def test_unknown_module_raises(spark):
    df = spark.createDataFrame([{"x": 1}])
    pipe_def = {"modules": [{"id": "s", "type": "nosuchpipe", "conf": {}}]}
    with pytest.raises(UnsupportedModuleError):
        build_pipeline(spark, pipe_def, sources={"s": df})


def test_input_module_binding(spark):
    df = spark.createDataFrame([{"x": i, "event_seq": i} for i in range(10)])
    pipe_def = {
        "modules": [
            {"id": "n", "type": "input",
             "conf": {"input_key": "threshold", "type": "int", "default": "3"}},
            {"id": "s", "type": "filter",
             "conf": {"rule": [{"field": "x", "op": "atleast",
                                "value": {"type": "int", "value": "5"}}]}},
        ],
        "wires": [],
    }
    out = build_pipeline(spark, pipe_def, sources={"s": df})
    assert sorted(r["x"] for r in out.collect()) == [5, 6, 7, 8, 9]


def _tok_count_def(count_key=None, emit=False):
    conf = {"delimiter": " ", "token_key": "token", "field": "text", "emit": emit}
    cconf = {"count_key": count_key} if count_key else {}
    return {
        "modules": [
            {"id": "s", "type": "filter", "conf": {}},
            {"id": "tok", "type": "tokenizer", "conf": conf},
            {"id": "cnt", "type": "count", "conf": cconf},
        ],
    }


def _fusion_fixture(spark):
    rows = [
        ("en", "a b c", 1),
        ("en", "", 2),          # zero tokens
        ("de", None, 3),        # NULL text
        ("de", "x", 4),
        ("fr", "  ", 5),        # whitespace-only: riko keeps '' token? no — pre-strip empties drop
        (None, "k k", 6),       # NULL group key -> 'None'
        ("zz", "", 7),          # group with ONLY zero-token rows: absent
    ]
    return spark.createDataFrame(rows, "lang string, text string, event_seq long")


def test_fused_token_count_equivalence(spark):
    """The tokenizer→count fusion must match the exploded plan exactly,
    including zero-token rows, NULLs, 'None' group keys, all-empty
    groups, and first_seen ordering."""
    df = _fusion_fixture(spark)
    for key in (None, "lang"):
        d = _tok_count_def(count_key=key)
        fused = build_pipeline(spark, d, sources={"s": df}, order_by=["event_seq"])
        plain = build_pipeline(spark, d, sources={"s": df}, order_by=["event_seq"],
                               optimize=False)
        assert [r.asDict() for r in fused.collect()] == [
            r.asDict() for r in plain.collect()
        ], f"count_key={key}"


def test_fusion_eliminates_explode(spark):
    df = _fusion_fixture(spark)
    fused = build_pipeline(spark, _tok_count_def("lang"), sources={"s": df},
                           order_by=["event_seq"])
    plain = build_pipeline(spark, _tok_count_def("lang"), sources={"s": df},
                           order_by=["event_seq"], optimize=False)
    fused_plan = fused._jdf.queryExecution().executedPlan().toString()
    plain_plan = plain._jdf.queryExecution().executedPlan().toString()
    assert "Generate" not in fused_plan  # no explode in the fused plan
    assert "Generate" in plain_plan


def test_fusion_not_applied_when_counting_by_token(spark):
    """count_key == token_key needs the values — must NOT fuse."""
    df = _fusion_fixture(spark)
    d = _tok_count_def(count_key="token", emit=False)
    out = build_pipeline(spark, d, sources={"s": df}, order_by=["event_seq"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Generate" in plan
    got = {r["token"]: r["count"] for r in out.collect()}
    assert got == {"a": 1, "b": 1, "c": 1, "x": 1, "k": 2}


def test_fusion_codegen_equivalence(spark):
    from riko_spark.plans.codegen import compile_pipe

    df = _fusion_fixture(spark)
    d = _tok_count_def(count_key="lang")
    fn, source = compile_pipe(d, "fz")
    assert "fused_token_count" in source
    gen = fn(spark, sources={"s": df}, order_by=["event_seq"])
    interp = build_pipeline(spark, d, sources={"s": df}, order_by=["event_seq"])
    assert [r.asDict() for r in gen.collect()] == [r.asDict() for r in interp.collect()]


def _windowed_def():
    return {
        "modules": [
            {"id": "s", "type": "filter", "conf": {}},
            {"id": "tok", "type": "tokenizer",
             "conf": {"delimiter": " ", "token_key": "token",
                      "field": "text", "emit": False}},
            {"id": "wc", "type": "windowed_count",
             "conf": {"ts_col": "ts", "window": "10 minutes",
                      "keys": ["lang"], "name": "n_tokens"}},
        ],
    }


def test_fused_token_windowed_count_equivalence(spark):
    """tokenizer→windowed_count fuses to a windowed size-sum; results
    must match the exploded plan exactly (zero-token rows and all-empty
    window×key groups included), and the fused plan has no Generate."""
    import datetime as dt

    base = dt.datetime(2026, 1, 1, 12, 0, 0)
    rows = [
        ("en", "a b c", base),
        ("en", "", base),                                  # zero tokens
        ("de", None, base + dt.timedelta(minutes=11)),     # NULL text
        ("de", "x y", base + dt.timedelta(minutes=11)),
        ("fr", "", base + dt.timedelta(minutes=25)),       # all-empty group
        ("en", "k", base + dt.timedelta(minutes=25)),
    ]
    df = spark.createDataFrame(rows, "lang string, text string, ts timestamp")
    d = _windowed_def()
    fused = build_pipeline(spark, d, sources={"s": df})
    plain = build_pipeline(spark, d, sources={"s": df}, optimize=False)
    key = lambda r: (r["window_start"], r["lang"])  # noqa: E731
    assert sorted((r.asDict() for r in fused.collect()), key=key) == \
           sorted((r.asDict() for r in plain.collect()), key=key)
    assert "Generate" not in fused._jdf.queryExecution().executedPlan().toString()
    assert "Generate" in plain._jdf.queryExecution().executedPlan().toString()


def test_windowed_count_derive_keys(spark):
    """windowed_count conf.derive computes SQL-expression key columns
    (e.g. domain = parse_url(url)) before aggregating — and the fusion
    carries the derive through."""
    import datetime as dt

    base = dt.datetime(2026, 1, 1, 12, 0, 0)
    rows = [("http://a.com/x", "p q", base), ("http://b.com/y", "r", base)]
    df = spark.createDataFrame(rows, "url string, text string, ts timestamp")
    d = _windowed_def()
    d["modules"][2]["conf"]["keys"] = ["domain"]
    d["modules"][2]["conf"]["derive"] = {"domain": "parse_url(url, 'HOST')"}
    fused = build_pipeline(spark, d, sources={"s": df})
    got = {r["domain"]: r["n_tokens"] for r in fused.collect()}
    assert got == {"a.com": 2, "b.com": 1}
    plain = build_pipeline(spark, d, sources={"s": df}, optimize=False)
    assert got == {r["domain"]: r["n_tokens"] for r in plain.collect()}
