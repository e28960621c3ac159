"""Codegen ≡ interpreter equivalence (the reference's
executor-vs-codegen regression, tests/internal/test_compile.py:113-126)."""

from riko_spark.plans.codegen import compile_pipe, stringify_pipe
from riko_spark.plans.dag import build_pipeline

PIPE_DEF = {
    "modules": [
        {"id": "src", "type": "filter",
         "conf": {"rule": [{"field": "x", "op": "atleast",
                            "value": {"type": "int", "value": "3"}}]}},
        {"id": "trunc", "type": "truncate", "conf": {"count": 4}},
        {"id": "out", "type": "output"},
    ],
}

UNION_DEF = {
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


def test_codegen_is_deterministic():
    assert stringify_pipe(PIPE_DEF, "p") == stringify_pipe(PIPE_DEF, "p")
    assert "execute_module" in stringify_pipe(PIPE_DEF, "p")


def test_codegen_matches_interpreter(spark):
    df = spark.createDataFrame([{"x": x, "event_seq": x} for x in range(10)])
    interpreted = build_pipeline(
        spark, PIPE_DEF, sources={"src": df}, order_by=["event_seq"]
    )
    fn, source = compile_pipe(PIPE_DEF, "p")
    generated = fn(spark, sources={"src": df}, order_by=["event_seq"])
    assert "def pipe_p(" in source
    assert [r.asDict() for r in interpreted.collect()] == [
        r.asDict() for r in generated.collect()
    ]


def test_codegen_union_wires(spark):
    a = spark.createDataFrame([{"x": 1}])
    b = spark.createDataFrame([{"x": 2}])
    fn, _ = compile_pipe(UNION_DEF, "u")
    got = fn(spark, sources={"a": a, "b": b})
    assert sorted(r["x"] for r in got.collect()) == [1, 2]


OPTION_DEF = {
    # conf carries option-layer keys (field/assign/emit) that must be
    # lifted into operator kwargs — a def the old codegen dropped
    "modules": [
        {"id": "s", "type": "filter", "conf": {}},
        {"id": "tok", "type": "tokenizer",
         "conf": {"delimiter": " ", "field": "content",
                  "token_key": "tok", "emit": False}},
    ],
}

TERMINAL_DEF = {
    # an input module wired into truncate's count slot (riko's dotdict
    # terminal sentinel)
    "modules": [
        {"id": "n", "type": "input",
         "conf": {"input_key": "howmany", "type": "int", "default": "2"}},
        {"id": "s", "type": "filter", "conf": {}},
        {"id": "t", "type": "truncate", "conf": {"count": {"terminal": "count"}}},
    ],
    "wires": [
        {"src": {"moduleid": "s"}, "tgt": {"moduleid": "t", "id": "_INPUT"}},
        {"src": {"moduleid": "n"}, "tgt": {"moduleid": "t", "id": "count"}},
    ],
}

LOOP_DEF = {
    "modules": [
        {"id": "s", "type": "filter", "conf": {}},
        {"id": "lp", "type": "loop",
         "embed": {"type": "strtransform",
                   "conf": {"rule": [{"transform": "upper"}]},
                   "assign": "shout"}},
    ],
}


def _rows(df):
    return [r.asDict() for r in df.collect()]


def test_codegen_option_keys_match_interpreter(spark):
    df = spark.createDataFrame(
        [{"content": "a b", "event_seq": 1}, {"content": "c", "event_seq": 2}]
    )
    interp = build_pipeline(spark, OPTION_DEF, sources={"s": df},
                            order_by=["event_seq"])
    fn, source = compile_pipe(OPTION_DEF, "opt")
    gen = fn(spark, sources={"s": df}, order_by=["event_seq"])
    assert "wired" not in source  # options ride through execute_module
    assert sorted(interp.columns) == sorted(gen.columns)
    assert "tok" in gen.columns  # assign honored (old codegen dropped it)
    assert sorted(map(str, _rows(interp))) == sorted(map(str, _rows(gen)))


def test_codegen_terminal_wire_matches_interpreter(spark):
    df = spark.createDataFrame([{"x": i, "event_seq": i} for i in range(10)])
    interp = build_pipeline(spark, TERMINAL_DEF, sources={"s": df},
                            order_by=["event_seq"])
    fn, _ = compile_pipe(TERMINAL_DEF, "term")
    gen = fn(spark, sources={"s": df}, order_by=["event_seq"])
    assert _rows(interp) == _rows(gen)
    assert len(_rows(gen)) == 2  # default bound via the input module
    fn2, _ = compile_pipe(TERMINAL_DEF, "term2")
    gen2 = fn2(spark, sources={"s": df}, order_by=["event_seq"],
               inputs={"howmany": 5})
    assert len(_rows(gen2)) == 5


def test_codegen_loop_fold_options_match_interpreter(spark):
    df = spark.createDataFrame([{"content": "hello"}])
    interp = build_pipeline(spark, LOOP_DEF, sources={"s": df})
    fn, _ = compile_pipe(LOOP_DEF, "lp")
    gen = fn(spark, sources={"s": df})
    assert _rows(interp) == _rows(gen)
    assert gen.collect()[0]["shout"] == "HELLO"


def test_codegen_rejects_non_identifier_name():
    import pytest

    with pytest.raises(ValueError):
        stringify_pipe(PIPE_DEF, "evil'); import os #")
    with pytest.raises(ValueError):
        stringify_pipe(PIPE_DEF, "class")


def test_codegen_nonfinite_float_literals(spark):
    """json.loads accepts Infinity/NaN; repr(float('inf')) is the bare
    name `inf` (a NameError in generated source), so _lit must emit
    float('inf')-style constructors.  The compiled module must both
    import and execute."""
    import json

    pipe = json.loads(
        '{"modules": [{"id": "f", "type": "filter",'
        ' {"rule": [{"field": "x", "op": "atleast", "value": Infinity}]}}]}'
        .replace('{"rule"', '"conf": {"rule"')
    )
    src = stringify_pipe(pipe, "p")
    assert "inf" in src and "float('inf')" in src
    fn, _ = compile_pipe(pipe, "p")
    df = spark.createDataFrame([(1.0,), (2.0,)], "x double")
    assert fn(spark, sources={"f": df}).count() == 0  # nothing >= inf

    pipe2 = json.loads(json.dumps(pipe).replace("Infinity", "NaN"))
    src2 = stringify_pipe(pipe2, "p")
    assert "float('nan')" in src2
