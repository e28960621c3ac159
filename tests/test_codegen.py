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
    assert "call_operator" in stringify_pipe(PIPE_DEF, "p")


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
