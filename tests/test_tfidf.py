"""tfidf_topk — golden tests against an independent pure-Python
recompute (tokenization, smoothed idf, milli-nat quantization,
deterministic ranking)."""

from __future__ import annotations

import math

import pyspark.sql.functions as F
import pytest

from riko_spark.operators.textstats import tfidf_topk_op

DOCS = [
    (0, "apple banana apple cherry"),
    (1, "banana cherry cherry date"),
    (2, "apple apple apple elderberry"),
    (3, "date elderberry fig fig fig"),
    (4, ""),          # no tokens: contributes to N, emits nothing
    (5, "apple"),     # single term: one row, rank 1
]


def _py_topk(k):
    n = len(DOCS)
    tf = {}
    for d, text in DOCS:
        for t in text.lower().split():
            tf[(d, t)] = tf.get((d, t), 0) + 1
    dfreq = {}
    for (_, t) in tf:
        dfreq[t] = dfreq.get(t, 0) + 1
    idf = {
        t: math.floor(
            (math.log((n + 1.0) / (c + 1.0)) + 1.0) * 1000.0 + 0.5)
        for t, c in dfreq.items()
    }
    out = []
    for d, _ in DOCS:
        rows = sorted(
            ((t, c, c * idf[t]) for (dd, t), c in tf.items() if dd == d),
            key=lambda r: (-r[2], r[0]))
        out += [(d, t, c, s, i + 1)
                for i, (t, c, s) in enumerate(rows[:k])]
    return sorted(out)


@pytest.mark.parametrize("k", [2, 10])
def test_topk_matches_python(spark, k):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    got = sorted(
        (r["doc_id"], r["term"], r["tf"], r["score_milli"], r["rank"])
        for r in tfidf_topk_op(df, k=k).collect())
    assert got == _py_topk(k)


def test_rare_term_outranks_common(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    top1 = {r["doc_id"]: r["term"]
            for r in tfidf_topk_op(df, k=1).collect()}
    # doc 1: 'cherry' (tf=2) beats singletons; doc 3: 'fig' tf=3 + rare
    assert top1[1] == "cherry"
    assert top1[3] == "fig"
    assert 4 not in top1          # empty doc emits nothing
    assert top1[5] == "apple"


def test_broadcast_off_same_result(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    a = sorted(map(tuple, tfidf_topk_op(df, k=3).collect()))
    b = sorted(map(tuple, tfidf_topk_op(
        df.repartition(4), k=3, broadcast=False).collect()))
    assert a == b


def test_plan_shape(spark):
    # scale contract: idf probes via broadcast join; top-k is a
    # window (rank filter), not a global sort+limit
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    plan = tfidf_topk_op(df, k=3)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "RunningWindowFunction" in plan or "Window" in plan
