"""DSIR importance resampling — golden tests against an independent
pure-Python recompute of the whole recipe (hashing, Laplace fit,
milli-nat quantization, Gumbel noise, top-k)."""

from __future__ import annotations

import hashlib
import math

import pyspark.sql.functions as F
import pytest

from riko_spark.operators.dsir import (
    DsirTables,
    dsir_fit,
    dsir_score,
    dsir_select_op,
)

B = 64  # tiny feature space so bucket collisions are exercised
SEED = "t1"

TARGET = [
    (100, "spark makes big data simple and fast"),
    (101, "distributed data processing with spark sql"),
    (102, "fast data pipelines need good planning"),
]
RAW = [
    (0, "spark sql runs fast data jobs"),
    (1, "buy cheap pills online now cheap pills"),
    (2, "distributed processing of big data with spark"),
    (3, "click here to win a free prize now"),
    (4, "good pipelines need fast planning and spark"),
    (5, "lorem ipsum dolor sit amet consectetur"),
    (6, ""),  # empty doc: 0 features, competes on pure Gumbel
    (7, "spark"),  # single token: unigram only, no bigrams
]


def _toks(text):
    return [t for t in text.lower().split() if t]


def _bucket(ng: str) -> int:
    return int(hashlib.md5(ng.encode()).hexdigest()[:8], 16) % B


def _feats(text):
    t = _toks(text)
    return [_bucket(w) for w in t] + [
        _bucket(f"{a} {b}") for a, b in zip(t, t[1:])
    ]


def _milli(x: float) -> int:
    return math.floor(x * 1000.0 + 0.5)


def _py_model():
    tc, rc = {}, {}
    for _, text in TARGET:
        for b in _feats(text):
            tc[b] = tc.get(b, 0) + 1
    for _, text in RAW:
        for b in _feats(text):
            rc[b] = rc.get(b, 0) + 1
    tt, rt = sum(tc.values()), sum(rc.values())

    def lr(ct, cr):
        return _milli(
            math.log(ct + 1.0) - math.log(cr + 1.0)
            + math.log(float(rt + B)) - math.log(float(tt + B))
        )

    ratios = {
        b: lr(tc.get(b, 0), rc.get(b, 0)) for b in set(tc) | set(rc)
    }
    return ratios, lr(0, 0)


def _py_gumbel(doc_id: int) -> int:
    hx = hashlib.md5(f"{SEED}:{doc_id}".encode()).hexdigest()[:12]
    u = (int(hx, 16) + 0.5) / float(16 ** 12)
    return math.floor(-math.log(-math.log(u)) * 1000.0 + 0.5)


def _py_scored():
    ratios, default = _py_model()
    out = {}
    for doc_id, text in RAW:
        fs = _feats(text)
        logw = sum(ratios.get(b, default) for b in fs)
        g = _py_gumbel(doc_id)
        out[doc_id] = (len(fs), logw, g, logw + g)
    return out


@pytest.fixture(scope="module")
def fitted(spark):
    target = spark.createDataFrame(TARGET, ["doc_id", "text"])
    raw = spark.createDataFrame(RAW, ["doc_id", "text"])
    return raw, dsir_fit(target, raw, buckets=B)


def test_fit_matches_python(fitted):
    _, tables = fitted
    ratios, default = _py_model()
    got = {r["bucket"]: r["lr_milli"] for r in tables.ratios.collect()}
    assert got == ratios
    assert tables.default_milli == default


def test_score_matches_python(fitted):
    raw, tables = fitted
    exp = _py_scored()
    got = {
        r["doc_id"]: (r["n_feats"], r["logw_milli"])
        for r in dsir_score(raw, tables).collect()
    }
    assert set(got) == set(exp)  # empty doc present with 0 features
    for doc_id, (n, logw, _, _) in exp.items():
        assert got[doc_id] == (n, logw), doc_id


def test_topk_matches_python(fitted):
    raw, tables = fitted
    exp = _py_scored()
    order = sorted(exp, key=lambda d: (-exp[d][3], d))
    rows = dsir_select_op(raw, tables=tables, k=4, seed=SEED).collect()
    assert [r["doc_id"] for r in rows] == order[:4]
    for r in rows:
        n, logw, g, key = exp[r["doc_id"]]
        assert (r["n_feats"], r["logw_milli"],
                r["gumbel_milli"], r["key_milli"]) == (n, logw, g, key)


def test_threshold_mode_and_determinism(fitted):
    raw, tables = fitted
    exp = _py_scored()
    cut = sorted((v[3] for v in exp.values()), reverse=True)[2]
    rows = dsir_select_op(
        raw.repartition(5), tables=tables, threshold_milli=cut, seed=SEED
    ).collect()
    assert sorted(r["doc_id"] for r in rows) == sorted(
        d for d, v in exp.items() if v[3] >= cut
    )


def test_spam_ranks_below_sparklike(fitted):
    # semantic sanity: target-like docs carry higher importance
    # weights than the spam/fillers
    raw, tables = fitted
    w = {
        r["doc_id"]: r["logw_milli"] for r in dsir_score(raw, tables).collect()
    }
    assert min(w[0], w[2], w[4]) > max(w[1], w[3], w[5])


def test_plan_shape(fitted):
    # the scale contract: ratio probe broadcasts, top-k compiles to
    # TakeOrderedAndProject (per-task top-k, no global Sort+Exchange)
    raw, tables = fitted
    plan = dsir_select_op(
        raw, tables=tables, k=3, seed=SEED
    )._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan
    # threshold mode is row-local: no ordering operator at all
    thr = dsir_select_op(
        raw, tables=tables, threshold_milli=0, seed=SEED
    )._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" not in thr
    assert "SortExec" not in thr


def test_requires_exactly_one_mode(fitted):
    raw, tables = fitted
    with pytest.raises(ValueError):
        dsir_select_op(raw, tables=tables)
    with pytest.raises(ValueError):
        dsir_select_op(raw, tables=tables, k=3, threshold_milli=0)


def test_raw_sample_frac_fit(spark):
    # deterministic md5-threshold slice of the raw side: matches a
    # pure-Python refit on the same slice, and frac=1.0 == no filter
    import hashlib

    from riko_spark.operators.dsir import dsir_fit
    from riko_spark.operators.sampling import frac_threshold_hex

    target = spark.createDataFrame(TARGET, ["doc_id", "text"])
    raw = spark.createDataFrame(RAW, ["doc_id", "text"])
    thr = frac_threshold_hex(0.5)
    keep = [d for d, _ in RAW if hashlib.md5(
        f"dsirq:{d}".encode()).hexdigest()[:12] < thr]

    t = dsir_fit(target, raw, buckets=B, raw_sample_frac=0.5)
    # raw_total is the feature-occurrence count of the kept slice
    exp_rt = sum(len(_feats(dict(RAW)[d])) for d in keep)
    assert t.raw_total == exp_rt
    assert 0 < len(keep) < len(RAW)  # the slice is a proper subset

    full = dsir_fit(target, raw, buckets=B, raw_sample_frac=1.0)
    ref = dsir_fit(target, raw, buckets=B)
    assert full.raw_total == ref.raw_total

    with pytest.raises(ValueError):
        dsir_fit(target, raw, buckets=B, raw_sample_frac=0.0)
