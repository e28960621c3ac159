"""stratified_sample / mixture_resample: hand-replayed md5 goldens.

The expected sample for every test is recomputed with hashlib.md5 in
plain Python — the operator's determinism claim is exactly that an
independent implementation of ``md5(seed ':' id)`` reproduces it.
"""

import hashlib

import pyspark.sql.functions as F
import pytest

from riko_spark.operators.sampling import (
    frac_threshold_hex,
    mixture_resample_op,
    stratified_sample_op,
)


def h(seed: str, i: int) -> str:
    return hashlib.md5(f"{seed}:{i}".encode()).hexdigest()


def expected_sample(ids_by_group: dict, k: int, seed: str) -> dict:
    return {
        g: sorted(ids, key=lambda i: h(seed, i))[:k]
        for g, ids in ids_by_group.items()
    }


@pytest.fixture(scope="module")
def grouped(spark):
    # groups of size 7/7/6 over ids 0..19
    return spark.range(20).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 3).cast("string").alias("source"),
    )


GROUPS = {str(g): [i for i in range(20) if i % 3 == g] for g in range(3)}


def test_stratified_matches_python_md5_replay(grouped):
    out = stratified_sample_op(grouped, group_col="source", k=3, seed="s42")
    got = {}
    for r in out.collect():
        got.setdefault(r["source"], []).append((r["sample_rank"], r["doc_id"]))
    want = expected_sample(GROUPS, 3, "s42")
    assert {
        g: [i for _, i in sorted(v)] for g, v in got.items()
    } == want


def test_stratified_k_exceeding_group_keeps_all(grouped):
    out = stratified_sample_op(grouped, group_col="source", k=99, seed="s")
    assert out.count() == 20
    assert out.agg(F.max("sample_rank")).collect()[0][0] == 7


def test_stratified_seed_changes_sample(grouped):
    a = {r["doc_id"] for r in stratified_sample_op(
        grouped, group_col="source", k=2, seed="a").collect()}
    b = {r["doc_id"] for r in stratified_sample_op(
        grouped, group_col="source", k=2, seed="b").collect()}
    assert a != b  # md5 of different seeds reorders


def test_stratified_local_topk_parity_across_partitionings(grouped):
    base = sorted(
        map(tuple, stratified_sample_op(
            grouped, group_col="source", k=2, seed="s42").collect())
    )
    for nparts in (1, 3, 7):
        alt = sorted(
            map(tuple, stratified_sample_op(
                grouped.repartition(nparts), group_col="source", k=2,
                seed="s42", local_topk=True).collect())
        )
        assert alt == base


def test_stratified_bad_k_raises(grouped):
    with pytest.raises(ValueError, match="k must be"):
        stratified_sample_op(grouped, group_col="source", k=0)


WEIGHTS = {"a": 2.5, "b": 0.4, "c": 1.0, "d": 0.0}


def expected_copies(i: int, src: str) -> int:
    w = WEIGHTS.get(src, 0.0)
    base, frac = int(w), w - int(w)
    extra = int(frac > 0 and h("mix", i) < frac_threshold_hex(frac))
    return base + extra


@pytest.fixture(scope="module")
def mixed(spark):
    return spark.createDataFrame(
        [(i, "abcde"[i % 5]) for i in range(40)], "doc_id long, source string"
    )


def test_mixture_matches_python_md5_replay(mixed):
    out = mixture_resample_op(mixed, weights=WEIGHTS, seed="mix")
    got = {}
    for r in out.collect():
        got.setdefault(r["doc_id"], []).append(r["copy_id"])
    for i in range(40):
        n = expected_copies(i, "abcde"[i % 5])
        assert sorted(got.get(i, [])) == list(range(1, n + 1)), f"doc {i}"


def test_mixture_weight_zero_and_unlisted_sources_drop(mixed):
    out = mixture_resample_op(mixed, weights=WEIGHTS, seed="mix")
    srcs = {r["source"] for r in out.collect()}
    assert "d" not in srcs  # weight 0.0
    assert "e" not in srcs  # not in the mixture allowlist


def test_mixture_integer_weight_passthrough(mixed):
    out = mixture_resample_op(mixed, weights={"c": 1.0}, seed="mix")
    rows = out.collect()
    assert len(rows) == 8 and all(r["copy_id"] == 1 for r in rows)


def test_mixture_negative_weight_raises(mixed):
    with pytest.raises(ValueError, match="negative weight"):
        mixture_resample_op(mixed, weights={"a": -1.0})


def test_mixture_empty_weights_raises(mixed):
    with pytest.raises(ValueError, match="non-empty weights"):
        mixture_resample_op(mixed, weights={})


def test_frac_threshold_domain():
    assert frac_threshold_hex(0.0) == "0" * 12
    assert frac_threshold_hex(0.5) == "8" + "0" * 11
    with pytest.raises(ValueError):
        frac_threshold_hex(1.0)


def test_mixture_plan_has_no_exchange(mixed):
    plan = (
        mixture_resample_op(mixed, weights=WEIGHTS)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
