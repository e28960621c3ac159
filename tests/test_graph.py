"""Connected components / near-dup cluster resolution
(riko_spark/operators/graph.py).

Expectations are hand-derived from literal edge lists — chains force
multi-round convergence so single-pass min-propagation bugs cannot
hide.
"""

from __future__ import annotations

import pytest

from riko_spark.operators.graph import (
    connected_components_op,
    neardup_resolve_op,
)

from tests.conftest import rows


def _pairs(spark, edges):
    return spark.createDataFrame(edges, "left_id long, right_id long")


def _components(spark, edges, nodes=None):
    n = (spark.createDataFrame([(i,) for i in nodes], "id long")
         if nodes is not None else None)
    return {r["id"]: r["component"] for r in rows(
        connected_components_op(_pairs(spark, edges), nodes=n))}


def test_chain_transitive_closure(spark):
    # 0-1-2-3-4-5-6-7 chain: every node must resolve to 0 (requires
    # transitive propagation, not one neighbor-min pass)
    got = _components(spark, [(i, i + 1) for i in range(7)])
    assert got == {i: 0 for i in range(8)}


def test_multiple_components_and_isolated_nodes(spark):
    edges = [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 20)]
    got = _components(spark, edges, nodes=[1, 2, 3, 10, 11, 20, 21, 22, 99])
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10,
                   20: 20, 21: 20, 22: 20, 99: 99}


def test_long_chain_converges_within_round_budget(spark):
    # pointer doubling: a 64-node chain must converge in O(log n)
    # rounds, far under the 25-round backstop
    got = _components(spark, [(i, i + 1) for i in range(63)])
    assert set(got.values()) == {0} and len(got) == 64


def test_neardup_resolve_keep_set(spark):
    docs = spark.createDataFrame([(i,) for i in range(8)], "doc_id long")
    pairs = _pairs(spark, [(0, 1), (1, 2), (5, 6)])
    out = {r["doc_id"]: (r["component"], r["keep"]) for r in rows(
        neardup_resolve_op(docs, pairs=pairs))}
    assert out == {0: (0, True), 1: (0, False), 2: (0, False),
                   3: (3, True), 4: (4, True),
                   5: (5, True), 6: (5, False), 7: (7, True)}


def test_resolve_requires_pairs():
    with pytest.raises(ValueError, match="pairs"):
        neardup_resolve_op(None)


def test_registry():
    from riko_spark.operators import get_operator

    assert get_operator("connected_components") is connected_components_op
    assert get_operator("neardup_resolve") is neardup_resolve_op


def test_resolve_custom_id_col(spark):
    # review finding: conf id_col must apply to the final projection,
    # not only the component labeling
    docs = spark.createDataFrame([(i,) for i in range(4)], "image_id long")
    pairs = _pairs(spark, [(0, 1)])
    out = {r["image_id"]: r["keep"] for r in rows(
        neardup_resolve_op(docs, {"id_col": "image_id"}, pairs=pairs))}
    assert out == {0: True, 1: False, 2: True, 3: True}


def test_resolve_null_ids_dropped(spark):
    # review finding: a NULL corpus id must not emit a NULL keep
    docs = spark.createDataFrame([(0,), (1,), (None,)], "doc_id long")
    pairs = _pairs(spark, [(0, 1)])
    out = rows(neardup_resolve_op(docs, pairs=pairs))
    assert sorted((r["doc_id"], r["keep"]) for r in out) == \
        [(0, True), (1, False)]


def test_resolve_phantom_pair_endpoint_keeps_a_present_doc(spark):
    # review finding: a pair endpoint already gated out of the corpus
    # must not become a phantom minimum that drops the whole cluster
    docs = spark.createDataFrame([(6,), (7,), (9,)], "doc_id long")
    pairs = _pairs(spark, [(5, 6), (6, 7)])  # 5 not in the corpus
    out = {r["doc_id"]: (r["component"], r["keep"]) for r in rows(
        neardup_resolve_op(docs, pairs=pairs))}
    assert out[6] == (5, True)   # smallest PRESENT doc is kept
    assert out[7] == (5, False)
    assert out[9] == (9, True)


def test_resolve_id_col_named_id(spark):
    # review finding: components expose a column literally named 'id';
    # id_col='id' must not raise AMBIGUOUS_REFERENCE
    docs = spark.createDataFrame([(0,), (1,), (2,)], "id long")
    pairs = _pairs(spark, [(0, 1)])
    out = {r["id"]: r["keep"] for r in rows(
        neardup_resolve_op(docs, {"id_col": "id"}, pairs=pairs))}
    assert out == {0: True, 1: False, 2: True}


def test_convergence_check_is_fused_not_a_join_count(spark):
    # round-7 rework: the per-round convergence test is a __chg flag
    # computed INSIDE the round's plan (previous label threaded through
    # the neighbor-min aggregation) + a limit-1 isEmpty scan of the
    # checkpointed result — not a new-vs-old join + full count.  Audit
    # via the status tracker: the 64-chain (7 rounds at local[4])
    # measured 80 driver jobs with the join+count loop and 60 with the
    # fused check; assert the budget stays in the fused regime.
    import uuid

    sc = spark.sparkContext
    group = f"cc-audit-{uuid.uuid4().hex}"
    sc.setJobGroup(group, "cc job audit")
    try:
        got = _components(spark, [(i, i + 1) for i in range(63)])
    finally:
        sc.setLocalProperty("spark.jobGroup.id", None)
    assert set(got.values()) == {0} and len(got) == 64
    jobs = sc.statusTracker().getJobIdsForGroup(group)
    assert len(jobs) <= 72, f"CC loop regressed to {len(jobs)} driver jobs"


def test_stats_out_param_records_rounds(spark):
    # the scale harness's instrumentation contract: stats records the
    # convergence round count and job-group tagging is cleared after
    stats = {}
    pairs = _pairs(spark, [(i, i + 1) for i in range(7)])
    got = {r["id"]: r["component"] for r in rows(
        connected_components_op(pairs, stats=stats))}
    assert got == {i: 0 for i in range(8)}
    assert 1 <= stats["rounds"] <= 25
    assert spark.sparkContext.getLocalProperty("spark.jobGroup.id") is None
