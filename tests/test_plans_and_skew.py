"""Physical-plan shape assertions (pushdown, pruning, broadcast,
top-k) and salted-aggregation equivalence.

The 100 TB design rests on these plan properties — a regression here
is a performance bug even when results stay correct.
"""

import pyspark.sql.functions as F

from riko_spark.functions.skew import explain_skew, salted_agg
from riko_spark.plans.flow import Flow
from riko_spark.sources.pages import pages_fixture

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_filter_pushes_to_scan(spark):
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    out = Flow(orders).filter(
        {"rule": [{"field": "o_orderstatus", "op": "is", "value": "F"}]}
    ).df.select("o_orderkey")
    plan = _plan(out)
    assert "PushedFilters: [" in plan and "IsNotNull(o_orderstatus)" in plan
    # column pruning: the scan must read only the 2 needed columns
    assert "ReadSchema: struct<o_orderkey:bigint,o_orderstatus:string>" in plan


def test_small_dim_join_broadcasts(spark):
    cust = spark.read.parquet(f"{SF}/customer.parquet")
    nat = spark.read.parquet(f"{SF}/nation.parquet")
    out = Flow(cust).join(
        {"join_key": "c_nationkey", "other_join_key": "n_nationkey"},
        other=nat, broadcast_other=True,
    ).df
    assert "BroadcastHashJoin" in _plan(out)


def test_sort_limit_plans_top_k(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    out = (
        Flow(li, order_by=["l_orderkey"])
        .sort({"rule": [{"field": "l_extendedprice", "dir": "desc"}]})
        .df.limit(10)
    )
    # TakeOrderedAndProject = per-partition top-k + single merge,
    # NOT a global sort exchange
    assert "TakeOrderedAndProject" in _plan(out)


def test_tail_plans_top_k(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    out = Flow(ev, order_by=["ts", "event_id"]).tail({"count": 5}).df
    assert "TakeOrderedAndProject" in _plan(out)


def test_grouped_agg_is_partial(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    out = Flow(ev).count({"count_key": "event_type"}).df
    plan = _plan(out)
    assert "partial_count" in plan  # map-side combine before exchange


def test_extract_stage_has_no_exchange(spark):
    path = pages_fixture(n=200)
    df = spark.read.parquet(path)
    plan = _plan(Flow(df).extract(None).df)
    assert "Exchange" not in plan
    assert "ArrowEvalPython" in plan  # vectorized, not row-at-a-time


def test_filter_stop_has_no_global_window(spark):
    """filter(stop=True) on an ascending spine must plan as the
    two-pass min-aggregate + broadcast, not an unpartitioned Window
    (which funnels every row through one task)."""
    ev = spark.read.parquet(f"{SF}/events.parquet")
    out = Flow(ev, order_by=["event_id"]).filter(
        {"rule": [{"field": "value", "op": "atmost", "value": 10_000}],
         "stop": True}
    ).df
    plan = _plan(out)
    assert "Window" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    # semantics: prefix strictly before the first blocked event
    rows = [r["event_id"] for r in out.select("event_id").collect()]
    all_rows = [
        (r["event_id"], r["value"])
        for r in ev.select("event_id", "value").orderBy("event_id").collect()
    ]
    stop_at = next((eid for eid, v in all_rows if not (v <= 10_000)), None)
    expected = [eid for eid, _ in all_rows if stop_at is None or eid < stop_at]
    assert sorted(rows) == expected


def test_lsh_bucket_cap_bounds_fanout(spark):
    """A degenerate bucket (every row identical) must be excluded from
    the self-join by cap_buckets: candidate pairs stay bounded instead
    of going O(n²) on the boilerplate bucket."""
    import pytest

    from riko_spark.operators.dedupe import minhash_lsh_op, simhash_neardup_op

    boiler = [{"doc_id": i, "text": "same boilerplate header row " * 6}
              for i in range(40)]
    uniq = [{"doc_id": 100 + i, "text": f"unique document body {i} " * 6}
            for i in range(5)]
    df = spark.createDataFrame(boiler + uniq)
    capped = minhash_lsh_op(df, {"num_hashes": 16, "bands": 4,
                                 "max_bucket_size": 10})
    assert capped.count() == 0  # the 40-dup bucket is excluded
    uncapped = minhash_lsh_op(df, {"num_hashes": 16, "bands": 4,
                                   "max_bucket_size": None})
    assert uncapped.count() == 40 * 39 // 2
    # drop accounting: the warning path is async/best-effort (watcher
    # thread), so assert through the authoritative CAP_OBSERVATIONS
    # accessor instead of pytest.warns
    from riko_spark.operators.dedupe import CAP_OBSERVATIONS

    minhash_lsh_op(df, {"num_hashes": 16, "bands": 4,
                        "max_bucket_size": 10, "log_dropped": True}).count()
    got = CAP_OBSERVATIONS["minhash_lsh"].get
    assert got["dropped_buckets"] >= 1 and got["dropped_rows"] >= 40
    capped_sh = simhash_neardup_op(df, {"max_bucket_size": 10})
    assert capped_sh.count() == 0


def test_salted_agg_equivalence(spark):
    path = pages_fixture(n=2_000)
    df = spark.read.parquet(path).withColumn(
        "domain", F.parse_url(F.col("url"), F.lit("HOST"))
    )
    direct = {
        (r["domain"]): (r["n"], r["first_ts"])
        for r in df.groupBy("domain").agg(
            F.count(F.lit(1)).alias("n"), F.min("warc_ts").alias("first_ts")
        ).collect()
    }
    salted = {
        (r["domain"]): (r["n"], r["first_ts"])
        for r in salted_agg(
            df, ["domain"], {"n": ("count", "*"), "first_ts": ("min", "warc_ts")}
        ).collect()
    }
    assert salted == direct
    # and the corpus really is skewed (Zipf) — salting has a job to do
    top = explain_skew(df, "domain", top=1)
    assert top[0][1] > (2_000 / 50) * 5  # hottest domain ≫ uniform share


def test_bucketed_join_is_exchange_free(spark, tmp_path):
    """Both sides written bucketed+sorted on the join key with the same
    bucket count: the SortMergeJoin plans with NO Exchange — the
    storage-layout half of the 100 TB shuffle story."""
    from riko_spark.functions.bucketing import bucketed_join, write_bucketed

    o = spark.read.parquet(f"{SF}/orders.parquet").select("o_orderkey", "o_totalprice")
    li = spark.read.parquet(f"{SF}/lineitem.parquet").select("l_orderkey", "l_quantity")
    write_bucketed(o, "b_orders", "o_orderkey", buckets=8)
    write_bucketed(li, "b_lineitem", "l_orderkey", buckets=8)
    # disable broadcast so the planner picks SortMergeJoin — at real
    # fact×fact scale neither side broadcasts and bucketing is what
    # removes the exchange (on tiny test tables broadcast would win
    # and the planner rightly ignores bucketing)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, "b_lineitem", "b_orders",
                               "l_orderkey", "o_orderkey")
        plan = _plan(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
        # sanity: same rows as the plain (shuffling) join
        plain = li.join(o, li.l_orderkey == o.o_orderkey).count()
        assert joined.count() == plain
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
