"""Operator registry.

Mirrors the reference's module taxonomy (riko/modules/_decorators.py:
``@processor`` / ``@operator`` / ``@splitter``): every pipe is a named,
composable function ``(df: DataFrame, conf: dict, **kwargs) -> DataFrame``
registered under its riko name.  The DAG compiler (riko_spark.plans) and
the fluent ``Flow`` wrapper resolve operators through this registry, the
way riko resolves ``riko.modules.<name>.pipe`` (riko/compile.py:467-506).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from pyspark.sql import DataFrame

OpFn = Callable[..., DataFrame]

_REGISTRY: dict[str, dict[str, Any]] = {}


class UnsupportedModuleError(KeyError):
    """Unknown operator name (riko/compile.py:503)."""


def register(name: str, kind: str = "processor", sub_kind: str = "transformer"):
    """Register an operator under its riko pipe name.

    kind: 'processor' (row-local, parallelizable) | 'operator'
    (needs stream context: aggregations, sorts, joins) | 'splitter'.
    sub_kind: 'source' | 'transformer' | 'composer' | 'aggregator'.
    """

    def deco(fn: OpFn) -> OpFn:
        _REGISTRY[name] = {"fn": fn, "kind": kind, "sub_kind": sub_kind}
        return fn

    return deco


def fanout_small_scan(df: DataFrame, min_fraction: float = 0.5) -> DataFrame:
    """Scale-adaptive scan fan-out (guide §2.5 "input skew: one huge
    unsplittable file ... repartition immediately after the read").

    A single-row-group parquet file is unsplittable, so every
    projection downstream of its scan runs in ONE task regardless of
    split config — the sandbox sf tables are exactly this shape, and
    a real crawl shard can be too.  When the input's planned
    partition count is below ``min_fraction`` x the cluster's default
    parallelism, round-robin repartition to default parallelism so
    the expensive per-row work (tokenize/shingle/hash/normalize) that
    CPU-heavy operators hang below the scan is spread across every
    core.  On healthy multi-split inputs (the 100 TB case) this is a
    no-op — no shuffle is added.  Round-robin repartition is
    deterministic under retries (sort-before-repartition is on by
    default, SPARK-23207) and none of the operators that call this
    depend on row-to-partition placement for their results.

    Streaming frames and frames whose partition count cannot be
    planned pass through untouched.  Inputs whose plan already
    contains a SHUFFLE exchange are left alone without probing: their
    downstream parallelism is the shuffle width, and (under AQE)
    materializing such a plan's RDD to count partitions would execute
    its query stages at plan-build time.  Shuffle-free plans probe
    ``df.rdd`` — a single result stage, so no job runs (a broadcast
    build on the small side of a broadcast join is the only possible
    plan-time work, bounded by the broadcast size).
    """
    if df.isStreaming:
        return df
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    try:
        plan = df._jdf.queryExecution().sparkPlan().toString()
        if any(tok in plan for tok in (
                "Exchange hashpartitioning", "Exchange RoundRobinPartitioning",
                "Exchange rangepartitioning", "Exchange SinglePartition")):
            return df
        nparts = df.rdd.getNumPartitions()
    except Exception:  # noqa: BLE001 — unplannable (e.g. no scan yet)
        return df
    if nparts < max(1.0, target * min_fraction):
        return df.repartition(target)
    return df


def get_operator(name: str) -> OpFn:
    try:
        return _REGISTRY[name]["fn"]
    except KeyError:
        raise UnsupportedModuleError(f"unknown operator: {name!r}") from None


def operator_meta(name: str) -> dict[str, Any]:
    if name not in _REGISTRY:
        raise UnsupportedModuleError(f"unknown operator: {name!r}")
    return {k: v for k, v in _REGISTRY[name].items() if k != "fn"}


def list_operators() -> list[str]:
    return sorted(_REGISTRY)


def _load_all() -> None:
    # populate the registry; import order is irrelevant
    from riko_spark.operators import (  # noqa: F401
        aggregates,
        cepops,
        cleaning,
        dedupe,
        dsir,
        filters,
        graph,
        limits,
        lm,
        misc,
        multimodal,
        packing,
        robots,
        sampling,
        setops,
        similarity,
        sorts,
        strings,
        structure,
        textstats,
        webtext,
    )


_load_all()
