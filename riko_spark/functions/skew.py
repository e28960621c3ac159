"""Skew handling: salting for hot keys (north-rule requirement).

The synthetic web corpus draws url domains Zipf-skewed (FIXTURES.md
§F1), so a plain ``groupBy(domain)`` or join on domain concentrates the
hottest key in one shuffle partition.  Two defenses, composable:

* AQE skew-join splitting — on by default in the session config
  (``spark.sql.adaptive.skewJoin.enabled``); handles joins.
* Explicit two-phase salted aggregation (below) — handles hot-key
  aggregations: key → (key, salt) pre-aggregate (spreads the hot key
  over ``salt`` partitions, map-side combine still applies), then a
  second exact aggregate over the partial results.

``salted_agg`` supports the algebraic aggregates a two-phase plan can
merge: count, sum, min, max.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

_MERGE = {"count": F.sum, "sum": F.sum, "min": F.min, "max": F.max}


def with_salt(df: DataFrame, buckets: int = 16, col_name: str = "__salt") -> DataFrame:
    """Uniform random-ish salt derived from a monotonic id (stable
    within a run, no Python RNG in the plan)."""
    return df.withColumn(col_name, F.pmod(F.monotonically_increasing_id(), F.lit(buckets)))


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    buckets: int = 16,
) -> DataFrame:
    """Two-phase aggregation immune to key skew.

    ``aggs``: {out_name: (fn, col)} with fn in {count,sum,min,max}.
    Phase 1 groups by (keys + salt) — the hot key fans out over
    ``buckets`` reducers; phase 2 merges partials exactly.
    """
    for fn, _ in aggs.values():
        if fn not in _MERGE:
            raise ValueError(f"salted_agg supports {sorted(_MERGE)}, got {fn!r}")
    salted = with_salt(df, buckets)
    phase1 = salted.groupBy(*keys, "__salt").agg(*[
        (F.count(F.lit(1)) if fn == "count" else getattr(F, fn)(F.col(col))).alias(name)
        for name, (fn, col) in aggs.items()
    ])
    return phase1.groupBy(*keys).agg(*[
        _MERGE[fn](F.col(name)).alias(name) for name, (fn, _) in aggs.items()
    ])


def explain_skew(df: DataFrame, key: str, top: int = 5) -> list[tuple]:
    """Diagnostic: per-key row counts (the thing salting defuses)."""
    rows = (
        df.groupBy(key).count().orderBy(F.col("count").desc()).limit(top).collect()
    )
    return [(r[key], r["count"]) for r in rows]
