"""Stateful stream-stream join — riko's 'pipe join/merge' on streams.

Batch semantics come from riko/modules/join.py:44-124 (keyed inner
equi-join, optional lower-casing, both-NULL keys never match — see
operators/setops.py).  On streams both sides buffer in the state store,
bounded by watermarks plus an event-time range condition so state is
evictable (Spark requires it for append-mode stream-stream joins).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    join_key: str,
    other_join_key: str | None = None,
    left_ts: str = "warc_ts",
    right_ts: str = "warc_ts",
    watermark: str = "30 seconds",
    within: str = "10 minutes",
    lower: bool = False,
    how: str = "inner",
) -> DataFrame:
    """Inner join of two streams on a key, matched within an event-time
    band of ``within`` (|left.ts - right.ts| bounds state retention)."""
    other_join_key = other_join_key or join_key
    lts, rts = f"__l_{left_ts}", f"__r_{right_ts}"
    lk = F.col(join_key)
    rk = F.col(f"__r_{other_join_key}")
    if lower:
        lk, rk = F.lower(lk.cast("string")), F.lower(rk.cast("string"))

    if left.isStreaming:
        left = left.withWatermark(left_ts, watermark)
    r = right
    for c in right.columns:
        r = r.withColumnRenamed(c, f"__r_{c}")
    if right.isStreaming:
        r = r.withWatermark(rts, watermark)

    left = left.withColumnRenamed(left_ts, lts)
    cond = (lk == rk) & (
        F.col(lts).between(
            F.col(rts) - F.expr(f"INTERVAL {within}"),
            F.col(rts) + F.expr(f"INTERVAL {within}"),
        )
    )
    joined = left.join(r, on=cond, how=how)
    # restore friendly names; right columns keep the __r_ prefix stripped
    # where no collision exists
    out = joined.withColumnRenamed(lts, left_ts)
    for c in right.columns:
        target = c if c not in left.columns and c != left_ts else f"right_{c}"
        out = out.withColumnRenamed(f"__r_{c}", target)
    return out
