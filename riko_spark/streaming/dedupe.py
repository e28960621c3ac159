"""Streaming dedupe: the principled version of riko's ``uniq``.

riko bounds dedupe state with a 1024-value sliding deque
(riko/modules/uniq.py:34-75) — a poor man's state TTL.  Structured
Streaming's ``dropDuplicatesWithinWatermark`` is the same idea with a
time-bounded state store: a key is remembered until the watermark
passes it, then evicted.  State lives in the (RocksDB) state store and
is checkpoint-recoverable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def dedupe_within_watermark(
    df: DataFrame,
    keys: list[str],
    ts_col: str = "warc_ts",
    delay: str = "30 seconds",
) -> DataFrame:
    if df.isStreaming:
        return df.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(keys)
    return df.dropDuplicates(keys)
