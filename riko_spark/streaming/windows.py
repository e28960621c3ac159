"""Event-time windowed aggregations with watermarks.

The reference has no windowing at all (SURVEY.md §2.9) — these come
from the north rule and are designed directly on Structured Streaming:
``withWatermark`` + ``window()`` / ``session_window()``.  Late rows
beyond the watermark are dropped (the documented late-data policy).

All aggregations here are also valid on batch DataFrames (window() is
a plain grouping expression), which is how the stream≡batch parity
tests work.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def _agg_exprs(aggs: dict[str, str] | None) -> list[Column]:
    """{'out_name': 'count' | 'sum:col' | 'min:col' | ...} -> exprs."""
    aggs = aggs or {"n_docs": "count"}
    out = []
    for name, spec in aggs.items():
        if spec == "count":
            out.append(F.count(F.lit(1)).alias(name))
        else:
            fn, col = spec.split(":", 1)
            out.append(getattr(F, fn)(F.col(col)).alias(name))
    return out


def tumbling_agg(
    df: DataFrame,
    ts_col: str = "warc_ts",
    window: str = "10 minutes",
    watermark: str | None = "30 seconds",
    keys: list[str] | None = None,
    aggs: dict[str, str] | None = None,
) -> DataFrame:
    """Tumbling-window aggregation keyed on event time (+ extra keys)."""
    if watermark and df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    groups = [F.window(F.col(ts_col), window).alias("win")] + [
        F.col(k) for k in (keys or [])
    ]
    out = df.groupBy(*groups).agg(*_agg_exprs(aggs))
    return out.select(
        F.col("win.start").alias("window_start"),
        F.col("win.end").alias("window_end"),
        *[F.col(k) for k in (keys or [])],
        *[F.col(n) for n in (aggs or {"n_docs": "count"})],
    )


def sliding_count(
    df: DataFrame,
    ts_col: str = "warc_ts",
    window: str = "10 minutes",
    slide: str = "5 minutes",
    watermark: str | None = "30 seconds",
    keys: list[str] | None = None,
) -> DataFrame:
    if watermark and df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    groups = [F.window(F.col(ts_col), window, slide).alias("win")] + [
        F.col(k) for k in (keys or [])
    ]
    out = df.groupBy(*groups).agg(F.count(F.lit(1)).alias("n_docs"))
    return out.select(
        F.col("win.start").alias("window_start"),
        F.col("win.end").alias("window_end"),
        *[F.col(k) for k in (keys or [])],
        "n_docs",
    )


def session_agg(
    df: DataFrame,
    ts_col: str = "warc_ts",
    gap: str = "5 minutes",
    watermark: str | None = "30 seconds",
    keys: list[str] | None = None,
    aggs: dict[str, str] | None = None,
) -> DataFrame:
    """Session windows: events per key separated by ≤ gap merge."""
    if watermark and df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    groups = [F.session_window(F.col(ts_col), gap).alias("win")] + [
        F.col(k) for k in (keys or [])
    ]
    out = df.groupBy(*groups).agg(*_agg_exprs(aggs))
    return out.select(
        F.col("win.start").alias("session_start"),
        F.col("win.end").alias("session_end"),
        *[F.col(k) for k in (keys or [])],
        *[F.col(n) for n in (aggs or {"n_docs": "count"})],
    )
