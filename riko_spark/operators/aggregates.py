"""Aggregator pipes: ``count``, ``sum``, ``aggregate``.

Reference:
  * count — riko/modules/count.py:34-84; grouped path uses
    riko/utils.py:720-731 ``group_by`` (keys stringified, missing ->
    the string 'None', groups in first-seen order).
  * sum — riko/modules/sum.py:36-93; Decimal arithmetic.
  * aggregate — riko/modules/aggregate.py:33-85; arbitrary
    ``func(stream) -> item(s)`` — the UDAF escape hatch.

Scale notes: grouped count/sum are hash aggregations with map-side
partial aggregation (Spark plans partial_count/partial_sum before the
exchange); first-seen order is recovered relationally by also
aggregating ``min(order col)`` instead of sorting the whole input.
"""

from __future__ import annotations

from collections.abc import Callable

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from riko_spark.operators import register
from riko_spark.operators.ordering import first_col

_DEC = "decimal(38,18)"


def _str_key(col_name: str):
    # riko stringifies group keys; missing values become 'None'
    # (riko/utils.py:720-731)
    return F.coalesce(F.col(col_name).cast("string"), F.lit("None"))


@register("count", kind="operator", sub_kind="aggregator")
def count_op(
    df: DataFrame, conf: dict | None = None, order_by: list[str] | None = None
) -> DataFrame:
    """No key: one row ``{count: N}``.  With ``count_key``: one row per
    stringified group value, carrying ``first_seen`` (min event order)
    so the consumer can reproduce riko's first-seen group ordering
    without a global sort."""
    conf = conf or {}
    key = conf.get("count_key")
    if not key:
        return df.agg(F.count(F.lit(1)).alias("count"))
    grouped = df.groupBy(_str_key(key).alias(key))
    if order_by:
        out = grouped.agg(
            F.count(F.lit(1)).alias("count"),
            F.min(first_col(order_by)).alias("first_seen"),
        )
        return out.orderBy("first_seen")
    return grouped.agg(F.count(F.lit(1)).alias("count"))


@register("fused_token_count", kind="operator", sub_kind="aggregator")
def fused_token_count_op(
    df: DataFrame, conf: dict | None = None, order_by: list[str] | None = None
) -> DataFrame:
    """Explode-elimination fusion of ``tokenizer → count`` (installed by
    the DAG compiler's logical rewrite, riko_spark.plans.rewrite).

    Counting exploded token rows equals summing per-row token-array
    sizes — same result, but the shuffle input stays one row per
    document instead of one row per token (~100× less exchanged data on
    webtext).  Parity details: rows whose field is NULL contribute 0;
    a group whose every row has 0 tokens yields no exploded rows, so it
    is filtered out; ``first_seen`` is the min order value over rows
    that contributed at least one token."""
    conf = conf or {}
    n = _token_count_col(conf)
    key = conf.get("count_key")
    if not key:
        return df.agg(F.coalesce(F.sum(n), F.lit(0)).alias("count"))
    grouped = df.groupBy(_str_key(key).alias(key))
    if order_by:
        out = grouped.agg(
            F.sum(n).alias("count"),
            F.min(F.when(n > 0, first_col(order_by))).alias("first_seen"),
        )
        return out.filter(F.col("count") > 0).orderBy("first_seen")
    return grouped.agg(F.sum(n).alias("count")).filter(F.col("count") > 0)


def _token_count_col(conf: dict):
    """Per-row token count for the fused aggregates.  Stripping cannot
    change the count, so the common path is pure codegen —
    ``size(array_remove(split(...), ''))`` with no higher-order
    function.  ``dedupe`` counts distinct STRIPPED tokens, so only that
    path pays for the strip transform."""
    import pyspark.sql.functions as F  # local alias for clarity

    from riko_spark.operators.strings import tokenize_col

    field = conf.get("field", "content")
    delimiter = conf.get("delimiter", ",")
    if conf.get("dedupe"):
        toks = tokenize_col(F.col(field), delimiter=delimiter, dedupe=True)
        return F.coalesce(F.size(toks), F.lit(0))
    quoted = "\\Q" + delimiter + "\\E"
    raw = F.array_remove(F.split(F.col(field).cast("string"), quoted, -1), "")
    return F.coalesce(F.size(raw), F.lit(0))


def _derive_cols(df: DataFrame, derive: dict | None) -> DataFrame:
    """Optional conf ``derive``: {name: SQL expr} columns computed
    before aggregation (same SQL-expression vocabulary as skip_if)."""
    for name, expr in (derive or {}).items():
        df = df.withColumn(name, F.expr(expr))
    return df


@register("windowed_count", kind="operator", sub_kind="aggregator")
def windowed_count_op(
    df: DataFrame, conf: dict | None = None, order_by: list[str] | None = None
) -> DataFrame:
    """Event-time tumbling-window row count per key — the north rule's
    windowed aggregate as a declarable pipe-def module (batch and
    streaming; watermark honored when the input is a stream).  Conf:
    ts_col, window, watermark, keys, name, derive."""
    conf = conf or {}
    from riko_spark.streaming.windows import tumbling_agg

    df = _derive_cols(df, conf.get("derive"))
    return tumbling_agg(
        df,
        ts_col=conf.get("ts_col", "warc_ts"),
        window=conf.get("window", "10 minutes"),
        watermark=conf.get("watermark"),
        keys=list(conf.get("keys") or []),
        aggs={conf.get("name", "n"): "count"},
    )


@register("fused_token_windowed_count", kind="operator", sub_kind="aggregator")
def fused_token_windowed_count_op(
    df: DataFrame, conf: dict | None = None, order_by: list[str] | None = None
) -> DataFrame:
    """Explode-elimination fusion of ``tokenizer → windowed_count``
    (installed by riko_spark.plans.rewrite): per-(window × keys) token
    totals as a sum of per-document token-array sizes — the shuffle
    carries one row per document instead of one per token.  Groups
    whose rows contribute zero tokens are absent, matching the
    exploded plan exactly."""
    conf = conf or {}
    df = _derive_cols(df, conf.get("derive"))
    n = _token_count_col(conf)
    ts_col = conf.get("ts_col", "warc_ts")
    if conf.get("watermark") and df.isStreaming:
        df = df.withWatermark(ts_col, conf["watermark"])
    name = conf.get("name", "n")
    keys = list(conf.get("keys") or [])
    groups = [F.window(F.col(ts_col), conf.get("window", "10 minutes")).alias("win")] + [
        F.col(k) for k in keys
    ]
    out = (
        df.withColumn("__ntok", n)
        .groupBy(*groups)
        .agg(F.sum("__ntok").alias(name))
        .filter(F.col(name) > 0)
    )
    return out.select(
        F.col("win.start").alias("window_start"),
        F.col("win.end").alias("window_end"),
        *[F.col(k) for k in keys],
        F.col(name),
    )


@register("sum", kind="operator", sub_kind="aggregator")
def sum_op(df: DataFrame, conf: dict | None = None) -> DataFrame:
    """Decimal sum of ``sum_key`` (default ``content``), optionally per
    ``group_key`` (riko/modules/sum.py:36-93)."""
    conf = conf or {}
    sum_key = conf.get("sum_key", "content")
    group_key = conf.get("group_key")
    total = F.sum(F.col(sum_key).try_cast(_DEC)).alias("sum")
    if group_key:
        return df.groupBy(_str_key(group_key).alias(group_key)).agg(total)
    return df.agg(total)


@register("aggregate", kind="operator", sub_kind="aggregator")
def aggregate_op(
    df: DataFrame,
    conf: dict | None = None,
    func: Callable[[pd.DataFrame], pd.DataFrame] | None = None,
    schema=None,
    group_key: str | None = None,
) -> DataFrame:
    """Arbitrary stream-level aggregation (riko/modules/aggregate.py).

    ``func`` is pandas DataFrame -> pandas DataFrame.  With
    ``group_key`` it runs per group (distributed, shuffle on the key);
    without, it runs once over the whole stream — inherently
    single-group, use only for small/final results (riko's version has
    the same totality).
    """
    if func is None or schema is None:
        raise ValueError("aggregate requires func= and schema=")
    if group_key:
        return df.groupBy(group_key).applyInPandas(lambda pdf: func(pdf), schema)
    return (
        df.withColumn("__g", F.lit(1))
        .groupBy("__g")
        .applyInPandas(lambda pdf: func(pdf.drop(columns="__g")), schema)
    )
