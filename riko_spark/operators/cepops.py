"""Registry adapters for the CEP pattern operators, so declared pipe
defs (and codegen) can use ``sequence_match`` / ``absence_match`` like
any other module.  Implementation lives in riko_spark/streaming/cep.py
(shared batch/streaming semantics)."""

from __future__ import annotations

from pyspark.sql import DataFrame

from riko_spark.operators import register


@register("sequence_match", kind="operator", sub_kind="aggregator")
def sequence_match_op(df: DataFrame, conf: dict, **_kwargs) -> DataFrame:
    from riko_spark.streaming.cep import sequence_match

    return sequence_match(
        df,
        list(conf["steps"]),
        key=conf.get("key", "user_id"),
        ts_col=conf.get("ts_col", "ts"),
        type_col=conf.get("type_col", "event_type"),
        within=conf.get("within", "30 minutes"),
        event_id_col=conf.get("event_id_col", "event_id"),
        watermark=conf.get("watermark"),
    )


@register("absence_match", kind="operator", sub_kind="aggregator")
def absence_match_op(df: DataFrame, conf: dict, **_kwargs) -> DataFrame:
    from riko_spark.streaming.cep import absence_match

    return absence_match(
        df,
        list(conf["steps"]),
        key=conf.get("key", "user_id"),
        ts_col=conf.get("ts_col", "ts"),
        type_col=conf.get("type_col", "event_type"),
        within=conf.get("within", "30 minutes"),
        event_id_col=conf.get("event_id_col", "event_id"),
        watermark=conf.get("watermark"),
    )


@register("threshold_match", kind="operator", sub_kind="aggregator")
def threshold_match_op(df: DataFrame, conf: dict, **_kwargs) -> DataFrame:
    from riko_spark.streaming.cep import threshold_match

    return threshold_match(
        df,
        conf["event_type"],
        int(conf["n"]),
        key=conf.get("key", "user_id"),
        ts_col=conf.get("ts_col", "ts"),
        type_col=conf.get("type_col", "event_type"),
        within=conf.get("within", "30 minutes"),
        event_id_col=conf.get("event_id_col", "event_id"),
        watermark=conf.get("watermark"),
    )
