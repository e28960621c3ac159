"""Positional pipes: ``truncate``, ``tail``, ``reverse``.

riko streams are ordered and these ops are defined positionally
(riko/modules/truncate.py:38-76 ``islice``; tail.py:38-67 ``deque``;
reverse.py:31-65 ``reversed(list(...))``).  DataFrames are unordered,
so every positional op here is defined **relative to an explicit
event-order spine** (SURVEY.md §7.1.2): a list of columns, default
``event_seq``/``warc_ts``, that totally orders the stream.

Scale notes: ``truncate``/``tail`` compile to TakeOrderedAndProject
(per-partition top-k + single merge — no global sort shuffle);
``reverse`` is just a global ordering marker.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from riko_spark.operators import register


from riko_spark.operators.ordering import asc_cols as _asc
from riko_spark.operators.ordering import desc_cols as _desc


@register("truncate", kind="operator", sub_kind="composer")
def truncate_op(df: DataFrame, conf: dict, order_by: list[str]) -> DataFrame:
    """First ``count`` rows from offset ``start`` in event order
    (riko islice semantics, riko/modules/truncate.py:38-76)."""
    start = int(conf.get("start", 0))
    count = int(conf["count"])
    out = df.orderBy(*_asc(order_by))
    if start:
        out = out.offset(start)
    return out.limit(count)


@register("tail", kind="operator", sub_kind="composer")
def tail_op(df: DataFrame, conf: dict, order_by: list[str]) -> DataFrame:
    """Last ``count`` rows, still emitted in ascending event order
    (riko deque semantics, riko/modules/tail.py:38-67).  Planned as
    top-k on the reversed order, then a cheap re-sort of k rows."""
    count = int(conf["count"])
    return df.orderBy(*_desc(order_by)).limit(count).orderBy(*_asc(order_by))


@register("reverse", kind="operator", sub_kind="composer")
def reverse_op(df: DataFrame, conf: dict | None, order_by: list[str]) -> DataFrame:
    """Reverse event order (riko/modules/reverse.py:31-65)."""
    return df.orderBy(*_desc(order_by))
