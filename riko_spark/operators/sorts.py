"""The ``sort`` pipe: multi-rule stable sort with typed defaults.

Reference: riko/modules/sort.py (reducer :37-41, rule parser :95-133)
and riko/utils.py:678-717 ``def_itemgetter``: each rule is
``{field, dir: asc|desc, type?}``; rule 1 is the PRIMARY key (riko
applies reversed rules through Python's stable sort); missing or
uncastable values sort as the type default ('' / 0 / epoch).

Spark mapping: one ``orderBy`` with the rules in declared order —
relationally identical to riko's reversed-stable-sort trick — plus the
event-order spine appended as final tiebreaker to reproduce stability.
Sort keys wrap in ``coalesce(try_cast(...), default)`` so NULL/bad
values land where riko's defaults put them.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from riko_spark.functions.casts import cast_with_default
from riko_spark.operators import register


def sort_keys(conf: dict, order_by: list[str] | None = None) -> list[Column]:
    rules = conf.get("rule") or []
    if isinstance(rules, dict):
        rules = [rules]
    keys: list[Column] = []
    for r in rules:
        col = F.col(r["field"])
        if r.get("type"):
            col = cast_with_default(col, r["type"])
        direction = (r.get("dir") or r.get("sort_dir") or "asc").lower()
        keys.append(col.desc() if direction == "desc" else col.asc())
    if order_by:
        from riko_spark.operators.ordering import asc_cols

        keys.extend(asc_cols(order_by))
    return keys


@register("sort", kind="operator", sub_kind="composer")
def sort_op(df: DataFrame, conf: dict, order_by: list[str] | None = None) -> DataFrame:
    """Eager multi-rule sort (riko/modules/sort.py:37-41).

    At scale this is a range-partitioned global sort (Spark samples
    boundaries); prefer sort+limit (see limits.truncate) when only a
    prefix is needed — Catalyst then plans TakeOrderedAndProject with
    no full shuffle.
    """
    return df.orderBy(*sort_keys(conf, order_by))
