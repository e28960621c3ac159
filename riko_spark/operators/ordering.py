"""Event-order spine parsing, shared by every order-sensitive operator.

An order spec is ``"field"`` or ``"field desc"``; the DAG compiler and
Flow propagate a sort's rules downstream in this form so positional
ops (truncate/tail/reverse/uniq/stop/first-seen) consume the stream's
*current* ordering, like riko's ordered generators.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column


def parse_spec(spec: str) -> tuple[str, bool]:
    name, _, d = spec.rpartition(" ")
    if name and d.lower() in ("asc", "desc"):
        return name, d.lower() == "desc"
    return spec, False


def asc_cols(order_by: list[str]) -> list[Column]:
    """Columns ordering the stream in its forward direction."""
    return [
        F.col(n).desc() if d else F.col(n).asc()
        for n, d in (parse_spec(c) for c in order_by)
    ]


def desc_cols(order_by: list[str]) -> list[Column]:
    """Reversed stream direction."""
    return [
        F.col(n).asc() if d else F.col(n).desc()
        for n, d in (parse_spec(c) for c in order_by)
    ]


def first_col(order_by: list[str]) -> Column:
    """The primary order column (for first-seen aggregates)."""
    return F.col(parse_spec(order_by[0])[0])
