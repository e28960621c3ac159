"""The ``filter`` pipe: rule-based permit/block.

Reference: riko/modules/filter.py — op table at :52-69, arg coercion
:80-115, rule evaluation :118-151, combine/permit loop :193-214.

Semantics reproduced:
  * rules ``{field, op, value}``; ``combine: and|or``; ``permit: bool``
  * ``contains``/``doesnotcontain`` lower-case both sides AND require a
    truthy x (falsy x fails both — riko's ``x and y.lower() in ...``)
  * ``matches`` = ``re.search`` → ``rlike``
  * numeric ops (atleast/atmost, or any op with a numeric value)
    coerce through Decimal → ``try_cast('decimal(38,18)')``
  * after/before parse dates → ``try_cast('timestamp')``
  * failed coercion (NULL) makes the rule False, matching riko's
    ``has_value`` guard returning False
  * ``stop=True`` stops the stream at the first blocked row — order-
    dependent; supported only with an explicit ``order_by`` spine and
    documented as a restricted (single-ordering) operation.

Catalyst note: everything compiles to native predicates, so pushdown
to the parquet/Iceberg scan is preserved (no UDFs here).
"""

from __future__ import annotations

from functools import reduce

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame
from pyspark.sql import Window

from riko_spark.functions.casts import truthy
from riko_spark.operators import register

_DEC = "decimal(38,18)"


def _dtype(df: DataFrame, field: str) -> str:
    for name, dtype in df.dtypes:
        if name.lower() == field.lower():
            return dtype
    return "string"


def _is_number(v) -> bool:
    if isinstance(v, bool):
        return False
    if isinstance(v, (int, float)):
        return True
    try:
        float(str(v))
        return True
    except (TypeError, ValueError):
        return False


def rule_to_column(df: DataFrame, rule: dict) -> Column:
    """One rule {field, op, value} -> boolean Column (riko
    filter.parse_rule, riko/modules/filter.py:118-151)."""
    field = rule["field"]
    op = rule.get("op", "eq")
    value = rule.get("value")
    x = F.col(field)

    if op in ("truthy",):
        return truthy(x, _dtype(df, field))
    if op in ("falsy",):
        return ~truthy(x, _dtype(df, field))
    if value is None:
        return F.lit(False)

    if op in ("contains", "doesnotcontain"):
        xs = F.lower(x.cast("string"))
        hit = xs.contains(str(value).lower())
        ok = truthy(x, _dtype(df, field))
        return ok & hit if op == "contains" else ok & ~hit
    if op == "matches":
        return x.cast("string").rlike(str(value))

    numeric = op in ("atleast", "atmost") or _is_number(value)
    dateish = op in ("after", "before") and not _is_number(value)
    if dateish:
        xv: Column = x.try_cast("timestamp")
        yv: Column = F.lit(str(value)).try_cast("timestamp")
    elif numeric:
        xv = x.try_cast(_DEC)
        yv = F.lit(str(value)).try_cast(_DEC)
    else:
        xv = x.cast("string")
        yv = F.lit(str(value))

    cmp = {
        "eq": xv == yv, "is": xv == yv, "isnot": xv != yv,
        "greater": xv > yv, "after": xv > yv,
        "less": xv < yv, "before": xv < yv,
        "atleast": xv >= yv, "atmost": xv <= yv,
    }
    try:
        # no per-rule coalesce: a NULL predicate is dropped by WHERE
        # exactly like False, and wrapping in coalesce would defeat
        # parquet predicate pushdown (PushedFilters goes empty)
        return cmp[op]
    except KeyError:
        raise ValueError(f"unknown filter op: {op!r}") from None


def build_predicate(df: DataFrame, conf: dict) -> Column:
    rules = conf.get("rule") or []
    if isinstance(rules, dict):
        rules = [rules]
    combine = (conf.get("combine") or "and").lower()
    permit = conf.get("permit", True)
    cols = [rule_to_column(df, r) for r in rules]
    if not cols:
        pred = F.lit(True)
    elif combine == "or":
        pred = reduce(lambda a, b: a | b, cols)
    else:
        pred = reduce(lambda a, b: a & b, cols)
    if permit:
        return pred
    # negation must treat NULL as False first (riko: an unevaluable
    # block-rule does not block), then invert
    return ~F.coalesce(pred, F.lit(False))


@register("filter", kind="operator", sub_kind="composer")
def filter_op(df: DataFrame, conf: dict, order_by: list[str] | None = None) -> DataFrame:
    """Apply rule-based filtering; native predicates only (pushdown-safe)."""
    pred = build_predicate(df, conf)
    if conf.get("stop"):
        if not order_by:
            raise ValueError("filter(stop=True) requires order_by (event-order spine)")
        # keep the prefix before the first blocked row (riko
        # filter.py:213-214).  Two-pass plan: a tiny all-reduce finds
        # the min ordering key among blocked rows, then a plain filter
        # keeps everything strictly before it.  No global window — an
        # unpartitioned running-max Window funnels ALL rows through one
        # task; this shape is two parallel scans + a 1-row broadcast.
        from riko_spark.operators.ordering import asc_cols, parse_spec

        specs = [parse_spec(c) for c in order_by]
        if not any(d for _, d in specs):
            key = F.struct(*[F.col(n) for n, _ in specs])
            first_blocked = (
                df.filter(~F.coalesce(pred, F.lit(False)))
                .agg(F.min(key).alias("__stop_at"))
            )
            return (
                df.join(F.broadcast(first_blocked))
                .filter(F.col("__stop_at").isNull() | (key < F.col("__stop_at")))
                .drop("__stop_at")
            )
        # mixed-direction spine: struct-min has no per-field direction —
        # fall back to the single-pass global window (bounded use only)
        w = Window.orderBy(*asc_cols(order_by)).rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        blocked_so_far = F.max(
            F.when(~F.coalesce(pred, F.lit(False)), F.lit(1)).otherwise(F.lit(0))
        ).over(w)
        return (
            df.withColumn("__blocked", blocked_so_far)
            .filter(F.col("__blocked") == 0)
            .drop("__blocked")
        )
    return df.filter(pred)
