"""The universal option layer: field / assign / emit / skip_if / count.

Reference semantics (riko/modules/_decorators.py:186-198, 297-323;
riko/modules/_assignment.py:64-136): every pipe call accepts
cross-cutting options that control where the input comes from and how
the result is folded back into the item.  Reproducing riko's row shapes
requires reproducing this fold logic, once, generically:

* ``field``    — input column for the processor (default ``content``)
* ``assign``   — result column name (default: module name; ``content``
                 for sources)
* ``emit``     — replace the row with the raw result instead of
                 assigning it as a column
* ``skip_if``  — SQL boolean expression; rows where it is true pass
                 through untouched
* ``count``    — for multi-valued results: ``'first'`` keeps one,
                 ``'all'`` keeps every value (one output row each)

Restriction vs the reference: riko's ``emit`` + ``skip_if`` lets a
skipped row keep its full dict shape while emitted rows are bare
results — heterogeneous shapes a fixed-schema DataFrame cannot mix.
Here ``skip_if`` under ``emit`` emits the untransformed input value
instead; under assign mode (the common case) semantics match riko.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def skip_pred(skip_if) -> Column | None:
    if skip_if is None:
        return None
    return F.expr(skip_if) if isinstance(skip_if, str) else skip_if


def apply_scalar(
    df: DataFrame,
    result: Column,
    *,
    assign: str,
    emit: bool = False,
    skip_if=None,
    original: Column | None = None,
) -> DataFrame:
    """Fold a scalar (one value per row) processor result into the frame.

    ``original`` is the pass-through value used when ``skip_if`` holds
    (defaults to the existing ``assign`` column, or NULL).
    """
    pred = skip_pred(skip_if)
    if pred is not None:
        if original is None:
            original = F.col(assign) if assign in df.columns else F.lit(None)
        result = F.when(pred, original).otherwise(result)
    if emit:
        return df.select(result.alias(assign))
    return df.withColumn(assign, result)


def apply_multi(
    df: DataFrame,
    results: Column,
    *,
    assign: str,
    emit: bool = True,
    skip_if=None,
    count: str = "all",
    original: Column | None = None,
) -> DataFrame:
    """Fold an array-valued processor result (riko: processors that
    yield several items, e.g. tokenizer) — explode under ``count='all'``,
    keep the first element under ``count='first'``."""
    if count == "first":
        return apply_scalar(
            df,
            F.element_at(results, 1),
            assign=assign,
            emit=emit,
            skip_if=skip_if,
            original=original,
        )
    pred = skip_pred(skip_if)
    if pred is not None:
        passthrough = original if original is not None else F.lit(None)
        results = F.when(pred, F.array(passthrough)).otherwise(results)
    exploded = df.withColumn(assign, F.explode(results))
    return exploded.select(assign) if emit else exploded
