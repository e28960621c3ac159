"""Cast-with-default: the reference's never-raise type coercion.

riko casts values on demand and returns a typed default on failure
instead of raising (riko/cast.py:280-292 CAST_SWITCH defaults;
:353-422 ``cast()`` catching TypeError/ValueError/InvalidOperation):
float→nan, decimal→Decimal('NaN'), int→0, text→'', date/datetime→epoch,
bool→False.  Spark equivalent: ``try_cast`` (NULL on failure) folded
with ``coalesce`` to the same defaults.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# type name -> (spark cast type, default literal SQL)
CAST_DEFAULTS: dict[str, tuple[str, str]] = {
    "int": ("bigint", "0"),
    "float": ("double", "double('NaN')"),
    "decimal": ("decimal(38,18)", "NULL"),  # Spark decimal has no NaN; stays NULL
    "text": ("string", "''"),
    "date": ("date", "date'1970-01-01'"),
    "datetime": ("timestamp", "timestamp'1970-01-01 00:00:00'"),
    "bool": ("boolean", "false"),
}


def cast_with_default(col: Column, cast_type: str) -> Column:
    """``try_cast`` + riko's default-on-failure (riko/cast.py:280-292).

    Divergence note: Spark's DecimalType cannot represent NaN, so the
    decimal failure default is NULL rather than ``Decimal('NaN')``.
    """
    if cast_type in (None, "pass", "none"):
        return col
    try:
        spark_type, default = CAST_DEFAULTS[cast_type]
    except KeyError:
        raise ValueError(f"unsupported cast type: {cast_type!r}") from None
    return F.coalesce(col.try_cast(spark_type), F.expr(default))


def truthy(col: Column, dtype: str) -> Column:
    """Python bool() semantics per column dtype (riko filter 'truthy'
    op applies bool(x) — riko/modules/filter.py:56-69)."""
    if dtype == "string":
        return col.isNotNull() & (col != F.lit(""))
    if dtype == "boolean":
        return F.coalesce(col, F.lit(False))
    if dtype.startswith(("int", "bigint", "double", "float", "decimal", "smallint", "tinyint", "long")):
        return col.isNotNull() & (col != F.lit(0))
    if dtype.startswith(("array", "map")):
        return col.isNotNull() & (F.size(col) > 0)
    return col.isNotNull()
