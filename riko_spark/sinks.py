"""Export sinks — riko's output conversions.

riko's only sinks are ``export`` conversions: list/tuple/csv/json/
geojson written via meza ``io.write`` (riko/collections.py:272-333,
``list_targets`` :289-290).  DataFrame equivalents, plus the scale
target (partitioned parquet / Iceberg):

    export(df, 'list')      -> list[dict]          (driver-side!)
    export(df, 'json', path)-> JSON lines dataset
    export(df, 'csv', path) -> CSV dataset
    export(df, 'parquet', path [, partition_by])   -> the real sink
"""

from __future__ import annotations

from pyspark.sql import DataFrame

TARGETS = ("list", "tuple", "json", "csv", "parquet")


def export(
    df: DataFrame,
    target: str = "list",
    path: str | None = None,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
):
    """Materialize a pipeline result.  ``list``/``tuple`` collect to the
    driver (riko's default — only sane for small finals); file targets
    write distributed datasets."""
    if target in ("list", "tuple"):
        rows = [r.asDict(recursive=True) for r in df.collect()]
        return rows if target == "list" else tuple(rows)
    if path is None:
        raise ValueError(f"export target {target!r} requires path=")
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if target == "json":
        writer.json(path)
    elif target == "csv":
        writer.option("header", "true").csv(path)
    elif target == "parquet":
        writer.parquet(path)
    else:
        raise ValueError(f"unknown export target {target!r}; supported: {TARGETS}")
    return path
