"""Bucketed-table helpers: co-located joins/aggregations without a
shuffle.

At 10^12 rows the dominant cost of a keyed join is the exchange.
Writing both sides bucketed (and sorted) BY THE JOIN KEY with the same
bucket count lets Spark plan a SortMergeJoin with NO Exchange on either
side — the bucket files are already hash-partitioned on disk.  This is
the storage-layout half of the skew/shuffle story (the runtime half is
AQE + salting, riko_spark.functions.skew); the production layout for
the web-pages table is ``days(warc_ts), bucket(64, url)`` (see
streaming/sink.py's Iceberg notes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame, table: str, key: str, buckets: int = 64, sort: bool = True
) -> None:
    """Save ``df`` as a bucketed (optionally sorted) managed table."""
    writer = df.write.mode("overwrite").format("parquet").bucketBy(buckets, key)
    if sort:
        writer = writer.sortBy(key)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str,
    left_key: str, right_key: str | None = None, how: str = "inner",
) -> DataFrame:
    """Join two same-bucket-count tables on their bucket keys; the plan
    should contain no Exchange (assert via .explain / the plan test)."""
    left = spark.table(left_table)
    right = spark.table(right_table)
    right_key = right_key or left_key
    return left.join(right, left[left_key] == right[right_key], how)
