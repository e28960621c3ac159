"""Readers for the driver-generated parquet tables (TESTDATA.md)."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


#: embedding dimensionality of the driver-generated embeddings table —
#: stamped into column metadata at the read site so downstream ANN /
#: near-dup ops resolve ``dim`` at plan time with zero jobs
EMBEDDING_DIM = int(os.environ.get("SPARK_GRAFT_EMBEDDING_DIM", "64"))


def read_table(spark: SparkSession, name: str, sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "embeddings" and "embedding" in df.columns:
        from riko_spark.operators.dedupe import with_dim_metadata

        df = with_dim_metadata(df, "embedding", EMBEDDING_DIM)
    return df


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    return {t: read_table(spark, t, sf_dir) for t in TABLES}
