"""Similarity search over an embedding column (``array<float>``).

  ann_bruteforce  exact cosine top-k: broadcast the (small) query set,
                  JVM-native dot products (``zip_with`` + ``aggregate``),
                  per-query top-k via window.  The correctness baseline.
  ann_lsh         scale path: random-hyperplane buckets with multi-probe
                  (hamming-adjacent buckets), exact rerank inside the
                  probed buckets — the shuffle is keyed on bucket, never
                  all-pairs.

At 100 TB the brute-force variant is the *per-partition* kernel; the
LSH variant bounds the candidate set so the join stays sub-quadratic.
"""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

from riko_spark.operators import register


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2(a) * l2(b))


@register("ann_bruteforce")
def ann_bruteforce_op(
    df: DataFrame,
    conf: dict | None = None,
    queries: DataFrame | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    k: int = 10,
) -> DataFrame:
    """Exact cosine top-k per query.  ``queries``: (query_id, embedding).

    Broadcast the query side — the scan side streams once, no shuffle
    until the final per-query top-k (k rows per query per partition
    feed the window after a partial sort)."""
    conf = conf or {}
    k = int(conf.get("k", k))
    if queries is None:
        raise ValueError("ann_bruteforce requires queries=")
    q = F.broadcast(
        queries.select(F.col(query_id_col), F.col(vec_col).alias("__qvec"))
    )
    scored = df.select(F.col(id_col), F.col(vec_col)).crossJoin(q).select(
        query_id_col,
        id_col,
        F.round(cosine(F.col(vec_col), F.col("__qvec")), 6).alias("cosine"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, "rank", id_col, "cosine")
    )


@register("ann_lsh")
def ann_lsh_op(
    df: DataFrame,
    conf: dict | None = None,
    queries: DataFrame | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    k: int = 10,
    planes: int = 10,
    probes: int = 1,
    seed: int = 11,
    dim: int | None = None,
) -> DataFrame:
    """Approximate top-k: hyperplane-sign buckets + multi-probe.

    ``probes`` > 0 additionally probes all buckets at hamming distance
    1 from the query bucket (recall knob).  Exact cosine rerank runs
    only inside probed buckets."""
    conf = conf or {}
    k, planes, probes = (int(conf.get("k", k)), int(conf.get("planes", planes)),
                         int(conf.get("probes", probes)))
    if queries is None:
        raise ValueError("ann_lsh requires queries=")
    from riko_spark.operators.dedupe import embedding_dim

    dim = embedding_dim(df, vec_col, conf.get("dim", dim))
    rng = np.random.default_rng(seed)
    hyper = rng.standard_normal((planes, dim))

    def bucket_col(vec: Column) -> Column:
        bits = [
            (dot(vec, F.array(*[F.lit(float(v)) for v in hyper[p]])) > 0).cast("int")
            for p in range(planes)
        ]
        return sum((b * (1 << i) for i, b in enumerate(bits)), F.lit(0))

    data = df.select(id_col, vec_col).withColumn("__bucket", bucket_col(F.col(vec_col)))
    qb = queries.select(F.col(query_id_col), F.col(vec_col).alias("__qvec")).withColumn(
        "__qbucket", bucket_col(F.col("__qvec"))
    )
    if probes:
        # probe the home bucket plus every 1-bit flip
        flips = F.array(F.lit(0), *[F.lit(1 << i) for i in range(planes)])
        qb = qb.withColumn(
            "__bucket", F.explode(F.transform(flips, lambda m: F.col("__qbucket").bitwiseXOR(m)))
        )
    else:
        qb = qb.withColumn("__bucket", F.col("__qbucket"))
    scored = data.join(F.broadcast(qb.drop("__qbucket")), "__bucket").select(
        query_id_col,
        id_col,
        F.round(cosine(F.col(vec_col), F.col("__qvec")), 6).alias("cosine"),
    ).dropDuplicates([query_id_col, id_col])
    w = Window.partitionBy(query_id_col).orderBy(F.col("cosine").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, "rank", id_col, "cosine")
    )
