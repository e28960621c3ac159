"""Deterministic sampling and data-mixture construction.

Training-data pipelines rarely train on the raw crawl: they (a) cap
the contribution of any one group — host, source, language — via
stratified quota sampling, and (b) build a weighted *mixture* of
sources (The Pile, LLaMA, DoReMi all publish per-source epoch
weights: Wikipedia seen 3.x times, CC once, etc.).  Both must be
**deterministic** so a re-run of the pipeline, a resumed job, or an
independent auditor reproduces the exact same corpus row-for-row.

Everything here keys randomness on ``md5(seed ':' id)`` — a pure,
engine-independent function of the row, never a RNG: re-running any
subset of partitions reproduces the same decisions (exactly the
property Spark's own ``sample()`` lacks across task retries at
scale), and an independent SQL engine recomputes the identical
sample byte-for-byte.

100 TB shape
------------
* :func:`stratified_sample_op` — one exchange (hash partition by
  group) followed by a per-group sort bounded by the group's size;
  the ``local_topk=True`` lever bounds hot groups *before* that
  exchange: an Arrow-batched per-partition top-k keeps at most
  ``k`` rows per (partition, group), so a pathological host with
  10^9 pages ships ``k × n_partitions`` rows instead of 10^9.
* :func:`mixture_resample_op` — entirely row-local (projection +
  explode): zero shuffles, zero state; epoch replication never
  materializes more than one output batch at a time.
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

from riko_spark.operators import register

#: hex digits of the md5 prefix compared against fractional-weight
#: thresholds (12 digits = 48 bits of uniformity, exact in a double)
_FRAC_HEX_DIGITS = 12


def rank_key(id_col: Column, seed: str) -> Column:
    """The deterministic per-row rank: ``md5(seed ':' id)``.

    Ranking by the *hex string* (lexicographic = numeric for fixed
    width) needs no engine-specific hash→int conversion, so DuckDB /
    any ANSI engine reproduces the order with ``md5(seed || ':' ||
    CAST(id AS VARCHAR))``.
    """
    return F.md5(F.concat_ws(":", F.lit(seed), id_col.cast("string")))


def frac_threshold_hex(frac: float) -> str:
    """Map a fractional probability to the md5-prefix threshold it
    represents: ``md5 < threshold`` fires with probability
    ``floor(frac · 16^12) / 16^12``.  Shared by the operator and the
    test/driver oracles so both sides embed the identical literal."""
    if not 0.0 <= frac < 1.0:
        raise ValueError(f"frac must be in [0, 1): {frac}")
    return format(math.floor(frac * 16**_FRAC_HEX_DIGITS), f"0{_FRAC_HEX_DIGITS}x")


def _local_topk(df: DataFrame, group_col: str, rank_col: str, k: int) -> DataFrame:
    """Per-partition bounded top-k: keep the k smallest ``rank_col``
    rows per group seen so far within each input partition, carrying
    the candidate set across Arrow batches.  Output is a superset of
    the global per-group top-k (any global winner is a partition-
    local winner), so the exact window downstream stays exact."""

    def gen(batches):
        import pandas as pd

        state = None
        for pdf in batches:
            cand = pd.concat([state, pdf]) if state is not None else pdf
            state = (
                cand.sort_values(rank_col, kind="mergesort")
                .groupby(group_col, sort=False)
                .head(k)
            )
        if state is not None and len(state):
            yield state

    return df.mapInPandas(gen, df.schema)


@register("stratified_sample", kind="operator", sub_kind="aggregator")
def stratified_sample_op(
    df: DataFrame,
    conf: dict | None = None,
    group_col: str = "source",
    k: int = 10,
    id_col: str = "doc_id",
    seed: str = "",
    local_topk: bool = False,
    **kwargs,
) -> DataFrame:
    """Keep exactly ``min(k, |group|)`` rows per group, chosen by the
    deterministic md5 rank — i.e. a reproducible uniform sample
    without replacement, stratified by ``group_col``.

    Output: the input columns plus ``sample_rank`` (1-based rank of
    the row within its group under the md5 order).

    Plan: rank is a row-local projection; the window is one hash
    exchange on ``group_col`` + a per-group sort.  With
    ``local_topk=True`` an Arrow-batched bounded pre-pass caps every
    (partition, group) at k rows first, so the exchange and sort see
    ``O(k · partitions)`` rows per group regardless of group skew —
    the partial top-k shape a hot-host crawl needs.  Both paths
    return identical rows (the pre-pass output is a superset of the
    global top-k; parity-tested).
    """
    conf = conf or {}
    group_col = conf.get("group_col", group_col)
    k = int(conf.get("k", k))
    id_col = conf.get("id_col", id_col)
    seed = conf.get("seed", seed)
    local_topk = bool(conf.get("local_topk", local_topk))
    if k < 1:
        raise ValueError(f"k must be >= 1: {k}")

    ranked = df.withColumn("__rk", rank_key(F.col(id_col), seed))
    if local_topk:
        ranked = _local_topk(ranked, group_col, "__rk", k)
    w = Window.partitionBy(group_col).orderBy("__rk")
    return (
        ranked.withColumn("sample_rank", F.row_number().over(w))
        .where(F.col("sample_rank") <= k)
        .drop("__rk")
    )


@register("mixture_resample", kind="processor", sub_kind="transformer")
def mixture_resample_op(
    df: DataFrame,
    conf: dict | None = None,
    weights: dict | None = None,
    source_col: str = "source",
    id_col: str = "doc_id",
    seed: str = "mix",
    **kwargs,
) -> DataFrame:
    """Materialize a weighted data mixture: each row of source ``s``
    with weight ``w`` is emitted ``floor(w)`` times, plus one more
    with probability ``frac(w)`` — decided by the deterministic md5
    threshold, so w < 1 decimates, w = 1 passes through, w > 1
    replicates with fractional epochs (the published-mixture
    convention: e.g. Wikipedia 2.5 epochs, CC 0.7).

    Sources missing from ``weights`` default to weight 0 (dropped) —
    an explicit mixture is an allowlist.  Output: the input columns
    plus ``copy_id`` (1-based epoch index of the emitted copy).

    Plan: pure projection + ``posexplode(array_repeat(...))`` — no
    exchange, no state; replication happens inside the scan stage.
    """
    conf = conf or {}
    weights = conf.get("weights", weights)
    source_col = conf.get("source_col", source_col)
    id_col = conf.get("id_col", id_col)
    seed = conf.get("seed", seed)
    if not weights:
        raise ValueError("mixture_resample_op needs a non-empty weights map")

    u = F.md5(F.concat_ws(":", F.lit(seed), F.col(id_col).cast("string")))
    n: Column = F.lit(0)
    for src, wgt in sorted(weights.items()):
        wgt = float(wgt)
        if wgt < 0:
            raise ValueError(f"negative weight for {src!r}: {wgt}")
        base, frac = int(math.floor(wgt)), wgt - math.floor(wgt)
        cnt = F.lit(base) + (
            (u < F.lit(frac_threshold_hex(frac))).cast("int") if frac > 0 else F.lit(0)
        )
        n = F.when(F.col(source_col) == src, cnt).otherwise(n)

    cols = df.columns
    return (
        df.withColumn("__n", n)
        .select(*cols, F.posexplode(F.array_repeat(F.lit(1), F.col("__n"))).alias("__pos", "__one"))
        .select(*cols, (F.col("__pos") + 1).alias("copy_id"))
    )
