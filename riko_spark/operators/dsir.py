"""DSIR — Data Selection via Importance Resampling (Xie et al. 2023).

DSIR selects pretraining documents that *look like* a small target
corpus (Wikipedia, books, a domain) without training a model: each
document is reduced to a bag of **hashed n-gram features** (unigrams
+ bigrams hashed into ``buckets`` buckets), two bag-of-buckets
unigram distributions are fit — ``p`` on the target corpus, ``q`` on
(a sample of) the raw corpus — and every raw document gets the
importance log-weight ``log w(x) = Σ_b count_b(x) · (ln p_b − ln
q_b)``.  Selection is **Gumbel top-k**: the ``k`` documents with the
largest ``log w + Gumbel(0,1)`` are an exact without-replacement
sample proportional to the importance weights.

Everything is deterministic and engine-independent:

* feature hashing is an md5-prefix mod (same bridge as
  :mod:`riko_spark.operators.packing`), so an independent SQL engine
  recomputes identical buckets;
* the per-bucket log-ratios are quantized to integer **milli-nats**
  at fit time (the :mod:`riko_spark.operators.lm` contract), so
  document log-weights are exact BIGINT sums;
* the Gumbel noise is a pure function of ``md5(seed ':' id)`` (the
  :mod:`riko_spark.operators.sampling` convention) — re-running any
  partition, or the whole job, reproduces the same sample.

100 TB shape
------------
* **Fit** aggregates each side down to at most ``buckets`` rows
  (bucket → count): the shuffle is ∝ ``buckets`` (10⁴ by default),
  not the corpus; the target side is small by definition and the raw
  side can be a fixed-rate slice (``q`` only needs enough mass per
  bucket).  The fitted log-ratio table is ≤ ``buckets`` rows — a few
  hundred KB — and **broadcasts** everywhere.
* **Score** is one corpus stage: scan → n-gram explode (``zip_with``
  over offset slices, no per-gram copies) → bucket arithmetic →
  broadcast hash-probe → map-side partial aggregation; exactly one
  exchange ships ONE row per document.
* **Select** with fixed ``k`` compiles to TakeOrderedAndProject:
  each task keeps its local top-k and the driver merges ``k ×
  n_partitions`` rows — no global sort.  For corpus-scale output
  sizes, pass ``threshold_milli`` instead: selection becomes a
  row-local predicate (find the cutoff once with an approx-quantile
  pass over ``dsir_score``'s output, then filter).

Reference parity: riko has no data-selection operator — this extends
the engine along SURVEY.md's training-data axis (quality scoring /
mixture construction) with the published DSIR recipe.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame
from typing import NamedTuple

from riko_spark.operators import register
from riko_spark.operators.lm import _milli
from riko_spark.operators.sampling import _FRAC_HEX_DIGITS, rank_key
from riko_spark.operators.textstats import words_col

#: hex digits of the md5 prefix used for feature bucketing (32 bits,
#: exactly the packing.py shard convention)
_BUCKET_HEX_DIGITS = 8


def hashed_ngrams(toks: Column, buckets: int) -> Column:
    """Array of hashed-feature bucket ids (unigrams ++ bigrams) over a
    token-array column: ``('0x' || md5(ng)[:8]) % buckets``.

    Bigrams are built with one ``zip_with`` over two offset slices
    (see textstats.word_shingles for the measured rationale); the
    md5/conv arithmetic matches packing.py:69 so DuckDB reproduces
    every bucket with ``('0x' || substr(md5(ng), 1, 8))::UBIGINT %
    buckets``.
    """
    m = F.greatest(F.size(toks) - 1, F.lit(0))
    bigrams = F.zip_with(
        F.slice(toks, 1, m), F.slice(toks, 2, m),
        lambda x, y: F.concat(x, F.lit(" "), y),
    )

    def to_bucket(ng: Column) -> Column:
        return (
            F.conv(F.substring(F.md5(ng), 1, _BUCKET_HEX_DIGITS), 16, 10)
            .cast("long") % buckets
        )

    return F.concat(
        F.transform(toks, to_bucket),
        F.transform(bigrams, to_bucket),
    )


class DsirTables(NamedTuple):
    """A fitted, quantized DSIR importance model.

    ratios: (bucket long, lr_milli long) — milli-nat quantized
        ``ln p_b − ln q_b`` for every bucket observed on either side
        (Laplace +1 smoothing over ``buckets`` cells on both).
    default_milli: the same quantity for a bucket observed on
        neither side (both counts 0) — the probe's coalesce floor.
    buckets: the feature-space size both sides were hashed into.
    target_total / raw_total: feature-occurrence totals (T_p, T_q).
    """

    ratios: DataFrame
    default_milli: int
    buckets: int
    target_total: int
    raw_total: int


def _bucket_counts(df: DataFrame, field: str, buckets: int) -> DataFrame:
    toks = words_col(F.coalesce(F.col(field), F.lit("")))
    return (
        df.select(F.explode(hashed_ngrams(toks, buckets)).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("c"))
    )


def _lr_expr(ct: Column, cr: Column, t_total: int, r_total: int,
             buckets: int) -> Column:
    """``milli( ln(ct+1) − ln(cr+1) + ln(T_q+B) − ln(T_p+B) )`` —
    written in exactly this operand order (left-associated) so any
    ANSI engine recomputes the identical BIGINT from the same
    doubles.  The totals are integer-valued doubles (exact < 2^53) on
    both sides."""
    return _milli(
        F.log(ct.cast("double") + F.lit(1.0))
        - F.log(cr.cast("double") + F.lit(1.0))
        + F.log(F.lit(float(r_total + buckets)))
        - F.log(F.lit(float(t_total + buckets)))
    )


def dsir_fit(
    target_df: DataFrame,
    raw_df: DataFrame,
    field: str = "text",
    buckets: int = 10_000,
    raw_sample_frac: float | None = None,
    id_col: str = "doc_id",
    seed: str = "dsirq",
) -> DsirTables:
    """Fit the per-bucket quantized importance log-ratios.

    The two ``.collect()`` calls are 1-row totals (bounded); the
    ratio table is ≤ ``buckets`` rows (buckets observed on either
    side; unobserved buckets fold into ``default_milli``).

    ``raw_sample_frac`` is the 100 TB lever: ``q`` only needs enough
    mass per bucket, so fit it on a fixed-rate slice instead of
    scanning the whole corpus (the paper fits its raw distribution
    on a subsample too).  The slice is the DETERMINISTIC md5
    threshold over ``id_col`` (the sampling.py convention) — task
    retries, re-runs and independent auditors reproduce the same
    fit, unlike ``DataFrame.sample``.  Laplace smoothing keeps the
    ratios well-defined for buckets the slice misses.
    """
    if raw_sample_frac is not None:
        from riko_spark.operators.sampling import (
            frac_threshold_hex,
            rank_key,
        )

        if not 0.0 < raw_sample_frac <= 1.0:
            raise ValueError("dsir_fit: raw_sample_frac must be in (0, 1]")
        if raw_sample_frac < 1.0:  # 1.0 = whole corpus, no filter
            raw_df = raw_df.where(
                F.substring(rank_key(F.col(id_col), seed), 1, 12)
                < F.lit(frac_threshold_hex(raw_sample_frac)))
    # Each side's bucket histogram (≤ ``buckets`` rows after the agg)
    # used to be scanned twice — once for the 1-row total, once
    # re-executed inside the ratios join — doubling fit cost over the
    # corpus (guide §5: cache when reused AND recompute is expensive).
    # persist -> consume -> eagerly localCheckpoint the tiny ratio
    # table -> unpersist: each corpus is scanned ONCE per fit, the
    # checkpointed result is invocation-scoped (a re-run re-fits from
    # parquet — nothing stays in the CacheManager to be replayed
    # across runs), and the lineage cut costs nothing because the
    # table is ≤ 2·buckets rows.
    tc = _bucket_counts(target_df, field, buckets).persist()
    rc = _bucket_counts(raw_df, field, buckets).persist()
    try:
        t_total = int(tc.agg(F.sum("c")).collect()[0][0] or 0)
        r_total = int(rc.agg(F.sum("c")).collect()[0][0] or 0)
        if t_total == 0 or r_total == 0:
            raise ValueError("dsir_fit: empty target or raw feature bag")

        ratios = (
            tc.withColumnRenamed("c", "ct")
            .join(rc.withColumnRenamed("c", "cr"), "bucket", "full")
            .select(
                "bucket",
                _lr_expr(
                    F.coalesce(F.col("ct"), F.lit(0)),
                    F.coalesce(F.col("cr"), F.lit(0)),
                    t_total, r_total, buckets,
                ).alias("lr_milli"),
            )
        ).localCheckpoint(eager=True)
    finally:
        tc.unpersist()
        rc.unpersist()
    # the absent-bucket constant = the same expression at ct=cr=0;
    # computed through F.log on a 1-row plan so the quantization
    # arithmetic is the engine's own (not Python libm's)
    default_milli = int(
        target_df.sparkSession.range(1)
        .select(_lr_expr(F.lit(0), F.lit(0), t_total, r_total, buckets))
        .collect()[0][0]
    )
    return DsirTables(ratios, default_milli, buckets, t_total, r_total)


def gumbel_milli(id_col: Column, seed: str) -> Column:
    """Deterministic milli-nat Gumbel(0,1) noise for a row:
    ``floor(−ln(−ln(u)) · 1000 + 0.5)`` with ``u = (('0x' ||
    md5(seed ':' id)[:12]) + 0.5) / 16^12``.

    The ``+ 0.5`` keeps ``u`` strictly inside (0, 1) (the all-zero
    and all-f prefixes would otherwise hit ln's poles); the division
    by 2^48 is exact in a double, so both engines evaluate ln on the
    identical input.
    """
    v = F.conv(
        F.substring(rank_key(id_col, seed), 1, _FRAC_HEX_DIGITS), 16, 10
    ).cast("double")
    u = (v + F.lit(0.5)) / F.lit(float(16 ** _FRAC_HEX_DIGITS))
    return F.floor(-F.log(-F.log(u)) * F.lit(1000.0) + F.lit(0.5)).cast("long")


def dsir_score(
    df: DataFrame,
    tables: DsirTables,
    field: str = "text",
    id_col: str = "doc_id",
    broadcast: bool = True,
) -> DataFrame:
    """Per-document importance log-weights under a fitted model.

    Output: (id_col, n_feats, logw_milli) — ``logw_milli`` is the
    exact BIGINT sum of the per-feature quantized log-ratios (docs
    with no tokens score 0 features / weight 0 and stay in the
    output via explode_outer).  One corpus stage + one per-doc
    exchange; the ratio probe broadcasts by default.
    """
    lr = F.broadcast(tables.ratios) if broadcast else tables.ratios
    toks = words_col(F.coalesce(F.col(field), F.lit("")))
    feats = (
        df.select(F.col(id_col), toks.alias("toks"))
        .select(
            id_col,
            F.explode_outer(
                hashed_ngrams(F.col("toks"), tables.buckets)
            ).alias("bucket"),
        )
    )
    return (
        feats.join(lr, "bucket", "left")
        .groupBy(id_col)
        .agg(
            F.count("bucket").alias("n_feats"),
            F.coalesce(
                F.sum(
                    F.when(F.col("bucket").isNull(), F.lit(0)).otherwise(
                        F.coalesce(
                            F.col("lr_milli"), F.lit(tables.default_milli)
                        )
                    )
                ),
                F.lit(0),
            ).alias("logw_milli"),
        )
    )


@register("dsir_select", kind="operator", sub_kind="aggregator")
def dsir_select_op(
    df: DataFrame,
    conf: dict | None = None,
    tables: DsirTables | None = None,
    target_df: DataFrame | None = None,
    field: str = "text",
    id_col: str = "doc_id",
    k: int | None = None,
    threshold_milli: int | None = None,
    seed: str = "dsir",
    buckets: int = 10_000,
    broadcast: bool = True,
    **kwargs,
) -> DataFrame:
    """Gumbel top-k importance resampling over a raw corpus.

    Fits (if ``tables`` is not given) against ``target_df``, scores
    every document, perturbs with deterministic Gumbel noise, and
    keeps either the global top-``k`` by ``key_milli = logw_milli +
    gumbel_milli`` (ties broken by ``id_col``; compiles to
    TakeOrderedAndProject) or, with ``threshold_milli``, every row
    whose key clears the cutoff (row-local, no ordering at all).

    Output: (id_col, n_feats, logw_milli, gumbel_milli, key_milli),
    top-k form ordered by (key_milli DESC, id ASC).
    """
    conf = conf or {}
    field = conf.get("field", field)
    id_col = conf.get("id_col", id_col)
    k = conf.get("k", k)
    threshold_milli = conf.get("threshold_milli", threshold_milli)
    seed = conf.get("seed", seed)
    buckets = int(conf.get("buckets", buckets))

    if tables is None:
        if target_df is None:
            raise ValueError("dsir_select_op needs tables= or target_df=")
        tables = dsir_fit(target_df, df, field=field, buckets=buckets)
    if (k is None) == (threshold_milli is None):
        raise ValueError("dsir_select_op: pass exactly one of k / "
                         "threshold_milli")

    scored = dsir_score(
        df, tables, field=field, id_col=id_col, broadcast=broadcast
    ).select(
        id_col, "n_feats", "logw_milli",
        gumbel_milli(F.col(id_col), seed).alias("gumbel_milli"),
    ).withColumn(
        "key_milli", F.col("logw_milli") + F.col("gumbel_milli")
    )
    if threshold_milli is not None:
        return scored.where(F.col("key_milli") >= F.lit(int(threshold_milli)))
    return scored.orderBy(
        F.col("key_milli").desc(), F.col(id_col).asc()
    ).limit(int(k))
