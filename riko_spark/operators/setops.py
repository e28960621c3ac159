"""Multi-stream pipes: ``union``, ``join``, ``split``, ``uniq``.

Reference:
  * union — riko/modules/union.py:39-80: bag union (no dedupe), ragged
    dicts allowed → ``unionByName(allowMissingColumns=True)``.
  * join — riko/modules/join.py:44-124: keyed nested-loop equality with
    a ``_MISSING`` sentinel so both-missing keys never match; optional
    ``lower`` case-folds both sides; merged dict = right wins on
    collision.  Spark plans broadcast-hash or sort-merge instead of
    riko's O(n·m) product; SQL null-key semantics already exclude
    both-NULL matches.
  * split — riko/modules/split.py:39-76: eager stream copy → cache the
    DataFrame once, hand out N references.
  * uniq — riko/modules/uniq.py:38-75: drop rows whose key was seen in
    a sliding window of the last ``limit`` (default 1024) distinct
    values — a poor-man's state TTL.  Batch equivalent: keep the
    first-seen row per key (exact when distinct keys ≤ limit, true at
    test scale; divergence documented).  Streaming equivalent:
    ``dropDuplicatesWithinWatermark`` (riko_spark.streaming.dedupe).
"""

from __future__ import annotations

from functools import reduce

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from riko_spark.operators import register


@register("union", kind="operator", sub_kind="composer")
def union_op(df: DataFrame, conf: dict | None = None, others: list[DataFrame] | None = None) -> DataFrame:
    """Bag union of the main stream with ``others`` (listed order)."""
    return reduce(
        lambda a, b: a.unionByName(b, allowMissingColumns=True), others or [], df
    )


@register("join", kind="operator", sub_kind="composer")
def join_op(
    df: DataFrame,
    conf: dict | None = None,
    other: DataFrame | None = None,
    broadcast_other: bool = False,
) -> DataFrame:
    """Keyed inner equi-join; ``lower: true`` case-folds both key sides.

    Column merge follows riko's ``merge([x, y])``: on a name collision
    the *other* side wins.  ``broadcast_other=True`` hints a broadcast
    hash join for small dimension sides.
    """
    if other is None:
        raise ValueError("join requires other=")
    conf = conf or {}
    k1 = conf.get("join_key")
    k2 = conf.get("other_join_key") or k1
    if not k1:
        raise ValueError("keyless natural join is not supported; pass join_key")
    lowered = bool(conf.get("lower"))
    left_k, right_k = df[k1], other[k2]
    if lowered:
        cond = F.lower(left_k.cast("string")) == F.lower(right_k.cast("string"))
    else:
        cond = left_k == right_k
    right = F.broadcast(other) if broadcast_other else other
    joined = df.join(right, on=cond, how="inner")
    # merged-dict column shape: right wins on collisions
    keep_left = [df[c] for c in df.columns if c not in other.columns]
    keep_right = [other[c] for c in other.columns]
    return joined.select(*keep_left, *keep_right)


@register("split", kind="splitter", sub_kind="composer")
def split_op(df: DataFrame, conf: dict | None = None) -> list[DataFrame]:
    """N independent consumers of one stream (riko deep-copies the
    materialized list; we cache once and share the plan)."""
    n = int((conf or {}).get("splits", 2))
    cached = df.cache()
    return [cached] * n


@register("uniq", kind="operator", sub_kind="composer")
def uniq_op(
    df: DataFrame, conf: dict | None = None, order_by: list[str] | None = None
) -> DataFrame:
    """First-seen dedupe on ``uniq_key`` (default ``id``).

    With an event-order spine the kept row is exactly riko's (the first
    occurrence): row_number over (partition by key order by spine) = 1,
    a key-partitioned shuffle — no global sort.  Without a spine it
    falls back to ``dropDuplicates`` (arbitrary representative).

    With an explicit ``limit`` the reference's bounded sliding-window
    state is honored exactly (riko/modules/uniq.py:76-82
    ``deque(maxlen=limit)``: a key is readmitted once ``limit`` other
    distinct keys were kept after it).  That fold is recursively
    sequential — each keep decision feeds the eviction state — so it
    runs as a restricted single-partition pass over the spine, like
    riko's own single-threaded generator.  Leave ``limit`` unset for
    the distributed first-seen path.
    """
    conf = conf or {}
    key = conf.get("uniq_key", "id")
    limit = conf.get("limit")
    if limit is not None:
        if not order_by:
            raise ValueError("uniq(limit=N) requires order_by (event-order spine)")
        return _uniq_bounded(df, key, int(limit), order_by)
    if order_by:
        from riko_spark.operators.ordering import asc_cols, parse_spec

        specs = [parse_spec(c) for c in order_by]
        if not any(desc for _, desc in specs):
            # all-ascending spine (the common case): first-seen is a
            # min_by over the spine tuple — a hash aggregation with
            # map-side partial combine, so the exchange ships at most
            # one row per key per input partition and nothing is
            # sorted.  The row_number window below shuffles every row
            # and sorts each key group (WindowGroupLimit prunes some,
            # but both sorts remain).  Struct ordering compares fields
            # left-to-right with null-first semantics — exactly the
            # window's ASC NULLS FIRST — so the kept row is identical.
            spine = F.struct(*[F.col(n) for n, _ in specs])
            row = F.struct(*[F.col(c) for c in df.columns])
            return (
                df.groupBy(F.col(key).alias("__k"))
                .agg(F.min_by(row, spine).alias("__r"))
                .select(*[F.col("__r").getField(c).alias(c)
                          for c in df.columns])
            )
        w = Window.partitionBy(key).orderBy(*asc_cols(order_by))
        return (
            df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
    return df.dropDuplicates([key])


def _uniq_bounded(df: DataFrame, key: str, limit: int, order_by: list[str]) -> DataFrame:
    """riko's deque(maxlen=limit) uniq: sequential simulation over the
    stream order.  Arrow-batched mapInPandas on a single sorted
    partition; the deque state carries across batches."""
    from collections import deque

    from riko_spark.operators.ordering import asc_cols

    schema = df.schema

    def gen(batches):
        seen: deque = deque(maxlen=limit)
        for pdf in batches:
            mask = []
            # normalize nulls first: numeric null arrives as NaN and
            # NaN != NaN, so raw values would never dedupe a null key
            # (each one eating a deque slot) — riko's dict-backed deque
            # treats None like any other value (riko/modules/uniq.py)
            keys = pdf[key].astype(object).where(pdf[key].notna(), None)
            for v in keys:
                if v in seen:
                    mask.append(False)
                else:
                    seen.append(v)
                    mask.append(True)
            yield pdf[mask]

    ordered = df.repartition(1).sortWithinPartitions(*asc_cols(order_by))
    return ordered.mapInPandas(gen, schema)
