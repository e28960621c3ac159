"""Streaming dedupe: the principled version of riko's ``uniq``.

riko bounds dedupe state with a 1024-value sliding deque
(riko/modules/uniq.py:34-75) — a poor man's state TTL.  Structured
Streaming's ``dropDuplicatesWithinWatermark`` is the same idea with a
time-bounded state store: a key is remembered until the watermark
passes it, then evicted.  State lives in the (RocksDB) state store and
is checkpoint-recoverable.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def dedupe_within_watermark(
    df: DataFrame,
    keys: list[str],
    ts_col: str = "warc_ts",
    delay: str = "30 seconds",
) -> DataFrame:
    if df.isStreaming:
        return df.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(keys)
    return df.dropDuplicates(keys)


def neardup_dedupe_within_watermark(
    df: DataFrame,
    field: str = "text",
    ts_col: str = "warc_ts",
    delay: str = "30 seconds",
    mode: str = "exact",
) -> DataFrame:
    """CONTENT near-dup dedupe for a streaming corpus pipeline: derive
    a content key from ``field`` and keep the first document per key
    within the watermark window (state is time-bounded and
    checkpoint-recoverable, exactly like :func:`dedupe_within_watermark`
    but keyed on content instead of identity columns).

    mode='exact': key = md5 of the normalized text (lower + collapsed
    whitespace) — the streaming twin of the batch ``exact_dedupe``
    operator (operators/dedupe.py), same normalization expression.

    mode='simhash': key = the full 64-bit SimHash signature, i.e. ALL
    bit-bands equal.  SimHash is order-insensitive over the token
    multiset, so this additionally drops token-reordered and
    near-identical-vocabulary rewrites that hash to the SAME signature
    (hamming 0).  Hamming>0 retrieval is deliberately NOT offered here:
    "any band equal" is an OR over band keys, which a single-key
    dedupe state store cannot express without N state entries per doc
    plus cross-entry coordination — at corpus scale that join belongs
    in batch (operators/dedupe.py:banded_hamming_pairs), with the
    stream deduping the hamming-0 mass on the way in.

    Batch input falls back to ``dropDuplicates`` on the same key, so
    stream ≡ batch parity is testable by replaying the same files.
    The key column is internal and dropped from the output."""
    if mode == "exact":
        from riko_spark.operators.dedupe import _norm

        key = F.md5(_norm(F.col(field)))
    elif mode == "simhash":
        from riko_spark.operators.dedupe import simhash64

        key = simhash64(F.col(field))
    else:
        raise ValueError("mode must be 'exact' or 'simhash'")
    keyed = df.withColumn("__ndk", key)
    if df.isStreaming:
        out = (keyed.withWatermark(ts_col, delay)
               .dropDuplicatesWithinWatermark(["__ndk"]))
    else:
        out = keyed.dropDuplicates(["__ndk"])
    return out.drop("__ndk")
