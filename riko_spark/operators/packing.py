"""Sequence packing — the final stage of an LLM training-data
pipeline: tokenize cleaned documents, concatenate them with an
end-of-document token, and chop the stream into fixed-length training
sequences (the GPT-2/3 convention, public: documents cross sequence
boundaries, so there is zero padding waste).

Tokenization here is the engine's deterministic hash vocabulary
(md5-of-token -> id, the same SQL-reproducible device the SimHash
kernel uses) — a stand-in with the exact data-movement shape of a real
BPE; swapping in a trained tokenizer is a one-function change inside
the pack UDF.

100 TB shape: packing is sequential WITHIN a shard and embarrassingly
parallel ACROSS shards.  ``shard = pmod(doc_id, shards)`` gives a
deterministic, skew-free assignment; one shuffle groups each shard,
docs sort by id inside it, and the token stream chops locally.  Pick
``shards`` so a shard's tokens fit one task (e.g. total_tokens /
2^27); sequences per shard stay reproducible regardless of cluster
width because the assignment and order are pure id arithmetic — the
property the driver oracle exploits to recompute every sequence's
md5 in SQL.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from riko_spark.operators import register
from riko_spark.operators.textstats import words_col

PACKED_SCHEMA = "shard int, seq_idx bigint, n_tokens int, seq_md5 string"


@register("pack_sequences", kind="operator", sub_kind="aggregator")
def pack_sequences_op(
    df: DataFrame,
    conf: dict | None = None,
    field: str = "text",
    id_col: str = "doc_id",
    seq_len: int = 128,
    shards: int = 8,
    vocab: int = 32768,
    eod_id: int = 0,
) -> DataFrame:
    """Pack documents into fixed-length token sequences.

    Output: one row per packed sequence — ``shard``, ``seq_idx``
    (position within the shard's stream), ``n_tokens`` (== seq_len
    except the shard's final partial), and ``seq_md5`` (md5 of the
    comma-joined token ids, the compact value the oracle recomputes).
    Token ids are ``md5(token)[:8] as uint32 mod (vocab-1) + 1`` with
    ``eod_id`` appended after every document."""
    import hashlib

    import numpy as np
    import pandas as pd

    conf = conf or {}
    seq_len = int(conf.get("seq_len", seq_len))
    shards = int(conf.get("shards", shards))
    vocab = int(conf.get("vocab", vocab))
    eod_id = int(conf.get("eod_id", eod_id))
    if seq_len < 1 or shards < 1 or vocab < 2:
        raise ValueError("seq_len/shards must be >= 1, vocab >= 2")

    tok_ids = F.transform(
        words_col(F.col(field)),
        lambda w: F.conv(F.substring(F.md5(w), 1, 8), 16, 10)
        .cast("long") % (vocab - 1) + 1,
    )
    # NULL text packs as an empty document (EOD only); a NULL id has
    # no deterministic shard and is dropped rather than crashing the
    # corpus run
    keyed = df.filter(F.col(id_col).isNotNull()).select(
        F.col(id_col).alias("__id"),
        F.pmod(F.col(id_col), F.lit(shards)).cast("int").alias("__shard"),
        F.concat(
            F.coalesce(tok_ids, F.array().cast("array<bigint>")),
            F.array(F.lit(eod_id).cast("long")),
        ).alias("__ids"),
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("__id")
        shard = int(pdf["__shard"].iloc[0])
        stream = np.concatenate([np.asarray(x, dtype=np.int64)
                                 for x in pdf["__ids"]])
        rows = []
        for s in range(-(-len(stream) // seq_len)):
            chunk = stream[s * seq_len: (s + 1) * seq_len]
            digest = hashlib.md5(
                ",".join(map(str, chunk.tolist())).encode()).hexdigest()
            rows.append((shard, s, len(chunk), digest))
        return pd.DataFrame(rows, columns=[
            "shard", "seq_idx", "n_tokens", "seq_md5"])

    return keyed.groupBy("__shard").applyInPandas(pack, PACKED_SCHEMA)
