"""Sequence packing (riko_spark/operators/packing.py).

Expectations recomputed with an independent pure-Python packer over
literal inputs (its own tokenizer arithmetic, not the operator's
Column expressions).
"""

from __future__ import annotations

import hashlib

import pytest

from riko_spark.operators.packing import pack_sequences_op

from tests.conftest import rows


def _tok(word: str, vocab: int = 32768) -> int:
    return int(hashlib.md5(word.encode()).hexdigest()[:8], 16) \
        % (vocab - 1) + 1


def _expected(docs, seq_len, shards, vocab=32768, eod=0):
    out = {}
    for shard in range(shards):
        stream = []
        for doc_id, text in sorted(d for d in docs if d[0] % shards == shard):
            stream += [_tok(w, vocab) for w in text.lower().split()] + [eod]
        for s in range(-(-len(stream) // seq_len)):
            chunk = stream[s * seq_len: (s + 1) * seq_len]
            md5 = hashlib.md5(",".join(map(str, chunk)).encode()).hexdigest()
            out[(shard, s)] = (len(chunk), md5)
    return out


def test_pack_matches_independent_packer(spark):
    docs = [(i, " ".join(f"word{i}x{j}" for j in range(11)))
            for i in range(20)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {(r["shard"], r["seq_idx"]): (r["n_tokens"], r["seq_md5"])
           for r in rows(pack_sequences_op(df, {"seq_len": 16,
                                                "shards": 4}))}
    assert got == _expected(docs, seq_len=16, shards=4)


def test_docs_cross_sequence_boundaries_no_padding(spark):
    # 3 docs x (5 tokens + EOD) = 18 tokens in one shard; seq_len 8
    # -> sequences of 8, 8, 2 — no per-doc padding, docs split across
    docs = [(i * 4, "a b c d e") for i in range(3)]  # all shard 0 of 4
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = sorted((r["seq_idx"], r["n_tokens"]) for r in rows(
        pack_sequences_op(df, {"seq_len": 8, "shards": 4})))
    assert out == [(0, 8), (1, 8), (2, 2)]


def test_pack_deterministic_across_runs(spark):
    docs = [(i, f"token{i} shared common words") for i in range(13)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    a = sorted(map(tuple, rows(pack_sequences_op(
        df.repartition(7), {"seq_len": 8, "shards": 3}))))
    b = sorted(map(tuple, rows(pack_sequences_op(
        df.repartition(2), {"seq_len": 8, "shards": 3}))))
    assert a == b  # input partitioning must not affect packing


def test_pack_validation():
    with pytest.raises(ValueError, match="seq_len"):
        pack_sequences_op(None, {"seq_len": 0})


def test_registry():
    from riko_spark.operators import get_operator

    assert get_operator("pack_sequences") is pack_sequences_op


def test_null_text_packs_as_empty_doc_and_null_id_dropped(spark):
    # review finding: one dirty row must not kill a corpus-scale run
    df = spark.createDataFrame(
        [(0, "hello world"), (4, None), (None, "orphan")],
        "doc_id long, text string")
    out = rows(pack_sequences_op(df, {"seq_len": 8, "shards": 4}))
    # shard 0: tok(hello), tok(world), EOD, EOD  (null text -> EOD only)
    assert [(r["shard"], r["n_tokens"]) for r in out] == [(0, 4)]
    assert out[0]["seq_md5"] == hashlib.md5(",".join(
        map(str, [_tok("hello"), _tok("world"), 0, 0])).encode()).hexdigest()
