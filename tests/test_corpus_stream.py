"""Streaming crawl capstone (riko_spark/streaming/corpus.py):
WARC file stream → decode → URL gate → DOM main-content extraction →
C4 gate → streaming near-dup dedupe → exactly-once sink, with batch ≡
stream parity over the same archive files.
"""

from __future__ import annotations

import os
import time

import pyspark.sql.functions as F

from riko_spark.sources.warc import build_warc, warc_records
from riko_spark.streaming.corpus import clean_corpus, run_corpus_stream


def _page(body: str) -> bytes:
    html = f"<html><body><nav><a href='/'>home</a></nav><p>{body}</p></body></html>"
    return b"HTTP/1.1 200 OK\r\n\r\n" + html.encode()


T1 = ("The first shared article body has plenty of words to pass the "
      "gate. It even has a second sentence to count.")
T2 = ("A different article entirely, also long enough to pass every "
      "quality gate. Two sentences again here.")
T4 = ("The only unique late document in the fixture, written with "
      "enough words. It closes the corpus.")
SHORT = "Too short."

CONF = {"min_words": 10, "min_sentences": 2,
        "blocked_domains": ["spam.example"]}


def _write_fixture(src):
    files = [
        [("http://site-a.example/0", T1), ("http://site-b.example/0", T2)],
        [("http://site-a.example/1", T1),          # exact near-dup of T1
         ("http://spam.example/x", T2),            # blocked domain
         ("http://site-c.example/short", SHORT)],  # fails the C4 gate
        [("http://site-b.example/1", T2),          # exact near-dup of T2
         ("http://site-d.example/0", T4)],
    ]
    seq = 0
    for i, docs in enumerate(files):
        recs = []
        for url, body in docs:
            recs.append({
                "warc_type": "response", "uri": url,
                "date": f"2026-01-01T00:00:{seq:02d}Z",
                "content_type": "application/http; msgtype=response",
                "content": _page(body),
            })
            seq += 1
        p = src / f"{i}.warc.gz"
        p.write_bytes(build_warc(recs, gzip_members=True))
        # deterministic arrival order for the file source: mtimes
        # ascending with file index, so "first within the watermark"
        # is well-defined and the dedupe winner assertable
        os.utime(p, (time.time() - 100 + i, time.time() - 100 + i))


def test_stream_batch_parity_and_dedupe_winner(spark, tmp_path):
    src = tmp_path / "warcs"
    src.mkdir()
    _write_fixture(src)

    batch = clean_corpus(
        warc_records(spark, str(src), keep_types=("response",)), CONF)
    batch_rows = batch.collect()
    # URL gate drops spam.example, C4 gate drops the short doc, dedupe
    # collapses each duplicated text to one row
    assert sorted(r["text"] for r in batch_rows) == sorted([T1, T2, T4])

    q, sink = run_corpus_stream(
        spark, str(src), str(tmp_path / "sink"), str(tmp_path / "ckpt"),
        conf=CONF, max_files_per_trigger=1)
    q.awaitTermination(120)
    got = sink.result(spark).select(
        "url", "warc_ts", "text", "n_words", "n_sentences").collect()

    # parity: same surviving content, same gate arithmetic
    assert sorted((r["text"], r["n_words"], r["n_sentences"]) for r in got) \
        == sorted((r["text"], r["n_words"], r["n_sentences"])
                  for r in batch_rows)
    # stateful semantics: the stream keeps the FIRST-ARRIVED url of
    # each duplicate group (files ingest in mtime order)
    winners = {r["text"]: r["url"] for r in got}
    assert winners[T1] == "http://site-a.example/0"
    assert winners[T2] == "http://site-b.example/0"
    assert winners[T4] == "http://site-d.example/0"
    # the session-default state store (RocksDB, the large-state
    # choice) actually held the dedupe state: provider-specific
    # custom metrics on the stateful operator
    assert any(k.startswith("rocksdb") for k in _state_metrics(q))


def test_restart_from_checkpoint_is_exactly_once(spark, tmp_path):
    # drain files 0-1, then add file 2 and restart from the SAME
    # checkpoint: the sink must end with exactly the full-corpus rows
    # (no dupes from replay, no lost state)
    src = tmp_path / "warcs"
    src.mkdir()
    _write_fixture(src)
    third = (src / "2.warc.gz").read_bytes()
    (src / "2.warc.gz").unlink()

    sink_path, ckpt = str(tmp_path / "sink"), str(tmp_path / "ckpt")
    q, sink = run_corpus_stream(spark, str(src), sink_path, ckpt,
                                conf=CONF, max_files_per_trigger=1)
    q.awaitTermination(120)
    first = {r["text"] for r in sink.result(spark).collect()}
    assert first == {T1, T2}

    p = src / "2.warc.gz"
    p.write_bytes(third)
    q2, sink2 = run_corpus_stream(spark, str(src), sink_path, ckpt,
                                  conf=CONF, max_files_per_trigger=1)
    q2.awaitTermination(120)
    got = sink2.result(spark).select("url", "text").collect()
    assert sorted(r["text"] for r in got) == sorted([T1, T2, T4])
    # dedupe state survived the restart: the T2 near-dup in file 2 did
    # not displace the first-run winner
    assert {r["url"] for r in got if r["text"] == T2} == \
        {"http://site-b.example/0"}


def _state_metrics(q):
    """Union of the query's stateOperator customMetrics dicts."""
    metrics = {}
    for prog in q.recentProgress:
        for op in prog.get("stateOperators") or []:
            metrics.update(op.get("customMetrics") or {})
    return metrics


def test_state_store_knob_switches_provider(spark, tmp_path):
    # The session default (session.get_spark) is ROCKSDB — the
    # large-state choice.  conf["state_store"]="hdfs" must actually
    # switch the dedupe state to the heap-backed provider — proven by
    # the custom-metrics signature (rocksdb* keys vs loadedMapCache*
    # keys), not just by the conf value — with results identical to
    # the rocksdb run (same survivors, same first-arrival winners).
    import pytest

    from riko_spark.streaming.tuning import (
        HDFS_PROVIDER,
        STATE_STORE_CONF,
        resolve_state_store,
    )

    src = tmp_path / "warcs"
    src.mkdir()
    _write_fixture(src)
    try:
        q, sink = run_corpus_stream(
            spark, str(src), str(tmp_path / "sink"),
            str(tmp_path / "ckpt"),
            conf=dict(CONF, state_store="hdfs"),
            max_files_per_trigger=1)
        q.awaitTermination(120)
        assert spark.conf.get(STATE_STORE_CONF) == HDFS_PROVIDER
        got = sink.result(spark).collect()
        assert sorted(r["text"] for r in got) == sorted([T1, T2, T4])
        winners = {r["text"]: r["url"] for r in got}
        assert winners[T1] == "http://site-a.example/0"
        assert winners[T2] == "http://site-b.example/0"
        metrics = _state_metrics(q)
        assert metrics, "stateful operator reported no custom metrics"
        assert not any(k.startswith("rocksdb") for k in metrics), metrics
    finally:
        spark.conf.unset(STATE_STORE_CONF)  # back to the rocksdb default

    # alias resolution is case-insensitive; unknown aliases fail loud;
    # fully-qualified custom providers pass through
    assert resolve_state_store("HDFS") == HDFS_PROVIDER
    assert resolve_state_store("RocksDB").endswith(
        "RocksDBStateStoreProvider")
    assert resolve_state_store("com.example.MyProvider") == \
        "com.example.MyProvider"
    with pytest.raises(ValueError, match="leveldb"):
        resolve_state_store("leveldb")


def test_clean_corpus_output_schema_stable(spark, tmp_path):
    src = tmp_path / "warcs"
    src.mkdir()
    _write_fixture(src)
    out = clean_corpus(
        warc_records(spark, str(src), keep_types=("response",)), CONF)
    assert out.schema.simpleString() == (
        "struct<url:string,warc_ts:timestamp,text:string,"
        "n_words:int,n_sentences:int>")
    assert out.count() == 3
