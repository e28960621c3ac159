"""WARC source (riko_spark/sources/warc.py).

Core records are HAND-WRITTEN spec bytes (ISO 28500 / WARC 1.0
examples style), not build_warc round-trips, so parser and writer
cannot co-certify.
"""

from __future__ import annotations

import gzip
import io

import pytest

from riko_spark.sources.warc import (
    build_warc,
    parse_warc,
    warc_extract,
    warc_records,
)

from tests.conftest import rows

# one hand-written response record with an HTTP payload, exactly as
# the spec formats it (CRLF line ends, Content-Length counts the HTTP
# block, record terminated by CRLF CRLF)
HTTP_BLOCK = (b"HTTP/1.1 200 OK\r\n"
              b"Content-Type: text/html\r\n"
              b"\r\n"
              b"<html>hi</html>")
HAND_RECORD = (b"WARC/1.0\r\n"
               b"WARC-Type: response\r\n"
               b"WARC-Record-ID: <urn:uuid:abc>\r\n"
               b"WARC-Target-URI: http://example.com/\r\n"
               b"WARC-Date: 2026-01-01T00:00:00Z\r\n"
               b"Content-Type: application/http; msgtype=response\r\n"
               + f"Content-Length: {len(HTTP_BLOCK)}\r\n".encode()
               + b"\r\n"
               + HTTP_BLOCK
               + b"\r\n\r\n")
HAND_WARCINFO = (b"WARC/1.0\r\n"
                 b"WARC-Type: warcinfo\r\n"
                 b"Content-Type: application/warc-fields\r\n"
                 b"Content-Length: 14\r\n"
                 b"\r\n"
                 b"software: test"
                 b"\r\n\r\n")


def test_hand_written_record():
    recs = list(parse_warc(HAND_WARCINFO + HAND_RECORD))
    assert [r["warc_type"] for r in recs] == ["warcinfo", "response"]
    r = recs[1]
    assert r["warc_target_uri"] == "http://example.com/"
    assert r["http_status"] == 200
    assert r["payload"] == b"<html>hi</html>"
    assert r["content_length"] == len(HTTP_BLOCK)
    assert recs[0]["payload"] is None


def test_gzip_member_per_record_layout():
    raw = b""
    for rec in (HAND_WARCINFO, HAND_RECORD):
        buf = io.BytesIO()
        with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as g:
            g.write(rec)
        raw += buf.getvalue()
    recs = list(parse_warc(raw))
    assert [r["warc_type"] for r in recs] == ["warcinfo", "response"]
    assert recs[1]["payload"] == b"<html>hi</html>"


def test_malformed_archives_raise():
    with pytest.raises(ValueError, match="bad version"):
        list(parse_warc(b"NOTWARC/1.0\r\n\r\n"))
    truncated = HAND_RECORD[:-25]  # cuts into the content block
    with pytest.raises(ValueError, match="truncated content"):
        list(parse_warc(truncated))
    no_len = HAND_RECORD.replace(
        f"Content-Length: {len(HTTP_BLOCK)}\r\n".encode(), b"")
    with pytest.raises(ValueError, match="Content-Length"):
        list(parse_warc(no_len))


def test_build_warc_decodes_against_literal_inputs():
    records = [
        {"warc_type": "response", "uri": f"http://ex.com/{i}",
         "date": "2026-01-01T00:00:00Z",
         "content_type": "application/http; msgtype=response",
         "content": (b"HTTP/1.1 200 OK\r\n\r\n" + f"body {i}".encode())}
        for i in range(5)
    ]
    for gz in (False, True):
        got = list(parse_warc(build_warc(records, gzip_members=gz)))
        assert [r["payload"] for r in got] == \
            [f"body {i}".encode() for i in range(5)]
        assert [r["warc_target_uri"] for r in got] == \
            [f"http://ex.com/{i}" for i in range(5)]


def test_warc_extract_op_and_type_filter(spark):
    blob = build_warc([
        {"warc_type": "request", "uri": "http://ex.com/a",
         "content_type": "application/http; msgtype=request",
         "content": b"GET / HTTP/1.1\r\n\r\n"},
        {"warc_type": "response", "uri": "http://ex.com/a",
         "content_type": "application/http; msgtype=response",
         "content": b"HTTP/1.1 404 NF\r\n\r\npage gone"},
    ])
    df = spark.createDataFrame([(bytearray(blob),)], "blob binary")
    all_rows = rows(warc_extract(df))
    assert [r["warc_type"] for r in all_rows] == ["request", "response"]
    only_resp = rows(warc_extract(df, keep_types=("response",)))
    assert len(only_resp) == 1
    assert only_resp[0]["http_status"] == 404
    assert bytes(only_resp[0]["payload"]) == b"page gone"


def test_warc_records_reader(spark, tmp_path):
    for i in range(3):
        blob = build_warc([
            {"warc_type": "response", "uri": f"http://ex.com/{i}/{j}",
             "content_type": "application/http; msgtype=response",
             "content": b"HTTP/1.1 200 OK\r\n\r\n" + f"doc {i} {j}".encode()}
            for j in range(4)
        ], gzip_members=(i % 2 == 0))
        suffix = ".warc.gz" if i % 2 == 0 else ".warc"
        (tmp_path / f"chunk{i}{suffix}").write_bytes(blob)
    out = rows(warc_records(spark, str(tmp_path), keep_types=("response",)))
    assert len(out) == 12
    assert sorted(r["warc_target_uri"] for r in out)[0] == "http://ex.com/0/0"
    assert all(r["http_status"] == 200 for r in out)


def test_warc_stream_to_cleaned_corpus_parity(spark, tmp_path):
    """The north-star shape end-to-end: WARC archives stream in
    (availableNow), records decode to text, the C4 doc gate runs on
    the stream, and the exactly-once UpsertSink lands one row per URI
    — identical to the batch run over the same files."""
    import pyspark.sql.functions as F

    from riko_spark.operators.cleaning import c4_doc_filter_op
    from riko_spark.sources.warc import warc_records, warc_stream
    from riko_spark.streaming.sink import UpsertSink, write_stream_upsert

    src = tmp_path / "warcs"
    src.mkdir()
    body = ("A clean first sentence here. " * 20).strip()
    for i in range(6):
        text = f"{body} Unique tail {i} ends it."
        blob = build_warc([{
            "warc_type": "response", "uri": f"http://site/{i}",
            "content_type": "application/http; msgtype=response",
            "content": b"HTTP/1.1 200 OK\r\n\r\n" + text.encode(),
        }], gzip_members=(i % 2 == 0))
        (src / f"{i}.warc.gz").write_bytes(blob)

    def pipeline(records):
        docs = records.select(
            F.col("warc_target_uri").alias("url"),
            F.decode("payload", "utf-8").alias("text"))
        return c4_doc_filter_op(docs).select(
            "url", "n_words", "n_sentences", "keep")

    expected = sorted(
        tuple(r) for r in pipeline(
            warc_records(spark, str(src), keep_types=("response",))
        ).collect())

    sink = UpsertSink(str(tmp_path / "sink"), keys=["url"])
    q = write_stream_upsert(
        pipeline(warc_stream(spark, str(src), keep_types=("response",),
                             max_files_per_trigger=2)),
        sink, str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    got = sorted(tuple(r) for r in sink.result(spark)
                 .select("url", "n_words", "n_sentences", "keep").collect())
    assert got == expected and len(got) == 6
    assert all(r[3] for r in got)  # every planted page passes the gate


def test_corrupt_gzip_member_raises_valueerror():
    # review finding: zlib.error must not leak past the documented
    # ValueError contract
    buf = io.BytesIO()
    with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as g:
        g.write(HAND_RECORD)
    raw = bytearray(buf.getvalue())
    raw[15] ^= 0xFF  # corrupt the deflate stream mid-member
    with pytest.raises(ValueError, match="gzip"):
        list(parse_warc(bytes(raw)))


def _mk_records(n):
    return [{
        "warc_type": "response",
        "uri": f"http://s.example/{i}",
        "date": "2026-01-01T00:00:00Z",
        "content_type": "application/http; msgtype=response",
        "content": b"HTTP/1.1 200 OK\r\n\r\n" + f"<html>doc {i}</html>".encode(),
    } for i in range(n)]


def test_member_index_tiles_gzip_and_plain_archives():
    from riko_spark.sources.warc import warc_member_index

    for gz in (True, False):
        blob = build_warc(_mk_records(7), gzip_members=gz)
        idx = warc_member_index(blob)
        assert len(idx) == 7
        # entries tile the archive contiguously, in order
        pos = 0
        for off, ln in idx:
            assert off == pos and ln > 0
            pos += ln
        assert pos == len(blob)
        # each entry parses standalone to exactly its record
        recs = list(parse_warc(blob[idx[3][0]: idx[3][0] + idx[3][1]]))
        assert len(recs) == 1
        assert recs[0]["warc_target_uri"] == "http://s.example/3"


def test_member_index_rejects_corrupt_archives():
    from riko_spark.sources.warc import warc_member_index

    with pytest.raises(ValueError, match="version line"):
        warc_member_index(b"NOT A WARC\r\n\r\n")
    good = build_warc(_mk_records(1))
    with pytest.raises(ValueError, match="truncated"):
        warc_member_index(good[:-30])


def test_group_ranges_merges_contiguous_and_balances():
    from riko_spark.sources.warc import _group_ranges

    # contiguous 10-byte entries -> 3 shards, each ONE merged range
    idx = [(i * 10, 10) for i in range(9)]
    shards = _group_ranges(idx, 3)
    assert shards == [[(0, 30)], [(30, 30)], [(60, 30)]]
    # a gap breaks the merge but stays within one shard
    shards = _group_ranges([(0, 10), (20, 10)], 1)
    assert shards == [[(0, 10), (20, 10)]]
    # never more shards than entries
    assert len(_group_ranges([(0, 10)], 8)) == 1


def test_sharded_read_matches_whole_file(spark, tmp_path):
    from riko_spark.sources.warc import (
        warc_member_index,
        warc_records,
        warc_records_sharded,
    )

    for gz, name in ((True, "big.warc.gz"), (False, "big.warc")):
        blob = build_warc(_mk_records(11), gzip_members=gz)
        p = tmp_path / name
        p.write_bytes(blob)
        idx = warc_member_index(blob)
        whole = sorted(
            (r["warc_target_uri"], bytes(r["payload"]))
            for r in rows(warc_records(spark, str(tmp_path)))
            if r["warc_target_uri"].startswith("http://s.example/"))
        sharded = sorted(
            (r["warc_target_uri"], bytes(r["payload"]))
            for r in rows(warc_records_sharded(spark, str(p), idx,
                                               num_shards=3)))
        assert len(sharded) == 11 and sharded == whole
        p.unlink()


def test_member_index_chunked_large_member():
    # a member whose COMPRESSED size exceeds the 64 KiB feed chunk
    # exercises the multi-feed loop (several decompress calls per
    # member); incompressible sha256-chained bytes keep it >64 KiB
    import hashlib

    from riko_spark.sources.warc import warc_member_index

    noise = b"".join(hashlib.sha256(str(i).encode()).digest()
                     for i in range(8000))  # 256 KiB, incompressible
    recs = _mk_records(3)
    recs[1]["content"] = b"HTTP/1.1 200 OK\r\n\r\n" + noise
    blob = build_warc(recs, gzip_members=True)
    assert len(blob) > 200_000  # the middle member really is >64 KiB
    idx = warc_member_index(blob)
    assert len(idx) == 3
    pos = 0
    for off, ln in idx:
        assert off == pos and ln > 0
        pos += ln
    assert pos == len(blob)
    mid = list(parse_warc(blob[idx[1][0]: idx[1][0] + idx[1][1]]))
    assert len(mid) == 1 and mid[0]["payload"] == noise


def test_member_index_rejects_truncated_gzip():
    from riko_spark.sources.warc import warc_member_index

    blob = build_warc(_mk_records(3), gzip_members=True)
    with pytest.raises(ValueError, match="corrupt gzip member"):
        warc_member_index(blob[:-10])


def test_local_path_resolves_file_uris():
    from riko_spark.sources.warc import _local_path

    assert _local_path("/a/b.warc") == "/a/b.warc"
    assert _local_path("file:/a/b.warc") == "/a/b.warc"
    assert _local_path("file:///a/b.warc") == "/a/b.warc"
    assert _local_path("file://localhost/a/b.warc") == "/a/b.warc"
    assert _local_path("file:///a/with%20space.warc") == "/a/with space.warc"


def test_warc_records_warns_on_oversized_archive(spark, tmp_path, monkeypatch):
    import warnings

    import riko_spark.sources.warc as w

    blob = build_warc(_mk_records(5), gzip_members=True)
    (tmp_path / "a.warc.gz").write_bytes(blob)
    monkeypatch.setattr(w, "_SHARD_ADVICE_BYTES", 10)
    with pytest.warns(UserWarning, match="warc_records_sharded"):
        w.warc_records(spark, str(tmp_path))
    # under the threshold, or with the check disabled: silent
    monkeypatch.setattr(w, "_SHARD_ADVICE_BYTES", 1 << 40)
    with warnings.catch_warnings():
        warnings.simplefilter("error", UserWarning)
        assert w.warc_records(spark, str(tmp_path)).count() == 5
    monkeypatch.setattr(w, "_SHARD_ADVICE_BYTES", 10)
    with warnings.catch_warnings():
        warnings.simplefilter("error", UserWarning)
        assert w.warc_records(spark, str(tmp_path), size_check=False).count() == 5


def test_sharded_stream_matches_batch(spark, tmp_path):
    from riko_spark.sources.warc import (
        warc_member_index,
        warc_records,
        warc_stream_sharded,
    )

    for gz, name, qn in ((True, "big.warc.gz", "shards_gz"),
                         (False, "big.warc", "shards_plain")):
        blob = build_warc(_mk_records(11), gzip_members=gz)
        p = tmp_path / name
        p.write_bytes(blob)
        idx = warc_member_index(blob)
        stream = warc_stream_sharded(
            spark, str(p), idx, str(tmp_path / f"man_{qn}"),
            num_shards=4, max_shards_per_trigger=2)
        assert stream.isStreaming
        q = (stream.writeStream.format("memory").queryName(qn)
             .outputMode("append")
             .option("checkpointLocation", str(tmp_path / f"ckpt_{qn}"))
             .trigger(availableNow=True).start())
        q.awaitTermination(120)
        # shard granularity really is incremental: 4 shards at 2 per
        # trigger means more than one non-empty micro-batch
        fed = [pr for pr in q.recentProgress if pr["numInputRows"]]
        assert len(fed) >= 2
        got = sorted((r["warc_target_uri"], bytes(r["payload"]))
                     for r in rows(spark.table(qn)))
        whole = sorted((r["warc_target_uri"], bytes(r["payload"]))
                       for r in rows(warc_records(spark, str(p))))
        assert len(got) == 11 and got == whole
        p.unlink()


def test_sharded_stream_resumes_from_checkpoint(spark, tmp_path):
    # kill the drain after its FIRST one-shard trigger, restart with
    # the same checkpoint: the file-source offset log must resume at
    # the next shard manifest — every record exactly once, no replay
    # of the already-committed shard, no loss
    from riko_spark.sources.warc import (
        warc_member_index,
        warc_records,
        warc_stream_sharded,
    )

    blob = build_warc(_mk_records(12), gzip_members=True)
    p = tmp_path / "resume.warc.gz"
    p.write_bytes(blob)
    idx = warc_member_index(blob)
    man = str(tmp_path / "man_resume")
    ckpt = str(tmp_path / "ckpt_resume")
    out = str(tmp_path / "out_resume")

    def start(**trigger):
        stream = warc_stream_sharded(
            spark, str(p), idx, man, num_shards=4,
            max_shards_per_trigger=1)
        w = (stream.selectExpr("warc_target_uri", "payload")
             .writeStream.format("parquet")
             .option("path", out)
             .option("checkpointLocation", ckpt))
        if trigger:
            w = w.trigger(**trigger)
        return w.start()

    import time as _t

    q = start()
    try:
        while not any(pr["numInputRows"] for pr in q.recentProgress):
            _t.sleep(0.2)
    finally:
        q.stop()  # mid-stream kill: >=1 shard committed to the sink log
    first = spark.read.parquet(out).count()
    assert 0 < first < 12

    q2 = start(availableNow=True)
    q2.awaitTermination(120)
    got = sorted((r["warc_target_uri"], bytes(r["payload"]))
                 for r in rows(spark.read.parquet(out)))
    whole = sorted((r["warc_target_uri"], bytes(r["payload"]))
                   for r in rows(warc_records(spark, str(p)).select(
                       "warc_target_uri", "payload")))
    # file-source offset log resumes at the next shard, file-sink
    # _spark_metadata commits each batch atomically: the whole archive
    # lands exactly once — no replayed shard, no loss
    assert len(got) == 12 and got == whole
