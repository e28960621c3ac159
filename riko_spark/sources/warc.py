"""WARC (Web ARChive, ISO 28500) source — the container Common Crawl
ships: parse WARC/1.0 records from raw or gzipped archive bytes with a
dependency-free stdlib kernel.

Common Crawl compresses each record as its OWN gzip member
concatenated into one .warc.gz, precisely so archives can be read in
parallel from member offsets; :func:`parse_warc` handles both that
layout (multi-member inflate loop) and plain concatenated records.

Scale shape: the parallel unit is the archive file (Common Crawl ships
~64k files per snapshot), read through Spark's ``binaryFile`` source —
one Arrow batch of archive blobs per task, records exploded inside
``mapInPandas`` (:func:`warc_records`).  For single huge archives the
per-member gzip layout additionally allows offset-sharded reads from a
member index (CC publishes one): :func:`warc_records_sharded` groups
the index into byte-balanced shards and each task seeks + parses its
ranges with the same kernel, so one archive spreads across a cluster;
:func:`warc_stream_sharded` is its incremental/checkpointable
Structured Streaming twin (shard manifests as the file-source unit);
:func:`warc_member_index` computes an index for archives that ship
without one.

The writer half (:func:`build_warc`) exists for fixture generation
only and is not the parser run backwards (it formats headers from a
dict with its own ordering and length bookkeeping); spec-pinned record
bytes live in tests/test_warc.py.
"""

from __future__ import annotations

import gzip
import io
import zlib
from collections.abc import Iterator

_CRLF = b"\r\n"


def _inflate_members(data: bytes) -> bytes:
    """Decompress a concatenation of gzip members (the Common Crawl
    layout: one member per record)."""
    out = bytearray()
    pos = 0
    while pos < len(data):
        d = zlib.decompressobj(16 + zlib.MAX_WBITS)
        try:
            out += d.decompress(data[pos:])
            out += d.flush()
        except zlib.error as e:  # keep the documented ValueError contract
            raise ValueError(f"WARC: corrupt gzip member: {e}") from e
        consumed = len(data) - pos - len(d.unused_data)
        if consumed <= 0:
            raise ValueError("WARC: corrupt gzip member")
        pos += consumed
    return bytes(out)


def parse_warc(data: bytes) -> Iterator[dict]:
    """Yield one dict per WARC record: ``warc_type``,
    ``warc_target_uri``, ``warc_date``, ``warc_record_id``,
    ``content_type``, ``content_length``, ``content`` (bytes), and for
    records carrying an HTTP response payload ``http_status`` (int)
    and ``payload`` (bytes after the HTTP headers).

    Raises ``ValueError`` on malformed version lines, missing
    Content-Length, or truncated blocks — a corrupt archive must not
    silently yield partial records.
    """
    if data[:2] == b"\x1f\x8b":
        data = _inflate_members(data)
    pos = 0
    n = len(data)
    while pos < n:
        # skip inter-record blank lines
        while pos < n and data[pos: pos + 2] == _CRLF:
            pos += 2
        if pos >= n:
            return
        eol = data.find(_CRLF, pos)
        if eol < 0:
            raise ValueError("WARC: truncated version line")
        version = data[pos:eol]
        if not version.startswith(b"WARC/"):
            raise ValueError(f"WARC: bad version line {version[:20]!r}")
        pos = eol + 2
        headers: dict[str, str] = {}
        while True:
            eol = data.find(_CRLF, pos)
            if eol < 0:
                raise ValueError("WARC: truncated header block")
            line = data[pos:eol]
            pos = eol + 2
            if not line:
                break
            k, _, v = line.partition(b":")
            headers[k.strip().lower().decode("ascii")] = \
                v.strip().decode("utf-8", "replace")
        try:
            length = int(headers["content-length"])
        except (KeyError, ValueError):
            raise ValueError("WARC: missing/invalid Content-Length") from None
        if pos + length > n:
            raise ValueError("WARC: truncated content block")
        content = data[pos: pos + length]
        pos += length
        rec = {
            "warc_type": headers.get("warc-type", ""),
            "warc_target_uri": headers.get("warc-target-uri"),
            "warc_date": headers.get("warc-date"),
            "warc_record_id": headers.get("warc-record-id"),
            "content_type": headers.get("content-type", ""),
            "content_length": length,
            "content": content,
            "http_status": None,
            "payload": None,
        }
        if rec["content_type"].startswith("application/http"):
            split = content.find(_CRLF + _CRLF)
            if split >= 0:
                status_line = content[: content.find(_CRLF)]
                parts = status_line.split(b" ", 2)
                if len(parts) >= 2 and parts[1].isdigit():
                    rec["http_status"] = int(parts[1])
                rec["payload"] = content[split + 4:]
        yield rec


WARC_SCHEMA = (
    "warc_type string, warc_target_uri string, warc_date string, "
    "warc_record_id string, content_type string, content_length bigint, "
    "content binary, http_status int, payload binary"
)


def warc_extract(df, conf: dict | None = None, field: str = "blob",
                 keep_types: tuple[str, ...] | None = None):
    """Explode a binary column of WARC archive bytes into one row per
    record (UDTF shape, like frame_sample for video).  ``keep_types``
    filters on WARC-Type early (e.g. ``("response",)``) so request/
    metadata records never leave the task."""
    import pandas as pd

    conf = conf or {}
    keep = conf.get("keep_types", keep_types)

    def run(batches):
        for pdf in batches:
            rows = []
            for b in pdf[field]:
                if b is None:
                    continue
                for rec in parse_warc(bytes(b)):
                    if keep and rec["warc_type"] not in keep:
                        continue
                    rows.append((
                        rec["warc_type"], rec["warc_target_uri"],
                        rec["warc_date"], rec["warc_record_id"],
                        rec["content_type"], rec["content_length"],
                        bytearray(rec["content"]), rec["http_status"],
                        None if rec["payload"] is None
                        else bytearray(rec["payload"]),
                    ))
            yield pd.DataFrame(rows, columns=[
                "warc_type", "warc_target_uri", "warc_date",
                "warc_record_id", "content_type", "content_length",
                "content", "http_status", "payload",
            ])

    return df.mapInPandas(run, WARC_SCHEMA)


# One binaryFile task holds a whole archive in executor memory; past
# this size, steer users to the offset-sharded reader instead.
_SHARD_ADVICE_BYTES = 512 * 1024 * 1024


def warc_records(spark, path: str, keep_types: tuple[str, ...] | None = None,
                 size_check: bool = True):
    """Read WARC archives under ``path`` (plain or .gz) into a record
    DataFrame via Spark's binaryFile source — the file is the parallel
    unit, matching Common Crawl's ~64k-files-per-snapshot layout.

    Each task materializes ONE whole archive blob (Arrow batch of
    file bytes), so this path is sized for CC-style ~1 GB-max files
    with executor memory to match; archives past
    ``_SHARD_ADVICE_BYTES`` (512 MB) trigger a ``UserWarning``
    steering to :func:`warc_records_sharded`, which spreads one
    archive across tasks from its member index (``size_check=False``
    skips the metadata-only listing job that performs the check)."""
    files = (spark.read.format("binaryFile")
             .option("pathGlobFilter", "*.warc*")
             .load(path))
    if size_check:
        import warnings

        import pyspark.sql.functions as F

        # metadata-only: binaryFile prunes `content` when unselected,
        # so this job lists file statuses without reading bytes
        big = (files.select("path", "length")
               .filter(F.col("length") > _SHARD_ADVICE_BYTES)
               .limit(1).collect())
        if big:
            warnings.warn(
                f"WARC archive {big[0]['path']} is "
                f"{big[0]['length'] / 2**20:.0f} MB — one binaryFile task "
                "holds the whole archive; use warc_records_sharded() with "
                "a member index to spread it across tasks",
                UserWarning, stacklevel=2)
    return warc_extract(
        files.select("content").withColumnRenamed("content", "blob"),
        keep_types=keep_types)


def warc_stream(spark, path: str, keep_types: tuple[str, ...] | None = None,
                max_files_per_trigger: int | None = None):
    """Streaming twin of :func:`warc_records`: a Structured Streaming
    file source over WARC archives (binaryFile needs its schema
    declared explicitly in streaming mode), record-exploded by the
    same :func:`warc_extract` kernel — so a Common-Crawl-style corpus
    ingests incrementally, one archive file per source split, into the
    engine's windowed/stateful/exactly-once machinery downstream."""
    from pyspark.sql.types import (
        BinaryType,
        LongType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    schema = StructType([
        StructField("path", StringType()),
        StructField("modificationTime", TimestampType()),
        StructField("length", LongType()),
        StructField("content", BinaryType()),
    ])
    reader = (spark.readStream.format("binaryFile").schema(schema)
              .option("pathGlobFilter", "*.warc*"))
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    files = reader.load(path).select("content").withColumnRenamed(
        "content", "blob")
    return warc_extract(files, keep_types=keep_types)


def warc_member_index(data: bytes) -> list[tuple[int, int]]:
    """Compute the ``(offset, length)`` member index of an archive —
    gzip member boundaries for a .warc.gz (the layout Common Crawl's
    published cdx index encodes), record boundaries for an
    uncompressed archive.  The gzip path feeds each member's
    decompressor fixed 64 KiB slices of a memoryview (never the whole
    remaining buffer), so total copying is O(archive + members x 64
    KiB) — for typical ~20-50 KiB CC members that is within ~2x of a
    true single pass.  Intended for fixtures and for archives that
    ship without an index; a real CC pipeline reads the published
    index instead of rescanning.

    Uncompressed record lengths absorb the trailing inter-record CRLF
    pairs so consecutive entries tile the file contiguously (shard
    grouping can then merge neighbors into one seek)."""
    out: list[tuple[int, int]] = []
    n = len(data)
    if data[:2] == b"\x1f\x8b":
        mv = memoryview(data)
        chunk = 64 * 1024
        pos = 0
        while pos < n:
            d = zlib.decompressobj(16 + zlib.MAX_WBITS)
            fed = 0
            try:
                while not d.eof:
                    if pos + fed >= n:
                        raise ValueError("WARC: corrupt gzip member")
                    piece = mv[pos + fed: pos + fed + chunk]
                    d.decompress(piece)
                    fed += len(piece)
            except zlib.error as e:
                raise ValueError(f"WARC: corrupt gzip member: {e}") from e
            consumed = fed - len(d.unused_data)
            if consumed <= 0:
                raise ValueError("WARC: corrupt gzip member")
            out.append((pos, consumed))
            pos += consumed
        return out
    pos = 0
    while pos < n:
        start = pos
        hend = data.find(_CRLF + _CRLF, pos)
        if hend < 0:
            raise ValueError("WARC: truncated header block")
        if not data[pos:].startswith(b"WARC/"):
            raise ValueError(f"WARC: bad version line {data[pos:pos+20]!r}")
        length = None
        for line in data[pos:hend].split(_CRLF)[1:]:
            k, _, v = line.partition(b":")
            if k.strip().lower() == b"content-length":
                length = int(v)
        if length is None:
            raise ValueError("WARC: missing/invalid Content-Length")
        end = hend + 4 + length
        if end > n:
            raise ValueError("WARC: truncated content block")
        while end + 2 <= n and data[end: end + 2] == _CRLF:
            end += 2
        out.append((start, end - start))
        pos = end
    return out


def _group_ranges(index, num_shards: int) -> list[list[tuple[int, int]]]:
    """Group index entries, preserving order, into <= ``num_shards``
    byte-balanced shards; adjacent entries that tile contiguously are
    merged into one seek range, so the typical shard is a single
    (offset, length) read."""
    idx = sorted((int(o), int(ln)) for o, ln in index)
    if not idx:
        return []
    num_shards = max(1, min(int(num_shards), len(idx)))
    target = sum(ln for _, ln in idx) / num_shards
    shards: list[list[tuple[int, int]]] = [[]]
    acc = 0
    for o, ln in idx:
        cur = shards[-1]
        if acc >= target and len(shards) < num_shards:
            shards.append([(o, ln)])
            acc = ln
            continue
        if cur and cur[-1][0] + cur[-1][1] == o:
            cur[-1] = (cur[-1][0], cur[-1][1] + ln)
        else:
            cur.append((o, ln))
        acc += ln
    return shards


def _local_path(p: str) -> str:
    """Resolve a path-or-file-URI to a local filesystem path (handles
    ``file:/p``, ``file:///p`` and ``file://host/p`` forms, with
    percent-encoding)."""
    from urllib.parse import unquote, urlparse

    u = urlparse(p)
    if u.scheme == "file":
        return unquote(u.path)
    return p


def _read_ranges(batches):
    """mapInPandas kernel shared by the batch and streaming sharded
    readers: each input row is one shard manifest ``(path, offsets,
    lengths)``; seek + read the ranges and emit the concatenation as
    one archive blob (ranges start on member/record boundaries, so the
    concatenation is itself a valid archive for :func:`parse_warc`).

    Opens ``path`` with plain ``open()`` on the EXECUTOR — the archive
    must live on a filesystem every executor can see (local[*], NFS,
    or a FUSE mount); for object stores, read via the published index
    with a range-capable client or fall back to the whole-file
    binaryFile path."""
    import pandas as pd

    for pdf in batches:
        blobs = []
        for p, offs, lens in zip(pdf["path"], pdf["offsets"],
                                 pdf["lengths"]):
            buf = bytearray()
            with open(_local_path(p), "rb") as fh:
                for o, ln in zip(offs, lens):
                    fh.seek(int(o))
                    buf += fh.read(int(ln))
            blobs.append(buf)
        yield pd.DataFrame({"blob": blobs})


def warc_records_sharded(spark, file_path: str, index,
                         num_shards: int | None = None,
                         keep_types: tuple[str, ...] | None = None):
    """Offset-sharded read of ONE large WARC archive: Common Crawl
    gzips each record as its own member precisely so an archive can be
    read in parallel from member offsets, and publishes the
    ``(offset, length)`` index this function consumes (compute one
    with :func:`warc_member_index` when none ships).

    The index is metadata (~16 bytes/record) and is grouped
    DRIVER-side into ``num_shards`` byte-balanced shards of merged
    contiguous ranges; each task seeks to its ranges and parses them
    with the same :func:`parse_warc` / ``_inflate_members`` kernel as
    the whole-file path — ranges start on member/record boundaries, so
    a shard can never split a record.  This is the scale path for the
    single-huge-archive layout the file-granularity
    :func:`warc_records` source cannot parallelize.

    Executors open ``file_path`` directly (see :func:`_read_ranges`),
    so it must be visible on every executor's filesystem."""
    if num_shards is None:
        num_shards = spark.sparkContext.defaultParallelism
    shards = _group_ranges(index, num_shards)
    rows = [(file_path, [o for o, _ in s], [ln for _, ln in s])
            for s in shards]
    ranges = spark.createDataFrame(
        rows, "path string, offsets array<bigint>, lengths array<bigint>")
    files = ranges.repartition(max(1, len(rows))).mapInPandas(
        _read_ranges, "blob binary")
    return warc_extract(files, keep_types=keep_types)


def warc_stream_sharded(spark, file_path: str, index, manifest_dir: str,
                        num_shards: int | None = None,
                        keep_types: tuple[str, ...] | None = None,
                        max_shards_per_trigger: int | None = None):
    """Streaming twin of :func:`warc_records_sharded`: incremental,
    checkpointable ingest of ONE huge archive with offset-shard
    parallelism — closing the gap where :func:`warc_stream` can only
    parallelize across FILES (useless when the corpus is a single
    multi-GB .warc.gz).

    Mechanics: the member index is grouped driver-side into
    byte-balanced shards exactly as in the batch path, then ONE
    one-line JSON manifest file per shard is written under
    ``manifest_dir`` (tmp-write + rename, so the file source never
    sees a partial manifest); the stream is a file-source over those
    manifests (``maxFilesPerTrigger`` = ``max_shards_per_trigger``),
    so Spark's file-source offset log gives replay / checkpoint-resume
    bookkeeping per SHARD, and each micro-batch range-reads its shards
    with the shared :func:`_read_ranges` kernel.  Parallelism within a
    trigger = manifest files in the trigger; the archive itself is
    opened on executors (same shared-filesystem requirement as the
    batch path).

    100 TB shape: manifests are ~bytes-per-shard of metadata; archive
    bytes never pass through the driver; a real deployment points
    ``manifest_dir`` at the landing zone where index-building jobs
    drop manifests and the stream picks up new shards as they appear.
    """
    import json as _json
    import os as _os

    from pyspark.sql.types import (
        ArrayType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    if num_shards is None:
        num_shards = spark.sparkContext.defaultParallelism
    shards = _group_ranges(index, num_shards)
    _os.makedirs(manifest_dir, exist_ok=True)
    for i, s in enumerate(shards):
        row = {"path": file_path, "offsets": [o for o, _ in s],
               "lengths": [ln for _, ln in s]}
        tmp = _os.path.join(manifest_dir, f".shard-{i:05d}.json.tmp")
        with open(tmp, "w") as fh:
            fh.write(_json.dumps(row) + "\n")
        _os.rename(tmp, _os.path.join(manifest_dir, f"shard-{i:05d}.json"))

    schema = StructType([
        StructField("path", StringType()),
        StructField("offsets", ArrayType(LongType())),
        StructField("lengths", ArrayType(LongType())),
    ])
    reader = spark.readStream.schema(schema)
    if max_shards_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_shards_per_trigger)
    manifests = reader.json(manifest_dir)
    files = manifests.mapInPandas(_read_ranges, "blob binary")
    return warc_extract(files, keep_types=keep_types)


# ------------------------------------------------------------------ fixtures

def build_warc(records: list[dict], gzip_members: bool = False) -> bytes:
    """Fixture writer: each record dict carries ``warc_type``, ``uri``,
    ``date``, ``content_type``, ``content`` (bytes) and optional
    ``record_id``; HTTP payloads are the caller's job.  With
    ``gzip_members`` each record becomes its own gzip member (the
    Common Crawl layout)."""
    out = bytearray()
    for i, r in enumerate(records):
        body = r["content"]
        head = bytearray(b"WARC/1.0\r\n")
        head += f"WARC-Type: {r['warc_type']}\r\n".encode()
        head += (f"WARC-Record-ID: "
                 f"{r.get('record_id', f'<urn:uuid:rec-{i}>')}\r\n".encode())
        if r.get("uri"):
            head += f"WARC-Target-URI: {r['uri']}\r\n".encode()
        if r.get("date"):
            head += f"WARC-Date: {r['date']}\r\n".encode()
        head += f"Content-Type: {r.get('content_type', '')}\r\n".encode()
        head += f"Content-Length: {len(body)}\r\n".encode()
        head += b"\r\n"
        rec = bytes(head) + body + b"\r\n\r\n"
        if gzip_members:
            buf = io.BytesIO()
            with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as g:
                g.write(rec)
            out += buf.getvalue()
        else:
            out += rec
    return bytes(out)
