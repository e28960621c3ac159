"""State-store provider experiment: HDFS(heap) vs RocksDB on the same
state-heavy dedupe drain.

What a single box CAN and CANNOT show (recorded with the numbers in
BENCH.md): the distinguishing regime — keyed state ≫ executor heap —
is not safely reachable in-sandbox, and on one machine both providers
ultimately sit in the same DRAM/page-cache budget.  What IS measurable
here: (1) both providers drain the same fixture to IDENTICAL output
(the knob is semantics-free), (2) the per-op cost delta of the LSM
path vs the heap map at a state size where both fit comfortably (the
overhead RocksDB charges for its bounded-memory guarantee), and
(3) each provider's own accounting of where the state lives —
``stateOperators[].customMetrics`` ``rocksdb*``/``loadedMapCache*``
keys plus state rows/bytes — proving the engagement is real.

Fixture: ``--uniques`` all-distinct pages (the state-heavy worst case:
every key enters and stays in state under a wide watermark; no
duplication for the pre-dedupe collapse to remove), drained
availableNow in a fresh JVM per leg with ``--files-per-trigger``
controlling micro-batch count, so the later batches exercise lookups
against an already-populated store.

Usage:
    python scripts/state_store_exp.py --uniques 200000
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def build_fixture(out_dir: str, uniques: int) -> int:
    from riko_spark.session import get_spark
    from riko_spark.sources.pages import pages_fixture

    spark = get_spark(app_name="statestore-fixture", master="local[8]",
                      shuffle_partitions=8)
    (spark.read.parquet(pages_fixture(n=uniques))
     .select("url", "warc_ts", "text")
     .repartition(16).write.mode("overwrite").parquet(out_dir))
    spark.stop()
    return uniques


def drain(path: str, provider: str, files_per_trigger: int) -> dict:
    """One fresh-JVM drain under the given provider alias."""
    from riko_spark.session import get_spark
    from riko_spark.streaming.dedupe import neardup_dedupe_within_watermark
    from riko_spark.streaming.tuning import configure_state_store

    spark = get_spark(app_name=f"statestore-{provider}", master="local[32]",
                      shuffle_partitions=8)
    configure_state_store(spark, provider)
    schema = spark.read.parquet(path).schema
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", files_per_trigger).parquet(path))
    # wide watermark: nothing evicts, all keys live in state end-to-end
    out = neardup_dedupe_within_watermark(
        stream, field="text", delay="30 days", mode="exact")
    kept = {"n": 0}

    with tempfile.TemporaryDirectory() as ckpt:
        t0 = time.time()
        q = (out.writeStream
             .foreachBatch(lambda b, _i: kept.update(n=kept["n"] + b.count()))
             .outputMode("append")
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        finished = q.awaitTermination(600)
        wall = time.time() - t0
        if not finished:
            q.stop()
        rows_in = 0
        state_rows = state_mem = 0
        custom: dict = {}
        batches = 0
        for p in q.recentProgress:
            batches += 1
            rows_in += p.get("numInputRows") or 0
            for op in p.get("stateOperators") or []:
                # last batch wins: end-of-drain state size
                state_rows = op.get("numRowsTotal", state_rows)
                state_mem = op.get("memoryUsedBytes", state_mem)
                custom = op.get("customMetrics") or custom
    res = {
        "provider": provider,
        "wall_sec": round(wall, 2),
        "docs_per_sec": round(rows_in / wall, 1) if wall else None,
        "batches": batches,
        "input_rows": rows_in,
        "output_rows": kept["n"],
        "state_rows": state_rows,
        "state_memory_bytes": state_mem,
        "rocksdb_metrics": {k: v for k, v in custom.items()
                            if k.startswith("rocksdb") and v},
        "heap_metrics": {k: v for k, v in custom.items()
                         if k.startswith("loadedMap") and v},
        "timed_out": not finished,
    }
    spark.stop()
    return res


def run_pair(uniques: int, files_per_trigger: int) -> dict:
    """Build the fixture at ``uniques`` keys, drain it under both
    providers (fresh JVM per leg), return the paired summary."""
    with tempfile.TemporaryDirectory() as d:
        src = os.path.join(d, "pages_uniq")
        n = build_fixture(src, uniques)
        results = {}
        for leg in ("hdfs", "rocksdb"):  # fresh JVM per leg
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--_leg", leg,
                 "--path", src, "--files-per-trigger",
                 str(files_per_trigger)],
                capture_output=True, text=True, timeout=1200)
            if out.returncode or not out.stdout.strip():
                sys.stderr.write(out.stderr[-2000:])
                raise SystemExit(f"leg {leg} failed")
            results[leg] = json.loads(out.stdout.strip().splitlines()[-1])
    h, r = results["hdfs"], results["rocksdb"]
    assert h["output_rows"] == r["output_rows"] == n, (h, r, n)
    assert r["rocksdb_metrics"] and not h["rocksdb_metrics"], (h, r)
    return {
        "fixture_rows": n,
        "hdfs": h,
        "rocksdb": r,
        "rocksdb_wall_overhead": round(r["wall_sec"] / h["wall_sec"], 2),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--uniques", type=int, default=200_000)
    ap.add_argument("--sizes", default=None,
                    help="comma-separated key counts: run the provider "
                         "pairing at EACH size and report how each "
                         "provider's state memory GROWS with keys — the "
                         "heap map should scale ~linearly (bytes/key "
                         "constant) while RocksDB's block-cache budget "
                         "stays bounded; this is the single-box proxy "
                         "for the state >> heap regime the sandbox "
                         "cannot reach directly")
    ap.add_argument("--files-per-trigger", type=int, default=4)
    ap.add_argument("--_leg", default=None,
                    help="internal: provider alias, drain in this process")
    ap.add_argument("--path", default=None)
    args = ap.parse_args()

    if args._leg:
        print(json.dumps(drain(args.path, args._leg,
                               args.files_per_trigger)))
        return

    if args.sizes:
        sizes = [int(s) for s in args.sizes.split(",")]
        pairs = []
        for u in sizes:
            p = run_pair(u, args.files_per_trigger)
            pairs.append(p)
            print(json.dumps(p), flush=True)
        lo, hi = pairs[0], pairs[-1]
        growth = hi["fixture_rows"] / lo["fixture_rows"]

        def _pinned(leg):
            return leg["rocksdb_metrics"].get(
                "rocksdbPinnedBlocksMemoryUsage", 0)

        summary = {
            "sizes": sizes,
            "key_growth": growth,
            # heap provider: memoryUsedBytes IS the loaded map — linear
            "hdfs_state_mem_growth": round(
                hi["hdfs"]["state_memory_bytes"]
                / max(1, lo["hdfs"]["state_memory_bytes"]), 2),
            "hdfs_bytes_per_key": [
                round(p["hdfs"]["state_memory_bytes"]
                      / p["fixture_rows"], 1) for p in pairs],
            # rocksdb: pinned-block bytes are the executor's actual
            # RESIDENT store memory (the bounded working set); SST
            # bytes are the full state, but they live on local disk
            "rocksdb_pinned_bytes": [_pinned(p["rocksdb"])
                                     for p in pairs],
            "rocksdb_pinned_growth": round(
                _pinned(hi["rocksdb"]) / max(1, _pinned(lo["rocksdb"])),
                2),
            "rocksdb_sst_bytes": [
                p["rocksdb"]["rocksdb_metrics"].get(
                    "rocksdbSstFileSize", 0) for p in pairs],
        }
        print(json.dumps(summary))
        return

    print(json.dumps(run_pair(args.uniques, args.files_per_trigger)))


if __name__ == "__main__":
    main()
