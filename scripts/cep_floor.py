"""stream_cep fixed-cost decomposition (round-6 judge ask #6).

The r5 bench measured a 3.6 s NO-OP stateful floor at the fixed
4-batch cadence — a 27.7k ev/s ceiling that bounds the 1x row no
matter how fast the operator's own logic gets.  This script breaks
that floor into its parts and measures how each knob moves it, on the
SAME drain bench.py uses (sf events, chronological range-sharded
source, availableNow):

levels, per cadence (maxFilesPerTrigger in {2, 4, 8} -> 4/2/1 data
micro-batches + the no-data flush batch):

* ``drain``  — watermark + foreachBatch count only: source listing,
               micro-batch planning, offset/commit checkpointing,
               JVM scan.  No shuffle, no state, no Python.
* ``noop``   — applyInPandasWithState with a function that buffers
               nothing and emits nothing: adds the keyed exchange,
               the state store round-trip, and the Arrow<->Python
               transfer of every micro-batch.
* ``real``   — the production sequence_match (filter_types,
               state_buckets=64): adds the match logic itself.

Each level also runs with and without the round-6 column prune
(payload columns `value`/`props` dropped before the exchange) by
checking out the operator path both ways is not possible in-process,
so the prune is simply part of `real`; `noop` mirrors it with a
pruned/unpruned variant to isolate the Arrow-payload share.

Usage:  python scripts/cep_floor.py [--runs 3]
Prints one JSON line per (cadence, level) with wall seconds
(best-of-N), events/sec, batches, and matches (real level only).
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _write_source(spark, tmp: str) -> tuple[str, int, object]:
    """Chronological range-sharded copy of the events table (same
    protocol as bench.bench_stream_cep: 8 shards, staggered mtimes)."""
    import pyspark.sql.functions as F

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    n = ev.count()
    src = os.path.join(tmp, "cep_src")
    (ev.repartitionByRange(8, "ts").sortWithinPartitions("ts")
     .write.parquet(src))
    parts = sorted(glob.glob(os.path.join(src, "part-*.parquet")))
    base = time.time() - len(parts) - 60
    for i, p in enumerate(parts):
        os.utime(p, (base + i, base + i))
    return src, n, ev.schema


def _drain(out, tmp: str, tag: str) -> tuple[float, int, int]:
    sink = {"rows": 0, "batches": 0}

    def grab(batch, _bid):
        sink["rows"] += batch.count()
        sink["batches"] += 1

    ckpt = os.path.join(tmp, f"ckpt_{tag}")
    t0 = time.time()
    q = (out.writeStream.foreachBatch(grab).outputMode("append")
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(600)
    return time.time() - t0, sink["rows"], sink["batches"]


def _stream(spark, src: str, schema, fpt: int):
    import pyspark.sql.functions as F

    return (spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", fpt).parquet(src)
            .withColumn("ts", F.col("ts").cast("timestamp")))


def level_drain(spark, src, schema, fpt, tmp, run):
    stream = _stream(spark, src, schema, fpt).withWatermark("ts", "1 hour")
    return _drain(stream, tmp, f"drain_{fpt}_{run}")


def _noop_out(spark, src, schema, fpt, pruned: bool):
    """applyInPandasWithState with a no-op fn over the same grouping
    (64 buckets) — measures exchange + state store + Arrow round-trip."""
    import pyspark.sql.functions as F
    from pyspark.sql.streaming.state import GroupStateTimeout

    from riko_spark.streaming.cep import _grouped_stream, _prune_stream_cols

    stream = _stream(spark, src, schema, fpt)
    if pruned:
        stream = _prune_stream_cols(stream, "user_id", "ts",
                                    "event_type", "event_id")

    def fn(key, pdfs, state):
        for pdf in pdfs:   # consume the Arrow batches (the real cost)
            len(pdf)
        state.remove()
        return iter(())

    grouped = _grouped_stream(stream, "ts", "1 hour", "user_id", 64)
    return grouped.applyInPandasWithState(
        fn, "user_id bigint, x bigint", "n array<bigint>", "append",
        GroupStateTimeout.EventTimeTimeout)


def level_noop(spark, src, schema, fpt, tmp, run, pruned):
    out = _noop_out(spark, src, schema, fpt, pruned)
    tag = f"noop{'p' if pruned else ''}_{fpt}_{run}"
    return _drain(out, tmp, tag)


def level_real(spark, src, schema, fpt, tmp, run):
    from riko_spark.streaming.cep import sequence_match

    stream = _stream(spark, src, schema, fpt)
    out = sequence_match(stream, ["view", "click", "purchase"],
                         within="2 days", watermark="1 hour",
                         filter_types=True, state_buckets=64)
    return _drain(out, tmp, f"real_{fpt}_{run}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--cadences", default="2,4,8")
    args = ap.parse_args()

    from riko_spark.session import get_spark
    from riko_spark.streaming.tuning import HDFS_PROVIDER

    spark = get_spark(app_name="cep-floor", master="local[32]",
                      shuffle_partitions=8)
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
                   HDFS_PROVIDER)
    tmp = tempfile.mkdtemp(prefix="cep_floor_")
    try:
        src, n, schema = _write_source(spark, tmp)
        for fpt in [int(c) for c in args.cadences.split(",")]:
            for name, f in [("drain", level_drain),
                            ("noop", lambda *a: level_noop(*a, False)),
                            ("noop_pruned", lambda *a: level_noop(*a, True)),
                            ("real", level_real)]:
                f(spark, src, schema, fpt, tmp, "warm")   # warm, untimed
                best = None
                for r in range(args.runs):
                    wall, rows, batches = f(spark, src, schema, fpt, tmp, r)
                    if best is None or wall < best[0]:
                        best = (wall, rows, batches)
                wall, rows, batches = best
                print(json.dumps({
                    "level": name, "max_files_per_trigger": fpt,
                    "wall_sec": round(wall, 3),
                    "events_per_sec": round(n / wall, 1),
                    "batches": batches, "out_rows": rows,
                }), flush=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
