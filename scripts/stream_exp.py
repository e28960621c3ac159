"""Cold-start streaming experiment: fresh JVM, drain the full pipe
graph immediately, print per-batch durationMs breakdown + wall.

Env knobs:
  EXP_STATE=rocksdb|hdfs     state store provider
  EXP_SHUFFLE=<int>          shuffle partitions for the drain
  EXP_FILES_PER_TRIGGER=<n>  maxFilesPerTrigger
  EXP_DRAINS=<n>             number of drains (fresh sink/ckpt each)
  EXP_WARMUP=0|1             run a tiny warm-up stream first
"""
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from riko_spark.session import get_spark  # noqa: E402

state = os.environ.get("EXP_STATE", "rocksdb")
shuffle = int(os.environ.get("EXP_SHUFFLE", "32"))
fpt = int(os.environ.get("EXP_FILES_PER_TRIGGER", "8"))
drains = int(os.environ.get("EXP_DRAINS", "2"))
warmup = os.environ.get("EXP_WARMUP", "0") == "1"

extra = {"spark.sql.files.maxPartitionBytes": "32m"}
if state == "hdfs":
    extra["spark.sql.streaming.stateStore.providerClass"] = (
        "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider"
    )

spark = get_spark(app_name="exp", master="local[32]", shuffle_partitions=shuffle,
                  extra_conf=extra)

from pyspark.sql.streaming import StreamingQueryListener  # noqa: E402

import bench  # noqa: E402
from riko_spark.plans.dag import build_pipeline  # noqa: E402
from riko_spark.sources.pages import pages_fixture  # noqa: E402
from riko_spark.streaming.sink import UpsertSink, write_stream_upsert  # noqa: E402


class L(StreamingQueryListener):
    def __init__(self):
        self.recs = []

    def onQueryStarted(self, e):
        pass

    def onQueryProgress(self, e):
        p = e.progress
        self.recs.append({"batch": p.batchId, "rows": p.numInputRows, "dur": p.batchDuration,
                          "durationMs": dict(p.durationMs) if p.durationMs else None})

    def onQueryIdle(self, e):
        pass

    def onQueryTerminated(self, e):
        pass


pages_path = pages_fixture(n=100_000)
schema = spark.read.parquet(pages_path).schema
listener = L()
spark.streams.addListener(listener)

if warmup:
    t0 = time.time()
    with tempfile.TemporaryDirectory() as tmp:
        one = os.path.join(tmp, "one")
        spark.read.parquet(pages_path).limit(64).write.parquet(one)
        stream = spark.readStream.schema(schema).parquet(one)
        pipe = bench._pipe_graph_def()
        pipe["modules"][-1]["conf"]["watermark"] = "30 seconds"
        agg = build_pipeline(spark, pipe, sources={"ext": stream}, streaming=True)
        sink = UpsertSink(os.path.join(tmp, "s"), keys=["window_start", "domain"])
        q = write_stream_upsert(agg, sink, os.path.join(tmp, "c"))
        q.awaitTermination(600)
    print(json.dumps({"warmup_sec": round(time.time() - t0, 2)}))

for i in range(drains):
    listener.recs.clear()
    with tempfile.TemporaryDirectory() as tmp:
        stream = (spark.readStream.schema(schema)
                  .option("maxFilesPerTrigger", fpt).parquet(pages_path))
        pipe = bench._pipe_graph_def()
        pipe["modules"][-1]["conf"]["watermark"] = "30 seconds"
        agg = build_pipeline(spark, pipe, sources={"ext": stream}, streaming=True)
        sink = UpsertSink(os.path.join(tmp, "sink"), keys=["window_start", "domain"])
        t0 = time.time()
        q = write_stream_upsert(agg, sink, os.path.join(tmp, "ckpt"))
        q.awaitTermination(600)
        wall = time.time() - t0
    print(json.dumps({"drain": i, "wall": round(wall, 2),
                      "docs_per_sec": round(100_000 / wall, 1),
                      "batches": listener.recs}))
spark.stop()
