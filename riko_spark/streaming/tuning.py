"""Stream-sizing helpers: pick state width and provider for a query.

A stateful stream's shuffle width fixes its state-store partition count
for the query's LIFETIME (it is captured in the checkpoint at first
start), so it must be sized to STATE volume, not to input volume — the
map side (scan + extraction) gets its parallelism from file splits and
is unaffected.  Oversizing costs per-batch task launch + state commit
overhead on every micro-batch forever; these helpers make the choice
explicit and reversible.

Provider guidance (both checkpointed, both exactly-once):

* HDFSBackedStateStoreProvider — in-memory map + delta files.  Best
  while per-partition state fits comfortably in executor memory
  (e.g. windowed counts: |keys x open windows| rows).
* RocksDBStateStoreProvider — off-heap LSM.  Required when state
  exceeds memory (e.g. dedupe sets over 10^12 urls); the session
  default here (session.py) because the 100 TB design point assumes
  large state.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import SparkSession

HDFS_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider"
)
ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


@contextmanager
def stream_conf(
    spark: SparkSession,
    shuffle_partitions: int = 8,
    small_state: bool = True,
):
    """Context manager: size the NEXT stream start, restore after.

    The confs are captured when ``writeStream.start()`` runs inside the
    block; restoring afterwards does not affect the running query.

    >>> with stream_conf(spark, shuffle_partitions=8):
    ...     q = write_stream_upsert(agg, sink, ckpt)      # doctest: +SKIP
    """
    keys = {
        "spark.sql.shuffle.partitions": str(shuffle_partitions),
        "spark.sql.streaming.stateStore.providerClass": (
            HDFS_PROVIDER if small_state else ROCKSDB_PROVIDER
        ),
    }
    old = {k: spark.conf.get(k) for k in keys}
    for k, v in keys.items():
        spark.conf.set(k, v)
    try:
        yield spark
    finally:
        for k, v in old.items():
            spark.conf.set(k, v)
