"""Exactly-once sink: idempotent keyed MERGE via ``foreachBatch``.

Design (SURVEY.md §7.4): state lives in Spark's checkpointed state
store; the sink is made idempotent by MERGE-on-key so a replayed
micro-batch (after failure/restart) upserts the same rows — replay
⇒ same final table, i.e. exactly-once *effect* on top of Spark's
at-least-once ``foreachBatch``.

Production target is Iceberg ``MERGE INTO`` on a table partitioned by
``days(warc_ts), bucket(64, url)``; this container has no Iceberg
catalog jars, so the same contract is implemented over parquet with a
manifest-pointer commit (write generation dir → atomically rename a
one-line MANIFEST pointing at it), behind one interface.  The MERGE
key and the commit protocol are identical — swapping in the Iceberg
implementation changes only ``_merge_batch``.

Cost note: the parquet stand-in rewrites the whole keyed table each
micro-batch (O(table) per batch) — acceptable only for the bounded
sandbox tables it is used on; Iceberg MERGE INTO with partition
pruning is the production path at 10^12 rows.
"""

from __future__ import annotations

import os
import shutil
import uuid

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


class UpsertSink:
    """foreachBatch handler: MERGE micro-batch rows into a keyed table.

    Latest-wins per key (ties broken by batch id), so replaying a batch
    is a no-op — the exactly-once contract the north rule requires.
    """

    def __init__(self, path: str, keys: list[str], order_col: str | None = None):
        self.path = path
        self.keys = keys
        self.order_col = order_col  # optional recency column for latest-wins
        os.makedirs(path, exist_ok=True)
        self._gc()

    @property
    def _manifest(self) -> str:
        return os.path.join(self.path, "MANIFEST")

    def _current_gen(self) -> str | None:
        """Generation dir the manifest points at, or None before the
        first commit."""
        try:
            with open(self._manifest) as fh:
                gen = fh.read().strip()
        except FileNotFoundError:
            return None
        p = os.path.join(self.path, gen)
        return p if gen and os.path.exists(p) else None

    def _gc(self) -> None:
        """Drop generation/tmp dirs not referenced by the manifest —
        leftovers of a crash between write and commit."""
        live = self._current_gen()
        for name in os.listdir(self.path):
            p = os.path.join(self.path, name)
            if p != live and os.path.isdir(p) and name.startswith(("gen_", "_gen_", "_tmp_", "_old_", "data")):
                shutil.rmtree(p, ignore_errors=True)
            elif os.path.isfile(p) and name.startswith("MANIFEST."):
                os.remove(p)  # uncommitted manifest tmp from a crash

    def read(self, spark: SparkSession) -> DataFrame | None:
        gen = self._current_gen()
        if gen is None:
            return None
        return spark.read.parquet(gen)

    def _merge_batch(self, batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        new = batch.withColumn("__batch_id", F.lit(batch_id))
        current = self.read(spark)
        if current is not None:
            merged = current.unionByName(new, allowMissingColumns=True)
        else:
            merged = new
        # latest-wins per key: highest (order_col, batch_id) survives —
        # idempotent under replay of the same batch
        order = ([F.col(self.order_col).desc_nulls_last()] if self.order_col else []) + [
            F.col("__batch_id").desc()
        ]
        from pyspark.sql import Window

        w = Window.partitionBy(*self.keys).orderBy(*order)
        deduped = (
            merged.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
        # manifest-pointer commit: the single atomic os.rename of the
        # manifest file is the commit point — a crash at any earlier
        # instant leaves the previous generation fully readable
        # no leading underscore: Hadoop path listings treat _-prefixed
        # names as hidden, which makes readers warn (and could silently
        # skip the dir under glob-based access patterns)
        gen_name = f"gen_{batch_id}_{uuid.uuid4().hex}"
        deduped.write.mode("overwrite").parquet(os.path.join(self.path, gen_name))
        mtmp = self._manifest + f".{uuid.uuid4().hex}"
        with open(mtmp, "w") as fh:
            fh.write(gen_name)
        os.rename(mtmp, self._manifest)  # atomic on POSIX
        self._gc()

    def __call__(self, batch: DataFrame, batch_id: int) -> None:
        self._merge_batch(batch, batch_id)

    def result(self, spark: SparkSession) -> DataFrame:
        df = self.read(spark)
        if df is None:
            raise FileNotFoundError(f"sink {self.path} has no data yet")
        return df.drop("__batch_id")


class IcebergUpsertSink:
    """Production variant of :class:`UpsertSink`: Iceberg ``MERGE INTO``
    keyed on the same columns, table partitioned by
    ``days(warc_ts), bucket(64, url)`` so replays are idempotent and
    partition pruning works at 10^12 rows.

    Requires an Iceberg catalog on the session (jars not present in
    this sandbox — the contract and tests run against UpsertSink; this
    class is the one-line swap for a real cluster).
    """

    def __init__(self, table: str, keys: list[str]):
        self.table = table
        self.keys = keys

    def __call__(self, batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        view = f"__updates_{batch_id}"
        batch.createOrReplaceTempView(view)
        on = " AND ".join(f"t.{k} = s.{k}" for k in self.keys)
        spark.sql(
            f"MERGE INTO {self.table} t USING {view} s ON {on} "
            "WHEN MATCHED THEN UPDATE SET * "
            "WHEN NOT MATCHED THEN INSERT *"
        )
        spark.catalog.dropTempView(view)


def write_stream_upsert(
    df: DataFrame,
    sink: UpsertSink,
    checkpoint: str,
    output_mode: str = "update",
    trigger_available_now: bool = True,
):
    """Start a streaming query writing through the idempotent sink."""
    writer = (
        df.writeStream.foreachBatch(sink)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
