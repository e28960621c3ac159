"""Custom stateful streaming operators via ``applyInPandasWithState``.

riko's only stateful primitive is ``uniq``'s bounded last-N deque
(riko/modules/uniq.py:38-75).  The principled Spark version of plain
dedupe is ``dropDuplicatesWithinWatermark`` (streaming/dedupe.py); this
module provides the *custom* state-store path for semantics the
built-ins can't express:

* ``first_k_per_key`` — emit only the first ``k`` occurrences of every
  key (k=1 ≡ riko uniq), with state TTL so the store stays bounded —
  the generalization of riko's deque bound to keyed, distributed state.

State lives in the Spark state store (RocksDB per session config),
checkpointed and resumable like every other stateful operator.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def first_k_per_key(
    df: DataFrame,
    key: str,
    k: int = 1,
    ttl_ms: int | None = None,
    order_col: str | None = None,
) -> DataFrame:
    """Keep only the first ``k`` rows per ``key`` across the stream.

    Works on both streaming (stateful, TTL-bounded) and batch (window
    row_number) DataFrames, same semantics.  ``order_col`` breaks ties
    within a micro-batch (arrival order otherwise).
    """
    if not df.isStreaming:
        import pyspark.sql.functions as F
        from pyspark.sql import Window

        order = [F.col(order_col).asc()] if order_col else [F.monotonically_increasing_id()]
        w = Window.partitionBy(key).orderBy(*order)
        return (
            df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= k)
            .drop("__rn")
        )

    schema = df.schema
    state_schema = "seen bigint"
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout if ttl_ms else GroupStateTimeout.NoTimeout
    )

    def fn(
        key_tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        (seen,) = state.get if state.exists else (0,)
        budget = k - seen
        emitted = 0
        for pdf in pdfs:
            if budget <= 0:
                break
            if order_col:
                pdf = pdf.sort_values(order_col, kind="mergesort")
            take = pdf.head(budget)
            budget -= len(take)
            emitted += len(take)
            if len(take):
                yield take
        state.update((seen + emitted,))
        if ttl_ms:
            state.setTimeoutDuration(ttl_ms)

    return df.groupBy(key).applyInPandasWithState(
        fn,
        outputStructType=schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=timeout,
    )
