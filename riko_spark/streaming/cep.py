"""CEP sequence matching: detect ordered event-type sequences per key.

The north-star architecture calls this engine "a Structured Streaming /
CEP layer"; riko itself has no sequence primitive (its pipes are
per-item), so this is a beyond-reference operator in the Flink-CEP
``A followedBy B followedBy C within T`` family.

Semantics — *earliest-completion per anchor* (deterministic, oracle-able):
for every event of ``steps[0]`` (the anchor), step ``i`` matches the
EARLIEST event of type ``steps[i]`` strictly after the matched step
``i-1`` (order = (ts, event_id), so ties are deterministic); the match
completes iff the last step's ts is within ``within`` of the anchor ts.
Anchors match independently (matches may share non-anchor events) —
Flink's ``skip-till-next-match`` relaxed to per-anchor, which keeps the
result expressible in ANSI SQL for the oracle gate.

Batch plan shape (100 TB-ready): ONE sort per key partition computes,
for every row, the earliest strictly-later event of each step type
(running ``min`` over a descending ROWS frame — whole-stage codegen,
no self-join explosion); each extra step beyond the second resolves
through ONE keyed equi-join against the same frame.  N-step match =
1 window pass + (N-2) equi-joins, never a range join.

Streaming: ``applyInPandasWithState`` per key with event-time timeouts;
state holds only the event buffer inside the active horizon
(``watermark - within``), so state is bounded by rate x within.  A
match is emitted exactly once, when every matched step is older than
the watermark (late data beyond the watermark is impossible by
contract, so the decision is final); its anchor is then evicted.
Expired anchors evict without output.

Checkpoint compatibility: the pandas STATE SCHEMAS are an internal
representation and changed in round 5 (bucketed uid/done_uid arrays;
per-user frontiers) — a stream checkpointed under an older build must
restart from a FRESH checkpoint after upgrading (replay the source; the
exactly-once sink deduplicates).  Spark surfaces the mismatch as a
state-deserialization error rather than corrupting silently.
"""

from __future__ import annotations

from bisect import bisect_right
from collections.abc import Iterable, Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def _parse_duration_ms(within: str | int | float) -> int:
    if isinstance(within, (int, float)):
        return int(within)
    parts = str(within).split()
    n = float(parts[0])
    unit = parts[1].rstrip("s") if len(parts) > 1 else "second"
    mult = {"millisecond": 1, "second": 1000, "minute": 60_000,
            "hour": 3_600_000, "day": 86_400_000}[unit]
    return int(n * mult)


def _comp_col(ts_col: str, event_id_col: str, on_invalid: str = "raise"):
    # sortable composite identity: zero-padded micros then event id —
    # lexicographic order == (ts, event_id) order, min() == earliest.
    # 19 id digits cover the full NON-NEGATIVE bigint range (snowflake
    # ids included); a negative id's '-' would sort before digits and
    # reverse the order among negatives, so ids are VALIDATED per row.
    # on_invalid="raise" (default): null / negative / non-castable ids
    # raise at execution instead of silently mis-matching — assert_true
    # is a throwing expression, so Catalyst cannot fold the check away;
    # cost is one codegen branch per row.  on_invalid="drop": an
    # invalid id yields a NULL composite (format_string is null-in →
    # null-out) and the caller filters the row out, so one malformed id
    # cannot abort a large job.  The streaming path enforces the SAME
    # per-row contract for integer id columns (see _id_guard); string
    # ids are a streaming-only extension with documented lexicographic
    # tie order.  The timestamp cast covers TIMESTAMP_NTZ sources
    # (session tz is UTC, instant unchanged); unix_micros requires
    # TIMESTAMP.  A null timestamp yields a null composite, i.e. the
    # event is unorderable and ignored by min().
    eid = F.col(event_id_col).cast("bigint")
    valid = eid.isNotNull() & (eid >= 0)
    if on_invalid == "drop":
        checked = F.when(valid, eid)
    else:
        checked = F.when(
            F.assert_true(
                valid,
                F.concat(
                    F.lit(f"cep: {event_id_col} must be a non-negative "
                          "bigint for composite ordering, got "),
                    F.coalesce(F.col(event_id_col).cast("string"),
                               F.lit("NULL")),
                ),
            ).isNull(),
            eid,
        )
    micros = F.unix_micros(F.col(ts_col).cast("timestamp"))
    comp = F.format_string("%020d%019d", micros, checked)
    # format_string renders a null argument as the TEXT 'null' (printf
    # semantics) rather than null-propagating, so propagate explicitly:
    # a null ts or a dropped id yields a genuinely NULL composite —
    # unorderable, ignored by min(), filterable.
    return F.when(micros.isNotNull() & checked.isNotNull(), comp)


def _id_guard(id_t: str, event_id_col: str, on_invalid: str):
    """Per-batch id validation for the streaming paths — the same
    contract the batch composite enforces (non-null, non-negative for
    integer id columns; non-null for string ids).  Returns a function
    mapping an id Series to a keep-mask, raising in ``on_invalid=
    'raise'`` mode when any id is invalid."""

    def guard(ids: pd.Series) -> pd.Series:
        if id_t == "string":
            bad = ids.isna()
        else:
            num = pd.to_numeric(ids, errors="coerce")
            bad = num.isna() | (num < 0)
        if bool(bad.any()):
            if on_invalid == "raise":
                first = ids[bad].iloc[0]
                raise ValueError(
                    f"cep: {event_id_col} must be a non-negative "
                    f"{id_t} id, got {first!r} (pass on_invalid='drop' "
                    "to skip malformed rows instead)"
                )
            return ~bad
        return pd.Series(True, index=ids.index)

    return guard


#: relevant-type share of the stream above which the auto mode turns
#: the streaming pre-filter on: with >=10% of events pattern-relevant,
#: step events are dense enough to carry the watermark themselves, so
#: filtering below the EventTimeWatermark node cannot stall match
#: finalization in practice.
_DENSE_SHARE = 0.10


def _resolve_filter_types(filter_types, steps, type_share) -> bool:
    """``filter_types=None`` = AUTO: enable the relevant-type
    pre-filter iff a declared/profiled ``type_share`` histogram shows
    the union of step types is dense (>= _DENSE_SHARE of the stream).
    Explicit True/False always wins."""
    if filter_types is not None:
        return bool(filter_types)
    if not type_share:
        return False
    relevant = {t for alts in steps for t in alts}
    return sum(float(type_share.get(t, 0.0)) for t in relevant) >= _DENSE_SHARE


def profile_type_share(df: DataFrame, type_col: str = "event_type") -> dict:
    """Cheap batch histogram of event-type shares, for feeding
    ``type_share`` to the streaming CEP auto filter mode: run it once
    over a batch sample of the same source (one groupBy over one
    column — map-side partial agg, tiny shuffle)."""
    rows = df.groupBy(type_col).count().collect()
    total = sum(r["count"] for r in rows) or 1
    return {r[type_col]: r["count"] / total for r in rows}


def sequence_match(
    df: DataFrame,
    steps: list,
    key: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    within: str = "30 minutes",
    event_id_col: str = "event_id",
    watermark: str | None = None,
    filter_types: bool | None = None,
    on_invalid: str = "raise",
    type_share: dict | None = None,
    state_buckets: int | None = None,
) -> DataFrame:
    """Match the ordered ``steps`` sequence per ``key``; one output row
    per completed match with ``step{i}_id`` / ``step{i}_ts`` columns.

    ``state_buckets``: streaming-only throughput knob.  The stateful
    operator pays a fixed ~ms-scale Arrow/state round-trip per GROUP
    per micro-batch; grouping state by ``xxhash64(key) % buckets``
    instead of by raw key amortizes it across ~|keys|/buckets users per
    bucket with identical per-user semantics and output.  Size it so a
    bucket holds ~10-100 users (e.g. |keys|/32); None (default) keeps
    per-key state.

    A step may be:

    * a single event type (``"click"``),
    * a LIST of alternatives (Flink-pattern alternation):
      ``["view", ["click", "signup"], "purchase"]`` matches
      view → (click OR signup) → purchase — alternation only widens
      the predicate a step's window/bisect lookup uses, so the plan
      shape (one window pass + (N-2) keyed equi-joins) is unchanged;
    * a QUANTIFIED dict (Flink ``times(m)``):
      ``{"type": "click", "times": 2}`` (or ``"types": [...]`` with
      alternation) matches the m-th occurrence of the step's type-set
      strictly after the previous matched step — "view, then a 2nd
      click, then purchase".  The emitted ``step{i}_id/ts`` is the
      m-th (completing) occurrence, and the next step chains after
      it.  Each quantified step costs ONE extra keyed equi-join (the
      m-th occurrence resolves through a per-type-set ``lead(m-1)``
      column — still no range join).  The anchor step cannot be
      quantified.

    Earliest-completion-per-anchor semantics throughout.  Batch and
    streaming frames give identical results for the same input once
    every event is older than the stream's watermark, PROVIDED ids obey
    the shared contract: non-null, non-negative, integer-valued.  Both
    paths enforce it per row — ``on_invalid="raise"`` (default) aborts
    with the offending value; ``on_invalid="drop"`` skips malformed
    rows instead, so one bad id cannot abort a large job.  STRING id
    columns are a streaming-only extension (web-scale string domains):
    there, equal-timestamp ties order lexicographically rather than
    numerically — a documented divergence from the batch path, which
    requires bigint-castable ids.

    ``filter_types=None`` (default) is AUTO: the streaming relevant-
    type pre-filter turns on iff ``type_share`` (a type→fraction
    histogram, e.g. from :func:`profile_type_share` over a batch
    sample of the same source) shows step types are dense enough
    (>=10% of the stream) to carry the watermark themselves; explicit
    ``True``/``False`` always wins.  Sparse step types keep the filter
    off so non-step events still advance the watermark and match
    finalization never stalls.
    """
    if on_invalid not in ("raise", "drop"):
        raise ValueError("on_invalid must be 'raise' or 'drop'")
    if len(steps) < 2:
        raise ValueError("sequence_match needs at least 2 steps")
    alts_list: list[list[str]] = []
    times: list[int] = []
    for s in steps:
        if isinstance(s, dict):
            t = s.get("types", s.get("type"))
            if t is None:
                raise ValueError("quantified step needs 'type' or 'types'")
            alts = [t] if isinstance(t, str) else list(t)
            m = int(s.get("times", 1))
            if m < 1:
                raise ValueError("step 'times' must be >= 1")
        elif isinstance(s, str):
            alts, m = [s], 1
        else:
            alts, m = list(s), 1
        alts_list.append(alts)
        times.append(m)
    if times[0] != 1:
        raise ValueError("the anchor step cannot be quantified")
    if df.isStreaming:
        return _sequence_match_stream(
            df, alts_list, key, ts_col, type_col, within, event_id_col,
            watermark or "0 seconds",
            _resolve_filter_types(filter_types, alts_list, type_share),
            times, on_invalid, state_buckets,
        )
    return _sequence_match_batch(
        df, alts_list, key, ts_col, type_col, within, event_id_col, times,
        on_invalid,
    )


def _sequence_match_batch(
    df: DataFrame, steps: list[list[str]], key: str, ts_col: str,
    type_col: str, within: str, event_id_col: str,
    times: list[int] | None = None, on_invalid: str = "raise",
) -> DataFrame:
    n = len(steps)
    times = times or [1] * n
    within_ms = _parse_duration_ms(within)
    relevant = sorted({t for alts in steps for t in alts})
    # restrict to pattern-relevant types FIRST: non-step rows are pure
    # passengers (never anchors, never window contributors, never join
    # targets), so dropping them shrinks the per-key window sort AND
    # scopes the composite's event-id validation to rows the pattern
    # actually orders — junk ids on unrelated event types cannot abort
    # the query
    ev = df.filter(F.col(type_col).isin(relevant)).select(
        F.col(key), F.col(ts_col), F.col(event_id_col), F.col(type_col)
    ).withColumn("__comp", _comp_col(ts_col, event_id_col, on_invalid))
    if on_invalid == "drop":
        # a null composite (bad id OR null ts) is unorderable: drop the
        # row before the window pass so it neither anchors nor matches
        ev = ev.filter(F.col("__comp").isNotNull())

    # one descending sort per key: for every row, the earliest strictly
    # LATER event of each needed step type (ROWS frame excludes self)
    w_later = (
        Window.partitionBy(key)
        .orderBy(F.col("__comp").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    if all(m == 1 for m in times[1:]):
        # Unquantified chains resolve with STACKED WINDOW PASSES over
        # the same (key, comp DESC) sort — zero self-joins.  The crux
        # is monotonicity: "earliest X strictly after r" is
        # nondecreasing in r, so the greedy chain value at the FIRST
        # step-j row after r equals the min over ALL later step-j rows
        # (nulls only appear at the tail, where min degrades to null —
        # exactly a broken chain).  m[j][d] = the d-times-nested min
        # (innermost over steps[j-1], outermost toward steps[1]);
        # z_j = m[j][j-1] is the step-j composite of the chain anchored
        # strictly after the row.  Each depth is one Window node over
        # the already-established sort (consecutive same-spec Window
        # operators add no exchange and no re-sort), replacing the
        # previous (N-2) keyed self-joins — each of which re-shuffled
        # and re-sorted the window output (2 exchanges + 3 sorts + an
        # SMJ at N=3; measured 1.85 -> 1.2 s on the sf1.0 events
        # bench, identical matches).
        ev = ev.withColumns({
            f"__m_{j}_0": F.min(
                F.when(F.col(type_col).isin(steps[j]), F.col("__comp"))
            ).over(w_later)
            for j in range(1, n)
        })
        for d in range(1, n - 1):
            ev = ev.withColumns({
                f"__m_{j}_{d}": F.min(
                    F.when(F.col(type_col).isin(steps[j - d]),
                           F.col(f"__m_{j}_{d - 1}"))
                ).over(w_later)
                for j in range(d + 1, n)
            })
        z = [None] + [f"__m_{j}_{j - 1}" for j in range(1, n)]
        cur = ev.filter(F.col(type_col).isin(steps[0])).filter(
            F.col(z[n - 1]).isNotNull()
        ).select(
            F.col(key),
            F.col(event_id_col).alias("step0_id"),
            F.col(ts_col).cast("timestamp").alias("step0_ts"),
            *[F.col(z[j]) for j in range(1, n)],
        )
        for i in range(1, n):
            cur = cur.withColumns({
                f"step{i}_ts": F.timestamp_micros(
                    F.substring(z[i], 1, 20).cast("bigint")
                ),
                f"step{i}_id": F.substring(z[i], 21, 19).cast("bigint"),
            })
        cur = cur.drop(*[z[j] for j in range(1, n)])
        last = f"step{n-1}_ts"
        return cur.filter(
            F.col(last) <= F.col("step0_ts")
            + F.expr(f"INTERVAL {within_ms} MILLISECONDS")
        )
    nxt_cols = {
        f"__nxt{i}": F.min(
            F.when(F.col(type_col).isin(steps[i]), F.col("__comp"))
        ).over(w_later)
        for i in range(1, n)
    }
    ev = ev.withColumns(nxt_cols)

    cur = ev.filter(F.col(type_col).isin(steps[0])).select(
        F.col(key),
        F.col(event_id_col).alias("step0_id"),
        F.col(ts_col).cast("timestamp").alias("step0_ts"),
        F.col("__nxt1").alias("__chain"),
    )
    for i in range(1, n):
        cur = cur.filter(F.col("__chain").isNotNull())
        if times[i] > 1:
            # quantified step: __chain points at the FIRST type-set
            # occurrence; the m-th resolves through lead(m-1) over the
            # type-set sub-frame (ascending per-key sort on a filtered
            # subset — cheap), via one extra keyed equi-join
            w_asc = Window.partitionBy(key).orderBy("__comp")
            qf = ev.filter(F.col(type_col).isin(steps[i])).select(
                F.col(key).alias("__qk"),
                F.col("__comp").alias("__c1"),
                F.lead("__comp", times[i] - 1).over(w_asc).alias("__cm"),
            )
            cur = (
                cur.join(
                    qf,
                    (F.col(key) == F.col("__qk"))
                    & (F.col("__chain") == F.col("__c1")),
                    "inner",
                )
                .drop("__qk", "__chain", "__c1")
                .withColumnRenamed("__cm", "__chain")
                .filter(F.col("__chain").isNotNull())
            )
        # the matched step's identity DECODES from the composite itself
        # (fixed-width micros + id), so no join is needed to resolve it
        cur = cur.withColumns({
            f"step{i}_ts": F.timestamp_micros(
                F.substring("__chain", 1, 20).cast("bigint")
            ),
            f"step{i}_id": F.substring("__chain", 21, 19).cast("bigint"),
        })
        if i + 1 < n:
            # one keyed equi-join fetches the NEXT pointer stored on the
            # matched step's row — (N-2) joins total for an N-step match
            right = ev.filter(F.col(type_col).isin(steps[i])).select(
                F.col(key).alias("__rk"),
                F.col("__comp").alias("__match_comp"),
                F.col(f"__nxt{i+1}").alias("__chain_next"),
            )
            cur = (
                cur.join(
                    right,
                    (F.col(key) == F.col("__rk"))
                    & (F.col("__chain") == F.col("__match_comp")),
                    "inner",
                )
                .drop("__rk", "__chain", "__match_comp")
                .withColumnRenamed("__chain_next", "__chain")
            )
        else:
            cur = cur.drop("__chain")
    last = f"step{n-1}_ts"
    return cur.filter(
        F.col(last) <= F.col("step0_ts") + F.expr(f"INTERVAL {within_ms} MILLISECONDS")
    )


# ------------------------------------------------------------- streaming

def _match_buffer(
    events: list[tuple[int, int, str]], steps: list[list[str]], within_ms: int,
    times: list[int] | None = None,
):
    """Pure-python earliest-after chain matcher over one key's buffer.

    ``events``: (ts_micros, event_id, type), any order; each step is a
    list of alternative types (singleton for the common case) and
    ``times[i]`` its quantifier (the m-th occurrence after the previous
    matched step completes the step).  Returns completed matches as
    lists of (ts_micros, event_id) per step — the m-th occurrence for
    quantified steps.
    """
    times = times or [1] * len(steps)
    by_type: dict[str, list[tuple[int, int]]] = {}
    for ts, eid, et in events:
        by_type.setdefault(et, []).append((ts, eid))
    cands = []  # per step: merged sorted candidates over its alternatives
    for alts in steps:
        merged = [e for t in alts for e in by_type.get(t, [])]
        merged.sort()
        cands.append(merged)
    matches = []
    for anchor in cands[0]:
        chain = [anchor]
        ok = True
        for lst, m in zip(cands[1:], times[1:]):
            j = bisect_right(lst, chain[-1]) + m - 1
            if j >= len(lst):
                ok = False
                break
            chain.append(lst[j])
        if ok and chain[-1][0] <= anchor[0] + within_ms * 1000:
            matches.append(chain)
    return matches


_STREAM_ID_TYPES = {"bigint", "int", "smallint", "tinyint", "string"}


def _stream_types(df: DataFrame, key: str, event_id_col: str) -> tuple[str, str]:
    """SQL type names for the key and event-id columns, so the typed
    pandas state/output schemas follow the frame instead of assuming
    bigint (string domains/ids are common at web scale)."""
    key_t = df.schema[key].dataType.simpleString()
    id_t = df.schema[event_id_col].dataType.simpleString()
    for name, t in ((key, key_t), (event_id_col, id_t)):
        if t not in _STREAM_ID_TYPES:
            raise ValueError(
                f"streaming CEP supports integer/string key and id columns; "
                f"{name!r} is {t}"
            )
    return key_t, id_t


def _prune_stream_cols(src: DataFrame, *cols: str) -> DataFrame:
    """Project the stream to the columns the stateful operator reads
    (key, event time, type, id) BEFORE the keyed shuffle.  Payload
    columns (values, props, bodies) never reach the operator's output
    schema, so carrying them through the exchange and the Arrow
    round-trip into the Python state function is pure waste — on a
    wide event row the payload dominates the four bookkeeping columns.
    Catalyst does not prune through applyInPandasWithState on its own
    (the pandas function is opaque), so the projection must be
    explicit."""
    return src.select(*dict.fromkeys(cols))


def _grouped_stream(src: DataFrame, ts_col: str, watermark: str,
                    key: str, state_buckets: int | None):
    """Watermark + state grouping for the three stream operators: by a
    materialized ``xxhash64(key) % buckets`` column when bucketing
    (applyInPandasWithState re-resolves grouping attributes by name),
    else by the raw key."""
    wm = src.withWatermark(ts_col, watermark)
    if state_buckets:
        return wm.withColumn(
            "__bkt",
            F.pmod(F.xxhash64(F.col(key)), F.lit(int(state_buckets))),
        ).groupBy("__bkt")
    return wm.groupBy(key)


def _ingest_mask(pdf: pd.DataFrame, m, event_id_col: str, guard,
                 ts_col: str | None = None):
    """Final keep-mask over one micro-batch: ``m`` preselects
    pattern-relevant rows (numpy bool), the guard validates their ids
    (raising in on_invalid='raise', returning a sub-mask in 'drop'),
    and a null event-time drops the row in EVERY mode — the batch
    composite renders a null ts as a NULL (unorderable) composite that
    min() ignores, so buffering it here (where NaT would otherwise
    become INT64_MIN) would be a batch/stream divergence.
    Relies on the Arrow batch's RangeIndex (positions == labels)."""
    import numpy as np

    if ts_col is not None:
        nat = pdf[ts_col].isna().to_numpy()
        if nat.any():
            m = m & ~nat
    ids_s = pdf[event_id_col][m]
    ok = guard(ids_s)
    if bool(ok.all()):
        return m
    m2 = np.zeros(len(pdf), dtype=bool)
    m2[ids_s.index[ok]] = True
    return m2


def _ids_exact(pdf: pd.DataFrame, event_id_col: str, m, id_t: str):
    """Masked id extraction that cannot silently round: when ANY row of
    the micro-batch has a null id, the Arrow->pandas conversion has
    already promoted the whole int64 column to float64 — at that point
    ids >= 2**53 are unrepresentable and values are corrupted BEFORE
    this code runs.  on_invalid='drop' prevents the case entirely with
    a JVM-side null filter below the plan (see _drop_invalid_stream);
    this is the defence for the residual path (e.g. on_invalid='raise'
    with a null id on a pattern-IRRELEVANT row, which the per-row
    contract does not reject): verify the surviving floats are exactly
    representable and hand back real int64, raising loudly instead of
    emitting rounded ids."""
    import numpy as np

    ids = pdf[event_id_col].to_numpy()[m]
    if id_t != "string" and ids.dtype.kind == "f":
        if len(ids) and bool(np.any(np.abs(ids) >= 2.0 ** 53)):
            raise ValueError(
                f"cep: micro-batch contains a null {event_id_col} "
                "(float64 promotion) alongside ids >= 2^53, which "
                "cannot survive the conversion exactly; clean the id "
                "column or use on_invalid='drop' (which filters nulls "
                "JVM-side before the stateful operator)"
            )
        ids = ids.astype("int64")
    return ids


def _drop_invalid_stream(src: DataFrame, ts_col: str, event_id_col: str,
                         id_t: str, on_invalid: str) -> DataFrame:
    """on_invalid='drop': filter malformed rows JVM-side BEFORE the
    stateful operator.  This is not just an optimization — a null id
    reaching applyInPandasWithState makes Arrow->pandas promote the
    whole int64 id column to float64, silently rounding every
    surviving id above 2^53 in that batch (snowflake-scale ids).
    Dropping the rows in the plan keeps the column int64-exact
    end-to-end, and the null-ts predicate mirrors the batch
    ``__comp IS NOT NULL`` filter.  Like filter_types, Catalyst pushes
    this below the EventTimeWatermark node, so dropped (malformed)
    rows do not advance the watermark — consistent with the batch
    path, where they do not exist at all."""
    if on_invalid != "drop":
        return src
    valid = F.col(ts_col).isNotNull()
    if id_t == "string":
        valid = valid & F.col(event_id_col).isNotNull()
    else:
        # null-rejecting: CAST(null)>=0 is null -> filtered
        valid = valid & (F.col(event_id_col).cast("bigint") >= 0)
    return src.filter(valid)


def _sequence_match_stream(
    df: DataFrame, steps: list[list[str]], key: str, ts_col: str,
    type_col: str, within: str, event_id_col: str, watermark: str,
    filter_types: bool = False, times: list[int] | None = None,
    on_invalid: str = "raise", state_buckets: int | None = None,
) -> DataFrame:
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    n = len(steps)
    within_ms = _parse_duration_ms(within)
    key_t, id_t = _stream_types(df, key, event_id_col)
    ecast = str if id_t == "string" else int
    kcast = str if key_t == "string" else int
    guard = _id_guard(id_t, event_id_col, on_invalid)
    relevant = sorted({t for alts in steps for t in alts})
    out_schema = ", ".join(
        [f"{key} {key_t}"]
        + [f"step{i}_id {id_t}, step{i}_ts timestamp" for i in range(n)]
    )
    # State is keyed by a BUCKET of users (``state_buckets`` set) or by
    # the user itself (None).  Bucketing amortizes the stateful
    # operator's per-GROUP fixed cost — measured here at ~4 ms/group/
    # micro-batch of pure Arrow/state machinery with a no-op function —
    # across many users: 1500 users at 64 buckets is ~25x fewer group
    # round-trips per batch.  The per-user logic is IDENTICAL (same
    # buffer, same done-set, same decisions); only the state
    # partitioning changes, so batch≡stream parity is preserved.  The
    # uid column rides inside the state arrays; ``done`` tracks decided
    # anchors per user (anchor EVENTS stay buffered while inside the
    # horizon because steps[0]'s type may recur in steps[1:]).
    state_schema = (
        f"uid array<{key_t}>, ts array<bigint>, eid array<{id_t}>, "
        f"et array<string>, done_uid array<{key_t}>, done array<{id_t}>"
    )

    def fn(key_tuple, pdfs: Iterable[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        import numpy as np

        per_user: dict = {}
        done_by: dict = {}
        if state.exists:
            uid_l, ts_l, eid_l, et_l, duid_l, done_l = state.get
            for u, t, e, x in zip(uid_l, ts_l, eid_l, et_l):
                per_user.setdefault(u, []).append((t, e, x))
            for u, e in zip(duid_l or [], done_l or []):
                done_by.setdefault(u, set()).add(e)
        if not state.hasTimedOut:
            for pdf in pdfs:
                # numpy fast path (no pandas Index alignment): buffer
                # only pattern-relevant types — irrelevant events never
                # anchor, match, or clear anything — with id validation
                # scoped to relevant rows, as in the batch path
                et_a = pdf[type_col].to_numpy()
                m = _ingest_mask(pdf, np.isin(et_a, relevant),
                                 event_id_col, guard, ts_col)
                micros = (pdf[ts_col].astype("int64").to_numpy() // 1000)[m]
                for u, t, e, x in zip(pdf[key].to_numpy()[m], micros,
                                      _ids_exact(pdf, event_id_col, m, id_t),
                                      et_a[m]):
                    per_user.setdefault(u, []).append((t, e, x))
        wm_us = state.getCurrentWatermarkMs() * 1000
        horizon = wm_us - within_ms * 1000

        out_uid: list = []
        out_steps: list[list] = [[] for _ in range(n)]
        s_uid: list = []
        s_ts: list = []
        s_eid: list = []
        s_et: list = []
        s_duid: list = []
        s_done: list = []
        wake_us = None
        anchor_types = set(steps[0])
        for u, buf in per_user.items():
            done = done_by.get(u, set())
            matches = [m for m in _match_buffer(buf, steps, within_ms, times)
                       if m[0][1] not in done]
            stable = [m for m in matches if m[-1][0] <= wm_us]
            done |= {m[0][1] for m in stable}
            # anchors whose window closed unmatched are decided too
            done |= {eid for ts, eid, et in buf
                     if et in anchor_types and ts + within_ms * 1000 <= wm_us}
            # evict by horizon only: undecided anchors are always inside
            # it, decided anchors may still be later-step material
            keep = sorted(e for e in buf if e[0] >= horizon)
            done &= {eid for _, eid, et in keep if et in anchor_types}
            for m in stable:
                out_uid.append(u)
                for i in range(n):
                    out_steps[i].append(m[i])
            if keep:
                for t, e, x in keep:
                    s_uid.append(kcast(u))
                    s_ts.append(int(t))
                    s_eid.append(ecast(e))
                    s_et.append(str(x))
                for e in done:
                    s_duid.append(kcast(u))
                    s_done.append(ecast(e))
                # wake when the watermark passes this user's next
                # decision point: earliest UNdecided-anchor deadline or
                # earliest pending event, whichever first
                deadlines = [t + within_ms * 1000 for t, e, x in keep
                             if x in anchor_types and e not in done]
                w = min(deadlines) if deadlines else keep[0][0]
                wake_us = w if wake_us is None else min(wake_us, w)
        if s_uid:
            state.update((s_uid, s_ts, s_eid, s_et, s_duid, s_done))
            state.setTimeoutTimestamp(
                max(int(wake_us) // 1000 + 1,
                    state.getCurrentWatermarkMs() + 1)
            )
        else:
            state.remove()

        if out_uid:
            rows = {key: out_uid}
            for i in range(n):
                rows[f"step{i}_id"] = [m[1] for m in out_steps[i]]
                rows[f"step{i}_ts"] = pd.to_datetime(
                    np.fromiter((m[0] for m in out_steps[i]), dtype="int64"),
                    unit="us",
                )
            yield pd.DataFrame(rows)

    src = df
    if filter_types:
        # OPT-IN relevant-type pre-filter: cuts shuffle + state to
        # rate(step types) x within.  Not the default because Catalyst
        # pushes the predicate below the EventTimeWatermark node, so
        # non-step events then no longer advance the watermark — with
        # sparse step types (or flush events of a noise type) match
        # finalization would stall.  Enabled explicitly, or by the
        # AUTO mode when a type_share histogram shows step-relevant
        # events are dense enough to carry the watermark themselves.
        src = df.filter(F.col(type_col).isin(relevant))
    src = _prune_stream_cols(src, key, ts_col, type_col, event_id_col)
    src = _drop_invalid_stream(src, ts_col, event_id_col, id_t, on_invalid)
    grouped = _grouped_stream(src, ts_col, watermark, key, state_buckets)
    return grouped.applyInPandasWithState(
        fn, out_schema, state_schema, "append",
        GroupStateTimeout.EventTimeTimeout,
    )


def absence_match(
    df: DataFrame,
    steps: list[str],
    key: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    within: str = "30 minutes",
    event_id_col: str = "event_id",
    watermark: str | None = None,
    filter_types: bool | None = None,
    on_invalid: str = "raise",
    type_share: dict | None = None,
    state_buckets: int | None = None,
) -> DataFrame:
    """Negative pattern (the classic CEP timeout alert): emit every
    ``steps[0]`` event NOT followed by a ``steps[1]`` event within
    ``within`` — e.g. 'signup with no purchase inside 7 days'.  Either
    step may be a LIST of alternative types: ``[["view", "signup"],
    ["purchase", "refund"]]`` alerts on any view/signup not followed by
    any purchase/refund (alternation, same as sequence_match).

    Batch: the same one-sort window frame as :func:`sequence_match` —
    an anchor alerts iff its earliest strictly-later ``steps[1]`` is
    absent or outside the window.  Zero joins.

    Streaming: the sequence machinery inverted — an anchor's alert is
    decidable exactly when the watermark passes ``anchor_ts + within``
    (no qualifying event can arrive after that); event-time timeouts
    wake quiescent keys so alerts fire without new data.
    """
    if len(steps) != 2:
        raise ValueError("absence_match takes exactly [anchor, expected] steps")
    if on_invalid not in ("raise", "drop"):
        raise ValueError("on_invalid must be 'raise' or 'drop'")
    steps = [[s] if isinstance(s, str) else list(s) for s in steps]
    if df.isStreaming:
        return _absence_match_stream(
            df, steps, key, ts_col, type_col, within, event_id_col,
            watermark or "0 seconds",
            _resolve_filter_types(filter_types, steps, type_share),
            on_invalid, state_buckets,
        )
    within_ms = _parse_duration_ms(within)
    relevant = sorted(set(steps[0]) | set(steps[1]))
    # same relevant-type restriction as sequence_match: smaller window
    # sort, and id validation scoped to rows the pattern orders
    ev = df.filter(F.col(type_col).isin(relevant)).select(
        F.col(key), F.col(ts_col), F.col(event_id_col), F.col(type_col)
    ).withColumn("__comp", _comp_col(ts_col, event_id_col, on_invalid))
    if on_invalid == "drop":
        ev = ev.filter(F.col("__comp").isNotNull())
    w_later = (
        Window.partitionBy(key)
        .orderBy(F.col("__comp").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    nxt = F.min(
        F.when(F.col(type_col).isin(steps[1]), F.col("__comp"))
    ).over(w_later)
    out = (
        ev.withColumn("__nxt", nxt)
        .filter(F.col(type_col).isin(steps[0]))
        .withColumn(
            "__nxt_ts",
            F.timestamp_micros(F.substring("__nxt", 1, 20).cast("bigint")),
        )
    )
    deadline = F.col(ts_col).cast("timestamp") + F.expr(
        f"INTERVAL {within_ms} MILLISECONDS"
    )
    return (
        out.filter(F.col("__nxt").isNull() | (F.col("__nxt_ts") > deadline))
        .select(
            F.col(key),
            F.col(event_id_col).alias("anchor_id"),
            F.col(ts_col).cast("timestamp").alias("anchor_ts"),
        )
    )


def _absence_match_stream(
    df: DataFrame, steps: list[str], key: str, ts_col: str,
    type_col: str, within: str, event_id_col: str, watermark: str,
    filter_types: bool = False, on_invalid: str = "raise",
    state_buckets: int | None = None,
) -> DataFrame:
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    within_ms = _parse_duration_ms(within)
    key_t, id_t = _stream_types(df, key, event_id_col)
    ecast = str if id_t == "string" else int
    kcast = str if key_t == "string" else int
    guard = _id_guard(id_t, event_id_col, on_invalid)
    out_schema = f"{key} {key_t}, anchor_id {id_t}, anchor_ts timestamp"
    # Same bucketed-state layout as _sequence_match_stream (uid rides in
    # the state arrays; per-user semantics identical).  `done` tracks
    # decided (cleared or alerted) anchors; their events stay buffered
    # inside the horizon because with anchor type == expected type an
    # anchor event is also clearing material.
    state_schema = (
        f"uid array<{key_t}>, ts array<bigint>, eid array<{id_t}>, "
        f"et array<string>, done_uid array<{key_t}>, done array<{id_t}>"
    )
    anchors, expects_set = set(steps[0]), set(steps[1])
    relevant = sorted(anchors | expects_set)

    def fn(key_tuple, pdfs: Iterable[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        import numpy as np
        from bisect import bisect_right as _br

        per_user: dict = {}
        done_by: dict = {}
        if state.exists:
            uid_l, ts_l, eid_l, et_l, duid_l, done_l = state.get
            for u, t, e, x in zip(uid_l, ts_l, eid_l, et_l):
                per_user.setdefault(u, []).append((t, e, x))
            for u, e in zip(duid_l or [], done_l or []):
                done_by.setdefault(u, set()).add(e)
        if not state.hasTimedOut:
            for pdf in pdfs:
                micros = pdf[ts_col].astype("int64").to_numpy() // 1000
                et_a = pdf[type_col].to_numpy()
                m = _ingest_mask(pdf, np.isin(et_a, relevant),
                                 event_id_col, guard, ts_col)
                for u, t, e, x in zip(pdf[key].to_numpy()[m], micros[m],
                                      _ids_exact(pdf, event_id_col, m, id_t),
                                      et_a[m]):
                    per_user.setdefault(u, []).append((t, e, x))
        wm_us = state.getCurrentWatermarkMs() * 1000
        horizon_us = within_ms * 1000

        out_uid: list = []
        out_alerts: list = []
        s_uid: list = []
        s_ts: list = []
        s_eid: list = []
        s_et: list = []
        s_duid: list = []
        s_done: list = []
        wake_us = None
        for u, buf in per_user.items():
            done = done_by.get(u, set())
            expects = sorted((t, e) for t, e, x in buf if x in expects_set)
            for ts, eid, et in buf:
                if et not in anchors or eid in done:
                    continue
                j = _br(expects, (ts, eid))
                cleared = (j < len(expects)
                           and expects[j][0] <= ts + horizon_us)
                if cleared:
                    done.add(eid)  # followed in time: decided, no alert
                elif ts + horizon_us <= wm_us:
                    out_uid.append(u)  # window closed, never followed
                    out_alerts.append((ts, eid))
                    done.add(eid)
                # else: undecided, keep waiting
            keep = sorted(e for e in buf if e[0] > wm_us - horizon_us)
            done &= {eid for _, eid, et in keep if et in anchors}
            if keep:
                for t, e, x in keep:
                    s_uid.append(kcast(u))
                    s_ts.append(int(t))
                    s_eid.append(ecast(e))
                    s_et.append(str(x))
                for e in done:
                    s_duid.append(kcast(u))
                    s_done.append(ecast(e))
                deadlines = [t + horizon_us for t, e, x in keep
                             if x in anchors and e not in done]
                w = min(deadlines) if deadlines else keep[0][0]
                wake_us = w if wake_us is None else min(wake_us, w)
        if s_uid:
            state.update((s_uid, s_ts, s_eid, s_et, s_duid, s_done))
            state.setTimeoutTimestamp(
                max(int(wake_us) // 1000 + 1,
                    state.getCurrentWatermarkMs() + 1)
            )
        else:
            state.remove()
        if out_uid:
            yield pd.DataFrame({
                key: out_uid,
                "anchor_id": [e for _, e in out_alerts],
                "anchor_ts": pd.to_datetime(
                    np.fromiter((t for t, _ in out_alerts), dtype="int64"),
                    unit="us"),
            })

    src = df.filter(F.col(type_col).isin(relevant)) if filter_types else df
    src = _prune_stream_cols(src, key, ts_col, type_col, event_id_col)
    src = _drop_invalid_stream(src, ts_col, event_id_col, id_t, on_invalid)
    grouped = _grouped_stream(src, ts_col, watermark, key, state_buckets)
    return grouped.applyInPandasWithState(
        fn, out_schema, state_schema, "append",
        GroupStateTimeout.EventTimeTimeout,
    )


def threshold_match(
    df: DataFrame,
    event_type: str,
    n: int,
    key: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    within: str = "30 minutes",
    event_id_col: str = "event_id",
    watermark: str | None = None,
    filter_types: bool | None = None,
    on_invalid: str = "raise",
    type_share: dict | None = None,
    state_buckets: int | None = None,
) -> DataFrame:
    """Frequency pattern (the monitoring-alert shape): emit every
    ``event_type`` event that is the ``n``-th occurrence of that type
    for its key inside the trailing ``within`` window — e.g. '3 errors
    within 5 minutes'.  ``event_type`` may be a LIST of alternatives
    counted together ('3 errors-or-timeouts within 5 minutes').  A sustained burst re-alerts each time the
    trailing count re-crosses exactly ``n`` (alert re-arming),
    deterministically.

    Batch: one sort per key and a RANGE frame count over event-time
    micros — zero joins, whole-stage codegen.  Streaming: per-key
    buffer bounded by the window, each event decided exactly once when
    the watermark passes it (its trailing window is then complete).
    """
    if n < 1:
        raise ValueError("threshold_match needs n >= 1")
    if on_invalid not in ("raise", "drop"):
        raise ValueError("on_invalid must be 'raise' or 'drop'")
    event_type = [event_type] if isinstance(event_type, str) else list(event_type)
    if df.isStreaming:
        return _threshold_match_stream(
            df, event_type, n, key, ts_col, type_col, within, event_id_col,
            watermark or "0 seconds",
            _resolve_filter_types(filter_types, [event_type], type_share),
            on_invalid, state_buckets,
        )
    within_ms = _parse_duration_ms(within)
    ev = (
        df.filter(F.col(type_col).isin(event_type))
        .select(F.col(key), F.col(ts_col), F.col(event_id_col))
        .withColumn("__us", F.unix_micros(F.col(ts_col).cast("timestamp")))
    )
    w = (
        Window.partitionBy(key)
        .orderBy("__us")
        .rangeBetween(-(within_ms * 1000) + 1, 0)
    )
    return (
        ev.withColumn("__cnt", F.count(F.lit(1)).over(w))
        .filter(F.col("__cnt") == n)
        .select(
            F.col(key),
            F.col(event_id_col).alias("anchor_id"),
            F.col(ts_col).cast("timestamp").alias("anchor_ts"),
        )
    )


def _threshold_match_stream(
    df: DataFrame, event_type: str, n: int, key: str, ts_col: str,
    type_col: str, within: str, event_id_col: str, watermark: str,
    filter_types: bool = False, on_invalid: str = "raise",
    state_buckets: int | None = None,
) -> DataFrame:
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    within_ms = _parse_duration_ms(within)
    key_t, id_t = _stream_types(df, key, event_id_col)
    ecast = str if id_t == "string" else int
    kcast = str if key_t == "string" else int
    guard = _id_guard(id_t, event_id_col, on_invalid)
    out_schema = f"{key} {key_t}, anchor_id {id_t}, anchor_ts timestamp"
    # Bucketed layout like _sequence_match_stream.  frontier: decisions
    # are made once, for events in (frontier, wm] — kept PER USER
    # (fuid/frontiers pair arrays), because a bucket-global frontier
    # would silently skip the late-arriving FIRST events of a user who
    # joined the bucket after its other users advanced it (per-key
    # state starts such a user at frontier=-1, and parity means the
    # bucketed path must too).
    state_schema = (
        f"uid array<{key_t}>, ts array<bigint>, eid array<{id_t}>, "
        f"fuid array<{key_t}>, frontiers array<bigint>"
    )

    def fn(key_tuple, pdfs: Iterable[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        import numpy as np
        from bisect import bisect_left as _bl, bisect_right as _br2

        per_user: dict = {}
        frontier_by: dict = {}
        if state.exists:
            uid_l, ts_l, eid_l, fuid_l, fr_l = state.get
            for u, t, e in zip(uid_l, ts_l, eid_l):
                per_user.setdefault(u, []).append((t, e))
            frontier_by = dict(zip(fuid_l or [], fr_l or []))
        if not state.hasTimedOut:
            for pdf in pdfs:
                micros = pdf[ts_col].astype("int64").to_numpy() // 1000
                m = _ingest_mask(pdf, pdf[type_col].isin(event_type).to_numpy(),
                                 event_id_col, guard, ts_col)
                for u, t, e in zip(pdf[key].to_numpy()[m], micros[m],
                                   _ids_exact(pdf, event_id_col, m, id_t)):
                    per_user.setdefault(u, []).append((t, e))
        wm_us = state.getCurrentWatermarkMs() * 1000
        horizon_us = within_ms * 1000

        out_uid: list = []
        out_alerts: list = []
        s_uid: list = []
        s_ts: list = []
        s_eid: list = []
        s_fuid: list = []
        s_front: list = []
        wake_us = None
        for u, buf in per_user.items():
            frontier = frontier_by.get(u, -1)
            buf.sort()
            times = [t for t, _ in buf]
            for ts, eid in buf:
                if ts <= frontier or ts > wm_us:
                    continue  # already decided / not yet stable
                lo = _bl(times, ts - horizon_us + 1)
                # trailing count = all events in (ts-within, ts],
                # INCLUDING equal-ts peers — matching the batch RANGE
                # frame, where peers are in every tied row's frame
                cnt = _br2(times, ts) - lo
                if cnt == n:
                    out_uid.append(u)
                    out_alerts.append((ts, eid))
            keep = [(t, e) for t, e in buf if t > wm_us - horizon_us]
            if keep:
                for t, e in keep:
                    s_uid.append(kcast(u))
                    s_ts.append(int(t))
                    s_eid.append(ecast(e))
                s_fuid.append(kcast(u))
                s_front.append(int(max(frontier, wm_us)))
                undecided = [t for t, _ in keep if t > wm_us]
                w = min(undecided) if undecided else keep[0][0] + horizon_us
                wake_us = w if wake_us is None else min(wake_us, w)
        if s_uid:
            state.update((s_uid, s_ts, s_eid, s_fuid, s_front))
            state.setTimeoutTimestamp(
                max(int(wake_us) // 1000 + 1,
                    state.getCurrentWatermarkMs() + 1)
            )
        else:
            state.remove()
        if out_uid:
            yield pd.DataFrame({
                key: out_uid,
                "anchor_id": [e for _, e in out_alerts],
                "anchor_ts": pd.to_datetime(
                    np.fromiter((t for t, _ in out_alerts), dtype="int64"),
                    unit="us"),
            })

    src = df.filter(F.col(type_col).isin(event_type)) if filter_types else df
    src = _prune_stream_cols(src, key, ts_col, type_col, event_id_col)
    src = _drop_invalid_stream(src, ts_col, event_id_col, id_t, on_invalid)
    grouped = _grouped_stream(src, ts_col, watermark, key, state_buckets)
    return grouped.applyInPandasWithState(
        fn, out_schema, state_schema, "append",
        GroupStateTimeout.EventTimeTimeout,
    )
