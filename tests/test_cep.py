"""CEP sequence_match: batch correctness vs a brute-force reference,
batch plan shape, and stream ≡ batch parity through the state store."""

import datetime as dt
from bisect import bisect_right

import pyspark.sql.functions as F
import pytest

from riko_spark.streaming.cep import sequence_match

T0 = dt.datetime(2024, 1, 1)


def _ev(eid, minute, user, et):
    return (eid, T0 + dt.timedelta(minutes=minute), user, et)


SCHEMA = "event_id long, ts timestamp, user_id long, event_type string"


def _brute(rows, steps, within_min):
    """Independent earliest-after reference matcher."""
    by_user = {}
    for eid, ts, user, et in rows:
        by_user.setdefault(user, []).append((ts, eid, et))
    out = []
    for user, evs in by_user.items():
        by_type = {}
        for ts, eid, et in sorted(evs):
            by_type.setdefault(et, []).append((ts, eid))
        for anchor in by_type.get(steps[0], []):
            chain = [anchor]
            ok = True
            for st in steps[1:]:
                lst = by_type.get(st, [])
                j = bisect_right(lst, chain[-1])
                if j >= len(lst):
                    ok = False
                    break
                chain.append(lst[j])
            if ok and chain[-1][0] <= anchor[0] + dt.timedelta(minutes=within_min):
                out.append((user,) + tuple(x for c in chain for x in (c[1], c[0])))
    return sorted(out)


def _collect(df, n_steps):
    cols = ["user_id"]
    for i in range(n_steps):
        cols += [f"step{i}_id", f"step{i}_ts"]
    return sorted(tuple(r) for r in df.select(*cols).collect())


ROWS = [
    # user 1: A B C in window -> match; second A later with reused B? no
    _ev(1, 0, 1, "view"), _ev(2, 5, 1, "click"), _ev(3, 8, 1, "purchase"),
    # user 1 second anchor: its earliest later click is at 40, purchase at 45
    _ev(4, 30, 1, "view"), _ev(5, 40, 1, "click"), _ev(6, 45, 1, "purchase"),
    # user 2: steps out of order -> no match
    _ev(7, 0, 2, "click"), _ev(8, 5, 2, "view"), _ev(9, 3, 2, "purchase"),
    # user 3: complete but too slow (within 30) -> no match
    _ev(10, 0, 3, "view"), _ev(11, 20, 3, "click"), _ev(12, 35, 3, "purchase"),
    # user 4: anchor chooses EARLIEST click after it, not the one
    # right before the purchase
    _ev(13, 0, 4, "view"), _ev(14, 2, 4, "click"), _ev(15, 10, 4, "click"),
    _ev(16, 12, 4, "purchase"),
    # user 5: noise types interleaved
    _ev(17, 0, 5, "view"), _ev(18, 1, 5, "error"), _ev(19, 2, 5, "click"),
    _ev(20, 3, 5, "signup"), _ev(21, 4, 5, "purchase"),
]
STEPS = ["view", "click", "purchase"]


def test_sequence_match_batch_vs_brute(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    got = _collect(sequence_match(df, STEPS, within="30 minutes"), 3)
    assert got == _brute(ROWS, STEPS, 30)
    assert len(got) == 4  # users 1(x2), 4, 5


def test_sequence_match_two_step_no_join(spark):
    """A 2-step pattern compiles to the window pass alone — the plan
    must contain no join at all."""
    df = spark.createDataFrame(ROWS, SCHEMA)
    out = sequence_match(df, ["view", "click"], within="30 minutes")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert _collect(out, 2) == _brute(ROWS, ["view", "click"], 30)


def test_sequence_match_events_table(spark):
    """Larger corpus: engine result equals the brute-force reference on
    the sf0.001 events table."""
    path = "/root/testdata/sf0.001/events.parquet"
    df = spark.read.parquet(path)
    rows = [(r.event_id, r.ts, r.user_id, r.event_type)
            for r in df.select("event_id", "ts", "user_id", "event_type").collect()]
    got = _collect(sequence_match(df, STEPS, within="4 days"), 3)
    assert got == _brute(rows, STEPS, 4 * 24 * 60)
    assert len(got) > 0


def test_sequence_match_stream_batch_parity(spark, tmp_path):
    """File-stream drain through applyInPandasWithState equals the batch
    matcher.  A per-user flush event (noise type, far in the future)
    pushes the watermark past every real event so all pending matches
    finalize — the standard CEP end-of-stream technique."""
    import time

    flush_ts = T0 + dt.timedelta(days=2)
    flush = [(900 + u, flush_ts, u, "error") for u in range(1, 6)]
    df = spark.createDataFrame(list(ROWS) + flush, SCHEMA)
    expected = _collect(sequence_match(df, STEPS, within="30 minutes"), 3)

    src = str(tmp_path / "src")
    # several files so the drain takes multiple micro-batches and the
    # watermark actually advances between them; the flush file must be
    # ingested LAST (file source orders by mtime) or its day-2 events
    # race the watermark ahead and real events get dropped as late
    spark.createDataFrame(ROWS, SCHEMA).repartition(4).write.parquet(src)
    time.sleep(1.1)
    spark.createDataFrame(flush, SCHEMA).coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema(df.schema).option("maxFilesPerTrigger", 2).parquet(src)
    )
    out = sequence_match(stream, STEPS, within="30 minutes", watermark="0 seconds")
    sink = []

    def grab(batch, _bid):
        sink.extend(
            tuple(r)
            for r in batch.select(
                "user_id", "step0_id", "step0_ts", "step1_id", "step1_ts",
                "step2_id", "step2_ts").collect()
        )

    q = (
        out.writeStream.foreachBatch(grab)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)
    assert sorted(sink) == expected
    assert len(set(sink)) == len(sink)  # exactly-once: no duplicate matches


def _brute_absence(rows, steps, within_min):
    by_user = {}
    for eid, ts, user, et in rows:
        by_user.setdefault(user, []).append((ts, eid, et))
    out = []
    for user, evs in by_user.items():
        expects = sorted((ts, eid) for ts, eid, et in evs if et == steps[1])
        for ts, eid, et in sorted(evs):
            if et != steps[0]:
                continue
            j = bisect_right(expects, (ts, eid))
            followed = (j < len(expects)
                        and expects[j][0] <= ts + dt.timedelta(minutes=within_min))
            if not followed:
                out.append((user, eid, ts))
    return sorted(out)


def test_absence_match_batch(spark):
    from riko_spark.streaming.cep import absence_match

    df = spark.createDataFrame(ROWS, SCHEMA)
    out = absence_match(df, ["view", "purchase"], within="10 minutes")
    got = sorted(tuple(r) for r in out.select("user_id", "anchor_id", "anchor_ts").collect())
    assert got == _brute_absence(ROWS, ["view", "purchase"], 10)
    # zero joins: the alert resolves inside the single window pass
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan


def test_absence_match_stream_batch_parity(spark, tmp_path):
    import time

    from riko_spark.streaming.cep import absence_match

    flush_ts = T0 + dt.timedelta(days=2)
    flush = [(900 + u, flush_ts, u, "error") for u in range(1, 6)]
    df = spark.createDataFrame(list(ROWS) + flush, SCHEMA)
    expected = sorted(
        tuple(r) for r in absence_match(df, ["view", "purchase"], within="10 minutes")
        .select("user_id", "anchor_id", "anchor_ts").collect()
    )

    src = str(tmp_path / "src")
    spark.createDataFrame(ROWS, SCHEMA).repartition(4).write.parquet(src)
    time.sleep(1.1)
    spark.createDataFrame(flush, SCHEMA).coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema(df.schema).option("maxFilesPerTrigger", 2).parquet(src)
    )
    out = absence_match(stream, ["view", "purchase"], within="10 minutes",
                        watermark="0 seconds")
    sink = []

    def grab(batch, _bid):
        sink.extend(tuple(r) for r in
                    batch.select("user_id", "anchor_id", "anchor_ts").collect())

    q = (
        out.writeStream.foreachBatch(grab)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)
    assert sorted(sink) == expected
    assert len(set(sink)) == len(sink)


def test_cep_ops_registered(spark):
    """The pattern operators resolve through the pipe-module registry
    like any riko module."""
    from riko_spark.operators import get_operator

    df = spark.createDataFrame(ROWS, SCHEMA)
    seq = get_operator("sequence_match")(df, {"steps": STEPS, "within": "30 minutes"})
    assert seq.count() == 4
    ab = get_operator("absence_match")(
        df, {"steps": ["view", "purchase"], "within": "10 minutes"})
    assert ab.count() == len(_brute_absence(ROWS, ["view", "purchase"], 10))


def _brute_threshold(rows, event_type, n, within_min):
    by_user = {}
    for eid, ts, user, et in rows:
        if et == event_type:
            by_user.setdefault(user, []).append((ts, eid))
    out = []
    for user, evs in by_user.items():
        evs.sort()
        times = [t for t, _ in evs]
        for ts, eid in evs:
            lo = bisect_right(times, ts - dt.timedelta(minutes=within_min))
            cnt = bisect_right(times, ts) - lo
            if cnt == n:
                out.append((user, eid, ts))
    return sorted(out)


THRESH_ROWS = [
    # user 1: burst of 4 errors in 6 min -> alert fires at the 3rd
    _ev(1, 0, 1, "error"), _ev(2, 2, 1, "error"), _ev(3, 4, 1, "error"),
    _ev(4, 6, 1, "error"),
    # user 1 much later: re-armed burst -> fires again at its 3rd
    _ev(5, 100, 1, "error"), _ev(6, 101, 1, "error"), _ev(7, 102, 1, "error"),
    # user 2: only 2 errors in window -> silent
    _ev(8, 0, 2, "error"), _ev(9, 3, 2, "error"), _ev(10, 40, 2, "error"),
    # user 3: 3 errors but spread beyond the window -> silent
    _ev(11, 0, 3, "error"), _ev(12, 8, 3, "error"), _ev(13, 16, 3, "error"),
    # noise
    _ev(14, 1, 1, "view"), _ev(15, 2, 2, "click"),
]


def test_threshold_match_batch(spark):
    from riko_spark.streaming.cep import threshold_match

    df = spark.createDataFrame(THRESH_ROWS, SCHEMA)
    out = threshold_match(df, "error", 3, within="10 minutes")
    got = sorted(tuple(r) for r in out.select("user_id", "anchor_id", "anchor_ts").collect())
    assert got == _brute_threshold(THRESH_ROWS, "error", 3, 10)
    assert len(got) == 2  # user 1 fires twice (re-armed)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan


def test_threshold_match_events_table(spark):
    from riko_spark.streaming.cep import threshold_match

    df = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    rows = [(r.event_id, r.ts, r.user_id, r.event_type)
            for r in df.select("event_id", "ts", "user_id", "event_type").collect()]
    out = threshold_match(df, "click", 2, within="4 days")
    got = sorted(tuple(r) for r in out.select("user_id", "anchor_id", "anchor_ts").collect())
    assert got == _brute_threshold(rows, "click", 2, 4 * 24 * 60)
    assert len(got) > 0


def test_threshold_match_stream_batch_parity(spark, tmp_path):
    import time

    from riko_spark.streaming.cep import threshold_match

    flush_ts = T0 + dt.timedelta(days=2)
    flush = [(900 + u, flush_ts, u, "signup") for u in range(1, 4)]
    df = spark.createDataFrame(list(THRESH_ROWS) + flush, SCHEMA)
    expected = sorted(
        tuple(r) for r in threshold_match(df, "error", 3, within="10 minutes")
        .select("user_id", "anchor_id", "anchor_ts").collect()
    )

    src = str(tmp_path / "src")
    spark.createDataFrame(THRESH_ROWS, SCHEMA).repartition(4).write.parquet(src)
    time.sleep(1.1)
    spark.createDataFrame(flush, SCHEMA).coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema(df.schema).option("maxFilesPerTrigger", 2).parquet(src)
    )
    out = threshold_match(stream, "error", 3, within="10 minutes",
                          watermark="0 seconds")
    sink = []

    def grab(batch, _bid):
        sink.extend(tuple(r) for r in
                    batch.select("user_id", "anchor_id", "anchor_ts").collect())

    q = (
        out.writeStream.foreachBatch(grab)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)
    assert sorted(sink) == expected
    assert len(set(sink)) == len(sink)


def test_cep_in_declared_pipe_and_codegen(spark):
    """A declared pipe def using sequence_match compiles through both
    the DAG interpreter and the code generator with identical rows."""
    from riko_spark.plans.codegen import compile_pipe
    from riko_spark.plans.dag import build_pipeline

    pipe = {
        "modules": [
            {"id": "src", "type": "filter", "conf": {}},
            {"id": "seq", "type": "sequence_match",
             "conf": {"steps": ["view", "click", "purchase"],
                      "within": "30 minutes"}},
        ],
    }
    df = spark.createDataFrame(ROWS, SCHEMA)
    interp = build_pipeline(spark, pipe, sources={"src": df})
    fn, _src = compile_pipe(pipe, "cep_pipe")
    gen = fn(spark, sources={"src": df})
    a = sorted(tuple(r) for r in interp.collect())
    b = sorted(tuple(r) for r in gen.collect())
    assert a == b and len(a) == 4


def test_cep_property_fuzz(spark):
    """Property test: on randomized event streams (seeded), the engine's
    batch matchers equal the brute-force references for all three
    patterns.  Catches frame/tie/window-boundary edge cases the crafted
    fixtures miss."""
    import random

    rng = random.Random(20240817)
    types = ["view", "click", "purchase", "error", "noise"]
    for trial in range(4):
        rows = []
        eid = 0
        for user in range(1, 9):
            t = 0.0
            for _ in range(rng.randint(0, 25)):
                t += rng.choice([0.0, 0.5, 1.0, 3.0, 9.0])  # ties included
                rows.append((eid, T0 + dt.timedelta(minutes=t), user,
                             rng.choice(types)))
                eid += 1
        if not rows:
            continue
        df = spark.createDataFrame(rows, SCHEMA)

        got = _collect(sequence_match(df, STEPS, within="10 minutes"), 3)
        assert got == _brute(rows, STEPS, 10), f"sequence trial {trial}"

        from riko_spark.streaming.cep import absence_match, threshold_match

        ab = absence_match(df, ["view", "purchase"], within="10 minutes")
        got_a = sorted(tuple(r) for r in
                       ab.select("user_id", "anchor_id", "anchor_ts").collect())
        assert got_a == _brute_absence(rows, ["view", "purchase"], 10), \
            f"absence trial {trial}"

        th = threshold_match(df, "error", 2, within="10 minutes")
        got_t = sorted(tuple(r) for r in
                       th.select("user_id", "anchor_id", "anchor_ts").collect())
        assert got_t == _brute_threshold(rows, "error", 2, 10), \
            f"threshold trial {trial}"


def test_sequence_match_recurring_anchor_type(spark, tmp_path):
    """steps[0] recurring later in the pattern (['click','click',
    'purchase']): an anchor event is ALSO later-step material, so
    emitting/expiring one anchor must not remove it from other anchors'
    chains.  Stream must still equal batch."""
    import time

    rows = [
        _ev(1, 0, 1, "click"), _ev(2, 4, 1, "click"), _ev(3, 6, 1, "purchase"),
        _ev(4, 20, 1, "click"), _ev(5, 22, 1, "click"), _ev(6, 23, 1, "purchase"),
        _ev(7, 0, 2, "click"), _ev(8, 40, 2, "click"), _ev(9, 41, 2, "purchase"),
    ]
    steps = ["click", "click", "purchase"]
    flush = [(900 + u, T0 + dt.timedelta(days=2), u, "error") for u in (1, 2)]
    df = spark.createDataFrame(rows + flush, SCHEMA)
    expected = _collect(sequence_match(df, steps, within="10 minutes"), 3)
    assert expected == _brute(rows + flush, steps, 10)
    assert len(expected) >= 2  # overlapping anchors both complete

    src = str(tmp_path / "src")
    spark.createDataFrame(rows, SCHEMA).repartition(3).write.parquet(src)
    time.sleep(1.1)
    spark.createDataFrame(flush, SCHEMA).coalesce(1).write.mode("append").parquet(src)
    stream = (spark.readStream.schema(df.schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    # files are ingested in arbitrary order, so give the stream a
    # watermark delay covering the intra-stream disorder (the day-2
    # flush still pushes the watermark past every real decision point)
    out = sequence_match(stream, steps, within="10 minutes", watermark="1 day")
    sink = []

    def grab(batch, _bid):
        sink.extend(tuple(r) for r in batch.select(
            "user_id", "step0_id", "step0_ts", "step1_id", "step1_ts",
            "step2_id", "step2_ts").collect())

    q = (out.writeStream.foreachBatch(grab).outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(240)
    assert sorted(sink) == expected


def test_sequence_match_snowflake_ids(spark):
    """Event ids beyond 10 digits (snowflake-style bigints) must encode
    and decode exactly through the fixed-width composite."""
    big = 1234567890123456789  # 19 digits, near bigint max
    rows = [(big, T0, 1, "view"), (big + 1, T0 + dt.timedelta(minutes=1), 1, "click")]
    df = spark.createDataFrame(rows, SCHEMA)
    out = sequence_match(df, ["view", "click"], within="10 minutes")
    r = out.collect()[0]
    assert r["step0_id"] == big and r["step1_id"] == big + 1


def test_cep_stream_string_key(spark, tmp_path):
    """Streaming CEP with a STRING key column (web-scale domains):
    typed schemas must follow the frame instead of assuming bigint."""
    import time

    schema = "event_id long, ts timestamp, domain string, event_type string"
    rows = [(1, T0, "a.com", "view"), (2, T0 + dt.timedelta(minutes=2), "a.com", "click"),
            (3, T0, "b.com", "view")]
    flush = [(91, T0 + dt.timedelta(days=2), "a.com", "error"),
             (92, T0 + dt.timedelta(days=2), "b.com", "error")]
    df = spark.createDataFrame(rows + flush, schema)
    expected = sorted(tuple(r) for r in sequence_match(
        df, ["view", "click"], key="domain", within="10 minutes"
    ).select("domain", "step0_id", "step1_id").collect())

    src = str(tmp_path / "src")
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(src)
    time.sleep(1.1)
    spark.createDataFrame(flush, schema).coalesce(1).write.mode("append").parquet(src)
    stream = (spark.readStream.schema(df.schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    out = sequence_match(stream, ["view", "click"], key="domain",
                         within="10 minutes", watermark="0 seconds")
    sink = []

    def grab(batch, _bid):
        sink.extend(tuple(r) for r in
                    batch.select("domain", "step0_id", "step1_id").collect())

    q = (out.writeStream.foreachBatch(grab).outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(240)
    assert sorted(sink) == expected and len(sink) == 1


def _brute_alt(rows, steps, within_min):
    """Brute matcher generalized to per-step alternative type lists."""
    steps = [[st] if isinstance(st, str) else list(st) for st in steps]
    by_user = {}
    for eid, ts, user, et in rows:
        by_user.setdefault(user, []).append((ts, eid, et))
    out = []
    for user, evs in by_user.items():
        by_type = {}
        for ts, eid, et in sorted(evs):
            by_type.setdefault(et, []).append((ts, eid))
        cands = []
        for alts in steps:
            merged = sorted(e for t in alts for e in by_type.get(t, []))
            cands.append(merged)
        for anchor in cands[0]:
            chain = [anchor]
            ok = True
            for lst in cands[1:]:
                j = bisect_right(lst, chain[-1])
                if j >= len(lst):
                    ok = False
                    break
                chain.append(lst[j])
            if ok and chain[-1][0] <= anchor[0] + dt.timedelta(minutes=within_min):
                out.append((user,) + tuple(x for c in chain for x in (c[1], c[0])))
    return sorted(out)


ALT_STEPS = ["view", ["click", "signup"], "purchase"]


def test_sequence_match_alternation_batch(spark):
    """Step alternation (view → click-OR-signup → purchase): engine
    equals the generalized brute matcher; the earliest event of EITHER
    alternative wins (user 5: signup at minute... click at 2 beats
    signup at 3)."""
    df = spark.createDataFrame(ROWS, SCHEMA)
    got = _collect(sequence_match(df, ALT_STEPS, within="30 minutes"), 3)
    assert got == _brute_alt(ROWS, ALT_STEPS, 30)
    assert len(got) >= 4
    # user 5 specifically: click(19, minute 2) beats signup(20, minute 3)
    u5 = [g for g in got if g[0] == 5]
    assert u5 and u5[0][3] == 19


def test_sequence_match_alternation_events_table(spark):
    """Alternation on the sf0.001 events corpus vs brute reference."""
    path = "/root/testdata/sf0.001/events.parquet"
    df = spark.read.parquet(path)
    rows = [(r.event_id, r.ts, r.user_id, r.event_type)
            for r in df.select("event_id", "ts", "user_id", "event_type").collect()]
    steps = ["view", ["click", "signup"], "purchase"]
    got = _collect(sequence_match(df, steps, within="4 days"), 3)
    assert got == _brute_alt(rows, steps, 4 * 24 * 60)
    assert len(got) > 0


def test_sequence_match_alternation_stream_batch_parity(spark, tmp_path):
    """Alternation through the stateful streaming path: same rows as
    batch once the flush pushes the watermark past every event, and the
    relevant-type filter does NOT starve the watermark (the flush event
    type is not a step type)."""
    import time

    flush_ts = T0 + dt.timedelta(days=2)
    flush = [(900 + u, flush_ts, u, "error") for u in range(1, 6)]
    df = spark.createDataFrame(list(ROWS) + flush, SCHEMA)
    expected = _collect(sequence_match(df, ALT_STEPS, within="30 minutes"), 3)

    src = str(tmp_path / "src")
    spark.createDataFrame(ROWS, SCHEMA).repartition(4).write.parquet(src)
    time.sleep(1.1)
    spark.createDataFrame(flush, SCHEMA).coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema(df.schema).option("maxFilesPerTrigger", 2).parquet(src)
    )
    out = sequence_match(stream, ALT_STEPS, within="30 minutes", watermark="0 seconds")
    sink = []

    def grab(batch, _bid):
        sink.extend(
            tuple(r)
            for r in batch.select(
                "user_id", "step0_id", "step0_ts", "step1_id", "step1_ts",
                "step2_id", "step2_ts").collect()
        )

    q = (
        out.writeStream.foreachBatch(grab)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)
    assert sorted(sink) == expected
    assert len(set(sink)) == len(sink)


def test_sequence_match_stream_filter_types_optin(spark, tmp_path):
    """filter_types=True drops non-step types before the stateful
    operator (state/shuffle bound by step-type rate).  The flush must
    then be a STEP type — non-step events no longer advance the
    watermark, which is exactly why the flag defaults to False."""
    import time

    flush_ts = T0 + dt.timedelta(days=2)
    flush = [(900 + u, flush_ts, u, "view") for u in range(1, 6)]
    df = spark.createDataFrame(list(ROWS) + flush, SCHEMA)
    # flush anchors never complete: matches equal the batch rows on ROWS
    expected = _collect(sequence_match(df, STEPS, within="30 minutes"), 3)

    src = str(tmp_path / "src")
    spark.createDataFrame(ROWS, SCHEMA).repartition(4).write.parquet(src)
    time.sleep(1.1)
    spark.createDataFrame(flush, SCHEMA).coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema(df.schema).option("maxFilesPerTrigger", 2).parquet(src)
    )
    out = sequence_match(stream, STEPS, within="30 minutes",
                         watermark="0 seconds", filter_types=True)
    sink = []

    def grab(batch, _bid):
        sink.extend(tuple(r) for r in batch.select(
            "user_id", "step0_id", "step0_ts", "step1_id", "step1_ts",
            "step2_id", "step2_ts").collect())

    q = (out.writeStream.foreachBatch(grab).outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(240)
    assert sorted(sink) == expected


def _brute_quant(rows, specs, within_min):
    """Brute matcher with (alts, times) step specs."""
    norm = []
    for s in specs:
        if isinstance(s, dict):
            t = s.get("types", s.get("type"))
            norm.append(([t] if isinstance(t, str) else list(t),
                         int(s.get("times", 1))))
        elif isinstance(s, str):
            norm.append(([s], 1))
        else:
            norm.append((list(s), 1))
    by_user = {}
    for eid, ts, user, et in rows:
        by_user.setdefault(user, []).append((ts, eid, et))
    out = []
    for user, evs in by_user.items():
        by_type = {}
        for ts, eid, et in sorted(evs):
            by_type.setdefault(et, []).append((ts, eid))
        cands = [sorted(e for t in alts for e in by_type.get(t, []))
                 for alts, _ in norm]
        for anchor in cands[0]:
            chain = [anchor]
            ok = True
            for lst, (_, m) in zip(cands[1:], norm[1:]):
                j = bisect_right(lst, chain[-1]) + m - 1
                if j >= len(lst):
                    ok = False
                    break
                chain.append(lst[j])
            if ok and chain[-1][0] <= anchor[0] + dt.timedelta(minutes=within_min):
                out.append((user,) + tuple(x for c in chain for x in (c[1], c[0])))
    return sorted(out)


QUANT_STEPS = ["view", {"type": "click", "times": 2}, "purchase"]


def test_sequence_match_quantified_batch(spark):
    """view → 2nd click → purchase: user 4 has clicks at minutes 2 and
    10, purchase at 12 — the match binds the SECOND click (id 15), and
    users with a single click produce no match."""
    df = spark.createDataFrame(ROWS, SCHEMA)
    got = _collect(sequence_match(df, QUANT_STEPS, within="30 minutes"), 3)
    assert got == _brute_quant(ROWS, QUANT_STEPS, 30)
    u4 = [g for g in got if g[0] == 4]
    assert u4 and u4[0][3] == 15  # step1 = second click
    assert not [g for g in got if g[0] == 5]  # user 5: only one click


def test_sequence_match_quantified_events_table(spark):
    path = "/root/testdata/sf0.001/events.parquet"
    df = spark.read.parquet(path)
    rows = [(r.event_id, r.ts, r.user_id, r.event_type)
            for r in df.select("event_id", "ts", "user_id", "event_type").collect()]
    got = _collect(sequence_match(df, QUANT_STEPS, within="4 days"), 3)
    assert got == _brute_quant(rows, QUANT_STEPS, 4 * 24 * 60)
    assert len(got) > 0
    strict = _collect(sequence_match(df, STEPS, within="4 days"), 3)
    assert len(got) < len(strict)  # quantifier strictly narrows


def test_sequence_match_quantified_rejects_anchor_quantifier(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    with pytest.raises(ValueError, match="anchor"):
        sequence_match(df, [{"type": "view", "times": 2}, "purchase"])


def test_sequence_match_quantified_stream_batch_parity(spark, tmp_path):
    import time

    flush_ts = T0 + dt.timedelta(days=2)
    flush = [(900 + u, flush_ts, u, "error") for u in range(1, 6)]
    df = spark.createDataFrame(list(ROWS) + flush, SCHEMA)
    expected = _collect(sequence_match(df, QUANT_STEPS, within="30 minutes"), 3)

    src = str(tmp_path / "src")
    spark.createDataFrame(ROWS, SCHEMA).repartition(4).write.parquet(src)
    time.sleep(1.1)
    spark.createDataFrame(flush, SCHEMA).coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema(df.schema).option("maxFilesPerTrigger", 2).parquet(src)
    )
    out = sequence_match(stream, QUANT_STEPS, within="30 minutes",
                         watermark="0 seconds")
    sink = []

    def grab(batch, _bid):
        sink.extend(tuple(r) for r in batch.select(
            "user_id", "step0_id", "step0_ts", "step1_id", "step1_ts",
            "step2_id", "step2_ts").collect())

    q = (out.writeStream.foreachBatch(grab).outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(240)
    assert sorted(sink) == expected
    assert len(set(sink)) == len(sink)


def test_absence_match_alternation_batch(spark):
    """Anchor and clearing steps accept alternatives: (view OR signup)
    not followed by (purchase OR click) within the window."""
    from riko_spark.streaming.cep import absence_match

    rows = [
        _ev(1, 0, 1, "view"),     # cleared by click at 5
        _ev(2, 5, 1, "click"),
        _ev(3, 10, 1, "signup"),  # never followed -> alert
        _ev(4, 0, 2, "signup"),   # cleared by purchase at 8
        _ev(5, 8, 2, "purchase"),
        _ev(6, 20, 2, "view"),    # followed only OUTSIDE window -> alert
        _ev(7, 60, 2, "click"),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    got = sorted(
        (r["user_id"], r["anchor_id"])
        for r in absence_match(
            df, [["view", "signup"], ["purchase", "click"]],
            within="30 minutes",
        ).collect()
    )
    assert got == [(1, 3), (2, 6)]


def test_threshold_match_alternation(spark):
    """A type-set threshold: the 3rd error-or-timeout within the
    window alerts, counting both types together."""
    from riko_spark.streaming.cep import threshold_match

    rows = [
        _ev(1, 0, 1, "error"), _ev(2, 2, 1, "timeout"), _ev(3, 4, 1, "error"),
        _ev(4, 40, 1, "error"),             # outside any dense burst
        _ev(5, 0, 2, "error"), _ev(6, 2, 2, "error"),  # only two
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    got = sorted(
        (r["user_id"], r["anchor_id"])
        for r in threshold_match(df, ["error", "timeout"], 3,
                                 within="10 minutes").collect()
    )
    assert got == [(1, 3)]

# ----------------------------------------------------- round-5 additions

def test_sequence_match_on_invalid_drop_batch(spark):
    """on_invalid='drop': a malformed id among relevant types skips that
    ROW instead of aborting the query; results equal the clean input's.
    Default mode still raises."""
    from pyspark.errors import PySparkException

    dirty = list(ROWS) + [(-99, T0 + dt.timedelta(minutes=1), 1, "click")]
    df = spark.createDataFrame(dirty, SCHEMA)

    with pytest.raises(PySparkException):
        _collect(sequence_match(df, STEPS, within="30 minutes"), 3)

    clean_expected = _collect(
        sequence_match(spark.createDataFrame(ROWS, SCHEMA), STEPS,
                       within="30 minutes"), 3)
    got = _collect(
        sequence_match(df, STEPS, within="30 minutes", on_invalid="drop"), 3)
    assert got == clean_expected


def test_id_guard_contract():
    """Streaming per-batch id guard enforces the batch composite's
    contract: null/negative integer ids raise (or drop), string ids
    only need to be non-null."""
    import pandas as pd

    from riko_spark.streaming.cep import _id_guard

    g = _id_guard("bigint", "event_id", "raise")
    assert g(pd.Series([1, 2, 3])).all()
    with pytest.raises(ValueError, match="non-negative"):
        g(pd.Series([1, -2, 3]))
    with pytest.raises(ValueError, match="non-negative"):
        g(pd.Series([1.0, None, 3.0]))

    gd = _id_guard("bigint", "event_id", "drop")
    assert list(gd(pd.Series([1, -2, None, 4]))) == [True, False, False, True]

    gs = _id_guard("string", "event_id", "drop")
    assert list(gs(pd.Series(["a", None, "c"]))) == [True, False, True]


def test_sequence_match_stream_on_invalid_drop(spark, tmp_path):
    """Streaming drop mode ≡ batch drop mode on input containing a
    malformed id — the shared contract, enforced on both paths."""
    import time

    dirty = list(ROWS) + [(-99, T0 + dt.timedelta(minutes=1), 1, "click")]
    flush_ts = T0 + dt.timedelta(days=2)
    flush = [(900 + u, flush_ts, u, "error") for u in range(1, 6)]
    df = spark.createDataFrame(dirty + flush, SCHEMA)
    expected = _collect(
        sequence_match(df, STEPS, within="30 minutes", on_invalid="drop"), 3)

    src = str(tmp_path / "src")
    spark.createDataFrame(dirty, SCHEMA).repartition(4).write.parquet(src)
    time.sleep(1.1)
    spark.createDataFrame(flush, SCHEMA).coalesce(1).write.mode("append").parquet(src)
    stream = (spark.readStream.schema(df.schema)
              .option("maxFilesPerTrigger", 2).parquet(src))
    out = sequence_match(stream, STEPS, within="30 minutes",
                         watermark="0 seconds", on_invalid="drop")
    sink = []

    def grab(batch, _bid):
        sink.extend(tuple(r) for r in batch.select(
            "user_id", "step0_id", "step0_ts", "step1_id", "step1_ts",
            "step2_id", "step2_ts").collect())

    q = (out.writeStream.foreachBatch(grab).outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(240)
    assert sorted(sink) == expected


def test_filter_types_auto_resolution():
    """AUTO mode (filter_types=None): pre-filter turns on iff the
    declared type_share shows step types are dense; explicit flags
    always win; no histogram = off (never stall finalization)."""
    from riko_spark.streaming.cep import _resolve_filter_types

    steps = [["view"], ["click"], ["purchase"]]
    dense = {"view": 0.4, "click": 0.3, "purchase": 0.2, "error": 0.1}
    sparse = {"view": 0.01, "click": 0.01, "purchase": 0.01, "noise": 0.97}
    assert _resolve_filter_types(None, steps, dense) is True
    assert _resolve_filter_types(None, steps, sparse) is False
    assert _resolve_filter_types(None, steps, None) is False
    assert _resolve_filter_types(False, steps, dense) is False
    assert _resolve_filter_types(True, steps, sparse) is True


def test_profile_type_share(spark):
    from riko_spark.streaming.cep import profile_type_share

    df = spark.createDataFrame(ROWS, SCHEMA)
    share = profile_type_share(df)
    assert abs(sum(share.values()) - 1.0) < 1e-9
    assert share["view"] == pytest.approx(6 / len(ROWS))


def test_sequence_match_stream_filter_types_auto(spark, tmp_path):
    """End-to-end AUTO: a dense type_share takes the filtered plan
    (non-step flush events are dropped pre-watermark, so their anchors
    never appear and only step types reach the state store), while a
    sparse histogram keeps the filter off and noise-type flush events
    still finalize matches."""
    import time

    from riko_spark.streaming.cep import profile_type_share

    flush_ts = T0 + dt.timedelta(days=2)
    batch_df = spark.createDataFrame(ROWS, SCHEMA)
    share = profile_type_share(batch_df)  # ROWS are step-type dense
    assert sum(share.get(t, 0) for t in STEPS) >= 0.10

    # dense AUTO -> filtered plan: flush must be a STEP type to advance
    # the watermark (same contract as explicit filter_types=True)
    flush = [(900 + u, flush_ts, u, "view") for u in range(1, 6)]
    df = spark.createDataFrame(list(ROWS) + flush, SCHEMA)
    expected = _collect(sequence_match(df, STEPS, within="30 minutes"), 3)

    src = str(tmp_path / "src")
    spark.createDataFrame(ROWS, SCHEMA).repartition(4).write.parquet(src)
    time.sleep(1.1)
    spark.createDataFrame(flush, SCHEMA).coalesce(1).write.mode("append").parquet(src)
    stream = (spark.readStream.schema(df.schema)
              .option("maxFilesPerTrigger", 2).parquet(src))
    out = sequence_match(stream, STEPS, within="30 minutes",
                         watermark="0 seconds", type_share=share)
    # the filtered plan is visible in the analyzed streaming plan: a
    # type-isin Filter sits below the watermark node
    plan = out._jdf.queryExecution().analyzed().toString()
    assert "event_type" in plan and "purchase" in plan

    sink = []

    def grab(batch, _bid):
        sink.extend(tuple(r) for r in batch.select(
            "user_id", "step0_id", "step0_ts", "step1_id", "step1_ts",
            "step2_id", "step2_ts").collect())

    q = (out.writeStream.foreachBatch(grab).outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(240)
    assert sorted(sink) == expected


def test_sequence_match_stream_bucketed_state_parity(spark, tmp_path):
    """state_buckets groups MANY users per state row (the stateful
    operator's per-group fixed cost amortizes ~|keys|/buckets×) with
    bit-identical output to per-key state: same matches, same
    exactly-once, through the same drain."""
    import time

    flush_ts = T0 + dt.timedelta(days=2)
    flush = [(900 + u, flush_ts, u, "error") for u in range(1, 6)]
    df = spark.createDataFrame(list(ROWS) + flush, SCHEMA)
    expected = _collect(sequence_match(df, STEPS, within="30 minutes"), 3)

    src = str(tmp_path / "src")
    spark.createDataFrame(ROWS, SCHEMA).repartition(4).write.parquet(src)
    time.sleep(1.1)
    spark.createDataFrame(flush, SCHEMA).coalesce(1).write.mode("append").parquet(src)
    stream = (spark.readStream.schema(df.schema)
              .option("maxFilesPerTrigger", 2).parquet(src))
    out = sequence_match(stream, STEPS, within="30 minutes",
                         watermark="0 seconds", state_buckets=2)
    sink = []

    def grab(batch, _bid):
        sink.extend(tuple(r) for r in batch.select(
            "user_id", "step0_id", "step0_ts", "step1_id", "step1_ts",
            "step2_id", "step2_ts").collect())

    q = (out.writeStream.foreachBatch(grab).outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(240)
    assert sorted(sink) == expected
    assert len(set(sink)) == len(sink)


def test_absence_threshold_bucketed_state_parity(spark, tmp_path):
    """state_buckets for absence_match and threshold_match: identical
    alerts to per-key state through the same drain."""
    import time

    from riko_spark.streaming.cep import absence_match, threshold_match

    flush_ts = T0 + dt.timedelta(days=2)
    flush = [(900 + u, flush_ts, u, "noise") for u in range(1, 6)]
    df = spark.createDataFrame(list(ROWS) + flush, SCHEMA)
    exp_abs = sorted(
        tuple(r) for r in absence_match(df, ["view", "purchase"],
                                        within="10 minutes")
        .select("user_id", "anchor_id", "anchor_ts").collect())
    exp_thr = sorted(
        tuple(r) for r in threshold_match(df, "click", 2,
                                          within="40 minutes")
        .select("user_id", "anchor_id", "anchor_ts").collect())

    src = str(tmp_path / "src")
    spark.createDataFrame(ROWS, SCHEMA).repartition(4).write.parquet(src)
    time.sleep(1.1)
    spark.createDataFrame(flush, SCHEMA).coalesce(1).write.mode("append").parquet(src)

    def drain(out, ck):
        sink = []
        q = (out.writeStream.foreachBatch(
                lambda b, _i: sink.extend(tuple(r) for r in b.select(
                    "user_id", "anchor_id", "anchor_ts").collect()))
             .outputMode("append")
             .option("checkpointLocation", str(tmp_path / ck))
             .trigger(availableNow=True).start())
        q.awaitTermination(240)
        return sorted(sink)

    stream = (spark.readStream.schema(df.schema)
              .option("maxFilesPerTrigger", 2).parquet(src))
    got_abs = drain(absence_match(stream, ["view", "purchase"],
                                  within="10 minutes", watermark="0 seconds",
                                  state_buckets=2), "cka")
    assert got_abs == exp_abs
    got_thr = drain(threshold_match(stream, "click", 2, within="40 minutes",
                                    watermark="0 seconds", state_buckets=2),
                    "ckt")
    assert got_thr == exp_thr
