"""Round-4 hardening: regression tests for the advisor findings.

1. CEP batch paths validate event ids (negative/null/garbage raise
   instead of silently mis-ordering the fixed-width composite).
2. UpsertSink reads merge schemas across generations frozen at
   different batches (schema evolution).
3. rename/delete of a NESTED field actually removes the struct
   subfield (dropFields), matching riko's key-removal semantics.
4. Capped-plan drop accounting no longer parks one watcher thread per
   built plan; a single shared poller drains observations.
5. fetch_join survives percent-encoded characters (space, plus) in
   resolved file paths.
6. embedding_dim resolves from column metadata with zero jobs.
"""

import json
import os
import threading

import pytest
import pyspark.sql.functions as F


# ---------------------------------------------------------------- 1. CEP ids

def _events(spark, rows):
    from datetime import datetime

    rows = [(u, datetime.fromisoformat(ts), i, t) for u, ts, i, t in rows]
    return spark.createDataFrame(
        rows, "user_id string, ts timestamp, event_id long, event_type string"
    )


def test_cep_batch_rejects_negative_event_id(spark):
    from riko_spark.streaming.cep import sequence_match

    df = _events(spark, [
        ("u1", "2024-01-01 00:00:00", -5, "view"),
        ("u1", "2024-01-01 00:01:00", 2, "buy"),
    ])
    out = sequence_match(df, ["view", "buy"], within="10 minutes")
    with pytest.raises(Exception, match="non-negative"):
        out.collect()


def test_cep_batch_rejects_null_event_id(spark):
    from riko_spark.streaming.cep import absence_match

    df = _events(spark, [
        ("u1", "2024-01-01 00:00:00", None, "view"),
    ])
    out = absence_match(df, ["view", "buy"], within="10 minutes")
    with pytest.raises(Exception, match="non-negative"):
        out.collect()


def test_cep_batch_valid_ids_still_match(spark):
    from riko_spark.streaming.cep import sequence_match

    df = _events(spark, [
        ("u1", "2024-01-01 00:00:00", 1, "view"),
        ("u1", "2024-01-01 00:01:00", 2, "buy"),
    ])
    got = sequence_match(df, ["view", "buy"], within="10 minutes").collect()
    assert len(got) == 1 and got[0]["step0_id"] == 1 and got[0]["step1_id"] == 2


# ------------------------------------------------- 2. sink schema evolution

def test_upsert_sink_merges_schemas_across_generations(spark, tmp_path):
    from riko_spark.streaming.sink import UpsertSink

    sink = UpsertSink(str(tmp_path / "sink"), keys=["k"], num_buckets=2)
    b0 = spark.createDataFrame([("a", 1), ("b", 2)], "k string, v int")
    sink(b0, 0)
    # batch 1 evolves the schema (adds `extra`) and touches only key 'a'
    b1 = spark.createDataFrame([("a", 10, "new")], "k string, v int, extra string")
    sink(b1, 1)
    got = {r["k"]: r.asDict() for r in sink.result(spark).collect()}
    assert set(got) == {"a", "b"}
    assert got["a"]["v"] == 10 and got["a"]["extra"] == "new"
    # 'b' lives in a generation frozen BEFORE the evolution: the read
    # must still surface the union schema, with NULL for the new column
    assert got["b"]["v"] == 2 and got["b"]["extra"] is None


# ------------------------------------------------------ 3. nested rename/del

def test_rename_nested_field_removes_source_subfield(spark):
    from riko_spark.operators.structure import rename_op

    df = spark.createDataFrame(
        [({"b": "keepme", "c": 7}, 1)], "a struct<b:string,c:int>, id int"
    )
    out = rename_op(df, {"rule": [{"field": "a.b", "newval": "x"}]})
    row = out.first()
    assert row["x"] == "keepme"
    assert "b" not in out.schema["a"].dataType.names  # subfield really gone
    assert row["a"].asDict() == {"c": 7}


def test_rename_delete_last_nested_field_drops_parent(spark):
    from riko_spark.operators.structure import rename_op

    df = spark.createDataFrame([({"b": "v"}, 1)], "a struct<b:string>, id int")
    out = rename_op(df, {"rule": [{"field": "a.b", "newval": "x"}]})
    assert out.columns == ["id", "x"]  # empty struct is unrepresentable


def test_rename_flat_column_literally_named_with_dot_wins(spark):
    from riko_spark.operators.structure import rename_op

    df = spark.createDataFrame([("flat", 1)], "`a.b` string, id int")
    out = rename_op(df, {"rule": [{"field": "a.b", "newval": "x"}]})
    assert out.columns == ["id", "x"] and out.first()["x"] == "flat"


def test_rename_nested_pure_delete(spark):
    from riko_spark.operators.structure import rename_op

    df = spark.createDataFrame(
        [({"b": "gone", "c": 7}, 1)], "a struct<b:string,c:int>, id int"
    )
    out = rename_op(df, {"rule": [{"field": "a.b"}]})
    assert out.schema["a"].dataType.names == ["c"]


# ------------------------------------------------------- 4. cap-drop poller

def test_capped_plan_parks_no_thread_and_poller_drains(spark):
    from riko_spark.operators import dedupe as dd

    before = {t.name for t in threading.enumerate()}
    df = spark.createDataFrame(
        [(i, i % 2, "t") for i in range(40)], "id long, bucket long, text string"
    )
    keyed = df.withColumnRenamed("bucket", "__b")
    plans = [
        dd.cap_buckets(keyed, ["__b"], max_bucket_size=5, what=f"t4_{i}")
        for i in range(6)
    ]
    after = {t.name for t in threading.enumerate()} - before
    # at most the ONE shared poller appears, never a thread per plan
    assert len([n for n in after if "cap" in n]) <= 1
    # executing one plan lets its stats drain through the poller or .get.
    # The PUSH warning is best-effort by design (this Spark build can
    # deliver an empty metrics row from the async listener bus — see
    # CapStats docstring), so the warning is asserted only when the
    # observation actually delivered; the authoritative .get is always
    # asserted.  _warn_drops itself is unit-tested deterministically
    # below.
    import warnings as _warnings

    with _warnings.catch_warnings(record=True) as caught:
        _warnings.simplefilter("always")
        plans[0].count()
        target = dd.CAP_OBSERVATIONS["t4_0"]
        got = target.get
        assert got["dropped_buckets"] == 2  # both size-20 buckets over cap 5
        import time
        # the poller retires the entry in the same pass that warns
        for _ in range(60):
            with dd._PENDING_LOCK:
                alive = any(r() is target for r, _born in dd._PENDING)
            if not alive:
                break
            time.sleep(0.3)
    # observation delivered AND the poller drained inside the window →
    # the warning must have been pushed.  Under full-suite load the
    # poller can legitimately still be waiting when the window closes
    # (push delivery is best-effort by design — the authoritative .get
    # above is the hard assertion), so don't demand the warning then.
    if target._observed is not None and not alive:
        assert any("t4_0" in str(w.message) for w in caught)
    # never-executed plans cost nothing: .get falls back to the agg job
    got5 = dd.CAP_OBSERVATIONS["t4_5"].get
    assert got5["dropped_buckets"] == 2


# ------------------------------------------------- 5. fetch_join odd paths

def test_fetch_join_percent_encoded_paths(spark, tmp_path):
    from riko_spark.operators.webtext import fetch_join_op

    d = tmp_path / "has space+plus"
    d.mkdir()
    p = d / "payload one.json"
    p.write_text(json.dumps({"items": [{"login": "defunkt", "n": 1}]}))
    df = spark.createDataFrame([(str(p),)], "api string")
    out = fetch_join_op(
        df, {"url_field": "api", "path": "items", "assign": "info"}
    ).collect()
    assert len(out) == 1 and out[0]["info"]["login"] == "defunkt"


# ------------------------------------------------ 6. embedding dim metadata

def test_embedding_dim_from_column_metadata_without_job(spark):
    from riko_spark.operators.dedupe import embedding_dim, with_dim_metadata

    # an EMPTY frame makes the no-job property observable: the .first()
    # fallback would raise here, so a passing call proves metadata won
    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    stamped = with_dim_metadata(empty, "embedding", 64)
    assert embedding_dim(stamped, "embedding", None) == 64
    with pytest.raises(ValueError, match="cannot infer"):
        embedding_dim(empty, "embedding", None)


# ------------------------------------------- 7. repetition + pii operators

def test_repetition_stats_planted(spark):
    from riko_spark.operators.textstats import repetition_stats_op

    df = spark.createDataFrame(
        [
            (1, "a b a b a b"),            # heavy bigram repetition
            (2, "x\ny\nx\nz"),             # 1 dup line of 4
            (3, "all unique words here"),
            (4, ""),                        # degenerate
            (5, "solo"),                    # single word: no bigrams
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r.asDict() for r in repetition_stats_op(df).collect()}
    # 6 words, 2 distinct -> dup_word 4/6; bigrams: 'a b' x3, 'b a' x2 ->
    # top covers 2*3/6 = 1.0
    assert got[1]["dup_word_frac"] == round(4 / 6, 6)
    assert got[1]["top_bigram_frac"] == 1.0
    assert got[2]["dup_line_frac"] == 0.25
    assert got[3]["dup_word_frac"] == 0.0 and got[3]["dup_line_frac"] == 0.0
    assert got[4]["dup_word_frac"] == 0.0 and got[4]["top_bigram_frac"] == 0.0
    assert got[5]["top_bigram_frac"] == 0.0


def test_pii_scrub_planted(spark):
    from riko_spark.operators.textstats import pii_scrub_op

    df = spark.createDataFrame(
        [(1, "mail bob@example.com or sue@ex.org from 10.0.3.7 "
             "call +1 555-123-4567 done"),
         (2, "nothing here 1.2.3 not-an-ip almost@nope")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r.asDict() for r in pii_scrub_op(df).collect()}
    assert got[1]["n_email"] == 2 and got[1]["n_ipv4"] == 1 and got[1]["n_phone"] == 1
    assert got[1]["scrubbed"] == ("mail <EMAIL> or <EMAIL> from <IPV4> "
                                  "call <PHONE> done")
    assert got[2]["n_email"] == 0 and got[2]["n_ipv4"] == 0 and got[2]["n_phone"] == 0
    assert got[2]["scrubbed"] == got[2]["text"]


def test_warn_drops_message_content():
    """Deterministic unit test of the push-warning text (delivery via
    the listener bus is best-effort and covered above)."""
    import warnings

    from riko_spark.operators.dedupe import CapStats, _warn_drops

    stats = CapStats(fallback=None, max_bucket_size=5, what="unit_demo")
    stats._observed = {"dropped_rows": 40, "dropped_buckets": 2}
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        _warn_drops(stats)
    assert len(caught) == 1
    msg = str(caught[0].message)
    assert "unit_demo" in msg and "2 bucket" in msg and "max_bucket_size=5" in msg
