"""Native Bloom bitset (functions/bloom.py) and the decontamination
bloom mode: no-false-negative contract, FP-rate sanity, exact output
parity with the broadcast-join path, plan shape."""

from __future__ import annotations

import math

import pyspark.sql.functions as F
import pytest

from riko_spark.functions.bloom import (
    _MAX_WORDS,
    bloom_build,
    bloom_might_contain,
    optimal_num_hashes,
)

M = 1 << 14  # 16384 bits
N_KEYS = 500


@pytest.fixture(scope="module")
def built(spark):
    keys = spark.range(N_KEYS).select(F.xxhash64("id").alias("k"))
    k = optimal_num_hashes(M, N_KEYS)
    dense = bloom_build(keys, "k", M, k)
    return keys, dense, k


def test_no_false_negatives(built):
    keys, dense, k = built
    missed = keys.where(~bloom_might_contain(dense, F.col("k"), k)).count()
    assert missed == 0


def test_false_positive_rate_near_theory(built, spark):
    _, dense, k = built
    # disjoint probe population (different hash stream)
    probes = spark.range(20_000).select(
        F.xxhash64(F.col("id") + 1_000_000_000).alias("k"))
    fp = probes.where(bloom_might_contain(dense, F.col("k"), k)).count()
    theory = (1 - math.exp(-k * N_KEYS / M)) ** k
    assert fp / 20_000 < max(5 * theory, 0.01)


def test_bitset_population_sane(built):
    _, dense, k = built
    set_bits = sum(bin(w & ((1 << 64) - 1)).count("1") for w in dense)
    # at most k per key; less with collisions, never zero
    assert 0 < set_bits <= k * N_KEYS
    assert len(dense) == M // 64


def test_word_bound_guard(spark):
    keys = spark.range(2).select(F.xxhash64("id").alias("k"))
    with pytest.raises(ValueError):
        bloom_build(keys, "k", (_MAX_WORDS + 1) * 64, 3)


def _contamination_fixture(spark):
    rows = []
    for i in range(40):
        body = " ".join(f"w{i}t{j}" for j in range(20))
        rows.append((i, body))
    # docs 3, 13, 23, 33 are the benchmark items (first 13 words);
    # doc 7 copies doc 3's opening -> contaminated pair (7, 3)
    rows[7] = (7, rows[3][1])
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    toks = F.filter(F.split(F.lower("text"), r"\s+"), lambda x: x != F.lit(""))
    bench = (
        df.where(F.col("doc_id") % 10 == 3)
        .select(F.col("doc_id").alias("bench_id"),
                F.array_join(F.slice(toks, 1, 13), " ").alias("text"))
    )
    return df, bench


def test_bloom_mode_output_identical(spark):
    from riko_spark.operators.cleaning import ngram_contamination_op

    df, bench = _contamination_fixture(spark)
    plain = sorted(
        map(tuple, ngram_contamination_op(df, benchmark=bench).collect()))
    bloomed = sorted(map(tuple, ngram_contamination_op(
        df, benchmark=bench, bloom_bits=1 << 12).collect()))
    assert plain == bloomed
    assert len(plain) >= 5  # self-matches + planted (7, 3)
    assert (7, 3, 8) in {(a, b, c) for a, b, c in plain} or any(
        a == 7 and b == 3 for a, b, c in plain)


def test_bloom_mode_plan_shape(spark):
    from riko_spark.operators.cleaning import ngram_contamination_op

    df, bench = _contamination_fixture(spark)
    plan = ngram_contamination_op(
        df, benchmark=bench, bloom_bits=1 << 12
    )._jdf.queryExecution().executedPlan().toString()
    # the probe is a row-local element_at filter ahead of the join...
    assert "element_at" in plan
    # ...and only in bloom mode (the broadcast path has no bitset)
    plain = ngram_contamination_op(
        df, benchmark=bench
    )._jdf.queryExecution().executedPlan().toString()
    assert "element_at" not in plain
