"""ngram_lm_score: hand-computed stupid-backoff bigram LM goldens.

Every expected number below is derived by hand (or with stdlib math)
from the published formulas — the engine can't self-certify.
"""

import math

import pyspark.sql.functions as F
import pytest

from riko_spark.operators.lm import LmTables, ngram_lm_score_op, ngram_lm_train

REF = [("the cat sat on the mat",), ("the cat ran",)]
# unigrams: the=3 cat=2 sat=1 on=1 mat=1 ran=1, T=9
# bigrams:  the cat=2, cat sat=1, sat on=1, on the=1, the mat=1, cat ran=1


def milli(x: float) -> int:
    return math.floor(x * 1000.0 + 0.5)


@pytest.fixture(scope="module")
def lm(spark) -> LmTables:
    return ngram_lm_train(spark.createDataFrame(REF, "text string"))


def test_train_totals_and_oov(lm):
    assert lm.total_tokens == 9
    assert lm.oov_milli == milli(math.log(0.4) + math.log(1 / 9))  # -3114


def test_train_bigram_table(lm):
    got = {r["bg"]: r["lp_milli"] for r in lm.bigrams.collect()}
    assert got == {
        "the cat": milli(math.log(2 / 3)),   # -405
        "cat sat": milli(math.log(1 / 2)),   # -693
        "cat ran": milli(math.log(1 / 2)),
        "sat on": 0,                          # ln(1/1)
        "on the": 0,
        "the mat": milli(math.log(1 / 3)),   # -1099
    }


def test_train_unigram_backoff_table(lm):
    got = {r["w"]: r["bo_milli"] for r in lm.unigrams.collect()}
    lb = math.log(0.4)
    assert got["the"] == milli(lb + math.log(3 / 9))  # -2015
    assert got["cat"] == milli(lb + math.log(2 / 9))  # -2420
    assert got["mat"] == milli(lb + math.log(1 / 9))  # -3114
    assert len(got) == 6


def test_score_hit_backoff_oov_precedence(spark, lm):
    corpus = spark.createDataFrame(
        [
            (1, "the cat sat"),     # 2 bigram hits: -405 + -693
            (2, "mat the cat"),     # "mat the" backs off to uni(the);
                                    # "the cat" hits
            (3, "a dog barked"),    # 2 OOV bigrams
            (4, "mat"),             # 1 token: nothing scored
            (5, None),              # null text
        ],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r.asDict()
        for r in ngram_lm_score_op(corpus, lm=lm).collect()
    }
    assert rows[1]["n_scored"] == 2 and rows[1]["n_hits"] == 2
    assert rows[1]["logprob_milli"] == -405 + -693
    assert (rows[2]["n_hits"], rows[2]["n_backoff"], rows[2]["n_oov"]) == (1, 1, 0)
    assert rows[2]["logprob_milli"] == -2015 + -405
    assert rows[3]["n_oov"] == 2 and rows[3]["logprob_milli"] == 2 * -3114
    for d in (4, 5):
        assert rows[d]["n_scored"] == 0
        assert rows[d]["logprob_milli"] == 0
        assert rows[d]["keep"] is False


def test_keep_gate_integer_threshold(spark, lm):
    corpus = spark.createDataFrame(
        [(1, "the cat sat"), (2, "a dog barked")], "doc_id long, text string"
    )
    rows = {
        r["doc_id"]: r["keep"]
        for r in ngram_lm_score_op(corpus, lm=lm, keep_milli=-1000).collect()
    }
    # doc 1 mean = -549 >= -1000 keeps; doc 2 mean = -3114 drops
    assert rows == {1: True, 2: False}


def test_min_count_prunes_bigrams(spark):
    lm2 = ngram_lm_train(
        spark.createDataFrame(REF, "text string"), min_count=2
    )
    got = {r["bg"] for r in lm2.bigrams.collect()}
    assert got == {"the cat"}  # the only bigram with c2 >= 2
    # pruned bigrams now back off: "cat sat" scores via uni(sat)
    out = ngram_lm_score_op(
        spark.createDataFrame([(1, "cat sat")], "doc_id long, text string"),
        lm=lm2,
    ).collect()[0]
    assert out["n_backoff"] == 1 and out["logprob_milli"] == milli(
        math.log(0.4) + math.log(1 / 9)
    )


def test_tokenization_lowercases(spark, lm):
    out = ngram_lm_score_op(
        spark.createDataFrame([(1, "THE CAT")], "doc_id long, text string"),
        lm=lm,
    ).collect()[0]
    assert out["n_hits"] == 1 and out["logprob_milli"] == -405


def test_empty_reference_raises(spark):
    with pytest.raises(ValueError, match="no tokens"):
        ngram_lm_train(spark.createDataFrame([("",)], "text string"))


def test_score_plan_broadcasts_lm_single_exchange(spark, lm):
    corpus = spark.createDataFrame(
        [(i, "the cat sat on the mat") for i in range(8)],
        "doc_id long, text string",
    )
    plan = (
        ngram_lm_score_op(corpus, lm=lm)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # both LM probes broadcast; the only CORPUS-side hash exchange is
    # the per-doc agg (remaining exchanges in the plan are the lazily
    # inlined LM-build aggregates, bounded by the reference slice)
    assert plan.count("BroadcastHashJoin") == 2
    assert plan.count("Exchange hashpartitioning(doc_id") == 1
