"""Driver contract: flagship entry, per-operator queries, DuckDB oracles.

Every operator from SURVEY.md §2 (plus the training-data-pipeline
extensions) gets a ``queries()`` entry running through the riko_spark
operator layer, and — where ANSI-SQL-expressible — an ``oracle_sql()``
twin for the DuckDB side-by-side check.  Column names/aliases match
exactly between both sides (the driver hashes values under sorted
column names).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

# the riko_spark package lives next to this file; make imports robust
# to whatever cwd the driver runs from
_HERE = os.path.dirname(os.path.abspath(__file__))
if _HERE not in sys.path:
    sys.path.insert(0, _HERE)

SF001 = "/root/testdata/sf0.001"


def _frac_hex(frac: float) -> str:
    """The mixture fixture's md5-prefix threshold literal — imported
    from the operator so the Spark plan and the DuckDB oracle embed
    the identical constant."""
    from riko_spark.operators.sampling import frac_threshold_hex

    return frac_threshold_hex(frac)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from riko_spark.sources.tables import read_table

    # read_table stamps embedding-dim column metadata so ANN/near-dup
    # plan builders never launch a sniff job
    return read_table(spark, name, sf_dir)


def _flow(df, order_by=None):
    from riko_spark.plans.flow import Flow

    return Flow(df, order_by=order_by)


# --------------------------------------------------------------- entry

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the README word-count pipe graph (SURVEY.md §7.2) over
    ``documents`` — tokenizer → grouped count → top-100."""
    docs = _t(spark, SF001, "documents")
    flow = _flow(docs).tokenizer(
        {"delimiter": " ", "token_key": "token"}, field="text", emit=True
    )
    counted = flow.df.groupBy("token").agg(F.count(F.lit(1)).alias("n"))
    return counted.orderBy(F.col("n").desc(), F.col("token").asc()).limit(100)


# ------------------------------------------------------------- queries

def q_filter(spark, sf):
    conf = {
        "rule": [
            {"field": "o_orderpriority", "op": "contains", "value": "URGENT"},
            {"field": "o_totalprice", "op": "atleast", "value": 100000},
        ],
        "combine": "and",
    }
    return _flow(_t(spark, sf, "orders")).filter(conf).df


def q_filter_or_block(spark, sf):
    conf = {
        "rule": [
            {"field": "o_orderstatus", "op": "is", "value": "F"},
            {"field": "o_totalprice", "op": "less", "value": 50000},
        ],
        "combine": "or",
        "permit": False,
    }
    return _flow(_t(spark, sf, "orders")).filter(conf).df.select("o_orderkey", "o_orderstatus", "o_totalprice")


def q_sort_truncate(spark, sf):
    li = _t(spark, sf, "lineitem").select("l_orderkey", "l_linenumber", "l_extendedprice")
    # sort (primary rule desc, spine tiebreak) + truncate = top-k;
    # Catalyst plans TakeOrderedAndProject — no global sort shuffle
    f = _flow(li, order_by=["l_orderkey", "l_linenumber"])
    srt = f.sort({"rule": [{"field": "l_extendedprice", "dir": "desc"}]})
    return srt.df.limit(50)


def q_truncate(spark, sf):
    ev = _t(spark, sf, "events").select("event_id", "ts", "event_type")
    return _flow(ev, order_by=["ts", "event_id"]).truncate({"start": 100, "count": 50}).df


def q_tail(spark, sf):
    ev = _t(spark, sf, "events").select("event_id", "ts", "event_type")
    return _flow(ev, order_by=["ts", "event_id"]).tail({"count": 20}).df


def q_reverse_head(spark, sf):
    ev = _t(spark, sf, "events").select("event_id", "ts")
    # reverse then head-25 == tail-25 in reverse emit order
    return _flow(ev, order_by=["ts", "event_id"]).reverse(None).df.limit(25)


def q_count(spark, sf):
    return _flow(_t(spark, sf, "lineitem")).count().df


def q_count_group(spark, sf):
    ev = _t(spark, sf, "events")
    return _flow(ev, order_by=["event_id"]).count({"count_key": "event_type"}).df


def q_sum_group(spark, sf):
    li = _t(spark, sf, "lineitem")
    out = _flow(li).sum({"sum_key": "l_quantity", "group_key": "l_returnflag"}).df
    # decimal sum (riko parity), rendered as double for stable cross-
    # engine value hashing
    return out.select(F.col("l_returnflag"), F.col("sum").cast("double").alias("sum_qty"))


def q_union(spark, sf):
    o = _t(spark, sf, "orders").select("o_orderkey", "o_orderstatus", "o_totalprice")
    a = o.filter(F.col("o_orderstatus") == "F")
    b = o.filter(F.col("o_totalprice") > 150000)
    return _flow(a).union(None, others=[b]).df


def q_uniq(spark, sf):
    ev = _t(spark, sf, "events").select("event_id", "ts", "user_id", "event_type")
    return _flow(ev, order_by=["ts", "event_id"]).uniq({"uniq_key": "user_id"}).df


def q_join(spark, sf):
    cust = _t(spark, sf, "customer")
    nat = _t(spark, sf, "nation")
    reg = _t(spark, sf, "region")
    f = _flow(cust).join(
        {"join_key": "c_nationkey", "other_join_key": "n_nationkey"},
        other=nat, broadcast_other=True,
    ).join(
        {"join_key": "n_regionkey", "other_join_key": "r_regionkey"},
        other=reg, broadcast_other=True,
    )
    return f.df.select("c_custkey", "c_name", "n_name", "r_name")


def q_join_lower(spark, sf):
    nat = _t(spark, sf, "nation")
    dim = nat.select(F.lower(F.col("n_name")).alias("name_lc"), F.col("n_regionkey").alias("rk"))
    f = _flow(nat).join(
        {"join_key": "n_name", "other_join_key": "name_lc", "lower": True}, other=dim
    )
    return f.df.select("n_nationkey", "n_name", "name_lc", "rk")


def q_tokenizer_wordcount(spark, sf):
    docs = _t(spark, sf, "documents")
    f = _flow(docs).tokenizer({"delimiter": " ", "token_key": "token"}, field="text", emit=True)
    counted = f.df.groupBy("token").agg(F.count(F.lit(1)).alias("n"))
    return counted.orderBy(F.col("n").desc(), F.col("token").asc()).limit(100)


def q_regex(spark, sf):
    docs = _t(spark, sf, "documents").select("doc_id", "text")
    conf = {"rule": [{"field": "text", "match": r"(sc)an", "replace": "$1anned"}]}
    return _flow(docs).regex(conf).df


def q_strreplace(spark, sf):
    p = _t(spark, sf, "part").select("p_partkey", "p_brand")
    conf = {"rule": [{"find": "Brand#", "replace": "B-", "param": "every"}]}
    return _flow(p).strreplace(conf, field="p_brand", assign="brand2").df


def q_strtransform(spark, sf):
    p = _t(spark, sf, "part").select("p_partkey", "p_name")
    conf = {"rule": [{"transform": "upper"}]}
    return _flow(p).strtransform(conf, field="p_name", assign="name_upper").df


def q_strconcat(spark, sf):
    p = _t(spark, sf, "part").select("p_partkey", "p_name")
    conf = {"part": [{"value": "part:"}, {"subkey": "p_name"}]}
    return _flow(p).strconcat(conf, assign="label").df


def q_strfind(spark, sf):
    p = _t(spark, sf, "part").select("p_partkey", "p_type")
    conf = {"rule": [{"find": " ", "location": "before", "param": "first"}]}
    return _flow(p).strfind(conf, field="p_type", assign="head").df


def q_refind(spark, sf):
    p = _t(spark, sf, "part").select("p_partkey", "p_type")
    conf = {"rule": [{"find": r"\s", "location": "after", "param": "first"}]}
    return _flow(p).refind(conf, field="p_type", assign="tail").df


def q_substr(spark, sf):
    p = _t(spark, sf, "part").select("p_partkey", "p_type")
    return _flow(p).substr({"start": 0, "length": 5}, field="p_type", assign="prefix").df


def q_slugify(spark, sf):
    p = _t(spark, sf, "part").select("p_partkey", "p_name")
    return _flow(p).slugify(None, field="p_name", assign="slug").df


def q_hash_md5(spark, sf):
    d = _t(spark, sf, "documents").select("doc_id", "text")
    return _flow(d).hash({"algo": "md5"}, field="text", assign="hash").df


def q_typecast(spark, sf):
    ev = _t(spark, sf, "events").select("event_id", "event_type")
    return _flow(ev).typecast({"type": "int"}, field="event_type", assign="typecast").df


def q_simplemath(spark, sf):
    li = _t(spark, sf, "lineitem").select("l_orderkey", "l_linenumber", "l_extendedprice", "l_tax")
    f = _flow(li).simplemath(
        {"op": "add", "other": {"subkey": "l_tax"}}, field="l_extendedprice", assign="total"
    )
    return f.df.select("l_orderkey", "l_linenumber", F.col("total").cast("double").alias("total"))


def q_dateformat(spark, sf):
    o = _t(spark, sf, "orders").select("o_orderkey", "o_orderdate")
    return _flow(o).dateformat({"format": "%Y-%m-%d"}, field="o_orderdate", assign="day").df.select("o_orderkey", "day")


def q_datebuilder(spark, sf):
    o = _t(spark, sf, "orders").select("o_orderkey", F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss").alias("dstr"))
    return _flow(o).datebuilder(None, field="dstr", assign="parsed").df.select("o_orderkey", "parsed")


def q_rename(spark, sf):
    r = _t(spark, sf, "region")
    return _flow(r).rename({"rule": [{"field": "r_name", "newval": "region_name"}]}).df


def q_subelement(spark, sf):
    ev = _t(spark, sf, "events").select("event_id", "props")
    parsed = ev.withColumn("props_parsed", F.from_json("props", "k bigint"))
    out = _flow(parsed).subelement({"path": "props_parsed.k", "token_key": "k"}, emit=False)
    return out.df.select("event_id", "k")


def q_urlbuilder(spark, sf):
    p = _t(spark, sf, "part").select("p_partkey")
    conf = {"base": "https://example.com", "path": ["part"], "param": [{"key": "id", "subkey": "p_partkey"}]}
    return _flow(p).urlbuilder(conf, assign="url").df


def q_urlparse(spark, sf):
    r = _t(spark, sf, "region").select(
        F.concat(F.lit("https://example.com/r/"), F.col("r_name"), F.lit("?rk="), F.col("r_regionkey"), F.lit("#top")).alias("content"),
    )
    return _flow(r).urlparse(None).df


def q_itembuilder(spark, sf):
    r = _t(spark, sf, "region")
    conf = {"attrs": [{"key": "title", "value": "region"}, {"key": "name", "value": {"subkey": "r_name"}}]}
    return _flow(r).itembuilder(conf).df


# ---------------------------------------------- windows / sessions

def q_token_totals(spark, sf):
    """tokenizer→count fusion through the DAG compiler: token totals per
    lang compile to a size-sum aggregate with NO explode (the rewrite in
    riko_spark/plans/rewrite.py); the oracle recomputes the counts
    independently in SQL."""
    from riko_spark.plans.dag import build_pipeline

    docs = _t(spark, sf, "documents")
    pipe_def = {
        "modules": [
            {"id": "s", "type": "filter", "conf": {}},
            {"id": "tok", "type": "tokenizer",
             "conf": {"delimiter": " ", "token_key": "token",
                      "field": "text", "emit": False}},
            {"id": "cnt", "type": "count", "conf": {"count_key": "lang"}},
        ],
    }
    out = build_pipeline(spark, pipe_def, sources={"s": docs}, order_by=["doc_id"])
    return out.select("lang", "count", "first_seen")


def q_uniq_limited(spark, sf):
    """riko's bounded uniq (deque(maxlen=limit)): sequential-exact
    simulation over the event spine; the oracle replays the same fold
    as a recursive CTE."""
    ev = _t(spark, sf, "events").filter(F.col("event_id") < 800).select(
        "event_id", "ts", "user_id"
    )
    return _flow(ev, order_by=["ts", "event_id"]).uniq(
        {"uniq_key": "user_id", "limit": 5}
    ).df.select("event_id", "user_id")


_RATES_JSON = (
    '{"rates": {"USD": 1, "EUR": 0.8625, "GBP": 0.784175, "JPY": 111.0525}}'
)


def q_exchangerate(spark, sf):
    """Rates-feed parsing + broadcast cross-rate lookup
    (riko/modules/exchangerate.py): customers mapped onto 4 currencies,
    exchangerate = 1/rate quantized to 6 places (the reference doctest
    value parity is covered in tests/test_misc_ops.py against riko's
    own quote.json)."""
    from riko_spark.operators.structure import exchangerate_op

    cur = F.element_at(
        F.array(F.lit("USD"), F.lit("EUR"), F.lit("GBP"), F.lit("JPY")),
        (F.col("c_nationkey") % 4 + 1).cast("int"),
    )
    c = _t(spark, sf, "customer").select("c_custkey", cur.alias("currency"))
    out = exchangerate_op(
        c, {"url": _RATES_JSON, "currency": "USD", "precision": 6},
        field="currency",
    )
    return out.select(
        "c_custkey", "currency", F.col("exchangerate").cast("double").alias("exchangerate")
    )


def q_windowed_count(spark, sf):
    ev = _t(spark, sf, "events")
    from riko_spark.streaming.windows import tumbling_agg

    out = tumbling_agg(ev, ts_col="ts", window="1 hour", watermark=None,
                       keys=["event_type"], aggs={"n": "count"})
    return out.select("window_start", "event_type", "n")


def q_session_windows(spark, sf):
    ev = _t(spark, sf, "events")
    from riko_spark.streaming.windows import session_agg

    out = session_agg(ev, ts_col="ts", gap="30 minutes", watermark=None,
                      keys=["user_id"], aggs={"n": "count"})
    return out.select("user_id", "session_start", "session_end", "n")


# ------------------------------------------- dedupe / similarity / text

def q_exact_dedupe(spark, sf):
    d = _t(spark, sf, "documents").select("doc_id", "text", "lang")
    from riko_spark.operators.dedupe import exact_dedupe_op

    return exact_dedupe_op(d).select("doc_id", "lang")


def _planted_docs(spark, sf):
    """Planted near-dup corpus for ground-truth checks: the first 60
    documents plus, for each, a near-duplicate with one appended marker
    token (3-gram Jaccard = m/(m+1) ≥ 0.85 for these docs, vs ≤ 0.03
    for unrelated pairs at every sf — measured).  The same corpus is
    reconstructed in the DuckDB oracle, so the oracle computes the TRUE
    pair set from data, not from construction knowledge."""
    d = _t(spark, sf, "documents").select("doc_id", "text").filter(F.col("doc_id") < 60)
    pert = d.select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zz"),
                 (F.col("doc_id") % 3).cast("string")).alias("text"),
    )
    return d.unionByName(pert)


_PLANTED_DOCS_SQL = """
        WITH base AS (SELECT doc_id, text FROM documents WHERE doc_id < 60),
        corpus AS (
          SELECT doc_id, text FROM base
          UNION ALL
          SELECT doc_id + 100000, text || ' zz' || CAST(doc_id % 3 AS VARCHAR)
          FROM base
        ),
        toks AS (
          SELECT doc_id,
                 list_filter(string_split_regex(lower(text), '\\s+'),
                             x -> x <> '') AS t
          FROM corpus
        ),
        sh AS (
          SELECT doc_id,
                 list_distinct(list_transform(
                     range(1, len(t) - 1),
                     i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s
          FROM toks
        ),
        jac AS (
          SELECT a.doc_id AS left_id, b.doc_id AS right_id,
                 len(list_intersect(a.s, b.s)) AS n_inter,
                 len(list_distinct(list_concat(a.s, b.s))) AS n_union
          FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        )
"""


def q_minhash_lsh(spark, sf):
    """Ground-truth recall check: MinHash-LSH over the planted corpus
    with exact-Jaccard verification must return EXACTLY the pairs the
    oracle finds by brute-force exact Jaccard ≥ 0.7.  A missed planted
    pair (recall < 1) or a surviving false positive hash-mismatches.
    16 hashes × 8 bands (r=2): P(miss) ≤ (1-0.85²)^8 ≈ 4e-5 per pair,
    and deterministic for fixed data/seeds."""
    from riko_spark.operators.dedupe import minhash_lsh_op

    corpus = _planted_docs(spark, sf)
    pairs = minhash_lsh_op(
        corpus, {"num_hashes": 16, "bands": 8, "jaccard_threshold": 0.7}
    )
    return pairs.select("left_id", "right_id")


def q_simhash(spark, sf):
    """Full value oracle of the SimHash kernel: the md5-token-hash
    simhash is reproducible in ANSI SQL (md5 + bit ops), so DuckDB
    recomputes every 64-bit signature."""
    d = _t(spark, sf, "documents").select("doc_id", "text")
    from riko_spark.operators.dedupe import simhash_op

    return simhash_op(d).select("doc_id", "simhash")


def q_simhash_neardup(spark, sf):
    """Banded-SimHash near-dup with an exact oracle: bands=8 guarantees
    (pigeonhole) every pair with hamming ≤ 7 is a candidate, so the
    output equals the oracle's brute-force hamming ≤ 7 self-join —
    structurally, not probabilistically."""
    d = _t(spark, sf, "documents").select("doc_id", "text").filter(F.col("doc_id") < 200)
    from riko_spark.operators.dedupe import simhash_neardup_op

    return simhash_neardup_op(d, {"bands": 8, "max_hamming": 7}).select(
        "left_id", "right_id", "hamming"
    )


def q_ngram_jaccard(spark, sf):
    """Exact n-gram Jaccard kernel vs DuckDB list functions: all pairs
    of the planted corpus with ≥ 3 shared 3-shingles, integer set
    sizes + the unrounded ratio (division is IEEE-exact both sides)."""
    from riko_spark.operators.dedupe import _shingle_sets

    corpus = _planted_docs(spark, sf)
    sets = _shingle_sets(corpus, "text", "doc_id", 3)
    l = sets.select(F.col("doc_id").alias("left_id"), F.col("__sh").alias("__shl"))
    r = sets.select(F.col("doc_id").alias("right_id"), F.col("__sh").alias("__shr"))
    inter = F.size(F.array_intersect("__shl", "__shr"))
    union = F.size(F.array_union("__shl", "__shr"))
    return (
        l.join(r, F.col("left_id") < F.col("right_id"))
        .select(
            "left_id", "right_id",
            inter.alias("n_inter"), union.alias("n_union"),
            (inter.cast("double") / union.cast("double")).alias("jaccard"),
        )
        .filter(F.col("n_inter") >= 3)
    )


def _planted_embeddings(spark, sf):
    """First 60 embeddings plus near-identical copies (first component
    nudged by 0.0005·(1+id%5) ⇒ cosine ≥ 0.99996 vs ≤ 0.48 for any
    natural pair at every sf — measured)."""
    e = _t(spark, sf, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    ).filter(F.col("vec_id") < 60)
    pert = e.select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.concat(
            F.array(F.element_at("embedding", 1)
                    + F.lit(0.0005) * (F.lit(1) + F.col("vec_id") % 5)),
            F.slice("embedding", 2, 63),
        ).alias("embedding"),
    )
    return e.unionByName(pert)


def q_embedding_neardup(spark, sf):
    """Hyperplane-LSH near-dup with a brute-force cosine oracle over
    the planted corpus: output must equal ALL pairs with cosine ≥
    0.999 (planes=8 + hamming-1 multi-probe ⇒ a planted pair is missed
    only when ≥ 2 of 8 hyperplanes split an angle of 0.01 rad —
    P ≈ 3e-5 per pair, deterministic for fixed seed/data)."""
    from riko_spark.operators.dedupe import embedding_neardup_op

    corpus = _planted_embeddings(spark, sf)
    out = embedding_neardup_op(
        corpus, {"planes": 8, "probes": 1, "cosine_threshold": 0.999, "dim": 64}
    )
    return out.select("left_id", "right_id")


def q_ann_bruteforce(spark, sf):
    e = _t(spark, sf, "embeddings")
    queries = e.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding")
    )
    from riko_spark.operators.similarity import ann_bruteforce_op

    return ann_bruteforce_op(e, {"k": 10}, queries=queries).select("query_id", "rank", "vec_id")


def q_ann_bruteforce_vec(spark, sf):
    """Same exact top-k as ann_bruteforce, computed by the Arrow/numpy
    matmul kernel (per-batch top-k pre-prune) — must reproduce the
    identical ranking (riko has no ANN; this is the 100 TB scale path
    for the brute-force kernel)."""
    e = _t(spark, sf, "embeddings")
    queries = e.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding")
    )
    from riko_spark.operators.similarity import ann_bruteforce_op

    return ann_bruteforce_op(
        e, {"k": 10, "method": "vectorized"}, queries=queries
    ).select("query_id", "rank", "vec_id")


def q_ann_lsh(spark, sf):
    """ANN-LSH with a planted-ground-truth oracle: 5 near-identical
    copies are planted per query vector, so the true top-6 per query is
    (self, copies in perturbation order) with cosine ≥ 0.9999 vs ≤ 0.48
    for natural vectors.  The oracle brute-forces top-6 over the same
    corpus; ann_lsh must find all of them inside its probed buckets
    (self shares the exact bucket; a copy is missed only when ≥ 2 of 8
    hyperplanes split — P ≈ 2e-5 per copy, deterministic)."""
    from riko_spark.operators.similarity import ann_lsh_op

    e = _t(spark, sf, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    qs = e.filter(F.col("vec_id") < 3)
    j = spark.range(1, 6)  # copy index 1..5
    planted = qs.crossJoin(j).select(
        ((F.col("vec_id") + 1) * 100000 + F.col("id")).alias("vec_id"),
        F.concat(
            F.array(F.element_at("embedding", 1) + F.lit(0.0005) * F.col("id")),
            F.slice("embedding", 2, 63),
        ).alias("embedding"),
    )
    corpus = e.unionByName(planted)
    queries = qs.select(F.col("vec_id").alias("query_id"), "embedding")
    out = ann_lsh_op(corpus, {"k": 6, "planes": 8, "probes": 1, "dim": 64},
                     queries=queries)
    return out.select("query_id", "rank", "vec_id")


def q_ann_ivf(spark, sf):
    """IVF-Flat ANN with the same planted ground truth as ann_lsh: the
    true top-6 per query (self + 5 near-identical copies) must be found
    inside the nprobe probed cells; the oracle brute-forces top-6 over
    the same corpus."""
    from riko_spark.operators.similarity import ann_ivf_op

    e = _t(spark, sf, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    qs = e.filter(F.col("vec_id") < 3)
    j = spark.range(1, 6)
    planted = qs.crossJoin(j).select(
        ((F.col("vec_id") + 1) * 100000 + F.col("id")).alias("vec_id"),
        F.concat(
            F.array(F.element_at("embedding", 1) + F.lit(0.0005) * F.col("id")),
            F.slice("embedding", 2, 63),
        ).alias("embedding"),
    )
    corpus = e.unionByName(planted)
    queries = qs.select(F.col("vec_id").alias("query_id"), "embedding")
    out = ann_ivf_op(corpus, {"k": 6, "nlist": 8, "nprobe": 2, "dim": 64},
                     queries=queries)
    return out.select("query_id", "rank", "vec_id")


def q_token_count(spark, sf):
    d = _t(spark, sf, "documents").select("doc_id", "text")
    from riko_spark.operators.textstats import token_count_op

    return token_count_op(d).select("doc_id", "n_tokens")


def q_lang_id(spark, sf):
    d = _t(spark, sf, "documents").select("doc_id", "text")
    from riko_spark.operators.textstats import lang_id_op

    return lang_id_op(d).select("doc_id", "lang_pred")


def q_quality(spark, sf):
    d = _t(spark, sf, "documents").select("doc_id", "text")
    from riko_spark.operators.textstats import quality_score_op

    return quality_score_op(d).select("doc_id", "alpha_ratio", "punct_ratio")


def q_fingerprint(spark, sf):
    d = _t(spark, sf, "documents").select("doc_id", "text")
    from riko_spark.operators.textstats import fingerprint_op

    return fingerprint_op(d).select("doc_id", "fingerprint")


_PII_SUFFIX_SQL = (
    "CASE WHEN doc_id % 7 = 0 THEN ' mail a' || CAST(doc_id AS STRING) || "
    "'@ex' || CAST(doc_id % 5 AS STRING) || '.com from 10.0.' || "
    "CAST(doc_id % 256 AS STRING) || '.7 call +1 555-000-1234' "
    "ELSE '' END"
)


def _planted_pii(spark, sf):
    """Documents with deterministic PII planted on every 7th doc (the
    synthetic corpus contains none) — identical expression in the SQL
    oracle (_PII_SUFFIX_SQL), so redaction recall is value-checked."""
    d = _t(spark, sf, "documents").select("doc_id", "text")
    return d.withColumn(
        "text",
        F.concat(F.col("text"), F.expr(_PII_SUFFIX_SQL)),
    )


def q_pii_scrub(spark, sf):
    """PII redaction (email/ipv4/phone → typed placeholders) with
    per-type audit counts; md5 of the scrubbed text keeps the oracle
    compare compact."""
    from riko_spark.operators.textstats import pii_scrub_op

    out = pii_scrub_op(_planted_pii(spark, sf))
    return out.select(
        "doc_id", "n_email", "n_ipv4", "n_phone",
        F.md5("scrubbed").alias("scrub_md5"),
    )


def q_repetition(spark, sf):
    """Gopher-style within-document repetition signals (dup line/word
    fraction, top-bigram coverage) — native array fold, no explode."""
    from riko_spark.operators.textstats import repetition_stats_op

    d = _t(spark, sf, "documents").select("doc_id", "text")
    return repetition_stats_op(d).select(
        "doc_id", "dup_line_frac", "dup_word_frac", "top_bigram_frac"
    )


# Multi-line "web page" corpus planted from the flat documents table:
# unique prose lines keyed by doc_id interleaved with boilerplate that
# repeats across documents (newsletter/cookie banners on residue
# classes, a per-source footer shared by ~1/5 of docs), C4 trigger
# markers (lorem ipsum on %11, curly braces on %13), Gopher trigger
# lines (bullets on %7, trailing ellipsis on %17), and one
# no-terminal-punctuation fragment per page.  The SAME expression runs
# in Spark (F.expr) and the DuckDB oracle, so every cleaning signal is
# recomputed independently from the planting arithmetic.
_PAGED_SQL = (
    "'Document ' || CAST(doc_id AS STRING) || "
    "' begins with a clean opening sentence.' || chr(10) || "
    "CASE WHEN doc_id % 2 = 0 THEN 'Subscribe to our newsletter today.' "
    "ELSE 'Filler opening ' || CAST(doc_id AS STRING) || "
    "' adds unique prose here.' END || chr(10) || "
    "substr(text, 1, 40) || chr(10) || "
    "CASE WHEN doc_id % 3 = 0 THEN "
    "'Accept all cookies to continue browsing.' "
    "ELSE 'Second filler ' || CAST(doc_id AS STRING) || "
    "' keeps the page going.' END || chr(10) || "
    "'Shared footer text for source ' || CAST(doc_id % 5 AS STRING) || "
    "' of this site.' || chr(10) || "
    "CASE WHEN doc_id % 11 = 0 THEN "
    "'Lorem ipsum dolor sit amet consectetur.' "
    "ELSE 'Body sentence number ' || CAST(doc_id AS STRING) || "
    "' carries real content forward.' END || chr(10) || "
    "CASE WHEN doc_id % 13 = 0 THEN 'var config = { debug: false };' "
    "ELSE 'More unique body text ' || CAST(doc_id AS STRING) || "
    "' flows naturally.' END || chr(10) || "
    "CASE WHEN doc_id % 7 = 0 THEN "
    "'- bullet item one' || chr(10) || '- bullet item two' "
    "ELSE 'A very readable paragraph ' || CAST(doc_id AS STRING) || "
    "' without bullets.' END || chr(10) || "
    "CASE WHEN doc_id % 17 = 0 THEN "
    "'This sentence trails off into nothing...' "
    "ELSE 'The closing remark ' || CAST(doc_id AS STRING) || "
    "' ends the page properly.' END"
)


def _planted_paged(spark, sf):
    d = _t(spark, sf, "documents").select("doc_id", "text")
    return d.withColumn("text", F.expr(_PAGED_SQL))


def q_c4_line_filter(spark, sf):
    """C4 line-level gate over the planted paged corpus: keep lines
    with >= 5 words ending in terminal punctuation — one native
    higher-order-function projection, no explode/shuffle.  The oracle
    recomputes kept/dropped counts and the md5 of the rebuilt text
    with DuckDB list lambdas over the same planting expression."""
    from riko_spark.operators.cleaning import c4_line_filter_op

    out = c4_line_filter_op(_planted_paged(spark, sf))
    return out.select(
        "doc_id", "n_lines_kept", "n_lines_dropped",
        F.md5("text").alias("clean_md5"),
    )


def q_c4_doc_filter(spark, sf):
    """C4 + Gopher document-level quality gate: word/sentence counts,
    mean word length, lorem-ipsum / curly-brace markers, bullet and
    ellipsis line fractions, and the combined keep flag — all native
    single-scan expressions; every signal recomputed by the oracle."""
    from riko_spark.operators.cleaning import c4_doc_filter_op

    out = c4_doc_filter_op(_planted_paged(spark, sf))
    return out.select(
        "doc_id", "n_words", "mean_word_len", "n_sentences",
        "has_lorem", "has_curly", "bullet_line_frac",
        "ellipsis_line_frac", "keep",
    )


def q_line_dedupe(spark, sf):
    """RefinedWeb corpus-level boilerplate removal: lines appearing in
    >= 3 distinct documents (planted banners/footers) are dropped from
    every page; per-doc kept text is rebuilt in original order.  The
    oracle recomputes document frequency and the rebuilt md5 from the
    same planting expression with an independent zip-unnest +
    NOT IN + ordered string_agg plan."""
    from riko_spark.operators.cleaning import line_dedupe_op

    out = line_dedupe_op(_planted_paged(spark, sf), min_docs=3)
    return out.select(
        "doc_id", F.md5("text").alias("clean_md5"), "n_kept", "n_dropped",
    )


def q_span_dedupe(spark, sf):
    """ExactSubstr-style duplicated-SPAN removal (Lee et al. 2021)
    over the planted paged corpus: every exact 6-token window seen in
    >= 3 distinct documents (the planted footers/cookie banners, plus
    any boilerplate-straddling windows) has all its covered token
    positions dropped from every document; survivors are rejoined with
    single spaces.  Window text never crosses an exchange — the plan
    ships (doc, pos, xxhash64) occurrences only, exactly like
    line_dedupe.  The oracle recomputes window document-frequency,
    covered positions, and the rebuilt md5 with an independent DuckDB
    list-slice + NOT EXISTS + ordered string_agg plan."""
    from riko_spark.operators.cleaning import span_dedupe_op

    out = span_dedupe_op(_planted_paged(spark, sf), k=6, min_docs=3)
    return out.select(
        "doc_id", F.md5("text").alias("clean_md5"), "n_kept", "n_dropped",
    )


def q_lm_score(spark, sf):
    """CCNet-style n-gram LM quality scoring: a stupid-backoff bigram
    LM (milli-nat-quantized log-probs, min_count=2 pruning) is trained
    on the doc_id % 7 == 1 reference slice of the planted paged
    corpus, then every document is scored by its exact-integer total
    log-probability with per-bigram hit/backoff/OOV accounting and
    the head/middle keep gate (mean ≥ −2000 milli-nats ≈ ppl e^2).
    The oracle retrains the identical LM and rescores every document
    in one independent DuckDB plan — a drift in tokenization, counts,
    pruning, quantization, backoff order, or the gate shows up as a
    value mismatch."""
    from riko_spark.operators.lm import ngram_lm_score_op

    pages = _planted_paged(spark, sf)
    ref = pages.where(F.col("doc_id") % 7 == 1)
    return ngram_lm_score_op(
        pages, ref_df=ref, min_count=2, keep_milli=-2000)


def q_stratified_sample(spark, sf):
    """Deterministic stratified quota sampling: exactly min(5, |src|)
    documents per source, chosen by the engine-independent
    md5('s42:' || doc_id) rank — the reproducible per-group cap a
    training mixture applies to hot hosts/sources.  The oracle
    replays the identical rank with a window function."""
    from riko_spark.operators.sampling import stratified_sample_op

    d = _t(spark, sf, "documents").select("doc_id", "source")
    return stratified_sample_op(d, group_col="source", k=5, seed="s42")


def q_mixture_resample(spark, sf):
    """Deterministic weighted mixture materialization over the
    documents table keyed by language: en×2.5, es×3.25, fr×1.0,
    de×0.4, zh×0.0 — integer epochs replicate, fractional epochs are
    decided per row by the md5 threshold, weight 0 drops.  Pure
    projection + explode (zero exchanges).  The oracle recomputes
    every copy with the same thresholds via CASE + range unnest."""
    from riko_spark.operators.sampling import mixture_resample_op

    d = _t(spark, sf, "documents").select("doc_id", "lang")
    return mixture_resample_op(
        d, weights=_MIX_WEIGHTS, source_col="lang", id_col="doc_id",
        seed="mix")


#: the mixture fixture's per-language weights (shared with the oracle)
_MIX_WEIGHTS = {"en": 2.5, "es": 3.25, "fr": 1.0, "de": 0.4, "zh": 0.0}


def q_dsir_select(spark, sf):
    """DSIR importance resampling (Xie et al. 2023): hashed unigram+
    bigram features (md5-prefix mod 512), Laplace-smoothed target/raw
    bucket distributions (target = the lang='en' slice), milli-nat
    quantized per-bucket log-ratios, exact-BIGINT per-doc importance
    log-weights, deterministic md5-keyed Gumbel noise, and the global
    top-150 by perturbed key (Gumbel top-k ≡ sampling without
    replacement ∝ importance weight).  The oracle refits the entire
    model and replays hashing, smoothing, quantization, noise, and
    the top-k cut in one independent DuckDB plan — a drift anywhere
    (tokenization, bucketing, operand order of the log-ratio, the
    0.5-offset uniform, tie-breaking) shifts BIGINTs and mismatches."""
    from riko_spark.operators.dsir import dsir_select_op

    d = _t(spark, sf, "documents").select("doc_id", "text", "lang")
    target = d.where(F.col("lang") == "en").select("doc_id", "text")
    return dsir_select_op(
        d.select("doc_id", "text"), target_df=target,
        k=150, seed="dsir", buckets=512,
    )


def q_corpus_pipeline(spark, sf):
    """The composed corpus-cleaning pass a Common-Crawl pipeline runs
    end-to-end: C4 line gate -> corpus-level boilerplate line dedupe
    -> C4/Gopher doc gate, all over the planted paged corpus.  The
    oracle recomputes the ENTIRE composition (list-lambda line gate,
    zip-unnest document frequency, ordered reassembly, doc signals)
    in one independent DuckDB plan — a semantics drift in any stage
    or in how stages compose shows up as a value mismatch."""
    from riko_spark.operators.cleaning import (
        c4_doc_filter_op,
        c4_line_filter_op,
        line_dedupe_op,
    )

    gated = c4_line_filter_op(_planted_paged(spark, sf)).select(
        "doc_id", "text")
    deduped = line_dedupe_op(gated, min_docs=3)
    out = c4_doc_filter_op(deduped)
    return out.select(
        "doc_id", "n_kept", "n_dropped", "n_words", "n_sentences",
        "keep", F.md5("text").alias("clean_md5"),
    )


def q_ngram_contamination(spark, sf):
    """Benchmark decontamination (GPT-3-style 13-gram overlap): every
    10th document's first 13 words form a benchmark item; the operator
    must surface every (doc, bench) pair sharing any 13-gram with the
    DISTINCT-overlap count.  The oracle is a full independent
    recomputation — DuckDB builds all corpus n-grams and joins on the
    n-gram STRING, so the engine's hash-join shortcut is value-checked
    end-to-end (any accidental hit beyond the planted self-matches
    must appear in both)."""
    from riko_spark.operators.cleaning import ngram_contamination_op
    from riko_spark.operators.textstats import words_col

    d = _t(spark, sf, "documents").select("doc_id", "text")
    toks = words_col(F.col("text"))
    bench = (
        d.filter((F.col("doc_id") % 10 == 3) & (F.size(toks) >= 13))
        .select(F.col("doc_id").alias("bench_id"),
                F.array_join(F.slice(toks, 1, 13), " ").alias("text"))
    )
    return ngram_contamination_op(d, benchmark=bench)


def q_ngram_contamination_bloom(spark, sf):
    """The same decontamination pass through the Bloom plan lever
    (functions/bloom.py): benchmark grams packed once into a 2^17-bit
    native bitset, the corpus side pruned by the row-local probe
    predicate (zero joins/exchanges — whole-stage codegen), survivors
    verified by the exact join.  The ORACLE IS THE SAME SQL as
    ngram_contamination — the operator contract is that bloom mode
    changes the plan, never the answer (false positives die in the
    verify join; false negatives are structurally impossible), so any
    bitset/probe defect surfaces as a value mismatch against the full
    independent recomputation."""
    from riko_spark.operators.cleaning import ngram_contamination_op
    from riko_spark.operators.textstats import words_col

    d = _t(spark, sf, "documents").select("doc_id", "text")
    toks = words_col(F.col("text"))
    bench = (
        d.filter((F.col("doc_id") % 10 == 3) & (F.size(toks) >= 13))
        .select(F.col("doc_id").alias("bench_id"),
                F.array_join(F.slice(toks, 1, 13), " ").alias("text"))
    )
    return ngram_contamination_op(d, benchmark=bench, bloom_bits=1 << 17)


# planted URL corpus for the RefinedWeb stage-one gate: tracker/spam
# hosts on residue classes, session-id query strings on %11, clean
# sites elsewhere — same expression in Spark and the oracle
_URL_SQL = (
    "'https://' || CASE WHEN doc_id % 7 = 0 THEN 'ads.tracker.net' "
    "WHEN doc_id % 7 = 1 THEN 'sub.spam-site.com' "
    "WHEN doc_id % 7 = 2 THEN 'spam-site.com' "
    "ELSE 'site' || CAST(doc_id % 20 AS STRING) || '.example.org' END "
    "|| '/page/' || CAST(doc_id AS STRING) || "
    "CASE WHEN doc_id % 11 = 0 THEN "
    "'?sessionid=' || CAST(doc_id AS STRING) ELSE '' END"
)


def q_url_filter(spark, sf):
    """RefinedWeb stage-one URL gate: domain blocklist (exact host +
    any-subdomain suffix) and blocked URL patterns (session-id query
    strings) over a planted URL corpus; the oracle recomputes host
    extraction and every block rule from the shared planting
    expression."""
    from riko_spark.operators.cleaning import url_filter_op

    d = _t(spark, sf, "documents").select(
        "doc_id", F.expr(_URL_SQL).alias("url"))
    out = url_filter_op(d, {
        "blocked_domains": ["spam-site.com", "tracker.net"],
        "blocked_patterns": [r"[?&]sessionid="],
    })
    return out.select("doc_id", "url", "host", "keep")


# planted messy-URL corpus for the frontier canonicalizer: mixed-case
# schemes/hosts, default and non-default ports, empty paths, utm/UTM
# tracking params, unsorted duplicate-key queries, fragments — same
# expression in Spark and the oracle
_NORM_URL_SQL = (
    "CASE WHEN doc_id % 3 = 0 THEN 'HTTPS://' ELSE 'http://' END || "
    "CASE WHEN doc_id % 2 = 0 THEN "
    "'WWW.Site' || CAST(doc_id % 7 AS STRING) || '.COM' "
    "ELSE 'cdn.example' || CAST(doc_id % 5 AS STRING) || '.org' END || "
    "CASE WHEN doc_id % 4 = 0 THEN ':443' "
    "WHEN doc_id % 4 = 1 THEN ':8080' "
    "WHEN doc_id % 8 = 2 THEN ':80' ELSE '' END || "
    "CASE WHEN doc_id % 6 = 0 THEN '' "
    "ELSE '/Path/' || CAST(doc_id AS STRING) END || "
    "CASE WHEN doc_id % 5 = 0 THEN "
    "'?z=9&utm_source=feed&a=2&UTM_campaign=x' "
    "WHEN doc_id % 5 = 1 THEN '?b=2&a=10&a=1' ELSE '' END || "
    "CASE WHEN doc_id % 7 = 0 THEN '#Section2' ELSE '' END"
)


# planted robots corpus: 4 hosts — anchored allow inside a disallowed
# tree, a multi-UA group with wildcard + non-rule directives, an
# empty (allow-all) disallow, and a host with no robots body; URLs
# exercise every rule — same expressions in Spark and the oracle
_ROBOTS_TXT_SQL = (
    "CASE WHEN hid = 0 THEN "
    "'# site h0' || chr(10) || 'User-agent: *' || chr(10) || "
    "'Disallow: /private/' || chr(10) || "
    "'Allow: /private/public$' || chr(10) || "
    "'User-agent: badbot' || chr(10) || 'Disallow: /' "
    "WHEN hid = 1 THEN "
    "'User-agent: mybot' || chr(10) || 'User-agent: otherbot' || "
    "chr(10) || 'Disallow: /tmp/*' || chr(10) || "
    "'Allow: /tmp/keep' || chr(10) || 'Crawl-delay: 10' "
    "WHEN hid = 2 THEN "
    "'User-agent: *' || chr(10) || 'Disallow:' "
    "ELSE '' END"
)

_ROBOTS_URL_SQL = (
    "'https://h' || CAST(doc_id % 4 AS STRING) || '.ex.com' || "
    "CASE WHEN doc_id % 5 = 0 THEN '/private/' || CAST(doc_id AS STRING) "
    "WHEN doc_id % 5 = 1 THEN '/private/public' || "
    "CASE WHEN doc_id % 10 = 1 THEN '' ELSE '2' END "
    "WHEN doc_id % 5 = 2 THEN '/tmp/' || CAST(doc_id AS STRING) "
    "WHEN doc_id % 5 = 3 THEN '/tmp/keep' || CAST(doc_id % 3 AS STRING) "
    "ELSE '/ok/' || CAST(doc_id AS STRING) END"
)


def q_robots_gate(spark, sf):
    """RFC 9309 robots.txt compliance, end to end: parse planted
    per-host robots bodies (group association across consecutive
    User-agent lines, comment/blank/non-rule-directive handling,
    empty-path allow-all drop) and gate a planted URL corpus for
    agent 'mybot' (exact-group-beats-star selection, '*' wildcard +
    '$' anchor patterns, longest-match precedence with allow winning
    ties).  The oracle replays the ENTIRE parse + gate — line split,
    directive regex, window grouping, LIKE-pattern compilation,
    winner window — in one independent DuckDB plan."""
    from riko_spark.operators.robots import robots_gate_op, robots_rules_op

    hosts = _t(spark, sf, "documents").select(
        (F.col("doc_id") % 4).cast("int").alias("hid")).distinct()
    robots = hosts.select(
        F.expr("'h' || CAST(hid AS STRING) || '.ex.com'").alias("host"),
        F.expr(_ROBOTS_TXT_SQL).alias("content"))
    rules = robots_rules_op(robots)
    urls = _t(spark, sf, "documents").select(
        "doc_id", F.expr(_ROBOTS_URL_SQL).alias("url"))
    return robots_gate_op(urls, rules=rules, agent="mybot")


# the frontier capstone's messy URL planting: robots-relevant paths
# on the 4 robots hosts, wrapped in case noise, a default port,
# tracking params and fragments that normalization must strip before
# the robots match — same expression in Spark and the oracle
_FRONTIER_URL_SQL = (
    "CASE WHEN doc_id % 3 = 0 THEN 'HTTPS://' ELSE 'http://' END || "
    "'H' || CAST(doc_id % 4 AS STRING) || '.EX.com' || "
    "CASE WHEN doc_id % 12 = 0 THEN ':443' ELSE '' END || "
    "CASE WHEN doc_id % 5 = 0 THEN '/private/' || CAST(doc_id AS STRING) "
    "WHEN doc_id % 5 = 1 THEN '/private/public' || "
    "CASE WHEN doc_id % 10 = 1 THEN '' ELSE '2' END "
    "WHEN doc_id % 5 = 2 THEN '/tmp/' || CAST(doc_id AS STRING) "
    "WHEN doc_id % 5 = 3 THEN '/tmp/keep' || CAST(doc_id % 3 AS STRING) "
    "ELSE '/ok/' || CAST(doc_id AS STRING) END || "
    "CASE WHEN doc_id % 6 = 0 THEN '?b=2&utm_x=1&a=1' ELSE '' END || "
    "CASE WHEN doc_id % 7 = 0 THEN '#f' ELSE '' END"
)


def q_frontier_pipeline(spark, sf):
    """The composed crawl-frontier stage one a polite crawler runs
    end-to-end: URL canonicalization (case/port/tracking-param/
    fragment normalization) -> robots.txt permission gate (parsed
    from the planted per-host robots corpus, agent 'mybot') -> domain
    blocklist.  The oracle recomputes the ENTIRE composition — every
    normalization rule, the full robots parse + gate on the
    NORMALIZED url, and the blocklist — in one independent DuckDB
    plan, so a drift in any stage or in how the stages hand off
    (e.g. matching robots against the raw instead of the normalized
    path) shows up as a value mismatch."""
    from riko_spark.operators.cleaning import url_filter_op, url_normalize_op
    from riko_spark.operators.robots import robots_gate_op, robots_rules_op

    urls = _t(spark, sf, "documents").select(
        "doc_id", F.expr(_FRONTIER_URL_SQL).alias("url"))
    normed = url_normalize_op(urls).select("doc_id", "norm_url")

    hosts = _t(spark, sf, "documents").select(
        (F.col("doc_id") % 4).cast("int").alias("hid")).distinct()
    robots = hosts.select(
        F.expr("'h' || CAST(hid AS STRING) || '.ex.com'").alias("host"),
        F.expr(_ROBOTS_TXT_SQL).alias("content"))
    rules = robots_rules_op(robots)
    gated = robots_gate_op(
        normed, rules=rules, agent="mybot", field="norm_url")

    out = url_filter_op(
        gated.select("doc_id", "norm_url", F.col("allowed")),
        field="norm_url", blocked_domains=["h3.ex.com"], assign="unblocked")
    return out.select(
        "doc_id", "norm_url", "host", "allowed", "unblocked",
        (F.col("allowed") & F.col("unblocked")).alias("crawl"))


# planted sitemap corpus: an urlset with entities/whitespace/full
# fields, a sitemapindex, a malformed-priority + loc-less entry, and
# an empty host — same expression in Spark and the oracle
_SITEMAP_XML_SQL = (
    "CASE WHEN hid = 0 THEN "
    "'<?xml version=\"1.0\"?><urlset>' || "
    "'<url><loc>https://h0.ex.com/a?x=1&amp;y=2</loc>"
    "<lastmod>2025-01-02</lastmod><changefreq>daily</changefreq>"
    "<priority>0.8</priority></url>' || "
    "'<url>' || chr(10) || '  <loc>' || chr(10) || "
    "'    https://h0.ex.com/b' || chr(10) || '  </loc></url>' || "
    "'</urlset>' "
    "WHEN hid = 1 THEN "
    "'<sitemapindex><sitemap><loc>https://h1.ex.com/sm1.xml</loc>"
    "<lastmod>2025-02-03</lastmod></sitemap>"
    "<sitemap><loc>https://h1.ex.com/sm2.xml</loc></sitemap>"
    "</sitemapindex>' "
    "WHEN hid = 2 THEN "
    "'<urlset><url><loc>https://h2.ex.com/only</loc>"
    "<priority>high</priority></url>"
    "<url><lastmod>2025-03-04</lastmod></url></urlset>' "
    "ELSE '' END"
)


def q_sitemap_urls(spark, sf):
    """Sitemap parsing (sitemaps.org protocol, the robots.txt
    companion): urlset and sitemapindex entries over a planted
    per-host corpus — entity-unescaped locs, whitespace-trimmed
    multi-line locs, try_cast priorities (malformed -> NULL, never a
    throw), loc-less entries dropped, nested index files surfaced as
    kind='sitemap'.  The oracle replays the shared block/field
    regexes, the entity replace chain (same order, &amp; last) and
    the cast in one independent DuckDB plan."""
    from riko_spark.operators.robots import sitemap_urls_op

    hosts = _t(spark, sf, "documents").select(
        (F.col("doc_id") % 4).cast("int").alias("hid")).distinct()
    sm = hosts.select(
        F.expr("'h' || CAST(hid AS STRING) || '.ex.com'").alias("host"),
        F.expr(_SITEMAP_XML_SQL).alias("content"))
    return sitemap_urls_op(sm)


# planted link corpus: every page carries an absolute external link
# with nested markup in the anchor; even pages add a root-relative
# link with a newline inside the anchor; %3 adds a protocol-relative
# link; %4 adds an unresolvable relative path; %7 adds an href-less
# <a name=...> that must NOT match — same expressions in Spark and
# the oracle
_LINKS_URL_SQL = (
    "'https://h' || CAST(doc_id % 4 AS STRING) || '.ex.com/page/' || "
    "CAST(doc_id AS STRING)"
)
_LINKS_HTML_SQL = (
    "'<html><body><p>Intro</p>' || "
    "'<a href=\"https://ext' || CAST(doc_id % 5 AS STRING) || "
    "'.com/p/' || CAST(doc_id AS STRING) || '\">Ext <b>Link</b> ' || "
    "CAST(doc_id AS STRING) || '</a>' || "
    "CASE WHEN doc_id % 2 = 0 THEN "
    "'<a class=\"x\" href=\"/local/' || CAST(doc_id AS STRING) || "
    "'\">Local' || chr(10) || 'line</a>' ELSE '' END || "
    "CASE WHEN doc_id % 3 = 0 THEN "
    "'<a href=\"//cdn.shared.net/a.js\">proto rel</a>' ELSE '' END || "
    "CASE WHEN doc_id % 4 = 0 THEN "
    "'<a href=\"relative/x\">rel</a>' ELSE '' END || "
    "CASE WHEN doc_id % 7 = 0 THEN "
    "'<a name=\"anchor\">no href</a>' ELSE '' END || "
    "'</body></html>'"
)


def q_extract_links(spark, sf):
    """Anchor/link extraction for the link graph: one row per
    double-quoted href anchor with the tag-stripped whitespace-
    collapsed anchor text and the href resolved against the source
    URL (absolute kept, protocol-relative takes the scheme,
    root-relative takes scheme://host, relative paths NULL).  The
    oracle replays the shared anchor regex with parallel
    regexp_extract_all passes, the tag/whitespace cleanup (with
    DuckDB's explicit global flags), and every resolution case."""
    from riko_spark.operators.webtext import extract_links_op

    d = _t(spark, sf, "documents").select(
        "doc_id",
        F.expr(_LINKS_URL_SQL).alias("url"),
        F.expr(_LINKS_HTML_SQL).alias("html"))
    return extract_links_op(d)


def q_link_hostgraph(spark, sf):
    """The host-level link graph a crawl scheduler ranks with:
    extract_links -> resolve -> (src_host, dst_host, n_links)
    aggregation.  One partial-agg exchange over resolved edges; the
    oracle recomputes extraction, resolution, host projection and
    the edge counts independently."""
    from riko_spark.operators.cleaning import host_col
    from riko_spark.operators.webtext import extract_links_op

    d = _t(spark, sf, "documents").select(
        "doc_id",
        F.expr(_LINKS_URL_SQL).alias("url"),
        F.expr(_LINKS_HTML_SQL).alias("html"))
    links = extract_links_op(d)
    return (
        links.where(F.col("resolved").isNotNull())
        .select(host_col(F.col("url")).alias("src_host"),
                host_col(F.col("resolved")).alias("dst_host"))
        .groupBy("src_host", "dst_host")
        .agg(F.count("*").alias("n_links"))
    )


def q_tfidf_topk(spark, sf):
    """Per-document top-5 tf-idf keywords over the doc_id % 7 == 2
    corpus slice: smoothed idf quantized to integer milli-nats, exact
    BIGINT scores, deterministic (score DESC, term ASC) ranking.  The
    oracle recomputes the corpus size, every document frequency, the
    quantized idf, and the windowed rank in one independent DuckDB
    plan — a drift in tokenization, smoothing, quantization, or the
    tie-break shifts a rank and mismatches."""
    from riko_spark.operators.textstats import tfidf_topk_op

    d = _t(spark, sf, "documents").select("doc_id", "text").where(
        F.col("doc_id") % 7 == 2)
    return tfidf_topk_op(d, k=5)


def q_url_normalize(spark, sf):
    """Crawl-frontier URL canonicalization: scheme/authority case
    folding, http:80 / https:443 default-port strip (non-default and
    cross-scheme ports kept), empty path -> '/', tracking-param
    removal (lowercased utm_/click-id prefixes), bytewise query-param
    sort, '?' dropped when nothing survives, fragment dropped.  The
    oracle replays every rule from the shared planting expression
    with an independent regexp/list pipeline."""
    from riko_spark.operators.cleaning import url_normalize_op

    d = _t(spark, sf, "documents").select(
        "doc_id", F.expr(_NORM_URL_SQL).alias("url"))
    return url_normalize_op(d).select("doc_id", "url", "norm_url")


# planted crawl page: chrome nav/footer, a content div carrying the
# document text, and a link-farm sidebar the extractor must reject on
# link density — same expression in Spark and the oracle
_HTML_SQL = (
    "'<html><body><nav><a href=\"/\">Home</a> <a href=\"/a\">About</a>"
    "</nav><div id=\"wrap\"><div id=\"content\">' || text || "
    "'</div><div class=\"side\"><a href=\"/p1\">promo one</a> "
    "<a href=\"/p2\">promo two</a> <a href=\"/p3\">promo three</a>"
    "</div></div><footer><a href=\"/t\">Terms</a></footer>"
    "</body></html>'"
)


def q_main_content(spark, sf):
    """DOM-level boilerplate removal over planted crawl pages: the
    readability-lite extractor must return exactly the content div's
    text (the document text), rejecting the chrome nav/footer and the
    link-farm sidebar on squared link density; the oracle recomputes
    the expected text md5 and length from the documents table — a
    parser or scorer drift that leaks one sidebar/nav token flips the
    md5."""
    from riko_spark.operators.cleaning import main_content_op

    d = _t(spark, sf, "documents").select(
        "doc_id", F.expr(_HTML_SQL).alias("html"))
    out = main_content_op(d)
    return out.select(
        "doc_id", F.md5("main_text").alias("main_md5"), "main_tag",
        "text_len", "link_density",
    )


# the capstone fixture: document text wrapped in three planted
# sentences, embedded in the crawl-page HTML (nav/sidebar/footer
# chrome), wrapped again in a WARC response record — three container
# layers the pipeline must strip to recover exactly this string
_CRAWL_TEXT_SQL = (
    "'Intro sentence one. ' || text || "
    "' The closing line follows. Third sentence ends here.'"
)
_CRAWL_HTML_SQL = _HTML_SQL.replace(
    "|| text ||", "|| " + _CRAWL_TEXT_SQL + " ||")


def q_crawl_pipeline(spark, sf):
    """Crawl bytes to cleaned corpus in one pipeline: WARC archives
    (mixed gzip layouts) -> record extraction -> HTTP payload ->
    DOM main-content extraction (rejecting nav/sidebar/footer) ->
    C4/Gopher doc gate.  The oracle strips all three container layers
    analytically — it recomputes the expected clean text, word and
    sentence counts, and keep flag directly from the documents table,
    so a defect in ANY stage (WARC framing, gzip, DOM scoring, gate
    arithmetic) surfaces as a value mismatch."""
    from riko_spark.operators.cleaning import (
        c4_doc_filter_op,
        main_content_op,
    )
    from riko_spark.sources.warc import warc_extract

    d = _t(spark, sf, "documents").filter(F.col("doc_id") < 300).select(
        "doc_id", F.expr(_CRAWL_HTML_SQL).alias("html"))

    def gen(batches):
        import pandas as pd

        from riko_spark.sources.warc import build_warc

        for pdf in batches:
            rows = []
            for i, h in zip(pdf["doc_id"], pdf["html"]):
                i = int(i)
                blob = build_warc([{
                    "warc_type": "response",
                    "uri": f"http://crawl.example/{i}",
                    "content_type": "application/http; msgtype=response",
                    "content": b"HTTP/1.1 200 OK\r\n\r\n" + h.encode(),
                }], gzip_members=(i % 2 == 0))
                rows.append((bytearray(blob),))
            yield pd.DataFrame(rows, columns=["blob"])

    recs = warc_extract(d.mapInPandas(gen, "blob binary"),
                        keep_types=("response",))
    pages = recs.select(
        F.regexp_extract("warc_target_uri", r"/(\d+)$", 1)
        .cast("bigint").alias("doc_id"),
        F.decode("payload", "utf-8").alias("html"),
    )
    main = main_content_op(pages).withColumnRenamed("main_text", "text")
    gated = c4_doc_filter_op(main)
    return gated.select(
        "doc_id", F.md5("text").alias("clean_md5"),
        "n_words", "n_sentences", "keep",
    )


def q_stream_corpus_batch(spark, sf):
    """Batch twin of the round-7 streaming crawl capstone
    (riko_spark/streaming/corpus.py:clean_corpus — the EXACT pipeline
    expression the stream runs): planted WARC response records (url
    from the shared _URL_SQL expression, page from _CRAWL_HTML_SQL,
    mixed gzip layouts) -> URL domain gate -> DOM main-content
    extraction -> C4 doc gate -> content-keyed exact dedupe.  Docs on
    doc_id % 5 == 0 recur at a second, never-blocked mirror URL with
    IDENTICAL page bytes, so (a) the dedupe must collapse each pair
    and (b) blocked-host content with a clean mirror must survive via
    the mirror.  Output is projected to content columns only
    (md5(text), n_words, n_sentences) — identical for every member of
    a dup group, so the comparison is independent of which URL the
    batch dedupe happens to keep; the oracle recomputes survival
    (url-gate OR mirror), the gate arithmetic, and the content
    collapse analytically from the documents table.  The oracle
    dedupes on the ENGINE's key — md5 of normalized text (lower +
    collapsed whitespace, operators/dedupe.py:_norm) — not raw
    md5(text); its per-group min() of the output columns equals the
    engine's arbitrary group member only while every norm-group here
    is byte-identical (planted texts embed doc_id), the invariant a
    future fixture change must keep."""
    from riko_spark.sources.warc import warc_extract
    from riko_spark.streaming.corpus import clean_corpus

    base = _t(spark, sf, "documents").filter(F.col("doc_id") < 200).select(
        "doc_id",
        F.expr(_URL_SQL).alias("url"),
        F.expr(_CRAWL_HTML_SQL).alias("html"))
    dups = base.filter(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat(F.lit("https://mirror.example.net/copy/"),
                 F.col("doc_id").cast("string")).alias("url"),
        "html")
    pages = base.unionByName(dups)

    def gen(batches):
        import pandas as pd

        from riko_spark.sources.warc import build_warc

        for pdf in batches:
            rows = []
            for i, (u, h) in enumerate(zip(pdf["url"], pdf["html"])):
                blob = build_warc([{
                    "warc_type": "response",
                    "uri": u,
                    "date": "2026-01-01T00:00:00Z",
                    "content_type": "application/http; msgtype=response",
                    "content": b"HTTP/1.1 200 OK\r\n\r\n" + h.encode(),
                }], gzip_members=(i % 2 == 0))
                rows.append((bytearray(blob),))
            yield pd.DataFrame(rows, columns=["blob"])

    recs = warc_extract(pages.mapInPandas(gen, "blob binary"),
                        keep_types=("response",))
    out = clean_corpus(recs, {
        "blocked_domains": ["spam-site.com", "tracker.net"],
        "dedupe_mode": "exact",
    })
    return out.select(F.md5("text").alias("clean_md5"),
                      "n_words", "n_sentences")


def q_host_stats(spark, sf):
    """CCNet-style per-host curation view: document count, mean
    length, and quality-gate pass count per host over the planted URL
    + sentence-wrapped corpus — the oracle regroups everything from
    the two shared planting expressions (host regex identical to the
    url_filter gate)."""
    from riko_spark.operators.cleaning import host_stats_op

    d = _t(spark, sf, "documents").select(
        "doc_id",
        F.expr(_URL_SQL).alias("url"),
        F.expr(_CRAWL_TEXT_SQL).alias("text"),
    )
    return host_stats_op(d).select("host", "n_docs", "mean_len", "n_keep")


def q_neardup_clusters(spark, sf):
    """Cluster resolution over planted near-dup CHAINS: edges
    (i, i+1) within each block of 8 ids force transitive closure —
    a single min-propagation pass cannot produce the right answer —
    and ids 256+ stay isolated singletons.  The distributed
    label-propagation + pointer-doubling loop must land every id on
    its block minimum; the oracle is pure id arithmetic."""
    from riko_spark.operators.graph import neardup_resolve_op

    docs = _t(spark, sf, "documents").select("doc_id").filter(
        F.col("doc_id") < 300)
    pairs = docs.filter(
        (F.col("doc_id") < 255) & (F.col("doc_id") % 8 != 7)
    ).select(
        F.col("doc_id").alias("left_id"),
        (F.col("doc_id") + 1).alias("right_id"),
    )
    return neardup_resolve_op(docs, pairs=pairs)


def q_pack_sequences(spark, sf):
    """GPT-style sequence packing over the documents corpus: hash-
    vocabulary token ids, end-of-document tokens, shard = doc_id mod 8,
    128-token sequences that cross document boundaries.  The oracle
    rebuilds every shard's token stream in SQL (zip-unnest + EOD union
    + row_number ordering) and recomputes each sequence's comma-joined
    md5 — one off-by-one in the chop, the shard sort, or the EOD
    placement flips a hash."""
    from riko_spark.operators.packing import pack_sequences_op

    d = _t(spark, sf, "documents").select("doc_id", "text")
    return pack_sequences_op(d, {"seq_len": 128, "shards": 8,
                                 "vocab": 32768, "eod_id": 0})


def q_warc_ingest(spark, sf):
    """Common-Crawl-container ingestion: WARC/1.0 archives (odd ids
    use the per-record-gzip-member layout CC ships, even ids plain)
    parse through the stdlib kernel (sources/warc.py) into records;
    the oracle recomputes URI, content length (HTTP header + body),
    status, and payload md5 from the documents table directly —
    header walking, Content-Length framing, gzip member inflation and
    the HTTP payload split all sit between the planted bytes and the
    compared values."""
    from riko_spark.sources.warc import warc_extract

    d = _t(spark, sf, "documents").filter(F.col("doc_id") < 200).select(
        "doc_id", "text")

    def gen(batches):
        import pandas as pd

        from riko_spark.sources.warc import build_warc

        for pdf in batches:
            rows = []
            for i, t in zip(pdf["doc_id"], pdf["text"]):
                i = int(i)
                blob = build_warc([{
                    "warc_type": "response",
                    "uri": f"http://doc.example/{i}",
                    "date": "2026-01-01T00:00:00Z",
                    "content_type": "application/http; msgtype=response",
                    "content": b"HTTP/1.1 200 OK\r\n\r\n" + t.encode(),
                }], gzip_members=(i % 2 == 1))
                rows.append((i, bytearray(blob)))
            yield pd.DataFrame(rows, columns=["id", "blob"])

    recs = warc_extract(d.mapInPandas(gen, "id bigint, blob binary"),
                        keep_types=("response",))
    return recs.select(
        "warc_target_uri", "content_length", "http_status",
        F.md5("payload").alias("payload_md5"),
    )


def q_warc_sharded(spark, sf):
    """Offset-sharded read of ONE large archive (round 7,
    sources/warc.py:warc_records_sharded): all 200 planted records are
    packed into a single .warc.gz (one gzip member per record, the CC
    layout), the member index is computed with warc_member_index, and
    the archive is read in 8 byte-balanced shards — each task seeks to
    its merged ranges and parses them with the same kernel as the
    whole-file path.  Same projection and SAME analytic oracle as
    warc_ingest, so a shard boundary splitting or dropping a record
    surfaces as a value mismatch."""
    import hashlib
    import os
    import tempfile

    from riko_spark.sources.warc import (
        build_warc,
        warc_member_index,
        warc_records_sharded,
    )

    rows = (_t(spark, sf, "documents").filter(F.col("doc_id") < 200)
            .select("doc_id", "text").orderBy("doc_id").collect())
    blob = build_warc([{
        "warc_type": "response",
        "uri": f"http://doc.example/{int(r['doc_id'])}",
        "date": "2026-01-01T00:00:00Z",
        "content_type": "application/http; msgtype=response",
        "content": b"HTTP/1.1 200 OK\r\n\r\n" + r["text"].encode(),
    } for r in rows], gzip_members=True)
    # content-addressed fixture path: identical input -> identical
    # file, safe across repeated plan builds
    path = os.path.join(
        tempfile.gettempdir(),
        f"riko_spark_sharded_{hashlib.md5(blob).hexdigest()}.warc.gz")
    if not os.path.exists(path):
        tmp = path + ".tmp"
        with open(tmp, "wb") as fh:
            fh.write(blob)
        os.replace(tmp, path)
    recs = warc_records_sharded(spark, path, warc_member_index(blob),
                                num_shards=8, keep_types=("response",))
    return recs.select(
        "warc_target_uri", "content_length", "http_status",
        F.md5("payload").alias("payload_md5"),
    )


def q_media_metadata(spark, sf):
    """Magic-sniff classification over REAL planted blobs — PNG and BMP
    from the image planting formula, RIFF/WAVE from the audio one, raw
    text bytes as the octet-stream control; expected types recomputed
    by the oracle from the planting id arithmetic (round 5: the RIFF
    branch now checks the WAVE form type at bytes 9-12, so a real WAV
    header is required to classify as audio/wav; round 6: real GIF89a
    blobs exercise the new image/gif branch)."""
    from riko_spark.operators.multimodal import media_metadata_op

    imgs = _planted_images(spark, sf)
    wavs = _planted_audio(spark, sf).select(
        (F.col("id") + F.lit(100000)).alias("id"), "blob")
    txt = _t(spark, sf, "documents").filter(F.col("doc_id") < 200).select(
        (F.col("doc_id") + F.lit(200000)).alias("id"),
        F.encode("text", "utf-8").alias("blob"))
    gifs = _planted_gifs(spark, sf).select(
        (F.col("id") + F.lit(300000)).alias("id"), "blob")
    return media_metadata_op(imgs.union(wavs).union(txt).union(gifs)).select(
        "id", "media_type")


def q_image_features(spark, sf):
    """mapInPandas plumbing oracle: the stub decoder's width is a pure
    function of blob length (64 + n_bytes % 512) and the feature vector
    is always 16-dim, both recomputable in SQL — verifying ids survive
    Arrow batching, no rows are dropped/duplicated, and the batch
    kernel sees exactly the bytes Spark stored."""
    d = _t(spark, sf, "documents").filter(F.col("doc_id") < 500).select(
        F.col("doc_id").alias("id"), F.encode("text", "utf-8").alias("blob")
    )
    from riko_spark.operators.multimodal import image_features_op

    return image_features_op(d).select(
        "id", "width", F.size("feature").alias("n_feat")
    )


def q_frame_sample(spark, sf):
    """UDTF-shape oracle for the frame sampler: the stub kernel slices
    deterministic byte ranges (chunk = len//(max_frames*every), one
    frame per every-th chunk), so frame boundaries, lengths, and md5s
    are all recomputable in SQL over the same (pure-ASCII) bytes —
    verifying the one-row-in/many-rows-out mapInPandas plumbing."""
    d = _t(spark, sf, "documents").filter(F.col("doc_id") < 50).select(
        F.col("doc_id").alias("id"), F.encode("text", "utf-8").alias("blob")
    )
    from riko_spark.operators.multimodal import frame_sample_op

    out = frame_sample_op(d, {"every": 4, "max_frames": 8},
                          field="blob", id_col="id")
    return out.select(
        "id", "frame_idx",
        F.length("frame").cast("bigint").alias("frame_len"),
        F.md5("frame").alias("frame_md5"),
    )


_IMG_N = 64


def _planted_images(spark, sf):
    """Planted PNG/BMP blobs whose pixels follow a closed-form formula
    of doc_id: intensity v(x, y) = (id + 3x + 5y) mod 251, dims 8..28
    (multiples of 4), format cycling gray-PNG / 24-bit BMP / RGB-PNG
    with the PNG scanline filter type also cycling 0-4.  The oracle
    recomputes width/height/channels and every 4×4-cell pixel SUM
    independently from the formula (never from blob length), so a
    broken decoder cannot pass (riko_spark/functions/imagecodec.py)."""
    ids = _t(spark, sf, "documents").select("doc_id").filter(
        F.col("doc_id") < _IMG_N).distinct()

    def gen(batches):
        import numpy as np
        import pandas as pd

        from riko_spark.functions.imagecodec import encode_bmp, encode_png

        for pdf in batches:
            rows = []
            for i in pdf["doc_id"]:
                i = int(i)
                w = 8 + 4 * (i % 6)
                h = 8 + 4 * ((i * 7 + 2) % 6)
                v = ((np.add.outer(5 * np.arange(h), 3 * np.arange(w)) + i)
                     % 251).astype(np.uint8)
                if i % 3 == 0:
                    blob = encode_png(v)  # 8-bit grayscale
                elif i % 3 == 1:
                    blob = encode_bmp(np.repeat(v[:, :, None], 3, axis=2))
                else:
                    blob = encode_png(np.repeat(v[:, :, None], 3, axis=2),
                                      filter_type=i % 5)
                rows.append((i, bytearray(blob)))
            yield pd.DataFrame(rows, columns=["id", "blob"])

    return ids.mapInPandas(gen, "id bigint, blob binary")


def q_image_features_real(spark, sf):
    """REAL image decode through the mapInPandas kernel: planted
    PNG/BMP pixels are decoded (zlib inflate + un-filter / BGR rows),
    and each 4×4-grid feature value is converted back to the exact
    integer pixel sum of its cell — the oracle recomputes those sums
    from the generative formula with generate_series, a fully
    independent decode path."""
    from riko_spark.operators.multimodal import image_features_op

    feats = image_features_op(
        _planted_images(spark, sf), {"on_undecodable": "raise"}
    )
    cellpix = (F.col("width") / 4) * (F.col("height") / 4)
    return feats.select(
        "id", "width", "height", "channels",
        F.posexplode("feature").alias("cell_idx", "f"),
    ).select(
        "id", "width", "height", "channels", "cell_idx",
        F.round(F.col("f") * 255 * cellpix).cast("bigint").alias("cell_sum"),
    )


def _planted_gifs(spark, sf):
    """Planted GIF blobs with the SAME generative pixel formula as
    _planted_images — v(x, y) = (id + 3x + 5y) mod 251 as R=G=B,
    palette-encoded (<=251 distinct colors), alternating sequential /
    interlaced frames — so the oracle recomputes every 4×4-cell pixel
    sum from the formula alone; a broken LZW state machine, palette
    lookup, or interlace reassembly changes the sums
    (riko_spark/functions/gifcodec.py)."""
    ids = _t(spark, sf, "documents").select("doc_id").filter(
        F.col("doc_id") < _IMG_N).distinct()

    def gen(batches):
        import numpy as np
        import pandas as pd

        from riko_spark.functions.gifcodec import encode_gif

        for pdf in batches:
            rows = []
            for i in pdf["doc_id"]:
                i = int(i)
                w = 8 + 4 * (i % 6)
                h = 8 + 4 * ((i * 7 + 2) % 6)
                v = ((np.add.outer(5 * np.arange(h), 3 * np.arange(w)) + i)
                     % 251).astype(np.uint8)
                blob = encode_gif(np.repeat(v[:, :, None], 3, axis=2),
                                  interlace=bool(i % 2))
                rows.append((i, bytearray(blob)))
            yield pd.DataFrame(rows, columns=["id", "blob"])

    return ids.mapInPandas(gen, "id bigint, blob binary")


def q_image_features_gif(spark, sf):
    """REAL GIF decode (variable-width LZW + palette + Adam-style
    interlace passes) through the same feature kernel: each 4×4-grid
    feature converts back to its cell's exact integer pixel sum and
    the oracle recomputes the sums from the planted formula with
    generate_series — fully independent of the decoder."""
    from riko_spark.operators.multimodal import image_features_op

    feats = image_features_op(
        _planted_gifs(spark, sf), {"on_undecodable": "raise"}
    )
    cellpix = (F.col("width") / 4) * (F.col("height") / 4)
    return feats.select(
        "id", "width", "height", "channels",
        F.posexplode("feature").alias("cell_idx", "f"),
    ).select(
        "id", "width", "height", "channels", "cell_idx",
        F.round(F.col("f") * 255 * cellpix).cast("bigint").alias("cell_sum"),
    )


def q_image_dhash(spark, sf):
    """Perceptual dHash over REAL decoded planted pixels: the oracle
    recomputes every 64-bit signature from the generative formula —
    block sums via generate_series, gradient-sign bits via the same
    cross-multiplied integer compare, two's-complement packing like the
    simhash oracle.  A wrong block boundary, row order, or bit layout
    flips bits."""
    from riko_spark.operators.multimodal import image_dhash_op

    return image_dhash_op(_planted_images(spark, sf),
                          {"on_undecodable": "raise"})


_PAIR_N = 32


def _planted_image_pairs(spark, sf):
    """Near-dup image corpus: the 32 base gray-PNG formula images
    (same planting as :func:`_planted_images`) PLUS a near-identical
    copy of each at ``id+1000`` whose single pixel (0, 0) is perturbed
    to ``(base + 7) % 251`` — a one-pixel edit, the canonical
    near-duplicate.  Every pixel of every id is a closed form, so the
    oracle recomputes the full dHash signatures AND the banded join
    independently."""
    base = _t(spark, sf, "documents").select("doc_id").filter(
        F.col("doc_id") < _PAIR_N).distinct()
    ids = base.union(base.select((F.col("doc_id") + 1000).alias("doc_id")))

    def gen(batches):
        import numpy as np
        import pandas as pd

        from riko_spark.functions.imagecodec import encode_png

        for pdf in batches:
            rows = []
            for i in pdf["doc_id"]:
                i = int(i)
                b = i % 1000
                w = 8 + 4 * (b % 6)
                h = 8 + 4 * ((b * 7 + 2) % 6)
                v = ((np.add.outer(5 * np.arange(h), 3 * np.arange(w)) + b)
                     % 251).astype(np.uint8)
                if i >= 1000:
                    v[0, 0] = (b + 7) % 251
                rows.append((i, bytearray(encode_png(v))))
            yield pd.DataFrame(rows, columns=["id", "blob"])

    return ids.mapInPandas(gen, "id bigint, blob binary")


def q_image_neardup(spark, sf):
    """Image near-dup END-TO-END (round 6): decode -> perceptual dHash
    -> banded bit-band self-join -> exact hamming verify, over a corpus
    with planted one-pixel-edit near-duplicates.  The oracle recomputes
    the signatures from the planting formula AND replays the banding +
    hamming join in SQL — band extraction, pair generation, and the
    <=7 verify are all independently recomputed."""
    from riko_spark.operators.multimodal import image_neardup_op

    return image_neardup_op(_planted_image_pairs(spark, sf),
                            {"on_undecodable": "raise"})


_JPEG_N = 48


def _planted_jpegs(spark, sf):
    """Planted baseline JPEG blobs (round 6: functions/jpegcodec.py is
    a REAL entropy decoder now).  Exactness contract: pixels are
    BLOCK-CONSTANT per 16x16 macroblock — v(x, y) = (11*id + 7*(x//16)
    + 13*(y//16)) mod 251 — so with the encoder's all-ones quant tables
    the only nonzero coefficient per block is the integer DC term and
    decode is bit-exact; RGB variants carry GRAY content (R=G=B=v), for
    which the JFIF transform is exactly Y=v, Cb=Cr=128, making the
    4:2:0 interleaved-MCU path and the color path integer-exact too.
    Format cycles grayscale / RGB 4:2:0 / RGB 4:4:4 with restart
    markers, so the driver row exercises single-component scans,
    subsampled interleaved MCUs, and RSTn segmentation."""
    ids = _t(spark, sf, "documents").select("doc_id").filter(
        F.col("doc_id") < _JPEG_N).distinct()

    def gen(batches):
        import numpy as np
        import pandas as pd

        from riko_spark.functions.jpegcodec import encode_jpeg

        for pdf in batches:
            rows = []
            for i in pdf["doc_id"]:
                i = int(i)
                w = 16 + 16 * (i % 3)
                h = 16 + 16 * ((i * 5 + 1) % 3)
                mb = ((11 * i
                       + 7 * (np.arange(w) // 16)[None, :]
                       + 13 * (np.arange(h) // 16)[:, None])
                      % 251).astype(np.uint8)
                if i % 3 == 0:
                    blob = encode_jpeg(mb)
                elif i % 3 == 1:
                    blob = encode_jpeg(np.repeat(mb[:, :, None], 3, axis=2),
                                       "420")
                else:
                    blob = encode_jpeg(np.repeat(mb[:, :, None], 3, axis=2),
                                       "444", restart_interval=3)
                rows.append((i, bytearray(blob)))
            yield pd.DataFrame(rows, columns=["id", "blob"])

    return ids.mapInPandas(gen, "id bigint, blob binary")


def q_image_features_jpeg(spark, sf):
    """REAL JPEG decode through the mapInPandas kernel (Huffman entropy
    decode + IDCT, functions/jpegcodec.py): channels != 0 proves the
    round-5 stub is gone, and each 4x4-grid feature converts back to
    the exact integer pixel sum of its cell — recomputed by the oracle
    from the planting formula with generate_series, a fully independent
    path that never touches the codec."""
    from riko_spark.operators.multimodal import image_features_op

    feats = image_features_op(
        _planted_jpegs(spark, sf), {"on_undecodable": "raise"}
    )
    cellpix = (F.col("width") / 4) * (F.col("height") / 4)
    return feats.select(
        "id", "width", "height", "channels",
        F.posexplode("feature").alias("cell_idx", "f"),
    ).select(
        "id", "width", "height", "channels", "cell_idx",
        F.round(F.col("f") * 255 * cellpix).cast("bigint").alias("cell_sum"),
    )


def _planted_jpegs_progressive(spark, sf):
    """Planted PROGRESSIVE JPEG blobs (SOF2) with the same
    block-constant pixel formula as :func:`_planted_jpegs` — the DC-only
    exactness contract survives the multi-scan reordering, so the
    spectral-selection / successive-approximation decode path (T.81
    G.2: DC first+refine, AC first with EOBn runs, AC refinement
    correction bits) is value-checked against the identical independent
    oracle.  Format cycles grayscale / RGB 4:2:0 / RGB 4:4:4 with
    restart markers (riko_spark/functions/jpegcodec.py)."""
    ids = _t(spark, sf, "documents").select("doc_id").filter(
        F.col("doc_id") < _JPEG_N).distinct()

    def gen(batches):
        import numpy as np
        import pandas as pd

        from riko_spark.functions.jpegcodec import encode_jpeg_progressive

        for pdf in batches:
            rows = []
            for i in pdf["doc_id"]:
                i = int(i)
                w = 16 + 16 * (i % 3)
                h = 16 + 16 * ((i * 5 + 1) % 3)
                mb = ((11 * i
                       + 7 * (np.arange(w) // 16)[None, :]
                       + 13 * (np.arange(h) // 16)[:, None])
                      % 251).astype(np.uint8)
                if i % 3 == 0:
                    blob = encode_jpeg_progressive(mb)
                elif i % 3 == 1:
                    blob = encode_jpeg_progressive(
                        np.repeat(mb[:, :, None], 3, axis=2), "420")
                else:
                    blob = encode_jpeg_progressive(
                        np.repeat(mb[:, :, None], 3, axis=2), "444",
                        restart_interval=3)
                rows.append((i, bytearray(blob)))
            yield pd.DataFrame(rows, columns=["id", "blob"])

    return ids.mapInPandas(gen, "id bigint, blob binary")


def q_image_features_jpeg_prog(spark, sf):
    """REAL progressive-JPEG decode (SOF2 multi-scan coefficient
    accumulation) through the mapInPandas kernel: each 4x4-grid
    feature converts back to the exact integer pixel sum of its cell,
    recomputed by the oracle from the planting formula — the same
    fully-independent check as the baseline JPEG row, over a stream
    the baseline entropy decoder cannot read."""
    from riko_spark.operators.multimodal import image_features_op

    feats = image_features_op(
        _planted_jpegs_progressive(spark, sf), {"on_undecodable": "raise"}
    )
    cellpix = (F.col("width") / 4) * (F.col("height") / 4)
    return feats.select(
        "id", "width", "height", "channels",
        F.posexplode("feature").alias("cell_idx", "f"),
    ).select(
        "id", "width", "height", "channels", "cell_idx",
        F.round(F.col("f") * 255 * cellpix).cast("bigint").alias("cell_sum"),
    )


_TIFF_N = 48


def _planted_tiffs(spark, sf):
    """Planted TIFF blobs (functions/tiffcodec.py): pixel v(x, y) =
    (7*id + 3*x + 5*y) mod 256 — TIFF decode is LOSSLESS so no
    block-constant contract is needed; every pixel is exact.  Format
    cycles the four compressions (none / PackBits / LZW+predictor /
    Deflate) x grayscale / RGB (R=G=B=v so intensity == v) x both byte
    orders, dims multiples of 4 so the 4x4 grid cells are exact."""
    ids = _t(spark, sf, "documents").select("doc_id").filter(
        F.col("doc_id") < _TIFF_N).distinct()

    def gen(batches):
        import numpy as np
        import pandas as pd

        from riko_spark.functions.tiffcodec import encode_tiff

        for pdf in batches:
            rows = []
            for i in pdf["doc_id"]:
                i = int(i)
                w = 20 + 8 * (i % 4)
                h = 12 + 8 * ((i * 3 + 1) % 4)
                v = ((7 * i + 3 * np.arange(w)[None, :]
                      + 5 * np.arange(h)[:, None]) % 256).astype(np.uint8)
                px = v if i % 2 == 0 else np.repeat(v[:, :, None], 3,
                                                    axis=2)
                comp = ("none", "packbits", "lzw", "deflate")[i % 4]
                blob = encode_tiff(px, comp, predictor=(comp == "lzw"),
                                   rows_per_strip=8,
                                   big_endian=(i % 8) >= 4)
                rows.append((i, bytearray(blob)))
            yield pd.DataFrame(rows, columns=["id", "blob"])

    return ids.mapInPandas(gen, "id bigint, blob binary")


def q_image_features_tiff(spark, sf):
    """REAL TIFF decode (IFD walk, strip assembly, PackBits / TIFF-LZW
    early-change / Deflate decompression, horizontal predictor, both
    byte orders) through the mapInPandas kernel: each 4x4-grid feature
    converts back to the exact integer pixel sum of its cell,
    recomputed by the oracle from the planting formula — decode is
    lossless so the check covers every pixel of every codec path."""
    from riko_spark.operators.multimodal import image_features_op

    feats = image_features_op(
        _planted_tiffs(spark, sf), {"on_undecodable": "raise"}
    )
    cellpix = (F.col("width") / 4) * (F.col("height") / 4)
    return feats.select(
        "id", "width", "height", "channels",
        F.posexplode("feature").alias("cell_idx", "f"),
    ).select(
        "id", "width", "height", "channels", "cell_idx",
        F.round(F.col("f") * 255 * cellpix).cast("bigint").alias("cell_sum"),
    )


_WAV_N = 48


def _planted_audio(spark, sf):
    """Planted PCM WAVs: interleaved sample j of doc i is
    ((i*37 + j*17) mod 2001) - 1000, rate/channels/frames are closed
    forms of i — every per-window sum-of-squares is recomputable by the
    oracle from the formula alone (riko_spark/functions/wavcodec.py)."""
    ids = _t(spark, sf, "documents").select("doc_id").filter(
        F.col("doc_id") < _WAV_N).distinct()

    def gen(batches):
        import numpy as np
        import pandas as pd

        from riko_spark.functions.wavcodec import encode_wav

        for pdf in batches:
            rows = []
            for i in pdf["doc_id"]:
                i = int(i)
                rate = 4000 + 2000 * (i % 3)
                ch = 1 + (i % 2)
                frames = 600 + 100 * (i % 5)
                j = np.arange(frames * ch, dtype=np.int64)
                s = ((i * 37 + j * 17) % 2001 - 1000).astype(np.int16)
                rows.append((i, bytearray(encode_wav(s.reshape(frames, ch),
                                                     rate))))
            yield pd.DataFrame(rows, columns=["id", "blob"])

    return ids.mapInPandas(gen, "id bigint, blob binary")


def q_audio_features(spark, sf):
    """REAL WAV decode + windowed loudness: the RIFF walk, PCM decode
    and per-256-frame sum-of-squares are checked value-exactly against
    the oracle's generate_series recomputation of the planted sample
    formula (win_sumsq is an exact int64 — no float compare)."""
    from riko_spark.operators.multimodal import audio_features_op

    out = audio_features_op(_planted_audio(spark, sf),
                            {"window_frames": 256})
    return out.select(
        "id", "sample_rate", "channels", "n_frames", "duration_ms",
        "win_idx", "win_frames", "win_sumsq",
    )


def q_audio_features_zcr(spark, sf):
    """Per-window zero-crossing counts over the planted PCM corpus:
    per-channel sign transitions between consecutive frames, windows
    of 256 — the oracle evaluates the planting formula at BOTH frame
    positions of every transition (closed form, no lag window needed)
    and counts sign flips exactly, mono and stereo."""
    from riko_spark.operators.multimodal import audio_features_op

    out = audio_features_op(_planted_audio(spark, sf),
                            {"window_frames": 256})
    return out.select("id", "win_idx", "win_frames", "win_zcr")


#: µ-law code bytes planted by _planted_audio_g711 and their ITU G.711
#: linear expansions — the oracle pins the SAME eight spec values in a
#: CASE, so a wrong expansion table cannot self-certify.
_G711_CODES = (0x00, 0x80, 0xFF, 0x9A, 0x1A, 0xD5, 0x55, 0x3C)


def _planted_audio_g711(spark, sf):
    """Planted µ-law (wFormatTag 7) mono WAVs: code byte j of doc i is
    _G711_CODES[(i*31 + j*13) mod 8], written VERBATIM (no linear->
    G.711 compressor exists in the repo); the oracle recomputes each
    window's sum-of-squares from the selector formula plus the
    spec-pinned expansion values (riko_spark/functions/wavcodec.py)."""
    ids = _t(spark, sf, "documents").select("doc_id").filter(
        F.col("doc_id") < _WAV_N).distinct()

    def gen(batches):
        import numpy as np
        import pandas as pd

        from riko_spark.functions.wavcodec import encode_wav_g711

        for pdf in batches:
            rows = []
            codes = np.array(_G711_CODES, dtype=np.uint8)
            for i in pdf["doc_id"]:
                i = int(i)
                frames = 600 + 100 * (i % 5)
                j = np.arange(frames, dtype=np.int64)
                sel = (i * 31 + j * 13) % 8
                rows.append((i, bytearray(encode_wav_g711(codes[sel],
                                                          8000))))
            yield pd.DataFrame(rows, columns=["id", "blob"])

    return ids.mapInPandas(gen, "id bigint, blob binary")


def q_audio_features_g711(spark, sf):
    """REAL G.711 µ-law decode + windowed loudness: companded code
    bytes expand through the spec table and the per-256-frame
    sum-of-squares is checked value-exactly against the oracle's CASE
    over the eight spec-pinned linear values — a wrong segment shift,
    bias, or sign in the expansion changes win_sumsq."""
    from riko_spark.operators.multimodal import audio_features_op

    out = audio_features_op(_planted_audio_g711(spark, sf),
                            {"window_frames": 256})
    return out.select(
        "id", "sample_rate", "channels", "n_frames", "duration_ms",
        "win_idx", "win_frames", "win_sumsq",
    )


def _planted_audio_float(spark, sf):
    """Planted IEEE-float32 WAVs: sample j of doc i is k/32767 with
    k = (i*37 + j*17) mod 2001 - 1000 — float32 carries k/32767 with
    relative error < 2^-24, so the decoder's ×32767 half-up rounding
    recovers k EXACTLY and the oracle recomputes every window sum from
    the integer formula alone (riko_spark/functions/wavcodec.py)."""
    ids = _t(spark, sf, "documents").select("doc_id").filter(
        F.col("doc_id") < _WAV_N).distinct()

    def gen(batches):
        import numpy as np
        import pandas as pd

        from riko_spark.functions.wavcodec import encode_wav_float

        for pdf in batches:
            rows = []
            for i in pdf["doc_id"]:
                i = int(i)
                ch = 1 + (i % 2)
                frames = 500 + 100 * (i % 4)
                j = np.arange(frames * ch, dtype=np.int64)
                k = (i * 37 + j * 17) % 2001 - 1000
                f = (k / 32767.0).astype(np.float32)
                rows.append((i, bytearray(encode_wav_float(
                    f.reshape(frames, ch), 22050))))
            yield pd.DataFrame(rows, columns=["id", "blob"])

    return ids.mapInPandas(gen, "id bigint, blob binary")


def q_audio_features_float(spark, sf):
    """REAL IEEE-float WAV decode (wFormatTag 3) + windowed loudness:
    the float32 payload, fact-chunk walk and [-1,1]->int16 scaling are
    checked value-exactly — win_sumsq is an exact int64 the oracle
    recomputes from the planted integer formula."""
    from riko_spark.operators.multimodal import audio_features_op

    out = audio_features_op(_planted_audio_float(spark, sf),
                            {"window_frames": 256})
    return out.select(
        "id", "sample_rate", "channels", "n_frames", "duration_ms",
        "win_idx", "win_frames", "win_sumsq",
    )


_ADPCM_N = 16


def _planted_audio_adpcm(spark, sf):
    """Planted IMA ADPCM WAVs (wFormatTag 0x11): mono, ONE 44-byte
    block per doc — header predictor (i*211) mod 1024 - 512, step
    index (i*11) mod 89, then 320 raw 4-bit codes nib(i,j) =
    (i*7 + j*5) mod 16 written verbatim (no linear->ADPCM compressor
    exists in the repo).  The oracle REPLAYS the IMA step/index
    recurrence in a recursive CTE over a spec-pinned 89-row step
    table, so the kernel's expansion cannot self-certify
    (riko_spark/functions/wavcodec.py)."""
    ids = _t(spark, sf, "documents").select("doc_id").filter(
        F.col("doc_id") < _ADPCM_N).distinct()

    def gen(batches):
        import numpy as np
        import pandas as pd

        from riko_spark.functions.wavcodec import encode_wav_ima

        for pdf in batches:
            rows = []
            for i in pdf["doc_id"]:
                i = int(i)
                j = np.arange(320, dtype=np.int64)
                nib = ((i * 7 + j * 5) % 16).astype(np.uint8)
                pred = np.array([(i * 211) % 1024 - 512], np.int16)
                idx = np.array([(i * 11) % 89], np.uint8)
                rows.append((i, bytearray(encode_wav_ima(
                    nib[None, :], pred, idx, 8000))))
            yield pd.DataFrame(rows, columns=["id", "blob"])

    return ids.mapInPandas(gen, "id bigint, blob binary")


def q_audio_features_adpcm(spark, sf):
    """REAL IMA ADPCM decode + windowed loudness: the 4-bit codes
    expand through the step/index recurrence and the per-64-frame
    sum-of-squares is checked value-exactly against a recursive-CTE
    replay of the SAME recurrence in the oracle — a wrong step table
    entry, clamp bound, or index adjustment diverges immediately."""
    from riko_spark.operators.multimodal import audio_features_op

    out = audio_features_op(_planted_audio_adpcm(spark, sf),
                            {"window_frames": 64})
    return out.select(
        "id", "sample_rate", "channels", "n_frames", "duration_ms",
        "win_idx", "win_frames", "win_sumsq",
    )


_AFP_N = 48      # 12 clusters x 4 members
_AFP_GROUP = 4   # members per cluster


def _planted_audio_clusters(spark, sf):
    """Planted near-duplicate audio clusters for the acoustic
    fingerprint: member m of cluster g (id = g*4 + m) is the SAME
    9-sinusoid mixture — one component per fingerprint frequency band,
    amplitudes stepping x1.5 up/down according to the bits of the
    cluster's spectral pattern ``(g*21 + 1) % 256`` — under a uniform
    gain (1 + m/100) and an integer-sample time shift (7*m), the
    transforms the gradient-sign fingerprint is invariant to.  Every
    component sits on an exact 512-sample rFFT bin (freq = bin *
    sr/512 with sr=4096, n=4096), so band energies are concentrated
    and the x2.25 adjacent-band energy margin dwarfs int16
    quantization noise: members fingerprint identically (hamming 0)
    while distinct clusters differ in >= 8 bits (8 frames x >= 1
    differing gradient sign), outside the banded join's default
    max_hamming=7.  Expected pairs are therefore pure id arithmetic —
    the oracle recomputes them as id//4 equality."""
    ids = _t(spark, sf, "documents").select("doc_id").filter(
        F.col("doc_id") < _AFP_N).distinct()

    def gen(batches):
        import numpy as np
        import pandas as pd

        from riko_spark.functions.wavcodec import encode_wav

        flen, n, sr = 512, 4096, 4096
        # one exact-bin frequency centred in each of the 9 bands of
        # the 257-bin rFFT half-spectrum
        bins = [(257 * b) // 9 + 14 for b in range(9)]
        for pdf in batches:
            rows = []
            for i in pdf["doc_id"]:
                i = int(i)
                g, m = i // _AFP_GROUP, i % _AFP_GROUP
                pattern = (g * 21 + 1) % 256
                amps = [1.0]
                for b in range(8):
                    amps.append(amps[-1] * (1.5 if (pattern >> b) & 1
                                            else 1 / 1.5))
                amps = np.array(amps) * (12000.0 / sum(amps))
                j = np.arange(n, dtype=np.float64) + 7 * m
                s = np.zeros(n)
                for a, k in zip(amps, bins):
                    s += a * np.sin(2 * np.pi * k * j / flen)
                s = np.round(s * (1 + m / 100.0)).astype(np.int16)
                rows.append((i, bytearray(encode_wav(s.reshape(-1, 1),
                                                     sr))))
            yield pd.DataFrame(rows, columns=["id", "blob"])

    return ids.mapInPandas(gen, "id bigint, blob binary")


def q_audio_neardup(spark, sf):
    """Acoustic near-dup end-to-end: Chromaprint-style spectral
    gradient fingerprint over REAL decoded PCM -> banded bit-band
    self-join -> exact hamming verify (the same banding machinery as
    SimHash and image dHash).  Planted-recall oracle: the 72
    within-cluster pairs (and nothing else) must surface with
    hamming 0, recomputed from the planting id arithmetic."""
    from riko_spark.operators.multimodal import audio_neardup_op

    return audio_neardup_op(_planted_audio_clusters(spark, sf))


_FLAC_N = 32


def _planted_flac(spark, sf):
    """Planted FLACs carrying the SAME interleaved sample formula as
    the WAV fixtures (((i*37 + j*17) mod 2001) - 1000) so the oracle
    recomputes every per-window sum-of-squares from the formula alone
    — FLAC is lossless, so decode must reproduce the exact int16
    samples.  Encoding parameters sweep the whole decoder surface:
    subframe mode cycles fixed:0..4 / verbatim by id, Rice partition
    order cycles 0..2, and stereo docs cycle independent / left-side /
    right-side / mid-side decorrelation — a wrong predictor, zigzag,
    partition split, or decorrelation formula shows up as a win_sumsq
    mismatch (functions/flaccodec.py)."""
    ids = _t(spark, sf, "documents").select("doc_id").filter(
        F.col("doc_id") < _FLAC_N).distinct()

    def gen(batches):
        import numpy as np
        import pandas as pd

        from riko_spark.functions.flaccodec import encode_flac

        modes = ["fixed:0", "fixed:1", "fixed:2", "fixed:3", "fixed:4",
                 "verbatim"]
        stereos = ["independent", "left_side", "right_side", "mid_side"]
        for pdf in batches:
            rows = []
            for i in pdf["doc_id"]:
                i = int(i)
                rate = 8000 + 4000 * (i % 3)
                ch = 1 + (i % 2)
                frames = 500 + 60 * (i % 4)
                j = np.arange(frames * ch, dtype=np.int64)
                s = ((i * 37 + j * 17) % 2001 - 1000).astype(np.int16)
                blob = encode_flac(
                    s.reshape(frames, ch), rate, blocksize=256,
                    mode=modes[i % 6], po=i % 3,
                    stereo=stereos[(i // 2) % 4] if ch == 2
                    else "independent")
                rows.append((i, bytearray(blob)))
            yield pd.DataFrame(rows, columns=["id", "blob"])

    return ids.mapInPandas(gen, "id bigint, blob binary")


def q_audio_features_flac(spark, sf):
    """REAL FLAC decode + windowed loudness: frame headers (CRC-8),
    FIXED/VERBATIM subframes, Rice partitions, stereo decorrelation
    and the CRC-16 footer all sit between the planted sample formula
    and the exact int64 win_sumsq the oracle recomputes with
    generate_series — any decode divergence is a value mismatch."""
    from riko_spark.operators.multimodal import audio_features_op

    out = audio_features_op(_planted_flac(spark, sf),
                            {"window_frames": 128})
    return out.select(
        "id", "sample_rate", "channels", "n_frames", "duration_ms",
        "win_idx", "win_frames", "win_sumsq",
    )


_AVI_N = 24


def _planted_video(spark, sf):
    """Planted raw-DIB AVIs: frame f of doc i has every-channel pixel
    v(x, y) = (i + 2f + 3x + 5y) mod 251, dims/frame-count closed forms
    of i — per-frame pixel sums recomputable by the oracle
    (riko_spark/functions/avicodec.py)."""
    ids = _t(spark, sf, "documents").select("doc_id").filter(
        F.col("doc_id") < _AVI_N).distinct()

    def gen(batches):
        import numpy as np
        import pandas as pd

        from riko_spark.functions.avicodec import encode_avi

        for pdf in batches:
            rows = []
            for i in pdf["doc_id"]:
                i = int(i)
                w = 8 + 4 * (i % 3)
                h = 8 + 4 * ((i * 7 + 2) % 3)
                nf = 4 + i % 5
                frames = []
                for f in range(nf):
                    v = ((np.add.outer(5 * np.arange(h), 3 * np.arange(w))
                          + i + 2 * f) % 251).astype(np.uint8)
                    frames.append(np.repeat(v[:, :, None], 3, axis=2))
                rows.append((i, bytearray(encode_avi(frames))))
            yield pd.DataFrame(rows, columns=["id", "blob"])

    return ids.mapInPandas(gen, "id bigint, blob binary")


def q_video_frames(spark, sf):
    """REAL video decode through the RIFF/AVI chunk walk: every 2nd
    raw-DIB frame's exact pixel sum (int64) — a broken walk, wrong row
    order, or BGR mix-up changes the sum; the oracle recomputes it from
    the planted generative formula with generate_series."""
    from riko_spark.operators.multimodal import video_frames_op

    return video_frames_op(_planted_video(spark, sf),
                           {"every": 2, "max_frames": 8})


def _planted_video_mjpeg(spark, sf):
    """Planted Motion-JPEG AVIs: each '00dc' chunk is a standalone
    baseline JPEG (functions/jpegcodec.py) of a GRAY frame that is
    constant on every 8x8 block — block (bx, by) of frame f of doc i
    has value v = (i + 2f + 3bx + 5by) mod 251, so the ones-quant
    entropy round trip is integer-EXACT (only the DC coefficient is
    nonzero) and the oracle recomputes per-frame pixel sums as
    64 * sum(v) over the block grid (riko_spark/functions/avicodec.py
    walk + jpegcodec.py decode)."""
    ids = _t(spark, sf, "documents").select("doc_id").filter(
        F.col("doc_id") < _AVI_N).distinct()

    def gen(batches):
        import numpy as np
        import pandas as pd

        from riko_spark.functions.avicodec import encode_avi

        for pdf in batches:
            rows = []
            for i in pdf["doc_id"]:
                i = int(i)
                bw = 2 + i % 3
                bh = 2 + (i * 7 + 2) % 3
                nf = 4 + i % 5
                frames = []
                for f in range(nf):
                    v = ((np.add.outer(5 * np.arange(bh),
                                       3 * np.arange(bw))
                          + i + 2 * f) % 251).astype(np.uint8)
                    frames.append(np.repeat(np.repeat(v, 8, 0), 8, 1))
                rows.append((i, bytearray(encode_avi(frames,
                                                     codec="mjpg"))))
            yield pd.DataFrame(rows, columns=["id", "blob"])

    return ids.mapInPandas(gen, "id bigint, blob binary")


def q_video_frames_mjpeg(spark, sf):
    """REAL Motion-JPEG video decode: every 2nd '00dc' frame decodes
    through the baseline JPEG kernel (Huffman entropy decode + IDCT)
    and emits its exact pixel sum — a broken chunk walk, Huffman table
    mix-up, or IDCT bug changes the sum; the oracle recomputes it from
    the planted block formula with generate_series."""
    from riko_spark.operators.multimodal import video_frames_op

    return video_frames_op(_planted_video_mjpeg(spark, sf),
                           {"every": 2, "max_frames": 8})


def _planted_gif_anim(spark, sf):
    """Planted ANIMATED GIFs exercising the compositing path itself:
    frame 0 fills the logical screen with v0(x, y) = (i + 3x + 5y)
    mod 251 (R=G=B); frame 1 overlays the inner rect [2, w-2) × [2,
    h-2) with v1(x, y) = (i + 7x + 11y + 13) mod 251 at SCREEN
    coordinates, TRANSPARENT wherever v1 % 5 == 0 — so frame 1's
    composited pixel is v1 inside the opaque overlay and v0 everywhere
    else, and the oracle recomputes both frames' pixel sums from the
    two formulas alone.  A broken LZW stream, local-palette lookup,
    transparency mask, or overlay placement changes the sums
    (riko_spark/functions/gifcodec.py)."""
    ids = _t(spark, sf, "documents").select("doc_id").filter(
        F.col("doc_id") < _AVI_N).distinct()

    def gen(batches):
        import numpy as np
        import pandas as pd

        from riko_spark.functions.gifcodec import encode_gif_animated

        sentinel = (255, 0, 255)  # v % 251 <= 250 can never collide
        for pdf in batches:
            rows = []
            for i in pdf["doc_id"]:
                i = int(i)
                w = 8 + 4 * (i % 6)
                h = 8 + 4 * ((i * 7 + 2) % 6)
                v0 = ((np.add.outer(5 * np.arange(h), 3 * np.arange(w))
                       + i) % 251).astype(np.uint8)
                f0 = np.repeat(v0[:, :, None], 3, axis=2)
                v1 = ((np.add.outer(11 * np.arange(h), 7 * np.arange(w))
                       + i + 13) % 251).astype(np.uint8)
                f1 = np.repeat(v1[:, :, None], 3, axis=2)
                f1[v1 % 5 == 0] = sentinel
                frames = [(0, 0, f0, 1),
                          (2, 2, f1[2:h - 2, 2:w - 2], 1)]
                blob = encode_gif_animated(frames, (w, h),
                                           transparent_color=sentinel)
                rows.append((i, bytearray(blob)))
            yield pd.DataFrame(rows, columns=["id", "blob"])

    return ids.mapInPandas(gen, "id bigint, blob binary")


def q_video_frames_gif(spark, sf):
    """REAL animated-GIF decode through the video path: both frames'
    exact composited pixel sums — frame 1 is a transparent partial
    overlay, so the sum mixes the overlay formula with show-through
    from frame 0; the oracle recomputes every sum from the two planted
    formulas with generate_series, fully independent of the decoder."""
    from riko_spark.operators.multimodal import video_frames_op

    return video_frames_op(_planted_gif_anim(spark, sf),
                           {"every": 1, "max_frames": 4,
                            "on_undecodable": "raise"})


def q_sequence_match(spark, sf):
    """CEP sequence detection (view → click → purchase per user within
    2 days, earliest-completion-per-anchor semantics) — the
    beyond-reference pattern operator; one window pass + one keyed
    equi-join, never a range join (riko_spark/streaming/cep.py)."""
    ev = _t(spark, sf, "events")
    from riko_spark.streaming.cep import sequence_match

    return sequence_match(ev, ["view", "click", "purchase"], within="2 days")


def q_sequence_match_alt(spark, sf):
    """CEP sequence with step ALTERNATION: view → (click OR signup) →
    purchase within 2 days — same window+join plan, widened step
    predicate (riko_spark/streaming/cep.py sequence_match)."""
    ev = _t(spark, sf, "events")
    from riko_spark.streaming.cep import sequence_match

    return sequence_match(ev, ["view", ["click", "signup"], "purchase"],
                          within="2 days")


def q_sequence_match_quant(spark, sf):
    """CEP sequence with a QUANTIFIED step (Flink times(m)): view →
    2nd click → purchase within 2 days; the m-th occurrence resolves
    through a per-type lead(m-1) column + one extra keyed equi-join."""
    ev = _t(spark, sf, "events")
    from riko_spark.streaming.cep import sequence_match

    return sequence_match(
        ev, ["view", {"type": "click", "times": 2}, "purchase"],
        within="2 days",
    )


def q_absence_match(spark, sf):
    """Negative CEP pattern: views never followed by a purchase within
    1 day (the timeout-alert shape) — zero-join window plan."""
    ev = _t(spark, sf, "events")
    from riko_spark.streaming.cep import absence_match

    return absence_match(ev, ["view", "purchase"], within="1 day")


def q_threshold_match(spark, sf):
    """Frequency CEP pattern: the 3rd error within a trailing 1-day
    window per user (monitoring-alert shape) — RANGE-frame count, zero
    joins."""
    ev = _t(spark, sf, "events")
    from riko_spark.streaming.cep import threshold_match

    return threshold_match(ev, "error", 3, within="1 day")


def q_sliding_count(spark, sf):
    """Sliding windows (1 h window, 30 min slide) — every event lands
    in exactly two windows."""
    ev = _t(spark, sf, "events")
    from riko_spark.streaming.windows import sliding_count

    out = sliding_count(ev, ts_col="ts", window="1 hour", slide="30 minutes",
                        watermark=None, keys=["event_type"])
    return out.select("window_start", "event_type", F.col("n_docs").alias("n"))


def q_topk_per_group(spark, sf):
    """Top-3 events by value per event_type (ranking window)."""
    ev = _t(spark, sf, "events").select("event_id", "event_type", "value")
    w = Window.partitionBy("event_type").orderBy(
        F.col("value").desc(), F.col("event_id").asc()
    )
    return (
        ev.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
    )


def q_salted_count(spark, sf):
    """Two-phase salted aggregation (skew defense) must equal a plain
    GROUP BY — verified against the oracle directly."""
    from riko_spark.functions.skew import salted_agg

    ev = _t(spark, sf, "events")
    return salted_agg(
        ev.withColumn("hour", F.date_trunc("hour", F.col("ts"))),
        ["hour", "event_type"],
        {"n": ("count", "*"), "maxv": ("max", "value")},
        buckets=8,
    )


def q_union_ragged(spark, sf):
    """Bag union of ragged schemas (riko items are schemaless dicts;
    unionByName with missing columns -> NULL fill)."""
    o = _t(spark, sf, "orders")
    a = o.select("o_orderkey", "o_orderstatus").filter(F.col("o_orderstatus") == "O")
    b = o.select("o_orderkey", "o_totalprice").filter(F.col("o_totalprice") > 180000)
    return _flow(a).union(None, others=[b]).df


def q_strfind_last(spark, sf):
    p = _t(spark, sf, "part").select("p_partkey", "p_name")
    conf = {"rule": [{"find": " ", "location": "after", "param": "last"}]}
    return _flow(p).strfind(conf, field="p_name", assign="last_word").df


def q_regex_casematch(spark, sf):
    d = _t(spark, sf, "documents").select("doc_id", "text")
    conf = {"rule": [{"field": "text", "match": "SPARK", "replace": "x",
                      "casematch": True}]}
    return _flow(d).regex(conf).df


def q_first_k_per_key(spark, sf):
    """Custom stateful operator, batch mode (streaming variant tested
    in tests/test_stateful.py): first 2 events per user."""
    from riko_spark.streaming.stateful import first_k_per_key

    ev = _t(spark, sf, "events").select("event_id", "user_id", "ts")
    return first_k_per_key(ev, "user_id", k=2, order_col="event_id")


def q_aggregate_udaf(spark, sf):
    """The ``aggregate`` pipe (UDAF escape hatch, riko/modules/
    aggregate.py): per-group pandas aggregation — integer-cent sums so
    the value hash is exact across engines."""
    import pandas as pd

    from riko_spark.operators.aggregates import aggregate_op

    ev = _t(spark, sf, "events").select(
        "event_type", F.floor(F.col("value") * 100).cast("bigint").alias("cents")
    )

    def agg(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"event_type": [pdf["event_type"].iloc[0]],
             "total_cents": [pdf["cents"].sum()],
             "n": [len(pdf)]}
        )

    return aggregate_op(
        ev, func=agg, schema="event_type string, total_cents bigint, n bigint",
        group_key="event_type",
    )


def q_pipe_graph(spark, sf):
    """End-to-end riko pipe graph via the JSON-DAG compiler:
    documents → filter(lang=en) → tokenizer → count(token)."""
    from riko_spark.plans.dag import build_pipeline

    docs = _t(spark, sf, "documents")
    pipe_def = {
        "modules": [
            {"id": "src", "type": "fetch", "conf": {"url": os.path.join(sf, "documents.parquet")}},
            {"id": "flt", "type": "filter",
             "conf": {"rule": [{"field": "lang", "op": "is", "value": "en"}]}},
            {"id": "tok", "type": "tokenizer",
             "conf": {"delimiter": " ", "token_key": "token", "field": "text"}},
            {"id": "cnt", "type": "count", "conf": {"count_key": "token"}},
            {"id": "out", "type": "output"},
        ],
    }
    out = build_pipeline(spark, pipe_def, sources={"src": docs})
    return out.orderBy(F.col("count").desc(), F.col("token").asc()).limit(50)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # Ordering is the per-round ROTATION of the driver's 50-entry
    # correctness gate (it verifies the first 50 entries).  Round-8
    # rotation (VERDICT r7 ask #1): code-changed-this-round entries
    # LEAD — stream_corpus_batch (oracle now dedupes on the engine's
    # normalized-md5 key, ADVICE r7; its streaming path gained the
    # per-partition pre-dedupe), warc_sharded (chunked member
    # indexing + URI resolution + sharded streaming source), and the
    # three queries through the rewritten zip_with shingle chain
    # (minhash_lsh, ngram_jaccard, fingerprint, repetition_stats;
    # ngram_contamination also rides it, inside the r06 block below)
    # and the two pipelines composed over the natively-rewritten c4
    # line-gate predicate (corpus_pipeline, crawl_pipeline;
    # c4_line_filter itself and stream_corpus_batch also ride it and
    # are already under the gate), plus the THIRTEEN NEW-this-round
    # entries (span_dedupe, lm_score, stratified_sample,
    # mixture_resample, dsir_select, ngram_contamination_bloom,
    # url_normalize, tfidf_topk, robots_gate, frontier_pipeline,
    # extract_links, link_hostgraph, sitemap_urls) —
    # then the 7 entries whose last driver-green
    # row is r05 (simplemath, dateformat, datebuilder, subelement,
    # urlbuilder, urlparse, itembuilder), then 22 of the 44 r06-head
    # entries so no driver row ages past 2 rounds.  Past position 50:
    # regex_casematch, union_ragged, filter_or_block, uniq_limited,
    # count_group, truncate, image_features_tiff,
    # image_features_jpeg_prog and c4_doc_filter (displaced for the
    # thirteen new entries; siblings/compositions
    # `regex`/`union`/`filter`/`uniq`/`count`/`sort_truncate`/
    # `image_features_jpeg`/`corpus_pipeline` (which
    # composes c4_doc_filter directly) keep every family in-gate,
    # code unchanged, r06-green + this round's full
    # check_oracle re-runs — they lead r9) and the last
    # thirteen r06-head entries (absence_match,
    # image_features, image_features_gif, media_metadata,
    # audio_features, audio_features_zcr/g711/float/adpcm,
    # video_frames, video_frames_mjpeg, video_frames_gif,
    # frame_sample — code unchanged, re-verified via this round's
    # full tools/check_oracle.py runs; they lead the r9 rotation,
    # and each displaced family keeps an in-gate representative) and
    # the
    # remaining r07-head entries (driver-green one round ago, code
    # unchanged, same full re-run).
    return {
        # -- code changed round 8 --
        "stream_corpus_batch": q_stream_corpus_batch,
        "warc_sharded": q_warc_sharded,
        # (shingle construction rewritten as a zip_with chain this
        # round — every query through word_shingles re-verifies:)
        "minhash_lsh": q_minhash_lsh,
        "ngram_jaccard": q_ngram_jaccard,
        "fingerprint": q_fingerprint,
        "repetition_stats": q_repetition,
        # (c4 line-gate predicate rewritten natively this round —
        # its composed pipelines re-verify:)
        "corpus_pipeline": q_corpus_pipeline,
        "crawl_pipeline": q_crawl_pipeline,
        # -- NEW round 8 --
        "span_dedupe": q_span_dedupe,
        "lm_score": q_lm_score,
        "stratified_sample": q_stratified_sample,
        "mixture_resample": q_mixture_resample,
        "dsir_select": q_dsir_select,
        "ngram_contamination_bloom": q_ngram_contamination_bloom,
        "url_normalize": q_url_normalize,
        "tfidf_topk": q_tfidf_topk,
        "robots_gate": q_robots_gate,
        "frontier_pipeline": q_frontier_pipeline,
        "extract_links": q_extract_links,
        "link_hostgraph": q_link_hostgraph,
        "sitemap_urls": q_sitemap_urls,
        # -- last driver-green r05: refresh first --
        "simplemath": q_simplemath,
        "dateformat": q_dateformat,
        "datebuilder": q_datebuilder,
        "subelement": q_subelement,
        "urlbuilder": q_urlbuilder,
        "urlparse": q_urlparse,
        "itembuilder": q_itembuilder,
        # -- r06-head entries rotated back under the gate --
        "salted_count": q_salted_count,
        "filter": q_filter,
        "sort_truncate": q_sort_truncate,
        "count": q_count,
        "sum_group": q_sum_group,
        "union": q_union,
        "uniq": q_uniq,
        "join": q_join,
        "regex": q_regex,
        "rename": q_rename,
        "sliding_count": q_sliding_count,
        "first_k_per_key": q_first_k_per_key,
        "image_features_jpeg": q_image_features_jpeg,
        "image_neardup": q_image_neardup,
        "c4_line_filter": q_c4_line_filter,
        "ngram_contamination": q_ngram_contamination,
        "warc_ingest": q_warc_ingest,
        "url_filter": q_url_filter,
        "pack_sequences": q_pack_sequences,
        "host_stats": q_host_stats,
        "audio_neardup": q_audio_neardup,
        "sequence_match": q_sequence_match,
        # ---- past the 50-entry gate from here ----
        "regex_casematch": q_regex_casematch,
        "union_ragged": q_union_ragged,
        "filter_or_block": q_filter_or_block,
        "uniq_limited": q_uniq_limited,
        "count_group": q_count_group,
        "truncate": q_truncate,
        "image_features_tiff": q_image_features_tiff,
        "image_features_jpeg_prog": q_image_features_jpeg_prog,
        "c4_doc_filter": q_c4_doc_filter,
        # -- past the 50-entry gate: r06-green tail (unchanged,
        #    check_oracle re-run this session; lead r9).  The first
        #    three (absence_match, image_features, image_features_gif)
        #    were displaced from the head by the three NEW-round-8
        #    entries above; their CEP/image families keep in-gate
        #    representatives (sequence_match, image_features_jpeg/
        #    jpeg_prog/tiff) --
        "absence_match": q_absence_match,
        "image_features": q_image_features,
        "image_features_gif": q_image_features_gif,
        "media_metadata": q_media_metadata,
        "audio_features": q_audio_features,
        "audio_features_zcr": q_audio_features_zcr,
        "audio_features_g711": q_audio_features_g711,
        "audio_features_float": q_audio_features_float,
        "audio_features_adpcm": q_audio_features_adpcm,
        "video_frames": q_video_frames,
        "video_frames_mjpeg": q_video_frames_mjpeg,
        "video_frames_gif": q_video_frames_gif,
        "frame_sample": q_frame_sample,
        # -- r07-head: driver-green in CORRECTNESS_r07 (one round
        #    old), code unchanged this round --
        "line_dedupe": q_line_dedupe,
        "main_content": q_main_content,
        "neardup_clusters": q_neardup_clusters,
        "audio_features_flac": q_audio_features_flac,
        "image_features_real": q_image_features_real,
        "image_dhash": q_image_dhash,
        "sequence_match_alt": q_sequence_match_alt,
        "sequence_match_quant": q_sequence_match_quant,
        "threshold_match": q_threshold_match,
        "aggregate_udaf": q_aggregate_udaf,
        "topk_per_group": q_topk_per_group,
        "pii_scrub": q_pii_scrub,
        "strfind_last": q_strfind_last,
        "exact_dedupe": q_exact_dedupe,
        "simhash": q_simhash,
        "simhash_neardup": q_simhash_neardup,
        "embedding_neardup": q_embedding_neardup,
        "ann_bruteforce": q_ann_bruteforce,
        "ann_bruteforce_vec": q_ann_bruteforce_vec,
        "ann_lsh": q_ann_lsh,
        "ann_ivf": q_ann_ivf,
        "pipe_graph": q_pipe_graph,
        "windowed_count": q_windowed_count,
        "session_windows": q_session_windows,
        "token_count": q_token_count,
        "lang_id": q_lang_id,
        "quality": q_quality,
        "token_totals": q_token_totals,
        "exchangerate": q_exchangerate,
        "join_lower": q_join_lower,
        "tokenizer_wordcount": q_tokenizer_wordcount,
        "tail": q_tail,
        "reverse_head": q_reverse_head,
        "strreplace": q_strreplace,
        "strtransform": q_strtransform,
        "strconcat": q_strconcat,
        "strfind": q_strfind,
        "refind": q_refind,
        "substr": q_substr,
        "slugify": q_slugify,
        "hash_md5": q_hash_md5,
        "typecast": q_typecast,
    }


# -------------------------------------------------------------- oracles

_TRIM = r"^\s+|\s+$"
_TOKENIZE_SQL = (
    "list_transform(list_filter(string_split(text, ' '), t -> t <> ''), "
    "t -> regexp_replace(t, '^\\s+|\\s+$', '', 'g'))"
)


def _simhash_sql(src: str) -> str:
    """ANSI-SQL (DuckDB) recomputation of the md5-token SimHash kernel
    (riko_spark.operators.dedupe.simhash64): per doc, bit k of the
    64-bit signature is 1 iff the ±1 sum over token occurrences of the
    token-md5's bit k is > 0.  Emits a ``sim(doc_id, simhash BIGINT)``
    CTE (two's-complement to match Spark's signed long)."""
    return f"""
        WITH d AS (SELECT doc_id, text FROM {src}),
        tok AS (
          SELECT doc_id,
                 unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                                    x -> x <> '')) AS t
          FROM d
        ),
        th AS (
          SELECT doc_id, ('0x' || substr(md5(t), 1, 16))::UBIGINT AS h FROM tok
        ),
        bits AS (
          SELECT doc_id, bb.b AS bit,
                 SUM(CASE WHEN (h >> bb.b) & 1 = 1 THEN 1 ELSE -1 END) AS m
          FROM th, (SELECT unnest(range(0, 64)) AS b) bb
          GROUP BY doc_id, bb.b
        ),
        uns AS (
          SELECT doc_id,
                 SUM(CASE WHEN m > 0 THEN (1::UBIGINT << bit)::HUGEINT
                          ELSE 0::HUGEINT END) AS uv
          FROM bits GROUP BY doc_id
        ),
        sim AS (
          SELECT doc_id,
                 CAST(uv - CASE WHEN uv >= 9223372036854775808::HUGEINT
                                THEN 18446744073709551616::HUGEINT
                                ELSE 0::HUGEINT END AS BIGINT) AS simhash
          FROM uns
        )
    """


def oracle_sql() -> dict[str, str]:
    out = {
        "filter": """
            SELECT * FROM orders
            WHERE o_orderpriority IS NOT NULL AND o_orderpriority <> ''
              AND contains(lower(o_orderpriority), 'urgent')
              AND TRY_CAST(o_totalprice AS DECIMAL(38,18)) >= 100000
        """,
        "filter_or_block": """
            SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
            WHERE NOT COALESCE(o_orderstatus = 'F' OR o_totalprice < 50000, FALSE)
        """,
        "sort_truncate": """
            SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
            ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 50
        """,
        "truncate": """
            SELECT event_id, ts, event_type FROM events
            ORDER BY ts, event_id LIMIT 50 OFFSET 100
        """,
        "tail": """
            SELECT event_id, ts, event_type FROM events
            ORDER BY ts DESC, event_id DESC LIMIT 20
        """,
        "reverse_head": """
            SELECT event_id, ts FROM events ORDER BY ts DESC, event_id DESC LIMIT 25
        """,
        "count": "SELECT COUNT(*) AS count FROM lineitem",
        "count_group": """
            SELECT COALESCE(CAST(event_type AS VARCHAR), 'None') AS event_type,
                   COUNT(*) AS count, MIN(event_id) AS first_seen
            FROM events GROUP BY 1
        """,
        "sum_group": """
            SELECT COALESCE(CAST(l_returnflag AS VARCHAR), 'None') AS l_returnflag,
                   -- varchar route + DECIMAL(18,6): DuckDB keeps the sum
                   -- in exact decimal (38,18 would overflow to double)
                   CAST(SUM(CAST(CAST(l_quantity AS VARCHAR) AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty
            FROM lineitem GROUP BY 1
        """,
        "union": """
            SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders WHERE o_orderstatus = 'F'
            UNION ALL
            SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders WHERE o_totalprice > 150000
        """,
        "uniq": """
            SELECT event_id, ts, user_id, event_type FROM (
                SELECT event_id, ts, user_id, event_type,
                       ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
                FROM events
            ) WHERE rn = 1
        """,
        "join": """
            SELECT c_custkey, c_name, n_name, r_name
            FROM customer
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
        """,
        "join_lower": """
            SELECT n_nationkey, n_name, name_lc, rk
            FROM nation
            JOIN (SELECT lower(n_name) AS name_lc, n_regionkey AS rk FROM nation) d
              ON lower(n_name) = lower(name_lc)
        """,
        "tokenizer_wordcount": f"""
            WITH toks AS (
                SELECT unnest({_TOKENIZE_SQL}) AS token FROM documents
            )
            SELECT token, COUNT(*) AS n FROM toks GROUP BY token
            ORDER BY n DESC, token ASC LIMIT 100
        """,
        "regex": r"""
            SELECT doc_id, regexp_replace(text, '(?ims)(sc)an', '\1anned', 'g') AS text
            FROM documents
        """,
        "strreplace": """
            SELECT p_partkey, p_brand, replace(p_brand, 'Brand#', 'B-') AS brand2 FROM part
        """,
        "strtransform": """
            SELECT p_partkey, p_name, upper(p_name) AS name_upper FROM part
        """,
        "strconcat": """
            SELECT p_partkey, p_name, 'part:' || p_name AS label FROM part
        """,
        "strfind": r"""
            SELECT p_partkey, p_type,
                   regexp_replace(CASE WHEN contains(p_type, ' ')
                        THEN substr(p_type, 1, strpos(p_type, ' ') - 1) ELSE '' END,
                        '^\s+|\s+$', '', 'g') AS head
            FROM part
        """,
        "refind": r"""
            SELECT p_partkey, p_type,
                   regexp_replace(
                     CASE WHEN regexp_matches(p_type, '\s')
                          THEN regexp_replace(p_type, '^.*?\s', '', 's')
                          ELSE p_type END,
                     '^\s+|\s+$', '', 'g') AS tail
            FROM part
        """,
        "substr": """
            SELECT p_partkey, p_type, substr(p_type, 1, 5) AS prefix FROM part
        """,
        "slugify": r"""
            SELECT p_partkey, p_name,
                   regexp_replace(
                     regexp_replace(lower(regexp_replace(p_name, '^\s+|\s+$', '', 'g')),
                                    '[^a-z0-9]+', '-', 'g'),
                     '^-+|-+$', '', 'g') AS slug
            FROM part
        """,
        "hash_md5": "SELECT doc_id, text, md5(text) AS hash FROM documents",
        "typecast": """
            SELECT event_id, event_type, COALESCE(TRY_CAST(event_type AS BIGINT), 0) AS typecast
            FROM events
        """,
        "simplemath": """
            SELECT l_orderkey, l_linenumber,
                   -- varchar route = Spark's shortest-repr double->decimal
                   -- cast; DECIMAL(18,6) keeps DuckDB's addition in exact
                   -- decimal (38,18 + 38,18 would overflow to double there)
                   CAST(CAST(CAST(l_extendedprice AS VARCHAR) AS DECIMAL(18,6))
                        + CAST(CAST(l_tax AS VARCHAR) AS DECIMAL(18,6)) AS DOUBLE) AS total
            FROM lineitem
        """,
        "dateformat": """
            SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS day FROM orders
        """,
        "datebuilder": """
            SELECT o_orderkey,
                   TRY_CAST(strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS TIMESTAMP) AS parsed
            FROM orders
        """,
        "rename": "SELECT r_regionkey, r_name AS region_name FROM region",
        "subelement": """
            SELECT event_id, CAST(props->>'$.k' AS BIGINT) AS k FROM events
        """,
        "urlbuilder": """
            SELECT p_partkey,
                   'https://example.com/part?id=' || CAST(p_partkey AS VARCHAR) AS url
            FROM part
        """,
        "urlparse": """
            WITH u AS (
                SELECT 'https://example.com/r/' || r_name || '?rk=' || CAST(r_regionkey AS VARCHAR) || '#top' AS url
                FROM region
            )
            SELECT 'scheme' AS component, 'https' AS content FROM u
            UNION ALL SELECT 'netloc', 'example.com' FROM u
            UNION ALL SELECT 'path', regexp_extract(url, '^https://example\\.com(/[^?#]*)', 1) FROM u
            UNION ALL SELECT 'params', '' FROM u
            UNION ALL SELECT 'query', regexp_extract(url, '\\?([^#]*)', 1) FROM u
            UNION ALL SELECT 'fragment', regexp_extract(url, '#(.*)$', 1) FROM u
        """,
        "itembuilder": "SELECT 'region' AS title, r_name AS name FROM region",
        "ann_bruteforce": """
            WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
            q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 3),
            scored AS (
                SELECT q.query_id, e.vec_id,
                       ROUND(list_cosine_similarity(e.v, q.qv), 6) AS cos
                FROM e CROSS JOIN q
            ), ranked AS (
                SELECT query_id, vec_id,
                       ROW_NUMBER() OVER (PARTITION BY query_id
                                          ORDER BY cos DESC, vec_id ASC) AS rank
                FROM scored
            )
            SELECT query_id, rank, vec_id FROM ranked WHERE rank <= 10
        """,
        # identical ranking required from the vectorized matmul kernel
        "ann_bruteforce_vec": """
            WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
            q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 3),
            scored AS (
                SELECT q.query_id, e.vec_id,
                       ROUND(list_cosine_similarity(e.v, q.qv), 6) AS cos
                FROM e CROSS JOIN q
            ), ranked AS (
                SELECT query_id, vec_id,
                       ROW_NUMBER() OVER (PARTITION BY query_id
                                          ORDER BY cos DESC, vec_id ASC) AS rank
                FROM scored
            )
            SELECT query_id, rank, vec_id FROM ranked WHERE rank <= 10
        """,
        # ---- planted-ground-truth / kernel oracles for the similarity ops
        "minhash_lsh": _PLANTED_DOCS_SQL + """
            SELECT left_id, right_id FROM jac
            WHERE n_inter * 1.0 / n_union >= 0.7
        """,
        "ngram_jaccard": _PLANTED_DOCS_SQL + """
            SELECT left_id, right_id, n_inter, n_union,
                   CAST(n_inter AS DOUBLE) / CAST(n_union AS DOUBLE) AS jaccard
            FROM jac WHERE n_inter >= 3
        """,
        "simhash": _simhash_sql("documents") + """
            SELECT doc_id, simhash FROM sim
        """,
        "simhash_neardup": _simhash_sql(
            "(SELECT * FROM documents WHERE doc_id < 200)"
        ) + """
            SELECT a.doc_id AS left_id, b.doc_id AS right_id,
                   bit_count(xor(a.simhash, b.simhash)) AS hamming
            FROM sim a JOIN sim b ON a.doc_id < b.doc_id
            WHERE bit_count(xor(a.simhash, b.simhash)) <= 7
        """,
        "embedding_neardup": """
            WITH base AS (
                SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                FROM embeddings WHERE vec_id < 60
            ),
            corpus AS (
                SELECT vec_id, v FROM base
                UNION ALL
                SELECT vec_id + 100000,
                       list_concat([v[1] + 0.0005::DOUBLE * (1 + vec_id % 5)], v[2:])
                FROM base
            )
            SELECT a.vec_id AS left_id, b.vec_id AS right_id
            FROM corpus a JOIN corpus b ON a.vec_id < b.vec_id
            WHERE list_cosine_similarity(a.v, b.v) >= 0.999
        """,
        "ann_lsh": """
            WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
            qs AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 3),
            planted AS (
                SELECT (q.query_id + 1) * 100000 + jj.j AS vec_id,
                       list_concat([q.qv[1] + 0.0005::DOUBLE * jj.j], q.qv[2:]) AS v
                FROM qs q, (SELECT unnest(range(1, 6)) AS j) jj
            ),
            corpus AS (SELECT vec_id, v FROM e UNION ALL SELECT vec_id, v FROM planted),
            scored AS (
                SELECT q.query_id, c.vec_id,
                       ROUND(list_cosine_similarity(c.v, q.qv), 6) AS cos
                FROM corpus c CROSS JOIN qs q
            ), ranked AS (
                SELECT query_id, vec_id,
                       ROW_NUMBER() OVER (PARTITION BY query_id
                                          ORDER BY cos DESC, vec_id ASC) AS rank
                FROM scored
            )
            SELECT query_id, rank, vec_id FROM ranked WHERE rank <= 6
        """,
        "ann_ivf": """
            WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
            qs AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 3),
            planted AS (
                SELECT (q.query_id + 1) * 100000 + jj.j AS vec_id,
                       list_concat([q.qv[1] + 0.0005::DOUBLE * jj.j], q.qv[2:]) AS v
                FROM qs q, (SELECT unnest(range(1, 6)) AS j) jj
            ),
            corpus AS (SELECT vec_id, v FROM e UNION ALL SELECT vec_id, v FROM planted),
            scored AS (
                SELECT q.query_id, c.vec_id,
                       ROUND(list_cosine_similarity(c.v, q.qv), 6) AS cos
                FROM corpus c CROSS JOIN qs q
            ), ranked AS (
                SELECT query_id, vec_id,
                       ROW_NUMBER() OVER (PARTITION BY query_id
                                          ORDER BY cos DESC, vec_id ASC) AS rank
                FROM scored
            )
            SELECT query_id, rank, vec_id FROM ranked WHERE rank <= 6
        """,
        "image_features": """
            SELECT doc_id AS id,
                   CAST(64 + (octet_length(encode(text)) % 512) AS INT) AS width,
                   16 AS n_feat
            FROM documents WHERE doc_id < 500
        """,
        # the oracle recomputes dims + per-cell pixel SUMS from the
        # planted generative formula with generate_series: a fully
        # independent decode of the same images the Spark side reads
        # back out of real PNG/BMP bytes
        "image_features_real": """
            WITH ids AS (
              SELECT DISTINCT doc_id AS id FROM documents WHERE doc_id < 64
            ),
            dims AS (
              SELECT id,
                     8 + 4*(id % 6) AS width,
                     8 + 4*((id*7 + 2) % 6) AS height,
                     CASE WHEN id % 3 = 0 THEN 1 ELSE 3 END AS channels
              FROM ids
            ),
            px AS (
              SELECT d.id, d.width, d.height, d.channels,
                     ((y.y * 4) // d.height) * 4
                       + ((x.x * 4) // d.width) AS cell_idx,
                     (d.id + 3*x.x + 5*y.y) % 251 AS v
              FROM dims d
              JOIN generate_series(0, 27) AS x(x) ON x.x < d.width
              JOIN generate_series(0, 27) AS y(y) ON y.y < d.height
            )
            SELECT id, CAST(width AS INT) AS width,
                   CAST(height AS INT) AS height,
                   CAST(channels AS INT) AS channels,
                   CAST(cell_idx AS INT) AS cell_idx,
                   CAST(SUM(v) AS BIGINT) AS cell_sum
            FROM px GROUP BY id, width, height, channels, cell_idx
        """,
        "image_features_gif": """
            WITH ids AS (
              SELECT DISTINCT doc_id AS id FROM documents WHERE doc_id < 64
            ),
            dims AS (
              SELECT id,
                     8 + 4*(id % 6) AS width,
                     8 + 4*((id*7 + 2) % 6) AS height
              FROM ids
            ),
            px AS (
              SELECT d.id, d.width, d.height,
                     ((y.y * 4) // d.height) * 4
                       + ((x.x * 4) // d.width) AS cell_idx,
                     (d.id + 3*x.x + 5*y.y) % 251 AS v
              FROM dims d
              JOIN generate_series(0, 27) AS x(x) ON x.x < d.width
              JOIN generate_series(0, 27) AS y(y) ON y.y < d.height
            )
            SELECT id, CAST(width AS INT) AS width,
                   CAST(height AS INT) AS height,
                   CAST(3 AS INT) AS channels,
                   CAST(cell_idx AS INT) AS cell_idx,
                   CAST(SUM(v) AS BIGINT) AS cell_sum
            FROM px GROUP BY id, width, height, cell_idx
        """,
        "image_neardup": """
            WITH base AS (
              SELECT DISTINCT doc_id AS bid FROM documents WHERE doc_id < 32
            ),
            ids AS (
              SELECT bid AS id, bid AS b, 0 AS tweak FROM base
              UNION ALL
              SELECT bid + 1000, bid, 1 FROM base
            ),
            dims AS (
              SELECT id, b, tweak,
                     8 + 4*(b % 6) AS width,
                     8 + 4*((b*7 + 2) % 6) AS height
              FROM ids
            ),
            px AS (
              SELECT d.id, d.width, d.height, x.x AS x, y.y AS y,
                     CASE WHEN d.tweak = 1 AND x.x = 0 AND y.y = 0
                          THEN (d.b + 7) % 251
                          ELSE (d.b + 3*x.x + 5*y.y) % 251 END AS v
              FROM dims d
              JOIN generate_series(0, 27) AS x(x) ON x.x < d.width
              JOIN generate_series(0, 27) AS y(y) ON y.y < d.height
            ),
            blocks AS (
              SELECT p.id, r.r, c.c,
                     CAST(SUM(p.v) AS BIGINT) AS s,
                     CAST(COUNT(*) AS BIGINT) AS a
              FROM px p
              JOIN generate_series(0, 7) AS r(r)
                ON p.y >= (p.height * r.r) // 8
               AND p.y < (p.height * (r.r + 1)) // 8
              JOIN generate_series(0, 8) AS c(c)
                ON p.x >= (p.width * c.c) // 9
               AND p.x < (p.width * (c.c + 1)) // 9
              GROUP BY p.id, r.r, c.c
            ),
            bits AS (
              SELECT b0.id, b0.r, b0.c
              FROM blocks b0
              JOIN blocks b1 ON b1.id = b0.id AND b1.r = b0.r
                            AND b1.c = b0.c + 1
              WHERE b0.c < 8 AND b1.s * b0.a > b0.s * b1.a
            ),
            sig AS (
              SELECT i.id,
                     CAST(COALESCE(
                       SUM((1::UBIGINT << (b.r*8 + b.c))::HUGEINT),
                       0::HUGEINT) AS UBIGINT) AS u
              FROM ids i LEFT JOIN bits b ON b.id = i.id
              GROUP BY i.id
            ),
            cand AS (
              SELECT DISTINCT l.id AS left_id, r.id AS right_id,
                     ls_xor.h AS hamming
              FROM sig l
              JOIN sig r ON l.id < r.id
              JOIN generate_series(0, 7) AS bb(b)
                ON ((l.u >> (bb.b*8)) & 255::UBIGINT)
                 = ((r.u >> (bb.b*8)) & 255::UBIGINT),
              LATERAL (SELECT CAST(bit_count(xor(l.u, r.u)) AS INT) AS h)
                AS ls_xor
            )
            SELECT left_id, right_id, hamming
            FROM cand WHERE hamming <= 7
        """,
        "image_features_jpeg": """
            WITH ids AS (
              SELECT DISTINCT doc_id AS id FROM documents WHERE doc_id < 48
            ),
            dims AS (
              SELECT id,
                     16 + 16*(id % 3) AS width,
                     16 + 16*((id*5 + 1) % 3) AS height,
                     CASE WHEN id % 3 = 0 THEN 1 ELSE 3 END AS channels
              FROM ids
            ),
            px AS (
              SELECT d.id, d.width, d.height, d.channels,
                     ((y.y * 4) // d.height) * 4
                       + ((x.x * 4) // d.width) AS cell_idx,
                     (11*d.id + 7*(x.x // 16) + 13*(y.y // 16)) % 251 AS v
              FROM dims d
              JOIN generate_series(0, 47) AS x(x) ON x.x < d.width
              JOIN generate_series(0, 47) AS y(y) ON y.y < d.height
            )
            SELECT id, CAST(width AS INT) AS width,
                   CAST(height AS INT) AS height,
                   CAST(channels AS INT) AS channels,
                   CAST(cell_idx AS INT) AS cell_idx,
                   CAST(SUM(v) AS BIGINT) AS cell_sum
            FROM px GROUP BY id, width, height, channels, cell_idx
        """,
        "image_features_jpeg_prog": """
            WITH ids AS (
              SELECT DISTINCT doc_id AS id FROM documents WHERE doc_id < 48
            ),
            dims AS (
              SELECT id,
                     16 + 16*(id % 3) AS width,
                     16 + 16*((id*5 + 1) % 3) AS height,
                     CASE WHEN id % 3 = 0 THEN 1 ELSE 3 END AS channels
              FROM ids
            ),
            px AS (
              SELECT d.id, d.width, d.height, d.channels,
                     ((y.y * 4) // d.height) * 4
                       + ((x.x * 4) // d.width) AS cell_idx,
                     (11*d.id + 7*(x.x // 16) + 13*(y.y // 16)) % 251 AS v
              FROM dims d
              JOIN generate_series(0, 47) AS x(x) ON x.x < d.width
              JOIN generate_series(0, 47) AS y(y) ON y.y < d.height
            )
            SELECT id, CAST(width AS INT) AS width,
                   CAST(height AS INT) AS height,
                   CAST(channels AS INT) AS channels,
                   CAST(cell_idx AS INT) AS cell_idx,
                   CAST(SUM(v) AS BIGINT) AS cell_sum
            FROM px GROUP BY id, width, height, channels, cell_idx
        """,
        "image_features_tiff": """
            WITH ids AS (
              SELECT DISTINCT doc_id AS id FROM documents WHERE doc_id < 48
            ),
            dims AS (
              SELECT id,
                     20 + 8*(id % 4) AS width,
                     12 + 8*((id*3 + 1) % 4) AS height,
                     CASE WHEN id % 2 = 0 THEN 1 ELSE 3 END AS channels
              FROM ids
            ),
            px AS (
              SELECT d.id, d.width, d.height, d.channels,
                     ((y.y * 4) // d.height) * 4
                       + ((x.x * 4) // d.width) AS cell_idx,
                     (7*d.id + 3*x.x + 5*y.y) % 256 AS v
              FROM dims d
              JOIN generate_series(0, 43) AS x(x) ON x.x < d.width
              JOIN generate_series(0, 35) AS y(y) ON y.y < d.height
            )
            SELECT id, CAST(width AS INT) AS width,
                   CAST(height AS INT) AS height,
                   CAST(channels AS INT) AS channels,
                   CAST(cell_idx AS INT) AS cell_idx,
                   CAST(SUM(v) AS BIGINT) AS cell_sum
            FROM px GROUP BY id, width, height, channels, cell_idx
        """,
        "image_dhash": """
            WITH ids AS (
              SELECT DISTINCT doc_id AS id FROM documents WHERE doc_id < 64
            ),
            dims AS (
              SELECT id,
                     8 + 4*(id % 6) AS width,
                     8 + 4*((id*7 + 2) % 6) AS height
              FROM ids
            ),
            px AS (
              SELECT d.id, d.width, d.height, x.x AS x, y.y AS y,
                     (d.id + 3*x.x + 5*y.y) % 251 AS v
              FROM dims d
              JOIN generate_series(0, 27) AS x(x) ON x.x < d.width
              JOIN generate_series(0, 27) AS y(y) ON y.y < d.height
            ),
            blocks AS (
              SELECT p.id, r.r, c.c,
                     CAST(SUM(p.v) AS BIGINT) AS s,
                     CAST(COUNT(*) AS BIGINT) AS a
              FROM px p
              JOIN generate_series(0, 7) AS r(r)
                ON p.y >= (p.height * r.r) // 8
               AND p.y < (p.height * (r.r + 1)) // 8
              JOIN generate_series(0, 8) AS c(c)
                ON p.x >= (p.width * c.c) // 9
               AND p.x < (p.width * (c.c + 1)) // 9
              GROUP BY p.id, r.r, c.c
            ),
            bits AS (
              SELECT b0.id, b0.r, b0.c
              FROM blocks b0
              JOIN blocks b1 ON b1.id = b0.id AND b1.r = b0.r
                            AND b1.c = b0.c + 1
              WHERE b0.c < 8 AND b1.s * b0.a > b0.s * b1.a
            ),
            uns AS (
              SELECT i.id,
                     COALESCE(SUM((1::UBIGINT << (b.r*8 + b.c))::HUGEINT),
                              0::HUGEINT) AS uv
              FROM ids i LEFT JOIN bits b ON b.id = i.id
              GROUP BY i.id
            )
            SELECT id,
                   CAST(uv - CASE WHEN uv >= 9223372036854775808::HUGEINT
                                  THEN 18446744073709551616::HUGEINT
                                  ELSE 0::HUGEINT END AS BIGINT) AS dhash
            FROM uns
        """,
        "video_frames": """
            WITH ids AS (
              SELECT DISTINCT doc_id AS id FROM documents WHERE doc_id < 24
            ),
            dims AS (
              SELECT id,
                     8 + 4*(id % 3) AS width,
                     8 + 4*((id*7 + 2) % 3) AS height,
                     4 + id % 5 AS nf
              FROM ids
            ),
            fr AS (
              SELECT d.*, f.f AS frame_idx
              FROM dims d JOIN generate_series(0, 7) AS f(f)
                ON f.f % 2 = 0 AND f.f < d.nf
            ),
            px AS (
              SELECT fr.id, fr.frame_idx, fr.width, fr.height,
                     (fr.id + 2*fr.frame_idx + 3*x.x + 5*y.y) % 251 AS v
              FROM fr
              JOIN generate_series(0, 15) AS x(x) ON x.x < fr.width
              JOIN generate_series(0, 15) AS y(y) ON y.y < fr.height
            )
            SELECT id, CAST(frame_idx AS INT) AS frame_idx,
                   CAST(width AS INT) AS width,
                   CAST(height AS INT) AS height,
                   CAST(3 * SUM(v) AS BIGINT) AS px_sum
            FROM px GROUP BY id, frame_idx, width, height
        """,
        "video_frames_mjpeg": """
            WITH ids AS (
              SELECT DISTINCT doc_id AS id FROM documents WHERE doc_id < 24
            ),
            dims AS (
              SELECT id,
                     2 + (id % 3) AS bw,
                     2 + ((id*7 + 2) % 3) AS bh,
                     4 + id % 5 AS nf
              FROM ids
            ),
            fr AS (
              SELECT d.*, f.f AS frame_idx
              FROM dims d JOIN generate_series(0, 7) AS f(f)
                ON f.f % 2 = 0 AND f.f < d.nf
            ),
            blk AS (
              SELECT fr.id, fr.frame_idx, fr.bw, fr.bh,
                     (fr.id + 2*fr.frame_idx + 3*bx.bx + 5*by.by) % 251 AS v
              FROM fr
              JOIN generate_series(0, 4) AS bx(bx) ON bx.bx < fr.bw
              JOIN generate_series(0, 4) AS by(by) ON by.by < fr.bh
            )
            SELECT id, CAST(frame_idx AS INT) AS frame_idx,
                   CAST(8 * bw AS INT) AS width,
                   CAST(8 * bh AS INT) AS height,
                   CAST(64 * SUM(v) AS BIGINT) AS px_sum
            FROM blk GROUP BY id, frame_idx, bw, bh
        """,
        "video_frames_gif": """
            WITH ids AS (
              SELECT DISTINCT doc_id AS id FROM documents WHERE doc_id < 24
            ),
            dims AS (
              SELECT id,
                     8 + 4*(id % 6) AS w,
                     8 + 4*((id*7 + 2) % 6) AS h
              FROM ids
            ),
            px AS (
              SELECT d.id, f.f, d.w, d.h,
                     CASE WHEN f.f = 1
                               AND x.x >= 2 AND x.x < d.w - 2
                               AND y.y >= 2 AND y.y < d.h - 2
                               AND ((d.id + 7*x.x + 11*y.y + 13) % 251) % 5
                                   <> 0
                          THEN (d.id + 7*x.x + 11*y.y + 13) % 251
                          ELSE (d.id + 3*x.x + 5*y.y) % 251 END AS v
              FROM dims d
              CROSS JOIN generate_series(0, 1) AS f(f)
              JOIN generate_series(0, 27) AS x(x) ON x.x < d.w
              JOIN generate_series(0, 27) AS y(y) ON y.y < d.h
            )
            SELECT id, CAST(f AS INT) AS frame_idx,
                   CAST(w AS INT) AS width, CAST(h AS INT) AS height,
                   CAST(3 * SUM(v) AS BIGINT) AS px_sum
            FROM px GROUP BY id, f, w, h
        """,
        "audio_features": """
            WITH ids AS (
              SELECT DISTINCT doc_id AS id FROM documents WHERE doc_id < 48
            ),
            p AS (
              SELECT id,
                     4000 + 2000*(id % 3) AS sample_rate,
                     1 + (id % 2) AS channels,
                     600 + 100*(id % 5) AS n_frames
              FROM ids
            ),
            wins AS (
              SELECT p.*, w.w AS win_idx
              FROM p JOIN generate_series(0, 3) AS w(w)
                ON w.w * 256 < p.n_frames
            ),
            s AS (
              SELECT wn.id, wn.sample_rate, wn.channels, wn.n_frames,
                     wn.win_idx,
                     LEAST(wn.n_frames, (wn.win_idx + 1) * 256)
                       - wn.win_idx * 256 AS win_frames,
                     ((wn.id*37 + j.j*17) % 2001 - 1000) AS v
              FROM wins wn
              JOIN generate_series(0, 1999) AS j(j)
                ON j.j >= wn.win_idx * 256 * wn.channels
               AND j.j < LEAST(wn.n_frames, (wn.win_idx + 1) * 256)
                           * wn.channels
            )
            SELECT id, CAST(sample_rate AS INT) AS sample_rate,
                   CAST(channels AS INT) AS channels,
                   CAST(n_frames AS BIGINT) AS n_frames,
                   CAST(n_frames * 1000 // sample_rate AS BIGINT) AS duration_ms,
                   CAST(win_idx AS INT) AS win_idx,
                   CAST(win_frames AS INT) AS win_frames,
                   CAST(SUM(v * v) AS BIGINT) AS win_sumsq
            FROM s
            GROUP BY id, sample_rate, channels, n_frames, win_idx, win_frames
        """,
        "audio_features_flac": """
            WITH ids AS (
              SELECT DISTINCT doc_id AS id FROM documents WHERE doc_id < 32
            ),
            p AS (
              SELECT id,
                     8000 + 4000*(id % 3) AS sample_rate,
                     1 + (id % 2) AS channels,
                     500 + 60*(id % 4) AS n_frames
              FROM ids
            ),
            wins AS (
              SELECT p.*, w.w AS win_idx
              FROM p JOIN generate_series(0, 5) AS w(w)
                ON w.w * 128 < p.n_frames
            ),
            s AS (
              SELECT wn.id, wn.sample_rate, wn.channels, wn.n_frames,
                     wn.win_idx,
                     LEAST(wn.n_frames, (wn.win_idx + 1) * 128)
                       - wn.win_idx * 128 AS win_frames,
                     ((wn.id*37 + j.j*17) % 2001 - 1000) AS v
              FROM wins wn
              JOIN generate_series(0, 1359) AS j(j)
                ON j.j >= wn.win_idx * 128 * wn.channels
               AND j.j < LEAST(wn.n_frames, (wn.win_idx + 1) * 128)
                           * wn.channels
            )
            SELECT id, CAST(sample_rate AS INT) AS sample_rate,
                   CAST(channels AS INT) AS channels,
                   CAST(n_frames AS BIGINT) AS n_frames,
                   CAST(n_frames * 1000 // sample_rate AS BIGINT) AS duration_ms,
                   CAST(win_idx AS INT) AS win_idx,
                   CAST(win_frames AS INT) AS win_frames,
                   CAST(SUM(v * v) AS BIGINT) AS win_sumsq
            FROM s
            GROUP BY id, sample_rate, channels, n_frames, win_idx, win_frames
        """,
        "audio_features_zcr": """
            WITH ids AS (
              SELECT DISTINCT doc_id AS id FROM documents WHERE doc_id < 48
            ),
            p AS (
              SELECT id,
                     1 + (id % 2) AS channels,
                     600 + 100*(id % 5) AS n_frames
              FROM ids
            ),
            wins AS (
              SELECT p.*, w.w AS win_idx,
                     LEAST(p.n_frames, (w.w + 1) * 256) - w.w * 256
                       AS win_frames
              FROM p JOIN generate_series(0, 3) AS w(w)
                ON w.w * 256 < p.n_frames
            ),
            tr AS (
              SELECT wn.id, wn.win_idx, wn.win_frames,
                     ((wn.id*37 + (f.f*wn.channels + c.c)*17) % 2001
                       - 1000) AS v,
                     ((wn.id*37 + ((f.f-1)*wn.channels + c.c)*17) % 2001
                       - 1000) AS vp
              FROM wins wn
              JOIN generate_series(1, 999) AS f(f)
                ON f.f > wn.win_idx * 256
               AND f.f < LEAST(wn.n_frames, (wn.win_idx + 1) * 256)
              JOIN generate_series(0, 1) AS c(c)
                ON c.c < wn.channels
            )
            SELECT id, CAST(win_idx AS INT) AS win_idx,
                   CAST(win_frames AS INT) AS win_frames,
                   CAST(SUM(CASE WHEN (v >= 0) <> (vp >= 0)
                            THEN 1 ELSE 0 END) AS INT) AS win_zcr
            FROM tr
            GROUP BY id, win_idx, win_frames
        """,
        "audio_features_g711": """
            WITH ids AS (
              SELECT DISTINCT doc_id AS id FROM documents WHERE doc_id < 48
            ),
            p AS (
              SELECT id, 600 + 100*(id % 5) AS n_frames FROM ids
            ),
            wins AS (
              SELECT p.*, w.w AS win_idx
              FROM p JOIN generate_series(0, 3) AS w(w)
                ON w.w * 256 < p.n_frames
            ),
            s AS (
              SELECT wn.id, wn.n_frames, wn.win_idx,
                     LEAST(wn.n_frames, (wn.win_idx + 1) * 256)
                       - wn.win_idx * 256 AS win_frames,
                     -- ITU G.711 table values for the eight planted
                     -- u-law codes 00/80/FF/9A/1A/D5/55/3C (spec-
                     -- pinned, independent of the engine's table)
                     CASE (wn.id*31 + j.j*13) % 8
                       WHEN 0 THEN -32124 WHEN 1 THEN 32124
                       WHEN 2 THEN 0      WHEN 3 THEN 10876
                       WHEN 4 THEN -10876 WHEN 5 THEN 716
                       WHEN 6 THEN -716   WHEN 7 THEN -2364
                     END AS v
              FROM wins wn
              JOIN generate_series(0, 999) AS j(j)
                ON j.j >= wn.win_idx * 256
               AND j.j < LEAST(wn.n_frames, (wn.win_idx + 1) * 256)
            )
            SELECT id, CAST(8000 AS INT) AS sample_rate,
                   CAST(1 AS INT) AS channels,
                   CAST(n_frames AS BIGINT) AS n_frames,
                   CAST(n_frames * 1000 // 8000 AS BIGINT) AS duration_ms,
                   CAST(win_idx AS INT) AS win_idx,
                   CAST(win_frames AS INT) AS win_frames,
                   CAST(SUM(v * v) AS BIGINT) AS win_sumsq
            FROM s
            GROUP BY id, n_frames, win_idx, win_frames
        """,
        "audio_features_float": """
            WITH ids AS (
              SELECT DISTINCT doc_id AS id FROM documents WHERE doc_id < 48
            ),
            p AS (
              SELECT id,
                     1 + (id % 2) AS channels,
                     500 + 100*(id % 4) AS n_frames
              FROM ids
            ),
            wins AS (
              SELECT p.*, w.w AS win_idx
              FROM p JOIN generate_series(0, 3) AS w(w)
                ON w.w * 256 < p.n_frames
            ),
            s AS (
              SELECT wn.id, wn.channels, wn.n_frames, wn.win_idx,
                     LEAST(wn.n_frames, (wn.win_idx + 1) * 256)
                       - wn.win_idx * 256 AS win_frames,
                     -- the planted float32 payload k/32767 decodes
                     -- back to exactly k (relative error < 2^-24)
                     ((wn.id*37 + j.j*17) % 2001 - 1000) AS v
              FROM wins wn
              JOIN generate_series(0, 1599) AS j(j)
                ON j.j >= wn.win_idx * 256 * wn.channels
               AND j.j < LEAST(wn.n_frames, (wn.win_idx + 1) * 256)
                           * wn.channels
            )
            SELECT id, CAST(22050 AS INT) AS sample_rate,
                   CAST(channels AS INT) AS channels,
                   CAST(n_frames AS BIGINT) AS n_frames,
                   CAST(n_frames * 1000 // 22050 AS BIGINT) AS duration_ms,
                   CAST(win_idx AS INT) AS win_idx,
                   CAST(win_frames AS INT) AS win_frames,
                   CAST(SUM(v * v) AS BIGINT) AS win_sumsq
            FROM s
            GROUP BY id, channels, n_frames, win_idx, win_frames
        """,
        "audio_features_adpcm": """
            WITH RECURSIVE ids AS (
              SELECT DISTINCT doc_id AS id FROM documents WHERE doc_id < 16
            ),
            -- the IMA quantizer step table, pinned from the published
            -- spec values (independent of the engine's numpy table)
            steps AS (
              SELECT t.i AS sidx, l.l[t.i + 1] AS step
              FROM (SELECT [7,8,9,10,11,12,13,14,16,17,19,21,23,25,28,
                            31,34,37,41,45,50,55,60,66,73,80,88,97,107,
                            118,130,143,157,173,190,209,230,253,279,307,
                            337,371,408,449,494,544,598,658,724,796,876,
                            963,1060,1166,1282,1411,1552,1707,1878,2066,
                            2272,2499,2749,3024,3327,3660,4026,4428,4871,
                            5358,5894,6484,7132,7845,8630,9493,10442,
                            11487,12635,13899,15289,16818,18500,20350,
                            22385,24623,27086,29794,32767] AS l) l,
                   generate_series(0, 88) AS t(i)
            ),
            -- replay the IMA expansion recurrence: sample 0 is the
            -- block-header predictor; nibble j yields sample j+1
            dec(id, j, pred, sidx) AS (
              SELECT id, 0, (id*211) % 1024 - 512, (id*11) % 89 FROM ids
              UNION ALL
              SELECT x.id, x.j + 1,
                     GREATEST(-32768, LEAST(32767, x.pred
                       + CASE WHEN x.nib >= 8 THEN -x.diff
                              ELSE x.diff END)),
                     GREATEST(0, LEAST(88, x.sidx
                       + CASE x.nib % 8 WHEN 4 THEN 2 WHEN 5 THEN 4
                              WHEN 6 THEN 6 WHEN 7 THEN 8
                              ELSE -1 END))
              FROM (
                SELECT d.id, d.j, d.pred, d.sidx,
                       (d.id*7 + d.j*5) % 16 AS nib,
                       (s.step // 8)
                         + CASE WHEN ((d.id*7 + d.j*5) % 16) % 8 >= 4
                                THEN s.step ELSE 0 END
                         + CASE WHEN ((d.id*7 + d.j*5) % 16) % 4 >= 2
                                THEN s.step // 2 ELSE 0 END
                         + CASE WHEN ((d.id*7 + d.j*5) % 16) % 2 = 1
                                THEN s.step // 4 ELSE 0 END AS diff
                FROM dec d JOIN steps s ON s.sidx = d.sidx
                WHERE d.j < 320
              ) x
            )
            SELECT id, CAST(8000 AS INT) AS sample_rate,
                   CAST(1 AS INT) AS channels,
                   CAST(321 AS BIGINT) AS n_frames,
                   CAST(40 AS BIGINT) AS duration_ms,
                   CAST(j // 64 AS INT) AS win_idx,
                   CAST(LEAST(321, (j // 64 + 1) * 64)
                        - (j // 64) * 64 AS INT) AS win_frames,
                   CAST(SUM(pred * pred) AS BIGINT) AS win_sumsq
            FROM dec
            GROUP BY id, j // 64
        """,
        "token_totals": """
            WITH n AS (
                SELECT COALESCE(CAST(lang AS VARCHAR), 'None') AS lang, doc_id,
                       len(list_filter(string_split(text, ' '), x -> x <> '')) AS n
                FROM documents
            )
            SELECT lang, CAST(SUM(n) AS BIGINT) AS count,
                   MIN(CASE WHEN n > 0 THEN doc_id END) AS first_seen
            FROM n GROUP BY lang HAVING SUM(n) > 0
        """,
        "uniq_limited": """
            WITH RECURSIVE o AS (
                SELECT event_id, user_id,
                       ROW_NUMBER() OVER (ORDER BY ts, event_id) AS rn
                FROM events WHERE event_id < 800
            ),
            sim AS (
                SELECT 0 AS rn, CAST([] AS BIGINT[]) AS q,
                       CAST(NULL AS BIGINT) AS kept
                UNION ALL
                SELECT e.rn,
                       CASE WHEN list_contains(s.q, e.user_id) THEN s.q
                            WHEN len(list_append(s.q, e.user_id)) > 5
                                 THEN list_append(s.q, e.user_id)[2:]
                            ELSE list_append(s.q, e.user_id) END,
                       CASE WHEN list_contains(s.q, e.user_id) THEN NULL
                            ELSE e.event_id END
                FROM sim s JOIN o e ON e.rn = s.rn + 1
            )
            SELECT o.event_id, o.user_id
            FROM sim JOIN o ON sim.kept = o.event_id
        """,
        "exchangerate": """
            WITH cur AS (
                SELECT c_custkey,
                       (['USD','EUR','GBP','JPY'])[CAST(c_nationkey % 4 + 1 AS INT)] AS currency
                FROM customer
            ),
            rates AS (
                SELECT 'USD' AS currency, 1.0 AS usd_rate
                UNION ALL SELECT 'EUR', 0.8625
                UNION ALL SELECT 'GBP', 0.784175
                UNION ALL SELECT 'JPY', 111.0525
            )
            SELECT c.c_custkey, c.currency,
                   CAST(ROUND(1.0 / r.usd_rate, 6) AS DOUBLE) AS exchangerate
            FROM cur c LEFT JOIN rates r USING (currency)
        """,
        "windowed_count": """
            SELECT date_trunc('hour', ts) AS window_start, event_type, COUNT(*) AS n
            FROM events GROUP BY 1, 2
        """,
        "session_windows": """
            WITH marked AS (
                SELECT user_id, ts,
                       CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                                 > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_sess
                FROM events
            ), grp AS (
                SELECT user_id, ts,
                       SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                           ROWS UNBOUNDED PRECEDING) AS sess_id
                FROM marked
            )
            SELECT user_id, MIN(ts) AS session_start,
                   MAX(ts) + INTERVAL 30 MINUTE AS session_end,
                   COUNT(*) AS n
            FROM grp GROUP BY user_id, sess_id
        """,
        "exact_dedupe": r"""
            SELECT doc_id, lang FROM documents
            WHERE doc_id IN (
                SELECT MIN(doc_id) FROM documents
                GROUP BY md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g')))
            )
        """,
        "token_count": r"""
            SELECT doc_id,
                   len(list_filter(string_split_regex(lower(text), '\s+'), t -> t <> '')) AS n_tokens
            FROM documents
        """,
        "lang_id": r"""
            WITH toks AS (
                SELECT doc_id,
                       list_filter(string_split_regex(lower(text), '\s+'), t -> t <> '') AS w
                FROM documents
            ), hits AS (
                SELECT doc_id,
                       len(list_filter(w, t -> t IN ('the','and','of','to','is'))) AS h_en,
                       len(list_filter(w, t -> t IN ('der','die','und','ist','nicht'))) AS h_de,
                       len(list_filter(w, t -> t IN ('le','la','et','est','les'))) AS h_fr,
                       len(list_filter(w, t -> t IN ('el','la','que','es','los'))) AS h_es
                FROM toks
            )
            SELECT doc_id,
                   CASE WHEN GREATEST(h_en, h_de, h_fr, h_es) = 0 THEN 'und'
                        WHEN h_fr >= h_es AND h_fr >= h_en AND h_fr >= h_de THEN 'fr'
                        WHEN h_es >= h_en AND h_es >= h_de THEN 'es'
                        WHEN h_en >= h_de THEN 'en'
                        ELSE 'de' END AS lang_pred
            FROM hits
        """,
        "quality": r"""
            SELECT doc_id,
                   ROUND(CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE)
                         / CASE WHEN length(text) > 0 THEN CAST(length(text) AS DOUBLE) ELSE 1.0 END, 6) AS alpha_ratio,
                   ROUND(CAST(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS DOUBLE)
                         / CASE WHEN length(text) > 0 THEN CAST(length(text) AS DOUBLE) ELSE 1.0 END, 6) AS punct_ratio
            FROM documents
        """,
        "fingerprint": r"""
            SELECT doc_id, md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fingerprint
            FROM documents
        """,
        "repetition_stats": r"""
            WITH t AS (
                SELECT doc_id,
                       list_filter(string_split(text, chr(10)), x -> x <> '') AS lns,
                       list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS toks
                FROM documents
            ), b AS (
                SELECT doc_id,
                       unnest(list_transform(range(1, len(toks)),
                                             i -> toks[i] || ' ' || toks[i+1])) AS bg
                FROM t WHERE len(toks) >= 2
            ), m AS (
                SELECT doc_id, max(cnt) AS top FROM (
                    SELECT doc_id, bg, count(*) AS cnt FROM b GROUP BY doc_id, bg
                ) GROUP BY doc_id
            )
            SELECT t.doc_id,
                   ROUND(CASE WHEN len(lns) > 0
                         THEN (len(lns) - len(list_distinct(lns))) / CAST(len(lns) AS DOUBLE)
                         ELSE 0.0 END, 6) AS dup_line_frac,
                   ROUND(CASE WHEN len(toks) > 0
                         THEN (len(toks) - len(list_distinct(toks))) / CAST(len(toks) AS DOUBLE)
                         ELSE 0.0 END, 6) AS dup_word_frac,
                   ROUND(CASE WHEN len(toks) >= 2
                         THEN LEAST(2.0 * m.top / len(toks), 1.0)
                         ELSE 0.0 END, 6) AS top_bigram_frac
            FROM t LEFT JOIN m ON t.doc_id = m.doc_id
        """,
        "pii_scrub": (
            r"""
            WITH t AS (
                SELECT doc_id, text || """ + _PII_SUFFIX_SQL + r""" AS text
                FROM documents
            )
            SELECT doc_id,
                   CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INT) AS n_email,
                   CAST(len(regexp_extract_all(text, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS INT) AS n_ipv4,
                   CAST(len(regexp_extract_all(text, '\+\d{1,3}[- ]\d{3}[- ]\d{3}[- ]\d{4}')) AS INT) AS n_phone,
                   md5(regexp_replace(regexp_replace(regexp_replace(text,
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                       '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IPV4>', 'g'),
                       '\+\d{1,3}[- ]\d{3}[- ]\d{3}[- ]\d{4}', '<PHONE>', 'g')) AS scrub_md5
            FROM t
        """),
        "c4_line_filter": (
            r"""
            WITH t AS (
                SELECT doc_id, """ + _PAGED_SQL + r""" AS text
                FROM documents
            ),
            l AS (
                SELECT doc_id,
                       list_filter(list_transform(
                           string_split(text, chr(10)), x -> trim(x)),
                           x -> x <> '') AS lines
                FROM t
            ),
            k AS (
                SELECT doc_id, lines,
                       list_filter(lines, x ->
                           len(list_filter(string_split_regex(x, '\s+'),
                                           w -> w <> '')) >= 5
                           AND regexp_matches(x, '[.!?"”]$')) AS kept
                FROM l
            )
            SELECT doc_id,
                   CAST(len(kept) AS INT) AS n_lines_kept,
                   CAST(len(lines) - len(kept) AS INT) AS n_lines_dropped,
                   md5(array_to_string(kept, chr(10))) AS clean_md5
            FROM k
        """),
        "c4_doc_filter": (
            r"""
            WITH t AS (
                SELECT doc_id, """ + _PAGED_SQL + r""" AS text
                FROM documents
            ),
            s AS (
                SELECT doc_id, text,
                       list_filter(string_split_regex(lower(text), '\s+'),
                                   x -> x <> '') AS toks,
                       list_filter(list_transform(
                           string_split(text, chr(10)), x -> trim(x)),
                           x -> x <> '') AS lines
                FROM t
            ),
            sig AS (
                SELECT doc_id,
                       CAST(len(toks) AS INT) AS n_words,
                       round(CASE WHEN len(toks) > 0 THEN
                           CAST(list_aggregate(list_transform(toks,
                               x -> length(x)), 'sum') AS DOUBLE) / len(toks)
                           ELSE 0.0 END, 6) AS mean_word_len,
                       CAST(len(regexp_extract_all(text, '[.!?]')) AS INT)
                           AS n_sentences,
                       contains(lower(text), 'lorem ipsum') AS has_lorem,
                       contains(text, '{') AS has_curly,
                       round(CASE WHEN len(lines) > 0 THEN
                           CAST(len(list_filter(lines,
                               x -> regexp_matches(x, '^[-*•]')))
                               AS DOUBLE) / len(lines)
                           ELSE 0.0 END, 6) AS bullet_line_frac,
                       round(CASE WHEN len(lines) > 0 THEN
                           CAST(len(list_filter(lines,
                               x -> regexp_matches(x, '(\.\.\.|…)$')))
                               AS DOUBLE) / len(lines)
                           ELSE 0.0 END, 6) AS ellipsis_line_frac
                FROM s
            )
            SELECT *,
                   (n_words >= 50 AND n_words <= 100000
                    AND mean_word_len >= 3.0 AND mean_word_len <= 10.0
                    AND n_sentences >= 3
                    AND NOT has_lorem AND NOT has_curly
                    AND bullet_line_frac <= 0.9
                    AND ellipsis_line_frac <= 0.3) AS keep
            FROM sig
        """),
        "line_dedupe": (
            r"""
            WITH t AS (
                SELECT doc_id, """ + _PAGED_SQL + r""" AS text
                FROM documents
            ),
            l AS (
                SELECT doc_id,
                       list_filter(list_transform(
                           string_split(text, chr(10)), x -> trim(x)),
                           x -> x <> '') AS lines
                FROM t
            ),
            e AS (
                SELECT doc_id, unnest(lines) AS line,
                       unnest(generate_series(1, len(lines))) AS pos
                FROM l
            ),
            freq AS (
                SELECT line FROM (
                    SELECT line, count(DISTINCT doc_id) AS df
                    FROM e GROUP BY line
                ) WHERE df >= 3
            ),
            kept AS (
                SELECT doc_id, pos, line FROM e
                WHERE line NOT IN (SELECT line FROM freq)
            ),
            reb AS (
                SELECT doc_id,
                       string_agg(line, chr(10) ORDER BY pos) AS clean,
                       count(*) AS n_kept
                FROM kept GROUP BY doc_id
            )
            SELECT l.doc_id,
                   md5(coalesce(reb.clean, '')) AS clean_md5,
                   CAST(coalesce(reb.n_kept, 0) AS BIGINT) AS n_kept,
                   CAST(len(l.lines) - coalesce(reb.n_kept, 0) AS BIGINT)
                       AS n_dropped
            FROM l LEFT JOIN reb ON l.doc_id = reb.doc_id
        """),
        # span_dedupe: independent recomputation of the ExactSubstr
        # fixed-window pass — 6-token windows via 1-based list_slice
        # (the engine uses a 0-based zip_with chain + xxhash64; the
        # oracle compares WINDOW TEXT directly, so a hash collision or
        # off-by-one in either formulation mismatches), document
        # frequency over distinct docs, covered-position suppression
        # via NOT EXISTS, ordered string_agg rebuild.
        "span_dedupe": (
            r"""
            WITH t AS (
                SELECT doc_id, """ + _PAGED_SQL + r""" AS text
                FROM documents
            ),
            tok AS (
                SELECT doc_id,
                       list_filter(string_split_regex(
                           coalesce(text, ''), '\s+'), x -> x <> '')
                           AS toks
                FROM t
            ),
            win AS (
                SELECT doc_id, pos,
                       array_to_string(
                           list_slice(toks, pos, pos + 5), ' ') AS w
                FROM (
                    SELECT doc_id, toks,
                           unnest(generate_series(
                               1, greatest(len(toks) - 5, 0))) AS pos
                    FROM tok
                )
            ),
            freq AS (
                SELECT w FROM (
                    SELECT w, count(DISTINCT doc_id) AS df
                    FROM win GROUP BY w
                ) WHERE df >= 3
            ),
            hits AS (
                SELECT doc_id, pos FROM win
                WHERE w IN (SELECT w FROM freq)
            ),
            tp AS (
                SELECT doc_id, unnest(toks) AS tok,
                       unnest(generate_series(1, len(toks))) AS i
                FROM tok
            ),
            kept AS (
                SELECT tp.doc_id, tp.tok, tp.i FROM tp
                WHERE NOT EXISTS (
                    SELECT 1 FROM hits h
                    WHERE h.doc_id = tp.doc_id
                      AND h.pos <= tp.i AND tp.i < h.pos + 6
                )
            ),
            reb AS (
                SELECT doc_id,
                       string_agg(tok, ' ' ORDER BY i) AS clean,
                       count(*) AS n_kept
                FROM kept GROUP BY doc_id
            )
            SELECT tok.doc_id,
                   md5(coalesce(reb.clean, '')) AS clean_md5,
                   CAST(coalesce(reb.n_kept, 0) AS BIGINT) AS n_kept,
                   CAST(len(tok.toks) - coalesce(reb.n_kept, 0)
                        AS BIGINT) AS n_dropped
            FROM tok LEFT JOIN reb ON tok.doc_id = reb.doc_id
        """),
        # lm_score: full independent retrain + rescore of the
        # stupid-backoff bigram LM — reference-slice unigram/bigram
        # counts, min_count=2 pruning, the identical
        # floor(ln(p)*1000 + 0.5) milli-nat quantization (exact
        # BIGINT sums on both sides), backoff precedence
        # bigram → unigram → OOV floor, and the integer keep gate.
        "lm_score": (
            r"""
            WITH pages AS (
                SELECT doc_id, """ + _PAGED_SQL + r""" AS text
                FROM documents
            ),
            tok AS (
                SELECT doc_id,
                       list_filter(string_split_regex(
                           lower(coalesce(text, '')), '\s+'),
                           t -> t <> '') AS toks
                FROM pages
            ),
            refu AS (
                SELECT unnest(toks) AS w FROM tok WHERE doc_id % 7 = 1
            ),
            unic AS (SELECT w, count(*) AS c1 FROM refu GROUP BY w),
            tot AS (SELECT CAST(sum(c1) AS DOUBLE) AS t FROM unic),
            refb AS (
                SELECT unnest(list_transform(range(1, len(toks)),
                    i -> {'bg': toks[i] || ' ' || toks[i+1],
                          'w1': toks[i]})) AS b
                FROM tok WHERE doc_id % 7 = 1
            ),
            bic AS (
                SELECT b.bg AS bg, b.w1 AS w1, count(*) AS c2
                FROM refb GROUP BY 1, 2
                HAVING count(*) >= 2
            ),
            bilm AS (
                SELECT bg, CAST(floor(ln(CAST(c2 AS DOUBLE) / c1)
                    * 1000.0 + 0.5) AS BIGINT) AS lp
                FROM bic JOIN unic ON bic.w1 = unic.w
            ),
            unilm AS (
                SELECT w, CAST(floor((ln(0.4) + ln(c1 / t))
                    * 1000.0 + 0.5) AS BIGINT) AS bo
                FROM unic, tot
            ),
            cb AS (
                SELECT doc_id, unnest(list_transform(range(1, len(toks)),
                    i -> {'bg': toks[i] || ' ' || toks[i+1],
                          'w2': toks[i+1]})) AS b
                FROM tok
            ),
            scored AS (
                SELECT cb.doc_id,
                       coalesce(lp, bo, CAST(floor((ln(0.4) + ln(1.0 / t))
                           * 1000.0 + 0.5) AS BIGINT)) AS s,
                       (lp IS NOT NULL) AS hit,
                       (lp IS NULL AND bo IS NOT NULL) AS bko
                FROM cb
                LEFT JOIN bilm ON cb.b.bg = bilm.bg
                LEFT JOIN unilm ON cb.b.w2 = unilm.w, tot
            ),
            agg AS (
                SELECT doc_id, count(*) AS n_scored,
                       sum(CASE WHEN hit THEN 1 ELSE 0 END) AS n_hits,
                       sum(CASE WHEN bko THEN 1 ELSE 0 END) AS n_backoff,
                       sum(CASE WHEN hit OR bko THEN 0 ELSE 1 END) AS n_oov,
                       sum(s) AS logprob_milli
                FROM scored GROUP BY doc_id
            )
            SELECT p.doc_id,
                   CAST(coalesce(n_scored, 0) AS BIGINT) AS n_scored,
                   CAST(coalesce(n_hits, 0) AS BIGINT) AS n_hits,
                   CAST(coalesce(n_backoff, 0) AS BIGINT) AS n_backoff,
                   CAST(coalesce(n_oov, 0) AS BIGINT) AS n_oov,
                   CAST(coalesce(logprob_milli, 0) AS BIGINT)
                       AS logprob_milli,
                   (coalesce(n_scored, 0) > 0
                    AND coalesce(logprob_milli, 0)
                        >= -2000 * coalesce(n_scored, 0)) AS keep
            FROM pages p LEFT JOIN agg USING (doc_id)
        """),
        # dsir_select: full refit + replay — hashed n-gram buckets
        # (packing.py's '0x'||md5-prefix bridge), Laplace log-ratios
        # in the operator's exact operand order, 0.5-offset md5
        # uniform -> Gumbel, top-150 with the doc_id tiebreak.
        "dsir_select": (
            r"""
            WITH tok AS (
                SELECT doc_id, lang,
                       list_filter(string_split_regex(
                           lower(coalesce(text, '')), '\s+'),
                           t -> t <> '') AS toks
                FROM documents
            ),
            feats AS (
                SELECT doc_id, unnest(list_concat(
                    list_transform(toks, w ->
                        CAST(('0x' || substr(md5(w), 1, 8))::UBIGINT
                             % 512 AS BIGINT)),
                    list_transform(range(1, len(toks)), i ->
                        CAST(('0x' || substr(md5(toks[i] || ' ' ||
                             toks[i+1]), 1, 8))::UBIGINT
                             % 512 AS BIGINT))
                )) AS bucket
                FROM tok
            ),
            tc AS (
                SELECT bucket, count(*) AS c FROM feats
                JOIN tok USING (doc_id) WHERE lang = 'en' GROUP BY 1
            ),
            rc AS (SELECT bucket, count(*) AS c FROM feats GROUP BY 1),
            tot AS (
                SELECT (SELECT CAST(sum(c) AS DOUBLE) FROM tc) AS tt,
                       (SELECT CAST(sum(c) AS DOUBLE) FROM rc) AS rt
            ),
            lr AS (
                SELECT coalesce(tc.bucket, rc.bucket) AS bucket,
                       CAST(floor((ln(coalesce(tc.c, 0) + 1.0)
                           - ln(coalesce(rc.c, 0) + 1.0)
                           + ln(rt + 512.0) - ln(tt + 512.0))
                           * 1000.0 + 0.5) AS BIGINT) AS lrm
                FROM tc FULL JOIN rc ON tc.bucket = rc.bucket, tot
            ),
            dflt AS (
                SELECT CAST(floor((ln(0 + 1.0) - ln(0 + 1.0)
                    + ln(rt + 512.0) - ln(tt + 512.0))
                    * 1000.0 + 0.5) AS BIGINT) AS v
                FROM tot
            ),
            scored AS (
                SELECT t.doc_id,
                       CAST(count(f.bucket) AS BIGINT) AS n_feats,
                       CAST(coalesce(sum(coalesce(lr.lrm,
                           (SELECT v FROM dflt))), 0) AS BIGINT)
                           AS logw_milli
                FROM tok t
                LEFT JOIN feats f USING (doc_id)
                LEFT JOIN lr ON f.bucket = lr.bucket
                GROUP BY t.doc_id
            ),
            noised AS (
                SELECT doc_id, n_feats, logw_milli,
                       CAST(floor(-ln(-ln(
                           (('0x' || substr(md5('dsir:' ||
                               CAST(doc_id AS VARCHAR)), 1, 12))
                               ::UBIGINT + 0.5) / 281474976710656.0))
                           * 1000.0 + 0.5) AS BIGINT) AS gumbel_milli
                FROM scored
            )
            SELECT doc_id, n_feats, logw_milli, gumbel_milli,
                   logw_milli + gumbel_milli AS key_milli
            FROM noised
            ORDER BY key_milli DESC, doc_id
            LIMIT 150
        """),
        # stratified_sample: replay of the engine-independent
        # md5('s42:' || doc_id) per-group rank with a plain window.
        "stratified_sample": (
            r"""
            SELECT doc_id, source, sample_rank FROM (
                SELECT doc_id, source,
                       row_number() OVER (
                           PARTITION BY source
                           ORDER BY md5('s42:' || CAST(doc_id AS VARCHAR))
                       ) AS sample_rank
                FROM documents
            ) WHERE sample_rank <= 5
        """),
        # mixture_resample: per-language copy counts recomputed from
        # the same integer-epoch + md5-threshold rule (thresholds are
        # the shared frac_threshold_hex literals), copies materialized
        # by range unnest (empty range drops the row, like posexplode).
        "mixture_resample": (
            r"""
            WITH base AS (
                SELECT doc_id, lang,
                       CASE lang WHEN 'en' THEN 2 WHEN 'es' THEN 3
                                 WHEN 'fr' THEN 1 ELSE 0 END
                       + CASE
                           WHEN lang = 'en' AND md5('mix:' ||
                               CAST(doc_id AS VARCHAR)) < '"""
            + _frac_hex(0.5) + r"""' THEN 1
                           WHEN lang = 'es' AND md5('mix:' ||
                               CAST(doc_id AS VARCHAR)) < '"""
            + _frac_hex(0.25) + r"""' THEN 1
                           WHEN lang = 'de' AND md5('mix:' ||
                               CAST(doc_id AS VARCHAR)) < '"""
            + _frac_hex(0.4) + r"""' THEN 1
                           ELSE 0
                         END AS n
                FROM documents
            )
            SELECT doc_id, lang,
                   unnest(range(1, n + 1)) AS copy_id
            FROM base
        """),
        "corpus_pipeline": (
            r"""
            WITH t AS (
                SELECT doc_id, """ + _PAGED_SQL + r""" AS text
                FROM documents
            ),
            l0 AS (
                SELECT doc_id,
                       list_filter(list_transform(
                           string_split(text, chr(10)), x -> trim(x)),
                           x -> x <> '') AS lines
                FROM t
            ),
            k0 AS (
                SELECT doc_id,
                       list_filter(lines, x ->
                           len(list_filter(string_split_regex(x, '\s+'),
                                           w -> w <> '')) >= 5
                           AND regexp_matches(x, '[.!?"”]$')) AS lines
                FROM l0
            ),
            e AS (
                SELECT doc_id, unnest(lines) AS line,
                       unnest(generate_series(1, len(lines))) AS pos
                FROM k0
            ),
            freq AS (
                SELECT line FROM (
                    SELECT line, count(DISTINCT doc_id) AS df
                    FROM e GROUP BY line
                ) WHERE df >= 3
            ),
            kept AS (
                SELECT doc_id, pos, line FROM e
                WHERE line NOT IN (SELECT line FROM freq)
            ),
            reb AS (
                SELECT doc_id,
                       string_agg(line, chr(10) ORDER BY pos) AS clean,
                       count(*) AS n_kept
                FROM kept GROUP BY doc_id
            ),
            j AS (
                SELECT k0.doc_id,
                       coalesce(reb.clean, '') AS text,
                       CAST(coalesce(reb.n_kept, 0) AS BIGINT) AS n_kept,
                       CAST(len(k0.lines) - coalesce(reb.n_kept, 0)
                            AS BIGINT) AS n_dropped
                FROM k0 LEFT JOIN reb ON k0.doc_id = reb.doc_id
            ),
            s AS (
                SELECT doc_id, text, n_kept, n_dropped,
                       list_filter(string_split_regex(lower(text), '\s+'),
                                   x -> x <> '') AS toks,
                       list_filter(list_transform(
                           string_split(text, chr(10)), x -> trim(x)),
                           x -> x <> '') AS lines
                FROM j
            ),
            sig AS (
                SELECT doc_id, n_kept, n_dropped, text,
                       CAST(len(toks) AS INT) AS n_words,
                       CASE WHEN len(toks) > 0 THEN
                           round(CAST(list_aggregate(list_transform(toks,
                               x -> length(x)), 'sum') AS DOUBLE)
                               / len(toks), 6)
                           ELSE 0.0 END AS mean_word_len,
                       CAST(len(regexp_extract_all(text, '[.!?]')) AS INT)
                           AS n_sentences,
                       contains(lower(text), 'lorem ipsum') AS has_lorem,
                       contains(text, '{') AS has_curly,
                       CASE WHEN len(lines) > 0 THEN
                           CAST(len(list_filter(lines,
                               x -> regexp_matches(x, '^[-*•]')))
                               AS DOUBLE) / len(lines)
                           ELSE 0.0 END AS bullet_line_frac,
                       CASE WHEN len(lines) > 0 THEN
                           CAST(len(list_filter(lines,
                               x -> regexp_matches(x, '(\.\.\.|…)$')))
                               AS DOUBLE) / len(lines)
                           ELSE 0.0 END AS ellipsis_line_frac
                FROM s
            )
            SELECT doc_id, n_kept, n_dropped, n_words, n_sentences,
                   (n_words >= 50 AND n_words <= 100000
                    AND mean_word_len >= 3.0 AND mean_word_len <= 10.0
                    AND n_sentences >= 3
                    AND NOT has_lorem AND NOT has_curly
                    AND bullet_line_frac <= 0.9
                    AND ellipsis_line_frac <= 0.3) AS keep,
                   md5(text) AS clean_md5
            FROM sig
        """),
        "ngram_contamination": r"""
            WITH dt AS (
                SELECT doc_id,
                       list_filter(string_split_regex(lower(text), '\s+'),
                                   x -> x <> '') AS toks
                FROM documents
            ),
            bg AS (
                SELECT DISTINCT doc_id AS bench_id,
                       array_to_string(toks[1:13], ' ') AS g
                FROM dt WHERE doc_id % 10 = 3 AND len(toks) >= 13
            ),
            dg AS (
                SELECT DISTINCT doc_id, g FROM (
                    SELECT doc_id,
                           unnest(list_transform(
                               generate_series(1, greatest(len(toks) - 12, 0)),
                               i -> array_to_string(toks[i:i+12], ' '))) AS g
                    FROM dt
                )
            )
            SELECT dg.doc_id, bg.bench_id,
                   CAST(count(*) AS BIGINT) AS n_matched
            FROM dg JOIN bg ON dg.g = bg.g
            GROUP BY dg.doc_id, bg.bench_id
        """,
        "crawl_pipeline": (
            r"""
            WITH t AS (
                SELECT doc_id, """ + _CRAWL_TEXT_SQL + r""" AS text
                FROM documents WHERE doc_id < 300
            ),
            s AS (
                SELECT doc_id, text,
                       list_filter(string_split_regex(lower(text), '\s+'),
                                   x -> x <> '') AS toks
                FROM t
            ),
            sig AS (
                SELECT doc_id, md5(text) AS clean_md5,
                       CAST(len(toks) AS INT) AS n_words,
                       round(CAST(list_aggregate(list_transform(toks,
                           x -> length(x)), 'sum') AS DOUBLE)
                           / len(toks), 6) AS mean_word_len,
                       CAST(len(regexp_extract_all(text, '[.!?]')) AS INT)
                           AS n_sentences
                FROM s
            )
            SELECT doc_id, clean_md5, n_words, n_sentences,
                   (n_words >= 50 AND n_words <= 100000
                    AND mean_word_len >= 3.0 AND mean_word_len <= 10.0
                    AND n_sentences >= 3) AS keep
            FROM sig
        """),
        "stream_corpus_batch": (
            r"""
            WITH t AS (
                -- URL-gate survival: the planted url passes (host not
                -- on a blocked residue class), OR the doc recurs at
                -- the never-blocked mirror (doc_id % 5 = 0); the
                -- dedupe then collapses mirror pairs, so survivors
                -- contribute exactly one content row each
                SELECT doc_id, """ + _CRAWL_TEXT_SQL + r""" AS text
                FROM documents
                WHERE doc_id < 200
                  AND (NOT (doc_id % 7 IN (0, 1, 2)) OR doc_id % 5 = 0)
            ),
            s AS (
                SELECT text,
                       list_filter(string_split_regex(lower(text), '\s+'),
                                   x -> x <> '') AS toks
                FROM t
            ),
            sig AS (
                SELECT md5(text) AS clean_md5,
                       -- the ENGINE's dedupe key: md5 of NORMALIZED
                       -- text (lower + collapsed whitespace + trim,
                       -- operators/dedupe.py:_norm) — dedupe on the
                       -- same key the engine uses, not raw md5
                       md5(trim(regexp_replace(lower(text), '\s+', ' ',
                           'g'))) AS norm_md5,
                       CAST(len(toks) AS INT) AS n_words,
                       round(CAST(list_aggregate(list_transform(toks,
                           x -> length(x)), 'sum') AS DOUBLE)
                           / len(toks), 6) AS mean_word_len,
                       CAST(len(regexp_extract_all(text, '[.!?]')) AS INT)
                           AS n_sentences
                FROM s
            )
            -- one row per NORM key; min() == the engine's arbitrary
            -- pick because every member of a norm group here is
            -- byte-identical (mirror copies), so the output columns
            -- are group-homogeneous — the invariant a fixture change
            -- must preserve (or drop clean_md5 from the projection)
            SELECT min(clean_md5) AS clean_md5,
                   min(n_words) AS n_words,
                   min(n_sentences) AS n_sentences
            FROM sig
            WHERE n_words >= 50 AND n_words <= 100000
              AND mean_word_len >= 3.0 AND mean_word_len <= 10.0
              AND n_sentences >= 3
            GROUP BY norm_md5
        """),
        "host_stats": (
            r"""
            WITH t AS (
                SELECT doc_id, """ + _URL_SQL + r""" AS url,
                       """ + _CRAWL_TEXT_SQL + r""" AS text
                FROM documents
            ),
            h AS (
                SELECT doc_id, text,
                       lower(coalesce(regexp_extract(url,
                           '^[a-z][a-z0-9+.-]*://([^/:?#]+)', 1), ''))
                           AS host,
                       list_filter(string_split_regex(lower(text), '\s+'),
                                   x -> x <> '') AS toks,
                       list_filter(list_transform(
                           string_split(text, chr(10)), x -> trim(x)),
                           x -> x <> '') AS lines
                FROM t
            ),
            sig AS (
                SELECT host, text,
                       len(toks) AS n_words,
                       round(CAST(list_aggregate(list_transform(toks,
                           x -> length(x)), 'sum') AS DOUBLE)
                           / len(toks), 6) AS mean_word_len,
                       len(regexp_extract_all(text, '[.!?]')) AS n_sentences,
                       contains(lower(text), 'lorem ipsum') AS has_lorem,
                       contains(text, '{') AS has_curly,
                       CASE WHEN len(lines) > 0 THEN
                           CAST(len(list_filter(lines,
                               x -> regexp_matches(x, '^[-*•]')))
                               AS DOUBLE) / len(lines)
                           ELSE 0.0 END AS bullet_line_frac,
                       CASE WHEN len(lines) > 0 THEN
                           CAST(len(list_filter(lines,
                               x -> regexp_matches(x, '(\.\.\.|…)$')))
                               AS DOUBLE) / len(lines)
                           ELSE 0.0 END AS ellipsis_line_frac
                FROM h
            )
            SELECT host, CAST(count(*) AS BIGINT) AS n_docs,
                   round(AVG(length(text)), 6) AS mean_len,
                   CAST(SUM(CASE WHEN n_words >= 50 AND n_words <= 100000
                        AND mean_word_len >= 3.0 AND mean_word_len <= 10.0
                        AND n_sentences >= 3
                        AND NOT has_lorem AND NOT has_curly
                        AND bullet_line_frac <= 0.9
                        AND ellipsis_line_frac <= 0.3
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_keep
            FROM sig GROUP BY host
        """),
        "neardup_clusters": """
            SELECT doc_id,
                   CASE WHEN doc_id < 256 THEN (doc_id // 8) * 8
                        ELSE doc_id END AS component,
                   (doc_id >= 256 OR doc_id % 8 = 0) AS keep
            FROM documents WHERE doc_id < 300
        """,
        "pack_sequences": r"""
            WITH d AS (
                SELECT doc_id, CAST(doc_id % 8 AS INT) AS shard,
                       list_filter(string_split_regex(lower(text), '\s+'),
                                   x -> x <> '') AS toks
                FROM documents
            ),
            tok AS (
                SELECT doc_id, shard,
                       unnest(generate_series(1, len(toks))) AS wpos,
                       unnest(list_transform(toks, w ->
                           CAST(('0x' || substr(md5(w), 1, 8))::UBIGINT
                                % 32767 + 1 AS BIGINT))) AS id
                FROM d
                UNION ALL
                SELECT doc_id, shard, 2147483647 AS wpos,
                       CAST(0 AS BIGINT) AS id
                FROM d
            ),
            pos AS (
                SELECT shard, id,
                       row_number() OVER (PARTITION BY shard
                                          ORDER BY doc_id, wpos) - 1 AS p
                FROM tok
            )
            SELECT shard, CAST(p // 128 AS BIGINT) AS seq_idx,
                   CAST(count(*) AS INT) AS n_tokens,
                   md5(string_agg(CAST(id AS STRING), ',' ORDER BY p))
                       AS seq_md5
            FROM pos
            GROUP BY shard, p // 128
        """,
        "main_content": """
            SELECT doc_id, md5(text) AS main_md5,
                   'div' AS main_tag,
                   CAST(length(text) AS INT) AS text_len,
                   0.0 AS link_density
            FROM documents
        """,
        "url_filter": (
            r"""
            WITH t AS (
                SELECT doc_id, """ + _URL_SQL + r""" AS url
                FROM documents
            ),
            h AS (
                SELECT doc_id, url,
                       lower(coalesce(regexp_extract(url,
                           '^[a-z][a-z0-9+.-]*://([^/:?#]+)', 1), ''))
                           AS host
                FROM t
            )
            SELECT doc_id, url, host,
                   (host <> ''
                    AND NOT (host = 'spam-site.com'
                             OR host LIKE '%.spam-site.com'
                             OR host = 'tracker.net'
                             OR host LIKE '%.tracker.net'
                             OR regexp_matches(url, '[?&]sessionid=')))
                       AS keep
            FROM h
        """),
        # sitemap_urls: shared block/field regex replay + the entity
        # replace chain in the operator's exact order + TRY_CAST
        "sitemap_urls": (
            r"""
            WITH hosts AS (
                SELECT DISTINCT CAST(doc_id % 4 AS INT) AS hid
                FROM documents
            ),
            sm AS (
                SELECT 'h' || CAST(hid AS STRING) || '.ex.com' AS host,
                       """ + _SITEMAP_XML_SQL + r""" AS content
                FROM hosts
            ),
            ub AS (
                SELECT host, unnest(regexp_extract_all(content,
                    '<url>([\s\S]*?)</url>', 1)) AS b
                FROM sm
            ),
            sb AS (
                SELECT host, unnest(regexp_extract_all(content,
                    '<sitemap>([\s\S]*?)</sitemap>', 1)) AS b
                FROM sm
            ),
            allb AS (
                SELECT host, 'url' AS kind, b FROM ub
                UNION ALL
                SELECT host, 'sitemap' AS kind, b FROM sb
            ),
            f AS (
                SELECT host, kind,
                    replace(replace(replace(replace(replace(
                        regexp_extract(b,
                            '<loc>\s*([\s\S]*?)\s*</loc>', 1),
                        '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
                        '&apos;', ''''), '&amp;', '&') AS loc,
                    nullif(regexp_extract(b,
                        '<lastmod>\s*([\s\S]*?)\s*</lastmod>', 1), '')
                        AS lastmod,
                    nullif(regexp_extract(b,
                        '<changefreq>\s*([\s\S]*?)\s*</changefreq>',
                        1), '') AS changefreq,
                    TRY_CAST(nullif(regexp_extract(b,
                        '<priority>\s*([\s\S]*?)\s*</priority>', 1),
                        '') AS DOUBLE) AS priority
                FROM allb
            )
            SELECT host, kind, loc, lastmod, changefreq, priority
            FROM f WHERE loc <> ''
        """),
        # extract_links / link_hostgraph: shared anchor regex through
        # parallel regexp_extract_all passes (DuckDB needs explicit
        # 'g' flags on the cleanup regexp_replace; Spark replaces
        # globally by default), every resolution case, host edges
        "extract_links": (
            r"""
            WITH d AS (
                SELECT doc_id, """ + _LINKS_URL_SQL + r""" AS url,
                       """ + _LINKS_HTML_SQL + r""" AS html
                FROM documents
            ),
            ex AS (
                SELECT doc_id, url,
                    regexp_extract_all(html,
                        '<a\s[^>]*href\s*=\s*"([^"]*)"[^>]*>([\s\S]*?)</a>',
                        1) AS hrefs,
                    regexp_extract_all(html,
                        '<a\s[^>]*href\s*=\s*"([^"]*)"[^>]*>([\s\S]*?)</a>',
                        2) AS texts
                FROM d
            ),
            z AS (
                SELECT doc_id, url, unnest(hrefs) AS href,
                       unnest(texts) AS t
                FROM ex
            )
            SELECT doc_id, url, href,
                trim(regexp_replace(regexp_replace(t,
                    '<[^>]*>', '', 'g'), '\s+', ' ', 'g')) AS anchor,
                CASE WHEN regexp_matches(href, '^[Hh][Tt][Tt][Pp][Ss]?://')
                     THEN href
                     WHEN starts_with(href, '//')
                     THEN lower(regexp_extract(url,
                        '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) || ':' || href
                     WHEN starts_with(href, '/')
                     THEN lower(regexp_extract(url,
                        '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) || '://' ||
                        lower(coalesce(regexp_extract(url,
                            '^[a-z][a-z0-9+.-]*://([^/:?#]+)', 1), ''))
                        || href
                     ELSE NULL END AS resolved
            FROM z
        """),
        "link_hostgraph": (
            r"""
            WITH d AS (
                SELECT doc_id, """ + _LINKS_URL_SQL + r""" AS url,
                       """ + _LINKS_HTML_SQL + r""" AS html
                FROM documents
            ),
            ex AS (
                SELECT doc_id, url,
                    regexp_extract_all(html,
                        '<a\s[^>]*href\s*=\s*"([^"]*)"[^>]*>([\s\S]*?)</a>',
                        1) AS hrefs
                FROM d
            ),
            z AS (
                SELECT doc_id, url, unnest(hrefs) AS href FROM ex
            ),
            r AS (
                SELECT url,
                    CASE WHEN regexp_matches(href,
                            '^[Hh][Tt][Tt][Pp][Ss]?://') THEN href
                         WHEN starts_with(href, '//')
                         THEN lower(regexp_extract(url,
                            '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) || ':'
                            || href
                         WHEN starts_with(href, '/')
                         THEN lower(regexp_extract(url,
                            '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) || '://'
                            || lower(coalesce(regexp_extract(url,
                                '^[a-z][a-z0-9+.-]*://([^/:?#]+)', 1),
                                '')) || href
                         ELSE NULL END AS resolved
                FROM z
            )
            SELECT lower(coalesce(regexp_extract(url,
                       '^[a-z][a-z0-9+.-]*://([^/:?#]+)', 1), ''))
                       AS src_host,
                   lower(coalesce(regexp_extract(resolved,
                       '^[a-z][a-z0-9+.-]*://([^/:?#]+)', 1), ''))
                       AS dst_host,
                   count(*) AS n_links
            FROM r WHERE resolved IS NOT NULL
            GROUP BY 1, 2
        """),
        # frontier_pipeline: the ENTIRE composed stage recomputed —
        # normalization replay, full robots parse + gate on the
        # NORMALIZED url, and the blocklist
        "frontier_pipeline": (
            r"""
            WITH u AS (
                SELECT doc_id, """ + _FRONTIER_URL_SQL + r""" AS url
                FROM documents
            ),
            uparts AS (
                SELECT doc_id, url,
                    lower(regexp_extract(url,
                        '^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)',
                        1)) AS scheme,
                    lower(regexp_extract(url,
                        '^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)',
                        2)) AS auth,
                    regexp_extract(url,
                        '^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)',
                        3) AS path,
                    regexp_extract(url, '\?([^#]*)', 1) AS qs
                FROM u
            ),
            ufixed AS (
                SELECT doc_id, url, scheme,
                    CASE WHEN scheme = 'http' AND auth LIKE '%:80'
                         THEN substr(auth, 1, length(auth) - 3)
                         WHEN scheme = 'https' AND auth LIKE '%:443'
                         THEN substr(auth, 1, length(auth) - 4)
                         ELSE auth END AS auth,
                    CASE WHEN path = '' THEN '/' ELSE path END AS path,
                    list_sort(list_filter(string_split(qs, '&'),
                        p -> p <> ''
                             AND NOT starts_with(lower(p), 'utm_')
                             AND NOT starts_with(lower(p), 'fbclid')
                             AND NOT starts_with(lower(p), 'gclid')
                             AND NOT starts_with(lower(p), 'msclkid')
                             AND NOT starts_with(lower(p), 'sessionid')
                             AND NOT starts_with(lower(p), 'phpsessid')
                    )) AS kept
                FROM uparts
            ),
            normed AS (
                SELECT doc_id,
                   CASE WHEN scheme = '' THEN url
                        ELSE scheme || '://' || auth || path ||
                            CASE WHEN len(kept) > 0
                                 THEN '?' || list_aggr(kept,
                                     'string_agg', '&')
                                 ELSE '' END
                   END AS norm_url
                FROM ufixed
            ),
            hosts AS (
                SELECT DISTINCT CAST(doc_id % 4 AS INT) AS hid
                FROM documents
            ),
            robots AS (
                SELECT 'h' || CAST(hid AS STRING) || '.ex.com' AS host,
                       """ + _ROBOTS_TXT_SQL + r""" AS content
                FROM hosts
            ),
            lines AS (
                SELECT host,
                       unnest(generate_series(1, len(ls))) AS pos,
                       unnest(ls) AS line
                FROM (SELECT host, string_split(content, chr(10)) AS ls
                      FROM robots)
            ),
            dirs AS (
                SELECT host, pos,
                    lower(regexp_extract(
                        trim(regexp_replace(line, '#.*$', '')),
                        '^([A-Za-z\-]+)\s*:', 1)) AS k,
                    trim(regexp_extract(
                        trim(regexp_replace(line, '#.*$', '')),
                        '^[A-Za-z\-]+\s*:\s*(.*)$', 1)) AS v
                FROM lines
            ),
            dd AS (
                SELECT * FROM dirs
                WHERE k IN ('user-agent', 'allow', 'disallow')
            ),
            flagged AS (
                SELECT *, CASE WHEN k = 'user-agent'
                        AND coalesce(lag(k = 'user-agent') OVER (
                            PARTITION BY host ORDER BY pos), false)
                            = false
                        THEN 1 ELSE 0 END AS strt
                FROM dd
            ),
            grpd AS (
                SELECT *, sum(strt) OVER (
                        PARTITION BY host ORDER BY pos
                        ROWS UNBOUNDED PRECEDING) AS grp
                FROM flagged
            ),
            agents AS (
                SELECT DISTINCT host, grp, lower(v) AS agent
                FROM grpd WHERE k = 'user-agent'
            ),
            rls AS (
                SELECT host, grp, k AS rule, v AS path, pos
                FROM grpd WHERE k <> 'user-agent' AND v <> ''
            ),
            rules AS (
                SELECT r.host, a.agent, r.rule, r.path, r.pos
                FROM rls r JOIN agents a
                ON r.host = a.host AND r.grp = a.grp
            ),
            hasex AS (
                SELECT DISTINCT host FROM rules WHERE agent = 'mybot'
            ),
            app AS (
                SELECT rules.* FROM rules
                LEFT JOIN hasex ON rules.host = hasex.host
                WHERE agent = 'mybot'
                   OR (agent = '*' AND hasex.host IS NULL)
            ),
            pat AS (
                SELECT host, rule, path, pos,
                    CASE WHEN path LIKE '%$'
                         THEN substr(path, 1, length(path) - 1)
                         ELSE path END AS body,
                    (path LIKE '%$') AS anch
                FROM app
            ),
            pat2 AS (
                SELECT host, rule, path, pos, length(body) AS spec,
                    replace(replace(replace(replace(body,
                        '\', '\\'), '%', '\%'), '_', '\_'), '*', '%')
                        || CASE WHEN anch THEN '' ELSE '%' END
                        AS likepat
                FROM pat
            ),
            u2 AS (
                SELECT doc_id, norm_url,
                    lower(coalesce(regexp_extract(norm_url,
                        '^[a-z][a-z0-9+.-]*://([^/:?#]+)', 1), ''))
                        AS host,
                    CASE WHEN regexp_extract(norm_url,
                        '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^#]*)',
                        1) = '' THEN '/'
                    ELSE regexp_extract(norm_url,
                        '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^#]*)',
                        1) END AS pq
                FROM normed
            ),
            m AS (
                SELECT u2.doc_id, p.rule, p.path, p.spec, p.pos
                FROM u2 JOIN pat2 p ON u2.host = p.host
                    AND u2.pq LIKE p.likepat ESCAPE '\'
            ),
            win AS (
                SELECT doc_id, rule, path,
                    row_number() OVER (PARTITION BY doc_id
                        ORDER BY spec DESC, (rule = 'allow') DESC,
                                 path ASC, pos ASC) AS rn
                FROM m
            )
            SELECT u2.doc_id, u2.norm_url, u2.host,
                   coalesce(w.rule = 'allow', true) AS allowed,
                   (u2.host <> '' AND NOT (u2.host = 'h3.ex.com'
                        OR u2.host LIKE '%.h3.ex.com')) AS unblocked,
                   (coalesce(w.rule = 'allow', true)
                    AND u2.host <> '' AND NOT (u2.host = 'h3.ex.com'
                        OR u2.host LIKE '%.h3.ex.com')) AS crawl
            FROM u2 LEFT JOIN (SELECT * FROM win WHERE rn = 1) w
            USING (doc_id)
        """),
        # robots_gate: full independent parse + gate replay — line
        # split, directive regex, lag/sum window grouping, agent
        # selection, LIKE-pattern compilation with escapes, and the
        # longest-match/allow-wins winner window
        "robots_gate": (
            r"""
            WITH hosts AS (
                SELECT DISTINCT CAST(doc_id % 4 AS INT) AS hid
                FROM documents
            ),
            robots AS (
                SELECT 'h' || CAST(hid AS STRING) || '.ex.com' AS host,
                       """ + _ROBOTS_TXT_SQL + r""" AS content
                FROM hosts
            ),
            lines AS (
                SELECT host,
                       unnest(generate_series(1, len(ls))) AS pos,
                       unnest(ls) AS line
                FROM (SELECT host, string_split(content, chr(10)) AS ls
                      FROM robots)
            ),
            dirs AS (
                SELECT host, pos,
                    lower(regexp_extract(
                        trim(regexp_replace(line, '#.*$', '')),
                        '^([A-Za-z\-]+)\s*:', 1)) AS k,
                    trim(regexp_extract(
                        trim(regexp_replace(line, '#.*$', '')),
                        '^[A-Za-z\-]+\s*:\s*(.*)$', 1)) AS v
                FROM lines
            ),
            dd AS (
                SELECT * FROM dirs
                WHERE k IN ('user-agent', 'allow', 'disallow')
            ),
            flagged AS (
                SELECT *, CASE WHEN k = 'user-agent'
                        AND coalesce(lag(k = 'user-agent') OVER (
                            PARTITION BY host ORDER BY pos), false)
                            = false
                        THEN 1 ELSE 0 END AS strt
                FROM dd
            ),
            grpd AS (
                SELECT *, sum(strt) OVER (
                        PARTITION BY host ORDER BY pos
                        ROWS UNBOUNDED PRECEDING) AS grp
                FROM flagged
            ),
            agents AS (
                SELECT DISTINCT host, grp, lower(v) AS agent
                FROM grpd WHERE k = 'user-agent'
            ),
            rls AS (
                SELECT host, grp, k AS rule, v AS path, pos
                FROM grpd WHERE k <> 'user-agent' AND v <> ''
            ),
            rules AS (
                SELECT r.host, a.agent, r.rule, r.path, r.pos
                FROM rls r JOIN agents a
                ON r.host = a.host AND r.grp = a.grp
            ),
            hasex AS (
                SELECT DISTINCT host FROM rules WHERE agent = 'mybot'
            ),
            app AS (
                SELECT rules.* FROM rules
                LEFT JOIN hasex ON rules.host = hasex.host
                WHERE agent = 'mybot'
                   OR (agent = '*' AND hasex.host IS NULL)
            ),
            pat AS (
                SELECT host, rule, path, pos,
                    CASE WHEN path LIKE '%$'
                         THEN substr(path, 1, length(path) - 1)
                         ELSE path END AS body,
                    (path LIKE '%$') AS anch
                FROM app
            ),
            pat2 AS (
                SELECT host, rule, path, pos, length(body) AS spec,
                    replace(replace(replace(replace(body,
                        '\', '\\'), '%', '\%'), '_', '\_'), '*', '%')
                        || CASE WHEN anch THEN '' ELSE '%' END
                        AS likepat
                FROM pat
            ),
            u AS (
                SELECT doc_id, """ + _ROBOTS_URL_SQL + r""" AS url
                FROM documents
            ),
            u2 AS (
                SELECT doc_id, url,
                    lower(coalesce(regexp_extract(url,
                        '^[a-z][a-z0-9+.-]*://([^/:?#]+)', 1), ''))
                        AS host,
                    CASE WHEN regexp_extract(url,
                        '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^#]*)',
                        1) = '' THEN '/'
                    ELSE regexp_extract(url,
                        '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^#]*)',
                        1) END AS pq
                FROM u
            ),
            m AS (
                SELECT u2.doc_id, p.rule, p.path, p.spec, p.pos
                FROM u2 JOIN pat2 p ON u2.host = p.host
                    AND u2.pq LIKE p.likepat ESCAPE '\'
            ),
            win AS (
                SELECT doc_id, rule, path,
                    row_number() OVER (PARTITION BY doc_id
                        ORDER BY spec DESC, (rule = 'allow') DESC,
                                 path ASC, pos ASC) AS rn
                FROM m
            )
            SELECT u2.doc_id, u2.url, u2.host,
                   coalesce(w.rule = 'allow', true) AS allowed,
                   w.rule, w.path
            FROM u2 LEFT JOIN (SELECT * FROM win WHERE rn = 1) w
            USING (doc_id)
        """),
        # tfidf_topk: full replay — corpus size, per-term document
        # frequency, quantized smoothed idf, exact-BIGINT scores,
        # deterministic windowed rank
        "tfidf_topk": (
            r"""
            WITH d AS (
                SELECT doc_id, text FROM documents WHERE doc_id % 7 = 2
            ),
            n AS (SELECT CAST(count(*) AS DOUBLE) AS nd FROM d),
            tok AS (
                SELECT doc_id, unnest(list_filter(string_split_regex(
                    lower(coalesce(text, '')), '\s+'),
                    t -> t <> '')) AS term
                FROM d
            ),
            tf AS (
                SELECT doc_id, term, count(*) AS tf
                FROM tok GROUP BY 1, 2
            ),
            idf AS (
                SELECT term,
                       CAST(floor((ln((nd + 1.0) / (count(*) + 1.0))
                           + 1.0) * 1000.0 + 0.5) AS BIGINT)
                           AS idf_milli
                FROM tf, n GROUP BY term, nd
            ),
            s AS (
                SELECT tf.doc_id, tf.term, tf.tf,
                       tf.tf * idf.idf_milli AS score_milli
                FROM tf JOIN idf USING (term)
            ),
            r AS (
                SELECT doc_id, term, tf, score_milli,
                       row_number() OVER (PARTITION BY doc_id
                           ORDER BY score_milli DESC, term ASC) AS rank
                FROM s
            )
            SELECT doc_id, term, CAST(tf AS BIGINT) AS tf, score_milli,
                   CAST(rank AS INT) AS rank
            FROM r WHERE rank <= 5
        """),
        # url_normalize: independent regexp/list replay of every
        # canonicalization rule over the shared planting expression
        "url_normalize": (
            r"""
            WITH d AS (
                SELECT doc_id, """ + _NORM_URL_SQL + r""" AS url
                FROM documents
            ),
            parts AS (
                SELECT doc_id, url,
                    lower(regexp_extract(url,
                        '^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)',
                        1)) AS scheme,
                    lower(regexp_extract(url,
                        '^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)',
                        2)) AS auth,
                    regexp_extract(url,
                        '^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)',
                        3) AS path,
                    regexp_extract(url, '\?([^#]*)', 1) AS qs
                FROM d
            ),
            fixed AS (
                SELECT doc_id, url, scheme,
                    CASE WHEN scheme = 'http' AND auth LIKE '%:80'
                         THEN substr(auth, 1, length(auth) - 3)
                         WHEN scheme = 'https' AND auth LIKE '%:443'
                         THEN substr(auth, 1, length(auth) - 4)
                         ELSE auth END AS auth,
                    CASE WHEN path = '' THEN '/' ELSE path END AS path,
                    list_sort(list_filter(string_split(qs, '&'),
                        p -> p <> ''
                             AND NOT starts_with(lower(p), 'utm_')
                             AND NOT starts_with(lower(p), 'fbclid')
                             AND NOT starts_with(lower(p), 'gclid')
                             AND NOT starts_with(lower(p), 'msclkid')
                             AND NOT starts_with(lower(p), 'sessionid')
                             AND NOT starts_with(lower(p), 'phpsessid')
                    )) AS kept
                FROM parts
            )
            SELECT doc_id, url,
                   CASE WHEN scheme = '' THEN url
                        ELSE scheme || '://' || auth || path ||
                            CASE WHEN len(kept) > 0
                                 THEN '?' || list_aggr(kept,
                                     'string_agg', '&')
                                 ELSE '' END
                   END AS norm_url
            FROM fixed
        """),
        "warc_ingest": """
            SELECT 'http://doc.example/' || CAST(doc_id AS STRING)
                       AS warc_target_uri,
                   CAST(19 + strlen(text) AS BIGINT) AS content_length,
                   CAST(200 AS INT) AS http_status,
                   md5(text) AS payload_md5
            FROM documents WHERE doc_id < 200
        """,
        # same planted records as warc_ingest, read through the
        # offset-sharded single-archive path
        "warc_sharded": """
            SELECT 'http://doc.example/' || CAST(doc_id AS STRING)
                       AS warc_target_uri,
                   CAST(19 + strlen(text) AS BIGINT) AS content_length,
                   CAST(200 AS INT) AS http_status,
                   md5(text) AS payload_md5
            FROM documents WHERE doc_id < 200
        """,
        "audio_neardup": """
            WITH ids AS (
                SELECT DISTINCT doc_id AS id FROM documents
                WHERE doc_id < 48
            )
            SELECT a.id AS left_id, b.id AS right_id,
                   CAST(0 AS INT) AS hamming
            FROM ids a JOIN ids b
              ON a.id < b.id AND a.id // 4 = b.id // 4
        """,
        "media_metadata": """
            WITH img AS (
              SELECT DISTINCT doc_id AS id FROM documents WHERE doc_id < 64
            ),
            wav AS (
              SELECT DISTINCT doc_id + 100000 AS id FROM documents
              WHERE doc_id < 48
            ),
            txt AS (
              SELECT DISTINCT doc_id + 200000 AS id FROM documents
              WHERE doc_id < 200
            ),
            gif AS (
              SELECT DISTINCT doc_id + 300000 AS id FROM documents
              WHERE doc_id < 64
            )
            SELECT id, CASE WHEN id % 3 = 1 THEN 'image/bmp'
                            ELSE 'image/png' END AS media_type FROM img
            UNION ALL SELECT id, 'audio/wav' FROM wav
            UNION ALL SELECT id, 'application/octet-stream' FROM txt
            UNION ALL SELECT id, 'image/gif' FROM gif
        """,
        "sequence_match": """
            WITH ev AS (
                SELECT user_id, event_id, ts, event_type,
                       lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0') ||
                       lpad(CAST(event_id AS VARCHAR), 19, '0') AS comp
                FROM events
            ), nx AS (
                SELECT *,
                    min(CASE WHEN event_type = 'click' THEN comp END) OVER w AS nxt1,
                    min(CASE WHEN event_type = 'purchase' THEN comp END) OVER w AS nxt2
                FROM ev
                WINDOW w AS (PARTITION BY user_id ORDER BY comp DESC
                             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
            ), anchors AS (
                SELECT user_id, event_id AS step0_id, ts AS step0_ts,
                       nxt1 AS chain
                FROM nx WHERE event_type = 'view'
            ), s1 AS (
                SELECT a.user_id, a.step0_id, a.step0_ts,
                       CAST(substring(a.chain, 21, 19) AS BIGINT) AS step1_id,
                       make_timestamp(CAST(substring(a.chain, 1, 20) AS BIGINT)) AS step1_ts,
                       b.nxt2 AS chain2
                FROM anchors a
                JOIN nx b ON b.user_id = a.user_id AND b.comp = a.chain
                WHERE a.chain IS NOT NULL
            ), s2 AS (
                SELECT user_id, step0_id, step0_ts, step1_id, step1_ts,
                       CAST(substring(chain2, 21, 19) AS BIGINT) AS step2_id,
                       make_timestamp(CAST(substring(chain2, 1, 20) AS BIGINT)) AS step2_ts
                FROM s1 WHERE chain2 IS NOT NULL
            )
            SELECT user_id, step0_id, step0_ts, step1_id, step1_ts,
                   step2_id, step2_ts
            FROM s2 WHERE step2_ts <= step0_ts + INTERVAL 2 DAY
        """,
        "sequence_match_alt": """
            WITH ev AS (
                SELECT user_id, event_id, ts, event_type,
                       lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0') ||
                       lpad(CAST(event_id AS VARCHAR), 19, '0') AS comp
                FROM events
            ), nx AS (
                SELECT *,
                    min(CASE WHEN event_type IN ('click', 'signup') THEN comp END) OVER w AS nxt1,
                    min(CASE WHEN event_type = 'purchase' THEN comp END) OVER w AS nxt2
                FROM ev
                WINDOW w AS (PARTITION BY user_id ORDER BY comp DESC
                             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
            ), anchors AS (
                SELECT user_id, event_id AS step0_id, ts AS step0_ts,
                       nxt1 AS chain
                FROM nx WHERE event_type = 'view'
            ), s1 AS (
                SELECT a.user_id, a.step0_id, a.step0_ts,
                       CAST(substring(a.chain, 21, 19) AS BIGINT) AS step1_id,
                       make_timestamp(CAST(substring(a.chain, 1, 20) AS BIGINT)) AS step1_ts,
                       b.nxt2 AS chain2
                FROM anchors a
                JOIN nx b ON b.user_id = a.user_id AND b.comp = a.chain
                WHERE a.chain IS NOT NULL
            ), s2 AS (
                SELECT user_id, step0_id, step0_ts, step1_id, step1_ts,
                       CAST(substring(chain2, 21, 19) AS BIGINT) AS step2_id,
                       make_timestamp(CAST(substring(chain2, 1, 20) AS BIGINT)) AS step2_ts
                FROM s1 WHERE chain2 IS NOT NULL
            )
            SELECT user_id, step0_id, step0_ts, step1_id, step1_ts,
                   step2_id, step2_ts
            FROM s2 WHERE step2_ts <= step0_ts + INTERVAL 2 DAY
        """,
        "sequence_match_quant": """
            WITH ev AS (
                SELECT user_id, event_id, ts, event_type,
                       lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0') ||
                       lpad(CAST(event_id AS VARCHAR), 19, '0') AS comp
                FROM events
            ), qlead AS (
                SELECT user_id, comp,
                       lead(comp, 1) OVER (PARTITION BY user_id ORDER BY comp) AS cm
                FROM ev WHERE event_type = 'click'
            ), nx AS (
                SELECT *,
                    min(CASE WHEN event_type = 'click' THEN comp END) OVER w AS nxt1,
                    min(CASE WHEN event_type = 'purchase' THEN comp END) OVER w AS nxt2
                FROM ev
                WINDOW w AS (PARTITION BY user_id ORDER BY comp DESC
                             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
            ), anchors AS (
                SELECT user_id, event_id AS step0_id, ts AS step0_ts, nxt1 AS c1
                FROM nx WHERE event_type = 'view'
            ), qm AS (
                SELECT a.user_id, a.step0_id, a.step0_ts, q.cm
                FROM anchors a
                JOIN qlead q ON q.user_id = a.user_id AND q.comp = a.c1
                WHERE a.c1 IS NOT NULL
            ), s1 AS (
                SELECT m.user_id, m.step0_id, m.step0_ts,
                       CAST(substring(m.cm, 21, 19) AS BIGINT) AS step1_id,
                       make_timestamp(CAST(substring(m.cm, 1, 20) AS BIGINT)) AS step1_ts,
                       b.nxt2 AS chain2
                FROM qm m
                JOIN nx b ON b.user_id = m.user_id AND b.comp = m.cm
                WHERE m.cm IS NOT NULL
            ), s2 AS (
                SELECT user_id, step0_id, step0_ts, step1_id, step1_ts,
                       CAST(substring(chain2, 21, 19) AS BIGINT) AS step2_id,
                       make_timestamp(CAST(substring(chain2, 1, 20) AS BIGINT)) AS step2_ts
                FROM s1 WHERE chain2 IS NOT NULL
            )
            SELECT user_id, step0_id, step0_ts, step1_id, step1_ts,
                   step2_id, step2_ts
            FROM s2 WHERE step2_ts <= step0_ts + INTERVAL 2 DAY
        """,
        "absence_match": """
            WITH ev AS (
                SELECT user_id, event_id, ts, event_type,
                       lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0') ||
                       lpad(CAST(event_id AS VARCHAR), 19, '0') AS comp
                FROM events
            ), nx AS (
                SELECT *,
                    min(CASE WHEN event_type = 'purchase' THEN comp END) OVER w AS nxt
                FROM ev
                WINDOW w AS (PARTITION BY user_id ORDER BY comp DESC
                             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
            )
            SELECT user_id, event_id AS anchor_id, ts AS anchor_ts
            FROM nx
            WHERE event_type = 'view'
              AND (nxt IS NULL OR
                   make_timestamp(CAST(substring(nxt, 1, 20) AS BIGINT))
                     > ts + INTERVAL 1 DAY)
        """,
        "threshold_match": """
            WITH ev AS (
                SELECT user_id, event_id, ts, epoch_us(ts) AS us
                FROM events WHERE event_type = 'error'
            ), c AS (
                SELECT user_id, event_id, ts,
                       count(*) OVER (PARTITION BY user_id ORDER BY us
                           RANGE BETWEEN 86399999999 PRECEDING
                                     AND CURRENT ROW) AS cnt
                FROM ev
            )
            SELECT user_id, event_id AS anchor_id, ts AS anchor_ts
            FROM c WHERE cnt = 3
        """,
        "frame_sample": """
            WITH d AS (
                SELECT doc_id AS id, text, length(text) AS L
                FROM documents WHERE doc_id < 50
            ), p AS (
                SELECT id, text, L,
                       greatest(1, CAST(L // 32 AS INT)) AS chunk
                FROM d
            ), f AS (
                -- frame_idx = SOURCE position (ordinal * every), the
                -- round-5 unified semantics shared with the real-AVI
                -- decode path
                SELECT id, CAST(i * 4 AS INT) AS frame_idx,
                       substring(text, 1 + CAST(i * chunk * 4 AS INT),
                                 CAST(chunk AS INT)) AS frame
                FROM p CROSS JOIN (SELECT unnest(range(8)) AS i)
                WHERE i * chunk * 4 < L
            )
            SELECT id, frame_idx,
                   CAST(length(frame) AS BIGINT) AS frame_len,
                   md5(frame) AS frame_md5
            FROM f
        """,
        "sliding_count": """
            WITH buckets AS (
                SELECT event_type,
                       unnest([
                         CAST(to_timestamp(CAST(floor(epoch(ts) / 1800) * 1800 AS BIGINT)) AS TIMESTAMP),
                         CAST(to_timestamp(CAST(floor(epoch(ts) / 1800) * 1800 - 1800 AS BIGINT)) AS TIMESTAMP)
                       ]) AS window_start
                FROM events
            )
            SELECT window_start, event_type, COUNT(*) AS n
            FROM buckets GROUP BY 1, 2
        """,
        "topk_per_group": """
            SELECT event_id, event_type, value, rank FROM (
                SELECT event_id, event_type, value,
                       ROW_NUMBER() OVER (PARTITION BY event_type
                           ORDER BY value DESC, event_id ASC) AS rank
                FROM events
            ) WHERE rank <= 3
        """,
        "salted_count": """
            SELECT date_trunc('hour', ts) AS hour, event_type,
                   COUNT(*) AS n, MAX(value) AS maxv
            FROM events GROUP BY 1, 2
        """,
        "union_ragged": """
            SELECT o_orderkey, o_orderstatus, NULL AS o_totalprice
            FROM orders WHERE o_orderstatus = 'O'
            UNION ALL
            SELECT o_orderkey, NULL, o_totalprice
            FROM orders WHERE o_totalprice > 180000
        """,
        "strfind_last": r"""
            SELECT p_partkey, p_name,
                   regexp_replace(CASE WHEN contains(p_name, ' ')
                        THEN regexp_replace(p_name, '^.* ', '', 's')
                        ELSE p_name END, '^\s+|\s+$', '', 'g') AS last_word
            FROM part
        """,
        "regex_casematch": """
            SELECT doc_id, regexp_replace(text, '(?ms)SPARK', 'x', 'g') AS text
            FROM documents
        """,
        "first_k_per_key": """
            SELECT event_id, user_id, ts FROM (
                SELECT event_id, user_id, ts,
                       ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id) AS rn
                FROM events
            ) WHERE rn <= 2
        """,
        "aggregate_udaf": """
            SELECT event_type,
                   -- DuckDB SUM(BIGINT) widens to HUGEINT; cast back
                   CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT) AS total_cents,
                   COUNT(*) AS n
            FROM events GROUP BY event_type
        """,
        "pipe_graph": f"""
            WITH toks AS (
                SELECT unnest({_TOKENIZE_SQL}) AS token FROM documents WHERE lang = 'en'
            )
            SELECT token, COUNT(*) AS count FROM toks GROUP BY token
            ORDER BY count DESC, token ASC LIMIT 50
        """,
    }
    # bloom mode is an internal plan lever (row-local bitset prune +
    # exact verify join): the output is identical by construction, so
    # the oracle is shared verbatim with the broadcast-join form
    out["ngram_contamination_bloom"] = out["ngram_contamination"]
    return out
