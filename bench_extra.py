"""Round-9 optimization measurement harness (bench.py stays frozen).

Mirrors the frozen bench.py query definitions exactly (same inputs,
same actions) but adds what guide §1 asks for:

* per-query ``.explain("formatted")`` dumps into ``plans/r09/``
  (``--plans BEFORE|AFTER``),
* per-query best-of-N wall timings with job descriptions set, so the
  numbers are attributable,
* a ``--only q1,q2`` filter so one query can be iterated on without
  paying for the whole suite.

Usage:
  SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 python bench_extra.py \
      --runs 3 --plans before --only span_dedupe,dsir_select
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
PLANS_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "plans", "r09")


def _timed(fn):
    t0 = time.time()
    fn()
    return time.time() - t0


def build_queries(spark, pages_path):
    """(name -> (build_df_fn, action_fn)) for every bench key.

    build_df_fn returns the DataFrame (for explain); action_fn runs
    the SAME action the frozen bench.py times (count/collect shape),
    rebuilt fresh each run so nothing is reused across runs.
    """
    import pyspark.sql.functions as F

    import __spark_entry__ as em
    from bench import _pipe_graph_def
    from riko_spark.plans.dag import build_pipeline

    sf_dir = SF_DIR
    q = {}

    def pages_graph(optimize=True):
        df = spark.read.parquet(pages_path)
        return build_pipeline(spark, _pipe_graph_def(), sources={"ext": df},
                              optimize=optimize)

    q["pipe_graph_batch"] = (lambda: pages_graph(True),
                             lambda: pages_graph(True).count())
    q["pipe_graph_unfused"] = (lambda: pages_graph(False),
                               lambda: pages_graph(False).count())

    def wordcount_df():
        return em.q_tokenizer_wordcount(spark, sf_dir)

    q["wordcount"] = (wordcount_df, lambda: wordcount_df().count())

    def entry(name):
        fn = em.queries()[name]
        return (lambda: fn(spark, sf_dir),
                lambda: fn(spark, sf_dir).count())

    q["sort_truncate"] = entry("sort_truncate")
    q["uniq_first_seen"] = entry("uniq")
    q["windowed_count"] = entry("windowed_count")
    q["session_windows"] = entry("session_windows")
    q["exact_dedupe"] = entry("exact_dedupe")

    def join_agg_df():
        o = spark.read.parquet(f"{sf_dir}/orders.parquet")
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        return (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(F.sum("l_extendedprice").alias("rev"),
                 F.count(F.lit(1)).alias("n"))
        )

    q["join_agg"] = (join_agg_df, lambda: join_agg_df().count())

    def minhash_df():
        from riko_spark.operators.dedupe import minhash_lsh_op

        d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
            "doc_id", "text")
        return minhash_lsh_op(
            d, {"num_hashes": 16, "bands": 4, "jaccard_threshold": 0.8})

    q["minhash_lsh"] = (minhash_df, lambda: minhash_df().count())

    def quality_df():
        from riko_spark.operators.textstats import quality_score_op

        d = spark.read.parquet(*[f"{sf_dir}/documents.parquet"] * 20)
        return quality_score_op(d).agg(
            F.sum("quality"), F.sum("stop_ratio"), F.sum("alpha_ratio"))

    q["quality_stats"] = (quality_df, lambda: quality_df().collect())

    def ann_df():
        from riko_spark.operators.similarity import ann_bruteforce_op

        e = spark.read.parquet(*[f"{sf_dir}/embeddings.parquet"] * 20)
        qq = (
            spark.read.parquet(f"{sf_dir}/embeddings.parquet")
            .filter(F.col("vec_id") < 32)
            .select(F.col("vec_id").alias("query_id"), "embedding")
        )
        return ann_bruteforce_op(e, {"k": 10, "method": "vectorized"},
                                 queries=qq)

    q["ann_bruteforce"] = (ann_df, lambda: ann_df().count())

    def cep_df():
        from riko_spark.streaming.cep import sequence_match

        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        return sequence_match(ev, ["view", "click", "purchase"],
                              within="2 days")

    q["cep_sequence"] = (cep_df, lambda: cep_df().count())

    # ---- extra keys (outside `value`), mirrored from bench.py ----

    def paged():
        d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
            "doc_id", "text")
        reps = spark.range(20).select(F.col("id").alias("__rep"))
        return (
            d.crossJoin(reps)
            .select((F.col("doc_id") + F.col("__rep") * 1_000_000)
                    .alias("doc_id"), "text")
            .withColumn("text", F.expr(em._PAGED_SQL))
        )

    def paged_part():
        d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
            "doc_id", "text").repartition(CPUS)
        reps = spark.range(20).select(F.col("id").alias("__rep"))
        return (
            d.crossJoin(reps)
            .select((F.col("doc_id") + F.col("__rep") * 1_000_000)
                    .alias("doc_id"), "text")
            .withColumn("text", F.expr(em._PAGED_SQL))
        )

    def corpus_clean_df():
        from riko_spark.operators.cleaning import (
            c4_line_filter_op,
            line_dedupe_op,
        )

        out_df = line_dedupe_op(c4_line_filter_op(paged()), min_docs=3)
        return out_df.agg(F.sum("n_kept"), F.sum(F.length("text")))

    q["corpus_clean"] = (corpus_clean_df,
                         lambda: corpus_clean_df().collect())

    def span_dedupe_df():
        from riko_spark.operators.cleaning import span_dedupe_op

        out_df = span_dedupe_op(paged_part(), k=6, min_docs=3)
        return out_df.agg(F.sum("n_kept"), F.sum(F.length("text")))

    q["span_dedupe"] = (span_dedupe_df,
                        lambda: span_dedupe_df().collect())

    def lm_score_df():
        from riko_spark.operators.lm import ngram_lm_score_op, ngram_lm_train

        p = paged_part()
        lm = ngram_lm_train(p.where(F.col("doc_id") % 7 == 1), min_count=2)
        scored = ngram_lm_score_op(p, lm=lm, keep_milli=-2000)
        return scored.agg(
            F.sum("logprob_milli"), F.sum("n_scored"),
            F.sum(F.col("keep").cast("long")))

    q["lm_score"] = (lm_score_df, lambda: lm_score_df().collect())

    def dsir_df():
        from riko_spark.operators.dsir import dsir_select_op

        p = paged_part()
        target = p.where(
            (F.col("doc_id") % 7 == 1) & (F.col("doc_id") < 1_000_000))
        sel = dsir_select_op(p, target_df=target, k=10_000,
                             buckets=10_000, seed="bench")
        return sel.agg(F.sum("logw_milli"), F.sum("key_milli"), F.count("*"))

    q["dsir_select"] = (dsir_df, lambda: dsir_df().collect())

    def frontier_df():
        from riko_spark.operators.cleaning import (
            url_filter_op,
            url_normalize_op,
        )
        from riko_spark.operators.robots import (
            robots_gate_op,
            robots_rules_op,
        )

        urls = spark.range(2_000_000).select(
            F.col("id").alias("doc_id"),
            F.expr(em._FRONTIER_URL_SQL).alias("url"))
        normed = url_normalize_op(urls).select("doc_id", "norm_url")
        hosts = spark.range(4).select(F.col("id").cast("int").alias("hid"))
        robots = hosts.select(
            F.expr("'h' || CAST(hid AS STRING) || '.ex.com'").alias("host"),
            F.expr(em._ROBOTS_TXT_SQL).alias("content"))
        rules = robots_rules_op(robots)
        gated = robots_gate_op(
            normed, rules=rules, agent="mybot", field="norm_url")
        out_df = url_filter_op(
            gated.select("doc_id", "norm_url", "allowed"),
            field="norm_url", blocked_domains=["h3.ex.com"],
            assign="unblocked")
        return out_df.agg(
            F.sum((F.col("allowed") & F.col("unblocked")).cast("long")),
            F.sum(F.length("norm_url")))

    q["frontier"] = (frontier_df, lambda: frontier_df().collect())

    def main_content_df():
        from riko_spark.operators.cleaning import main_content_op

        d = spark.read.parquet(pages_path).selectExpr(
            "xxhash64(url) AS doc_id", "html")
        return main_content_op(d).agg(
            F.sum("text_len"), F.sum(F.length("main_text")))

    q["main_content"] = (main_content_df,
                         lambda: main_content_df().collect())

    return q


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--rows", type=int, default=100_000)
    ap.add_argument("--only", default=None,
                    help="comma-separated query names")
    ap.add_argument("--plans", default=None, metavar="TAG",
                    help="dump explain('formatted') to plans/r09/"
                         "<query>_<TAG>.txt")
    ap.add_argument("--no-time", action="store_true",
                    help="plans only, skip the timed runs")
    args = ap.parse_args()

    from riko_spark.session import get_spark
    from riko_spark.sources.pages import pages_fixture

    pages_path = pages_fixture(n=args.rows)
    spark = get_spark(app_name="riko_spark-bench-extra",
                      master=f"local[{CPUS}]", shuffle_partitions=CPUS,
                      extra_conf={"spark.sql.files.maxPartitionBytes": "32m"})
    spark.read.parquet(pages_path).count()  # warm the scan

    queries = build_queries(spark, pages_path)
    if args.only:
        keep = [s.strip() for s in args.only.split(",")]
        queries = {k: v for k, v in queries.items() if k in keep}

    out = {"sf": SF_DIR, "cpus": CPUS, "runs": args.runs, "queries": {},
           "samples": {}}
    if args.plans:
        os.makedirs(PLANS_DIR, exist_ok=True)
    for name, (build, action) in queries.items():
        if args.plans:
            df = build()
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            with open(os.path.join(PLANS_DIR,
                                   f"{name}_{args.plans}.txt"), "w") as fh:
                fh.write(plan)
        if args.no_time:
            continue
        spark.sparkContext.setJobDescription(f"bench_extra:{name}")
        try:
            action()  # warm
            samples = [_timed(action) for _ in range(args.runs)]
            out["queries"][name] = round(min(samples), 3)
            out["samples"][name] = [round(s, 3) for s in samples]
        except Exception as e:  # noqa: BLE001
            out["queries"][name] = f"ERROR: {type(e).__name__}: {e}"
        spark.sparkContext.setJobDescription(None)
        print(f"## {name}: {out['queries'].get(name)}", file=sys.stderr)
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
