"""Round-9 stage decomposition probes (guide §1.4 noop isolation).

Times single passes of the pieces that make up the heavyweight bench
keys, so optimization targets are attributed, not guessed.

Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 python scripts/r09_decompose.py [probe ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

import __spark_entry__ as em  # noqa: E402
from riko_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def best_of(fn, runs=3):
    fn()
    out = []
    for _ in range(runs):
        t0 = time.time()
        fn()
        out.append(time.time() - t0)
    return round(min(out), 3)


def main():
    spark = get_spark(app_name="r09-decompose", master=f"local[{CPUS}]",
                      shuffle_partitions=CPUS,
                      extra_conf={"spark.sql.files.maxPartitionBytes": "32m"})
    only = set(sys.argv[1:])

    def paged(repart=True):
        d = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
            "doc_id", "text")
        if repart:
            d = d.repartition(CPUS)
        reps = spark.range(20).select(F.col("id").alias("__rep"))
        return (
            d.crossJoin(reps)
            .select((F.col("doc_id") + F.col("__rep") * 1_000_000)
                    .alias("doc_id"), "text")
            .withColumn("text", F.expr(em._PAGED_SQL))
        )

    probes = {}

    def add(name, fn):
        if not only or name in only:
            spark.sparkContext.setJobDescription(f"probe:{name}")
            probes[name] = best_of(fn)
            print(f"## {name}: {probes[name]}", file=sys.stderr)

    # one pure synthesis pass
    add("paged_noop", lambda: noop(paged()))

    # synthesis + c4 line gate
    from riko_spark.operators.cleaning import c4_line_filter_op

    add("paged_c4_noop", lambda: noop(c4_line_filter_op(paged(False))))

    # synthesis + line posexplode + hash (line_dedupe's occurrence pass)
    from riko_spark.operators.cleaning import lines_col

    def line_occ():
        src = F.coalesce(F.col("text"), F.lit(""))
        occ = c4_line_filter_op(paged(False)).select(
            F.col("doc_id"),
            F.posexplode(lines_col(src)).alias("__pos", "__line"),
        ).select("doc_id", "__pos", F.xxhash64("__line").alias("__h"))
        noop(occ)

    add("line_occurrences_noop", line_occ)

    # synthesis + tokenize + k=6 hash-chain windows (span's occurrence pass)
    from riko_spark.operators.textstats import word_shingle_hashes

    def span_occ():
        src = F.coalesce(F.col("text"), F.lit(""))
        toks = F.filter(F.split(src, r"\s+"), lambda x: x != F.lit(""))
        occ = paged().select(
            F.col("doc_id"),
            F.posexplode(word_shingle_hashes(toks, 6)).alias("__pos", "__h"),
        )
        noop(occ)

    add("span_occurrences_noop", span_occ)

    # span occurrence pass + the distinct(h,id)->df agg (frequent branch)
    def span_freq():
        src = F.coalesce(F.col("text"), F.lit(""))
        toks = F.filter(F.split(src, r"\s+"), lambda x: x != F.lit(""))
        occ = paged().select(
            F.col("doc_id"),
            F.posexplode(word_shingle_hashes(toks, 6)).alias("__pos", "__h"),
        )
        freq = (occ.select("__h", "doc_id").distinct()
                .groupBy("__h").agg(F.count(F.lit(1)).alias("__df"))
                .filter(F.col("__df") >= 3).select("__h"))
        noop(freq)

    add("span_frequent_noop", span_freq)

    # full span op end-to-end (the bench action)
    from riko_spark.operators.cleaning import span_dedupe_op

    def span_full():
        out = span_dedupe_op(paged(), k=6, min_docs=3)
        out.agg(F.sum("n_kept"), F.sum(F.length("text"))).collect()

    add("span_full", span_full)

    # full line_dedupe op end-to-end over c4-gated corpus
    from riko_spark.operators.cleaning import line_dedupe_op

    def clean_full():
        out = line_dedupe_op(c4_line_filter_op(paged(False)), min_docs=3)
        out.agg(F.sum("n_kept"), F.sum(F.length("text"))).collect()

    add("corpus_clean_full", clean_full)

    spark.stop()
    print(json.dumps(probes))


if __name__ == "__main__":
    main()
