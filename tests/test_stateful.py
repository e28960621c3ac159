"""Custom stateful operator: first_k_per_key (applyInPandasWithState)."""

import pyspark.sql.functions as F

from riko_spark.sources.pages import pages_fixture
from riko_spark.streaming.stateful import first_k_per_key


def test_first_k_batch_mode(spark):
    df = spark.createDataFrame(
        [("a", i) for i in range(5)] + [("b", i) for i in range(3)],
        "k string, seq long",
    )
    out = first_k_per_key(df, "k", k=2, order_col="seq")
    got = sorted((r["k"], r["seq"]) for r in out.collect())
    assert got == [("a", 0), ("a", 1), ("b", 0), ("b", 1)]


def test_first_k_streaming_matches_batch(spark, tmp_path):
    """The stateful streaming operator emits exactly the batch-mode
    result across micro-batch boundaries (state carries the count)."""
    path = pages_fixture(n=500)
    pages = spark.read.parquet(path).withColumn(
        "domain", F.parse_url(F.col("url"), F.lit("HOST"))
    ).select("domain", "url", "warc_ts")

    expected = sorted(
        r["url"] for r in first_k_per_key(pages, "domain", k=3, order_col="url").collect()
    )

    src = str(tmp_path / "src")
    pages.write.parquet(src)
    stream = (
        spark.readStream.schema(pages.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = first_k_per_key(stream, "domain", k=3, order_col="url")
    rows = []
    q = (
        out.writeStream.foreachBatch(lambda b, _i: rows.extend(b.collect()))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = sorted(r["url"] for r in rows)
    # across-batch arrival order vs global url order can admit a
    # different-but-valid "first 3" per domain; counts per domain must
    # match exactly, and every domain must appear
    assert len(got) == len(expected)
    from collections import Counter

    def dom(u):
        return u.split("/")[2]

    assert Counter(map(dom, got)) == Counter(map(dom, expected))
    # k=1 special case ≡ riko uniq: exactly one row per domain
    one = first_k_per_key(spark.read.parquet(src), "domain", k=1)
    assert one.count() == one.select("domain").distinct().count()
