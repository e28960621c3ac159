"""The same JSON pipe graph runs batch AND as a Structured-Streaming
query: build_pipeline over a streaming source, windowed count, through
the exactly-once sink — stream result ≡ batch result."""

import pyspark.sql.functions as F

from riko_spark.plans.dag import build_pipeline
from riko_spark.sources.pages import pages_fixture
from riko_spark.streaming.sink import UpsertSink, write_stream_upsert
from riko_spark.streaming.windows import tumbling_agg

PIPE_DEF = {
    "modules": [
        {"id": "src", "type": "filter",
         "conf": {"rule": [{"field": "lang", "op": "isnot", "value": "fr"}]}},
        {"id": "ext", "type": "extract", "conf": {"start": "<body>", "end": "</body>"}},
        {"id": "out", "type": "output"},
    ],
}


def _graph(spark, source):
    out = build_pipeline(spark, PIPE_DEF, sources={"src": source})
    toks = out.withColumn("n_chars", F.length("content"))
    return tumbling_agg(
        toks, ts_col="warc_ts", window="10 minutes", watermark="2 hours",
        keys=["lang"], aggs={"n": "count", "chars": "sum:n_chars"},
    )


def test_dag_graph_stream_equals_batch(spark, tmp_path):
    path = pages_fixture(n=1_000)
    batch = _graph(spark, spark.read.parquet(path))
    expected = sorted(tuple(r) for r in batch.collect())

    schema = spark.read.parquet(path).schema
    stream_src = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 3).parquet(path)
    )
    agg = _graph(spark, stream_src)
    assert agg.isStreaming
    sink = UpsertSink(str(tmp_path / "sink"), keys=["window_start", "lang"])
    q = write_stream_upsert(agg, sink, str(tmp_path / "ckpt"))
    q.awaitTermination(180)
    got = sorted(tuple(r) for r in sink.result(spark).collect())
    assert got == expected
