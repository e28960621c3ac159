"""Tests for the remaining reference pipes (operators/misc.py)."""

import pyspark.sql.functions as F

from riko_spark.plans.flow import Flow
from riko_spark.sources.pages import pages_fixture
from tests.conftest import rows


def test_rssitembuilder(spark):
    # riko/modules/rssitembuilder.py doctest: guid + mediaThumbURL
    df = spark.createDataFrame([{"seed": 1}])
    out = Flow(df).rssitembuilder({"guid": "a1", "mediaThumbURL": "image.png"})
    got = rows(out.df)[0]
    assert got["y_id"] == "a1"
    assert got["media_thumbnail"]["url"] == "image.png"


def test_fetchsitefeed_first_link(spark):
    path = pages_fixture(n=50)
    df = spark.read.parquet(path)
    out = Flow(df).fetchsitefeed(None)
    got = rows(out.df.select("feed_url"))
    assert all(r["feed_url"].endswith(".xml") for r in got)


def test_currencyformat(spark):
    df = spark.createDataFrame([{"content": "10.33"}, {"content": "1234.5"}])
    out = Flow(df).currencyformat({"currency": "USD"})
    got = [r["currencyformat"] for r in rows(out.df)]
    assert got == ["$10.33", "$1,234.50"]


def test_geolocate_coordinates(spark):
    df = spark.createDataFrame([{"content": "40.5, -73.9"}])
    out = Flow(df).geolocate({"type": "coordinates"})
    loc = rows(out.df)[0]["geolocate"]
    assert loc["lat"] == 40.5 and loc["lon"] == -73.9
    assert loc["country"] == "United States"


def test_channels_fanout(spark, tmp_path):
    from riko_spark.operators.misc import Channels

    path = pages_fixture(n=200)
    schema = spark.read.parquet(path).schema
    stream = spark.readStream.schema(schema).parquet(path)

    got = {"en": [], "all": []}
    ch = (
        Channels()
        .send("en", lambda b: b.filter(F.col("lang") == "en"),
              lambda df, _id: got["en"].extend(df.collect()))
        .send("all", lambda b: b, lambda df, _id: got["all"].extend(df.collect()))
    )
    q = ch.run(stream.select("url", "lang"), str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    assert len(got["all"]) == 200
    assert 0 < len(got["en"]) < 200
    assert all(r["lang"] == "en" for r in got["en"])


def test_forever_rate_source(spark):
    from riko_spark.operators.misc import forever_op, timeout

    src = forever_op(None, {"rows_per_second": 50}, spark=spark)
    assert src.isStreaming and "forever" in src.columns
    counts = []
    q = (
        src.writeStream.foreachBatch(lambda b, i: counts.append(b.count()))
        .trigger(processingTime="0 seconds")
        .start()
    )
    # wait until at least one non-empty batch commits (query startup
    # can eat several seconds under load), THEN exercise timeout()
    import time

    deadline = time.time() + 60
    while sum(counts) == 0 and time.time() < deadline:
        time.sleep(0.5)
    finished = timeout(q, 1)
    assert not finished  # deadline hit, query stopped by timeout()
    q.awaitTermination(30)
    assert sum(counts) > 0
