from riko_spark.sinks import export


def test_export_targets(spark, tmp_path):
    df = spark.createDataFrame([{"a": 1, "b": "x"}, {"a": 2, "b": "y"}])
    rows = export(df, "list")
    assert sorted(r["a"] for r in rows) == [1, 2]
    assert isinstance(export(df, "tuple"), tuple)

    p = export(df, "json", str(tmp_path / "j"))
    assert spark.read.json(p).count() == 2
    p = export(df, "csv", str(tmp_path / "c"))
    assert spark.read.option("header", "true").csv(p).count() == 2
    p = export(df, "parquet", str(tmp_path / "p"), partition_by=["b"])
    back = spark.read.parquet(p)
    assert back.count() == 2 and set(back.columns) == {"a", "b"}
