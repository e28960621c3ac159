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


def test_export_geojson_point_collection(spark, tmp_path):
    """geojson target (riko list_targets parity, collections.py:276):
    one FeatureCollection document; id/lon/lat lifted out of
    properties into the feature id + Point geometry; bbox + CRS84
    stamped on the collection."""
    import json

    df = spark.createDataFrame(
        [(1, -122.42, 37.77, "sf", 100),
         (2, 2.35, 48.86, "paris", 200)],
        "id int, lon double, lat double, name string, pop int",
    ).coalesce(1)
    p = str(tmp_path / "out.geojson")
    export(df, "geojson", p)
    fc = json.loads(open(p, encoding="utf-8").read())
    assert fc["type"] == "FeatureCollection"
    assert fc["bbox"] == [-122.42, 37.77, 2.35, 48.86]
    assert fc["crs"]["properties"]["name"] == "urn:ogc:def:crs:OGC:1.3:CRS84"
    feats = sorted(fc["features"], key=lambda f: f["id"])
    assert [f["type"] for f in feats] == ["Feature", "Feature"]
    assert feats[0]["geometry"] == {
        "type": "Point", "coordinates": [-122.42, 37.77]}
    # id/lon/lat lifted OUT of properties
    assert feats[0]["properties"] == {"name": "sf", "pop": 100}
    assert feats[1]["properties"] == {"name": "paris", "pop": 200}

    # round-trip: fetchtable reads the document back, meza record
    # shape (id + lon/lat + flattened properties)
    from riko_spark.operators.webtext import fetchtable_op

    back = fetchtable_op(None, {"url": p}, spark=spark)
    rows = {r["id"]: r for r in back.collect()}
    assert set(back.columns) == {"id", "lon", "lat", "name", "pop"}
    assert rows[2]["lat"] == 48.86 and rows[2]["name"] == "paris"


def test_export_geojson_geometry_passthrough_and_geojsonl(spark, tmp_path):
    """A `geometry` struct column passes through untouched (non-point
    shapes); geojsonl writes a distributed feature-per-line dataset."""
    import glob
    import json

    df = spark.createDataFrame(
        [("a", ("LineString", [[0.0, 0.0], [1.0, 1.0]]))],
        "name string, geometry struct<type:string,"
        "coordinates:array<array<double>>>")
    p = str(tmp_path / "lines.geojson")
    export(df, "geojson", p)
    fc = json.loads(open(p, encoding="utf-8").read())
    assert "bbox" not in fc  # nested coordinates: bbox skipped
    (f,) = fc["features"]
    assert f["geometry"]["type"] == "LineString"
    assert f["geometry"]["coordinates"] == [[0.0, 0.0], [1.0, 1.0]]
    assert f["properties"] == {"name": "a"}

    pts = spark.createDataFrame(
        [(i, float(i), float(-i), f"n{i}") for i in range(10)],
        "id int, lon double, lat double, name string")
    d = str(tmp_path / "pts_jl")
    export(pts, "geojsonl", d)
    lines = []
    for part in glob.glob(d + "/part-*"):
        lines += [json.loads(ln) for ln in open(part) if ln.strip()]
    assert len(lines) == 10
    assert {ln["id"] for ln in lines} == set(range(10))
    assert all(ln["geometry"]["type"] == "Point" for ln in lines)
