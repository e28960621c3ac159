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


def test_export_qif_and_ofx(spark, tmp_path):
    """ofx/qif targets (riko's optional csv2ofx-backed exports,
    collections.py:263-287): transaction-shaped rows serialize to the
    public QIF record format and an OFX 1.02 SGML statement; goldens
    pin the serialization (csv2ofx absent -> byte-parity not claimed,
    format correctness is)."""
    df = spark.createDataFrame(
        [("t1", "2026-01-15", -42.50, "Grocer", "weekly shop"),
         ("t2", "2026-01-16", 1200.00, "Employer", None)],
        "id string, date string, amount double, payee string, desc string",
    ).coalesce(1)

    q = str(tmp_path / "out.qif")
    export(df.orderBy("id"), "qif", q)
    assert open(q).read() == (
        "!Type:Bank\n"
        "D01/15/2026\nT-42.50\nPGrocer\nMweekly shop\n^\n"
        "D01/16/2026\nT1200.00\nPEmployer\n^\n")

    o = str(tmp_path / "out.ofx")
    export(df.orderBy("id"), "ofx", o)
    text = open(o).read()
    assert text.startswith("OFXHEADER:100\nDATA:OFXSGML\nVERSION:102")
    assert "<DTSTART>20260115<DTEND>20260116" in text
    assert ("<STMTTRN><TRNTYPE>DEBIT<DTPOSTED>20260115<TRNAMT>-42.50"
            "<FITID>t1<NAME>Grocer<MEMO>weekly shop</STMTTRN>") in text
    assert ("<STMTTRN><TRNTYPE>CREDIT<DTPOSTED>20260116<TRNAMT>1200.00"
            "<FITID>t2<NAME>Employer</STMTTRN>") in text
    assert text.rstrip().endswith(
        "</BANKTRANLIST></STMTRS></STMTTRNRS></BANKMSGSRSV1></OFX>")


def test_export_ofx_fitid_defaults_to_content_hash(spark, tmp_path):
    """Without an id column the FITID falls back to a deterministic
    md5 of the transaction fields, so re-exports stay idempotent for
    OFX consumers (they dedupe on FITID)."""
    df = spark.createDataFrame(
        [("2026-02-01", -5.0, "Cafe")],
        "date string, amount double, payee string")
    p1, p2 = str(tmp_path / "a.ofx"), str(tmp_path / "b.ofx")
    export(df, "ofx", p1)
    export(df, "ofx", p2)
    t1, t2 = open(p1).read(), open(p2).read()
    assert t1 == t2
    import re
    (fitid,) = re.findall(r"<FITID>([0-9a-f]{32})", t1)
    assert len(fitid) == 32
