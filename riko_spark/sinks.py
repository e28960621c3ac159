"""Export sinks — riko's output conversions.

riko's only sinks are ``export`` conversions: list/tuple/csv/json/
geojson written via meza ``io.write`` (riko/collections.py:272-333,
``list_targets`` :289-290).  DataFrame equivalents, plus the scale
target (partitioned parquet / Iceberg):

    export(df, 'list')      -> list[dict]          (driver-side!)
    export(df, 'json', path)-> JSON lines dataset
    export(df, 'csv', path) -> CSV dataset
    export(df, 'parquet', path [, partition_by])   -> the real sink
    export(df, 'geojson', path)  -> ONE FeatureCollection document
    export(df, 'geojsonl', path) -> feature-per-line dataset (RFC
                                    8142 text sequence, the scale twin)
    export(df, 'qif'|'ofx', path)-> transaction-shaped rows as QIF /
                                    OFX 1.02 SGML (riko's optional
                                    csv2ofx targets, collections.py
                                    :263-287, re-expressed from the
                                    public formats)

geojson follows meza ``records2geojson``'s record shaping
(riko/collections.py:276): each row becomes a Feature; the ``id`` /
``lon`` / ``lat`` columns (names configurable) are lifted OUT of
properties into the feature id and a Point geometry; a ``geometry``
struct column (``type`` + ``coordinates``), when present, passes
through as-is instead.  The collection carries ``bbox`` and the CRS84
``crs`` member.  Feature JSON is built JVM-side (``to_json`` over a
struct — no Python worker); the single-document writer streams
partitions through the driver via ``toLocalIterator`` (bounded
memory, but inherently one writer — a FeatureCollection is one JSON
value; use ``geojsonl`` for corpus-scale output).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

TARGETS = ("list", "tuple", "json", "csv", "parquet", "geojson", "geojsonl",
           "ofx", "qif")

#: CRS member meza stamps on collections (GeoJSON's default CRS).
_CRS84 = {"type": "name",
          "properties": {"name": "urn:ogc:def:crs:OGC:1.3:CRS84"}}


def _feature_json(df: DataFrame, lon: str = "lon", lat: str = "lat",
                  key: str = "id", geometry: str = "geometry"):
    """(feature-JSON column, bbox-mode flag): one GeoJSON Feature per
    row, serialized JVM-side.  Point mode needs ``lon``/``lat``
    columns; a ``geometry`` struct column wins if present (bbox is
    then skipped — coordinates nest per geometry type)."""
    import pyspark.sql.functions as F

    cols = df.columns
    if geometry in cols:
        geom = F.col(geometry)
        lifted = {geometry, key}
        point_mode = False
    elif lon in cols and lat in cols:
        geom = F.struct(
            F.lit("Point").alias("type"),
            F.array(F.col(lon).cast("double"),
                    F.col(lat).cast("double")).alias("coordinates"))
        lifted = {lon, lat, key}
        point_mode = True
    else:
        raise ValueError(
            f"geojson export needs '{lon}'/'{lat}' columns or a "
            f"'{geometry}' struct column; have {cols}")
    fields = [F.lit("Feature").alias("type")]
    if key in cols:
        fields.append(F.col(key).alias("id"))
    props = [c for c in cols if c not in lifted]
    fields += [geom.alias("geometry"),
               F.struct(*[F.col(c) for c in props]).alias("properties")]
    return F.to_json(F.struct(*fields)), point_mode


def _write_geojson(df: DataFrame, path: str, lon: str = "lon",
                   lat: str = "lat", key: str = "id",
                   geometry: str = "geometry") -> str:
    """Single FeatureCollection document: distributed bbox aggregate +
    distributed feature serialization, then ONE streamed writer pass
    (``toLocalIterator`` holds one partition, not the dataset)."""
    import json

    import pyspark.sql.functions as F

    feature, point_mode = _feature_json(df, lon, lat, key, geometry)
    head = {"type": "FeatureCollection"}
    if point_mode:
        b = df.agg(
            F.min(F.col(lon).cast("double")), F.min(F.col(lat).cast("double")),
            F.max(F.col(lon).cast("double")), F.max(F.col(lat).cast("double")),
        ).first()
        if b[0] is not None:
            head["bbox"] = list(b)
    head["crs"] = _CRS84
    prefix = json.dumps(head, ensure_ascii=False)[:-1]  # open the object
    with open(path, "w", encoding="utf-8") as fh:
        fh.write(prefix + ', "features": [')
        first = True
        for row in df.select(feature.alias("f")).toLocalIterator():
            fh.write(("" if first else ", ") + row["f"])
            first = False
        fh.write("]}")
    return path


def _txn_fields(df: DataFrame, date: str, amount: str, payee: str,
                desc: str, key: str):
    """Typed transaction projection shared by the ofx/qif writers:
    (date, amount, name, memo, fitid) with stable per-row ids —
    the provided ``key`` column, else a deterministic md5 of the
    transaction fields (what makes a re-export idempotent for OFX
    consumers, which dedupe on FITID)."""
    import pyspark.sql.functions as F

    cols = df.columns
    for c in (date, amount):
        if c not in cols:
            raise ValueError(
                f"ofx/qif export needs '{date}'/'{amount}' columns; "
                f"have {cols}")
    d = F.to_date(date)
    name = F.col(payee) if payee in cols else F.lit(None).cast("string")
    memo = F.col(desc) if desc in cols else F.lit(None).cast("string")
    fitid = (F.col(key).cast("string") if key in cols else
             F.md5(F.concat_ws("|", d.cast("string"),
                               F.col(amount).cast("string"), name, memo)))
    return df.select(
        F.date_format(d, "yyyyMMdd").alias("d8"),
        F.date_format(d, "MM/dd/yyyy").alias("dq"),
        F.col(amount).cast("decimal(18,2)").cast("string").alias("amt"),
        F.when(F.col(amount).cast("double") < 0, "DEBIT")
        .otherwise("CREDIT").alias("ttype"),
        name.alias("name"), memo.alias("memo"), fitid.alias("fitid"))


def _write_qif(df: DataFrame, path: str, date: str = "date",
               amount: str = "amount", payee: str = "payee",
               desc: str = "desc", key: str = "id",
               atype: str = "Bank") -> str:
    """QIF (public Quicken Interchange Format): one ``!Type:`` header
    then D/T/P/M records terminated by ``^``.  Transaction shaping
    (date/amount/payee/desc columns) mirrors riko's csv2ofx-backed
    target (riko/collections.py:263-270); the serialization is this
    engine's own, pinned by test_sinks goldens — csv2ofx is optional
    in riko and absent here, so byte-parity is not claimed."""
    txns = _txn_fields(df, date, amount, payee, desc, key)
    with open(path, "w", encoding="utf-8") as fh:
        fh.write(f"!Type:{atype}\n")
        for r in txns.toLocalIterator():
            fh.write(f"D{r['dq']}\nT{r['amt']}\n")
            if r["name"]:
                fh.write(f"P{r['name']}\n")
            if r["memo"]:
                fh.write(f"M{r['memo']}\n")
            fh.write("^\n")
    return path


def _write_ofx(df: DataFrame, path: str, date: str = "date",
               amount: str = "amount", payee: str = "payee",
               desc: str = "desc", key: str = "id",
               account: str = "N/A", currency: str = "USD") -> str:
    """OFX 1.02 SGML bank statement (public spec): OFXHEADER block +
    BANKMSGSRSV1/STMTTRNRS/STMTRS with one STMTTRN per row (TRNTYPE
    from the amount's sign, DTPOSTED yyyyMMdd, FITID stable per row).
    Same shaping/fencing note as :func:`_write_qif`.  DTSTART/DTEND
    are a distributed min/max aggregate; rows stream through
    ``toLocalIterator`` like the geojson writer."""
    import pyspark.sql.functions as F

    txns = _txn_fields(df, date, amount, payee, desc, key)
    span = txns.agg(F.min("d8"), F.max("d8")).first()
    hdr = ("OFXHEADER:100\nDATA:OFXSGML\nVERSION:102\nSECURITY:NONE\n"
           "ENCODING:UTF-8\nCHARSET:NONE\nCOMPRESSION:NONE\n"
           "OLDFILEUID:NONE\nNEWFILEUID:NONE\n\n")
    with open(path, "w", encoding="utf-8") as fh:
        fh.write(hdr)
        fh.write("<OFX><BANKMSGSRSV1><STMTTRNRS><TRNUID>1"
                 "<STATUS><CODE>0<SEVERITY>INFO</STATUS>"
                 f"<STMTRS><CURDEF>{currency}"
                 f"<BANKACCTFROM><BANKID>{account}<ACCTID>{account}"
                 "<ACCTTYPE>CHECKING</BANKACCTFROM>"
                 f"<BANKTRANLIST><DTSTART>{span[0] or ''}"
                 f"<DTEND>{span[1] or ''}\n")
        for r in txns.toLocalIterator():
            fh.write(f"<STMTTRN><TRNTYPE>{r['ttype']}"
                     f"<DTPOSTED>{r['d8']}<TRNAMT>{r['amt']}"
                     f"<FITID>{r['fitid']}")
            if r["name"]:
                fh.write(f"<NAME>{r['name']}")
            if r["memo"]:
                fh.write(f"<MEMO>{r['memo']}")
            fh.write("</STMTTRN>\n")
        fh.write("</BANKTRANLIST></STMTRS></STMTTRNRS>"
                 "</BANKMSGSRSV1></OFX>\n")
    return path


def export(
    df: DataFrame,
    target: str = "list",
    path: str | None = None,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
    **geo,
):
    """Materialize a pipeline result.  ``list``/``tuple`` collect to the
    driver (riko's default — only sane for small finals); file targets
    write distributed datasets."""
    if target in ("list", "tuple"):
        rows = [r.asDict(recursive=True) for r in df.collect()]
        return rows if target == "list" else tuple(rows)
    if path is None:
        raise ValueError(f"export target {target!r} requires path=")
    if target == "geojson":
        return _write_geojson(df, path, **geo)
    if target == "geojsonl":
        feature, _ = _feature_json(df, **geo)
        df.select(feature).write.mode(mode).text(path)
        return path
    if target == "qif":
        return _write_qif(df, path, **geo)
    if target == "ofx":
        return _write_ofx(df, path, **geo)
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if target == "json":
        writer.json(path)
    elif target == "csv":
        writer.option("header", "true").csv(path)
    elif target == "parquet":
        writer.parquet(path)
    else:
        raise ValueError(f"unknown export target {target!r}; supported: {TARGETS}")
    return path
