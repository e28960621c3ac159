"""Webtext source/extract pipes over the canonical pages table.

The reference's source pipes fetch URLs one at a time
(riko/utils.py:517-560 ``Fetch``); at 10^12-document scale the
equivalent is a table scan: pages already live in an Iceberg/parquet
table with schema (url, warc_ts, html, text, lang) and the "fetch"
pipes become projections/extractions over it.

  fetch / fetchdata / fetchtext / fetchtable / csv →
      ``spark.read`` wrappers (format by conf)
  fetchpage → ``extract`` — the reference-parity HTML slice/detag over
      the ``html`` column (riko/modules/fetchpage.py:103-139); the
      byte-identical-per-url invariant lives here
  feedautodiscovery → ``discover_feeds`` — explode RSS link hrefs
      (riko/modules/feedautodiscovery.py:99-137, riko/autorss.py)
  xpathfetchpage → native ``xpath`` for XML; html5-lite DOM
      (riko_spark.functions.htmlpath, the lxml/html5lib stand-in) for
      messy HTML — source mode and per-row mode
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from riko_spark.functions.text import extract_text_udf, find_feed_links_udf
from riko_spark.operators import register
from riko_spark.operators.options import apply_scalar


RSS_ENTRY_SCHEMA = (
    "title STRING, link STRING, description STRING, pubDate STRING, "
    "guid STRING, author STRING"
)


def _resolve(url: str) -> str:
    """file:// strip + relative-path resolution against
    $RIKO_SPARK_DATA_ROOT (the reference pipe defs use paths like
    ``file://riko/data/feed.xml``)."""
    import os

    path = url.removeprefix("file://")
    if not os.path.isabs(path) and not os.path.exists(path):
        root = os.environ.get("RIKO_SPARK_DATA_ROOT", "")
        if root:
            # bare data-file names resolve like riko's get_path
            # (riko/__init__.py: <pkg>/data/<name>)
            for cand in (os.path.join(root, path),
                         os.path.join(root, "riko", "data", path)):
                if os.path.exists(cand):
                    return cand
    return path


def rss_entries(spark: SparkSession, url: str) -> DataFrame:
    """RSS/Atom feed → one row per entry, riko item shape
    (riko/parsers.py parse_rss + riko/utils.py:1045-1087
    augment_entries: title/link/summary/pubDate/guid/author).
    Native: wholetext read → item-block extraction → ``from_xml``."""
    raw = spark.read.text(_resolve(url), wholetext=True)
    blocks = F.regexp_extract_all(
        "value", F.lit(r"(?s)<(?:item|entry)[ >].*?</(?:item|entry)>"), 0
    )
    items = raw.select(F.explode(blocks).alias("__xml"))
    parsed = items.select(F.from_xml("__xml", RSS_ENTRY_SCHEMA).alias("e"))
    return parsed.select(
        F.col("e.title").alias("title"),
        F.col("e.link").alias("link"),
        F.col("e.description").alias("summary"),
        F.col("e.pubDate").alias("pubDate"),
        F.col("e.guid").alias("guid"),
        F.col("e.author").alias("author"),
    )


@register("fetch", sub_kind="source")
def fetch_op(df: DataFrame | None, conf: dict, spark: SparkSession | None = None) -> DataFrame:
    """Read a table/dataset; conf: {url, format?}.  file:// and bare
    paths supported (http fetch is out of scope in-sandbox); ``.xml``
    urls take the RSS/Atom entry path like riko's fetch pipe."""
    spark = spark or SparkSession.getActiveSession()
    urls = conf["url"]
    if isinstance(urls, list):  # multi-source fetch: bag union of feeds
        from functools import reduce

        frames = [fetch_op(df, {**conf, "url": u}, spark=spark) for u in urls]
        return reduce(lambda a, b: a.unionByName(b, allowMissingColumns=True), frames)
    url = _resolve(urls)
    fmt = conf.get("format")
    if fmt is None:
        ext = url.rsplit(".", 1)[-1].lower()
        fmt = {"xml": "rss", "csv": "csv", "json": "json", "txt": "text"}.get(ext, "parquet")
    if fmt in ("rss", "atom", "xml"):
        return rss_entries(spark, url)
    reader = spark.read
    if fmt == "csv":
        return reader.csv(url, header=bool(conf.get("has_header", True)),
                          sep=conf.get("delimiter", ","))
    if fmt == "json":
        return reader.option("multiLine", "true").json(url)
    if fmt == "text":
        return reader.text(url)
    return reader.parquet(url)


@register("fetchdata", sub_kind="source")
def fetchdata_op(df: DataFrame | None, conf: dict, spark: SparkSession | None = None) -> DataFrame:
    """JSON fetch + descend ``path`` (riko/modules/fetchdata.py:92-130):
    read json, explode the array at the dotted path."""
    spark = spark or SparkSession.getActiveSession()
    out = spark.read.option("multiLine", "true").json(_resolve(conf["url"]))
    path = conf.get("path")
    if path:
        col = F.col(path)
        dtype = out.select(col.alias("__x")).schema[0].dataType.simpleString()
        if dtype.startswith("array"):
            out = out.select(F.explode(col).alias("__row")).select("__row.*")
        else:
            out = out.select(F.col(f"{path}.*"))
    return out


@register("fetchtext", sub_kind="source")
def fetchtext_op(df: DataFrame | None, conf: dict, spark: SparkSession | None = None) -> DataFrame:
    """One item per stripped line (riko/modules/fetchtext.py:85-118)."""
    spark = spark or SparkSession.getActiveSession()
    out = spark.read.text(_resolve(conf["url"]))
    return out.select(F.regexp_replace("value", r"^\s+|\s+$", "").alias("content"))


@register("csv", sub_kind="source")
def csv_op(df: DataFrame | None, conf: dict, spark: SparkSession | None = None) -> DataFrame:
    spark = spark or SparkSession.getActiveSession()
    reader = spark.read.option("header", str(bool(conf.get("has_header", True))).lower())
    if conf.get("delimiter"):
        reader = reader.option("sep", conf["delimiter"])
    if conf.get("skip_rows"):
        reader = reader.option("skipLines", int(conf["skip_rows"]))
    out = reader.csv(_resolve(conf["url"]))
    col_names = conf.get("col_names")
    if col_names:
        # riko csv: col_names override the header positionally
        # (riko/modules/csv.py:100-135)
        out = out.toDF(*[str(c) for c in col_names[: len(out.columns)]])
    return out


@register("fetchtable", sub_kind="source")
def fetchtable_op(df: DataFrame | None, conf: dict, spark: SparkSession | None = None) -> DataFrame:
    """Tabular fetch (riko/modules/fetchtable.py:102-138 reads
    csv/xls/json/geojson via meza): csv/json/parquet by extension;
    .geojson FeatureCollections explode to one row per feature (id +
    lon/lat lifted from Point geometries, properties flattened —
    meza ``read_geojson``'s record shape, the inverse of
    ``sinks.export(df, 'geojson')``); .xlsx via the dependency-free
    SpreadsheetML reader (functions/xlsx.py) and legacy binary .xls
    via the BIFF8/CFB reader (functions/xls.py) — driver-side parse,
    tables riko fetches this way are small dims."""
    spark = spark or SparkSession.getActiveSession()
    url = _resolve(conf["url"])
    ext = url.rsplit(".", 1)[-1].lower()
    if ext in ("xlsx", "xls"):
        if ext == "xlsx":
            from riko_spark.functions.xlsx import read_xlsx as read_sheet
        else:
            from riko_spark.functions.xls import read_xls as read_sheet

        rows = read_sheet(url, sheet=int(conf.get("sheet", 1)),
                          header=bool(conf.get("has_header", True)))
        if not rows:
            return spark.createDataFrame([], "col0 string")
        keys = list(rows[0])
        data = [tuple(None if r.get(k) is None else str(r.get(k)) for k in keys)
                for r in rows]
        return spark.createDataFrame(data, ", ".join(f"`{k}` string" for k in keys))
    if ext == "geojson":
        fc = spark.read.option("multiLine", "true").json(url)
        feats = fc.select(F.explode("features").alias("f")).select("f.*")
        cols = [F.col("id")] if "id" in feats.columns else []
        geom = dict(feats.dtypes).get("geometry", "")
        if "coordinates:array<double>" in geom.replace(" ", ""):
            # homogeneous Point collection: lift coordinates to lon/lat
            cols += [F.col("geometry.coordinates")[0].alias("lon"),
                     F.col("geometry.coordinates")[1].alias("lat")]
        else:
            cols += [F.col("geometry")]  # mixed/nested geometries: as-is
        return feats.select(*cols, "properties.*")
    if ext == "json":
        return spark.read.option("multiLine", "true").json(url)
    if ext == "parquet":
        return spark.read.parquet(url)
    reader = spark.read.option("header", "true")
    if conf.get("skip_rows"):
        reader = reader.option("skipLines", int(conf["skip_rows"]))
    return reader.csv(url)


@register("fetchpage")
@register("extract")
def extract_op(
    df: DataFrame, conf: dict | None = None, field: str = "html",
    assign: str = "content", emit: bool = False, skip_if=None,
) -> DataFrame:
    """The fetchpage analog: slice html between ``start``/``end``
    markers, optionally detag, strip — byte-identical per url to the
    reference chain (riko/modules/fetchpage.py:45-53,103-139;
    riko/parsers.py:113-174).  Arrow-batched pandas UDF.

    With ``token`` the extracted text splits into one item per piece,
    each stripped, empties kept (riko/modules/fetchpage.py:99-100
    ``detagged.split(token)`` + ``map(str.strip, ...)``)."""
    conf = conf or {}
    udf = extract_text_udf(
        start=conf.get("start", "<body>"),
        end=conf.get("end", "</body>"),
        detag=bool(conf.get("detag", True)),
    )
    result = udf(F.col(field))
    token = conf.get("token")
    if token:
        from riko_spark.operators.options import apply_multi

        py_ws = " \t\n\r\x0b\x0c"
        pieces = F.transform(
            F.split(result, "\\Q" + str(token) + "\\E", -1),
            lambda x: F.btrim(x, F.lit(py_ws)),
        )
        return apply_multi(df, pieces, assign=assign, emit=emit,
                           skip_if=skip_if, count="all")
    return apply_scalar(df, result, assign=assign, emit=emit, skip_if=skip_if)


@register("feedautodiscovery")
def discover_feeds_op(
    df: DataFrame, conf: dict | None = None, field: str = "html",
    assign: str = "link", emit: bool = True,
) -> DataFrame:
    """Explode every RSS-ish link href found in the page
    (riko/modules/feedautodiscovery.py:99-137)."""
    exploded = df.withColumn(assign, F.explode(find_feed_links_udf(F.col(field))))
    return exploded.select(assign) if emit else exploded


def _item_rows(items: list) -> tuple[list, str]:
    """Normalize etree2dict-shaped items (str / nested dict values) to a
    unified (rows, ddl-schema) pair for createDataFrame: keys merged
    across items, nested dicts become structs, anything exotic (lists
    of repeated tags) is JSON-encoded."""
    import json as _json

    def norm(v):
        if isinstance(v, dict):
            return {k: norm(x) for k, x in v.items()}
        if isinstance(v, str) or v is None:
            return v
        return _json.dumps(v, ensure_ascii=False)

    items = [i if isinstance(i, dict) else {"content": i} for i in items]
    items = [norm(i) for i in items]

    def merge_schema(vals):
        sub: dict = {}
        has_scalar = False
        for v in vals:
            if isinstance(v, dict):
                for k, x in v.items():
                    sub.setdefault(k, []).append(x)
            elif v is not None:
                has_scalar = True
        if sub and has_scalar:  # mixed shapes: stringify
            return "string"
        if not sub:
            return "string"
        return "struct<" + ", ".join(
            f"{k}: {merge_schema(xs)}" for k, xs in sorted(sub.items())
        ) + ">"

    keys = sorted({k for i in items for k in i})
    fields = []
    for k in keys:
        vals = [i.get(k) for i in items]
        fields.append((k, merge_schema(vals)))
    ddl = ", ".join(f"`{k}` {t}" for k, t in fields)

    def to_row(item, field_types):
        out = []
        for k, t in field_types:
            v = item.get(k)
            if t.startswith("struct<"):
                subkeys = _struct_keys(t)
                out.append(to_row(v if isinstance(v, dict) else {}, subkeys)
                           if v is not None else None)
            else:
                out.append(v if (v is None or isinstance(v, str)) else _json.dumps(v))
        return tuple(out)

    def _struct_keys(t):
        # parse "struct<a: string, b: struct<...>>" one level
        inner = t[len("struct<"):-1]
        parts, depth, cur = [], 0, ""
        for ch in inner:
            if ch == "<":
                depth += 1
            elif ch == ">":
                depth -= 1
            if ch == "," and depth == 0:
                parts.append(cur)
                cur = ""
            else:
                cur += ch
        if cur.strip():
            parts.append(cur)
        out = []
        for p in parts:
            name, _, typ = p.partition(":")
            out.append((name.strip().strip("`"), typ.strip()))
        return out

    rows = [to_row(i, fields) for i in items]
    return rows, ddl


@register("xpathfetchpage")
def xpath_op(
    df: DataFrame | None, conf: dict, field: str = "html",
    assign: str = "content", emit: bool = True,
    spark: SparkSession | None = None,
) -> DataFrame:
    """XPath extraction (riko/modules/xpathfetchpage.py:161-200).

    Source mode (conf has ``url``, like the reference pipe): the page
    is fetched once driver-side, parsed with the dependency-free
    html5-lite DOM (riko_spark.functions.htmlpath — the lxml/html5lib
    stand-in), and each XPath match becomes a row shaped by riko's
    ``etree2dict`` (nested attrs → struct columns, so downstream
    ``subkey`` refs like ``img.src`` resolve as struct fields).

    Per-row mode (an upstream html column): well-formed XML goes
    through Spark's native ``xpath`` expression; ``html5: true`` uses
    the same html5-lite kernel in an Arrow-batched pandas UDF, emitting
    one JSON item per match."""
    xpath = conf["xpath"]
    if df is None or "url" in conf:
        spark = spark or SparkSession.getActiveSession()
        from riko_spark.functions.htmlpath import node_to_item, parse_html, xpath_select

        with open(_resolve(conf["url"]), encoding=conf.get("encoding", "utf-8"),
                  errors="replace") as fh:
            root = parse_html(fh.read())
        items = [node_to_item(m) for m in xpath_select(root, xpath)]
        if not items:
            return spark.createDataFrame([], "content string")
        rows, ddl = _item_rows(items)
        return spark.createDataFrame(rows, ddl)
    col = F.col(field).cast("string")
    if conf.get("html5"):
        import json as _json

        from pyspark.sql.types import ArrayType, StringType

        @F.pandas_udf(ArrayType(StringType()))
        def _hp(html: pd.Series) -> pd.Series:
            from riko_spark.functions.htmlpath import (
                node_to_item, parse_html, xpath_select,
            )

            return html.map(
                lambda h: None if h is None else [
                    _json.dumps(node_to_item(m), ensure_ascii=False, sort_keys=True)
                    for m in xpath_select(parse_html(h), xpath)
                ]
            )

        exploded = df.withColumn(assign, F.explode(_hp(col)))
    else:
        exploded = df.withColumn(assign, F.explode(F.xpath(col, F.lit(xpath))))
    return exploded.select(assign) if emit else exploded


_MAX_FETCH_URLS = 100_000


@register("fetch_join")
def fetch_join_op(df: DataFrame, conf: dict, spark: SparkSession | None = None) -> DataFrame:
    """Data-parallel rewrite of riko's per-item ``loop(embed=fetchdata)``
    (e.g. tests/pypipelines/pipe_125e9fe8... sw_142: fetchdata called
    once PER ROW with ``url={'subkey': 'api'}`` — riko/modules/loop.py
    drives the embedded pipe per item, an IO-per-item pattern).

    Each DISTINCT url is fetched exactly once into a small dimension
    table which broadcast-joins back on the url column — the canonical
    scale-out shape.  The fetch itself is ONE distributed
    ``spark.read.json`` over every resolved file (no per-url driver
    read, no N-way union plan): ``input_file_name()`` recovers which
    url produced each row, and ``posexplode`` of the descend path makes
    ``count='first'`` the array's literal first element (riko loop's
    first item), deterministically.  The distinct-url set is bounded
    (``_MAX_FETCH_URLS``) like any broadcast dim.

    conf: ``url_field`` (column holding the url), ``path`` (fetchdata
    descend path), ``assign`` (struct column for the fetched payload),
    ``count`` ('first' → first fetched item per url; 'all' → one row
    per fetched item).
    """
    import os

    spark = spark or df.sparkSession
    url_field = conf.get("url_field", "url")
    assign = conf.get("assign", "fetch_join")
    count = conf.get("count", "first")
    path = conf.get("path")
    urls = [r[0] for r in
            df.select(url_field).distinct().limit(_MAX_FETCH_URLS + 1).collect()]
    if len(urls) > _MAX_FETCH_URLS:
        raise ValueError(
            f"fetch_join: more than {_MAX_FETCH_URLS} distinct urls — at that "
            "volume ingest the fetched corpus as a table and join it instead"
        )
    resolved = {u: os.path.abspath(_resolve(u)) for u in urls if u is not None}
    if not resolved:
        return df.withColumn(assign, F.lit(None))

    raw = (
        spark.read.option("multiLine", "true")
        .json(sorted(set(resolved.values())))
        .withColumn("__file", F.input_file_name())
    )
    if path:
        col = F.col(path)
        dtype = raw.select(col.alias("__x")).schema[0].dataType.simpleString()
        if dtype.startswith("array"):
            items = raw.select(
                "__file", F.posexplode(col).alias("__pos", "__row")
            ).select("__file", "__pos", "__row.*")
        else:
            items = raw.select("__file", F.lit(0).alias("__pos"),
                               F.col(f"{path}.*"))
    else:
        items = raw.withColumn("__pos", F.lit(0))
    if count == "first":
        items = items.filter(F.col("__pos") == 0)
    payload_cols = [c for c in items.columns if c not in ("__file", "__pos")]
    payload = F.struct(*[F.col(f"`{c}`") for c in payload_cols])
    dim = items.select(F.col("__file"), payload.alias(assign))
    # map file URIs back to the original url strings.  input_file_name()
    # returns a PERCENT-ENCODED URI (spaces → %20 etc), so decode it
    # before comparing against the raw abspath; '+' is pre-escaped to
    # %2B because url_decode is form-decoding ('+' → space) and literal
    # pluses in paths must survive.  The scheme prefix is normalized
    # ('file:/', 'file://', 'file:///' all → '/').
    file_norm = F.regexp_replace(
        F.url_decode(F.regexp_replace(F.col("__file"), r"\+", "%2B")),
        "^file:/+", "/",
    )
    url_map = spark.createDataFrame(
        [(u, p) for u, p in resolved.items()],
        f"`{url_field}__u` string, __path string",
    )
    dim = dim.join(F.broadcast(url_map), file_norm == F.col("__path"))              .select(F.col(f"{url_field}__u").alias("__fetch_url"), assign)
    return (
        df.join(F.broadcast(dim), F.col(url_field) == F.col("__fetch_url"), "left")
        .drop("__fetch_url")
    )


#: anchor-tag regex shared verbatim with the extract_links oracle —
#: double-quoted href only (the planted-corpus and dominant real-page
#: form; single-quoted/bare hrefs are a documented v1 gap), non-greedy
#: [\s\S] body so anchors spanning newlines match in both engines'
#: regex dialects (Java and RE2 agree on this subset)
LINK_RE = r'<a\s[^>]*href\s*=\s*"([^"]*)"[^>]*>([\s\S]*?)</a>'


@register("extract_links")
def extract_links_op(
    df: DataFrame,
    conf: dict | None = None,
    field: str = "html",
    url_col: str = "url",
    id_col: str = "doc_id",
) -> DataFrame:
    """Anchor extraction for the link graph / anchor-text corpus:
    one output row per ``<a href="...">`` tag with the raw href, the
    tag-stripped whitespace-collapsed anchor text, and the href
    resolved against the source URL.

    Resolution covers the deterministic cases: absolute
    (``http(s)://…``) kept; protocol-relative (``//…``) takes the
    source scheme; root-relative (``/…``) takes ``scheme://host``;
    anything else (relative paths, ``mailto:``, fragments) resolves
    to NULL — full RFC 3986 reference resolution needs dot-segment
    handling this op intentionally omits.

    Row-local (two aligned ``regexp_extract_all`` passes over the
    same pattern zipped positionally — one regex scan per page at the
    engine level), shuffle-free; compose with
    :func:`riko_spark.operators.cleaning.url_normalize_op` and
    ``host_stats``/``connected_components`` for the host graph.
    """
    from riko_spark.operators.cleaning import URL_SPLIT_RE, host_col

    conf = conf or {}
    field = conf.get("field", field)
    url_col = conf.get("url_col", url_col)
    id_col = conf.get("id_col", id_col)

    html = F.coalesce(F.col(field), F.lit(""))
    hrefs = F.regexp_extract_all(html, F.lit(LINK_RE), F.lit(1))
    texts = F.regexp_extract_all(html, F.lit(LINK_RE), F.lit(2))
    pairs = df.select(
        F.col(id_col), F.col(url_col),
        F.explode(F.arrays_zip(hrefs.alias("href"), texts.alias("t")))
        .alias("__a"),
    )
    href = F.col("__a.href")
    anchor = F.trim(F.regexp_replace(
        F.regexp_replace(F.col("__a.t"), "<[^>]*>", ""), r"\s+", " "))
    scheme = F.lower(F.regexp_extract(F.col(url_col), URL_SPLIT_RE, 1))
    src_host = host_col(F.col(url_col))
    resolved = (
        F.when(href.rlike("^[Hh][Tt][Tt][Pp][Ss]?://"), href)
        .when(href.startswith("//"), F.concat(scheme, F.lit(":"), href))
        .when(href.startswith("/"),
              F.concat(scheme, F.lit("://"), src_host, href))
    )
    return pairs.select(
        id_col, url_col,
        href.alias("href"),
        anchor.alias("anchor"),
        resolved.alias("resolved"),
    )
