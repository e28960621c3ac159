"""Structural / numeric / date / URL transformer pipes.

Reference conf vocabularies reproduced:
  rename       riko/modules/rename.py:51-56 (copy/rename/delete)
  typecast     riko/modules/typecast.py:34-64
  simplemath   riko/modules/simplemath.py:47-83 (Decimal arithmetic)
  dateformat   riko/modules/dateformat.py:49-73 (strftime)
  datebuilder  riko/modules/datebuilder.py:46-91 (+riko/cast.py:217-272)
  urlbuilder   riko/modules/urlbuilder.py:73-121
  urlparse     riko/modules/urlparse.py:36-68
  subelement   riko/modules/subelement.py:67-103
  itembuilder  riko/modules/itembuilder.py:48-77
  udf          riko/modules/udf.py:32-61 (the user extension point)
"""

from __future__ import annotations

from collections.abc import Callable
from urllib.parse import urlencode

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame
from pyspark.sql.types import StringType, TimestampType

from riko_spark.functions.casts import cast_with_default
from riko_spark.operators import register
from riko_spark.operators.options import apply_multi, apply_scalar

_DEC = "decimal(38,18)"


def _listize(rules) -> list[dict]:
    return [rules] if isinstance(rules, dict) else list(rules or [])


# ---------------------------------------------------------------- rename

@register("rename")
def rename_op(df: DataFrame, conf: dict, skip_if=None) -> DataFrame:
    """Per rule {field, newval, copy}: copy/rename/delete a column.

    ``skip_if`` (SQL boolean expr / Column) applies riko's option-layer
    skip per ROW: where the predicate holds the copied value passes
    through unchanged (existing target value, else NULL).  Because a
    column can't be dropped for a subset of rows, ``skip_if`` is only
    supported for copy rules — rename/delete rules with a skip
    predicate raise.  A ``field`` absent from the frame copies as NULL,
    matching riko's ``item.get`` semantics (DotDict: missing key →
    None, e.g. kazeeki's ``y:published`` → ``k:posted``)."""
    from riko_spark.operators.options import apply_scalar

    def resolve(frame: DataFrame, field: str):
        """riko ``item.get`` semantics: exact column (backtick-quoted —
        a flat column literally named 'a.b' wins over path resolution,
        like DotDict's exact-key check), else a struct path WALKED
        against the schema (a missing leaf under an existing struct is
        None, never an AnalysisException), else NULL."""
        from pyspark.sql.types import StructType

        if field in frame.columns:
            return F.col(f"`{field}`")
        parts = field.split(".")
        dtype = frame.schema
        for p in parts:
            if not isinstance(dtype, StructType) or p not in dtype.names:
                return F.lit(None)
            dtype = dtype[p].dataType
        return F.col(field)

    def drop_path(frame: DataFrame, field: str) -> DataFrame:
        """riko key-removal semantics for the delete half: exact column
        first (a flat column literally named 'a.b'), else a struct path
        removed via dropFields so nested renames/deletes actually drop
        the source subfield.  A parent struct whose LAST field is being
        removed is dropped whole (Spark has no empty struct; riko would
        leave ``{}`` — divergence documented).  Absent paths no-op,
        matching ``DotDict.pop(key, None)``."""
        from pyspark.sql.types import StructType

        if field in frame.columns:
            return frame.drop(field)
        parts = field.split(".")
        if len(parts) == 1:
            return frame
        dtype: object = frame.schema
        for p in parts:
            if not isinstance(dtype, StructType) or p not in dtype.names:
                return frame  # path absent: nothing to remove
            dtype = dtype[p].dataType
        parent_t = frame.schema
        for p in parts[:-1]:
            parent_t = parent_t[p].dataType
        if len(parent_t.names) == 1:
            return drop_path(frame, ".".join(parts[:-1]))
        top, rest = parts[0], ".".join(parts[1:])
        return frame.withColumn(top, F.col(f"`{top}`").dropFields(rest))

    out = df
    for rule in _listize(conf.get("rule")):
        field, newval, copy = rule["field"], rule.get("newval"), rule.get("copy")
        if skip_if is not None and not (copy and newval):
            raise ValueError("rename: skip_if is only supported for copy rules")
        src = resolve(out, field)
        if newval:
            out = apply_scalar(out, src, assign=newval, skip_if=skip_if)
        if not copy and (newval or not rule.get("newval")):
            # riko removes the source key unless copy=True; a rule with
            # no newval is a pure delete
            out = drop_path(out, field) if (newval != field) else out
    return out


# -------------------------------------------------------------- typecast

@register("typecast")
def typecast_op(
    df: DataFrame, conf: dict, field: str = "content",
    assign: str = "typecast", emit: bool = False, skip_if=None,
) -> DataFrame:
    result = cast_with_default(F.col(field), conf.get("type", "text"))
    return apply_scalar(df, result, assign=assign, emit=emit, skip_if=skip_if)


# ------------------------------------------------------------ simplemath

@register("simplemath")
def simplemath_op(
    df: DataFrame, conf: dict, field: str = "content",
    assign: str = "simplemath", emit: bool = False, skip_if=None,
) -> DataFrame:
    """Binary Decimal arithmetic vs ``other`` (literal or ``{subkey}``
    field ref).  riko casts both sides to Decimal; divide-by-zero in
    Spark yields NULL (ANSI off) vs riko's exception — documented."""
    other = conf["other"]
    if isinstance(other, dict) and "subkey" in other:
        y: Column = F.col(other["subkey"]).try_cast(_DEC)
    else:
        y = F.lit(str(other)).try_cast(_DEC)
    x = F.col(field).try_cast(_DEC)
    op = conf["op"]
    ops: dict[str, Callable[[], Column]] = {
        "add": lambda: x + y,
        "subtract": lambda: x - y,
        "multiply": lambda: x * y,
        "divide": lambda: x / y,
        "mean": lambda: (x + y) / F.lit(2),
        "floor": lambda: F.floor(x / y).cast(_DEC),
        "modulo": lambda: x % y,
        "power": lambda: F.pow(x.cast("double"), y.cast("double")).try_cast(_DEC),
    }
    if op not in ops:
        raise ValueError(f"unknown simplemath op: {op!r}")
    return apply_scalar(df, ops[op](), assign=assign, emit=emit, skip_if=skip_if)


# ------------------------------------------------------------ dateformat

# strftime -> Java DateTimeFormatter pattern translation for the
# directives riko's doctests exercise
_STRFTIME_MAP = [
    ("%Y", "yyyy"), ("%y", "yy"), ("%m", "MM"), ("%d", "dd"),
    ("%H", "HH"), ("%I", "hh"), ("%M", "mm"), ("%S", "ss"),
    ("%B", "MMMM"), ("%b", "MMM"), ("%A", "EEEE"), ("%a", "EEE"),
    ("%j", "DDD"), ("%p", "a"), ("%z", "Z"),
]


def strftime_to_java(fmt: str) -> str:
    out = fmt
    for py, java in _STRFTIME_MAP:
        out = out.replace(py, java)
    return out


@register("dateformat")
def dateformat_op(
    df: DataFrame, conf: dict, field: str = "content",
    assign: str = "dateformat", emit: bool = False, skip_if=None,
) -> DataFrame:
    fmt = strftime_to_java(conf.get("format", "%m/%d/%Y"))
    result = F.date_format(F.col(field).try_cast("timestamp"), fmt)
    return apply_scalar(df, result, assign=assign, emit=emit, skip_if=skip_if)


# ----------------------------------------------------------- datebuilder

@F.pandas_udf(TimestampType())
def _dateutil_parse_udf(texts: pd.Series) -> pd.Series:
    """Arbitrary-format date parsing (riko parses via dateutil —
    riko/modules/datebuilder.py:46-91); NaT on failure, matching riko's
    never-raise coercion."""
    from dateutil import parser as _dp

    def one(t):
        if t is None:
            return None
        try:
            return _dp.parse(t)
        except (ValueError, OverflowError):
            return None

    return texts.map(one)


@register("datebuilder")
def datebuilder_op(
    df: DataFrame, conf: dict | None = None, field: str = "content",
    assign: str = "datebuilder", emit: bool = False, skip_if=None,
) -> DataFrame:
    """Text → timestamp, honoring riko's named/relative forms
    ('today', 'tomorrow', '±N days' — riko/cast.py:217-272) relative to
    ``current_timestamp``, then a native cast, then dateutil for the
    arbitrary formats riko accepts (riko/modules/datebuilder.py:46-91
    parses via dateutil — e.g. the doctest's US-style '12/2/2014')."""
    col = F.col(field).cast("string")
    low = F.lower(col)
    now = F.current_timestamp()
    rel_days = F.regexp_extract(low, r"^(-?\d+)\s+days?$", 1)
    result = (
        F.when(low == "today", F.date_trunc("day", now))
        .when(low == "now", now)
        .when(low == "tomorrow", F.date_trunc("day", F.date_add(now, 1)).cast("timestamp"))
        .when(low == "yesterday", F.date_trunc("day", F.date_sub(now, 1)).cast("timestamp"))
        .when(rel_days != "", now + F.make_dt_interval(F.coalesce(rel_days.try_cast("int"), F.lit(0))))
        .otherwise(F.coalesce(col.try_cast("timestamp"), _dateutil_parse_udf(col)))
    )
    return apply_scalar(df, result, assign=assign, emit=emit, skip_if=skip_if)


# ------------------------------------------------------------ urlbuilder

@register("urlbuilder")
def urlbuilder_op(
    df: DataFrame | None, conf: dict, assign: str = "urlbuilder",
    emit: bool = False, skip_if=None, spark=None,
) -> DataFrame:
    """base + '/'-joined paths + urlencoded params.  Params with
    ``subkey`` pull their value from a column; everything else is a
    plan-time literal (riko/modules/urlbuilder.py:73-121)."""
    if df is None:  # source mode: one literal row (riko emit-style source)
        from pyspark.sql import SparkSession

        df = (spark or SparkSession.getActiveSession()).range(1).drop("id")
        emit = True
    base = str(conf["base"]).rstrip("/")
    path = conf.get("path")
    paths = [path] if isinstance(path, str) else list(path or [])
    paths = [p for p in paths if str(p)]  # riko: urljoin(base, '') == base
    url = F.lit(base + ("/" + "/".join(str(p) for p in paths) if paths else ""))
    params = _listize(conf.get("param"))
    static = [(p["key"], p["value"]) for p in params if p.get("key") and "subkey" not in p]
    dynamic = [(p["key"], p["subkey"]) for p in params if p.get("key") and "subkey" in p]
    if static and not dynamic:
        url = F.concat(url, F.lit("?" + urlencode(static)))
    elif dynamic:
        parts = [F.lit(urlencode(static))] if static else []
        for k, subkey in dynamic:
            kv = F.concat(F.lit(k + "="), F.url_encode(F.col(subkey).cast("string")))
            parts.append(kv)
        qs = F.concat_ws("&", *parts)
        url = F.concat(url, F.lit("?"), qs)
    ext = conf.get("ext")
    if ext:
        # riko: substitute invalid filename chars in the WHOLE url with
        # '_' then append '.ext' (riko/modules/urlbuilder.py:115-117,
        # INVALID_FILECHAR_PATTERN riko/utils.py:121)
        url = F.concat(
            F.regexp_replace(url, r'[<>:"/\\|*?%]', "_"), F.lit(f".{ext}")
        )
    return apply_scalar(df, url, assign=assign, emit=emit, skip_if=skip_if)


# -------------------------------------------------------------- urlparse

_URL_COMPONENTS = ["scheme", "netloc", "path", "params", "query", "fragment"]


@register("urlparse")
def urlparse_op(
    df: DataFrame, conf: dict | None = None, field: str = "content",
    emit: bool = True, skip_if=None,
) -> DataFrame:
    """One row per URL component, Python ``urlparse`` naming
    (riko/modules/urlparse.py:36-68).  Native ``parse_url`` covers
    scheme/netloc/path/query/fragment; ``params`` (the rare ``;``
    segment) is a regexp."""
    parse_key = (conf or {}).get("parse_key", "content")
    url = F.col(field).cast("string")
    # Python urlparse tolerates characters the JVM URI parser rejects
    # (e.g. spaces), so the components are regex-derived in Python's
    # decomposition order: fragment, query, scheme, netloc, path, params
    fragment = F.regexp_extract(url, r"#(.*)$", 1)
    no_frag = F.regexp_replace(url, r"#.*$", "")
    query = F.regexp_extract(no_frag, r"\?(.*)$", 1)
    no_query = F.regexp_replace(no_frag, r"\?.*$", "")
    scheme = F.lower(F.regexp_extract(no_query, r"^([A-Za-z][A-Za-z0-9+.\-]*):", 1))
    after = F.when(
        scheme != "", F.substring(no_query, F.length(scheme) + 2, F.lit(2**31 - 1))
    ).otherwise(no_query)
    netloc = F.when(after.startswith("//"), F.regexp_extract(after, r"^//([^/?#]*)", 1)).otherwise(F.lit(""))
    full_path = F.when(
        after.startswith("//"), F.regexp_replace(after, r"^//[^/?#]*", "")
    ).otherwise(after)
    params = F.regexp_extract(full_path, r";([^/]*)$", 1)
    path = F.regexp_replace(full_path, r";[^/]*$", "")
    comps = {
        "scheme": scheme,
        "netloc": netloc,
        "path": path,
        "params": params,
        "query": query,
        "fragment": fragment,
    }
    pairs = F.array(*[
        F.struct(F.lit(c).alias("component"), comps[c].alias(parse_key))
        for c in _URL_COMPONENTS
    ])
    exploded = df.withColumn("__c", F.explode(pairs))
    out = exploded.select(F.col("__c.component").alias("component"), F.col(f"__c.{parse_key}").alias(parse_key))
    if not emit:
        out = exploded.select(*df.columns, "__c.component", f"__c.{parse_key}")
    return out


# ------------------------------------------------------------ subelement

@register("subelement")
def subelement_op(
    df: DataFrame, conf: dict, emit: bool = True, skip_if=None, count: str = "all",
) -> DataFrame:
    """Descend a dotted path; one row per leaf value
    (riko/modules/subelement.py:67-103).  Arrays along the path are
    flattened; scalars become single-element arrays."""
    path = conf["path"]
    path = path if isinstance(path, str) else ".".join(path)
    token_key = conf.get("token_key", "content")
    col = F.col(path)
    dtype = df.select(col.alias("__x")).schema[0].dataType.simpleString()
    if dtype.startswith("array<array"):
        arr = F.flatten(col)
    elif dtype.startswith("array"):
        arr = col
    else:
        arr = F.array(col)
    return apply_multi(df, arr, assign=token_key, emit=emit, skip_if=skip_if, count=count)


# ----------------------------------------------------------- itembuilder

@register("itembuilder", sub_kind="source")
def itembuilder_op(df: DataFrame | None, conf: dict, emit: bool = True, spark=None) -> DataFrame:
    """Build item columns from literal attrs (riko/modules/
    itembuilder.py:48-77).  Operates per input row (riko's loopable
    source); with no input it emits one literal item."""
    if df is None:
        from pyspark.sql import SparkSession

        df = (spark or SparkSession.getActiveSession()).range(1).drop("id")
        emit = True
    attrs: list[tuple[str, Column]] = []
    for attr in _listize(conf.get("attrs")):
        key = attr["key"]
        value = attr.get("value")
        if isinstance(value, dict) and "subkey" in value:
            attrs.append((key, F.col(value["subkey"])))
        else:
            attrs.append((key, F.lit(value)))
    # dotted keys create nested structs (riko DotDict.__setitem__,
    # riko/dotdict.py:525-563)
    tree: dict = {}
    for key, col in attrs:
        node = tree
        parts = key.split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = col

    def build(node):
        return F.struct(*[
            (build(v) if isinstance(v, dict) else v).alias(k) for k, v in node.items()
        ])

    cols = [
        (build(v) if isinstance(v, dict) else v).alias(k) for k, v in tree.items()
    ]
    return df.select(*cols) if emit else df.select("*", *cols)


# ------------------------------------------------------------------ udf

@register("udf")
def udf_op(df: DataFrame, conf: dict | None = None, func=None, schema=None) -> DataFrame:
    """Arbitrary ``func(pandas.DataFrame) -> pandas.DataFrame`` applied
    per Arrow batch — the engine's user extension point
    (riko/modules/udf.py:32-61), distributed via ``mapInPandas``."""
    if func is None or schema is None:
        raise ValueError("udf requires func= and schema=")

    def gen(batches):
        for pdf in batches:
            yield func(pdf)

    return df.mapInPandas(gen, schema)


# ----------------------------------------------------------- exchangerate

def parse_rates_feed(source, currency: str = "USD", precision: int = 6) -> list[tuple]:
    """Parse a rates feed into (from_currency, exchangerate) pairs with
    the reference's exact arithmetic (riko/modules/exchangerate.py:
    64-97 ``parse_response``/``calc_rate``): rates are USD-based; the
    cross rate from X to ``currency`` is
    ``1 / (rates[X] / rates[currency])`` quantized to ``precision``
    decimal places (Decimal, not float).

    ``source``: a path to a rates JSON document (openexchangerates
    shape, ``{"rates": {CUR: number}}``), a JSON string, or an
    already-parsed dict.  The dimension is tiny (~170 currencies) so it
    is computed driver-side and broadcast — the 100 TB-correct shape
    for a per-row lookup against a static dim.
    """
    import json as _json
    from decimal import Decimal

    if isinstance(source, str):
        if source.lstrip().startswith("{"):
            doc = _json.loads(source)
        else:
            with open(source, encoding="utf-8") as fh:
                doc = _json.load(fh)
    else:
        doc = source
    raw = (doc or {}).get("rates", doc or {})
    # parse_response: Decimal via str (exact), drop falsy entries
    rates = {k: Decimal(str(v)) for k, v in raw.items() if v}
    places = Decimal(10) ** -int(precision)
    out = []
    for cur, usd_to_cur in rates.items():
        if cur == currency:
            rate = Decimal(1)
        elif currency == "USD":
            rate = usd_to_cur
        else:
            to_rate = rates.get(currency)
            if not to_rate:
                continue  # target currency missing from the feed
            rate = usd_to_cur / to_rate
        out.append((cur, (Decimal(1) / rate).quantize(places)))
    return out


@register("exchangerate")
def exchangerate_op(
    df: DataFrame, conf: dict | None = None, field: str = "content",
    assign: str = "exchangerate", rates: DataFrame | None = None,
    emit: bool = False, skip_if=None, spark=None,
) -> DataFrame:
    """Cross-rate lookup against a small rates dimension — broadcast
    join (riko fetches a rates JSON per item batch; riko/modules/
    exchangerate.py:162-209 fetch+parse, :86-97 cross-rate math).

    Either pass a prebuilt ``rates`` DataFrame (currency, rate) or a
    ``conf`` with the reference's keys: ``url`` (path to the rates
    JSON), ``currency`` (exchanging-to, default USD), ``precision``
    (default 6).  Unknown currencies yield NULL (riko yields Decimal
    NaN, unrepresentable in a decimal column — documented divergence).
    """
    conf = conf or {}
    if rates is None:
        url = conf.get("url")
        if not url:
            raise ValueError("exchangerate requires a rates DataFrame or conf['url']")
        precision = int(conf.get("precision", 6))
        pairs = parse_rates_feed(url, str(conf.get("currency", "USD")), precision)
        session = spark or df.sparkSession
        rates = session.createDataFrame(
            [(c, str(r)) for c, r in pairs], "currency string, rate string"
        ).select("currency", F.col("rate").cast(f"decimal(28,{precision})").alias("rate"))
    joined = df.join(
        F.broadcast(rates.withColumnRenamed("currency", "__cur")),
        F.col(field) == F.col("__cur"),
        "left",
    ).drop("__cur")
    return joined.withColumnRenamed("rate", assign)


# ---------------------------------------------------------------- input

def bind_input(conf: dict, inputs: dict | None = None):
    """Plan-build-time parameter binding (riko/modules/input.py:72-107):
    resolve a named runtime parameter from ``inputs`` or the default,
    cast per riko's CastType vocabulary.  Returns a Python literal —
    used by the DAG compiler, never a data-plane op."""
    from riko_spark.plans.confs import cast_literal

    key = conf.get("input_key") or conf.get("name") or "input"
    value = (inputs or {}).get(key, conf.get("default"))
    if "type" not in conf:
        # conf values were already typed by normalize_conf's
        # {"type","value"} unwrapping — don't re-cast to text
        return value
    return cast_literal(value, conf["type"])
