"""Remaining reference pipes: rssitembuilder, fetchsitefeed,
currencyformat, geolocate, forever, timeout, send/receive.

These complete the SURVEY.md §2 inventory.  Citations per operator.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from riko_spark.functions.text import extract_text_udf, find_feed_links_udf
from riko_spark.operators import register
from riko_spark.operators.options import apply_scalar

# riko's RSS key-renaming map (riko/modules/rssitembuilder.py:40-55);
# dotted targets become nested struct fields
_RSS_MAP = {
    "author": "author",
    "description": "description",
    "guid": "y:id",
    "link": "link",
    "pubdate": "pubDate",
    "title": "y:title",
}


@register("rssitembuilder", sub_kind="source")
def rssitembuilder_op(df: DataFrame, conf: dict, emit: bool = True) -> DataFrame:
    """Build an RSS-shaped item: conf keys renamed through the RSS map
    (riko/modules/rssitembuilder.py:59-92).  Values may be literals or
    ``{subkey}`` column refs; media:* nested keys are grouped into a
    ``media_content`` / ``media_thumbnail`` struct."""
    cols = []
    media_thumb, media_content = {}, {}
    for key, value in (conf or {}).items():
        k = key.lower()
        col = (
            F.col(value["subkey"]) if isinstance(value, dict) and "subkey" in value
            else F.lit(value)
        )
        if k.startswith("mediathumb"):
            media_thumb[k.removeprefix("mediathumb").lower()] = col
        elif k.startswith("mediacontent"):
            media_content[k.removeprefix("mediacontent").lower()] = col
        elif k in _RSS_MAP:
            cols.append(col.alias(_RSS_MAP[k].replace("y:", "y_")))
    if media_thumb:
        cols.append(F.struct(*[c.alias(n) for n, c in media_thumb.items()]).alias("media_thumbnail"))
    if media_content:
        cols.append(F.struct(*[c.alias(n) for n, c in media_content.items()]).alias("media_content"))
    return df.select(*cols) if emit else df.select("*", *cols)


@register("fetchsitefeed")
def fetchsitefeed_op(
    df: DataFrame, conf: dict | None = None, field: str = "html",
    assign: str = "feed_url",
) -> DataFrame:
    """Autodiscover the FIRST RSS link on each page
    (riko/modules/fetchsitefeed.py:98-131 — fetches it too; here the
    feed fetch is the downstream join/scan, so this yields the url)."""
    links = find_feed_links_udf(F.col(field))
    return df.withColumn(assign, F.element_at(links, 1))


# CLDR ``en`` currency symbols (the subset the en locale defines; any
# other ISO code falls back to the code itself, exactly like Babel) and
# the CLDR per-currency fraction digits that differ from 2.
_CLDR_EN_SYMBOLS = {
    "USD": "$", "EUR": "€", "GBP": "£", "JPY": "¥", "CNY": "CN¥",
    "AUD": "A$", "BRL": "R$", "CAD": "CA$", "HKD": "HK$", "ILS": "₪",
    "INR": "₹", "KRW": "₩", "MXN": "MX$", "NZD": "NZ$", "TWD": "NT$",
    "VND": "₫", "XAF": "FCFA", "XCD": "EC$", "PHP": "₱", "THB": "THB",
}
_CLDR_DIGITS = {
    "JPY": 0, "KRW": 0, "VND": 0, "CLP": 0, "ISK": 0,
    "BHD": 3, "IQD": 3, "JOD": 3, "KWD": 3, "LYD": 3, "OMR": 3, "TND": 3,
}

# Locale number-format data (engine EXTENSION: the reference hardcodes
# locale='en_US' — riko/modules/currencyformat.py:63 — so only en_US is
# reference-exercised; the rest follow the public CLDR patterns).
# Adding a locale is DATA, not code — every key is declarative:
#   decimal/group   the locale's number punctuation
#   suffix          True = CLDR "#,##0.00 ¤" (symbol after, NBSP-joined)
#   symbols         en-symbol → locale display override (e.g. $ → $US)
#   min_group       CLDR minimumGroupingDigits (es: 2 — no separator
#                   until the integer part exceeds group-size+1 digits:
#                   1234,50 but 12.345,00)
# de_DE: '.'-grouping; fr_FR: narrow-NBSP (U+202F) grouping; es_ES:
# '.'-grouping with min_group 2, USD shown as US$; ja_JP: en-like
# punctuation, prefix symbol, full-width yen (U+FFE5) for JPY.  Babel
# is not available in-container to cross-check; values are
# CLDR-derived and pinned by unit goldens (tests/test_misc_ops.py).
_CLDR_LOCALES = {
    "en_US": {"decimal": ".", "group": ",", "suffix": False, "symbols": {}},
    "de_DE": {"decimal": ",", "group": ".", "suffix": True,
              "symbols": {"$": "$", "¥": "¥"}},
    "fr_FR": {"decimal": ",", "group": " ", "suffix": True,
              "symbols": {"$": "$US", "¥": "JPY"}},
    "es_ES": {"decimal": ",", "group": ".", "suffix": True, "min_group": 2,
              "symbols": {"$": "US$", "¥": "JPY"}},
    "ja_JP": {"decimal": ".", "group": ",", "suffix": False,
              "symbols": {"¥": "￥"}},
    "it_IT": {"decimal": ",", "group": ".", "suffix": True, "min_group": 2,
              "symbols": {"$": "US$", "¥": "JPY"}},
    "pt_BR": {"decimal": ",", "group": ".", "suffix": False,
              "prefix_space": True,
              "symbols": {"$": "US$", "¥": "JP¥"}},
    # round 5: en_GB (en punctuation, native £), nl_NL (CLDR
    # "¤ #,##0.00;¤ -#,##0.00" — prefix symbol AND the minus
    # AFTER it: "€ -10,33"), ru_RU (NBSP grouping, suffix symbol,
    # ₽ for RUB)
    "en_GB": {"decimal": ".", "group": ",", "suffix": False,
              "symbols": {"$": "US$", "¥": "JP¥"}},
    "nl_NL": {"decimal": ",", "group": ".", "suffix": False,
              "prefix_space": True, "sign_after_symbol": True,
              "symbols": {"$": "US$", "¥": "JP¥"}},
    "ru_RU": {"decimal": ",", "group": " ", "suffix": True,
              "symbols": {"RUB": "₽"}},
}


@register("currencyformat")
def currencyformat_op(
    df: DataFrame, conf: dict | None = None, field: str = "content",
    assign: str = "currencyformat", emit: bool = False, skip_if=None,
) -> DataFrame:
    """en_US currency formatting (riko/modules/currencyformat.py:37-69:
    Babel ``format_currency(amount, currency, locale='en_US')`` — the
    locale is ALWAYS en_US in the reference; only symbol and fraction
    digits vary by currency).  Reproduced natively: CLDR en symbols,
    CLDR fraction digits, ``#,##0.##`` grouping via ``format_number``,
    sign before the symbol (``-$10.33``), and CLDR currency spacing
    (NBSP between an alphabetic symbol and the number: ``CHF 100.00``).
    """
    conf = conf or {}
    currency = conf.get("currency", "USD")
    locale = str(conf.get("locale", "en_US"))
    if locale not in _CLDR_LOCALES:
        raise ValueError(
            f"unsupported locale {locale!r}; known: {sorted(_CLDR_LOCALES)}"
        )
    loc = _CLDR_LOCALES[locale]
    amount = F.col(field).try_cast("decimal(38,6)")

    def fmt(symbol: str, digits: int):
        symbol = loc.get("symbols", {}).get(symbol, symbol)
        number = F.format_number(F.abs(amount), digits)
        if loc.get("min_group", 1) > 1:
            # CLDR minimumGroupingDigits (es_ES: 2): separators appear
            # only once the integer part has group-size + min_group
            # digits — min_group=2 → from 10 000 up (1234,50 / 12.345,00).
            # Decide on the FORMATTED digit count, not the raw amount:
            # 9999.995 rounds to 10,000.00 and must keep its separator.
            int_digits = F.length(
                F.translate(F.substring_index(number, ".", 1), ",", "")
            )
            # grouping appears from groupSize(3) + min_group digits up
            number = F.when(int_digits < 3 + loc["min_group"],
                            F.translate(number, ",", "")).otherwise(number)
        if loc["decimal"] != "." or loc["group"] != ",":
            # en grouping ("1,234.50") re-punctuated by simultaneous
            # per-char translate: ','→group, '.'→decimal in one pass
            number = F.translate(number, ",.", loc["group"] + loc["decimal"])
        sign = F.when(amount < 0, F.lit("-")).otherwise(F.lit(""))
        if loc["suffix"]:
            # CLDR "#,##0.00 ¤" pattern (de_DE/fr_FR): NBSP + symbol after
            return F.concat(sign, number, F.lit(" " + symbol))
        # CLDR currencySpacing: insert U+00A0 when the symbol ends in a
        # letter/digit (alphabetic codes), none for $/¥/£-style symbols;
        # prefix_space locales (pt_BR "¤ #,##0.00") always space
        sep = " " if (symbol[-1].isalnum() or loc.get("prefix_space")) else ""
        if loc.get("sign_after_symbol"):
            # CLDR nl-style negative pattern "¤ -#,##0.00": the
            # minus sits between the prefixed symbol and the number
            return F.concat(F.lit(symbol + sep), sign, number)
        return F.concat(sign, F.lit(symbol + sep), number)

    if isinstance(currency, dict) and "subkey" in currency:
        # per-row currency code (riko DynamicConf subkey, e.g. kazeeki's
        # {'currency': {'subkey': 'k:cur_code'}}): format_number needs a
        # literal digit count, so the per-code formats become one CASE
        # chain over the known CLDR codes (still codegen-friendly);
        # unknown codes render as "CODE N.NN" like Babel does for
        # symbol-less currencies
        code = F.col(currency["subkey"]).cast("string")
        formatted = F.concat(
            F.when(amount < 0, F.lit("-")).otherwise(F.lit("")),
            code, F.lit(" "), F.format_number(F.abs(amount), 2),
        )
        for c, sym in _CLDR_EN_SYMBOLS.items():
            formatted = F.when(code == c, fmt(sym, _CLDR_DIGITS.get(c, 2))).otherwise(formatted)
        for c, d in _CLDR_DIGITS.items():
            if c not in _CLDR_EN_SYMBOLS:
                formatted = F.when(
                    code == c,
                    F.concat(F.when(amount < 0, F.lit("-")).otherwise(F.lit("")),
                             F.lit(c + " "), F.format_number(F.abs(amount), d)),
                ).otherwise(formatted)
    else:
        currency = str(currency)
        formatted = fmt(_CLDR_EN_SYMBOLS.get(currency, currency),
                        _CLDR_DIGITS.get(currency, 2))
    result = F.when(amount.isNotNull(), formatted).otherwise(F.lit(None))
    return apply_scalar(df, result, assign=assign, emit=emit, skip_if=skip_if)


@register("geolocate")
def geolocate_op(
    df: DataFrame, conf: dict | None = None, field: str = "content",
    assign: str = "geolocate", emit: bool = False, skip_if=None,
) -> DataFrame:
    """Stubbed geolocation matching the reference's hard-coded lookups
    (riko/cast.py:130-195): coordinates parse "lat,lon"; street/ip
    return the fixed United-States placeholder record.  A real backend
    is a broadcast join against a geo dimension table."""
    loc_type = (conf or {}).get("type", "street_address")
    col = F.col(field).cast("string")
    common = [
        F.lit("United States").alias("country"),
        F.lit("state").alias("admin1"), F.lit("county").alias("admin2"),
        F.lit("city").alias("admin3"), F.lit("city").alias("city"),
    ]
    if loc_type == "ip_address":
        # riko/cast.py:146-156 lookup_ip_address: no lat/lon/street/postal
        result = F.struct(*common)
    else:
        if loc_type == "coordinates":
            lat = F.coalesce(F.trim(F.split(col, ",").getItem(0)).try_cast("double"), F.lit(0.0))
            lon = F.coalesce(F.trim(F.split(col, ",").getItem(1)).try_cast("double"), F.lit(0.0))
        else:  # street_address / currency: fixed placeholder record
            lat, lon = F.lit(0.0), F.lit(0.0)
        result = F.struct(
            lat.alias("lat"), lon.alias("lon"), *common,
            F.lit("street").alias("street"), F.lit("61605").alias("postal"),
        )
    return apply_scalar(df, result, assign=assign, emit=emit, skip_if=skip_if)


@register("forever", sub_kind="source")
def forever_op(df: DataFrame | None, conf: dict | None = None,
               spark: SparkSession | None = None) -> DataFrame:
    """Unbounded driver stream (riko/modules/forever.py:37-64 yields
    ``{'forever': True}`` endlessly) → the rate source, the canonical
    Structured-Streaming unbounded driver.

    ``streaming: false`` gives the batch analog: a bounded driver frame
    (default 1024 rows — riko's laziness means downstream limits bound
    it anyway; a batch plan needs an explicit bound).
    """
    conf = conf or {}
    spark = spark or SparkSession.getActiveSession()
    if not conf.get("streaming", True) or conf.get("limit"):
        n = int(conf.get("limit", 1024))
        return spark.range(n).select(
            F.col("id").alias("event_seq"), F.lit(True).alias("forever")
        )
    rate = conf.get("rows_per_second", 1)
    return (
        spark.readStream.format("rate").option("rowsPerSecond", rate).load()
        .withColumn("forever", F.lit(True))
    )


def timeout(query, seconds: float) -> bool:
    """riko's ``timeout`` pipe bounds a stream by wall clock
    (riko/modules/timeout.py:103-150).  In Structured Streaming that is
    query-lifecycle control: await up to the deadline, then stop."""
    finished = query.awaitTermination(seconds)
    if not finished:
        query.stop()
    return finished


class Channels:
    """Pub/sub fan-out — riko's ``send``/``receive``
    (riko/modules/send.py:40-98, riko/modules/receive.py:122-218,
    registry riko/utils.py:1110-1164).

    Spark shape: ONE source feeding N sinks.  ``send`` registers a
    named branch; ``run`` executes every branch from the same
    micro-batch inside one ``foreachBatch`` (the batch is persisted so
    branches share the scan — riko's generator-copy equivalent).
    """

    def __init__(self):
        self._branches: dict[str, tuple] = {}

    def send(self, name: str, transform, sink) -> "Channels":
        """transform: DataFrame -> DataFrame; sink: (df, batch_id) -> None"""
        self._branches[name] = (transform, sink)
        return self

    def __call__(self, batch: DataFrame, batch_id: int) -> None:
        batch.persist()
        try:
            for transform, sink in self._branches.values():
                sink(transform(batch), batch_id)
        finally:
            batch.unpersist()

    def run(self, df: DataFrame, checkpoint: str, available_now: bool = True):
        writer = df.writeStream.foreachBatch(self).option("checkpointLocation", checkpoint)
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()
