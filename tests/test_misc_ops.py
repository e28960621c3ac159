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


def test_currencyformat_locale_table(spark):
    """Babel-en_US parity beyond USD (riko doctests: '$100.00',
    '£100.00'): CLDR symbols, per-currency fraction digits, alphabetic
    symbol spacing, sign before symbol."""
    df = spark.createDataFrame([{"content": "100"}])
    def fmt(cur, content="100"):
        d = spark.createDataFrame([{"content": content}])
        return rows(Flow(d).currencyformat({"currency": cur}).df)[0]["currencyformat"]

    assert fmt("USD") == "$100.00"          # riko doctest
    assert fmt("GBP") == "£100.00"          # riko doctest
    assert fmt("JPY") == "¥100"             # 0 fraction digits
    assert fmt("KWD") == "KWD\xa0100.000"  # 3 digits + NBSP spacing
    assert fmt("CHF") == "CHF\xa0100.00"   # code fallback + NBSP
    assert fmt("BRL") == "R$100.00"
    assert fmt("USD", "-10.33") == "-$10.33"  # sign precedes symbol


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


def test_exchangerate_feed_doctest_parity(spark):
    """riko/modules/exchangerate.py doctest: GBP against quote.json
    -> Decimal('1.275201'); cross-rate (non-USD target) exercised too."""
    import os
    from decimal import Decimal

    import pytest

    from riko_spark.operators.structure import exchangerate_op, parse_rates_feed

    quote = "/root/reference/riko/data/quote.json"
    if not os.path.exists(quote):
        pytest.skip("reference quote.json not available")
    df = spark.createDataFrame([{"content": "GBP"}, {"content": "USD"},
                                {"content": "XXNOPE"}])
    out = {r["content"]: r["exchangerate"] for r in
           exchangerate_op(df, {"url": quote}).collect()}
    assert out["GBP"] == Decimal("1.275201")
    assert out["USD"] == Decimal("1.000000")
    assert out["XXNOPE"] is None  # unknown currency -> NULL (riko: NaN)

    # cross rate to a non-USD currency: 1/(rates[GBP]/rates[EUR])
    import json

    doc = json.load(open(quote))
    gbp = Decimal(str(doc["rates"]["GBP"]))
    eur = Decimal(str(doc["rates"]["EUR"]))
    rates = dict(parse_rates_feed(quote, currency="EUR", precision=6))
    assert rates["GBP"] == (Decimal(1) / (gbp / eur)).quantize(Decimal("0.000001"))


def test_fetchtable_xlsx(spark, tmp_path):
    """fetchtable reads .xlsx through the stdlib SpreadsheetML reader:
    shared strings, inline strings, numbers, header row."""
    import zipfile

    p = str(tmp_path / "t.xlsx")
    sheet = """<?xml version="1.0"?>
<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
 <sheetData>
  <row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c></row>
  <row r="2"><c r="A2" t="s"><v>2</v></c><c r="B2"><v>42</v></c></row>
  <row r="3"><c r="A3" t="inlineStr"><is><t>inline val</t></is></c><c r="B3"><v>7.5</v></c></row>
 </sheetData>
</worksheet>"""
    shared = """<?xml version="1.0"?>
<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="3" uniqueCount="3">
 <si><t>name</t></si><si><t>value</t></si><si><t>alpha</t></si>
</sst>"""
    with zipfile.ZipFile(p, "w") as z:
        z.writestr("xl/worksheets/sheet1.xml", sheet)
        z.writestr("xl/sharedStrings.xml", shared)
        z.writestr("[Content_Types].xml", "<Types/>")

    from riko_spark.operators.webtext import fetchtable_op

    out = fetchtable_op(None, {"url": p}, spark=spark)
    rows = [r.asDict() for r in out.collect()]
    assert rows == [{"name": "alpha", "value": "42"},
                    {"name": "inline val", "value": "7.5"}]


def test_geolocate_type_shapes(spark):
    """riko/cast.py:130-195 record shapes per lookup type: coordinates/
    street carry lat/lon/street/postal; ip_address carries neither."""
    df = spark.createDataFrame([{"content": "8.8.8.8"}])
    ip = rows(Flow(df).geolocate({"type": "ip_address"}).df)[0]["geolocate"]
    assert set(ip) == {"country", "admin1", "admin2", "admin3", "city"}
    street = rows(Flow(df).geolocate({"type": "street_address"}).df)[0]["geolocate"]
    assert street["street"] == "street" and street["postal"] == "61605"
    assert street["admin3"] == "city"


def test_fetchdata_path_descent_doctest(spark):
    """riko/modules/fetchdata.py doctest: gigs.json with path
    'value.items' -> first item title 'Business System Analyst'."""
    import os

    import pytest

    from riko_spark.operators.webtext import fetchdata_op

    path = "/root/reference/riko/data/gigs.json"
    if not os.path.exists(path):
        pytest.skip("reference gigs.json not available")
    out = fetchdata_op(None, {"url": path, "path": "value.items"}, spark=spark)
    titles = [r["title"] for r in out.collect()]
    assert "Business System Analyst" in titles
    # github search fixture: top-level array path
    gh = "/root/reference/riko/data/api.github.com_search_users_q=defunkt.json"
    out2 = fetchdata_op(None, {"url": gh, "path": "items"}, spark=spark)
    assert out2.count() == 28
    assert "login" in out2.columns


def test_fetchtext_doctest(spark):
    """riko/modules/fetchtext.py doctest: first line of lorem.txt."""
    import os

    import pytest

    from riko_spark.operators.webtext import fetchtext_op

    path = "/root/reference/riko/data/lorem.txt"
    if not os.path.exists(path):
        pytest.skip("reference lorem.txt not available")
    out = fetchtext_op(None, {"url": path}, spark=spark)
    lines = [r[0] for r in out.collect()]
    assert lines[0] == "What is Lorem Ipsum?"
    assert all(s == s.strip() for s in lines)  # riko strips each line


def test_currencyformat_locales_de_fr(spark):
    """Engine extension beyond the reference's hardcoded en_US
    (riko/modules/currencyformat.py:63): de_DE / fr_FR via the CLDR
    suffix pattern "#,##0.00 ¤" — comma decimal, '.' (de) / narrow-NBSP
    (fr) grouping, NBSP before the trailing symbol, locale display
    symbols ($US for USD in fr)."""
    import pyspark.sql.functions as F

    from riko_spark.operators.misc import currencyformat_op

    df = spark.createDataFrame([(1234.5,), (-10.33,)], "amt double")

    def got(loc, cur):
        out = currencyformat_op(df, {"currency": cur, "locale": loc},
                                field="amt", assign="x")
        return [r.x for r in out.orderBy(F.desc("amt")).collect()]

    assert got("de_DE", "EUR") == ["1.234,50 €", "-10,33 €"]
    assert got("de_DE", "USD") == ["1.234,50 $", "-10,33 $"]
    assert got("fr_FR", "EUR") == ["1 234,50 €", "-10,33 €"]
    assert got("fr_FR", "USD") == ["1 234,50 $US", "-10,33 $US"]
    assert got("de_DE", "JPY") == ["1.234 ¥", "-10 ¥"]
    # en_US stays byte-identical to the reference's Babel goldens
    assert got("en_US", "USD") == ["$1,234.50", "-$10.33"]
    import pytest

    with pytest.raises(ValueError):
        currencyformat_op(df, {"currency": "USD", "locale": "xx_XX"},
                          field="amt", assign="x")


def test_currencyformat_locales_es_ja(spark):
    """Round-4 locales, pure table additions to _CLDR_LOCALES (adding a
    locale is data, not code).  es_ES exercises CLDR
    minimumGroupingDigits=2 — 1234,50 € ungrouped but 1.234.567,89 €
    grouped — plus the US$ display symbol; ja_JP is prefix-symbol with
    en punctuation and the full-width yen (U+FFE5) for JPY."""
    import pyspark.sql.functions as F

    from riko_spark.operators.misc import currencyformat_op

    df = spark.createDataFrame(
        [(1234.5,), (-10.33,), (1234567.89,)], "amt double"
    )

    def got(loc, cur):
        out = currencyformat_op(df, {"currency": cur, "locale": loc},
                                field="amt", assign="x")
        return [r.x for r in out.orderBy(F.desc("amt")).collect()]

    assert got("es_ES", "EUR") == ["1.234.567,89 €", "1234,50 €",
                                   "-10,33 €"]
    assert got("es_ES", "USD") == ["1.234.567,89 US$", "1234,50 US$",
                                   "-10,33 US$"]
    assert got("es_ES", "JPY") == ["1.234.568 JPY", "1234 JPY",
                                   "-10 JPY"]
    assert got("ja_JP", "JPY") == ["￥1,234,568", "￥1,234", "-￥10"]
    assert got("ja_JP", "USD") == ["$1,234,567.89", "$1,234.50", "-$10.33"]
    # alphabetic symbol keeps the NBSP currency-spacing rule in ja too
    assert got("ja_JP", "CHF") == ["CHF 1,234,567.89", "CHF 1,234.50",
                                   "-CHF 10.33"]


def test_rename_struct_leaf_and_literal_dot(spark):
    """riko item.get semantics for dotted fields: a missing leaf under
    an existing struct copies as NULL (no AnalysisException); a flat
    column literally named 'a.b' resolves exactly, not as a path."""
    import pyspark.sql.functions as F

    from riko_spark.operators.structure import rename_op

    df = spark.createDataFrame([(1,)], "x long").select(
        "x",
        F.struct(F.lit("alice").alias("name")).alias("meta"),
        F.lit("flat").alias("a.b"),
    )
    out = rename_op(df, {"rule": [
        {"field": "meta.name", "newval": "author", "copy": True},
        {"field": "meta.missing", "newval": "ghost", "copy": True},
        {"field": "a.b", "newval": "fromflat", "copy": True},
    ]})
    r = out.collect()[0]
    assert r["author"] == "alice"
    assert r["ghost"] is None
    assert r["fromflat"] == "flat"


def test_currencyformat_es_min_grouping_rounds_across_threshold(spark):
    """The min-grouping decision uses the ROUNDED value: 9999.995
    formats as 10.000,00 € (separator kept) even though the raw amount
    is below 10^4."""
    import pyspark.sql.functions as F

    from riko_spark.operators.misc import currencyformat_op

    df = spark.createDataFrame([(9999.995,), (9999.4,)], "amt double")
    out = currencyformat_op(df, {"currency": "EUR", "locale": "es_ES"},
                            field="amt", assign="x")
    got = [r.x for r in out.orderBy(F.desc("amt")).collect()]
    assert got == ["10.000,00 €", "9999,40 €"]


def test_currencyformat_locales_it_pt(spark):
    """it_IT (suffix, '.'-grouping) and pt_BR (prefix symbol with the
    CLDR "¤ #,##0.00" mandatory space) — pure _CLDR_LOCALES rows."""
    import pyspark.sql.functions as F

    from riko_spark.operators.misc import currencyformat_op

    df = spark.createDataFrame([(1234.5,), (-10.33,)], "amt double")

    def got(loc, cur):
        out = currencyformat_op(df, {"currency": cur, "locale": loc},
                                field="amt", assign="x")
        return [r.x for r in out.orderBy(F.desc("amt")).collect()]

    # CLDR it.xml sets minimumGroupingDigits=2 (like es_ES): no
    # separator at 4 integer digits, separator from 5 digits up.
    assert got("it_IT", "EUR") == ["1234,50 €", "-10,33 €"]
    assert got("it_IT", "USD") == ["1234,50 US$", "-10,33 US$"]

    df5 = spark.createDataFrame([(12345.0,)], "amt double")
    out5 = currencyformat_op(df5, {"currency": "EUR", "locale": "it_IT"},
                             field="amt", assign="x")
    assert [r.x for r in out5.collect()] == ["12.345,00 €"]
    assert got("pt_BR", "BRL") == ["R$ 1.234,50", "-R$ 10,33"]
    assert got("pt_BR", "USD") == ["US$ 1.234,50", "-US$ 10,33"]
    assert got("pt_BR", "EUR") == ["€ 1.234,50", "-€ 10,33"]


def test_currencyformat_locales_gb_nl_ru(spark):
    """Round-5 locale rows: en_GB (native £ prefix), nl_NL (CLDR
    "\u00a4\u00a0#,##0.00;\u00a4\u00a0-#,##0.00" — the minus sits AFTER
    the prefixed symbol), ru_RU (NBSP grouping, NBSP-joined suffix
    symbol, \u20bd for RUB)."""
    import pyspark.sql.functions as F

    from riko_spark.operators.misc import currencyformat_op

    NB = "\u00a0"
    df = spark.createDataFrame([(1234.5,), (-10.33,)], "amt double")

    def got(loc, cur):
        out = currencyformat_op(df, {"currency": cur, "locale": loc},
                                field="amt", assign="x")
        return [r.x for r in out.orderBy(F.desc("amt")).collect()]

    assert got("en_GB", "GBP") == ["\u00a31,234.50", "-\u00a310.33"]
    assert got("en_GB", "USD") == ["US$1,234.50", "-US$10.33"]
    assert got("nl_NL", "EUR") == [f"\u20ac{NB}1.234,50", f"\u20ac{NB}-10,33"]
    assert got("nl_NL", "USD") == [f"US${NB}1.234,50", f"US${NB}-10,33"]
    assert got("ru_RU", "RUB") == [f"1{NB}234,50{NB}\u20bd", f"-10,33{NB}\u20bd"]
    assert got("ru_RU", "EUR") == [f"1{NB}234,50{NB}\u20ac", f"-10,33{NB}\u20ac"]
