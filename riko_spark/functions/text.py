"""Vectorized (Arrow-batched) text UDFs for the webtext operators.

HTML slicing/detagging is genuinely procedural (stateful HTMLParser),
so these are pandas UDFs — the sanctioned Python path (Arrow batch
transfer, no per-row pickling).  Everything else text-related in the
engine (tokenizing, lang-id, quality, fingerprints) is native Column
expressions — see operators/strings.py and operators/textstats.py.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

from riko_spark import textref


class _BatchTextParser(HTMLParser):
    """Reused across a whole Arrow batch (reset per doc) — ~15% faster
    than constructing a parser per document, byte-identical output to
    textref._TextParser (data nodes joined with trailing newlines)."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=False)
        self.parts: list[str] = []

    def handle_data(self, data: str) -> None:
        self.parts.append(data)


# Fast detag path: for HTML where every construct is unambiguous, the
# HTMLParser data-node stream equals a single regex split.  Separators
# (dropped, each one a data-node boundary, exactly like handle_data
# boundaries with convert_charrefs=False): comments, tags, and
# WELL-FORMED character/entity references (the parser routes those to
# handle_entityref/handle_charref, which this extractor discards).
_FAST_SEP = re.compile(
    # comment: html.parser closes at the first '--' + optional ws + '>'
    r"<!--.*?--\s*>"
    # start tag: quoted attribute values may contain '>'
    # (locatestarttagend_tolerant); letter-initial only — '<' followed
    # by anything else is data to the parser
    r"|<[a-zA-Z][^<>\"']*(?:(?:\"[^\"]*\"|'[^']*')[^<>\"']*)*>"
    # end tag: ends at the FIRST '>' (parse_endtag does rawdata.find('>'))
    r"|</[^<>]*>"
    # processing instruction: consumed to the first '>'
    r"|<\?[^<>]*>"
    # well-formed character/entity references
    r"|&(?:[a-zA-Z][-.a-zA-Z0-9]*|#[0-9]+|#[xX][0-9a-fA-F]+);",
    re.S,
)
# Constructs whose HTMLParser behavior a flat split cannot reproduce:
# CDATA content models (script/style bodies treat '<' as data),
# declarations/CDATA sections, end tags carrying quotes (the parser
# does NOT honor quotes there, unlike start tags), and ambiguous '&'
# (bare, or an entity not terminated by ';').
_FAST_UNSAFE = re.compile(
    r"<(?:script|style)\b|<!(?!--)"
    r"|</[^<>]*['\"]"
    r"|&(?!(?:[a-zA-Z][-.a-zA-Z0-9]*|#[0-9]+|#[xX][0-9a-fA-F]+);)",
    re.I,
)


def _fast_detag(sliced: str) -> str | None:
    """Regex data-node extraction, byte-identical to _BatchTextParser on
    gated input; returns None when the input needs the real parser."""
    if _FAST_UNSAFE.search(sliced):
        return None
    parts = _FAST_SEP.split(sliced)
    for p in parts:
        if "<" in p:  # malformed/unterminated tag: let the parser decide
            return None
    return "".join(p + "\n" for p in parts if p).strip()


def _extract_series(html: pd.Series, start: str, end: str, detag: bool) -> pd.Series:
    if not detag:
        return html.map(
            lambda h: None
            if h is None
            else textref.extract_text(h, start=start, end=end, detag=False)[0]
        )
    parser = _BatchTextParser()

    def one(h):
        if h is None:
            return None
        s = h.decode("utf-8", errors="replace") if isinstance(h, (bytes, bytearray)) else h
        sliced = textref.get_string(s, start, end)
        fast = _fast_detag(sliced)
        if fast is not None:
            return fast
        parser.reset()
        parser.parts = []
        parser.feed(sliced)
        return "".join(p + "\n" for p in parser.parts).strip()

    return html.map(one)


def extract_text_udf(start: str = "<body>", end: str = "</body>", detag: bool = True):
    """pandas UDF: html binary -> reference-extracted text.

    Byte-identical per url to the reference chain
    (riko/modules/fetchpage.py:45-53,103-139 + riko/parsers.py:113-174),
    vendored in riko_spark.textref.
    """

    @F.pandas_udf(StringType())
    def _extract(html: pd.Series) -> pd.Series:
        return _extract_series(html, start, end, detag)

    return _extract


@F.pandas_udf(ArrayType(StringType()))
def find_feed_links_udf(html: pd.Series) -> pd.Series:
    """pandas UDF: html binary -> list of RSS-ish link hrefs
    (feedautodiscovery analog, riko/parsers.py:114-165)."""
    return html.map(
        lambda h: None
        if h is None
        else textref.find_links(h.decode("utf-8", errors="replace") if isinstance(h, (bytes, bytearray)) else h)
    )
