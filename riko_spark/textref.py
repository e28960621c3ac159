"""Reference-faithful HTML text extraction (the byte-identity invariant).

Re-implements, in pure Python, the exact extraction semantics of the
reference's ``fetchpage`` pipe so the distributed pandas-UDF path can be
tested byte-for-byte against a single-node ground truth:

* ``get_string(content, start, end)`` — slice between literal markers
  (reference: riko/modules/fetchpage.py:45-53).
* ``get_text(html)`` — strip tags with an HTMLParser that writes each
  text node followed by a newline; entity/char refs are *dropped*
  because ``convert_charrefs=False`` and the ref parser does not
  override ``handle_entityref`` (reference: riko/parsers.py:113-174,
  ``LinkParser.handle_data`` / ``get_text``).
* ``extract_text`` — the full fetchpage parser chain: slice → optional
  detag → optional token split → ``str.strip`` each piece (reference:
  riko/modules/fetchpage.py:103-139).

Also ``find_links`` — the feed-autodiscovery analog: collect
``href``-bearing tags whose ``type`` endswith an RSS-ish suffix
(reference: riko/parsers.py:114-165 ``LinkParser.handle_starttag``).
"""

from __future__ import annotations

from html.parser import HTMLParser
from io import StringIO

RSS_TYPES = ("rss+xml", "atom+xml", "rdf+xml", "text/xml", "xml")


def get_string(content: str, start: str, end: str) -> str:
    """Slice ``content`` between literal ``start`` and ``end`` markers.

    Matches the reference exactly, including its quirks: the end marker
    is searched from offset 1 of the remainder, and a missing end
    marker returns the whole remainder.
    """
    start_pos = content.find(start) if start else 0
    right = content[start_pos + (len(start) if start else 0):]
    end_pos = right[1:].find(end) + 1 if end else len(right)
    return right[:end_pos] if end_pos > 0 else right


class _TextParser(HTMLParser):
    """Writes every text node followed by ``\\n``; drops entity refs."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=False)
        self.data = StringIO()

    def handle_data(self, data: str) -> None:
        self.data.write(f"{data}\n")


class _LinkCollector(HTMLParser):
    """Collects href links, optionally restricted to RSS-ish types."""

    def __init__(self, rss_only: bool = True, external_only: bool = True) -> None:
        super().__init__(convert_charrefs=False)
        self.rss_only = rss_only
        self.external_only = external_only
        self.links: list[str] = []

    def handle_starttag(self, tag, attrs) -> None:
        entry = dict(attrs)
        link = entry.get("href")
        _type = entry.get("type") or ""
        type_match = any(_type.endswith(t) for t in RSS_TYPES)
        source_match = link and not (self.external_only and link.startswith("/"))
        if source_match and (type_match or not self.rss_only):
            self.links.append(link)


def get_text(html: str) -> str:
    parser = _TextParser()
    parser.feed(html)
    return parser.data.getvalue()


def find_links(html: str, rss_only: bool = True) -> list[str]:
    parser = _LinkCollector(rss_only=rss_only)
    parser.feed(html)
    return parser.links


def extract_text(
    html: bytes | str,
    start: str = "<body>",
    end: str = "</body>",
    detag: bool = True,
    token: str | None = None,
    encoding: str = "utf-8",
) -> list[str]:
    """Full fetchpage chain; returns the list of stripped pieces.

    With ``token=None`` (the default) this is a single-element list —
    ``extract_text(html)[0]`` is the canonical ``text`` for a page.
    """
    content = html.decode(encoding, errors="replace") if isinstance(html, bytes) else html
    parsed = get_string(content, start, end)
    detagged = get_text(parsed) if detag else parsed
    split = detagged.split(token) if token else [detagged]
    return [s.strip() for s in split]
