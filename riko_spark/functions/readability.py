"""Readability-lite main-content extraction over the html5-lite DOM.

DOM-level boilerplate removal — the step between raw crawl HTML and
the text the corpus pipeline cleans: score each block-level container
by how much of its text is NOT link anchor text (the link-density
heuristic every published main-content extractor — Arc90 readability,
boilerpipe, jusText, trafilatura — is built on) and return the
best-scoring container's whitespace-normalized text.

Deliberately heuristic and deterministic: ``score = text_len * (1 -
link_density)^2`` over {article, main, section, div, td, body}
containers, with chrome subtrees ({script, style, nav, header,
footer, aside, noscript, form}) never contributing text.  The
SQUARED density term matters: linear scoring collapses to
``text_len - link_len``, making every wrapper tie exactly with the
content child it wraps (the extra text is pure links), so the
outermost wrapper — sidebar links and all — would win.  Squaring
penalizes the dilution, so the tightest low-density container
scores highest; residual EXACT ties resolve to the later (deeper)
candidate in document order — the tightest boundary of the same
content.

The reference has no content extractor (riko's fetchpage slices
between literal markers, riko/modules/fetchpage.py:45-53 — that path
is ported byte-identically in functions/text.py); this extends the
extraction surface for crawl-scale corpus building.
"""

from __future__ import annotations

import re

from riko_spark.functions.htmlpath import Node, parse_html

CONTAINER_TAGS = frozenset(
    ["article", "main", "section", "div", "td", "body"])
CHROME_TAGS = frozenset(
    ["script", "style", "nav", "header", "footer", "aside", "noscript",
     "form"])

_WS = re.compile(r"\s+")


def _gather(node: Node, out: list[str], in_link: bool,
            links: list[str]) -> None:
    for child in node.children:
        if child.tag in CHROME_TAGS:
            # chrome subtrees contribute nothing; their tail is still
            # content of the parent
            if child.tail:
                out.append(child.tail)
            continue
        link = in_link or child.tag == "a"
        if child.text:
            out.append(child.text)
            if link:
                links.append(child.text)
        _gather(child, out, link, links)
        if child.tail:
            out.append(child.tail)
            if in_link:
                links.append(child.tail)
    return


def _texts(node: Node) -> tuple[str, int, int]:
    """(normalized text, text_len, link_text_len) of a container —
    own text + all non-chrome descendant text/tails."""
    out: list[str] = [node.text] if node.text else []
    links: list[str] = []
    _gather(node, out, node.tag == "a", links)
    norm = _WS.sub(" ", " ".join(out)).strip()
    link_len = len(_WS.sub(" ", " ".join(links)).strip())
    return norm, len(norm), link_len


def extract_main(html: str | bytes) -> dict:
    """Best-scoring container's text: ``{"main_text", "main_tag",
    "text_len", "link_density"}``; a page with no scorable text
    returns empty text with tag ''."""
    root = parse_html(html)
    best = {"main_text": "", "main_tag": "", "text_len": 0,
            "link_density": 0.0, "_score": -1.0}
    stack = [root]
    order: list[Node] = []
    while stack:  # document order, parents before children
        n = stack.pop()
        order.append(n)
        stack.extend(reversed(n.children))
    for node in order:
        if node.tag not in CONTAINER_TAGS or node.tag in CHROME_TAGS:
            continue
        norm, tlen, llen = _texts(node)
        if tlen == 0:
            continue
        density = llen / tlen
        score = tlen * (1.0 - density) ** 2
        if score >= best["_score"]:
            best = {"main_text": norm, "main_tag": node.tag,
                    "text_len": tlen,
                    "link_density": round(density, 6), "_score": score}
    best.pop("_score")
    return best
