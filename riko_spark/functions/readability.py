"""Readability-lite main-content extraction over the html5-lite DOM.

DOM-level boilerplate removal — the step between raw crawl HTML and
the text the corpus pipeline cleans: score each block-level container
by how much of its text is NOT link anchor text (the link-density
heuristic every published main-content extractor — Arc90 readability,
boilerpipe, jusText, trafilatura — is built on) and return the
best-scoring container's whitespace-normalized text.

Deliberately heuristic and deterministic: ``score = text_len * (1 -
link_density)^2`` over {article, main, section, div, td, body}
containers.  Chrome subtrees ({script, style, nav, header, footer,
aside, noscript, form}) are pruned from the walk entirely — they
contribute no text AND cannot contain a winning candidate (a div
inside a footer is still boilerplate).  The SQUARED density term
matters: linear scoring collapses to ``text_len - link_len``, making
every wrapper tie exactly with the content child it wraps (the extra
text is pure links), so the outermost wrapper — sidebar links and all
— would win.  Squaring penalizes the dilution, so the tightest
low-density container scores highest; residual EXACT ties resolve to
the later (deeper) candidate in document order — the tightest
boundary of the same content.

Cost is one bottom-up pass over the tree (per-node content/link char
counts accumulated child-to-parent), plus ONE text materialization
for the winning container — O(page) regardless of wrapper nesting
depth, the right shape for the mapInPandas hot path.

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


def _frag_len(s: str) -> int:
    return len(_WS.sub(" ", s).strip()) if s else 0


def _gather(node: Node, out: list[str], in_link: bool,
            links: list[str]) -> None:
    """Collect text fragments (and link-text fragments) of a subtree,
    excluding chrome subtrees — used ONCE, on the winning container."""
    for child in node.children:
        if child.tag in CHROME_TAGS:
            # chrome subtrees contribute nothing; their tail is still
            # content of the parent (and link text if the parent is
            # inside a link)
            if child.tail:
                out.append(child.tail)
                if in_link:
                    links.append(child.tail)
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


def _texts(node: Node, in_link: bool = False) -> tuple[str, int, int]:
    """(normalized text, text_len, link_text_len) of a container."""
    out: list[str] = [node.text] if node.text else []
    links: list[str] = []
    if in_link and node.text:
        links.append(node.text)
    _gather(node, out, in_link or node.tag == "a", links)
    norm = _WS.sub(" ", " ".join(out)).strip()
    link_len = len(_WS.sub(" ", " ".join(links)).strip())
    return norm, len(norm), link_len


def extract_main(html: str | bytes) -> dict:
    """Best-scoring container's text: ``{"main_text", "main_tag",
    "text_len", "link_density"}``; a page with no scorable text
    returns empty text with tag ''."""
    root = parse_html(html)
    # document order, parents before children; chrome subtrees pruned
    # (their descendants are neither measured nor candidates); track
    # whether each node sits inside an <a>
    order: list[tuple[Node, bool]] = []
    stack: list[tuple[Node, bool]] = [(root, False)]
    while stack:
        n, in_link = stack.pop()
        order.append((n, in_link))
        for child in reversed(n.children):
            if child.tag in CHROME_TAGS:
                continue
            stack.append((child, in_link or child.tag == "a"))

    # bottom-up char counts: content[id(node)] = (chars, fragments) of
    # the subtree's collapsed text (excluding node.tail); link[...]
    # the part inside <a> descendants.  Fragment COUNTS matter:
    # normalized text joins fragments with one space, so a container
    # built from many inline runs must score len + (frags - 1), the
    # same length _texts reports — otherwise fragment-heavy real HTML
    # is systematically under-scored against single-run text.  Exact
    # normalization still happens once, for the winner.
    content: dict[int, tuple[int, int]] = {}
    link: dict[int, tuple[int, int]] = {}
    for n, in_link in reversed(order):
        c = _frag_len(n.text)
        cf = 1 if c else 0
        ln, lf = (c, cf) if in_link else (0, 0)
        for child in n.children:
            tail = _frag_len(child.tail)
            if tail:
                c += tail
                cf += 1
                if in_link:
                    ln += tail
                    lf += 1
            if child.tag in CHROME_TAGS:
                continue
            cc, ccf = content[id(child)]
            c += cc
            cf += ccf
            if in_link or child.tag == "a":
                ln += cc
                lf += ccf
            else:
                cl, clf = link[id(child)]
                ln += cl
                lf += clf
        content[id(n)] = (c, cf)
        link[id(n)] = (ln, lf)

    best_node, best_link, best_score = None, False, -1.0
    for n, in_link in order:
        if n.tag not in CONTAINER_TAGS:
            continue
        c, cf = content[id(n)]
        ln, lf = link[id(n)]
        if c == 0:
            continue
        tl = c + max(0, cf - 1)          # joined-with-spaces length
        ll = ln + max(0, lf - 1) if ln else 0
        score = tl * (1.0 - ll / tl) ** 2
        if score >= best_score:
            best_node, best_link, best_score = n, in_link, score
    if best_node is None:
        return {"main_text": "", "main_tag": "", "text_len": 0,
                "link_density": 0.0}
    norm, tlen, llen = _texts(best_node, in_link=best_link)
    return {"main_text": norm, "main_tag": best_node.tag,
            "text_len": tlen,
            "link_density": round(llen / tlen, 6) if tlen else 0.0}
