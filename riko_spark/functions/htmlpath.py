"""Pure-Python mini HTML DOM + XPath-subset evaluator (html5-lite).

The reference parses messy HTML with lxml/html5lib and evaluates XPath
over it (riko/modules/xpathfetchpage.py:161-200, riko/parsers.py:
319-415 ``xpath``, :509-528 ``etree2dict``).  Neither library ships in
this container, so this is a from-scratch, dependency-free
implementation of exactly the surface riko's own test pipelines and
doctests exercise:

  * tolerant tag-soup parsing — void elements, implied closes
    (``<li>``, ``<p>``, nested ``<a>``, table cells), stray end tags;
  * XPath steps ``/a/b``, ``//a``, ``*``, predicates ``[child]``,
    ``[@attr]``, ``[@attr='v']``, ``[n]`` (1-based, per parent);
  * ``node_to_item`` — riko's ``etree2dict`` dict shape (attributes
    merged with stripped text as ``content``; repeated child tags
    accumulate into lists; attribute-less leaves collapse to their
    text).

Not a general HTML5 tree builder: foster parenting, formatting-element
adoption, and full template/table rules are out of scope (documented).
Tail text (``<p>a<b>x</b> tail</p>``) is captured on ``Node.tail`` for
the main-content extractor (functions/readability.py), but
``node_to_item`` deliberately never reads it — riko's ``etree2dict``
(riko/parsers.py:509-528) reads only ``element.text`` and never
consults lxml's ``.tail``, so tails stay absent from pipe items,
preserving the reference's output surface.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

VOID_ELEMENTS = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)

# opening <k> implies closing an open element whose tag is in the set
IMPLIED_CLOSE = {
    "li": {"li"},
    "p": {"p"},
    "option": {"option"},
    "optgroup": {"option", "optgroup"},
    "tr": {"tr", "td", "th"},
    "td": {"td", "th"},
    "th": {"td", "th"},
    "dd": {"dd", "dt"},
    "dt": {"dd", "dt"},
    "a": {"a"},  # lxml.html also refuses nested anchors
}


class Node:
    """Minimal element: tag, attrs, text (before first child), children,
    and tail (text after this element, inside its parent — captured for
    content extraction; ``node_to_item`` deliberately ignores it to
    keep riko's etree2dict parity, see module docstring)."""

    __slots__ = ("tag", "attrs", "text", "children", "tail")

    def __init__(self, tag: str, attrs=None):
        self.tag = tag
        self.attrs: dict[str, str] = dict(attrs or {})
        self.text = ""
        self.tail = ""
        self.children: list[Node] = []

    def __repr__(self) -> str:  # pragma: no cover - debug aid
        return f"<Node {self.tag} {self.attrs} kids={len(self.children)}>"


class _TreeBuilder(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = Node("#document")
        self.stack = [self.root]

    def handle_starttag(self, tag, attrs):
        implied = IMPLIED_CLOSE.get(tag)
        if implied:
            while len(self.stack) > 1 and self.stack[-1].tag in implied:
                self.stack.pop()
        node = Node(tag, {k: (v if v is not None else "") for k, v in attrs})
        self.stack[-1].children.append(node)
        if tag not in VOID_ELEMENTS:
            self.stack.append(node)

    def handle_startendtag(self, tag, attrs):
        node = Node(tag, {k: (v if v is not None else "") for k, v in attrs})
        self.stack[-1].children.append(node)

    def handle_endtag(self, tag):
        if tag in VOID_ELEMENTS:
            return
        for depth in range(len(self.stack) - 1, 0, -1):
            if self.stack[depth].tag == tag:
                del self.stack[depth:]
                return
        # stray end tag: ignore (tag-soup tolerance)

    def handle_data(self, data):
        top = self.stack[-1]
        if not top.children:
            top.text += data
        else:
            top.children[-1].tail += data


def parse_html(text: str | bytes) -> Node:
    """Parse (possibly messy) HTML into a Node tree; returns the
    synthetic ``#document`` root whose children are the top-level
    elements."""
    if isinstance(text, (bytes, bytearray)):
        text = text.decode("utf-8", errors="replace")
    builder = _TreeBuilder()
    builder.feed(text)
    builder.close()
    return builder.root


# --------------------------------------------------------------- xpath

_STEP_RE = re.compile(r"^([\w*.:-]+)((?:\[[^\]]*\])*)$")
_PRED_RE = re.compile(r"\[([^\]]*)\]")


def _parse_steps(path: str) -> list[tuple[str, str, list[str]]]:
    steps: list[tuple[str, str, list[str]]] = []
    axis = "child"
    parts = path.split("/")
    for idx, seg in enumerate(parts):
        if seg == "":
            if idx == 0:
                continue  # absolute path marker
            axis = "descendant"  # '//'
            continue
        m = _STEP_RE.match(seg)
        if not m:
            raise ValueError(f"unsupported xpath step: {seg!r} in {path!r}")
        steps.append((axis, m.group(1), _PRED_RE.findall(m.group(2))))
        axis = "child"
    return steps


def _descendants(node: Node):
    for child in node.children:
        yield child
        yield from _descendants(child)


def _match_pred(node: Node, pred: str, pos: int) -> bool:
    pred = pred.strip()
    if pred.isdigit():
        return pos == int(pred)
    if pred.startswith("@"):
        expr = pred[1:]
        if "=" in expr:
            name, _, value = expr.partition("=")
            return node.attrs.get(name.strip()) == value.strip().strip("'\"")
        return expr.strip() in node.attrs
    # child-existence: [img]
    return any(c.tag == pred for c in node.children)


def xpath_select(root: Node, path: str) -> list[Node]:
    """Evaluate the supported XPath subset; document order, no dupes."""
    current = [root]
    for axis, name, preds in _parse_steps(path):
        gathered: list[Node] = []
        seen: set[int] = set()
        for ctx in current:
            if axis == "child":
                cand = [c for c in ctx.children if name in ("*", c.tag)]
            else:
                cand = [d for d in _descendants(ctx) if name in ("*", d.tag)]
            for pred in preds:
                cand = [n for i, n in enumerate(cand, 1) if _match_pred(n, pred, i)]
            for n in cand:
                if id(n) not in seen:
                    seen.add(id(n))
                    gathered.append(n)
        current = gathered
    return current


# ------------------------------------------------- etree2dict parity

def node_to_item(node: Node):
    """riko ``etree2dict`` (riko/parsers.py:509-528): attrs + stripped
    text as ``content``; children keyed by tag, repeats accumulate into
    lists; an attribute-less leaf with text collapses to the string."""
    item: dict = dict(node.attrs)
    text = (node.text or "").strip()
    if text:
        item["content"] = text
    for child in node.children:
        value = node_to_item(child)
        if not value:
            continue
        existing = item.get(child.tag)
        if existing is None:
            item[child.tag] = value
        elif isinstance(existing, list):
            existing.append(value)
        else:
            item[child.tag] = [existing, value]
    if node.text and not set(item).difference(["content"]):
        return item.get("content", "")
    return item
