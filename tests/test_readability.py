"""Main-content extraction (functions/readability.py +
operators/cleaning.py:main_content_op) and the DOM tail-text capture
it depends on (functions/htmlpath.py).
"""

from __future__ import annotations

from riko_spark.functions.htmlpath import node_to_item, parse_html
from riko_spark.functions.readability import extract_main

from tests.conftest import rows

PAGE = """
<html><head><title>t</title><style>.x{color:red}</style></head>
<body>
  <nav><a href="/">Home</a> <a href="/a">About</a> <a href="/c">More</a></nav>
  <div id="wrap">
    <div id="content">
      This article has a long opening paragraph with real prose.
      <p>It continues across <b>several</b> inline elements and keeps
      going with more sentences of body text.</p>
      <p>One small <a href="/ref">reference link</a> inside.</p>
    </div>
    <div id="sidebar">
      <a href="/1">link one</a> <a href="/2">link two</a>
      <a href="/3">link three</a> <a href="/4">link four</a>
    </div>
  </div>
  <footer><a href="/tos">Terms</a> <a href="/priv">Privacy</a></footer>
</body></html>
"""


def test_dom_captures_tail_text():
    root = parse_html("<p>a<b>x</b> tail</p>")
    p = root.children[0]
    assert p.text == "a"
    assert p.children[0].tail == " tail"


def test_node_to_item_still_ignores_tails():
    # riko's etree2dict parity: tail must not leak into pipe items
    root = parse_html("<p>a<b>x</b> tail</p>")
    assert node_to_item(root.children[0]) == {"content": "a", "b": "x"}


def test_extract_main_picks_article_over_nav_and_sidebar():
    r = extract_main(PAGE)
    assert r["main_tag"] == "div"
    assert r["main_text"].startswith("This article has a long opening")
    assert "going with more sentences" in r["main_text"]  # tail-joined prose
    assert "reference link" in r["main_text"]             # inline links kept
    assert "link three" not in r["main_text"]             # sidebar excluded
    assert "Home" not in r["main_text"]                   # nav excluded
    assert 0 < r["link_density"] < 0.2


def test_extract_main_chrome_never_contributes():
    html = ("<body><div>Tiny.</div>"
            "<nav>" + "x" * 500 + "</nav>"
            "<script>" + "y" * 500 + "</script></body>")
    r = extract_main(html)
    assert r["main_text"] == "Tiny." and r["main_tag"] == "div"


def test_extract_main_link_density_beats_length():
    html = ("<body>"
            "<div id='links'>" + " ".join(
                f"<a href='/{i}'>anchor text {i}</a>" for i in range(30))
            + "</div>"
            "<div id='prose'>Short but real paragraph of honest prose "
            "with no links at all in it.</div></body>")
    r = extract_main(html)
    assert "honest prose" in r["main_text"]
    assert "anchor text" not in r["main_text"]


def test_extract_main_tie_goes_to_tightest_container_and_empty_page():
    # wrapper and single child carry identical text -> exact tie ->
    # the deeper (tightest) container is kept, same extracted text
    html = "<body><div id='w'><div id='c'>Same text here.</div></div></body>"
    assert extract_main(html)["main_text"] == "Same text here."
    assert extract_main("<body><nav>only chrome</nav></body>") == {
        "main_text": "", "main_tag": "", "text_len": 0,
        "link_density": 0.0}


def test_main_content_op(spark):
    from riko_spark.operators.cleaning import main_content_op

    df = spark.createDataFrame(
        [(1, PAGE), (2, "<body><nav>x</nav></body>")],
        "doc_id long, html string")
    out = {r["doc_id"]: r for r in rows(main_content_op(df))}
    assert out[1]["main_text"].startswith("This article")
    assert out[2]["main_text"] == ""
    from riko_spark.operators import get_operator
    assert get_operator("main_content") is main_content_op


def test_container_nested_in_chrome_cannot_win():
    # review finding: a div INSIDE a footer/nav is still boilerplate —
    # the chrome subtree is pruned from the candidate walk entirely
    html = ("<body><footer><div>" + "long footer legal boilerplate " * 4
            + "</div></footer><div>short real content</div></body>")
    r = extract_main(html)
    assert r["main_text"] == "short real content"


def test_chrome_tail_inside_link_counts_as_link_text():
    # review finding: '<a>x<script>..</script> tailtext</a>' — the
    # tail after the chrome element is still anchor text
    from riko_spark.functions.readability import _texts

    root = parse_html(
        "<div><a>x<script>var a;</script> tailtext</a> body words</div>")
    _norm, _tlen, llen = _texts(root.children[0])
    assert llen == len("x tailtext")


def test_extract_main_linear_in_wrapper_depth():
    # 200-deep div nesting must not blow up (bottom-up single pass)
    html = "<body>" + "<div>" * 200 + "Real content text here." \
        + "</div>" * 200 + "</body>"
    assert extract_main(html)["main_text"] == "Real content text here."


def test_fragment_heavy_container_scores_like_its_normalized_text():
    # review finding: scoring must count the join spaces between
    # fragments — seven one-char <p> runs normalize to 13 chars and
    # must beat a single 12-char run
    many = "".join("<p>x</p>" for _ in range(7))
    farm = " ".join(f"<a href='/{i}'>anchor link {i}</a>" for i in range(30))
    html = (f"<body><td>{many}</td><td>twelve chars</td>"
            f"<div>{farm}</div></body>")  # farm dilutes body's score
    r = extract_main(html)
    assert r["main_text"] == "x x x x x x x"  # 13 > 12: join spaces count
    assert r["text_len"] == 13
