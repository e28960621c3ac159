"""Web-corpus cleaning operators (riko_spark/operators/cleaning.py):
C4 line/document gates and RefinedWeb corpus-level line dedupe.

Expectations are hand-computed from small literal corpora, not
round-tripped through the operators.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from riko_spark.operators.cleaning import (
    c4_doc_filter_op,
    c4_line_filter_op,
    line_dedupe_op,
    span_dedupe_op,
)

from tests.conftest import rows


def _docs(spark, items):
    return spark.createDataFrame(items, "doc_id long, text string")


# ---------------------------------------------------------------- line filter

def test_c4_line_filter_terminal_and_min_words(spark):
    text = "\n".join([
        "This line has enough words right here.",   # kept
        "Too short here.",                           # < 5 words
        "this line has five words no terminal",      # no terminal punct
        "Does a question mark count as terminal?",   # kept
        "",                                          # blank: not counted
        "  Padded line still ends with a period after trimming.  ",
    ])
    out = rows(c4_line_filter_op(_docs(spark, [(1, text)])))
    assert out[0]["n_lines_kept"] == 3
    assert out[0]["n_lines_dropped"] == 2  # blank lines aren't lines
    assert out[0]["text"] == "\n".join([
        "This line has enough words right here.",
        "Does a question mark count as terminal?",
        "Padded line still ends with a period after trimming.",
    ])


def test_c4_line_filter_conf_overrides(spark):
    text = "one two three\nfour five six."
    out = rows(c4_line_filter_op(
        _docs(spark, [(1, text)]),
        conf={"min_words": 3, "require_terminal": False}))
    assert out[0]["n_lines_kept"] == 2
    out2 = rows(c4_line_filter_op(_docs(spark, [(1, text)]),
                                  conf={"min_words": 3}))
    assert out2[0]["text"] == "four five six."


# ----------------------------------------------------------------- doc filter

def test_c4_doc_filter_signals(spark):
    good = " ".join(f"word{i} filler." for i in range(30))  # 60 words, 30 '.'
    out = rows(c4_doc_filter_op(_docs(spark, [(1, good)])))[0]
    assert out["n_words"] == 60
    assert out["n_sentences"] == 30
    assert not out["has_lorem"] and not out["has_curly"]
    assert out["keep"] is True

    lorem = good + " Lorem Ipsum dolor."
    out = rows(c4_doc_filter_op(_docs(spark, [(1, lorem)])))[0]
    assert out["has_lorem"] is True and out["keep"] is False

    curly = good + " { nope }"
    out = rows(c4_doc_filter_op(_docs(spark, [(1, curly)])))[0]
    assert out["has_curly"] is True and out["keep"] is False


def test_c4_doc_filter_word_and_sentence_bounds(spark):
    short = "Just a few words here. And again. Third one."  # 9 words
    out = rows(c4_doc_filter_op(_docs(spark, [(1, short)])))[0]
    assert out["n_words"] == 9 and out["n_sentences"] == 3
    assert out["keep"] is False  # below the 50-word Gopher floor

    two_sent = " ".join(f"w{i}" for i in range(60)) + " end. and done."
    out = rows(c4_doc_filter_op(_docs(spark, [(1, two_sent)])))[0]
    assert out["n_sentences"] == 2 and out["keep"] is False


def test_c4_doc_filter_line_fractions(spark):
    base = " ".join(f"word{i} okay." for i in range(30))
    bullets = "\n".join([base, "- bullet item one", "- bullet item two",
                         "* bullet item three", "And a trailing thought..."])
    out = rows(c4_doc_filter_op(_docs(spark, [(1, bullets)])))[0]
    assert out["bullet_line_frac"] == 0.6  # 3 of 5 lines
    assert out["ellipsis_line_frac"] == 0.2
    assert out["keep"] is True  # 0.6 <= 0.9 and 0.2 <= 0.3

    mostly_bullets = "\n".join(["- b"] * 19 + [base])
    out = rows(c4_doc_filter_op(_docs(spark, [(1, mostly_bullets)])))[0]
    assert out["bullet_line_frac"] == 0.95 and out["keep"] is False


def test_c4_doc_filter_mean_word_len(spark):
    text = "aa bbbb. " * 30  # mean (2+5)/2 = 3.5 ('bbbb.' counts the dot)
    out = rows(c4_doc_filter_op(_docs(spark, [(1, text.strip())])))[0]
    assert out["mean_word_len"] == pytest.approx(3.5)
    long_words = ("pneumonoultramicroscopic " * 60).strip() + " end. a. b."
    out = rows(c4_doc_filter_op(_docs(spark, [(1, long_words)])))[0]
    assert out["keep"] is False  # mean word length above 10


# ---------------------------------------------------------------- line dedupe

def test_line_dedupe_drops_frequent_lines(spark):
    banner = "Accept cookies to continue."
    docs = [
        (1, f"{banner}\nUnique one body.\nFooter A"),
        (2, f"{banner}\nUnique two body.\nFooter A"),
        (3, f"{banner}\nUnique three body.\nFooter B"),
        (4, "Unique four body.\nFooter B"),
    ]
    out = {r["doc_id"]: r for r in rows(
        line_dedupe_op(_docs(spark, docs), min_docs=3))}
    # banner in 3 docs -> dropped; footers in 2 docs each -> kept
    assert out[1]["text"] == "Unique one body.\nFooter A"
    assert out[1]["n_kept"] == 2 and out[1]["n_dropped"] == 1
    assert out[4]["text"] == "Unique four body.\nFooter B"
    assert out[4]["n_dropped"] == 0


def test_line_dedupe_preserves_order_and_empty_docs(spark):
    boiler = "same line everywhere"
    docs = [(i, f"alpha {i}\n{boiler}\nomega {i}") for i in range(1, 4)]
    docs.append((9, f"{boiler}\n{boiler}"))  # all lines boilerplate
    out = {r["doc_id"]: r for r in rows(
        line_dedupe_op(_docs(spark, docs), min_docs=3))}
    assert out[2]["text"] == "alpha 2\nomega 2"  # original order kept
    assert out[9]["text"] == "" and out[9]["n_kept"] == 0
    assert out[9]["n_dropped"] == 2


def test_line_dedupe_frequency_is_per_document_not_per_occurrence(spark):
    # a line repeated 5x inside ONE doc must not count as df=5
    docs = [(1, "echo\necho\necho\necho\necho"), (2, "echo\nother two")]
    out = {r["doc_id"]: r for r in rows(
        line_dedupe_op(_docs(spark, docs), min_docs=3))}
    assert out[1]["n_dropped"] == 0 and out[2]["n_dropped"] == 0


def test_line_dedupe_trims_before_matching(spark):
    docs = [
        (1, "  padded banner  \nbody one"),
        (2, "padded banner\nbody two"),
        (3, "padded banner \nbody three"),
    ]
    out = {r["doc_id"]: r for r in rows(
        line_dedupe_op(_docs(spark, docs), min_docs=3))}
    assert all(out[i]["n_dropped"] == 1 for i in (1, 2, 3))


# ---------------------------------------------------------------- span dedupe

def test_span_dedupe_drops_duplicated_windows(spark):
    docs = [
        (1, "alpha beta gamma delta epsilon zeta eta theta"),
        (2, "intro words alpha beta gamma delta epsilon more tail"),
        (3, "totally unique content nothing shared here at all ok"),
        (4, "alpha beta gamma delta epsilon zeta closing remark"),
    ]
    out = {r["doc_id"]: r for r in rows(
        span_dedupe_op(_docs(spark, docs), k=5, min_docs=2))}
    # "alpha beta gamma delta epsilon" is in docs 1/2/4; doc 1 and 4
    # additionally share the window shifted onto "zeta", so their
    # covered region extends one token further.
    assert out[1]["text"] == "eta theta"
    assert out[1]["n_kept"] == 2 and out[1]["n_dropped"] == 6
    assert out[2]["text"] == "intro words more tail"
    assert out[2]["n_kept"] == 4 and out[2]["n_dropped"] == 5
    assert out[3]["n_dropped"] == 0
    assert out[4]["text"] == "closing remark"


def test_span_dedupe_exact_removal_for_spans_under_2k(spark):
    # a duplicated run of 7 tokens with k=5 plants windows at offsets
    # 0..2; their union covers exactly the 7 duplicated tokens — the
    # fixed-window relaxation is EXACT for span lengths in [k, 2k).
    dup = "one two three four five six seven"
    docs = [
        (1, f"{dup} tail1 tailA tailB"),
        (2, f"head2 headX {dup}"),
    ]
    out = {r["doc_id"]: r for r in rows(
        span_dedupe_op(_docs(spark, docs), k=5, min_docs=2))}
    assert out[1]["text"] == "tail1 tailA tailB"
    assert out[1]["n_dropped"] == 7
    assert out[2]["text"] == "head2 headX"
    assert out[2]["n_dropped"] == 7


def test_span_dedupe_frequency_is_per_document_not_per_occurrence(spark):
    # the same 5-gram repeated inside ONE doc is df=1 -> kept
    docs = [
        (1, "a b c d e a b c d e"),
        (2, "totally different words here now"),
    ]
    out = {r["doc_id"]: r for r in rows(
        span_dedupe_op(_docs(spark, docs), k=5, min_docs=2))}
    assert out[1]["n_dropped"] == 0 and out[2]["n_dropped"] == 0


def test_span_dedupe_short_null_and_whitespace_docs(spark):
    docs = [
        (1, "short doc"),          # < k tokens: no windows, survives
        (2, None),                 # NULL -> empty document
        (3, "   "),                # whitespace-only -> empty
        (4, "short doc"),          # duplicate of 1 but too short
    ]
    out = {r["doc_id"]: r for r in rows(
        span_dedupe_op(_docs(spark, docs), k=5, min_docs=2))}
    assert out[1]["text"] == "short doc" and out[1]["n_dropped"] == 0
    assert out[2]["text"] == "" and out[2]["n_kept"] == 0
    assert out[3]["text"] == "" and out[3]["n_kept"] == 0
    assert out[4]["text"] == "short doc"


def test_span_dedupe_plan_ships_hashes_not_window_text(spark):
    # the 100 TB contract: window TEXT must never be an aggregation or
    # exchange input — occurrences are projected to (doc, pos,
    # xxhash64) before any shuffle, and the rebuild is a row-local
    # interval merge over the per-doc INT drop-position set
    plan = span_dedupe_op(
        _docs(spark, [(1, "a b c d e f")]), k=5, min_docs=2
    )._jdf.queryExecution().optimizedPlan().toString()
    assert "xxhash64" in plan
    assert "collect_list" not in plan
    assert "collect_set(__pos" in plan
    # no Aggregate groups by the shingle-text column: __sh is consumed
    # by xxhash64 in the scan-side projection; every aggregate keys on
    # the 64-bit hash and/or the doc id only
    for agg_frag in plan.split("Aggregate [")[1:]:
        assert "__sh" not in agg_frag.split("]", 1)[0]


def test_span_dedupe_is_byte_exact_no_case_folding(spark):
    # ExactSubstr is byte-exact: case-differing windows are distinct
    docs = [
        (1, "The Quick Brown Fox Jumps high"),
        (2, "the quick brown fox jumps low"),
        (3, "The Quick Brown Fox Jumps away"),
    ]
    out = {r["doc_id"]: r for r in rows(
        span_dedupe_op(_docs(spark, docs), k=5, min_docs=2))}
    assert out[1]["n_dropped"] == 5 and out[3]["n_dropped"] == 5
    assert out[2]["n_dropped"] == 0


def test_registry_names():
    from riko_spark.operators import get_operator

    assert get_operator("c4_line_filter") is c4_line_filter_op
    assert get_operator("c4_doc_filter") is c4_doc_filter_op
    assert get_operator("line_dedupe") is line_dedupe_op
    assert get_operator("span_dedupe") is span_dedupe_op


def test_ngram_contamination_hits_and_misses(spark):
    from riko_spark.operators.cleaning import ngram_contamination_op

    bench_text = "alpha beta gamma delta"
    docs = [
        (1, f"intro words {bench_text} trailing text"),   # contains it
        (2, f"{bench_text} and {bench_text} again"),      # twice -> still 1
        (3, "alpha beta gamma but no delta here"),        # only a 3-gram
        (4, "completely unrelated content words"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    bench = spark.createDataFrame([(100, bench_text)],
                                  "bench_id long, text string")
    out = {(r["doc_id"], r["bench_id"]): r["n_matched"]
           for r in rows(ngram_contamination_op(df, benchmark=bench, n=4))}
    assert out == {(1, 100): 1, (2, 100): 1}


def test_ngram_contamination_counts_distinct_shared_grams(spark):
    from riko_spark.operators.cleaning import ngram_contamination_op

    bench = spark.createDataFrame(
        [(1, "a b c d e")], "bench_id long, text string")  # two 4-grams
    df = spark.createDataFrame(
        [(7, "x a b c d e y")], "doc_id long, text string")
    out = rows(ngram_contamination_op(df, benchmark=bench, n=4))
    assert out[0]["n_matched"] == 2


def test_ngram_contamination_normalizes_case(spark):
    from riko_spark.operators.cleaning import ngram_contamination_op

    bench = spark.createDataFrame([(1, "Alpha Beta Gamma Delta")],
                                  "bench_id long, text string")
    df = spark.createDataFrame([(7, "ALPHA beta GAMMA delta")],
                               "doc_id long, text string")
    assert rows(ngram_contamination_op(df, benchmark=bench, n=4)) != []


def test_ngram_contamination_short_docs_and_missing_bench(spark):
    import pytest as _pytest

    from riko_spark.operators.cleaning import ngram_contamination_op

    df = spark.createDataFrame([(1, "too short")], "doc_id long, text string")
    bench = spark.createDataFrame([(1, "also short")],
                                  "bench_id long, text string")
    assert rows(ngram_contamination_op(df, benchmark=bench, n=13)) == []
    with _pytest.raises(ValueError, match="benchmark"):
        ngram_contamination_op(df)


def test_cleaning_ops_chain_through_flow(spark):
    """The fluent Flow API (SyncPipe analog) resolves the cleaning
    family through the registry autoload like any riko pipe."""
    from riko_spark.plans.flow import Flow

    df = spark.createDataFrame(
        [(i, "Shared banner line with five words.\n"
             f"Unique body {i} keeps five words.") for i in range(3)],
        "doc_id long, text string")
    out = rows(Flow(df).c4_line_filter({}).line_dedupe({"min_docs": 3}).df)
    assert all(r["n_dropped"] == 1 and "Unique body" in r["text"]
               for r in out)


def test_c4_gates_stream_batch_parity(spark, tmp_path):
    """The C4 gates are stateless projections, so they run unchanged
    on a stream: draining the same files through readStream must
    produce exactly the batch result."""
    src = str(tmp_path / "src")
    docs = [(i, "\n".join([
        f"Document {i} begins with a clean opening sentence.",
        "Subscribe to our newsletter today." if i % 2 == 0
        else f"Filler opening {i} adds unique prose here.",
        "fragment with no terminal punctuation",
        f"The closing remark {i} ends the page properly.",
    ])) for i in range(200)]
    spark.createDataFrame(docs, "doc_id long, text string") \
        .repartition(4).write.parquet(src)

    def gates(df):
        return c4_doc_filter_op(c4_line_filter_op(df)).select(
            "doc_id", "n_lines_kept", "n_lines_dropped", "n_words",
            "n_sentences", "keep", "text")

    expected = sorted(tuple(r) for r in gates(
        spark.read.parquet(src)).collect())

    out_dir = str(tmp_path / "out")
    stream = (spark.readStream
              .schema(spark.read.parquet(src).schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    q = (gates(stream).writeStream.format("parquet")
         .option("path", out_dir)
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = sorted(tuple(r) for r in spark.read.parquet(out_dir).collect())
    assert got == expected and len(got) == 200


def test_url_filter_rules(spark):
    from riko_spark.operators.cleaning import url_filter_op

    urls = [
        (1, "https://good.example.org/page"),
        (2, "https://spam-site.com/page"),          # exact host block
        (3, "https://deep.sub.spam-site.com/x"),    # suffix block
        (4, "https://notspam-site.com/x"),          # NOT a suffix match
        (5, "https://ok.org/p?sessionid=55"),       # pattern block
        (6, "not a url at all"),                    # unparseable -> drop
        (7, "https://OK.ORG/upper"),                # host lowercased
    ]
    df = spark.createDataFrame(urls, "doc_id long, url string")
    out = {r["doc_id"]: r for r in rows(url_filter_op(df, {
        "blocked_domains": ["spam-site.com"],
        "blocked_patterns": [r"[?&]sessionid="],
    }))}
    assert [out[i]["keep"] for i in range(1, 8)] == \
        [True, False, False, True, False, False, True]
    assert out[7]["host"] == "ok.org"
    assert out[6]["host"] == ""


def test_url_filter_registry():
    from riko_spark.operators import get_operator
    from riko_spark.operators.cleaning import url_filter_op

    assert get_operator("url_filter") is url_filter_op


def test_url_filter_null_url_lands_on_the_drop_side(spark):
    # review finding: NULL url -> keep must be FALSE, not NULL (a NULL
    # keep vanishes from both filter(keep) and filter(NOT keep))
    from riko_spark.operators.cleaning import url_filter_op

    df = spark.createDataFrame([(1, None), (2, "https://ok.org/x")],
                               "doc_id long, url string")
    out = {r["doc_id"]: r for r in rows(url_filter_op(df))}
    assert out[1]["keep"] is False and out[1]["host"] == ""
    assert out[2]["keep"] is True


def test_host_stats_groups_and_keep_counts(spark):
    from riko_spark.operators.cleaning import host_stats_op

    good = " ".join(f"word{i} okay." for i in range(30))  # passes the gate
    docs = [
        (1, "https://a.com/x", good),
        (2, "https://a.com/y", "tiny. two. three."),     # fails (n_words)
        (3, "https://b.org/z", good),
        (4, None, good),                                 # '' host bucket
    ]
    df = spark.createDataFrame(docs, "doc_id long, url string, text string")
    out = {r["host"]: (r["n_docs"], r["n_keep"], r["mean_len"])
           for r in rows(host_stats_op(df))}
    assert out["a.com"][0] == 2 and out["a.com"][1] == 1
    assert out["b.org"] == (1, 1, float(len(good)))
    assert out[""][0] == 1
    assert out["a.com"][2] == round((len(good) + len("tiny. two. three.")) / 2, 6)


def test_url_normalize_goldens(spark):
    from riko_spark.operators.cleaning import url_normalize_op

    cases = [
        # case folding + default port + fragment
        ("HTTPS://WWW.Ex.COM:443/A/b#frag", "https://www.ex.com/A/b"),
        ("http://Ex.Com:80/", "http://ex.com/"),
        # cross-scheme / non-default ports kept
        ("http://ex.com:443/x", "http://ex.com:443/x"),
        ("https://ex.com:80/x", "https://ex.com:80/x"),
        ("http://ex.com:8080/x", "http://ex.com:8080/x"),
        # empty path -> '/'
        ("http://ex.com", "http://ex.com/"),
        ("http://ex.com?a=1", "http://ex.com/?a=1"),
        # tracking params out, rest sorted, '?' dropped when empty
        ("http://ex.com/p?utm_source=x&b=2&a=1", "http://ex.com/p?a=1&b=2"),
        ("http://ex.com/p?UTM_Campaign=x&gclid=9", "http://ex.com/p"),
        ("http://ex.com/p?b=2&a=10&a=1", "http://ex.com/p?a=1&a=10&b=2"),
        # path case preserved; no scheme -> passthrough
        ("http://EX.com/CaseSensitive", "http://ex.com/CaseSensitive"),
        ("not a url", "not a url"),
        ("/relative/path?b=1", "/relative/path?b=1"),
    ]
    df = spark.createDataFrame(
        [(i, u) for i, (u, _) in enumerate(cases)], ["doc_id", "url"])
    got = {r["url"]: r["norm_url"]
           for r in url_normalize_op(df).collect()}
    for url, want in cases:
        assert got[url] == want, (url, got[url], want)


def test_url_normalize_idempotent_and_configurable(spark):
    from riko_spark.operators.cleaning import url_normalize_op

    df = spark.createDataFrame(
        [(0, "HTTP://A.B:80/p?utm_x=1&z=2&sid=3#f")], ["doc_id", "url"])
    once = url_normalize_op(df).select(
        "doc_id", F.col("norm_url").alias("url"))
    twice = url_normalize_op(once).collect()[0]["norm_url"]
    assert twice == "http://a.b/p?sid=3&z=2"  # fixed point
    custom = url_normalize_op(
        df, strip_params=("utm_", "sid")).collect()[0]["norm_url"]
    assert custom == "http://a.b/p?z=2"
