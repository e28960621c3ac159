"""Web-corpus cleaning operators: C4/Gopher document gating and
corpus-level boilerplate line removal (RefinedWeb-style line dedupe).

These are the standard text-cleaning passes a Common-Crawl-scale
training-data pipeline runs between extraction and dedupe/filtering
(Raffel et al. 2020 "C4", Rae et al. 2021 "Gopher/MassiveText",
Penedo et al. 2023 "RefinedWeb" — all public):

* :func:`c4_line_filter_op` — per-document line gating (terminal
  punctuation, minimum words per line).  Row-local native array
  expressions: no explode, no shuffle, scan-parallel at 100 TB.
* :func:`c4_doc_filter_op` — document-level quality gates (sentence
  count, lorem-ipsum / curly-brace markers, word-count and word-length
  bounds, bullet/ellipsis line ratios).  Also row-local and native.
* :func:`line_dedupe_op` — CORPUS-level boilerplate removal: a line
  that appears in >= ``min_docs`` distinct documents (nav bars, cookie
  banners, footers) is dropped from every document.  This is the one
  op in the family that must shuffle; see the docstring for the
  100 TB shape.

The reference engine has no corpus-cleaning pass (riko is a per-item
pipe runtime, riko/modules/*); these extend the engine's
training-data surface the way dedupe.py and textstats.py do.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from riko_spark.operators import fanout_small_scan, register
from riko_spark.operators.textstats import (
    word_shingle_hashes,
    word_shingles,
    words_col,
)

# line-level gates (C4): keep lines that end in terminal punctuation
# and carry at least MIN_LINE_WORDS words.
TERMINAL_RE = r'[.!?"”]$'
MIN_LINE_WORDS = 5

# document-level gates (C4 + Gopher defaults)
MIN_SENTENCES = 3
MIN_WORDS, MAX_WORDS = 50, 100_000
MIN_MEAN_WORD_LEN, MAX_MEAN_WORD_LEN = 3.0, 10.0
MAX_BULLET_LINE_FRAC = 0.9
MAX_ELLIPSIS_LINE_FRAC = 0.3


def lines_col(text: Column) -> Column:
    """Non-empty lines of ``text`` (leading/trailing blanks trimmed
    per line, blank lines removed)."""
    return F.filter(
        F.transform(F.split(text, "\n"), lambda x: F.trim(x)),
        lambda x: x != F.lit(""),
    )


#: the characters TERMINAL_RE accepts as a line's final character
_TERMINAL_CHARS = [".", "!", "?", '"', "”"]


def _line_words(line: Column) -> Column:
    # callers pass lines from lines_col (trimmed, non-empty), so a bare
    # split can produce no empty tokens — skipping the per-token filter
    # pass (these run interpreted inside the line-level higher-order
    # filter; see word_shingles for why that matters)
    return F.size(F.split(line, r"\s+"))


@register("c4_line_filter")
def c4_line_filter_op(
    df: DataFrame,
    conf: dict | None = None,
    field: str = "text",
    min_words: int = MIN_LINE_WORDS,
    require_terminal: bool = True,
) -> DataFrame:
    """C4 line-level gate: keep only lines with >= ``min_words`` words
    that end in terminal punctuation ('.', '!', '?', closing quote).

    Row-local: a single native projection over ``split(text, '\\n')``
    with higher-order filters — no explode, no shuffle, no Python.
    Adds ``<field>`` (rebuilt from kept lines), ``n_lines_kept`` and
    ``n_lines_dropped``.
    """
    conf = conf or {}
    min_words = int(conf.get("min_words", min_words))
    require_terminal = bool(conf.get("require_terminal", require_terminal))
    # the gate's per-line higher-order filters are the expensive part
    # of every composition that embeds this op, and they evaluate in
    # the stage that computes THIS projection — so the unsplittable-
    # input fan-out must happen here, below the gate expressions, not
    # in the downstream aggregator (a repartition above a projection
    # does not push down past it)
    df = fanout_small_scan(df)
    lines = lines_col(F.col(field))

    def keep(line: Column) -> Column:
        ok = _line_words(line) >= F.lit(min_words)
        if require_terminal:
            # last-char isin == TERMINAL_RE on trimmed newline-free
            # lines, without a per-line regex scan ($-anchored
            # regexp_count still walks the whole line through the
            # regex engine, interpreted inside this higher-order
            # filter; measured ~20% off the c4 stage)
            ok = ok & F.substring(line, -1, 1).isin(*_TERMINAL_CHARS)
        return ok

    kept = F.filter(lines, keep)
    return df.withColumns({
        "n_lines_kept": F.size(kept),
        "n_lines_dropped": F.size(lines) - F.size(kept),
        field: F.array_join(kept, "\n"),
    })


@register("c4_doc_filter")
def c4_doc_filter_op(
    df: DataFrame,
    conf: dict | None = None,
    field: str = "text",
    assign: str = "keep",
) -> DataFrame:
    """C4 + Gopher document-level quality gate.

    Emits the individual signals (so a pipeline can re-threshold
    without a rescan) plus the combined ``keep`` flag:

    * ``n_words``, ``mean_word_len`` — Gopher bounds [50, 100k] words,
      mean word length [3, 10]
    * ``n_sentences`` — count of '.', '!', '?' occurrences; C4 drops
      pages with fewer than 3 sentences
    * ``has_lorem`` / ``has_curly`` — C4 drops pages containing
      "lorem ipsum" or '{'
    * ``bullet_line_frac`` / ``ellipsis_line_frac`` — Gopher drops
      pages with > 90% bullet-initial lines or > 30% ellipsis-ending
      lines

    All native Column expressions evaluated in one scan — row-local,
    shuffle-free, linear at 100 TB.  Fractions are rounded to 6 dp for
    cross-engine comparison.
    """
    conf = conf or {}
    df = fanout_small_scan(df)  # same rationale as c4_line_filter_op
    text = F.col(field)
    low = F.lower(text)
    toks = words_col(text)
    lines = lines_col(text)
    n_words = F.size(toks)
    n_lines = F.size(lines)
    mean_wl = F.when(
        n_words > 0,
        F.aggregate(toks, F.lit(0).cast("long"),
                    lambda a, x: a + F.length(x)).cast("double")
        / n_words.cast("double"),
    ).otherwise(F.lit(0.0))
    n_sentences = F.size(F.regexp_extract_all(text, F.lit(r"[.!?]"), F.lit(0)))

    def line_frac(pred) -> Column:
        return F.when(
            n_lines > 0,
            F.size(F.filter(lines, pred)).cast("double") / n_lines.cast("double"),
        ).otherwise(F.lit(0.0))

    bullet_frac = line_frac(
        lambda x: F.regexp_count(x, F.lit(r"^[-*•]")) > 0)
    ellipsis_frac = line_frac(
        lambda x: F.regexp_count(x, F.lit(r"(\.\.\.|…)$")) > 0)
    has_lorem = low.contains("lorem ipsum")
    has_curly = text.contains("{")

    out = df.withColumns({
        "n_words": n_words,
        "mean_word_len": F.round(mean_wl, 6),
        "n_sentences": n_sentences,
        "has_lorem": has_lorem,
        "has_curly": has_curly,
        "bullet_line_frac": F.round(bullet_frac, 6),
        "ellipsis_line_frac": F.round(ellipsis_frac, 6),
    })
    keep = (
        (F.col("n_words") >= F.lit(int(conf.get("min_words", MIN_WORDS))))
        & (F.col("n_words") <= F.lit(int(conf.get("max_words", MAX_WORDS))))
        & (F.col("mean_word_len") >= F.lit(float(conf.get(
            "min_mean_word_len", MIN_MEAN_WORD_LEN))))
        & (F.col("mean_word_len") <= F.lit(float(conf.get(
            "max_mean_word_len", MAX_MEAN_WORD_LEN))))
        & (F.col("n_sentences") >= F.lit(int(conf.get(
            "min_sentences", MIN_SENTENCES))))
        & ~F.col("has_lorem")
        & ~F.col("has_curly")
        & (F.col("bullet_line_frac") <= F.lit(float(conf.get(
            "max_bullet_line_frac", MAX_BULLET_LINE_FRAC))))
        & (F.col("ellipsis_line_frac") <= F.lit(float(conf.get(
            "max_ellipsis_line_frac", MAX_ELLIPSIS_LINE_FRAC))))
    )
    return out.withColumn(assign, keep)


def _frequent_drops(df: DataFrame, id_col: str, hash_arr: Column,
                    min_docs: int) -> tuple[DataFrame, DataFrame]:
    """(frequent hash set, per-doc drop-position map) over a per-row
    hash ARRAY — the shared two-consumer core of
    :func:`line_dedupe_op` and :func:`span_dedupe_op`.

    Three deliberate shape decisions, all measured this round:

    * Document frequency dedupes WITHIN each row first
      (``array_distinct``, row-local and linear) and explodes the
      already-unique hashes, so ``groupBy(h).count`` with map-side
      partial combine replaces the previous two-phase exact
      count-distinct over every (hash, doc) occurrence — the 21M-row
      distinct aggregation was the single biggest stage of the span
      bench (10.2 s of 37) and is now a plain partial count.
    * The two consumers RECOMPUTE the hash derivation rather than
      sharing one ``repartition(__h)`` exchange.  The shared-exchange
      variant (guide §2.4) was tried and is SLOWER here (49.7 s vs
      37.2 s on the sf1.0 span bench): every occurrence row then
      crosses the wire once and is fetched TWICE, while in this shape
      the hits branch stays inside the scan stage as a broadcast
      probe and only partial-aggregate outputs are exchanged.
    * The REBALANCE hint after the ``>= min_docs`` filter inserts an
      AQE stage boundary whose measured output is the TRUE (post-
      filter) frequent-set size, so AQE converts the hits join to a
      broadcast from facts, not from the pre-filter estimate (a
      same-key .repartition() would be removed by
      CollapseRepartition).  Cost when the side really is big: one
      extra hash-only pass, small next to the corpus exchange it
      saves when broadcast applies; a pathologically huge frequent
      set degrades to SMJ, as before.  The drops side ships
      ``(id, int positions)`` pairs ∝ boilerplate hits only.
    """
    frequent = (
        df.select(F.explode(F.array_distinct(hash_arr)).alias("__h"))
        .groupBy("__h").agg(F.count(F.lit(1)).alias("__df"))
        .filter(F.col("__df") >= F.lit(min_docs))
        .select("__h")
        .hint("rebalance")
    )
    occurrences = df.select(
        F.col(id_col), F.posexplode(hash_arr).alias("__pos", "__h"))
    drops = (
        occurrences.join(frequent, on="__h")
        .groupBy(id_col)
        .agg(F.collect_set("__pos").alias("__drop"))
        .hint("rebalance")
    )
    return frequent, drops


@register("line_dedupe", kind="operator", sub_kind="aggregator")
def line_dedupe_op(
    df: DataFrame,
    conf: dict | None = None,
    field: str = "text",
    id_col: str = "doc_id",
    min_docs: int = 3,
) -> DataFrame:
    """Corpus-level boilerplate line removal (RefinedWeb): drop every
    line that appears, byte-identical after trimming, in >=
    ``min_docs`` DISTINCT documents — navigation bars, cookie
    banners, share buttons, footers.

    100 TB shape — line text never enters an aggregation or the
    frequency/hit joins; in the typical regime (docs with boilerplate
    hits ≪ corpus) no text crosses any exchange at all:

    1. ``posexplode`` the trimmed lines and immediately project each
       occurrence down to ``(doc, pos, xxhash64(line))`` — 20 bytes —
       so the document-frequency aggregation (``distinct(hash, doc) ->
       count per hash``, two-stage exact count-distinct with map-side
       partial combine) moves hashes, never text.
    2. Join the occurrences against the frequent-hash set (df >=
       ``min_docs``) to keep only the HITS — ``(doc, drop_pos)`` pairs
       proportional to BOILERPLATE volume, not corpus volume — and
       ``collect_set`` the drop positions per document (partial
       aggregation; set size bounded by lines-per-doc).
    3. Left-join the per-doc drop-position arrays back to the corpus
       and rebuild each document ROW-LOCALLY with a native
       filter-by-position projection (``filter(lines, (x, i) -> NOT
       array_contains(drop, i))``) — reassembly is a scan-parallel
       projection, not an aggregation.  The drop map holds one row per
       document WITH a boilerplate hit, orders of magnitude smaller
       than the corpus, so AQE broadcasts it and the corpus side never
       shuffles; in the pathological all-docs-hit regime the fallback
       is one shuffle of ``(doc, int positions)`` pairs plus the doc
       rows — still strictly less than the naive
       explode→anti-join→collect_list shape, which moves every line's
       TEXT through two exchanges.

    Hash note: a 64-bit line hash at 10^12 distinct lines carries a
    ~3% corpus-wide chance of ONE colliding pair (birthday bound),
    whose worst effect is one innocent line dropped alongside a
    boilerplate one — acceptable for corpus cleaning; swap the key for
    ``sha2(line, 256)`` if provable-no-collision matters more than
    shuffle width.

    Documents whose every line is boilerplate are preserved with empty
    text, so downstream doc-level filters see them.  NULL ``field``
    values are treated as empty documents (0 lines kept, 0 dropped,
    '' text) rather than emitting NULL/-1 counters.

    Output: ``id_col``, cleaned ``field``, ``n_kept``, ``n_dropped``.
    """
    conf = conf or {}
    min_docs = int(conf.get("min_docs", min_docs))
    df = fanout_small_scan(df)
    src = F.coalesce(F.col(field), F.lit(""))
    line_hashes = F.transform(lines_col(src), lambda x: F.xxhash64(x))
    frequent, drops = _frequent_drops(df, id_col, line_hashes, min_docs)
    drop_arr = F.coalesce(F.col("__drop"), F.array().cast("array<int>"))
    kept = F.filter(F.col("__lines"),
                    lambda x, i: ~F.array_contains(drop_arr, i))
    # the line array is staged ONCE (__lines): referenced both by the
    # keep filter and the total count, and a non-cheap alias used
    # twice is not inlined back by CollapseProject
    return (
        df.join(drops, on=id_col, how="left")
        .select(F.col(id_col), lines_col(src).alias("__lines"), "__drop")
        .select(F.col(id_col), F.size("__lines").alias("__total"),
                kept.alias("__kept"))
        .select(
            F.col(id_col),
            F.array_join(F.col("__kept"), "\n").alias(field),
            F.size("__kept").cast("long").alias("n_kept"),
            (F.col("__total") - F.size("__kept")).cast("long")
            .alias("n_dropped"),
        )
    )


@register("span_dedupe", kind="operator", sub_kind="aggregator")
def span_dedupe_op(
    df: DataFrame,
    conf: dict | None = None,
    field: str = "text",
    id_col: str = "doc_id",
    k: int = 50,
    min_docs: int = 2,
) -> DataFrame:
    """Exact duplicated-substring removal at token granularity (Lee
    et al. 2021, "Deduplicating Training Data Makes Language Models
    Better" — the ExactSubstr pass, public): every ``k``-token window
    whose exact text occurs in >= ``min_docs`` DISTINCT documents is
    removed from every document, i.e. all token positions covered by
    any duplicated window are dropped and the survivors are rejoined
    with single spaces.  The paper's suffix-array formulation finds
    duplicated spans of length >= k; the fixed-window formulation here
    removes the same token set for spans in [k, 2k) and a superset
    contained in the duplicated region for longer spans — the standard
    shuffle-friendly relaxation (a distributed suffix array needs a
    global sort per round; this needs one hash aggregation).

    100 TB shape — mirrors :func:`line_dedupe_op`: window text never
    crosses an exchange.

    1. Tokenize row-locally and build the k-gram windows with the
       zip_with shingle chain (no per-window array copies), then
       project each occurrence to ``(doc, pos, xxhash64(window))``.
    2. Document frequency per window hash via two-stage distinct +
       count with map-side partial aggregation; REBALANCE after the
       ``>= min_docs`` filter so AQE sizes the broadcast from the
       TRUE (post-filter) frequent-set size, not the pre-filter
       exchange below it.
    3. Keep only the HITS (occurrences of frequent windows) —
       proportional to duplicated-span volume, not corpus volume —
       and ``collect_set`` the hit START positions per document.
    4. Rebuild each document ROW-LOCALLY: sort the drop starts, merge
       the ``[p, p + k)`` cover intervals in ONE linear ``aggregate``
       pass (boilerplate regions are contiguous, so the merged list is
       short), then rebuild the survivors as a ``flatten`` of the
       between-interval gap slices — O(drops + tokens) per row instead
       of the naive O(tokens x drops) per-token ``exists`` (higher-
       order fns are interpreted, so the quadratic form dominates the
       whole job in high-duplication corpora: 6.5x slower end-to-end
       on the 20x-replicated bench corpus).  Scan-parallel, no
       shuffle.

    Tokens are whitespace-split and NOT case-folded (the pass is
    byte-exact, like the reference ExactSubstr).  Documents shorter
    than ``k`` tokens contribute no windows and always survive whole;
    NULL ``field`` is an empty document.  Output: ``id_col``, cleaned
    ``field`` (space-rejoined), ``n_kept``, ``n_dropped``.
    """
    conf = conf or {}
    k = int(conf.get("k", k))
    min_docs = int(conf.get("min_docs", min_docs))
    df = fanout_small_scan(df)
    src = F.coalesce(F.col(field), F.lit(""))
    toks = F.filter(F.split(src, r"\s+"), lambda x: x != F.lit(""))
    # window keys are hashed DIRECTLY with the zip_with hash-combine
    # chain (textstats.word_shingle_hashes): no k-gram string is ever
    # materialized — equal windows still collide exactly like
    # xxhash64(joined string), and the output (which depends only on
    # window EQUALITY, recomputed from text by the oracle) is
    # unchanged, but the per-window interpreted concat allocations
    # disappear from both occurrence passes (guide §1.2 "per-task
    # work"; measured 49.8 -> 37.2 s on the sf1.0 bench corpus)
    frequent, drops = _frequent_drops(
        df, id_col, word_shingle_hashes(toks, k), min_docs)
    drop_arr = F.coalesce(F.col("__drop"), F.array().cast("array<int>"))
    # the token array is staged ONCE (__toks) for the rebuild: inside
    # the gap-slice lambda the array argument would otherwise be
    # re-evaluated per gap (tokenization per row x gaps), and a
    # non-cheap alias used more than once is not inlined back by
    # CollapseProject
    toks = F.col("__toks")

    # -- row-local rebuild: merge sorted [p, p+k) intervals linearly,
    #    then keep the gap slices between merged intervals --
    def _close(acc):
        # append the open interval (if any) to the finished list
        return F.when(acc["s"] < F.lit(0), acc["res"]).otherwise(
            F.concat(acc["res"], F.array(
                F.struct(acc["s"].alias("s"), acc["e"].alias("e")))))

    def _step(acc, p):
        extend = F.struct(
            acc["res"].alias("res"), acc["s"].alias("s"),
            F.greatest(acc["e"], p + F.lit(k)).alias("e"))
        open_new = F.struct(
            _close(acc).alias("res"),
            p.alias("s"), (p + F.lit(k)).alias("e"))
        return F.when(
            (acc["s"] >= F.lit(0)) & (p <= acc["e"]), extend
        ).otherwise(open_new)

    acc0 = F.struct(
        F.array().cast("array<struct<s:int,e:int>>").alias("res"),
        F.lit(-1).alias("s"), F.lit(-1).alias("e"))
    merged = F.aggregate(F.array_sort(drop_arr), acc0, _step, _close)
    n = F.size(toks)
    gap_starts = F.concat(
        F.array(F.lit(0)), F.transform(merged, lambda iv: iv["e"]))
    gap_ends = F.concat(
        F.transform(merged, lambda iv: iv["s"]), F.array(n))
    kept = F.flatten(F.zip_with(
        gap_starts, gap_ends,
        lambda s, e: F.slice(toks, s + 1, F.greatest(e - s, F.lit(0)))))
    raw_toks = F.filter(F.split(src, r"\s+"), lambda x: x != F.lit(""))
    return (
        df.join(drops, on=id_col, how="left")
        .select(F.col(id_col), raw_toks.alias("__toks"), "__drop")
        .select(F.col(id_col), F.size(toks).alias("__total"),
                kept.alias("__kept"))
        .select(
            F.col(id_col),
            F.array_join(F.col("__kept"), " ").alias(field),
            F.size("__kept").cast("long").alias("n_kept"),
            (F.col("__total") - F.size("__kept")).cast("long")
            .alias("n_dropped"),
        )
    )


@register("ngram_contamination", kind="operator", sub_kind="aggregator")
def ngram_contamination_op(
    df: DataFrame,
    conf: dict | None = None,
    benchmark: DataFrame | None = None,
    field: str = "text",
    id_col: str = "doc_id",
    bench_id_col: str = "bench_id",
    n: int = 13,
    bloom_bits: int | None = None,
    bloom_hashes: int | None = None,
) -> DataFrame:
    """Benchmark decontamination (the GPT-3 appendix-C / PaLM
    convention, public): flag training documents sharing any
    normalized word ``n``-gram (default 13) with an evaluation
    benchmark, so contaminated docs can be dropped before training.

    Output: one row per (document, benchmark item) with an overlap —
    ``id_col``, ``bench_id_col``, ``n_matched`` (DISTINCT shared
    n-grams; any row at all means contaminated).

    100 TB shape: the benchmark side is tiny next to the corpus —
    its distinct n-gram hash set is built once and BROADCAST, so the
    corpus side is one scan that explodes token n-grams to 8-byte
    xxhash64 keys, probes the broadcast hash table (no shuffle), and
    partially aggregates the survivors per (doc, bench) — the only
    shuffle is the final count over matches, which is proportional to
    CONTAMINATION volume, not corpus volume.  A 64-bit n-gram hash
    collision can flag one innocent doc pair (~1e-7 at 10^12 corpus
    n-grams x 10^6 benchmark n-grams); decontamination errs exactly
    that direction by design.

    Normalization: lowercase + whitespace tokenization on both sides
    (the published recipes normalize more aggressively; plug a custom
    ``field`` expression upstream for that).

    ``bloom_bits`` (optional, with ``bloom_hashes`` defaulting to the
    textbook optimum): the benchmark-too-big-to-broadcast lever.  A
    HELM/BIG-bench-scale suite can carry 10^8+ distinct 13-grams —
    hundreds of MB as a broadcast hash relation.  With bloom on, the
    benchmark grams are packed ONCE into a ``bloom_bits``-bit Bloom
    bitset (functions/bloom.py: bit_or aggregation, exchange ∝
    bits/64 not grams), the corpus side is pruned by the ROW-LOCAL
    probe predicate (zero joins, zero exchanges, whole-stage
    codegen), and only the survivors — contamination volume plus the
    (1−e^{−kn/m})^k false-positive trickle — reach the exact join,
    which AQE is left to plan (no broadcast hint).  The final output
    is IDENTICAL to the non-bloom path: the Bloom stage can admit
    false positives but the exact join removes them, and false
    negatives are structurally impossible (build and probe share the
    position expression).
    """
    conf = conf or {}
    n = int(conf.get("n", n))
    bloom_bits = conf.get("bloom_bits", bloom_bits)
    bloom_hashes = conf.get("bloom_hashes", bloom_hashes)
    if benchmark is None:
        raise ValueError("ngram_contamination requires a benchmark frame")

    def ngram_hashes(text: Column) -> Column:
        toks = words_col(text)
        # word_shingles' zip_with chain: no per-gram array copies
        # (at n=13 the naive slice form copies a 13-element array
        # per gram, interpreted — see textstats.word_shingles)
        grams = F.when(
            F.size(toks) >= n,
            F.transform(word_shingles(toks, n), lambda s: F.xxhash64(s)),
        ).otherwise(F.array().cast("array<bigint>"))
        return F.array_distinct(grams)

    bench_grams = benchmark.select(
        F.col(bench_id_col),
        F.explode(ngram_hashes(F.col(field))).alias("__g"),
    ).distinct()
    if bloom_bits is not None:
        # bloom mode is already eager (the optimal-hash-count probe
        # runs a count job at build time), so materialize the
        # benchmark gram derivation ONCE: the count, the Bloom bitset
        # aggregation and the exact verify join all read the
        # checkpointed table instead of re-running the tokenize/
        # explode/distinct lineage three times (ADVICE r8)
        bench_grams = bench_grams.localCheckpoint(eager=True)
    doc_grams = df.select(
        F.col(id_col),
        F.explode(ngram_hashes(F.col(field))).alias("__g"),
    )
    if bloom_bits is not None:
        from riko_spark.functions.bloom import (
            bloom_build,
            bloom_might_contain,
            optimal_num_hashes,
        )

        gram_keys = bench_grams.select("__g").distinct()
        if bloom_hashes is None:
            bloom_hashes = optimal_num_hashes(
                int(bloom_bits), gram_keys.count())
        dense = bloom_build(gram_keys, "__g", int(bloom_bits),
                            int(bloom_hashes))
        doc_grams = doc_grams.where(
            bloom_might_contain(dense, F.col("__g"), int(bloom_hashes)))
        joined = doc_grams.join(bench_grams, on="__g")  # AQE plans it
    else:
        joined = doc_grams.join(F.broadcast(bench_grams), on="__g")
    return (
        joined
        .groupBy(id_col, bench_id_col)
        .agg(F.count(F.lit(1)).cast("long").alias("n_matched"))
    )


#: host extraction used identically by the operator and its oracle —
#: scheme://host stops at '/', ':', '?', '#' (ports and paths excluded)
HOST_RE = r"^[a-z][a-z0-9+.-]*://([^/:?#]+)"


def host_col(url: Column) -> Column:
    """Lowercased host of ``url``; '' for NULL/unparseable URLs so
    every row lands on one side of downstream keep filters and corpus
    accounting stays total.  The ONE definition of host identity —
    shared by :func:`url_filter_op` and :func:`host_stats_op` so the
    two ops can never disagree."""
    return F.coalesce(F.lower(F.regexp_extract(url, HOST_RE, 1)), F.lit(""))


@register("url_filter")
def url_filter_op(
    df: DataFrame,
    conf: dict | None = None,
    field: str = "url",
    blocked_domains: list[str] | None = None,
    blocked_patterns: list[str] | None = None,
    assign: str = "keep",
) -> DataFrame:
    """URL gating (the RefinedWeb/CCNet stage-one filter, public):
    drop documents whose host is on a domain blocklist (exact host or
    any-subdomain suffix match) or whose full URL matches a blocked
    pattern (regex, e.g. session-id/tracker paths).

    Emits ``host`` (lowercased) and the ``keep`` flag rather than
    filtering, so a pipeline can audit drop reasons; chain
    ``.filter("keep")`` to enforce.  All native expressions — the
    blocklist compiles into the projection (fine for the typical
    1e3–1e5-entry list; beyond that, broadcast-join a blocklist table
    instead) — so the gate is row-local and shuffle-free at 100 TB.
    """
    conf = conf or {}
    blocked_domains = [d.lower() for d in conf.get(
        "blocked_domains", blocked_domains or [])]
    blocked_patterns = list(conf.get(
        "blocked_patterns", blocked_patterns or []))
    url = F.col(field)
    host = host_col(url)
    blocked = F.lit(False)
    for d in blocked_domains:
        blocked = blocked | (F.col("host") == d) \
            | F.col("host").endswith("." + d)
    for p in blocked_patterns:
        blocked = blocked | (F.regexp_count(url, F.lit(p)) > 0)
    # an unparseable URL (no scheme://host) is never kept
    return (df.withColumn("host", host)
            .withColumn(assign, (F.col("host") != "") & ~blocked))


#: the full-URL split used identically by url_normalize and its
#: oracle: scheme :// authority path?query#fragment — groups 1-3;
#: the query is re-extracted with _URL_QUERY_RE (everything between
#: '?' and '#'/end) so both engines cut the same five pieces
URL_SPLIT_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)"
_URL_QUERY_RE = r"\?([^#]*)"

#: default tracking-parameter prefixes (lowercased match) stripped by
#: url_normalize — the public utm/click-id families every crawl
#: frontier canonicalizes away
TRACKING_PARAM_PREFIXES = (
    "utm_", "fbclid", "gclid", "msclkid", "sessionid", "phpsessid")


@register("url_normalize")
def url_normalize_op(
    df: DataFrame,
    conf: dict | None = None,
    field: str = "url",
    assign: str = "norm_url",
    strip_params: tuple[str, ...] = TRACKING_PARAM_PREFIXES,
) -> DataFrame:
    """Crawl-frontier URL canonicalization (RFC 3986 §6 syntax-based
    normalization plus the standard crawler conventions): two URLs
    that normalize equal are one frontier entry / one document key.

    * scheme and authority lowercased (RFC 3986 §6.2.2.1)
    * default port stripped — ``:80`` for http, ``:443`` for https
    * empty path → ``/``
    * query parameters: tracking params dropped (any param whose
      lowercased name starts with a ``strip_params`` prefix), the
      rest SORTED bytewise — parameter order never carries meaning
      for dedupe purposes — and '?' dropped when nothing survives
    * fragment dropped (never sent to the server)

    Percent-encoding and dot-segment normalization are NOT applied
    (they need a full codec pass; document keys only require a
    deterministic canonical form, not the minimal one).  URLs with no
    ``scheme://`` prefix pass through unchanged — the op never
    invents structure.  All native expressions (regexp splits + one
    array filter/sort over the query) — row-local, shuffle-free.
    """
    conf = conf or {}
    field = conf.get("field", field)
    assign = conf.get("assign", assign)
    strip_params = tuple(conf.get("strip_params", strip_params))

    url = F.col(field)
    scheme = F.lower(F.regexp_extract(url, URL_SPLIT_RE, 1))
    auth = F.lower(F.regexp_extract(url, URL_SPLIT_RE, 2))
    path = F.regexp_extract(url, URL_SPLIT_RE, 3)
    qs = F.regexp_extract(url, _URL_QUERY_RE, 1)

    auth = (
        F.when((scheme == "http") & auth.endswith(":80"),
               F.substring(auth, 1, F.length(auth) - 3))
        .when((scheme == "https") & auth.endswith(":443"),
              F.substring(auth, 1, F.length(auth) - 4))
        .otherwise(auth)
    )
    path = F.when(path == "", F.lit("/")).otherwise(path)

    def keep_param(p: Column) -> Column:
        out = p != F.lit("")
        for pre in strip_params:
            out = out & ~F.lower(p).startswith(pre)
        return out

    kept = F.array_sort(F.filter(F.split(qs, "&"), keep_param))
    query = F.when(F.size(kept) > 0,
                   F.concat(F.lit("?"), F.array_join(kept, "&"))
                   ).otherwise(F.lit(""))

    norm = F.when(
        scheme == "", url,  # no scheme://: pass through unchanged
    ).otherwise(F.concat(scheme, F.lit("://"), auth, path, query))
    return df.withColumn(assign, norm)


#: output schema for the default ``id_col='doc_id'`` over a bigint id;
#: :func:`main_content_op` derives the actual schema from its inputs
MAIN_CONTENT_SCHEMA = (
    "doc_id bigint, main_text string, main_tag string, text_len int, "
    "link_density double"
)


@register("main_content")
def main_content_op(df: DataFrame, conf: dict | None = None,
                    field: str = "html", id_col: str = "doc_id",
                    keep_cols: tuple[str, ...] = ()) -> DataFrame:
    """DOM-level boilerplate removal: parse each page with the
    html5-lite DOM and keep the block container with the highest
    ``text_len * (1 - link_density)`` score (functions/readability.py)
    — nav bars, footers and link farms lose to the article body, and
    chrome subtrees (script/style/nav/header/footer/aside) never
    contribute.  The step between raw crawl HTML and everything in
    this module.

    The id column keeps its input NAME and TYPE in the output (the
    schema is built from ``df``'s own ``id_col`` field, so string or
    int ids both pass through unchanged); ``keep_cols`` names further
    input columns to carry through unchanged (e.g. the event-time
    column a downstream watermark needs).  Rows whose ``field`` is
    NULL carry no parseable page and are DROPPED from the output —
    filter them upstream if they must be accounted for.

    Python DOM work, Arrow-batched via mapInPandas (one batch of pages
    per task) — row-local, shuffle-free, scan-parallel at 100 TB."""
    import pandas as pd

    conf = conf or {}
    field = conf.get("field", field)
    id_col = conf.get("id_col", id_col)
    keep_cols = tuple(conf.get("keep_cols", keep_cols))
    types = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    schema = ", ".join(
        [f"{c} {types[c]}" for c in (id_col, *keep_cols)]
        + ["main_text string", "main_tag string", "text_len int",
           "link_density double"])

    def run(batches):
        from riko_spark.functions.readability import extract_main

        for pdf in batches:
            rows = []
            for rid, *extras, h in zip(
                    pdf[id_col], *(pdf[c] for c in keep_cols), pdf[field]):
                if h is None:
                    continue
                r = extract_main(h if isinstance(h, str) else bytes(h))
                rows.append((rid, *extras, r["main_text"], r["main_tag"],
                             r["text_len"], r["link_density"]))
            yield pd.DataFrame(rows, columns=[
                id_col, *keep_cols, "main_text", "main_tag", "text_len",
                "link_density"])

    return df.mapInPandas(run, schema)


@register("host_stats", kind="operator", sub_kind="aggregator")
def host_stats_op(
    df: DataFrame,
    conf: dict | None = None,
    url_col: str = "url",
    field: str = "text",
) -> DataFrame:
    """Per-host corpus statistics — the domain-curation view CCNet /
    RefinedWeb build before sampling: document count, mean document
    length, and mean quality-gate pass rate per registrable host, so a
    pipeline can up/down-weight or ban whole domains instead of
    re-scoring documents one at a time.

    One shuffle (groupBy host with partial aggregation); host
    extraction shares :data:`HOST_RE` with :func:`url_filter_op` so
    the two ops always agree on identity.  Mean length is rounded to
    6 dp for cross-engine comparison; hosts arrive lowercased, and
    unparseable URLs aggregate under the '' host so corpus accounting
    stays total."""
    conf = conf or {}
    url_col = conf.get("url_col", url_col)
    field = conf.get("field", field)
    gated = c4_doc_filter_op(
        df.withColumn("host", host_col(F.col(url_col))), conf, field=field)
    return (
        gated.groupBy("host")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.round(F.avg(F.length(F.col(field))), 6).alias("mean_len"),
            F.sum(F.col("keep").cast("long")).cast("long")
            .alias("n_keep"),
        )
    )
