"""String transformer pipes.

All are riko ``processor/transformer`` modules — row-local, so they
compile to native Column expressions (JVM whole-stage codegen) wherever
Python string semantics allow, with Arrow-batched pandas UDFs reserved
for the few genuinely Python-shaped cases (first-occurrence-only regex
substitution, swapcase/title parity, refind's last/at variants).

Conf vocabularies follow the reference modules exactly:
  regex        riko/modules/regex.py:118-180, riko/utils.py:960-1020
  strreplace   riko/modules/strreplace.py:48-56
  strtransform riko/modules/strtransform.py:44-69
  strconcat    riko/modules/strconcat.py:36-58
  strfind      riko/modules/strfind.py:44-70
  refind       riko/modules/refind.py:50-83
  substr       riko/modules/substr.py:47-75
  slugify      riko/modules/slugify.py:38-64
  hash         riko/modules/hash.py:47-74 (documented divergence:
               riko hashes with the process-seeded builtin ``hash`` —
               irreproducible across processes — we use xxhash64/md5)
  tokenizer    riko/modules/tokenizer.py:44-72
"""

from __future__ import annotations

import re as _re

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame
from pyspark.sql.types import StringType

from riko_spark.operators import register
from riko_spark.operators.options import apply_multi, apply_scalar

_PY_STRIP = r"^\s+|\s+$"


def pystrip(col: Column) -> Column:
    """Python ``str.strip()`` (all unicode whitespace, both ends) —
    Spark's ``trim`` only strips spaces."""
    return F.regexp_replace(col, _PY_STRIP, "")


def _listize(rules) -> list[dict]:
    return [rules] if isinstance(rules, dict) else list(rules or [])


# ---------------------------------------------------------------- regex

def _regex_flags(rule: dict) -> str:
    # riko/utils.py:991-996: IGNORECASE unless casematch;
    # MULTILINE|DOTALL unless singlelinematch
    flags = "" if rule.get("casematch") else "i"
    if not rule.get("singlelinematch"):
        flags += "ms"
    return f"(?{flags})" if flags else ""


def _multi_substitute_fn(rules: list[dict]):
    """Single-pass parallel substitution (riko ``multi: true`` —
    riko/utils.py:874-965 combined-regex recipe): all rules' patterns
    are alternated into ONE regex, each match replaced by ITS rule's
    replacement, so no rule ever sees another rule's output.  Per-rule
    ``$n`` backrefs are remapped onto the combined pattern's group
    numbering."""
    flags = 0 if rules and rules[0].get("casematch") else (
        _re.IGNORECASE | _re.MULTILINE | _re.DOTALL
    )
    bases, parts, total = [], [], 0
    for i, r in enumerate(rules):
        parts.append(f"(?P<_m{i}>{r['match']})")
        bases.append(total + 1)  # the wrapper group itself
        total += 1 + _re.compile(r["match"]).groups
    combined = _re.compile("|".join(parts), flags)

    def sub(word: str | None) -> str | None:
        if word is None:
            return None

        def repl(m: _re.Match) -> str:
            for i, r in enumerate(rules):
                if m.group(f"_m{i}") is not None:
                    rep = r.get("replace", "") or ""
                    return _re.sub(
                        r"\$(\d+)",
                        lambda g: m.group(bases[i] + int(g.group(1))) or "",
                        rep,
                    )
            return m.group(0)  # pragma: no cover

        return combined.sub(repl, word)

    return sub


@register("regex")
def regex_op(df: DataFrame, conf: dict, skip_if=None) -> DataFrame:
    """Multi-rule regex search/replace applied per field via ``reduce``.

    Java regex uses ``$n`` backrefs natively, matching riko's conf
    vocabulary before its ``$n``→``\\n`` Python conversion
    (riko/utils.py:999-1002).  ``singlelinematch`` additionally means
    count=1 (replace first match only) — that variant runs as a pandas
    UDF since JVM ``regexp_replace`` is replace-all.  ``multi: true``
    combines all rules of a field into one single-pass parallel
    substitution (see :func:`_multi_substitute_fn`).
    """
    out = df
    if conf.get("multi"):
        by_field: dict[str, list[dict]] = {}
        for rule in _listize(conf.get("rule")):
            by_field.setdefault(rule["field"], []).append(rule)
        for field, rules in by_field.items():
            subber = _multi_substitute_fn(rules)

            def _make(subber=subber):
                @F.pandas_udf(StringType())
                def _multi(s: pd.Series) -> pd.Series:
                    return s.map(subber)
                return _multi

            result = _make()(F.col(field).cast("string"))
            out = apply_scalar(out, result, assign=field, skip_if=skip_if)
        return out
    for rule in _listize(conf.get("rule")):
        field = rule["field"]
        pattern = _regex_flags(rule) + rule["match"]
        replace = rule.get("replace", "")
        if rule.get("singlelinematch"):
            pat = _re.compile(rule["match"], 0 if rule.get("casematch") else _re.IGNORECASE)
            rep = _re.sub(r"\$(\d+)", r"\\\1", replace)

            def _make(pat=pat, rep=rep):
                @F.pandas_udf(StringType())
                def _sub_first(s: pd.Series) -> pd.Series:
                    return s.map(lambda w: None if w is None else pat.sub(rep, w, count=1))
                return _sub_first

            _sub_first = _make()

            result: Column = _sub_first(F.col(field).cast("string"))
        else:
            result = F.regexp_replace(F.col(field).cast("string"), pattern, replace)
        if rule.get("default") is not None:
            # riko: rule default replaces output when nothing matched
            matched = F.col(field).cast("string").rlike(pattern)
            result = F.when(matched, result).otherwise(F.lit(rule["default"]))
        out = apply_scalar(out, result, assign=field, skip_if=skip_if)
    return out


# ----------------------------------------------------------- strreplace

def _replace_first(col: Column, find: str, repl: str) -> Column:
    pos = F.instr(col, find)
    before = F.substring(col, F.lit(1), pos - 1)
    after = col.substr(pos + len(find), F.length(col))
    return F.when(pos > 0, F.concat(before, F.lit(repl), after)).otherwise(col)


def _last_pos(col: Column, find: str) -> Column:
    # 1-based start of the last occurrence; 0 when absent
    rpos = F.instr(F.reverse(col), F.reverse(F.lit(find)).cast("string"))
    return F.when(rpos > 0, F.length(col) - rpos - len(find) + 2).otherwise(F.lit(0))


def _replace_last(col: Column, find: str, repl: str) -> Column:
    pos = _last_pos(col, find)
    before = F.substring(col, F.lit(1), pos - 1)
    after = col.substr(pos + len(find), F.length(col))
    return F.when(pos > 0, F.concat(before, F.lit(repl), after)).otherwise(col)


@register("strreplace")
def strreplace_op(
    df: DataFrame, conf: dict, field: str = "content",
    assign: str = "strreplace", emit: bool = False, skip_if=None,
) -> DataFrame:
    """Literal find/replace; rule ``param``: first|last|every
    (riko/modules/strreplace.py:48-56)."""
    col = F.col(field).cast("string")
    for rule in _listize(conf.get("rule")):
        find, repl = rule["find"], rule.get("replace", "")
        param = rule.get("param", "every")
        if param == "first":
            col = _replace_first(col, find, repl)
        elif param == "last":
            col = _replace_last(col, find, repl)
        else:
            col = F.replace(col, F.lit(find), F.lit(repl))
    return apply_scalar(df, col, assign=assign, emit=emit, skip_if=skip_if)


# --------------------------------------------------------- strtransform

def _apply_transform(col: Column, transform: str, args: list[str]) -> Column:
    native = {
        "lower": F.lower, "upper": F.upper,
        "strip": pystrip,
        "lstrip": lambda c: F.regexp_replace(c, r"^\s+", ""),
        "rstrip": lambda c: F.regexp_replace(c, r"\s+$", ""),
    }
    if transform in native:
        return native[transform](col)
    if transform == "capitalize":
        return F.concat(F.upper(F.substring(col, 1, 1)), F.lower(F.substring(col, 2, 2**31 - 1)))
    if transform == "zfill":
        # lpad truncates when len(s) > width; Python str.zfill never does
        width = int(args[0])
        return F.when(F.length(col) >= width, col).otherwise(F.lpad(col, width, "0"))
    if transform == "replace":
        return F.replace(col, F.lit(args[0]), F.lit(args[1] if len(args) > 1 else ""))
    if transform == "count":
        needle = args[0]
        return ((F.length(col) - F.length(F.replace(col, F.lit(needle), F.lit("")))) / len(needle)).cast("bigint")
    if transform == "find":
        return (F.instr(col, args[0]) - 1).cast("bigint")
    if transform in ("swapcase", "title"):
        # exact Python parity (initcap's word model differs from
        # str.title) -> Arrow-batched UDF
        t = transform

        @F.pandas_udf(StringType())
        def _py(s: pd.Series) -> pd.Series:
            return s.map(lambda w: None if w is None else getattr(w, t)())

        return _py(col)
    # riko logs a warning and passes through on unknown transforms
    return col


@register("strtransform")
def strtransform_op(
    df: DataFrame, conf: dict, field: str = "content",
    assign: str = "strtransform", emit: bool = False, skip_if=None,
) -> DataFrame:
    col: Column = F.col(field).cast("string")
    for rule in _listize(conf.get("rule")):
        args = rule.get("args")
        arglist = str(args).split(",") if args not in (None, "") else []
        col = _apply_transform(col, rule["transform"], arglist)
    return apply_scalar(df, col, assign=assign, emit=emit, skip_if=skip_if)


# ------------------------------------------------------------ strconcat

@register("strconcat")
def strconcat_op(
    df: DataFrame | None, conf: dict, assign: str = "strconcat",
    emit: bool = False, skip_if=None, spark=None,
) -> DataFrame:
    """Concatenate conf ``part`` values — literals and/or item-field
    refs; falsy parts are dropped (riko/modules/strconcat.py:36-58)."""
    if df is None:  # source mode: one literal row
        from pyspark.sql import SparkSession

        df = (spark or SparkSession.getActiveSession()).range(1).drop("id")
        emit = True
    part = conf.get("part")
    parts = [part] if isinstance(part, str) else _listize(part)
    cols = []
    for p in parts:
        if isinstance(p, dict) and "subkey" in p:
            c = F.col(p["subkey"]).cast("string")
        elif isinstance(p, dict):
            c = F.lit(str(p.get("value", ""))).cast("string")
        else:
            c = F.lit(str(p))
        # drop falsy parts: '' and NULL contribute nothing
        cols.append(F.when(c.isNull() | (c == ""), F.lit("")).otherwise(c))
    result = F.concat(*cols) if cols else F.lit("")
    return apply_scalar(df, result, assign=assign, emit=emit, skip_if=skip_if)


# -------------------------------------------------------------- strfind

def _strfind_col(col: Column, rule: dict) -> Column:
    find = rule["find"]
    param = rule.get("param", "first")
    location = rule.get("location", "before")
    default = rule.get("default") or ""
    pos_first = F.instr(col, find)
    contains = pos_first > 0
    if location == "at":
        # riko quirk: word[pos : len(find)] (riko/modules/strfind.py:64-67)
        pos = pos_first if param != "last" else _last_pos(col, find)
        sliced = F.substring(col, pos, F.greatest(F.lit(0), F.lit(len(find)) - pos + 1))
        found = pos > 0
        return pystrip(F.when(found, sliced).otherwise(F.lit(default)))
    if location == "after":
        if param == "last":
            res = F.when(contains, F.substring_index(col, find, -1)).otherwise(col)
        else:
            res = F.when(contains, col.substr(pos_first + len(find), F.length(col))).otherwise(col)
    else:  # before
        if param == "last":
            p = _last_pos(col, find)
            res = F.when(p > 0, F.substring(col, F.lit(1), p - 1)).otherwise(F.lit(""))
        else:
            res = F.when(contains, F.substring(col, F.lit(1), pos_first - 1)).otherwise(F.lit(""))
    return pystrip(res)


@register("strfind")
def strfind_op(
    df: DataFrame, conf: dict, field: str = "content",
    assign: str = "strfind", emit: bool = False, skip_if=None,
) -> DataFrame:
    col: Column = F.col(field).cast("string")
    for rule in _listize(conf.get("rule")):
        col = _strfind_col(col, rule)
    return apply_scalar(df, col, assign=assign, emit=emit, skip_if=skip_if)


# --------------------------------------------------------------- refind

def _refind_py(word: str | None, rule: dict) -> str | None:
    # direct transcription of riko/modules/refind.py:50-83 semantics
    if word is None:
        return None
    find = rule["find"]
    param = rule.get("param") or "first"
    location = rule.get("location", "before")
    default = rule.get("default") or ""
    if location == "at":
        if param == "last":
            found = _re.findall(find, word)
            splits = found[-1] if found else default
        else:
            m = _re.search(find, word)
            splits = m.group(0) if m else default
        return splits.strip()
    splits = _re.split(find, word, maxsplit=1 if param == "first" else 0)
    if location == "after":
        return splits[-1].strip()
    return find.join(splits[: len(splits) - 1]).strip()


@register("refind")
def refind_op(
    df: DataFrame, conf: dict, field: str = "content",
    assign: str = "refind", emit: bool = False, skip_if=None,
) -> DataFrame:
    rules = _listize(conf.get("rule"))
    first_before = (
        len(rules) == 1
        and (rules[0].get("param") or "first") == "first"
        and rules[0].get("location", "before") in ("before", "after")
    )
    if first_before:
        # native fast path: regex-split once, keep before/after part
        r = rules[0]
        splits = F.split(F.col(field).cast("string"), r["find"], 2)
        part = (
            F.element_at(splits, -1)
            if r.get("location") == "after"
            else F.when(F.size(splits) > 1, F.element_at(splits, 1)).otherwise(F.lit(""))
        )
        return apply_scalar(df, pystrip(part), assign=assign, emit=emit, skip_if=skip_if)

    @F.pandas_udf(StringType())
    def _refind(s: pd.Series) -> pd.Series:
        def run(w):
            for rule in rules:
                w = _refind_py(w, rule)
            return w
        return s.map(run)

    return apply_scalar(df, _refind(F.col(field).cast("string")), assign=assign, emit=emit, skip_if=skip_if)


# --------------------------------------------------------------- substr

@register("substr")
def substr_op(
    df: DataFrame, conf: dict, field: str = "content",
    assign: str = "substr", emit: bool = False, skip_if=None,
) -> DataFrame:
    """``word[start : start+length]``; length 0 → to end
    (riko/modules/substr.py:47-75)."""
    start = int(conf.get("start", 0))
    length = int(conf.get("length", 0))
    col = F.col(field).cast("string")
    result = F.substring(col, start + 1, length if length else 2**31 - 1)
    return apply_scalar(df, result, assign=assign, emit=emit, skip_if=skip_if)


# -------------------------------------------------------------- slugify

def slugify_col(col: Column, separator: str = "-") -> Column:
    """ASCII slug: lower, non-alnum runs → separator, trim separators.

    Matches python-slugify for ASCII input (riko/modules/slugify.py);
    non-ASCII transliteration is out of scope (documented divergence).
    """
    lowered = F.lower(pystrip(col))
    collapsed = F.regexp_replace(lowered, r"[^a-z0-9]+", separator)
    return F.regexp_replace(collapsed, f"^{_re.escape(separator)}+|{_re.escape(separator)}+$", "")


@register("slugify")
def slugify_op(
    df: DataFrame, conf: dict | None = None, field: str = "content",
    assign: str = "slugify", emit: bool = False, skip_if=None,
) -> DataFrame:
    sep = (conf or {}).get("separator", "-")
    return apply_scalar(df, slugify_col(F.col(field).cast("string"), sep), assign=assign, emit=emit, skip_if=skip_if)


# ----------------------------------------------------------------- hash

@register("hash")
def hash_op(
    df: DataFrame, conf: dict | None = None, field: str = "content",
    assign: str = "hash", emit: bool = False, skip_if=None,
) -> DataFrame:
    """Stable content hash.

    Documented divergence: riko uses the process-seeded builtin
    ``hash`` (riko/modules/hash.py:47-74) which is not reproducible
    across processes (PYTHONHASHSEED); we use ``xxhash64`` — stable,
    JVM-native, collision-safe enough for partitioning/dedupe.
    """
    algo = (conf or {}).get("algo", "xxhash64")
    col = F.col(field).cast("string")
    result = F.md5(col) if algo == "md5" else F.xxhash64(col)
    return apply_scalar(df, result, assign=assign, emit=emit, skip_if=skip_if)


# ------------------------------------------------------------ tokenizer

def tokenize_col(col: Column, delimiter: str = ",", dedupe: bool = False, sort: bool = False) -> Column:
    """Array of tokens with riko's exact edge semantics
    (riko/modules/tokenizer.py:66-68): split on the literal delimiter,
    drop *pre-strip* empties, then strip each token (so whitespace-only
    tokens survive as ''); optional dedupe and lower-keyed sort."""
    quoted = "\\Q" + delimiter + "\\E"  # literal delimiter (split takes a regex)
    toks = F.split(col.cast("string"), quoted, -1)
    # drop pre-strip empties natively (cheaper than a filter lambda),
    # then strip Python's exact whitespace set with btrim (no regex)
    toks = F.array_remove(toks, "")
    py_ws = " \t\n\r\x0b\x0c"
    toks = F.transform(toks, lambda x: F.btrim(x, F.lit(py_ws)))
    if dedupe:
        toks = F.array_distinct(toks)
    if sort:
        toks = F.array_sort(
            toks,
            lambda l, r: F.when(F.lower(l) < F.lower(r), -1)
            .when(F.lower(l) > F.lower(r), 1)
            .otherwise(0),
        )
    return toks


@register("tokenizer")
def tokenizer_op(
    df: DataFrame, conf: dict | None = None, field: str = "content",
    emit: bool = True, skip_if=None, count: str = "all",
) -> DataFrame:
    """Split a field into one row per token (riko's UDTF-shaped pipe).

    Fast path (the common explode-all case, no dedupe/sort/skip): the
    per-token strip runs as a scalar projection AFTER the explode —
    split/explode/filter/btrim all stay inside whole-stage codegen,
    whereas an array ``transform`` lambda is CodegenFallback
    (interpreted per element) and was the measured non-scaling
    component of the pipe-graph aggregate leg."""
    conf = conf or {}
    token_key = conf.get("token_key", "content")
    delimiter = conf.get("delimiter", ",")
    dedupe, sort = bool(conf.get("dedupe")), bool(conf.get("sort"))
    if conf.get("nest"):
        # riko's assign-list semantics (riko/modules/_assignment.py:
        # gen_assignments: `item | {assign: list(value)}`): with assign
        # + emit=False on a non-empty item the token stream NESTS as a
        # list of {token_key: token} dicts on the SAME row — no explode.
        # Engine explode (one row per token, columns retained) stays the
        # default because the distributed pipelines aggregate over it;
        # pass nest=True for reference-shaped output.
        toks = tokenize_col(F.col(field), delimiter=delimiter, dedupe=dedupe, sort=sort)
        nested = F.transform(toks, lambda t: F.struct(t.alias(token_key)))
        return apply_scalar(df, nested, assign=conf.get("assign", field),
                            emit=False, skip_if=skip_if)
    if not dedupe and not sort and skip_if is None and count == "all":
        from riko_spark.operators import fanout_small_scan

        # the explode multiplies rows ~100x and everything downstream
        # (token aggregations) partial-aggregates in THIS stage — an
        # unsplittable single-file input would pin it to one task
        df = fanout_small_scan(df)
        quoted = "\\Q" + delimiter + "\\E"
        py_ws = " \t\n\r\x0b\x0c"
        raw = "__rawtok" if token_key != "__rawtok" else "__rawtok2"
        exploded = (
            df.withColumn(raw, F.explode(F.split(F.col(field).cast("string"), quoted, -1)))
            .filter(F.col(raw) != "")  # pre-strip empties, riko edge
            .withColumn(token_key, F.btrim(F.col(raw), F.lit(py_ws)))
            .drop(raw)
        )
        return exploded.select(token_key) if emit else exploded
    toks = tokenize_col(F.col(field), delimiter=delimiter, dedupe=dedupe, sort=sort)
    return apply_multi(df, toks, assign=token_key, emit=emit, skip_if=skip_if, count=count)
