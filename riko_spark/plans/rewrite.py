"""Logical rewrites over parsed pipe defs (the engine's optimizer pass).

Catalyst optimizes the DataFrame plan it is given, but it cannot undo a
``Generate`` (explode) the pipe author declared.  The pipe-def layer is
declarative, so the compiler is free to pick a better physical strategy
when semantics allow — the same reasoning Catalyst applies one level
down.

Current rule:

``fuse_tokenizer_count`` — a ``tokenizer`` whose ONLY consumer is a
``count`` or ``windowed_count`` that never looks at the token value
fuses into one aggregate over per-row token-array sizes
(operators/aggregates.fused_token_count /
fused_token_windowed_count).  On webtext this removes the ~100×-row
explode from the shuffle input entirely (measured 3× on the flagship
pipe graph at 1.6M docs).  Not applied when the consumer groups BY the
token (values needed), when the tokenizer carries option-layer folds
(skip_if / count='first') that change row multiplicity in ways a
size-sum cannot express, or when emit dropped the columns the consumer
needs.
"""

from __future__ import annotations

OPTION_FOLDS = ("skip_if", "count")


def _consumers(parsed: dict, mid: str) -> list[dict]:
    return [w for w in parsed["wires"] if str(w["src"]["moduleid"]) == mid]


def fuse_tokenizer_count(parsed: dict) -> dict:
    """Apply the tokenizer→count fusion in place; returns ``parsed``."""
    modules, wires = parsed["modules"], parsed["wires"]
    for tid, tok in list(modules.items()):
        ttype = tok.get("type") or tok.get("module")
        if ttype != "tokenizer":
            continue
        tconf = dict(tok.get("conf") or {})
        if any(k in tconf for k in OPTION_FOLDS):
            continue
        outs = _consumers(parsed, tid)
        if len(outs) != 1 or str(outs[0]["tgt"].get("id", "_INPUT")) != "_INPUT":
            continue
        cid = str(outs[0]["tgt"]["moduleid"])
        cnt = modules.get(cid)
        ctype = (cnt.get("type") or cnt.get("module")) if cnt else None
        if ctype not in ("count", "windowed_count"):
            continue
        cconf = dict(cnt.get("conf") or {})
        token_key = tconf.get("token_key", "content")
        fused_conf = {
            "field": tconf.get("field", "content"),
            "delimiter": tconf.get("delimiter", ","),
            "dedupe": bool(tconf.get("dedupe")),
        }
        if ctype == "count":
            count_key = cconf.get("count_key")
            if count_key == token_key:
                continue  # counts BY token value: the explode is load-bearing
            if count_key and tconf.get("emit", True):
                continue  # emit=True dropped every non-token column
            if count_key:
                fused_conf["count_key"] = count_key
            fused_type = "fused_token_count"
        else:  # windowed_count: counts rows per (window × keys)
            keys = list(cconf.get("keys") or [])
            derived = set(cconf.get("derive") or {})
            if token_key in keys or token_key in derived:
                continue  # grouping BY the token needs the values
            if tconf.get("emit", True):
                continue  # the window needs ts/keys columns preserved
            fused_conf.update(
                {k: cconf[k] for k in
                 ("ts_col", "window", "watermark", "keys", "name", "derive")
                 if k in cconf}
            )
            fused_type = "fused_token_windowed_count"
        # rewrite: the consumer becomes the fused aggregate; the
        # tokenizer disappears and its input wire feeds the fused module
        modules[cid] = {**cnt, "type": fused_type, "conf": fused_conf}
        del modules[tid]
        new_wires = []
        for w in wires:
            src, tgt = str(w["src"]["moduleid"]), str(w["tgt"]["moduleid"])
            if src == tid and tgt == cid:
                continue  # the fused edge
            if tgt == tid:  # tokenizer's input now feeds the fused module
                w = {**w, "tgt": {**w["tgt"], "moduleid": cid}}
            new_wires.append(w)
        parsed["wires"] = wires = new_wires
        parsed["graph"] = {m: [] for m in modules}
        for w in wires:
            parsed["graph"][str(w["src"]["moduleid"])].append(str(w["tgt"]["moduleid"]))
    return parsed


def optimize_parsed(parsed: dict) -> dict:
    """All rewrite rules, in order.  Called by BOTH the interpreter
    (build_pipeline) and the code generator (stringify_pipe) so the two
    execution paths stay equivalent by construction."""
    return fuse_tokenizer_count(parsed)
