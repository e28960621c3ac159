"""JSON pipe-definition DAG → DataFrame plan compiler.

Reproduces the reference's pipe-def execution model
(riko/compile.py:612-644 ``parse_pipe_def``, :657 topological sort via
riko/topsort.py:111, :647-681 ``build_pipeline``/``_gen_steps``):

  * ``{"modules": [...], "wires": [...]}``; conf keys lower-cased and
    ``{"type","value"}`` wrappers unwrapped at parse time
  * wires targeting ``_INPUT`` define a module's main input; wires
    targeting ``_OTHERn`` accumulate into ``others`` (union); any other
    named target becomes a kwarg (``other`` for join)
  * when ``wires`` are omitted, modules chain linearly in listed order
    (riko/compile.py:579-609 ``convert_dag``)
  * ``embed`` submodules (the ``loop`` pipe) apply a processor per row —
    in Spark every processor is already per-row, so ``loop(embed=X)``
    compiles to X applied with the loop-level fold options
  * a terminal ``output`` module is a passthrough (riko/compile.py:523-526)

The resulting "IR" stack: JSON DAG → operator list → unresolved logical
plan → Catalyst analyzed/optimized → physical (Spark owns stage 3+).
"""

from __future__ import annotations

import inspect
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from riko_spark.operators import UnsupportedModuleError, get_operator
from riko_spark.plans.confs import normalize_conf
from riko_spark.plans.flow import call_operator

OPTION_KEYS = ("field", "assign", "emit", "skip_if", "count")


class CyclicPipeError(ValueError):
    """The wire graph has a cycle (riko/topsort.py SCC check)."""


def topological_sort(graph: dict[str, list[str]]) -> list[str]:
    """Kahn's algorithm; raises on cycles (riko/topsort.py:111)."""
    indeg: dict[str, int] = {n: 0 for n in graph}
    for outs in graph.values():
        for t in outs:
            indeg[t] = indeg.get(t, 0) + 1
    queue = sorted(n for n, d in indeg.items() if d == 0)
    order: list[str] = []
    while queue:
        n = queue.pop(0)
        order.append(n)
        for t in graph.get(n, []):
            indeg[t] -= 1
            if indeg[t] == 0:
                queue.append(t)
    if len(order) != len(indeg):
        raise CyclicPipeError("pipe graph contains a cycle")
    return order


def _substitute_terminals(conf: Any, terminals: dict[str, Any]) -> Any:
    """Resolve ``{"terminal": name, ...}`` conf values from wired
    module results (riko's dotdict sentinel wiring —
    riko/dotdict.py:78-85,147-157; e.g. an input module feeding tail's
    ``count``)."""
    if isinstance(conf, dict):
        term = conf.get("terminal")
        if term is not None and str(term).lower() in terminals:
            return terminals[str(term).lower()]
        return {k: _substitute_terminals(v, terminals) for k, v in conf.items()}
    if isinstance(conf, list):
        return [_substitute_terminals(v, terminals) for v in conf]
    return conf


def resolve_terminal(val: Any) -> Any:
    """Terminal slot: riko pulls the FIRST value from the wired pipe's
    stream (riko/dotdict.py:78-85,606-630); a literal (input module)
    passes through as-is."""
    if isinstance(val, DataFrame):
        row = val.first()
        if row is None:
            return None
        return row[0] if len(row) == 1 else row.asDict()
    return val


def _op_params(mtype: str):
    try:
        return inspect.signature(get_operator(mtype)).parameters
    except UnsupportedModuleError:
        return {}


def execute_module(
    mtype: str,
    df: DataFrame | None,
    conf: dict | None,
    *,
    spark: SparkSession | None = None,
    order_by: list[str] | None = None,
    others: list[DataFrame] | None = None,
    wired: dict[str, Any] | None = None,
    embed_def: dict | None = None,
    streaming: bool = True,
    fanout: int | None = None,
) -> Any:
    """Run ONE pipe module with riko's kwarg/terminal/option semantics.

    This is the shared execution core of the interpreter
    (:func:`build_pipeline`) and of generated code
    (riko_spark.plans.codegen) — factoring it out keeps the two paths
    behaviorally identical by construction.

    ``wired`` maps a wire's target slot id to the upstream result:
    DataFrames wired into ``other``/``embed`` pass as operator kwargs;
    anything else is a *terminal* (first value of the upstream stream,
    riko's dotdict sentinel) substituted into the conf.  Option-layer
    keys (field/assign/emit/skip_if/count) lift out of the conf only
    when the operator's signature accepts them — e.g. truncate's conf
    ``count`` is NOT the option-layer ``count``.
    """
    conf = dict(conf or {})
    kwargs: dict[str, Any] = {"spark": spark, "order_by": order_by}
    terminals: dict[str, Any] = {}
    for tgt_id, val in sorted((wired or {}).items()):
        if isinstance(val, DataFrame) and tgt_id in ("other", "embed"):
            kwargs[tgt_id] = val
        else:
            terminals[tgt_id.lower()] = resolve_terminal(val)
    if others:
        kwargs["others"] = others
    if terminals:
        conf = _substitute_terminals(conf, terminals)

    if mtype == "loop":
        # loop(embed=X): apply the embedded processor per row with the
        # two-level fold options (riko/modules/loop.py) — the embed
        # dict and the loop conf both carry option keys
        embed = conf.get("embed") if "embed" in conf else embed_def
        embed = normalize_conf(embed)
        etype = embed.get("type") or embed.get("module")
        econf = dict(embed.get("conf") or {})
        eparams = _op_params(etype)
        for opt in OPTION_KEYS:
            for layer in (embed, conf):
                if opt in layer and opt in eparams:
                    kwargs[opt] = layer[opt]
        return call_operator(etype, df, econf, **kwargs)

    params = _op_params(mtype)
    for opt in OPTION_KEYS:
        if opt in conf and opt in params:
            kwargs[opt] = conf.pop(opt)
    if mtype == "forever" and not streaming:
        conf.setdefault("streaming", False)
    if mtype == "split" and fanout is not None:
        conf.setdefault("splits", fanout or 2)
    return call_operator(mtype, df, conf, **kwargs)


def resolve_upstream(results: dict, main_src: str | None, sources: dict,
                     mid: str, source_name: str) -> DataFrame | None:
    """Main-input DataFrame for a module: the wired upstream result if
    it is a DataFrame, else an explicitly provided source (the sandbox
    stand-in for URL fetching)."""
    df = results.get(main_src) if main_src is not None else None
    if not isinstance(df, DataFrame):
        df = sources.get(mid) or sources.get(source_name)
    return df


def sort_order_rules(conf: dict) -> list[str]:
    """Stream ordering a ``sort`` module imposes downstream."""
    rules = conf.get("rule") or []
    rules = [rules] if isinstance(rules, dict) else rules
    return [
        f"{r['field']} desc"
        if str(r.get("dir", "asc")).lower() == "desc" else str(r["field"])
        for r in rules
    ]


def parse_pipe_def(pipe_def: dict, name: str = "pipeline") -> dict:
    """Normalize a pipe def into {name, modules, graph, wires}."""
    modules = {str(m["id"]): normalize_conf(m) for m in pipe_def["modules"]}
    wires = list(pipe_def.get("wires") or [])
    if not wires:  # linear chaining (convert_dag behavior)
        ids = [str(m["id"]) for m in pipe_def["modules"]]
        wires = [
            {"src": {"moduleid": a}, "tgt": {"moduleid": b, "id": "_INPUT"}}
            for a, b in zip(ids, ids[1:])
        ]
    graph: dict[str, list[str]] = {mid: [] for mid in modules}
    for w in wires:
        graph[str(w["src"]["moduleid"])].append(str(w["tgt"]["moduleid"]))
    return {"name": name, "modules": modules, "graph": graph, "wires": wires}


def build_pipeline(
    spark: SparkSession,
    pipe_def: dict,
    sources: dict[str, DataFrame] | None = None,
    inputs: dict | None = None,
    order_by: list[str] | None = None,
    streaming: bool = True,
    optimize: bool = True,
) -> DataFrame:
    """Interpret a pipe def into a single DataFrame plan.

    ``sources`` maps module ids (or a ``source`` conf name) to input
    DataFrames — the sandbox stand-in for URL fetching.
    ``inputs`` binds runtime parameters for ``input`` modules
    (riko/modules/input.py:72-107).  ``optimize`` applies the logical
    rewrites in riko_spark.plans.rewrite (e.g. tokenizer→count
    explode elimination) before interpretation.
    """
    parsed = parse_pipe_def(pipe_def)
    if optimize:
        from riko_spark.plans.rewrite import optimize_parsed

        parsed = optimize_parsed(parsed)
    modules, wires = parsed["modules"], parsed["wires"]
    sources = sources or {}

    main_input: dict[str, str] = {}
    extra_inputs: dict[str, list[tuple[str, str]]] = {}
    for w in wires:
        src = str(w["src"]["moduleid"])
        tgt = str(w["tgt"]["moduleid"])
        tgt_id = str(w["tgt"].get("id", "_INPUT"))
        if tgt_id == "_INPUT":
            main_input[tgt] = src
        else:
            extra_inputs.setdefault(tgt, []).append((tgt_id, src))

    results: dict[str, Any] = {}
    # stream-order propagation: a sort module defines the downstream
    # ordering (riko streams are ordered; positional ops consume it)
    stream_order: dict[str, list[str] | None] = {}
    for mid in topological_sort(parsed["graph"]):
        mod = modules[mid]
        mtype = mod.get("type") or mod.get("module")
        conf = dict(mod.get("conf") or {})
        if mtype == "output":  # terminal passthrough
            results[mid] = results[main_input[mid]]
            continue
        if mtype == "input":
            from riko_spark.operators.structure import bind_input

            results[mid] = bind_input(conf, inputs)
            continue

        df = resolve_upstream(results, main_input.get(mid), sources,
                              mid, str(conf.get("source", "")))

        inherited = stream_order.get(main_input.get(mid, ""), None)
        others: list[DataFrame] = []
        wired: dict[str, Any] = {}
        for tgt_id, src in sorted(extra_inputs.get(mid, [])):
            if tgt_id.startswith("_OTHER"):
                others.append(results[src])
            else:
                wired[tgt_id] = results[src]

        results[mid] = execute_module(
            mtype, df, conf,
            spark=spark, order_by=inherited or order_by,
            others=others or None, wired=wired or None,
            embed_def=mod.get("embed"), streaming=streaming,
            fanout=len([w for w in wires if str(w["src"]["moduleid"]) == mid])
            if mtype == "split" else None,
        )
        stream_order[mid] = sort_order_rules(conf) if mtype == "sort" else inherited

    # result = last module in topo order that produced a DataFrame
    last = None
    for mid in topological_sort(parsed["graph"]):
        if isinstance(results.get(mid), DataFrame):
            last = results[mid]
    if last is None:
        raise ValueError("pipeline produced no DataFrame")
    return last
