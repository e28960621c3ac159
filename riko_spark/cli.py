"""CLI — the reference exposes ``runpipe`` / ``compile`` console
scripts (pyproject [project.scripts], riko/cli/runpipe.py).  Here:

    python -m riko_spark.cli runpipe PIPE.json \
        --source src=/path/table.parquet --out /tmp/out --order-by event_seq
    python -m riko_spark.cli describe PIPE.json

Designed to run under spark-submit on a cluster:

    spark-submit --py-files dist/riko_spark.zip -m ...  # or
    spark-submit --py-files dist/riko_spark.zip scripts/run_pipeline.py ...
"""

from __future__ import annotations

import argparse
import json
import sys


def _parse_sources(pairs: list[str]) -> dict[str, str]:
    out = {}
    for p in pairs or []:
        name, _, path = p.partition("=")
        if not path:
            raise SystemExit(f"--source must be name=path, got {p!r}")
        out[name] = path
    return out


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="riko_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    run = sub.add_parser("runpipe", help="execute a JSON pipe definition")
    run.add_argument("pipe_json")
    run.add_argument("--source", action="append", default=[],
                     help="name=parquet_path, bound to module ids / conf.source")
    run.add_argument("--input", action="append", default=[],
                     help="key=value runtime parameter (input modules)")
    run.add_argument("--out", default=None, help="output parquet dir (default: show)")
    run.add_argument("--order-by", default=None, help="comma-list event-order spine")
    run.add_argument("--master", default=None)

    desc = sub.add_parser("describe", help="topo-sorted module list of a pipe def")
    desc.add_argument("pipe_json")

    comp = sub.add_parser("compile", help="generate a Python module from a pipe def")
    comp.add_argument("pipe_json")
    comp.add_argument("--name", default="pipeline")

    args = ap.parse_args(argv)

    with open(args.pipe_json) as f:
        pipe_def = json.load(f)

    if args.cmd == "compile":
        from riko_spark.plans.codegen import stringify_pipe

        print(stringify_pipe(pipe_def, args.name), end="")
        return 0

    if args.cmd == "describe":
        from riko_spark.plans.dag import parse_pipe_def, topological_sort

        parsed = parse_pipe_def(pipe_def)
        for mid in topological_sort(parsed["graph"]):
            mod = parsed["modules"][mid]
            print(f"{mid}\t{mod.get('type')}")
        return 0

    from riko_spark.plans.dag import build_pipeline
    from riko_spark.session import get_spark

    spark = get_spark(app_name=f"runpipe:{args.pipe_json}", master=args.master)
    sources = {
        name: spark.read.parquet(path)
        for name, path in _parse_sources(args.source).items()
    }
    inputs = dict(p.partition("=")[::2] for p in args.input)
    order_by = args.order_by.split(",") if args.order_by else None
    out = build_pipeline(spark, pipe_def, sources=sources, inputs=inputs, order_by=order_by)
    if args.out:
        out.write.mode("overwrite").parquet(args.out)
        print(f"wrote {args.out}")
    else:
        out.show(50, truncate=False)
    spark.stop()
    return 0


def runpipe_main(argv: list[str] | None = None) -> int:
    """Console-script twin of the reference's ``runpipe`` entry point
    (reference pyproject.toml [project.scripts])."""
    return main(["runpipe", *(sys.argv[1:] if argv is None else argv)])


def compile_main(argv: list[str] | None = None) -> int:
    """Console-script twin of the reference's ``compile`` entry point."""
    return main(["compile", *(sys.argv[1:] if argv is None else argv)])


if __name__ == "__main__":
    sys.exit(main())
