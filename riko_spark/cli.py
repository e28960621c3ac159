"""CLI — the reference exposes ``runpipe`` / ``compile`` console
scripts (pyproject [project.scripts], riko/cli/runpipe.py).  Here:

    python -m riko_spark.cli runpipe PIPE.json \
        --source src=/path/table.parquet --out /tmp/out --order-by event_seq
    python -m riko_spark.cli runpipe PIPE.json --stream \
        --source src=/path/dir --out /tmp/out --checkpoint /tmp/ckpt \
        --watermark warc_ts="10 minutes"        # Structured Streaming
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
    run.add_argument("--stream", action="store_true",
                     help="treat every --source as a parquet file STREAM "
                          "and run the pipe as Structured Streaming")
    run.add_argument("--checkpoint", default=None,
                     help="stream checkpoint dir (required with --stream)")
    run.add_argument("--watermark", default=None,
                     help="col=delay (e.g. warc_ts='10 minutes') applied to "
                          "each stream source before the pipe")
    run.add_argument("--trigger", default="available-now",
                     choices=["available-now", "continuous-micro"],
                     help="available-now drains what exists and stops; "
                          "continuous-micro keeps running until Ctrl-C")

    desc = sub.add_parser("describe", help="topo-sorted module list of a pipe def")
    desc.add_argument("pipe_json")

    comp = sub.add_parser("compile", help="generate a Python module from a pipe def")
    comp.add_argument("pipe_json")
    comp.add_argument("--name", default="pipeline")

    crawl = sub.add_parser(
        "crawl",
        help="streaming crawl capstone: WARC dir -> URL gate -> DOM "
             "main-content -> C4 gate -> dedupe-within-watermark -> "
             "exactly-once upsert sink (streaming/corpus.py)")
    crawl.add_argument("warc_dir", help="directory of .warc / .warc.gz files")
    crawl.add_argument("--out", required=True, help="upsert-sink table dir")
    crawl.add_argument("--checkpoint", default=None,
                       help="stream checkpoint dir (required unless --batch)")
    crawl.add_argument("--master", default=None)
    crawl.add_argument("--batch", action="store_true",
                       help="run the batch twin of the same pipeline "
                            "(whole-dir read, parquet overwrite to --out)")
    crawl.add_argument("--watermark", default="30 seconds",
                       help="dedupe state horizon (event time, warc_ts)")
    crawl.add_argument("--dedupe-mode", default="simhash",
                       choices=["simhash", "exact"])
    crawl.add_argument("--blocked-domains", default="",
                       help="comma-list domain blocklist")
    crawl.add_argument("--conf", default=None,
                       help="JSON dict of C4 gate overrides "
                            "(min_words, min_sentences, ...)")
    crawl.add_argument("--max-files-per-trigger", type=int, default=None)
    crawl.add_argument("--state-store", default=None,
                       help="dedupe state backend: hdfs (Spark default,"
                            " executor heap) or rocksdb (executor local"
                            " disk, bounded memory — the corpus-scale"
                            " choice), or a provider class name")

    args = ap.parse_args(argv)

    if args.cmd == "crawl":
        return _crawl(args)

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
    inputs = dict(p.partition("=")[::2] for p in args.input)
    order_by = args.order_by.split(",") if args.order_by else None

    if args.stream:
        # Structured-Streaming mode: every source becomes a parquet
        # file stream (schema inferred from a batch read of the same
        # dir), the SAME build_pipeline call produces an incremental
        # plan, and results land append-mode in --out with exactly-once
        # file-sink semantics under --checkpoint.
        if not args.out or not args.checkpoint:
            raise SystemExit("--stream requires --out and --checkpoint")
        if order_by:
            # the event-order spine is a BATCH concept (global sort);
            # a stream's order is event time + watermark, and Spark
            # rejects sorting non-aggregated streaming frames
            print(f"--order-by {args.order_by} ignored in --stream mode "
                  "(stream order = event time under the watermark)")
            order_by = None
        wm_col = wm_delay = None
        if args.watermark:
            wm_col, _, wm_delay = args.watermark.partition("=")
            if not wm_delay:
                raise SystemExit("--watermark must be col=delay")
        sources = {}
        for name, path in _parse_sources(args.source).items():
            schema = spark.read.parquet(path).schema
            src = spark.readStream.schema(schema).parquet(path)
            if wm_col:
                import pyspark.sql.functions as F

                src = src.withColumn(wm_col, F.col(wm_col).cast("timestamp"))
                src = src.withWatermark(wm_col, wm_delay.strip("'\""))
            sources[name] = src
        out = build_pipeline(spark, pipe_def, sources=sources,
                             inputs=inputs, order_by=order_by)
        writer = (out.writeStream.outputMode("append")
                  .option("checkpointLocation", args.checkpoint)
                  .format("parquet").option("path", args.out))
        if args.trigger == "available-now":
            q = writer.trigger(availableNow=True).start()
            q.awaitTermination()
        else:
            q = writer.start()
            q.awaitTermination()
        print(f"wrote {args.out}")
        spark.stop()
        return 0

    sources = {
        name: spark.read.parquet(path)
        for name, path in _parse_sources(args.source).items()
    }
    out = build_pipeline(spark, pipe_def, sources=sources, inputs=inputs, order_by=order_by)
    if args.out:
        out.write.mode("overwrite").parquet(args.out)
        print(f"wrote {args.out}")
    else:
        out.show(50, truncate=False)
    spark.stop()
    return 0


def _crawl(args) -> int:
    """The ``crawl`` subcommand: the streaming capstone under
    spark-submit (north rule's deployable shape), or its batch twin."""
    from riko_spark.session import get_spark
    from riko_spark.streaming.corpus import clean_corpus, run_corpus_stream

    if not args.batch and not args.checkpoint:
        raise SystemExit("crawl (streaming) requires --checkpoint")
    conf = json.loads(args.conf) if args.conf else {}
    if args.blocked_domains:
        conf.setdefault("blocked_domains",
                        args.blocked_domains.split(","))
    conf.setdefault("watermark", args.watermark)
    conf.setdefault("dedupe_mode", args.dedupe_mode)
    if args.state_store:
        conf.setdefault("state_store", args.state_store)
    spark = get_spark(app_name=f"crawl:{args.warc_dir}", master=args.master)
    if args.batch:
        from riko_spark.sources.warc import warc_records

        out = clean_corpus(
            warc_records(spark, args.warc_dir, keep_types=("response",)),
            conf)
        out.write.mode("overwrite").parquet(args.out)
        print(f"wrote {args.out}")
    else:
        q, sink = run_corpus_stream(
            spark, args.warc_dir, args.out, args.checkpoint, conf=conf,
            max_files_per_trigger=args.max_files_per_trigger)
        q.awaitTermination()
        n = sink.result(spark).count()
        print(f"upserted {args.out} ({n} rows)")
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
