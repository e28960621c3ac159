#!/usr/bin/env python
"""spark-submit entry point (north rule: runs via
``spark-submit --py-files dist/riko_spark.zip`` on multi-executor
clusters).

    ./scripts/make_dist.sh
    spark-submit --master <cluster> --py-files dist/riko_spark.zip \
        scripts/run_pipeline.py pipeline.json --source src=/data/pages \
        --out /data/out

Identical semantics to ``python -m riko_spark.cli runpipe``.
"""

import sys

from riko_spark.cli import main

if __name__ == "__main__":
    sys.exit(main(sys.argv[1:] and ["runpipe", *sys.argv[1:]] or ["--help"]))
