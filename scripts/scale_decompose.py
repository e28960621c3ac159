"""Decompose the scaling residual: scan-bound vs compute-bound legs.

The round-4 campaign showed raw pipe-graph efficiency 0.62-0.68 between
the pure-ALU cpu probe (0.79-0.92) and the DRAM-bandwidth probe
(0.44-0.60).  This script closes the loop WITHOUT curve fitting by
measuring two real Spark jobs at local[8]-pinned vs local[32]:

* scan leg — parquet read + byte-length aggregate of the html column
  (I/O + decode + memory traffic, negligible ALU): its efficiency
  should land at the bandwidth ceiling.
* compute leg — the extract+regex+tokenize pipeline over the SAME rows
  but with the scan amortized by re-reading a tiny cached slice many
  times... not isolatable cleanly in one JVM, so instead: the full
  pipe graph (measured by scale_sweep) sits between this script's scan
  leg and the cpu probe, which brackets the bandwidth-bound fraction
  directly from measurements.

Emits one JSON line: walls + efficiencies for the scan leg at both
widths, plus same-invocation cpu/mem probes.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

MULTIPLIER = int(os.environ.get("SCALE_MULTIPLIER", "64"))

_SCAN_LEG = r"""
import sys, time
path, cores, mult = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
sys.path.insert(0, %r)
from riko_spark.session import get_spark
import pyspark.sql.functions as F
spark = get_spark(app_name=f"scan-leg-{cores}", master=f"local[{cores}]",
                  shuffle_partitions=cores,
                  extra_conf={"spark.sql.files.maxPartitionBytes": "32m"})
def job():
    df = spark.read.parquet(*([path] * mult))
    return df.select(F.sum(F.length("html")).alias("b")).collect()[0]["b"]
job()
runs = int(__import__("os").environ.get("SPARK_GRAFT_LEG_RUNS", "3"))
best = None
for _ in range(runs):
    t0 = time.time(); job(); w = time.time() - t0
    best = w if best is None or w < best else best
print(best)
spark.stop()
""" % (REPO,)


def _scan_leg(path: str, cores: int, pin: str | None) -> float:
    import tempfile

    with tempfile.NamedTemporaryFile("w", suffix=".py", delete=False) as fh:
        fh.write(_SCAN_LEG)
        script = fh.name
    cmd = [sys.executable, script, path, str(cores), str(MULTIPLIER)]
    if pin:
        cmd = ["taskset", "-c", pin] + cmd
    out = subprocess.run(cmd, capture_output=True, text=True, timeout=1200)
    os.unlink(script)
    return float(out.stdout.strip().splitlines()[-1])


def main() -> None:
    from bench import cpu_probe, mem_probe

    from riko_spark.sources.pages import pages_fixture

    path = pages_fixture(n=100_000)
    probe = cpu_probe()
    mem = mem_probe()
    w8 = _scan_leg(path, 8, "0-7")
    w32 = _scan_leg(path, 32, None)
    eff = (w8 / w32) / 4
    print(json.dumps({
        "scan_wall_8": round(w8, 2), "scan_wall_32": round(w32, 2),
        "scan_efficiency": round(eff, 3),
        "ceiling_alu_1x": probe["hardware_ceiling_efficiency"],
        "ceiling_alu_2x": probe["overcommit2x_ceiling_efficiency"],
        "ceiling_mem": mem["bandwidth_ceiling_efficiency"],
        "mem_gb_s_8": mem["pinned8_gb_per_s"],
        "mem_gb_s_32": mem["machine32_gb_per_s"],
    }))


if __name__ == "__main__":
    main()
