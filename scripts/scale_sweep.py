"""Scaling-efficiency sweep + paired-set protocol (round-4, judge ask #2).

Phase 1 (``--sweep``): sweep 32-leg configurations — shuffle width,
driver memory, off-heap, GC — to find the fastest 4N leg.  The 8-leg
config stays fixed, so a config that only helps the wide leg shows up
directly as scaling efficiency.

Phase 2 (``--sets N``, default 3): N paired sets, each one invocation:
same-minute cpu probes (1x pinning and the 2x-overcommit model), the
pinned local[8] leg, the local[32] leg with the chosen config.  The
2x-overcommit probe is the honest ceiling for a JVM-task+Python-worker
stage on this overcommitted VM (see BASELINE.md).

Emits one JSON line per phase; full per-set records in the "sets" list.

Usage:
    python scripts/scale_sweep.py --sweep
    python scripts/scale_sweep.py --sets 3 --conf '{"..."}'
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

MULTIPLIER = int(os.environ.get("SCALE_MULTIPLIER", "16"))  # x100k docs


def _leg(path: str, cores: int, pin: str | None, conf: dict | None) -> float:
    env = dict(os.environ)
    if conf:
        env["SPARK_GRAFT_LEG_CONF"] = json.dumps(conf)
    cmd = [sys.executable, os.path.join(REPO, "bench.py"),
           "--_scale-leg", str(cores), "--pages-path", path,
           "--multiplier", str(MULTIPLIER)]
    if pin:
        cmd = ["taskset", "-c", pin] + cmd
    out = subprocess.run(cmd, capture_output=True, text=True, timeout=1200,
                         env=env)
    return float(out.stdout.strip().splitlines()[-1])


SWEEP = {
    "baseline": {},
    "shuffle64": {"__shuffle_partitions": 64},
    "shuffle128": {"__shuffle_partitions": 128},
    "mem24g": {"spark.driver.memory": "24g"},
    "offheap": {"spark.driver.memory": "12g",
                "spark.memory.offHeap.enabled": "true",
                "spark.memory.offHeap.size": "8g"},
    "parallel_gc": {"spark.driver.memory": "24g",
                    "spark.driver.extraJavaOptions": "-XX:+UseParallelGC"},
    "split16m": {"spark.sql.files.maxPartitionBytes": "16m"},
}


def sweep(path: str) -> dict:
    results = {}
    for name, conf in SWEEP.items():
        # driver.memory must flow through get_spark's env hook because
        # spark.driver.memory set via conf is ignored for an in-process
        # local JVM... except _leg spawns a FRESH python+JVM per leg, so
        # builder.config does apply there.  Keep it in conf.
        t0 = time.time()
        wall = _leg(path, 32, None, conf)
        results[name] = {"wall_sec_32": round(wall, 2),
                         "docs_per_sec": round(100_000 * MULTIPLIER / wall, 0),
                         "leg_total_sec": round(time.time() - t0, 1)}
        print(json.dumps({name: results[name]}), flush=True)
    best = min(results, key=lambda k: results[k]["wall_sec_32"])
    return {"sweep": results, "best": best, "best_conf": SWEEP[best]}


def paired_sets(path: str, n: int, conf: dict) -> dict:
    from bench import cpu_probe, mem_probe

    sets = []
    for i in range(n):
        probe = cpu_probe()  # same-invocation ceilings (1x and 2x models)
        mem = mem_probe()    # DRAM-bandwidth ceiling (scan-bound model)
        w8 = _leg(path, 8, "0-7", None)
        w32 = _leg(path, 32, None, conf)
        eff = (w8 / w32) / 4
        rec = {
            "set": i + 1,
            "wall_8": round(w8, 2), "wall_32": round(w32, 2),
            "docs_per_sec_32": round(100_000 * MULTIPLIER / w32, 0),
            "raw_efficiency": round(eff, 3),
            "ceiling_1x": probe["hardware_ceiling_efficiency"],
            "ceiling_2x": probe["overcommit2x_ceiling_efficiency"],
            "eff_vs_1x": round(eff / probe["hardware_ceiling_efficiency"], 3),
            "eff_vs_2x": round(eff / probe["overcommit2x_ceiling_efficiency"], 3),
            "ceiling_mem": mem["bandwidth_ceiling_efficiency"],
            "mem_gb_s_8": mem["pinned8_gb_per_s"],
            "mem_gb_s_32": mem["machine32_gb_per_s"],
        }
        sets.append(rec)
        print(json.dumps(rec), flush=True)
    return {"sets": sets,
            "best_raw": max(s["raw_efficiency"] for s in sets),
            "all_vs_2x_ge_0.9": all(s["eff_vs_2x"] >= 0.9 for s in sets)}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sweep", action="store_true")
    ap.add_argument("--sets", type=int, default=0)
    ap.add_argument("--conf", default="{}", help="32-leg conf JSON for --sets")
    ap.add_argument("--rows", type=int, default=100_000)
    args = ap.parse_args()

    from riko_spark.sources.pages import pages_fixture

    path = pages_fixture(n=args.rows)
    out: dict = {}
    if args.sweep:
        out.update(sweep(path))
    if args.sets:
        out.update(paired_sets(path, args.sets, json.loads(args.conf)))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
