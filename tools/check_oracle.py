"""Local replica of the driver's correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` twin on DuckDB
(same parquet tables as views), compare row count, sorted column names,
and order-insensitive values.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from riko_spark.session import get_spark  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def canon(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)

    def norm(v):
        if v is None or (isinstance(v, float) and pd.isna(v)):
            return "NULL"
        if isinstance(v, float):
            return repr(v)
        if isinstance(v, bytes):
            return v.hex()
        return str(v)

    out = pdf.map(norm)
    return out.sort_values(by=list(out.columns), kind="mergesort").reset_index(drop=True)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark(app_name="oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            spdf = sdf.toPandas()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: spark error {type(e).__name__}: {e}")
            continue
        if name not in oracles:
            print(f"ok?   {name}: rows-only ({len(spdf)} rows, {time.time()-t0:.1f}s)")
            continue
        try:
            opdf = con.execute(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: duckdb error {type(e).__name__}: {e}")
            continue
        if len(spdf) != len(opdf):
            failures.append(name)
            print(f"FAIL  {name}: rowcount spark={len(spdf)} duckdb={len(opdf)}")
            continue
        if sorted(map(str.lower, spdf.columns)) != sorted(map(str.lower, opdf.columns)):
            failures.append(name)
            print(f"FAIL  {name}: columns spark={sorted(spdf.columns)} duckdb={sorted(opdf.columns)}")
            continue
        spdf.columns = [c.lower() for c in spdf.columns]
        opdf.columns = [c.lower() for c in opdf.columns]
        a, b = canon(spdf), canon(opdf)
        if not a.equals(b):
            failures.append(name)
            diff = (a != b).any(axis=1)
            print(f"FAIL  {name}: value mismatch, first diffs:")
            print(pd.concat([a[diff].head(3), b[diff].head(3)], keys=["spark", "duckdb"]))
            continue
        print(f"PASS  {name} ({len(spdf)} rows, {time.time()-t0:.1f}s)")

    print(f"\n{len(failures)} failures: {failures}")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
