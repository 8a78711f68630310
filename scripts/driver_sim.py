"""Simulate the driver's verify pass against __spark_entry__.

Imports the entry module the way the driver does, smoke-runs entry(),
then runs every queries() entry at sf0.01 and compares row-count,
column names, and order-insensitive values against oracle_sql() via
DuckDB. Exit 0 = all green.

Usage: python scripts/driver_sim.py [sf_dir]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod
from developing_img_etl_spark.session import get_spark
from tests.oracle_utils import assert_matches

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"


def main() -> int:
    spark = get_spark("driver-sim", cpus=8)

    t0 = time.time()
    rows = entrymod.entry(spark).collect()
    print(f"entry(): {len(rows)} rows, schema stable, {time.time() - t0:.1f}s")
    assert len(rows) >= 0

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    print(f"{len(queries)} queries, {len(oracles)} oracles")
    failures = []
    for name, fn in sorted(queries.items()):
        t0 = time.time()
        try:
            df = fn(spark, SF)
            if name in oracles:
                assert_matches(df, oracles[name], SF, require_rows=True)
                status = "MATCH"
            else:
                n = df.count()
                assert n > 0
                status = f"rows-only ({n})"
            print(f"  {name}: {status}  [{time.time() - t0:.1f}s]")
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"  {name}: FAIL — {str(e)[:300]}")
    if failures:
        print(f"FAILED: {failures}")
        return 1
    print("ALL GREEN")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
