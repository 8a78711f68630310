"""Streaming drain-floor probe (guide §1 measure-first, VERDICT r10 #5).

Times a set of streaming queries with bench methodology (toPandas, min
of N runs) under the CURRENT process environment, so variants are
compared by launching this script with different env:

  python scripts/stream_floor_probe.py st18 st13 st16            # as-is
  TMPDIR=/dev/shm python scripts/stream_floor_probe.py st18 ...  # tmpfs scratch
  SPARK_GRAFT_STREAM_PARTITIONS=1 python scripts/stream_floor_probe.py ...

Prints one JSON line: {"env": {...}, "queries": {name: min_sec}, "runs": N}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from developing_img_etl_spark.queries import all_queries
from developing_img_etl_spark.session import get_spark


def main() -> int:
    names = [a for a in sys.argv[1:] if not a.startswith("-")]
    runs = int(os.environ.get("PROBE_RUNS", "3"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    q = all_queries()
    # accept prefixes like "st18"
    resolved = {}
    for n in names:
        full = [k for k in q if k == n or k.startswith(n + "_")]
        assert len(full) == 1, (n, full)
        resolved[full[0]] = q[full[0]]

    spark = get_spark("stream_floor_probe")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    out = {}
    for name, fn in resolved.items():
        best = None
        for _ in range(runs):
            t0 = time.time()
            fn(spark, sf_dir).toPandas()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        out[name] = round(best, 3)
    print(json.dumps({
        "env": {
            "TMPDIR": os.environ.get("TMPDIR"),
            "SPARK_GRAFT_STREAM_PARTITIONS": os.environ.get("SPARK_GRAFT_STREAM_PARTITIONS"),
            "SPARK_GRAFT_LOCAL_DIR": os.environ.get("SPARK_GRAFT_LOCAL_DIR"),
        },
        "runs": runs,
        "queries": out,
        "total": round(sum(out.values()), 3),
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
