"""Benchmark harness — the driver's per-round feedback loop.

Runs every declared query at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Timing = full action (plan + execute + collect) per query, one pass,
after a session warm-up action so JVM/codegen startup isn't billed to
the first query.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from developing_img_etl_spark.queries import all_queries
from developing_img_etl_spark.session import get_spark


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("bench")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warm-up

    # Two full passes, min per query: pass 1 pays whole-stage-codegen
    # compilation (~5-10 s for wide projections), and the host
    # occasionally stalls a single task for minutes (observed: identical
    # q2 runs at 2.2 s and 258 s with zero steal/IO). The min is the
    # engine's capability number; neither artifact can poison it.
    def run_once(fn) -> float:
        t0 = time.time()
        fn(spark, sf_dir).collect()
        return time.time() - t0

    timings: dict[str, float] = {}
    for _pass in range(2):
        for name, fn in sorted(all_queries().items()):
            t = run_once(fn)
            timings[name] = round(min(t, timings.get(name, t)), 3)
            if _pass:
                print(f"  {name}: {timings[name]}s", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "declared_queries_wall_clock",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf),
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
