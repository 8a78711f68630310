"""Per-query optimization profiler (guide §1).

For each named query: capture .explain("formatted"), time the noop-sink
execution (computation only, no client transfer), time toPandas (the
bench's methodology), and count Spark jobs via a job group. Prints one
JSON line per query and optionally writes the plan to plans/<tag>/.

Usage:
  python scripts/opt_profile.py [--plans plans/r11 --suffix _before] q145_kcore_peel q30_dedup_clusters ...
  python scripts/opt_profile.py --all          # every declared query
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from developing_img_etl_spark.queries import all_queries
from developing_img_etl_spark.session import get_spark


def profile_one(spark, name, fn, sf_dir, plans_dir=None, suffix="", plan_only=False,
                jobs_only=False):
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    if jobs_only:
        sc.setJobGroup(f"opt:{name}", f"opt_profile {name}")
        t0 = time.time()
        df2 = fn(spark, sf_dir)
        t_mid = time.time()
        df2.write.format("noop").mode("overwrite").save()
        t_noop = time.time() - t_mid
        jobs = set(tracker.getJobIdsForGroup(f"opt:{name}"))
        sc.setJobGroup("", "")
        return {
            "query": name,
            "t_build": round(t_mid - t0, 3),
            "t_noop": round(t_noop, 3),
            "n_jobs": len(jobs),
        }

    # --- plan capture (also pays analysis cost once) ---
    t0 = time.time()
    df = fn(spark, sf_dir)
    t_build = time.time() - t0
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    if plans_dir:
        os.makedirs(plans_dir, exist_ok=True)
        with open(os.path.join(plans_dir, f"{name}{suffix}.txt"), "w") as f:
            f.write(plan)

    n_exchange = plan.count("Exchange")
    n_bhj = plan.count("BroadcastHashJoin")
    n_smj = plan.count("SortMergeJoin")
    n_shj = plan.count("ShuffledHashJoin")
    n_py = plan.count("ArrowEvalPython") + plan.count("BatchEvalPython") + plan.count("MapInPandas") + plan.count("FlatMapGroupsInPandas")

    if plan_only:
        return {
            "query": name,
            "t_build": round(t_build, 3),
            "exchanges": n_exchange,
            "joins": {"bhj": n_bhj, "smj": n_smj, "shj": n_shj},
            "python_nodes": n_py,
        }

    # --- noop-sink execution (guide §1.4) ---
    sc.setJobGroup(f"opt:{name}", f"opt_profile {name}")
    before_jobs = set(tracker.getJobIdsForGroup(f"opt:{name}"))
    t0 = time.time()
    df2 = fn(spark, sf_dir)
    df2.write.format("noop").mode("overwrite").save()
    t_noop = time.time() - t0
    jobs = set(tracker.getJobIdsForGroup(f"opt:{name}")) - before_jobs
    sc.setJobGroup("", "")

    # --- bench methodology (toPandas) ---
    t0 = time.time()
    fn(spark, sf_dir).toPandas()
    t_pandas = time.time() - t0

    return {
        "query": name,
        "t_build": round(t_build, 3),
        "t_noop": round(t_noop, 3),
        "t_toPandas": round(t_pandas, 3),
        "n_jobs": len(jobs),
        "exchanges": n_exchange,
        "joins": {"bhj": n_bhj, "smj": n_smj, "shj": n_shj},
        "python_nodes": n_py,
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--plans", default=None)
    ap.add_argument("--suffix", default="")
    ap.add_argument("--out", default=None)
    ap.add_argument("--plan-only", action="store_true")
    ap.add_argument("--jobs-only", action="store_true",
                    help="one noop execution per query: n_jobs + t_noop only")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    q = all_queries()
    names = list(q) if args.all else args.names
    unknown = [n for n in names if n not in q]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        return 2

    spark = get_spark("opt_profile")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warm-up
    rows = []
    for name in names:
        try:
            row = profile_one(
                spark, name, q[name], sf_dir, args.plans, args.suffix,
                plan_only=args.plan_only, jobs_only=args.jobs_only,
            )
        except Exception as e:  # keep going; report the failure
            row = {"query": name, "error": f"{type(e).__name__}: {e}"}
        rows.append(row)
        print(json.dumps(row), flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(rows, f, indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
