"""Paired A/B: r7-close code vs HEAD on the dedup-family queries whose
BENCH_r08-vs-r07 deltas exceeded the noise claim (VERDICT r8 #4:
q30 +39%, q74 +31%, st15 +20% at sf0.1, with no plan change).

Method: ONE process, ONE SparkSession (so JVM warmth, page cache and
codegen state are shared); the r7 code is a git worktree at efe7726
imported under a renamed package (its `developing_img_etl_spark` dir
is aliased via importlib so both versions coexist); each query runs
alternating A/B/A/B for N reps and the report compares MEDIANS.
A paired-median delta <10% = the bench movement was run noise.

Usage: python scripts/ab_dedup_noise.py  (expects tmp/r7wt worktree)
Writes AB_DEDUP_R9.json.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

SF = os.environ.get("AB_SF", "/root/testdata/sf0.1")
R7 = "/root/repo/tmp/r7wt"
ALIAS_DIR = "/root/repo/tmp/r7alias"
OUT = "/root/repo/AB_DEDUP_R9.json"
NAMES = ["q30_dedup_clusters", "q74_canonical_dedup", "st15_streaming_lsh_dedup"]
REPS = int(os.environ.get("AB_REPS", "3"))
# optional: names + output path via argv (r9: also used to A/B the
# shingle-index/q14c rework against the r7 implementations)
if len(sys.argv) > 1:
    NAMES = sys.argv[1].split(",")
if len(sys.argv) > 2:
    OUT = sys.argv[2]


def _load_r7_package():
    """Import the r7 worktree's package as `r7_engine` without
    colliding with the HEAD package: a symlink alias on a PYTHONPATH
    entry, created BEFORE the session starts, so both the driver and
    the Python workers (which unpickle r7 UDFs by module reference)
    can import it. The package uses only relative internal imports
    (grep-verified), so the top-level name is free."""
    os.makedirs(ALIAS_DIR, exist_ok=True)
    link = f"{ALIAS_DIR}/r7_engine"
    if not os.path.islink(link):
        os.symlink(f"{R7}/developing_img_etl_spark", link)
    if ALIAS_DIR not in sys.path:
        sys.path.insert(0, ALIAS_DIR)
    pp = os.environ.get("PYTHONPATH", "")
    if ALIAS_DIR not in pp.split(os.pathsep):
        os.environ["PYTHONPATH"] = ALIAS_DIR + os.pathsep + pp if pp else ALIAS_DIR
    from r7_engine.queries import all_queries as r7_queries  # type: ignore

    return r7_queries()


def main() -> int:
    from developing_img_etl_spark.queries import all_queries
    from developing_img_etl_spark.session import get_spark

    head_qs = all_queries()
    r7_qs = _load_r7_package()

    spark = get_spark("ab-dedup", cpus=32)
    results: dict[str, dict] = {}
    # one untimed warm pass of each variant (codegen + page cache)
    for name in NAMES:
        r7_qs[name](spark, SF).toPandas()
        head_qs[name](spark, SF).toPandas()
        spark.catalog.clearCache()
        _clear_shingle_memos()

    for name in NAMES:
        a_times, b_times = [], []
        for _rep in range(REPS):
            for label, qs, sink in (("r7", r7_qs, a_times), ("head", head_qs, b_times)):
                _clear_shingle_memos()
                spark.catalog.clearCache()
                t0 = time.time()
                qs[name](spark, SF).toPandas()
                sink.append(round(time.time() - t0, 3))
        med_a, med_b = statistics.median(a_times), statistics.median(b_times)
        results[name] = {
            "r7": a_times,
            "head": b_times,
            "median_r7": med_a,
            "median_head": med_b,
            "delta_pct": round(100.0 * (med_b - med_a) / med_a, 1),
        }
        print(f"  {name}: r7 med {med_a}s vs head med {med_b}s "
              f"({results[name]['delta_pct']:+.1f}%)", flush=True)

    with open(OUT, "w") as f:
        json.dump(
            {
                "sf_dir": SF,
                "method": f"alternating paired reps x{REPS}, one session, medians",
                "r7_ref": "efe7726",
                "results": results,
            },
            f,
            indent=1,
        )
    return 0


def _clear_shingle_memos() -> None:
    """Both packages memoize the persisted shingle index — drop both
    so every rep pays (and measures) the same index build."""
    for modname in ("developing_img_etl_spark.queries._shingle", "r7_engine.queries._shingle"):
        mod = sys.modules.get(modname)
        if mod is not None and hasattr(mod, "_CACHE"):
            mod._CACHE.clear()


if __name__ == "__main__":
    raise SystemExit(main())
