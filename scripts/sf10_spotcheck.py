"""sf10 spot-correctness: hash-compare a representative query slice
against DuckDB at the fourth decade.

SF1_CORRECTNESS.json certifies all 179 queries at sf1; the sf10 probe
certifies THROUGHPUT at sf10 but not values. This script closes that
gap for a representative slice — one query per major family, chosen so
both engines finish comfortably at sf10 (the families whose oracles
DNF at sf10 are exactly the ones whose Spark results were certified at
sf0.01/0.1/1 and whose sf10 runs completed on the Spark side).

Writes SF10_SPOTCHECK.json. Usage: python scripts/sf10_spotcheck.py
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

SF = "/root/repo/testdata/sf10"
OUT = "/root/repo/SF10_SPOTCHECK.json"

# one per family: relational agg, join chain, window, percentiles,
# text stats, TF-IDF, dedup-exact, sketch (HLL), quantile sketch,
# similarity (matryoshka), evaluation (AUC, covariance), novelty,
# sampling, behavior
NAMES = [
    "q2_grouped_agg",
    "q3_join_chain",
    "q5_window_suite",
    "q22_percentiles",
    "q12a_token_stats",
    "q45_tfidf_topterms",
    "q14b_hash_canonical",
    "q97_hll_distinct",
    "q113_quantile_sketch",
    "q126_matryoshka_rank_audit",
    "q128_roc_auc",
    "q131_embedding_covariance",
    "q132_novelty_scan",
    "q57_group_topk_sample",
    "q127_linear_attribution",
]


def main() -> int:
    from oracle_utils import assert_matches

    from developing_img_etl_spark.queries import all_oracles, all_queries
    from developing_img_etl_spark.session import get_spark

    spark = get_spark("sf10-spot", cpus=32)
    spark.conf.set("spark.sql.shuffle.partitions", "64")
    qs, oracles = all_queries(), all_oracles()
    statuses: dict[str, str] = {}
    failures: list[str] = []
    for name in NAMES:
        t0 = time.time()
        try:
            assert_matches(qs[name](spark, SF), oracles[name], SF)
            statuses[name] = "MATCH"
        except Exception as e:  # noqa: BLE001
            statuses[name] = f"FAIL: {type(e).__name__}: {e}"
            failures.append(name)
        print(f"  {name}: {statuses[name]}  [{time.time() - t0:.1f}s]", flush=True)
    with open(OUT, "w") as f:
        json.dump({"sf_dir": SF, "statuses": statuses, "failures": failures}, f, indent=1)
    print("ALL GREEN" if not failures else f"FAILURES: {failures}", flush=True)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
