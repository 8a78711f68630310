"""Paired same-session layout A/B for the sf10 shingle-index consumers
that regressed in the r9 probe refresh (VERDICT r9 #1: q108 169→309 s,
q125 197→351 s, q30 210→384 s, q63 11→17 s after the index was
persisted pre-partitioned on (source, s)).

The r9 refresh changed TWO things at once — measurement method
(cold-JVM + one warm pass, vs mid-full-session originals) AND index
layout — so the regression was confounded. This harness isolates the
LAYOUT variable: ONE process, ONE SparkSession (JVM warmth, codegen
and page cache shared), each query runs the sequence
    natural → source_s → natural → source_s
where each leg clears the index memo + Spark cache, executes once
untimed (index build + persist materialization + codegen — the sf10
probe's own warm-pass discipline, scripts/sf10_probe.py:87) and then
times the second execution. Paired legs inside one session make the
layout deltas directly comparable; the repeated-natural leg bounds
within-session drift.

Usage: python scripts/ab_shingle_layout.py [names] [out] [sf_dir]
Writes AB_SHINGLE_LAYOUT_R10.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

SF = sys.argv[3] if len(sys.argv) > 3 else "/root/repo/testdata/sf10"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/AB_SHINGLE_LAYOUT_R10.json"
NAMES = (
    sys.argv[1].split(",")
    if len(sys.argv) > 1
    else [
        "q63_repeated_ngram_overlap",
        "q108_minhash_audit",
        "q125_substring_span_pairs",
        "q30_dedup_clusters",
        # control: the self-join-dominated family source_s was built for —
        # expected to move the OTHER way
        "q14c_ngram_jaccard_pairs",
    ]
)
SEQUENCE = ("natural", "source_s", "natural", "source_s")
# Per-query overrides: q108's natural-layout leg OOMs the probe's 48g
# JVM at sf10 (observed twice is not needed — the 11:39 run's heap
# trace is in tmp/ab_layout.log): natural is NOT a viable layout for
# q108 at this scale, so its A/B degenerates to timing the only
# viable layout in the same session for the record.
SEQ_OVERRIDES = {"q108_minhash_audit": ("source_s", "source_s")}
PROGRESS = "/root/repo/tmp/ab_shingle_progress.jsonl"


def _reset(spark) -> None:
    from developing_img_etl_spark.queries import _shingle

    for df in _shingle._CACHE.values():
        try:
            df.unpersist()
        except Exception:  # noqa: BLE001
            pass
    _shingle._CACHE.clear()
    spark.catalog.clearCache()
    # force ContextCleaner to release prior legs' shuffle files NOW:
    # across a ~3h session they otherwise accumulate on disk until JVM
    # GC happens to run (observed: transient ENOSPC on a 252G disk)
    try:
        spark.sparkContext._jvm.System.gc()
    except Exception:  # noqa: BLE001
        pass


def main() -> int:
    from developing_img_etl_spark.queries import _shingle, all_queries
    from developing_img_etl_spark.session import get_spark

    os.environ["SPARK_GRAFT_LOCAL_DIR"] = "/root/repo/tmp/spark-local"
    qs = all_queries()
    spark = get_spark("ab-shingle-layout", cpus=32)
    spark.conf.set("spark.sql.shuffle.partitions", "64")  # probe parity
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    done: dict[tuple[str, int], float] = {}
    if os.path.exists(PROGRESS):
        with open(PROGRESS) as f:
            for line in f:
                rec = json.loads(line)
                done[(rec["name"], rec["leg"])] = rec["secs"]

    results: dict[str, dict] = {}
    for name in NAMES:
        legs: list[dict] = []
        for i, layout in enumerate(SEQ_OVERRIDES.get(name, SEQUENCE)):
            if (name, i) in done:
                legs.append({"layout": layout, "secs": done[(name, i)]})
                continue
            _shingle.DEFAULT_LAYOUT = layout
            _reset(spark)
            try:
                qs[name](spark, SF).toPandas()  # untimed: build + warm
                t0 = time.time()
                qs[name](spark, SF).toPandas()
                secs = round(time.time() - t0, 3)
            except Exception as e:  # noqa: BLE001 — record, keep going
                legs.append({"layout": layout, "error": f"{type(e).__name__}"})
                with open(PROGRESS, "a") as f:
                    f.write(
                        json.dumps({"name": name, "leg": i, "layout": layout,
                                    "error": type(e).__name__}) + "\n"
                    )
                continue
            legs.append({"layout": layout, "secs": secs})
            with open(PROGRESS, "a") as f:
                f.write(
                    json.dumps({"name": name, "leg": i, "layout": layout, "secs": secs})
                    + "\n"
                )
            print(f"  {name} [{layout}]: {secs:.2f}s", flush=True)
        nat = [x["secs"] for x in legs if x["layout"] == "natural" and "secs" in x]
        srs = [x["secs"] for x in legs if x["layout"] == "source_s" and "secs" in x]
        results[name] = {
            "legs": legs,
            "natural_best": min(nat) if nat else None,
            "source_s_best": min(srs) if srs else None,
            "source_s_vs_natural_pct": round(
                100.0 * (min(srs) - min(nat)) / min(nat), 1
            ) if nat and srs else None,
        }

    _shingle.DEFAULT_LAYOUT = "source_s"
    with open(OUT, "w") as f:
        json.dump(
            {
                "sf_dir": SF,
                "method": (
                    "one session; per query alternating natural/source_s x2; "
                    "each leg: memo+cache cleared, one untimed warm pass "
                    "(index build + codegen), second execution timed — the "
                    "sf10 probe's own timing discipline"
                ),
                "sequence": list(SEQUENCE),
                "results": results,
            },
            f,
            indent=1,
        )
    print(json.dumps({k: v["source_s_vs_natural_pct"] for k, v in results.items()}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
