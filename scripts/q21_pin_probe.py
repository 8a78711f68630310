"""q21 per-level-pin A/B probe (VERDICT r11 #1).

The r11 change pinned every unrolled depth level with a lazy
localCheckpoint (linear join count — 30 SortMergeJoins -> 6 in the
plan) but the driver bench regressed 0.777 and it reproduced at 8
cores: at sf0.1 the pin pays per-level block materializations plus
lost codegen fusion. This probe times the SAME fast-path body under
four pin policies in ONE session, interleaved min-of-N, and verifies
all variants produce identical results (checksum):

  all    — r11 shape: lazy localCheckpoint after every level
  none   — r10 shape: no pins (quadratic join re-expansion)
  alt    — pin every SECOND level (joins ~1.5x linear, half the pins)
  persist— MEMORY_AND_DISK persist per level (InMemoryRelation reuse
           instead of RDD conversion; unpersisted after timing)

Usage: python scripts/q21_pin_probe.py [runs_per_variant]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from developing_img_etl_spark.catalog import load
from developing_img_etl_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def build(spark, mode: str):
    lineitem = load(spark, SF_DIR, "lineitem")
    edges = (
        lineitem.alias("c")
        .join(
            lineitem.alias("p"),
            (F.col("c.l_orderkey") == F.col("p.l_orderkey"))
            & (F.col("c.l_linenumber") == F.col("p.l_linenumber") + 1),
        )
        .select(
            F.col("c.l_orderkey").alias("orderkey"),
            F.col("c.l_linenumber").alias("child_line"),
            F.col("p.l_linenumber").alias("parent_line"),
        )
    )
    edges = (
        edges.groupBy("orderkey", "child_line", "parent_line")
        .agg(F.count(F.lit(1)).alias("mult"))
        .localCheckpoint(eager=True)
    )
    max_depth = (
        lineitem.agg(F.max("l_linenumber").alias("m")).collect()[0].m or 1
    ) - 1
    closure = edges.withColumn("depth", F.lit(1))
    step = edges.select(
        F.col("orderkey").alias("r_orderkey"),
        F.col("child_line").alias("r_child"),
        F.col("parent_line").alias("r_parent"),
        F.col("mult").alias("r_mult"),
    )
    cur = closure
    pinned = []
    for lvl in range(max_depth - 1):
        cur = cur.join(
            step,
            (F.col("orderkey") == F.col("r_orderkey"))
            & (F.col("parent_line") == F.col("r_child")),
        ).select(
            "orderkey",
            "child_line",
            F.col("r_parent").alias("parent_line"),
            (F.col("depth") + 1).alias("depth"),
            (F.col("mult") * F.col("r_mult")).alias("mult"),
        )
        if mode == "all":
            cur = cur.localCheckpoint(eager=False)
        elif mode == "alt" and lvl % 2 == 1:
            cur = cur.localCheckpoint(eager=False)
        elif mode == "persist":
            cur = cur.persist()
            pinned.append(cur)
        closure = closure.unionByName(cur)
    out = (
        closure.withColumn("__i", F.explode(F.sequence(F.lit(1), F.col("mult"))))
        .drop("__i", "mult")
        .orderBy("orderkey", "child_line", "parent_line")
    )
    return out, pinned


def main() -> int:
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = get_spark("q21_pin_probe")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    modes = ["all", "none", "alt", "persist"]
    sums = {}
    times = {m: [] for m in modes}
    for r in range(runs):
        for m in modes:
            t0 = time.time()
            df, pinned = build(spark, m)
            pdf = df.toPandas()
            dt = time.time() - t0
            for p in pinned:
                p.unpersist()
            times[m].append(round(dt, 3))
            chk = (len(pdf), int(pdf["orderkey"].sum()), int(pdf["depth"].sum()))
            if m in sums:
                assert sums[m] == chk, (m, sums[m], chk)
            sums[m] = chk
    first = next(iter(sums.values()))
    assert all(v == first for v in sums.values()), sums
    print(json.dumps({
        "sf_dir": SF_DIR,
        "checksum": first,
        "times": times,
        "min": {m: min(v) for m, v in times.items()},
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
