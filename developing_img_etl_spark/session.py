"""SparkSession factory.

Single place all entry points (tests, bench, __spark_entry__, pipeline)
get their session, so scale-relevant config is uniform:

- AQE on (runtime re-plan, skew-join handling, partition coalescing) —
  at 100 TB the static plan is always wrong somewhere.
- Arrow on — every pandas-UDF boundary is Arrow-batched.
- shuffle partitions sized to the local core count for tests; on a real
  cluster this is overridden to ~2-3x total cores (or left to AQE
  coalescing with a high initial number).
- Small Arrow batches: multimodal rows carry ~50-100 KB binary payloads
  (reference corpus stats, BASELINE.md), so 10k-row default batches
  would hold ~1 GB per batch per core.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def cpu_count() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(app_name: str = "developing_img_etl_spark", *, cpus: int | None = None) -> SparkSession:
    """Build (or reuse) the engine SparkSession."""
    n = cpus or cpu_count()
    builder = (
        SparkSession.builder.master(f"local[{n}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(n))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "1024")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
