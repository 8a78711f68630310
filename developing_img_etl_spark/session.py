"""SparkSession factory.

Single place all entry points (tests, bench, __spark_entry__, pipeline)
get their session, so scale-relevant config is uniform:

- AQE on (runtime re-plan, skew-join handling, partition coalescing) —
  at 100 TB the static plan is always wrong somewhere.
- Arrow on — every pandas-UDF boundary is Arrow-batched.
- shuffle partitions sized to the DATA, not the core count: the
  sandbox SFs shuffle a few MB-100 MB, where 32 partitions of ~3 MB
  are pure task-scheduling overhead — 8 is the measured sweet spot
  (every bench query flat-or-faster, q30 5.3s -> 4.5s). On a real
  cluster this is overridden (env SPARK_GRAFT_SHUFFLE_PARTITIONS) to
  ~2-3x total cores / ~100-200 MB per partition, or left to AQE
  coalescing from a high initial number. Results are partition-count
  invariant by design (hash-verified under both settings).
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
    # transformWithStateInPandas needs google.protobuf in the PYTHON
    # WORKERS; when absent, activate the vendored mini-runtime BEFORE
    # the JVM starts so the daemon inherits the PYTHONPATH entry
    # (vendor/protoshim — real package always wins when installed)
    from .vendor import ensure_protobuf

    ensure_protobuf()
    n = cpus or cpu_count()
    shuffle_parts = os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "8")
    builder = (
        SparkSession.builder.master(f"local[{n}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", shuffle_parts)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "1024")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        # The ORACLE GATE materializes full results driver-side
        # (toPandas vs DuckDB fetchdf); at sf1 the widest result
        # (q15's ~5M-pair self-join) exceeds the 1g default. Queries
        # themselves never collect unbounded data — this budget is for
        # the comparison harness, sized well under driver memory.
        .config(
            "spark.driver.maxResultSize",
            os.environ.get("SPARK_GRAFT_MAX_RESULT_SIZE", "8g"),
        )
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Input split size, like shuffle partitions, sized to the DATA:
        # the sandbox tables are single ~1-200 MB parquet files, where
        # the 128 MB default yields 1-3 scan tasks on a 32-core local
        # master — every scan-heavy stage ran as (2+1)/3 with a long
        # straggler. 4 MB splits give each table core-count-scale
        # parallelism (measured: q36 0.99s -> 0.82s, no regressions —
        # see BENCH_LOCAL history). On a real cluster override the env:
        # file counts provide the parallelism and 128-256 MB splits
        # amortize open cost.
        .config(
            "spark.sql.files.maxPartitionBytes",
            os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES", "4m"),
        )
    )
    # Shuffle-spill directory override (SPARK_GRAFT_LOCAL_DIR): the
    # default /tmp is reaped by the sandbox under long sf10 runs — the
    # blockmgr dir vanished under a live JVM mid-shuffle. Honored only
    # at JVM start (a getOrCreate reuse keeps the first value).
    local_dir = os.environ.get("SPARK_GRAFT_LOCAL_DIR")
    if local_dir:
        os.makedirs(local_dir, exist_ok=True)
        builder = builder.config("spark.local.dir", local_dir)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
