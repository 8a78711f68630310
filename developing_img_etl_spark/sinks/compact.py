"""Small-file compaction (fleet-scale operability).

Incremental appends (streaming/incremental.py, partitioned.py) produce
one file per micro-batch per partition; at 100 TB the accumulated
small files dominate scan planning time and NameNode/listing pressure
long before data volume does. Compaction rewrites a table (or a
partition subset) into ~target-sized files and atomically swaps the
directory.

Spark-native shape: one read → repartition to ceil(bytes/target) →
write to a sibling temp dir → rename swap. The repartition is a full
shuffle of the compacted slice — the point of compaction; run it per
partition (pass `where`) to bound each job.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from .partitioned import path_exists


def compact_parquet(
    spark: SparkSession,
    path: str,
    *,
    target_file_mb: int = 128,
    where: str | None = None,
    partition_cols: list[str] | None = None,
) -> int:
    """Rewrite `path` (optionally filtered by `where`, e.g. one
    partition's predicate) into ~target_file_mb files. Returns the
    output file count. Swap is rename-based: crash before the final
    rename leaves the original intact."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    src = jvm.org.apache.hadoop.fs.Path(path)
    fs = src.getFileSystem(conf)
    if not fs.exists(src):
        raise FileNotFoundError(path)

    size_bytes = fs.getContentSummary(src).getLength()
    n_files = max(1, int(size_bytes // (target_file_mb * 1024 * 1024)) + 1)

    df = spark.read.parquet(path)
    if where:
        df = df.filter(where)
    tmp = path.rstrip("/") + "__compact_tmp"
    old = path.rstrip("/") + "__compact_old"
    writer = df.repartition(n_files).write.mode("overwrite")
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(tmp)

    tmp_p = jvm.org.apache.hadoop.fs.Path(tmp)
    old_p = jvm.org.apache.hadoop.fs.Path(old)
    fs.delete(old_p, True)
    if not fs.rename(src, old_p):
        raise IOError(f"compact: could not move {path} aside")
    if not fs.rename(tmp_p, src):
        fs.rename(old_p, src)  # roll back
        raise IOError(f"compact: could not swap in {tmp}")
    fs.delete(old_p, True)

    out = spark.read.parquet(path)
    return len([f for f in fs.listStatus(src) if f.getPath().getName().endswith(".parquet")]) or out.rdd.getNumPartitions()


def file_count(spark: SparkSession, path: str) -> int:
    """Data-file count under a path (for before/after assertions)."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(conf)
    it = fs.listFiles(p, True)
    n = 0
    while it.hasNext():
        f = it.next()
        name = f.getPath().getName()
        if not name.startswith(("_", ".")):
            n += 1
    return n
