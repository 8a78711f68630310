"""Small-file compaction (fleet-scale operability).

Incremental appends (streaming/incremental.py, partitioned.py) produce
one file per micro-batch per partition; at 100 TB the accumulated
small files dominate scan planning time and NameNode/listing pressure
long before data volume does. Compaction rewrites a table (or one
hive partition of it) into ~target-sized files and atomically swaps
the directory.

Spark-native shape: one read → repartition to ceil(bytes/target) →
write to a sibling temp dir → rename swap. The repartition is a full
shuffle of the compacted slice — the point of compaction; run it per
partition (pass `partition`) to bound each job.

Scope rule (the round-2 data-loss fix): the directory that gets
swapped is exactly the directory that was read. Whole-table compaction
swaps the table root; `partition={"col": val, ...}` compaction reads
ONLY `path/col=val/...` and swaps ONLY that subdirectory, so rows in
every other partition are physically untouched. There is no predicate
parameter — a row-level `where` cannot be honored by a directory swap
and previously deleted every non-matching row.
"""

from __future__ import annotations

from typing import Any, Mapping

from pyspark.sql import SparkSession

from .partitioned import path_exists


def _hadoop(spark: SparkSession, path: str):
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    return jvm, p.getFileSystem(conf), p


def _swap_dir(jvm, fs, target: str, tmp: str) -> None:
    """Atomically (rename-based) replace directory `target` with `tmp`.
    Crash before the final rename leaves the original intact."""
    src = jvm.org.apache.hadoop.fs.Path(target)
    tmp_p = jvm.org.apache.hadoop.fs.Path(tmp)
    old = target.rstrip("/") + "__compact_old"
    old_p = jvm.org.apache.hadoop.fs.Path(old)
    fs.delete(old_p, True)
    if not fs.rename(src, old_p):
        raise IOError(f"compact: could not move {target} aside")
    if not fs.rename(tmp_p, src):
        fs.rename(old_p, src)  # roll back
        raise IOError(f"compact: could not swap in {tmp}")
    fs.delete(old_p, True)


def compact_parquet(
    spark: SparkSession,
    path: str,
    *,
    target_file_mb: int = 128,
    partition: Mapping[str, Any] | None = None,
    partition_cols: list[str] | None = None,
) -> int:
    """Rewrite `path` — or, with `partition={"col": val, ...}`, just
    that hive partition directory — into ~target_file_mb files.
    Returns the resulting data-file count of the compacted directory.

    `partition` keys must be the table's partition columns in order
    (hive layout `path/col1=v1/col2=v2`). Only that subdirectory is
    read, rewritten, and swapped; all other partitions are untouched.
    `partition_cols` re-partitions the *output* of a whole-table
    compaction (ignored for single-partition jobs, whose partition
    values live in the directory name, not the files).
    """
    if partition:
        sub = "/".join(f"{k}={v}" for k, v in partition.items())
        target = path.rstrip("/") + "/" + sub
    else:
        target = path.rstrip("/")

    jvm, fs, target_p = _hadoop(spark, target)
    if not fs.exists(target_p):
        raise FileNotFoundError(target)

    # Size the file count from the slice being rewritten, not the table.
    size_bytes = fs.getContentSummary(target_p).getLength()
    n_files = max(1, int(size_bytes // (target_file_mb * 1024 * 1024)) + 1)

    # Reading the partition subdirectory directly (no basePath) drops the
    # partition columns — correct here: hive encodes them in the dir name,
    # so the rewritten files must not contain them either.
    df = spark.read.parquet(target)
    tmp = target + "__compact_tmp"
    writer = df.repartition(n_files).write.mode("overwrite")
    if partition_cols and not partition:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(tmp)

    _swap_dir(jvm, fs, target, tmp)
    return file_count(spark, target)


def file_count(spark: SparkSession, path: str) -> int:
    """Recursive data-file count under a path (for before/after assertions)."""
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
