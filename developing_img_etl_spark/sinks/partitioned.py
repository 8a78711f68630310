"""Partitioned sinks (SURVEY.md §2.1 S6, S8).

The reference's output layout `weekly_photos/{kode_proyek}/{minggu}/{file}`
(/root/reference/test.py:172-173) is exactly a Hive-style partitioned
write; partition pruning on (kode_proyek, minggu) then comes free for
every downstream read. Keys must be normalized BEFORE reaching here
(§1.4 — the reference wrote two partition trees for one project).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame,
    path: str,
    *,
    partition_cols: list[str] = ("kode_proyek", "minggu"),
    mode: str = "append",
) -> None:
    """Hive-partitioned parquet write. Binary `content` columns ride
    along as a regular column — never a shuffle key (SURVEY §4.2)."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def overwrite_catalog(catalog: DataFrame, path: str) -> None:
    """The catalog overwrite-save (test.py:200-201). Parquet overwrite is
    atomic-enough locally; on a real deployment this is the one table
    that wants a transactional format (Delta/Iceberg).

    The typical lineage is read_catalog(path) -> union -> overwrite of
    the SAME path; Spark either refuses ('Cannot overwrite a path that
    is also being read from') or, worse, deletes input files mid-read.
    Materialize to executor storage first so the write's lineage no
    longer references the target path. The catalog is a metadata table
    (thousands of rows, no binary payloads), so the checkpoint is cheap
    even at fleet scale."""
    catalog.localCheckpoint(eager=True).write.mode("overwrite").parquet(path)


def read_catalog(spark: SparkSession, path: str, schema: str) -> DataFrame:
    """Read the catalog, or an empty frame on first run
    (test.py:99-111 'if exists' semantics). Existence is probed via the
    Hadoop FS — catching read exceptions instead would also swallow
    corrupt-footer / permission / transient-FS errors and silently
    restart the catalog from empty."""
    if path_exists(spark, path):
        return spark.read.schema(schema).parquet(path)
    return spark.createDataFrame([], schema)


def path_exists(spark: SparkSession, path: str) -> bool:
    """Hadoop-FS existence probe (works for any supported scheme)."""
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    return bool(fs.exists(p))
