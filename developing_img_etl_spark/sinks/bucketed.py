"""Bucketed tables — shuffle-free co-located joins (SCALE.md rule:
"reuse a partitioning across stages"; the 100 TB answer to repeated
fact⋈fact joins on the same key).

`spark.write.bucketBy(n, key)` pre-shuffles data ONCE at write time
into a fixed bucket layout; every later equi-join or aggregation on the
bucket key then runs with NO Exchange on that side — at fleet scale
this converts the dominant per-query shuffle of a hot join key into a
one-time ingest cost. Bucketed tables must be saved via the session
catalog (`saveAsTable`), not a bare path: bucket metadata lives in the
metastore.

The plan contract is tested (tests/test_misc_surface.py): joining two
tables bucketed on the same key with the same bucket count yields a
SortMergeJoin whose inputs have no ShuffleExchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    *,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist `df` as a bucketed (and optionally sorted) catalog table.

    `n_buckets` should match the downstream join fan-in (a multiple of
    cluster parallelism); `sort_cols` pre-sorts within buckets so the
    join's SortExec is also free."""
    writer = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two bucketed tables on their bucket key. With matching
    bucket specs, Catalyst plans a SortMergeJoin with zero exchanges —
    the join is executed bucket-by-bucket, co-located."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
