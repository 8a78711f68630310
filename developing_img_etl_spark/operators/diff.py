"""Table diff / snapshot reconciliation (S8 family).

Given two snapshots of a keyed table, classify every key as
added / removed / changed / unchanged — the audit a fleet runs after a
backfill, a MERGE (operators/merge.py), or a format migration
(sinks/writer.py) to prove the rewrite touched exactly what it should.

Shape: ONE full-outer join on the key; column comparison is a single
codegen'd conjunction (null-safe <=> so NULL==NULL counts as equal) —
no hashing, no UDF, so the classification is engine-exact and the
oracle can mirror it with IS NOT DISTINCT FROM. At 100 TB both sides
shuffle once on the key; with bucketed snapshots (sinks/bucketed.py)
the exchange disappears entirely.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def table_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: str | Sequence[str],
    *,
    compare_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Return one row per key present in either snapshot with a
    ``diff_status`` column: 'added' (new only), 'removed' (old only),
    'changed' (both, some compared column differs), 'unchanged'.
    ``compare_cols`` defaults to all shared non-key columns."""
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    if compare_cols is None:
        compare_cols = [
            c for c in old.columns if c in set(new.columns) and c not in keys
        ]
    o = old.select(
        *keys,
        F.lit(True).alias("_in_old"),
        *[F.col(c).alias(f"_old_{c}") for c in compare_cols],
    )
    n = new.select(
        *keys,
        F.lit(True).alias("_in_new"),
        *[F.col(c).alias(f"_new_{c}") for c in compare_cols],
    )
    joined = o.join(n, keys, "full_outer")
    same = F.lit(True)
    for c in compare_cols:
        same = same & F.col(f"_old_{c}").eqNullSafe(F.col(f"_new_{c}"))
    status = (
        F.when(F.col("_in_old").isNull(), F.lit("added"))
        .when(F.col("_in_new").isNull(), F.lit("removed"))
        .when(same, F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return joined.select(*keys, status.alias("diff_status"))
