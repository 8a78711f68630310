"""SCD-1 MERGE / upsert as a pure DataFrame composition (S8 extension).

The reference's catalog maintenance is read-modify-overwrite
(`/root/reference/test.py:197-201`: pd.concat old+new, rewrite). The
relational form of that operation is MERGE: updates win on key match,
unmatched target rows survive, unmatched updates insert, tombstones
delete. Expressed Spark-first it is one anti-join + one union — no
shuffle beyond the join itself, and Catalyst broadcasts the (small)
update set automatically, so at 100 TB the target table streams
through map-side: scan → broadcast-anti → union → write.

Deployment note: against a transactional table format this compiles to
the format's native MERGE INTO (the TableFormat seam in sinks/writer.py
names Delta/Iceberg as the production impls); this composition is the
format-agnostic fallback and the semantics contract both share.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_upsert(
    target: DataFrame,
    updates: DataFrame,
    key_cols: str | Sequence[str],
    *,
    delete_col: str | None = None,
) -> DataFrame:
    """SCD-1 merge of ``updates`` into ``target`` on ``key_cols``.

    - matched keys: the update row replaces the target row
    - unmatched target rows: kept as-is
    - unmatched update rows: inserted
    - ``delete_col`` (optional BOOLEAN on updates): rows where it is
      true are tombstones — the matching target row is dropped and the
      tombstone itself is not inserted.

    Column contract: ``updates`` must carry exactly the target columns
    (plus ``delete_col`` if used) — enforced here so schema drift fails
    at plan time, not as a silent unionByName miss."""
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    expected = set(target.columns)
    extra = {delete_col} if delete_col else set()
    actual = set(updates.columns) - extra
    if actual != expected:
        raise ValueError(
            f"updates schema drift: expected {sorted(expected)}, got {sorted(actual)}"
        )
    survivors = target.join(updates.select(*keys), keys, "left_anti")
    if delete_col is None:
        return updates.select(*target.columns).unionByName(survivors)
    inserts = updates.filter(~F.coalesce(F.col(delete_col), F.lit(False))).select(
        *target.columns
    )
    return inserts.unionByName(survivors)
