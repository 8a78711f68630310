"""Deterministic fuzzy file-resolution join (SURVEY.md §2.3 J3).

The reference resolves an expected filename to an actual file by exact
path check, then falls back to "first directory entry containing the
extension-stripped basename" (/root/reference/test.py:156-169) — a
result that depends on OS directory-listing order. The engine keeps the
semantics but makes the pick deterministic: exact match wins, then the
lexicographically smallest containing filename.

Physical shape: the containment predicate is a theta join. With an
optional blocking key (e.g. the partition dir) it becomes equi+theta
and rides a hash shuffle; without one the file side is broadcast —
correct for the reference's "one staging directory" scale. At 100 TB
you always block.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.strings import strip_ext


def fuzzy_resolve(
    expected: DataFrame,
    files: DataFrame,
    *,
    row_key: list[str],
    expected_name: str = "nama_file",
    file_name: str = "file_name",
    block_cols: list[str] | None = None,
) -> DataFrame:
    """Attach ``resolved_file`` (nullable) to each ``expected`` row.

    ``row_key``: columns uniquely identifying an expected row (the
    composite key in the reference pipeline). ``block_cols``: equi-key
    columns present on BOTH sides that bound the fuzzy search space.
    """
    block_cols = block_cols or []
    e = expected.alias("e")
    f = files.select(*block_cols, file_name).alias("f")

    base = strip_ext(F.col(f"e.{expected_name}"))
    exact = F.col(f"f.{file_name}") == F.col(f"e.{expected_name}")
    cond = F.col(f"f.{file_name}").contains(base) | exact
    for b in block_cols:
        cond = cond & (F.col(f"e.{b}") == F.col(f"f.{b}"))

    fside = f if block_cols else F.broadcast(f)
    cand = e.join(fside, cond, "left")

    w = Window.partitionBy(*[F.col(f"e.{c}") for c in row_key]).orderBy(
        F.desc(exact.cast("int")), F.col(f"f.{file_name}").asc_nulls_last()
    )
    return (
        cand.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") == 1)
        .select("e.*", F.col(f"f.{file_name}").alias("resolved_file"))
    )
