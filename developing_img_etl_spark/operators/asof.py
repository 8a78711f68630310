"""As-of join (J7, SURVEY.md §2.3): for each left row, the most recent
right row with right_time <= left_time for the same key.

Spark has no built-in as-of join; the idiomatic scale-safe construction
is union-then-window — ONE shuffle on the key (no per-row subquery, no
cartesian blowup):

  1. tag left/right rows, align schemas (right's value columns become
     NULL on left rows and vice versa),
  2. sort each key's rows by (time, is_left) — right rows sort before
     left rows at the same timestamp, so an exactly-equal timestamp
     matches (<= semantics, same as DuckDB ASOF JOIN),
  3. F.last(value, ignorenulls=True) over an unbounded-preceding frame
     carries the latest right value forward,
  4. keep only left rows.

At 100 TB this is a single hash shuffle of (left ∪ right) on the join
key + an in-partition sort — exactly the cost of one sort-merge join.

Determinism: if the right side can hold several rows with the same
(key, time), pre-aggregate it first (the caller picks the reduction) —
otherwise "the" as-of value is ill-defined in any engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_T = "__asof_t"
_L = "__asof_is_left"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    left_time: str,
    right_time: str,
    right_on: str | None = None,
    value_cols: list[str] | None = None,
) -> DataFrame:
    """Left as-of join. ``value_cols`` default: every right column except
    the key and time columns. Output: all left columns + value_cols
    (NULL where no right row precedes the left row)."""
    right_on = right_on or on
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in (right_on, right_time)]

    right_types = dict(right.dtypes)
    l_tag = left.select(
        *[F.col(c) for c in left.columns],
        F.col(left_time).alias(_T),
        F.lit(1).alias(_L),
        *[F.lit(None).cast(right_types[c]).alias(c) for c in value_cols],
    )
    left_types = dict(left.dtypes)
    r_tag = right.select(
        F.col(right_on).alias(on),
        *[F.lit(None).cast(left_types[c]).alias(c) for c in left.columns if c != on],
        F.col(right_time).alias(_T),
        F.lit(0).alias(_L),
        *[F.col(c) for c in value_cols],
    )

    unioned = l_tag.unionByName(r_tag)
    frame = (
        Window.partitionBy(on)
        .orderBy(_T, _L)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        *[c for c in left.columns],
        F.col(_L).alias(_L),
        *[F.last(c, ignorenulls=True).over(frame).alias(c) for c in value_cols],
    )
    return filled.filter(F.col(_L) == 1).drop(_L)


def range_join_buckets(
    facts: DataFrame,
    buckets: DataFrame,
    *,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    how: str = "left",
) -> DataFrame:
    """Non-equi range join: attach the bucket whose [lo, hi) interval
    contains ``value_col``. The bucket side must be small — it is
    broadcast, so the plan is BroadcastNestedLoopJoin (no shuffle of the
    fact side), the only sane physical strategy for pure range joins.

    ``how``: 'left' keeps out-of-domain facts with NULL bucket columns
    (the guard shape); 'inner' drops them (the histogram shape)."""
    cond = (F.col(value_col) >= F.col(lo_col)) & (F.col(value_col) < F.col(hi_col))
    return facts.join(F.broadcast(buckets), cond, how)
