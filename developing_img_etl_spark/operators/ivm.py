"""Incremental materialized-view maintenance (IVM) for additive
aggregates (training-data mandate: a 100 TB corpus's reporting views
must refresh at delta cost, not base cost).

The reference's catalog maintenance is the degenerate form: append new
rows, rewrite the whole summary (`/root/reference/test.py:197-201`).
The general form maintains a grouped COUNT/SUM view under a signed
delta stream (+1 inserts, -1 retractions — the classic delta-relation
formulation, cf. DBSP/differential dataflow): aggregate the DELTA ONLY,
then merge partials with the stored view and drop emptied groups.

Scale shape: the refresh plan never touches the base table — one hash
agg over the delta (∝ |delta|), one union + re-agg with the view
(∝ |view|, i.e. the number of groups, not base rows). Both stages are
partial-aggregate friendly; no joins, no window, no driver state.

Float discipline: views MUST store exact DECIMAL partial sums — a
stored rounded double cannot be additively maintained (round(a)+round(b)
!= round(a+b)). Round once at presentation (queries/_det.py rules).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..queries._det import dec


def build_view(
    base: DataFrame,
    group_cols: Sequence[str],
    sum_cols: Sequence[str],
    *,
    count_col: str = "n",
) -> DataFrame:
    """Initial materialization: grouped row count + exact decimal sums."""
    return base.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias(count_col),
        *[F.sum(dec(c)).alias(c) for c in sum_cols],
    )


def delta_aggregate(
    delta: DataFrame,
    group_cols: Sequence[str],
    sum_cols: Sequence[str],
    *,
    count_col: str = "n",
    sign_col: str | None = None,
) -> DataFrame:
    """Partial aggregate of a (optionally signed) delta relation.
    ``sign_col`` defaults to all-inserts (+1). The sign is a signed
    MULTIPLICITY (the delta-relation convention): +1 insert, -1
    retraction, and any other integer contributes ``sgn`` to the count
    and ``sgn × value`` to each sum — count and sums stay consistent
    for every sign value, including 0 (a no-op row)."""
    sgn = F.col(sign_col).cast("long") if sign_col else F.lit(1).cast("long")
    # multiply (consistent for ANY sign), then cast the exact product-sum
    # back to the view's (22,4) type so incremental_refresh never widens
    signed = lambda c: (sgn.cast("decimal(8,0)") * dec(c))  # noqa: E731
    return delta.groupBy(*group_cols).agg(
        F.sum(sgn).alias(count_col),
        *[F.sum(signed(c)).cast("decimal(22,4)").alias(c) for c in sum_cols],
    )


def incremental_refresh(
    view: DataFrame,
    delta_agg: DataFrame,
    group_cols: Sequence[str],
    sum_cols: Sequence[str],
    *,
    count_col: str = "n",
) -> DataFrame:
    """Merge delta partials into the stored view: union + one re-agg
    (cheaper and simpler than a full-outer join — same single shuffle,
    no null-coalescing per column), dropping groups whose live row
    count reaches zero. Cost ∝ |view| + |delta groups|."""
    cols = [*group_cols, count_col, *sum_cols]
    # cast each re-aggregated column back to the view's own type: Spark
    # widens SUM(decimal(p,s)) to decimal(p+10,s), so an uncast refresh
    # would grow the schema every cycle and break schema-stable
    # persistence (e.g. TxLogFormat's type-change rejection)
    types = {f.name: f.dataType for f in view.schema.fields}
    merged = (
        view.select(*cols)
        .unionByName(delta_agg.select(*cols))
        .groupBy(*group_cols)
        .agg(
            F.sum(count_col).cast(types[count_col]).alias(count_col),
            *[F.sum(c).cast(types[c]).alias(c) for c in sum_cols],
        )
    )
    return merged.filter(F.col(count_col) > 0)
