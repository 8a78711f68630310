"""Distributed Count-Min sketch (Cormode/Muthukrishnan 2005) — the
frequency-estimation peer of the Bloom filter (operators/bloom.py) in
the sketch family: Bloom answers "was this key present", HLL
(approx_count_distinct, q17) answers "how many distinct keys", CMS
answers "about how often did this key occur" in sublinear memory with
a one-sided (never-underestimate) error bound.

The reference's frequency bookkeeping is a driver-side Counter
(`/root/reference/test.py:94-118` derives per-row stats in pandas); at
100 TB the exact token→count map does not fit anywhere, and the
standard curation answer (heavy-hitter tracking for vocab builds,
stop-list induction, skew detection feeding q47-style diagnostics) is
a mergeable sketch.

Build is one hash aggregation, the same physical shape Spark uses for
any partial+final agg:

  cells:  explode each (key, weight) into d rows (r, pos_r(key)) and
          ``groupBy(r, c).sum(weight)`` — d·w cells total, mergeable
          across partitions/days/tables by cell-wise addition, no
          driver collect, no UDF
  probe:  broadcast the tiny cell frame, join the probe's d positions,
          take ``min`` over the d counters — the CMS estimate, always
          >= the true count (each cell only ever adds non-negative
          collisions)

The hash family is the same portable Kirsch–Mitzenmacher double
hashing as the Bloom filter (bounded modular arithmetic, overflow-free
in any engine: all constants < 2^31 and (key % P)·K < 2^62), so the
DuckDB oracle — or any external system — reproduces the sketch
bit-for-bit; one wrong cell anywhere flips an estimate.

Sizing: overestimate <= e·N/w with probability 1 - e^-d (N = total
weight); memory is d·w longs regardless of key cardinality. At 100 TB
the build cost is the token-count aggregation the pipeline already
pays; the sketch adds d tiny integer columns to that shuffle's key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .bloom import K1, K2, P, S1, S2


def _pos(key: Column, r: int, width: int) -> Column:
    """Portable CMS column index for hash row ``r`` (K-M double hash)."""
    h1 = ((key % P) * K1 + S1) % P
    h2 = ((key % P) * K2 + S2) % P
    return (h1 + r * h2) % P % width


def cms_build(
    keyed: DataFrame,
    key_col: str,
    weight_col: str,
    *,
    depth: int = 3,
    width: int = 512,
) -> DataFrame:
    """Aggregate a (key, weight) frame into CMS cells ``(r, c, cnt)``.

    ``keyed`` is expected to be pre-aggregated per key (one row per
    key) so the d-way explode multiplies keys, not raw occurrences —
    the map-side-combine discipline; passing raw occurrences with
    weight 1 is correct too, just a bigger explode.
    """
    k = F.col(key_col).cast("long")
    rows = keyed.select(
        F.col(weight_col).alias("cnt"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("r"), _pos(k, r, width).cast("long").alias("c")
                    )
                    for r in range(depth)
                ]
            )
        ).alias("cell"),
    )
    return rows.groupBy(
        F.col("cell.r").alias("r"), F.col("cell.c").alias("c")
    ).agg(F.sum("cnt").alias("cnt"))


def cms_estimate(
    probes: DataFrame,
    key_col: str,
    cells: DataFrame,
    *,
    depth: int = 3,
    width: int = 512,
    est_col: str = "cms_est",
) -> DataFrame:
    """Attach the CMS point estimate (min over the d counters) to each
    probe row. The cell frame is at most d·w rows — broadcast it; the
    probe side never shuffles. Probes whose cells are absent (key never
    inserted) estimate 0 via the left-join coalesce."""
    k = F.col(key_col).cast("long")
    pos = probes.select(
        "*",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("r"), _pos(k, r, width).cast("long").alias("c")
                    )
                    for r in range(depth)
                ]
            )
        ).alias("cell"),
    ).select("*", F.col("cell.r").alias("r"), F.col("cell.c").alias("c")).drop("cell")
    joined = pos.join(F.broadcast(cells), ["r", "c"], "left")
    group_cols = [c for c in probes.columns]
    return (
        joined.groupBy(*group_cols)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias(est_col))
    )
