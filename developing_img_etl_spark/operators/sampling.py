"""Deterministic sampling & splitting (training-data mandate).

A training pipeline samples constantly — per-source mixing weights,
train/validation/test splits, decontamination holdouts — and at 100 TB
the sample must be REPRODUCIBLE: the same row lands in the same split
on every run, every retry, every cluster size. Spark's df.sample() is
none of those things (per-partition RNG: a task retry or repartition
changes the sample). Everything here derives membership from a hash of
a stable row KEY + seed — a pure, codegen'd function of row content:

  hash_sample        Bernoulli-by-key at a global rate
  stratified_sample  per-stratum rates (data mixing weights)
  train_test_split   disjoint, exhaustive labeled split

Scale shape: one xxhash64 + compare per row, fully map-side, no
shuffle, pushes through scans untouched. The declared query (q26) uses
a portable multiplicative hash instead of xxhash64 only because the
DuckDB oracle must reproduce the arithmetic bit-for-bit — xxhash64 is
the production path and is pinned by determinism/rate pytest instead.
"""

from __future__ import annotations

from typing import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BUCKETS = 1_000_000  # rate granularity: 1e-6


def _key_bucket(key_col: str, seed: int) -> Column:
    """Uniform bucket in [0, 1e6) as a pure function of (key, seed)."""
    return F.pmod(F.xxhash64(F.col(key_col), F.lit(seed)), F.lit(_BUCKETS))


def hash_sample(
    df: DataFrame, key_col: str, rate: float, *, seed: int = 42, bucket: Column | None = None
) -> DataFrame:
    """Keep ~rate of rows, chosen deterministically by key hash. The
    same key is kept (or not) forever for a given seed — stable across
    runs, retries, and partitioning, and consistent across TABLES that
    share the key (sampling documents and their embeddings with the
    same key/seed keeps them aligned). `bucket` overrides the hash
    column (all three operators accept it) — used by the declared query
    to substitute an oracle-portable hash; production callers leave it
    None for xxhash64."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    b = _key_bucket(key_col, seed) if bucket is None else bucket
    # round, not truncate: 0.3 * 1e6 is 299999.99999999994 in binary —
    # int() would silently shave one bucket off the documented rate
    return df.filter(b < int(round(rate * _BUCKETS)))


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    rates: Mapping[str, float],
    *,
    key_col: str,
    default_rate: float = 0.0,
    seed: int = 42,
    bucket: Column | None = None,
) -> DataFrame:
    """Per-stratum deterministic sampling — the data-mixing primitive
    (e.g. keep 100% of wiki, 30% of web, 5% of crawl). Unknown strata
    fall back to default_rate."""
    for s, r in rates.items():
        if not 0.0 <= r <= 1.0:
            raise ValueError(f"rate for {s!r} must be in [0, 1], got {r}")
    if not 0.0 <= default_rate <= 1.0:
        raise ValueError(f"default_rate must be in [0, 1], got {default_rate}")
    threshold = F.lit(int(round(default_rate * _BUCKETS)))
    for s, r in rates.items():
        threshold = F.when(F.col(strata_col) == s, int(round(r * _BUCKETS))).otherwise(
            threshold
        )
    b = _key_bucket(key_col, seed) if bucket is None else bucket
    return df.filter(b < threshold)


def train_test_split(
    df: DataFrame,
    key_col: str,
    *,
    test_frac: float = 0.1,
    val_frac: float = 0.0,
    seed: int = 42,
    out_col: str = "split",
    bucket: Column | None = None,
) -> DataFrame:
    """Label every row 'test' / 'val' / 'train' — disjoint, exhaustive,
    and stable: a key's split never changes for a given seed, so later
    incremental batches land consistently and leakage is structural,
    not probabilistic."""
    if test_frac < 0.0 or val_frac < 0.0 or test_frac + val_frac > 1.0:
        raise ValueError(
            f"fractions must be >= 0 and sum <= 1, got test={test_frac} val={val_frac}"
        )
    b = _key_bucket(key_col, seed) if bucket is None else bucket
    test_hi = int(round(test_frac * _BUCKETS))
    val_hi = test_hi + int(round(val_frac * _BUCKETS))
    return df.withColumn(
        out_col,
        F.when(b < test_hi, F.lit("test"))
        .when(b < val_hi, F.lit("val"))
        .otherwise(F.lit("train")),
    )


def weighted_sample(
    df: DataFrame,
    key_col: str,
    weight_col: str | Column,
    *,
    seed: int = 42,
    bucket: Column | None = None,
) -> DataFrame:
    """Per-ROW keep probability from a column (clamped to [0, 1]) —
    quality- or length-proportional mixing, still deterministic by key:
    the same row keeps or drops identically across runs, retries, and
    partitionings. Threshold is floor(weight · 1e6) compared against
    the key bucket, all codegen; `bucket` override as elsewhere."""
    w = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    b = _key_bucket(key_col, seed) if bucket is None else bucket
    thresh = F.floor(
        F.least(F.greatest(w, F.lit(0.0)), F.lit(1.0)) * F.lit(_BUCKETS)
    ).cast("long")
    return df.filter(b < thresh)


def weighted_topk_sample(
    df: DataFrame,
    key_col: str,
    weight_col: str | Column,
    k: int,
    *,
    seed: int = 42,
    max_weight: int = 64,
    rank_out: str | None = None,
    draw: "callable | None" = None,
) -> DataFrame:
    """EXACTLY-k GLOBAL weighted sample without replacement — the
    integer-exact realization of Efraimidis-Spirakis A-ES for integer
    weights: give each row w independent hash draws and rank it by the
    MINIMUM draw. For two rows the pairwise selection probability is
    P(min of w1 uniforms < min of w2 uniforms) = w1/(w1+w2) — exactly
    A-ES's u^(1/w) key order in distribution — but entirely in integer
    arithmetic, so no pow/log FP noise and the same rows win on every
    engine, run, retry, and partitioning.

    Completes the sampling matrix: uniform fraction (hash_sample),
    weighted fraction (weighted_sample), exactly-k per group
    (group_topk_sample), exactly-k weighted global (here).

    Weights are clamped to [1, max_weight] integers (a row always has
    at least one draw; max_weight bounds the per-row work). `draw`, if
    given, is a (key_column, draw_index) -> Column override used by the
    declared query to substitute an oracle-portable hash; production
    leaves it None for xxhash64.

    Scale shape: ZERO shuffles — the w draws live in a per-row array
    (transform + array_min, w is a small constant, never exploded), and
    the global top-k is orderBy().limit(), which Spark executes as
    TakeOrdered: per-partition partial top-k, driver merges k rows.
    At 100 TB this moves k rows per partition, nothing else."""
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    if max_weight <= 0:
        raise ValueError(f"max_weight must be positive, got {max_weight}")
    w_raw = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    # coalesce BEFORE the clamp: a NULL weight would otherwise yield a
    # NULL rank key, and NULLS-FIRST ordering would hand every
    # null-weight row a guaranteed spot in the sample
    w = F.least(F.greatest(F.coalesce(w_raw.cast("long"), F.lit(1)), F.lit(1)), F.lit(max_weight))
    if draw is None:
        draw = lambda key, i: F.xxhash64(key, i, F.lit(seed))  # noqa: E731
    rank_key = F.array_min(F.transform(F.sequence(F.lit(1), w), lambda i: draw(F.col(key_col), i)))
    out = df.withColumn(rank_out or "__wrk", rank_key)
    out = out.orderBy(F.col(rank_out or "__wrk").asc(), F.col(key_col).asc()).limit(k)
    return out if rank_out else out.drop("__wrk")


def group_topk_sample(
    df: DataFrame,
    group_col: str,
    key_col: str,
    k: int,
    *,
    seed: int = 42,
    bucket: Column | None = None,
) -> DataFrame:
    """EXACTLY-k-per-group deterministic sample (the distributed,
    reproducible stand-in for per-group reservoir sampling): rank rows
    within each group by (key-hash, key) and keep the k smallest.

    Bernoulli sampling (hash_sample) gives a BINOMIAL group size —
    fine for mixing rates, wrong when the contract is "exactly k docs
    per source" (eval subsets, per-domain probes, balanced holdouts).
    A classic reservoir is sequential by nature; ranking by a uniform
    key hash draws the same uniform-without-replacement sample with no
    sequential state, the same rows on every run/retry/partitioning.

    Scale shape: ONE shuffle on the group key, partial top-k map-side
    (Spark's window TopK pushes the k-filter into the sort); no global
    sort, no driver state. The key tiebreak makes rank total even on
    hash collisions."""
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    from pyspark.sql import Window

    # rank by the FULL 64-bit hash, not the 1e6-bucket quantization: at
    # ~1e8 rows/group every bucket holds ~100 colliders and the key-
    # ascending tiebreak would bias the sample toward small keys. The
    # `bucket` override (oracle-portable hash) ranks by whatever the
    # caller supplies — the oracle mirrors that same expression.
    b = F.xxhash64(F.col(key_col), F.lit(seed)) if bucket is None else bucket
    w = Window.partitionBy(group_col).orderBy(b.asc(), F.col(key_col).asc())
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= k)
        .drop("__rk")
    )
