"""Deterministic training-shard writer (training-data mandate).

Trainers consume a corpus as N size-balanced shards whose contents are
REPRODUCIBLE — rebuilding the dataset must produce the same example in
the same shard in the same order, or data order (and therefore the
training run) silently changes. Spark's plain `repartition(n)` is
round-robin over whatever partition layout the input happened to have;
this writer derives the shard from a hash of a stable key and fixes
the intra-shard order:

    h = xxhash64(key, seed)                     (map-side, codegen'd)
    one shuffle: repartition(n_shards, h), order within shard by (h, key)

Spark places a row by murmur3(h) % n_shards — hashing the full 64-bit
h keeps shards balanced (bucketing h % n first and re-hashing the tiny
id space collides badly), and shard membership AND row order stay pure
functions of (key, seed), independent of input partitioning, cluster
size, or retries. Ordering by h doubles as the shuffle: consecutive
source rows scatter pseudo-randomly within and across shards, which is
what a trainer wants from a pre-shuffled dataset.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SHARD = "__shard"


def write_training_shards(
    df: DataFrame,
    path: str,
    *,
    n_shards: int,
    key_col: str,
    seed: int = 42,
    mode: str = "overwrite",
) -> None:
    """Write `df` as ~n_shards deterministic parquet shard files."""
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    out = (
        df.withColumn(_SHARD, F.xxhash64(F.col(key_col), F.lit(seed)))
        .repartition(n_shards, F.col(_SHARD))
        .sortWithinPartitions(_SHARD, key_col)
        .drop(_SHARD)
    )
    out.write.mode(mode).parquet(path)
