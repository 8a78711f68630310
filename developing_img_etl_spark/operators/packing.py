"""Deterministic sequence packing (training-data mandate, M15).

LLM trainers consume fixed-token-budget sequences; packing many short
documents into one sequence ("example packing") is the standard way to
avoid padding waste. At 100 TB the assignment must be REPRODUCIBLE —
the same document lands in the same pack on every run, retry, and
cluster size — and cannot funnel through a single global sort.

Contract (documents are never split):

1. Rows are ordered by a pure hash of their key (ties broken by the
   key itself) — a deterministic global shuffle of the corpus.
2. The hash also routes each row to one of ``n_groups`` independent
   streams; packing happens per stream, so parallelism is ``n_groups``
   regardless of corpus size.
3. Within a stream, a row's pack index is
   ``exclusive_prefix_tokens DIV budget``: packs are contiguous runs
   of the hash order. A pack may overflow ``budget`` by at most one
   row's tokens (the straddling row is charged to the pack its prefix
   starts in); every pack except a stream's last is full to >= budget
   minus that row. This is the concat-then-chunk packing used by most
   training stacks, with document boundaries respected.

Scale shape: one shuffle (hash-partition into groups) + one windowed
prefix sum per group. Each group's window is a single sorted run —
size a group at ~(cores × a few GB of tokens); 10k groups over 100 TB
keeps every run ~10 GB and the whole pass embarrassingly parallel.
The declared query (q33) passes a portable multiplicative hash via
``bucket`` so the DuckDB oracle mirrors the arithmetic bit-for-bit;
production callers leave it None for xxhash64.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    key_col: str,
    token_col: str,
    budget: int,
    *,
    n_groups: int = 64,
    seed: int = 42,
    bucket: Column | None = None,
) -> DataFrame:
    """Append ``pack_group`` / ``pack_id`` / ``pack_pos`` columns
    assigning every row to a training sequence under ``budget`` tokens
    (see module contract). ``pack_pos`` is the row's 0-based position
    in its group's hash order; packs are contiguous runs of that order,
    so sorting a pack's rows by ``pack_pos`` reproduces the exact
    concatenation layout — a writer can materialize byte-identical
    shards with no further shuffle (one window pass, one exchange)."""
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    if n_groups <= 0:
        raise ValueError(f"n_groups must be positive, got {n_groups}")
    h = F.xxhash64(F.col(key_col), F.lit(seed)) if bucket is None else bucket
    with_h = df.withColumn("_pack_h", h).withColumn(
        "pack_group", F.pmod(F.col("_pack_h"), F.lit(n_groups)).cast("int")
    )
    w = Window.partitionBy("pack_group").orderBy("_pack_h", key_col)
    cum_excl = F.coalesce(
        F.sum(token_col).over(w.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0),
    )
    return (
        with_h.withColumn("_cum_excl", cum_excl)
        .withColumn("pack_id", F.expr(f"CAST(_cum_excl DIV {int(budget)} AS BIGINT)"))
        .withColumn(
            "pack_pos",
            (F.row_number().over(w) - F.lit(1)).cast("int"),
        )
        .drop("_pack_h", "_cum_excl")
    )
