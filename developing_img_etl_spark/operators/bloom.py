"""Distributed Bloom-filter semi-join reduction (the 100 TB join-
reduction primitive: kill fact rows that cannot match a filtered dim
BEFORE the shuffle).

The reference's membership test is a driver-side Python set
(`/root/reference/test.py:103-111`); at scale the set doesn't fit and
the exact semi-join shuffles the full fact table. The Bloom form:

  build:  one hash-agg over the dim keys → a packed bitmap as a tiny
          (word_idx, bits) frame of m/64 rows (``bit_or`` aggregate —
          distributed, no driver collect, no UDF)
  probe:  k broadcast equi-joins of the fact's k hash positions
          against the word frame + codegen bit tests — map-side only,
          ZERO fact shuffles; survivors (plus a bounded false-positive
          fraction) proceed to the exact join

Spark itself applies this trick inside joins when
``spark.sql.optimizer.runtime.bloomFilter.enabled`` is on; this
operator is the explicit, composable form (usable across stages, across
jobs, or serialized with a table as a pre-computed pruning index), with
a PORTABLE hash (bounded modular arithmetic, overflow-free in any
engine) so an external system — or the DuckDB oracle — can reproduce
the bitmap bit-for-bit.

Sizing: false-positive rate ≈ (1 - e^(-k·n/m))^k; memory is m/64 longs
broadcast once. m is a power of two so ``% m`` composes with the prime
modulus without bias worth caring about here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# bounded modular hash family: all constants < 2^31, (key % P) * K < 2^62.
# Kirsch-Mitzenmacher double hashing (pos_i = h1 + i*h2, both key-
# dependent) — a constant per-i offset of ONE base hash would correlate
# the k positions and collapse the filter to k=1 effectiveness.
P = 2_147_483_647  # 2^31 - 1 (prime)
K1 = 1_103_515_245
S1 = 12_345
K2 = 69_069
S2 = 362_437


def _pos(key, i: int, m_bits: int):
    """Portable hash position i for a non-negative integer key column."""
    h1 = ((key % P) * K1 + S1) % P
    h2 = ((key % P) * K2 + S2) % P
    return (h1 + i * h2) % P % m_bits


def bloom_build(
    keys: DataFrame, key_col: str, *, m_bits: int = 256, k_hashes: int = 2
) -> DataFrame:
    """Pack the dim keys' hash positions into a (w, bits) word frame.
    One explode (k rows per key) + one hash agg; m_bits/64 output rows."""
    k = F.col(key_col).cast("long")
    pos = keys.select(
        F.explode(
            F.array(*[_pos(k, i, m_bits).cast("long") for i in range(k_hashes)])
        ).alias("pos")
    )
    words = pos.select(
        (F.col("pos") / 64).cast("long").alias("w"),
        # shiftleft's amount must be a column here → SQL expression form
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))").alias("bit"),
    )
    return words.groupBy("w").agg(F.expr("bit_or(bit)").alias("bits"))


def bloom_might_contain(
    fact: DataFrame,
    key_col: str,
    words: DataFrame,
    *,
    m_bits: int = 256,
    k_hashes: int = 2,
    flag_col: str = "bloom_pass",
) -> DataFrame:
    """Append a might-contain flag: k broadcast joins + bit tests,
    map-side only (the fact table never shuffles)."""
    out = fact
    k = F.col(key_col).cast("long")
    flag = F.lit(True)
    temp = []
    for i in range(k_hashes):
        pcol, wcol, bcol = f"__bp{i}", f"__bw{i}", f"__bb{i}"
        temp += [pcol, wcol, bcol]
        out = (
            out.withColumn(pcol, _pos(k, i, m_bits).cast("long"))
            .withColumn(wcol, (F.col(pcol) / 64).cast("long"))
            .join(
                F.broadcast(
                    words.select(F.col("w").alias(wcol), F.col("bits").alias(bcol))
                ),
                wcol,
                "left",
            )
        )
        bit = F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST({pcol} % 64 AS INT))")
        flag = flag & F.coalesce(F.col(bcol).bitwiseAND(bit) != 0, F.lit(False))
    return out.withColumn(flag_col, flag).drop(*temp)
