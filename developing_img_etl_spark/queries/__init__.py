"""Declared correctness queries (SURVEY.md §2.11).

Each submodule exposes:
  QUERIES: dict[name, Callable[(SparkSession, sf_dir), DataFrame]]
  ORACLES: dict[name, str]  — DuckDB-runnable ANSI SQL mirror (omitted
           for non-SQL-expressible operators; driver then does a weaker
           rows-only check).

Determinism contract (SURVEY.md §1.2 FP-noise note): every aggregate
over doubles is computed through exact DECIMAL intermediates in BOTH
the Spark query and the oracle SQL, with a final cast to DOUBLE —
identical bit-for-bit results regardless of partitioning/accumulation
order. Every computed column carries the same alias on both sides.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from . import (
    behavior,
    classify,
    dedup,
    linkage,
    multimodal,
    relational,
    sampling,
    similarity,
    sketches,
    sql_surface,
    streaming_batch,
    text,
    training,
    udf_surface,
)

_MODULES = (
    relational,
    streaming_batch,
    text,
    similarity,
    dedup,
    multimodal,
    sql_surface,
    udf_surface,
    sampling,
    training,
    behavior,
    classify,
    sketches,
    linkage,
)


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in _MODULES:
        out.update(mod.QUERIES)
    return out


def all_oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    for mod in _MODULES:
        out.update(mod.ORACLES)
    return out
