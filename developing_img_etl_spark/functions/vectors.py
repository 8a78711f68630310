"""Vector math over ArrayType(FloatType) embedding columns.

Pure Catalyst higher-order functions (F.zip_with / F.aggregate) — the
whole dot product runs inside whole-stage codegen, no Python boundary.
Elements are widened to double BEFORE multiply/accumulate so the fold
is a plain left-to-right IEEE-double chain (reproducible, and matching
what a C loop over doubles computes).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))
