"""Wide→long unpivot for PARALLEL column groups (SURVEY.md §2.10).

The reference hand-rolls this as a per-row loop over 8 (photo_url,
description) column pairs (/root/reference/test.py:128-134). Spark's
built-in DataFrame.unpivot melts a single measure; melting parallel
groups (url_1..8 ∥ desc_1..8 → one row per position with BOTH values)
is explode(array(struct...)) — pure Catalyst, one projection + one
generator, no shuffle, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def unpivot_groups(
    df: DataFrame,
    *,
    ids: list[str],
    groups: dict[str, list[str]],
    position_name: str = "pos",
) -> DataFrame:
    """Melt parallel column groups.

    ``groups`` maps output-column-name → ordered list of source columns;
    all lists must be equal length. Output: ids + position_name (1-based
    ordinal) + one column per group.

    >>> unpivot_groups(df, ids=["k"], groups={"url": ["f1","f2"],
    ...                                       "desc": ["d1","d2"]})
    """
    lengths = {len(v) for v in groups.values()}
    if len(lengths) != 1:
        raise ValueError(f"group column lists must be equal length, got {lengths}")
    n = lengths.pop()

    structs = [
        F.struct(
            F.lit(i + 1).alias(position_name),
            *[F.col(cols[i]).alias(out) for out, cols in groups.items()],
        )
        for i in range(n)
    ]
    exploded = df.select(*ids, F.explode(F.array(*structs)).alias("__g"))
    return exploded.select(
        *ids,
        F.col(f"__g.{position_name}").alias(position_name),
        *[F.col(f"__g.{out}").alias(out) for out in groups],
    )
