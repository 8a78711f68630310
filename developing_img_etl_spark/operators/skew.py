"""Skew mitigation (SCALE.md / training-data mandate: "skewed keys →
salting or AQE skew-join").

AQE's skew-join splitter handles sort-merge joins automatically; the
manual salt remains necessary when (a) AQE is off or the join is not
SMJ, or (b) the skew is in a groupBy whose aggregate is NOT algebraic
(e.g. collect_list/exact distinct per key), where map-side partial
aggregation can't flatten the hot key.

`salted_join` replicates the dim side `n_salts` times and scatters the
fact side uniformly across the replicas: the hot key's rows land on
`n_salts` different reducers instead of one. Join results are
row-identical to the unsalted join (salt is an internal column,
dropped) — verified by test against the plain join on a skewed fixture.

Cost model: dim side grows n_salts×, so keep n_salts × |dim| well under
the shuffle partition budget; facts pay one extra codegen'd column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def _content_salt(cols: list[str], n_salts: int, seed: int):
    """Retry-deterministic salt: a pure function of the row's column
    values (xxhash64 + seed), independent of partitioning, task id, or
    evaluation order — unlike F.rand, which is per-partition-seeded and
    can change across a stage retry."""
    return F.pmod(
        F.xxhash64(*[F.col(c) for c in cols], F.lit(seed)), F.lit(n_salts)
    ).cast("int")


def salted_join(
    facts: DataFrame,
    dim: DataFrame,
    on: list[str],
    *,
    how: str = "inner",
    n_salts: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Equi-join robust to fact-side key skew: facts get a salt in
    [0, n_salts); the dim side is exploded over the full salt range;
    the join runs on (on + salt). Output columns == unsalted join.

    The salt is CONTENT-DERIVED (xxhash64 of every fact column + seed),
    not F.rand: a task retry after an upstream repartition recomputes
    the identical salt for every row, so the operator is deterministic
    under speculative execution and stage re-runs. Identical rows share
    a salt — hot keys in practice carry varying payloads, which is what
    spreads them; a key whose rows are fully identical is better served
    by pre-aggregation than salting.

    Only 'inner' and 'left' are row-identical to the unsalted join:
    with right/full outer, each unmatched dim row would surface once
    per salt replica, so those modes are rejected.
    """
    if how not in ("inner", "left", "leftouter", "left_outer"):
        raise ValueError(
            f"salted_join supports how='inner'/'left' only (got {how!r}): "
            "outer dim rows would be duplicated once per salt replica"
        )
    f = facts.withColumn(_SALT, _content_salt(facts.columns, n_salts, seed))
    d = dim.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<int>"))
    )
    return f.join(d, [*on, _SALT], how).drop(_SALT)


def salted_distinct_count(
    df: DataFrame,
    group_col: str,
    value_col: str,
    *,
    n_salts: int = 16,
) -> DataFrame:
    """Exact count-distinct per group under group skew: phase 1 groups
    on (group, salt-of-value) — the hot group's values spread across
    n_salts reducers and are deduped locally — phase 2 sums the partial
    distinct counts. Salting by value hash keeps equal values in the
    same partial (no double counting)."""
    salted = df.withColumn(
        _SALT, F.pmod(F.xxhash64(F.col(value_col)), F.lit(n_salts)).cast("int")
    )
    partial = salted.groupBy(group_col, _SALT).agg(
        F.count_distinct(F.col(value_col)).alias("__part")
    )
    return partial.groupBy(group_col).agg(
        F.sum("__part").cast("long").alias("n_distinct")
    )
