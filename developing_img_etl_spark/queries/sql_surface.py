"""SQL-string entry surface + iterative graph traversal.

Q20 exercises the `spark.sql(...)` path end-to-end over
`catalog.register_views` — the engine's second front door (the
reference's users write SQL against the catalog, SURVEY.md §2.11).

Q21 is the STAGE_DEPENDENCY transitive traversal that round 1 scoped
out (/root/reference/test.mmd:52-58, VERDICT r1 missing #3): the full
ancestor closure of the within-order precedence chain, computed as an
iterative frontier-join — Spark has no recursive CTE, so the loop IS
the Spark-native form. Each iteration joins the current frontier
(child, ancestor-so-far) back to the edge set; localCheckpoint between
iterations truncates the exponentially-growing lineage (the classic
iterative-algorithm trap on Spark). Depth is bounded by the longest
chain (max lines per order = 7), so the loop terminates when a frontier
comes back empty. The DuckDB oracle is the same closure via
WITH RECURSIVE — a full cross-engine check of an iterative algorithm.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load, register_views


# ---------------------------------------------------------------------------
# Q20 — the SQL front door: same relational semantics as q2's grouped
# agg, but entering through spark.sql over registered views.
# ---------------------------------------------------------------------------
Q20_TEXT = """
SELECT o_orderpriority,
       COUNT(*) AS n_orders,
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(12,4))), 2) AS DOUBLE) AS total_price
FROM orders
WHERE o_orderstatus = 'F'
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def q20_sql_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(Q20_TEXT)


Q20_SQL = Q20_TEXT  # dialect-shared: the same text runs on DuckDB


# ---------------------------------------------------------------------------
# Q21 — transitive dependency closure (iterative frontier join).
# Edges: within an order, line n+1 depends on line n (the q19 chain).
# Output: every (descendant, ancestor) pair with its path depth.
# ---------------------------------------------------------------------------
def q21_dependency_closure(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load(spark, sf_dir, "lineitem")
    edges = (
        lineitem.alias("c")
        .join(
            lineitem.alias("p"),
            (F.col("c.l_orderkey") == F.col("p.l_orderkey"))
            & (F.col("c.l_linenumber") == F.col("p.l_linenumber") + 1),
        )
        .select(
            F.col("c.l_orderkey").alias("orderkey"),
            F.col("c.l_linenumber").alias("child_line"),
            F.col("p.l_linenumber").alias("parent_line"),
        )
    )
    # frontier starts at the direct edges (depth 1); each round extends
    # every path by one ancestor hop
    edges = edges.localCheckpoint(eager=True)  # computed once, reused every round
    closure = edges.withColumn("depth", F.lit(1))
    frontier = closure
    while True:
        ext = (
            frontier.alias("f")
            .join(
                edges.alias("e"),
                (F.col("f.orderkey") == F.col("e.orderkey"))
                & (F.col("f.parent_line") == F.col("e.child_line")),
            )
            .select(
                F.col("f.orderkey").alias("orderkey"),
                F.col("f.child_line").alias("child_line"),
                F.col("e.parent_line").alias("parent_line"),
                (F.col("f.depth") + 1).alias("depth"),
            )
            .localCheckpoint(eager=True)  # truncate lineage per iteration
        )
        if ext.isEmpty():
            break
        closure = closure.unionByName(ext)
        frontier = ext
    return closure.orderBy("orderkey", "child_line", "parent_line")


Q21_SQL = """
WITH RECURSIVE edges AS (
  SELECT c.l_orderkey AS orderkey,
         c.l_linenumber AS child_line,
         p.l_linenumber AS parent_line
  FROM lineitem c
  JOIN lineitem p ON c.l_orderkey = p.l_orderkey
                 AND c.l_linenumber = p.l_linenumber + 1
), closure AS (
  SELECT orderkey, child_line, parent_line, 1 AS depth FROM edges
  UNION ALL
  SELECT cl.orderkey, cl.child_line, e.parent_line, cl.depth + 1
  FROM closure cl
  JOIN edges e ON cl.orderkey = e.orderkey AND cl.parent_line = e.child_line
)
SELECT orderkey, child_line, parent_line, depth
FROM closure
ORDER BY orderkey, child_line, parent_line
"""


QUERIES = {
    "q20_sql_entry": q20_sql_entry,
    "q21_dependency_closure": q21_dependency_closure,
}

ORACLES = {
    "q20_sql_entry": Q20_SQL,
    "q21_dependency_closure": Q21_SQL,
}
