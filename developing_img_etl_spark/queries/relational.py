"""Relational core queries Q1-Q10 (SURVEY.md §2.11) with DuckDB oracles.

Covers operators P1-P5, F1-F15, A1-A6, O1-O4, J1-J6, W1-W5 from the
SURVEY.md §2 inventory. Reference citations are on each query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load
from ._det import DEC, davg, dec as _dec, dsum


# ---------------------------------------------------------------------------
# Q1 — pipeline shape: project/filter/normalize/concat-key + anti-join.
# Re-expresses the reference's incremental-dedup core (composite key build
# /root/reference/test.py:103-107, probe test.py:143-146, space→underscore
# normalization test.py:130,140) on the orders/lineitem tables: orders whose
# composite key has no "already processed" lineitem match.
# ---------------------------------------------------------------------------
def q1_incremental_antijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    lineitem = load(spark, sf_dir, "lineitem")
    pending = orders.select(
        F.col("o_orderkey").alias("orderkey"),
        F.concat_ws(
            "_",
            F.col("o_orderkey").cast("string"),
            F.translate(F.col("o_orderpriority"), " ", "_"),
        ).alias("composite_key"),
        F.col("o_totalprice"),
    ).filter(F.col("o_totalprice").isNotNull())
    processed = lineitem.filter(F.col("l_linenumber") == 1).select(
        F.col("l_orderkey").alias("orderkey")
    )
    return (
        pending.join(processed, "orderkey", "left_anti")
        .orderBy("orderkey")
        .select("orderkey", "composite_key", "o_totalprice")
    )


Q1_SQL = """
SELECT o_orderkey AS orderkey,
       concat_ws('_', CAST(o_orderkey AS VARCHAR), replace(o_orderpriority, ' ', '_')) AS composite_key,
       o_totalprice
FROM orders
WHERE o_totalprice IS NOT NULL
  AND o_orderkey NOT IN (SELECT l_orderkey FROM lineitem WHERE l_linenumber = 1)
ORDER BY orderkey
"""


# ---------------------------------------------------------------------------
# Q2 — TPC-H Q1-style grouped aggregation (A2/A3). The reference's catalog
# layout is a (kode_proyek, minggu) group-by over size_gambar_kb
# (/root/reference/test.py:186-193); this is the same shape on lineitem.
# ---------------------------------------------------------------------------
def q2_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    disc_price = _dec("l_extendedprice") * (F.lit(1).cast(DEC) - _dec("l_discount"))
    charge = disc_price * (F.lit(1).cast(DEC) + _dec("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum(disc_price).alias("sum_disc_price"),
            dsum(charge).alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


Q2_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(12,4))), 2) AS DOUBLE) AS sum_qty,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,4))), 2) AS DOUBLE) AS sum_base_price,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,4)) * (CAST(1 AS DECIMAL(12,4)) - CAST(l_discount AS DECIMAL(12,4)))), 2) AS DOUBLE) AS sum_disc_price,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,4)) * (CAST(1 AS DECIMAL(12,4)) - CAST(l_discount AS DECIMAL(12,4))) * (CAST(1 AS DECIMAL(12,4)) + CAST(l_tax AS DECIMAL(12,4)))), 2) AS DOUBLE) AS sum_charge,
       CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(12,4))), 2) AS DOUBLE) / COUNT(*) AS avg_qty,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,4))), 2) AS DOUBLE) / COUNT(*) AS avg_price,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


QUERIES = {
    "q1_incremental_antijoin": q1_incremental_antijoin,
    "q2_grouped_agg": q2_grouped_agg,
}

ORACLES = {
    "q1_incremental_antijoin": Q1_SQL,
    "q2_grouped_agg": Q2_SQL,
}
