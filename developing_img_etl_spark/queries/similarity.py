"""Q13 family — similarity search over embeddings (SURVEY.md §2.8 M5).

Brute-force cosine top-k is the oracle-checkable baseline; the LSH /
IVF scale paths live in operators/similarity.py and are recall-checked
against this baseline (they are approximate — no value-hash oracle).

Cross-engine FP note: cosine values are computed as double folds on
both sides and rounded to 6dp BEFORE ranking, so a sub-ulp accumulation
difference can neither flip a rank nor the output value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load
from ..functions.vectors import dot, norm

N_PROBES = 10
TOP_K = 5


def q13_brute_force_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    # Norms are materialized per side BELOW the join (projections don't
    # collapse across a join), so each pair pays ONE interpreted
    # aggregate-fold (the dot) instead of three — HOFs aren't codegen'd,
    # the fold is the per-pair cost that dominates at scale.
    cand = emb.select("vec_id", "embedding", norm(F.col("embedding")).alias("nrm"))
    probes = cand.filter(F.col("vec_id") < N_PROBES).select(
        F.col("vec_id").alias("probe_id"),
        F.col("embedding").alias("probe_emb"),
        F.col("nrm").alias("probe_nrm"),
    )
    # Broadcast the tiny probe side; candidates stream map-side — no shuffle
    # of the big embedding table, scales linearly with candidate count.
    pairs = cand.crossJoin(F.broadcast(probes)).filter(F.col("vec_id") != F.col("probe_id"))
    sim = dot(F.col("probe_emb"), F.col("embedding")) / (F.col("probe_nrm") * F.col("nrm"))
    scored = pairs.select("probe_id", "vec_id", F.round(sim, 6).alias("sim"))
    w = Window.partitionBy("probe_id").orderBy(F.desc("sim"), "vec_id")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TOP_K)
        .select("probe_id", "vec_id", "sim", F.col("rk").cast("long").alias("rk"))
        .orderBy("probe_id", "rk")
    )


Q13_SQL = f"""
WITH p AS (
  SELECT vec_id AS probe_id, CAST(embedding AS DOUBLE[]) AS pe
  FROM embeddings WHERE vec_id < {N_PROBES}
),
s AS (
  SELECT p.probe_id, e.vec_id,
         round(list_cosine_similarity(p.pe, CAST(e.embedding AS DOUBLE[])), 6) AS sim
  FROM embeddings e CROSS JOIN p
  WHERE e.vec_id != p.probe_id
),
ranked AS (
  SELECT probe_id, vec_id, sim,
         row_number() OVER (PARTITION BY probe_id ORDER BY sim DESC, vec_id) AS rk
  FROM s
)
SELECT probe_id, vec_id, sim, CAST(rk AS BIGINT) AS rk
FROM ranked
WHERE rk <= {TOP_K}
ORDER BY probe_id, rk
"""


QUERIES = {"q13_brute_force_topk": q13_brute_force_topk}
ORACLES = {"q13_brute_force_topk": Q13_SQL}
