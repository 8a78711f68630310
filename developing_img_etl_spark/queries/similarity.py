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


# ---------------------------------------------------------------------------
# Q31 — embedding-cosine near-dup PAIRS, exact tier (training-data
# mandate: drop re-encoded copies of the same content). The synthetic
# corpus is near-isotropic (no natural pair above cosine 0.7), so
# duplicates are PLANTED: every 10th vector re-appears under a new id —
# the query must find exactly those pairs at threshold 0.99.
#
# Blocking key = label (the corpus's partition column); within each
# block one numpy Gram matrix per group via applyInPandas — vectorized,
# Arrow-batched, no per-row Python. This is the exact/oracle tier: the
# sub-quadratic scale path over an UNBLOCKED corpus is
# operators/similarity.py::cosine_near_dup_pairs (sketch-bucketed,
# recall-checked), same contract as q13 ↔ m6/m9.
#
# Cross-engine FP: cosines are rounded to 6dp half-away-from-zero on
# BOTH sides before the threshold compare; the data's closest approach
# to a rounding boundary is ~1e-13 (measured), 1000x the worst
# summation-order divergence between numpy matmul and DuckDB's fold.
# ---------------------------------------------------------------------------
NEAR_DUP_THRESHOLD = 0.99
PLANT_EVERY = 10
PLANT_OFFSET = 1_000_000


def q31_cosine_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd

    emb = load(spark, sf_dir, "embeddings")
    planted = emb.filter(F.col("vec_id") % PLANT_EVERY == 0).withColumn(
        "vec_id", F.col("vec_id") + F.lit(PLANT_OFFSET)
    )
    corpus = emb.unionByName(planted).select("vec_id", "embedding", "label")

    def block(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("vec_id", ignore_index=True)
        ids = pdf["vec_id"].to_numpy()
        x = np.array(pdf["embedding"].tolist(), dtype=np.float64)
        n = np.linalg.norm(x, axis=1)
        # STRIP-CHUNKED matmul: the similarity matrix is computed in
        # (chunk x n) strips, never materialized whole — a label block
        # of 22k vectors at sf10 would otherwise be a 3.9 GB dense
        # matrix PER TASK (measured: the full x @ x.T OOM-killed the
        # 48g JVM at sf10). Work stays O(n^2) — this is the declared
        # exact brute-force baseline; m6/m9/q96 are the sub-quadratic
        # tiers — but memory is bounded by the strip.
        chunk = 2048
        cols: dict[str, list] = {"id_a": [], "id_b": [], "cosine": []}
        for lo in range(0, len(ids), chunk):
            hi = min(lo + chunk, len(ids))
            s = (x[lo:hi] @ x.T) / np.outer(n[lo:hi], n)
            # half-away-from-zero 6dp, matching F.round / DuckDB ROUND
            # (np.round is banker's and can flip ties)
            r = np.sign(s) * np.floor(np.abs(s) * 1e6 + 0.5) / 1e6
            for k in range(hi - lo):
                i = lo + k
                row = r[k, i + 1 :]
                sel = np.nonzero(row >= NEAR_DUP_THRESHOLD)[0]
                if sel.size:
                    cols["id_a"].extend([ids[i]] * sel.size)
                    cols["id_b"].extend(ids[i + 1 + sel])
                    cols["cosine"].extend(row[sel])
        return pd.DataFrame(cols, columns=["id_a", "id_b", "cosine"]).astype(
            {"id_a": "int64", "id_b": "int64", "cosine": "float64"}
        )

    return (
        # pin before the global sort (r12): the range sampler would
        # otherwise re-run the O(n^2) per-label matmul a second time
        corpus.groupBy("label")
        .applyInPandas(block, "id_a long, id_b long, cosine double")
        .localCheckpoint(eager=False)
        .orderBy("id_a", "id_b")
    )


Q31_SQL = f"""
WITH corpus AS (
  SELECT vec_id, embedding, label FROM embeddings
  UNION ALL
  SELECT vec_id + {PLANT_OFFSET} AS vec_id, embedding, label
  FROM embeddings WHERE vec_id % {PLANT_EVERY} = 0
),
scored AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                      CAST(b.embedding AS DOUBLE[])), 6) AS cosine
  FROM corpus a JOIN corpus b ON a.label = b.label AND a.vec_id < b.vec_id
)
SELECT id_a, id_b, cosine
FROM scored
WHERE cosine >= {NEAR_DUP_THRESHOLD}
ORDER BY id_a, id_b
"""


QUERIES = {
    "q13_brute_force_topk": q13_brute_force_topk,
    "q31_cosine_near_dups": q31_cosine_near_dups,
}
ORACLES = {
    "q13_brute_force_topk": Q13_SQL,
    "q31_cosine_near_dups": Q31_SQL,
}


# ---------------------------------------------------------------------------
# Q56 — embedding column statistics (F-suite over array<float>): per
# label, vector count, average L2 norm, and the norm of the label
# CENTROID — the basic health check a training pipeline runs before
# trusting an embedding table (collapsed labels show up as centroid
# norms near the average vector norm; isotropic ones near zero).
#
# Cross-engine FP discipline (same rules as q13/_det):
#   - per-vector norms are double folds rounded to 6dp, then averaged
#     through an exact DECIMAL sum;
#   - per-dimension centroid sums accumulate as DECIMAL(20,10) (order-
#     independent, engine-exact), are rounded to a double ONCE, squared
#     (deterministic per row), and re-summed through DECIMAL — so no
#     float aggregation ever depends on row order.
# ---------------------------------------------------------------------------
def q56_embedding_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    norms = emb.select(
        "label", F.round(norm(F.col("embedding")), 6).alias("nrm")
    )
    per_label = norms.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        (
            F.round(F.sum(F.col("nrm").cast("decimal(16,6)")), 6).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_norm"),
    )
    comps = emb.select(
        "label", F.posexplode("embedding").alias("pos", "x")
    )
    spos = comps.groupBy("label", "pos").agg(
        F.round(F.sum(F.col("x").cast("decimal(20,10)")), 6).cast("double").alias("s")
    )
    sq = spos.groupBy("label").agg(
        F.round(
            F.sum(F.round(F.col("s") * F.col("s"), 6).cast("decimal(24,6)")), 6
        )
        .cast("double")
        .alias("ss")
    )
    return (
        per_label.join(sq, "label")
        .select(
            "label",
            "n_vecs",
            F.round("avg_norm", 6).alias("avg_norm"),
            F.round(
                F.sqrt(F.col("ss") / (F.col("n_vecs") * F.col("n_vecs"))), 6
            ).alias("centroid_norm"),
        )
        .orderBy("label")
    )


Q56_SQL = """
WITH base AS (
  SELECT label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
),
norms AS (
  SELECT label,
         round(sqrt(list_sum(list_transform(e, x -> x * x))), 6) AS nrm
  FROM base
),
per_label AS (
  SELECT label, COUNT(*) AS n_vecs,
         CAST(ROUND(SUM(CAST(nrm AS DECIMAL(16,6))), 6) AS DOUBLE) / COUNT(*) AS avg_norm
  FROM norms GROUP BY label
),
comps AS (
  SELECT label, r.i AS pos, CAST(e[r.i] AS DECIMAL(20,10)) AS x
  FROM base, UNNEST(range(1, len(e) + 1)) AS r(i)
),
spos AS (
  SELECT label, pos, CAST(ROUND(SUM(x), 6) AS DOUBLE) AS s
  FROM comps GROUP BY label, pos
),
sq AS (
  SELECT label,
         CAST(ROUND(SUM(CAST(round(s * s, 6) AS DECIMAL(24,6))), 6) AS DOUBLE) AS ss
  FROM spos GROUP BY label
)
SELECT p.label, p.n_vecs,
       round(p.avg_norm, 6) AS avg_norm,
       round(sqrt(sq.ss / (p.n_vecs * p.n_vecs)), 6) AS centroid_norm
FROM per_label p JOIN sq ON p.label = sq.label
ORDER BY p.label
"""

QUERIES["q56_embedding_stats"] = q56_embedding_stats
ORACLES["q56_embedding_stats"] = Q56_SQL


# ---------------------------------------------------------------------------
# Q68 — contrastive triplet mining (training-data mandate: contrastive
# /embedding-model training consumes (anchor, positive, negative)
# triplets). Positive = exact nearest neighbor (the Q13 arithmetic both
# engines already agree on); negative = a DETERMINISTIC hash-pick from
# the corpus (uniform "random" negative that is reproducible across
# runs/retries — the same discipline as operators/sampling.py), with a
# collision-skip chain if the pick lands on the anchor or the positive.
# The corpus size feeds the modulus via a 1-row aggregate broadcast
# (the q45-q49 scalar pattern, structurally verified by the plan
# audit). Emits both similarities so a margin (pos_sim - neg_sim)
# regression anywhere hash-mismatches.
# ---------------------------------------------------------------------------
_TRIPLET_K = 2_654_435_761
_TRIPLET_SEED = 13


def q68_contrastive_triplets(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    emb = load(spark, sf_dir, "embeddings")
    # norms materialized per side BELOW the cross join (q13 discipline:
    # HOF folds aren't codegen'd — each pair must pay ONE fold, the dot,
    # not three)
    base = emb.select("vec_id", "embedding", norm(F.col("embedding")).alias("nrm"))
    anchors = base.filter(F.col("vec_id") < N_PROBES).select(
        F.col("vec_id").alias("anchor_id"),
        F.col("embedding").alias("ae"),
        F.col("nrm").alias("anrm"),
    )
    # positive: exact top-1 by cosine (q13 arithmetic)
    scored = base.crossJoin(F.broadcast(anchors)).filter(
        F.col("vec_id") != F.col("anchor_id")
    )
    sim = F.round(
        dot(F.col("ae"), F.col("embedding")) / (F.col("anrm") * F.col("nrm")), 6
    )
    w = Window.partitionBy("anchor_id").orderBy(F.desc("sim"), "vec_id")
    pos = (
        scored.select("anchor_id", "vec_id", sim.alias("sim"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("anchor_id", F.col("vec_id").alias("pos_id"), F.col("sim").alias("pos_sim"))
    )
    n_df = emb.agg(F.count(F.lit(1)).alias("__n"))
    cand = F.pmod(F.col("anchor_id") * _TRIPLET_K + _TRIPLET_SEED, F.col("__n"))
    picked = (
        pos.crossJoin(F.broadcast(n_df))
        .withColumn("c0", cand)
        .withColumn("c1", F.pmod(F.col("c0") + 1, F.col("__n")))
        .withColumn("c2", F.pmod(F.col("c0") + 2, F.col("__n")))
    )
    picked = picked.withColumn(
        "neg_id",
        F.when(
            (F.col("c0") != F.col("anchor_id")) & (F.col("c0") != F.col("pos_id")),
            F.col("c0"),
        )
        .when(
            (F.col("c1") != F.col("anchor_id")) & (F.col("c1") != F.col("pos_id")),
            F.col("c1"),
        )
        .otherwise(F.col("c2")),
    ).select("anchor_id", "pos_id", "pos_sim", "neg_id")
    neg_emb = base.select(
        F.col("vec_id").alias("neg_id"),
        F.col("embedding").alias("ne"),
        F.col("nrm").alias("nnrm"),
    )
    out = (
        picked.join(neg_emb, "neg_id")
        .join(F.broadcast(anchors), "anchor_id")
        .select(
            "anchor_id",
            "pos_id",
            "pos_sim",
            "neg_id",
            F.round(
                dot(F.col("ae"), F.col("ne")) / (F.col("anrm") * F.col("nnrm")), 6
            ).alias("neg_sim"),
        )
    )
    return out.withColumn(
        "margin", F.round(F.col("pos_sim") - F.col("neg_sim"), 6)
    ).orderBy("anchor_id")


Q68_SQL = f"""
WITH n AS (SELECT COUNT(*) AS nn FROM embeddings),
a AS (
  SELECT vec_id AS anchor_id, CAST(embedding AS DOUBLE[]) AS ae
  FROM embeddings WHERE vec_id < {N_PROBES}
),
s AS (
  SELECT a.anchor_id, e.vec_id,
         round(list_cosine_similarity(a.ae, CAST(e.embedding AS DOUBLE[])), 6) AS sim
  FROM embeddings e CROSS JOIN a
  WHERE e.vec_id != a.anchor_id
),
pos AS (
  SELECT anchor_id, vec_id AS pos_id, sim AS pos_sim
  FROM (SELECT *, row_number() OVER (PARTITION BY anchor_id ORDER BY sim DESC, vec_id) AS rk FROM s)
  WHERE rk = 1
),
picked AS (
  SELECT anchor_id, pos_id, pos_sim,
         (anchor_id * {_TRIPLET_K} + {_TRIPLET_SEED}) % nn AS c0,
         ((anchor_id * {_TRIPLET_K} + {_TRIPLET_SEED}) % nn + 1) % nn AS c1,
         ((anchor_id * {_TRIPLET_K} + {_TRIPLET_SEED}) % nn + 2) % nn AS c2
  FROM pos CROSS JOIN n
),
trip AS (
  SELECT anchor_id, pos_id, pos_sim,
         CASE WHEN c0 <> anchor_id AND c0 <> pos_id THEN c0
              WHEN c1 <> anchor_id AND c1 <> pos_id THEN c1
              ELSE c2 END AS neg_id
  FROM picked
)
SELECT t.anchor_id, t.pos_id, t.pos_sim, t.neg_id,
       round(list_cosine_similarity(a.ae, CAST(e.embedding AS DOUBLE[])), 6) AS neg_sim,
       round(t.pos_sim - round(list_cosine_similarity(a.ae, CAST(e.embedding AS DOUBLE[])), 6), 6) AS margin
FROM trip t
JOIN embeddings e ON e.vec_id = t.neg_id
JOIN a ON a.anchor_id = t.anchor_id
ORDER BY t.anchor_id
"""

QUERIES["q68_contrastive_triplets"] = q68_contrastive_triplets
ORACLES["q68_contrastive_triplets"] = Q68_SQL


# ---------------------------------------------------------------------------
# Q93 — RRF hybrid retrieval (the RAG-stack fusion step): lexical and
# vector rankings combined by Reciprocal Rank Fusion
# (Cormack/Clarke/Büttcher SIGIR'09) — score = Σ 1/(k + rank), k = 60
# — realized in exact integers as 10⁹ DIV (60 + rank) so the fusion
# can never drift cross-engine. Lexical ranks: shared word-3-gram
# count between probe and candidate off the SHARED shingle inverted
# index (never all-pairs; candidates only where ≥1 shingle co-occurs).
# Vector ranks: q13's brute-force cosine arithmetic (round-6, ordered
# fold — the proven-deterministic tier) over the embedding universe.
# Candidates without a lexical match contribute only their vector
# term, the standard RRF missing-list convention. One broadcast of
# the 10-probe side in each leg; the only wide shuffles are the
# (probe, cand) aggregations — id-and-count rows, never text or
# vectors.
# ---------------------------------------------------------------------------
_RRF_K = 60
_RRF_TOP = 5



def _vector_ranking(emb: DataFrame) -> DataFrame:
    """Exact-cosine ranking of every candidate per probe — the dense
    leg shared by q93 (RRF fusion) and q110 (evaluation ground truth):
    (probe_id, doc_id, vec_rk). q13's broadcast-probe discipline."""
    cand = emb.select("vec_id", "embedding", norm(F.col("embedding")).alias("nrm"))
    probes = cand.filter(F.col("vec_id") < N_PROBES).select(
        F.col("vec_id").alias("probe_id"),
        F.col("embedding").alias("probe_emb"),
        F.col("nrm").alias("probe_nrm"),
    )
    sim = dot(F.col("probe_emb"), F.col("embedding")) / (
        F.col("probe_nrm") * F.col("nrm")
    )
    w_vec = Window.partitionBy("probe_id").orderBy(F.desc("sim"), "vec_id")
    return (
        cand.crossJoin(F.broadcast(probes))
        .filter(F.col("vec_id") != F.col("probe_id"))
        .select("probe_id", "vec_id", F.round(sim, 6).alias("sim"))
        .withColumn("vec_rk", F.row_number().over(w_vec))
        .select("probe_id", F.col("vec_id").alias("doc_id"), "vec_rk")
    )


def _lexical_ranking(spark: SparkSession, sf_dir: str, emb: DataFrame) -> DataFrame:
    """Shingle-overlap ranking per probe (the sparse leg of q93/q110):
    (probe_id, doc_id, lex_rk), restricted to the embedding universe,
    riding the shared persisted shingle index."""
    from ._shingle import shingle_index

    ids = emb.select(F.col("vec_id").alias("doc_id"))
    sh = shingle_index(spark, sf_dir).join(F.broadcast(ids), "doc_id", "leftsemi")
    a = sh.filter(F.col("doc_id") < N_PROBES).select(
        F.col("doc_id").alias("probe_id"), "s"
    )
    w_lex = Window.partitionBy("probe_id").orderBy(F.desc("n_shared"), "doc_id")
    return (
        a.join(sh.select("doc_id", "s"), "s")
        .filter(F.col("doc_id") != F.col("probe_id"))
        .groupBy("probe_id", "doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .withColumn("lex_rk", F.row_number().over(w_lex))
        .select("probe_id", "doc_id", "lex_rk")
    )


def q93_rrf_hybrid_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    vec_rk = _vector_ranking(emb)
    lex_rk = _lexical_ranking(spark, sf_dir, emb)

    fused = (
        vec_rk.join(lex_rk, ["probe_id", "doc_id"], "left")
        .withColumn(
            "rrf_score",
            F.expr(f"1000000000 DIV ({_RRF_K} + vec_rk)")
            + F.coalesce(
                F.expr(f"1000000000 DIV ({_RRF_K} + lex_rk)"), F.lit(0)
            ),
        )
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("probe_id").orderBy(F.desc("rrf_score"), "doc_id")
            ),
        )
        .filter(F.col("rk") <= _RRF_TOP)
    )
    return fused.select(
        "probe_id",
        "doc_id",
        "vec_rk",
        F.coalesce("lex_rk", F.lit(0)).alias("lex_rk"),
        "rrf_score",
        F.col("rk").cast("long").alias("rk"),
    ).orderBy("probe_id", "rk")


Q93_SQL = rf"""
WITH p AS (
  SELECT vec_id AS probe_id, CAST(embedding AS DOUBLE[]) AS pe
  FROM embeddings WHERE vec_id < {N_PROBES}
),
vecr AS (
  SELECT probe_id, vec_id AS doc_id,
         row_number() OVER (PARTITION BY probe_id
                            ORDER BY round(list_cosine_similarity(pe, CAST(e.embedding AS DOUBLE[])), 6) DESC,
                                     vec_id) AS vec_rk
  FROM embeddings e CROSS JOIN p
  WHERE e.vec_id != p.probe_id
),
toks AS (
  SELECT d.doc_id, string_split_regex(lower(d.text), '\s+') AS t
  FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
),
sh AS (
  SELECT doc_id, UNNEST(list_distinct(list_transform(range(1, greatest(len(t) - 1, 1)),
           i -> concat_ws(' ', t[i], t[i+1], t[i+2])))) AS s
  FROM toks WHERE len(t) >= 3
),
overlap AS (
  SELECT a.doc_id AS probe_id, b.doc_id, COUNT(*) AS n_shared
  FROM sh a JOIN sh b USING (s)
  WHERE a.doc_id < {N_PROBES} AND b.doc_id != a.doc_id
  GROUP BY 1, 2
),
lexr AS (
  SELECT probe_id, doc_id,
         row_number() OVER (PARTITION BY probe_id ORDER BY n_shared DESC, doc_id) AS lex_rk
  FROM overlap
),
fused AS (
  SELECT v.probe_id, v.doc_id, v.vec_rk, l.lex_rk,
         1000000000 // ({_RRF_K} + v.vec_rk)
           + COALESCE(1000000000 // ({_RRF_K} + l.lex_rk), 0) AS rrf_score
  FROM vecr v LEFT JOIN lexr l USING (probe_id, doc_id)
),
top AS (
  SELECT *, row_number() OVER (PARTITION BY probe_id ORDER BY rrf_score DESC, doc_id) AS rk
  FROM fused
)
SELECT probe_id, doc_id,
       CAST(vec_rk AS BIGINT) AS vec_rk,
       CAST(COALESCE(lex_rk, 0) AS BIGINT) AS lex_rk,
       CAST(rrf_score AS BIGINT) AS rrf_score,
       CAST(rk AS BIGINT) AS rk
FROM top
WHERE rk <= {_RRF_TOP}
ORDER BY probe_id, rk
"""

QUERIES["q93_rrf_hybrid_retrieval"] = q93_rrf_hybrid_retrieval
ORACLES["q93_rrf_hybrid_retrieval"] = Q93_SQL


# ---------------------------------------------------------------------------
# Q96 — SemDeDup-style semantic dedup (Abbas et al. 2023): the modern
# curation pipeline's EMBEDDING-cluster dedup — partition the corpus by
# nearest cluster center, then drop, within each cluster, every vector
# that has a more-senior (smaller-id) near-identical neighbor. q31
# finds cosine near-dup PAIRS blocked by an existing label; SemDeDup's
# defining step is that the blocking itself comes from the embedding
# geometry, so near-identical vectors land in the same cluster by
# construction and the pair search never crosses clusters.
#
# Determinism: cluster centers are K hash-picked MEDOIDS (actual corpus
# vectors, chosen by the portable md5-rank of their vec_id — the
# operators/sampling.py discipline), not floating-point k-means
# averages, so both engines derive the identical center set; every
# cosine is rounded to 6dp before any compare (the q13/q31 FP
# discipline). The planted duplicates (q31's corpus: every 10th vector
# re-appears under a new id) must each land in their original's cluster
# — identical vectors get identical similarity rows and the same
# argmax — and be dropped there; natural vectors survive (the corpus is
# near-isotropic, no natural pair reaches 0.99).
#
# Scale shape: medoids are a K-row broadcast (assignment is map-side —
# the q13 tiny-probe cross); the assignment window shuffles only
# (vec_id, medoid_id, sim) scalars; embeddings re-attach BY KEY for the
# within-cluster verify, one numpy Gram per cluster via applyInPandas
# (never an interpreted per-pair fold). Cluster count scales as
# corpus/cluster_size; the all-pairs stays inside clusters — the
# SemDeDup paper's own cost model.
# ---------------------------------------------------------------------------
_SEM_K = 8


def q96_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd

    from .classify import md5_prefix_int

    emb = load(spark, sf_dir, "embeddings")
    planted = emb.filter(F.col("vec_id") % PLANT_EVERY == 0).withColumn(
        "vec_id", F.col("vec_id") + F.lit(PLANT_OFFSET)
    )
    corpus = emb.unionByName(planted).select("vec_id", "embedding")

    medoids = (
        emb.select(
            "vec_id",
            "embedding",
            md5_prefix_int(F.col("vec_id").cast("string"), 8).alias("hk"),
        )
        .orderBy("hk", "vec_id")  # TakeOrdered — no global sort materializes
        .limit(_SEM_K)
        .select(
            F.col("vec_id").alias("medoid_id"),
            F.col("embedding").alias("m_emb"),
            norm(F.col("embedding")).alias("m_nrm"),
        )
    )
    cand = corpus.select("vec_id", "embedding", norm(F.col("embedding")).alias("nrm"))
    sim = dot(F.col("m_emb"), F.col("embedding")) / (F.col("m_nrm") * F.col("nrm"))
    assign = cand.crossJoin(F.broadcast(medoids)).select(
        "vec_id", "medoid_id", F.round(sim, 6).alias("sim")
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("sim"), "medoid_id")
    cluster = (
        assign.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("vec_id", F.col("medoid_id").alias("cluster_id"))
    )
    members = corpus.join(cluster, "vec_id")

    def drops(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("vec_id", ignore_index=True)
        ids = pdf["vec_id"].to_numpy()
        x = np.array(pdf["embedding"].tolist(), dtype=np.float64)
        n = np.linalg.norm(x, axis=1)
        # strip-chunked like q31: the full n x n similarity matrix PLUS
        # triu_indices (two n²/2 int64 arrays) is gigabytes per task
        # once clusters reach ~20k members (OOM-measured at sf10);
        # strips bound memory while the work stays the declared
        # exact-within-cluster O(n²)
        chunk = 2048
        hit = np.zeros(len(ids), dtype=bool)  # "has a smaller-id near-dup"
        for lo in range(0, len(ids), chunk):
            hi = min(lo + chunk, len(ids))
            s = (x[lo:hi] @ x.T) / np.outer(n[lo:hi], n)
            # half-away-from-zero 6dp (np.round is banker's — q31's rule)
            r = np.sign(s) * np.floor(np.abs(s) * 1e6 + 0.5) / 1e6
            for k in range(hi - lo):
                i = lo + k
                row = r[k, i + 1 :]
                hit[i + 1 :] |= row >= NEAR_DUP_THRESHOLD
        dropped = ids[hit]
        return pd.DataFrame(
            {
                "cluster_id": pdf["cluster_id"].iloc[:1].repeat(len(dropped)),
                "dropped_id": dropped,
            }
        )

    dropped = members.groupBy("cluster_id").applyInPandas(
        drops, "cluster_id long, dropped_id long"
    )
    stats = cluster.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("n_members"))
    agg = dropped.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("n_dropped"),
        F.sum("dropped_id").alias("dropped_id_sum"),
    )
    return (
        stats.join(agg, "cluster_id", "left")
        .select(
            "cluster_id",
            "n_members",
            F.coalesce("n_dropped", F.lit(0)).alias("n_dropped"),
            (F.col("n_members") - F.coalesce("n_dropped", F.lit(0))).alias("n_kept"),
            F.coalesce("dropped_id_sum", F.lit(0)).alias("dropped_id_sum"),
        )
        .orderBy("cluster_id")
    )


from .classify import sql_md5_prefix_int  # noqa: E402  (portable hash idiom)

Q96_SQL = f"""
WITH corpus AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
  UNION ALL
  SELECT vec_id + {PLANT_OFFSET} AS vec_id, CAST(embedding AS DOUBLE[]) AS e
  FROM embeddings WHERE vec_id % {PLANT_EVERY} = 0
),
med AS (
  SELECT vec_id AS medoid_id, CAST(embedding AS DOUBLE[]) AS m_emb
  FROM (
    SELECT vec_id, embedding, {sql_md5_prefix_int(8)} AS hk
    FROM (SELECT vec_id, embedding, md5(CAST(vec_id AS VARCHAR)) AS h FROM embeddings)
    ORDER BY hk, vec_id LIMIT {_SEM_K}
  )
),
assign AS (
  SELECT c.vec_id, m.medoid_id,
         round(list_cosine_similarity(c.e, m.m_emb), 6) AS sim
  FROM corpus c CROSS JOIN med m
),
cluster AS (
  SELECT vec_id, medoid_id AS cluster_id
  FROM (
    SELECT vec_id, medoid_id,
           row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, medoid_id) AS rk
    FROM assign
  )
  WHERE rk = 1
),
mem AS (
  SELECT c.vec_id, cl.cluster_id, c.e
  FROM corpus c JOIN cluster cl USING (vec_id)
),
dropped AS (
  SELECT DISTINCT a.cluster_id, b.vec_id AS dropped_id
  FROM mem a JOIN mem b
    ON a.cluster_id = b.cluster_id AND a.vec_id < b.vec_id
  WHERE round(list_cosine_similarity(a.e, b.e), 6) >= {NEAR_DUP_THRESHOLD}
),
agg AS (
  SELECT cluster_id, COUNT(*) AS n_dropped, SUM(dropped_id) AS dropped_id_sum
  FROM dropped GROUP BY cluster_id
)
SELECT s.cluster_id,
       CAST(s.n_members AS BIGINT) AS n_members,
       CAST(COALESCE(a.n_dropped, 0) AS BIGINT) AS n_dropped,
       CAST(s.n_members - COALESCE(a.n_dropped, 0) AS BIGINT) AS n_kept,
       CAST(COALESCE(a.dropped_id_sum, 0) AS BIGINT) AS dropped_id_sum
FROM (SELECT cluster_id, COUNT(*) AS n_members FROM cluster GROUP BY cluster_id) s
LEFT JOIN agg a USING (cluster_id)
ORDER BY s.cluster_id
"""

QUERIES["q96_semdedup"] = q96_semdedup
ORACLES["q96_semdedup"] = Q96_SQL


# ---------------------------------------------------------------------------
# Q100 — int8 embedding quantization + reconstruction-error audit.
#
# The embedding-storage workhorse between "raw float32" and "PQ codes"
# (m15): symmetric per-vector int8 quantization — scale each vector by
# 127/max|x|, round to int8, store codes + one scale — is what FAISS
# (ScalarQuantizer QT_8bit), Milvus and vector DBs ship as the 4x
# compression default. This query runs quantize -> dequantize ->
# error-audit over the embeddings table and reports per-vector code
# sums and L1 reconstruction error in exact micro-units.
#
# Determinism: elementwise IEEE double arithmetic in ARRAY ORDER (the
# q13 discipline — higher-order-function folds are sequential, so
# there is no accumulation-order noise), with every per-element value
# snapped to an integer (floor(.+0.5)) BEFORE the per-vector sum; the
# sums are then exact BIGINT arithmetic. Rounding is floor(x+0.5) on
# both engines — no reliance on either engine's round() tie-breaking.
#
# Scale shape: zero shuffles — quantization, reconstruction, and error
# folds are all map-side codegen-adjacent lambdas over the embedding
# array; the only movement is the final vec_id sort of the audit rows.
# At 100 TB this is a pure scan->write job (the codes column would be
# written out as array<tinyint> + scale, 4x smaller than the input).
# ---------------------------------------------------------------------------


def q100_int8_quantization(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    return (
        emb.select(
            "vec_id",
            F.size("embedding").alias("n_dims"),
            F.expr(
                "array_max(transform(embedding,"
                " x -> abs(coalesce(CAST(x AS DOUBLE), 0.0d))))"
            ).alias("m"),
            "embedding",
        )
        .select(
            "vec_id",
            "n_dims",
            F.expr("CAST(floor(coalesce(m, 0.0d) * 1000000.0 + 0.5d) AS BIGINT)").alias("maxabs_e6"),
            F.expr(
                "CASE WHEN m IS NULL OR m = 0.0d THEN CAST(0 AS BIGINT) ELSE aggregate(embedding,"
                " CAST(0 AS BIGINT),"
                " (acc, x) -> acc + CAST(floor(coalesce(CAST(x AS DOUBLE), 0.0d) * 127.0 / m + 0.5d) AS BIGINT)) END"
            ).alias("sum_codes"),
            F.expr(
                "CASE WHEN m IS NULL OR m = 0.0d THEN CAST(0 AS BIGINT) ELSE aggregate(embedding,"
                " CAST(0 AS BIGINT),"
                " (acc, x) -> acc + abs(CAST(floor(coalesce(CAST(x AS DOUBLE), 0.0d) * 127.0 / m + 0.5d) AS BIGINT))) END"
            ).alias("sum_abs_codes"),
            F.expr(
                "CASE WHEN m IS NULL OR m = 0.0d THEN CAST(0 AS BIGINT) ELSE aggregate(embedding,"
                " CAST(0 AS BIGINT),"
                " (acc, x) -> acc + CAST(floor(abs(coalesce(CAST(x AS DOUBLE), 0.0d)"
                "   - CAST(CAST(floor(coalesce(CAST(x AS DOUBLE), 0.0d) * 127.0 / m + 0.5d) AS BIGINT) AS DOUBLE)"
                "     * m / 127.0) * 1000000.0 + 0.5d) AS BIGINT)) END"
            ).alias("l1_err_e6"),
        )
        .orderBy("vec_id")
    )


Q100_SQL = """
WITH base AS (
  SELECT vec_id,
         len(embedding) AS n_dims,
         list_max(list_transform(embedding, x -> abs(coalesce(x::DOUBLE, 0.0)))) AS m,
         embedding AS e
  FROM embeddings
)
SELECT vec_id,
       CAST(n_dims AS INTEGER) AS n_dims,
       CAST(floor(coalesce(m, 0.0) * 1000000.0 + 0.5) AS BIGINT) AS maxabs_e6,
       -- CAST: DuckDB list_sum(BIGINT[]) yields HUGEINT -> float64 in fetchdf();
       -- the driver hashes dtypes strictly, so pin to BIGINT to match Spark int64.
       CAST(CASE WHEN m IS NULL OR m = 0.0 THEN 0
            ELSE coalesce(list_sum(list_transform(e,
              x -> CAST(floor(coalesce(x::DOUBLE, 0.0) * 127.0 / m + 0.5) AS BIGINT))), 0)
       END AS BIGINT) AS sum_codes,
       CAST(CASE WHEN m IS NULL OR m = 0.0 THEN 0
            ELSE coalesce(list_sum(list_transform(e,
              x -> abs(CAST(floor(coalesce(x::DOUBLE, 0.0) * 127.0 / m + 0.5) AS BIGINT)))), 0)
       END AS BIGINT) AS sum_abs_codes,
       CAST(CASE WHEN m IS NULL OR m = 0.0 THEN 0
            ELSE coalesce(list_sum(list_transform(e,
              x -> CAST(floor(abs(coalesce(x::DOUBLE, 0.0)
                     - CAST(floor(coalesce(x::DOUBLE, 0.0) * 127.0 / m + 0.5) AS BIGINT)::DOUBLE
                       * m / 127.0) * 1000000.0 + 0.5) AS BIGINT))), 0)
       END AS BIGINT) AS l1_err_e6
FROM base
ORDER BY vec_id
"""

QUERIES["q100_int8_quantization"] = q100_int8_quantization
ORACLES["q100_int8_quantization"] = Q100_SQL


# ---------------------------------------------------------------------------
# Q110 — retrieval evaluation harness: recall@5 / MRR / nDCG@5 in
# exact integer ppm.
#
# The missing piece of the retrieval stack (q13 exact, m6/m9/m15
# approximate, q93 hybrid fusion): EVALUATION. A corpus pipeline
# doesn't just serve rankings, it grades them — recall@k, mean
# reciprocal rank, and nDCG are the standard IR metrics (Järvelin &
# Kekäläinen 2002). Here the LEXICAL ranking (shingle-overlap, q93's
# sparse leg) is evaluated against exact-cosine top-5 ground truth
# (q13's arithmetic) — a real cross-modal agreement measurement.
#
# Every metric is exact integer arithmetic: binary relevance, the
# log2 rank discounts are FROZEN ppm constants (the q106 Benford
# discipline — no log() at query time), MRR is a truncating integer
# divide, and the ideal DCG@5 is a compile-time constant. Both
# engines replay the full chain bit-for-bit.
#
# Scale shape: ground truth is the q13 broadcast-probe scan; the
# system ranking is an inverted-index join (never all-pairs); metrics
# are one (probe) hash agg over <= 5 rows each. Evaluating a better
# system or deeper k changes constants, not shape.
# ---------------------------------------------------------------------------

_Q110_K = 5
# floor(1e6 / log2(rank+1)) for rank 1..5
_Q110_DISC = {1: 1000000, 2: 630929, 3: 500000, 4: 430676, 5: 386852}
_Q110_IDCG = sum(_Q110_DISC.values())


def q110_retrieval_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < N_PROBES).select(
        F.col("vec_id").alias("probe_id")
    )
    truth = (
        _vector_ranking(emb)
        .filter(F.col("vec_rk") <= _Q110_K)
        .select("probe_id", "doc_id")
    )
    system = (
        _lexical_ranking(spark, sf_dir, emb)
        .filter(F.col("lex_rk") <= _Q110_K)
        .select("probe_id", "doc_id", F.col("lex_rk").alias("rk"))
    )

    disc = F.create_map(*[F.lit(x) for kv in _Q110_DISC.items() for x in kv])
    hits = system.join(truth, ["probe_id", "doc_id"]).select(
        "probe_id", "rk", disc[F.col("rk")].alias("disc")
    )
    per_probe = hits.groupBy("probe_id").agg(
        F.count(F.lit(1)).alias("n_hits"),
        F.min("rk").alias("first_hit_rk"),
        F.sum("disc").alias("dcg"),
    )
    return (
        probes.join(per_probe, "probe_id", "left")
        .select(
            "probe_id",
            F.coalesce("n_hits", F.lit(0)).alias("n_hits"),
            (F.coalesce("n_hits", F.lit(0)) * F.lit(1000000 // _Q110_K)).alias(
                "recall_ppm"
            ),
            F.coalesce(
                F.expr("1000000 div first_hit_rk"), F.lit(0)
            ).alias("mrr_ppm"),
            F.expr(
                f"coalesce(CAST(dcg * 1000000 div {_Q110_IDCG} AS BIGINT), 0)"
            ).alias("ndcg_ppm"),
        )
        .orderBy("probe_id")
    )


_Q110_DISC_CASE = " ".join(f"WHEN {r} THEN {d}" for r, d in _Q110_DISC.items())

Q110_SQL = rf"""
WITH p AS (
  SELECT vec_id AS probe_id, CAST(embedding AS DOUBLE[]) AS pe
  FROM embeddings WHERE vec_id < {N_PROBES}
),
truth AS (
  SELECT probe_id, vec_id AS doc_id FROM (
    SELECT p.probe_id, e.vec_id,
           row_number() OVER (
             PARTITION BY p.probe_id
             ORDER BY round(list_cosine_similarity(p.pe, CAST(e.embedding AS DOUBLE[])), 6) DESC,
                      e.vec_id) AS t_rk
    FROM embeddings e CROSS JOIN p
    WHERE e.vec_id != p.probe_id
  ) WHERE t_rk <= {_Q110_K}
),
toks AS (
  SELECT doc_id, string_split_regex(lower(text), '\s+') AS t
  FROM documents WHERE doc_id IN (SELECT vec_id FROM embeddings)
),
sh AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, greatest(len(t) - 1, 1)),
           i -> concat_ws(' ', t[i], t[i+1], t[i+2]))) AS s
  FROM toks WHERE len(t) >= 3
),
inv AS (SELECT doc_id, UNNEST(s) AS shingle FROM sh),
system AS (
  SELECT probe_id, doc_id, rk FROM (
    SELECT a.doc_id AS probe_id, b.doc_id AS doc_id,
           row_number() OVER (PARTITION BY a.doc_id
                              ORDER BY COUNT(*) DESC, b.doc_id) AS rk
    FROM inv a JOIN inv b ON a.shingle = b.shingle AND a.doc_id != b.doc_id
    WHERE a.doc_id < {N_PROBES}
    GROUP BY a.doc_id, b.doc_id
  ) WHERE rk <= {_Q110_K}
),
hits AS (
  SELECT s.probe_id, s.rk,
         CASE s.rk {_Q110_DISC_CASE} END AS disc
  FROM system s JOIN truth t ON s.probe_id = t.probe_id AND s.doc_id = t.doc_id
),
per_probe AS (
  SELECT probe_id, COUNT(*) AS n_hits, MIN(rk) AS first_hit_rk, SUM(disc) AS dcg
  FROM hits GROUP BY probe_id
)
SELECT p.probe_id,
       CAST(COALESCE(pp.n_hits, 0) AS BIGINT) AS n_hits,
       CAST(COALESCE(pp.n_hits, 0) * {1000000 // _Q110_K} AS BIGINT) AS recall_ppm,
       CAST(COALESCE(1000000 // pp.first_hit_rk, 0) AS BIGINT) AS mrr_ppm,
       CAST(COALESCE(pp.dcg * 1000000 // {_Q110_IDCG}, 0) AS BIGINT) AS ndcg_ppm
FROM p LEFT JOIN per_probe pp USING (probe_id)
ORDER BY p.probe_id
"""

QUERIES["q110_retrieval_eval"] = q110_retrieval_eval
ORACLES["q110_retrieval_eval"] = Q110_SQL


# ---------------------------------------------------------------------------
# Q119 — k-means (Lloyd's algorithm) in exact fixed-point integers:
# the iterative ML primitive under the hash gate.
#
# Clustering embeddings is the backbone of corpus organization at
# scale (topic bucketing, SemDeDup's first phase, IVF index training —
# q96/m15 both consume a codebook this operator produces). Float
# centroid means are accumulation-order-dependent, so the whole loop
# runs in a SHIFTED fixed-point integer space:
#
#   u[d]     = floor(x * 1e6 + 0.5) + 1e6      (q100's quantizer; the
#              +1e6 shift makes every coordinate non-negative so the
#              centroid mean's integer division is floor on BOTH
#              engines — Spark DIV truncates, DuckDB // floors, and
#              they agree only on non-negative dividends)
#   assign   = argmin_j sum_d (u[d] - c_j[d])^2   (ties -> smallest j;
#              |diff| <= 2e6, 64 dims -> max dist 2.6e14, BIGINT-safe)
#   update   = c_j[d] = sum(u[d]) DIV n_j         (empty cluster keeps
#                                                  its previous centroid)
#
# K = 8 centroids seeded from vec_id < 8 (deterministic), 3 rounds.
# The Spark side is driver-orchestrated like q39/q58: centroids (8x64
# integers) collect to the driver each round and re-enter the plan as
# LITERAL arrays, so assignment is a scan with no join; the update is
# a posexplode + (cluster, dim) hash agg. The oracle replays all three
# rounds as chained CTEs with list arithmetic — a full cross-engine
# replay of an iterative algorithm, not a spot check.
#
# Scale shape: per round ONE scan of the pinned fixed-point vectors +
# one (K*D)-key agg (512 cells regardless of corpus size); centroid
# traffic is kilobytes. The literal-array distance uses higher-order
# functions (interpreted) — at 100 TB the assignment step drops into
# the m13/m15 Arrow path (one numpy (N,D)x(D,K) matmul per batch);
# the algorithm and its integer contract stay identical.
# ---------------------------------------------------------------------------

_Q119_K = 8
_Q119_ROUNDS = 3


def q119_kmeans_fixed_point(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    pts = emb.select(
        "vec_id",
        F.expr(
            "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000000.0"
            " + 0.5d) AS BIGINT) + 1000000)"
        ).alias("u"),
    ).localCheckpoint(eager=False)  # re-scanned every round — pin once
    # seed = first K rows ordered by vec_id (NOT `vec_id < K`, which
    # KeyErrors on non-contiguous ids while the oracle silently starts
    # with fewer clusters — asymmetric failure modes; ADVICE r5)
    seed_rows = pts.orderBy("vec_id").limit(_Q119_K).collect()
    assert len(seed_rows) == _Q119_K, f"need >= {_Q119_K} vectors to seed"
    cents = [list(r["u"]) for r in seed_rows]

    assigned = None
    prev_cents: list[list[int]] | None = None
    for _ in range(_Q119_ROUNDS):
        if cents == prev_cents:
            # fixed point (r11): identical centroids reproduce the
            # identical assignment and identical new centroids every
            # remaining round — `assigned` (built from these same
            # centroids last round) and `cents` are already final, so
            # the skipped rounds change nothing in the result.
            break
        prev_cents = cents
        dist_exprs = ", ".join(
            "aggregate(zip_with(u, array("
            + ",".join(f"CAST({v} AS BIGINT)" for v in c)
            + "), (a, b) -> (a - b) * (a - b)), CAST(0 AS BIGINT),"
            " (acc, x) -> acc + x)"
            for c in cents
        )
        # materialize the K-distance array ONCE per row; the projection
        # below references `dists` 3x, and CollapseProject keeps a
        # non-cheap multi-referenced expression in its own projection,
        # so the interpreted higher-order aggregate runs 1x, not 3x
        assigned = (
            pts.withColumn("dists", F.expr(f"array({dist_exprs})"))
            .select(
                "vec_id",
                "u",
                F.expr("array_position(dists, array_min(dists))")
                .cast("long")
                .alias("cluster"),
                F.expr("array_min(dists)").alias("dist"),
            )
        )
        sums = (
            assigned.select("cluster", F.posexplode("u").alias("d", "val"))
            .groupBy("cluster", "d")
            .agg(F.sum("val").alias("s"), F.count(F.lit(1)).alias("n"))
            .collect()
        )
        new: dict[int, dict[int, int]] = {}
        for r in sums:
            new.setdefault(int(r["cluster"]), {})[int(r["d"])] = int(r["s"]) // int(r["n"])
        cents = [
            [new[j + 1][d] for d in range(len(cents[j]))] if (j + 1) in new else cents[j]
            for j in range(_Q119_K)
        ]

    fps = spark.createDataFrame(
        [(j + 1, sum(c)) for j, c in enumerate(cents)],
        "cluster long, centroid_sum long",
    )
    return (
        assigned.groupBy("cluster")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.sum("dist").alias("inertia"),
        )
        .join(F.broadcast(fps), "cluster", "right")
        .select(
            "cluster",
            F.coalesce("n_vectors", F.lit(0)).alias("n_vectors"),
            F.coalesce("inertia", F.lit(0)).alias("inertia"),
            "centroid_sum",
        )
        .orderBy("cluster")
    )


def _q119_sql() -> str:
    k, rounds = _Q119_K, _Q119_ROUNDS
    parts = [
        f"""WITH pts AS (
  SELECT vec_id,
         list_transform(embedding,
           x -> CAST(floor(CAST(x AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT) + 1000000) AS u
  FROM embeddings
),
exploded AS (
  SELECT vec_id, UNNEST(u) AS val, UNNEST(range(1, len(u) + 1)) AS d FROM pts
),
cent0 AS (
  -- first K rows ordered by vec_id, mirroring the Spark seeding
  -- (robust to non-contiguous vec_ids; row_number == vec_id + 1 when
  -- ids are contiguous from 0, so hashes are unchanged on this data)
  SELECT row_number() OVER (ORDER BY vec_id) AS cluster, u AS c
  FROM pts ORDER BY vec_id LIMIT {k}
)"""
    ]
    for r in range(1, rounds + 1):
        parts.append(f""",
dist{r} AS (
  SELECT p.vec_id, c.cluster,
         list_sum(list_transform(list_zip(p.u, c.c),
           t -> (t[1] - t[2]) * (t[1] - t[2]))) AS dist
  FROM pts p CROSS JOIN cent{r - 1} c
),
assign{r} AS (
  SELECT vec_id, cluster, dist FROM (
    SELECT vec_id, cluster, dist,
           row_number() OVER (PARTITION BY vec_id ORDER BY dist, cluster) AS rk
    FROM dist{r}) WHERE rk = 1
),
cent{r} AS (
  SELECT pc.cluster, COALESCE(nc.c, pc.c) AS c
  FROM cent{r - 1} pc LEFT JOIN (
    SELECT cluster, list(s // n ORDER BY d) AS c FROM (
      SELECT a.cluster, e.d, SUM(e.val) AS s, COUNT(*) AS n
      FROM assign{r} a JOIN exploded e USING (vec_id)
      GROUP BY a.cluster, e.d
    ) GROUP BY cluster
  ) nc USING (cluster)
)""")
    parts.append(f"""
SELECT c.cluster,
       CAST(COALESCE(a.n_vectors, 0) AS BIGINT) AS n_vectors,
       CAST(COALESCE(a.inertia, 0) AS BIGINT) AS inertia,
       CAST(list_sum(c.c) AS BIGINT) AS centroid_sum
FROM cent{rounds} c LEFT JOIN (
  SELECT cluster, COUNT(*) AS n_vectors, SUM(dist) AS inertia
  FROM assign{rounds} GROUP BY cluster
) a USING (cluster)
ORDER BY c.cluster""")
    return "".join(parts)


Q119_SQL = _q119_sql()

QUERIES["q119_kmeans_fixed_point"] = q119_kmeans_fixed_point
ORACLES["q119_kmeans_fixed_point"] = Q119_SQL


# ---------------------------------------------------------------------------
# Q121 — ORACLE-CHECKABLE product quantization + ADC top-k (VERDICT r5
# #9: shrink the rows-only set — m15's PQ recall harness stays, this
# certifies the same pipeline shape hash-exact cross-engine). The PQ
# stages are the real ones: (1) codebook TRAINING per subspace, (2)
# per-vector CODE assignment = argmin codeword, (3) ASYMMETRIC-DISTANCE
# scoring of the whole corpus against a probe through the 32-entry
# distance table, top-k. What makes it oracle-checkable where m15 is
# not: the codebook comes from a deterministic partition (codeword j =
# vectors with vec_id % 8 == j; component-wise floor-mean) instead of
# sampled k-means, and every distance is BIGINT over e6-quantized
# components — no float accumulation anywhere.
#
# Exactness: centroid = floor(sum/count) evaluated in IEEE double on
# both engines (sums ≪ 2^53 here; at 100 TB swap in exact DIV with a
# sign-correction — noted, not needed at any test SF). Squared L2 over
# e6 ints ≤ 4 subspaces × 16 dims × (4e6)² ≈ 2.6e15 < 2^53, exact in
# BIGINT. Outer SUMs CAST AS BIGINT (DuckDB HUGEINT/float64 hazard).
#
# Scale shape: training = one explode to component rows with map-side
# partial agg into 8×4×16=512 groups; assignment = broadcast of the
# 32-row codebook, map-side argmin; ADC = broadcast of the 32-entry
# distance table, map-side lookup + one groupBy vec_id whose partial
# aggregate is 4 rows per vector. Embeddings themselves never shuffle;
# the only wide exchange carries (vec_id, s, dist, j) longs.
# ---------------------------------------------------------------------------
_Q121_S = 4     # subspaces (x16 dims each over the 64-dim embeddings)
_Q121_J = 8     # codewords per subspace
_Q121_TOPK = 20


def q121_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    j, s, topk = _Q121_J, _Q121_S, _Q121_TOPK
    emb = load(spark, sf_dir, "embeddings")
    q = emb.select(
        "vec_id",
        F.expr(
            "transform(embedding, x ->"
            " CAST(floor(CAST(x AS DOUBLE) * 1000000.0D + 0.5D) AS BIGINT))"
        ).alias("u"),
    )
    comp = q.select(
        "vec_id",
        (F.col("vec_id") % j).alias("j"),
        F.posexplode("u").alias("p", "val"),
    ).select("vec_id", "j", F.expr("p DIV 16").alias("s"), (F.col("p") % 16).alias("dd"), "val")
    cb = (
        comp.groupBy("s", "j", "dd")
        .agg(
            F.expr(
                "CAST(floor(CAST(SUM(val) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE))"
                " AS BIGINT)"
            ).alias("cval")
        )
        .groupBy("s", "j")
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(dd, cval))), x -> x.cval)"
            ).alias("c")
        )
    )
    sub = q.select(
        "vec_id", F.explode(F.sequence(F.lit(0), F.lit(s - 1))).alias("s"), "u"
    ).select("vec_id", "s", F.expr("slice(u, s * 16 + 1, 16)").alias("v"))
    ad = sub.join(F.broadcast(cb), "s").select(
        "vec_id",
        "s",
        "j",
        F.expr(
            "aggregate(zip_with(v, c, (a, b) -> (a - b) * (a - b)),"
            " CAST(0 AS BIGINT), (acc, x) -> acc + x)"
        ).alias("dist"),
    )
    codes = (
        ad.withColumn(
            "rn", F.row_number().over(W.partitionBy("vec_id", "s").orderBy("dist", "j"))
        )
        .filter(F.col("rn") == 1)
        .select("vec_id", "s", "j")
    )
    ptab = ad.filter(F.col("vec_id") == 0).select("s", "j", F.col("dist").alias("pdist"))
    approx = (
        codes.filter(F.col("vec_id") != 0)
        .join(F.broadcast(ptab), ["s", "j"])
        .groupBy("vec_id")
        .agg(F.sum("pdist").alias("adist"))
    )
    exact = (
        q.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q.filter(F.col("vec_id") == 0).select(F.col("u").alias("pu"))))
        .select(
            "vec_id",
            F.expr(
                "aggregate(zip_with(u, pu, (a, b) -> (a - b) * (a - b)),"
                " CAST(0 AS BIGINT), (acc, x) -> acc + x)"
            ).alias("exact_d"),
        )
    )
    return (
        approx.join(exact, "vec_id")
        .select("vec_id", "adist", "exact_d")
        .orderBy("adist", "vec_id")
        .limit(topk)
    )


Q121_SQL = f"""
WITH q AS (
  SELECT vec_id,
         list_transform(embedding,
           x -> CAST(floor(x::DOUBLE * 1000000.0 + 0.5) AS BIGINT)) AS u
  FROM embeddings
),
comp AS (
  SELECT vec_id, vec_id % {_Q121_J} AS j,
         (d - 1) // 16 AS s, (d - 1) % 16 AS dd, u[d] AS val
  FROM q, (SELECT UNNEST(range(1, 65)) AS d)
),
cbc AS (
  SELECT s, j, dd,
         CAST(floor(CAST(SUM(val) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)) AS BIGINT) AS cval
  FROM comp GROUP BY s, j, dd
),
cb AS (
  SELECT s, j, list(cval ORDER BY dd) AS c FROM cbc GROUP BY s, j
),
sub AS (
  SELECT vec_id, sp.s AS s, u[sp.s * 16 + 1 : sp.s * 16 + 16] AS v
  FROM q, (SELECT UNNEST(range(0, {_Q121_S})) AS s) sp
),
ad AS (
  SELECT sub.vec_id, sub.s, cb.j,
         CAST(list_sum(list_transform(range(1, 17),
           i -> (sub.v[i] - cb.c[i]) * (sub.v[i] - cb.c[i]))) AS BIGINT) AS dist
  FROM sub JOIN cb USING (s)
),
codes AS (
  SELECT vec_id, s, j FROM (
    SELECT ad.*, row_number() OVER (PARTITION BY vec_id, s ORDER BY dist, j) AS rn
    FROM ad
  ) WHERE rn = 1
),
ptab AS (
  SELECT s, j, dist AS pdist FROM ad WHERE vec_id = 0
),
approx AS (
  SELECT c.vec_id, CAST(SUM(p.pdist) AS BIGINT) AS adist
  FROM codes c JOIN ptab p ON c.s = p.s AND c.j = p.j
  WHERE c.vec_id <> 0
  GROUP BY c.vec_id
),
exact AS (
  SELECT q.vec_id,
         CAST(list_sum(list_transform(range(1, 65),
           i -> (q.u[i] - p.u[i]) * (q.u[i] - p.u[i]))) AS BIGINT) AS exact_d
  FROM q, (SELECT u FROM q WHERE vec_id = 0) p
  WHERE q.vec_id <> 0
)
SELECT a.vec_id, a.adist, e.exact_d
FROM approx a JOIN exact e USING (vec_id)
ORDER BY a.adist, a.vec_id
LIMIT {_Q121_TOPK}
"""

QUERIES["q121_pq_adc_topk"] = q121_pq_adc_topk
ORACLES["q121_pq_adc_topk"] = Q121_SQL


# ---------------------------------------------------------------------------
# Q124 — ORACLE-CHECKABLE IVF top-k search (certifies m9's rows-only
# pipeline shape the way q121 certified m15's PQ and q122 certified
# m4's LSH). The IVF stages are the real ones: (1) a coarse quantizer
# (here a deterministic residue-class floor-mean codebook — the TRAINED
# quantizer is certified separately by q119's fixed-point k-means),
# (2) inverted-list build = per-vector argmin cell, (3) probe = the
# nprobe nearest cells per query, (4) exact re-scoring restricted to
# the probed cells' lists, top-k. Every distance is BIGINT over
# e6-quantized components: 64 dims x (2e6)^2 ≈ 2.6e14 < 2^53, exact.
#
# Scale shape (the part m9 is graded on): the 16-row centroid table
# broadcasts; cell assignment is ONE map-side argmin expressed as a
# partial-aggregatable min(struct(dist, cell)) — corpus vectors never
# sort and never shuffle wide (only (vec_id, cell) longs move); the
# probe fan-out joins the broadcast 10-row (query, cell) table against
# the inverted list, so the re-score touches nprobe/K of the corpus
# exactly like a production IVF. Reference scope: near-dup/similarity
# search over the corpus (SURVEY §2 M5/M9).
# ---------------------------------------------------------------------------
_Q124_K = 16      # coarse cells
_Q124_NQ = 5      # probe queries (vec_id < NQ)
_Q124_NPROBE = 2  # cells probed per query
_Q124_TOPK = 5


def q124_ivf_probe_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    k, nq, npr, topk = _Q124_K, _Q124_NQ, _Q124_NPROBE, _Q124_TOPK
    emb = load(spark, sf_dir, "embeddings")
    q = emb.select(
        "vec_id",
        F.expr(
            "transform(embedding, x ->"
            " CAST(floor(CAST(x AS DOUBLE) * 1000000.0D + 0.5D) AS BIGINT))"
        ).alias("u"),
    ).localCheckpoint(eager=False)  # pinned: centroids, corpus, probes all read it
    comp = q.select(
        (F.col("vec_id") % k).alias("cell"), F.posexplode("u").alias("p", "val")
    )
    cent = (
        comp.groupBy("cell", "p")
        .agg(
            F.expr(
                "CAST(floor(CAST(SUM(val) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE))"
                " AS BIGINT)"
            ).alias("cval")
        )
        .groupBy("cell")
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(p, cval))), x -> x.cval)"
            ).alias("c")
        )
    )
    dist = F.expr(
        "aggregate(zip_with(u, c, (a, b) -> (a - b) * (a - b)),"
        " CAST(0 AS BIGINT), (acc, x) -> acc + x)"
    )
    # inverted list: map-side argmin over the broadcast centroids;
    # min(struct) is partial-aggregatable (no per-vector sort/window)
    paired = q.join(F.broadcast(cent), F.lit(True)).select(
        "vec_id", "cell", dist.alias("cdist")
    )
    assign = (
        paired.filter(F.col("vec_id") >= nq)
        .groupBy("vec_id")
        .agg(F.min(F.struct("cdist", "cell")).alias("m"))
        .select("vec_id", F.col("m.cell").alias("cell"))
    )
    # probes: nprobe nearest cells per query (nq x k rows — tiny)
    probes = (
        paired.filter(F.col("vec_id") < nq)
        .withColumn(
            "pr",
            F.row_number().over(
                W.partitionBy("vec_id").orderBy("cdist", "cell")
            ),
        )
        .filter(F.col("pr") <= npr)
        .select(F.col("vec_id").alias("query_id"), "cell")
        .join(
            q.select(F.col("vec_id").alias("query_id"), F.col("u").alias("qu")),
            "query_id",
        )
    )
    cand = (
        assign.join(F.broadcast(probes), "cell")
        .join(q, "vec_id")
        .select(
            "query_id",
            "vec_id",
            "cell",
            F.expr(
                "aggregate(zip_with(u, qu, (a, b) -> (a - b) * (a - b)),"
                " CAST(0 AS BIGINT), (acc, x) -> acc + x)"
            ).alias("dist"),
        )
    )
    return (
        cand.withColumn(
            "rk",
            F.row_number()
            .over(W.partitionBy("query_id").orderBy("dist", "vec_id"))
            .cast("long"),
        )
        .filter(F.col("rk") <= topk)
        .select("query_id", "rk", "vec_id", "cell", "dist")
        .orderBy("query_id", "rk")
    )


Q124_SQL = f"""
WITH q AS (
  SELECT vec_id,
         list_transform(embedding,
           x -> CAST(floor(x::DOUBLE * 1000000.0 + 0.5) AS BIGINT)) AS u
  FROM embeddings
),
comp AS (
  SELECT vec_id % {_Q124_K} AS cell, d AS p, u[d] AS val
  FROM q, (SELECT UNNEST(range(1, 65)) AS d)
),
cent AS (
  SELECT cell, list(cval ORDER BY p) AS c FROM (
    SELECT cell, p,
           CAST(floor(CAST(SUM(val) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)) AS BIGINT) AS cval
    FROM comp GROUP BY cell, p
  ) GROUP BY cell
),
paired AS (
  SELECT q.vec_id, cent.cell,
         CAST(list_sum(list_transform(range(1, 65),
           i -> (q.u[i] - cent.c[i]) * (q.u[i] - cent.c[i]))) AS BIGINT) AS cdist
  FROM q, cent
),
assign AS (
  SELECT vec_id, cell FROM (
    SELECT vec_id, cell,
           row_number() OVER (PARTITION BY vec_id ORDER BY cdist, cell) AS rn
    FROM paired WHERE vec_id >= {_Q124_NQ}
  ) WHERE rn = 1
),
probes AS (
  SELECT p.vec_id AS query_id, p.cell, q.u AS qu FROM (
    SELECT vec_id, cell,
           row_number() OVER (PARTITION BY vec_id ORDER BY cdist, cell) AS pr
    FROM paired WHERE vec_id < {_Q124_NQ}
  ) p JOIN q ON p.vec_id = q.vec_id
  WHERE p.pr <= {_Q124_NPROBE}
),
cand AS (
  SELECT pr.query_id, a.vec_id, a.cell,
         CAST(list_sum(list_transform(range(1, 65),
           i -> (q.u[i] - pr.qu[i]) * (q.u[i] - pr.qu[i]))) AS BIGINT) AS dist
  FROM assign a JOIN probes pr USING (cell) JOIN q ON a.vec_id = q.vec_id
)
SELECT query_id, CAST(rk AS BIGINT) AS rk, vec_id, cell, dist FROM (
  SELECT cand.*,
         row_number() OVER (PARTITION BY query_id ORDER BY dist, vec_id) AS rk
  FROM cand
)
WHERE rk <= {_Q124_TOPK}
ORDER BY query_id, rk
"""

QUERIES["q124_ivf_probe_topk"] = q124_ivf_probe_topk
ORACLES["q124_ivf_probe_topk"] = Q124_SQL


# ---------------------------------------------------------------------------
# Q126 — matryoshka truncation audit (M85): how much retrieval quality
# survives truncating the embedding to its first D' dims (the MRL /
# matryoshka deployment question — store 16 of 64 dims, 4x cheaper ANN,
# at what rank fidelity?). Per probe: rank the corpus by truncated-dot
# and by full-dot, then (1) exact Spearman rho between the two rankings
# and (2) top-K overlap — the rank-correlation primitive the q110 eval
# harness (recall/MRR/nDCG) did not cover.
#
# Exactness: dots are BIGINT over e6-quantized components (16..64 dims
# x (2e6)^2 ≈ 2.6e14 < 2^53); ranks are total-ordered by (dot DESC,
# vec_id); rho reported in 1e-6 units via divide-before-scale:
#   rho_e6 = 1e6 - (6*sum_d2) DIV ((n*(n*n-1)) DIV 1e6)
# (NOT 1e6 - (6e6*sum_d2) DIV (n*(n*n-1)) — that numerator hits
# n(n^2-1)/3 * 6e6 ≈ 2e6*n^3 and wraps int64 from n ≈ 16.6k, i.e.
# already at sf1 in the worst case). The rearranged form is exact-safe
# while 6*sum_d2 <= 2n(n^2-1) < 2^63, i.e. n < ~1.66e6 (sf < ~83), and
# needs n >= 101 so the inner DIV 1e6 is nonzero — every SF ships
# n >= 495. Both engines run the identical integer formula, so the
# (slightly different) rounding is identical end to end.
#
# Scale shape: probes broadcast (Q rows x 64 floats); dots are ONE
# map-side pass over the corpus (no corpus shuffle of embeddings —
# only (query_id, vec_id, dot, dot) longs move); ranking windows
# partition by probe — at production Q each probe's ranking is an
# independent partition, and the top-K leg prunes through
# WindowGroupLimit before the overlap join.
# ---------------------------------------------------------------------------
_Q126_NQ = 5
_Q126_DTRUNC = 16
_Q126_TOPK = 50


def q126_matryoshka_rank_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    nq, dt, topk = _Q126_NQ, _Q126_DTRUNC, _Q126_TOPK
    emb = load(spark, sf_dir, "embeddings")
    q = emb.select(
        "vec_id",
        F.expr(
            "transform(embedding, x ->"
            " CAST(floor(CAST(x AS DOUBLE) * 1000000.0D + 0.5D) AS BIGINT))"
        ).alias("u"),
    )
    probes = q.filter(F.col("vec_id") < nq).select(
        F.col("vec_id").alias("query_id"), F.col("u").alias("qu")
    )
    corpus = q.filter(F.col("vec_id") >= nq)

    def dot(n_dims: int) -> "F.Column":
        return F.expr(
            f"aggregate(zip_with(slice(u, 1, {n_dims}), slice(qu, 1, {n_dims}),"
            " (a, b) -> a * b), CAST(0 AS BIGINT), (acc, x) -> acc + x)"
        )

    scored = corpus.join(F.broadcast(probes), F.lit(True)).select(
        "query_id",
        "vec_id",
        dot(dt).alias("dot_t"),
        dot(64).alias("dot_f"),
    )
    wt = W.partitionBy("query_id").orderBy(F.desc("dot_t"), "vec_id")
    wf = W.partitionBy("query_id").orderBy(F.desc("dot_f"), "vec_id")
    ranked = scored.select(
        "query_id",
        "vec_id",
        # LONG ranks: row_number() is int32 and the Spearman d² below
        # reaches (n-1)² ≈ 4e10 at sf10's n = 200k corpus — an int32
        # multiply overflow the sf10 spot-check caught (sf1's n = 20k
        # stayed just under 2^31)
        F.row_number().over(wt).cast("long").alias("rk_t"),
        F.row_number().over(wf).cast("long").alias("rk_f"),
    ).localCheckpoint(eager=False)  # feeds the rho agg and both top-K legs
    rho = ranked.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            (F.col("rk_t") - F.col("rk_f")) * (F.col("rk_t") - F.col("rk_f"))
        ).alias("sum_d2"),
    )
    top_t = ranked.filter(F.col("rk_t") <= topk).select("query_id", "vec_id")
    top_f = ranked.filter(F.col("rk_f") <= topk).select("query_id", "vec_id")
    overlap = (
        top_t.join(top_f, ["query_id", "vec_id"])
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("topk_overlap"))
    )
    return (
        rho.join(overlap, "query_id", "left")  # zero-overlap probes MUST survive
        .select(
            "query_id",
            F.col("n").cast("long").alias("n"),
            F.col("sum_d2").cast("long").alias("sum_d2"),
            F.expr(
                "CAST(1000000 - (6 * sum_d2)"
                " DIV ((n * (n * n - 1)) DIV 1000000) AS BIGINT)"
            ).alias("rho_e6"),
            F.coalesce(F.col("topk_overlap"), F.lit(0))
            .cast("long")
            .alias("topk_overlap"),
        )
        .orderBy("query_id")
    )


Q126_SQL = f"""
WITH q AS (
  SELECT vec_id,
         list_transform(embedding,
           x -> CAST(floor(x::DOUBLE * 1000000.0 + 0.5) AS BIGINT)) AS u
  FROM embeddings
),
probes AS (
  SELECT vec_id AS query_id, u AS qu FROM q WHERE vec_id < {_Q126_NQ}
),
scored AS (
  SELECT p.query_id, c.vec_id,
         CAST(list_sum(list_transform(range(1, {_Q126_DTRUNC} + 1),
           i -> c.u[i] * p.qu[i])) AS BIGINT) AS dot_t,
         CAST(list_sum(list_transform(range(1, 65),
           i -> c.u[i] * p.qu[i])) AS BIGINT) AS dot_f
  FROM q c, probes p
  WHERE c.vec_id >= {_Q126_NQ}
),
ranked AS (
  SELECT query_id, vec_id,
         row_number() OVER (PARTITION BY query_id ORDER BY dot_t DESC, vec_id) AS rk_t,
         row_number() OVER (PARTITION BY query_id ORDER BY dot_f DESC, vec_id) AS rk_f
  FROM scored
),
rho AS (
  SELECT query_id, COUNT(*) AS n,
         CAST(SUM((rk_t - rk_f) * (rk_t - rk_f)) AS BIGINT) AS sum_d2
  FROM ranked GROUP BY query_id
),
overlap AS (
  SELECT a.query_id, COUNT(*) AS topk_overlap
  FROM (SELECT query_id, vec_id FROM ranked WHERE rk_t <= {_Q126_TOPK}) a
  JOIN (SELECT query_id, vec_id FROM ranked WHERE rk_f <= {_Q126_TOPK}) b
    USING (query_id, vec_id)
  GROUP BY a.query_id
)
SELECT query_id,
       CAST(n AS BIGINT) AS n,
       sum_d2,
       CAST(1000000 - (6 * sum_d2) // ((n * (n * n - 1)) // 1000000) AS BIGINT) AS rho_e6,
       CAST(COALESCE(topk_overlap, 0) AS BIGINT) AS topk_overlap
FROM rho LEFT JOIN overlap USING (query_id)
ORDER BY query_id
"""

QUERIES["q126_matryoshka_rank_audit"] = q126_matryoshka_rank_audit
ORACLES["q126_matryoshka_rank_audit"] = Q126_SQL


# ---------------------------------------------------------------------------
# Q131 — embedding covariance block / anisotropy audit (M90): the
# second-moment structure of the embedding space over the first 16
# dims (the q126 matryoshka prefix). Anisotropic embeddings — a few
# directions hoarding the variance — degrade cosine retrieval
# (Ethayarajh '19; Mu & Viswanath '18 "all-but-the-top"), and the
# covariance block is the audit primitive: its diagonal is per-dim
# variance, its off-diagonal mass measures rotation away from
# isotropy. (Eigendecomposition happens downstream in numpy on this
# 16x16 output — the DISTRIBUTED part is exactly this block.)
#
# Exact integer discipline: components e6-quantized then SHIFTED +1e6
# (x in [-1,1] for unit vectors, so u in [0, 2e6] is non-negative and
# Spark's truncating DIV == DuckDB's flooring // on every division —
# the q118 offset-shift rule); the constant shift cancels out of the
# covariance. Per pair (i <= j):
#
#   mxq   = s_i DIV n                  (shifted mean, e6 units)
#   exy   = p_ij DIV n                 (shifted second moment, e12)
#   cov_q = exy - mxq * myq            (covariance, e12 units; the
#                                       floor-rounding is identical on
#                                       both engines by construction)
#
# Bounds: p_ij <= n * 4e12 fits BIGINT while n < 2.3e6 vectors
# (sf < ~115 at 20k vectors/sf — far past the embedding corpus here);
# everything downstream is <= 4e12.
#
# Scale shape: ONE grouped aggregation computes all 153 sums (16
# first-moment + 136 upper-triangle second-moment columns) map-side —
# the q123 many-sum-columns idiom; embeddings never shuffle, the
# reduce moves a single 153-column row per partition. The 136-row
# long-form output is a stack() over that one aggregated row.
# ---------------------------------------------------------------------------
_Q131_D = 16


def q131_embedding_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _Q131_D
    emb = load(spark, sf_dir, "embeddings")
    u = emb.select(
        F.expr(
            f"transform(slice(embedding, 1, {d}), x ->"
            " CAST(floor(CAST(x AS DOUBLE) * 1000000.0D + 0.5D) AS BIGINT)"
            " + 1000000)"
        ).alias("u")
    )
    aggs = [F.count(F.lit(1)).alias("n")]
    aggs += [F.sum(F.expr(f"u[{i}]")).alias(f"s{i}") for i in range(d)]
    aggs += [
        F.sum(F.expr(f"u[{i}] * u[{j}]")).alias(f"p{i}_{j}")
        for i in range(d)
        for j in range(i, d)
    ]
    one = u.agg(*aggs)
    stack_args = ", ".join(
        f"{i}, {j}, s{i}, s{j}, p{i}_{j}" for i in range(d) for j in range(i, d)
    )
    n_pairs = d * (d + 1) // 2
    long = one.select(
        "n",
        F.expr(f"stack({n_pairs}, {stack_args}) AS (i, j, sx, sy, sxy)"),
    )
    return long.select(
        F.col("i").cast("long").alias("i"),
        F.col("j").cast("long").alias("j"),
        F.col("n").cast("long").alias("n"),
        F.expr("CAST(sx DIV n - 1000000 AS BIGINT)").alias("mean_i_e6"),
        F.expr("CAST(sy DIV n - 1000000 AS BIGINT)").alias("mean_j_e6"),
        F.expr("CAST(sxy DIV n - (sx DIV n) * (sy DIV n) AS BIGINT)").alias(
            "cov_e12"
        ),
    ).orderBy("i", "j")


def _q131_sql() -> str:
    d = _Q131_D
    sums = ",\n       ".join(
        [f"SUM(u[{i + 1}]) AS s{i}" for i in range(d)]
        + [
            f"SUM(u[{i + 1}] * u[{j + 1}]) AS p{i}_{j}"
            for i in range(d)
            for j in range(i, d)
        ]
    )
    structs = ",\n    ".join(
        f"{{'i': {i}, 'j': {j}, 'sx': s{i}, 'sy': s{j}, 'sxy': p{i}_{j}}}"
        for i in range(d)
        for j in range(i, d)
    )
    return f"""
WITH q AS (
  SELECT list_transform(embedding[1:{d}],
           x -> CAST(floor(x::DOUBLE * 1000000.0 + 0.5) AS BIGINT) + 1000000)
           AS u
  FROM embeddings
),
agg AS (
  SELECT COUNT(*) AS n,
       {sums}
  FROM q
),
long AS (
  SELECT n, UNNEST([
    {structs}
  ], recursive := true)
  FROM agg
)
SELECT CAST(i AS BIGINT) AS i, CAST(j AS BIGINT) AS j, CAST(n AS BIGINT) AS n,
       CAST(sx // n - 1000000 AS BIGINT) AS mean_i_e6,
       CAST(sy // n - 1000000 AS BIGINT) AS mean_j_e6,
       CAST(sxy // n - (sx // n) * (sy // n) AS BIGINT) AS cov_e12
FROM long
ORDER BY i, j
"""


QUERIES["q131_embedding_covariance"] = q131_embedding_covariance
ORACLES["q131_embedding_covariance"] = _q131_sql()


# ---------------------------------------------------------------------------
# Q150 — rank-biased overlap (RBO) between the lexical and vector
# rankings (Webber, Moffat & Zobel, TOIS 2010): the standard
# top-weighted agreement measure between two retrieval systems —
# "do dense and sparse retrieval agree, and at which probes do they
# diverge?" — the comparison q93 FUSES and q110 EVALUATES, measured
# directly.
#
#   RBO@D(p) = (1-p) * sum_{d=1..D} p^(d-1) * |A_1..d ∩ B_1..d| / d
#
# Float p^d and /d would break the exact hash gate, so p = 1/2 and
# D = 10 make every term an exact scaled integer: multiplying by
# 2^D * LCM(1..10) = 1024 * 2520 turns the per-depth weight into
# 2^(10-d) * (2520/d), an integer for every d <= 10. A doc matched at
# ranks (ra, rb) enters every depth d >= max(ra, rb), so its total
# contribution is the FROZEN lookup C[max(ra,rb)] = sum_{d=max..D} of
# those integer weights — computed once in driver Python, embedded as
# literals in both engines (the q97 frozen-table idiom). rbo_ppm
# normalizes by the identical-rankings score, exactly.
#
# Scale shape: both rankings are the q93/q110 shared legs (broadcast
# probes; the shingle index); the RBO math itself runs on <= D rows
# per probe — one equi-join + one hash agg, no windows beyond the
# rankings' own.
# ---------------------------------------------------------------------------

_Q150_D = 10
_Q150_LCM = 2520  # LCM(1..10)
# C[m] = sum_{d=m..D} 2^(D-d) * (LCM/d): total scaled weight a doc
# matched at depth m contributes across all deeper prefixes.
_Q150_C = {
    m: sum((1 << (_Q150_D - d)) * (_Q150_LCM // d) for d in range(m, _Q150_D + 1))
    for m in range(1, _Q150_D + 1)
}
# identical-rankings score: I_d = d at every depth.
_Q150_NORM = sum((1 << (_Q150_D - d)) * _Q150_LCM for d in range(1, _Q150_D + 1))


def q150_rbo_rankings(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < N_PROBES).select(
        F.col("vec_id").alias("probe_id")
    )
    a = _lexical_ranking(spark, sf_dir, emb).filter(F.col("lex_rk") <= _Q150_D)
    b = _vector_ranking(emb).filter(F.col("vec_rk") <= _Q150_D)
    cmap = F.create_map(
        *[F.lit(x) for kv in _Q150_C.items() for x in kv]
    )
    matched = (
        a.join(b, ["probe_id", "doc_id"])
        .select(
            "probe_id",
            F.greatest("lex_rk", "vec_rk").alias("m"),
        )
        .select("probe_id", cmap[F.col("m")].alias("c"))
    )
    per_probe = matched.groupBy("probe_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_common"),
        F.sum("c").cast("long").alias("rbo_scaled"),
    )
    return (
        probes.join(per_probe, "probe_id", "left")
        .select(
            "probe_id",
            F.coalesce("n_common", F.lit(0)).cast("long").alias("n_common"),
            F.coalesce("rbo_scaled", F.lit(0)).cast("long").alias("rbo_scaled"),
            F.expr(
                f"CAST(coalesce(rbo_scaled, 0) * 1000000 DIV {_Q150_NORM} AS BIGINT)"
            ).alias("rbo_ppm"),
        )
        .orderBy("probe_id")
    )


def _q150_sql() -> str:
    c_case = " ".join(f"WHEN {m} THEN {c}" for m, c in _Q150_C.items())
    return rf"""
WITH p AS (
  SELECT vec_id AS probe_id, CAST(embedding AS DOUBLE[]) AS pe
  FROM embeddings WHERE vec_id < {N_PROBES}
),
vec AS (
  SELECT probe_id, vec_id AS doc_id, t_rk AS vec_rk FROM (
    SELECT p.probe_id, e.vec_id,
           row_number() OVER (
             PARTITION BY p.probe_id
             ORDER BY round(list_cosine_similarity(p.pe, CAST(e.embedding AS DOUBLE[])), 6) DESC,
                      e.vec_id) AS t_rk
    FROM embeddings e CROSS JOIN p
    WHERE e.vec_id != p.probe_id
  ) WHERE t_rk <= {_Q150_D}
),
toks AS (
  SELECT doc_id, string_split_regex(lower(text), '\s+') AS t
  FROM documents WHERE doc_id IN (SELECT vec_id FROM embeddings)
),
sh AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, greatest(len(t) - 1, 1)),
           i -> concat_ws(' ', t[i], t[i+1], t[i+2]))) AS s
  FROM toks WHERE len(t) >= 3
),
inv AS (SELECT doc_id, UNNEST(s) AS shingle FROM sh),
lex AS (
  SELECT probe_id, doc_id, rk AS lex_rk FROM (
    SELECT a.doc_id AS probe_id, b.doc_id AS doc_id,
           row_number() OVER (PARTITION BY a.doc_id
                              ORDER BY COUNT(*) DESC, b.doc_id) AS rk
    FROM inv a JOIN inv b ON a.shingle = b.shingle AND a.doc_id != b.doc_id
    WHERE a.doc_id < {N_PROBES}
    GROUP BY a.doc_id, b.doc_id
  ) WHERE rk <= {_Q150_D}
),
matched AS (
  SELECT l.probe_id,
         CASE GREATEST(l.lex_rk, v.vec_rk) {c_case} END AS c
  FROM lex l JOIN vec v ON l.probe_id = v.probe_id AND l.doc_id = v.doc_id
),
per_probe AS (
  SELECT probe_id, COUNT(*) AS n_common, SUM(c) AS rbo_scaled
  FROM matched GROUP BY probe_id
)
SELECT p.probe_id,
       CAST(COALESCE(pp.n_common, 0) AS BIGINT) AS n_common,
       CAST(COALESCE(pp.rbo_scaled, 0) AS BIGINT) AS rbo_scaled,
       CAST(COALESCE(pp.rbo_scaled, 0) * 1000000 // {_Q150_NORM} AS BIGINT) AS rbo_ppm
FROM p LEFT JOIN per_probe pp USING (probe_id)
ORDER BY p.probe_id
"""


QUERIES["q150_rbo_rankings"] = q150_rbo_rankings
ORACLES["q150_rbo_rankings"] = _q150_sql()
