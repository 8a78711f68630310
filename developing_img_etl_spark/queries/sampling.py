"""Q26 — deterministic sampling / data mixing / split (training-data
mandate), driving operators/sampling.py under the driver's hash gate.

The production operators hash with xxhash64, which DuckDB cannot
reproduce; the declared query passes a portable Knuth multiplicative
hash through the operators' `bucket` override so the oracle can mirror
the arithmetic bit-for-bit (pure BIGINT ops, overflow-free at any
realistic doc_id). The xxhash64 path itself is pinned by pytest
(retry/partitioning determinism, rate tolerance, split disjointness).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..operators.sampling import stratified_sample, train_test_split

_K = 2654435761  # Knuth multiplicative constant
_SEED = 7
_BUCKETS = 1_000_000

# data-mixing weights: two boosted sources, two mid, long tail at 5%
_RATES = {"src0": 0.5, "src1": 0.5, "src2": 0.2, "src3": 0.2}
_DEFAULT_RATE = 0.05


def _portable_bucket():
    return F.pmod(F.col("doc_id") * F.lit(_K) + F.lit(_SEED), F.lit(_BUCKETS))


def q26_deterministic_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    bucket = _portable_bucket()
    sampled = stratified_sample(
        docs, "source", _RATES, key_col="doc_id",
        default_rate=_DEFAULT_RATE, bucket=bucket,
    )
    split = train_test_split(
        docs, "doc_id", test_frac=0.1, val_frac=0.1, bucket=bucket
    )
    per_split = split.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum((F.col("split") == "test").cast("long")).alias("n_test"),
        F.sum((F.col("split") == "val").cast("long")).alias("n_val"),
        F.sum((F.col("split") == "train").cast("long")).alias("n_train"),
    )
    n_sampled = sampled.groupBy("source").agg(F.count(F.lit(1)).alias("n_sampled"))
    return (
        per_split.join(n_sampled, "source", "left")
        .select(
            "source",
            "n_docs",
            F.coalesce("n_sampled", F.lit(0)).alias("n_sampled"),
            "n_test",
            "n_val",
            "n_train",
        )
        .orderBy("source")
    )


Q26_SQL = f"""
WITH h AS (
  SELECT source,
         (doc_id * {_K} + {_SEED}) % {_BUCKETS} AS b
  FROM documents
)
SELECT source,
       COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN b < CASE WHEN source IN ('src0', 'src1') THEN 500000
                                   WHEN source IN ('src2', 'src3') THEN 200000
                                   ELSE 50000 END
                THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
       CAST(SUM(CASE WHEN b < 100000 THEN 1 ELSE 0 END) AS BIGINT) AS n_test,
       CAST(SUM(CASE WHEN b >= 100000 AND b < 200000 THEN 1 ELSE 0 END) AS BIGINT) AS n_val,
       CAST(SUM(CASE WHEN b >= 200000 THEN 1 ELSE 0 END) AS BIGINT) AS n_train
FROM h
GROUP BY source
ORDER BY source
"""


QUERIES = {"q26_deterministic_sampling": q26_deterministic_sampling}
ORACLES = {"q26_deterministic_sampling": Q26_SQL}


# ---------------------------------------------------------------------------
# Q57 — exactly-k-per-group deterministic sampling (the reservoir-
# sampling contract, rank-by-hash construction: operators/sampling.py::
# group_topk_sample). q26's Bernoulli gives binomial group sizes; this
# guarantees EXACTLY k docs per source (balanced eval subsets). The
# declared query emits the selected doc_ids' aggregate (count, id sum,
# char sum) per source, so a single different selection anywhere
# hash-mismatches; portable-hash bucket as in q26, xxhash64 path pinned
# by pytest.
# ---------------------------------------------------------------------------
_TOPK = 7


def q57_group_topk_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sampling import group_topk_sample

    docs = load(spark, sf_dir, "documents")
    picked = group_topk_sample(
        docs, "source", "doc_id", _TOPK, bucket=_portable_bucket()
    )
    return (
        picked.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_picked"),
            F.sum("doc_id").alias("picked_id_sum"),
            F.sum("n_chars").cast("long").alias("picked_chars"),
        )
        .orderBy("source")
    )


Q57_SQL = f"""
WITH h AS (
  SELECT source, doc_id, n_chars,
         (doc_id * {_K} + {_SEED}) % {_BUCKETS} AS b
  FROM documents
),
ranked AS (
  SELECT source, doc_id, n_chars,
         row_number() OVER (PARTITION BY source ORDER BY b, doc_id) AS rk
  FROM h
)
SELECT source,
       COUNT(*) AS n_picked,
       CAST(SUM(doc_id) AS BIGINT) AS picked_id_sum,
       CAST(SUM(n_chars) AS BIGINT) AS picked_chars
FROM ranked
WHERE rk <= {_TOPK}
GROUP BY source
ORDER BY source
"""

QUERIES["q57_group_topk_sample"] = q57_group_topk_sample
ORACLES["q57_group_topk_sample"] = Q57_SQL


# ---------------------------------------------------------------------------
# Q65 — split/label balance audit (training-data QA): after a
# deterministic train/val/test split, verify the LABEL distribution is
# preserved in every split — a skewed eval split silently mismeasures
# the model. Joins documents to their embedding labels (the cross-modal
# key contract: doc_id == vec_id), splits by the portable hash (q26's
# bucket seam; xxhash64 is the production path), and reports per
# (split, label) counts plus each label's within-split share as an
# integer ppm ratio (engine-exact, no float drift).
# ---------------------------------------------------------------------------
def q65_split_label_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select("doc_id")
    emb = load(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("doc_id"), "label"
    )
    joined = docs.join(emb, "doc_id")
    split = train_test_split(
        joined, "doc_id", test_frac=0.1, val_frac=0.1, bucket=_portable_bucket()
    )
    per = split.groupBy("split", "label").agg(F.count(F.lit(1)).alias("n"))
    return per.select(
        "split",
        "label",
        "n",
        F.expr("n * 1000000 DIV SUM(n) OVER (PARTITION BY split)")
        .cast("long")
        .alias("share_ppm"),
    ).orderBy("split", "label")


Q65_SQL = f"""
WITH j AS (
  SELECT d.doc_id, e.label,
         (d.doc_id * {_K} + {_SEED}) % {_BUCKETS} AS b
  FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
),
s AS (
  SELECT label,
         CASE WHEN b < 100000 THEN 'test'
              WHEN b < 200000 THEN 'val'
              ELSE 'train' END AS split
  FROM j
),
per AS (
  SELECT split, label, COUNT(*) AS n FROM s GROUP BY split, label
)
SELECT split, label, n,
       CAST(n * 1000000 // SUM(n) OVER (PARTITION BY split) AS BIGINT) AS share_ppm
FROM per
ORDER BY split, label
"""

QUERIES["q65_split_label_balance"] = q65_split_label_balance
ORACLES["q65_split_label_balance"] = Q65_SQL


# ---------------------------------------------------------------------------
# Q72 — exactly-k GLOBAL weighted sampling without replacement
# (operators/sampling.py::weighted_topk_sample): the integer-exact
# Efraimidis-Spirakis realization — w hash draws per row, rank by the
# minimum, take the k smallest; pairwise win probability is exactly
# w1/(w1+w2), A-ES's u^(1/w) order in distribution with NO pow/log FP.
# Completes the sampling matrix next to q26 (uniform fraction), q50
# (weighted fraction) and q57 (exactly-k per group). Weight here is
# length-proportional (1 + n_chars//400, capped at 8 draws); the query
# emits the selected rows themselves, so a single different pick
# anywhere hash-mismatches. Portable draw hash through the operator's
# `draw` seam as in q26/q57; the xxhash64 path is pinned by pytest.
# ---------------------------------------------------------------------------
_K2 = 2246822519  # second odd multiplicative constant (draw-index mix)
_WTOPK = 200


def q72_weighted_topk_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sampling import weighted_topk_sample

    docs = load(spark, sf_dir, "documents").withColumn(
        "w",
        F.least(F.lit(1) + F.expr("n_chars DIV 400"), F.lit(8)).cast("int"),
    )
    picked = weighted_topk_sample(
        docs,
        "doc_id",
        "w",
        _WTOPK,
        max_weight=8,
        rank_out="rank_key",
        draw=lambda key, i: F.pmod(key * F.lit(_K) + i * F.lit(_K2) + F.lit(_SEED), F.lit(_BUCKETS)),
    )
    return picked.select(
        "doc_id", "source", "n_chars", "w", F.col("rank_key").cast("long").alias("rank_key")
    ).orderBy("rank_key", "doc_id")


Q72_SQL = f"""
WITH w AS (
  SELECT doc_id, source, n_chars,
         LEAST(1 + n_chars // 400, 8) AS w
  FROM documents
),
d AS (
  SELECT doc_id, source, n_chars, w,
         MIN((doc_id * {_K} + i * {_K2} + {_SEED}) % {_BUCKETS}) AS rank_key
  FROM w, UNNEST(range(1, w.w + 1)) AS t(i)
  GROUP BY doc_id, source, n_chars, w
)
SELECT doc_id, source, n_chars, CAST(w AS INT) AS w, CAST(rank_key AS BIGINT) AS rank_key
FROM d
ORDER BY rank_key, doc_id
LIMIT {_WTOPK}
"""

QUERIES["q72_weighted_topk_sample"] = q72_weighted_topk_sample
ORACLES["q72_weighted_topk_sample"] = Q72_SQL


# ---------------------------------------------------------------------------
# Q104 — largest-remainder (Hamilton) stratified quota allocation.
#
# The sampling matrix (q26 hash split, q50 weighted shares, q57 group
# top-k, q72 exactly-k global, q92 temperature mixing) lacks one
# member: EXACTLY-K stratified sampling with proportional quotas that
# sum to exactly K. Naive floor(K*n_i/N) under-allocates by up to
# (#strata - 1); the largest-remainder method (Hamilton apportionment
# — the seat-allocation algorithm) distributes the shortfall to the
# strata with the largest fractional remainders. All integer: quota_i
# = floor(K*n_i/N) + (1 if remainder-rank <= K - sum(floors)), with
# remainder rank ordered by (K*n_i mod N) DESC, then source for the
# deterministic tie-break.
#
# The per-stratum pick is then the q57 primitive: the quota_i docs
# with the smallest portable md5 hash (deterministic, retry-stable).
# Output audits the allocation: per stratum, population, floor quota,
# remainder, +1 top-ups, final quota, picked count (must equal the
# quota wherever population allows) — and the grand total must be
# exactly K, which the oracle recomputes independently.
#
# Scale shape: stratum sizes are one hash agg (#strata rows — driver
# scale, broadcast back); the pick is one window over docs hashed
# map-side. No stage touches more than (doc_id, source, hash).
# ---------------------------------------------------------------------------

_Q104_K = 100


def q104_stratified_quota_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window
    from .classify import md5_prefix_int

    docs = load(spark, sf_dir, "documents").select("doc_id", "source")
    sizes = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    tot = sizes.agg(F.sum("n_docs").alias("n_total"))
    alloc = (
        sizes.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n_docs",
            "n_total",
            F.expr(f"{_Q104_K} * n_docs div n_total").alias("floor_quota"),
            F.expr(f"({_Q104_K} * n_docs) % n_total").alias("remainder"),
        )
    )
    w_rem = Window.orderBy(F.desc("remainder"), "source")
    w_all = Window.partitionBy(F.lit(1))
    alloc = (
        alloc.withColumn("shortfall", F.lit(_Q104_K) - F.sum("floor_quota").over(w_all))
        .withColumn("rem_rank", F.row_number().over(w_rem))
        .withColumn(
            "quota",
            F.col("floor_quota")
            + F.when(F.col("rem_rank") <= F.col("shortfall"), 1).otherwise(0),
        )
    )
    w_pick = Window.partitionBy("source").orderBy("h", "doc_id")
    picked = (
        docs.select("doc_id", "source", md5_prefix_int(F.col("doc_id").cast("string"), 15).alias("h"))
        .withColumn("pick_rank", F.row_number().over(w_pick))
        .join(F.broadcast(alloc.select("source", "quota")), "source")
        .filter(F.col("pick_rank") <= F.col("quota"))
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_picked"))
    )
    return (
        alloc.join(picked, "source", "left")
        .select(
            "source",
            "n_docs",
            "floor_quota",
            "remainder",
            (F.col("rem_rank") <= F.col("shortfall")).alias("topped_up"),
            "quota",
            F.coalesce("n_picked", F.lit(0)).alias("n_picked"),
        )
        .orderBy("source")
    )


from .classify import sql_md5_prefix_int as _sql_md5p  # noqa: E402

Q104_SQL = rf"""
WITH sizes AS (
  SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source
),
tot AS (SELECT SUM(n_docs) AS n_total FROM sizes),
alloc0 AS (
  SELECT source, n_docs, n_total,
         {_Q104_K} * n_docs // n_total AS floor_quota,
         ({_Q104_K} * n_docs) % n_total AS remainder
  FROM sizes CROSS JOIN tot
),
alloc AS (
  SELECT *,
         {_Q104_K} - SUM(floor_quota) OVER () AS shortfall,
         row_number() OVER (ORDER BY remainder DESC, source) AS rem_rank
  FROM alloc0
),
alloc2 AS (
  SELECT *, floor_quota + CASE WHEN rem_rank <= shortfall THEN 1 ELSE 0 END AS quota
  FROM alloc
),
hashed AS (
  SELECT doc_id, source, {_sql_md5p(15)} AS hv
  FROM (SELECT doc_id, source, md5(CAST(doc_id AS VARCHAR)) AS h FROM documents)
),
picked AS (
  SELECT source, COUNT(*) AS n_picked
  FROM (SELECT source,
               row_number() OVER (PARTITION BY source ORDER BY hv, doc_id) AS pick_rank
        FROM hashed) p
  JOIN alloc2 USING (source)
  WHERE p.pick_rank <= alloc2.quota
  GROUP BY source
)
SELECT a.source,
       CAST(a.n_docs AS BIGINT) AS n_docs,
       CAST(a.floor_quota AS BIGINT) AS floor_quota,
       CAST(a.remainder AS BIGINT) AS remainder,
       a.rem_rank <= a.shortfall AS topped_up,
       CAST(a.quota AS BIGINT) AS quota,
       CAST(COALESCE(p.n_picked, 0) AS BIGINT) AS n_picked
FROM alloc2 a LEFT JOIN picked p USING (source)
ORDER BY a.source
"""

QUERIES["q104_stratified_quota_sample"] = q104_stratified_quota_sample
ORACLES["q104_stratified_quota_sample"] = Q104_SQL
