"""Classifier-evaluation operators (round 7): the metrics a curation
pipeline runs AFTER serving a quality classifier (q77) over the corpus
— does the score actually rank good documents above bad ones (AUC), do
two labelers agree beyond chance (Cohen's kappa), and is the score
calibrated (reliability / ECE)?

The reference validates its per-row derived fields by eyeballing
counts (/root/reference/test.py:120-133); the 100 TB generalization is
classifier evaluation as a first-class scan-shaped operator family.
All three metrics are EXACT INTEGER arithmetic end to end (1e-6
units), so both engines emit identical values at any partitioning:

  q128  ROC-AUC via the Mann-Whitney U statistic with mid-rank tie
        handling, computed from the per-score histogram (NOT a global
        sort): AUC = [sum over scores s of n_pos(s) * (2*cum_neg(<s)
        + n_neg(s))] / (2 * n_pos * n_neg).
  q129  Cohen's kappa between the served classifier's 3-class label
        and an independent rule-based labeler: kappa = (n*agree -
        sum_k row_k*col_k) / (n^2 - sum_k row_k*col_k).
  q130  Reliability diagram + expected calibration error: the score's
        exact percent-rank (from the same histogram idiom) bucketed
        into deciles; per-bin predicted-vs-actual gap and the
        n-weighted ECE total row.

The model under evaluation is q77's hashing-trick linear classifier
(classify.py — frozen arithmetic weights, no side files); ground truth
is the deterministic length rule n_chars >= 300 (the corpus median, so
classes are balanced and AUC is not vacuous).

Scale shape: every metric aggregates the corpus ONCE into a bounded
frame — (source, logit) score histograms for AUC/calibration (distinct
logits << corpus rows), a 3x3 confusion matrix per source for kappa —
and all window functions run over those bounded frames, never over the
corpus. Token strings never shuffle (md5 bucketing is map-side, the
q77 discipline). Wide products (n*agree, pe_num's row_k*col_k terms,
num*1e6) ride DECIMAL(38,0)/HUGEINT, the q97 overflow discipline —
exact to the decimal(38,0) ceiling (~1e38, far past any plausible SF;
per-ppm numerators additionally assume n < 9.2e12 rows ≈ sf 1.8e6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load
from ..functions import text as TXT
from .classify import bucket_weight, sql_md5_prefix_int, token_bucket

_TRUTH_CHARS = 300  # corpus median n_chars: balanced positives/negatives

# q77's serving thresholds, reused for the kappa labeler A
_HI, _LO = 500, -500
# rule-based labeler B: document length terciles (frozen constants)
_B_HI, _B_MID = 400, 200


def _doc_logits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, source, n_chars, logit) — q77's served score joined
    back to the document frame; zero-token docs keep logit 0."""
    docs = load(spark, sf_dir, "documents")
    tok = (
        docs.select("doc_id", F.explode(TXT.tokens(F.col("text"))).alias("token"))
        .filter(F.col("token") != "")
        .select("doc_id", bucket_weight(token_bucket(F.col("token"))).alias("w"))
    )
    scored = tok.groupBy("doc_id").agg(F.sum("w").alias("logit"))
    return docs.select("doc_id", "source", "n_chars").join(
        scored, "doc_id", "left"
    ).select(
        "doc_id",
        "source",
        "n_chars",
        F.coalesce("logit", F.lit(0)).cast("long").alias("logit"),
    )


_SQL_LOGITS = rf"""
  SELECT d.doc_id, d.source, d.n_chars, COALESCE(s.logit, 0) AS logit
  FROM documents d
  LEFT JOIN (
    SELECT doc_id,
           SUM((bkt * 2654435761) % 2003 - 1001) AS logit
    FROM (
      SELECT doc_id, ({sql_md5_prefix_int(4)} % 1024) AS bkt
      FROM (
        SELECT doc_id, md5(tok) AS h
        FROM (
          SELECT doc_id, UNNEST(string_split_regex(lower(text), '\s+')) AS tok
          FROM documents
        ) WHERE tok <> ''
      )
    )
    GROUP BY doc_id
  ) s USING (doc_id)
"""


# ---------------------------------------------------------------------------
# Q128 — exact ROC-AUC (Mann-Whitney with mid-rank ties) per source.
#
# The textbook rank-sum needs a global sort; the scalable form used
# here needs only the per-(source, logit) histogram: for each distinct
# score s, every positive at s beats the negatives strictly below it
# (full credit, 2 units) and half-beats the negatives tied at s
# (1 unit). Summed:
#
#   auc2_num = sum_s n_pos(s) * (2 * cum_neg(<s) + n_neg(s))
#   auc_e6   = auc2_num * 1e6 DIV (2 * n_pos * n_neg)
#
# auc2_num <= 2*n_pos*n_neg <= n^2/2 fits BIGINT to sf ~10^5; the *1e6
# step rides DECIMAL(38,0)/HUGEINT (q97 discipline). Sources with no
# positives or no negatives emit NULL (undefined AUC, kept total).
#
# Scale shape: one corpus aggregation into the (source, logit)
# histogram; the cumulative window runs over that bounded frame
# partitioned by source. At 100 TB the histogram is the only shuffle.
# ---------------------------------------------------------------------------
def q128_roc_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = _doc_logits(spark, sf_dir).select(
        "source",
        "logit",
        (F.col("n_chars") >= _TRUTH_CHARS).cast("long").alias("pos"),
    )
    hist = base.groupBy("source", "logit").agg(
        F.sum("pos").alias("n_p"),
        F.sum(F.lit(1) - F.col("pos")).alias("n_n"),
    )
    w = Window.partitionBy("source").orderBy("logit")
    cum = hist.select(
        "source",
        "logit",
        "n_p",
        "n_n",
        (F.sum("n_n").over(w) - F.col("n_n")).alias("cum_neg_below"),
    )
    per_src = cum.groupBy("source").agg(
        F.sum("n_p").cast("long").alias("n_pos"),
        F.sum("n_n").cast("long").alias("n_neg"),
        F.sum(
            F.col("n_p") * (F.lit(2) * F.col("cum_neg_below") + F.col("n_n"))
        )
        .cast("long")
        .alias("auc2_num"),
    )
    return per_src.select(
        "source",
        "n_pos",
        "n_neg",
        "auc2_num",
        F.expr(
            "CASE WHEN n_pos = 0 OR n_neg = 0 THEN NULL"
            " ELSE CAST(CAST(auc2_num AS DECIMAL(38,0)) * 1000000"
            " DIV (2 * CAST(n_pos AS DECIMAL(38,0)) * n_neg) AS BIGINT) END"
        ).alias("auc_e6"),
    ).orderBy("source")


Q128_SQL = rf"""
WITH base AS (
  SELECT source, logit,
         CASE WHEN n_chars >= {_TRUTH_CHARS} THEN 1 ELSE 0 END AS pos
  FROM ({_SQL_LOGITS})
),
hist AS (
  SELECT source, logit, SUM(pos) AS n_p, SUM(1 - pos) AS n_n
  FROM base GROUP BY source, logit
),
cum AS (
  SELECT source, logit, n_p, n_n,
         SUM(n_n) OVER (PARTITION BY source ORDER BY logit) - n_n
           AS cum_neg_below
  FROM hist
),
per_src AS (
  SELECT source,
         CAST(SUM(n_p) AS BIGINT) AS n_pos,
         CAST(SUM(n_n) AS BIGINT) AS n_neg,
         CAST(SUM(n_p * (2 * cum_neg_below + n_n)) AS BIGINT) AS auc2_num
  FROM cum GROUP BY source
)
SELECT source, n_pos, n_neg, auc2_num,
       CASE WHEN n_pos = 0 OR n_neg = 0 THEN NULL
            ELSE CAST(CAST(auc2_num AS HUGEINT) * 1000000
                      // (2 * CAST(n_pos AS HUGEINT) * n_neg) AS BIGINT) END
         AS auc_e6
FROM per_src
ORDER BY source
"""


# ---------------------------------------------------------------------------
# Q129 — Cohen's kappa inter-annotator agreement per source.
#
# Labeler A = q77's served 3-class head (logit thresholds +-500);
# labeler B = an independent rule (document length terciles). Chance-
# corrected agreement, exactly:
#
#   kappa_e6 = (n*agree - sum_k row_k*col_k) * 1e6
#              DIV (n^2 - sum_k row_k*col_k)
#
# computed from the per-source 3x3 confusion matrix — the corpus
# aggregates ONCE into <= 9 cells per source; marginals and kappa are
# arithmetic over that dim-scale frame. n*agree and n^2 ride
# DECIMAL(38,0)/HUGEINT. Perfect-chance sources (pe = 1, denominator
# 0) emit NULL.
# ---------------------------------------------------------------------------
def q129_cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = _doc_logits(spark, sf_dir).select(
        "source",
        F.when(F.col("logit") >= _HI, "high")
        .when(F.col("logit") <= _LO, "low")
        .otherwise("mid")
        .alias("a"),
        F.when(F.col("n_chars") >= _B_HI, "high")
        .when(F.col("n_chars") >= _B_MID, "mid")
        .otherwise("low")
        .alias("b"),
    )
    cells = base.groupBy("source", "a", "b").agg(
        F.count(F.lit(1)).alias("c")
    ).localCheckpoint(eager=False)  # <= 9 rows/source feed three branches
    # marginal frames joined on the class label k — NOT read off the
    # diagonal cells (a class with zero (k,k) agreements but nonzero
    # marginals still contributes row_k*col_k to chance agreement)
    rows = cells.groupBy("source", F.col("a").alias("k")).agg(
        F.sum("c").alias("row_n")
    )
    cols = cells.groupBy("source", F.col("b").alias("k")).agg(
        F.sum("c").alias("col_n")
    )
    pe = (
        rows.join(cols, ["source", "k"])
        .groupBy("source")
        .agg(
            # DECIMAL(38,0) per term, the q97 discipline — raw BIGINT
            # sums would wrap silently past ~3e9 docs/source while the
            # HUGEINT oracle kept going (ADVICE r7).
            F.sum(
                F.col("row_n").cast("decimal(38,0)") * F.col("col_n")
            ).alias("pe_num")
        )
    )
    per_src = cells.groupBy("source").agg(
        F.sum("c").cast("long").alias("n"),
        F.sum(F.when(F.col("a") == F.col("b"), F.col("c")).otherwise(0))
        .cast("long")
        .alias("agree"),
    ).join(pe, "source")
    return per_src.select(
        "source",
        "n",
        "agree",
        F.expr("CAST(agree * 1000000 DIV n AS BIGINT)").alias("po_e6"),
        F.expr(
            "CAST(CAST(pe_num AS DECIMAL(38,0)) * 1000000"
            " DIV (CAST(n AS DECIMAL(38,0)) * n) AS BIGINT)"
        ).alias("pe_e6"),
        F.expr(
            "CASE WHEN CAST(n AS DECIMAL(38,0)) * n = pe_num THEN NULL"
            " ELSE CAST((CAST(n AS DECIMAL(38,0)) * agree - pe_num) * 1000000"
            " DIV (CAST(n AS DECIMAL(38,0)) * n - pe_num) AS BIGINT) END"
        ).alias("kappa_e6"),
    ).orderBy("source")


Q129_SQL = rf"""
WITH base AS (
  SELECT source,
         CASE WHEN logit >= {_HI} THEN 'high'
              WHEN logit <= {_LO} THEN 'low' ELSE 'mid' END AS a,
         CASE WHEN n_chars >= {_B_HI} THEN 'high'
              WHEN n_chars >= {_B_MID} THEN 'mid' ELSE 'low' END AS b
  FROM ({_SQL_LOGITS})
),
cells AS (
  SELECT source, a, b, COUNT(*) AS c FROM base GROUP BY source, a, b
),
pe AS (
  SELECT source, SUM(CAST(row_n AS HUGEINT) * col_n) AS pe_num
  FROM (SELECT source, a AS k, SUM(c) AS row_n FROM cells GROUP BY source, a) r
  JOIN (SELECT source, b AS k, SUM(c) AS col_n FROM cells GROUP BY source, b) cl
    USING (source, k)
  GROUP BY source
),
per_src AS (
  SELECT source,
         CAST(SUM(c) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN a = b THEN c ELSE 0 END) AS BIGINT) AS agree
  FROM cells GROUP BY source
)
, per_src2 AS (
  SELECT p.source, p.n, p.agree, pe.pe_num
  FROM per_src p JOIN pe USING (source)
)
SELECT source, n, agree,
       CAST(agree * 1000000 // n AS BIGINT) AS po_e6,
       CAST(CAST(pe_num AS HUGEINT) * 1000000
            // (CAST(n AS HUGEINT) * n) AS BIGINT) AS pe_e6,
       CASE WHEN CAST(n AS HUGEINT) * n = pe_num THEN NULL
            ELSE CAST((CAST(n AS HUGEINT) * agree - pe_num) * 1000000
                      // (CAST(n AS HUGEINT) * n - pe_num) AS BIGINT) END
         AS kappa_e6
FROM per_src2
ORDER BY source
"""


# ---------------------------------------------------------------------------
# Q130 — reliability diagram + expected calibration error.
#
# The served score is rank-calibrated first (the honest way to turn an
# uncalibrated linear logit into a probability without fitting a
# model): pred_ppm = exact percent-rank of the logit over the corpus =
# cum_below * 1e6 DIV (n-1), computed from the GLOBAL logit histogram
# (bounded frame — never a corpus sort) and joined back by logit.
# Deciles of pred_ppm -> per-bin (n, mean predicted, actual positive
# rate, |gap|), plus the n-weighted ECE as a bin = -1 total row:
#
#   ece_ppm = sum_b n_b * |gap_b| DIV n
#
# All quantities <= n * 1e6 — BIGINT-safe to n < 9.2e12 rows (sf
# ~1.8e6). A perfectly rank-calibrated uniform score has gap ~ 0 in
# every bin iff truth is independent of rank — so nonzero gaps here
# measure real miscalibration of the q77 score against the length
# criterion, not arithmetic noise.
# ---------------------------------------------------------------------------
def q130_calibration_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = _doc_logits(spark, sf_dir).select(
        "logit", (F.col("n_chars") >= _TRUTH_CHARS).cast("long").alias("pos")
    )
    hist = base.groupBy("logit").agg(
        F.count(F.lit(1)).alias("cnt"), F.sum("pos").alias("n_pos")
    )
    w = Window.orderBy("logit")  # bounded: distinct logits, not corpus rows
    ranked = hist.select(
        "logit",
        "cnt",
        "n_pos",
        (F.sum("cnt").over(w) - F.col("cnt")).alias("cum_below"),
        F.sum("cnt").over(Window.partitionBy()).alias("n_total"),
    ).select(
        "cnt",
        "n_pos",
        # GREATEST(.., 1): on a 1-row corpus Spark DIV 0 yields NULL
        # while DuckDB // raises — n_total=1 makes cum_below 0, so the
        # guard changes nothing except making both engines total.
        F.expr(
            "CAST(cum_below * 1000000 DIV GREATEST(n_total - 1, 1) AS BIGINT)"
        ).alias("pred_ppm"),
        "n_total",
    )
    bins = (
        ranked.select(
            F.least(F.expr("pred_ppm DIV 100000"), F.lit(9)).alias("bin"),
            "cnt",
            "n_pos",
            (F.col("cnt") * F.col("pred_ppm")).alias("pred_mass"),
        )
        .groupBy("bin")
        .agg(
            F.sum("cnt").cast("long").alias("n"),
            F.sum("pred_mass").alias("pred_mass"),
            F.sum("n_pos").alias("pos_mass"),
        )
        .select(
            F.col("bin").cast("long").alias("bin"),
            "n",
            F.expr("CAST(pred_mass DIV n AS BIGINT)").alias("avg_pred_ppm"),
            F.expr("CAST(pos_mass * 1000000 DIV n AS BIGINT)").alias("pos_rate_ppm"),
        )
        .withColumn(
            "gap_ppm", F.abs(F.col("avg_pred_ppm") - F.col("pos_rate_ppm"))
        )
        .localCheckpoint(eager=False)  # 10 rows feed both output branches
    )
    total = bins.agg(
        F.lit(-1).cast("long").alias("bin"),
        F.sum("n").cast("long").alias("n"),
        F.expr("CAST(SUM(n * avg_pred_ppm) DIV SUM(n) AS BIGINT)").alias(
            "avg_pred_ppm"
        ),
        F.expr("CAST(SUM(n * pos_rate_ppm) DIV SUM(n) AS BIGINT)").alias(
            "pos_rate_ppm"
        ),
        F.expr("CAST(SUM(n * gap_ppm) DIV SUM(n) AS BIGINT)").alias("gap_ppm"),
    )
    return bins.unionByName(total).orderBy("bin")


Q130_SQL = rf"""
WITH base AS (
  SELECT logit,
         CASE WHEN n_chars >= {_TRUTH_CHARS} THEN 1 ELSE 0 END AS pos
  FROM ({_SQL_LOGITS})
),
hist AS (
  SELECT logit, COUNT(*) AS cnt, SUM(pos) AS n_pos FROM base GROUP BY logit
),
ranked AS (
  SELECT cnt, n_pos,
         CAST((SUM(cnt) OVER (ORDER BY logit) - cnt) * 1000000
              // GREATEST(SUM(cnt) OVER () - 1, 1) AS BIGINT) AS pred_ppm
  FROM hist
),
bins AS (
  SELECT CAST(LEAST(pred_ppm // 100000, 9) AS BIGINT) AS bin,
         CAST(SUM(cnt) AS BIGINT) AS n,
         CAST(SUM(cnt * pred_ppm) // SUM(cnt) AS BIGINT) AS avg_pred_ppm,
         CAST(SUM(n_pos) * 1000000 // SUM(cnt) AS BIGINT) AS pos_rate_ppm
  FROM ranked GROUP BY 1
),
gapped AS (
  SELECT bin, n, avg_pred_ppm, pos_rate_ppm,
         CAST(abs(avg_pred_ppm - pos_rate_ppm) AS BIGINT) AS gap_ppm
  FROM bins
)
SELECT bin, n, avg_pred_ppm, pos_rate_ppm, gap_ppm FROM gapped
UNION ALL
SELECT CAST(-1 AS BIGINT), CAST(SUM(n) AS BIGINT),
       CAST(SUM(n * avg_pred_ppm) // SUM(n) AS BIGINT),
       CAST(SUM(n * pos_rate_ppm) // SUM(n) AS BIGINT),
       CAST(SUM(n * gap_ppm) // SUM(n) AS BIGINT)
FROM gapped
ORDER BY bin
"""


QUERIES = {
    "q128_roc_auc": q128_roc_auc,
    "q129_cohens_kappa": q129_cohens_kappa,
    "q130_calibration_audit": q130_calibration_audit,
}
ORACLES = {
    "q128_roc_auc": Q128_SQL,
    "q129_cohens_kappa": Q129_SQL,
    "q130_calibration_audit": Q130_SQL,
}


# ---------------------------------------------------------------------------
# Q143 — precision-recall sweep + average precision per source (r9).
#
# q128 answers "does the score rank positives above negatives" (AUC);
# this operator answers the deployment question AUC dodges: WHERE to
# put the threshold, and what precision/recall the corpus pays there.
# From the same (source, logit) histogram, scanning thresholds from
# the highest logit down:
#
#   tp_k, fp_k       cumulative positives/negatives at threshold k
#   precision_ppm_k  = tp_k * 1e6 DIV (tp_k + fp_k)
#   f1_ppm_k         = 2*tp_k * 1e6 DIV (tp_k + fp_k + P)
#   ap_ppm           = ( sum_k n_pos_k * tp_k * 1e6 DIV (tp_k+fp_k) )
#                      DIV P
#
# AP is the step-integral sum over threshold groups of delta-recall x
# precision; the inner floor-divide is PART OF THE DECLARED METRIC
# (integer-exact discipline — both engines floor identically, and the
# bias is < 1e-6 per threshold group). Reported per source: the
# operating point with max F1 (ties -> the higher logit, i.e. the
# more conservative threshold) and AP. Wide products (n_pos_k * tp_k *
# 1e6 ~ 1e20 at sf10) ride DECIMAL(38,0)/HUGEINT (q97 discipline).
#
# Scale shape (100 TB): one corpus aggregation into the bounded
# (source, logit) histogram (distinct logits << corpus rows); the
# cumulative window and the argmax both run over that bounded frame.
# ---------------------------------------------------------------------------


def q143_pr_curve_ap(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = _doc_logits(spark, sf_dir).select(
        "source",
        "logit",
        (F.col("n_chars") >= _TRUTH_CHARS).cast("long").alias("pos"),
    )
    hist = base.groupBy("source", "logit").agg(
        F.sum("pos").alias("n_p"),
        F.sum(1 - F.col("pos")).alias("n_n"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy(F.desc("logit"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = (
        hist.withColumn("tp", F.sum("n_p").over(w))
        .withColumn("fp", F.sum("n_n").over(w))
        .withColumn("p_total", F.sum("n_p").over(Window.partitionBy("source")))
    )
    pts = cum.select(
        "source",
        "logit",
        "n_p",
        "tp",
        "fp",
        "p_total",
        F.expr(
            "CAST(CAST(n_p AS DECIMAL(38,0)) * tp * 1000000 div (tp + fp) AS DECIMAL(38,0))"
        ).alias("ap_term"),
        F.expr(
            # Widen to DECIMAL(38,0) BEFORE the multiply: the oracle rides
            # HUGEINT here, and 2*tp*1e6 overflows BIGINT once tp > ~4.6e12
            # (reachable at the 100 TB design point even though the final
            # ppm ratio always fits BIGINT).
            "CAST(2 * CAST(tp AS DECIMAL(38,0)) * 1000000"
            " div (tp + fp + p_total) AS BIGINT)"
        ).alias("f1_ppm"),
    )
    return (
        pts.groupBy("source")
        .agg(
            F.max("p_total").cast("long").alias("n_pos"),
            F.count(F.lit(1)).cast("long").alias("n_thresholds"),
            F.expr("CAST(CAST(sum(ap_term) AS DECIMAL(38,0)) div max(p_total) AS BIGINT)").alias("ap_ppm"),
            F.max("f1_ppm").alias("best_f1_ppm"),
            F.expr("max_by(logit, struct(f1_ppm, logit))").cast("long").alias(
                "best_f1_logit"
            ),
        )
        .orderBy("source")
    )


Q143_SQL = rf"""
WITH base AS (
  SELECT source, logit,
         CASE WHEN n_chars >= {_TRUTH_CHARS} THEN 1 ELSE 0 END AS pos
  FROM ({_SQL_LOGITS})
),
hist AS (
  SELECT source, logit, SUM(pos) AS n_p, SUM(1 - pos) AS n_n
  FROM base GROUP BY source, logit
),
cum AS (
  SELECT source, logit, n_p,
         SUM(n_p) OVER w AS tp,
         SUM(n_n) OVER w AS fp,
         SUM(n_p) OVER (PARTITION BY source) AS p_total
  FROM hist
  WINDOW w AS (PARTITION BY source ORDER BY logit DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
pts AS (
  SELECT source, logit, n_p, tp, fp, p_total,
         CAST(n_p AS HUGEINT) * tp * 1000000 // (tp + fp) AS ap_term,
         CAST(2 * CAST(tp AS HUGEINT) * 1000000 // (tp + fp + p_total) AS BIGINT) AS f1_ppm
  FROM cum
)
SELECT source,
       CAST(MAX(p_total) AS BIGINT) AS n_pos,
       CAST(COUNT(*) AS BIGINT) AS n_thresholds,
       CAST(SUM(ap_term) // CAST(MAX(p_total) AS HUGEINT) AS BIGINT) AS ap_ppm,
       CAST(MAX(f1_ppm) AS BIGINT) AS best_f1_ppm,
       CAST(ANY_VALUE(best_logit) AS BIGINT) AS best_f1_logit
FROM pts
JOIN (
  SELECT source AS bsrc, logit AS best_logit FROM (
    SELECT source, logit,
           row_number() OVER (PARTITION BY source
                              ORDER BY f1_ppm DESC, logit DESC) AS rk
    FROM pts
  ) WHERE rk = 1
) b ON pts.source = b.bsrc
GROUP BY source
ORDER BY source
"""

QUERIES["q143_pr_curve_ap"] = q143_pr_curve_ap
ORACLES["q143_pr_curve_ap"] = Q143_SQL
