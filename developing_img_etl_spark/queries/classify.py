"""Q77 — hashing-trick linear classifier inference (fastText-shape
model serving) over ``documents``.

The reference scores corpus rows with per-row heuristics
(`/root/reference/test.py:94-118` builds per-row derived quality
fields); the LLM-pipeline generalization is a LINEAR text classifier
served at corpus scale: the quality/toxicity/language classifiers in
C4/CCNet-style curation are (near-)linear models over hashed bag-of-
words features, and serving one over 100 TB is a pure scan-shaped
job — no model server, no Python.

Implementation (both engines, bit-identical):
  bucket(token) = int(md5(token)[:4 hex]) mod 1024      (hashing trick)
  weight(b)     = (b * 2654435761) mod 2003 - 1001       (frozen model)
  logit(doc)    = sum over tokens of weight(bucket)      (linear score)
  label         = thresholded logit                      (serving head)

The weight table is a deterministic function of the bucket id, so the
"model" needs no side file and the DuckDB oracle reconstructs it
arithmetically — what a deployment would broadcast as a 1024-row dim
table is here folded into codegen. The hex→int step is ascii()
arithmetic (both engines agree on md5 hex and ascii), NOT an
engine-specific hash — the q53 winnowing portability discipline.

Scale shape: one scan → explode(tokens) → per-token codegen
arithmetic → one doc_id-keyed partial+final hash agg → left join back
to documents (docs with zero tokens keep a zero logit). The only
shuffle moves (doc_id, partial sums); token strings never shuffle
(md5 and bucketing happen map-side before the agg). At 100 TB this is
scan-bound, exactly like serving a real hashed linear model.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load
from ..functions import text as TXT

_N_BUCKETS = 1024
_W_MULT = 2654435761  # Knuth multiplicative constant (public domain)
_W_MOD = 2003
_W_SHIFT = 1001
_HI_THRESHOLD = 500
_LO_THRESHOLD = -500


def _hexval(h: Column, i: int) -> Column:
    """Integer value of the i-th (1-based) lowercase hex char of ``h``."""
    a = F.ascii(F.substring(h, i, 1))
    return a - 48 - F.when(a >= 97, F.lit(39)).otherwise(F.lit(0))


def md5_prefix_int(col: Column, n_hex: int) -> Column:
    """Portable integer from the first ``n_hex`` lowercase hex chars of
    md5(col) — THE cross-engine hash idiom (md5 + ascii arithmetic;
    both engines agree on md5 hex and ascii). The single Spark-side
    home of the digit arithmetic; sql_md5_prefix_int is its one DuckDB
    mirror. n_hex <= 15 keeps the value inside a signed 64-bit long."""
    h = F.md5(col.cast("binary"))
    v: Column = F.lit(0).cast("long")  # accumulate in 64-bit: 8+ hex digits exceed int32
    for i in range(1, n_hex + 1):
        v = v * 16 + _hexval(h, i)
    return v.cast("long")


def token_bucket(token: Column) -> Column:
    """Portable hashing-trick bucket: first 16 bits of md5, mod 1024."""
    return md5_prefix_int(token, 4) % _N_BUCKETS


def bucket_weight(bucket: Column) -> Column:
    """Frozen model weight for a feature bucket (integer, ±1001)."""
    return (bucket * _W_MULT) % _W_MOD - _W_SHIFT


def q77_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    tok = (
        docs.select(
            "doc_id", F.explode(TXT.tokens(F.col("text"))).alias("token")
        )
        .filter(F.col("token") != "")
        .select("doc_id", bucket_weight(token_bucket(F.col("token"))).alias("w"))
    )
    scored = tok.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_toks"), F.sum("w").alias("logit")
    )
    return (
        docs.select("doc_id", "lang", "source")
        .join(scored, "doc_id", "left")
        .select(
            "doc_id",
            "lang",
            "source",
            F.coalesce("n_toks", F.lit(0)).alias("n_toks"),
            F.coalesce("logit", F.lit(0)).alias("logit"),
            F.when(F.coalesce("logit", F.lit(0)) >= _HI_THRESHOLD, "high")
            .when(F.coalesce("logit", F.lit(0)) <= _LO_THRESHOLD, "low")
            .otherwise("mid")
            .alias("pred_label"),
        )
        .orderBy("doc_id")
    )


def _sql_hexval(i: int) -> str:
    a = f"ascii(substr(h, {i}, 1))"
    return f"({a} - 48 - CASE WHEN {a} >= 97 THEN 39 ELSE 0 END)"


def sql_md5_prefix_int(n_hex: int) -> str:
    """DuckDB mirror of md5_prefix_int (same digit arithmetic) over a
    column named ``h`` that the caller's SQL must bind to md5(<expr>).
    Digits are widened to BIGINT before the place-value multiply
    (DuckDB ascii() is INT32; 16^7 · 15 overflows it)."""
    parts = []
    for i in range(1, n_hex + 1):
        digit = f"CAST({_sql_hexval(i)} AS BIGINT)"
        parts.append(f"{digit} * {16 ** (n_hex - i)}" if i < n_hex else digit)
    return "(" + " + ".join(parts) + ")"


_SQL_BUCKET = f"({sql_md5_prefix_int(4)} % {_N_BUCKETS})"

Q77_SQL = rf"""
WITH tok AS (
  SELECT doc_id, UNNEST(string_split_regex(lower(text), '\s+')) AS token
  FROM documents
),
feat AS (
  SELECT doc_id, {_SQL_BUCKET} AS bucket
  FROM (SELECT doc_id, md5(token) AS h FROM tok WHERE token <> '')
),
scored AS (
  SELECT doc_id,
         COUNT(*) AS n_toks,
         SUM(bucket * {_W_MULT} % {_W_MOD} - {_W_SHIFT}) AS logit
  FROM feat GROUP BY doc_id
)
SELECT d.doc_id, d.lang, d.source,
       CAST(COALESCE(s.n_toks, 0) AS BIGINT) AS n_toks,
       CAST(COALESCE(s.logit, 0) AS BIGINT) AS logit,
       CASE WHEN COALESCE(s.logit, 0) >= {_HI_THRESHOLD} THEN 'high'
            WHEN COALESCE(s.logit, 0) <= {_LO_THRESHOLD} THEN 'low'
            ELSE 'mid' END AS pred_label
FROM documents d LEFT JOIN scored s USING (doc_id)
ORDER BY d.doc_id
"""


QUERIES = {"q77_quality_classifier": q77_quality_classifier}
ORACLES = {"q77_quality_classifier": Q77_SQL}


def log_bucket_expr(v: str) -> str:
    """Spark SQL form of the q113 base-2 log bucket of a positive
    integer expression ``v`` (must be >= 16 so bitlen >= 5):

        16*bitlen(v) + 4 sub-mantissa bits  ~  16*log2(v) + 16

    A monotone, exactly-integer stand-in for 16*log2(v) shared by q113
    (DDSketch-style histogram buckets), q117 (token surprisal) and
    q118 (importance log-ratios) — no floating-point log anywhere, so
    both engines agree bit-for-bit. sql_log_bucket_expr is the one
    DuckDB mirror."""
    return f"16 * length(bin({v})) + (shiftright({v}, length(bin({v})) - 5) - 16)"


def sql_log_bucket_expr(v: str) -> str:
    """DuckDB mirror of log_bucket_expr (same arithmetic, >> for
    shiftright)."""
    return f"16 * length(bin({v})) + (({v} >> (length(bin({v})) - 5)) - 16)"


def cumulate_histogram(hist: DataFrame, key: str, *parts: str, n: str = "n") -> DataFrame:
    """Append running totals to a bounded-domain histogram frame
    ``(…parts, key, n)`` → adds ``cum`` (inclusive running count in
    ``key`` order within ``parts``), ``n_total`` (partition total) and
    ``base`` (exclusive running count = cum - n).

    The ONE home of the cumulative-histogram/threshold machinery
    shared by q67 (distributed NTILE deciles), q113 (quantile-sketch
    rank lookup) and q117 (perplexity tercile cutoffs) — VERDICT r4
    #8. Scale shape: the input is already the aggregated histogram
    (|distinct keys| rows, bounded by the key domain — NEVER the
    corpus), so these windows sort kilobytes regardless of data
    volume; the one data-sized hash agg happens upstream at each call
    site."""
    w_cum = (
        Window.partitionBy(*parts).orderBy(key).rowsBetween(Window.unboundedPreceding, 0)
    )
    w_tot = Window.partitionBy(*parts)
    return hist.select(
        *parts,
        key,
        n,
        F.sum(n).over(w_cum).alias("cum"),
        F.sum(n).over(w_tot).alias("n_total"),
    ).withColumn("base", F.col("cum") - F.col(n))


def epoch_day(col: Column) -> Column:
    """Days since 1970-01-01 of a timestamp/date column — the single
    Spark-side home of the cross-engine epoch-day idiom (q99, q105);
    sql_epoch_day is its one DuckDB mirror."""
    return F.datediff(F.to_date(col), F.lit("1970-01-01").cast("date"))


def sql_epoch_day(sql_expr: str) -> str:
    """DuckDB mirror of epoch_day over a SQL expression."""
    return f"date_diff('day', DATE '1970-01-01', CAST({sql_expr} AS DATE))"
