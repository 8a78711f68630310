"""Q12 family — text analysis + JSON extraction (SURVEY.md §2.11 Q12,
§2.8 M6, F14), over `documents` and `events.props`.

The column logic lives in functions/text.py; each query's oracle
mirrors the exact same formula in DuckDB SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..functions import text as TXT
from ._det import davg, dsum

# ---------------------------------------------------------------------------
# Q12a — token counts per language (A1/A2/M6).
# ---------------------------------------------------------------------------


def q12a_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return (
        docs.select("lang", "source", "n_chars", TXT.token_count(F.col("text")).alias("n_tok"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("total_tokens"),
            davg("n_chars").alias("avg_chars"),
            F.countDistinct("source").alias("n_sources"),
        )
        .orderBy("lang")
    )


Q12A_SQL = r"""
SELECT lang,
       COUNT(*) AS n_docs,
       CAST(SUM(len(string_split_regex(lower(text), '\s+'))) AS BIGINT) AS total_tokens,
       CAST(ROUND(SUM(CAST(n_chars AS DECIMAL(12,4))), 2) AS DOUBLE) / COUNT(*) AS avg_chars,
       COUNT(DISTINCT source) AS n_sources
FROM documents
GROUP BY lang
ORDER BY lang
"""


# ---------------------------------------------------------------------------
# Q12b — JSON field extraction from events.props (F14).
# ---------------------------------------------------------------------------
def q12b_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    return (
        events.select(
            "event_type",
            F.get_json_object("props", "$.k").cast("long").alias("k_val"),
            "value",
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k_val").alias("sum_k"),
            dsum("value").alias("sum_value"),
        )
        .orderBy("event_type")
    )


Q12B_SQL = """
SELECT event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       CAST(ROUND(SUM(CAST(value AS DECIMAL(12,4))), 2) AS DOUBLE) AS sum_value
FROM events
GROUP BY event_type
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# Q12c — per-document quality scoring (M6: token counting, punctuation /
# stopword ratios, quality gate).
# ---------------------------------------------------------------------------
def q12c_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    t = F.col("text")
    return docs.select(
        "doc_id",
        TXT.token_count(t).alias("n_tokens"),
        TXT.subtoken_count(t).alias("n_subtokens"),
        TXT.punct_ratio(t).alias("punct_ratio"),
        TXT.stopword_ratio(t).alias("stopword_ratio"),
        TXT.avg_token_len(t).alias("avg_token_len"),
        TXT.quality_ok(t).alias("quality_ok"),
    ).orderBy("doc_id")


_STOP_SQL = ", ".join(f"'{w}'" for w in TXT.STOPWORDS)

Q12C_SQL = rf"""
WITH base AS (
  SELECT doc_id, text,
         string_split_regex(lower(text), '\s+') AS toks,
         len(string_split_regex(lower(text), '\s+')) AS n_tokens
  FROM documents
)
SELECT doc_id,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS n_subtokens,
       round((length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g'))) * 1.0 / length(text), 6) AS punct_ratio,
       round(len(list_filter(toks, t -> t IN ({_STOP_SQL}))) * 1.0 / n_tokens, 6) AS stopword_ratio,
       round(list_sum(list_transform(toks, t -> length(t))) * 1.0 / n_tokens, 6) AS avg_token_len,
       (n_tokens >= 5 AND n_tokens <= 100000
        AND (length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g'))) * 1.0 / length(text) < 0.1) AS quality_ok
FROM base
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Q12d — language-ID heuristic + normalization fingerprint (M6).
# ---------------------------------------------------------------------------
def q12d_langid_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    t = F.col("text")
    return docs.select(
        "doc_id",
        "lang",
        TXT.lang_id(t).alias("lang_pred"),
        TXT.fingerprint(t).alias("fp"),
    ).orderBy("doc_id")


Q12D_SQL = r"""
SELECT doc_id, lang,
       CASE WHEN regexp_matches(text, '[一-鿿]') THEN 'zh'
            WHEN regexp_matches(text, '[ñ¿¡]') THEN 'es'
            WHEN regexp_matches(text, '[àâçèêëîïôùûœ]') THEN 'fr'
            WHEN regexp_matches(text, '[äöüß]') THEN 'de'
            ELSE 'en' END AS lang_pred,
       md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS fp
FROM documents
ORDER BY doc_id
"""


QUERIES = {
    "q12a_token_stats": q12a_token_stats,
    "q12b_json_extract": q12b_json_extract,
    "q12c_quality_scores": q12c_quality_scores,
    "q12d_langid_fingerprint": q12d_langid_fingerprint,
}

ORACLES = {
    "q12a_token_stats": Q12A_SQL,
    "q12b_json_extract": Q12B_SQL,
    "q12c_quality_scores": Q12C_SQL,
    "q12d_langid_fingerprint": Q12D_SQL,
}


# ---------------------------------------------------------------------------
# Q28 — within-document repetition stats (Gopher-style quality filter):
# top-token fraction (most frequent token / total) and duplicate-bigram
# fraction (1 - distinct/total bigrams). All codegen'd: explode +
# groupBy counts, distinct bigrams via the shingle set — no UDF. Ratios
# mirrored expression-for-expression in the oracle (int inputs, one
# division, round 6) so the hash is stable.
# ---------------------------------------------------------------------------
def q28_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 500)
    tok_counts = (
        docs.select("doc_id", F.explode(TXT.tokens(F.col("text"))).alias("t"))
        .groupBy("doc_id", "t")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .groupBy("doc_id")
        .agg(F.max("cnt").alias("max_cnt"), F.sum("cnt").alias("n_tok"))
    )
    bigrams = docs.select(
        "doc_id", F.size(TXT.shingles(F.col("text"), 2)).alias("n_bigram_distinct")
    )
    out = tok_counts.join(bigrams, "doc_id").filter(F.col("n_tok") >= 2)
    return out.select(
        "doc_id",
        F.col("n_tok").cast("long").alias("n_tok"),
        F.round(F.col("max_cnt") / F.col("n_tok"), 6).alias("top_tok_frac"),
        F.round(
            F.lit(1.0) - F.col("n_bigram_distinct") / (F.col("n_tok") - 1), 6
        ).alias("dup_bigram_frac"),
    ).orderBy("doc_id")


Q28_SQL = r"""
WITH toks AS (
  SELECT doc_id, string_split_regex(lower(text), '\s+') AS t
  FROM documents WHERE doc_id < 500
),
tok_counts AS (
  SELECT doc_id, MAX(cnt) AS max_cnt, SUM(cnt) AS n_tok
  FROM (
    SELECT doc_id, tok, COUNT(*) AS cnt
    FROM (SELECT doc_id, UNNEST(t) AS tok FROM toks)
    GROUP BY doc_id, tok
  )
  GROUP BY doc_id
),
bigrams AS (
  SELECT doc_id,
         len(list_distinct(list_transform(range(1, greatest(len(t), 1)),
           i -> concat_ws(' ', t[i], t[i+1])))) AS n_bigram_distinct
  FROM toks
)
SELECT tc.doc_id,
       CAST(tc.n_tok AS BIGINT) AS n_tok,
       round(tc.max_cnt / tc.n_tok, 6) AS top_tok_frac,
       round(1.0 - bg.n_bigram_distinct / (tc.n_tok - 1), 6) AS dup_bigram_frac
FROM tok_counts tc JOIN bigrams bg USING (doc_id)
WHERE tc.n_tok >= 2
ORDER BY tc.doc_id
"""

QUERIES["q28_repetition_stats"] = q28_repetition_stats
ORACLES["q28_repetition_stats"] = Q28_SQL


# ---------------------------------------------------------------------------
# Q32 — corpus vocabulary head (training-data mandate: tokenizer/vocab
# construction and stopword analysis start from exactly this scan): the
# 20 most frequent tokens with collection frequency and document
# frequency. explode → one groupBy on the token (map-side partial agg
# carries the heavy lifting); ties broken by token so the top-k cut is
# a total order.
# ---------------------------------------------------------------------------
def q32_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", F.explode(TXT.tokens(F.col("text"))).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(
            F.count(F.lit(1)).alias("term_freq"),
            F.countDistinct("doc_id").alias("doc_freq"),
        )
        .orderBy(F.desc("term_freq"), "token")
        .limit(20)
    )


Q32_SQL = r"""
WITH tok AS (
  SELECT doc_id, UNNEST(string_split_regex(lower(text), '\s+')) AS token
  FROM documents
)
SELECT token, COUNT(*) AS term_freq, COUNT(DISTINCT doc_id) AS doc_freq
FROM tok
WHERE token <> ''
GROUP BY token
ORDER BY term_freq DESC, token
LIMIT 20
"""

QUERIES["q32_vocab_topk"] = q32_vocab_topk
ORACLES["q32_vocab_topk"] = Q32_SQL


# ---------------------------------------------------------------------------
# Q53 — document fingerprinting via WINNOWING (training-data mandate:
# "document fingerprinting (rolling hash)"). The winnowing scheme
# (Schleimer/Wilkerson/Aiken, SIGMOD'03 — the MOSS algorithm): slide a
# window of w consecutive k-grams over the document and keep each
# window's MINIMUM gram as a fingerprint; matching documents share
# fingerprints wherever they share a k-gram run >= w, which is how
# plagiarism/overlap detectors prune candidate pairs without all-pairs
# comparison. Deterministic total order = the gram itself (min-string
# winnowing) so both engines select identical fingerprints with no
# engine-specific hash.
#
# Scale shape (r6 rework — the old explode+4-window form was 3.8x
# DuckDB at sf0.1): winnowing is a strictly PER-DOCUMENT computation,
# so it runs entirely array-side — split/bigram/window-min/distinct as
# higher-order functions on the text row, never exploding tokens into
# the shuffle. The only data movement is ONE hash repartition of the
# raw doc rows (cheaper than the old shape's exploded-token window
# sort, and what spreads the per-row array work across cores when the
# local input is a single parquet row group; at cluster scale the scan
# itself provides this parallelism and the exchange coalesces to a
# no-op rebalance). A/B at sf0.1: 1.47s -> 0.9s.
# ---------------------------------------------------------------------------
_WINNOW_K = 2  # tokens per gram
_WINNOW_W = 5  # grams per window


def q53_winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    n = spark.sparkContext.defaultParallelism
    w = _WINNOW_W
    return (
        docs.select("doc_id", "source", "text")
        .repartition(n, "doc_id")
        .select(
            "doc_id",
            "source",
            F.expr(r"filter(split(lower(text), '\\s+'), x -> x != '')").alias("t"),
        )
        .withColumn(
            "grams",
            F.expr(
                "zip_with(slice(t, 1, greatest(size(t)-1, 0)),"
                " slice(t, 2, greatest(size(t)-1, 0)),"
                " (a, b) -> concat(a, ' ', b))"
            ),
        )
        .filter(F.expr(f"size(grams) >= {w}"))  # docs with >= 1 full window
        .withColumn(
            "fps",
            F.expr(
                f"array_sort(array_distinct(transform("
                f"sequence(1, size(grams) - {w - 1}),"
                f" i -> array_min(slice(grams, i, {w})))))"
            ),
        )
        .select(
            "doc_id",
            "source",
            F.expr("size(fps)").cast("long").alias("n_fingerprints"),
            F.md5(F.array_join("fps", "|")).alias("fp_md5"),
        )
        .orderBy("doc_id")
    )


Q53_SQL = rf"""
WITH split AS (
  SELECT doc_id, source, string_split_regex(lower(text), '\s+') AS t
  FROM documents
),
toks AS (
  -- position-preserving unnest (DuckDB lacks WITH ORDINALITY):
  -- lateral range over the list length, index back into the list
  SELECT doc_id, source,
         row_number() OVER (PARTITION BY doc_id ORDER BY r.i) - 1 AS i,
         t[r.i] AS tok
  FROM split, UNNEST(range(1, len(t) + 1)) AS r(i)
  WHERE t[r.i] <> ''
),
grams AS (
  SELECT doc_id, source, i,
         tok || ' ' || lead(tok, 1) OVER (PARTITION BY doc_id ORDER BY i) AS gram,
         lead(tok, 1) OVER (PARTITION BY doc_id ORDER BY i) AS nxt
  FROM toks
),
g2 AS (SELECT doc_id, source, i, gram FROM grams WHERE nxt IS NOT NULL),
winmin AS (
  SELECT doc_id, source, i,
         MIN(gram) OVER (PARTITION BY doc_id ORDER BY i
                         ROWS BETWEEN CURRENT ROW AND {_WINNOW_W - 1} FOLLOWING) AS win_min,
         COUNT(*) OVER (PARTITION BY doc_id) AS n_grams,
         row_number() OVER (PARTITION BY doc_id ORDER BY i) AS rn
  FROM g2
),
fps AS (
  SELECT DISTINCT doc_id, source, win_min AS fp
  FROM winmin
  WHERE rn <= n_grams - {_WINNOW_W - 1}
)
SELECT doc_id, source,
       COUNT(*) AS n_fingerprints,
       md5(string_agg(fp, '|' ORDER BY fp)) AS fp_md5
FROM fps
GROUP BY doc_id, source
ORDER BY doc_id
"""

QUERIES["q53_winnowing_fingerprints"] = q53_winnowing_fingerprints
ORACLES["q53_winnowing_fingerprints"] = Q53_SQL


# ---------------------------------------------------------------------------
# Q54 — BPE-style regex token counting (training-data mandate: "token
# counting (whitespace + a BPE-ish regex)"). Whitespace counts (q12a)
# undercount what a subword tokenizer bills for; the GPT-2 pre-split
# regex family is the standard proxy. The pattern here is its
# lookahead-free, ASCII portable core — contraction suffixes, space-
# prefixed letter runs, digit runs, punctuation runs, whitespace runs —
# valid under both Java regex (Spark codegen) and RE2 (DuckDB), so the
# oracle runs the IDENTICAL pattern. Pure regexp_extract_all +
# aggregation: scan-speed, no UDF.
# ---------------------------------------------------------------------------
_BPE_RE = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s']+|\s+"
_BPE_SQL = _BPE_RE.replace("'", "''")  # SQL string-literal escaping


def q54_bpe_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    per_doc = docs.select(
        "source",
        "n_chars",
        F.size(F.regexp_extract_all(F.col("text"), F.lit(_BPE_RE), F.lit(0))).alias(
            "n_bpe"
        ),
        TXT.token_count(F.col("text")).alias("n_ws"),
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_bpe").alias("total_bpe_tokens"),
            F.sum("n_ws").alias("total_ws_tokens"),
            # integer ratios: engine-exact (no float division drift)
            F.expr("SUM(n_bpe) DIV COUNT(*)").alias("bpe_per_doc"),
            F.expr("SUM(CAST(n_chars AS BIGINT)) DIV SUM(n_bpe)").alias("chars_per_bpe"),
            F.expr("SUM(n_bpe) * 1000 DIV SUM(n_ws)").alias("bpe_per_1k_ws"),
        )
        .orderBy("source")
    )


Q54_SQL = rf"""
SELECT source,
       COUNT(*) AS n_docs,
       CAST(SUM(len(regexp_extract_all(text, '{_BPE_SQL}'))) AS BIGINT) AS total_bpe_tokens,
       CAST(SUM(len(string_split_regex(lower(text), '\s+'))) AS BIGINT) AS total_ws_tokens,
       CAST(SUM(len(regexp_extract_all(text, '{_BPE_SQL}'))) // COUNT(*) AS BIGINT) AS bpe_per_doc,
       CAST(SUM(CAST(n_chars AS BIGINT)) // SUM(len(regexp_extract_all(text, '{_BPE_SQL}'))) AS BIGINT) AS chars_per_bpe,
       CAST(SUM(len(regexp_extract_all(text, '{_BPE_SQL}'))) * 1000 // SUM(len(string_split_regex(lower(text), '\s+'))) AS BIGINT) AS bpe_per_1k_ws
FROM documents
GROUP BY source
ORDER BY source
"""

QUERIES["q54_bpe_token_stats"] = q54_bpe_token_stats
ORACLES["q54_bpe_token_stats"] = Q54_SQL


# ---------------------------------------------------------------------------
# Q58 — distributed BPE merge step (training-data mandate: the core
# primitive of BPE vocabulary training, Sennrich et al. ACL'16). A BPE
# trainer loops: count adjacent-symbol-pair frequencies over the corpus
# → merge the argmax pair → repeat. The scalable formulation counts
# over the (word, freq) VOCABULARY, not the corpus — the corpus
# collapses to ~|vocab| rows in one hash agg, and each merge iteration
# is then a pair explode + weighted count over that compressed frame
# (exactly how Rust/C++ trainers do it, distributed here: parallelism =
# shuffle partitions, never O(corpus) per iteration). This query is one
# iteration's pair-count + deterministic argmax prefix (top 20); the
# loop is driver-orchestrated like every fixpoint here (cf. q39/q21).
# Pure explode + codegen substring — no UDF.
# ---------------------------------------------------------------------------
def q58_bpe_merge_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    words = docs.select(
        F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("w")
    ).filter(F.col("w").rlike("^[a-z]+$") & (F.length("w") >= 2))
    wf = words.groupBy("w").agg(F.count(F.lit(1)).alias("freq"))
    pairs = wf.select(
        "w",
        "freq",
        F.explode(F.expr("sequence(1, length(w) - 1)")).alias("i"),
    ).select(F.expr("substring(w, i, 2)").alias("pair"), "freq", "w")
    return (
        pairs.groupBy("pair")
        .agg(
            F.sum("freq").alias("pair_freq"),
            F.countDistinct("w").alias("n_distinct_words"),
        )
        .orderBy(F.desc("pair_freq"), "pair")
        .limit(20)
    )


Q58_SQL = r"""
WITH words AS (
  SELECT UNNEST(string_split_regex(lower(text), '\s+')) AS w FROM documents
),
wf AS (
  SELECT w, COUNT(*) AS freq
  FROM words
  WHERE regexp_full_match(w, '[a-z]+') AND len(w) >= 2
  GROUP BY w
),
pairs AS (
  SELECT substr(w, CAST(i AS INT), 2) AS pair, freq, w
  FROM (SELECT w, freq, UNNEST(generate_series(1, len(w) - 1)) AS i FROM wf)
)
SELECT pair,
       CAST(SUM(freq) AS BIGINT) AS pair_freq,
       CAST(COUNT(DISTINCT w) AS BIGINT) AS n_distinct_words
FROM pairs
GROUP BY pair
ORDER BY pair_freq DESC, pair
LIMIT 20
"""

QUERIES["q58_bpe_merge_pairs"] = q58_bpe_merge_pairs
ORACLES["q58_bpe_merge_pairs"] = Q58_SQL


# ---------------------------------------------------------------------------
# Q62 — corpus curation funnel (training-data mandate, the C4/Gopher
# pipeline shape): one scan applies the cumulative filter chain
# length-gate → quality-gate (token count + punctuation ratio) →
# langid-agreement → PII-clean, and reports per-source survival at
# every stage. All four stages are codegen'd expressions from
# functions/text.py + functions/pii.py (no UDF, no join, ONE shuffle
# for the final per-source agg) — at 100 TB this is the scan-speed
# pass that decides what enters training. Stages mirror q12c/q12d/q34
# expression-for-expression, so the oracle reproduces every count.
# ---------------------------------------------------------------------------
def q62_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions import pii as PII

    docs = load(spark, sf_dir, "documents")
    t = F.col("text")
    s1 = F.col("n_chars").between(100, 50_000)
    s2 = s1 & TXT.quality_ok(t)
    s3 = s2 & (TXT.lang_id(t) == F.col("lang"))
    s4 = s3 & (
        (PII.email_count(t) + PII.phone_count(t) + PII.ipv4_count(t)) == 0
    )
    return (
        docs.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(s1.cast("long")).alias("n_len_ok"),
            F.sum(s2.cast("long")).alias("n_quality_ok"),
            F.sum(s3.cast("long")).alias("n_lang_ok"),
            F.sum(s4.cast("long")).alias("n_curated"),
        )
        .orderBy("source")
    )


def _q62_sql() -> str:
    from ..functions import pii as PII

    npii = " + ".join(
        f"len(regexp_extract_all(text, '{p}'))"
        for p, _tok in PII.PATTERNS
    )
    return rf"""
WITH b AS (
  SELECT source, lang, n_chars, text,
         len(string_split_regex(lower(text), '\s+')) AS n_tokens,
         (length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')))
           * 1.0 / length(text) AS punct_ratio,
         CASE WHEN regexp_matches(text, '[一-鿿]') THEN 'zh'
              WHEN regexp_matches(text, '[ñ¿¡]') THEN 'es'
              WHEN regexp_matches(text, '[àâçèêëîïôùûœ]') THEN 'fr'
              WHEN regexp_matches(text, '[äöüß]') THEN 'de'
              ELSE 'en' END AS lang_pred,
         {npii} AS n_pii
  FROM documents
),
f AS (
  SELECT source,
         (n_chars BETWEEN 100 AND 50000) AS s1,
         (n_chars BETWEEN 100 AND 50000)
           AND (n_tokens >= 5 AND n_tokens <= 100000 AND punct_ratio < 0.1) AS s2,
         (n_chars BETWEEN 100 AND 50000)
           AND (n_tokens >= 5 AND n_tokens <= 100000 AND punct_ratio < 0.1)
           AND lang_pred = lang AS s3,
         (n_chars BETWEEN 100 AND 50000)
           AND (n_tokens >= 5 AND n_tokens <= 100000 AND punct_ratio < 0.1)
           AND lang_pred = lang AND n_pii = 0 AS s4
  FROM b
)
SELECT source,
       COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN s1 THEN 1 ELSE 0 END) AS BIGINT) AS n_len_ok,
       CAST(SUM(CASE WHEN s2 THEN 1 ELSE 0 END) AS BIGINT) AS n_quality_ok,
       CAST(SUM(CASE WHEN s3 THEN 1 ELSE 0 END) AS BIGINT) AS n_lang_ok,
       CAST(SUM(CASE WHEN s4 THEN 1 ELSE 0 END) AS BIGINT) AS n_curated
FROM f
GROUP BY source
ORDER BY source
"""


QUERIES["q62_curation_funnel"] = q62_curation_funnel
ORACLES["q62_curation_funnel"] = _q62_sql()


# ---------------------------------------------------------------------------
# Q67 — curriculum deciles (training-data mandate: curriculum learning
# orders the corpus easy→hard; the pipeline side is a deterministic
# difficulty ranking + banding). Difficulty proxy = whitespace token
# count (swap in any scored column); banding = NTILE(10) over the
# TOTAL order (difficulty, doc_id).
#
# Scale shape: a naive `NTILE() OVER (ORDER BY ...)` collapses the
# whole corpus into ONE window partition. Instead, the global rank is
# assembled distributedly (the q22 parallel-distribution trick): a
# windowed prefix sum over the SMALL per-difficulty histogram gives
# each difficulty level's rank base, a difficulty-partitioned
# row_number (distributed) ranks within levels, and the standard NTILE
# remainder formula (first n%10 buckets get the extra row — the same
# spec both engines implement) turns ranks into buckets as pure
# integer codegen. The oracle uses the real NTILE; agreement IS the
# test that the distributed formula matches the spec.
# ---------------------------------------------------------------------------
def q67_curriculum_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id", "n_chars", TXT.token_count(F.col("text")).alias("difficulty")
    )
    from .classify import cumulate_histogram

    # cumulative histogram over |distinct difficulties| rows, never
    # the corpus — the shared q67/q113/q117 machinery (classify.py)
    lvl = cumulate_histogram(
        scored.groupBy("difficulty").agg(F.count(F.lit(1)).alias("n")),
        "difficulty",
    ).select("difficulty", "base", F.col("n_total").alias("n"))
    w_in = Window.partitionBy("difficulty").orderBy("doc_id")  # distributed
    ranked = scored.join(F.broadcast(lvl), "difficulty").select(
        "difficulty",
        "n_chars",
        "n",
        (F.col("base") + F.row_number().over(w_in) - 1).alias("r0"),  # 0-based
    )
    # NTILE(b): q = n div b, rem = n % b; first rem buckets hold q+1 rows
    banded = ranked.selectExpr(
        "difficulty",
        "n_chars",
        """CASE WHEN n DIV 10 = 0 THEN CAST(r0 + 1 AS BIGINT)
                WHEN r0 < (n % 10) * (n DIV 10 + 1)
                THEN CAST(r0 DIV (n DIV 10 + 1) + 1 AS BIGINT)
                ELSE CAST(n % 10 + (r0 - (n % 10) * (n DIV 10 + 1)) DIV (n DIV 10) + 1 AS BIGINT)
           END AS decile""",
    )
    return (
        banded.groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("difficulty").cast("long").alias("min_difficulty"),
            F.max("difficulty").cast("long").alias("max_difficulty"),
            F.sum(F.col("n_chars").cast("long")).alias("total_chars"),
        )
        .orderBy("decile")
    )


Q67_SQL = r"""
WITH scored AS (
  SELECT doc_id, n_chars,
         len(string_split_regex(lower(text), '\s+')) AS difficulty
  FROM documents
),
banded AS (
  SELECT *, NTILE(10) OVER (ORDER BY difficulty, doc_id) AS decile FROM scored
)
SELECT decile,
       COUNT(*) AS n_docs,
       CAST(MIN(difficulty) AS BIGINT) AS min_difficulty,
       CAST(MAX(difficulty) AS BIGINT) AS max_difficulty,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM banded
GROUP BY decile
ORDER BY decile
"""

QUERIES["q67_curriculum_deciles"] = q67_curriculum_deciles
ORACLES["q67_curriculum_deciles"] = Q67_SQL


# ---------------------------------------------------------------------------
# Q75 — corpus drift monitor: compare the token distribution of two
# sources and surface the most divergent tokens (train/serve skew and
# ingest-regression detection — a silent upstream change shows up here
# before it shows up in model metrics). Counts and per-source
# frequencies are integers (ppm via integer division), divergence is
# |ppm_a - ppm_b| — engine-exact, no FP rank flips; top-50 by
# (divergence DESC, token ASC) is a total order.
#
# Scale shape: one explode + ONE hash agg keyed by token (map-side
# partial), per-source totals attached as a 1-row broadcast scalar
# (the audited 1-row-aggregate BNLJ pattern, structurally verified by
# the plan audit), top-50 via orderBy().limit() = TakeOrdered.
# ---------------------------------------------------------------------------
_DRIFT_A, _DRIFT_B = "src0", "src1"
_DRIFT_K = 50


def q75_corpus_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").filter(
        F.col("source").isin(_DRIFT_A, _DRIFT_B)
    )
    toks = docs.select(
        "source", F.explode(F.split(F.lower("text"), r"\s+")).alias("tok")
    ).filter(F.col("tok") != "")
    counts = toks.groupBy("tok").agg(
        F.sum((F.col("source") == _DRIFT_A).cast("long")).alias("n_a"),
        F.sum((F.col("source") == _DRIFT_B).cast("long")).alias("n_b"),
    )
    totals = counts.agg(
        F.sum("n_a").alias("tot_a"), F.sum("n_b").alias("tot_b")
    )
    scored = counts.crossJoin(F.broadcast(totals)).select(
        "tok",
        "n_a",
        "n_b",
        F.expr("n_a * 1000000 DIV tot_a").alias("ppm_a"),
        F.expr("n_b * 1000000 DIV tot_b").alias("ppm_b"),
        F.abs(F.expr("n_a * 1000000 DIV tot_a") - F.expr("n_b * 1000000 DIV tot_b")).alias(
            "div_ppm"
        ),
    )
    return scored.orderBy(F.desc("div_ppm"), F.asc("tok")).limit(_DRIFT_K)


Q75_SQL = rf"""
WITH toks AS (
  SELECT source, UNNEST(string_split_regex(lower(text), '\s+')) AS tok
  FROM documents
  WHERE source IN ('{_DRIFT_A}', '{_DRIFT_B}')
),
counts AS (
  SELECT tok,
         CAST(SUM(CASE WHEN source = '{_DRIFT_A}' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
         CAST(SUM(CASE WHEN source = '{_DRIFT_B}' THEN 1 ELSE 0 END) AS BIGINT) AS n_b
  FROM toks
  WHERE tok <> ''
  GROUP BY tok
),
tot AS (SELECT SUM(n_a) AS tot_a, SUM(n_b) AS tot_b FROM counts)
SELECT tok, n_a, n_b,
       CAST(n_a * 1000000 // tot_a AS BIGINT) AS ppm_a,
       CAST(n_b * 1000000 // tot_b AS BIGINT) AS ppm_b,
       CAST(ABS(n_a * 1000000 // tot_a - n_b * 1000000 // tot_b) AS BIGINT) AS div_ppm
FROM counts, tot
ORDER BY div_ppm DESC, tok
LIMIT {_DRIFT_K}
"""

QUERIES["q75_corpus_drift"] = q75_corpus_drift
ORACLES["q75_corpus_drift"] = Q75_SQL


# ---------------------------------------------------------------------------
# Q79 — bigram-surprisal quality signal (the CCNet/C4 "rare n-gram"
# filter without logarithms): for each document, how COMMON its
# bigrams are in the whole corpus. Boilerplate/duplicated text scores
# a high mean corpus-count and a near-zero hapax share; unique prose
# scores the opposite. This is the statistical-LM quality filter
# re-expressed in exact integer arithmetic (counts, integer division,
# ppm) so both engines agree bit-for-bit — no FP log-prob, the q45
# integer-ratio discipline.
#
# Shape at scale: one explode + one doc_id window (bigrams), one
# bigram-keyed hash agg (corpus counts), one bigram-keyed join of doc
# bigrams to counts (hot bigrams are the classic skew case — AQE
# skew-join splits them), one doc_id hash agg. All codegen; token
# strings shuffle once (the count agg); the join carries only
# (doc_id, bigram-hash, count)-shaped rows.
# ---------------------------------------------------------------------------
def q79_bigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.posexplode(F.split(F.lower(F.col("text")), r"\s+")).alias("i", "tok"),
    ).filter(F.col("tok") != "")
    w_next = Window.partitionBy("doc_id").orderBy("i")
    grams = (
        toks.select(
            "doc_id",
            F.concat_ws(" ", "tok", F.lead("tok", 1).over(w_next)).alias("gram"),
            F.lead("tok", 1).over(w_next).alias("nxt"),
        )
        .filter(F.col("nxt").isNotNull())
        .drop("nxt")
    )
    counts = grams.groupBy("gram").agg(F.count(F.lit(1)).alias("corpus_count"))
    scored = (
        grams.join(counts, "gram")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("corpus_count").alias("sum_counts"),
            F.sum(
                F.when(F.col("corpus_count") == 1, F.lit(1)).otherwise(F.lit(0))
            ).alias("n_hapax"),
        )
    )
    return (
        docs.select("doc_id", "source")
        .join(scored, "doc_id", "left")
        .select(
            "doc_id",
            "source",
            F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
            F.when(
                F.col("n_bigrams").isNotNull(),
                F.expr("sum_counts DIV n_bigrams"),
            ).alias("mean_bigram_count"),
            F.when(
                F.col("n_bigrams").isNotNull(),
                F.expr("n_hapax * 1000000 DIV n_bigrams"),
            ).alias("hapax_ppm"),
        )
        .orderBy("doc_id")
    )


Q79_SQL = r"""
WITH split AS (
  SELECT doc_id, string_split_regex(lower(text), '\s+') AS t
  FROM documents
),
toks AS (
  SELECT doc_id,
         row_number() OVER (PARTITION BY doc_id ORDER BY r.i) - 1 AS i,
         t[r.i] AS tok
  FROM split, UNNEST(range(1, len(t) + 1)) AS r(i)
  WHERE t[r.i] <> ''
),
grams AS (
  SELECT doc_id, gram FROM (
    SELECT doc_id,
           tok || ' ' || lead(tok, 1) OVER (PARTITION BY doc_id ORDER BY i) AS gram,
           lead(tok, 1) OVER (PARTITION BY doc_id ORDER BY i) AS nxt
    FROM toks
  ) WHERE nxt IS NOT NULL
),
counts AS (SELECT gram, COUNT(*) AS corpus_count FROM grams GROUP BY gram),
scored AS (
  SELECT g.doc_id,
         COUNT(*) AS n_bigrams,
         SUM(c.corpus_count) AS sum_counts,
         SUM(CASE WHEN c.corpus_count = 1 THEN 1 ELSE 0 END) AS n_hapax
  FROM grams g JOIN counts c USING (gram)
  GROUP BY g.doc_id
)
SELECT d.doc_id, d.source,
       CAST(COALESCE(s.n_bigrams, 0) AS BIGINT) AS n_bigrams,
       CAST(s.sum_counts // s.n_bigrams AS BIGINT) AS mean_bigram_count,
       CAST(s.n_hapax * 1000000 // s.n_bigrams AS BIGINT) AS hapax_ppm
FROM documents d LEFT JOIN scored s USING (doc_id)
ORDER BY d.doc_id
"""

QUERIES["q79_bigram_surprisal"] = q79_bigram_surprisal
ORACLES["q79_bigram_surprisal"] = Q79_SQL


# ---------------------------------------------------------------------------
# Q84 — skip-gram co-occurrence / PMI-proxy pairs (the distributional-
# semantics statistic behind word2vec negative sampling tables and
# embedding-quality audits): for token pairs co-occurring within a
# ±2 window, an association score monotone in PMI, in EXACT INTEGER
# arithmetic — score = (pair_cnt·10⁶ DIV cnt_a)·10⁶ DIV cnt_b, a
# fixed 10¹² scaling of pair/(cnt_a·cnt_b) (the corpus-total factor of
# true PMI is a per-corpus constant, so ranking is PMI-ranking) with
# no logs, no overflow (pair_cnt·10⁶ ≤ 10¹⁸ needs pair_cnt ≤ 10¹²),
# and identical truncation on both engines. Min-support floors keep
# hapax noise out. Shape: the q79 position window (one doc_id
# shuffle), one pair-keyed and one token-keyed hash agg, two
# frequency joins, TakeOrdered top-30.
# ---------------------------------------------------------------------------
_PMI_MIN_PAIR = 5
_PMI_MIN_TOK = 10


def q84_pmi_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.posexplode(F.split(F.lower(F.col("text")), r"\s+")).alias("i", "tok"),
    ).filter(F.col("tok") != "")
    w = Window.partitionBy("doc_id").orderBy("i")
    withnext = toks.select(
        "tok",
        F.lead("tok", 1).over(w).alias("n1"),
        F.lead("tok", 2).over(w).alias("n2"),
    )
    pairs = (
        withnext.select("tok", F.col("n1").alias("nxt"))
        .unionAll(withnext.select("tok", F.col("n2").alias("nxt")))
        .filter(F.col("nxt").isNotNull())
        .select(
            F.least("tok", "nxt").alias("w1"), F.greatest("tok", "nxt").alias("w2")
        )
    )
    pc = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("pair_cnt"))
    uni = (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= _PMI_MIN_TOK)
    )
    scored = (
        pc.filter(F.col("pair_cnt") >= _PMI_MIN_PAIR)
        .join(uni.select(F.col("tok").alias("w1"), F.col("cnt").alias("cnt_a")), "w1")
        .join(uni.select(F.col("tok").alias("w2"), F.col("cnt").alias("cnt_b")), "w2")
        .select(
            "w1",
            "w2",
            "pair_cnt",
            "cnt_a",
            "cnt_b",
            F.expr("pair_cnt * 1000000 DIV cnt_a * 1000000 DIV cnt_b").alias(
                "assoc_scaled"
            ),
        )
    )
    return scored.orderBy(F.desc("assoc_scaled"), "w1", "w2").limit(30)


Q84_SQL = rf"""
WITH split AS (
  SELECT doc_id, string_split_regex(lower(text), '\s+') AS t FROM documents
),
toks AS (
  SELECT doc_id,
         row_number() OVER (PARTITION BY doc_id ORDER BY r.i) - 1 AS i,
         t[r.i] AS tok
  FROM split, UNNEST(range(1, len(t) + 1)) AS r(i)
  WHERE t[r.i] <> ''
),
withnext AS (
  SELECT tok,
         lead(tok, 1) OVER (PARTITION BY doc_id ORDER BY i) AS n1,
         lead(tok, 2) OVER (PARTITION BY doc_id ORDER BY i) AS n2
  FROM toks
),
pairs AS (
  SELECT least(tok, nxt) AS w1, greatest(tok, nxt) AS w2 FROM (
    SELECT tok, n1 AS nxt FROM withnext
    UNION ALL SELECT tok, n2 FROM withnext
  ) WHERE nxt IS NOT NULL
),
pc AS (
  SELECT w1, w2, COUNT(*) AS pair_cnt FROM pairs GROUP BY w1, w2
),
uni AS (
  SELECT tok, COUNT(*) AS cnt FROM toks GROUP BY tok HAVING COUNT(*) >= {_PMI_MIN_TOK}
)
SELECT p.w1, p.w2,
       CAST(p.pair_cnt AS BIGINT) AS pair_cnt,
       CAST(a.cnt AS BIGINT) AS cnt_a,
       CAST(b.cnt AS BIGINT) AS cnt_b,
       CAST(p.pair_cnt * 1000000 // a.cnt * 1000000 // b.cnt AS BIGINT) AS assoc_scaled
FROM pc p
JOIN uni a ON p.w1 = a.tok
JOIN uni b ON p.w2 = b.tok
WHERE p.pair_cnt >= {_PMI_MIN_PAIR}
ORDER BY assoc_scaled DESC, p.w1, p.w2
LIMIT 30
"""

QUERIES["q84_pmi_pairs"] = q84_pmi_pairs
ORACLES["q84_pmi_pairs"] = Q84_SQL


# ---------------------------------------------------------------------------
# Q98 — Kneser–Ney bigram statistics (LM training counts).
#
# The statistical-LM side of corpus curation: interpolated Kneser–Ney
# (Kneser & Ney 1995; Chen & Goodman 1998) is THE classic n-gram
# smoothing, and its sufficient statistics — bigram counts c(w1,w2),
# left-context fanouts N1+(*,w2) (continuation counts), right fanouts
# N1+(w1,*) and the distinct-bigram-type total T — are exactly what a
# KenLM-style counting job extracts from a 100 TB corpus. The reference
# derives per-row text stats (`/root/reference/test.py:94-118`); this
# is the corpus-level generalization.
#
# The full interpolated-KN probability is evaluated in EXACT integer
# ppm arithmetic (absolute discount d = 0.75 carried as quarters so no
# floats appear anywhere; truncating DIV on both engines):
#
#   P_cont(w2)      = N1+(*,w2) / T                       [ppm]
#   term1           = max(c - 0.75, 0) / c(w1,*)          [(4c-3)*250000 DIV cw1]
#   lambda(w1)      = 0.75 * N1+(w1,*) / c(w1,*)          [3*nr*250000 DIV cw1]
#   P_KN(w2|w1)     = term1 + lambda * P_cont / 1e6       [ppm]
#
# Scale shape: bigrams are built MAP-SIDE from the token array
# (transform over a sequence — no window, no shuffle to form pairs);
# the aggregations are token-keyed hash aggs whose keys are vocabulary
# terms, so shuffle volume is O(vocab), not O(corpus). lambda's
# integer intermediate 3*N1+*250000 stays under 2^63 for any corpus
# up to ~10^12 bigram tokens per head word.
# ---------------------------------------------------------------------------


def q98_kneser_ney_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", TXT.tokens(F.col("text")).alias("t")
    )
    bg = (
        docs.filter(F.size("t") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(t)-1),"
                    " i -> struct(element_at(t, i) AS w1, element_at(t, i+1) AS w2))"
                )
            ).alias("p")
        )
        .select(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
        .filter((F.col("w1") != "") & (F.col("w2") != ""))
    )
    c = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c"))
    cw1 = bg.groupBy("w1").agg(F.count(F.lit(1)).alias("cw1"))
    bg_types = bg.distinct()
    n_left = bg_types.groupBy("w2").agg(F.count(F.lit(1)).alias("n_left"))
    n_right = bg_types.groupBy("w1").agg(F.count(F.lit(1)).alias("n_right"))
    # T as the audited 1-row broadcast scalar (the q75 discipline)
    t_total = bg_types.agg(F.count(F.lit(1)).alias("t_types"))
    return (
        c.join(cw1, "w1")
        .join(n_right, "w1")
        .join(n_left, "w2")
        .crossJoin(F.broadcast(t_total))
        .withColumn("p_cont_ppm", F.expr("n_left * 1000000 DIV t_types"))
        .withColumn("term1_ppm", F.expr("greatest(4*c - 3, 0) * 250000 DIV cw1"))
        .withColumn("lambda_ppm", F.expr("3 * n_right * 250000 DIV cw1"))
        .select(
            "w1",
            "w2",
            "c",
            "cw1",
            F.col("n_right").alias("n_right_w1"),
            F.col("n_left").alias("n_left_w2"),
            "p_cont_ppm",
            F.expr("term1_ppm + (lambda_ppm * p_cont_ppm) DIV 1000000").alias(
                "p_kn_ppm"
            ),
        )
        .orderBy(F.desc("c"), "w1", "w2")
        .limit(100)
    )


Q98_SQL = r"""
WITH toks AS (
  SELECT doc_id, string_split_regex(lower(text), '\s+') AS t FROM documents
),
bg AS (
  SELECT w1, w2 FROM (
    SELECT t[i] AS w1, t[i+1] AS w2
    FROM (SELECT t, UNNEST(range(1, len(t))) AS i FROM toks)
  ) WHERE w1 <> '' AND w2 <> ''
),
c AS (SELECT w1, w2, COUNT(*) AS c FROM bg GROUP BY w1, w2),
cw1 AS (SELECT w1, COUNT(*) AS cw1 FROM bg GROUP BY w1),
bg_types AS (SELECT DISTINCT w1, w2 FROM bg),
n_left AS (SELECT w2, COUNT(*) AS n_left FROM bg_types GROUP BY w2),
n_right AS (SELECT w1, COUNT(*) AS n_right FROM bg_types GROUP BY w1),
t_total AS (SELECT COUNT(*) AS t_types FROM bg_types)
SELECT c.w1, c.w2,
       CAST(c.c AS BIGINT) AS c,
       CAST(cw1.cw1 AS BIGINT) AS cw1,
       CAST(n_right.n_right AS BIGINT) AS n_right_w1,
       CAST(n_left.n_left AS BIGINT) AS n_left_w2,
       CAST(n_left.n_left * 1000000 // t_total.t_types AS BIGINT) AS p_cont_ppm,
       CAST(greatest(4*c.c - 3, 0) * 250000 // cw1.cw1
            + (3 * n_right.n_right * 250000 // cw1.cw1)
              * (n_left.n_left * 1000000 // t_total.t_types) // 1000000
            AS BIGINT) AS p_kn_ppm
FROM c
JOIN cw1 USING (w1)
JOIN n_right USING (w1)
JOIN n_left USING (w2)
CROSS JOIN t_total
ORDER BY c DESC, w1, w2
LIMIT 100
"""

QUERIES["q98_kneser_ney_bigrams"] = q98_kneser_ney_bigrams
ORACLES["q98_kneser_ney_bigrams"] = Q98_SQL


# ---------------------------------------------------------------------------
# Q107 — Heaps'-law vocabulary growth curve.
#
# Corpus planners size tokenizers and estimate dedup headroom from how
# the vocabulary grows with corpus size (Heaps' law V ~ K*n^beta,
# beta ~ 0.5 for natural text; saturation signals templated/synthetic
# content — this corpus's tiny generator vocab shows exactly that).
# The measurement: cumulative distinct tokens after each decile of the
# corpus, in one pass — NOT ten rescans: each token's FIRST-OCCURRENCE
# decile is a min-aggregate, and the growth curve is the running sum
# of first occurrences (10-row window).
#
# Deciles are arithmetic on doc_id (the corpus's stable ingest order),
# not NTILE over rows — map-side, shuffle-free decile assignment.
# Token totals per decile ride the same single scan.
#
# Scale shape: one scan -> explode -> (token) min-agg (vocab-sized
# shuffle) -> 10-row presentation window. The curve costs the same as
# counting the vocabulary once.
# ---------------------------------------------------------------------------


def q107_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load(spark, sf_dir, "documents")
    n_docs = docs.agg(F.max("doc_id").alias("max_id"))
    tok = (
        docs.crossJoin(F.broadcast(n_docs))
        .select(
            F.expr("least(doc_id * 10 div (max_id + 1) + 1, 10)").alias("decile"),
            F.explode(TXT.tokens(F.col("text"))).alias("token"),
        )
        .filter(F.col("token") != "")
    )
    first_seen = tok.groupBy("token").agg(F.min("decile").alias("first_decile"))
    new_types = first_seen.groupBy("first_decile").agg(
        F.count(F.lit(1)).alias("new_types")
    )
    tokens_per = tok.groupBy("decile").agg(F.count(F.lit(1)).alias("n_tokens"))
    w = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    return (
        tokens_per.join(
            new_types.withColumnRenamed("first_decile", "decile"), "decile", "left"
        )
        .select(
            "decile",
            "n_tokens",
            F.coalesce("new_types", F.lit(0)).alias("new_types"),
        )
        .withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .withColumn("cum_vocab", F.sum("new_types").over(w))
        .select(
            F.col("decile").cast("long").alias("decile"),
            "n_tokens",
            "new_types",
            F.col("cum_tokens").cast("long").alias("cum_tokens"),
            F.col("cum_vocab").cast("long").alias("cum_vocab"),
            F.expr("cum_vocab * 1000000 div cum_tokens").alias("type_token_ppm"),
        )
        .orderBy("decile")
    )


Q107_SQL = r"""
WITH nd AS (SELECT MAX(doc_id) AS max_id FROM documents),
tok AS (
  SELECT least(doc_id * 10 // (max_id + 1) + 1, 10) AS decile,
         UNNEST(string_split_regex(lower(text), '\s+')) AS token
  FROM documents CROSS JOIN nd
),
tokf AS (SELECT decile, token FROM tok WHERE token <> ''),
first_seen AS (SELECT token, MIN(decile) AS first_decile FROM tokf GROUP BY token),
new_types AS (SELECT first_decile AS decile, COUNT(*) AS new_types FROM first_seen GROUP BY 1),
tokens_per AS (SELECT decile, COUNT(*) AS n_tokens FROM tokf GROUP BY decile),
curve AS (
  SELECT t.decile, t.n_tokens, COALESCE(n.new_types, 0) AS new_types,
         SUM(t.n_tokens) OVER (ORDER BY t.decile) AS cum_tokens,
         SUM(COALESCE(n.new_types, 0)) OVER (ORDER BY t.decile) AS cum_vocab
  FROM tokens_per t LEFT JOIN new_types n USING (decile)
)
SELECT CAST(decile AS BIGINT) AS decile,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(new_types AS BIGINT) AS new_types,
       CAST(cum_tokens AS BIGINT) AS cum_tokens,
       CAST(cum_vocab AS BIGINT) AS cum_vocab,
       CAST(cum_vocab * 1000000 // cum_tokens AS BIGINT) AS type_token_ppm
FROM curve
ORDER BY decile
"""

QUERIES["q107_vocab_growth"] = q107_vocab_growth
ORACLES["q107_vocab_growth"] = Q107_SQL


# ---------------------------------------------------------------------------
# Q117 — CCNet-style perplexity bucketing (head / middle / tail).
#
# CCNet (Wenzek et al. 2020) scores every document's per-token
# cross-entropy under a language model and splits the corpus into
# head/middle/tail perplexity terciles — THE standard quality gate in
# CommonCrawl-scale curation (the reference's per-row quality fields,
# `/root/reference/test.py:94-118`, are the single-node ancestor).
# Here the LM is the corpus's own unigram model, and the whole filter
# runs in exact integer arithmetic so the DuckDB oracle hash-matches:
#
#   surprisal(w)  = L((N*16) DIV cnt(w))      L = the q113 log bucket,
#                                             ~ 16*log2(N/cnt) + const
#   ce_x16(doc)   = sum(surprisal) DIV n_toks (per-token cross-entropy
#                                              in 1/16-log2 units)
#   cut1, cut2    = exact tercile boundaries of ce_x16 over scored docs
#   bucket        = head (ce <= cut1) / middle (<= cut2) / tail
#
# The tercile cutoffs are NOT a global sort: ce_x16 lives in a small
# bounded integer domain (16*bitlen <= ~1000 values), so the cutoff is
# a prefix-sum over a <=1000-row histogram — the q113 nearest-rank
# trick. Ties share a bucket (deterministic on both engines, unlike
# ntile under ties).
#
# Scale shape: one scan -> explode -> token-keyed count agg (shuffle
# keys are vocabulary terms), one token-keyed join back (AQE skew-join
# handles hot words), one doc-keyed agg, then dim-scale histogram work;
# the corpus-total and cutoffs attach as audited 1-row broadcast
# scalars (the q75/q98 discipline). Nothing is data-proportional
# beyond the two hash aggs and one join.
# ---------------------------------------------------------------------------


def q117_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from .classify import log_bucket_expr

    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(TXT.tokens(F.col("text"))).alias("tok")
    ).filter(F.col("tok") != "")
    counts = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
    total = toks.agg(F.count(F.lit(1)).alias("n_corpus"))  # 1-row scalar
    per_doc = (
        toks.join(counts, "tok")
        .crossJoin(F.broadcast(total))
        .select(
            "doc_id",
            F.expr(log_bucket_expr("(n_corpus * 16) DIV cnt")).alias("s_x16"),
        )
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_toks"), F.sum("s_x16").alias("sum_s"))
        .withColumn("ce_x16", F.expr("sum_s DIV n_toks"))
    )
    # exact tercile cutoffs from the bounded-domain histogram — the
    # shared q67/q113/q117 machinery (classify.cumulate_histogram)
    from .classify import cumulate_histogram

    hist = cumulate_histogram(
        per_doc.groupBy("ce_x16").agg(F.count(F.lit(1)).alias("n")), "ce_x16"
    )
    cuts = hist.agg(
        F.min(F.when(F.expr("cum >= (n_total + 2) DIV 3"), F.col("ce_x16"))).alias(
            "cut1"
        ),
        F.min(
            F.when(F.expr("cum >= (2 * n_total + 2) DIV 3"), F.col("ce_x16"))
        ).alias("cut2"),
    )
    return (
        docs.select("doc_id", "lang")
        .join(per_doc.select("doc_id", "n_toks", "ce_x16"), "doc_id", "left")
        .crossJoin(F.broadcast(cuts))
        .select(
            "doc_id",
            "lang",
            F.coalesce("n_toks", F.lit(0)).alias("n_toks"),
            F.coalesce("ce_x16", F.lit(0)).alias("ce_x16"),
            F.when(F.col("n_toks").isNull(), "empty")
            .when(F.col("ce_x16") <= F.col("cut1"), "head")
            .when(F.col("ce_x16") <= F.col("cut2"), "middle")
            .otherwise("tail")
            .alias("ppl_bucket"),
        )
        .orderBy("doc_id")
    )


from .classify import sql_log_bucket_expr as _sql_logb  # noqa: E402

Q117_SQL = rf"""
WITH toks AS (
  SELECT doc_id, tok FROM (
    SELECT doc_id, UNNEST(string_split_regex(lower(text), '\s+')) AS tok
    FROM documents
  ) WHERE tok <> ''
),
counts AS (SELECT tok, COUNT(*) AS cnt FROM toks GROUP BY tok),
total AS (SELECT COUNT(*) AS n_corpus FROM toks),
per_doc AS (
  SELECT doc_id, COUNT(*) AS n_toks, SUM(s_x16) AS sum_s,
         SUM(s_x16) // COUNT(*) AS ce_x16
  FROM (
    SELECT t.doc_id, {_sql_logb('v')} AS s_x16
    FROM (SELECT t.doc_id, (total.n_corpus * 16) // c.cnt AS v
          FROM toks t JOIN counts c USING (tok) CROSS JOIN total) t
  ) GROUP BY doc_id
),
hist AS (
  SELECT ce_x16,
         SUM(COUNT(*)) OVER (ORDER BY ce_x16 ROWS UNBOUNDED PRECEDING) AS cum,
         SUM(COUNT(*)) OVER () AS n_docs
  FROM per_doc GROUP BY ce_x16
),
cuts AS (
  SELECT MIN(CASE WHEN cum >= (n_docs + 2) // 3 THEN ce_x16 END) AS cut1,
         MIN(CASE WHEN cum >= (2 * n_docs + 2) // 3 THEN ce_x16 END) AS cut2
  FROM hist
)
SELECT d.doc_id, d.lang,
       CAST(COALESCE(p.n_toks, 0) AS BIGINT) AS n_toks,
       CAST(COALESCE(p.ce_x16, 0) AS BIGINT) AS ce_x16,
       CASE WHEN p.n_toks IS NULL THEN 'empty'
            WHEN p.ce_x16 <= cuts.cut1 THEN 'head'
            WHEN p.ce_x16 <= cuts.cut2 THEN 'middle'
            ELSE 'tail' END AS ppl_bucket
FROM documents d LEFT JOIN per_doc p USING (doc_id) CROSS JOIN cuts
ORDER BY d.doc_id
"""

QUERIES["q117_perplexity_buckets"] = q117_perplexity_buckets
ORACLES["q117_perplexity_buckets"] = Q117_SQL


# ---------------------------------------------------------------------------
# Q118 — importance log-ratios for data mixing (the CCNet/DoReMi
# reweighting primitive).
#
# Target-domain curation scores every document by how much more likely
# its tokens are under a TARGET distribution than under the corpus
# distribution — importance weighting (Wenzek et al. 2020 §4.3; Xie et
# al. DoReMi 2023 use the same log-ratio as the domain signal). Here
# the target is the corpus's own 'en' slice and both distributions are
# unigram MLEs with add-one smoothing, so the whole score runs in the
# exact integer log-bucket algebra (q113/q117's L = ~16*log2):
#
#   s_x16(w)    = L((cnt_t(w)+1) * N_c) - L((cnt_c(w)+1) * N_t)
#                 ~ 16 * log2( P_target(w) / P_corpus(w) )
#   imp_x16(d)  = floor(mean of s_x16 over d's tokens)   (per-token
#                 mean log-ratio in 1/16-log2 units)
#
# Floor-exactness across engines: Spark's DIV truncates toward zero,
# DuckDB's // floors — they differ on negative dividends, so the mean
# is evaluated on an offset-shifted non-negative dividend
# ((sum + n*2048) DIV n - 2048; |s_x16| < 1024 bounds the shift).
#
# Scale shape: one scan -> explode -> ONE token-keyed agg producing
# BOTH distributions (conditional sums — not two scans), one
# token-keyed join back, one doc agg, one source agg; the (N_c, N_t)
# totals attach as the audited 1-row broadcast scalar. Per-source
# output: docs, target-like count (imp > 0), exact sum and floor-mean
# of the importance scores.
# ---------------------------------------------------------------------------


def q118_importance_logratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .classify import log_bucket_expr

    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", "lang", "source", F.explode(TXT.tokens(F.col("text"))).alias("tok")
    ).filter(F.col("tok") != "")
    counts = toks.groupBy("tok").agg(
        F.count(F.lit(1)).alias("cnt_c"),
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).alias("cnt_t"),
    )
    totals = toks.agg(  # 1-row scalar (audited broadcast cross)
        F.count(F.lit(1)).alias("n_c"),
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).alias("n_t"),
    )
    scored = (
        toks.join(counts, "tok")
        .crossJoin(F.broadcast(totals))
        .select(
            "doc_id",
            "source",
            F.expr("(cnt_t + 1) * n_c").alias("v_t"),
            F.expr("(cnt_c + 1) * n_t").alias("v_c"),
        )
        # domain guard (mirrors q113): log_bucket_expr needs v >= 16, else
        # the shift count goes negative — Spark masks negative shifts while
        # DuckDB errors, so without the guard the engines diverge instead
        # of failing identically. No-op whenever both slices are non-empty.
        .filter((F.col("v_t") >= 16) & (F.col("v_c") >= 16))
        .select(
            "doc_id",
            "source",
            (
                F.expr(log_bucket_expr("v_t")) - F.expr(log_bucket_expr("v_c"))
            ).alias("s_x16"),
        )
    )
    per_doc = (
        scored.groupBy("doc_id", "source")
        .agg(F.count(F.lit(1)).alias("n_toks"), F.sum("s_x16").alias("sum_s"))
        .withColumn("imp_x16", F.expr("(sum_s + n_toks * 2048) DIV n_toks - 2048"))
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(F.col("imp_x16") > 0, 1).otherwise(0))
            .cast("long")
            .alias("n_target_like"),
            F.sum("imp_x16").cast("long").alias("sum_imp_x16"),
            F.expr(
                "CAST((sum(imp_x16) + count(1) * 4096) DIV count(1) - 4096 AS BIGINT)"
            ).alias("mean_imp_x16"),
        )
        .orderBy("source")
    )


Q118_SQL = rf"""
WITH toks AS (
  SELECT doc_id, lang, source, tok FROM (
    SELECT doc_id, lang, source,
           UNNEST(string_split_regex(lower(text), '\s+')) AS tok
    FROM documents
  ) WHERE tok <> ''
),
counts AS (
  SELECT tok, COUNT(*) AS cnt_c,
         SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS cnt_t
  FROM toks GROUP BY tok
),
totals AS (
  SELECT COUNT(*) AS n_c,
         SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS n_t
  FROM toks
),
scored AS (
  SELECT doc_id, source, ({_sql_logb('v_t')}) - ({_sql_logb('v_c')}) AS s_x16
  FROM (
    SELECT t.doc_id, t.source,
           (c.cnt_t + 1) * tt.n_c AS v_t,
           (c.cnt_c + 1) * tt.n_t AS v_c
    FROM toks t JOIN counts c USING (tok) CROSS JOIN totals tt
  ) WHERE v_t >= 16 AND v_c >= 16
),
per_doc AS (
  SELECT doc_id, source, COUNT(*) AS n_toks, SUM(s_x16) AS sum_s,
         (SUM(s_x16) + COUNT(*) * 2048) // COUNT(*) - 2048 AS imp_x16
  FROM scored GROUP BY doc_id, source
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN imp_x16 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_target_like,
       CAST(SUM(imp_x16) AS BIGINT) AS sum_imp_x16,
       CAST((SUM(imp_x16) + COUNT(*) * 4096) // COUNT(*) - 4096 AS BIGINT) AS mean_imp_x16
FROM per_doc GROUP BY source ORDER BY source
"""

QUERIES["q118_importance_logratio"] = q118_importance_logratio
ORACLES["q118_importance_logratio"] = Q118_SQL


# ---------------------------------------------------------------------------
# Q132 — memorization / novelty scan (M91): for every document in a
# held-out eval split, what fraction of its distinct 5-grams appears
# NOWHERE in the train split? The complement of q27's decontamination
# (which flags eval docs leaking INTO train, boolean per doc): this
# measures HOW novel the eval text is — the n-gram-overlap
# memorization metric of Lee et al. '22 / Carlini et al. '22, the
# audit that decides whether an eval score is measuring generalization
# or recall. Split rule: md5-hash of doc_id mod 10 = 7 -> eval (10%),
# rest train — the q26 deterministic-sampling discipline, mirrored in
# the oracle (a plain doc_id % 10 split would alias the generator's
# source = f(doc_id) assignment and collapse the output to 2 sources).
#
# Exactness + scale in one trick: grams never shuffle as STRINGS —
# both sides reduce each 5-gram to the portable 60-bit md5 integer
# (the q97 idiom), so the anti-join moves longs. A 2^-60 collision
# would undercount novelty identically on both engines (the hash is
# part of the declared semantics, not an approximation of them).
# Train-side grams are DISTINCT before the join (one hash-dedup —
# dominated by the same shuffle the q14c posting index pays); the
# per-source output is ~20 rows.
# ---------------------------------------------------------------------------
_Q132_N = 5
_Q132_EVAL_MOD, _Q132_EVAL_REM = 10, 7


def q132_novelty_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .classify import md5_prefix_int

    docs = load(spark, sf_dir, "documents")
    # r8: split at the DOC level BEFORE shingling. The r7 shape built
    # one (doc, gram, hash) frame and filtered it per branch — and
    # since pinning that ~5× expansion costs more than recomputing it
    # (measured r7), the corpus was tokenize+shingle+md5'd TWICE. The
    # branches partition the corpus disjointly, so filtering docs
    # first makes total shingling work exactly ONE corpus pass split
    # 9:1 across the branches — same rows, half the map work, nothing
    # to pin.
    is_eval = (
        md5_prefix_int(F.col("doc_id").cast("string"), 8) % _Q132_EVAL_MOD
        == _Q132_EVAL_REM
    )

    def grams_of(d):
        return d.select(
            "doc_id",
            "source",
            F.explode(TXT.shingles(F.col("text"), _Q132_N)).alias("g"),
        ).select("doc_id", "source", md5_prefix_int(F.col("g"), 15).alias("h"))

    train_h = grams_of(docs.filter(~is_eval)).select("h").distinct()
    # r12: pin `ev` — the ~10% eval slice of the gram expansion feeds
    # BOTH the anti-join and the per-doc gram count; unpinned, the
    # eval-side tokenize+shingle+md5 ran twice. The r7 "don't pin"
    # measurement was about the FULL 5x expansion; the eval slice is
    # a tenth of it and pins cheap. Paired knob probe (min-of-4,
    # sf0.1): min 3.998 vs 4.585, median 4.234 vs 4.865 pinned vs
    # unpinned; oracle MATCH sf0.01 + sf0.1.
    ev = grams_of(docs.filter(is_eval)).localCheckpoint(eager=False)
    novel = ev.join(train_h, "h", "left_anti")
    per_doc = (
        ev.groupBy("doc_id", "source")
        .agg(F.count(F.lit(1)).alias("n_grams"))
        .join(
            novel.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_novel")),
            "doc_id",
            "left",
        )
        .select(
            "source",
            "n_grams",
            F.coalesce("n_novel", F.lit(0)).alias("n_novel"),
        )
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_eval_docs"),
            F.sum("n_grams").cast("long").alias("n_grams"),
            F.sum("n_novel").cast("long").alias("n_novel"),
        )
        .withColumn(
            "novelty_ppm", F.expr("CAST(n_novel * 1000000 DIV n_grams AS BIGINT)")
        )
        .orderBy("source")
    )


def _q132_sql() -> str:
    from .classify import sql_md5_prefix_int

    n = _Q132_N
    gram = " || ' ' || ".join(f"t[i+{k}]" for k in range(n)).replace("t[i+0]", "t[i]")
    return rf"""
WITH toks AS (
  SELECT doc_id, source, string_split_regex(lower(text), '\s+') AS t
  FROM documents
),
sh AS (
  SELECT doc_id, source,
         list_distinct(list_transform(range(1, greatest(len(t) - {n - 2}, 1)),
           i -> {gram})) AS s
  FROM toks
  WHERE len(t) >= {n}
),
grams0 AS (
  SELECT doc_id, source, {sql_md5_prefix_int(15)} AS hv
  FROM (SELECT doc_id, source, md5(UNNEST(s)) AS h FROM sh)
),
split AS (
  SELECT doc_id, ({sql_md5_prefix_int(8)} % {_Q132_EVAL_MOD}) AS bucket
  FROM (SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS h
        FROM (SELECT DISTINCT doc_id FROM toks))
),
grams AS (
  SELECT g.doc_id, g.source, g.hv, s.bucket
  FROM grams0 g JOIN split s USING (doc_id)
),
train_h AS (
  SELECT DISTINCT hv FROM grams WHERE bucket <> {_Q132_EVAL_REM}
),
ev AS (
  SELECT * FROM grams WHERE bucket = {_Q132_EVAL_REM}
),
per_doc AS (
  SELECT e.doc_id, ANY_VALUE(e.source) AS source,
         COUNT(*) AS n_grams,
         SUM(CASE WHEN t.hv IS NULL THEN 1 ELSE 0 END) AS n_novel
  FROM ev e LEFT JOIN train_h t ON e.hv = t.hv
  GROUP BY e.doc_id
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_eval_docs,
       CAST(SUM(n_grams) AS BIGINT) AS n_grams,
       CAST(SUM(n_novel) AS BIGINT) AS n_novel,
       CAST(SUM(n_novel) * 1000000 // SUM(n_grams) AS BIGINT) AS novelty_ppm
FROM per_doc
GROUP BY source
ORDER BY source
"""


QUERIES["q132_novelty_scan"] = q132_novelty_scan
ORACLES["q132_novelty_scan"] = _q132_sql()


# ---------------------------------------------------------------------------
# Q139 — trained n-gram language-ID profiles + holdout confusion audit
# (Cavnar-Trenkle "N-Gram-Based Text Categorization", 1994).
#
# functions/text.lang_id (used by q12/q62) is the HEURISTIC tier: a
# fixed character-class CASE chain. This operator is the STATISTICAL
# tier a real corpus pipeline trains: per-language character-trigram
# profiles learned from a deterministic 80% split, then every holdout
# document classified by profile overlap and scored against its label.
# On this synthetic corpus the languages share one vocabulary, so the
# honest result is accuracy at majority-class scale — the operator
# measures the ARCHITECTURE (train/score split, bounded profiles,
# argmax with deterministic tie-breaks), which is exactly what the
# confusion matrix output makes auditable.
#
# All counts are exact integers; the only ranking keys are (df DESC,
# gram ASC) and (hits DESC, lang ASC) — total orders, so both engines
# pick identical profiles and identical predictions at any
# partitioning.
#
# Scale shape (100 TB): the corpus is trigram-exploded ONCE, split
# 8:2 at the document level BEFORE shingling (the q132 lesson — the
# branches partition the corpus disjointly). The train branch reduces
# map-side into the bounded (lang, gram) doc-frequency frame (trigram
# domain is bounded by the character set, not the corpus); the top-K
# window runs over that bounded frame only. The holdout branch joins
# its grams to the BROADCAST <= 5*K-row profile, so scoring is
# map-side; the per-document argmax aggregates <= 5 rows/doc with
# min_by (no window over the corpus). The single 1-row crossJoin
# carries the data-derived fallback language (plan-audit scalar-cross
# pattern, BNLJ_ALLOWED).
# ---------------------------------------------------------------------------

_Q139_K = 200      # profile size per language (Cavnar-Trenkle's 300-ish)
_Q139_HOLD = 8     # md5(doc_id) % 10 >= 8 -> holdout (20%)


def q139_ngram_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from .classify import md5_prefix_int

    docs = load(spark, sf_dir, "documents")
    bucket = md5_prefix_int(F.col("doc_id").cast("string"), 8) % 10
    base = docs.select("doc_id", "lang", F.lower("text").alias("t"), bucket.alias("bkt"))

    def grams_of(d: DataFrame) -> DataFrame:
        # distinct char-trigrams per doc, JVM-side (sequence+transform);
        # guarded: Spark's sequence(1, 0) would step BACKWARDS
        return d.select(
            "doc_id",
            "lang",
            F.explode(
                F.expr(
                    "CASE WHEN char_length(t) >= 3 THEN "
                    "array_distinct(transform(sequence(1, char_length(t) - 2),"
                    " i -> substring(t, i, 3))) "
                    "ELSE array() END"
                )
            ).alias("g"),
        )

    train = grams_of(base.filter(F.col("bkt") < _Q139_HOLD))
    hold = grams_of(base.filter(F.col("bkt") >= _Q139_HOLD))

    # bounded (lang, gram) doc-frequency frame -> top-K profile per lang
    prof = (
        train.groupBy("lang", "g")
        .agg(F.count(F.lit(1)).alias("df"))
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("lang").orderBy(F.desc("df"), F.asc("g"))
            ),
        )
        .filter(F.col("rk") <= _Q139_K)
        .select(F.col("lang").alias("cand"), "g")
        # pinned (r11): prof feeds the hits join AND the 1-row fallback
        # agg — unpinned, the train-side gram explode + doc-frequency
        # agg (the query's dominant pass) re-expanded into both
        .localCheckpoint(eager=False)
    )

    hits = (
        hold.join(F.broadcast(prof), "g")
        .groupBy("doc_id", "cand")
        .agg(F.count(F.lit(1)).alias("hits"))
    )
    best = hits.groupBy("doc_id").agg(
        F.expr("min_by(cand, struct(-hits, cand))").alias("pred")
    )
    fallback = prof.agg(F.min("cand").alias("fb"))  # data-derived, 1 row

    holdout_docs = base.filter(F.col("bkt") >= _Q139_HOLD).select("doc_id", "lang")
    classified = (
        holdout_docs.join(best, "doc_id", "left")
        .crossJoin(F.broadcast(fallback))
        .select("lang", F.coalesce("pred", "fb").alias("predicted"))
    )
    totals = classified.groupBy("lang").agg(F.count(F.lit(1)).alias("n_lang"))
    return (
        classified.groupBy("lang", "predicted")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
        .join(F.broadcast(totals), "lang")
        .select(
            "lang",
            "predicted",
            "n_docs",
            F.expr("CAST(n_docs * 1000000 DIV n_lang AS BIGINT)").alias("share_ppm"),
        )
        .orderBy("lang", "predicted")
    )


def _q139_sql() -> str:
    from .classify import sql_md5_prefix_int

    return rf"""
WITH base AS (
  SELECT doc_id, lang, lower(text) AS t,
         ({sql_md5_prefix_int(8)} % 10) AS bkt
  FROM (SELECT doc_id, lang, text, md5(CAST(doc_id AS VARCHAR)) AS h
        FROM documents)
),
grams AS (
  SELECT doc_id, lang, bkt,
         UNNEST(list_distinct(list_transform(
           range(1, greatest(length(t) - 1, 1)),
           i -> substr(t, CAST(i AS INT), 3)))) AS g
  FROM base
  WHERE length(t) >= 3
),
prof AS (
  SELECT lang AS cand, g FROM (
    SELECT lang, g,
           row_number() OVER (PARTITION BY lang
                              ORDER BY COUNT(*) DESC, g ASC) AS rk
    FROM grams WHERE bkt < {_Q139_HOLD}
    GROUP BY lang, g
  ) WHERE rk <= {_Q139_K}
),
hits AS (
  SELECT gr.doc_id, p.cand, COUNT(*) AS hits
  FROM grams gr JOIN prof p USING (g)
  WHERE gr.bkt >= {_Q139_HOLD}
  GROUP BY gr.doc_id, p.cand
),
best AS (
  SELECT doc_id, cand AS pred FROM (
    SELECT doc_id, cand,
           row_number() OVER (PARTITION BY doc_id
                              ORDER BY hits DESC, cand ASC) AS rk
    FROM hits
  ) WHERE rk = 1
),
classified AS (
  SELECT b.lang, COALESCE(be.pred, (SELECT MIN(cand) FROM prof)) AS predicted
  FROM base b LEFT JOIN best be USING (doc_id)
  WHERE b.bkt >= {_Q139_HOLD}
),
totals AS (SELECT lang, COUNT(*) AS n_lang FROM classified GROUP BY lang)
SELECT c.lang, c.predicted,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(*) * 1000000 // ANY_VALUE(t.n_lang) AS BIGINT) AS share_ppm
FROM classified c JOIN totals t ON c.lang = t.lang
GROUP BY c.lang, c.predicted
ORDER BY c.lang, c.predicted
"""


QUERIES["q139_ngram_lang_id"] = q139_ngram_lang_id
ORACLES["q139_ngram_lang_id"] = _q139_sql()


# ---------------------------------------------------------------------------
# Q146 — Zipf rank-frequency audit (corpus analysis; reference test.py's
# corpus-statistics role extended to a distribution-shape check, as the
# Gopher/C4 data papers do before training). Per language: rank tokens
# by frequency, keep the head, and report the rank x frequency product
# (constant under an ideal Zipf law) plus each rank's share and its
# product normalized to rank 1 in ppm. All-integer discipline: no
# float logs, no OLS in doubles — the rank.freq product IS the Zipf
# statistic in exact arithmetic, so the oracle hash is stable.
# Scale: one explode + two shuffles (token counts, per-lang top-k);
# top-k via row_number over a per-lang window on the *aggregated*
# (lang, tok) frame — tiny vs the corpus. No collect, no UDF.
# ---------------------------------------------------------------------------

_Q146_TOPK = 20


def q146_zipf_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "lang", F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("tok")
    ).filter(F.col("tok") != "")
    counts = toks.groupBy("lang", "tok").agg(
        F.count(F.lit(1)).cast("long").alias("freq")
    )
    totals = counts.groupBy("lang").agg(F.sum("freq").alias("lang_total"))
    w = Window.partitionBy("lang").orderBy(F.desc("freq"), F.asc("tok"))
    ranked = (
        counts.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= _Q146_TOPK)
        .withColumn(
            "f1", F.max(F.when(F.col("rank") == 1, F.col("freq"))).over(
                Window.partitionBy("lang")
            )
        )
    )
    return (
        ranked.join(F.broadcast(totals), "lang")
        .select(
            "lang",
            "rank",
            "tok",
            "freq",
            (F.col("rank") * F.col("freq")).alias("rf_product"),
            F.expr("freq * 1000000 DIV lang_total").alias("share_ppm"),
            F.expr("rank * freq * 1000000 DIV f1").alias("rf_vs_top_ppm"),
        )
        .orderBy("lang", "rank")
    )


Q146_SQL = rf"""
WITH toks AS (
  SELECT lang, UNNEST(string_split_regex(lower(text), '\s+')) AS tok
  FROM documents
),
counts AS (
  SELECT lang, tok, COUNT(*) AS freq FROM toks WHERE tok <> '' GROUP BY lang, tok
),
totals AS (SELECT lang, SUM(freq) AS lang_total FROM counts GROUP BY lang),
rk AS (
  SELECT lang, tok, freq,
         row_number() OVER (PARTITION BY lang ORDER BY freq DESC, tok ASC) AS rank
  FROM counts
),
ranked AS (
  SELECT lang, tok, freq, rank,
         MAX(CASE WHEN rank = 1 THEN freq END) OVER (PARTITION BY lang) AS f1
  FROM rk
)
SELECT r.lang,
       CAST(rank AS BIGINT) AS rank,
       tok,
       CAST(freq AS BIGINT) AS freq,
       CAST(rank * freq AS BIGINT) AS rf_product,
       CAST(freq * 1000000 // lang_total AS BIGINT) AS share_ppm,
       CAST(rank * freq * 1000000 // f1 AS BIGINT) AS rf_vs_top_ppm
FROM ranked r JOIN totals t ON r.lang = t.lang
WHERE rank <= {_Q146_TOPK}
ORDER BY r.lang, rank
"""

QUERIES["q146_zipf_audit"] = q146_zipf_audit
ORACLES["q146_zipf_audit"] = Q146_SQL


# ---------------------------------------------------------------------------
# Q147 — chi-squared token/language association (feature-selection audit
# for corpus curation: which tokens are most language-discriminative).
# Contingency per token: presence/absence x language over DISTINCT
# (doc, token) pairs. The statistic is the standard chi2 = sum over
# cells of (O - E)^2 / E with E = R*C/N, computed in the repo's
# exact-integer form: per-cell term = (O*N - R*C)^2 * 1e6 div (R*C),
# summed, then div N — identical DECIMAL(38,0)/HUGEINT arithmetic on
# both engines, so the hash is exact (no float division anywhere).
# Zero cells are materialized via a token x lang grid (tokens: top-K
# by document frequency — a tiny broadcast frame). When a token occurs
# in EVERY document (N = R) the absence row is empty and contributes 0.
# Scale: the distinct (doc,tok,lang) frame is one shuffle; the grid and
# all chi2 math run on K x 5 rows.
# ---------------------------------------------------------------------------

_Q147_TOPK = 30


def q147_chi2_token_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    dt = (
        docs.select(
            "doc_id",
            "lang",
            F.explode(
                F.array_distinct(F.split(F.lower(F.col("text")), r"\s+"))
            ).alias("tok"),
        )
        .filter(F.col("tok") != "")
    )
    n_total = docs.groupBy().agg(F.count(F.lit(1)).alias("n")).select("n")
    col_tot = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("c_l"))
    row_tot = dt.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    # top-K selection as orderBy+limit → TakeOrderedAndProject (per-
    # partition top-K merged on the driver), never a vocabulary-sized
    # single-task window (ADVICE r10).
    top = row_tot.orderBy(F.desc("df"), F.asc("tok")).limit(_Q147_TOPK)
    obs = dt.join(F.broadcast(top.select("tok")), "tok").groupBy(
        "tok", "lang"
    ).agg(F.count(F.lit(1)).alias("o"))
    grid = (
        F.broadcast(top)
        .crossJoin(F.broadcast(col_tot))
        .crossJoin(F.broadcast(n_total))
        .join(obs, ["tok", "lang"], "left")
        .select(
            "tok",
            "df",
            "lang",
            "c_l",
            "n",
            F.coalesce("o", F.lit(0)).alias("o"),
        )
    )
    sq = "CAST(o AS DECIMAL(38,0)) * n - CAST(df AS DECIMAL(38,0)) * c_l"
    term = (
        f"(({sq}) * ({sq}) * 1000000 DIV (CAST(df AS DECIMAL(38,0)) * c_l))"
        f" + (CASE WHEN n - df = 0 THEN CAST(0 AS DECIMAL(38,0)) ELSE "
        f"({sq}) * ({sq}) * 1000000 DIV (CAST(n - df AS DECIMAL(38,0)) * c_l) END)"
    )
    return (
        grid.withColumn("term", F.expr(term))
        .groupBy("tok")
        .agg(
            F.max("df").alias("df"),
            F.max("n").alias("n"),
            F.sum("term").alias("terms"),
        )
        .select(
            "tok",
            F.col("df").cast("long").alias("doc_freq"),
            F.expr("CAST(terms DIV n AS BIGINT)").alias("chi2_scaled"),
        )
        .orderBy(F.desc("chi2_scaled"), "tok")
    )


Q147_SQL = rf"""
WITH dt AS (
  SELECT DISTINCT doc_id, lang, UNNEST(string_split_regex(lower(text), '\s+')) AS tok
  FROM documents
),
dtc AS (SELECT doc_id, lang, tok FROM dt WHERE tok <> ''),
n_total AS (SELECT COUNT(*) AS n FROM documents),
col_tot AS (SELECT lang, COUNT(*) AS c_l FROM documents GROUP BY lang),
row_tot AS (SELECT tok, COUNT(*) AS df FROM dtc GROUP BY tok),
top AS (
  SELECT tok, df FROM (
    SELECT tok, df, row_number() OVER (ORDER BY df DESC, tok ASC) AS rk
    FROM row_tot
  ) WHERE rk <= {_Q147_TOPK}
),
obs AS (
  SELECT d.tok, d.lang, COUNT(*) AS o
  FROM dtc d JOIN top USING (tok)
  GROUP BY d.tok, d.lang
),
grid AS (
  SELECT t.tok, t.df, c.lang, c.c_l, n.n, COALESCE(o.o, 0) AS o
  FROM top t CROSS JOIN col_tot c CROSS JOIN n_total n
  LEFT JOIN obs o ON t.tok = o.tok AND c.lang = o.lang
),
terms AS (
  SELECT tok, df, n,
         ((CAST(o AS HUGEINT) * n - CAST(df AS HUGEINT) * c_l)
          * (CAST(o AS HUGEINT) * n - CAST(df AS HUGEINT) * c_l)
          * 1000000 // (CAST(df AS HUGEINT) * c_l))
         + (CASE WHEN n - df = 0 THEN 0 ELSE
            (CAST(o AS HUGEINT) * n - CAST(df AS HUGEINT) * c_l)
            * (CAST(o AS HUGEINT) * n - CAST(df AS HUGEINT) * c_l)
            * 1000000 // (CAST(n - df AS HUGEINT) * c_l) END) AS term
  FROM grid
)
SELECT tok,
       CAST(MAX(df) AS BIGINT) AS doc_freq,
       CAST(SUM(term) // MAX(n) AS BIGINT) AS chi2_scaled
FROM terms
GROUP BY tok
ORDER BY chi2_scaled DESC, tok
"""

QUERIES["q147_chi2_token_lang"] = q147_chi2_token_lang
ORACLES["q147_chi2_token_lang"] = Q147_SQL
