"""Q151 — the corpus-build composition flagship (VERDICT r10 #7).

Chains the individually-certified training-data stages end-to-end over
`documents`, in one declared query, and hash-checks the final shard
manifest:

  1. curate      — q62's stage-4 predicate (length / quality / lang-id
                   agreement / zero PII), expression-identical to
                   text.py's funnel so the oracle replays every filter;
  2. near-dup    — canonical keep-one over the q74 capped-pair edges,
     canonical     restricted to the curated corpus. The composition
                   uses the DOMINANCE rule (drop a doc iff some shared-
                   shingle neighbor beats it on (n_chars DESC, doc_id
                   ASC)) rather than q74's transitive closure: the
                   per-pair rule is one join + one anti-join — no
                   iteration — so the DuckDB oracle stays feasible at
                   sf1 where the recursive-closure oracle DNFs
                   (SCALE.md q30/q74 rows). The closure tier remains
                   separately certified by q30/q74.
  3. mix         — q92's temperature mixing (sqrt-weight quotas →
                   per-source keep rates → multiplicative-hash
                   sampling) over the deduped keepers;
  4. pack        — q33's deterministic sequence packing
                   (operators/packing.py, portable bucket) of the
                   sampled docs into 4096-char sequences;
  5. shard       — packs route to 16 shards by a pure hash of
                   (pack_group, pack_id); the manifest aggregates
                   per-shard doc/pack/char counts and an id checksum.

What the hash-match certifies that the per-stage queries cannot: the
SCHEMA HAND-OFFS (each stage consumes exactly the previous stage's
columns), the end-to-end determinism of the composed sample, and that
one Spark session plans the whole chain without a collect between
stages.

Scale shape (the 100 TB audit): curation is a single scan with the
funnel predicates fused into it; the near-dup stage touches only the
capped inverted index (df in [2, cap] — never all-pairs) and resolves
canonicals with ONE aggregation + anti-join, no closure rounds; the
mixing rate frame is ~20 rows broadcast; packing is one hash exchange
+ one window per group (parallelism = n_groups); the manifest is a
16-row aggregate. Shuffle count of the whole chain: 6 (index groupBy,
pair self-join, loser agg, per-source counts, packing exchange, final
manifest agg).

Reference parity: the reference pipeline is itself a composition
(scan → resolve → transform → write, /root/reference/test.py:34-150);
q151 is that end-to-end discipline over the LLM-corpus stages.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..functions import pii as PII
from ..functions import text as TXT
from ..operators.packing import pack_sequences
from ._shingle import shingle_index
from .dedup import _capped_pair_edges
from .training import _BUCKETS, _K, _MIX_BUDGET_PPM, _SEED

_PACK_BUDGET = 4096
_PACK_GROUPS = 8
_PACK_SEED = 101  # decorrelated from the mixing hash (_SEED)
_N_SHARDS = 16


def _curated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents rows passing q62's stage-4 predicate (the funnel's
    n_curated population) — expression-identical to text.q62."""
    docs = load(spark, sf_dir, "documents")
    t = F.col("text")
    keep = (
        F.col("n_chars").between(100, 50_000)
        & TXT.quality_ok(t)
        & (TXT.lang_id(t) == F.col("lang"))
        & ((PII.email_count(t) + PII.phone_count(t) + PII.ipv4_count(t)) == 0)
    )
    return docs.filter(keep).select("doc_id", "source", "lang", "n_chars", "text")


def corpus_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stages 1-3 (curate → canonical near-dup drop → temperature mix):
    the sampled corpus frame (doc_id, source, lang, n_chars, text) —
    shared by q151's manifest and the S12 shard-writer pytest, so the
    declared hash and the written shards certify the SAME pipeline."""
    # stage-boundary pin (r11): `cur` feeds the index filter, both pair
    # annotation legs, and the kept anti-join — unpinned, Catalyst
    # re-expanded the scan + full funnel predicate chain (regex
    # quality/lang-id/PII) into every branch (plan-audited: 22 base
    # scans / 29 exchanges for the whole chain; the docstring's
    # 6-shuffle story assumes each stage is computed once).
    cur = _curated(spark, sf_dir).localCheckpoint(eager=False)
    cur_ids = cur.select("doc_id", "n_chars")

    # near-dup canonical keep-one (dominance rule) over curated docs:
    # the shared index filtered to curated ids keeps df-caps consistent
    # with the oracle's curated-only inverted index
    sh = shingle_index(spark, sf_dir).join(
        cur_ids.select("doc_id"), "doc_id"
    )
    pairs = _capped_pair_edges(sh, min_common=2).select("id_a", "id_b")
    na = cur_ids.select(
        F.col("doc_id").alias("id_a"), F.col("n_chars").alias("ch_a")
    )
    nb = cur_ids.select(
        F.col("doc_id").alias("id_b"), F.col("n_chars").alias("ch_b")
    )
    losers = (
        pairs.join(na, "id_a")
        .join(nb, "id_b")
        .select(
            F.when(F.col("ch_a") < F.col("ch_b"), F.col("id_a"))
            .otherwise(F.col("id_b"))  # tie → higher doc_id loses (id_a < id_b)
            .alias("doc_id")
        )
        .distinct()
    )
    # same pin for stage 2's output: `kept` feeds the per-source counts
    # AND the final mixing join — without it the capped-pair loser
    # derivation ran twice
    kept = cur.join(losers, "doc_id", "left_anti").localCheckpoint(eager=False)

    # q92 temperature mixing over the keepers
    per_src = kept.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    per_src = per_src.withColumn(
        "w", F.floor(F.sqrt(F.col("n_docs").cast("double")) * 1000).cast("long")
    )
    tot = per_src.agg(F.sum("w").alias("sum_w"), F.sum("n_docs").alias("n_total"))
    rates = (
        per_src.crossJoin(F.broadcast(tot))
        .select(
            "source",
            F.expr(
                f"least((n_total * {_MIX_BUDGET_PPM} DIV 1000000)"
                " * (w * 1000000 DIV sum_w) DIV 1000000"
                " * 1000000 DIV n_docs, 1000000)"
            ).alias("rate_ppm"),
        )
    )
    return (
        kept.join(F.broadcast(rates), "source")
        .filter(
            F.pmod(F.col("doc_id") * F.lit(_K) + F.lit(_SEED), F.lit(_BUCKETS))
            < F.col("rate_ppm")
        )
        .select("doc_id", "source", "lang", "n_chars", "text")
    )


def q151_corpus_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    sampled = corpus_sample(spark, sf_dir)

    # q33 packing with a decorrelated portable bucket
    bucket = F.pmod(
        F.col("doc_id") * F.lit(_K) + F.lit(_PACK_SEED), F.lit(_BUCKETS)
    )
    packed = pack_sequences(
        sampled.select("doc_id", "n_chars"),  # text never enters the pack shuffle
        "doc_id",
        "n_chars",
        _PACK_BUDGET,
        n_groups=_PACK_GROUPS,
        bucket=bucket,
    )

    # shard manifest: packs → shards by pure hash, 16-row aggregate
    sharded = packed.withColumn(
        "shard_id",
        F.pmod(
            F.col("pack_group").cast("long") * 31 + F.col("pack_id"),
            F.lit(_N_SHARDS),
        ).cast("int"),
    )
    return (
        sharded.groupBy("shard_id")
        .agg(
            F.countDistinct("pack_group", "pack_id").alias("n_packs"),
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("long").alias("n_chars"),
            F.sum("doc_id").cast("long").alias("id_sum"),
            F.min("doc_id").cast("long").alias("min_id"),
            F.max("doc_id").cast("long").alias("max_id"),
        )
        .orderBy("shard_id")
    )


def _q151_sql() -> str:
    npii = " + ".join(
        f"len(regexp_extract_all(text, '{p}'))" for p, _tok in PII.PATTERNS
    )
    from .dedup import _sql_capped_pairs

    return rf"""
WITH b AS (
  SELECT doc_id, source, lang, n_chars, text,
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
cur AS (
  SELECT doc_id, source, lang, n_chars, text FROM b
  WHERE (n_chars BETWEEN 100 AND 50000)
    AND n_tokens >= 5 AND n_tokens <= 100000 AND punct_ratio < 0.1
    AND lang_pred = lang AND n_pii = 0
),
toks AS (
  SELECT doc_id, source, string_split_regex(lower(text), '\s+') AS t FROM cur
),
shg AS (
  SELECT doc_id, source,
         list_distinct(list_transform(range(1, greatest(len(t) - 1, 1)),
           i -> concat_ws(' ', t[i], t[i+1], t[i+2]))) AS s
  FROM toks
  WHERE len(t) >= 3
),
inv AS (SELECT doc_id, source, UNNEST(s) AS shingle FROM shg),
{_sql_capped_pairs(2)},
losers AS (
  SELECT DISTINCT CASE WHEN ca.n_chars < cb.n_chars THEN p.id_a
                       ELSE p.id_b END AS doc_id
  FROM pairs p
  JOIN cur ca ON ca.doc_id = p.id_a
  JOIN cur cb ON cb.doc_id = p.id_b
),
kept AS (
  SELECT * FROM cur WHERE doc_id NOT IN (SELECT doc_id FROM losers)
),
per_src AS (
  SELECT source, COUNT(*) AS n_docs,
         CAST(floor(sqrt(CAST(COUNT(*) AS DOUBLE)) * 1000) AS BIGINT) AS w
  FROM kept GROUP BY source
),
tot AS (SELECT SUM(w) AS sum_w, SUM(n_docs) AS n_total FROM per_src),
rates AS (
  SELECT source,
         least((n_total * {_MIX_BUDGET_PPM} // 1000000)
               * (w * 1000000 // sum_w) // 1000000
               * 1000000 // n_docs, 1000000) AS rate_ppm
  FROM per_src CROSS JOIN tot
),
sampled AS (
  SELECT k.doc_id, k.n_chars
  FROM kept k JOIN rates r USING (source)
  WHERE (k.doc_id * {_K} + {_SEED}) % {_BUCKETS} < r.rate_ppm
),
h AS (
  SELECT doc_id, n_chars,
         (doc_id * {_K} + {_PACK_SEED}) % {_BUCKETS} AS hb
  FROM sampled
),
g AS (
  SELECT doc_id, n_chars,
         CAST(hb % {_PACK_GROUPS} AS INT) AS pack_group,
         COALESCE(SUM(n_chars) OVER (
             PARTITION BY hb % {_PACK_GROUPS} ORDER BY hb, doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
  FROM h
),
packs AS (
  SELECT doc_id, n_chars, pack_group,
         CAST(cum // {_PACK_BUDGET} AS BIGINT) AS pack_id,
         CAST((CAST(pack_group AS BIGINT) * 31 + cum // {_PACK_BUDGET})
              % {_N_SHARDS} AS INT) AS shard_id
  FROM g
)
SELECT shard_id,
       COUNT(DISTINCT (pack_group, pack_id)) AS n_packs,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS n_chars,
       CAST(SUM(doc_id) AS BIGINT) AS id_sum,
       CAST(MIN(doc_id) AS BIGINT) AS min_id,
       CAST(MAX(doc_id) AS BIGINT) AS max_id
FROM packs
GROUP BY shard_id
ORDER BY shard_id
"""


QUERIES = {"q151_corpus_build": q151_corpus_build}
ORACLES = {"q151_corpus_build": _q151_sql()}
