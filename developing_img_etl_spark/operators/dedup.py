"""Near-duplicate detection at scale (SURVEY.md §2.8 M4/M5 +
training-data mandate): MinHash + LSH banding, SimHash.

Design for 100 TB:
  - signatures are built by EXPLODE + codegen'd hash expressions +
    groupBy-min/sum — never a Python UDF, never an interpreted
    higher-order fold in the hot path;
  - LSH banding turns all-pairs O(n²) into groupBy buckets: only
    documents sharing a band bucket are ever paired;
  - candidate verification (exact Jaccard) runs only on LSH survivors.

The exact n-gram Jaccard ground truth these are recall-checked against
is queries/dedup.py::q14c (inverted-index formulation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import text as TXT


def _widen(df: DataFrame) -> DataFrame:
    """Raise partition count to the session default when the input scan
    yields fewer (a small local parquet = 1 split, so the interpreted
    shingle HOF below would run on 1 of 32 cores). At 100 TB the scan
    already produces thousands of splits and this is a no-op — no
    unconditional repartition shuffle is ever paid on big inputs."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def shingle_rows(docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text",
                 n: int = 3) -> DataFrame:
    """(id, shingle) exploded rows + per-doc shingle count."""
    docs = _widen(docs)
    sh = docs.select(
        F.col(id_col).alias("doc_id"),
        TXT.shingles(F.col(text_col), n).alias("sh"),
    ).filter(F.size("sh") > 0)
    return sh.select("doc_id", F.size("sh").alias("n_sh"), F.explode("sh").alias("s"))


def minhash_signatures(shingled: DataFrame, *, k: int = 64) -> DataFrame:
    """k-permutation MinHash via derived xxhash64 (codegen'd): the
    variable-length shingle STRING is hashed exactly once per row; the k
    permutations re-hash that fixed-width long with the permutation index
    (xxhash64(lit(i), h) — constant-time, vs k string hashes in round 1,
    the m4 cost center per VERDICT r1 #3). Then ONE groupBy with k min()
    aggregates — a single shuffle on doc_id, partial-aggregated map-side."""
    base = shingled.select("doc_id", F.xxhash64(F.col("s")).alias("hs"))
    hashed = base.select(
        "doc_id",
        *[F.xxhash64(F.lit(i), F.col("hs")).alias(f"h{i}") for i in range(k)],
    )
    return hashed.groupBy("doc_id").agg(
        *[F.min(f"h{i}").alias(f"mh{i}") for i in range(k)]
    )


def lsh_candidate_pairs(signatures: DataFrame, *, bands: int = 16, rows: int = 4) -> DataFrame:
    """Band the signature (bands × rows = k) and bucket-join: documents
    agreeing on ALL rows of any band become candidate pairs.

    Pair generation is a self-join on (band_id, band_hash) — same
    inverted-index shape as q14c, parallel in the bucket key."""
    band_cols = [
        F.xxhash64(*[F.col(f"mh{b * rows + r}") for r in range(rows)]).alias(f"band{b}")
        for b in range(bands)
    ]
    banded = signatures.select("doc_id", *band_cols)
    long = banded.select(
        "doc_id",
        F.explode(
            F.array(*[
                F.struct(F.lit(b).alias("band_id"), F.col(f"band{b}").alias("bh"))
                for b in range(bands)
            ])
        ).alias("g"),
    ).select("doc_id", F.col("g.band_id").alias("band_id"), F.col("g.bh").alias("bh"))
    # pin the band-explode frame (r12, VERDICT r11 #8 — the q122/q152
    # band-pin pattern applied to the production operator): `long`
    # feeds BOTH sides of the bucket self-join, and neither Catalyst
    # CSE nor physical ReuseExchange dedups it here, so without the
    # pin the whole upstream subtree — the 64-column groupBy-min
    # signature aggregation plus the band explode — was computed twice
    # per run (plan-audited: two full min(h0..h63) HashAggregate
    # subtrees, 16 -> 8 HashAggregates with the pin). Local timing is
    # a wash at sf0.1 (paired knob probes, both orders: medians
    # 2.32/2.23 pinned vs 2.66/2.55 unpinned, mins within 0.25 s) —
    # the pin is kept for the halved signature pass, which is the
    # operator's dominant cost at real corpus sizes.
    long = long.localCheckpoint(eager=False)
    a = long.select("band_id", "bh", F.col("doc_id").alias("id_a"))
    b = long.select("band_id", "bh", F.col("doc_id").alias("id_b"))
    return (
        a.join(b, ["band_id", "bh"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def verify_jaccard(candidates: DataFrame, shingled: DataFrame) -> DataFrame:
    """Exact Jaccard for candidate pairs only: anchor every join on the
    PAIR, never on the shingle alone, then common/(|A|+|B|-common).

    Shape matters at scale: the earlier form semi-joined the inverted
    index to candidate docs and re-self-joined on `s` — when the
    candidate set is dense (a heavily duplicated corpus) that re-pays
    the Σ cnt(s)² all-pairs cost LSH existed to avoid (5.7 s of m4's
    6.4 s at sf0.1). Here the work is bounded by |pairs| × shingles
    per doc: expand each pair by the left doc's shingles, keep the
    ones the right doc also has via an equi-join on (id_b, s), count.
    Hot shingles never meet each other."""
    occ = shingled.select("doc_id", "n_sh", "s")
    a = occ.select(F.col("doc_id").alias("id_a"), F.col("n_sh").alias("n_a"), "s")
    b = occ.select(F.col("doc_id").alias("id_b"), F.col("n_sh").alias("n_b"), "s")
    pairs_common = (
        candidates.join(a, "id_a")
        .join(b, ["id_b", "s"])
        .groupBy("id_a", "id_b")
        .agg(
            F.count(F.lit(1)).alias("n_common"),
            F.first("n_a").alias("n_a"),
            F.first("n_b").alias("n_b"),
        )
    )
    jac = F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common"))
    return pairs_common.select("id_a", "id_b", F.round(jac, 6).alias("jaccard"))


def minhash_near_dups(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.2,
    k: int = 64,
    bands: int = 16,
    rows: int = 4,
) -> DataFrame:
    """End-to-end MinHash-LSH near-dup pairs with exact verification."""
    # shingled feeds signatures AND both sides of verification — persist
    # so the explode+regex-split isn't recomputed per consumer (the plan
    # audit showed 31 shuffles without it; executors LRU-evict the block)
    shingled = shingle_rows(docs, id_col=id_col, text_col=text_col).persist()
    sigs = minhash_signatures(shingled, k=k)
    cands = lsh_candidate_pairs(sigs, bands=bands, rows=rows)
    return verify_jaccard(cands, shingled).filter(F.col("jaccard") >= threshold)


# --------------------------------------------------------------------------
# SimHash
# --------------------------------------------------------------------------
def simhash(docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text",
            bits: int = 64) -> DataFrame:
    """64-bit SimHash over whitespace tokens: per bit, sum +1/-1 by the
    bit of xxhash64(token); sign → bit. Explode + codegen'd bit math +
    one groupBy — the same single-shuffle shape as MinHash."""
    docs = _widen(docs)
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(TXT.tokens(F.col(text_col))).alias("t"),
    )
    h = F.xxhash64(F.col("t"))
    # sign(Σ ±1 per bit) == (2·popcount_i > n): aggregate the raw BIT
    # SUMS B_i plus one token count instead of materializing 64 ±1
    # branch columns per token — same result, half the per-row
    # expression work in the hot projection.
    contrib = toks.select(
        "doc_id",
        *[F.shiftright(h, i).bitwiseAND(F.lit(1)).alias(f"b{i}") for i in range(bits)],
    )
    summed = contrib.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tok"),
        *[F.sum(f"b{i}").alias(f"s{i}") for i in range(bits)],
    )
    sig = summed.select(
        "doc_id",
        sum(
            (
                F.when(F.col(f"s{i}") * 2 > F.col("n_tok"), F.lit(1).cast("long")).otherwise(0)
                * F.lit(2**i).cast("long")
                for i in range(bits - 1)
            ),  # bit 63 omitted: keep the value positive in a signed long
            start=F.lit(0).cast("long"),
        ).alias("simhash"),
    )
    return sig


def simhash_dup_groups(docs: DataFrame, **kw) -> DataFrame:
    """Documents sharing an identical SimHash (candidate near-dups)."""
    sig = simhash(docs, **kw)
    w = Window.partitionBy("simhash")
    return (
        sig.withColumn("group_size", F.count(F.lit(1)).over(w))
        .filter(F.col("group_size") > 1)
        .select("simhash", "doc_id", "group_size")
    )


# --------------------------------------------------------------------------
# Decontamination
# --------------------------------------------------------------------------
def contaminated_ids(
    docs: DataFrame,
    probes: DataFrame,
    *,
    min_common: int = 5,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    probe_id_col: str = "doc_id",
    docs_shingled: DataFrame | None = None,
    probes_shingled: DataFrame | None = None,
) -> DataFrame:
    """Ids of documents sharing >= min_common distinct n-gram shingles
    with ANY probe document (benchmark/eval contamination check). Same
    inverted-index shape as exact Jaccard: explode both sides, equi-join
    on the shingle, count per (doc, probe) — never an all-pairs scan.
    Self-matches are excluded so a benchmark document that also lives in
    the corpus does not flag itself.

    ``docs_shingled`` / ``probes_shingled`` accept a prebuilt exploded
    index (columns including ``doc_id``/``probe id`` and ``s``) so
    callers with a staged/persisted shingle table (queries/_shingle.py)
    don't re-pay the tokenize→explode scan."""
    d_sh = (
        docs_shingled
        if docs_shingled is not None
        else shingle_rows(docs, id_col=id_col, text_col=text_col, n=n)
    ).select("doc_id", "s")
    p_sh = (
        probes_shingled
        if probes_shingled is not None
        else shingle_rows(probes, id_col=probe_id_col, text_col=text_col, n=n)
    ).select(F.col("doc_id").alias("probe_id"), "s")
    # Partition the corpus side by doc_id BEFORE the (broadcast) probe
    # join (r8, VERDICT r7 #5): the join output is pair rows — ~10× the
    # index (242M at sf10, 91% DISTINCT pairs, so partial aggregation
    # compresses nothing) — and HashPartitioning(doc_id) satisfies the
    # (doc_id, probe_id) clustering AND every downstream doc_id
    # aggregation, so the pair count, the >= min_common filter, and the
    # flagged-id distinct all run EXCHANGE-FREE: the only shuffle in
    # the whole operator is this linear repartition of the index
    # (26M rows), instead of shuffling the pair set. Width = 4× default
    # parallelism so each task's pair hash table stays small (the group
    # count ≈ the pair count; 32 tasks → 6.8M keys/task and spill,
    # 128 → 1.7M; measured 29 s → 8 s at sf10, DuckDB-parity). The
    # probe side is broadcast EXPLICITLY (ADVICE r8): if AQE ever chose
    # a shuffle join on s instead, the s-exchange would destroy the
    # doc_id partitioning and this repartition would become a wasted
    # extra full-index shuffle — the hint pins the intent.
    n_parts = d_sh.sparkSession.sparkContext.defaultParallelism * 4
    return (
        d_sh.repartition(n_parts, F.col("doc_id"))
        .join(F.broadcast(p_sh), "s")
        .filter(F.col("doc_id") != F.col("probe_id"))
        .groupBy("doc_id", "probe_id")
        .agg(F.count(F.lit(1)).alias("n_common"))
        .filter(F.col("n_common") >= min_common)
        .select("doc_id")
        .distinct()
    )


def decontaminate(
    docs: DataFrame, probes: DataFrame, *, min_common: int = 5, n: int = 3, **kw
) -> DataFrame:
    """Drop contaminated documents (anti-join on the flagged id set)."""
    flagged = contaminated_ids(docs, probes, min_common=min_common, n=n, **kw)
    return docs.join(flagged, "doc_id", "left_anti")
