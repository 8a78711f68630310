"""Text-analysis column builders (SURVEY.md §2.8 M6 + training-data
mandate): tokenization, BPE-ish sub-token counting, quality scoring,
language-ID heuristic, document fingerprinting.

Everything is built from JVM-side Catalyst expressions (split /
regexp_extract_all / higher-order functions) — no Python UDFs, so the
hot path stays inside whole-stage codegen at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Kept ASCII + RE2-compatible so the DuckDB oracle can mirror exactly.
WS = r"\s+"
BPE_ISH = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"
PUNCT = r"[.,!?;:]"

STOPWORDS = ("the", "a", "an", "of", "to", "and", "in", "is", "on", "for")


def tokens(text: Column) -> Column:
    """Whitespace tokens (lowercased)."""
    return F.split(F.lower(text), WS)


def token_count(text: Column) -> Column:
    return F.size(tokens(text)).cast("long")


def subtoken_count(text: Column) -> Column:
    """BPE-ish sub-token count: alpha runs, digit runs, single symbols."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_ISH), 0)).cast("long")


def punct_ratio(text: Column) -> Column:
    n_punct = F.length(text) - F.length(F.regexp_replace(text, PUNCT, ""))
    return F.round(n_punct.cast("double") / F.length(text).cast("double"), 6)


def stopword_ratio(text: Column) -> Column:
    toks = tokens(text)
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
    return F.round(n_stop.cast("double") / F.size(toks).cast("double"), 6)


def avg_token_len(text: Column) -> Column:
    toks = tokens(text)
    total = F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t).cast("long")
    )
    return F.round(total.cast("double") / F.size(toks).cast("double"), 6)


def quality_ok(text: Column, *, min_tokens: int = 5, max_tokens: int = 100000) -> Column:
    """Boolean quality gate: length band + punctuation sanity."""
    n = token_count(text)
    return (n >= min_tokens) & (n <= max_tokens) & (punct_ratio(text) < 0.1)


def lang_id(text: Column) -> Column:
    """Character-class language-ID heuristic. Deterministic CASE chain —
    CJK → zh, Spanish/French/German marker chars, else en."""
    return (
        F.when(text.rlike(r"[一-鿿]"), F.lit("zh"))
        .when(text.rlike("[ñ¿¡]"), F.lit("es"))
        .when(text.rlike("[àâçèêëîïôùûœ]"), F.lit("fr"))
        .when(text.rlike("[äöüß]"), F.lit("de"))
        .otherwise(F.lit("en"))
    )


def fingerprint(text: Column) -> Column:
    """Normalization fingerprint: md5 of lowercase, whitespace-collapsed
    text — the exact-dedup key for near-identical formatting variants
    (generalizes the reference's composite-key dedup,
    /root/reference/test.py:103-107)."""
    norm = F.regexp_replace(F.trim(F.lower(text)), WS, " ")
    return F.md5(norm.cast("binary"))


def shingles(text: Column, n: int = 3) -> Column:
    """Distinct n-gram (word-level) shingle set — input to Jaccard/MinHash.

    Built from zip_with over shifted slices, NOT transform-with-index:
    higher-order functions are interpreted (no codegen / no CSE), so an
    array expression referenced inside a lambda body is re-evaluated per
    element — transform(seq, i -> element_at(tokens(text), i)) would
    re-run the regex split O(len²) times per row. zip_with's array
    arguments are children, evaluated exactly once."""
    toks = tokens(text)
    sz = F.size(toks)
    grams = toks
    for k in range(1, n):
        shifted = F.slice(toks, k + 1, F.greatest(sz - k, F.lit(0)))
        # concat_ws skips NULLs, so the ragged tail would silently produce
        # short grams — sliced off below instead.
        grams = F.zip_with(grams, shifted, lambda g, t: F.concat_ws(" ", g, t))
    valid = F.greatest(sz - (n - 1), F.lit(0))
    return F.array_distinct(F.slice(grams, 1, valid))


def positional_shingles(text: Column, n: int = 3) -> Column:
    """Ordered (non-distinct) n-gram array — element index IS the gram's
    1-based-minus-one token position, the input to positional substring
    matching (q125). Same zip_with construction as `shingles` (see its
    docstring for why not transform-with-index), minus the distinct."""
    toks = tokens(text)
    sz = F.size(toks)
    grams = toks
    for k in range(1, n):
        shifted = F.slice(toks, k + 1, F.greatest(sz - k, F.lit(0)))
        grams = F.zip_with(grams, shifted, lambda g, t: F.concat_ws(" ", g, t))
    valid = F.greatest(sz - (n - 1), F.lit(0))
    return F.slice(grams, 1, valid)


def chunk_starts(n_chars: Column, size: int, overlap: int) -> Column:
    """Start offsets (0-based) for fixed-size overlapping chunks: one
    chunk every ``size - overlap`` characters while text remains. Pure
    `F.sequence` — explodes JVM-side, no UDF. Contract: every char is
    covered, consecutive chunks share exactly ``overlap`` chars (except
    a shorter final chunk), offsets are a pure function of length — so
    chunk identity is stable across runs and engines — and zero-length
    text yields NO chunks (ADVICE r3: the unguarded sequence emitted
    one phantom empty chunk per empty doc, violating 'while text
    remains')."""
    if overlap >= size:
        raise ValueError(f"overlap ({overlap}) must be < size ({size})")
    step = size - overlap
    n = n_chars.cast("long")
    return F.when(
        n > 0, F.sequence(F.lit(0), F.greatest(F.lit(0), n - 1), F.lit(step))
    ).otherwise(F.array().cast("array<bigint>"))
