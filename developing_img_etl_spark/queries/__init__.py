"""Declared correctness queries (SURVEY.md §2.11).

Each submodule exposes:
  QUERIES: dict[name, Callable[(SparkSession, sf_dir), DataFrame]]
  ORACLES: dict[name, str]  — DuckDB-runnable ANSI SQL mirror (omitted
           for non-SQL-expressible operators; driver then does a weaker
           rows-only check).

Determinism contract (SURVEY.md §1.2 FP-noise note): every aggregate
over doubles is computed through exact DECIMAL intermediates in BOTH
the Spark query and the oracle SQL, with a final cast to DOUBLE —
identical bit-for-bit results regardless of partitioning/accumulation
order. Every computed column carries the same alias on both sides.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from . import (
    behavior,
    classify,
    dedup,
    evaluation,
    linkage,
    multimodal,
    relational,
    sampling,
    similarity,
    sketches,
    sql_surface,
    streaming_batch,
    text,
    training,
    udf_surface,
)

_MODULES = (
    relational,
    streaming_batch,
    text,
    similarity,
    dedup,
    multimodal,
    sql_surface,
    udf_surface,
    sampling,
    training,
    behavior,
    classify,
    sketches,
    linkage,
    evaluation,
)


# Driver-coverage rotation (VERDICT r4 #3): the round driver checks
# only the FIRST 50 entries of queries() in registration order, so
# across r1–r4 the union of CORRECTNESS artifacts covered just 70 of
# 161 declared queries. The list below front-loads the 91 queries that
# have NEVER appeared in a CORRECTNESS_r*.json (plus this round's
# ADVICE-touched fixes first, so the driver certifies them), computed
# from the r1–r4 artifacts. Names not listed keep module order after
# these. Rotate next round: drop names once a CORRECTNESS artifact
# shows them green, so the uncovered tail keeps surfacing.
_DRIVER_PRIORITY = (
    # r10 rotation (recomputed from the r1-r9 artifact union): (a) the
    # 9 never-driver-checked r10 additions; (b) the shingle-index
    # consumers whose LAYOUT changes this round (per-consumer natural/
    # source_s choice, AB_SHINGLE_LAYOUT_R10) so the driver
    # re-certifies the new plans; (c) the stalest-certified tail
    # (last green r2-r4) so staleness keeps cycling out.
    # (a) new in r10 — never driver-checked
    "m22_fmp4_frame_sample",
    "m23_mkv_frame_sample",
    "q145_kcore_peel",
    "q146_zipf_audit",
    "q147_chi2_token_lang",
    "q148_hll_source_overlap",
    "q149_ewma_revenue",
    "q150_rbo_rankings",
    "st20_streaming_ewma",
    # (b) index consumers re-planned in r10
    "q14c_ngram_jaccard_pairs",
    "q27_decontamination",
    "q30_dedup_clusters",
    "q48_edit_distance_pairs",
    "q63_repeated_ngram_overlap",
    "q74_canonical_dedup",
    "q83_prefix_filter_jaccard",
    "q103_label_propagation",
    "q108_minhash_audit",
    "q122_minhash_lsh_pairs",
    "q123_simhash_hamming_pairs",
    "q125_substring_span_pairs",
    "q132_novelty_scan",
    "st15_streaming_lsh_dedup",
    "q97_hll_distinct",
    # (c) stalest driver certification first (r2-r4 era)
    "m4_minhash_near_dups",
    "m5_simhash_groups",
    "m6_ann_lsh_topk",
    "m7_multimodal_bind",
    "m8_numpy_topk",
    "m9_ann_ivf_topk",
    "m10_audio_metadata",
    "m11_video_frame_sample",
    "q21_dependency_closure",
    "q14b_hash_canonical",
    "q31_cosine_near_dups",
    "q10a_unpivot",
    "q10b_pivot",
    "q11a_tumbling_window",
    "q11c_range_predicate_join",
    "q11d_bucket_range_join",
    "q11e_session_window",
    "q11f_sliding_window",
    "q12c_quality_scores",
    "q12d_langid_fingerprint",
    "q15_selfjoin_adjacent",
    "q22_percentiles",
    "q23_approx_percentiles",
    "q28_repetition_stats",
    "q32_vocab_topk",
)


def _prioritized(full: dict) -> dict:
    ordered = {n: full[n] for n in _DRIVER_PRIORITY if n in full}
    ordered.update((n, v) for n, v in full.items() if n not in ordered)
    return ordered


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in _MODULES:
        out.update(mod.QUERIES)
    return _prioritized(out)


def all_oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    for mod in _MODULES:
        out.update(mod.ORACLES)
    return out
