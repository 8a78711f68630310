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
    # r9 rotation. Every query declared through r8 has appeared green
    # in some CORRECTNESS_r*.json (r1–r8 union = 188/188), so the
    # front-load is (a) the 7 never-driver-checked r9 additions, then
    # (b) the queries whose PLANS changed this round (q87 single-pass
    # rework; the pre-partitioned shingle index + q14c PPJoin filter
    # touch every index consumer) so the driver re-certifies the new
    # plans, then (c) the oldest-certified tail (last green r4 or
    # earlier) so staleness keeps cycling out.
    # (a0) new in r10 — never driver-checked
    "m22_fmp4_frame_sample",
    "m23_mkv_frame_sample",
    "q145_kcore_peel",
    "q146_zipf_audit",
    "q147_chi2_token_lang",
    "q148_hll_source_overlap",
    "q149_ewma_revenue",
    "q150_rbo_rankings",
    # (a) new in r9 — never driver-checked
    "st7_transform_with_state",
    "m21_mov_frame_sample",
    "q139_ngram_lang_id",
    "q140_gini_concentration",
    "q141_cusum_changepoint",
    "q142_l_diversity",
    "q143_pr_curve_ap",
    "q144_dp_noisy_release",
    "st19_streaming_benford",
    # (b) plans reworked in r9
    "q87_mincost_supplier",
    "q14c_ngram_jaccard_pairs",
    "q83_prefix_filter_jaccard",
    "q27_decontamination",
    "q30_dedup_clusters",
    "q48_edit_distance_pairs",
    "q63_repeated_ngram_overlap",
    "q74_canonical_dedup",
    "q103_label_propagation",
    "q108_minhash_audit",
    "q122_minhash_lsh_pairs",
    "q123_simhash_hamming_pairs",
    "q125_substring_span_pairs",
    "q132_novelty_scan",
    "st15_streaming_lsh_dedup",
    # (c) oldest driver certification first (r2–r4 era)
    "q20_sql_entry",
    "m1_image_compress",
    "m2_image_metadata",
    "q1_incremental_antijoin",
    "q2_grouped_agg",
    "q3_join_chain",
    "q4a_customers_without_urgent_orders",
    "q5_window_suite",
    "q6_rollup",
    "q7_topk",
    "q8_setops",
    "q9a_scalar_strings",
    "q9b_scalar_dates_math",
    "q11b_asof_join",
    "q12a_token_stats",
    "q12b_json_extract",
    "q13_brute_force_topk",
    "q14a_exact_dedup",
    "q16_collect_years",
    "q17_approx_distinct",
    "q18_local_supplier_revenue",
    "q19_stage_dependency_dates",
    "q99_interval_overlap_join",
    "q111_ratio_to_parent",
    "q115_skyline",
    "q29_rolling_time_window",
    "q89_distribution_ranks",
    "m7_multimodal_bind",
    "m9_ann_ivf_topk",
    "m10_audio_metadata",
    "m11_video_frame_sample",
    "st1_streaming_tumbling",
    "st2_streaming_session",
    "st3_streaming_late_data",
    "st4_stream_stream_join",
    "st5_stateful_user_totals",
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
