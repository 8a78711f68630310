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
    # r5 new operators + ADVICE fixes — certify first
    "q118_importance_logratio",
    "st14_stream_stream_left_outer",
    "q119_kmeans_fixed_point",
    "q102_zscore_anomalies",
    "q116_mad_outliers",
    "q101_entity_resolution",
    "q97_hll_distinct",
    "q113_quantile_sketch",
    # never driver-checked (r1–r4 union), module order
    "q53_winnowing_fingerprints",
    "q54_bpe_token_stats",
    "q58_bpe_merge_pairs",
    "q62_curation_funnel",
    "q67_curriculum_deciles",
    "q75_corpus_drift",
    "q79_bigram_surprisal",
    "q84_pmi_pairs",
    "q98_kneser_ney_bigrams",
    "q107_vocab_growth",
    "q117_perplexity_buckets",
    "q56_embedding_stats",
    "q68_contrastive_triplets",
    "q93_rrf_hybrid_retrieval",
    "q96_semdedup",
    "q100_int8_quantization",
    "q110_retrieval_eval",
    "q63_repeated_ngram_overlap",
    "q74_canonical_dedup",
    "q83_prefix_filter_jaccard",
    "q103_label_propagation",
    "q108_minhash_audit",
    "m13_arrow_topk",
    "m15_ann_pq_topk",
    "m12_bmp_compress",
    "m14_png_compress",
    "m16_wav_resample",
    "m17_gif_compress",
    "m18_jpeg_compress",
    "m19_phash_dedup",
    "q94_recursive_cte",
    "q39_pagerank",
    "q76_lateral_topk",
    "q78_correlated_scalar_subquery",
    "q80_filtered_aggregates",
    "q82_triangle_count",
    "q87_mincost_supplier",
    "q24_udaf_grouped_agg",
    "q25_grouped_map",
    "q90_sql_registered_udf",
    "q26_deterministic_sampling",
    "q57_group_topk_sample",
    "q65_split_label_balance",
    "q72_weighted_topk_sample",
    "q104_stratified_quota_sample",
    "q33_sequence_packing",
    "q34_pii_redaction",
    "q35_event_funnel",
    "q36_column_profile",
    "q37_merge_upsert",
    "q38_zorder_layout",
    "q40_price_histogram",
    "q41_grouping_sets",
    "q42_oov_rate",
    "q43_variant_json",
    "q44_document_chunks",
    "q45_tfidf_topterms",
    "q46_fk_integrity",
    "q47_skew_profile",
    "q49_jsonl_roundtrip",
    "q50_weighted_sampling",
    "q51_snapshot_diff",
    "q52_calendar_gapfill",
    "q55_time_travel_diff",
    "q59_merge_into_pruned",
    "q60_incremental_view_refresh",
    "q61_bloom_semijoin_reduction",
    "q64_k_anonymity",
    "q66_change_data_feed",
    "q71_scd2_history",
    "q73_point_in_time_join",
    "q81_linear_interpolation",
    "q85_schema_drift_union",
    "q88_table_fingerprint",
    "q91_csv_roundtrip",
    "q92_temperature_mixing",
    "q95_cms_heavy_hitters",
    "q106_benford_audit",
    "q69_cohort_retention",
    "q70_top_event_paths",
    "q86_capped_sessions",
    "q105_sliding_distinct_users",
    "q109_revenue_trend",
    "q112_markov_transitions",
    "q114_weekday_seasonality",
    "q77_quality_classifier",
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
