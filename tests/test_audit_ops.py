"""Invariant tests for the r11 audit queries (queries/audit.py).

The oracle hash-match itself runs in test_oracle_queries.py; these pin
the audit-specific algebra that a hash can't explain on its own."""

from __future__ import annotations

from developing_img_etl_spark.queries.audit import (
    _TRUTH_PPM_ALL,
    _TRUTH_PPM_STRONG,
    q152_lsh_recall_audit,
    q153_repetition_signals,
)


def test_q152_confusion_algebra(spark, sf_dir):
    rows = q152_lsh_recall_audit(spark, sf_dir).collect()
    assert rows, "audit must cover at least one source"
    assert _TRUTH_PPM_ALL < _TRUTH_PPM_STRONG
    for r in rows:
        # confusion cells partition the pair universe
        assert r.tp + r.fn == r.n_truth
        assert r.tp + r.fp == r.n_cand
        assert r.tp_strong <= r.tp and r.tp_strong <= r.n_strong
        assert r.n_strong <= r.n_truth
        # the doubled corpus guarantees >= 1 exact-dup pair per source,
        # and 4x4 banding can never miss an identical signature pair
        # whose bucket holds just the two copies
        assert r.n_strong >= 1
        assert 0 <= r.recall_all_ppm <= 1_000_000
        assert 0 <= r.recall_strong_ppm <= 1_000_000
        assert 0 <= r.precision_ppm <= 1_000_000


def test_q152_strong_recall_is_total_on_doubled_corpus(spark, sf_dir):
    """Every strong pair in the synthetic corpus is either an exact
    double (identical signatures -> always a shared band) or a planted
    near-dup well above the banding threshold — 4x4 LSH must keep them
    all. A recall_strong_ppm below 1e6 would mean the band/bucket logic
    dropped a real near-dup."""
    for r in q152_lsh_recall_audit(spark, sf_dir).collect():
        assert r.recall_strong_ppm == 1_000_000, r


def test_q153_signal_bounds(spark, sf_dir):
    rows = q153_repetition_signals(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_docs >= 1
        assert 0 <= r.n_flagged <= r.n_docs
        # top token is at least 1/n_tok of the doc and at most all of it
        assert 0 < r.avg_top_ppm <= 1_000_000
        assert 0 <= r.avg_dup_bigram_ppm < 1_000_000
        assert 0 < r.avg_distinct_ppm <= 1_000_000
