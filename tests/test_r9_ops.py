"""Pure-Python property tests for the r9 operator arithmetic — the
parts whose correctness is an algebraic identity rather than an
engine behavior, so they deserve a direct check beside the
oracle hash-matches:

  - q141: the cumsum-minus-running-min closed form IS the one-sided
    CUSUM recursion S_d = max(0, S_{d-1} + dev_d).
  - q144: the frozen geometric-mechanism thresholds are monotone,
    symmetric, and close the unit interval exactly.
  - q140: the integer Gini formula hits the textbook closed forms on
    degenerate distributions.

No Spark session needed — these run in milliseconds.
"""

from __future__ import annotations

from hypothesis import given, strategies as st


# ---------------------------------------------------------------- q141
def _cusum_recursive(devs: list[int]) -> list[int]:
    s, out = 0, []
    for d in devs:
        s = max(0, s + d)
        out.append(s)
    return out


def _cusum_closed_form(devs: list[int]) -> list[int]:
    out, cum, runmin = [], 0, 0
    for d in devs:
        cum += d
        runmin = min(runmin, cum)
        out.append(cum - min(runmin, 0))
    return out


@given(st.lists(st.integers(min_value=-10**6, max_value=10**6), max_size=200))
def test_cusum_closed_form_equals_recursion(devs):
    assert _cusum_closed_form(devs) == _cusum_recursive(devs)


# ---------------------------------------------------------------- q144
def test_dp_thresholds_monotone_symmetric_and_closed():
    from developing_img_etl_spark.queries.training import _q144_thresholds

    ths = _q144_thresholds()
    ks = [k for k, _ in ths]
    his = [hi for _, hi in ths]
    assert ks == list(range(-16, 17))
    assert his == sorted(his) and len(set(his)) == len(his)
    assert his[-1] == 16**15  # interval closed exactly
    # symmetry: P(noise = k) == P(noise = -k) within 1 unit of rounding
    widths = [his[0]] + [b - a for a, b in zip(his, his[1:])]
    for i in range(len(ks)):
        j = len(ks) - 1 - i  # mirror index: k <-> -k
        assert abs(widths[i] - widths[j]) <= 1, (ks[i], widths[i], widths[j])
    # the mode is zero noise
    assert max(range(len(ks)), key=lambda i: widths[i]) == ks.index(0)


def test_dp_case_ladder_covers_uniform_domain():
    from developing_img_etl_spark.queries.training import (
        _q144_case,
        _q144_thresholds,
    )

    case = _q144_case("u")
    # textual contract both engines parse: one WHEN per non-final k
    assert case.count("WHEN") == len(_q144_thresholds()) - 1
    assert case.strip().startswith("CASE") and case.strip().endswith("END")


# ---------------------------------------------------------------- q140
def _gini_ppm(xs: list[int]) -> int:
    xs = sorted(xs)
    n, s = len(xs), sum(xs)
    six = sum((i + 1) * x for i, x in enumerate(xs))
    return (2 * six - (n + 1) * s) * 1_000_000 // (n * s)


def test_gini_all_equal_is_zero():
    assert _gini_ppm([500] * 7) == 0


def test_gini_single_holder_is_n_minus_1_over_n():
    n = 10
    xs = [0] * (n - 1) + [1000]
    # textbook: G = (n-1)/n with zero-mass tail
    assert _gini_ppm(xs) == (n - 1) * 1_000_000 // n


@given(st.lists(st.integers(min_value=0, max_value=10**9), min_size=2, max_size=100))
def test_gini_bounds_and_tie_invariance(xs):
    if sum(xs) == 0:
        return  # undefined; the operator's frame always has revenue > 0
    g = _gini_ppm(xs)
    assert 0 <= g < 1_000_000
    # rank assignment among tied values cannot change the statistic:
    # _gini_ppm sorts, so any permutation of the input agrees
    assert g == _gini_ppm(list(reversed(xs)))
