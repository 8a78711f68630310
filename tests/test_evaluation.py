"""Property tests for the classifier-evaluation family (q128-q131,
st16): each metric is re-derived independently (brute force in
pandas/numpy) and must agree with the exact-integer engine output —
the oracle gate proves cross-engine identity, these prove the
ALGORITHM computes the metric it claims."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def logits(spark):
    from developing_img_etl_spark.queries.evaluation import _doc_logits

    return _doc_logits(spark, SF).toPandas()


def test_q128_auc_equals_bruteforce_pair_count(spark, logits):
    from developing_img_etl_spark.queries.evaluation import (
        _TRUTH_CHARS,
        q128_roc_auc,
    )

    out = q128_roc_auc(spark, SF).toPandas().set_index("source")
    df = logits.assign(pos=(logits.n_chars >= _TRUTH_CHARS).astype(int))
    for src, g in df.groupby("source"):
        p = g[g.pos == 1].logit.to_numpy()
        n = g[g.pos == 0].logit.to_numpy()
        if len(p) == 0 or len(n) == 0:
            assert pd.isna(out.loc[src, "auc_e6"])
            continue
        wins = (p[:, None] > n[None, :]).sum()
        ties = (p[:, None] == n[None, :]).sum()
        num2 = 2 * int(wins) + int(ties)  # doubled U statistic
        assert out.loc[src, "auc2_num"] == num2, src
        assert out.loc[src, "auc_e6"] == num2 * 1_000_000 // (
            2 * len(p) * len(n)
        ), src


def test_q129_kappa_equals_crosstab_formula(spark, logits):
    from developing_img_etl_spark.queries.evaluation import (
        _B_HI,
        _B_MID,
        _HI,
        _LO,
        q129_cohens_kappa,
    )

    out = q129_cohens_kappa(spark, SF).toPandas().set_index("source")
    df = logits.assign(
        a=np.where(
            logits.logit >= _HI, "high", np.where(logits.logit <= _LO, "low", "mid")
        ),
        b=np.where(
            logits.n_chars >= _B_HI,
            "high",
            np.where(logits.n_chars >= _B_MID, "mid", "low"),
        ),
    )
    for src, g in df.groupby("source"):
        n = len(g)
        agree = int((g.a == g.b).sum())
        pe_num = sum(
            int((g.a == k).sum()) * int((g.b == k).sum())
            for k in ("high", "mid", "low")
        )
        assert out.loc[src, "agree"] == agree, src
        assert out.loc[src, "pe_e6"] == pe_num * 1_000_000 // (n * n), src
        if n * n != pe_num:
            num = (n * agree - pe_num) * 1_000_000
            den = n * n - pe_num
            # both engines TRUNCATE integer division toward zero
            # (verified: DuckDB BIGINT/HUGEINT // and Spark DIV agree
            # on negatives); Python // floors, so emulate trunc
            trunc = (abs(num) // abs(den)) * (1 if (num < 0) == (den < 0) else -1)
            assert out.loc[src, "kappa_e6"] == trunc, src


def test_q130_bins_partition_and_ece_is_weighted_mean(spark):
    from developing_img_etl_spark.queries.evaluation import q130_calibration_audit

    out = q130_calibration_audit(spark, SF).toPandas()
    bins = out[out.bin >= 0]
    total = out[out.bin == -1].iloc[0]
    assert bins.n.sum() == total.n
    # decile bins: predicted mass sits inside its bin's ppm range
    for _, r in bins.iterrows():
        assert r.bin * 100_000 <= r.avg_pred_ppm, r
        assert r.avg_pred_ppm <= (r.bin + 1) * 100_000 or r.bin == 9, r
    assert total.gap_ppm == int((bins.n * bins.gap_ppm).sum()) // int(total.n)


def test_q131_covariance_matches_numpy(spark):
    from developing_img_etl_spark.queries.similarity import (
        _Q131_D,
        q131_embedding_covariance,
    )

    out = q131_embedding_covariance(spark, SF).toPandas()
    emb = pd.read_parquet(f"{SF}/embeddings.parquet")
    x = np.stack(emb.embedding.to_numpy())[:, :_Q131_D].astype(np.float64)
    cov = np.cov(x, rowvar=False, bias=True)  # population covariance
    for _, r in out.iterrows():
        got = r.cov_e12 / 1e12
        want = cov[int(r.i), int(r.j)]
        # e6 quantization + floor divisions: absolute error << 1e-5
        assert abs(got - want) < 1e-5, (r.i, r.j, got, want)
    mean = x.mean(axis=0)
    diag = out[out.i == out.j].set_index("i")
    for i in range(_Q131_D):
        assert abs(diag.loc[i, "mean_i_e6"] / 1e6 - mean[i]) < 2e-6


def test_st16_estimates_never_underestimate(spark):
    from developing_img_etl_spark.queries.streaming_batch import (
        st16_streaming_cms_counts,
    )

    out = st16_streaming_cms_counts(spark, SF).toPandas()
    ev0 = pd.read_parquet(f"{SF}/events.parquet")
    assert len(out) == min(20, ev0.user_id.nunique())
    assert (out.over_est >= 0).all()  # CMS one-sided error, post-replay
    # exact counts are the DOUBLED-delivery counts (2 staged copies)
    ev = pd.read_parquet(f"{SF}/events.parquet")
    top = (2 * ev.groupby("user_id").size()).sort_values(ascending=False)
    assert out.n_exact.iloc[0] == top.iloc[0]
