"""Breadth batch 44: PACF, AdaBoost, Heaps' law, Nelson-Aalen, DP mean,
Dunn post-hoc."""

from __future__ import annotations

from nocouncil_etl_spark.plans.breadth44 import ADA_STUMPS, DPM_CLIP, DUNN_ZCRIT
from nocouncil_etl_spark.registry import load_all

REG = load_all()


def test_pacf_lag1_equals_acf1_and_is_bounded(spark, sf_dir):
    rows = REG["ts_pacf_durbin"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        # Durbin-Levinson level 1 IS the lag-1 autocorrelation
        assert r.pacf1_1e6 == r.acf1_1e6
        for v in (r.acf1_1e6, r.acf2_1e6, r.acf3_1e6):
            assert abs(v) <= 1_000_000
        assert r.n > 3


def test_adaboost_alpha_sign_tracks_error(spark, sf_dir):
    r = REG["ml_adaboost_stumps"].fn(spark, sf_dir).first()
    sids = {s for s, _, _ in ADA_STUMPS}
    assert r.r1_sid in sids and r.r2_sid in sids
    for eps, alpha in ((r.r1_eps_ppm, r.r1_alpha_micro),
                       (r.r2_eps_ppm, r.r2_alpha_micro)):
        assert 0 < eps < 1_000_000
        assert (alpha > 0) == (eps < 500_000)
    assert 0 <= r.acc_ppm <= 1_000_000
    assert r.n_correct <= r.n


def test_heaps_beta_is_a_sublinear_growth_exponent(spark, sf_dir):
    r = REG["text_heaps_law"].fn(spark, sf_dir).first()
    assert 0 < r.beta_1e6 < 1_000_000  # vocabulary grows, but sublinearly
    assert 0 < r.vocab <= r.total_tokens
    assert 0 < r.n_ckpts <= 64
    assert r.n_docs > 0


def test_nelson_aalen_dominates_kaplan_meier(spark, sf_dir):
    na = {r.week: r for r in REG["survival_nelson_aalen"].fn(spark, sf_dir).collect()}
    km = {r.week: r for r in REG["survival_kaplan_meier"].fn(spark, sf_dir).collect()}
    assert na and set(na) == set(km)
    prev = 0
    for wk in sorted(na):
        r = na[wk]
        assert r.cumhaz_micro >= prev  # hazard accumulates
        prev = r.cumhaz_micro
        assert 0 < r.na_survival <= 1
        # exp(-sum d/n) >= prod(1 - d/n): NA survival sits above KM
        assert r.na_survival >= km[wk].survival - 1e-6


def test_dp_clipped_mean_error_is_noise_bounded(spark, sf_dir):
    rows = REG["privacy_dp_clipped_mean"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.clip_frac_ppm <= 1_000_000
        assert 0 <= r.true_mean_milli <= 1000 * DPM_CLIP
        # the release differs from truth by exactly the scaled noise
        assert abs(r.dp_mean_milli - r.true_mean_milli) <= (
            1000 * abs(r.noise)
        ) // r.n + 1


def test_dunn_reports_all_pairs_with_consistent_flags(spark, sf_dir):
    rows = REG["stat_dunn_posthoc"].fn(spark, sf_dir).collect()
    k = len({r.et_a for r in rows} | {r.et_b for r in rows})
    assert len(rows) == k * (k - 1) // 2
    for r in rows:
        assert r.et_a < r.et_b
        assert (abs(r.z_dunn) > DUNN_ZCRIT) == (r.significant == 1)
