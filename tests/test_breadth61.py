"""Breadth batch 41: spectral bisection, Bass diffusion, ITS,
periodogram, PU prior, train/eval novelty."""

from __future__ import annotations

from nocouncil_etl_spark.plans.breadth61 import PG_TOP
from nocouncil_etl_spark.registry import load_all

REG = load_all()


def test_spectral_bisection_two_nontrivial_sides(spark, sf_dir):
    rows = {r.side: r for r in REG["graph_spectral_bisection"].fn(spark, sf_dir).collect()}
    assert set(rows) == {0, 1}
    cut = {r.cut_edges for r in rows.values()}
    assert len(cut) == 1  # cut is shared
    for r in rows.values():
        assert r.n_nodes > 0
        assert r.cut_edges <= r.volume or r.volume == 0


def test_bass_diffusion_plausible_coefficients(spark, sf_dir):
    r = REG["ts_bass_diffusion"].fn(spark, sf_dir).first()
    assert r.n_weeks > 0
    # on a finite adoption burst the quadratic fit should be concave
    if r.m_units is not None:
        assert r.m_units > 0
        if r.p_micro is not None:
            assert r.p_micro > 0  # innovation coefficient positive


def test_its_level_change_consistency(spark, sf_dir):
    r = REG["ts_interrupted_series"].fn(spark, sf_dir).first()
    assert r.t0 >= 1
    assert r.slope_change_milli == r.post_slope_milli - r.pre_slope_milli


def test_periodogram_returns_topk_positive_amplitudes(spark, sf_dir):
    rows = REG["ts_periodogram_topk"].fn(spark, sf_dir).collect()
    assert len(rows) == PG_TOP
    assert len({r.period for r in rows}) == PG_TOP
    for r in rows:
        assert 2 <= r.period <= 10
        assert r.amplitude >= 0


def test_pu_prior_recovers_label_frequency(spark, sf_dir):
    r = REG["ml_pu_prior_elkan"].fn(spark, sf_dir).first()
    # labeling is ~half the positives (id parity), so c-hat ~ 0.5
    assert 400_000 <= r.c_hat_micro <= 600_000
    # with the perfectly informative feature the corrected prior is exact
    # up to micro rounding of the two ratios
    assert abs(r.pi_hat_micro - r.pi_true_micro) <= 2
    assert r.n_labeled <= r.n_total


def test_novelty_rates_in_unit_range(spark, sf_dir):
    rows = REG["text_train_eval_overlap"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 < r.n_eval_types
        assert 0 <= r.n_novel <= r.n_eval_types
        assert 0 <= r.novelty_micro <= 1_000_000
