"""Breadth batch 49: ARCH(1), forecast errors, interpolated asof,
energy distance, lasso, spectral flatness."""

from __future__ import annotations

from nocouncil_etl_spark.registry import load_all

REG = load_all()


def test_arch1_fit_shape(spark, sf_dir):
    r = REG["ts_arch1_fit"].fn(spark, sf_dir).first()
    assert r.n > 2
    assert r.stationary in (0, 1)


def test_forecast_errors_ordering(spark, sf_dir):
    rows = REG["eval_forecast_error_suite"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n > 0
        assert r.wape_milli >= 0
        assert 0 <= r.smape_milli <= 2000  # sMAPE is bounded by 2


def test_asof_interpolated_within_bracket(spark, sf_dir):
    rows = REG["join_asof_interpolated"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.interp_v4 is not None


def test_energy_distance_nonnegative(spark, sf_dir):
    r = REG["stat_energy_distance"].fn(spark, sf_dir).first()
    assert r.n1 > 0 and r.n2 > 0
    assert r.energy_milli >= 0  # energy distance is a metric


def test_lasso_zeroes_or_fits(spark, sf_dir):
    r = REG["ml_lasso_soft_threshold"].fn(spark, sf_dir).first()
    assert 0 <= r.n_nonzero <= 2
    nz = (1 if r.b1_micro != 0 else 0) + (1 if r.b2_micro != 0 else 0)
    # n_nonzero computed on the unrounded doubles can only exceed the
    # rounded-micro count (a tiny coefficient rounds to 0)
    assert r.n_nonzero >= nz


def test_spectral_flatness_unit_interval(spark, sf_dir):
    r = REG["ts_spectral_flatness"].fn(spark, sf_dir).first()
    assert 1 <= r.n_periods <= 9
    assert 0 <= r.flatness_milli <= 1001  # GM <= AM
    assert 2 <= r.peak_period <= 10
