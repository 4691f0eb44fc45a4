"""Invariants for sketch_theta_intersection and ts_holt_winters_seasonal."""

from __future__ import annotations

from nocouncil_etl_spark.plans.timeseries3 import FP, HW_H, PERIOD
from nocouncil_etl_spark.registry import load_all

REG = load_all()


# --------------------------------------------------------------------------
# sketch_theta_intersection
# --------------------------------------------------------------------------


def test_theta_intersection_estimates_track_exact(spark, sf_dir):
    rows = REG["sketch_theta_intersection"].fn(spark, sf_dir).collect()
    assert rows, "documents span multiple sources"
    for r in rows:
        assert r.src_a < r.src_b
        assert r.n_sub_theta >= 0
        assert r.est_inter >= 0.0
        # a sub-θ overlap hash certifies a REAL shared gram: it implies exact > 0
        if r.n_sub_theta > 0:
            assert r.n_exact > 0
    # the estimator should be in the right order of magnitude when the
    # overlap is non-trivial: |est − exact| within 5× + additive slack
    # (K=64 is a deliberately small sketch; this bounds gross failure, the
    # exactness of the arithmetic itself is the oracle's job)
    for r in rows:
        if r.n_exact >= 50:
            assert r.est_inter <= 5 * r.n_exact + 100
            assert 5 * r.est_inter + 100 >= r.n_exact


def test_theta_intersection_covers_all_source_pairs(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_sources = docs.select("source").distinct().count()
    rows = REG["sketch_theta_intersection"].fn(spark, sf_dir).collect()
    assert len(rows) == n_sources * (n_sources - 1) // 2


# --------------------------------------------------------------------------
# ts_holt_winters_seasonal
# --------------------------------------------------------------------------


def test_hw_seasonal_shape_and_forecast_tail(spark, sf_dir):
    rows = sorted(
        REG["ts_holt_winters_seasonal"].fn(spark, sf_dir).collect(),
        key=lambda r: r.idx,
    )
    fitted = [r for r in rows if r.observed is not None]
    fc = [r for r in rows if r.observed is None]
    assert len(fc) == HW_H
    assert fitted, "fitted region non-empty"
    # indices are contiguous from PERIOD through the forecast tail
    assert [r.idx for r in rows] == list(
        range(PERIOD, PERIOD + len(rows))
    )
    # forecast rows carry the terminal level/trend
    term = fitted[-1]
    for r in fc:
        assert r.level_fp == term.level_fp
        assert r.trend_fp == term.trend_fp


def test_hw_seasonal_tracks_weekday_pattern_better_than_holt(spark, sf_dir):
    """One-step-ahead absolute error of HW ≤ Holt's on the shared fitted
    region — the seasonal component must not make the fit worse on a
    series with weekday structure."""
    hw = {
        r.idx: r
        for r in REG["ts_holt_winters_seasonal"].fn(spark, sf_dir).collect()
        if r.observed is not None
    }
    holt = {
        r.idx: r
        for r in REG["ts_holt_forecast"].fn(spark, sf_dir).collect()
        if r.observed is not None
    }
    # next_fc at idx i predicts idx i+1's observation
    common = sorted(set(hw) & set(holt))
    err_hw = err_holt = 0.0
    n = 0
    for i in common:
        if i + 1 in hw and hw[i + 1].observed is not None:
            y = hw[i + 1].observed
            err_hw += abs(hw[i].next_fc - y)
            err_holt += abs(holt[i].one_ahead - y)
            n += 1
    assert n >= PERIOD
    assert err_hw <= err_holt * 1.25  # at worst marginally noisier


def test_hw_seasonals_sum_is_bounded(spark, sf_dir):
    """Additive seasonals hover around zero (they encode deviations from
    level): the terminal ring's mean magnitude stays below the level."""
    rows = [
        r
        for r in REG["ts_holt_winters_seasonal"].fn(spark, sf_dir).collect()
        if r.observed is None
    ]
    term_level = abs(rows[0].level_fp) or FP
    for r in rows:
        assert abs(r.seas_fp) <= 5 * term_level
