"""Breadth batch 54: W-W runs, Lorenz asymmetry, 4-4-5 calendar, DP
utility, WER, Cook's distance."""

from __future__ import annotations

from nocouncil_etl_spark.plans.breadth74 import CD_TOP, DP_EPS_MILLI
from nocouncil_etl_spark.registry import load_all

REG = load_all()


def test_ww_runs_bounds(spark, sf_dir):
    r = REG["stat_wald_wolfowitz"].fn(spark, sf_dir).first()
    assert 1 <= r.runs <= r.n1 + r.n2
    assert r.n1 > 0 and r.n2 > 0


def test_lorenz_asymmetry_positive(spark, sf_dir):
    r = REG["agg_lorenz_asymmetry"].fn(spark, sf_dir).first()
    assert r.n > 0 and r.mu_cents > 0
    assert 0 < r.s_lac_milli < 2000  # S in (0, 2) by construction


def test_fiscal_445_periods_valid(spark, sf_dir):
    rows = REG["fn_fiscal_445_calendar"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 1 <= r.period <= 12
        # period week budget: 4 or 5 (+1 for the folded leap week)
        assert 1 <= r.n_weeks <= 6
        assert r.revenue_cents > 0


def test_dp_utility_monotone_in_eps(spark, sf_dir):
    rows = sorted(
        REG["privacy_dp_utility_curve"].fn(spark, sf_dir).collect(),
        key=lambda r: r.eps_milli,
    )
    assert [r.eps_milli for r in rows] == sorted(DP_EPS_MILLI)
    for r in rows:
        assert r.l1_err >= 0
        assert r.max_abs_err <= r.l1_err


def test_wer_bounds(spark, sf_dir):
    rows = REG["eval_word_error_rate"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.ref_tokens > 0
        # WER can exceed 1 but is bounded by max(len)/ref here ~ 1 + slack
        assert 0 <= r.edit_ops
        assert r.wer_milli >= 0


def test_cooks_distance_topk_sorted(spark, sf_dir):
    rows = REG["stat_cooks_distance"].fn(spark, sf_dir).collect()
    assert len(rows) == CD_TOP
    ds = [r.cooks_d_micro for r in rows]
    assert all(d >= 0 for d in ds)
    assert ds == sorted(ds, reverse=True)
