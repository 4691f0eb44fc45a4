"""Breadth batch 51: D'Hondt, Tukey HSD, blend grid, madogram, Mood
median, worst slices."""

from __future__ import annotations

from nocouncil_etl_spark.plans.breadth71 import BL_WS, DH_SEATS, WS_TOP
from nocouncil_etl_spark.registry import load_all

REG = load_all()


def test_dhondt_seats_sum_to_house(spark, sf_dir):
    rows = REG["agg_dhondt_seats"].fn(spark, sf_dir).collect()
    assert sum(r.seats for r in rows) == DH_SEATS
    big = max(rows, key=lambda r: r.votes_cents)
    small = min(rows, key=lambda r: r.votes_cents)
    assert big.seats >= small.seats  # monotone in votes


def test_tukey_hsd_pairs_symmetric_coverage(spark, sf_dir):
    rows = REG["stat_tukey_hsd"].fn(spark, sf_dir).collect()
    assert rows
    groups = {r.group_a for r in rows} | {r.group_b for r in rows}
    k = len(groups)
    assert len(rows) == k * (k - 1) // 2
    for r in rows:
        assert r.q_milli >= 0
        assert r.df_error > 0


def test_blend_grid_picks_from_grid(spark, sf_dir):
    r = REG["ml_blend_grid"].fn(spark, sf_dir).first()
    assert r.w_milli in BL_WS
    assert r.logloss_micro > 0


def test_madogram_monotone_gammas(spark, sf_dir):
    r = REG["ts_madogram_roughness"].fn(spark, sf_dir).first()
    assert r.gamma_1 > 0
    # variograms are nondecreasing in lag for (near-)stationary series
    assert r.gamma_8 >= r.gamma_1 * 0.5  # loose sanity, not strict
    assert 0 <= r.fractal_dim_milli <= 2500


def test_mood_median_split_roughly_half(spark, sf_dir):
    rows = REG["stat_mood_median"].fn(spark, sf_dir).collect()
    total = sum(r.n for r in rows)
    above = sum(r.n_above for r in rows)
    # by the median definition, at most half are strictly above
    assert above <= total // 2 + 1
    for r in rows:
        assert r.chi2_term_micro >= 0


def test_worst_slices_ranked_desc(spark, sf_dir):
    rows = sorted(
        REG["dq_worst_slices"].fn(spark, sf_dir).collect(), key=lambda r: r.rank
    )
    assert 1 <= len(rows) <= WS_TOP
    for a, b in zip(rows, rows[1:]):
        assert a.mean_abs_err >= b.mean_abs_err
