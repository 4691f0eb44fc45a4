"""Breadth batch 46: Henderson, tiering, high-watermark fees,
permutation entropy, Cochran Q, Kendall W."""

from __future__ import annotations

import math

from nocouncil_etl_spark.registry import load_all

REG = load_all()


def test_henderson_preserves_level(spark, sf_dir):
    rows = REG["ts_henderson_trend"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.v4 - r.trend_v4 == r.residual_v4
    # weights sum to ~1 so the trend tracks the series level
    mean_v = sum(r.v4 for r in rows) / len(rows)
    mean_t = sum(r.trend_v4 for r in rows) / len(rows)
    assert abs(mean_t - mean_v) < 0.2 * abs(mean_v) + 1000


def test_tiering_partitions_account_for_everything(spark, sf_dir):
    from nocouncil_etl_spark.io import load

    rows = REG["io_hot_cold_tiering"].fn(spark, sf_dir).collect()
    assert {r.tier for r in rows} <= {"hot", "warm", "cold"}
    total = load(spark, sf_dir, "orders").count()
    assert sum(r.rows_ for r in rows) == total
    assert sum(r.est_bytes for r in rows) == total * 128


def test_high_watermark_fee_only_on_new_highs(spark, sf_dir):
    rows = sorted(
        REG["agg_high_watermark_fees"].fn(spark, sf_dir).collect(),
        key=lambda r: r.mon,
    )
    assert rows
    wm = None
    for r in rows:
        assert r.nav <= r.watermark
        if wm is not None:
            assert r.watermark >= wm
            if r.nav <= wm:
                assert r.fee == 0  # under water: no fee
        wm = r.watermark


def test_permutation_entropy_bounds(spark, sf_dir):
    r = REG["ts_permutation_entropy"].fn(spark, sf_dir).first()
    assert 1 <= r.n_patterns <= 6
    assert 0 <= r.entropy_micro <= int(1e6 * math.log(6)) + 6
    assert 0 <= r.normalized_milli <= 1001


def test_cochran_q_nonnegative(spark, sf_dir):
    r = REG["stat_cochran_q"].fn(spark, sf_dir).first()
    assert r.k_treatments == 7
    assert r.n_successes <= r.n_blocks * 7
    if r.q_milli is not None:
        assert r.q_milli >= 0


def test_kendall_w_unit_interval(spark, sf_dir):
    r = REG["stat_kendall_w"].fn(spark, sf_dir).first()
    assert 0 <= r.w_milli <= 1000
    assert r.k_treatments <= 7
