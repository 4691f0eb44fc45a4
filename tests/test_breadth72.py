"""Breadth batch 52: exposure fairness, parallel trends, bullwhip,
inference risk, rec diversity, CvM test."""

from __future__ import annotations

from nocouncil_etl_spark.registry import load_all

REG = load_all()


def test_exposure_shares_sum_to_one(spark, sf_dir):
    rows = REG["eval_exposure_fairness"].fn(spark, sf_dir).collect()
    assert rows
    assert abs(sum(r.exposure_share_milli for r in rows) - 1000) <= len(rows)
    assert abs(sum(r.population_share_milli for r in rows) - 1000) <= len(rows)
    for r in rows:
        assert r.exposure_gap_milli == (
            r.exposure_share_milli - r.population_share_milli
        )


def test_parallel_trends_gap_consistency(spark, sf_dir):
    r = REG["eval_parallel_trends"].fn(spark, sf_dir).first()
    assert r.n_months_treat > 2 and r.n_months_ctrl > 2
    assert (
        abs(
            r.pretrend_gap_cents
            - (r.treat_slope_cents - r.ctrl_slope_cents)
        )
        <= 1
    )


def test_bullwhip_positive(spark, sf_dir):
    rows = REG["agg_bullwhip_effect"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.bullwhip_milli >= 0
        assert r.n_months > 1


def test_inference_gain_nonnegative(spark, sf_dir):
    r = REG["privacy_inference_risk"].fn(spark, sf_dir).first()
    # per-source majority can never beat... actually never LOSE to the
    # global majority baseline
    assert r.inference_gain_milli >= 0
    assert r.n_correct <= r.n_total
    assert 0 <= r.attacker_acc_milli <= 1000


def test_rec_diversity_bounds(spark, sf_dir):
    r = REG["eval_rec_diversity"].fn(spark, sf_dir).first()
    assert r.n_users > 0
    assert 0 < r.catalog_coverage_milli <= 1000
    assert 0 < r.mean_brand_diversity_milli <= 1000


def test_cvm_nonnegative_shift(spark, sf_dir):
    r = REG["stat_cvm_two_sample"].fn(spark, sf_dir).first()
    assert r.n1 > 0 and r.n2 > 0
    # T >= -1/(6N) by construction; micro-quantized
    assert r.t_micro >= -1_000_000 // (6 * (r.n1 + r.n2)) - 1
