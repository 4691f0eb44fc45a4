"""Breadth batch 53: survivorship bias, W1 drift, microaggregation,
Breusch-Pagan, WRAcc rules, adaptive file sizing."""

from __future__ import annotations

from nocouncil_etl_spark.plans.breadth73 import MA_K, WR_TOP
from nocouncil_etl_spark.registry import load_all

REG = load_all()


def test_survivorship_bias_direction(spark, sf_dir):
    r = REG["dq_survivorship_bias"].fn(spark, sf_dir).first()
    assert r.n_survivors <= r.n_customers
    assert r.bias_milli == r.survivor_growth_milli - r.full_growth_milli


def test_w1_drift_nonnegative(spark, sf_dir):
    rows = REG["dq_drift_wasserstein"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n1 > 0 and r.n2 > 0
        assert r.w1_cents_milli >= 0


def test_microaggregation_k_guarantee(spark, sf_dir):
    from nocouncil_etl_spark.io import load

    r = REG["privacy_microaggregation"].fn(spark, sf_dir).first()
    total = load(spark, sf_dir, "customer").count()
    assert r.min_group_size >= MA_K
    assert r.max_group_size < 2 * MA_K + MA_K  # remainder folding bound
    assert r.n_groups == total // MA_K
    assert r.info_loss_sse >= 0


def test_breusch_pagan_lm_nonnegative(spark, sf_dir):
    r = REG["stat_breusch_pagan"].fn(spark, sf_dir).first()
    assert r.n > 2
    assert r.lm_milli >= 0
    assert r.heteroscedastic in (0, 1)


def test_wracc_rules_ranked(spark, sf_dir):
    rows = sorted(
        REG["ml_best_rule_wracc"].fn(spark, sf_dir).collect(),
        key=lambda r: r.rank,
    )
    assert 1 <= len(rows) <= WR_TOP
    for a, b in zip(rows, rows[1:]):
        assert a.wracc_micro >= b.wracc_micro
    for r in rows:
        assert 0 <= r.n_pos <= r.n_covered


def test_adaptive_sizing_reduces_skew(spark, sf_dir):
    r = REG["io_adaptive_file_sizing"].fn(spark, sf_dir).first()
    assert r.n_partitions > 0
    assert r.total_files >= r.n_partitions
    assert r.skew_after_milli <= r.skew_before_milli
    # after splitting, no file is more than ~2x the target
    assert r.skew_after_milli <= 2000
