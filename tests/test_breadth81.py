"""Breadth batch 61: ABC costing, temporal leakage, Yuen t, Burt
constraint, RE meta-analysis, split agreement."""

from __future__ import annotations

from nocouncil_etl_spark.registry import load_all

REG = load_all()


def test_abc_pools_fully_allocated(spark, sf_dir):
    from nocouncil_etl_spark.plans.breadth81 import (
        ABC_POOL_FULFILL,
        ABC_POOL_SUPPORT,
    )

    rows = REG["agg_activity_based_costing"].fn(spark, sf_dir).collect()
    assert rows
    tf = sum(r.fulfillment_cost for r in rows)
    ts = sum(r.support_cost for r in rows)
    assert abs(tf - ABC_POOL_FULFILL) <= len(rows)  # rounding slack
    assert abs(ts - ABC_POOL_SUPPORT) <= len(rows)


def test_temporal_leakage_random_split_leaks(spark, sf_dir):
    r = REG["dq_temporal_leakage"].fn(spark, sf_dir).first()
    assert r.n_leaked_random > 0  # random splits always leak on time data
    assert r.n_leaked_temporal == 0
    assert 0 < r.leak_share_milli <= 1000


def test_yuen_trim_counts(spark, sf_dir):
    r = REG["stat_yuen_trimmed_t"].fn(spark, sf_dir).first()
    assert r.h1 > 1 and r.h2 > 1


def test_burt_constraint_positive(spark, sf_dir):
    rows = REG["graph_burt_constraint"].fn(spark, sf_dir).collect()
    assert len(rows) == 15
    cs = [r.constraint_micro for r in rows]
    assert cs == sorted(cs, reverse=True)
    for r in rows:
        assert r.constraint_micro > 0
        assert r.degree >= 1


def test_meta_re_between_fixed_and_unweighted(spark, sf_dir):
    r = REG["stat_meta_random_effects"].fn(spark, sf_dir).first()
    assert r.k_studies > 1
    assert r.q_milli >= 0
    assert r.tau_cents >= 0
    assert r.fixed_mean_cents > 0 and r.re_mean_cents > 0


def test_split_criteria_rows(spark, sf_dir):
    rows = {r.criterion: r for r in REG["ml_split_criteria_agreement"].fn(spark, sf_dir).collect()}
    assert set(rows) == {"gini", "entropy", "misclass"}
    agree = {r.all_agree for r in rows.values()}
    assert len(agree) == 1
    if agree.pop() == 1:
        assert len({r.best_band for r in rows.values()}) == 1
