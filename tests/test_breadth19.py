"""Invariants for breadth batch 19 (new/returning, Beta posterior, IPW)."""

from __future__ import annotations

from pyspark.sql import functions as F

from nocouncil_etl_spark.plans.breadth19 import EFFECT_CENTS
from nocouncil_etl_spark.registry import load_all

REG = load_all()


def test_new_plus_returning_equals_dau_and_firsts_sum_to_users(spark, sf_dir):
    rows = sorted(
        REG["agg_new_vs_returning"].fn(spark, sf_dir).collect(), key=lambda r: r.day
    )
    assert rows
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    dau = {
        str(r.day): r.n
        for r in ev.select(F.col("ts").cast("date").alias("day"), "user_id")
        .distinct()
        .groupBy("day")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    for r in rows:
        assert r.n_new + r.n_returning == dau[r.day]
    # every user is new exactly once
    assert sum(r.n_new for r in rows) == ev.select("user_id").distinct().count()
    # day one: everyone is new
    assert rows[0].n_returning == 0


def test_beta_posterior_moments_are_consistent(spark, sf_dir):
    rows = REG["stat_beta_posterior"].fn(spark, sf_dir).collect()
    assert {r.arm for r in rows} == {"A", "B"}
    for r in rows:
        assert r.alpha == 1 + r.c
        assert r.beta == 1 + r.n - r.c
        mean = r.alpha / (r.alpha + r.beta)
        assert abs(r.post_mean - mean) < 1e-6
        var = (r.alpha * r.beta) / (
            (r.alpha + r.beta) ** 2 * (r.alpha + r.beta + 1)
        )
        assert abs(r.post_var - var) < 1e-9
        assert 0 < r.post_mean < 1


def test_ipw_recovers_planted_effect_where_naive_is_confounded(spark):
    # sf0.001 has only ~15 users — no estimator is meaningful there; the
    # recovery property is asserted at sf0.01 (150 users), the driver's
    # own correctness scale
    row = REG["eval_ipw_ate"].fn(spark, "/root/testdata/sf0.01").collect()[0]
    # the naive difference absorbs the +2000¢ confounder via the 70/30
    # assignment imbalance; IPW with the true propensities removes it
    assert abs(row.ate_ipw_cents - EFFECT_CENTS) < abs(
        row.ate_naive_cents - EFFECT_CENTS
    )
    # and the IPW point estimate is in the planted effect's neighborhood
    # (finite-sample noise from the hash assignment; generous band)
    assert abs(row.ate_ipw_cents - EFFECT_CENTS) < 1500
    assert row.ate_naive_cents > row.ate_ipw_cents  # confounding is positive
