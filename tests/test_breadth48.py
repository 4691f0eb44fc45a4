"""Breadth batch 48: EWMA volatility, elasticity, Gaussian NB,
Ljung-Box, mix shift, partition evolution."""

from __future__ import annotations

from pyspark.sql import functions as F

from nocouncil_etl_spark.io import load
from nocouncil_etl_spark.plans.breadth48 import LB_CRIT_MICRO, PE_DOW
from nocouncil_etl_spark.registry import load_all

REG = load_all()


def test_ewma_peak_dominates_final_state(spark, sf_dir):
    rows = REG["ts_ewma_volatility"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.ewma_var_final >= 0
        assert r.ewma_var_max >= r.ewma_var_final
        assert 1 <= r.t_of_max <= r.n_changes


def test_elasticity_covers_brands_with_enough_weeks(spark, sf_dir):
    rows = REG["agg_price_elasticity"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_weeks >= 3


def test_gaussian_nb_confusion_accounting(spark, sf_dir):
    r = REG["ml_gaussian_nb"].fn(spark, sf_dir).first()
    assert r.tp + r.fp + r.fn + r.tn == r.n
    assert r.acc_ppm == ((r.tp + r.tn) * 1_000_000) // r.n
    assert r.tp + r.fn > 0  # positives exist in the data


def test_ljung_box_flags_follow_the_critical_value(spark, sf_dir):
    rows = REG["stat_ljung_box"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.q_micro >= 0
        assert r.df == 3
        assert (r.q_micro > LB_CRIT_MICRO) == (r.reject_white == 1)


def test_mix_shift_weights_are_shares(spark, sf_dir):
    rows = REG["agg_mix_shift_decomposition"].fn(spark, sf_dir).collect()
    assert rows
    assert abs(sum(r.w1_ppm for r in rows) - 1_000_000) <= len(rows) + 2
    assert abs(sum(r.w2_ppm for r in rows) - 1_000_000) <= len(rows) + 2
    for r in rows:
        assert r.r1_milli >= 0 and r.r2_milli >= 0


def test_partition_evolution_serves_both_generations(spark, sf_dir):
    rows = REG["io_partition_evolution"].fn(spark, sf_dir).collect()
    ev = load(spark, sf_dir, "events")
    direct = {
        r.event_type: r.n
        for r in ev.select(
            "event_type",
            (F.datediff(F.to_date("ts"), F.lit("1970-01-05").cast("date")) % 7).alias(
                "dow"
            ),
        )
        .filter(F.col("dow") == PE_DOW)
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert rows
    for r in rows:
        assert r.n == 2 * direct[r.event_type]  # one copy per generation
