"""Breadth batch 45: bitemporal as-of, quantile GD, MoR deletes,
Anderson-Darling, block bootstrap, column masking."""

from __future__ import annotations

from pyspark.sql import functions as F

from nocouncil_etl_spark.io import load
from nocouncil_etl_spark.plans.breadth45 import BB_REPS
from nocouncil_etl_spark.registry import load_all

REG = load_all()


def test_bitemporal_respects_both_time_axes(spark, sf_dir):
    rows = REG["join_bitemporal_asof"].fn(spark, sf_dir).collect()
    assert rows
    o = load(spark, sf_dir, "orders")
    mx = o.agg(F.max(F.to_date("o_orderdate")).alias("m")).first().m
    epoch_mx = (
        spark.createDataFrame([(mx,)], "m DATE")
        .select(F.datediff("m", F.lit("1970-01-01").cast("date")).alias("d"))
        .first()
        .d
    )
    tx_day, vt_day = epoch_mx - 30, epoch_mx - 45
    keys = [r.o_custkey for r in rows]
    assert len(keys) == len(set(keys))  # one believed version per key
    for r in rows:
        assert r.tf_day <= tx_day  # visible as of TX
        assert r.vf_day <= vt_day  # effective as of VT
        assert r.tf_day >= r.vf_day  # records never visible before valid


def test_quantile_gd_reduces_pinball_loss(spark, sf_dir):
    r = REG["ml_quantile_regression_gd"].fn(spark, sf_dir).first()
    assert r.improved == 1
    assert r.loss3_sum < r.loss0_sum
    assert r.a_micro > 0  # moved from 0 toward the (positive) median


def test_mor_deletes_remove_exactly_the_delete_vector(spark, sf_dir):
    rows = REG["io_merge_on_read_deletes"].fn(spark, sf_dir).collect()
    o = load(spark, sf_dir, "orders")
    n_total = o.count()
    n_del_expected = o.filter(
        (F.col("o_orderkey") % 7 == 0) & (F.col("o_orderstatus") == "F")
    ).count()
    assert rows
    assert rows[0].n_deletes == n_del_expected
    assert sum(r.n_live for r in rows) == n_total - n_del_expected


def test_anderson_darling_pool_accounting(spark, sf_dir):
    r = REG["stat_anderson_darling"].fn(spark, sf_dir).first()
    assert r.n_pooled == r.n_a + r.n_b
    assert r.n_a > 0 and r.n_b > 0
    assert r.a2_micro > 0


def test_block_bootstrap_interval_brackets_its_center(spark, sf_dir):
    r = REG["ts_block_bootstrap"].fn(spark, sf_dir).first()
    assert r.n_reps == BB_REPS
    assert r.lo_milli <= r.boot_mean_milli <= r.hi_milli
    assert r.var_milli2 >= 0
    assert r.n_days >= 10


def test_masking_preserves_joins_without_collisions(spark, sf_dir):
    r = REG["privacy_column_masking"].fn(spark, sf_dir).first()
    assert r.join_preserved == 1
    assert r.n_join_masked == r.n_join_raw
    assert r.n_key_collisions == 0
    assert r.n_masked_distinct == r.n_customers
