"""Breadth batch 56: G-test, h-index, clustering audit, Durbin-Watson,
membership gap, rec novelty."""

from __future__ import annotations

from nocouncil_etl_spark.registry import load_all

REG = load_all()


def test_g_test_shape(spark, sf_dir):
    r = REG["stat_g_test"].fn(spark, sf_dir).first()
    assert 1 <= r.n_cells <= 4
    # G can dip epsilon-negative from per-cell micro rounding only
    assert r.g_micro >= -4


def test_h_index_defining_property(spark, sf_dir):
    from nocouncil_etl_spark.io import load
    from pyspark.sql import functions as F

    r = REG["agg_h_index"].fn(spark, sf_dir).first()
    h = r.h_index
    per = (
        load(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    at_least_h = per.filter(F.col("n") >= h).count()
    at_least_h1 = per.filter(F.col("n") >= h + 1).count()
    assert at_least_h >= h
    assert at_least_h1 < h + 1
    assert r.core_orders >= h * h


def test_clustering_factor_unit_range(spark, sf_dir):
    r = REG["io_natural_clustering_audit"].fn(spark, sf_dir).first()
    assert r.n_files > 0
    assert 0 < r.clustering_factor_milli <= 1000
    assert r.mean_file_span_days <= r.table_span_days


def test_durbin_watson_range(spark, sf_dir):
    r = REG["stat_durbin_watson"].fn(spark, sf_dir).first()
    assert r.n > 2
    assert 0 <= r.dw_milli <= 4000


def test_membership_gap_fields(spark, sf_dir):
    r = REG["privacy_membership_gap"].fn(spark, sf_dir).first()
    assert r.n_train > 0 and r.n_holdout > 0
    assert r.membership_gap_micro == (
        r.holdout_logloss_micro - r.train_logloss_micro
    )


def test_rec_novelty_positive_bits(spark, sf_dir):
    r = REG["eval_rec_novelty"].fn(spark, sf_dir).first()
    assert r.n_users > 0
    assert r.min_si_micro >= 0  # buyers <= users, so bits >= 0
    assert r.mean_novelty_milli_bits >= 0
