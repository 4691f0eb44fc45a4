"""Breadth batch 58: variance ratio, label noise, partition advisor,
Brown-Forsythe, hour shift, C2ST."""

from __future__ import annotations

from nocouncil_etl_spark.registry import load_all

REG = load_all()


def test_variance_ratio_positive(spark, sf_dir):
    r = REG["ts_variance_ratio"].fn(spark, sf_dir).first()
    assert r.n1 > r.nq > 0
    assert r.vr_milli > 0


def test_label_noise_bounds(spark, sf_dir):
    r = REG["ml_label_noise_sensitivity"].fn(spark, sf_dir).first()
    assert 0 <= r.n_flipped_bands <= r.n_bands
    assert 0 <= r.affected_share_milli <= 1000


def test_partition_advisor_ordering(spark, sf_dir):
    rows = {r.scheme: r for r in REG["io_partition_scheme_advisor"].fn(spark, sf_dir).collect()}
    assert set(rows) == {"day", "month", "year"}
    assert rows["day"].n_partitions >= rows["month"].n_partitions
    assert rows["month"].n_partitions >= rows["year"].n_partitions
    assert rows["year"].avg_rows >= rows["month"].avg_rows


def test_brown_forsythe_nonnegative(spark, sf_dir):
    r = REG["stat_brown_forsythe"].fn(spark, sf_dir).first()
    assert r.k_groups >= 2
    assert r.f_milli >= 0


def test_hour_shift_fields(spark, sf_dir):
    r = REG["dq_hour_shift_detect"].fn(spark, sf_dir).first()
    assert 1 <= r.n_hours <= 24
    assert r.chi2_micro >= 0
    assert 0 <= r.worst_hour <= 23


def test_c2st_accuracy_is_a_rate(spark, sf_dir):
    r = REG["stat_c2st"].fn(spark, sf_dir).first()
    assert r.n_eval > 0
    assert 0 <= r.correct <= r.n_eval
    assert 0 <= r.acc_milli <= 1000
