"""Breadth batch 60: turning points, OC curve, inspection paradox,
zone-map FPR, LSH planner, record highs."""

from __future__ import annotations

from nocouncil_etl_spark.plans.breadth80 import LSH_PLANS, OC_PS
from nocouncil_etl_spark.registry import load_all

REG = load_all()


def test_turning_points_bounds(spark, sf_dir):
    r = REG["ts_turning_points"].fn(spark, sf_dir).first()
    assert 0 <= r.turning_points <= r.n - 2
    assert r.expected_milli > 0


def test_oc_curve_monotone_decreasing(spark, sf_dir):
    rows = sorted(
        REG["stat_acceptance_sampling_oc"].fn(spark, sf_dir).collect(),
        key=lambda r: r.p_milli,
    )
    assert [r.p_milli for r in rows] == sorted(OC_PS)
    for a, b in zip(rows, rows[1:]):
        assert a.accept_micro >= b.accept_micro  # worse lots accepted less
    for r in rows:
        assert 0 <= r.accept_micro <= 1_000_000


def test_inspection_paradox_at_least_one(spark, sf_dir):
    r = REG["agg_inspection_paradox"].fn(spark, sf_dir).first()
    assert r.n_gaps > 0
    # Cauchy-Schwarz: length-biased mean >= plain mean
    assert r.paradox_ratio_milli >= 999


def test_zonemap_fp_accounting(spark, sf_dir):
    r = REG["io_zonemap_false_positive"].fn(spark, sf_dir).first()
    assert r.n_overlap <= r.n_files
    assert r.n_false_positive <= r.n_overlap
    assert r.n_truly_matching + r.n_false_positive >= r.n_overlap  # covers


def test_lsh_planner_recommends_one(spark, sf_dir):
    rows = REG["dedup_lsh_planner"].fn(spark, sf_dir).collect()
    assert len(rows) == len(LSH_PLANS)
    assert sum(r.recommended for r in rows) >= 1
    for r in rows:
        assert r.total_err_milli == r.fp_milli + r.fn_milli or (
            abs(r.total_err_milli - r.fp_milli - r.fn_milli) <= 1
        )


def test_record_highs_at_least_first(spark, sf_dir):
    r = REG["ts_record_highs"].fn(spark, sf_dir).first()
    assert 1 <= r.records <= r.n  # the first day is always a record
    assert r.expected_milli >= 1000
