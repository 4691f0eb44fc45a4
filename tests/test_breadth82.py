"""Breadth batch 62: Katz, RLE model, prefix sweep, Hotelling T²,
burn rate, recourse."""

from __future__ import annotations

from nocouncil_etl_spark.plans.breadth82 import KATZ_SCALE, PD_KS
from nocouncil_etl_spark.registry import load_all

REG = load_all()


def test_katz_above_baseline(spark, sf_dir):
    rows = REG["graph_katz_centrality"].fn(spark, sf_dir).collect()
    assert len(rows) == 15
    ks = [r.katz_micro for r in rows]
    assert ks == sorted(ks, reverse=True)
    assert all(k >= KATZ_SCALE for k in ks)  # the +1 floor


def test_rle_sorted_is_floor(spark, sf_dir):
    rows = REG["io_rle_encoding_model"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.runs_sorted <= r.runs_natural <= r.n_rows
        assert r.sort_benefit_milli >= 1000


def test_prefix_sweep_monotone(spark, sf_dir):
    rows = sorted(
        REG["dedup_prefix_threshold_sweep"].fn(spark, sf_dir).collect(),
        key=lambda r: r.prefix_k,
    )
    assert [r.prefix_k for r in rows] == list(PD_KS)
    prev = 0
    for r in rows:
        assert r.n_groups >= prev  # longer prefixes split groups
        assert r.n_groups + r.n_dropped == r.n_docs
        prev = r.n_groups


def test_hotelling_nonnegative(spark, sf_dir):
    r = REG["stat_hotelling_t2"].fn(spark, sf_dir).first()
    assert r.n1 > 2 and r.n2 > 2
    assert r.t2_milli >= 0  # positive-definite quadratic form


def test_burn_rate_consistency(spark, sf_dir):
    r = REG["dq_slo_burn_rate"].fn(spark, sf_dir).first()
    assert 0 <= r.rate_1d_milli <= 1000
    assert 0 <= r.rate_7d_milli <= 1000
    if r.alert == 1:
        assert r.burn_1d_milli > 1000 and r.burn_7d_milli > 1000


def test_recourse_positive_distances(spark, sf_dir):
    rows = REG["ml_recourse_distance"].fn(spark, sf_dir).collect()
    if rows:  # both decision classes must exist for recourse to be defined
        for r in rows:
            assert r.recourse_bands >= 1
            assert r.pred in (0, 1)
