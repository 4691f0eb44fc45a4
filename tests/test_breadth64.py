"""Breadth batch 44: GMD, id gaps, rich club, Cucconi, dictionary
model, Page trend."""

from __future__ import annotations

from nocouncil_etl_spark.plans.breadth64 import RC_KS
from nocouncil_etl_spark.registry import load_all

REG = load_all()


def test_gmd_nonnegative_and_bounded_by_range(spark, sf_dir):
    rows = REG["stat_gini_mean_difference"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.s_num >= 0  # sorted identity numerator is nonnegative
        assert r.gmd_milli >= 0


def test_id_gaps_accounting(spark, sf_dir):
    r = REG["dq_id_gap_islands"].fn(spark, sf_dir).first()
    # island arithmetic: observed + missing spans the full range
    assert r.n_keys + r.missing_total == r.max_id - r.min_id + 1
    if r.n_gaps > 0:
        assert r.largest_gap >= 1
        assert r.min_id < r.largest_gap_start < r.max_id
    else:
        assert r.largest_gap is None


def test_rich_club_monotone_membership(spark, sf_dir):
    rows = sorted(
        REG["graph_rich_club"].fn(spark, sf_dir).collect(), key=lambda r: r.k
    )
    assert [r.k for r in rows] == list(RC_KS)
    for a, b in zip(rows, rows[1:]):
        assert a.n_rich >= b.n_rich  # higher threshold, smaller club
        assert a.club_edges >= b.club_edges
    for r in rows:
        if r.phi_milli is not None:
            assert 0 <= r.phi_milli <= 1000


def test_cucconi_statistic_nonnegative(spark, sf_dir):
    r = REG["stat_cucconi_location_scale"].fn(spark, sf_dir).first()
    assert r.n1 > 0 and r.n2 > 0
    assert r.c_milli >= 0  # C is a positive-definite quadratic form


def test_dictionary_model_compresses_low_cardinality(spark, sf_dir):
    rows = REG["io_dictionary_encoding_model"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_distinct <= r.n
        assert r.dict_bytes > 0
        # order status/priority are tiny vocabularies: dictionary wins
        assert r.ratio_milli > 1000


def test_page_trend_shape(spark, sf_dir):
    r = REG["stat_page_trend"].fn(spark, sf_dir).first()
    assert r.k_treatments <= 7
    # L is bounded by the perfectly ordered arrangement
    k, nb = r.k_treatments, r.n_blocks
    lmax = nb * sum(j * j for j in range(1, k + 1))
    lmin = nb * sum(j * (k + 1 - j) for j in range(1, k + 1))
    assert lmin <= r.l_stat <= lmax
