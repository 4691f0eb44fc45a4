"""Breadth batch 47: Erlang C, Mondrian, k-gram fuzzy, CAPM beta,
histogram selectivity, Simpson diversity."""

from __future__ import annotations

from nocouncil_etl_spark.plans.breadth67 import ERL_CMAX, KG_QUERIES
from nocouncil_etl_spark.registry import load_all

REG = load_all()


def test_erlang_monotone_in_servers(spark, sf_dir):
    rows = sorted(
        REG["agg_erlang_c_staffing"].fn(spark, sf_dir).collect(),
        key=lambda r: r.c,
    )
    assert [r.c for r in rows] == list(range(1, ERL_CMAX + 1))
    for a, b in zip(rows, rows[1:]):
        assert a.erlang_b_micro >= b.erlang_b_micro  # more servers, less block
    for r in rows:
        assert 0 <= r.erlang_b_micro <= 1_000_000
        if r.erlang_c_micro is not None:
            assert r.erlang_b_micro <= r.erlang_c_micro <= 1_000_000


def test_mondrian_leaves_partition_population(spark, sf_dir):
    from nocouncil_etl_spark.io import load

    rows = REG["privacy_mondrian_2level"].fn(spark, sf_dir).collect()
    assert {(r.sx, r.sy) for r in rows} == {(0, 0), (0, 1), (1, 0), (1, 1)}
    total = load(spark, sf_dir, "customer").count()
    assert sum(r.k_size for r in rows) == total
    for r in rows:
        assert r.x_lo <= r.x_hi and r.y_lo <= r.y_hi


def test_kgram_finds_the_intended_corrections(spark, sf_dir):
    rows = {r.pattern: r for r in REG["search_kgram_fuzzy"].fn(spark, sf_dir).collect()}
    for q in KG_QUERIES:
        if q in rows and rows[q].best_term is not None:
            assert rows[q].n_verified >= 1
            assert rows[q].n_verified <= rows[q].n_candidates


def test_capm_betas_average_near_market(spark, sf_dir):
    rows = REG["ts_capm_beta"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.r2_milli <= 1000
        assert r.n > 2


def test_histogram_beats_uniform(spark, sf_dir):
    r = REG["io_histogram_selectivity"].fn(spark, sf_dir).first()
    assert r.actual > 0
    hist_err = abs(r.hist_ratio_milli - 1000)
    uni_err = abs(r.uniform_ratio_milli - 1000)
    assert hist_err <= uni_err + 50  # histogram should not be (much) worse


def test_simpson_consistency(spark, sf_dir):
    rows = REG["text_simpson_diversity"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.simpson_micro <= 1_000_000
        # effective type count is between 1 and the observed type count
        assert 1000 <= r.inv_simpson_milli <= r.n_types * 1000 + 1
