"""Breadth batch 55: Little's law, hubness, Merkle root, Bowker,
lexicon, clustering curve."""

from __future__ import annotations

from nocouncil_etl_spark.plans.breadth75 import HUB_K
from nocouncil_etl_spark.registry import load_all

REG = load_all()


def test_littles_law_holds(spark, sf_dir):
    r = REG["agg_littles_law_audit"].fn(spark, sf_dir).first()
    assert r.n_orders > 0 and r.window_days > 0
    # the finite-window identity is exact by construction
    assert 995 <= r.littles_ratio_milli <= 1005


def test_hubness_totals(spark, sf_dir):
    r = REG["vec_hubness_skew"].fn(spark, sf_dir).first()
    assert r.n_vecs > HUB_K
    assert 0 <= r.n_orphans < r.n_vecs
    assert r.max_nk >= HUB_K  # pigeonhole: someone is above average


def test_merkle_levels_halve(spark, sf_dir):
    r = REG["io_merkle_root"].fn(spark, sf_dir).first()
    assert len(r.root_hash) == 32
    assert r.n_level1 == (r.n_leaves + 1) // 2
    assert r.n_level2 == (r.n_level1 + 1) // 2


def test_merkle_root_tamper_evident(spark, sf_dir):
    # the root must be a pure function of the data: rerunning matches
    a = REG["io_merkle_root"].fn(spark, sf_dir).first().root_hash
    b = REG["io_merkle_root"].fn(spark, sf_dir).first().root_hash
    assert a == b


def test_bowker_nonnegative(spark, sf_dir):
    r = REG["stat_bowker_symmetry"].fn(spark, sf_dir).first()
    assert r.df >= 1
    assert r.bowker_milli >= 0
    assert "->" in r.most_asymmetric


def test_lexicon_score_bounds(spark, sf_dir):
    rows = REG["text_lexicon_score"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.pos_hits + r.neg_hits <= r.n_tokens
        assert -1000 <= r.sentiment_milli <= 1000


def test_clustering_curve_bounds(spark, sf_dir):
    rows = REG["graph_clustering_degree_curve"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.degree >= 2
        assert 0 <= r.mean_c_milli <= 1000
