"""Borůvka MST rounds: halving law, forest growth, weight monotonicity."""

from __future__ import annotations

from nocouncil_etl_spark.registry import load_all

REG = load_all()


def test_boruvka_rounds_halve_components(spark, sf_dir):
    from nocouncil_etl_spark.io import load

    rows = {r.round: r for r in REG["graph_mst_boruvka"].fn(spark, sf_dir).collect()}
    assert set(rows) == {1, 2}
    n_nodes = load(spark, sf_dir, "documents").count()
    r1, r2 = rows[1], rows[2]
    # Borůvka halving law: every component merges with at least one other
    assert r1.n_components * 2 <= n_nodes
    assert r2.n_components * 2 <= r1.n_components
    # the forest only grows, stays acyclic-sized, and weight accumulates
    assert 0 < r1.n_forest_edges < n_nodes
    assert r1.n_forest_edges <= r2.n_forest_edges < n_nodes
    assert 0 < r1.forest_w <= r2.forest_w
    # forest edges ≥ nodes − components (a spanning forest invariant)
    assert r1.n_forest_edges >= n_nodes - r1.n_components
    assert r2.n_forest_edges >= n_nodes - r2.n_components
