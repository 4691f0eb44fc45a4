"""Semantic invariants for breadth-8 (PCA projection, Neyman allocation,
seasonal decomposition)."""

from __future__ import annotations

from nocouncil_etl_spark.io import load
from nocouncil_etl_spark.plans.breadth8 import NEYMAN_BUDGET, PROJ_BINS
from nocouncil_etl_spark.registry import load_all

REG = load_all()


def _run(name, spark, sf_dir):
    return REG[name].fn(spark, sf_dir)


def test_pca_projection_histogram_partitions_corpus(spark, sf_dir):
    rows = _run("vec_pca_project_hist", spark, sf_dir).collect()
    n_vec = load(spark, sf_dir, "embeddings").count()
    assert sum(r.n_vectors for r in rows) == n_vec
    assert all(0 <= r.bin < PROJ_BINS for r in rows)
    # projecting onto the top variance direction must spread the corpus —
    # a near-degenerate projection would pile everything into one bin
    assert len(rows) >= PROJ_BINS // 2
    assert max(r.n_vectors for r in rows) < 0.9 * n_vec


def test_neyman_allocation_sums_to_budget_ish(spark, sf_dir):
    rows = _run("sample_neyman_allocation", spark, sf_dir).collect()
    assert rows
    total_w = sum(r.weight for r in rows)
    assert abs(total_w - 1.0) < 1e-3, "allocation weights partition the budget"
    alloc = sum(r.n_alloc for r in rows)
    # per-stratum rounding can drift by at most |strata|/2
    assert abs(alloc - NEYMAN_BUDGET) <= len(rows)
    for r in rows:
        assert r.sigma > 0 and r.n_alloc >= 0


def test_seasonal_decomposition_reconstructs_counts(spark, sf_dir):
    rows = _run("ts_seasonal_decompose", spark, sf_dir).collect()
    assert rows
    for r in rows:
        # c = trend + seasonal + residual on the 4dp grid
        assert abs(r.c - (r.trend + r.seasonal + r.residual)) < 2e-3
        assert 1 <= r.dow <= 7
    # weekday seasonal components average ~0 over the detrended span
    by_dow = {}
    for r in rows:
        by_dow.setdefault(r.dow, r.seasonal)
    span = max(abs(v) for v in by_dow.values())
    mean_season = sum(by_dow.values()) / len(by_dow)
    assert abs(mean_season) <= max(1.0, 0.5 * span)
