"""Invariants for breadth batch 12 (temperature mixture, HHI, purity)."""

from __future__ import annotations

from nocouncil_etl_spark.plans.breadth12 import MIX_BUDGET_DEN, PUR_SCALE
from nocouncil_etl_spark.plans.clustering import K
from nocouncil_etl_spark.registry import load_all

REG = load_all()


# --------------------------------------------------------------------------
# curation_mixture_temperature
# --------------------------------------------------------------------------


def test_temperature_mixture_flattens_the_distribution(spark, sf_dir):
    rows = REG["curation_mixture_temperature"].fn(spark, sf_dir).collect()
    assert rows
    total = sum(r.n_docs for r in rows)
    budget = total // MIX_BUDGET_DEN
    # targets respect the budget (floor division only ever loses docs)
    assert sum(r.target_docs for r in rows) <= budget
    for r in rows:
        assert 0 <= r.rate_bp <= 10000
        assert r.n_kept <= r.n_docs
    # α=0.5 flattening: keep-RATE is non-increasing in source size —
    # bigger sources are sampled at (weakly) lower rates
    by_size = sorted(rows, key=lambda r: r.n_docs)
    for a, b in zip(by_size, by_size[1:]):
        if b.n_docs > a.n_docs:
            assert b.rate_bp <= a.rate_bp + 1  # +1 for floor-division jitter
    # realized counts track targets (hash sampling is binomial around the
    # rate; at these sizes allow a wide but meaningful band)
    for r in rows:
        expect = r.n_docs * r.rate_bp / 10000
        assert abs(r.n_kept - expect) <= max(10, 0.5 * expect)


# --------------------------------------------------------------------------
# agg_hhi_concentration
# --------------------------------------------------------------------------


def test_hhi_bounds_and_normalization(spark, sf_dir):
    rows = REG["agg_hhi_concentration"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 < r.hhi <= 1.0
        assert r.hhi >= 1.0 / r.n_firms - 1e-9  # HHI floor at equal shares
        assert -1e-9 <= r.hhi_norm <= 1.0


# --------------------------------------------------------------------------
# cluster_kmeans_purity
# --------------------------------------------------------------------------


def test_purity_accounts_for_every_vector(spark, sf_dir):
    rows = REG["cluster_kmeans_purity"].fn(spark, sf_dir).collect()
    n_vecs = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    assert sum(r.n_points for r in rows) == n_vecs
    assert len(rows) <= K
    for r in rows:
        assert 1 <= r.n_major <= r.n_points
        assert 0 < r.purity_1e6 <= PUR_SCALE


def test_purity_beats_label_prior(spark, sf_dir):
    """Weighted purity must beat always-guessing the most common label —
    otherwise the clusters carry no label signal at all."""
    rows = REG["cluster_kmeans_purity"].fn(spark, sf_dir).collect()
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    top = (
        emb.groupBy("label").count().orderBy("count", ascending=False).first()
    )
    prior = top["count"] / emb.count()
    weighted = sum(r.n_major for r in rows) / sum(r.n_points for r in rows)
    assert weighted >= prior
