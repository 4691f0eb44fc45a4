"""Breadth batch 59: Jarque-Bera, determinism audit, Shapley R²,
competing risks, triangle sampling, exact binomial."""

from __future__ import annotations

from nocouncil_etl_spark.registry import load_all

REG = load_all()


def test_jarque_bera_nonnegative(spark, sf_dir):
    r = REG["stat_jarque_bera"].fn(spark, sf_dir).first()
    assert r.n > 3
    assert r.jb_milli >= 0
    assert r.kurt_milli > 0  # kurtosis of any nondegenerate sample > 0


def test_determinism_audit_passes(spark, sf_dir):
    r = REG["dq_determinism_audit"].fn(spark, sf_dir).first()
    assert r.deterministic == 1
    assert r.checksum_a == r.checksum_b
    assert r.n_keys > 0


def test_shapley_phis_sum_to_full_r2(spark, sf_dir):
    r = REG["ml_shapley_r2_decomposition"].fn(spark, sf_dir).first()
    assert 0 <= r.r2_full_milli <= 1000
    assert abs(r.phi1_milli + r.phi2_milli - r.r2_full_milli) <= 2


def test_competing_risks_sum_below_one(spark, sf_dir):
    rows = {r.cause: r for r in REG["survival_competing_risks"].fn(spark, sf_dir).collect()}
    assert set(rows) == {"purchase", "error"}
    total = sum(r.cif_micro for r in rows.values())
    assert 0 <= total <= 1_000_100  # CIFs sum to <= 1 (+ rounding slack)
    for r in rows.values():
        assert r.cif_micro >= 0


def test_triangle_estimator_unbiased_scale(spark, sf_dir):
    r = REG["graph_triangle_sample_estimate"].fn(spark, sf_dir).first()
    assert r.exact_triangles >= 0
    assert r.estimate == r.sampled_triangles * 64
    assert r.sampled_triangles <= r.exact_triangles


def test_binomial_exact_p_is_probability(spark, sf_dir):
    r = REG["stat_binomial_exact"].fn(spark, sf_dir).first()
    assert 0 < r.k_weekend < r.n
    assert 0 <= r.p_two_sided_micro <= 1_000_000
