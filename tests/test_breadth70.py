"""Breadth batch 50: two-way ANOVA, projection depth, TTL projection,
Siegel-Tukey, Zipf-Mandelbrot, duplicate payments."""

from __future__ import annotations

from nocouncil_etl_spark.plans.breadth70 import PD_TOP, ZM_BETAS
from nocouncil_etl_spark.registry import load_all

REG = load_all()


def test_two_way_anova_table_shape(spark, sf_dir):
    rows = {r.source: r for r in REG["stat_anova_two_way"].fn(spark, sf_dir).collect()}
    assert set(rows) == {"type", "weekday", "interaction", "error"}
    assert rows["error"].f_milli is None
    for name in ("type", "weekday", "interaction"):
        assert rows[name].ss >= 0
        assert rows[name].df >= 1
        assert rows[name].f_milli >= 0
    assert rows["error"].df > 0


def test_projection_depth_topk_shallowest(spark, sf_dir):
    rows = REG["ml_projection_depth"].fn(spark, sf_dir).collect()
    assert len(rows) == PD_TOP
    for r in rows:
        assert 0 < r.depth_micro <= 500_000  # depth <= 1/2 by definition
    depths = [r.depth_micro for r in rows]
    assert depths == sorted(depths)


def test_ttl_projection_monotone(spark, sf_dir):
    rows = sorted(
        REG["io_ttl_reclaim_projection"].fn(spark, sf_dir).collect(),
        key=lambda r: r.expiry_mon,
    )
    assert rows
    prev = 0
    for r in rows:
        assert r.cum_reclaim_bytes >= prev
        assert r.rows_expiring > 0
        prev = r.cum_reclaim_bytes


def test_siegel_tukey_ranks_are_valid(spark, sf_dir):
    r = REG["stat_siegel_tukey"].fn(spark, sf_dir).first()
    n = r.n1 + r.n2
    # W is a sum of n1 distinct ranks from 1..n
    assert r.n1 * (r.n1 + 1) // 2 <= r.w_stat <= r.n1 * (2 * n - r.n1 + 1) // 2


def test_zipf_mandelbrot_beta_from_grid(spark, sf_dir):
    r = REG["text_zipf_mandelbrot"].fn(spark, sf_dir).first()
    assert r.beta in ZM_BETAS
    assert r.s_milli > 0  # frequencies decay with rank
    assert 0 <= r.r2_milli <= 1000


def test_duplicate_payments_plausible(spark, sf_dir):
    rows = REG["dq_duplicate_payments"].fn(spark, sf_dir).collect()
    for r in rows:
        assert r.n_pairs >= 1
        assert 0 <= r.min_gap_days <= 7
