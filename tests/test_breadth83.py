"""Breadth batch 63: PCA share, state-size model, ISO-week audit,
signed-rank, projection cost, median CI."""

from __future__ import annotations

from nocouncil_etl_spark.plans.breadth83 import PROJ_SETS, SSM_DELAYS_MIN
from nocouncil_etl_spark.registry import load_all

REG = load_all()


def test_pca_share_unit_interval(spark, sf_dir):
    r = REG["vec_pca_explained_share"].fn(spark, sf_dir).first()
    assert r.n_dims == 16
    # PC1 explains at least 1/d of variance and at most all of it
    assert 1000 // 16 <= r.pc1_share_milli <= 1001


def test_state_size_monotone_in_delay(spark, sf_dir):
    rows = sorted(
        REG["stream_state_size_model"].fn(spark, sf_dir).collect(),
        key=lambda r: r.delay_min,
    )
    assert [r.delay_min for r in rows] == sorted(SSM_DELAYS_MIN)
    prev = 0
    for r in rows:
        assert r.live_keys >= prev  # longer window, more live keys
        assert r.est_state_bytes == r.live_keys * 64
        prev = r.live_keys


def test_iso_week_mismatch_is_rare_but_real(spark, sf_dir):
    r = REG["dq_iso_week_mismatch"].fn(spark, sf_dir).first()
    assert r.n_rows > 0
    # mismatches only occur in the Dec 29 - Jan 3 band: tiny share
    assert 0 <= r.mismatch_micro < 30_000
    if r.n_mismatched > 0:
        assert r.first_mismatch_day is not None


def test_signed_rank_w_bounds(spark, sf_dir):
    r = REG["stat_wilcoxon_signed_rank"].fn(spark, sf_dir).first()
    assert r.n > 0
    assert 0 <= r.w_plus <= r.n * (r.n + 1) // 2


def test_projection_cost_monotone(spark, sf_dir):
    rows = {r.projection: r for r in REG["io_projection_cost_model"].fn(spark, sf_dir).collect()}
    assert len(rows) == len(PROJ_SETS)
    one = rows["o_orderkey"]
    three = rows["o_orderkey,o_orderstatus,o_orderdate"]
    assert one.row_bytes_milli < three.row_bytes_milli
    for r in rows.values():
        assert 0 < r.vs_full_milli <= 1000


def test_median_ci_brackets_median(spark, sf_dir):
    r = REG["stat_median_ci"].fn(spark, sf_dir).first()
    assert r.ci_lo_cents <= r.median_cents <= r.ci_hi_cents
    assert r.n > 10
