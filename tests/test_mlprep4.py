"""Invariants for plans/mlprep4.py (isotonic calibration, BH FDR) and
plans/vectors2.py (int8 / matryoshka recall)."""

from __future__ import annotations

from nocouncil_etl_spark.plans.mlprep4 import FDR_PERMS, ISO_SCALE, PLANTED_GROUP
from nocouncil_etl_spark.plans.vectors2 import RECALL_K
from nocouncil_etl_spark.registry import load_all

REG = load_all()


# --------------------------------------------------------------------------
# ml_isotonic_calibration
# --------------------------------------------------------------------------


def test_isotonic_fit_is_monotone_and_bounded(spark, sf_dir):
    rows = sorted(
        REG["ml_isotonic_calibration"].fn(spark, sf_dir).collect(),
        key=lambda r: r.bin,
    )
    assert rows
    isos = [r.iso_1e9 for r in rows]
    assert isos == sorted(isos), "isotonic fit must be non-decreasing in bin"
    for r in rows:
        assert 0 <= r.iso_1e9 <= ISO_SCALE
        assert 0 <= r.obs_1e9 <= ISO_SCALE
        assert 0 <= r.pos <= r.n


def test_isotonic_fit_pools_toward_observed_rates(spark, sf_dir):
    """The fit is a weighted projection of observed rates: it stays within
    the observed range and matches observed exactly wherever the raw curve
    is already locally monotone across the whole span (global min/max)."""
    rows = sorted(
        REG["ml_isotonic_calibration"].fn(spark, sf_dir).collect(),
        key=lambda r: r.bin,
    )
    lo = min(r.obs_1e9 for r in rows)
    hi = max(r.obs_1e9 for r in rows)
    for r in rows:
        assert lo <= r.iso_1e9 <= hi
    # mass conservation within floor-division slack: Σ n·(iso − obs) ≈ 0
    bal = sum(r.n * (r.iso_1e9 - r.obs_1e9) for r in rows)
    slack = ISO_SCALE * len(rows)  # one floor-division ulp per pooled block
    assert abs(bal) <= slack


# --------------------------------------------------------------------------
# stat_fdr_bh
# --------------------------------------------------------------------------


def test_fdr_bh_discovers_planted_segment(spark, sf_dir):
    rows = REG["stat_fdr_bh"].fn(spark, sf_dir).collect()
    by_seg = {r.segment: r for r in rows}
    assert PLANTED_GROUP in by_seg
    planted = by_seg[PLANTED_GROUP]
    assert planted.p_num == 1, "all-positive deltas: no replica can exceed t_obs"
    assert planted.discovery == 1
    for r in rows:
        assert 1 <= r.p_num <= FDR_PERMS + 1
        assert r.p_den == FDR_PERMS + 1


def test_fdr_bh_discovery_set_is_a_rank_prefix(spark, sf_dir):
    rows = sorted(REG["stat_fdr_bh"].fn(spark, sf_dir).collect(), key=lambda r: r.rk)
    assert [r.rk for r in rows] == list(range(1, len(rows) + 1))
    flags = [r.discovery for r in rows]
    # BH: discoveries are exactly ranks 1..rmax — no gaps
    assert flags == sorted(flags, reverse=True)
    m = len(rows)
    for r in rows:
        if r.discovery:
            # every discovered rank is dominated by some qualifying rank ≥ it
            assert any(
                s.p_num * m <= 10 * s.rk for s in rows if s.rk >= r.rk
            )


# --------------------------------------------------------------------------
# vec_int8_recall / vec_matryoshka_recall
# --------------------------------------------------------------------------


def test_int8_recall_high_on_unit_normalized_corpus(spark, sf_dir):
    rows = REG["vec_int8_recall"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_hit <= RECALL_K
        assert r.k == RECALL_K
    mean = sum(r.n_hit for r in rows) / (len(rows) * RECALL_K)
    # 127-level symmetric quantization of 64-dim unit vectors keeps the
    # ranking nearly intact
    assert mean >= 0.7, f"int8 recall collapsed: {mean}"


def test_matryoshka_prefix_recall_degrades_but_not_to_chance(spark, sf_dir):
    rows = REG["vec_matryoshka_recall"].fn(spark, sf_dir).collect()
    assert rows
    n_corpus = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet").count() - 1
    )  # candidates per query; chance recall ≈ K/n
    mean = sum(r.n_hit for r in rows) / (len(rows) * RECALL_K)
    assert mean > 3 * RECALL_K / n_corpus, "prefix ranking is no better than chance"
    for r in rows:
        assert 0 <= r.n_hit <= RECALL_K
