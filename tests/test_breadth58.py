"""Breadth batch 38: shift-share, Kneser-Ney, PPS sampling, binary
segmentation, Platt calibration, Cronbach's alpha."""

from __future__ import annotations

from nocouncil_etl_spark.plans.breadth58 import KN_FLAG_MICRO, PPS_M
from nocouncil_etl_spark.registry import load_all

REG = load_all()


def test_shift_share_identity_closes(spark, sf_dir):
    rows = REG["agg_shift_share"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert (
            r.actual_growth_cents
            == r.national_cents + r.industry_mix_cents + r.competitive_cents
        )


def test_kneser_ney_scores_every_multitoken_doc(spark, sf_dir):
    rows = REG["text_kneser_ney_bigram"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_bigrams >= 1
        assert r.avg_nll_micro >= 0  # probabilities are <= 1
        assert r.flagged == (1 if r.avg_nll_micro > KN_FLAG_MICRO else 0)


def test_pps_hits_sum_to_m_and_weights_inverse_size(spark, sf_dir):
    rows = REG["sample_pps_systematic"].fn(spark, sf_dir).collect()
    assert rows
    assert sum(r.n_hits for r in rows) == PPS_M
    srt = sorted(rows, key=lambda r: r.size)
    for a, b in zip(srt, srt[1:]):
        assert a.ht_weight_micro >= b.ht_weight_micro  # bigger doc, smaller w


def test_binary_segmentation_tree_shape(spark, sf_dir):
    rows = REG["ts_binary_segmentation"].fn(spark, sf_dir).collect()
    segs = {(r.level, r.segment): r for r in rows}
    assert set(segs) == {(0, "all"), (1, "left"), (1, "right")}
    root, lhs, rhs = segs[(0, "all")], segs[(1, "left")], segs[(1, "right")]
    assert lhs.n_days + rhs.n_days == root.n_days
    assert lhs.change_day <= root.change_day < rhs.change_day


def test_platt_newton_descends_and_orients(spark, sf_dir):
    rows = sorted(
        REG["ml_platt_newton"].fn(spark, sf_dir).collect(), key=lambda r: r.step
    )
    assert [r.step for r in rows] == [1, 2]
    # Newton on a convex NLL from the flat init must not get worse
    assert rows[1].avg_nll_micro <= rows[0].avg_nll_micro


def test_cronbach_alpha_bounded_above_by_one(spark, sf_dir):
    r = REG["stat_cronbach_alpha"].fn(spark, sf_dir).first()
    assert r.k_items >= 2 and r.n_users > 0
    # alpha <= 1 always; can be negative for inconsistent items
    assert r.alpha_micro <= 1_000_000
