"""Breadth batch 50: chain ladder, G² collocations, bloom skipping,
Welch ANOVA, percent-of-parent, generalize-to-k."""

from __future__ import annotations

from nocouncil_etl_spark.plans.breadth50 import BF_BUCKETS, G2_TOP, GK_K, GK_LEVELS
from nocouncil_etl_spark.registry import load_all

REG = load_all()


def test_chain_ladder_ultimates_dominate_observed(spark, sf_dir):
    rows = REG["agg_chain_ladder"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        # development factors are >= ~1 (cumulative revenue never shrinks),
        # so the projection can only stay or grow modulo milli rounding
        assert r.ultimate_cents >= r.cents_latest - len(rows)
        assert r.age_latest >= 0


def test_g2_collocations_are_ranked_and_positive(spark, sf_dir):
    rows = REG["text_collocation_g2"].fn(spark, sf_dir).collect()
    assert 0 < len(rows) <= G2_TOP
    ordered = sorted(rows, key=lambda r: r.rk)
    for a, b in zip(ordered, ordered[1:]):
        assert a.g2_micro >= b.g2_micro
    assert ordered[0].g2_micro > 0
    for r in rows:
        assert r.k11 >= 1


def test_bloom_beats_minmax_on_scattered_keys(spark, sf_dir):
    r = REG["io_bloom_file_skip"].fn(spark, sf_dir).first()
    assert r.n_buckets == BF_BUCKETS
    # blooms never miss a real occurrence
    assert r.touched_bloom >= r.buckets_actual
    assert r.touched_minmax >= r.buckets_actual
    # arrival-order layout leaves min/max useless; bloom must do better
    assert r.touched_bloom <= r.touched_minmax


def test_welch_anova_shape(spark, sf_dir):
    r = REG["stat_welch_anova"].fn(spark, sf_dir).first()
    assert r.df1 == r.k - 1
    assert r.f_welch >= 0
    assert r.df2_milli > 1000  # df2 > 1


def test_percent_of_parent_shares_sum_within_levels(spark, sf_dir):
    rows = REG["window_percent_of_parent"].fn(spark, sf_dir).collect()
    assert rows
    by_region: dict[str, list] = {}
    for r in rows:
        by_region.setdefault(r.region, []).append(r)
    region_shares = {}
    for region, rs in by_region.items():
        assert abs(sum(x.pct_of_region_ppm for x in rs) - 1_000_000) <= len(rs) + 2
        region_shares[region] = rs[0].region_pct_of_total_ppm
        assert len({x.region_pct_of_total_ppm for x in rs}) == 1
    assert abs(sum(region_shares.values()) - 1_000_000) <= len(region_shares) + 2


def test_generalize_to_k_picks_first_passing_level(spark, sf_dir):
    rows = sorted(
        REG["privacy_generalize_to_k"].fn(spark, sf_dir).collect(),
        key=lambda r: r.level,
    )
    assert len(rows) == len(GK_LEVELS)
    # group counts can only shrink as the QI coarsens
    for a, b in zip(rows, rows[1:]):
        assert a.n_groups >= b.n_groups
        assert a.min_group <= b.min_group  # coarser classes only merge
    chosen = [r for r in rows if r.chosen == 1]
    if chosen:
        c = chosen[0]
        assert c.k_ok == 1 and c.min_group >= GK_K
        for r in rows:
            if r.level < c.level:
                assert r.k_ok == 0
