"""Breadth batch 55: two-feature OLS, OCC, autocomplete, unicity,
cycle time, cumulative gains."""

from __future__ import annotations

from nocouncil_etl_spark.io import load
from nocouncil_etl_spark.plans.breadth55 import AC_TOPK
from nocouncil_etl_spark.registry import load_all

REG = load_all()


def test_ols_two_features_r2_is_a_fraction(spark, sf_dir):
    r = REG["ml_ols_two_features"].fn(spark, sf_dir).first()
    assert r is not None
    assert -10 <= r.r2_ppm <= 1_000_000 + 10  # rounding slack around [0,1]
    assert r.n > 10


def test_occ_conflict_protocol_loses_nothing(spark, sf_dir):
    rows = REG["io_optimistic_concurrency"].fn(spark, sf_dir).collect()
    ev = load(spark, sf_dir, "events")
    n_src = ev.count()
    assert sum(r.n for r in rows) == n_src  # both writers' rows landed once
    assert rows[0].a_committed_version == 1
    assert rows[0].b_first_attempt_conflict == 1
    assert rows[0].b_committed_version == 2


def test_autocomplete_rankings_are_frequency_ordered(spark, sf_dir):
    rows = REG["search_prefix_autocomplete"].fn(spark, sf_dir).collect()
    assert rows
    by_prefix: dict[str, list] = {}
    for r in rows:
        assert r.term.startswith(r.prefix)
        assert len(r.term) > len(r.prefix)
        assert 1 <= r.rk <= AC_TOPK
        by_prefix.setdefault(r.prefix, []).append(r)
    for items in by_prefix.values():
        items.sort(key=lambda r: r.rk)
        for a, b in zip(items, items[1:]):
            assert a.cf >= b.cf


def test_trajectory_unicity_partitions_all_users(spark, sf_dir):
    rows = REG["privacy_trajectory_unicity"].fn(spark, sf_dir).collect()
    ev = load(spark, sf_dir, "events")
    n_users = ev.select("user_id").distinct().count()
    assert sum(r.n_users for r in rows) == n_users
    assert abs(sum(r.share_ppm for r in rows) - 1_000_000) <= len(rows) + 2


def test_cycle_time_percentiles_are_ordered(spark, sf_dir):
    rows = REG["agg_cycle_time_percentiles"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.p50 <= r.p90 <= r.p99
        assert r.n > 0


def test_cumulative_gains_monotone_capture(spark, sf_dir):
    rows = sorted(
        REG["eval_cumulative_gains"].fn(spark, sf_dir).collect(),
        key=lambda r: r.decile,
    )
    assert len(rows) == 10
    assert rows[-1].cum_capture_ppm == 1_000_000  # all positives captured
    prev = 0
    for r in rows:
        assert r.cum_capture_ppm >= prev
        prev = r.cum_capture_ppm
        assert r.n_pos <= r.n
    # mean lift across deciles ≈ 1 (weighted by size)
    total_pos = sum(r.n_pos for r in rows)
    assert total_pos > 0
