"""Breadth batch 39: ESD outliers, RMST, permuterm, slop search,
oblivious tree, Lindley backlog."""

from __future__ import annotations

import re

from nocouncil_etl_spark.plans.breadth59 import (
    ESD_ROUNDS,
    PERM_QUERIES,
    RMST_TAU_WEEKS,
    SLOP_MAX,
)
from nocouncil_etl_spark.registry import load_all

REG = load_all()


def test_esd_rounds_distinct_days_decreasing_extremity(spark, sf_dir):
    rows = sorted(
        REG["stat_esd_outliers"].fn(spark, sf_dir).collect(),
        key=lambda r: r.round,
    )
    assert [r.round for r in rows] == list(range(1, ESD_ROUNDS + 1))
    assert len({r.day for r in rows}) == ESD_ROUNDS  # removal really removes
    for r in rows:
        assert r.r_milli >= 0
        assert r.flagged == (1 if r.r_milli > 3000 else 0)


def test_rmst_bounded_by_tau(spark, sf_dir):
    r = REG["survival_rmst"].fn(spark, sf_dir).first()
    assert r.tau_weeks == RMST_TAU_WEEKS
    assert 0 <= r.rmst_microweeks <= RMST_TAU_WEEKS * 1_000_000
    assert r.n_users > 0


def test_permuterm_matches_are_regex_correct(spark, sf_dir):
    rows = REG["search_permuterm_wildcard"].fn(spark, sf_dir).collect()
    assert {r.pattern for r in rows} == set(PERM_QUERIES)
    for r in rows:
        if r.first_term is not None:
            x, y = r.pattern.split("*")
            assert re.fullmatch(re.escape(x) + ".*" + re.escape(y), r.first_term)
            assert r.n_terms >= 1 and r.n_docs >= 0


def test_slop_results_within_bound(spark, sf_dir):
    rows = REG["search_proximity_slop"].fn(spark, sf_dir).collect()
    assert rows  # both terms are frequent in the synthetic corpus
    for r in rows:
        assert 1 <= r.min_dist <= SLOP_MAX
        assert r.n_pairs_within >= 1


def test_oblivious_tree_four_leaves_partition(spark, sf_dir):
    rows = REG["ml_oblivious_tree_depth2"].fn(spark, sf_dir).collect()
    assert {(r.side, r.sub) for r in rows} == {(0, 0), (0, 1), (1, 0), (1, 1)}
    t1 = {r.t1_cents for r in rows}
    t2 = {r.t2_orders for r in rows}
    assert len(t1) == 1 and len(t2) == 1  # oblivious: one threshold per level
    for r in rows:
        assert 0 <= r.pos <= r.n
        assert 0 <= r.rate_milli <= 1000


def test_lindley_backlog_invariants(spark, sf_dir):
    rows = sorted(
        REG["ts_lindley_backlog"].fn(spark, sf_dir).collect(),
        key=lambda r: r.day,
    )
    assert rows
    prev = 0
    for r in rows:
        assert r.backlog >= 0
        # recursion check: B_t == max(0, B_{t-1} + d - c)
        assert r.backlog == max(0, prev + r.demand - r.capacity)
        assert 0 <= r.served <= r.demand + prev
        prev = r.backlog
