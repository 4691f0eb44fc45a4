"""Breadth batch 37: RSI, SES grid, Newton boost, cell suppression,
champion lists, conductance."""

from __future__ import annotations

from nocouncil_etl_spark.plans.breadth57 import (
    CH_K,
    CH_QUERIES,
    CH_R,
    SES_ALPHAS_MILLI,
    SUP_K,
)
from nocouncil_etl_spark.registry import load_all

REG = load_all()


def test_rsi_bounds_and_counts(spark, sf_dir):
    rows = REG["window_rsi_cutler"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_overbought + r.n_oversold <= r.n_days
        if r.mean_rsi_milli is not None:
            assert 0 <= r.mean_rsi_milli <= 100_000
        if r.last_rsi_milli is not None:
            assert 0 <= r.last_rsi_milli <= 100_000


def test_ses_best_alpha_from_grid(spark, sf_dir):
    rows = REG["ts_ses_grid_alpha"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.best_alpha_milli in SES_ALPHAS_MILLI
        assert r.sse >= 0 and r.n_eval > 0


def test_newton_boost_two_rounds_improve_logloss(spark, sf_dir):
    rows = sorted(
        REG["ml_newton_boost_stump"].fn(spark, sf_dir).collect(),
        key=lambda r: r.round,
    )
    assert [r.round for r in rows] == [1, 2]
    for r in rows:
        assert r.gain_milli >= 0  # argmax gain over candidates incl. near-null
        # leaves pull in opposite directions around the split
        assert r.wl_micro != r.wr_micro
    # Newton steps on a convex loss with fresh stumps must not increase
    # the training logloss between rounds
    assert rows[1].avg_logloss_micro <= rows[0].avg_logloss_micro


def test_cell_suppression_invariants(spark, sf_dir):
    rows = REG["privacy_cell_suppression"].fn(spark, sf_dir).collect()
    assert rows
    by_row: dict[str, list] = {}
    by_col: dict[str, list] = {}
    for r in rows:
        # every published cell meets the threshold; suppressed cells publish NULL
        if r.status == "ok":
            assert r.published == r.n and r.n >= SUP_K
        else:
            assert r.published is None
        by_row.setdefault(r.lang, []).append(r)
        by_col.setdefault(r.source, []).append(r)
    # no row is left with exactly one suppressed cell after the row pass
    # unless the column pass is what fixed/made it (col_comp excluded)
    for cells in by_row.values():
        supp = [c for c in cells if c.status in ("primary", "row_comp")]
        assert len(supp) != 1 or len(cells) == 1


def test_champion_lists_recall_and_candidate_bound(spark, sf_dir):
    rows = REG["search_champion_lists"].fn(spark, sf_dir).collect()
    assert {r.query_id for r in rows} == set(range(len(CH_QUERIES)))
    for r in rows:
        assert r.n_exact <= CH_K
        assert 0 <= r.n_hit <= r.n_exact
        assert r.n_candidates <= 2 * CH_R  # union of two champion lists
        assert r.recall_micro == round(1_000_000 * r.n_hit / r.n_exact)


def test_conductance_in_unit_range(spark, sf_dir):
    rows = REG["graph_community_conductance"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_members >= 2
        assert r.cut <= r.vol  # each cut edge contributes to the volume
        if r.conductance_micro is not None:
            assert 0 <= r.conductance_micro <= 1_000_000
