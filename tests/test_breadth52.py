"""Breadth batch 52: theta forecast, decile migration, orphan audit,
permutation importance, char entropy, rounding policy."""

from __future__ import annotations

from nocouncil_etl_spark.plans.breadth52 import (
    CE_BOTTOM,
    ORPH_BUCKETS,
    ORPH_DROP,
    TH_TRAIN,
)
from nocouncil_etl_spark.registry import load_all

REG = load_all()


def test_theta_forecast_accounting(spark, sf_dir):
    rows = REG["ts_theta_forecast"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_train == TH_TRAIN
        assert r.n_test > 0
        assert r.sae_theta >= 0 and r.sae_naive >= 0
        assert (r.sae_theta < r.sae_naive) == (r.theta_wins == 1)


def test_decile_migration_is_doubly_stochastic_in_counts(spark, sf_dir):
    rows = REG["agg_decile_migration"].fn(spark, sf_dir).collect()
    assert rows
    from collections import defaultdict

    row_sum, col_sum = defaultdict(int), defaultdict(int)
    for r in rows:
        assert 1 <= r.d1 <= 10 and 1 <= r.d2 <= 10
        assert (r.d1 == r.d2) == (r.stayed == 1)
        row_sum[r.d1] += r.n_users
        col_sum[r.d2] += r.n_users
    # ntile spreads the SAME user set both halves: margins agree within
    # the ±1 bucket-size slack ntile introduces
    assert max(row_sum.values()) - min(row_sum.values()) <= 1
    assert max(col_sum.values()) - min(col_sum.values()) <= 1


def test_orphan_audit_finds_exactly_the_dropped_buckets(spark, sf_dir):
    r = REG["io_orphan_file_audit"].fn(spark, sf_dir).first()
    assert r.n_partitions == ORPH_BUCKETS
    assert r.n_orphans == ORPH_DROP
    assert r.n_referenced == ORPH_BUCKETS - ORPH_DROP
    assert r.rows_orphaned > 0 and r.cents_orphaned > 0


def test_permutation_importance_baseline_drop_is_zero(spark, sf_dir):
    rows = {r.feature: r for r in REG["ml_permutation_importance"].fn(spark, sf_dir).collect()}
    assert set(rows) == {"baseline", "value", "hour"}
    assert rows["baseline"].drop_ppm == 0
    for f in ("value", "hour"):
        assert 0 <= rows[f].acc_ppm <= 1_000_000
        # breaking a feature's link to the label cannot help a fitted NB
        # beyond noise; importance is reported relative to baseline
        assert rows[f].drop_ppm == rows["baseline"].acc_ppm - rows[f].acc_ppm


def test_char_entropy_bottom_k_is_sorted(spark, sf_dir):
    rows = REG["text_char_entropy"].fn(spark, sf_dir).collect()
    assert 0 < len(rows) <= CE_BOTTOM
    ordered = sorted(rows, key=lambda r: r.rk)
    for a, b in zip(ordered, ordered[1:]):
        assert a.entropy_micro <= b.entropy_micro
    for r in rows:
        assert r.n_distinct <= r.n_chars
        assert r.entropy_micro >= 0


def test_rounding_policies_diverge_only_on_half_cases(spark, sf_dir):
    r = REG["fn_rounding_policy_audit"].fn(spark, sf_dir).first()
    assert r.n_divergent <= r.n_half_cases
    assert 0 <= r.delta_cents <= r.n_half_cases  # half-up only rounds UP ties
    assert r.halfup_total_cents - r.banker_total_cents == r.delta_cents
    assert r.n_divergent == r.delta_cents  # each divergence is exactly 1 cent
