"""Semantic invariants for breadth-7 (drawdown, runs test, HT estimation,
table profile)."""

from __future__ import annotations

from pyspark.sql import functions as F

from nocouncil_etl_spark.io import load
from nocouncil_etl_spark.plans.breadth7 import HT_M, _PROFILE_COLS
from nocouncil_etl_spark.registry import load_all

REG = load_all()


def _run(name, spark, sf_dir):
    return REG[name].fn(spark, sf_dir)


def test_drawdown_replay_one_user(spark, sf_dir):
    rows = {r.user_id: r for r in _run("window_drawdown", spark, sf_dir).collect()}
    assert rows
    uid = next(iter(rows))
    evs = (
        load(spark, sf_dir, "events")
        .filter(F.col("user_id") == uid)
        .orderBy("ts", "event_id")
        .select("event_type", "value")
        .collect()
    )
    eq = peak = max_dd = 0
    peak = None
    for e in evs:
        c = round(e.value * 100)
        eq += c if e.event_type == "purchase" else (-c if e.event_type == "error" else 0)
        peak = eq if peak is None else max(peak, eq)
        max_dd = max(max_dd, peak - eq)
    assert rows[uid].max_drawdown_cents == max_dd
    assert rows[uid].peak_cents == peak
    assert all(r.max_drawdown_cents >= 0 for r in rows.values())


def test_runs_test_consistency(spark, sf_dir):
    r = _run("agg_runs_test", spark, sf_dir).collect()[0]
    n = r.n1 + r.n2
    assert 1 <= r.n_runs <= n
    # value order is independent of time in the synthetic stream → the
    # z statistic should be unremarkable (|z| < 5 is a generous bound)
    assert abs(r.z) < 5, f"synthetic stream flagged as non-random: z={r.z}"
    assert abs(r.mu - (1 + 2 * r.n1 * r.n2 / n)) < 1e-6


def test_horvitz_thompson_estimates_totals(spark, sf_dir):
    rows = _run("sample_horvitz_thompson", spark, sf_dir).collect()
    assert rows, "every sf should have at least one stratum larger than m"
    for r in rows:
        assert r.sample_m == HT_M
        # priority sampling with m=8 has ~45% std error; 4σ bound
        assert r.rel_err < 2.0, f"{r.source}: {r.ht_est} vs {r.exact_total}"
        assert r.ht_est > 0


def test_profile_covers_columns_exactly(spark, sf_dir):
    rows = {r.column_name: r for r in _run("dq_profile_table", spark, sf_dir).collect()}
    assert set(rows) == {c for c, _ in _PROFILE_COLS}
    od = load(spark, sf_dir, "orders")
    n = od.count()
    for r in rows.values():
        assert r.n_rows == n
        assert 0 <= r.n_nulls <= n
        assert 1 <= r.n_distinct <= n
    assert rows["o_orderkey"].n_distinct == n, "primary key is unique"
