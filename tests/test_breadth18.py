"""Invariants for breadth batch 18 (power planning, FK audit, rolling corr)."""

from __future__ import annotations

from nocouncil_etl_spark.plans.breadth18 import ORPHAN_MOD, ROLL_DAYS
from nocouncil_etl_spark.registry import load_all

REG = load_all()


def test_power_planning_moves_with_base_rate(spark, sf_dir):
    rows = REG["stat_power_binomial"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 < r.p0_6 < 1
        assert abs(r.p1_6 - r.p0_6 * 1.1) < 1e-3
        assert r.n_per_arm > 0
    # relative MDE: rarer baseline rates need MORE samples per arm
    by_rate = sorted(rows, key=lambda r: r.p0_6)
    for a, b in zip(by_rate, by_rate[1:]):
        if b.p0_6 > a.p0_6 * 1.05:
            assert b.n_per_arm < a.n_per_arm


def test_referential_integrity_counts_exactly_the_planted_orphans(spark, sf_dir):
    rows = {r.relationship: r for r in REG["dq_referential_integrity"].fn(spark, sf_dir).collect()}
    assert len(rows) == 3
    import duckdb

    con = duckdb.connect()
    for rel, r in rows.items():
        child_col = rel.split(" -> ")[0]
        table, col = child_col.split(".")
        n, planted = con.execute(
            f"SELECT count(*), sum(CASE WHEN {col} % {ORPHAN_MOD} = ? THEN 1 ELSE 0 END) "
            f"FROM read_parquet('{sf_dir}/{table}.parquet')",
            [ {"lineitem.l_orderkey -> orders.o_orderkey": 1,
               "orders.o_custkey -> customer.c_custkey": 2,
               "lineitem.l_partkey -> part.p_partkey": 3}[rel] ],
        ).fetchone()
        assert r.n_child == n + planted
        # every orphan is planted; the un-planted base is referentially clean
        assert r.n_orphans == planted
    con.close()


def test_rolling_corr_bounds_and_window_size(spark, sf_dir):
    rows = REG["window_rolling_corr"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n == ROLL_DAYS
        assert -1.0 - 1e-9 <= r.corr_7d <= 1.0 + 1e-9
