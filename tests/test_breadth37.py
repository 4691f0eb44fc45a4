"""Batch 37: capture-recapture, conformal, SCC, WE rules, tiers, RBO."""

from __future__ import annotations

import collections

from pyspark.sql import functions as F

from nocouncil_etl_spark.registry import load_all

REG = load_all()


def test_capture_recapture_estimates_bracket_truth(spark, sf_dir):
    row = REG["stat_capture_recapture"].fn(spark, sf_dir).collect()[0]
    assert row.m > 0
    assert row.lincoln_petersen == (row.n1 * row.n2) // row.m
    assert row.chapman == ((row.n1 + 1) * (row.n2 + 1)) // (row.m + 1) - 1
    # with near-complete capture the estimates land close to the truth
    assert abs(row.lincoln_petersen - row.true_n) < 0.5 * row.true_n


def test_conformal_coverage_near_nominal(spark, sf_dir):
    rows = REG["ml_conformal_interval"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.qhat >= 0
        assert 0 <= r.n_covered <= r.n_test
        # 80% nominal band; tiny test sets allow wide slack
        assert r.coverage_1e6 >= 200000


def test_scc_resolved_nodes_mutually_reachable(spark, sf_dir):
    from nocouncil_etl_spark.plans.graph_plans import _graph

    row = REG["graph_scc_coloring_pass"].fn(spark, sf_dir).collect()[0]
    assert row.n_resolved_nodes + row.n_unresolved == row.n_nodes
    assert row.n_resolved_sccs >= 1
    # independent check: python reachability fixpoint
    _, edges, _ = _graph(spark, sf_dir)
    e = [
        (r.src, r.dst)
        for r in edges.select("src", "dst").distinct().collect()
        if r.src != r.dst
    ]
    nodes = {v for p in e for v in p}
    out = collections.defaultdict(set)
    inn = collections.defaultdict(set)
    for s, d in e:
        out[s].add(d)
        inn[d].add(s)

    def minreach(adj):
        lab = {v: v for v in nodes}
        changed = True
        while changed:
            changed = False
            for s, ds in adj.items():
                for d in ds:
                    if lab[s] < lab[d]:
                        lab[d] = lab[s]
                        changed = True
        return lab

    f = minreach(out)
    b = minreach(inn)
    resolved = sum(1 for v in nodes if f[v] == b[v])
    assert row.n_resolved_nodes == resolved


def test_we_rules_rule1_matches_recompute(spark, sf_dir):
    from nocouncil_etl_spark.io import load

    got = {
        r.event_type: r
        for r in REG["ts_control_rules_we"].fn(spark, sf_dir).collect()
    }
    daily = collections.defaultdict(list)
    for r in (
        load(spark, sf_dir, "events")
        .groupBy("event_type", F.to_date("ts").alias("d"))
        .agg(F.sum(F.round("value").cast("long")).cast("long").alias("x"))
        .collect()
    ):
        daily[r.event_type].append((r.d, r.x))
    for et, pts in daily.items():
        xs = [x for _, x in sorted(pts)]
        mu = sum(xs[:10]) // 10
        mad = max(sum(abs(x - mu) for x in xs[:10]) // 10, 1)
        r1 = sum(1 for x in xs if abs(x - mu) > 3 * mad)
        assert got[et].rule1_days == r1
        assert 0 <= got[et].rule2_days <= len(xs)
        assert 0 <= got[et].rule3_days <= len(xs)


def test_tiered_pricing_marginal_math(spark, sf_dir):
    rows = REG["fn_tiered_pricing"].fn(spark, sf_dir).collect()
    assert len(rows) == 5
    from nocouncil_etl_spark.plans.breadth37 import TIERS

    def fee(cents):
        return sum(
            min(max(cents - lo, 0), hi - lo) * bp // 10000 for lo, hi, bp in TIERS
        )

    # spot-check one priority group against a direct recompute
    orders = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.round(F.col("o_totalprice") * 100).cast("long").alias("c"))
        .collect()
    )
    expect = sum(fee(r.c) for r in orders)
    got = next(r for r in rows if r.o_orderpriority == "1-URGENT")
    assert got.total_fee_cents == expect
    assert 0 <= got.effective_bp <= 1500


def test_rbo_bounded_and_positive(spark, sf_dir):
    row = REG["eval_rbo_overlap"].fn(spark, sf_dir).collect()[0]
    assert 0 <= row.n_common <= 50
    assert 0 <= row.rbo_1e3 <= 1000
    # both halves draw from the same small vocabulary: rankings overlap,
    # though count noise reorders the deep ranks (0.229 at sf0.001)
    assert row.rbo_1e3 > 100
