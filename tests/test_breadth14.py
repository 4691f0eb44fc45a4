"""Invariants for breadth batch 14 (walks, streaming CDC, ridge)."""

from __future__ import annotations

from pyspark.sql import functions as F

from nocouncil_etl_spark.plans.breadth14 import WALK_LEN
from nocouncil_etl_spark.plans.graph_plans import _graph
from nocouncil_etl_spark.registry import load_all

REG = load_all()


# --------------------------------------------------------------------------
# graph_random_walks
# --------------------------------------------------------------------------


def test_walks_follow_real_edges_and_are_deterministic(spark, sf_dir):
    out = REG["graph_random_walks"].fn(spark, sf_dir)
    rows = out.collect()
    assert rows
    _, edges, _ = _graph(spark, sf_dir)
    edge_set = {(r.src, r.dst) for r in edges.collect()}
    # reconstruct per-walk paths and check every hop is a real edge
    by_start: dict[int, dict[int, int]] = {}
    for r in rows:
        by_start.setdefault(r.start, {})[r.step] = r.node
    for start, steps in by_start.items():
        prev = start
        for t in range(1, WALK_LEN + 1):
            if t not in steps:
                break  # walk hit a sink and stopped
            assert (prev, steps[t]) in edge_set
            prev = steps[t]
    # deterministic across runs
    again = {(r.start, r.step, r.node) for r in REG["graph_random_walks"].fn(spark, sf_dir).collect()}
    assert {(r.start, r.step, r.node) for r in rows} == again


def test_walks_step_counts_never_increase(spark, sf_dir):
    out = REG["graph_random_walks"].fn(spark, sf_dir)
    per_step = {
        r.step: r.n
        for r in out.groupBy("step").agg(F.count("*").alias("n")).collect()
    }
    counts = [per_step.get(t, 0) for t in range(1, WALK_LEN + 1)]
    assert counts[0] > 0
    for a, b in zip(counts, counts[1:]):
        assert b <= a  # walks only ever drop out (at sinks)


# --------------------------------------------------------------------------
# stream_cdc_apply
# --------------------------------------------------------------------------


def test_stream_cdc_state_matches_batch_keep_latest(spark, sf_dir):
    out = REG["stream_cdc_apply"].fn(spark, sf_dir)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    n_keys = ev.select("user_id", "event_type").distinct().count()
    assert out.count() == n_keys
    # spot-check a few keys against a direct batch recompute
    some = out.limit(5).collect()
    for r in some:
        last = (
            ev.filter(
                (F.col("user_id") == r.user_id)
                & (F.col("event_type") == r.event_type)
            )
            .orderBy(F.desc("ts"), F.desc("event_id"))
            .first()
        )
        assert last.event_id == r.last_event_id


# --------------------------------------------------------------------------
# ml_ridge_closed_form
# --------------------------------------------------------------------------


def test_ridge_coefficients_are_finite_and_stable(spark, sf_dir):
    row = REG["ml_ridge_closed_form"].fn(spark, sf_dir).collect()[0]
    assert row.n > 0
    for b in (row.beta0, row.beta1, row.beta2):
        assert b == b and abs(b) < 1e12  # finite, not NaN
    # order count should predict spend positively on this schema
    assert row.beta2 > 0
    again = REG["ml_ridge_closed_form"].fn(spark, sf_dir).collect()[0]
    assert tuple(row) == tuple(again)


# --------------------------------------------------------------------------
# graph_modularity_score
# --------------------------------------------------------------------------


def test_modularity_parts_account_for_all_edges_and_degrees(spark, sf_dir):
    rows = REG["graph_modularity_score"].fn(spark, sf_dir).collect()
    assert rows
    comm = {r.community: r for r in REG["graph_label_propagation"].fn(spark, sf_dir).collect()}
    assert set(r.community for r in rows) == set(comm)
    for r in rows:
        assert r.n_members == comm[r.community].n_members
    from nocouncil_etl_spark.plans.graph_plans import _graph
    from pyspark.sql import functions as F

    _, edges, _ = _graph(spark, sf_dir)
    m = (
        edges.select(F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b"))
        .distinct()
        .count()
    )
    # degree sums over communities add to 2m; within-edges can't exceed m
    assert sum(r.deg_sum for r in rows) == 2 * m
    assert 0 <= sum(r.e_in for r in rows) <= m
    q = sum(r.q_part for r in rows)
    assert -0.5 <= q <= 1.0  # Newman modularity bounds
