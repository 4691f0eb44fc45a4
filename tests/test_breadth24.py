"""Breadth batch 24 semantics: path-flow conservation, funnel depth rules."""

from __future__ import annotations

from pyspark.sql import functions as F

from nocouncil_etl_spark.registry import load_all

REG = load_all()


def test_spf_flow_conservation(spark, sf_dir):
    """σ·τ flows satisfy conservation: total flow out of the source level
    equals total flow into the target level (every shortest s→t path
    crosses each level exactly once)."""
    rows = REG["graph_shortest_path_flow"].fn(spark, sf_dir).collect()
    assert rows
    assert all(r.flow > 0 for r in rows)

    from nocouncil_etl_spark.plans.breadth24 import SPF_SOURCE

    out_of_source = sum(r.flow for r in rows if r.src == SPF_SOURCE)
    # per-level totals are all equal to the number of shortest s→t paths
    from nocouncil_etl_spark.plans.graph_plans import _graph
    nodes, edges, _ = _graph(spark, sf_dir)
    # reconstruct levels by joining flows back: level of src 0 is 0; any
    # edge whose src is the source sits at level crossing 1
    assert out_of_source > 0


def test_spf_level_crossing_totals_match(spark, sf_dir):
    """Sum of flow over edges grouped by the src's BFS level is constant
    across levels — the cut property of s→t path counting."""
    df = REG["graph_shortest_path_flow"].fn(spark, sf_dir)
    # recompute forward BFS levels exactly as the query does
    from nocouncil_etl_spark.plans.breadth24 import SPF_LEVELS, SPF_SOURCE
    from nocouncil_etl_spark.plans.graph_plans import _graph

    nodes, edges, _ = _graph(spark, sf_dir)
    e0 = [(r.src, r.dst) for r in edges.select("src", "dst").collect()]
    lvl = {SPF_SOURCE: 0}
    frontier = {SPF_SOURCE}
    for k in range(SPF_LEVELS):
        nxt = {d for s, d in e0 if s in frontier} - set(lvl)
        for d in nxt:
            lvl[d] = k + 1
        frontier = nxt
    flows = [(r.src, r.dst, r.flow) for r in df.collect()]
    per_level: dict[int, int] = {}
    for s, d, f in flows:
        per_level[lvl[s]] = per_level.get(lvl[s], 0) + f
    assert len(set(per_level.values())) == 1  # same total through every cut


def test_window_funnel_depth_rules(spark, sf_dir):
    from nocouncil_etl_spark.io import load
    from nocouncil_etl_spark.plans.breadth24 import FUNNEL_WINDOW_US

    rows = REG["window_funnel_depth"].fn(spark, sf_dir).collect()
    assert rows
    assert all(1 <= r.depth <= 4 for r in rows)
    assert all(0 <= r.span_us <= FUNNEL_WINDOW_US for r in rows)
    # every user with a view appears exactly once
    ev = load(spark, sf_dir, "events")
    n_viewers = (
        ev.filter(F.col("event_type") == "view").select("user_id").distinct().count()
    )
    assert len(rows) == n_viewers
    assert len({r.user_id for r in rows}) == n_viewers
    # the synthetic stream is dense enough that full funnels exist
    assert any(r.depth == 4 for r in rows)
    assert all((r.span_us == 0) == (r.depth == 1) for r in rows)
