"""Breadth batch 25 semantics: HyperBall accuracy/union-law, Mann-Kendall
sign consistency, SAX word structure."""

from __future__ import annotations

from pyspark.sql import functions as F

from nocouncil_etl_spark.registry import load_all

REG = load_all()


def test_hyperball_estimates_track_exact_sizes(spark, sf_dir):
    out = REG["graph_hyperball_neighborhood"].fn(spark, sf_dir).cache()
    rows = out.collect()
    assert rows
    for r in rows:
        assert r.n_exact >= 1  # every ball contains the node itself
        assert r.hll_est > 0
    # small balls hit the linear-counting path → tight estimates: median
    # relative error well under the HLL headline error for these sizes
    errs = sorted(r.rel_err for r in rows)
    assert errs[len(errs) // 2] <= 0.15
    # larger balls have larger-or-equal estimates on average: rank
    # correlation between exact and estimate is strongly positive
    rows_sorted = sorted(rows, key=lambda r: r.n_exact)
    lo = [r.hll_est for r in rows_sorted[: len(rows) // 4]]
    hi = [r.hll_est for r in rows_sorted[-len(rows) // 4:]]
    assert sum(hi) / len(hi) >= sum(lo) / len(lo)
    out.unpersist()


def test_hyperball_ball_contains_out_neighbors(spark, sf_dir):
    """Exact-ball sanity: |ball(2)| ≥ 1 + out-degree for every node."""
    from nocouncil_etl_spark.plans.graph_plans import _graph

    nodes, edges, _ = _graph(spark, sf_dir)
    deg = edges.groupBy("src").agg(F.countDistinct("dst").alias("od"))
    out = REG["graph_hyperball_neighborhood"].fn(spark, sf_dir)
    joined = out.join(deg, out.node == deg.src).collect()
    assert joined
    for r in joined:
        assert r.n_exact >= 1 + r.od


def test_mann_kendall_agrees_with_theil_sen_sign(spark, sf_dir):
    rows = REG["ts_mann_kendall_trend"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.var18 > 0
        assert r.n_days > 10
        # |S| is bounded by the pair count n(n-1)/2
        assert abs(r.s_stat) <= r.n_days * (r.n_days - 1) // 2
        # z sign matches S sign (continuity correction cannot flip it)
        if r.s_stat > 1:
            assert r.z_mk > 0
        elif r.s_stat < -1:
            assert r.z_mk < 0


def test_sax_words_well_formed(spark, sf_dir):
    from nocouncil_etl_spark.plans.breadth25 import SAX_SEGMENTS

    rows = REG["ts_sax_symbols"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert len(r.sax_word) == SAX_SEGMENTS
        assert set(r.sax_word) <= set("abcd")
        assert r.n_days >= SAX_SEGMENTS
    # z-normalization forces both low and high symbols to appear somewhere
    all_chars = "".join(r.sax_word for r in rows)
    assert ("a" in all_chars or "b" in all_chars)
    assert ("c" in all_chars or "d" in all_chars)
