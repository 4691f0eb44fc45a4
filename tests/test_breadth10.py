"""Invariants for breadth batch 10 (plans/breadth10.py): local clustering
coefficient, HITS, item-item covisitation."""

from __future__ import annotations

from pyspark.sql import functions as F

from nocouncil_etl_spark.operators.graph import hits_fixed_point
from nocouncil_etl_spark.plans.breadth10 import HITS_TOPK, HSCALE, LCC_SCALE, REC_TOPK
from nocouncil_etl_spark.plans.graph_plans import _graph
from nocouncil_etl_spark.registry import load_all

REG = load_all()


# --------------------------------------------------------------------------
# graph_clustering_coefficient
# --------------------------------------------------------------------------


def test_lcc_bounded_and_consistent_with_global_triangles(spark, sf_dir):
    out = REG["graph_clustering_coefficient"].fn(spark, sf_dir)
    rows = out.collect()
    assert rows, "graph has nodes with degree >= 2"
    for r in rows:
        assert 0 <= r.lcc_1e6 <= LCC_SCALE  # a fraction of neighbor pairs
        assert r.deg >= 2
        # tri(v) can't exceed the number of neighbor pairs
        assert r.tri <= r.deg * (r.deg - 1) // 2
    # per-corner counts sum to 3 × the global triangle count
    total = REG["graph_triangle_count"].fn(spark, sf_dir).collect()[0].n_triangles
    assert sum(r.tri for r in rows) == 3 * total


def test_lcc_zero_iff_no_triangle_through_node(spark, sf_dir):
    out = REG["graph_clustering_coefficient"].fn(spark, sf_dir).collect()
    for r in out:
        assert (r.lcc_1e6 == 0) == (r.tri == 0)


# --------------------------------------------------------------------------
# graph_hits_hubs_auth
# --------------------------------------------------------------------------


def test_hits_normalized_and_ranked(spark, sf_dir):
    out = REG["graph_hits_hubs_auth"].fn(spark, sf_dir)
    rows = sorted(out.collect(), key=lambda r: r.rk)
    assert len(rows) == HITS_TOPK
    # max-normalization: the top authority carries exactly the full scale
    assert rows[0].auth_1e6 == HSCALE
    auths = [r.auth_1e6 for r in rows]
    assert auths == sorted(auths, reverse=True)
    for r in rows:
        assert 0 <= r.auth_1e6 <= HSCALE
        assert 0 <= r.hub_1e6 <= HSCALE


def test_hits_iterations_converge_toward_fixed_point(spark, sf_dir):
    """Successive-iterate movement shrinks: ‖x_4 − x_3‖₁ < ‖x_2 − x_1‖₁."""
    nodes, edges, _ = _graph(spark, sf_dir)
    e = edges.select("src", "dst")

    def l1_delta(i: int, j: int) -> int:
        a = hits_fixed_point(nodes, e, i, scale=HSCALE)
        b = hits_fixed_point(nodes, e, j, scale=HSCALE)
        d = (
            a.select("node", F.col("a").alias("a1"))
            .join(b.select("node", F.col("a").alias("a2")), "node")
            .agg(F.sum(F.abs(F.col("a1") - F.col("a2"))).alias("d"))
            .collect()[0]
            .d
        )
        a.unpersist(); b.unpersist()
        return d

    assert l1_delta(3, 4) < l1_delta(1, 2)


# --------------------------------------------------------------------------
# rec_item_covisitation
# --------------------------------------------------------------------------


def test_covisitation_recs_are_symmetric_pairs_with_valid_scores(spark, sf_dir):
    out = REG["rec_item_covisitation"].fn(spark, sf_dir)
    rows = out.collect()
    assert rows
    by_item: dict[int, list] = {}
    for r in rows:
        assert r.item != r.rec
        assert r.co >= 1
        assert 0 <= r.score_1e6 <= 1_000_000  # squared cosine is in [0, 1]
        assert 1 <= r.rk <= REC_TOPK
        by_item.setdefault(r.item, []).append(r)
    # ranks are dense and ordered by (score, co, rec) within each item
    for recs in by_item.values():
        recs.sort(key=lambda r: r.rk)
        assert [r.rk for r in recs] == list(range(1, len(recs) + 1))
        keys = [(-r.score_1e6, -r.co, r.rec) for r in recs]
        assert keys == sorted(keys)


def test_covisitation_co_counts_match_a_direct_recount(spark, sf_dir, duck):
    out = REG["rec_item_covisitation"].fn(spark, sf_dir)
    some = out.limit(5).collect()
    for r in some:
        n = duck.execute(
            """
            SELECT count(*) FROM
              (SELECT DISTINCT l_orderkey FROM lineitem WHERE l_partkey = ?) a
            JOIN
              (SELECT DISTINCT l_orderkey FROM lineitem WHERE l_partkey = ?) b
            USING (l_orderkey)
            """,
            [r.item, r.rec],
        ).fetchone()[0]
        assert n == r.co
