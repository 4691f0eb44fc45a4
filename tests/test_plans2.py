"""Physical-plan shape assertions for the round-5-continuation operators:
the broadcast/pushdown/no-quadratic claims their docstrings make, checked
against the actual plans (same gate as test_plans.py).
"""

from __future__ import annotations

from tests.test_plans import REGISTRY, plan_of


def test_pq_adc_join_broadcasts_dtab(spark, sf_dir):
    """vec_pq_adc_search: the codes ⋈ distance-table join must broadcast
    the (queries × M × K)-sized dtab — the corpus-side codes must never
    shuffle for the ADC scan."""
    p = plan_of(REGISTRY["vec_pq_adc_search"].fn(spark, sf_dir))
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_target_encode_single_pass_no_sort_join(spark, sf_dir):
    """ml_target_encode_oof: the per-category rollup joins back broadcast —
    one hash-agg pass over the facts, no sort-merge join anywhere."""
    p = plan_of(REGISTRY["ml_target_encode_oof"].fn(spark, sf_dir))
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_rrf_fusion_no_cartesian_beyond_single_row(spark, sf_dir):
    """retrieval_rrf_fusion: the only nested-loop join allowed is the
    1-row broadcast query vector; the fusion itself is a keyed join of two
    constant-size lists."""
    p = plan_of(REGISTRY["retrieval_rrf_fusion"].fn(spark, sf_dir))
    assert "CartesianProduct" not in p


def test_mutual_information_marginal_joins_broadcast(spark, sf_dir):
    """ml_mutual_information: contingency-table arithmetic — the totals
    join is broadcast-shaped, never a fact-fact shuffle join."""
    p = plan_of(REGISTRY["ml_mutual_information"].fn(spark, sf_dir))
    assert "CartesianProduct" not in p


def test_feature_store_pit_prunes_load_axis_at_scan(spark, sf_dir):
    """join_feature_store_pit: the load-axis predicate is applied while
    BUILDING the feature side (Catalyst inlines the load_day alias into
    the versions-join condition — the '|load' salt expression is the
    marker), never as a post-join filter, and nothing is a cartesian
    product."""
    p = plan_of(REGISTRY["join_feature_store_pit"].fn(spark, sf_dir))
    assert "|load" in p
    assert "CartesianProduct" not in p
    # the window (top-1 per observation) partitions by the observation key
    assert "o_orderkey" in p


def test_quantile_histogram_single_combine_agg(spark, sf_dir):
    """sketch_quantile_histogram: the bucket histogram must be a partial
    (map-side combined) hash aggregate — the mergeability the docstring
    claims is literally the partial-agg in the plan."""
    p = plan_of(REGISTRY["sketch_quantile_histogram"].fn(spark, sf_dir))
    assert "partial_count" in p or "HashAggregate" in p
    assert "CartesianProduct" not in p


def test_token_budget_fill_has_no_global_window(spark, sf_dir):
    """curation_token_budget_fill (r7): the greedy fill's running total
    is Fenwick prefix sums + a quality-PARTITIONED tie window — the plan
    must contain no global-order Window (the pre-r7 shape was one global
    running-sum window over every document)."""
    from nocouncil_etl_spark.plancheck import plan_has_global_window

    df = REGISTRY["curation_token_budget_fill"].fn(spark, sf_dir)
    assert not plan_has_global_window(df)
    p = plan_of(df)
    assert "Window" in p  # the tie-block window is partitioned, and present
