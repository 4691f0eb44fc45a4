"""Breadth batch 42: hitting times, anchored VWAP, tokenizer fertility,
deletion vectors, Feistel scrambling, robust shape stats."""

from __future__ import annotations

from nocouncil_etl_spark.plans.breadth62 import (
    DV_DELETE_MOD,
    HT_ITERS,
    HT_SCALE,
)
from nocouncil_etl_spark.registry import load_all

REG = load_all()


def test_hitting_time_histogram_bounds(spark, sf_dir):
    rows = REG["graph_hitting_time_truncated"].fn(spark, sf_dir).collect()
    assert rows
    total_at_zero = sum(r.n_nodes for r in rows if r.h_milli == 0)
    assert total_at_zero >= 1  # the absorbing set is pinned at zero
    for r in rows:
        assert 0 <= r.h_milli <= (HT_ITERS + 1) * HT_SCALE


def test_anchored_vwap_monotone_denominator(spark, sf_dir):
    rows = REG["window_anchored_vwap"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.vwap_cents > 0
        assert r.day.startswith(r.mon)


def test_fertility_at_least_one_token_per_word(spark, sf_dir):
    rows = REG["curation_tokenizer_fertility"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.fertility_milli >= 1000  # every word costs >= 1 subtoken
        assert r.chars_per_token_milli > 0
        assert r.subtokens >= r.words


def test_deletion_vector_live_accounting(spark, sf_dir):
    from nocouncil_etl_spark.io import load
    from pyspark.sql import functions as F

    rows = REG["io_deletion_vector_read"].fn(spark, sf_dir).collect()
    assert rows
    live = sum(r.n_live for r in rows)
    direct = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % DV_DELETE_MOD != 0)
        .count()
    )
    assert live == direct
    for r in rows:
        assert r.n_live + r.dv_size == r.n_rows
        assert (r.dv_size == 0) == (r.first_deleted_pos is None)


def test_feistel_is_injective(spark, sf_dir):
    r = REG["fn_feistel_id_scramble"].fn(spark, sf_dir).first()
    assert r.n_distinct_in == r.n_distinct_out  # bijection => no collisions
    assert 0 <= r.min_scrambled <= r.max_scrambled < 2**32


def test_robust_shape_stats_ordering(spark, sf_dir):
    rows = REG["agg_robust_shape_stats"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.q1_cents <= r.q2_cents <= r.q3_cents
        if r.bowley_skew_milli is not None:
            assert -1000 <= r.bowley_skew_milli <= 1000  # Bowley is bounded
        if r.moors_kurt_milli is not None:
            assert r.moors_kurt_milli >= 0
