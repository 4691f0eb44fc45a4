"""Breadth batch 40: COW/MOR, WoE/IV, Burrows' Delta, seasonal MK,
stochastic oscillator, Allen relations."""

from __future__ import annotations

from nocouncil_etl_spark.registry import load_all

REG = load_all()

ALLEN_RELATIONS = {
    "equals", "precedes", "preceded_by", "meets", "met_by", "starts",
    "started_by", "finishes", "finished_by", "during", "contains",
    "overlaps", "overlapped_by",
}


def test_cow_mor_tradeoff_direction(spark, sf_dir):
    rows = {r.strategy: r for r in REG["io_cow_vs_mor_cost"].fn(spark, sf_dir).collect()}
    cow, mor = rows["cow"], rows["mor"]
    assert cow.n_updates == mor.n_updates > 0
    # COW writes more, reads less; MOR the reverse
    assert cow.rows_written >= mor.rows_written
    assert cow.read_rows <= mor.read_rows
    assert mor.files_touched == 0 and cow.files_touched > 0
    assert cow.rows_written >= cow.n_updates  # touched files contain the updates


def test_woe_iv_terms_nonnegative_and_total(spark, sf_dir):
    rows = REG["ml_woe_information_value"].fn(spark, sf_dir).collect()
    assert rows
    total = {r.iv_total_micro for r in rows}
    assert len(total) == 1
    assert total.pop() == sum(r.iv_term_micro for r in rows)
    for r in rows:
        assert r.iv_term_micro >= -1  # (p-q)·ln(p/q) >= 0 up to quantization


def test_burrows_delta_symmetric_nonneg(spark, sf_dir):
    rows = REG["text_burrows_delta"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.source_a < r.source_b  # upper triangle only
        assert r.delta_milli >= 0


def test_seasonal_mk_consistent_labels(spark, sf_dir):
    rows = REG["stat_seasonal_mann_kendall"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.var_x18 > 0
        if r.s_stat > 0:
            assert r.trend == "increasing" and r.z_milli >= 0
        elif r.s_stat < 0:
            assert r.trend == "decreasing" and r.z_milli <= 0


def test_stochastic_bounds(spark, sf_dir):
    rows = REG["window_stochastic_oscillator"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_overbought + r.n_oversold <= r.n_days
        if r.last_k_milli is not None:
            assert 0 <= r.last_k_milli <= 100_000
        if r.last_d_milli is not None:
            assert 0 <= r.last_d_milli <= 100_000


def test_allen_relations_partition_all_orders(spark, sf_dir):
    from nocouncil_etl_spark.io import load

    rows = REG["fn_allen_interval_relations"].fn(spark, sf_dir).collect()
    assert {r.relation for r in rows} <= ALLEN_RELATIONS
    n_orders_with_items = (
        load(spark, sf_dir, "lineitem").select("l_orderkey").distinct().count()
    )
    assert sum(r.n for r in rows) == n_orders_with_items
