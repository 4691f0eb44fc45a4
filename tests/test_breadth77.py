"""Breadth batch 57: softmax GD, log-rank, AIC/BIC, agg strategy,
surrogate fidelity, vocab coverage."""

from __future__ import annotations

from nocouncil_etl_spark.plans.breadth77 import SM_CLASSES, VC_KS
from nocouncil_etl_spark.registry import load_all

REG = load_all()


def test_softmax_classes_and_accuracy(spark, sf_dir):
    rows = {r["class"]: r for r in REG["ml_softmax_gd"].fn(spark, sf_dir).collect()}
    assert set(rows) == set(SM_CLASSES)
    accs = {r.train_acc_milli for r in rows.values()}
    assert len(accs) == 1
    acc = accs.pop()
    assert 0 <= acc <= 1000


def test_log_rank_expected_close_to_half(spark, sf_dir):
    r = REG["survival_log_rank"].fn(spark, sf_dir).first()
    assert r.o1 >= 0
    assert r.e1 >= 0
    # parity cohorts are exchangeable: z should not be astronomically far
    assert abs(r.z_milli) < 10_000


def test_aic_bic_nested_sse_decreases(spark, sf_dir):
    rows = {r.model: r for r in REG["stat_aic_bic_trend"].fn(spark, sf_dir).collect()}
    assert set(rows) == {"constant", "linear", "quadratic"}
    assert rows["constant"].sse >= rows["linear"].sse >= rows["quadratic"].sse
    for r in rows.values():
        # BIC penalizes parameters at least as much as AIC for n >= 8
        assert r.bic_milli >= r.aic_milli - 1


def test_agg_strategy_recommendations(spark, sf_dir):
    rows = {r.key_col: r for r in REG["io_agg_strategy_model"].fn(spark, sf_dir).collect()}
    assert rows["o_orderstatus"].strategy == "hash"  # tiny NDV
    assert rows["o_orderkey"].reduction_milli == 1000  # primary key
    for r in rows.values():
        assert r.ndv <= r.n_rows


def test_surrogate_fidelity_bounds(spark, sf_dir):
    r = REG["ml_surrogate_fidelity"].fn(spark, sf_dir).first()
    assert r.n_agree <= r.n_rows
    assert 500 <= r.fidelity_milli <= 1000  # majority vote can't lose >half


def test_vocab_coverage_monotone(spark, sf_dir):
    rows = sorted(
        REG["text_vocab_coverage_curve"].fn(spark, sf_dir).collect(),
        key=lambda r: r.top_k,
    )
    assert [r.top_k for r in rows] == list(VC_KS)
    prev = 0
    for r in rows:
        assert r.covered >= prev
        assert 0 < r.coverage_milli <= 1000
        prev = r.covered
