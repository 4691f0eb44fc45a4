"""Breadth batch 45: Brunner-Munzel, macro AUC, CBO audit, Weibull MRR,
IBAN mod-97, Fisher index."""

from __future__ import annotations

from nocouncil_etl_spark.registry import load_all

REG = load_all()


def test_brunner_munzel_effect_in_unit_range(spark, sf_dir):
    r = REG["stat_brunner_munzel"].fn(spark, sf_dir).first()
    assert r.n1 > 1 and r.n2 > 1
    assert 0 <= r.p_hat_micro <= 1_000_000


def test_macro_auc_rows(spark, sf_dir):
    rows = {r["class"]: r for r in REG["eval_auc_macro_ovr"].fn(spark, sf_dir).collect()}
    assert "__macro__" in rows
    per = [r for c, r in rows.items() if c != "__macro__"]
    assert per
    for r in per:
        assert 0 <= r.auc_micro <= 1_000_000
        assert r.n_pos + r.n_neg == per[0].n_pos + per[0].n_neg  # same pool
    lo = min(r.auc_micro for r in per)
    hi = max(r.auc_micro for r in per)
    assert lo - 1 <= rows["__macro__"].auc_micro <= hi + 1


def test_join_cardinality_pk_fk_is_exact(spark, sf_dir):
    rows = {r.join_name: r for r in REG["io_join_cardinality_estimate"].fn(spark, sf_dir).collect()}
    # orders->customer is a clean FK: the uniform estimate should be exact
    oc = rows["orders_customer"]
    assert oc.estimate == oc.actual
    assert oc.est_over_actual_milli == 1000
    lo = rows["lineitem_orders"]
    assert lo.actual > 0 and lo.estimate > 0


def test_weibull_fit_is_sane(spark, sf_dir):
    r = REG["survival_weibull_mrr"].fn(spark, sf_dir).first()
    assert r.n > 2
    assert r.shape_milli > 0  # lifetimes are positive and increasing in F
    assert r.scale_days_milli > 0
    assert 0 <= r.r2_milli <= 1000


def test_iban_all_checks_validate(spark, sf_dir):
    r = REG["fn_iban_mod97_check"].fn(spark, sf_dir).first()
    assert r.n_valid == r.n
    assert 2 <= r.min_check <= r.max_check <= 98


def test_fisher_between_laspeyres_and_paasche(spark, sf_dir):
    r = REG["agg_price_index_fisher"].fn(spark, sf_dir).first()
    assert r.n_parts > 0
    lo = min(r.laspeyres_milli, r.paasche_milli)
    hi = max(r.laspeyres_milli, r.paasche_milli)
    assert lo - 1 <= r.fisher_milli <= hi + 1  # geometric mean property
