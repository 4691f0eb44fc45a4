"""Breadth batch 47: bagging, null drift, Hodges-Lehmann, query
likelihood, ETC bandit, bow-tie."""

from __future__ import annotations

from nocouncil_etl_spark.plans.breadth47 import BAG_B, ETC_EXPLORE, QL_TOP
from nocouncil_etl_spark.registry import load_all

REG = load_all()


def test_bagging_emits_one_winner_per_bag(spark, sf_dir):
    rows = REG["ml_bagging_stumps"].fn(spark, sf_dir).collect()
    assert sorted(r.bag for r in rows) == list(range(BAG_B))
    accs = {r.acc_ppm for r in rows}
    assert len(accs) == 1  # ensemble accuracy is one number
    for r in rows:
        assert 0 < r.eps_ppm < 1_000_000
        assert 0 < r.acc_ppm <= 1_000_000
        assert r.n_correct <= r.n


def test_null_drift_covers_every_check_consistently(spark, sf_dir):
    rows = REG["dq_null_drift"].fn(spark, sf_dir).collect()
    assert len(rows) == 3
    for r in rows:
        assert 0 <= r.rate1_ppm <= 1_000_000
        assert 0 <= r.rate2_ppm <= 1_000_000
        assert r.drift_ppm == r.rate2_ppm - r.rate1_ppm
        assert (abs(r.drift_ppm) > 10000) == (r.alarm == 1)
        assert r.bad1 <= r.n1 and r.bad2 <= r.n2


def test_hodges_lehmann_pair_accounting(spark, sf_dir):
    r = REG["stat_hodges_lehmann"].fn(spark, sf_dir).first()
    assert r.n_pairs == r.n_a * r.n_b
    assert r.n_walsh == r.n_a * (r.n_a + 1) // 2


def test_query_likelihood_scores_are_log_probs(spark, sf_dir):
    rows = REG["search_query_likelihood"].fn(spark, sf_dir).collect()
    assert 0 < len(rows) <= QL_TOP
    ordered = sorted(rows, key=lambda r: r.rk)
    for a, b in zip(ordered, ordered[1:]):
        assert a.ql_micro >= b.ql_micro  # rank follows score
    for r in rows:
        assert r.ql_micro < 0  # log of probabilities < 1


def test_etc_bandit_accounting_is_exact(spark, sf_dir):
    r = REG["eval_bandit_etc_regret"].fn(spark, sf_dir).first()
    assert r.explore_days == ETC_EXPLORE
    assert r.n_arms >= 2
    assert r.regret_milli == r.best_total_milli - r.total_milli
    assert r.chosen_arm and r.best_arm


def test_bowtie_partitions_all_nodes(spark, sf_dir):
    rows = REG["graph_bowtie_classify"].fn(spark, sf_dir).collect()
    assert {r.cls for r in rows} <= {"CORE", "IN", "OUT", "OTHER"}
    assert abs(sum(r.share_ppm for r in rows) - 1_000_000) <= len(rows) + 2
    assert any(r.cls == "CORE" and r.n_nodes > 0 for r in rows)
