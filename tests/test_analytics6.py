"""Semantic invariants for the analytics-6 batch (association rules, RFM,
hysteresis episodes) — parity is the oracle's job; these pin meaning."""

from __future__ import annotations

from pyspark.sql import functions as F

from nocouncil_etl_spark.io import load
from nocouncil_etl_spark.plans.analytics6 import HI, LO, MIN_PAIR_SUPPORT
from nocouncil_etl_spark.registry import load_all

REG = load_all()


def _run(name, spark, sf_dir):
    return REG[name].fn(spark, sf_dir)


def test_market_basket_rule_arithmetic(spark, sf_dir):
    rows = _run("market_basket_lift", spark, sf_dir).collect()
    assert rows, "sf data should produce at least one frequent pair"
    lifts = [r.lift for r in rows]
    assert lifts == sorted(lifts, reverse=True)
    n_orders = (
        load(spark, sf_dir, "lineitem").select("l_orderkey").distinct().count()
    )
    for r in rows:
        assert r.pair_cnt >= MIN_PAIR_SUPPORT
        assert r.pair_cnt <= min(r.cnt_a, r.cnt_b), "pair support bounded by items"
        assert r.part_a < r.part_b, "canonical pair orientation"
        # recompute each ratio from the emitted exact integers
        assert abs(r.support - round(r.pair_cnt / n_orders, 6)) < 1e-9
        assert abs(r.confidence - round(r.pair_cnt / r.cnt_a, 6)) < 1e-9
        assert abs(r.lift - round(r.pair_cnt * n_orders / (r.cnt_a * r.cnt_b), 6)) < 1e-9


def test_rfm_census_partitions_customers(spark, sf_dir):
    seg = _run("rfm_segments", spark, sf_dir).collect()
    n_cust = load(spark, sf_dir, "orders").select("o_custkey").distinct().count()
    assert sum(r.n_customers for r in seg) == n_cust
    for r in seg:
        assert 1 <= r.r_score <= 4 and 1 <= r.f_score <= 4 and 1 <= r.m_score <= 4
    # each ntile dimension splits the base into near-equal quartiles
    for dim in ("r_score", "f_score", "m_score"):
        per = {}
        for r in seg:
            per[r[dim]] = per.get(r[dim], 0) + r.n_customers
        assert max(per.values()) - min(per.values()) <= 1


def test_hysteresis_episode_semantics(spark, sf_dir):
    epi = _run("window_hysteresis_episodes", spark, sf_dir).collect()
    assert epi, "thresholds should open at least one episode"
    for r in epi:
        assert r.peak_value >= HI, "an episode can only open on a >= HI event"
        assert r.start_us <= r.end_us
    # replay one user's stream in Python and compare episode count
    uid = epi[0].user_id
    evs = (
        load(spark, sf_dir, "events")
        .filter(F.col("user_id") == uid)
        .orderBy("ts", "event_id")
        .select("value")
        .collect()
    )
    active, episodes, members = 0, 0, 0
    for e in evs:
        if e.value >= HI:
            if active == 0:
                episodes += 1
            active = 1
        elif e.value <= LO:
            active = 0
        if active == 1:
            members += 1
    mine = [r for r in epi if r.user_id == uid]
    assert len(mine) == episodes
    assert sum(r.n_events for r in mine) == members


def test_stream_hysteresis_matches_batch_census(spark, sf_dir):
    """The streaming FSM must agree with the batch window form on both the
    episode count and the alert-event count, per user."""
    batch = {}
    for r in _run("window_hysteresis_episodes", spark, sf_dir).collect():
        b = batch.setdefault(r.user_id, [0, 0])
        b[0] += 1
        b[1] += r.n_events
    stream = {
        r.user_id: (r.n_episodes, r.n_alert_events)
        for r in _run("stream_hysteresis_alerts", spark, sf_dir).collect()
    }
    assert stream == {u: tuple(v) for u, v in batch.items()}
