"""Breadth batch 49: token bucket, Z-order skip, Elo, median polish,
Markov eval, systematic sample."""

from __future__ import annotations

from pyspark.sql import functions as F

from nocouncil_etl_spark.io import load
from nocouncil_etl_spark.plans.breadth49 import (
    ELO_INIT,
    SYS_K,
    TB_CAP_MILLI,
    ZO_BUCKETS,
)
from nocouncil_etl_spark.registry import load_all

REG = load_all()


def test_token_bucket_throttles_bursty_users(spark, sf_dir):
    rows = REG["agg_token_bucket_admission"].fn(spark, sf_dir).collect()
    assert rows
    total = throttled = 0
    for r in rows:
        assert r.n_admitted + r.n_throttled == r.n_events
        assert r.n_admitted >= 1  # a full bucket always admits the first
        assert 0 <= r.tokens_final_milli <= TB_CAP_MILLI
        total += r.n_events
        throttled += r.n_throttled
    assert 0 < throttled < total  # the policy actually bites, but not fully


def test_zorder_touches_no_more_buckets_than_linear(spark, sf_dir):
    r = REG["layout_zorder_skip"].fn(spark, sf_dir).first()
    assert r.n_buckets == ZO_BUCKETS
    assert 1 <= r.touched_zorder <= r.n_buckets
    assert 1 <= r.touched_linear <= r.n_buckets
    # the whole point: Z-order prunes at least as well on a 2-D box
    assert r.touched_zorder <= r.touched_linear
    assert r.rows_matched > 0


def test_elo_is_zero_sum_and_ranks_by_wins(spark, sf_dir):
    rows = REG["ml_elo_rating"].fn(spark, sf_dir).collect()
    assert len(rows) >= 2
    assert sum(r.rating_milli - ELO_INIT for r in rows) == 0  # zero-sum
    games = {r.arm: r.wins + r.losses for r in rows}
    assert len(set(games.values())) == 1  # round-robin: equal schedules
    best = max(rows, key=lambda r: r.rating_milli)
    worst = min(rows, key=lambda r: r.rating_milli)
    assert best.wins >= worst.wins


def test_median_polish_centers_rows_and_columns(spark, sf_dir):
    rows = REG["agg_median_polish"].fn(spark, sf_dir).collect()
    assert rows
    # after the final column sweep, each column's residual median is 0
    by_col: dict[int, list[int]] = {}
    for r in rows:
        by_col.setdefault(r.dow, []).append(r.resid_milli)
    for resids in by_col.values():
        resids.sort()
        assert resids[(len(resids) + 1) // 2 - 1] == 0
    # effects within a row/column are constant
    row_effs = {(r.event_type, r.row_eff_milli) for r in rows}
    assert len(row_effs) == len({r.event_type for r in rows})


def test_markov_eval_rates_are_consistent(spark, sf_dir):
    rows = REG["rec_markov_next_event"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_hit <= r.n_test
        assert r.hit_ppm == (r.n_hit * 1_000_000) // r.n_test


def test_systematic_sample_size_and_mean(spark, sf_dir):
    r = REG["sample_systematic"].fn(spark, sf_dir).first()
    assert 0 <= r.start_offset < SYS_K
    assert abs(r.n_sample - r.n_pop // SYS_K) <= 1
    # an evenly spread sample lands near the population mean
    assert abs(r.sample_mean_milli - r.pop_mean_milli) * 10 < r.pop_mean_milli


def test_token_bucket_matches_naive_replay_on_one_user(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    uid = ev.groupBy("user_id").count().orderBy(F.desc("count"), "user_id").first().user_id
    times = [
        r.s
        for r in ev.filter(F.col("user_id") == uid)
        .select(F.unix_timestamp("ts").cast("long").alias("s"))
        .orderBy("ts", "event_id")
        .collect()
    ]
    tokens, adm = TB_CAP_MILLI, 0
    prev = None
    for s in times:
        gap = 0 if prev is None else s - prev
        prev = s
        tokens = min(TB_CAP_MILLI, tokens + (gap * 1000) // 7200)
        if tokens >= 1000:
            tokens -= 1000
            adm += 1
    row = {
        r.user_id: r
        for r in REG["agg_token_bucket_admission"].fn(spark, sf_dir).collect()
    }[uid]
    assert row.n_admitted == adm
    assert row.tokens_final_milli == tokens
