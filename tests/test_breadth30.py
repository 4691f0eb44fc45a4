"""Batch 30: burst Viterbi, BLEU, item CF, business days, Kalman,
apportionment."""

from __future__ import annotations

import collections

import numpy as np
from pyspark.sql import functions as F

from nocouncil_etl_spark.registry import load_all

REG = load_all()


def test_burst_viterbi_matches_path_tracking_dp(spark, sf_dir):
    from nocouncil_etl_spark.io import load

    got = {
        r.event_type: r for r in REG["ts_burst_viterbi"].fn(spark, sf_dir).collect()
    }
    assert got
    daily = (
        load(spark, sf_dir, "events")
        .groupBy("event_type", F.to_date("ts").alias("d"))
        .agg(F.count("*").cast("long").alias("x"))
        .collect()
    )
    series = collections.defaultdict(list)
    for r in daily:
        series[r.event_type].append((r.d, r.x))
    for et, pts in series.items():
        xs = [x for _, x in sorted(pts)]
        mu = sum(xs) // len(xs)
        pen = mu // 2 + 1
        # independent DP: track explicit state paths, then count stats
        paths = {0: (abs(xs[0] - mu), [0]), 1: (abs(xs[0] - 2 * mu) + pen, [1])}
        for x in xs[1:]:
            new = {}
            for tgt in (0, 1):
                stay_c = paths[tgt][0]
                move_c = paths[1 - tgt][0] + pen
                src = tgt if stay_c <= move_c else 1 - tgt
                emis = abs(x - mu) if tgt == 0 else abs(x - 2 * mu)
                new[tgt] = (emis + min(stay_c, move_c), paths[src][1] + [tgt])
            paths = new
        best = paths[0] if paths[0][0] <= paths[1][0] else paths[1]
        r = got[et]
        assert r.total_cost == best[0]
        assert r.burst_days == sum(best[1])
        assert r.n_switches == sum(
            1 for a, b in zip(best[1], best[1][1:]) if a != b
        )


def test_bleu_precisions_bounded_and_consistent(spark, sf_dir):
    row = REG["eval_bleu_ngram"].fn(spark, sf_dir).collect()[0]
    assert row.n_pairs > 0
    for n in (1, 2, 3, 4):
        num, den = getattr(row, f"num{n}"), getattr(row, f"den{n}")
        assert 0 <= num <= den
    assert 0.0 <= row.bleu <= 1.0
    assert 0.0 < row.bp <= 1.0
    # clipped unigram numerator can never exceed total ref length
    assert row.num1 <= row.r_len


def test_item_cosine_verifies_one_pair(spark, sf_dir):
    from nocouncil_etl_spark.io import load

    rows = sorted(
        REG["rec_item_cosine"].fn(spark, sf_dir).collect(), key=lambda r: r.rk
    )
    assert rows
    cos = [r.cosine for r in rows]
    assert cos == sorted(cos, reverse=True)
    assert all(r.cosine <= 1.0 + 1e-9 for r in rows)
    # recompute the top pair from raw ratings, applying the same
    # per-customer top-COSINE_RATING_CAP cap the kernel applies (r7)
    from nocouncil_etl_spark.plans.breadth30 import COSINE_RATING_CAP

    top = rows[0]
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    all_ratings = (
        li.join(orders.select("o_orderkey", "o_custkey"),
                li.l_orderkey == F.col("o_orderkey"))
        .groupBy(F.col("o_custkey").alias("cid"), F.col("l_partkey").alias("pid"))
        .agg(F.round(F.sum("l_quantity")).cast("long").alias("r"))
        .collect()
    )
    by_cid: dict = {}
    for r in all_ratings:
        by_cid.setdefault(r.cid, []).append(r)
    ratings = []
    for cid_rows in by_cid.values():
        cid_rows.sort(key=lambda r: (-r.r, r.pid))
        ratings.extend(cid_rows[:COSINE_RATING_CAP])
    ratings = [r for r in ratings if r.pid in (top.pid1, top.pid2)]
    v1 = {r.cid: r.r for r in ratings if r.pid == top.pid1}
    v2 = {r.cid: r.r for r in ratings if r.pid == top.pid2}
    num = sum(v1[c] * v2[c] for c in set(v1) & set(v2))
    assert num == top.num
    assert len(set(v1) & set(v2)) == top.n_common
    import math

    expect = num / math.sqrt(
        sum(v * v for v in v1.values()) * sum(v * v for v in v2.values())
    )
    assert abs(top.cosine - round(expect, 6)) < 1e-9


def test_business_days_matches_numpy_busday(spark, sf_dir):
    from nocouncil_etl_spark.io import load

    got = {
        r.bdays: r.n_orders
        for r in REG["fn_business_days"].fn(spark, sf_dir).collect()
    }
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    ship = li.groupBy("l_orderkey").agg(
        F.min(F.to_date("l_shipdate")).alias("first_ship")
    )
    pairs = (
        orders.join(ship, orders.o_orderkey == ship.l_orderkey)
        .select(F.to_date("o_orderdate").alias("od"), "first_ship")
        .collect()
    )
    # signed [a, b) weekday count: numpy's reversed-argument form uses the
    # other half-open end, so order the args and apply the sign ourselves
    expect = collections.Counter(
        int(np.busday_count(r.od, r.first_ship))
        if r.first_ship >= r.od
        else -int(np.busday_count(r.first_ship, r.od))
        for r in pairs
    )
    assert got == dict(expect)


def test_kalman_covariance_converges_to_riccati_fixed_point(spark, sf_dir):
    from nocouncil_etl_spark.plans.breadth30 import KF_Q, KF_R

    rows = REG["ts_kalman_filter_1d"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_days >= 2
        assert r.innov_sse >= 0
        # fixed point of P = (1000 - K) * (P + Q) / 1000
        pp = r.p_final + KF_Q
        k = (1000 * pp) // (pp + KF_R)
        assert abs(((1000 - k) * pp) // 1000 - r.p_final) <= max(
            2, r.p_final // 100
        )


def test_apportionment_sums_to_budget(spark, sf_dir):
    rows = REG["agg_apportion_seats"].fn(spark, sf_dir).collect()
    assert sum(r.seats for r in rows) == 1000
    for r in rows:
        assert r.extra in (0, 1)
        assert r.seats == r.base_seats + r.extra
