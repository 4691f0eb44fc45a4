"""Batch 40: Goertzel, temporal paths, meta-analysis, Slope One,
burstiness, uncertainty sampling."""

from __future__ import annotations

import collections
import math

from pyspark.sql import functions as F

from nocouncil_etl_spark.registry import load_all

REG = load_all()


def test_goertzel_tracks_true_dft_ordering(spark, sf_dir):
    from nocouncil_etl_spark.io import load

    rows = {r.event_type: r for r in REG["ts_goertzel_weekly"].fn(spark, sf_dir).collect()}
    assert rows
    daily = collections.defaultdict(list)
    for r in (
        load(spark, sf_dir, "events")
        .groupBy("event_type", F.to_date("ts").alias("d"))
        .agg(F.sum(F.round("value").cast("long")).cast("long").alias("x"))
        .collect()
    ):
        daily[r.event_type].append((r.d, r.x))
    for et, pts in daily.items():
        xs = [x for _, x in sorted(pts)]
        mu = sum(xs) // len(xs)
        xs = [x - mu for x in xs]
        # float DFT power at the same bins, for an order-of-magnitude check
        def power(period):
            w = 2 * math.pi / period
            re = sum(x * math.cos(w * i) for i, x in enumerate(xs))
            im = sum(x * math.sin(w * i) for i, x in enumerate(xs))
            return re * re + im * im

        r = rows[et]
        assert r.power7 >= 0 and r.power30 >= 0
        # fixed-point Goertzel agrees with the float DFT within 25%
        for got, true in ((r.power7, power(7)), (r.power30, power(30))):
            if true > 1e4:
                assert 0.5 < got / true < 1.6


def test_temporal_reach_subset_of_static_reach(spark, sf_dir):
    from nocouncil_etl_spark.plans.graph_plans import _graph

    row = REG["graph_temporal_paths"].fn(spark, sf_dir).collect()[0]
    assert row.n_reached >= 1
    assert 0 <= row.min_arr <= row.max_arr < 30
    # static BFS reach from the same seed is an upper bound
    _, edges, _ = _graph(spark, sf_dir)
    e = [
        (r.src, r.dst)
        for r in edges.select("src", "dst").distinct().collect()
        if r.src != r.dst
    ]
    seed = min(s for s, _ in e)
    out = collections.defaultdict(set)
    for s, d in e:
        out[s].add(d)
    seen = {seed}
    frontier = {seed}
    while frontier:
        nxt = set()
        for v in frontier:
            nxt |= out[v] - seen
        seen |= nxt
        frontier = nxt
    assert row.n_reached <= len(seen)


def test_meta_analysis_identity_and_bounds(spark, sf_dir):
    row = REG["stat_meta_fixed_effect"].fn(spark, sf_dir).collect()[0]
    assert row.k == 5
    assert row.pooled_se > 0
    assert 0.0 <= row.i2 < 1.0
    assert row.cochran_q >= 0


def test_slope_one_predictions_ranked_with_support(spark, sf_dir):
    rows = REG["rec_slope_one"].fn(spark, sf_dir).collect()
    assert rows
    by_user = collections.defaultdict(list)
    for r in rows:
        by_user[r.cid].append(r)
    for cid, rs in by_user.items():
        rs.sort(key=lambda r: r.rk)
        preds = [r.pred_milli for r in rs]
        assert preds == sorted(preds, reverse=True)
        assert all(r.supp > 0 for r in rs)
        assert len(rs) <= 3


def test_burstiness_bounded(spark, sf_dir):
    rows = REG["text_term_burstiness"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert -1000000 <= r.burstiness_1e6 <= 1000000
        assert r.mean_gap_milli >= 1000  # gaps are at least one position


def test_uncertainty_batch_nearest_boundary(spark, sf_dir):
    from nocouncil_etl_spark.io import load
    from nocouncil_etl_spark.plans.breadth28 import train_logistic_gd

    rows = sorted(
        REG["sample_uncertainty_margin"].fn(spark, sf_dir).collect(),
        key=lambda r: r.rk,
    )
    assert len(rows) == 20
    margins = [r.margin_micro for r in rows]
    assert margins == sorted(margins)
    # nothing outside the batch has a smaller margin
    b0, b1 = train_logistic_gd(spark, sf_dir)
    all_margins = sorted(
        abs(b0 + b1 * r.x)
        for r in load(spark, sf_dir, "events")
        .select(F.round(F.col("value") * 100).cast("long").alias("x"))
        .collect()
    )
    assert margins[-1] <= all_margins[20]
