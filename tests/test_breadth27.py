"""Batch 27: link prediction, DTW, Kruskal-Wallis, Brier, AMS, RR."""

from __future__ import annotations

from pyspark.sql import functions as F

from nocouncil_etl_spark.registry import load_all

REG = load_all()


def test_resource_allocation_predicts_only_nonedges(spark, sf_dir):
    from nocouncil_etl_spark.plans.graph_plans import _graph

    rows = REG["graph_resource_allocation"].fn(spark, sf_dir).collect()
    assert 0 < len(rows) <= 20
    assert [r.rk for r in sorted(rows, key=lambda r: r.rk)] == list(
        range(1, len(rows) + 1)
    )
    scores = [r.ra_1e9 for r in sorted(rows, key=lambda r: r.rk)]
    assert scores == sorted(scores, reverse=True)
    _, edges, _ = _graph(spark, sf_dir)
    und = {
        (min(r.src, r.dst), max(r.src, r.dst))
        for r in edges.select("src", "dst").collect()
    }
    for r in rows:
        assert r.u < r.v
        assert r.common_nbrs >= 1
        assert r.ra_1e9 > 0
        assert (r.u, r.v) not in und  # predicted links are NOT existing edges


def test_dtw_matches_full_matrix_dp(spark, sf_dir):
    from nocouncil_etl_spark.io import load
    from nocouncil_etl_spark.plans.breadth27 import DTW_PATTERN_PCT

    got = {
        r.event_type: r for r in REG["ts_dtw_pattern"].fn(spark, sf_dir).collect()
    }
    assert got
    # independent check: full O(n·m) DP matrix (not the rolling-array kernel)
    daily = (
        load(spark, sf_dir, "events")
        .select(
            "event_type",
            F.to_date("ts").alias("d"),
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
        .groupBy("event_type", "d")
        .agg(F.sum("cents").alias("x"))
        .collect()
    )
    series: dict[str, list[tuple]] = {}
    for r in daily:
        series.setdefault(r.event_type, []).append((r.d, int(r.x)))
    for et, pts in series.items():
        xs = [x for _, x in sorted(pts)]
        mu = sum(xs) // len(xs)
        pat = [mu * c // 100 for c in DTW_PATTERN_PCT]
        big = 1 << 62
        dp = [[big] * (len(pat) + 1) for _ in range(len(xs) + 1)]
        dp[0][0] = 0
        for i in range(1, len(xs) + 1):
            for j in range(1, len(pat) + 1):
                dp[i][j] = abs(xs[i - 1] - pat[j - 1]) + min(
                    dp[i - 1][j], dp[i][j - 1], dp[i - 1][j - 1]
                )
        assert got[et].n_days == len(xs)
        assert got[et].dtw_cost == dp[len(xs)][len(pat)]


def test_kruskal_wallis_bounds(spark, sf_dir):
    row = REG["stat_kruskal_wallis"].fn(spark, sf_dir).collect()[0]
    assert row.k == 5  # five event types
    assert row.h_stat >= 0
    # tie correction divides by a factor ≤ 1, so it can only grow H
    assert row.h_tie_corrected >= row.h_stat
    # H is chi²(k-1)-distributed under H0; a value beyond ~1000 means broken math
    assert row.h_tie_corrected < 1000


def test_brier_murphy_identity_within_bin_variance(spark, sf_dir):
    row = REG["eval_brier_decomposition"].fn(spark, sf_dir).collect()[0]
    assert 0 <= row.brier <= 1
    assert row.reliability >= 0
    assert row.resolution >= 0
    assert 0 <= row.uncertainty <= 0.25
    # Murphy identity holds up to within-decile forecast variance
    # (uniform-within-decile ⇒ ≈ 0.1²/12 ≈ 8.3e-4)
    assert abs(row.brier - (row.reliability - row.resolution + row.uncertainty)) < 2e-3


def test_ams_estimate_within_sketch_error(spark, sf_dir):
    row = REG["sketch_ams_f2"].fn(spark, sf_dir).collect()[0]
    assert row.exact_f2 > 0
    est = row.est_med2x / 2
    # median-of-16 AMS is within a small constant factor w.h.p.
    assert row.exact_f2 / 5 <= est <= row.exact_f2 * 5
    assert row.rel_err == round(abs(est - row.exact_f2) / row.exact_f2, 4)


def test_rr_debiasing_recovers_true_rate(spark, sf_dir):
    row = REG["privacy_rr_estimate"].fn(spark, sf_dir).collect()[0]
    # observed rate is pulled toward 1/2 by the flips; the estimator undoes it
    assert abs(row.est_rate_1e6 - row.true_rate_1e6) < abs(
        row.obs_rate_1e6 - row.true_rate_1e6
    ) + 100_000
    # flip-noise std at n=1000 is ~27k ppm; 5 sigma
    assert abs(row.est_rate_1e6 - row.true_rate_1e6) < 140_000
