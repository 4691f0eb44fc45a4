"""Batch 34: manifest pruning, AP, Grubbs, JL, IPS replay, polygon."""

from __future__ import annotations

import glob
import math
import os
import tempfile

from pyspark.sql import functions as F

from nocouncil_etl_spark.registry import load_all

REG = load_all()


def test_manifest_pruning_skips_buckets(spark, sf_dir):
    df = REG["io_manifest_file_pruning"].fn(spark, sf_dir)
    rows = {r.event_type: r for r in df.collect()}
    src = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .crossJoin(
            spark.read.parquet(f"{sf_dir}/events.parquet").agg(
                F.min(F.to_date("ts")).alias("start")
            )
        )
        .select(
            "event_type",
            F.datediff(F.to_date("ts"), F.col("start")).alias("off"),
        )
        .filter(F.col("off").between(8, 17))
        .groupBy("event_type")
        .count()
        .collect()
    )
    for r in src:
        assert rows[r.event_type].n == r["count"]
    base = os.path.join(
        tempfile.gettempdir(),
        "nocouncil_etl_spark_scratch",
        f"manifest_lake_{os.path.basename(sf_dir.rstrip('/'))}",
    )
    all_buckets = glob.glob(os.path.join(base, "data", "bucket=*"))
    # 30 days / 5-day buckets = 6 buckets; the [8, 17] query needs only 3
    assert len(all_buckets) == 6


def test_average_precision_matches_sorted_recompute(spark, sf_dir):
    from nocouncil_etl_spark.io import load
    from nocouncil_etl_spark.plans.breadth15 import _pt

    row = REG["eval_average_precision"].fn(spark, sf_dir).collect()[0]
    scored = (
        load(spark, sf_dir, "events")
        .select(
            (_pt("ap#", F.col("event_id")) % 1_000_000_000).alias("score"),
            F.when(F.col("event_type") == "error", 1).otherwise(0).alias("y"),
        )
        .collect()
    )
    ranked = sorted(scored, key=lambda r: -r.score)
    tp, s = 0, 0
    for k, r in enumerate(ranked, start=1):
        tp += r.y
        if r.y:
            s += round(1e9 * tp / k)
    assert row.n == len(ranked)
    assert row.n_pos == tp
    assert row.ap_1e9 == s // tp


def test_grubbs_picks_max_deviation(spark, sf_dir):
    from nocouncil_etl_spark.io import load

    got = {
        r.event_type: r
        for r in REG["stat_grubbs_outlier"].fn(spark, sf_dir).collect()
    }
    data = {}
    for r in (
        load(spark, sf_dir, "events")
        .select("event_type", F.round(F.col("value") * 100).cast("long").alias("v"))
        .collect()
    ):
        data.setdefault(r.event_type, []).append(r.v)
    for et, vs in data.items():
        n = len(vs)
        sc = sum(vs)
        best = min((v for v in vs), key=lambda v: (-abs(v * n - sc), v))
        mean = sc / n
        sd = math.sqrt(sum((v - mean) ** 2 for v in vs) / (n - 1))
        r = got[et]
        assert r.outlier_v == best
        assert abs(r.g_stat - round(abs(best - mean) / sd, 6)) < 1e-4


def test_jl_ratios_concentrate_near_one(spark, sf_dir):
    row = REG["vec_random_projection_jl"].fn(spark, sf_dir).collect()[0]
    assert row.n_pairs >= 40
    assert 0 < row.min_ratio_1e6
    # JL at k=16: ratios within a loose [0.2, 3] band, mean near 1
    assert 200000 < row.mean_ratio_1e6 < 2000000
    assert row.min_ratio_1e6 <= row.mean_ratio_1e6 <= row.max_ratio_1e6


def test_ips_matched_share_near_one_over_k(spark, sf_dir):
    row = REG["eval_policy_replay_ips"].fn(spark, sf_dir).collect()[0]
    assert row.n > 0
    # the target policy picks 1 of 5 arms per user deterministically
    assert abs(row.n_matched / row.n - 0.2) < 0.1
    assert row.ips_value_milli > 0
    assert row.naive_mean_milli > 0


def test_point_in_polygon_matches_bruteforce(spark, sf_dir):
    from nocouncil_etl_spark.io import load
    from nocouncil_etl_spark.plans.breadth15 import _pt
    from nocouncil_etl_spark.plans.breadth34 import POLY

    row = REG["geo_point_in_polygon"].fn(spark, sf_dir).collect()[0]
    pts = (
        load(spark, sf_dir, "customer")
        .select(
            (_pt("mx#", F.col("c_custkey")) % 32768).alias("px"),
            (_pt("my#", F.col("c_custkey")) % 32768).alias("py"),
        )
        .collect()
    )

    def inside(px, py):
        k = 0
        for i in range(len(POLY)):
            x1, y1 = POLY[i]
            x2, y2 = POLY[(i + 1) % len(POLY)]
            if (y1 > py) != (y2 > py):
                lhs = (px - x1) * (y2 - y1)
                rhs = (x2 - x1) * (py - y1)
                if (lhs < rhs) if y2 > y1 else (lhs > rhs):
                    k += 1
        return k % 2 == 1

    n_in = sum(1 for p in pts if inside(p.px, p.py))
    assert row.n_inside == n_in
    assert row.n_outside == len(pts) - n_in
    assert 0 < n_in < len(pts)  # the pentagon splits the cloud
