"""Batch 35: Friedman, Hurst, Cohen's d, dynamic overwrite, sign test,
Bartlett."""

from __future__ import annotations

import collections
import math

from pyspark.sql import functions as F

from nocouncil_etl_spark.registry import load_all

REG = load_all()


def test_friedman_matches_scipy_style_recompute(spark, sf_dir):
    from nocouncil_etl_spark.io import load

    row = REG["stat_friedman_blocks"].fn(spark, sf_dir).collect()[0]
    daily = collections.defaultdict(dict)
    for r in (
        load(spark, sf_dir, "events")
        .groupBy("event_type", F.to_date("ts").alias("d"))
        .agg(F.sum(F.round("value").cast("long")).cast("long").alias("x"))
        .collect()
    ):
        daily[r.d][r.event_type] = r.x
    k = len({t for v in daily.values() for t in v})
    blocks = [v for v in daily.values() if len(v) == k]
    rsum = collections.defaultdict(float)
    for blk in blocks:
        vals = sorted(blk.values())
        for t, x in blk.items():
            lo = vals.index(x) + 1
            hi = len(vals) - vals[::-1].index(x)
            rsum[t] += (lo + hi) / 2
    n = len(blocks)
    chi2 = 12.0 / (n * k * (k + 1)) * sum(v * v for v in rsum.values()) - 3 * n * (
        k + 1
    )
    assert row.n == n and row.k == k
    assert abs(row.friedman_chi2 - chi2) < 1e-6


def test_hurst_in_valid_band(spark, sf_dir):
    rows = REG["ts_hurst_rs"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        # R/S grows with scale for any real series
        assert r.rs4_1e6 < r.rs16_1e6
        assert -0.5 < r.hurst < 1.5  # loose sanity; H in [0,1] theoretically


def test_cohens_d_matches_recompute(spark, sf_dir):
    from nocouncil_etl_spark.io import load
    from nocouncil_etl_spark.plans.breadth15 import _pt

    row = REG["eval_cohens_d"].fn(spark, sf_dir).collect()[0]
    per_user = (
        load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.sum(F.round(F.col("value") * 100).cast("long")).alias("x"))
        .select(
            F.when((_pt("srm#", F.col("user_id")) % 1000) % 2 == 0, 0)
            .otherwise(1)
            .alias("arm"),
            "x",
        )
        .collect()
    )
    arms = {0: [], 1: []}
    for r in per_user:
        arms[r.arm].append(r.x)
    m0, m1 = (sum(v) / len(v) for v in (arms[0], arms[1]))
    ss = sum((x - m0) ** 2 for x in arms[0]) + sum((x - m1) ** 2 for x in arms[1])
    d = (m1 - m0) / math.sqrt(ss / (len(arms[0]) + len(arms[1]) - 2))
    assert row.n0 == len(arms[0]) and row.n1 == len(arms[1])
    assert abs(row.cohens_d - d) < 1e-4
    assert abs(row.hedges_g) <= abs(row.cohens_d)


def test_dynamic_overwrite_leaves_other_partitions_untouched(spark, sf_dir):
    import os
    import tempfile

    rows = {
        r.event_type: r
        for r in REG["io_dynamic_partition_overwrite"].fn(spark, sf_dir).collect()
    }
    src = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"),
        )
        .collect()
    )
    for r in src:
        got = rows[r.event_type]
        assert got.n == r.n
        expect = 2 * r.cents if r.event_type == "error" else r.cents
        assert got.cents == expect
    # untouched partitions must still hold ORIGINAL per-row content
    out = os.path.join(
        tempfile.gettempdir(),
        "nocouncil_etl_spark_scratch",
        f"dyn_overwrite_{os.path.basename(sf_dir.rstrip('/'))}",
    )
    click = (
        spark.read.parquet(out)
        .filter(F.col("event_type") == "click")
        .agg(F.sum("cents"))
        .collect()[0][0]
    )
    orig_click = next(r.cents for r in src if r.event_type == "click")
    assert click == orig_click


def test_sign_test_counts(spark, sf_dir):
    row = REG["stat_sign_test"].fn(spark, sf_dir).collect()[0]
    assert row.n_pos + row.n_neg + row.n_tie == row.n_days
    assert row.n_days > 0
    expect = (row.n_pos - row.n_neg) / math.sqrt(row.n_pos + row.n_neg)
    assert abs(row.z_sign - round(expect, 6)) < 1e-9


def test_bartlett_positive_and_scipy_shape(spark, sf_dir):
    from nocouncil_etl_spark.io import load

    row = REG["stat_bartlett_variance"].fn(spark, sf_dir).collect()[0]
    assert row.k == 5
    data = collections.defaultdict(list)
    for r in (
        load(spark, sf_dir, "events")
        .select("event_type", F.round(F.col("value") * 100).cast("long").alias("v"))
        .collect()
    ):
        data[r.event_type].append(r.v)
    n = sum(len(v) for v in data.values())
    k = len(data)
    s2s = {
        t: sum((x - sum(v) / len(v)) ** 2 for x in v) / (len(v) - 1)
        for t, v in data.items()
    }
    sp2 = sum((len(v) - 1) * s2s[t] for t, v in data.items()) / (n - k)
    num = (n - k) * math.log(sp2) - sum(
        (len(v) - 1) * math.log(s2s[t]) for t, v in data.items()
    )
    c = 1 + (sum(1 / (len(v) - 1) for v in data.values()) - 1 / (n - k)) / (
        3 * (k - 1)
    )
    assert abs(row.bartlett_chi2 - num / c) < max(0.01, abs(num / c) * 1e-3)
