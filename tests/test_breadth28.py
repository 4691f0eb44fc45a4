"""Batch 28: logistic GD, ALS sweep, Yule's K, partition pruning,
Morton hotspots, Cochran-Armitage."""

from __future__ import annotations

import math
import re

from pyspark.sql import functions as F

from nocouncil_etl_spark.registry import load_all

REG = load_all()


def test_logistic_gd_learns_majority_and_moves_params(spark, sf_dir):
    row = REG["ml_logistic_gd"].fn(spark, sf_dir).collect()[0]
    assert row.n > 0
    assert 0 <= row.pos_rate_1e6 <= 1000000
    # error rate ~20% -> intercept must have moved negative from 0
    assert row.b0_1e6 < 0
    # after training the fit must at least match the majority-class rate
    majority = max(row.pos_rate_1e6, 1000000 - row.pos_rate_1e6)
    assert row.acc_1e6 >= majority - 1  # floor-division slack


def test_als_half_step_ranked_and_in_scale(spark, sf_dir):
    rows = sorted(
        REG["ml_als_half_step"].fn(spark, sf_dir).collect(), key=lambda r: r.rk
    )
    assert 0 < len(rows) <= 20
    assert [r.rk for r in rows] == list(range(1, len(rows) + 1))
    q1s = [r.q1_milli for r in rows]
    assert q1s == sorted(q1s, reverse=True)
    for r in rows:
        assert 1000 <= r.q0_milli < 2000  # the affine-mod init range
        assert r.n_raters >= 1
        assert r.q1_milli > 0  # ratings are positive -> factors stay positive


def test_yules_k_matches_local_recompute(spark, sf_dir):
    import collections

    import pandas as pd

    row = REG["text_yules_k"].fn(spark, sf_dir).collect()[0]
    texts = pd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    freq = collections.Counter(
        t for s in texts["text"] for t in re.split(r"[^a-z0-9]+", s.lower()) if t
    )
    n = sum(freq.values())
    s2 = sum(m * m for m in freq.values())
    assert row.n_tokens == n
    assert row.n_types == len(freq)
    assert row.s2 == s2
    assert abs(row.yules_k - round(10000.0 * (s2 - n) / (n * n), 6)) < 1e-9


def test_partitioned_write_prunes_directories(spark, sf_dir):
    df = REG["io_partitioned_write_prune"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "click" in plan  # the partition predicate reached file listing
    # and the pruned readback still sums to the source's click count
    n = df.agg(F.sum("n")).collect()[0][0]
    src = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .filter(F.col("event_type") == "click")
        .count()
    )
    assert n == src


def test_morton_code_is_bijective_with_cells(spark, sf_dir):
    rows = REG["geo_morton_hotspots"].fn(spark, sf_dir).collect()
    assert rows

    def decode(z):
        cx = cy = 0
        for j in range(4):
            cx |= ((z >> (2 * j)) & 1) << j
            cy |= ((z >> (2 * j + 1)) & 1) << j
        return cx, cy

    for r in rows:
        assert decode(r.morton) == (r.cx, r.cy)
        assert 0 <= r.cx < 16 and 0 <= r.cy < 16
        assert r.n >= 1
    ns = [r.n for r in sorted(rows, key=lambda r: r.rk)]
    assert ns == sorted(ns, reverse=True)


def test_cochran_armitage_matches_float_recompute(spark, sf_dir):
    from nocouncil_etl_spark.io import load

    row = REG["stat_cochran_armitage"].fn(spark, sf_dir).collect()[0]
    assert row.k == 5
    grp = (
        load(spark, sf_dir, "orders")
        .groupBy(F.substring("o_orderpriority", 1, 1).cast("long").alias("w"))
        .agg(
            F.count("*").alias("n_i"),
            F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)).alias(
                "r_i"
            ),
        )
        .collect()
    )
    n = sum(g.n_i for g in grp)
    rr = sum(g.r_i for g in grp)
    t = sum(g.w * (g.r_i * n - g.n_i * rr) for g in grp)
    var = (rr * (n - rr) / n) * (
        n * sum(g.w * g.w * g.n_i for g in grp)
        - sum(g.w * g.n_i for g in grp) ** 2
    )
    assert row.t_stat == t
    assert abs(row.z_trend - round(t / math.sqrt(var), 6)) < 1e-6
