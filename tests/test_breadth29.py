"""Batch 29: cross-correlation, Haar, Granger, SRM, LCS, compaction."""

from __future__ import annotations

import glob
import os
import re
import tempfile

from pyspark.sql import functions as F

from nocouncil_etl_spark.registry import load_all

REG = load_all()


def test_cross_correlation_all_lags_bounded(spark, sf_dir):
    rows = {r.lag: r for r in REG["ts_cross_correlation"].fn(spark, sf_dir).collect()}
    assert set(rows) == set(range(-7, 8))
    for r in rows.values():
        assert -1.0 <= r.r <= 1.0
        assert r.n_pairs >= 1
    # lag 0 pairs = common dates of the two daily series
    from nocouncil_etl_spark.io import load

    daily = (
        load(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("click", "purchase"))
        .select("event_type", F.to_date("ts").alias("d"))
        .distinct()
    )
    common = (
        daily.groupBy("d").count().filter(F.col("count") == 2).count()
    )
    assert rows[0].n_pairs == common


def test_haar_level1_energy_matches_recompute(spark, sf_dir):
    from nocouncil_etl_spark.io import load

    rows = REG["ts_haar_wavelet"].fn(spark, sf_dir).collect()
    assert rows
    got = {(r.event_type, r.level): r for r in rows}
    daily = (
        load(spark, sf_dir, "events")
        .groupBy("event_type", F.to_date("ts").alias("d"))
        .agg(F.sum(F.round("value").cast("long")).cast("long").alias("x"))
        .collect()
    )
    series = {}
    for r in daily:
        series.setdefault(r.event_type, []).append((r.d, r.x))
    for et, pts in series.items():
        xs = [x for _, x in sorted(pts)]
        d1 = [xs[2 * i] - xs[2 * i + 1] for i in range(len(xs) // 2)]
        r = got[(et, 1)]
        assert r.n_coeffs == len(d1)
        assert r.energy == sum(v * v for v in d1)
        assert r.max_abs_det == max(abs(v) for v in d1)


def test_granger_rss_drop_nonnegative(spark, sf_dir):
    row = REG["ts_granger_lag"].fn(spark, sf_dir).collect()[0]
    assert row.n >= 4
    assert row.s11 > 0 and row.syy > 0
    # adding a regressor can only reduce RSS (float slack for rounding)
    assert row.rss_drop >= -1e-4
    assert row.f_stat == row.f_stat  # not NaN


def test_srm_chi2_consistent_with_counts(spark, sf_dir):
    rows = {r.assignment: r for r in REG["stat_srm_check"].fn(spark, sf_dir).collect()}
    assert set(rows) == {"hash_mod2", "biased_49"}
    for r in rows.values():
        n = r.n0 + r.n1
        assert n > 0
        expect = round((r.n0 - r.n1) ** 2 / n, 6)
        assert abs(r.chi2 - expect) < 1e-9
        assert r.srm_flag == (expect > 3.841)


def test_lcs_histogram_matches_full_matrix_dp(spark, sf_dir):
    import pandas as pd

    from nocouncil_etl_spark.plans.breadth29 import LCS_CAP, LCS_QUERY

    rows = REG["text_lcs_subsequence"].fn(spark, sf_dir).collect()
    hist = {r.lcs_len: r.n_docs for r in rows}
    assert all(0 <= k <= 6 for k in hist)
    texts = pd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    assert sum(hist.values()) == len(texts)

    def lcs_full(toks, q):  # classic full-matrix DP, independent of the kernel
        m, n = len(toks), len(q)
        dp = [[0] * (n + 1) for _ in range(m + 1)]
        for i in range(1, m + 1):
            for j in range(1, n + 1):
                dp[i][j] = (
                    dp[i - 1][j - 1] + 1
                    if toks[i - 1] == q[j - 1]
                    else max(dp[i - 1][j], dp[i][j - 1])
                )
        return dp[m][n]

    expect = {}
    for s in texts["text"]:
        toks = [t for t in re.split(r"[^a-z0-9]+", s.lower()) if t][:LCS_CAP]
        expect[lcs_full(toks, list(LCS_QUERY))] = (
            expect.get(lcs_full(toks, list(LCS_QUERY)), 0) + 1
        )
    assert hist == expect


def test_compaction_reduces_file_count(spark, sf_dir):
    df = REG["io_compact_small_files"].fn(spark, sf_dir)
    total = df.agg(F.sum("n")).collect()[0][0]
    src = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    assert total == src
    base = os.path.join(
        tempfile.gettempdir(),
        "nocouncil_etl_spark_scratch",
        f"compact_{os.path.basename(sf_dir.rstrip('/'))}",
    )
    small = glob.glob(os.path.join(base, "small", "*.parquet"))
    big = glob.glob(os.path.join(base, "big", "*.parquet"))
    assert len(small) == 32
    assert 1 <= len(big) <= 4
