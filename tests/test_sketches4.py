"""Invariants for sketch_theta_intersection and ts_holt_winters_seasonal."""

from __future__ import annotations

from nocouncil_etl_spark.plans.timeseries3 import FP, HW_H, PERIOD
from nocouncil_etl_spark.registry import load_all

REG = load_all()


# --------------------------------------------------------------------------
# sketch_theta_intersection
# --------------------------------------------------------------------------


def test_theta_intersection_estimates_track_exact(spark, sf_dir):
    rows = REG["sketch_theta_intersection"].fn(spark, sf_dir).collect()
    assert rows, "documents span multiple sources"
    for r in rows:
        assert r.src_a < r.src_b
        assert r.n_sub_theta >= 0
        assert r.est_inter >= 0.0
        # a sub-θ overlap hash certifies a REAL shared gram: it implies exact > 0
        if r.n_sub_theta > 0:
            assert r.n_exact > 0
    # the estimator should be in the right order of magnitude when the
    # overlap is non-trivial: |est − exact| within 5× + additive slack
    # (K=64 is a deliberately small sketch; this bounds gross failure, the
    # exactness of the arithmetic itself is the oracle's job)
    for r in rows:
        if r.n_exact >= 50:
            assert r.est_inter <= 5 * r.n_exact + 100
            assert 5 * r.est_inter + 100 >= r.n_exact


def test_theta_intersection_covers_all_source_pairs(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_sources = docs.select("source").distinct().count()
    rows = REG["sketch_theta_intersection"].fn(spark, sf_dir).collect()
    assert len(rows) == n_sources * (n_sources - 1) // 2


# --------------------------------------------------------------------------
# ts_holt_winters_seasonal
# --------------------------------------------------------------------------


def test_hw_seasonal_shape_and_forecast_tail(spark, sf_dir):
    rows = sorted(
        REG["ts_holt_winters_seasonal"].fn(spark, sf_dir).collect(),
        key=lambda r: r.idx,
    )
    fitted = [r for r in rows if r.observed is not None]
    fc = [r for r in rows if r.observed is None]
    assert len(fc) == HW_H
    assert fitted, "fitted region non-empty"
    # indices are contiguous from PERIOD through the forecast tail
    assert [r.idx for r in rows] == list(
        range(PERIOD, PERIOD + len(rows))
    )
    # forecast rows carry the terminal level/trend
    term = fitted[-1]
    for r in fc:
        assert r.level_fp == term.level_fp
        assert r.trend_fp == term.trend_fp


def test_hw_seasonal_tracks_weekday_pattern_better_than_holt(spark, sf_dir):
    """One-step-ahead absolute error of HW ≤ Holt's on the shared fitted
    region — the seasonal component must not make the fit worse on a
    series with weekday structure."""
    hw = {
        r.idx: r
        for r in REG["ts_holt_winters_seasonal"].fn(spark, sf_dir).collect()
        if r.observed is not None
    }
    holt = {
        r.idx: r
        for r in REG["ts_holt_forecast"].fn(spark, sf_dir).collect()
        if r.observed is not None
    }
    # next_fc at idx i predicts idx i+1's observation
    common = sorted(set(hw) & set(holt))
    err_hw = err_holt = 0.0
    n = 0
    for i in common:
        if i + 1 in hw and hw[i + 1].observed is not None:
            y = hw[i + 1].observed
            err_hw += abs(hw[i].next_fc - y)
            err_holt += abs(holt[i].one_ahead - y)
            n += 1
    assert n >= PERIOD
    assert err_hw <= err_holt * 1.25  # at worst marginally noisier


def test_hw_seasonals_sum_is_bounded(spark, sf_dir):
    """Additive seasonals hover around zero (they encode deviations from
    level): the terminal ring's mean magnitude stays below the level."""
    rows = [
        r
        for r in REG["ts_holt_winters_seasonal"].fn(spark, sf_dir).collect()
        if r.observed is None
    ]
    term_level = abs(rows[0].level_fp) or FP
    for r in rows:
        assert abs(r.seas_fp) <= 5 * term_level


# --------------------------------------------------------------------------
# count-min mergeability (the streaming/partition-merge proof)
# --------------------------------------------------------------------------


def test_countmin_cells_merge_across_partitions(spark, sf_dir):
    """CMS is mergeable by cell-wise addition: sketching two disjoint
    halves of the corpus and adding the cell matrices equals sketching the
    whole corpus — the property that lets per-partition (or per-micro-
    batch) sketches combine at 100 TB without touching rows twice."""
    from pyspark.sql import functions as F

    from nocouncil_etl_spark.plans.analytics5 import CMS_D, CMS_W

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    def cells(df):
        toks = df.select(F.explode(F.split("text", " ")).alias("term"))
        cnt = toks.groupBy("term").agg(F.count(F.lit(1)).alias("n"))
        js = F.explode(F.array(*[F.lit(j) for j in range(CMS_D)])).alias("j")
        fan = cnt.select("term", "n", js)
        h = F.conv(
            F.substring(
                F.md5(F.concat(F.col("j").cast("string"), F.lit(":"), F.col("term"))),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        return (
            fan.select("j", (h % CMS_W).alias("bucket"), "n")
            .groupBy("j", "bucket")
            .agg(F.sum("n").cast("long").alias("c"))
        )

    whole = {(r.j, r.bucket): r.c for r in cells(docs).collect()}
    a = cells(docs.filter(F.col("doc_id") % 2 == 0))
    b = cells(docs.filter(F.col("doc_id") % 2 == 1))
    merged = (
        a.select("j", "bucket", F.col("c").alias("ca"))
        .join(
            b.select("j", "bucket", F.col("c").alias("cb")),
            ["j", "bucket"],
            "full_outer",
        )
        .select(
            "j",
            "bucket",
            (F.coalesce("ca", F.lit(0)) + F.coalesce("cb", F.lit(0)))
            .cast("long")
            .alias("c"),
        )
    )
    got = {(r.j, r.bucket): r.c for r in merged.collect()}
    assert got == whole
