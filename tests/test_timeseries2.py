"""Semantic invariants for the timeseries-2 batch (oracle parity is checked
by scripts/oracle_check.py; these pin the properties that make the operators
correct-by-meaning, not just engine-consistent)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from nocouncil_etl_spark.io import load
from nocouncil_etl_spark.registry import load_all

REG = load_all()


def _run(name, spark, sf_dir):
    return REG[name].fn(spark, sf_dir)


def test_gapfill_grid_is_dense_and_filled(spark, sf_dir):
    out = _run("ts_gapfill_interpolate", spark, sf_dir).cache()
    try:
        assert out.filter(F.col("filled_v").isNull()).count() == 0
        # dense: per user, bucket count == span hours + 1, with no duplicates
        per_user = out.groupBy("user_id").agg(
            F.count("*").alias("n"),
            F.countDistinct("bucket_us").alias("nd"),
            ((F.max("bucket_us") - F.min("bucket_us")) / 3_600_000_000 + 1).alias("span"),
        )
        assert per_user.filter(
            (F.col("n") != F.col("nd")) | (F.col("n") != F.col("span"))
        ).count() == 0
        # endpoints are real observations, so gaps only strictly inside
        first_last = out.withColumn(
            "rk_a",
            F.row_number().over(Window.partitionBy("user_id").orderBy("bucket_us")),
        )
        assert first_last.filter((F.col("rk_a") == 1) & F.col("is_gap")).count() == 0
    finally:
        out.unpersist()


def test_gapfill_interpolation_is_bounded_by_neighbors(spark, sf_dir):
    out = _run("ts_gapfill_interpolate", spark, sf_dir)
    w_prev = (
        Window.partitionBy("user_id").orderBy("bucket_us")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_next = (
        Window.partitionBy("user_id").orderBy("bucket_us")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    real = F.when(~F.col("is_gap"), F.col("filled_v"))
    ctx = out.select(
        "filled_v",
        "is_gap",
        F.last(real, ignorenulls=True).over(w_prev).alias("pv"),
        F.first(real, ignorenulls=True).over(w_next).alias("nv"),
    ).filter("is_gap")
    lo = F.least("pv", "nv") - 0.0001
    hi = F.greatest("pv", "nv") + 0.0001
    assert ctx.filter((F.col("filled_v") < lo) | (F.col("filled_v") > hi)).count() == 0


def test_twap_lies_within_value_range(spark, sf_dir):
    twap = _run("ts_twap", spark, sf_dir)
    rng = load(spark, sf_dir, "events").groupBy("user_id").agg(
        F.min("value").alias("lo"), F.max("value").alias("hi")
    )
    j = twap.join(rng, "user_id")
    assert j.filter(
        (F.col("twap") < F.col("lo") - 0.001) | (F.col("twap") > F.col("hi") + 0.001)
    ).count() == 0
    assert twap.filter(F.col("span_ms") <= 0).count() == 0


def test_ohlc_ordering_invariants(spark, sf_dir):
    o = _run("ts_resample_ohlc", spark, sf_dir)
    bad = o.filter(
        (F.col("low") > F.col("high"))
        | (F.col("open") < F.col("low") - 0.001) | (F.col("open") > F.col("high") + 0.001)
        | (F.col("close") < F.col("low") - 0.001) | (F.col("close") > F.col("high") + 0.001)
    )
    assert bad.count() == 0
    # single-event buckets degenerate to open==high==low==close
    assert o.filter((F.col("n") == 1) & (F.col("open") != F.col("close"))).count() == 0


def test_zscore_flags_are_extreme_and_scored(spark, sf_dir):
    z = _run("ts_zscore_outliers", spark, sf_dir)
    assert z.filter(F.abs(F.col("zscore")) <= 2.5).count() == 0
    # flagged rows are a small minority of the stream
    n_total = load(spark, sf_dir, "events").count()
    assert z.count() < n_total * 0.1
