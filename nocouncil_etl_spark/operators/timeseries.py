"""Shared timeseries kernels consumed by both the oracle-checked plans
(plans/timeseries2.py) and the Engine facade verbs (api.py) — one
implementation, so the parity-critical fixed-point arithmetic cannot drift
between the two surfaces.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from nocouncil_etl_spark.functions.numeric import DEC

BUCKET_SECONDS = {"hour": 3600, "day": 86400, "minute": 60}


def gapfill_interpolate(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    bucket: str = "hour",
) -> DataFrame:
    """Dense per-key calendar at ``bucket`` granularity over each key's own
    observation span, with fixed-point linear interpolation for missing
    buckets → (key_col, _b timestamp, filled_v double, is_gap boolean).

    The whole interpolation runs in FIXED-POINT: bucket averages become
    half-up-rounded 1e-4 units (exact decimal sum → integer), and the
    linear blend is pure integer arithmetic — float interpolation of
    float-rounded averages flips the last decimal between engines, while
    integer math cannot. Span endpoints are real buckets by construction,
    so every gap is bounded on both sides.

    Scale shape: the dense grid is one row per key-bucket — O(keys × span),
    independent of event count; both IGNORE NULLS window scans run inside
    the same key partition the bucket agg already shuffled on."""
    step = BUCKET_SECONDS[bucket]
    bucketed = df.groupBy(
        F.col(key_col).alias("_k"), F.date_trunc(bucket, ts_col).alias("_b")
    ).agg(
        (F.sum(F.col(value_col).cast(DEC)) * 1000000).cast("long").alias("_s6"),
        F.count("*").alias("_c"),
    )
    hv = bucketed.select(
        "_k", "_b", F.expr("(2 * _s6 + 100 * _c) div (200 * _c)").alias("_v4")
    )
    span = hv.groupBy("_k").agg(
        F.sequence(
            F.min("_b"), F.max("_b"), F.expr(f"INTERVAL {step} SECONDS")
        ).alias("_bs")
    )
    grid = (
        span.select("_k", F.explode("_bs").alias("_b"))
        .join(hv, ["_k", "_b"], "left")
        .withColumn("_i", F.expr(f"unix_seconds(_b) div {step}"))
    )
    w_prev = (
        Window.partitionBy("_k")
        .orderBy("_i")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # reversed running frame — a following frame is O(n^2) per key in
    # Spark (tail rescan per row); the grid _i is unique per key, so the
    # reversed preceding frame reads the identical row set
    w_next = (
        Window.partitionBy("_k")
        .orderBy(F.desc("_i"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    i_if_v = F.when(F.col("_v4").isNotNull(), F.col("_i"))
    ctx = grid.select(
        "_k",
        "_b",
        "_i",
        "_v4",
        F.last("_v4", ignorenulls=True).over(w_prev).alias("_pv"),
        F.last(i_if_v, ignorenulls=True).over(w_prev).alias("_pi"),
        F.last("_v4", ignorenulls=True).over(w_next).alias("_nv"),
        F.last(i_if_v, ignorenulls=True).over(w_next).alias("_ni"),
    )
    interp4 = F.expr(
        "(2 * (_pv * (_ni - _i) + _nv * (_i - _pi)) + (_ni - _pi))"
        " div (2 * (_ni - _pi))"
    )
    return ctx.select(
        F.col("_k").alias(key_col),
        "_b",
        (F.coalesce(F.col("_v4"), interp4).cast("double") / 10000.0).alias(
            "filled_v"
        ),
        F.col("_v4").isNull().alias("is_gap"),
    )
