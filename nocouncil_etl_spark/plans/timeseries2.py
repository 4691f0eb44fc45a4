"""Timeseries depth batch: gap-fill + interpolation, TWAP, OHLC resampling,
rolling z-score outliers.

The hypertable-style ops a metrics/feature pipeline needs past plain windowed
aggregation (reference analogue: the transcript pipeline's per-meeting time
handling at transcribe_council.py is single-series pandas; none of these exist
there). All four have exact DuckDB oracles: float accumulation goes through
the DECIMAL quantization kernels (functions/numeric) so window/group sums are
order-independent, and integer sums are CAST AS BIGINT.

Scale notes: every operator keys its shuffle on user_id (the natural series
key); the gap-fill's generated rows are bounded by the observation span (one
row per series-hour), never by event count — the property that keeps a dense
calendar join tractable at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nocouncil_etl_spark.functions.numeric import DEC
from nocouncil_etl_spark.io import load
from nocouncil_etl_spark.registry import query

ZWIN = 20  # rolling rows preceding the current one
ZMIN = ZWIN + 1  # only score when the frame is full
ZCUT = 2.5


# --------------------------------------------------------------------------
# 1. hourly gap-fill + linear interpolation
# --------------------------------------------------------------------------


@query(
    "ts_gapfill_interpolate",
    oracle="""
WITH hourly AS (
  SELECT user_id, date_trunc('hour', ts) AS b,
         CAST(sum(CAST(value AS DECIMAL(18,6))) * 1000000 AS BIGINT) AS s6,
         count(*) AS c
  FROM events GROUP BY 1, 2
),
hv AS (
  SELECT user_id, b, (2 * s6 + 100 * c) // (200 * c) AS v4 FROM hourly
),
span AS (
  SELECT user_id, unnest(generate_series(min(b), max(b), INTERVAL 1 HOUR)) AS b
  FROM hv GROUP BY user_id
),
grid AS (
  SELECT s.user_id, s.b, epoch(s.b)::BIGINT // 3600 AS i, h.v4
  FROM span s LEFT JOIN hv h ON s.user_id = h.user_id AND s.b = h.b
),
ctx AS (
  SELECT user_id, b, i, v4,
         last_value(v4 IGNORE NULLS) OVER w_prev AS pv,
         last_value(CASE WHEN v4 IS NOT NULL THEN i END IGNORE NULLS) OVER w_prev AS pi,
         first_value(v4 IGNORE NULLS) OVER w_next AS nv,
         first_value(CASE WHEN v4 IS NOT NULL THEN i END IGNORE NULLS) OVER w_next AS ni
  FROM grid
  WINDOW
    w_prev AS (PARTITION BY user_id ORDER BY i
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
    w_next AS (PARTITION BY user_id ORDER BY i
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT user_id, epoch_us(b) AS bucket_us,
       CAST(coalesce(
         v4,
         (2 * (pv * (ni - i) + nv * (i - pi)) + (ni - pi)) // (2 * (ni - pi))
       ) AS DOUBLE) / 10000.0 AS filled_v,
       (v4 IS NULL) AS is_gap
FROM ctx
""",
)
def ts_gapfill_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable gap-fill: per-user hourly buckets densified over the user's
    own observation span (sequence join), missing buckets linearly
    interpolated between the nearest real neighbors (IGNORE NULLS window
    scans). Span endpoints are real buckets by construction, so every gap is
    bounded on both sides.

    The whole interpolation runs in FIXED-POINT: bucket averages become
    half-up-rounded 1e-4 units (exact decimal sum → integer), and the linear
    blend is pure integer arithmetic — float interpolation of float-rounded
    averages flips the last decimal between engines (observed: 180/105k rows
    off by 1e-4 from double-rounding cascades), while integer math cannot.

    Scale shape: the dense grid is one row per series-hour — O(series ×
    span), independent of event count; both window scans run inside the
    same user_id partition the hourly agg already shuffled on.

    Kernel shared with Engine.gapfill (operators/timeseries.py) so the
    parity-critical integer blend cannot drift between plan and facade."""
    from nocouncil_etl_spark.operators.timeseries import gapfill_interpolate

    ev = load(spark, sf_dir, "events")
    filled = gapfill_interpolate(ev, "user_id", "ts", "value", bucket="hour")
    return filled.select(
        "user_id",
        F.unix_micros("_b").alias("bucket_us"),
        "filled_v",
        "is_gap",
    )


# --------------------------------------------------------------------------
# 2. time-weighted average (TWAP)
# --------------------------------------------------------------------------


@query(
    "ts_twap",
    oracle="""
WITH seg AS (
  SELECT user_id, value,
         (epoch_us(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
           - epoch_us(ts)) // 1000 AS dt_ms
  FROM events
)
SELECT user_id,
       round(CAST(sum(CAST(value * dt_ms AS DECIMAL(18,6))) AS DOUBLE)
             / CAST(sum(dt_ms) AS BIGINT), 4) AS twap,
       CAST(sum(dt_ms) AS BIGINT) AS span_ms
FROM seg WHERE dt_ms IS NOT NULL AND dt_ms > 0
GROUP BY user_id
""",
)
def ts_twap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average: each observation holds until the next one, so
    its weight is the ms gap to the successor (last observation carries no
    weight). The piecewise-constant integral every pricing/metrics engine
    computes; plain avg() over-weights bursty periods. Weights are
    ms-granular so value×dt addends stay inside the DECIMAL(18,6) grid even
    for month-long gaps (µs weights overflow it).

    Scale shape: one lead() window and one keyed agg, both on user_id; the
    weighted sum is decimal-exact hence order-independent."""
    ev = load(spark, sf_dir, "events")
    seg = ev.select(
        "user_id",
        "value",
        F.expr(
            "(unix_micros(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))"
            " - unix_micros(ts)) div 1000"
        ).alias("dt_ms"),
    ).filter(F.col("dt_ms").isNotNull() & (F.col("dt_ms") > 0))
    return seg.groupBy("user_id").agg(
        F.round(
            F.sum((F.col("value") * F.col("dt_ms")).cast(DEC)).cast("double")
            / F.sum("dt_ms"),
            4,
        ).alias("twap"),
        F.sum("dt_ms").alias("span_ms"),
    )


# --------------------------------------------------------------------------
# 3. OHLC resampling
# --------------------------------------------------------------------------


@query(
    "ts_resample_ohlc",
    oracle="""
WITH r AS (
  SELECT user_id, date_trunc('hour', ts) AS b, value,
         row_number() OVER (PARTITION BY user_id, date_trunc('hour', ts)
                            ORDER BY ts, event_id) AS ra,
         row_number() OVER (PARTITION BY user_id, date_trunc('hour', ts)
                            ORDER BY ts DESC, event_id DESC) AS rd
  FROM events
)
SELECT user_id, epoch_us(b) AS bucket_us,
       round(max(CASE WHEN ra = 1 THEN value END), 2) AS open,
       round(max(value), 2) AS high,
       round(min(value), 2) AS low,
       round(max(CASE WHEN rd = 1 THEN value END), 2) AS close,
       count(*) AS n
FROM r GROUP BY 1, 2
""",
)
def ts_resample_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC resampling: per user-hour open/high/low/close of value — the
    candlestick downsample. First/last are anchored on the deterministic
    (ts, event_id) total order via dual row_numbers, not on engine-specific
    first()/arg_min tie behavior, so both engines pick identical rows.

    Scale shape: the windows and the agg share one (user, bucket) hash
    partitioning; no value crosses the shuffle twice."""
    ev = load(spark, sf_dir, "events")
    b = F.date_trunc("hour", "ts")
    wa = Window.partitionBy("user_id", b).orderBy("ts", "event_id")
    wd = Window.partitionBy("user_id", b).orderBy(F.desc("ts"), F.desc("event_id"))
    r = ev.select(
        "user_id",
        b.alias("b"),
        "value",
        F.row_number().over(wa).alias("ra"),
        F.row_number().over(wd).alias("rd"),
    )
    return r.groupBy("user_id", "b").agg(
        F.round(F.max(F.when(F.col("ra") == 1, F.col("value"))), 2).alias("open"),
        F.round(F.max("value"), 2).alias("high"),
        F.round(F.min("value"), 2).alias("low"),
        F.round(F.max(F.when(F.col("rd") == 1, F.col("value"))), 2).alias("close"),
        F.count("*").alias("n"),
    ).select(
        "user_id", F.unix_micros("b").alias("bucket_us"),
        "open", "high", "low", "close", "n",
    )


# --------------------------------------------------------------------------
# 4. rolling z-score outliers
# --------------------------------------------------------------------------

_ZN = f"{ZWIN + 1}.0"


@query(
    "ts_zscore_outliers",
    oracle=f"""
WITH zw AS (
  SELECT user_id, event_id, ts, value,
         count(*) OVER w AS n,
         CAST(sum(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE) AS s1,
         CAST(sum(CAST(value * value AS DECIMAL(18,6))) OVER w AS DOUBLE) AS s2
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN {ZWIN} PRECEDING AND CURRENT ROW)
),
z AS (
  SELECT user_id, event_id, ts, value,
         round((value - s1 / {_ZN})
               / sqrt((s2 - s1 * s1 / {_ZN}) / ({_ZN} - 1.0)), 3) AS zscore
  FROM zw WHERE n = {ZMIN}
)
SELECT user_id, event_id, epoch_us(ts) AS ts_us, round(value, 2) AS value, zscore
FROM z WHERE abs(zscore) > {ZCUT}
""",
)
def ts_zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score anomaly detection: each event scored against the
    mean/stddev of its trailing {ZWIN}-row window (full frames only —
    partial frames produce garbage z). |z| > {ZCUT} rows are the anomalies.

    Window sums use decimal quantization: Spark folds ROWS frames by running
    accumulation while DuckDB uses a segment tree — different float orders —
    so only exact (decimal) window sums hash-match across engines. One
    user_id shuffle; the frame is rows-based, memory O(window)."""
    ev = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-ZWIN, Window.currentRow)
    )
    n = F.lit(float(ZWIN + 1))
    zw = ev.select(
        "user_id",
        "event_id",
        "ts",
        "value",
        F.count("*").over(w).alias("cnt"),
        F.sum(F.col("value").cast(DEC)).over(w).cast("double").alias("s1"),
        F.sum((F.col("value") * F.col("value")).cast(DEC)).over(w).cast("double").alias("s2"),
    ).filter(F.col("cnt") == ZMIN)
    z = F.round(
        (F.col("value") - F.col("s1") / n)
        / F.sqrt((F.col("s2") - F.col("s1") * F.col("s1") / n) / (n - F.lit(1.0))),
        3,
    )
    return (
        zw.withColumn("zscore", z)
        .filter(F.abs(F.col("zscore")) > ZCUT)
        .select(
            "user_id",
            "event_id",
            F.unix_micros("ts").alias("ts_us"),
            F.round("value", 2).alias("value"),
            "zscore",
        )
    )


@query(
    "ts_seasonal_weekday_baseline",
    oracle="""
WITH base AS (
  SELECT event_type,
         CAST(isodow(CAST(ts AS DATE)) AS INT) AS dow,
         round(value, 2) AS v2
  FROM events
),
prof AS (
  SELECT event_type, dow,
         CAST(count(*) AS BIGINT) AS n,
         round(CAST(sum(CAST(v2 AS DECIMAL(18,6))) AS DOUBLE) / count(*), 6)
           AS dow_mean
  FROM base GROUP BY event_type, dow
),
tot AS (
  SELECT event_type,
         round(CAST(sum(CAST(v2 AS DECIMAL(18,6))) AS DOUBLE) / count(*), 6)
           AS overall_mean
  FROM base GROUP BY event_type
)
SELECT p.event_type, p.dow, p.n, p.dow_mean,
       round(p.dow_mean - t.overall_mean, 6) AS seasonal_effect
FROM prof p JOIN tot t USING (event_type)
""",
)
def ts_seasonal_weekday_baseline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekday seasonal profile: per (type, ISO weekday) mean value and its
    deviation from the type's overall mean — the additive seasonal
    baseline every anomaly detector subtracts before flagging (a quiet
    Sunday is not an incident). Means are decimal-exact ratios rounded
    identically; weekday goes through ISO numbering (locale-relative
    dayofweek differs between engines).

    Scale shape: two map-side-combined aggs + one broadcast-sized join;
    O(types × 7) output."""
    ev = load(spark, sf_dir, "events").select(
        "event_type",
        F.expr(
            "CAST(CASE WHEN dayofweek(CAST(ts AS DATE)) = 1 THEN 7 "
            "ELSE dayofweek(CAST(ts AS DATE)) - 1 END AS INT)"
        ).alias("dow"),
        F.round("value", 2).alias("v2"),
    )
    prof = ev.groupBy("event_type", "dow").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.round(
            F.sum(F.col("v2").cast(DEC)).cast("double") / F.count(F.lit(1)), 6
        ).alias("dow_mean"),
    )
    tot = ev.groupBy("event_type").agg(
        F.round(
            F.sum(F.col("v2").cast(DEC)).cast("double") / F.count(F.lit(1)), 6
        ).alias("overall_mean"),
    )
    return prof.join(tot, "event_type").select(
        "event_type", "dow", "n", "dow_mean",
        F.round(F.col("dow_mean") - F.col("overall_mean"), 6).alias(
            "seasonal_effect"
        ),
    )
