"""Breadth batch 49 (round 6): ARCH(1) fit, forecast error suite,
interpolated as-of join, energy distance, lasso soft-thresholding,
spectral flatness.

Six operators (reference scope: conditional-heteroscedasticity
modelling, the practical forecast-accuracy dashboard, the interpolating
flavor of temporal joins, a distribution-free two-sample distance with
an O(n log n) rewrite, L1-regularized regression mechanics, and the
tonality-vs-noise summary of a spectrum):

- ``ts_arch1_fit``            — ARCH(1) coefficients by OLS of squared
  centered changes on their lag (128-bit moments, rescaled).
- ``eval_forecast_error_suite`` — WAPE / MAPE / sMAPE of the
  seasonal-naive (t−7) forecast per event type.
- ``join_asof_interpolated``  — linear interpolation between bracketing
  daily reference points at each (sampled) purchase timestamp.
- ``stat_energy_distance``    — Székely energy distance between
  purchase and view values via sorted prefix identities (no pair join).
- ``ml_lasso_soft_threshold`` — two coordinate-descent sweeps with the
  soft-threshold operator on two features.
- ``ts_spectral_flatness``    — Wiener entropy (geometric/arithmetic
  power mean) over the 2..10-day periodogram.

Reference parity: north-star extension — no reference analogue
(the reference has no analytics layer); these are the audit layers a lake-scale engine
adds on the same tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nocouncil_etl_spark.io import load
from nocouncil_etl_spark.operators.quantiles import cumulate
from nocouncil_etl_spark.plans.breadth61 import _pg_trig_rows
from nocouncil_etl_spark.registry import query

ARCH_SHIFT = 1 << 20  # rescale centered changes before squaring
FES_SEASON = 7
ASOF_SAMPLE_MOD = 97
LASSO_LAMBDA = 10_000_000_000_000  # L1 penalty on raw-cents moments


# --------------------------------------------------------------------------
# 1. ARCH(1)
# --------------------------------------------------------------------------


@query(
    "ts_arch1_fit",
    oracle=f"""
WITH s AS (
  SELECT CAST(ts AS DATE) AS day,
         sum(CAST(round(10000 * value) AS BIGINT)) AS v4
  FROM events WHERE value IS NOT NULL GROUP BY 1
),
r AS (
  SELECT day, v4 - lag(v4) OVER (ORDER BY day) AS ret FROM s
),
m AS (
  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(ret) AS BIGINT) AS sr
  FROM r WHERE ret IS NOT NULL
),
e AS (
  SELECT day,
         (ret * (SELECT n FROM m) - (SELECT sr FROM m)) // {ARCH_SHIFT} AS ec
  FROM r WHERE ret IS NOT NULL
),
sq AS (
  SELECT CAST(ec AS HUGEINT) * ec AS y,
         lag(CAST(ec AS HUGEINT) * ec) OVER (ORDER BY day) AS x
  FROM e
),
mom AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS DOUBLE) AS sx, CAST(sum(y) AS DOUBLE) AS sy,
         CAST(sum(x * y) AS DOUBLE) AS sxy, CAST(sum(x * x) AS DOUBLE) AS sxx
  FROM sq WHERE x IS NOT NULL
)
SELECT n,
       CAST(round(1000 * (n * sxy - sx * sy) / (n * sxx - sx * sx))
            AS BIGINT) AS alpha1_milli,
       CAST(round((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx)
                  / n) AS BIGINT) AS alpha0_scaled,
       CASE WHEN (n * sxy - sx * sy) / (n * sxx - sx * sx) < 1
            THEN 1 ELSE 0 END AS stationary
FROM mom
""",
)
def ts_arch1_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ARCH(1) volatility fit (Engle 1982) on the daily total's changes:
    squared exactly-centered changes regress on their own lag —
    α₁ > 0 means volatility clusters (today's shock raises tomorrow's
    variance), α₁ < 1 keeps the process stationary. Centered changes
    stay integer (ret·n − Σret), are rescaled by 2^20 truncating
    division (both engines' integer `div`/`//`) so the fourth-power
    cross moments fit 128-bit exactly, then Cramer arithmetic runs on
    identical doubles. The autoregressive step ts_ewma_volatility
    (RiskMetrics, fixed λ) doesn't estimate.

    Scale shape: calendar-sized series; one lag window, one 5-moment
    agg, 1-row solve."""
    s = (
        load(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .groupBy(F.col("ts").cast("date").alias("day"))
        .agg(F.sum(F.round(10000 * F.col("value")).cast("long")).alias("v4"))
    )
    w = Window.orderBy("day")
    r = s.select("day", (F.col("v4") - F.lag("v4").over(w)).alias("ret")).filter(
        F.col("ret").isNotNull()
    )
    m = r.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("ret").cast("long").alias("sr"),
    )
    e = r.crossJoin(F.broadcast(m)).select(
        "day",
        F.expr(f"(ret * n - sr) div {ARCH_SHIFT}").alias("ec"),
    )
    dec = "decimal(38,0)"
    sq = e.select(
        "day", (F.col("ec").cast(dec) * F.col("ec")).alias("y")
    ).select("y", F.lag("y").over(Window.orderBy("day")).alias("x"))
    mom = sq.filter(F.col("x").isNotNull()).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(
            (F.col("x") * F.col("y")).cast("decimal(38,0)")
        ).cast("double").alias("sxy"),
        F.sum(
            (F.col("x") * F.col("x")).cast("decimal(38,0)")
        ).cast("double").alias("sxx"),
    )
    n = F.col("n")
    slope = (n * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        n * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return mom.select(
        "n",
        F.round(1000 * slope).cast("long").alias("alpha1_milli"),
        F.round((F.col("sy") - slope * F.col("sx")) / n)
        .cast("long")
        .alias("alpha0_scaled"),
        F.when(slope < 1, 1).otherwise(0).alias("stationary"),
    )


# --------------------------------------------------------------------------
# 2. Forecast error suite
# --------------------------------------------------------------------------


@query(
    "eval_forecast_error_suite",
    oracle=f"""
WITH s AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         sum(CAST(round(10000 * value) AS BIGINT)) AS v4
  FROM events WHERE value IS NOT NULL GROUP BY 1, 2
),
fc AS (
  SELECT event_type, v4 AS y, lag(v4, {FES_SEASON}) OVER w AS f
  FROM s WINDOW w AS (PARTITION BY event_type ORDER BY day)
),
err AS (
  SELECT event_type, abs(y - f) AS ae, abs(y) AS ay,
         CAST(round(1000000.0 * abs(y - f) / abs(y)) AS BIGINT) AS ape_micro,
         CAST(round(1000000.0 * 2 * abs(y - f) / (abs(y) + abs(f)))
              AS BIGINT) AS sape_micro
  FROM fc WHERE f IS NOT NULL AND y <> 0
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(round(1000.0 * sum(ae) / sum(ay)) AS BIGINT) AS wape_milli,
       CAST(round(CAST(sum(ape_micro) AS DOUBLE) / count(*) / 1000)
            AS BIGINT) AS mape_milli,
       CAST(round(CAST(sum(sape_micro) AS DOUBLE) / count(*) / 1000)
            AS BIGINT) AS smape_milli
FROM err GROUP BY event_type
""",
)
def eval_forecast_error_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The practical forecast-error dashboard against the seasonal-naive
    (t−{FES_SEASON}) forecast, per event type: WAPE (volume-weighted —
    the planner's number), MAPE (per-day mean of |e|/|y| — the familiar
    but small-denominator-fragile one), and sMAPE (symmetric, bounded).
    Per-day ratios quantize to micro before the means, WAPE stays one
    exact integer ratio — three metrics, one window pass, directly
    comparable (eval_forecast_mase adds the scaled variant).

    Scale shape: one per-type lag window on the daily grid, one hash
    agg."""
    s = (
        load(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .groupBy("event_type", F.col("ts").cast("date").alias("day"))
        .agg(F.sum(F.round(10000 * F.col("value")).cast("long")).alias("v4"))
    )
    w = Window.partitionBy("event_type").orderBy("day")
    fc = s.select(
        "event_type",
        F.col("v4").alias("y"),
        F.lag("v4", FES_SEASON).over(w).alias("f"),
    ).filter(F.col("f").isNotNull() & (F.col("y") != 0))
    ae = F.abs(F.col("y") - F.col("f"))
    err = fc.select(
        "event_type",
        ae.alias("ae"),
        F.abs("y").alias("ay"),
        F.round(1_000_000.0 * ae / F.abs("y")).cast("long").alias("ape_micro"),
        F.round(1_000_000.0 * 2 * ae / (F.abs("y") + F.abs("f")))
        .cast("long")
        .alias("sape_micro"),
    )
    return err.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.round(1000.0 * F.sum("ae") / F.sum("ay"))
        .cast("long")
        .alias("wape_milli"),
        F.round(F.sum("ape_micro").cast("double") / F.count(F.lit(1)) / 1000)
        .cast("long")
        .alias("mape_milli"),
        F.round(F.sum("sape_micro").cast("double") / F.count(F.lit(1)) / 1000)
        .cast("long")
        .alias("smape_milli"),
    )


# --------------------------------------------------------------------------
# 3. Interpolated as-of join
# --------------------------------------------------------------------------


@query(
    "join_asof_interpolated",
    oracle=f"""
WITH ref AS (
  SELECT CAST(ts AS DATE) AS day,
         sum(CAST(round(10000 * value) AS BIGINT)) AS v4
  FROM events WHERE value IS NOT NULL GROUP BY 1
),
ref2 AS (
  SELECT day, v4, lead(v4) OVER (ORDER BY day) AS v_next,
         lead(day) OVER (ORDER BY day) AS d_next
  FROM ref
),
q AS (
  SELECT event_id, ts, CAST(ts AS DATE) AS day,
         epoch_us(ts) - epoch_us(CAST(CAST(ts AS DATE) AS TIMESTAMP)) AS us
  FROM events
  WHERE event_type = 'purchase' AND event_id % {ASOF_SAMPLE_MOD} = 0
),
j AS (
  SELECT q.event_id, q.day, q.us, r.v4, r.v_next, r.d_next
  FROM q JOIN ref2 r ON r.day = q.day
)
SELECT event_id, CAST(day AS VARCHAR) AS day,
       CAST(CASE WHEN v_next IS NOT NULL AND d_next = day + 1
            THEN CAST(round(v4 + (v_next - v4)
                            * (us / 86400000000.0)) AS BIGINT)
            ELSE v4 END AS BIGINT) AS interp_v4
FROM j
""",
)
def join_asof_interpolated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolating as-of join: each sampled purchase timestamp reads
    the daily reference series LINEARLY INTERPOLATED between its
    bracketing midnights (time-of-day fraction from exact epoch
    microseconds), falling back to the last value at the series edge
    or across gaps — the step beyond join_asof's
    last-observation-carried-forward that rate/price curves need. The
    bracket lookup is an equi-join on the DATE key (no range join, no
    window over the fact side): the lead() pre-pass turns interpolation
    into a broadcastable dimension.

    Scale shape: reference series is calendar-sized with one lead
    window; queries equi-join on day; interpolation is narrow
    arithmetic."""
    ev = load(spark, sf_dir, "events")
    ref = (
        ev.filter(F.col("value").isNotNull())
        .groupBy(F.col("ts").cast("date").alias("day"))
        .agg(F.sum(F.round(10000 * F.col("value")).cast("long")).alias("v4"))
    )
    w = Window.orderBy("day")
    ref2 = ref.select(
        "day",
        "v4",
        F.lead("v4").over(w).alias("v_next"),
        F.lead("day").over(w).alias("d_next"),
    )
    q = ev.filter(
        (F.col("event_type") == "purchase")
        & (F.col("event_id") % ASOF_SAMPLE_MOD == 0)
    ).select(
        "event_id",
        F.col("ts").cast("date").alias("day"),
        (
            F.unix_micros("ts")
            - F.unix_micros(F.col("ts").cast("date").cast("timestamp"))
        ).alias("us"),
    )
    j = q.join(F.broadcast(ref2), "day")
    lerp = F.round(
        F.col("v4")
        + (F.col("v_next") - F.col("v4")) * (F.col("us") / 86_400_000_000.0)
    ).cast("long")
    return j.select(
        "event_id",
        F.col("day").cast("string").alias("day"),
        F.when(
            F.col("v_next").isNotNull()
            & (F.col("d_next") == F.date_add("day", 1)),
            lerp,
        )
        .otherwise(F.col("v4"))
        .alias("interp_v4"),
    )


# --------------------------------------------------------------------------
# 4. Energy distance
# --------------------------------------------------------------------------


@query(
    "stat_energy_distance",
    oracle="""
WITH s AS (
  SELECT event_id, CAST(round(100 * value) AS BIGINT) AS x,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_a
  FROM events
  WHERE value IS NOT NULL AND event_type IN ('purchase', 'view')
),
o AS (
  SELECT x, is_a,
         count(*) FILTER (is_a = 1) OVER wl AS a_lt,
         sum(x) FILTER (is_a = 1) OVER wl AS a_sum_lt,
         count(*) FILTER (is_a = 0) OVER wl AS b_lt,
         sum(x) FILTER (is_a = 0) OVER wl AS b_sum_lt,
         row_number() OVER (PARTITION BY is_a ORDER BY x, event_id) AS rkw,
         count(*) OVER (PARTITION BY is_a) AS nw
  FROM s
  WINDOW wl AS (ORDER BY x, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
),
sums AS (
  SELECT
    CAST(sum(CASE WHEN is_a = 1
                  THEN x * coalesce(b_lt, 0) - coalesce(b_sum_lt, 0)
                  ELSE x * coalesce(a_lt, 0) - coalesce(a_sum_lt, 0) END)
         AS BIGINT) AS cross_sum,
    CAST(sum(CASE WHEN is_a = 1 THEN (2 * rkw - nw - 1) * x ELSE 0 END)
         AS BIGINT) AS within_a,
    CAST(sum(CASE WHEN is_a = 0 THEN (2 * rkw - nw - 1) * x ELSE 0 END)
         AS BIGINT) AS within_b,
    CAST(sum(is_a) AS BIGINT) AS n1,
    CAST(sum(1 - is_a) AS BIGINT) AS n2
  FROM o
)
SELECT n1, n2,
       CAST(round(1000.0 * (2.0 * cross_sum / (n1 * CAST(n2 AS DOUBLE))
                  - 2.0 * within_a / (n1 * CAST(n1 AS DOUBLE))
                  - 2.0 * within_b / (n2 * CAST(n2 AS DOUBLE))))
            AS BIGINT) AS energy_milli,
       CAST(round(1000.0 * (CAST(n1 AS DOUBLE) * n2 / (n1 + n2))
                  * (2.0 * cross_sum / (n1 * CAST(n2 AS DOUBLE))
                     - 2.0 * within_a / (n1 * CAST(n1 AS DOUBLE))
                     - 2.0 * within_b / (n2 * CAST(n2 AS DOUBLE))) / 100.0)
            AS BIGINT) AS t_stat_centi
FROM sums
""",
)
def stat_energy_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Székely energy distance between purchase and view values:
    E = 2·E|X−Y| − E|X−X'| − E|Y−Y'| — zero iff the distributions are
    EQUAL, sensitive to ANY difference (location, scale, shape), unlike
    the rank tests' specific alternatives. The O(n²) pairwise sums are
    rewritten exactly: cross |X−Y| via prefix counts/sums of the OTHER
    group in the pooled (value, id) order (each pair contributes when
    its larger element is visited), within-group via the sorted GMD
    identity Σ(2i−n−1)x — all BIGINT, one division at the end; the test
    statistic scales by n1·n2/(n1+n2).

    Scale shape (r7): every prefix quantity (other-group counts/sums
    strictly below, per-group ranks) decomposes into a value-level part
    (Fenwick prefix sums over the distinct-value histogram — no global
    sort) plus a tie-block part (value-partitioned windows by event id) —
    hash-partitioned everywhere; one rollup. O(n²) semantics at
    hash-aggregate cost — the round-6 whitelist entry for this query is
    gone."""
    s = (
        load(spark, sf_dir, "events")
        .filter(
            F.col("value").isNotNull()
            & F.col("event_type").isin("purchase", "view")
        )
        .select(
            "event_id",
            F.round(100 * F.col("value")).cast("long").alias("x"),
            F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias(
                "is_a"
            ),
        )
    )
    a_flag = F.col("is_a") == 1
    byv = s.groupBy("x").agg(
        F.count(F.lit(1)).cast("long").alias("c"),
        F.sum("is_a").cast("long").alias("c_a"),
        F.sum(F.when(a_flag, F.col("x")).otherwise(0)).cast("long").alias("sx_a"),
        F.sum(F.when(~a_flag, F.col("x")).otherwise(0)).cast("long").alias("sx_b"),
    )
    # ONE Fenwick pass carries every prefix quantity: the A/B counts
    # below a value double as the within-group below-ranks
    bel = cumulate(byv, "x", ("c", "c_a", "sx_a", "sx_b")).select(
        "x",
        (F.col("cum_c_a") - F.col("c_a")).alias("va_lt"),
        (F.col("cum_sx_a") - F.col("sx_a")).alias("va_sum"),
        ((F.col("cum_c") - F.col("cum_c_a")) - (F.col("c") - F.col("c_a"))).alias("vb_lt"),
        ((F.col("cum_sx_b")) - F.col("sx_b")).alias("vb_sum"),
    )
    grp_n = s.groupBy("is_a").agg(F.count(F.lit(1)).cast("long").alias("nw"))
    # tie-block prefixes: strictly-preceding same-value rows by event id
    wt = (
        Window.partitionBy("x")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    j_grp = F.row_number().over(
        Window.partitionBy("is_a", "x").orderBy("event_id")
    )
    o = (
        s.join(bel, "x")
        .withColumn("below_a", F.col("va_lt"))
        .withColumn("below_b", F.col("vb_lt"))
        .join(F.broadcast(grp_n), "is_a")
        .select(
            "x",
            "is_a",
            (
                F.col("va_lt")
                + F.coalesce(F.count(F.when(a_flag, 1)).over(wt), F.lit(0))
            ).alias("a_lt"),
            (
                F.col("va_sum")
                + F.coalesce(
                    F.sum(F.when(a_flag, F.col("x"))).over(wt), F.lit(0)
                )
            ).alias("a_sum_lt"),
            (
                F.col("vb_lt")
                + F.coalesce(F.count(F.when(~a_flag, 1)).over(wt), F.lit(0))
            ).alias("b_lt"),
            (
                F.col("vb_sum")
                + F.coalesce(
                    F.sum(F.when(~a_flag, F.col("x"))).over(wt), F.lit(0)
                )
            ).alias("b_sum_lt"),
            (
                F.when(a_flag, F.col("below_a")).otherwise(F.col("below_b"))
                + j_grp
            )
            .cast("long")
            .alias("rkw"),
            "nw",
        )
    )
    cross = F.sum(
        F.when(
            a_flag,
            F.col("x") * F.coalesce("b_lt", F.lit(0))
            - F.coalesce("b_sum_lt", F.lit(0)),
        ).otherwise(
            F.col("x") * F.coalesce("a_lt", F.lit(0))
            - F.coalesce("a_sum_lt", F.lit(0))
        )
    )
    gmd = F.when(
        a_flag, (2 * F.col("rkw") - F.col("nw") - 1) * F.col("x")
    ).otherwise(0)
    gmd_b = F.when(
        ~a_flag, (2 * F.col("rkw") - F.col("nw") - 1) * F.col("x")
    ).otherwise(0)
    sums = o.agg(
        cross.cast("long").alias("cross_sum"),
        F.sum(gmd).cast("long").alias("within_a"),
        F.sum(gmd_b).cast("long").alias("within_b"),
        F.sum("is_a").cast("long").alias("n1"),
        F.sum(1 - F.col("is_a")).cast("long").alias("n2"),
    )
    n1, n2 = F.col("n1"), F.col("n2")
    e = (
        2.0 * F.col("cross_sum") / (n1 * n2.cast("double"))
        - 2.0 * F.col("within_a") / (n1 * n1.cast("double"))
        - 2.0 * F.col("within_b") / (n2 * n2.cast("double"))
    )
    return sums.select(
        "n1",
        "n2",
        F.round(1000.0 * e).cast("long").alias("energy_milli"),
        F.round(1000.0 * (n1.cast("double") * n2 / (n1 + n2)) * e / 100.0)
        .cast("long")
        .alias("t_stat_centi"),
    )


# --------------------------------------------------------------------------
# 5. Lasso soft-threshold
# --------------------------------------------------------------------------


@query(
    "ml_lasso_soft_threshold",
    oracle=f"""
WITH d AS (
  SELECT CAST(round(100 * c.c_acctbal) AS BIGINT) AS x1,
         coalesce(o.cnt, 0) AS x2, coalesce(o.rev, 0) AS y
  FROM customer c
  LEFT JOIN (SELECT o_custkey, CAST(count(*) AS BIGINT) AS cnt,
                    CAST(sum(CAST(round(100 * o_totalprice) AS BIGINT))
                         AS BIGINT) AS rev
             FROM orders GROUP BY 1) o ON o.o_custkey = c.c_custkey
),
mom AS (
  SELECT CAST(sum(CAST(x1 AS HUGEINT) * x1) AS DOUBLE) AS s11,
         CAST(sum(CAST(x2 AS HUGEINT) * x2) AS DOUBLE) AS s22,
         CAST(sum(CAST(x1 AS HUGEINT) * x2) AS DOUBLE) AS s12,
         CAST(sum(CAST(x1 AS HUGEINT) * y) AS DOUBLE) AS s1y,
         CAST(sum(CAST(x2 AS HUGEINT) * y) AS DOUBLE) AS s2y
  FROM d
),
sw1 AS (
  SELECT s11, s22, s12, s1y, s2y,
         CASE WHEN s1y > {LASSO_LAMBDA} THEN (s1y - {LASSO_LAMBDA}) / s11
              WHEN s1y < -{LASSO_LAMBDA} THEN (s1y + {LASSO_LAMBDA}) / s11
              ELSE 0.0 END AS b1
  FROM mom
),
sw2 AS (
  SELECT s11, s22, s12, s1y, s2y, b1,
         CASE WHEN s2y - b1 * s12 > {LASSO_LAMBDA}
              THEN (s2y - b1 * s12 - {LASSO_LAMBDA}) / s22
              WHEN s2y - b1 * s12 < -{LASSO_LAMBDA}
              THEN (s2y - b1 * s12 + {LASSO_LAMBDA}) / s22
              ELSE 0.0 END AS b2
  FROM sw1
),
sw3 AS (
  SELECT b2,
         CASE WHEN s1y - b2 * s12 > {LASSO_LAMBDA}
              THEN (s1y - b2 * s12 - {LASSO_LAMBDA}) / s11
              WHEN s1y - b2 * s12 < -{LASSO_LAMBDA}
              THEN (s1y - b2 * s12 + {LASSO_LAMBDA}) / s11
              ELSE 0.0 END AS b1
  FROM sw2
)
SELECT CAST(round(1000000 * b1) AS BIGINT) AS b1_micro,
       CAST(round(1000000 * b2) AS BIGINT) AS b2_micro,
       CAST((CASE WHEN b1 <> 0 THEN 1 ELSE 0 END)
            + (CASE WHEN b2 <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_nonzero
FROM sw3
""",
)
def ml_lasso_soft_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lasso coordinate descent, two sweeps on two features (account
    balance, order count → customer revenue, uncentered): each
    coordinate update is the SOFT-THRESHOLD operator
    S(ρ_j, λ)/Σx_j² with ρ_j the partial residual correlation — the L1
    mechanics that ZERO OUT weak coordinates, which ridge
    (ml_ridge_closed_form) never does. Moments are exact 128-bit
    integers cast once to doubles; every branch decision (inside vs
    outside the λ tube) is therefore identical on both engines.

    Scale shape: ONE 5-moment aggregate over the joined scan; sweeps
    are scalar arithmetic — the distributed-lasso pattern where data
    passes = moment passes, not iterations."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    per = orders.groupBy("o_custkey").agg(
        F.count(F.lit(1)).cast("long").alias("cnt"),
        F.sum(F.round(100 * F.col("o_totalprice")).cast("long"))
        .cast("long")
        .alias("rev"),
    )
    d = cust.join(per, cust["c_custkey"] == per["o_custkey"], "left").select(
        F.round(100 * F.col("c_acctbal")).cast("long").alias("x1"),
        F.coalesce("cnt", F.lit(0)).alias("x2"),
        F.coalesce("rev", F.lit(0)).alias("y"),
    )
    dec = "decimal(38,0)"
    mom = d.agg(
        F.sum((F.col("x1").cast(dec) * F.col("x1"))).cast("double").alias("s11"),
        F.sum((F.col("x2").cast(dec) * F.col("x2"))).cast("double").alias("s22"),
        F.sum((F.col("x1").cast(dec) * F.col("x2"))).cast("double").alias("s12"),
        F.sum((F.col("x1").cast(dec) * F.col("y"))).cast("double").alias("s1y"),
        F.sum((F.col("x2").cast(dec) * F.col("y"))).cast("double").alias("s2y"),
    )
    lam = float(LASSO_LAMBDA)

    def soft(rho, denom):
        return (
            F.when(rho > lam, (rho - lam) / denom)
            .when(rho < -lam, (rho + lam) / denom)
            .otherwise(F.lit(0.0))
        )

    sw1 = mom.withColumn("b1", soft(F.col("s1y"), F.col("s11")))
    sw2 = sw1.withColumn(
        "b2", soft(F.col("s2y") - F.col("b1") * F.col("s12"), F.col("s22"))
    )
    sw3 = sw2.withColumn(
        "b1f", soft(F.col("s1y") - F.col("b2") * F.col("s12"), F.col("s11"))
    )
    return sw3.select(
        F.round(1_000_000 * F.col("b1f")).cast("long").alias("b1_micro"),
        F.round(1_000_000 * F.col("b2")).cast("long").alias("b2_micro"),
        (
            F.when(F.col("b1f") != 0, 1).otherwise(0)
            + F.when(F.col("b2") != 0, 1).otherwise(0)
        )
        .cast("long")
        .alias("n_nonzero"),
    )


# --------------------------------------------------------------------------
# 6. Spectral flatness
# --------------------------------------------------------------------------


def _sf_oracle() -> str:
    vals = ", ".join(
        f"({p}, {r}, {c!r}, {s!r})" for p, r, c, s in _pg_trig_rows()
    )
    return f"""
WITH cnt AS (
  SELECT CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS day,
         CAST(count(*) AS BIGINT) AS y
  FROM events GROUP BY 1
),
m AS (SELECT count(*) AS n, sum(y) AS s FROM cnt),
ctr AS (
  SELECT day, y * (SELECT n FROM m) - (SELECT s FROM m) AS x FROM cnt
),
trig(p, r, c, s) AS (VALUES {vals}),
terms AS (
  SELECT t.p,
         CAST(round(ctr.x * t.c) AS BIGINT) AS xc,
         CAST(round(ctr.x * t.s) AS BIGINT) AS xs
  FROM ctr JOIN trig t ON t.r = ctr.day % t.p
),
power AS (
  SELECT p,
         CAST(sum(xc) AS HUGEINT) * CAST(sum(xc) AS HUGEINT)
         + CAST(sum(xs) AS HUGEINT) * CAST(sum(xs) AS HUGEINT) AS pw
  FROM terms GROUP BY p
),
lg AS (
  SELECT p, pw,
         CAST(round(1000000 * ln(CAST(pw AS DOUBLE))) AS BIGINT) AS lnp
  FROM power WHERE pw > 0
)
SELECT CAST(count(*) AS BIGINT) AS n_periods,
       CAST(round(1000 * exp(CAST(sum(lnp) AS DOUBLE) / count(*) / 1000000)
                  / (CAST(sum(CAST(pw AS DOUBLE)) AS DOUBLE) / count(*)))
            AS BIGINT) AS flatness_milli,
       (SELECT p FROM lg ORDER BY pw DESC, p LIMIT 1) AS peak_period
FROM lg
"""


@query("ts_spectral_flatness", oracle=_sf_oracle())
def ts_spectral_flatness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wiener spectral flatness of the daily event count over the
    2..10-day periodogram (ts_periodogram_topk's literal trig tables):
    geometric mean power / arithmetic mean power — near 1 means white
    noise (flat spectrum), near 0 means energy concentrates in a few
    cadences (the peak period is reported). Powers are exact 128-bit
    integers; their logs quantize to micro-nats before the geometric
    mean, so the ratio is engine-identical. The single-number summary
    ts_spectral_entropy approximates via bin probabilities, computed
    here directly on the power spectrum.

    Scale shape: identical to the periodogram — broadcast trig join,
    per-period hash agg, scalar arithmetic."""
    cnt = (
        load(spark, sf_dir, "events")
        .groupBy(
            F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01")).alias(
                "day"
            )
        )
        .agg(F.count(F.lit(1)).cast("long").alias("y"))
    )
    m = cnt.agg(F.count(F.lit(1)).alias("n"), F.sum("y").alias("s"))
    ctr = cnt.crossJoin(F.broadcast(m)).select(
        F.col("day").cast("long").alias("day"),
        (F.col("y") * F.col("n") - F.col("s")).alias("x"),
    )
    trig = spark.createDataFrame(
        _pg_trig_rows(), "p long, r long, c double, s double"
    )
    terms = ctr.join(
        F.broadcast(trig), F.col("r") == F.col("day") % F.col("p")
    ).select(
        "p",
        F.round(F.col("x") * F.col("c")).cast("long").alias("xc"),
        F.round(F.col("x") * F.col("s")).cast("long").alias("xs"),
    )
    dec = "decimal(38,0)"
    power = terms.groupBy("p").agg(
        (
            F.sum("xc").cast(dec) * F.sum("xc").cast(dec)
            + F.sum("xs").cast(dec) * F.sum("xs").cast(dec)
        ).alias("pw")
    )
    lg = power.filter(F.col("pw") > 0).select(
        "p",
        "pw",
        F.round(1_000_000 * F.log(F.col("pw").cast("double")))
        .cast("long")
        .alias("lnp"),
    )
    lg.persist()
    peak = (
        lg.orderBy(F.desc("pw"), "p")
        .limit(1)
        .select(F.col("p").alias("peak_period"))
    )
    agg = lg.agg(
        F.count(F.lit(1)).cast("long").alias("n_periods"),
        F.sum("lnp").cast("double").alias("slnp"),
        F.sum(F.col("pw").cast("double")).alias("spw"),
    )
    return agg.crossJoin(F.broadcast(peak)).select(
        "n_periods",
        F.round(
            1000
            * F.exp(F.col("slnp") / F.col("n_periods") / 1_000_000)
            / (F.col("spw") / F.col("n_periods"))
        )
        .cast("long")
        .alias("flatness_milli"),
        "peak_period",
    )
