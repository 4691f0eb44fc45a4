"""Breadth batch 48 (round 6): EWMA volatility, price elasticity,
Gaussian naive Bayes, Ljung-Box, mix-shift decomposition, partition
evolution.

Six operators (reference scope: volatility-aware feed monitoring,
econ-style demand curves, a numeric-feature classifier baseline,
residual whiteness checks, "did the rate move or did the mix move"
reviews, and reading across a partition-scheme migration):

- ``ts_ewma_volatility``   — RiskMetrics-style EWMA variance of daily
  changes, exact 15/16 fixed-point recurrence.
- ``agg_price_elasticity`` — log-log OLS demand elasticity per brand
  from weekly (price, quantity) observations.
- ``ml_gaussian_nb``       — Gaussian naive Bayes purchase classifier
  on numeric features with a full confusion count.
- ``stat_ljung_box``       — portmanteau whiteness test on each daily
  series' first three autocorrelations.
- ``agg_mix_shift_decomposition`` — Δ overall mean = rate effect +
  mix effect per segment (the Kitagawa/Oaxaca two-factor split).
- ``io_partition_evolution`` — one logical table served from two
  physical partition layouts, both pruned.
"""

from __future__ import annotations

import os
import tempfile

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nocouncil_etl_spark.io import load
from nocouncil_etl_spark.registry import query

# --------------------------------------------------------------------------
# 1. EWMA volatility (RiskMetrics lambda = 15/16)
# --------------------------------------------------------------------------


@query(
    "ts_ewma_volatility",
    oracle="""
WITH RECURSIVE daily AS (
  SELECT event_type, CAST(ts AS DATE) AS d,
         CAST(sum(CAST(round(value) AS BIGINT)) AS BIGINT) AS y
  FROM events GROUP BY 1, 2
),
idx0 AS (
  SELECT event_type,
         CAST(row_number() OVER (PARTITION BY event_type ORDER BY d)
              AS BIGINT) AS i,
         y,
         y - lag(y) OVER (PARTITION BY event_type ORDER BY d) AS r
  FROM daily
),
idx AS (SELECT event_type, i - 1 AS i, r FROM idx0 WHERE r IS NOT NULL),
meta AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n FROM idx GROUP BY 1
),
ew AS (
  SELECT event_type, i, CAST(r * r AS BIGINT) AS v,
         CAST(r * r AS BIGINT) AS vmax, i AS imax
  FROM idx WHERE i = 1
  UNION ALL
  SELECT x.event_type, x.i,
         CAST((15 * e.v + x.r * x.r) // 16 AS BIGINT),
         CAST(CASE WHEN (15 * e.v + x.r * x.r) // 16 > e.vmax
              THEN (15 * e.v + x.r * x.r) // 16 ELSE e.vmax END AS BIGINT),
         CAST(CASE WHEN (15 * e.v + x.r * x.r) // 16 > e.vmax
              THEN x.i ELSE e.imax END AS BIGINT)
  FROM ew e JOIN idx x ON x.event_type = e.event_type AND x.i = e.i + 1
)
SELECT e.event_type, m.n AS n_changes, e.v AS ewma_var_final,
       e.vmax AS ewma_var_max, e.imax AS t_of_max
FROM ew e JOIN meta m ON m.event_type = e.event_type AND e.i = m.n
""",
)
def ts_ewma_volatility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EWMA variance of day-over-day revenue changes — the RiskMetrics
    volatility recursion v_t = λ·v_{t−1} + (1−λ)·r_t² at λ = 15/16,
    run entirely in integers as v_t = (15·v + r²) div 16 so Spark's
    per-key Arrow kernel and the recursive-CTE oracle agree exactly.
    Tracks the final state AND the peak (with its time index) — the
    volatility spike is the alert a feed monitor pages on, and EWMA's
    O(1) state is why it is THE streaming volatility estimator
    (contrast ``ts_ewma_fixedpoint``'s mean smoothing; this squares the
    innovations).

    Scale shape: daily collapse map-side; one Arrow batch per key with
    two BIGINTs of state per step — directly portable to
    applyInPandasWithState."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy("event_type", F.to_date("ts").alias("d")).agg(
        F.sum(F.round("value").cast("long")).cast("long").alias("y")
    )
    w = Window.partitionBy("event_type").orderBy("d")
    idx = (
        daily.withColumn("r", F.col("y") - F.lag("y").over(w))
        .filter(F.col("r").isNotNull())
        .select("event_type", "d", "r")
    )
    out_schema = (
        "event_type string, n_changes long, ewma_var_final long,"
        " ewma_var_max long, t_of_max long"
    )

    def ewma(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("d")
        rs = [int(x) for x in pdf["r"]]
        v = rs[0] * rs[0]
        vmax, imax = v, 1
        for i, r in enumerate(rs[1:], start=2):
            v = (15 * v + r * r) // 16
            if v > vmax:
                vmax, imax = v, i
        return pd.DataFrame(
            {
                "event_type": [pdf["event_type"].iloc[0]],
                "n_changes": [len(rs)],
                "ewma_var_final": [v],
                "ewma_var_max": [vmax],
                "t_of_max": [imax],
            }
        )

    return idx.groupBy("event_type").applyInPandas(ewma, out_schema)


# --------------------------------------------------------------------------
# 2. Price elasticity of demand
# --------------------------------------------------------------------------


@query(
    "agg_price_elasticity",
    oracle="""
WITH li AS (
  SELECT p.p_brand AS brand, CAST(l.l_shipdate AS DATE) AS d,
         CAST(round(l.l_quantity) AS BIGINT) AS qty,
         CAST(round(l.l_extendedprice * 100) AS BIGINT) AS cents
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
),
d0 AS (SELECT min(d) AS start FROM li),
weekly AS (
  SELECT brand, (d - d0.start) // 7 AS wk,
         CAST(sum(qty) AS BIGINT) AS q, CAST(sum(cents) AS BIGINT) AS rev
  FROM li, d0 GROUP BY 1, 2
),
obs AS (
  SELECT brand,
         CAST(round(10000 * ln(CAST((1000 * rev) // q AS DOUBLE)))
              AS BIGINT) AS x,
         CAST(round(10000 * ln(CAST(q AS DOUBLE))) AS BIGINT) AS yv
  FROM weekly WHERE q > 0
),
ols AS (
  SELECT brand, CAST(count(*) AS BIGINT) AS m,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(yv) AS BIGINT) AS sy,
         CAST(sum(x * yv) AS BIGINT) AS sxy,
         CAST(sum(x * x) AS BIGINT) AS sxx
  FROM obs GROUP BY 1
)
SELECT brand, m AS n_weeks,
       CAST((m * sxy - sx * sy)
            // greatest(abs((m * sxx - sx * sx) // 1000000), 1)
            * CASE WHEN (m * sxx - sx * sx) < 0 THEN -1 ELSE 1 END
            AS BIGINT) AS elasticity_1e6
FROM ols WHERE m >= 3 AND (m * sxx - sx * sx) <> 0
""",
)
def agg_price_elasticity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Own-price elasticity of demand per brand: OLS slope of ln(weekly
    quantity) on ln(weekly average unit price) — the log-log regression
    whose slope IS the elasticity (−1 = revenue-neutral pricing; more
    negative = elastic). Both logs quantize once to micro from exact
    integer rationals (unit price in milli-cents via one floor
    division; 1e4 log units keep the ~350-week moment sums inside
    int64), the OLS moments are exact BIGINTs over the bounded
    weekly observation count, and the slope divides numerator by the
    magnitude of the div-scaled denominator with an explicit sign so
    the truncating division can't flip direction. Brands with fewer
    than 3 weeks or zero price variance are excluded.

    Scale shape: one broadcast dim join + one (brand, week) hash-agg;
    the regression runs on |brands|×weeks rows."""
    li = load(spark, sf_dir, "lineitem")
    pt = load(spark, sf_dir, "part")
    j = li.join(F.broadcast(pt), li.l_partkey == pt.p_partkey).select(
        F.col("p_brand").alias("brand"),
        F.to_date("l_shipdate").alias("d"),
        F.round("l_quantity").cast("long").alias("qty"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
    )
    d0 = j.agg(F.min("d").alias("start"))
    weekly = (
        j.crossJoin(F.broadcast(d0))
        .groupBy("brand", F.expr("datediff(d, start) div 7").alias("wk"))
        .agg(
            F.sum("qty").cast("long").alias("q"),
            F.sum("cents").cast("long").alias("rev"),
        )
    )
    obs = weekly.filter(F.col("q") > 0).select(
        "brand",
        F.round(10000 * F.log(F.expr("CAST((1000 * rev) div q AS DOUBLE)")))
        .cast("long")
        .alias("x"),
        F.round(10000 * F.log(F.col("q").cast("double")))
        .cast("long")
        .alias("yv"),
    )
    ols = obs.groupBy("brand").agg(
        F.count("*").cast("long").alias("m"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("yv").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("yv")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
    )
    return ols.filter(
        (F.col("m") >= 3) & (F.expr("m * sxx - sx * sx") != 0)
    ).select(
        "brand",
        F.col("m").alias("n_weeks"),
        F.expr(
            "CAST((m * sxy - sx * sy)"
            " div greatest(abs((m * sxx - sx * sx) div 1000000), 1)"
            " * CASE WHEN (m * sxx - sx * sx) < 0 THEN -1 ELSE 1 END"
            " AS BIGINT)"
        ).alias("elasticity_1e6"),
    )


# --------------------------------------------------------------------------
# 3. Gaussian naive Bayes
# --------------------------------------------------------------------------


@query(
    "ml_gaussian_nb",
    oracle="""
WITH data AS MATERIALIZED (
  SELECT CAST(round(value) AS BIGINT) AS v, CAST(hour(ts) AS BIGINT) AS hr,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
  FROM events
),
cls AS (
  SELECT y, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(v) AS BIGINT) AS sv, CAST(sum(v * v) AS BIGINT) AS svv,
         CAST(sum(hr) AS BIGINT) AS sh, CAST(sum(hr * hr) AS BIGINT) AS shh
  FROM data GROUP BY y
),
tot AS (SELECT CAST(sum(n) AS BIGINT) AS nn FROM cls),
mom AS (
  SELECT y, n,
         CAST(sv AS DOUBLE) / n AS mv,
         (CAST(n AS DOUBLE) * svv - CAST(sv AS DOUBLE) * sv)
           / (CAST(n AS DOUBLE) * n) + 0.5 AS vv,
         CAST(sh AS DOUBLE) / n AS mh,
         (CAST(n AS DOUBLE) * shh - CAST(sh AS DOUBLE) * sh)
           / (CAST(n AS DOUBLE) * n) + 0.5 AS vh,
         ln(CAST(n AS DOUBLE) / (SELECT nn FROM tot)) AS prior
  FROM cls
),
scored AS (
  SELECT d.y,
         CASE WHEN
           (SELECT prior - 0.5 * ln(vv) - (d.v - mv) * (d.v - mv) / (2 * vv)
                   - 0.5 * ln(vh) - (d.hr - mh) * (d.hr - mh) / (2 * vh)
            FROM mom WHERE y = 1)
           >
           (SELECT prior - 0.5 * ln(vv) - (d.v - mv) * (d.v - mv) / (2 * vv)
                   - 0.5 * ln(vh) - (d.hr - mh) * (d.hr - mh) / (2 * vh)
            FROM mom WHERE y = 0)
         THEN 1 ELSE 0 END AS pred
  FROM data d
)
SELECT CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CASE WHEN y = 1 AND pred = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS tp,
       CAST(sum(CASE WHEN y = 0 AND pred = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS fp,
       CAST(sum(CASE WHEN y = 1 AND pred = 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS fn,
       CAST(sum(CASE WHEN y = 0 AND pred = 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS tn,
       CAST((sum(CASE WHEN y = pred THEN 1 ELSE 0 END) * 1000000)
            // count(*) AS BIGINT) AS acc_ppm
FROM scored
""",
)
def ml_gaussian_nb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaussian naive Bayes purchase classifier on two NUMERIC features
    (value, hour) — the continuous-feature complement of
    ``model_naive_bayes_lang`` (multinomial over text): per-class
    feature means and population variances come from exact integer
    moment sums (+0.5 variance smoothing so a degenerate feature can't
    divide by zero), and each row is scored with the Gaussian
    log-density under both classes. Train and score are the same two
    scans. Every emitted number is an integer COUNT (full confusion
    matrix + accuracy), so doubles only ever live inside the per-row
    argmax — computed identically from identical inputs on both
    engines.

    Scale shape: training is one hash-agg to 2 class rows; scoring
    joins those 2 broadcast rows — one pass, no shuffle of the data."""
    ev = load(spark, sf_dir, "events")
    data = ev.select(
        F.round("value").cast("long").alias("v"),
        F.hour("ts").cast("long").alias("hr"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
    )
    cls = data.groupBy("y").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("v").cast("long").alias("sv"),
        F.sum(F.col("v") * F.col("v")).cast("long").alias("svv"),
        F.sum("hr").cast("long").alias("sh"),
        F.sum(F.col("hr") * F.col("hr")).cast("long").alias("shh"),
    )
    tot = cls.agg(F.sum("n").cast("long").alias("nn"))
    mom = cls.crossJoin(F.broadcast(tot)).select(
        "y",
        (F.col("sv").cast("double") / F.col("n")).alias("mv"),
        (
            (F.col("n").cast("double") * F.col("svv")
             - F.col("sv").cast("double") * F.col("sv"))
            / (F.col("n").cast("double") * F.col("n"))
            + 0.5
        ).alias("vv"),
        (F.col("sh").cast("double") / F.col("n")).alias("mh"),
        (
            (F.col("n").cast("double") * F.col("shh")
             - F.col("sh").cast("double") * F.col("sh"))
            / (F.col("n").cast("double") * F.col("n"))
            + 0.5
        ).alias("vh"),
        F.log(F.col("n").cast("double") / F.col("nn")).alias("prior"),
    )
    m1 = mom.filter(F.col("y") == 1).select(
        F.col("mv").alias("mv1"), F.col("vv").alias("vv1"),
        F.col("mh").alias("mh1"), F.col("vh").alias("vh1"),
        F.col("prior").alias("pr1"),
    )
    m0 = mom.filter(F.col("y") == 0).select(
        F.col("mv").alias("mv0"), F.col("vv").alias("vv0"),
        F.col("mh").alias("mh0"), F.col("vh").alias("vh0"),
        F.col("prior").alias("pr0"),
    )
    scored = (
        data.crossJoin(F.broadcast(m1))
        .crossJoin(F.broadcast(m0))
        .select(
            "y",
            F.when(
                F.expr(
                    "pr1 - 0.5 * ln(vv1) - (v - mv1) * (v - mv1) / (2 * vv1)"
                    " - 0.5 * ln(vh1) - (hr - mh1) * (hr - mh1) / (2 * vh1)"
                    " > pr0 - 0.5 * ln(vv0) - (v - mv0) * (v - mv0) / (2 * vv0)"
                    " - 0.5 * ln(vh0) - (hr - mh0) * (hr - mh0) / (2 * vh0)"
                ),
                1,
            )
            .otherwise(0)
            .alias("pred"),
        )
    )
    return scored.agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.when((F.col("y") == 1) & (F.col("pred") == 1), 1).otherwise(0))
        .cast("long")
        .alias("tp"),
        F.sum(F.when((F.col("y") == 0) & (F.col("pred") == 1), 1).otherwise(0))
        .cast("long")
        .alias("fp"),
        F.sum(F.when((F.col("y") == 1) & (F.col("pred") == 0), 1).otherwise(0))
        .cast("long")
        .alias("fn"),
        F.sum(F.when((F.col("y") == 0) & (F.col("pred") == 0), 1).otherwise(0))
        .cast("long")
        .alias("tn"),
        F.expr(
            "CAST((sum(CASE WHEN y = pred THEN 1 ELSE 0 END) * 1000000)"
            " div count(*) AS BIGINT)"
        ).alias("acc_ppm"),
    )


# --------------------------------------------------------------------------
# 4. Ljung-Box whiteness test
# --------------------------------------------------------------------------

LB_LAGS = 3
LB_CRIT_MICRO = 7_815_000  # chi-square(3) upper 5% point, micro units


@query(
    "stat_ljung_box",
    oracle=f"""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS d,
         CAST(sum(CAST(round(value) AS BIGINT)) AS BIGINT) AS y
  FROM events GROUP BY 1, 2
),
mu AS (
  SELECT event_type, CAST(sum(y) AS BIGINT) // count(*) AS mu
  FROM daily GROUP BY 1
),
c AS (
  SELECT daily.event_type, daily.d, daily.y - mu.mu AS yd
  FROM daily JOIN mu ON daily.event_type = mu.event_type
),
lagged AS (
  SELECT event_type, yd,
         lag(yd, 1) OVER w AS l1,
         lag(yd, 2) OVER w AS l2,
         lag(yd, 3) OVER w AS l3
  FROM c WINDOW w AS (PARTITION BY event_type ORDER BY d)
),
cov AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(yd * yd) AS BIGINT) AS c0,
         CAST(sum(CASE WHEN l1 IS NULL THEN 0 ELSE yd * l1 END) AS BIGINT) AS c1,
         CAST(sum(CASE WHEN l2 IS NULL THEN 0 ELSE yd * l2 END) AS BIGINT) AS c2,
         CAST(sum(CASE WHEN l3 IS NULL THEN 0 ELSE yd * l3 END) AS BIGINT) AS c3
  FROM lagged GROUP BY 1
),
r AS (
  SELECT event_type, n,
         (c1 * 10000) // c0 AS r1, (c2 * 10000) // c0 AS r2,
         (c3 * 10000) // c0 AS r3
  FROM cov WHERE c0 > 0 AND n > {LB_LAGS}
),
q AS (
  SELECT event_type, n,
         n * (n + 2) * (
             ((r1 * r1) // 100) // (n - 1)
           + ((r2 * r2) // 100) // (n - 2)
           + ((r3 * r3) // 100) // (n - 3)
         ) AS q_micro
  FROM r
)
SELECT event_type, n, CAST(q_micro AS BIGINT) AS q_micro,
       CAST({LB_LAGS} AS BIGINT) AS df,
       CAST(CASE WHEN q_micro > {LB_CRIT_MICRO} THEN 1 ELSE 0 END AS BIGINT)
         AS reject_white
FROM q
""",
)
def stat_ljung_box(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ljung-Box portmanteau test on each daily series: Q = n(n+2)
    Σ_{{k≤{LB_LAGS}}} r_k²/(n−k) against the χ²({LB_LAGS}) 5% critical
    value — the standard "are these residuals white noise" gate run
    after fitting any forecaster (the ts_holt/ts_croston/
    ts_seasonal_* family) before trusting its intervals. Reuses the
    exact integer autocovariance machinery of ``ts_pacf_durbin`` on
    the UNSCALED centered series; each r_k quantizes once to 1e4
    units via (c_k·10⁴) div c₀ (|c_k| ≤ c₀ keeps the product inside
    int64 at any revenue scale), so Q is a deterministic micro-unit
    integer.

    Scale shape: identical to the PACF query — daily collapse, bounded
    per-key lag window, per-key scalar math."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy("event_type", F.to_date("ts").alias("d")).agg(
        F.sum(F.round("value").cast("long")).cast("long").alias("y")
    )
    mu = daily.groupBy("event_type").agg(
        F.expr("CAST(sum(y) AS BIGINT) div count(*)").alias("mu")
    )
    c = daily.join(F.broadcast(mu), "event_type").select(
        "event_type", "d", (F.col("y") - F.col("mu")).alias("yd")
    )
    w = Window.partitionBy("event_type").orderBy("d")
    lagged = c.select(
        "event_type",
        "yd",
        *[F.lag("yd", k).over(w).alias(f"l{k}") for k in (1, 2, 3)],
    )
    cov = lagged.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.col("yd") * F.col("yd")).cast("long").alias("c0"),
        *[
            F.sum(
                F.when(F.col(f"l{k}").isNull(), 0).otherwise(
                    F.col("yd") * F.col(f"l{k}")
                )
            )
            .cast("long")
            .alias(f"c{k}")
            for k in (1, 2, 3)
        ],
    )
    q = (
        cov.filter((F.col("c0") > 0) & (F.col("n") > LB_LAGS))
        .select(
            "event_type",
            "n",
            *[
                F.expr(f"(c{k} * 10000) div c0").alias(f"r{k}")
                for k in (1, 2, 3)
            ],
        )
        .select(
            "event_type",
            "n",
            F.expr(
                "n * (n + 2) * ("
                " ((r1 * r1) div 100) div (n - 1)"
                " + ((r2 * r2) div 100) div (n - 2)"
                " + ((r3 * r3) div 100) div (n - 3))"
            ).alias("q_micro"),
        )
    )
    return q.select(
        "event_type",
        "n",
        F.col("q_micro").cast("long"),
        F.lit(LB_LAGS).cast("long").alias("df"),
        F.when(F.col("q_micro") > LB_CRIT_MICRO, 1)
        .otherwise(0)
        .cast("long")
        .alias("reject_white"),
    )


# --------------------------------------------------------------------------
# 5. Rate vs mix decomposition
# --------------------------------------------------------------------------


@query(
    "agg_mix_shift_decomposition",
    oracle="""
WITH mid AS (
  SELECT min(CAST(ts AS DATE))
         + CAST((max(CAST(ts AS DATE)) - min(CAST(ts AS DATE))) // 2
                AS INTEGER) AS m
  FROM events
),
seg AS (
  SELECT event_type AS segment,
         CASE WHEN CAST(ts AS DATE) < (SELECT m FROM mid) THEN 1 ELSE 2 END
           AS half,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM events GROUP BY 1, 2
),
tot AS (
  SELECT half, CAST(sum(n) AS BIGINT) AS nt FROM seg GROUP BY half
),
wide AS (
  SELECT a.segment,
         (a.n * 1000000) // t1.nt AS w1_ppm,
         (b.n * 1000000) // t2.nt AS w2_ppm,
         (1000 * a.cents) // a.n AS r1_milli,
         (1000 * b.cents) // b.n AS r2_milli
  FROM (SELECT * FROM seg WHERE half = 1) a
  JOIN (SELECT * FROM seg WHERE half = 2) b ON a.segment = b.segment,
       (SELECT nt FROM tot WHERE half = 1) t1,
       (SELECT nt FROM tot WHERE half = 2) t2
)
SELECT segment, CAST(w1_ppm AS BIGINT) AS w1_ppm,
       CAST(w2_ppm AS BIGINT) AS w2_ppm,
       CAST(r1_milli AS BIGINT) AS r1_milli,
       CAST(r2_milli AS BIGINT) AS r2_milli,
       CAST(((w2_ppm - w1_ppm) * r1_milli) // 1000000 AS BIGINT)
         AS mix_contrib_milli,
       CAST((w2_ppm * (r2_milli - r1_milli)) // 1000000 AS BIGINT)
         AS rate_contrib_milli
FROM wide
""",
)
def agg_mix_shift_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kitagawa/Oaxaca two-factor decomposition of the overall mean's
    move between horizon halves: Δ(weighted mean) = Σ_s (w₂−w₁)·r₁
    [the MIX effect — traffic shifted between segments] + Σ_s w₂·(r₂−r₁)
    [the RATE effect — segments themselves changed]. This is the
    "did the metric move or did the mix move" review that every
    regression-investigation runbook starts with —
    ``agg_price_volume_mix`` for totals, this for RATES. Weights are
    ppm shares, rates milli-cents means, one floor division per cell;
    per-segment contributions are emitted so the blame ranking is
    direct.

    Scale shape: one (segment, half) hash-agg over the scan; the
    decomposition is |segments|-row scalar math."""
    ev = load(spark, sf_dir, "events")
    mid = ev.agg(
        F.expr(
            "min(to_date(ts)) + CAST(datediff(max(to_date(ts)),"
            " min(to_date(ts))) div 2 AS INT)"
        ).alias("m")
    )
    seg = (
        ev.crossJoin(F.broadcast(mid))
        .groupBy(
            F.col("event_type").alias("segment"),
            F.when(F.to_date("ts") < F.col("m"), 1).otherwise(2).alias("half"),
        )
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("long"))
            .cast("long")
            .alias("cents"),
        )
    )
    tot = seg.groupBy("half").agg(F.sum("n").cast("long").alias("nt"))
    a = (
        seg.filter(F.col("half") == 1)
        .crossJoin(
            F.broadcast(tot.filter(F.col("half") == 1).select(F.col("nt").alias("nt1")))
        )
        .select(
            "segment",
            F.expr("(n * 1000000) div nt1").alias("w1_ppm"),
            F.expr("(1000 * cents) div n").alias("r1_milli"),
        )
    )
    b = (
        seg.filter(F.col("half") == 2)
        .crossJoin(
            F.broadcast(tot.filter(F.col("half") == 2).select(F.col("nt").alias("nt2")))
        )
        .select(
            "segment",
            F.expr("(n * 1000000) div nt2").alias("w2_ppm"),
            F.expr("(1000 * cents) div n").alias("r2_milli"),
        )
    )
    return a.join(b, "segment").select(
        "segment",
        F.col("w1_ppm").cast("long"),
        F.col("w2_ppm").cast("long"),
        F.col("r1_milli").cast("long"),
        F.col("r2_milli").cast("long"),
        F.expr("CAST(((w2_ppm - w1_ppm) * r1_milli) div 1000000 AS BIGINT)").alias(
            "mix_contrib_milli"
        ),
        F.expr("CAST((w2_ppm * (r2_milli - r1_milli)) div 1000000 AS BIGINT)").alias(
            "rate_contrib_milli"
        ),
    )


# --------------------------------------------------------------------------
# 6. Partition-scheme evolution
# --------------------------------------------------------------------------

PE_DOW = 3


@query(
    "io_partition_evolution",
    oracle=f"""
WITH src AS (
  SELECT event_type,
         CAST((CAST(ts AS DATE) - DATE '1970-01-05') % 7 AS BIGINT) AS dow,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
)
SELECT event_type, CAST(2 * count(*) AS BIGINT) AS n,
       CAST(2 * sum(cents) AS BIGINT) AS cents
FROM src WHERE dow = {PE_DOW}
GROUP BY event_type
""",
)
def io_partition_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-scheme evolution: the SAME logical table lives in two
    physical generations — v1 hive-partitioned by dow alone, v2 by
    (dow, event_type) — and one reader serves a dow-filtered query over
    BOTH, with partition pruning effective in each layout (v1 prunes on
    its single key; v2 prunes on the leading key and scans its
    event_type subdirs). This is what Iceberg partition evolution
    formalizes in metadata; on plain hive layouts the union-read is the
    migration-window reality, and the per-generation `gen` tag is how
    the compactor later knows what to rewrite. Counts come back doubled
    (each generation holds a full copy), making the dual-read explicit.

    Scale shape: pruning does the work — the reader touches only the
    dow={PE_DOW} directories of each generation; the union is two
    pruned scans, no shuffle before the final small agg."""
    ev = load(spark, sf_dir, "events")
    base = os.path.join(
        tempfile.gettempdir(),
        "nocouncil_etl_spark_scratch",
        f"pevo_{os.path.basename(sf_dir.rstrip('/'))}",
    )
    v1, v2 = os.path.join(base, "v1"), os.path.join(base, "v2")
    src = ev.select(
        "event_type",
        (F.datediff(F.to_date("ts"), F.lit("1970-01-05").cast("date")) % 7)
        .cast("long")
        .alias("dow"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    src.write.mode("overwrite").partitionBy("dow").parquet(v1)
    src.write.mode("overwrite").partitionBy("dow", "event_type").parquet(v2)
    r1 = spark.read.parquet(v1).filter(F.col("dow") == PE_DOW).select(
        "event_type", "cents"
    )
    r2 = spark.read.parquet(v2).filter(F.col("dow") == PE_DOW).select(
        "event_type", "cents"
    )
    return (
        r1.unionByName(r2)
        .groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("cents").cast("long").alias("cents"),
        )
    )
