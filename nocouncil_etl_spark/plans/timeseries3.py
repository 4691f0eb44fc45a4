"""Timeseries batch 3: seasonality-aware exponential smoothing.

- ``ts_holt_winters_seasonal`` — additive Holt-Winters (level + trend +
  weekly seasonal) on the dense daily event-count series, per-mille
  integer fixed point, plus a one-week forecast from the terminal
  state. Completes the forecasting ladder: ts_ema_fixedpoint (level),
  ts_holt_forecast (level+trend), this (level+trend+seasonality) —
  the first member that can follow a weekday-shaped series, which is
  what nearly every operational daily metric is.

The recurrence needs s_{t-7}, seven steps back — carried as a 7-element
LIST in the oracle's recursive CTE (the state vector generalization of
ts_holt_forecast's scalar pair) and as a plain list in the driver loop.
Truncating integer division on both engines (DuckDB ``//`` ≡ Python
tdiv), so every state is bit-identical.
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nocouncil_etl_spark.io import load
from nocouncil_etl_spark.registry import query

FP = 1000
HW_ALPHA = 300  # level smoothing ×1000
HW_BETA = 100  # trend smoothing ×1000
HW_GAMMA = 200  # seasonal smoothing ×1000
PERIOD = 7
HW_H = 7  # forecast horizon: one season


def _hw_oracle() -> str:
    a, b, g = HW_ALPHA, HW_BETA, HW_GAMMA
    # the recursive step can't name intermediate columns, so newl is
    # spelled out wherever it is consumed
    newl = f"(({a} * (d.c * {FP} - h.sl[1]) + ({FP} - {a}) * (h.l + h.b)) // {FP})"
    newb = f"(({b} * ({newl} - h.l) + ({FP} - {b}) * h.b) // {FP})"
    news = f"(({g} * (d.c * {FP} - {newl}) + ({FP} - {g}) * h.sl[1]) // {FP})"
    return f"""
WITH RECURSIVE bounds AS (
  SELECT CAST(min(ts) AS DATE) AS lo, CAST(max(ts) AS DATE) AS hi FROM events
),
spine AS (
  SELECT CAST(unnest(generate_series((SELECT lo FROM bounds), (SELECT hi FROM bounds),
                                     INTERVAL 1 DAY)) AS DATE) AS day
),
cnt AS (
  SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS c FROM events GROUP BY 1
),
daily AS MATERIALIZED (
  SELECT row_number() OVER (ORDER BY s.day) - 1 AS idx, s.day,
         coalesce(c.c, 0) AS c
  FROM spine s LEFT JOIN cnt c ON s.day = c.day
),
maxi AS (SELECT max(idx) AS mi FROM daily),
init AS MATERIALIZED (
  SELECT
    (SELECT CAST(sum(c) AS BIGINT) FROM daily WHERE idx BETWEEN 0 AND {PERIOD - 1})
      AS sum0,
    (SELECT CAST(sum(c) AS BIGINT)
     FROM daily WHERE idx BETWEEN {PERIOD} AND {2 * PERIOD - 1}) AS sum1
),
seed AS MATERIALIZED (
  SELECT CAST({PERIOD - 1} AS BIGINT) AS idx,
         (SELECT sum0 FROM init) * {FP} // {PERIOD} AS l,
         ((SELECT sum1 FROM init) - (SELECT sum0 FROM init)) * {FP}
           // {PERIOD * PERIOD} AS b,
         (SELECT list(c * {FP} - (SELECT sum0 FROM init) * {FP} // {PERIOD}
                      ORDER BY idx)
          FROM daily WHERE idx <= {PERIOD - 1}) AS sl
),
hw AS (
  SELECT idx, l, b, sl FROM seed
  UNION ALL
  SELECT d.idx,
         {newl},
         {newb},
         list_append(h.sl[2:{PERIOD}], {news})
  FROM hw h JOIN daily d ON d.idx = h.idx + 1
),
fitted AS (
  SELECT h.idx, d.day, d.c AS observed, h.l, h.b, h.sl[{PERIOD}] AS s,
         CAST(round((h.l + h.b + h.sl[1]) / {FP}.0, 3) AS DOUBLE) AS next_fc
  FROM hw h JOIN daily d ON d.idx = h.idx
  WHERE h.idx >= {PERIOD}
),
term AS (SELECT l, b, sl FROM hw WHERE idx = (SELECT mi FROM maxi)),
forecast AS (
  SELECT (SELECT mi FROM maxi) + s.h AS idx,
         CAST((SELECT hi FROM bounds) + to_days(CAST(s.h AS INT)) AS DATE) AS day,
         CAST(NULL AS BIGINT) AS observed,
         (SELECT l FROM term) AS l, (SELECT b FROM term) AS b,
         (SELECT sl FROM term)[s.h] AS s,
         CAST(round(((SELECT l FROM term) + s.h * (SELECT b FROM term)
                     + (SELECT sl FROM term)[s.h]) / {FP}.0, 3) AS DOUBLE) AS next_fc
  FROM (SELECT unnest(generate_series(1, {HW_H})) AS h) s
)
SELECT CAST(idx AS BIGINT) AS idx, CAST(day AS VARCHAR) AS day, observed,
       CAST(l AS BIGINT) AS level_fp, CAST(b AS BIGINT) AS trend_fp,
       CAST(s AS BIGINT) AS seas_fp, next_fc
FROM fitted
UNION ALL
SELECT CAST(idx AS BIGINT), CAST(day AS VARCHAR), observed,
       CAST(l AS BIGINT), CAST(b AS BIGINT), CAST(s AS BIGINT), next_fc
FROM forecast
"""


@query("ts_holt_winters_seasonal", oracle=_hw_oracle())
def ts_holt_winters_seasonal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive Holt-Winters on the dense daily event-count series
    (α={HW_ALPHA}/1000, β={HW_BETA}/1000, γ={HW_GAMMA}/1000, weekly
    period): l←α(y−s₋₇)+(1−α)(l+b), b←β(Δl)+(1−β)b, s←γ(y−l)+(1−γ)s₋₇,
    seeded from the first week's mean (level), the week-over-week mean
    shift (trend) and first-week deviations (seasonals); one-step-ahead
    fits plus a {HW_H}-day forecast from the terminal state. Per-mille
    integer fixed point with truncating division keeps both engines
    bit-identical; the oracle carries the 7-slot seasonal ring as a LIST
    column through a recursive CTE.

    Scale shape: the corpus collapses to one row per calendar day in a
    distributed hash-agg; the driver then iterates a horizon-length
    series (ts_holt_forecast's bounded-driver-state contract — state is
    the CALENDAR's length and a 7-slot ring, independent of corpus
    size)."""
    ev = load(spark, sf_dir, "events")
    cnt = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    bounds = ev.agg(
        F.min(F.col("ts").cast("date")).alias("lo"),
        F.max(F.col("ts").cast("date")).alias("hi"),
    )
    spine = bounds.select(
        F.explode(F.expr("sequence(lo, hi, interval 1 day)")).alias("day")
    )
    daily = (
        spine.join(cnt, "day", "left")
        .select("day", F.coalesce("c", F.lit(0)).alias("c"))
        .orderBy("day")
        .collect()
    )  # horizon-length series — bounded driver state by design

    def tdiv(x: int, d: int) -> int:
        return abs(x) // d if x >= 0 else -(abs(x) // d)

    c = [r.c for r in daily]
    days = [r.day for r in daily]
    if len(c) < 2 * PERIOD:
        raise ValueError(
            f"Holt-Winters needs >= {2 * PERIOD} days to seed level/trend/"
            f"seasonals; got {len(c)}"
        )
    sum0 = sum(c[:PERIOD])
    sum1 = sum(c[PERIOD : 2 * PERIOD])
    l = tdiv(sum0 * FP, PERIOD)
    b = tdiv((sum1 - sum0) * FP, PERIOD * PERIOD)
    sl = [c[i] * FP - l for i in range(PERIOD)]  # s[i-6..i] ring, oldest first

    rows = []
    for i in range(PERIOD, len(c)):
        s_used = sl[0]
        nl = tdiv(HW_ALPHA * (c[i] * FP - s_used) + (FP - HW_ALPHA) * (l + b), FP)
        nb = tdiv(HW_BETA * (nl - l) + (FP - HW_BETA) * b, FP)
        ns = tdiv(HW_GAMMA * (c[i] * FP - nl) + (FP - HW_GAMMA) * s_used, FP)
        l, b = nl, nb
        sl = sl[1:] + [ns]
        rows.append(
            (
                i,
                str(days[i]),
                c[i],
                l,
                b,
                ns,
                round((l + b + sl[0]) / float(FP), 3),
            )
        )
    for h in range(1, HW_H + 1):
        rows.append(
            (
                len(c) - 1 + h,
                str(days[-1] + _dt.timedelta(days=h)),
                None,
                l,
                b,
                sl[h - 1],
                round((l + h * b + sl[h - 1]) / float(FP), 3),
            )
        )
    return spark.createDataFrame(
        rows,
        "idx BIGINT, day STRING, observed BIGINT, level_fp BIGINT, "
        "trend_fp BIGINT, seas_fp BIGINT, next_fc DOUBLE",
    )
