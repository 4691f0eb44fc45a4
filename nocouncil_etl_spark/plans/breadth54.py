"""Breadth batch 54 (round 6): time-decay attribution, k-fold CV, KPSS,
volume anomaly monitor, revenue retention bridge, multipart ETags.

Six operators (reference scope: recency-weighted credit assignment,
honest out-of-fold accuracy without 5x training scans, level-
stationarity testing, the row-count pager rule, the SaaS revenue
bridge, and cloud-storage-style integrity tags for media blobs):

- ``attribution_time_decay`` — exponential time-decay multi-touch
  attribution with an exact ppm weight table.
- ``ml_kfold_cv``           — 5-fold CV of the Gaussian-NB scorer via
  the complement trick (train moments = global − fold).
- ``ts_kpss_level``         — KPSS level-stationarity statistic from
  exact partial sums.
- ``dq_volume_anomaly``     — daily row counts vs the trailing-week
  median with ±15% flags.
- ``agg_revenue_retention_bridge`` — NRR/GRR with the expansion /
  contraction / churn / new decomposition.
- ``multimodal_multipart_etag`` — S3-style multipart integrity tags
  (md5 of part digests) over document blobs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nocouncil_etl_spark.io import fan_out, load
from nocouncil_etl_spark.plans.breadth15 import _pt, _pt_sql
from nocouncil_etl_spark.registry import query

# --------------------------------------------------------------------------
# 1. Time-decay attribution
# --------------------------------------------------------------------------

TD_WINDOW = 7  # days of lookback
# half-life 2 days: weight_1e6[age] = round(1e6 * (1/2)^(age/2))
TD_WEIGHTS = tuple(
    round(1_000_000 * 0.5 ** (age / 2)) for age in range(TD_WINDOW + 1)
)


@query(
    "attribution_time_decay",
    oracle=f"""
WITH conv AS (
  SELECT event_id AS conv_id, user_id, ts AS cts FROM events
  WHERE event_type = 'purchase'
),
touch AS (
  SELECT event_id AS touch_id, user_id, event_type AS channel, ts
  FROM events WHERE event_type IN ('click', 'view')
),
w(age, w_1e6) AS (VALUES
  {', '.join(f'({a}, {v})' for a, v in enumerate(TD_WEIGHTS))}
),
pairs AS (
  SELECT c.conv_id, t.channel,
         w.w_1e6
  FROM conv c JOIN touch t
    ON c.user_id = t.user_id AND t.ts < c.cts
   AND CAST(c.cts AS DATE) - CAST(t.ts AS DATE) <= {TD_WINDOW}
  JOIN w ON w.age = CAST(c.cts AS DATE) - CAST(t.ts AS DATE)
),
per_conv AS (
  SELECT conv_id, CAST(sum(w_1e6) AS BIGINT) AS tot FROM pairs GROUP BY 1
),
credit AS (
  SELECT p.channel,
         (CAST(p.w_1e6 AS BIGINT) * 1000000) // pc.tot AS share_ppm
  FROM pairs p JOIN per_conv pc ON p.conv_id = pc.conv_id
)
SELECT channel, CAST(count(*) AS BIGINT) AS n_touches,
       CAST(sum(share_ppm) AS BIGINT) AS credit_ppm_total
FROM credit GROUP BY channel
""",
)
def attribution_time_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-decay multi-touch attribution: every click/view in the
    {TD_WINDOW}-day window before a purchase earns credit weighted by
    2^(−age/2) (half-life two days — yesterday's touch is worth ~71% of
    today's), shares normalized per conversion in exact ppm. This
    completes the attribution family: last/first-touch ignore the
    journey, ``attribution_position_based`` fixes U-shaped weights,
    ``attribution_shapley`` is order-free and exponential in channels —
    time-decay is the industry default because recency is the one prior
    everyone accepts. Weights come from a shared literal table (the
    ``agg_time_decay_totals`` technique), so every credit is an
    integer.

    Scale shape: the touch-conversion pair join is user-keyed with a
    bounded time predicate (at scale: bucketed by user + date so pairs
    never leave a partition); everything after is hash-aggs."""
    ev = load(spark, sf_dir, "events")
    conv = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("conv_id"),
        "user_id",
        F.col("ts").alias("cts"),
    )
    touch = ev.filter(F.col("event_type").isin("click", "view")).select(
        "user_id", F.col("event_type").alias("channel"), "ts"
    )
    w = spark.createDataFrame(
        list(enumerate(TD_WEIGHTS)), "age LONG, w_1e6 LONG"
    )
    pairs = (
        conv.join(touch, "user_id")
        .filter(
            (F.col("ts") < F.col("cts"))
            & (F.datediff(F.to_date("cts"), F.to_date("ts")) <= TD_WINDOW)
        )
        .withColumn(
            "age", F.datediff(F.to_date("cts"), F.to_date("ts")).cast("long")
        )
        .join(F.broadcast(w), "age")
        .select("conv_id", "channel", "w_1e6")
    )
    per_conv = pairs.groupBy("conv_id").agg(
        F.sum("w_1e6").cast("long").alias("tot")
    )
    credit = pairs.join(per_conv, "conv_id").select(
        "channel", F.expr("(w_1e6 * 1000000) div tot").alias("share_ppm")
    )
    return credit.groupBy("channel").agg(
        F.count("*").cast("long").alias("n_touches"),
        F.sum("share_ppm").cast("long").alias("credit_ppm_total"),
    )


# --------------------------------------------------------------------------
# 2. K-fold cross-validation via complement moments
# --------------------------------------------------------------------------

CV_K = 5


@query(
    "ml_kfold_cv",
    oracle=f"""
WITH data AS MATERIALIZED (
  SELECT CAST(round(value) AS BIGINT) AS v, CAST(hour(ts) AS BIGINT) AS hr,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y,
         {_pt_sql('cv#', 'event_id', CV_K)} AS fold
  FROM events
),
fm AS (
  SELECT fold, y, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(v) AS BIGINT) AS sv, CAST(sum(v * v) AS BIGINT) AS svv,
         CAST(sum(hr) AS BIGINT) AS sh, CAST(sum(hr * hr) AS BIGINT) AS shh
  FROM data GROUP BY 1, 2
),
gm AS (
  SELECT y, CAST(sum(n) AS BIGINT) AS n, CAST(sum(sv) AS BIGINT) AS sv,
         CAST(sum(svv) AS BIGINT) AS svv, CAST(sum(sh) AS BIGINT) AS sh,
         CAST(sum(shh) AS BIGINT) AS shh
  FROM fm GROUP BY y
),
tm AS (
  -- train moments for fold f = global minus fold f (the complement trick)
  SELECT f.fold, g.y, g.n - coalesce(f2.n, 0) AS n,
         g.sv - coalesce(f2.sv, 0) AS sv, g.svv - coalesce(f2.svv, 0) AS svv,
         g.sh - coalesce(f2.sh, 0) AS sh, g.shh - coalesce(f2.shh, 0) AS shh
  FROM (SELECT DISTINCT fold FROM data) f
  CROSS JOIN gm g
  LEFT JOIN fm f2 ON f2.fold = f.fold AND f2.y = g.y
),
tt AS (SELECT fold, CAST(sum(n) AS BIGINT) AS nn FROM tm GROUP BY fold),
mom AS (
  SELECT tm.fold, tm.y,
         CAST(tm.sv AS DOUBLE) / tm.n AS mv,
         (CAST(tm.n AS DOUBLE) * tm.svv - CAST(tm.sv AS DOUBLE) * tm.sv)
           / (CAST(tm.n AS DOUBLE) * tm.n) + 0.5 AS vv,
         CAST(tm.sh AS DOUBLE) / tm.n AS mh,
         (CAST(tm.n AS DOUBLE) * tm.shh - CAST(tm.sh AS DOUBLE) * tm.sh)
           / (CAST(tm.n AS DOUBLE) * tm.n) + 0.5 AS vh,
         ln(CAST(tm.n AS DOUBLE) / tt.nn) AS prior
  FROM tm JOIN tt ON tm.fold = tt.fold
),
scored AS (
  SELECT d.fold, d.y,
         CASE WHEN
           (SELECT prior - 0.5 * ln(vv) - (d.v - mv) * (d.v - mv) / (2 * vv)
                   - 0.5 * ln(vh) - (d.hr - mh) * (d.hr - mh) / (2 * vh)
            FROM mom WHERE fold = d.fold AND y = 1)
           >
           (SELECT prior - 0.5 * ln(vv) - (d.v - mv) * (d.v - mv) / (2 * vv)
                   - 0.5 * ln(vh) - (d.hr - mh) * (d.hr - mh) / (2 * vh)
            FROM mom WHERE fold = d.fold AND y = 0)
         THEN 1 ELSE 0 END AS pred
  FROM data d
),
perfold AS (
  SELECT fold, CAST(count(*) AS BIGINT) AS n_test,
         CAST(sum(CASE WHEN y = pred THEN 1 ELSE 0 END) AS BIGINT)
           AS n_correct
  FROM scored GROUP BY fold
),
pooled AS (
  SELECT CAST((sum(n_correct) * 1000000) // sum(n_test) AS BIGINT) AS pool
  FROM perfold
)
SELECT p.fold, p.n_test, p.n_correct,
       CAST((p.n_correct * 1000000) // p.n_test AS BIGINT) AS acc_ppm,
       (SELECT pool FROM pooled) AS pooled_acc_ppm
FROM perfold p
""",
)
def ml_kfold_cv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{CV_K}-fold cross-validation of the Gaussian-NB purchase scorer
    with the COMPLEMENT TRICK: per-(fold, class) moment sums are
    computed ONCE, and each fold's training moments are the global sums
    minus that fold's — exact integer subtraction, so 5-fold CV costs
    one scan instead of five trainings (the property that makes CV
    feasible at 100 TB, and the same additive-moments fact behind
    ``ml_target_encode_oof``). Every row is scored strictly
    out-of-fold; per-fold and pooled accuracies are reported so fold
    variance is visible next to the headline number.

    Scale shape: one hash-agg to {CV_K}×2 moment rows, k-row model
    math, one broadcast-model scoring pass."""
    ev = load(spark, sf_dir, "events")
    data = ev.select(
        F.round("value").cast("long").alias("v"),
        F.hour("ts").cast("long").alias("hr"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
        (_pt("cv#", F.col("event_id")) % CV_K).alias("fold"),
    )
    fm = data.groupBy("fold", "y").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("v").cast("long").alias("sv"),
        F.sum(F.col("v") * F.col("v")).cast("long").alias("svv"),
        F.sum("hr").cast("long").alias("sh"),
        F.sum(F.col("hr") * F.col("hr")).cast("long").alias("shh"),
    )
    gm = fm.groupBy("y").agg(
        *[F.sum(c).cast("long").alias(c) for c in ("n", "sv", "svv", "sh", "shh")]
    )
    folds = data.select("fold").distinct()
    tm = (
        folds.crossJoin(F.broadcast(gm.select(*[F.col(c).alias(f"g_{c}") for c in ("n", "sv", "svv", "sh", "shh")], "y")))
        .join(fm, ["fold", "y"], "left")
        .select(
            "fold",
            "y",
            *[
                (F.col(f"g_{c}") - F.coalesce(F.col(c), F.lit(0)))
                .cast("long")
                .alias(c)
                for c in ("n", "sv", "svv", "sh", "shh")
            ],
        )
    )
    tt = tm.groupBy("fold").agg(F.sum("n").cast("long").alias("nn"))
    mom = tm.join(tt, "fold").select(
        "fold",
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
        "fold", F.col("mv").alias("mv1"), F.col("vv").alias("vv1"),
        F.col("mh").alias("mh1"), F.col("vh").alias("vh1"),
        F.col("prior").alias("pr1"),
    )
    m0 = mom.filter(F.col("y") == 0).select(
        "fold", F.col("mv").alias("mv0"), F.col("vv").alias("vv0"),
        F.col("mh").alias("mh0"), F.col("vh").alias("vh0"),
        F.col("prior").alias("pr0"),
    )
    scored = (
        data.join(F.broadcast(m1), "fold")
        .join(F.broadcast(m0), "fold")
        .select(
            "fold",
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
    perfold = scored.groupBy("fold").agg(
        F.count("*").cast("long").alias("n_test"),
        F.sum(F.when(F.col("y") == F.col("pred"), 1).otherwise(0))
        .cast("long")
        .alias("n_correct"),
    )
    pooled = perfold.agg(
        F.expr(
            "CAST((sum(n_correct) * 1000000) div sum(n_test) AS BIGINT)"
        ).alias("pooled_acc_ppm")
    )
    return perfold.crossJoin(F.broadcast(pooled)).select(
        "fold",
        "n_test",
        "n_correct",
        F.expr("CAST((n_correct * 1000000) div n_test AS BIGINT)").alias(
            "acc_ppm"
        ),
        "pooled_acc_ppm",
    )


# --------------------------------------------------------------------------
# 3. KPSS level-stationarity test
# --------------------------------------------------------------------------

KPSS_CRIT_MICRO = 463000  # level-stationarity 5% critical value, micro


@query(
    "ts_kpss_level",
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
  SELECT daily.event_type, daily.d, daily.y - mu.mu AS yc
  FROM daily JOIN mu ON daily.event_type = mu.event_type
),
ps AS (
  SELECT event_type,
         CAST(sum(yc) OVER (PARTITION BY event_type ORDER BY d
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS s,
         yc
  FROM c
),
agg AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(s * s) AS BIGINT) AS ss2,
         CAST(sum(yc * yc) AS BIGINT) AS sy2
  FROM ps GROUP BY 1
)
SELECT event_type, n,
       CAST(round(1000000.0 * ss2 / (CAST(n AS DOUBLE) * sy2)) AS BIGINT)
         AS kpss_micro,
       CAST(CASE WHEN round(1000000.0 * ss2 / (CAST(n AS DOUBLE) * sy2))
                      > {KPSS_CRIT_MICRO}
            THEN 1 ELSE 0 END AS BIGINT) AS reject_stationary
FROM agg WHERE sy2 > 0
""",
)
def ts_kpss_level(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KPSS level-stationarity test (Kwiatkowski et al. 1992, lag-0
    variant): η = Σ S_t² / (n·Σ yc²) where S_t are the PARTIAL SUMS of
    the demeaned series — a random walk accumulates partial sums
    quadratically where stationary noise cancels, so large η rejects
    stationarity. KPSS inverts the ADF-style null (``ts_cointegration_
    residuals`` tests FOR a unit root; KPSS tests AGAINST one), and
    running both is the standard identification protocol before
    differencing a series. Partial sums and both sums of squares are
    exact BIGINTs; one rounded double ratio.

    Scale shape: daily collapse map-side; one per-key cumulative
    window + one keyed agg."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy("event_type", F.to_date("ts").alias("d")).agg(
        F.sum(F.round("value").cast("long")).cast("long").alias("y")
    )
    mu = daily.groupBy("event_type").agg(
        F.expr("CAST(sum(y) AS BIGINT) div count(*)").alias("mu")
    )
    c = daily.join(F.broadcast(mu), "event_type").select(
        "event_type", "d", (F.col("y") - F.col("mu")).alias("yc")
    )
    wc = Window.partitionBy("event_type").orderBy("d").rowsBetween(
        Window.unboundedPreceding, 0
    )
    ps = c.select(
        "event_type", F.sum("yc").over(wc).cast("long").alias("s"), "yc"
    )
    agg = ps.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.col("s") * F.col("s")).cast("long").alias("ss2"),
        F.sum(F.col("yc") * F.col("yc")).cast("long").alias("sy2"),
    )
    kpss = F.round(
        1000000.0 * F.col("ss2") / (F.col("n").cast("double") * F.col("sy2"))
    ).cast("long")
    return agg.filter(F.col("sy2") > 0).select(
        "event_type",
        "n",
        kpss.alias("kpss_micro"),
        F.when(kpss > KPSS_CRIT_MICRO, 1)
        .otherwise(0)
        .cast("long")
        .alias("reject_stationary"),
    )


# --------------------------------------------------------------------------
# 4. Volume-anomaly monitor
# --------------------------------------------------------------------------

VA_PCT = 15  # flag beyond ±15% of trailing median


@query(
    "dq_volume_anomaly",
    oracle=f"""
WITH daily AS (
  SELECT event_type,
         CAST(CAST(ts AS DATE)
              - (SELECT min(CAST(ts AS DATE)) FROM events) AS BIGINT)
           AS off,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
),
trail AS (
  SELECT event_type, off, n,
         list_sort(list(n) OVER (PARTITION BY event_type ORDER BY off
           ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)) AS prev
  FROM daily
),
med AS (
  SELECT event_type, off, n,
         CAST(prev[CAST((len(prev) + 1) // 2 AS INTEGER)] AS BIGINT)
           AS med_trailing
  FROM trail WHERE len(prev) >= 3
)
SELECT event_type, off, n, med_trailing,
       CAST(CASE WHEN n * 100 > med_trailing * (100 + {VA_PCT})
                   OR n * 100 < med_trailing * (100 - {VA_PCT})
            THEN 1 ELSE 0 END AS BIGINT) AS anomaly
FROM med
""",
)
def dq_volume_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily row-count anomaly monitor: each (type, day) count is
    compared against the MEDIAN of its trailing week (lower-median of
    the ≤7 preceding days, needing ≥3 of history), flagged beyond
    ±{VA_PCT}% via exact cross-multiplied integer comparison — the
    pager rule for "the feed halved overnight" (``dq_freshness_lag``
    catches a feed going SILENT; this catches one going THIN or
    doubling, which silence checks miss). Medians over the explicit
    sorted trailing list keep both engines nearest-rank-identical —
    no interpolating median() anywhere.

    Scale shape: daily counts collapse map-side; the trailing window is
    bounded (7 rows) per key; every comparison is integer."""
    ev = load(spark, sf_dir, "events")
    d0 = ev.agg(F.min(F.to_date("ts")).alias("start"))
    daily = (
        ev.crossJoin(F.broadcast(d0))
        .groupBy(
            "event_type",
            F.datediff(F.to_date("ts"), F.col("start")).cast("long").alias("off"),
        )
        .agg(F.count("*").cast("long").alias("n"))
    )
    wt = (
        Window.partitionBy("event_type").orderBy("off").rowsBetween(-7, -1)
    )
    trail = daily.withColumn(
        "prev", F.sort_array(F.collect_list("n").over(wt))
    )
    med = trail.filter(F.size("prev") >= 3).select(
        "event_type",
        "off",
        "n",
        F.expr("CAST(prev[CAST((size(prev) + 1) div 2 AS INT) - 1] AS BIGINT)").alias(
            "med_trailing"
        ),
    )
    return med.select(
        "event_type",
        "off",
        "n",
        "med_trailing",
        F.when(
            (F.col("n") * 100 > F.col("med_trailing") * (100 + VA_PCT))
            | (F.col("n") * 100 < F.col("med_trailing") * (100 - VA_PCT)),
            1,
        )
        .otherwise(0)
        .cast("long")
        .alias("anomaly"),
    )


# --------------------------------------------------------------------------
# 5. Revenue retention bridge (NRR / GRR)
# --------------------------------------------------------------------------


@query(
    "agg_revenue_retention_bridge",
    oracle="""
WITH mid AS (
  SELECT min(CAST(ts AS DATE))
         + CAST((max(CAST(ts AS DATE)) - min(CAST(ts AS DATE))) // 2
                AS INTEGER) AS m
  FROM events
),
per AS (
  SELECT user_id,
         CAST(sum(CASE WHEN CAST(ts AS DATE) < (SELECT m FROM mid)
                       THEN CAST(round(value * 100) AS BIGINT)
                       ELSE 0 END) AS BIGINT) AS r1,
         CAST(sum(CASE WHEN CAST(ts AS DATE) >= (SELECT m FROM mid)
                       THEN CAST(round(value * 100) AS BIGINT)
                       ELSE 0 END) AS BIGINT) AS r2
  FROM events GROUP BY 1
)
SELECT CAST(sum(CASE WHEN r1 > 0 THEN r1 ELSE 0 END) AS BIGINT)
         AS base_rev1,
       CAST(sum(CASE WHEN r1 > 0 THEN r2 ELSE 0 END) AS BIGINT)
         AS existing_rev2,
       CAST(sum(CASE WHEN r1 > 0 THEN least(r1, r2) ELSE 0 END) AS BIGINT)
         AS retained,
       CAST(sum(CASE WHEN r1 > 0 AND r2 > r1 THEN r2 - r1 ELSE 0 END)
            AS BIGINT) AS expansion,
       CAST(sum(CASE WHEN r1 > 0 AND r2 > 0 AND r2 < r1 THEN r1 - r2
                     ELSE 0 END) AS BIGINT) AS contraction,
       CAST(sum(CASE WHEN r1 > 0 AND r2 = 0 THEN r1 ELSE 0 END) AS BIGINT)
         AS churned,
       CAST(sum(CASE WHEN r1 = 0 AND r2 > 0 THEN r2 ELSE 0 END) AS BIGINT)
         AS new_rev,
       CAST((sum(CASE WHEN r1 > 0 THEN r2 ELSE 0 END) * 1000000)
            // sum(CASE WHEN r1 > 0 THEN r1 ELSE 0 END) AS BIGINT)
         AS nrr_ppm,
       CAST((sum(CASE WHEN r1 > 0 THEN least(r1, r2) ELSE 0 END) * 1000000)
            // sum(CASE WHEN r1 > 0 THEN r1 ELSE 0 END) AS BIGINT)
         AS grr_ppm
FROM per
""",
)
def agg_revenue_retention_bridge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Net / gross revenue retention with the full bridge: per-user
    revenue in each horizon half, then NRR = period-2 revenue of the
    EXISTING base over its period-1 revenue (expansion can push it past
    100%) and GRR = Σ min(r1, r2) over the base (caps at 100% — what
    retention alone achieves), decomposed exactly into retained +
    expansion − contraction − churn, with new-logo revenue reported
    OUTSIDE the ratio (the definitional trap: NRR must exclude new
    customers or it's just growth). The identity existing_rev2 =
    retained + expansion holds to the cent. The revenue-side sibling of
    ``agg_new_vs_returning`` (counts) and ``agg_decile_migration``
    (ranks).

    Scale shape: one conditional-sum hash-agg per user, one global
    reduce — fully map-side."""
    ev = load(spark, sf_dir, "events")
    mid = ev.agg(
        F.expr(
            "min(to_date(ts)) + CAST(datediff(max(to_date(ts)),"
            " min(to_date(ts))) div 2 AS INT)"
        ).alias("m")
    )
    cents = F.round(F.col("value") * 100).cast("long")
    per = (
        ev.crossJoin(F.broadcast(mid))
        .groupBy("user_id")
        .agg(
            F.sum(F.when(F.to_date("ts") < F.col("m"), cents).otherwise(0))
            .cast("long")
            .alias("r1"),
            F.sum(F.when(F.to_date("ts") >= F.col("m"), cents).otherwise(0))
            .cast("long")
            .alias("r2"),
        )
    )
    ex = F.col("r1") > 0
    return per.agg(
        F.sum(F.when(ex, F.col("r1")).otherwise(0)).cast("long").alias("base_rev1"),
        F.sum(F.when(ex, F.col("r2")).otherwise(0))
        .cast("long")
        .alias("existing_rev2"),
        F.sum(F.when(ex, F.least("r1", "r2")).otherwise(0))
        .cast("long")
        .alias("retained"),
        F.sum(F.when(ex & (F.col("r2") > F.col("r1")), F.col("r2") - F.col("r1")).otherwise(0))
        .cast("long")
        .alias("expansion"),
        F.sum(
            F.when(
                ex & (F.col("r2") > 0) & (F.col("r2") < F.col("r1")),
                F.col("r1") - F.col("r2"),
            ).otherwise(0)
        )
        .cast("long")
        .alias("contraction"),
        F.sum(F.when(ex & (F.col("r2") == 0), F.col("r1")).otherwise(0))
        .cast("long")
        .alias("churned"),
        F.sum(F.when((F.col("r1") == 0) & (F.col("r2") > 0), F.col("r2")).otherwise(0))
        .cast("long")
        .alias("new_rev"),
        F.expr(
            "CAST((sum(CASE WHEN r1 > 0 THEN r2 ELSE 0 END) * 1000000)"
            " div sum(CASE WHEN r1 > 0 THEN r1 ELSE 0 END) AS BIGINT)"
        ).alias("nrr_ppm"),
        F.expr(
            "CAST((sum(CASE WHEN r1 > 0 THEN least(r1, r2) ELSE 0 END)"
            " * 1000000) div sum(CASE WHEN r1 > 0 THEN r1 ELSE 0 END)"
            " AS BIGINT)"
        ).alias("grr_ppm"),
    )


# --------------------------------------------------------------------------
# 6. Multipart ETag integrity
# --------------------------------------------------------------------------

ETAG_PART = 256  # characters per part


@query(
    "multimodal_multipart_etag",
    oracle=f"""
WITH parts AS (
  SELECT doc_id,
         CAST(i AS BIGINT) AS pno,
         md5(substring(text, CAST((i - 1) * {ETAG_PART} + 1 AS INTEGER),
             {ETAG_PART})) AS ph
  FROM (SELECT doc_id, text,
               unnest(range(1, (len(text) + {ETAG_PART} - 1)
                            // {ETAG_PART} + 1)) AS i
        FROM documents WHERE len(text) > 0)
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_parts,
       md5(string_agg(ph, '' ORDER BY pno)) || '-'
         || CAST(count(*) AS VARCHAR) AS etag
FROM parts GROUP BY doc_id
""",
)
def multimodal_multipart_etag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multipart integrity tags for blob columns — the S3 multipart
    ETag discipline (documented variant: md5 over the concatenated HEX
    part digests rather than raw digest bytes): each document blob is
    split into {ETAG_PART}-char parts, each part hashed independently,
    and the object tag is the hash-of-hashes suffixed with the part
    count. Part-level hashing is what makes 100 TB media ingest
    verifiable INCREMENTALLY — a resumed upload revalidates only its
    own parts (``io_integrity_audit`` hashes whole files; the
    multimodal pipeline moves blobs too big for that), and the part
    digests are exactly the dedup keys a CDC store
    (``dedup_cdc_chunks``) would reuse.

    Scale shape: the part explode is bounded by blob size / part size;
    per-part hashing is map-side; the tag is one ordered listagg +
    hash per key."""
    docs = fan_out(load(spark, sf_dir, "documents")).filter(F.length("text") > 0)
    parts = docs.select(
        "doc_id",
        F.explode(
            F.expr(
                f"sequence(1, CAST((length(text) + {ETAG_PART - 1})"
                f" div {ETAG_PART} AS INT))"
            )
        ).alias("pno"),
        "text",
    ).select(
        "doc_id",
        F.col("pno").cast("long").alias("pno"),
        F.md5(
            F.expr(
                f"substring(text, CAST((pno - 1) * {ETAG_PART} + 1 AS INT),"
                f" {ETAG_PART})"
            )
        ).alias("ph"),
    )
    parts.createOrReplaceTempView("etag_parts")
    return parts.sparkSession.sql(
        """
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_parts,
               concat(md5(listagg(ph, '') WITHIN GROUP (ORDER BY pno)),
                      '-', CAST(count(*) AS STRING)) AS etag
        FROM etag_parts GROUP BY doc_id
        """
    )
