"""Breadth batch 51 (round 6): D'Hondt seats, Tukey HSD, probability
blending, madogram roughness, Mood's median test, worst-slice finder.

Six operators (reference scope: highest-averages apportionment, the
parametric post-hoc everyone reports, score ensembling by grid search,
fractal roughness estimation, the median-based k-sample test, and
error-analysis slice discovery):

- ``agg_dhondt_seats``     — D'Hondt highest-averages seat allocation
  of {DH_SEATS} seats by nation revenue.
- ``stat_tukey_hsd``       — Tukey studentized-range statistics for
  every event-type pair over pooled within-group variance.
- ``ml_blend_grid``        — convex blend of two calibrated rate models
  chosen by logloss over a weight grid.
- ``ts_madogram_roughness``— first-order variogram (madogram) over a
  lag grid with the log-log slope and fractal dimension.
- ``stat_mood_median``     — Mood's median test: above/below the global
  median per event type, chi-square.
- ``dq_worst_slices``      — the (type, weekday) slices with the worst
  seasonal-naive residuals, ranked.

Reference parity: north-star extension — no reference analogue
(the reference has no analytics layer); these are the audit layers a lake-scale engine
adds on the same tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nocouncil_etl_spark.io import load
from nocouncil_etl_spark.operators.quantiles import with_below
from nocouncil_etl_spark.registry import query

DH_SEATS = 20
BL_WS = (0, 250, 500, 750, 1000)  # blend weights, milli
MG_LAGS = (1, 2, 4, 8)
WS_TOP = 5


# --------------------------------------------------------------------------
# 1. D'Hondt seats
# --------------------------------------------------------------------------


@query(
    "agg_dhondt_seats",
    oracle=f"""
WITH votes AS (
  SELECT n.n_name AS nation,
         CAST(sum(CAST(round(100 * o.o_totalprice) AS BIGINT)) AS BIGINT) AS v
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  GROUP BY 1
),
quot AS (
  SELECT nation, v, k, CAST(v AS DOUBLE) / k AS q
  FROM votes, LATERAL (SELECT unnest(range(1, {DH_SEATS} + 1)) AS k)
),
top AS (
  SELECT nation FROM (
    SELECT nation, row_number() OVER (ORDER BY q DESC, nation, k) AS rn
    FROM quot
  ) WHERE rn <= {DH_SEATS}
),
seats AS (
  SELECT nation, CAST(count(*) AS BIGINT) AS seats FROM top GROUP BY nation
)
SELECT v.nation, v.v AS votes_cents,
       coalesce(s.seats, 0) AS seats,
       CAST(round(1000.0 * coalesce(s.seats, 0) / {DH_SEATS}) AS BIGINT)
         AS seat_share_milli
FROM votes v LEFT JOIN seats s ON s.nation = v.nation
""",
)
def agg_dhondt_seats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D'Hondt highest-averages apportionment of {DH_SEATS} seats by
    nation revenue: every party generates quotients v/1, v/2, ...,
    v/{DH_SEATS}; the {DH_SEATS} largest quotients win seats (ties →
    nation, divisor — a total order). The divisor method that
    complements agg_apportion_seats / largest-remainder
    (agg_apportion via quotas): D'Hondt slightly favors large parties
    and NEVER suffers the Alabama paradox. Quotients are the same
    exact-integer ratios on both engines.

    Scale shape: nation-grain vote agg; the quotient table is
    |parties|×{DH_SEATS} rows; one window ranks it."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    votes = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.sum(F.round(100 * F.col("o_totalprice")).cast("long"))
            .cast("long")
            .alias("v")
        )
    )
    quot = votes.select(
        "nation",
        "v",
        F.explode(F.expr(f"sequence(1, {DH_SEATS})")).alias("k"),
    ).withColumn("q", F.col("v").cast("double") / F.col("k"))
    top = (
        quot.withColumn(
            "rn",
            F.row_number().over(Window.orderBy(F.desc("q"), "nation", "k")),
        )
        .filter(F.col("rn") <= DH_SEATS)
        .groupBy("nation")
        .agg(F.count(F.lit(1)).cast("long").alias("seats"))
    )
    return votes.join(top, "nation", "left").select(
        "nation",
        F.col("v").alias("votes_cents"),
        F.coalesce("seats", F.lit(0)).cast("long").alias("seats"),
        F.round(1000.0 * F.coalesce("seats", F.lit(0)) / DH_SEATS)
        .cast("long")
        .alias("seat_share_milli"),
    )


# --------------------------------------------------------------------------
# 2. Tukey HSD
# --------------------------------------------------------------------------


@query(
    "stat_tukey_hsd",
    oracle="""
WITH d AS (
  SELECT event_type AS g, CAST(round(100 * value) AS BIGINT) AS y
  FROM events WHERE value IS NOT NULL
),
m AS (
  SELECT g, CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS s,
         CAST(sum(CAST(y AS HUGEINT) * y) AS DOUBLE) AS ss
  FROM d GROUP BY g
),
mse AS (
  SELECT sum(ss - CAST(s AS DOUBLE) * s / n) / (sum(n) - count(*)) AS mse,
         CAST(sum(n) - count(*) AS BIGINT) AS df
  FROM m
)
SELECT a.g AS group_a, b.g AS group_b,
       CAST(round(CAST(a.s AS DOUBLE) / a.n - CAST(b.s AS DOUBLE) / b.n)
            AS BIGINT) AS diff_cents,
       CAST(round(1000 * abs(CAST(a.s AS DOUBLE) / a.n
                             - CAST(b.s AS DOUBLE) / b.n)
                  / sqrt((SELECT mse FROM mse) / 2
                         * (1.0 / a.n + 1.0 / b.n))) AS BIGINT) AS q_milli,
       (SELECT df FROM mse) AS df_error
FROM m a JOIN m b ON a.g < b.g
""",
)
def stat_tukey_hsd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey HSD post-hoc: for every event-type pair, the studentized
    range statistic q = |ȳᵢ − ȳⱼ| / √(MSE/2·(1/nᵢ + 1/nⱼ))
    (Tukey-Kramer form for unequal n) with the pooled within-group MSE
    from exact integer moments — the parametric pairwise follow-up to
    stat_anova_f_oneway (which only says SOME pair differs), sibling of
    the nonparametric stat_dunn_posthoc. Reported against the error df;
    compare q to the studentized-range quantile offline.

    Scale shape: one 3-moment hash agg per group, a k²-row pair join of
    the tiny group table, scalar arithmetic."""
    d = (
        load(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            F.col("event_type").alias("g"),
            F.round(100 * F.col("value")).cast("long").alias("y"),
        )
    )
    m = d.groupBy("g").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").cast("long").alias("s"),
        F.sum((F.col("y").cast("decimal(38,0)") * F.col("y")))
        .cast("double")
        .alias("ss"),
    )
    mse = m.agg(
        (
            F.sum(
                F.col("ss") - F.col("s").cast("double") * F.col("s") / F.col("n")
            )
            / (F.sum("n") - F.count(F.lit(1)))
        ).alias("mse"),
        (F.sum("n") - F.count(F.lit(1))).cast("long").alias("df"),
    )
    a = m.select(
        F.col("g").alias("group_a"),
        F.col("n").alias("na"),
        F.col("s").alias("sa"),
    )
    b = m.select(
        F.col("g").alias("group_b"),
        F.col("n").alias("nb"),
        F.col("s").alias("sb"),
    )
    diff = F.col("sa").cast("double") / F.col("na") - F.col(
        "sb"
    ).cast("double") / F.col("nb")
    return (
        a.join(b, F.col("group_a") < F.col("group_b"))
        .crossJoin(F.broadcast(mse))
        .select(
            "group_a",
            "group_b",
            F.round(diff).cast("long").alias("diff_cents"),
            F.round(
                1000
                * F.abs(diff)
                / F.sqrt(
                    F.col("mse")
                    / 2
                    * (1.0 / F.col("na") + 1.0 / F.col("nb"))
                )
            )
            .cast("long")
            .alias("q_milli"),
            F.col("df").alias("df_error"),
        )
    )


# --------------------------------------------------------------------------
# 3. Blend grid
# --------------------------------------------------------------------------


def _bl_oracle() -> str:
    arms = "\nUNION ALL\n".join(
        f"""SELECT {w} AS w_milli,
       CAST(round(CAST(sum(CAST(round(1000000 * (
         CASE WHEN y = 1
              THEN -ln(({w} * p1 + {1000 - w} * p2) / 1000.0)
              ELSE -ln(1.0 - ({w} * p1 + {1000 - w} * p2) / 1000.0) END))
         AS BIGINT)) AS DOUBLE) / count(*)) AS BIGINT) AS logloss_micro
FROM scored"""
        for w in BL_WS
    )
    return f"""
WITH d AS (
  SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y,
         CAST(round(100 * value) AS BIGINT) // 2000 AS band,
         isodow(CAST(ts AS DATE)) AS dow
  FROM events WHERE value IS NOT NULL
),
m1 AS (
  SELECT band, sum(y) + 1.0 AS a, count(*) + 2.0 AS b FROM d GROUP BY band
),
m2 AS (
  SELECT dow, sum(y) + 1.0 AS a, count(*) + 2.0 AS b FROM d GROUP BY dow
),
scored AS (
  SELECT d.y, m1.a / m1.b AS p1, m2.a / m2.b AS p2
  FROM d JOIN m1 ON m1.band = d.band JOIN m2 ON m2.dow = d.dow
),
arms AS (
{arms}
)
SELECT w_milli, logloss_micro
FROM (SELECT *, row_number() OVER (ORDER BY logloss_micro, w_milli) AS rk
      FROM arms)
WHERE rk = 1
"""


@query("ml_blend_grid", oracle=_bl_oracle())
def ml_blend_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model blending by grid search: two Laplace-smoothed rate models
    of purchase propensity — P(y|value band) and P(y|weekday) — convex-
    combined with weight w from {BL_WS} milli, scored by mean logloss
    (per-row quantized to micro so the sum is exact), and the winning
    weight reported. The simplest honest ensemble (logistic stacking is
    ml_logistic_gd's job); the grid-over-shared-pass shape matches
    ts_ses_grid_alpha. Self-scored on the training pass — the
    out-of-fold variant plugs in ml_kfold_cv's complement trick.

    Scale shape: two tiny rate tables (broadcast joins), one scored
    scan shared by all arms, a |grid|-row argmin."""
    d = (
        load(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
            F.expr(
                "CAST(round(100 * value) AS BIGINT) div 2000"
            ).alias("band"),
            F.when(F.dayofweek(F.col("ts").cast("date")) == 1, 7)
            .otherwise(F.dayofweek(F.col("ts").cast("date")) - 1)
            .alias("dow"),
        )
    )
    m1 = d.groupBy("band").agg(
        ((F.sum("y") + 1.0) / (F.count(F.lit(1)) + 2.0)).alias("p1")
    )
    m2 = d.groupBy("dow").agg(
        ((F.sum("y") + 1.0) / (F.count(F.lit(1)) + 2.0)).alias("p2")
    )
    scored = d.join(F.broadcast(m1), "band").join(F.broadcast(m2), "dow")
    arms = None
    for w in BL_WS:
        p = (w * F.col("p1") + (1000 - w) * F.col("p2")) / 1000.0
        ll = F.when(F.col("y") == 1, -F.log(p)).otherwise(-F.log(1.0 - p))
        arm = scored.agg(
            F.lit(w).cast("long").alias("w_milli"),
            F.round(
                F.sum(F.round(1_000_000 * ll).cast("long")).cast("double")
                / F.count(F.lit(1))
            )
            .cast("long")
            .alias("logloss_micro"),
        ).select("w_milli", "logloss_micro")
        arms = arm if arms is None else arms.unionByName(arm)
    return (
        arms.withColumn(
            "rk",
            F.row_number().over(Window.orderBy("logloss_micro", "w_milli")),
        )
        .filter(F.col("rk") == 1)
        .select("w_milli", "logloss_micro")
    )


# --------------------------------------------------------------------------
# 4. Madogram roughness
# --------------------------------------------------------------------------


def _mg_oracle() -> str:
    gammas = ", ".join(
        f"""(SELECT CAST(round(CAST(sum(abs(v4 - l{h})) AS DOUBLE)
             / count(*)) AS BIGINT)
     FROM lagged WHERE l{h} IS NOT NULL) AS g{h}"""
        for h in MG_LAGS
    )
    lags = ", ".join(f"lag(v4, {h}) OVER w AS l{h}" for h in MG_LAGS)
    # log-log OLS over the 4 (ln h, ln gamma) points, micro-quantized
    pt_rows = "\nUNION ALL\n".join(
        f"""SELECT CAST(round(1000000 * ln({h}.0)) AS BIGINT) AS x,
       CAST(round(1000000 * ln(CAST((SELECT g{h} FROM g) AS DOUBLE)))
            AS BIGINT) AS y"""
        for h in MG_LAGS
    )
    return f"""
WITH s AS (
  SELECT CAST(ts AS DATE) AS day,
         sum(CAST(round(10000 * value) AS BIGINT)) AS v4
  FROM events WHERE value IS NOT NULL GROUP BY 1
),
lagged AS (
  SELECT v4, {lags} FROM s WINDOW w AS (ORDER BY day)
),
g AS (SELECT {gammas}),
pts AS (
{pt_rows}
),
mom AS (
  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS sx,
         CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(CAST(x AS HUGEINT) * y) AS DOUBLE) AS sxy,
         CAST(sum(CAST(x AS HUGEINT) * x) AS DOUBLE) AS sxx
  FROM pts
)
SELECT (SELECT g1 FROM g) AS gamma_1, (SELECT g2 FROM g) AS gamma_2,
       (SELECT g4 FROM g) AS gamma_4, (SELECT g8 FROM g) AS gamma_8,
       CAST(round(1000 * (n * sxy - CAST(sx AS DOUBLE) * sy)
                  / (n * sxx - CAST(sx AS DOUBLE) * sx)) AS BIGINT)
         AS slope_milli,
       CAST(round(1000 * (2 - (n * sxy - CAST(sx AS DOUBLE) * sy)
                  / (n * sxx - CAST(sx AS DOUBLE) * sx))) AS BIGINT)
         AS fractal_dim_milli
FROM mom
"""


@query("ts_madogram_roughness", oracle=_mg_oracle())
def ts_madogram_roughness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Madogram (first-order variogram) roughness of the daily total:
    γ(h) = mean |x_{{t+h}} − x_t| over the lag grid {MG_LAGS}, then the
    log-log slope gives the Hölder exponent and fractal dimension
    D = 2 − slope (Gneiting 2012 — the madogram is the robust
    variogram; ts_hurst_rs estimates the same roughness via rescaled
    ranges, and disagreement between the two flags nonstationarity).
    γ values are exact integer means; the 4-point OLS runs on
    micro-quantized logs.

    Scale shape: ONE calendar-frame window sort serves all lags; per-h
    aggregates are scalar; the fit is 4-point arithmetic."""
    s = (
        load(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .groupBy(F.col("ts").cast("date").alias("day"))
        .agg(F.sum(F.round(10000 * F.col("value")).cast("long")).alias("v4"))
    )
    w = Window.orderBy("day")
    lagged = s.select(
        "v4", *[F.lag("v4", h).over(w).alias(f"l{h}") for h in MG_LAGS]
    )
    gs = {}
    for h in MG_LAGS:
        gs[h] = int(
            lagged.filter(F.col(f"l{h}").isNotNull())
            .agg(
                F.round(
                    F.sum(F.abs(F.col("v4") - F.col(f"l{h}"))).cast("double")
                    / F.count(F.lit(1))
                )
                .cast("long")
                .alias("g")
            )
            .first()
            .g
        )
    import math

    def rha(x: float) -> int:
        """Round half away from zero — SQL round(), not Python's
        banker's rounding."""
        return int(math.floor(x + 0.5)) if x >= 0 else int(math.ceil(x - 0.5))

    pts = [
        (rha(1_000_000 * math.log(h)), rha(1_000_000 * math.log(gs[h])))
        for h in MG_LAGS
    ]
    n = len(pts)
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxy = float(sum(x * y for x, y in pts))
    sxx = float(sum(x * x for x, _ in pts))
    slope = (n * sxy - float(sx) * sy) / (n * sxx - float(sx) * sx)
    rows = [
        (
            gs[1],
            gs[2],
            gs[4],
            gs[8],
            rha(1000 * slope),
            rha(1000 * (2 - slope)),
        )
    ]
    return spark.createDataFrame(
        rows,
        "gamma_1 long, gamma_2 long, gamma_4 long, gamma_8 long, "
        "slope_milli long, fractal_dim_milli long",
    )


# --------------------------------------------------------------------------
# 5. Mood's median test
# --------------------------------------------------------------------------


@query(
    "stat_mood_median",
    oracle="""
WITH v AS (
  SELECT event_id, event_type, CAST(round(100 * value) AS BIGINT) AS x
  FROM events WHERE value IS NOT NULL
),
r AS (
  SELECT event_type, x,
         row_number() OVER (ORDER BY x, event_id) AS rn,
         count(*) OVER () AS n
  FROM v
),
med AS (
  SELECT max(CASE WHEN rn = CAST(ceil(n / 2.0) AS BIGINT) THEN x END) AS m
  FROM r
),
cls AS (
  SELECT event_type,
         CASE WHEN x > (SELECT m FROM med) THEN 1 ELSE 0 END AS above
  FROM v
),
tab AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(above) AS BIGINT) AS n_above
  FROM cls GROUP BY event_type
),
tot AS (SELECT sum(n) AS nn, sum(n_above) AS na FROM tab)
SELECT event_type, n, n_above,
       CAST(n - n_above AS BIGINT) AS n_below_eq,
       CAST(round(1000000.0
            * (n_above - n * CAST((SELECT na FROM tot) AS DOUBLE)
               / (SELECT nn FROM tot))
            * (n_above - n * CAST((SELECT na FROM tot) AS DOUBLE)
               / (SELECT nn FROM tot))
            / (n * CAST((SELECT na FROM tot) AS DOUBLE) / (SELECT nn FROM tot))
            + 1000000.0
            * ((n - n_above) - n * (1.0 - CAST((SELECT na FROM tot) AS DOUBLE)
               / (SELECT nn FROM tot)))
            * ((n - n_above) - n * (1.0 - CAST((SELECT na FROM tot) AS DOUBLE)
               / (SELECT nn FROM tot)))
            / (n * (1.0 - CAST((SELECT na FROM tot) AS DOUBLE)
               / (SELECT nn FROM tot)))) AS BIGINT) AS chi2_term_micro
FROM tab
""",
)
def stat_mood_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mood's median test: the grand median (exact ⌈n/2⌉ order
    statistic, ties resolved by the (value, id) total order) splits
    every event type into above vs at-or-below; each type's chi-square
    contribution against expected proportions measures median
    disagreement — the crudest but most assumption-free k-sample
    location test (stat_kruskal_wallis uses full ranks; this only
    needs the median, which is why it survives gross outliers and
    interval censoring). Per-type terms quantized to micro.

    Scale shape (r7): the grand median comes from the distinct-value
    histogram + Fenwick prefix counts (min value whose inclusive
    cumulative count reaches ⌈n/2⌉) — no global rank window over the raw
    rows; then one type hash agg, scalar terms."""
    v = (
        load(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            "event_id",
            "event_type",
            F.round(100 * F.col("value")).cast("long").alias("x"),
        )
    )
    byv = v.groupBy("x").agg(F.count(F.lit(1)).cast("long").alias("c"))
    cum = with_below(byv, "x", "c")
    tot_n = byv.agg(F.sum("c").cast("long").alias("n"))
    med = (
        cum.crossJoin(F.broadcast(tot_n))
        .filter(
            F.col("below") + F.col("c")
            >= F.ceil(F.col("n") / 2.0).cast("long")
        )
        .agg(F.min("x").alias("m"))
    )
    cls = v.crossJoin(F.broadcast(med)).select(
        "event_type",
        F.when(F.col("x") > F.col("m"), 1).otherwise(0).alias("above"),
    )
    tab = cls.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("above").cast("long").alias("n_above"),
    )
    tot = tab.agg(F.sum("n").alias("nn"), F.sum("n_above").alias("na"))
    pa = F.col("na").cast("double") / F.col("nn")
    ea = F.col("n") * pa
    eb = F.col("n") * (1.0 - pa)
    oa = F.col("n_above")
    ob = F.col("n") - F.col("n_above")
    return tab.crossJoin(F.broadcast(tot)).select(
        "event_type",
        "n",
        "n_above",
        ob.cast("long").alias("n_below_eq"),
        F.round(
            1_000_000.0 * (oa - ea) * (oa - ea) / ea
            + 1_000_000.0 * (ob - eb) * (ob - eb) / eb
        )
        .cast("long")
        .alias("chi2_term_micro"),
    )


# --------------------------------------------------------------------------
# 6. Worst slices
# --------------------------------------------------------------------------


@query(
    "dq_worst_slices",
    oracle=f"""
WITH s AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         isodow(CAST(ts AS DATE)) AS dow,
         sum(CAST(round(10000 * value) AS BIGINT)) AS v4
  FROM events WHERE value IS NOT NULL GROUP BY 1, 2, 3
),
res AS (
  SELECT event_type, dow,
         abs(v4 - lag(v4, 7) OVER (PARTITION BY event_type ORDER BY day))
           AS ae
  FROM s
),
sl AS (
  SELECT event_type, dow, CAST(count(*) AS BIGINT) AS n,
         CAST(round(CAST(sum(ae) AS DOUBLE) / count(*)) AS BIGINT)
           AS mean_abs_err
  FROM res WHERE ae IS NOT NULL GROUP BY 1, 2
)
SELECT event_type, dow, n, mean_abs_err,
       CAST(rk AS BIGINT) AS rank
FROM (SELECT *, row_number() OVER (ORDER BY mean_abs_err DESC, event_type,
                                   dow) AS rk
      FROM sl)
WHERE rk <= {WS_TOP}
""",
)
def dq_worst_slices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Worst-slice finder (the SliceFinder/error-analysis pattern): the
    daily series' seasonal-naive (t−7) absolute residuals roll up into
    (event type × weekday) slices, and the {WS_TOP} slices with the
    largest mean error surface — the answer to 'WHERE is the model/
    pipeline bad?' that aggregate metrics (eval_forecast_error_suite)
    average away. Slice means are exact integer ratios; ranking ties
    break on the slice key.

    Scale shape: the residual pass is one per-type lag window on the
    daily grid; slices are a tiny hash agg; TakeOrdered caps output."""
    s = (
        load(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .groupBy(
            "event_type",
            F.col("ts").cast("date").alias("day"),
            F.when(F.dayofweek(F.col("ts").cast("date")) == 1, 7)
            .otherwise(F.dayofweek(F.col("ts").cast("date")) - 1)
            .alias("dow"),
        )
        .agg(F.sum(F.round(10000 * F.col("value")).cast("long")).alias("v4"))
    )
    w = Window.partitionBy("event_type").orderBy("day")
    res = s.select(
        "event_type",
        "dow",
        F.abs(F.col("v4") - F.lag("v4", 7).over(w)).alias("ae"),
    ).filter(F.col("ae").isNotNull())
    sl = res.groupBy("event_type", "dow").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.round(F.sum("ae").cast("double") / F.count(F.lit(1)))
        .cast("long")
        .alias("mean_abs_err"),
    )
    return (
        sl.withColumn(
            "rank",
            F.row_number()
            .over(Window.orderBy(F.desc("mean_abs_err"), "event_type", "dow"))
            .cast("long"),
        )
        .filter(F.col("rank") <= WS_TOP)
        .select("event_type", "dow", "n", "mean_abs_err", "rank")
    )
