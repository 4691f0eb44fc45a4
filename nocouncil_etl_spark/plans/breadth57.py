"""Breadth batch 37 (round 6): Cutler RSI, SES alpha grid search,
Newton-boosted stump, statistical cell suppression, champion-list
retrieval, community conductance.

Six operators (reference scope: momentum/volatility indicators on the
event stream, classical forecast model selection, XGBoost-style
second-order boosting, disclosure-control table publication, impact-
ordered index pruning for top-k search, and community-quality auditing
beyond modularity):

- ``window_rsi_cutler``           — 14-day Cutler RSI (SMA gains/losses)
  per event type with overbought/oversold counts.
- ``ts_ses_grid_alpha``           — simple-exponential-smoothing alpha
  selection by one-step-ahead SSE over a fixed alpha grid.
- ``ml_newton_boost_stump``       — two rounds of second-order (Newton)
  logloss boosting with histogram stumps and L2 leaf regularization.
- ``privacy_cell_suppression``    — primary + one-pass complementary
  suppression of a two-way frequency table (k = {SUP_K}).
- ``search_champion_lists``       — per-term champion lists (top-{CH_R}
  impact postings) vs exact top-{CH_K}: recall per query.
- ``graph_community_conductance`` — cut/volume conductance of the
  label-propagation communities (graph3's partition, audited).

Reference parity: north-star extension — no reference analogue
(the reference has no analytics layer) and its retrieval index is built once and reused
(`vectorize.py:119-123`); champion lists are the impact-ordered pruning
the same serving path needs at corpus scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nocouncil_etl_spark.io import fan_out, load
from nocouncil_etl_spark.plans.graph3 import LPA_ROUNDS, _lpa_cte_body, _lpa_labels
from nocouncil_etl_spark.plans.retrieval_plans import _TOK_SPARK, _TOK_SQL
from nocouncil_etl_spark.registry import query

RSI_WIN = 14  # Cutler RSI lookback (rolling SMA of gains/losses)
SES_ALPHAS_MILLI = (200, 350, 500, 650, 800)  # alpha grid, milli units
SES_LAGS = 12  # truncation depth of the SES weighted sum
NB_LAMBDA_MICRO = 1_000_000  # L2 leaf regularization (lambda = 1.0, micro)
NB_BAND_CENTS = 100_000  # histogram band width: 1000 currency units
SUP_K = 5  # minimum publishable cell count
CH_R = 50  # champion-list length per term
CH_K = 10  # result depth (top-k)
CH_QUERIES = (("join", "hash"), ("scan", "filter"), ("stream", "window"))


# --------------------------------------------------------------------------
# 1. Cutler RSI (SMA-based relative strength index)
# --------------------------------------------------------------------------


@query(
    "window_rsi_cutler",
    oracle=f"""
WITH s AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         sum(CAST(round(10000 * value) AS BIGINT)) AS v4
  FROM events WHERE value IS NOT NULL GROUP BY 1, 2
),
d AS (
  SELECT event_type, day, v4,
         v4 - lag(v4) OVER w AS delta,
         row_number() OVER w AS rn
  FROM s WINDOW w AS (PARTITION BY event_type ORDER BY day)
),
r AS (
  SELECT event_type, day,
         sum(greatest(delta, 0)) OVER w14 AS g,
         sum(greatest(-delta, 0)) OVER w14 AS l,
         rn
  FROM d WHERE delta IS NOT NULL
  WINDOW w14 AS (PARTITION BY event_type ORDER BY day
                 ROWS BETWEEN {RSI_WIN - 1} PRECEDING AND CURRENT ROW)
),
rsi AS (
  SELECT event_type, day,
         CASE WHEN g + l > 0
              THEN CAST(round(100000.0 * g / (g + l)) AS BIGINT) END AS rsi_milli,
         row_number() OVER (PARTITION BY event_type ORDER BY day DESC) AS rnd
  FROM r WHERE rn >= {RSI_WIN + 1}
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_days,
       CAST(sum(CASE WHEN rsi_milli > 70000 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_overbought,
       CAST(sum(CASE WHEN rsi_milli < 30000 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_oversold,
       CAST(round(CAST(sum(rsi_milli) AS DOUBLE) / count(rsi_milli)) AS BIGINT)
         AS mean_rsi_milli,
       CAST(max(CASE WHEN rnd = 1 THEN rsi_milli END) AS BIGINT)
         AS last_rsi_milli
FROM rsi GROUP BY event_type
""",
)
def window_rsi_cutler(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cutler's RSI-{RSI_WIN} per event type: daily totals on the exact
    1e-4 money grid, day-over-day deltas, {RSI_WIN}-row rolling sums of
    gains and losses (SMA form — non-recursive, unlike Wilder's, so the
    whole indicator is window-expressible and integer-exact), RSI =
    100·gain/(gain+loss) in milli-percent. Emits per-type evaluation-day
    counts, overbought (>70) / oversold (<30) day counts, the mean RSI,
    and the latest RSI. Rows without a full {RSI_WIN}-delta history are
    excluded (the full-frame rule every window op here uses).

    Scale shape: one hash agg to the daily grid, then one event_type
    partitioned window sort shared by the lag, both rolling sums, and
    the recency rank — days-per-type sized, never event-stream sized."""
    s = (
        load(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .groupBy("event_type", F.col("ts").cast("date").alias("day"))
        .agg(F.sum(F.round(10000 * F.col("value")).cast("long")).alias("v4"))
    )
    w = Window.partitionBy("event_type").orderBy("day")
    d = s.select(
        "event_type",
        "day",
        (F.col("v4") - F.lag("v4").over(w)).alias("delta"),
        F.row_number().over(w).alias("rn"),
    ).filter(F.col("delta").isNotNull())
    w14 = w.rowsBetween(-(RSI_WIN - 1), 0)
    r = d.select(
        "event_type",
        "day",
        F.sum(F.greatest(F.col("delta"), F.lit(0))).over(w14).alias("g"),
        F.sum(F.greatest(-F.col("delta"), F.lit(0))).over(w14).alias("l"),
        "rn",
    ).filter(F.col("rn") >= RSI_WIN + 1)
    wd = Window.partitionBy("event_type").orderBy(F.desc("day"))
    rsi = r.select(
        "event_type",
        F.when(
            F.col("g") + F.col("l") > 0,
            F.round(100000.0 * F.col("g") / (F.col("g") + F.col("l"))).cast(
                "long"
            ),
        ).alias("rsi_milli"),
        F.row_number().over(wd).alias("rnd"),
    )
    return rsi.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum(F.when(F.col("rsi_milli") > 70000, 1).otherwise(0))
        .cast("long")
        .alias("n_overbought"),
        F.sum(F.when(F.col("rsi_milli") < 30000, 1).otherwise(0))
        .cast("long")
        .alias("n_oversold"),
        F.round(
            F.sum("rsi_milli").cast("double") / F.count("rsi_milli")
        )
        .cast("long")
        .alias("mean_rsi_milli"),
        F.max(F.when(F.col("rnd") == 1, F.col("rsi_milli")))
        .cast("long")
        .alias("last_rsi_milli"),
    )


# --------------------------------------------------------------------------
# 2. SES alpha grid search
# --------------------------------------------------------------------------


def _ses_coefs(alpha_milli: int) -> list[float]:
    """Truncated SES weights alpha·(1−alpha)^j, j = 0..SES_LAGS−1, as
    plain doubles — embedded as identical literals in both engines."""
    a = alpha_milli / 1000.0
    return [a * (1.0 - a) ** j for j in range(SES_LAGS)]


def _ses_forecast_sql(alpha_milli: int) -> str:
    return " + ".join(
        f"{c!r} * lag(v4, {j + 1}) OVER w"
        for j, c in enumerate(_ses_coefs(alpha_milli))
    )


def _ses_oracle() -> str:
    arms = "\nUNION ALL\n".join(
        f"""SELECT event_type, {a} AS alpha_milli,
       CAST(sum(e * e) AS BIGINT) AS sse, CAST(count(*) AS BIGINT) AS n_eval
FROM (
  SELECT event_type,
         CAST(round(v4 - ({_ses_forecast_sql(a)})) AS BIGINT) AS e,
         row_number() OVER w AS rn,
         lag(v4, {SES_LAGS}) OVER w AS oldest
  FROM s WINDOW w AS (PARTITION BY event_type ORDER BY day)
) WHERE oldest IS NOT NULL GROUP BY event_type"""
        for a in SES_ALPHAS_MILLI
    )
    return f"""
WITH s AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         sum(CAST(round(10000 * value) AS BIGINT)) AS v4
  FROM events WHERE value IS NOT NULL GROUP BY 1, 2
),
arms AS (
{arms}
)
SELECT event_type, CAST(alpha_milli AS BIGINT) AS best_alpha_milli, sse, n_eval
FROM (
  SELECT *, row_number() OVER (PARTITION BY event_type
                               ORDER BY sse, alpha_milli) AS rk
  FROM arms
) WHERE rk = 1
"""


@query("ts_ses_grid_alpha", oracle=_ses_oracle())
def ts_ses_grid_alpha(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simple-exponential-smoothing model selection: for each event-type
    daily series, evaluate the one-step-ahead forecast under every alpha
    in {SES_ALPHAS_MILLI} (milli) and keep the alpha minimizing SSE (tie
    → smaller alpha). The SES recursion is truncated at {SES_LAGS} lags
    so the forecast is the finite sum Σ alpha(1−alpha)^j·y_{{t−1−j}} —
    identical literal coefficients on both engines (the ts_ema_fixedpoint
    technique) — and each error quantizes to the integer 1e-4 grid
    before squaring, making the SSE an exact BIGINT. This is the
    hyperparameter-sweep pattern: every candidate scores in one shared
    window pass, no per-candidate rescan of the raw stream.

    Scale shape: one hash agg to the daily grid; ONE window sort per
    series serves all {len(SES_ALPHAS_MILLI)} alpha arms ({SES_LAGS}
    shared lag() reads); the arm table is |types|×|grid| rows."""
    s = (
        load(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .groupBy("event_type", F.col("ts").cast("date").alias("day"))
        .agg(F.sum(F.round(10000 * F.col("value")).cast("long")).alias("v4"))
    )
    w = Window.partitionBy("event_type").orderBy("day")
    cols = ["event_type", "day", "v4"]
    lags = {j: F.lag("v4", j + 1).over(w) for j in range(SES_LAGS)}
    base = s.select(
        *cols,
        F.lag("v4", SES_LAGS).over(w).alias("oldest"),
        *[lags[j].alias(f"l{j}") for j in range(SES_LAGS)],
    ).filter(F.col("oldest").isNotNull())
    arms = None
    for a in SES_ALPHAS_MILLI:
        fc = None
        for j, c in enumerate(_ses_coefs(a)):
            term = F.lit(c) * F.col(f"l{j}")
            fc = term if fc is None else fc + term
        e = F.round(F.col("v4") - fc).cast("long")
        arm = base.groupBy("event_type").agg(
            F.sum(e * e).cast("long").alias("sse"),
            F.count(F.lit(1)).cast("long").alias("n_eval"),
        ).select(
            "event_type", F.lit(a).cast("long").alias("alpha_milli"), "sse", "n_eval"
        )
        arms = arm if arms is None else arms.unionByName(arm)
    rk = Window.partitionBy("event_type").orderBy("sse", "alpha_milli")
    return (
        arms.withColumn("rk", F.row_number().over(rk))
        .filter(F.col("rk") == 1)
        .select(
            "event_type",
            F.col("alpha_milli").alias("best_alpha_milli"),
            "sse",
            "n_eval",
        )
    )


# --------------------------------------------------------------------------
# 3. Newton-boosted histogram stump (second-order logloss boosting)
# --------------------------------------------------------------------------


def _nb_round_sql(k: int, margin: str) -> str:
    """CTE chain for Newton round ``k`` given per-row margin SQL (logit).
    Emits hist{k}/win{k}/best{k}/stump{k}; stump{k} has (t, wl, wr, gain)."""
    lam = NB_LAMBDA_MICRO
    return f"""
pr{k} AS (
  SELECT y, b, 1.0 / (1.0 + exp(-({margin}))) AS p FROM d
),
gh{k} AS (
  SELECT b,
         CAST(round(1000000 * (p - y)) AS BIGINT) AS g,
         CAST(round(1000000 * p * (1.0 - p)) AS BIGINT) AS h
  FROM pr{k}
),
hist{k} AS (
  SELECT b, CAST(count(*) AS BIGINT) AS c,
         sum(g) AS gg, sum(h) AS hh
  FROM gh{k} GROUP BY b
),
tot{k} AS (SELECT sum(c) AS ct, sum(gg) AS gt, sum(hh) AS ht FROM hist{k}),
win{k} AS (
  SELECT b,
         sum(c) OVER wb AS cl, sum(gg) OVER wb AS gl, sum(hh) OVER wb AS hl,
         (SELECT ct FROM tot{k}) AS ct,
         (SELECT gt FROM tot{k}) AS gt,
         (SELECT ht FROM tot{k}) AS ht
  FROM hist{k} WINDOW wb AS (ORDER BY b)
),
scored{k} AS (
  SELECT b, cl, gl, hl, gt - gl AS gr, ht - hl AS hr,
         CAST(round((
           CAST(gl AS DOUBLE) * gl / (hl + {lam})
           + CAST(gt - gl AS DOUBLE) * (gt - gl) / (ht - hl + {lam})
           - CAST(gt AS DOUBLE) * gt / (ht + {lam})) / 1000.0) AS BIGINT)
           AS gain_milli
  FROM win{k} WHERE cl < ct
),
best{k} AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (ORDER BY gain_milli DESC, b) AS rk
    FROM scored{k}
  ) WHERE rk = 1
),
stump{k} AS (
  SELECT b AS t, gain_milli,
         CAST(round(-1000000.0 * gl / (hl + {lam})) AS BIGINT) AS wl,
         CAST(round(-1000000.0 * gr / (hr + {lam})) AS BIGINT) AS wr
  FROM best{k}
)"""


def _nb_oracle() -> str:
    base_logit = "(SELECT ln(p0 / (1.0 - p0)) FROM m0)"
    m1 = base_logit
    m2 = (
        f"{base_logit} + (SELECT CASE WHEN d.b <= t THEN wl ELSE wr END"
        f" / 1000000.0 FROM stump1)"
    )
    # post-round margins for the logloss report
    post1 = (
        f"{base_logit} + (SELECT CASE WHEN d.b <= t THEN wl ELSE wr END"
        f" / 1000000.0 FROM stump1)"
    )
    post2 = (
        f"{post1} + (SELECT CASE WHEN d.b <= t THEN wl ELSE wr END"
        f" / 1000000.0 FROM stump2)"
    )

    def ll(margin: str) -> str:
        return f"""
  SELECT CAST(round(CAST(sum(CAST(round(1000000 * (
           CASE WHEN y = 1 THEN ln(1.0 + exp(-({margin})))
                ELSE ln(1.0 + exp(({margin}))) END)) AS BIGINT)) AS DOUBLE)
         / count(*)) AS BIGINT) AS avg_ll
  FROM d"""

    return f"""
WITH d AS (
  SELECT CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y,
         CAST(round(100 * l_extendedprice) AS BIGINT) // {NB_BAND_CENTS} AS b
  FROM lineitem
),
m0 AS (
  SELECT CAST(sum(y) AS DOUBLE) / count(*) AS p0 FROM d
),{_nb_round_sql(1, m1)},{_nb_round_sql(2, m2)},
ll1 AS ({ll(post1)}),
ll2 AS ({ll(post2)})
SELECT 1 AS round, CAST(t AS BIGINT) AS split_band, gain_milli,
       wl AS wl_micro, wr AS wr_micro,
       (SELECT avg_ll FROM ll1) AS avg_logloss_micro
FROM stump1
UNION ALL
SELECT 2, CAST(t AS BIGINT), gain_milli, wl, wr, (SELECT avg_ll FROM ll2)
FROM stump2
"""


@query("ml_newton_boost_stump", oracle=_nb_oracle())
def ml_newton_boost_stump(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two rounds of second-order (Newton) boosting with histogram
    stumps — the XGBoost training step: per-row gradient g = p−y and
    hessian h = p(1−p) of the logloss, quantized to exact micro
    integers; per-band sums; split gain = G_L²/(H_L+λ) + G_R²/(H_R+λ) −
    G²/(H+λ) with λ = {NB_LAMBDA_MICRO / 1e6}; leaf weights −G/(H+λ).
    Round 2's p comes from round 1's committed stump, so the hessian
    genuinely varies by leaf (the part first-order GBDT — see
    ml_gbdt_stump_rounds — doesn't have). Target: return-flag R on
    lineitem; feature: extended price in {NB_BAND_CENTS}-cent bands.
    Reports per round the chosen band, gain (milli), both leaf weights
    (micro), and the post-round mean logloss (micro, per-row quantized
    so the sum is exact).

    Scale shape: each round is one map-side-combined (band → G,H,c)
    histogram (≤ price-range/{NB_BAND_CENTS} groups), one cumulative
    window over that tiny table, and a 1-row broadcast stump — the
    residual vector never crosses the driver; margins/logloss are
    narrow column expressions over the fact scan."""
    lam = float(NB_LAMBDA_MICRO)
    d = load(spark, sf_dir, "lineitem").select(
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("y"),
        (
            F.floor(
                F.round(100 * F.col("l_extendedprice")).cast("long")
                / NB_BAND_CENTS
            )
        )
        .cast("long")
        .alias("b"),
    )
    m0 = d.agg(
        (F.sum("y").cast("double") / F.count(F.lit(1))).alias("p0")
    )
    base_logit = F.log(F.col("p0") / (1.0 - F.col("p0")))

    def fit_round(rows: DataFrame, margin) -> DataFrame:
        """rows must carry y, b (+ whatever margin needs); returns the
        1-row stump frame (t, gain_milli, wl, wr)."""
        p = 1.0 / (1.0 + F.exp(-margin))
        gh = rows.select(
            "b",
            F.round(1_000_000 * (p - F.col("y"))).cast("long").alias("g"),
            F.round(1_000_000 * p * (1.0 - p)).cast("long").alias("h"),
        )
        hist = gh.groupBy("b").agg(
            F.count(F.lit(1)).cast("long").alias("c"),
            F.sum("g").alias("gg"),
            F.sum("h").alias("hh"),
        )
        tot = hist.agg(
            F.sum("c").alias("ct"), F.sum("gg").alias("gt"), F.sum("hh").alias("ht")
        )
        wb = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, 0)
        win = (
            hist.select(
                "b",
                F.sum("c").over(wb).alias("cl"),
                F.sum("gg").over(wb).alias("gl"),
                F.sum("hh").over(wb).alias("hl"),
            )
            .crossJoin(F.broadcast(tot))
            .filter(F.col("cl") < F.col("ct"))
        )
        gl, hl = F.col("gl"), F.col("hl")
        gr, hr = F.col("gt") - gl, F.col("ht") - hl
        gain = F.round(
            (
                gl.cast("double") * gl / (hl + lam)
                + gr.cast("double") * gr / (hr + lam)
                - F.col("gt").cast("double") * F.col("gt") / (F.col("ht") + lam)
            )
            / 1000.0
        ).cast("long")
        scored = win.select(
            "b", gl.alias("glv"), hl.alias("hlv"),
            gr.alias("grv"), hr.alias("hrv"), gain.alias("gain_milli"),
        )
        rk = Window.orderBy(F.desc("gain_milli"), "b")
        return (
            scored.withColumn("rk", F.row_number().over(rk))
            .filter(F.col("rk") == 1)
            .select(
                F.col("b").alias("t"),
                "gain_milli",
                F.round(-1_000_000.0 * F.col("glv") / (F.col("hlv") + lam))
                .cast("long")
                .alias("wl"),
                F.round(-1_000_000.0 * F.col("grv") / (F.col("hrv") + lam))
                .cast("long")
                .alias("wr"),
            )
        )

    def avg_logloss(rows: DataFrame, margin) -> DataFrame:
        ll = F.when(
            F.col("y") == 1, F.log(1.0 + F.exp(-margin))
        ).otherwise(F.log(1.0 + F.exp(margin)))
        return rows.agg(
            F.round(
                F.sum(F.round(1_000_000 * ll).cast("long")).cast("double")
                / F.count(F.lit(1))
            )
            .cast("long")
            .alias("avg_ll")
        )

    d0 = d.crossJoin(F.broadcast(m0))
    stump1 = fit_round(d0, base_logit)
    s1 = stump1.select(
        F.col("t").alias("t1"), F.col("wl").alias("wl1"), F.col("wr").alias("wr1")
    )
    d1 = d0.crossJoin(F.broadcast(s1))
    m1 = base_logit + (
        F.when(F.col("b") <= F.col("t1"), F.col("wl1")).otherwise(F.col("wr1"))
        / 1_000_000.0
    )
    stump2 = fit_round(d1, m1)
    s2 = stump2.select(
        F.col("t").alias("t2"), F.col("wl").alias("wl2"), F.col("wr").alias("wr2")
    )
    d2 = d1.crossJoin(F.broadcast(s2))
    m2 = m1 + (
        F.when(F.col("b") <= F.col("t2"), F.col("wl2")).otherwise(F.col("wr2"))
        / 1_000_000.0
    )
    ll1 = avg_logloss(d1, m1)
    ll2 = avg_logloss(d2, m2)
    r1 = (
        stump1.crossJoin(F.broadcast(ll1))
        .select(
            F.lit(1).cast("int").alias("round"),
            F.col("t").cast("long").alias("split_band"),
            "gain_milli",
            F.col("wl").alias("wl_micro"),
            F.col("wr").alias("wr_micro"),
            F.col("avg_ll").alias("avg_logloss_micro"),
        )
    )
    r2 = (
        stump2.crossJoin(F.broadcast(ll2))
        .select(
            F.lit(2).cast("int").alias("round"),
            F.col("t").cast("long").alias("split_band"),
            "gain_milli",
            F.col("wl").alias("wl_micro"),
            F.col("wr").alias("wr_micro"),
            F.col("avg_ll").alias("avg_logloss_micro"),
        )
    )
    return r1.unionByName(r2)


# --------------------------------------------------------------------------
# 4. Statistical disclosure control: cell suppression
# --------------------------------------------------------------------------


@query(
    "privacy_cell_suppression",
    oracle=f"""
WITH cells AS (
  SELECT lang, source, CAST(count(*) AS BIGINT) AS n
  FROM documents GROUP BY 1, 2
),
prim AS (SELECT *, n < {SUP_K} AS p FROM cells),
rowc AS (
  SELECT *,
         sum(CASE WHEN p THEN 1 ELSE 0 END) OVER (PARTITION BY lang) AS rsupp,
         row_number() OVER (PARTITION BY lang ORDER BY p, n, source) AS rmin
  FROM prim
),
rows2 AS (
  SELECT lang, source, n, p,
         (NOT p AND rsupp = 1 AND rmin = 1) AS rcomp
  FROM rowc
),
colc AS (
  SELECT *,
         sum(CASE WHEN p OR rcomp THEN 1 ELSE 0 END)
           OVER (PARTITION BY source) AS csupp,
         row_number() OVER (PARTITION BY source
                            ORDER BY (p OR rcomp), n, lang) AS cmin
  FROM rows2
)
SELECT lang, source, n,
       CASE WHEN p THEN 'primary'
            WHEN rcomp THEN 'row_comp'
            WHEN csupp = 1 AND cmin = 1 THEN 'col_comp'
            ELSE 'ok' END AS status,
       CASE WHEN NOT p AND NOT rcomp AND NOT (csupp = 1 AND cmin = 1)
            THEN n END AS published
FROM colc
""",
)
def privacy_cell_suppression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical-disclosure-control publication of the lang × source
    frequency table: primary suppression of every cell below k={SUP_K},
    then one deterministic complementary pass — a row (lang) whose only
    suppression is primary gets its smallest remaining cell suppressed
    too (otherwise the row margin recovers the hidden value), then the
    same rule per column (source), counting both earlier kinds. Emits
    every cell with its status and the published (possibly withheld)
    count. One-pass complementary suppression is the standard cheap
    approximation of the NP-hard exact cell-suppression problem.

    Scale shape: the cell table is |langs|×|sources| (aggregate-sized);
    both passes are windows over that tiny table — the microdata is
    touched exactly once by the initial hash agg."""
    cells = (
        load(spark, sf_dir, "documents")
        .groupBy("lang", "source")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    prim = cells.withColumn("p", F.col("n") < SUP_K)
    wrow = Window.partitionBy("lang")
    rowc = prim.select(
        "lang",
        "source",
        "n",
        "p",
        F.sum(F.when(F.col("p"), 1).otherwise(0)).over(wrow).alias("rsupp"),
        F.row_number()
        .over(Window.partitionBy("lang").orderBy("p", "n", "source"))
        .alias("rmin"),
    )
    rows2 = rowc.select(
        "lang",
        "source",
        "n",
        "p",
        (~F.col("p") & (F.col("rsupp") == 1) & (F.col("rmin") == 1)).alias(
            "rcomp"
        ),
    )
    supped = F.col("p") | F.col("rcomp")
    wcol = Window.partitionBy("source")
    colc = rows2.select(
        "lang",
        "source",
        "n",
        "p",
        "rcomp",
        F.sum(F.when(supped, 1).otherwise(0)).over(wcol).alias("csupp"),
        F.row_number()
        .over(Window.partitionBy("source").orderBy(supped, "n", "lang"))
        .alias("cmin"),
    )
    ccomp = (F.col("csupp") == 1) & (F.col("cmin") == 1)
    return colc.select(
        "lang",
        "source",
        "n",
        F.when(F.col("p"), "primary")
        .when(F.col("rcomp"), "row_comp")
        .when(ccomp, "col_comp")
        .otherwise("ok")
        .alias("status"),
        F.when(~F.col("p") & ~F.col("rcomp") & ~ccomp, F.col("n")).alias(
            "published"
        ),
    )


# --------------------------------------------------------------------------
# 5. Champion-list retrieval
# --------------------------------------------------------------------------


def _ch_terms() -> list[str]:
    return sorted({t for q in CH_QUERIES for t in q})


def _ch_oracle() -> str:
    terms = ", ".join(f"'{t}'" for t in _ch_terms())
    qrows = ", ".join(
        f"({i}, '{a}'), ({i}, '{b}')" for i, (a, b) in enumerate(CH_QUERIES)
    )
    return f"""
WITH tok AS (
  SELECT doc_id, unnest({_TOK_SQL}) AS term FROM documents
),
nd AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n FROM tok),
tf AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
  FROM tok WHERE term IN ({terms}) GROUP BY 1, 2
),
df AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
post AS (
  SELECT tf.doc_id, tf.term,
         tf.tf * CAST(round(1000000 * ln(CAST((SELECT n FROM nd) AS DOUBLE)
                                         / df.df)) AS BIGINT) AS impact
  FROM tf JOIN df ON tf.term = df.term
),
champ AS (
  SELECT doc_id, term FROM (
    SELECT doc_id, term,
           row_number() OVER (PARTITION BY term
                              ORDER BY impact DESC, doc_id) AS rk
    FROM post
  ) WHERE rk <= {CH_R}
),
q(qid, term) AS (VALUES {qrows}),
exact AS (
  SELECT qid, doc_id FROM (
    SELECT q.qid, p.doc_id, sum(p.impact) AS score,
           row_number() OVER (PARTITION BY q.qid
                              ORDER BY sum(p.impact) DESC, p.doc_id) AS rk
    FROM q JOIN post p ON p.term = q.term
    GROUP BY q.qid, p.doc_id
  ) WHERE rk <= {CH_K}
),
cand AS (
  SELECT DISTINCT q.qid, c.doc_id
  FROM q JOIN champ c ON c.term = q.term
),
approx AS (
  SELECT qid, doc_id FROM (
    SELECT cd.qid, cd.doc_id, sum(p.impact) AS score,
           row_number() OVER (PARTITION BY cd.qid
                              ORDER BY sum(p.impact) DESC, cd.doc_id) AS rk
    FROM cand cd
    JOIN q ON q.qid = cd.qid
    JOIN post p ON p.term = q.term AND p.doc_id = cd.doc_id
    GROUP BY cd.qid, cd.doc_id
  ) WHERE rk <= {CH_K}
),
ncand AS (SELECT qid, CAST(count(*) AS BIGINT) AS n_candidates FROM cand GROUP BY qid)
SELECT e.qid AS query_id,
       nc.n_candidates,
       CAST(count(*) AS BIGINT) AS n_exact,
       CAST(sum(CASE WHEN a.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_hit,
       CAST(round(1000000.0 * sum(CASE WHEN a.doc_id IS NOT NULL THEN 1 ELSE 0 END)
                  / count(*)) AS BIGINT) AS recall_micro
FROM exact e
LEFT JOIN approx a ON a.qid = e.qid AND a.doc_id = e.doc_id
JOIN ncand nc ON nc.qid = e.qid
GROUP BY e.qid, nc.n_candidates
"""


@query("search_champion_lists", oracle=_ch_oracle())
def search_champion_lists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Champion-list (impact-ordered index pruning) retrieval: each
    term's postings are truncated to its top-{CH_R} docs by integer
    tf·idf impact; a query's candidate set is the union of its terms'
    champion lists, scored with FULL impacts and ranked; recall@{CH_K}
    is measured against the exact full-postings top-{CH_K}. The classic
    index-pruning trade: candidate work drops from Σ df(t) to ≤ |Q|·R
    postings per query while recall stays near 1 for disjunctive
    scoring. Queries: {CH_QUERIES}.

    Scale shape: champion lists are a per-term top-R window over the
    (term-filtered) postings — built once, reused by every query (the
    reference's build-once index discipline, vectorize.py:119-123); the
    query side joins a |Q|-row broadcast table; candidates per query are
    bounded by |Q|·{CH_R} regardless of corpus size."""
    docs = fan_out(load(spark, sf_dir, "documents"))
    tok = docs.select("doc_id", F.explode(F.expr(_TOK_SPARK)).alias("term"))
    nd = tok.agg(F.countDistinct("doc_id").cast("long").alias("n"))
    terms = _ch_terms()
    tf = (
        tok.filter(F.col("term").isin(*terms))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    df = tf.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df"))
    post = (
        tf.join(F.broadcast(df), "term")
        .crossJoin(F.broadcast(nd))
        .select(
            "doc_id",
            "term",
            (
                F.col("tf")
                * F.round(
                    1_000_000 * F.log(F.col("n").cast("double") / F.col("df"))
                ).cast("long")
            ).alias("impact"),
        )
    )
    wch = Window.partitionBy("term").orderBy(F.desc("impact"), "doc_id")
    champ = (
        post.withColumn("rk", F.row_number().over(wch))
        .filter(F.col("rk") <= CH_R)
        .select("doc_id", "term")
    )
    q = spark.createDataFrame(
        [(i, t) for i, pair in enumerate(CH_QUERIES) for t in pair],
        "qid int, term string",
    )
    wq = Window.partitionBy("qid").orderBy(F.desc("score"), "doc_id")
    exact = (
        F.broadcast(q)
        .join(post, "term")
        .groupBy("qid", "doc_id")
        .agg(F.sum("impact").alias("score"))
        .withColumn("rk", F.row_number().over(wq))
        .filter(F.col("rk") <= CH_K)
        .select("qid", "doc_id")
    )
    cand = (
        F.broadcast(q).join(champ, "term").select("qid", "doc_id").distinct()
    )
    approx = (
        cand.join(F.broadcast(q), "qid")
        .join(post, ["term", "doc_id"])
        .groupBy("qid", "doc_id")
        .agg(F.sum("impact").alias("score"))
        .withColumn("rk", F.row_number().over(wq))
        .filter(F.col("rk") <= CH_K)
        .select("qid", F.col("doc_id").alias("a_doc"))
    )
    ncand = cand.groupBy("qid").agg(
        F.count(F.lit(1)).cast("long").alias("n_candidates")
    )
    hit = F.sum(
        F.when(F.col("a_doc").isNotNull(), 1).otherwise(0)
    ).cast("long")
    return (
        exact.join(
            approx,
            (exact["qid"] == approx["qid"]) & (exact["doc_id"] == approx["a_doc"]),
            "left",
        )
        .drop(approx["qid"])
        .groupBy("qid")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_exact"),
            hit.alias("n_hit"),
        )
        .join(F.broadcast(ncand), "qid")
        .select(
            F.col("qid").cast("int").alias("query_id"),
            "n_candidates",
            "n_exact",
            "n_hit",
            F.round(1_000_000.0 * F.col("n_hit") / F.col("n_exact"))
            .cast("long")
            .alias("recall_micro"),
        )
    )


# --------------------------------------------------------------------------
# 6. Community conductance
# --------------------------------------------------------------------------


def _cond_oracle() -> str:
    return (
        _lpa_cte_body()
        + f""",
lab AS (SELECT node, lab FROM lab{LPA_ROUNDS}),
udeg AS (SELECT a AS node, CAST(count(*) AS BIGINT) AS deg FROM und GROUP BY a),
m2 AS (SELECT CAST(count(*) AS BIGINT) AS m2 FROM und),
vol AS (
  SELECT l.lab AS community, CAST(count(*) AS BIGINT) AS n_members,
         CAST(sum(coalesce(g.deg, 0)) AS BIGINT) AS vol
  FROM lab l LEFT JOIN udeg g ON g.node = l.node GROUP BY 1
),
cut AS (
  SELECT la.lab AS community, CAST(count(*) AS BIGINT) AS cut
  FROM und u
  JOIN lab la ON la.node = u.a
  JOIN lab lb ON lb.node = u.b
  WHERE la.lab <> lb.lab GROUP BY 1
)
SELECT v.community, v.n_members, v.vol,
       coalesce(c.cut, 0) AS cut,
       CASE WHEN least(v.vol, (SELECT m2 FROM m2) - v.vol) > 0
            THEN CAST(round(1000000.0 * coalesce(c.cut, 0)
                 / least(v.vol, (SELECT m2 FROM m2) - v.vol)) AS BIGINT)
       END AS conductance_micro
FROM vol v LEFT JOIN cut c ON c.community = v.community
WHERE v.n_members >= 2"""
    )


@query("graph_community_conductance", oracle=_cond_oracle())
def graph_community_conductance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conductance audit of the label-propagation partition (the same
    {LPA_ROUNDS}-round deterministic LPA as graph_label_propagation, so
    the partition being judged is the partition that was produced):
    φ(S) = cut(S) / min(vol(S), 2m − vol(S)) per community with ≥ 2
    members, in exact integer micro units — low φ means the community
    keeps its edges inside, the quality check modularity alone blurs
    (graph_modularity_score scores the whole partition; conductance
    localizes the weak communities).

    Scale shape: degrees and cut counts are hash aggs over the
    undirected edge list joined twice against the node→label table (all
    node-id partitioned equi-joins); per-community rollups are
    community-cardinality; 2m is a 1-row broadcast."""
    lab, und, _edges = _lpa_labels(spark, sf_dir)
    udeg = und.groupBy(F.col("a").alias("node")).agg(
        F.count(F.lit(1)).cast("long").alias("deg")
    )
    m2 = und.agg(F.count(F.lit(1)).cast("long").alias("m2"))
    vol = (
        lab.join(udeg, "node", "left")
        .groupBy(F.col("lab").alias("community"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_members"),
            F.sum(F.coalesce("deg", F.lit(0))).cast("long").alias("vol"),
        )
    )
    la = lab.select(F.col("node").alias("a"), F.col("lab").alias("la"))
    lb = lab.select(F.col("node").alias("b"), F.col("lab").alias("lb"))
    cut = (
        und.join(la, "a")
        .join(lb, "b")
        .filter(F.col("la") != F.col("lb"))
        .groupBy(F.col("la").alias("community"))
        .agg(F.count(F.lit(1)).cast("long").alias("cut"))
    )
    denom = F.least(F.col("vol"), F.col("m2") - F.col("vol"))
    return (
        vol.join(cut, "community", "left")
        .crossJoin(F.broadcast(m2))
        .filter(F.col("n_members") >= 2)
        .select(
            "community",
            "n_members",
            "vol",
            F.coalesce("cut", F.lit(0)).cast("long").alias("cut"),
            F.when(
                denom > 0,
                F.round(
                    1_000_000.0 * F.coalesce("cut", F.lit(0)) / denom
                ).cast("long"),
            ).alias("conductance_micro"),
        )
    )
