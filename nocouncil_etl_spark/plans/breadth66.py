"""Breadth batch 46 (round 6): Henderson trend filter, hot/cold
tiering, high-watermark fees, permutation entropy, Cochran's Q,
Kendall's W.

Six operators (reference scope: official-statistics trend smoothing,
storage lifecycle planning, financial fee accounting on a running
maximum, ordinal time-series complexity, binary repeated-measures
testing, and rater-concordance effect size):

- ``ts_henderson_trend``     — 13-term Henderson moving average of the
  daily total (the X-11/X-13 trend kernel), integer-exact terms.
- ``io_hot_cold_tiering``    — partition age-based hot/warm/cold
  tiering plan with per-tier size accounting.
- ``agg_high_watermark_fees``— performance fees accrued only above the
  running NAV watermark (exact CUSUM-style integers).
- ``ts_permutation_entropy`` — Bandt-Pompe ordinal-pattern entropy of
  the daily series (order 3).
- ``stat_cochran_q``         — Cochran's Q for binary repeated measures
  (did each user purchase on weekday j?).
- ``stat_kendall_w``         — Kendall's coefficient of concordance
  over event-type blocks ranking weekdays.

Reference parity: north-star extension — no reference analogue
(the reference has no analytics layer); these are the audit layers a lake-scale engine
adds on the same tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nocouncil_etl_spark.io import load
from nocouncil_etl_spark.registry import query

# standard 13-term Henderson filter weights (symmetric)
HENDERSON_13 = (
    -0.01935, -0.02786, 0.0, 0.06549, 0.14736, 0.21434, 0.24006,
    0.21434, 0.14736, 0.06549, 0.0, -0.02786, -0.01935,
)
TIER_HOT_MONTHS = 3
TIER_WARM_MONTHS = 12
TIER_ROW_BYTES = 128
HWM_FEE_NUM, HWM_FEE_DEN = 1, 5  # 20% performance fee


# --------------------------------------------------------------------------
# 1. Henderson 13-term trend
# --------------------------------------------------------------------------


def _henderson_terms(lead_fn: str, lag_fn: str) -> str:
    terms = []
    for j, wgt in enumerate(HENDERSON_13):
        off = j - 6
        if off < 0:
            terms.append(f"CAST(round({wgt!r} * {lag_fn}(v4, {-off}) OVER w) AS BIGINT)")
        elif off > 0:
            terms.append(f"CAST(round({wgt!r} * {lead_fn}(v4, {off}) OVER w) AS BIGINT)")
        else:
            terms.append(f"CAST(round({wgt!r} * v4) AS BIGINT)")
    return " + ".join(terms)


@query(
    "ts_henderson_trend",
    oracle=f"""
WITH s AS (
  SELECT CAST(ts AS DATE) AS day,
         sum(CAST(round(10000 * value) AS BIGINT)) AS v4
  FROM events WHERE value IS NOT NULL GROUP BY 1
),
t AS (
  SELECT day, v4,
         {_henderson_terms("lead", "lag")} AS trend,
         lag(v4, 6) OVER w AS oldest, lead(v4, 6) OVER w AS newest
  FROM s WINDOW w AS (ORDER BY day)
)
SELECT CAST(day AS VARCHAR) AS day, CAST(v4 AS BIGINT) AS v4,
       CAST(trend AS BIGINT) AS trend_v4,
       CAST(v4 - trend AS BIGINT) AS residual_v4
FROM t WHERE oldest IS NOT NULL AND newest IS NOT NULL
""",
)
def ts_henderson_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """13-term Henderson moving average of the daily total — the trend
    kernel inside X-11/X-13-ARIMA seasonal adjustment (the weights
    minimize third-difference variance, so cubic local trends pass
    undistorted while noise is crushed). Each weighted term quantizes
    to the integer 1e-4 grid BEFORE the sum (identical literal weights
    on both engines), and only full 13-day windows emit — the
    ts_ema_fixedpoint discipline applied to the official-statistics
    smoother. Residual = observed − trend feeds outlier review.

    Scale shape: one hash agg to the calendar frame, ONE window sort
    shared by all 13 taps (documented single-series global window)."""
    s = (
        load(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .groupBy(F.col("ts").cast("date").alias("day"))
        .agg(F.sum(F.round(10000 * F.col("value")).cast("long")).alias("v4"))
    )
    w = Window.orderBy("day")
    trend = None
    for j, wgt in enumerate(HENDERSON_13):
        off = j - 6
        if off < 0:
            term = F.round(F.lit(wgt) * F.lag("v4", -off).over(w)).cast("long")
        elif off > 0:
            term = F.round(F.lit(wgt) * F.lead("v4", off).over(w)).cast("long")
        else:
            term = F.round(F.lit(wgt) * F.col("v4")).cast("long")
        trend = term if trend is None else trend + term
    t = s.select(
        "day",
        "v4",
        trend.alias("trend"),
        F.lag("v4", 6).over(w).alias("oldest"),
        F.lead("v4", 6).over(w).alias("newest"),
    )
    return t.filter(
        F.col("oldest").isNotNull() & F.col("newest").isNotNull()
    ).select(
        F.col("day").cast("string").alias("day"),
        "v4",
        F.col("trend").cast("long").alias("trend_v4"),
        (F.col("v4") - F.col("trend")).cast("long").alias("residual_v4"),
    )


# --------------------------------------------------------------------------
# 2. Hot/cold tiering
# --------------------------------------------------------------------------


@query(
    "io_hot_cold_tiering",
    oracle=f"""
WITH part AS (
  SELECT strftime(o_orderdate, '%Y-%m') AS mon,
         CAST(count(*) AS BIGINT) AS n_rows,
         CAST(sum(CAST(round(100 * o_totalprice) AS BIGINT)) AS BIGINT) AS rev_c
  FROM orders GROUP BY 1
),
mx AS (
  SELECT max(CAST(substr(mon, 1, 4) AS BIGINT) * 12
             + CAST(substr(mon, 6, 2) AS BIGINT)) AS mtop
  FROM part
),
aged AS (
  SELECT mon, n_rows, rev_c,
         (SELECT mtop FROM mx)
         - (CAST(substr(mon, 1, 4) AS BIGINT) * 12
            + CAST(substr(mon, 6, 2) AS BIGINT)) AS age_months
  FROM part
),
tiered AS (
  SELECT CASE WHEN age_months <= {TIER_HOT_MONTHS} THEN 'hot'
              WHEN age_months <= {TIER_WARM_MONTHS} THEN 'warm'
              ELSE 'cold' END AS tier,
         n_rows, rev_c
  FROM aged
),
tot AS (SELECT sum(n_rows) AS total_rows FROM tiered)
SELECT tier,
       CAST(count(*) AS BIGINT) AS n_partitions,
       CAST(sum(n_rows) AS BIGINT) AS rows_,
       CAST(sum(n_rows) * {TIER_ROW_BYTES} AS BIGINT) AS est_bytes,
       CAST(round(1000.0 * sum(n_rows) / (SELECT total_rows FROM tot))
            AS BIGINT) AS pct_rows_milli
FROM tiered GROUP BY tier
""",
)
def io_hot_cold_tiering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot/warm/cold storage tiering plan for monthly order partitions:
    age in months from the newest partition classifies each into hot
    (≤{TIER_HOT_MONTHS}), warm (≤{TIER_WARM_MONTHS}) or cold, with
    per-tier partition counts, rows, estimated bytes
    ({TIER_ROW_BYTES} B/row proxy) and the row share — the lifecycle-
    policy input every lakehouse table eventually needs (hot on NVMe,
    warm on object storage, cold on archive class). Month arithmetic is
    pure integer (y·12+m), so tier boundaries are engine-exact.

    Scale shape: one partition-grain hash agg (metadata-sized), 1-row
    max broadcast, a 3-group rollup."""
    part = (
        load(spark, sf_dir, "orders")
        .groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("mon"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum(F.round(100 * F.col("o_totalprice")).cast("long"))
            .cast("long")
            .alias("rev_c"),
        )
    )
    mkey = (
        F.substring("mon", 1, 4).cast("long") * 12
        + F.substring("mon", 6, 2).cast("long")
    )
    part = part.withColumn("mkey", mkey)
    mx = part.agg(F.max("mkey").alias("mtop"))
    aged = part.crossJoin(F.broadcast(mx)).withColumn(
        "age_months", F.col("mtop") - F.col("mkey")
    )
    tiered = aged.select(
        F.when(F.col("age_months") <= TIER_HOT_MONTHS, "hot")
        .when(F.col("age_months") <= TIER_WARM_MONTHS, "warm")
        .otherwise("cold")
        .alias("tier"),
        "n_rows",
    )
    tot = tiered.agg(F.sum("n_rows").alias("total_rows"))
    return (
        tiered.groupBy("tier")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_partitions"),
            F.sum("n_rows").cast("long").alias("rows_"),
            (F.sum("n_rows") * TIER_ROW_BYTES).cast("long").alias("est_bytes"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "tier",
            "n_partitions",
            "rows_",
            "est_bytes",
            F.round(1000.0 * F.col("rows_") / F.col("total_rows"))
            .cast("long")
            .alias("pct_rows_milli"),
        )
    )


# --------------------------------------------------------------------------
# 3. High-watermark performance fees
# --------------------------------------------------------------------------


@query(
    "agg_high_watermark_fees",
    oracle=f"""
WITH m AS (
  SELECT strftime(o_orderdate, '%Y-%m') AS mon,
         CAST(sum(CAST(round(100 * o_totalprice) AS BIGINT)) AS BIGINT) AS rev
  FROM orders GROUP BY 1
),
tot AS (SELECT CAST(sum(rev) AS BIGINT) AS t, CAST(count(*) AS BIGINT) AS k FROM m),
nav AS (
  SELECT mon,
         sum(rev * (SELECT k FROM tot) - (SELECT t FROM tot))
           OVER (ORDER BY mon ROWS BETWEEN UNBOUNDED PRECEDING
                 AND CURRENT ROW) AS nav
  FROM m
),
wm AS (
  SELECT mon, nav,
         max(nav) OVER (ORDER BY mon ROWS BETWEEN UNBOUNDED PRECEDING
                        AND CURRENT ROW) AS watermark,
         coalesce(max(nav) OVER (ORDER BY mon ROWS BETWEEN UNBOUNDED
                                 PRECEDING AND 1 PRECEDING), nav) AS prev_wm
  FROM nav
)
SELECT mon, CAST(nav AS BIGINT) AS nav,
       CAST(watermark AS BIGINT) AS watermark,
       CAST(greatest(nav - prev_wm, 0) * {HWM_FEE_NUM} // {HWM_FEE_DEN}
            AS BIGINT) AS fee
FROM wm
""",
)
def agg_high_watermark_fees(spark: SparkSession, sf_dir: str) -> DataFrame:
    """High-watermark performance fees on the monthly revenue NAV: the
    NAV series is the exactly-integer CUSUM of centered monthly revenue
    (rev·k − total — the ts_cusum_changepoint device, so it genuinely
    rises AND falls), the watermark is its running maximum, and the
    {HWM_FEE_NUM * 100 // HWM_FEE_DEN}% fee accrues ONLY on the excess
    over the PREVIOUS watermark — the hedge-fund accounting rule that
    prevents charging twice for recovering a drawdown. First month pays
    nothing by the prev-watermark convention.

    Scale shape: month-grain hash agg, one ordered window serving the
    CUSUM, running max, and lagged max (calendar-sized)."""
    m = (
        load(spark, sf_dir, "orders")
        .groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("mon"))
        .agg(
            F.sum(F.round(100 * F.col("o_totalprice")).cast("long"))
            .cast("long")
            .alias("rev")
        )
    )
    tot = m.agg(
        F.sum("rev").cast("long").alias("t"),
        F.count(F.lit(1)).cast("long").alias("k"),
    )
    w = Window.orderBy("mon").rowsBetween(Window.unboundedPreceding, 0)
    wprev = Window.orderBy("mon").rowsBetween(Window.unboundedPreceding, -1)
    nav = m.crossJoin(F.broadcast(tot)).select(
        "mon",
        F.sum(F.col("rev") * F.col("k") - F.col("t")).over(w).alias("nav"),
    )
    wm = nav.select(
        "mon",
        "nav",
        F.max("nav").over(w).alias("watermark"),
        F.coalesce(F.max("nav").over(wprev), F.col("nav")).alias("prev_wm"),
    )
    return wm.select(
        "mon",
        F.col("nav").cast("long").alias("nav"),
        F.col("watermark").cast("long").alias("watermark"),
        F.expr(
            f"greatest(nav - prev_wm, 0) * {HWM_FEE_NUM} div {HWM_FEE_DEN}"
        )
        .cast("long")
        .alias("fee"),
    )


# --------------------------------------------------------------------------
# 4. Permutation entropy
# --------------------------------------------------------------------------


@query(
    "ts_permutation_entropy",
    oracle="""
WITH s AS (
  SELECT CAST(ts AS DATE) AS day,
         sum(CAST(round(10000 * value) AS BIGINT)) AS v4
  FROM events WHERE value IS NOT NULL GROUP BY 1
),
tri AS (
  SELECT v4 AS v0, lead(v4, 1) OVER w AS v1, lead(v4, 2) OVER w AS v2
  FROM s WINDOW w AS (ORDER BY day)
),
pat AS (
  SELECT (CASE WHEN v0 <= v1 THEN 4 ELSE 0 END)
         + (CASE WHEN v0 <= v2 THEN 2 ELSE 0 END)
         + (CASE WHEN v1 <= v2 THEN 1 ELSE 0 END) AS code
  FROM tri WHERE v2 IS NOT NULL
),
cnt AS (SELECT code, CAST(count(*) AS BIGINT) AS c FROM pat GROUP BY code),
tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM cnt),
terms AS (
  SELECT CAST(round(1000000.0 * c / (SELECT n FROM tot)
                    * ln(CAST((SELECT n FROM tot) AS DOUBLE) / c)) AS BIGINT)
           AS h_micro
  FROM cnt
)
SELECT (SELECT n FROM tot) AS n_triples,
       (SELECT CAST(count(*) AS BIGINT) FROM cnt) AS n_patterns,
       CAST(sum(h_micro) AS BIGINT) AS entropy_micro,
       CAST(round(CAST(sum(h_micro) AS DOUBLE) / ln(6) / 1000) AS BIGINT)
         AS normalized_milli
FROM terms
""",
)
def ts_permutation_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bandt-Pompe permutation entropy (order 3) of the daily total:
    each consecutive triple maps to its ordinal pattern (earlier-wins
    tie rule via <= — a total order, so both engines code ties
    identically), and H = −Σ p ln p over the pattern distribution —
    the complexity measure that separates noise (H → ln 6) from
    deterministic structure (H → 0) while ignoring amplitude entirely.
    Per-pattern terms quantize to micro-nats before the ≤6-term sum.

    Scale shape: one calendar-frame window for the two leads, a ≤6-row
    hash agg, scalar arithmetic."""
    s = (
        load(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .groupBy(F.col("ts").cast("date").alias("day"))
        .agg(F.sum(F.round(10000 * F.col("value")).cast("long")).alias("v4"))
    )
    w = Window.orderBy("day")
    tri = s.select(
        F.col("v4").alias("v0"),
        F.lead("v4", 1).over(w).alias("v1"),
        F.lead("v4", 2).over(w).alias("v2"),
    ).filter(F.col("v2").isNotNull())
    code = (
        F.when(F.col("v0") <= F.col("v1"), 4).otherwise(0)
        + F.when(F.col("v0") <= F.col("v2"), 2).otherwise(0)
        + F.when(F.col("v1") <= F.col("v2"), 1).otherwise(0)
    )
    cnt = tri.select(code.alias("code")).groupBy("code").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    tot = cnt.agg(F.sum("c").cast("long").alias("n"))
    npat = cnt.agg(F.count(F.lit(1)).cast("long").alias("n_patterns"))
    terms = cnt.crossJoin(F.broadcast(tot)).select(
        F.round(
            1_000_000.0
            * F.col("c")
            / F.col("n")
            * F.log(F.col("n").cast("double") / F.col("c"))
        )
        .cast("long")
        .alias("h_micro")
    )
    h = terms.agg(F.sum("h_micro").cast("long").alias("entropy_micro"))
    import math

    return (
        tot.crossJoin(F.broadcast(npat))
        .crossJoin(F.broadcast(h))
        .select(
            F.col("n").alias("n_triples"),
            "n_patterns",
            "entropy_micro",
            F.round(
                F.col("entropy_micro").cast("double") / math.log(6) / 1000
            )
            .cast("long")
            .alias("normalized_milli"),
        )
    )


# --------------------------------------------------------------------------
# 5. Cochran's Q
# --------------------------------------------------------------------------


@query(
    "stat_cochran_q",
    oracle="""
WITH x AS (
  SELECT DISTINCT user_id, isodow(CAST(ts AS DATE)) AS dow
  FROM events WHERE event_type = 'purchase'
),
users AS (SELECT DISTINCT user_id FROM events),
rowsum AS (
  SELECT u.user_id, CAST(count(x.dow) AS BIGINT) AS r
  FROM users u LEFT JOIN x ON x.user_id = u.user_id
  GROUP BY u.user_id
),
colsum AS (SELECT dow, CAST(count(*) AS BIGINT) AS c FROM x GROUP BY dow),
m AS (
  SELECT (SELECT CAST(count(*) AS BIGINT) FROM users) AS b,
         CAST(7 AS BIGINT) AS k,
         (SELECT CAST(sum(r) AS BIGINT) FROM rowsum) AS n,
         (SELECT CAST(sum(c * c) AS BIGINT) FROM colsum) AS scc,
         (SELECT CAST(sum(r * r) AS BIGINT) FROM rowsum) AS srr
)
SELECT b AS n_blocks, k AS k_treatments, n AS n_successes,
       CASE WHEN k * n - srr > 0
            THEN CAST(round(1000.0 * (k - 1) * (k * scc - n * n)
                      / (k * n - srr)) AS BIGINT) END AS q_milli
FROM m
""",
)
def stat_cochran_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran's Q for binary repeated measures: blocks = users,
    treatments = the 7 weekdays, outcome = 'did the user purchase on
    that weekday at least once' — Q = (k−1)(kΣC_j² − N²)/(kN − ΣR_u²),
    the k-treatment generalization of eval_mcnemar (k = 2 reduces to
    it) and the binary sibling of stat_friedman_blocks. Every sum is an
    exact BIGINT of 0/1 cells; one division at the end (NULL when all
    rows are all-ones/all-zeros and the denominator vanishes).

    Scale shape: one distinct (user, weekday) hash agg — the binary
    design matrix never densifies; row/column sums are two tiny
    rollups."""
    ev = load(spark, sf_dir, "events")
    x = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.when(
                F.dayofweek(F.col("ts").cast("date")) == 1, 7
            )
            .otherwise(F.dayofweek(F.col("ts").cast("date")) - 1)
            .alias("dow"),
        )
        .distinct()
    )
    users = ev.select("user_id").distinct()
    rowsum = (
        users.join(x, "user_id", "left")
        .groupBy("user_id")
        .agg(F.count("dow").cast("long").alias("r"))
    )
    colsum = x.groupBy("dow").agg(F.count(F.lit(1)).cast("long").alias("c"))
    b = users.agg(F.count(F.lit(1)).cast("long").alias("b"))
    n = rowsum.agg(F.sum("r").cast("long").alias("n"))
    srr = rowsum.agg(F.sum(F.col("r") * F.col("r")).cast("long").alias("srr"))
    scc = colsum.agg(F.sum(F.col("c") * F.col("c")).cast("long").alias("scc"))
    k = 7
    m = (
        b.crossJoin(F.broadcast(n))
        .crossJoin(F.broadcast(srr))
        .crossJoin(F.broadcast(scc))
    )
    denom = k * F.col("n") - F.col("srr")
    return m.select(
        F.col("b").alias("n_blocks"),
        F.lit(k).cast("long").alias("k_treatments"),
        F.col("n").alias("n_successes"),
        F.when(
            denom > 0,
            F.round(
                1000.0
                * (k - 1)
                * (k * F.col("scc") - F.col("n") * F.col("n"))
                / denom
            ).cast("long"),
        ).alias("q_milli"),
    )


# --------------------------------------------------------------------------
# 6. Kendall's W
# --------------------------------------------------------------------------


@query(
    "stat_kendall_w",
    oracle="""
WITH cell AS (
  SELECT event_type AS blk, isodow(CAST(ts AS DATE)) AS trt,
         sum(CAST(round(100 * value) AS BIGINT)) AS x
  FROM events WHERE value IS NOT NULL GROUP BY 1, 2
),
rk AS (
  SELECT blk, trt,
         CAST(row_number() OVER (PARTITION BY blk ORDER BY x, trt) AS BIGINT)
           AS r
  FROM cell
),
colsum AS (SELECT trt, CAST(sum(r) AS BIGINT) AS rsum FROM rk GROUP BY trt),
meta AS (
  SELECT CAST(count(DISTINCT blk) AS BIGINT) AS m,
         CAST(count(DISTINCT trt) AS BIGINT) AS k
  FROM cell
),
dev AS (
  SELECT CAST(sum((2 * rsum * (SELECT k FROM meta)
                   - (SELECT m FROM meta) * (SELECT k FROM meta)
                     * ((SELECT k FROM meta) + 1))
                  * (2 * rsum * (SELECT k FROM meta)
                     - (SELECT m FROM meta) * (SELECT k FROM meta)
                       * ((SELECT k FROM meta) + 1))) AS BIGINT) AS s4k2
  FROM colsum
)
SELECT (SELECT m FROM meta) AS n_blocks,
       (SELECT k FROM meta) AS k_treatments,
       CAST(round(1000.0 * 12 * (SELECT s4k2 FROM dev)
                  / (4.0 * (SELECT k FROM meta) * (SELECT k FROM meta))
                  / ((SELECT m FROM meta) * (SELECT m FROM meta)
                     * ((SELECT k FROM meta) * (SELECT k FROM meta)
                        * (SELECT k FROM meta) - (SELECT k FROM meta))))
            AS BIGINT) AS w_milli
FROM dev
""",
)
def stat_kendall_w(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall's coefficient of concordance W over event-type blocks
    ranking the 7 weekdays by revenue: W = 12·S / (m²(k³−k)) with S the
    squared deviation of weekday rank sums from their mean — the effect
    size companion to stat_friedman_blocks (W = Friedman χ²/(m(k−1)))
    and the agreement number behind 'do all event types share one
    weekly shape?'. Deviations are kept as exact integers by scaling
    ranks by 2k (mean = mk(k+1)/2 may be half-integral), so S is a
    BIGINT and one division ends it.

    Scale shape: |types|×7 cell hash agg, per-block rank window over
    that tiny frame, scalar arithmetic."""
    cell = (
        load(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .groupBy(
            F.col("event_type").alias("blk"),
            F.when(F.dayofweek(F.col("ts").cast("date")) == 1, 7)
            .otherwise(F.dayofweek(F.col("ts").cast("date")) - 1)
            .alias("trt"),
        )
        .agg(
            F.sum(F.round(100 * F.col("value")).cast("long"))
            .cast("long")
            .alias("x")
        )
    )
    w = Window.partitionBy("blk").orderBy("x", "trt")
    rk = cell.select(
        "blk", "trt", F.row_number().over(w).cast("long").alias("r")
    )
    colsum = rk.groupBy("trt").agg(F.sum("r").cast("long").alias("rsum"))
    meta = cell.agg(
        F.countDistinct("blk").cast("long").alias("m"),
        F.countDistinct("trt").cast("long").alias("k"),
    )
    dv = colsum.crossJoin(F.broadcast(meta)).select(
        (
            2 * F.col("rsum") * F.col("k")
            - F.col("m") * F.col("k") * (F.col("k") + 1)
        ).alias("d"),
        "m",
        "k",
    )
    agg = dv.groupBy("m", "k").agg(
        F.sum(F.col("d") * F.col("d")).cast("long").alias("s4k2")
    )
    return agg.select(
        F.col("m").alias("n_blocks"),
        F.col("k").alias("k_treatments"),
        F.round(
            1000.0
            * 12
            * F.col("s4k2")
            / (4.0 * F.col("k") * F.col("k"))
            / (
                F.col("m")
                * F.col("m")
                * (F.col("k") * F.col("k") * F.col("k") - F.col("k"))
            )
        )
        .cast("long")
        .alias("w_milli"),
    )
