"""Robust-statistics and ordered-pattern batch.

- ``ts_theil_sen_trend`` — Theil-Sen estimator over the daily revenue
  series: the median of all pairwise slopes, the robust alternative to
  the OLS trend (29% breakdown point — one bad day cannot move it, where
  OLS follows any outlier). Slopes quantize to DECIMAL(18,6); the median
  is an exact nearest-rank pick on a (slope, i, j) total order.
- ``mine_sequential_rules`` — ORDERED association rules over per-user-day
  sessions: "a then b" counted when a's first occurrence precedes b's in
  the session (market_basket_lift is the unordered sibling). Support /
  confidence / lift from exact integer counts; the ordering is what turns
  a co-occurrence into a funnel hypothesis.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nocouncil_etl_spark.io import load
from nocouncil_etl_spark.operators.quantiles import ranged_rank_cumsum
from nocouncil_etl_spark.registry import query

_DAILY_SQL = """
daily AS (
  SELECT CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS day,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS x
  FROM events GROUP BY 1
)
"""


@query(
    "ts_theil_sen_trend",
    oracle=f"""
WITH {_DAILY_SQL},
pairs AS (
  SELECT a.day AS di, b.day AS dj,
         CAST(round((b.x - a.x) / CAST(b.day - a.day AS DOUBLE), 6)
              AS DECIMAL(18, 6)) AS slope
  FROM daily a JOIN daily b ON b.day > a.day
),
meta AS (
  SELECT CAST(count(*) AS BIGINT) AS n_pairs,
         CAST((count(*) + 1) // 2 AS BIGINT) AS r,
         CAST(sum(CASE WHEN slope > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_pos
  FROM pairs
),
ranked AS (
  SELECT slope,
         CAST(row_number() OVER (ORDER BY slope, di, dj) AS BIGINT) AS rn
  FROM pairs
),
med AS (
  SELECT CAST(r.slope AS DOUBLE) AS slope
  FROM ranked r CROSS JOIN meta m WHERE r.rn = m.r
),
resid AS (
  SELECT CAST(round(d.x - (SELECT slope FROM med) * d.day, 2)
              AS DECIMAL(18, 2)) AS res, d.day
  FROM daily d
),
rmeta AS (SELECT CAST((count(*) + 1) // 2 AS BIGINT) AS rr FROM resid),
rranked AS (
  SELECT res, CAST(row_number() OVER (ORDER BY res, day) AS BIGINT) AS rn
  FROM resid
)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM daily) AS n_days,
       m.n_pairs, m.n_pos,
       (SELECT slope FROM med) AS slope_cents_per_day,
       (SELECT CAST(res AS DOUBLE) FROM rranked r CROSS JOIN rmeta
        WHERE r.rn = rmeta.rr) AS intercept_cents
FROM meta m
""",
)
def ts_theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen trend of daily revenue: slope = exact lower-median of the
    round-6dp pairwise slopes ((x_j−x_i)/(day_j−day_i), total-ordered by
    (slope, i, j)), intercept = lower-median of the residuals x_t −
    slope·day_t (2dp cents). Also emits the positive-slope count — the
    sign test that accompanies the estimator.

    Scale shape: the stream collapses to the daily table first, so the
    O(span²) pair set is bounded by the DATE RANGE, not the row count
    (30 days → 435 pairs; ten years → ~6.6M pairs, still one executor's
    work); median = one rank pick, no data-sized sort."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date"))
        .cast("long")
        .alias("day")
    ).agg(
        F.sum(F.round(F.col("value") * 100).cast("long"))
        .cast("long")
        .alias("x")
    )
    daily.persist()
    a = daily.select(F.col("day").alias("di"), F.col("x").alias("xi"))
    b = daily.select(F.col("day").alias("dj"), F.col("x").alias("xj"))
    pairs = (
        a.join(b, F.col("dj") > F.col("di"))
        .select(
            "di",
            "dj",
            F.round(
                (F.col("xj") - F.col("xi"))
                / (F.col("dj") - F.col("di")).cast("double"),
                6,
            )
            .cast("decimal(18,6)")
            .alias("slope"),
        )
    )
    pairs.persist()
    meta = pairs.agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.expr("CAST((count(1) + 1) div 2 AS BIGINT)").alias("r"),
        F.sum(F.when(F.col("slope") > 0, 1).otherwise(0))
        .cast("long")
        .alias("n_pos"),
    )
    ranked = pairs.select(
        "slope",
        F.row_number()
        .over(Window.orderBy("slope", "di", "dj"))
        .cast("long")
        .alias("rn"),
    )
    med = (
        ranked.crossJoin(F.broadcast(meta))
        .filter(F.col("rn") == F.col("r"))
        .select(F.col("slope").cast("double").alias("slope"))
    )
    resid = daily.crossJoin(F.broadcast(med)).select(
        F.round(F.col("x") - F.col("slope") * F.col("day"), 2)
        .cast("decimal(18,2)")
        .alias("res"),
        "day",
    )
    rmeta = resid.agg(
        F.expr("CAST((count(1) + 1) div 2 AS BIGINT)").alias("rr")
    )
    rranked = resid.select(
        "res",
        F.row_number()
        .over(Window.orderBy("res", "day"))
        .cast("long")
        .alias("rn"),
    )
    intercept = (
        rranked.crossJoin(F.broadcast(rmeta))
        .filter(F.col("rn") == F.col("rr"))
        .select(F.col("res").cast("double").alias("intercept_cents"))
    )
    n_days = daily.agg(F.count(F.lit(1)).cast("long").alias("n_days"))
    return (
        meta.select("n_pairs", "n_pos")
        .crossJoin(F.broadcast(n_days))
        .crossJoin(F.broadcast(med.select(F.col("slope").alias("slope_cents_per_day"))))
        .crossJoin(F.broadcast(intercept))
        .select(
            "n_days", "n_pairs", "n_pos", "slope_cents_per_day", "intercept_cents"
        )
    )


MIN_SESS_SUPPORT = 20
TOP_SEQ_RULES = 15


@query(
    "mine_sequential_rules",
    oracle=f"""
WITH sess AS (
  SELECT user_id, CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS day,
         event_type, min(ts) AS first_ts, min(event_id) AS first_id
  FROM events GROUP BY user_id, day, event_type
),
n_sess AS (
  SELECT CAST(count(*) AS BIGINT) AS n
  FROM (SELECT DISTINCT user_id, day FROM sess)
),
singles AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS sup
  FROM sess GROUP BY event_type
),
ordered_pairs AS (
  SELECT a.event_type AS ante, b.event_type AS cons,
         CAST(count(*) AS BIGINT) AS sup_ab
  FROM sess a
  JOIN sess b ON a.user_id = b.user_id AND a.day = b.day
   AND a.event_type <> b.event_type
   AND (a.first_ts < b.first_ts
        OR (a.first_ts = b.first_ts AND a.first_id < b.first_id))
  GROUP BY 1, 2
),
rules AS (
  SELECT p.ante, p.cons, p.sup_ab, sa.sup AS sup_a, sc.sup AS sup_c,
         round(p.sup_ab / CAST(sa.sup AS DOUBLE), 6) AS confidence,
         round((p.sup_ab / CAST(sa.sup AS DOUBLE))
               / (sc.sup / CAST((SELECT n FROM n_sess) AS DOUBLE)), 6) AS lift
  FROM ordered_pairs p
  JOIN singles sa ON sa.event_type = p.ante
  JOIN singles sc ON sc.event_type = p.cons
  WHERE p.sup_ab >= {MIN_SESS_SUPPORT}
)
SELECT ante, cons, sup_ab, sup_a, sup_c, confidence, lift
FROM rules ORDER BY lift DESC, ante, cons LIMIT {TOP_SEQ_RULES}
""",
)
def mine_sequential_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered association rules over per-(user, day) sessions: the rule
    a→b is supported by a session when a's FIRST occurrence strictly
    precedes b's (tie on timestamp → event_id order, total). Confidence =
    sup(a→b)/sup(a); lift = confidence / P(b-session). Top-{TOP_SEQ_RULES}
    by (lift desc, rule), min support {MIN_SESS_SUPPORT} sessions. The
    temporal ordering is what market_basket_lift (unordered) cannot say:
    "error sessions lead to signup" ≠ "signup sessions lead to error".

    Scale shape: the stream collapses to one row per (session, type)
    first; the ordered-pair join is keyed on the session and quadratic
    only in the per-session DISTINCT type count (≤ alphabet); rule
    assembly joins broadcast-sized aggregates."""
    ev = load(spark, sf_dir, "events")
    sess = ev.groupBy(
        "user_id",
        F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date"))
        .cast("long")
        .alias("day"),
        "event_type",
    ).agg(
        F.min("ts").alias("first_ts"), F.min("event_id").alias("first_id")
    )
    sess.persist()
    n_sess = sess.select("user_id", "day").distinct().count()
    singles = sess.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("sup")
    )
    a = sess.select(
        "user_id",
        "day",
        F.col("event_type").alias("ante"),
        F.col("first_ts").alias("ts_a"),
        F.col("first_id").alias("id_a"),
    )
    b = sess.select(
        "user_id",
        "day",
        F.col("event_type").alias("cons"),
        F.col("first_ts").alias("ts_b"),
        F.col("first_id").alias("id_b"),
    )
    ordered = (
        a.join(b, ["user_id", "day"])
        .filter(
            (F.col("ante") != F.col("cons"))
            & (
                (F.col("ts_a") < F.col("ts_b"))
                | (
                    (F.col("ts_a") == F.col("ts_b"))
                    & (F.col("id_a") < F.col("id_b"))
                )
            )
        )
        .groupBy("ante", "cons")
        .agg(F.count(F.lit(1)).cast("long").alias("sup_ab"))
        .filter(F.col("sup_ab") >= MIN_SESS_SUPPORT)
    )
    sa = singles.select(F.col("event_type").alias("ante"), F.col("sup").alias("sup_a"))
    sc = singles.select(F.col("event_type").alias("cons"), F.col("sup").alias("sup_c"))
    conf = F.round(F.col("sup_ab") / F.col("sup_a").cast("double"), 6)
    rules = (
        ordered.join(F.broadcast(sa), "ante")
        .join(F.broadcast(sc), "cons")
        .select(
            "ante",
            "cons",
            "sup_ab",
            "sup_a",
            "sup_c",
            conf.alias("confidence"),
            F.round(
                (F.col("sup_ab") / F.col("sup_a").cast("double"))
                / (F.col("sup_c") / float(n_sess)),
                6,
            ).alias("lift"),
        )
    )
    return rules.orderBy(F.desc("lift"), "ante", "cons").limit(TOP_SEQ_RULES)


# --------------------------------------------------------------------------
# Pareto frontier (2-D skyline)
# --------------------------------------------------------------------------


@query(
    "agg_pareto_frontier",
    oracle="""
WITH pts AS (
  SELECT l_orderkey, l_linenumber,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS price_cents,
         CAST(l_quantity AS BIGINT) AS qty
  FROM lineitem
),
dedup AS (
  SELECT price_cents, qty,
         min(l_orderkey * 10 + l_linenumber) AS tag
  FROM pts GROUP BY price_cents, qty
),
ranked AS (
  SELECT price_cents, qty, tag,
         max(qty) OVER (ORDER BY price_cents, tag
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS best_qty_cheaper
  FROM dedup
)
SELECT price_cents, qty, CAST(tag AS BIGINT) AS tag
FROM ranked
WHERE best_qty_cheaper IS NULL OR qty > best_qty_cheaper
""",
)
def agg_pareto_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D Pareto frontier (skyline) of line items: the points where no
    other point is both cheaper AND higher-quantity — the multi-objective
    "best deals" set behind any cost/quality trade-off screen. Linear
    formulation: sort by (price asc, tag), keep rows whose quantity beats
    the running max over all strictly-cheaper-or-tied-earlier points —
    O(n log n) instead of the naive all-pairs dominance scan. (Ties on
    the sort key make the running max include equal-price rows seen
    earlier; the deterministic tag makes that inclusion identical on both
    engines — a dominance-with-tie-break skyline, exact and total.)

    Scale shape (r7): one distinct-point agg; the running max
    decomposes into a value-level exclusive Fenwick prefix max plus a
    price-partitioned tie window — no global sort at any point count."""
    li = load(spark, sf_dir, "lineitem")
    pts = li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.col("l_extendedprice") * 100)
        .cast("long")
        .alias("price_cents"),
        F.col("l_quantity").cast("long").alias("qty"),
    )
    dedup = pts.groupBy("price_cents", "qty").agg(
        F.min(F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("tag")
    )
    # r7: the skyline's running max via the range-partitioned two-phase
    # scan (near-unique price domain — exclusive cummax = partition
    # prefix-max offsets ⊔ local strictly-preceding window max); no
    # global sort, no single-partition stage
    ranked = ranged_rank_cumsum(
        dedup, "price_cents", "tag", max_cols_exclusive=("qty",)
    ).select(
        "price_cents",
        "qty",
        "tag",
        F.col("cummax_excl_qty").alias("best_qty_cheaper"),
    )
    return ranked.filter(
        F.col("best_qty_cheaper").isNull()
        | (F.col("qty") > F.col("best_qty_cheaper"))
    ).select("price_cents", "qty", F.col("tag").cast("long").alias("tag"))
