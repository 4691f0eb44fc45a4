"""Breadth batch 37 (round 6): capture-recapture, conformal intervals,
SCC coloring, control rules, tiered pricing, rank-biased overlap.

Six operators (reference scope: population coverage of the crawl,
distribution-free prediction bands on feed volumes, directed-cycle
structure in the link graph, SPC alarms on fetch rates, marginal-rate
accounting, and ranking-drift comparison):

- ``stat_capture_recapture`` — Lincoln-Petersen / Chapman population
  estimates from two time-window user samples, vs the true count.
- ``ml_conformal_interval``  — split-conformal prediction bands per
  event type with empirical test coverage.
- ``graph_scc_coloring_pass`` — the FW-BW coloring pass: nodes whose
  min-reaching and min-reachable labels coincide are resolved into
  their SCC; convergence-looped min-label propagation both directions.
- ``ts_control_rules_we``   — Western Electric control-chart rules 1-3
  over calibrated daily series (declarative windows, exact integers).
- ``fn_tiered_pricing``     — marginal-rate tier schedule applied to
  order totals (the tax-bracket kernel), effective rates per priority.
- ``eval_rbo_overlap``      — rank-biased overlap (p = 0.9) between the
  token rankings of two corpus halves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nocouncil_etl_spark.io import fan_out, load
from nocouncil_etl_spark.plans.graph_plans import _EDGES_SQL, _graph
from nocouncil_etl_spark.registry import query

# --------------------------------------------------------------------------
# 1. Capture-recapture population estimate
# --------------------------------------------------------------------------


@query(
    "stat_capture_recapture",
    oracle="""
WITH d0 AS (SELECT min(CAST(ts AS DATE)) AS start FROM events),
s1 AS (
  SELECT DISTINCT user_id FROM events, d0
  WHERE CAST(ts AS DATE) < start + 10
),
s2 AS (
  SELECT DISTINCT user_id FROM events, d0
  WHERE CAST(ts AS DATE) >= start + 10 AND CAST(ts AS DATE) < start + 20
),
m AS (SELECT CAST(count(*) AS BIGINT) AS m
      FROM s1 JOIN s2 ON s1.user_id = s2.user_id),
sizes AS (
  SELECT (SELECT CAST(count(*) AS BIGINT) FROM s1) AS n1,
         (SELECT CAST(count(*) AS BIGINT) FROM s2) AS n2,
         (SELECT m FROM m) AS m,
         (SELECT CAST(count(DISTINCT user_id) AS BIGINT) FROM events)
           AS true_n
)
SELECT n1, n2, m, true_n,
       (n1 * n2) // m AS lincoln_petersen,
       ((n1 + 1) * (n2 + 1)) // (m + 1) - 1 AS chapman
FROM sizes
""",
)
def stat_capture_recapture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Capture-recapture population estimation (the ecology classic,
    routinely reused to size a crawl frontier or dedup universe you can
    only sample): users seen in days 1-10 are 'tagged', users seen in
    days 11-20 are the recapture sample, and the Lincoln-Petersen
    estimate N̂ = n1·n2/m (plus Chapman's bias-corrected form) recovers
    the total population — laid beside the true distinct-user count so
    the estimator's accuracy is visible in the result. All integer.

    Scale shape: two distinct-user collapses + one equi-join on the user
    key; the estimate itself is 1-row arithmetic. The trick behind
    'how many unique documents exist that we have not crawled yet'."""
    ev = load(spark, sf_dir, "events")
    d0 = ev.agg(F.min(F.to_date("ts")).alias("start"))
    evd = ev.crossJoin(F.broadcast(d0)).select(
        "user_id", F.datediff(F.to_date("ts"), F.col("start")).alias("off")
    )
    s1 = evd.filter(F.col("off") < 10).select("user_id").distinct()
    s2 = evd.filter((F.col("off") >= 10) & (F.col("off") < 20)).select(
        "user_id"
    ).distinct()
    n1, n2 = s1.count(), s2.count()
    m = s1.join(s2, "user_id").count()
    true_n = ev.select("user_id").distinct().count()
    return spark.createDataFrame(
        [(n1, n2, m, true_n, (n1 * n2) // m, ((n1 + 1) * (n2 + 1)) // (m + 1) - 1)],
        "n1 BIGINT, n2 BIGINT, m BIGINT, true_n BIGINT,"
        " lincoln_petersen BIGINT, chapman BIGINT",
    )


# --------------------------------------------------------------------------
# 2. Split-conformal prediction intervals
# --------------------------------------------------------------------------

CONF_TRAIN_D = 20
CONF_CAL_D = 5  # calibration = days [20, 25)


@query(
    "ml_conformal_interval",
    oracle=f"""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS d,
         CAST(sum(CAST(round(value) AS BIGINT)) AS BIGINT) AS y
  FROM events GROUP BY 1, 2
),
d0 AS (SELECT min(d) AS start FROM daily),
split AS (
  SELECT event_type, d - d0.start AS off, y FROM daily, d0
),
yhat AS (
  SELECT event_type, CAST(sum(y) AS BIGINT) // count(*) AS yh
  FROM split WHERE off < {CONF_TRAIN_D} GROUP BY 1
),
cal AS (
  SELECT s.event_type, abs(s.y - h.yh) AS score,
         CAST(row_number() OVER (PARTITION BY s.event_type
                                 ORDER BY abs(s.y - h.yh), s.off)
              AS BIGINT) AS rn,
         CAST(count(*) OVER (PARTITION BY s.event_type) AS BIGINT) AS nc
  FROM split s JOIN yhat h ON s.event_type = h.event_type
  WHERE s.off >= {CONF_TRAIN_D} AND s.off < {CONF_TRAIN_D + CONF_CAL_D}
),
qhat AS (
  SELECT event_type, score AS q
  FROM cal WHERE rn = ((nc + 1) * 8 + 9) // 10
),
test AS (
  SELECT s.event_type, CAST(count(*) AS BIGINT) AS n_test,
         CAST(sum(CASE WHEN abs(s.y - h.yh) <= q.q THEN 1 ELSE 0 END)
              AS BIGINT) AS n_covered
  FROM split s
  JOIN yhat h ON s.event_type = h.event_type
  JOIN qhat q ON s.event_type = q.event_type
  WHERE s.off >= {CONF_TRAIN_D + CONF_CAL_D}
  GROUP BY 1
)
SELECT t.event_type, h.yh AS yhat, q.q AS qhat, t.n_test, t.n_covered,
       (1000000 * t.n_covered) // t.n_test AS coverage_1e6
FROM test t
JOIN yhat h ON t.event_type = h.event_type
JOIN qhat q ON t.event_type = q.event_type
""",
)
def ml_conformal_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal prediction bands (Vovk; Lei et al.) per event
    type: a train slice fits the point forecast (integer mean of the
    first {CONF_TRAIN_D} days), a held-out calibration slice supplies
    absolute-residual scores, q̂ is the ceil((n+1)·0.8)-th order
    statistic (the distribution-free 80% band — no normality assumed),
    and the remaining days report empirical coverage of ŷ ± q̂. The
    honest-uncertainty wrapper that turns ANY forecaster into one with
    finite-sample guarantees. All integer.

    Scale shape: per-type windows on the date-bounded daily table; the
    conformal machinery adds two hash-aggs and one bounded rank window
    to whatever the base model costs."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy("event_type", F.to_date("ts").alias("d")).agg(
        F.sum(F.round("value").cast("long")).cast("long").alias("y")
    )
    d0 = daily.agg(F.min("d").alias("start"))
    split = daily.crossJoin(F.broadcast(d0)).select(
        "event_type", F.datediff("d", "start").alias("off"), "y"
    )
    yhat = (
        split.filter(F.col("off") < CONF_TRAIN_D)
        .groupBy("event_type")
        .agg(F.expr("CAST(sum(y) AS BIGINT) div count(*)").alias("yh"))
    )
    cal = (
        split.filter(
            (F.col("off") >= CONF_TRAIN_D)
            & (F.col("off") < CONF_TRAIN_D + CONF_CAL_D)
        )
        .join(yhat, "event_type")
        .select(
            "event_type",
            F.abs(F.col("y") - F.col("yh")).alias("score"),
            "off",
        )
    )
    wc = Window.partitionBy("event_type")
    ranked = cal.select(
        "event_type",
        "score",
        F.row_number().over(wc.orderBy("score", "off")).cast("long").alias("rn"),
        F.count("*").over(wc).cast("long").alias("nc"),
    )
    qhat = ranked.filter(
        F.col("rn") == F.expr("((nc + 1) * 8 + 9) div 10")
    ).select("event_type", F.col("score").alias("q"))
    test = (
        split.filter(F.col("off") >= CONF_TRAIN_D + CONF_CAL_D)
        .join(yhat, "event_type")
        .join(qhat, "event_type")
        .groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_test"),
            F.sum(
                F.when(
                    F.abs(F.col("y") - F.col("yh")) <= F.col("q"), 1
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_covered"),
        )
    )
    return (
        test.join(yhat, "event_type")
        .join(qhat, "event_type")
        .select(
            "event_type",
            F.col("yh").alias("yhat"),
            F.col("q").alias("qhat"),
            "n_test",
            "n_covered",
            F.expr("(1000000 * n_covered) div n_test")
            .cast("long")
            .alias("coverage_1e6"),
        )
    )


# --------------------------------------------------------------------------
# 3. SCC coloring pass (FW-BW)
# --------------------------------------------------------------------------


@query(
    "graph_scc_coloring_pass",
    oracle=f"""
WITH RECURSIVE {_EDGES_SQL},
e AS (SELECT DISTINCT src, dst FROM edges0 WHERE src <> dst),
vs AS (SELECT src AS v FROM e UNION SELECT dst FROM e),
fwd AS (
  SELECT v, v AS lab FROM vs
  UNION
  SELECT e.dst AS v, fwd.lab
  FROM fwd JOIN e ON e.src = fwd.v
),
fmin AS (SELECT v, CAST(min(lab) AS BIGINT) AS f FROM fwd GROUP BY v),
bwd AS (
  SELECT v, v AS lab FROM vs
  UNION
  SELECT e.src AS v, bwd.lab
  FROM bwd JOIN e ON e.dst = bwd.v
),
bmin AS (SELECT v, CAST(min(lab) AS BIGINT) AS b FROM bwd GROUP BY v),
marked AS (
  SELECT f.v, f.f, b.b, f.f = b.b AS resolved
  FROM fmin f JOIN bmin b ON f.v = b.v
)
SELECT CAST(count(*) AS BIGINT) AS n_nodes,
       CAST(sum(CASE WHEN resolved THEN 1 ELSE 0 END) AS BIGINT)
         AS n_resolved_nodes,
       CAST(count(DISTINCT CASE WHEN resolved THEN f END) AS BIGINT)
         AS n_resolved_sccs,
       CAST(sum(CASE WHEN NOT resolved THEN 1 ELSE 0 END) AS BIGINT)
         AS n_unresolved
FROM marked
""",
)
def graph_scc_coloring_pass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First coloring pass of the forward-backward SCC algorithm
    (Fleischer et al. 2000, the distributed SCC workhorse): propagate
    min labels FORWARD (f_v = smallest node that reaches v) and BACKWARD
    (b_v = smallest node v reaches) to fixpoint; every node with
    f_v = b_v = m is mutually reachable with m and therefore RESOLVED
    into SCC(m) — one pass typically settles the bulk of a web graph,
    and the unresolved remainder (reported) is what the recursive
    pivot rounds would process. Both fixpoints run the
    connected_components convergence loop (min-label join + eager
    localCheckpoint per level, the diameter-safe discipline); the oracle
    is the true reachability fixpoint via recursive CTEs.

    Scale shape: each level is one equi-join edges→labels + min-agg;
    levels ≤ graph diameter. The directed sibling of
    dedup_cluster_components."""
    nodes, edges, n = _graph(spark, sf_dir)
    e = (
        edges.select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    vs = (
        e.select(F.col("src").alias("v"))
        .unionByName(e.select(F.col("dst").alias("v")))
        .distinct()
    )

    def min_label_fixpoint(edges_df, reverse: bool):
        src, dst = ("dst", "src") if reverse else ("src", "dst")
        lab = vs.select("v", F.col("v").alias("lab")).localCheckpoint(eager=True)
        while True:
            prop = (
                edges_df.join(lab, edges_df[src] == lab.v)
                .select(edges_df[dst].alias("v"), "lab")
                .unionByName(lab)
                .groupBy("v")
                .agg(F.min("lab").alias("lab"))
                .localCheckpoint(eager=True)
            )
            changed = (
                prop.join(lab.withColumnRenamed("lab", "old"), "v")
                .filter(F.col("lab") != F.col("old"))
                .count()
            )
            lab = prop
            if changed == 0:
                return lab

    fmin = min_label_fixpoint(e, reverse=False).withColumnRenamed("lab", "f")
    bmin = min_label_fixpoint(e, reverse=True).withColumnRenamed("lab", "b")
    marked = fmin.join(bmin, "v").select(
        "v", "f", "b", (F.col("f") == F.col("b")).alias("resolved")
    )
    return marked.agg(
        F.count("*").cast("long").alias("n_nodes"),
        F.sum(F.when(F.col("resolved"), 1).otherwise(0))
        .cast("long")
        .alias("n_resolved_nodes"),
        F.countDistinct(F.when(F.col("resolved"), F.col("f")))
        .cast("long")
        .alias("n_resolved_sccs"),
        F.sum(F.when(~F.col("resolved"), 1).otherwise(0))
        .cast("long")
        .alias("n_unresolved"),
    )


# --------------------------------------------------------------------------
# 4. Western Electric control rules
# --------------------------------------------------------------------------

WE_CALIB_D = 10


@query(
    "ts_control_rules_we",
    oracle=f"""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS d,
         CAST(sum(CAST(round(value) AS BIGINT)) AS BIGINT) AS x
  FROM events GROUP BY 1, 2
),
idx AS (
  SELECT event_type,
         CAST(row_number() OVER (PARTITION BY event_type ORDER BY d)
              AS BIGINT) AS t,
         x
  FROM daily
),
calib AS (
  SELECT event_type, CAST(sum(x) AS BIGINT) // count(*) AS mu
  FROM idx WHERE t <= {WE_CALIB_D} GROUP BY 1
),
mad AS (
  SELECT i.event_type,
         greatest(CAST(sum(abs(i.x - c.mu)) AS BIGINT) // count(*), 1)
           AS mad
  FROM idx i JOIN calib c ON i.event_type = c.event_type
  WHERE i.t <= {WE_CALIB_D} GROUP BY 1
),
z AS (
  SELECT i.event_type, i.t, i.x - c.mu AS dev, m.mad,
         CASE WHEN i.x > c.mu THEN 1 WHEN i.x < c.mu THEN -1 ELSE 0 END
           AS side
  FROM idx i
  JOIN calib c ON i.event_type = c.event_type
  JOIN mad m ON i.event_type = m.event_type
),
flags AS (
  SELECT event_type, t,
         CASE WHEN abs(dev) > 3 * mad THEN 1 ELSE 0 END AS r1,
         CASE WHEN count(*) OVER w9 = 9
               AND abs(CAST(sum(side) OVER w9 AS BIGINT)) = 9
              THEN 1 ELSE 0 END AS r2,
         CASE WHEN count(*) OVER w6 = 6
               AND sum(CASE WHEN up = 1 THEN 1 ELSE 0 END) OVER w5s = 5
              THEN 1 ELSE 0 END AS r3
  FROM (
    SELECT *,
           CASE WHEN dev > lag(dev) OVER (PARTITION BY event_type
                                          ORDER BY t)
                THEN 1 ELSE 0 END AS up
    FROM z
  )
  WINDOW w9 AS (PARTITION BY event_type ORDER BY t
                ROWS BETWEEN 8 PRECEDING AND CURRENT ROW),
         w6 AS (PARTITION BY event_type ORDER BY t
                ROWS BETWEEN 5 PRECEDING AND CURRENT ROW),
         w5s AS (PARTITION BY event_type ORDER BY t
                 ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
)
SELECT event_type,
       CAST(sum(r1) AS BIGINT) AS rule1_days,
       CAST(sum(r2) AS BIGINT) AS rule2_days,
       CAST(sum(r3) AS BIGINT) AS rule3_days
FROM flags GROUP BY 1
""",
)
def ts_control_rules_we(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Western Electric control-chart rules on each event-type's daily
    series, calibrated on the first {WE_CALIB_D} days (integer mean and
    mean-absolute-deviation as the robust sigma): rule 1 = a point
    beyond 3 MAD; rule 2 = nine consecutive points on one side of the
    center line; rule 3 = six consecutive points strictly rising (five
    consecutive up-steps). The SPC alarm vocabulary, fully declarative —
    each rule is a bounded ROWS window over exact integers.

    Scale shape: daily collapse map-side; three bounded per-key windows.
    The streaming twin is the same expressions under watermarks."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy("event_type", F.to_date("ts").alias("d")).agg(
        F.sum(F.round("value").cast("long")).cast("long").alias("x")
    )
    wt = Window.partitionBy("event_type").orderBy("d")
    idx = daily.select(
        "event_type",
        F.row_number().over(wt).cast("long").alias("t"),
        "x",
    )
    calib = (
        idx.filter(F.col("t") <= WE_CALIB_D)
        .groupBy("event_type")
        .agg(F.expr("CAST(sum(x) AS BIGINT) div count(*)").alias("mu"))
    )
    mad = (
        idx.join(calib, "event_type")
        .filter(F.col("t") <= WE_CALIB_D)
        .groupBy("event_type")
        .agg(
            F.greatest(
                F.expr("CAST(sum(abs(x - mu)) AS BIGINT) div count(*)"),
                F.lit(1),
            ).alias("mad")
        )
    )
    z = (
        idx.join(calib, "event_type")
        .join(mad, "event_type")
        .select(
            "event_type",
            "t",
            (F.col("x") - F.col("mu")).alias("dev"),
            "mad",
            F.when(F.col("x") > F.col("mu"), 1)
            .when(F.col("x") < F.col("mu"), -1)
            .otherwise(0)
            .alias("side"),
        )
    )
    wtt = Window.partitionBy("event_type").orderBy("t")
    w9 = wtt.rowsBetween(-8, 0)
    w6 = wtt.rowsBetween(-5, 0)
    w5 = wtt.rowsBetween(-4, 0)
    withup = z.withColumn(
        "up",
        F.when(F.col("dev") > F.lag("dev").over(wtt), 1).otherwise(0),
    )
    flags = withup.select(
        "event_type",
        F.when(F.abs(F.col("dev")) > 3 * F.col("mad"), 1).otherwise(0).alias("r1"),
        F.when(
            (F.count("*").over(w9) == 9)
            & (F.abs(F.sum("side").over(w9).cast("long")) == 9),
            1,
        )
        .otherwise(0)
        .alias("r2"),
        F.when(
            (F.count("*").over(w6) == 6)
            & (F.sum(F.when(F.col("up") == 1, 1).otherwise(0)).over(w5) == 5),
            1,
        )
        .otherwise(0)
        .alias("r3"),
    )
    return flags.groupBy("event_type").agg(
        F.sum("r1").cast("long").alias("rule1_days"),
        F.sum("r2").cast("long").alias("rule2_days"),
        F.sum("r3").cast("long").alias("rule3_days"),
    )


# --------------------------------------------------------------------------
# 5. Marginal tier schedule
# --------------------------------------------------------------------------

# (lower bound cents, upper bound cents, rate in basis points)
TIERS = (
    (0, 5_000_000, 0),
    (5_000_000, 15_000_000, 500),
    (15_000_000, 30_000_000, 1000),
    (30_000_000, 1 << 60, 1500),
)


@query(
    "fn_tiered_pricing",
    oracle=f"""
WITH t(lo, hi, bp) AS (VALUES
  {', '.join(f'({lo}, {hi}, {bp})' for lo, hi, bp in TIERS)}
),
fee AS (
  SELECT o.o_orderpriority, o.o_orderkey,
         CAST(round(o.o_totalprice * 100) AS BIGINT) AS cents,
         CAST(sum(least(greatest(CAST(round(o.o_totalprice * 100) AS BIGINT)
                                 - t.lo, 0), t.hi - t.lo) * t.bp // 10000)
              AS BIGINT) AS fee_cents
  FROM orders o, t
  GROUP BY 1, 2, 3
)
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(cents) AS BIGINT) AS total_cents,
       CAST(sum(fee_cents) AS BIGINT) AS total_fee_cents,
       CAST((10000 * CAST(sum(fee_cents) AS BIGINT)) // sum(cents)
            AS BIGINT) AS effective_bp
FROM fee GROUP BY 1
""",
)
def fn_tiered_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marginal-rate tier schedule (the tax-bracket / tiered-billing
    kernel): each order's total pays rate_bp on the slice of its value
    falling inside each tier — fee = Sigma min(max(v − lo, 0), hi − lo)
    · bp/10000, per-tier contributions floored to integer cents — and
    priorities report their effective blended rate. The per-tier clamp
    is the whole algorithm; everything is exact integer arithmetic over
    a broadcast 4-row schedule.

    Scale shape: tier fan-out is ×4 map-side into a combine-agg; no
    shuffle beyond the final priority rollup."""
    orders = load(spark, sf_dir, "orders")
    tiers = spark.createDataFrame(list(TIERS), "lo LONG, hi LONG, bp LONG")
    fee = (
        orders.select(
            "o_orderpriority",
            "o_orderkey",
            F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        )
        .crossJoin(F.broadcast(tiers))
        .groupBy("o_orderpriority", "o_orderkey", "cents")
        .agg(
            F.sum(
                F.expr(
                    "least(greatest(cents - lo, 0), hi - lo) * bp div 10000"
                )
            )
            .cast("long")
            .alias("fee_cents")
        )
    )
    return fee.groupBy("o_orderpriority").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("cents").cast("long").alias("total_cents"),
        F.sum("fee_cents").cast("long").alias("total_fee_cents"),
        F.expr("(10000 * CAST(sum(fee_cents) AS BIGINT)) div sum(cents)")
        .cast("long")
        .alias("effective_bp"),
    )


# --------------------------------------------------------------------------
# 6. Rank-biased overlap
# --------------------------------------------------------------------------

RBO_P = 0.9
RBO_DEPTH = 50


@query(
    "eval_rbo_overlap",
    oracle=f"""
WITH tok AS (
  SELECT CASE WHEN source < 'src5' THEN 'A' ELSE 'B' END AS half,
         unnest(string_split(text, ' ')) AS term
  FROM documents
),
cnt AS (
  SELECT half, term, CAST(count(*) AS BIGINT) AS c
  FROM tok GROUP BY 1, 2
),
ranked AS (
  SELECT half, term,
         CAST(row_number() OVER (PARTITION BY half
                                 ORDER BY c DESC, term) AS BIGINT) AS rk
  FROM cnt
),
tops AS (SELECT half, term, rk FROM ranked WHERE rk <= {RBO_DEPTH}),
mr AS (
  SELECT a.term, greatest(a.rk, b.rk) AS m
  FROM (SELECT term, rk FROM tops WHERE half = 'A') a
  JOIN (SELECT term, rk FROM tops WHERE half = 'B') b
    ON a.term = b.term
),
ds AS (SELECT unnest(range(1, {RBO_DEPTH + 1})) AS d),
ov AS (
  SELECT ds.d, CAST(count(mr.term) AS BIGINT) AS overlap_d
  FROM ds LEFT JOIN mr ON mr.m <= ds.d
  GROUP BY ds.d
),
terms AS (
  SELECT CAST(sum(CAST(round(1000000000.0 * power({RBO_P}, d - 1)
                       * overlap_d / d) AS BIGINT)) AS BIGINT) AS s
  FROM ov
)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM mr) AS n_common,
       CAST(round((1 - {RBO_P}) * s / 1000000.0) AS BIGINT) AS rbo_1e3
FROM terms
""",
)
def eval_rbo_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-biased overlap (Webber, Moffat & Zobel 2010) between the
    top-{RBO_DEPTH} token rankings of two corpus halves — the
    top-weighted, non-conjoint-safe way to ask 'did the vocabulary
    ranking drift?'. RBO@{RBO_DEPTH} = (1−p)·Sigma p^(d−1)·overlap_d/d
    with p = {RBO_P}; overlap_d counts common terms whose max rank ≤ d
    (an equi-free join on the bounded top-k lists), and every depth term
    quantizes to nano-units before the 50-term sum (order-free; the
    power() follows the eval_ndcg_at_k ln precedent at the reported
    rounding). Reported in milli-units.

    Scale shape: rankings come from per-half hash-aggs; the RBO
    arithmetic runs on ≤ {RBO_DEPTH} rows. Heaps-bounded vocabulary."""
    docs = fan_out(load(spark, sf_dir, "documents"))
    tok = docs.select(
        F.when(F.col("source") < "src5", "A").otherwise("B").alias("half"),
        F.explode(F.split("text", " ")).alias("term"),
    )
    cnt = tok.groupBy("half", "term").agg(F.count("*").cast("long").alias("c"))
    ranked = cnt.select(
        "half",
        "term",
        F.row_number()
        .over(Window.partitionBy("half").orderBy(F.desc("c"), "term"))
        .cast("long")
        .alias("rk"),
    ).filter(F.col("rk") <= RBO_DEPTH)
    a = ranked.filter(F.col("half") == "A").select("term", F.col("rk").alias("ra"))
    b = ranked.filter(F.col("half") == "B").select("term", F.col("rk").alias("rb"))
    mr = a.join(b, "term").select(
        "term", F.greatest("ra", "rb").alias("m")
    )
    n_common = mr.count()
    ds = spark.range(1, RBO_DEPTH + 1).select(F.col("id").alias("d"))
    ov = (
        ds.join(F.broadcast(mr), F.col("m") <= F.col("d"), "left")
        .groupBy("d")
        .agg(F.count("term").cast("long").alias("overlap_d"))
    )
    terms = ov.agg(
        F.sum(
            F.round(
                1000000000.0
                * F.pow(F.lit(RBO_P), F.col("d") - 1)
                * F.col("overlap_d")
                / F.col("d")
            ).cast("long")
        )
        .cast("long")
        .alias("s")
    )
    return terms.select(
        F.lit(n_common).cast("long").alias("n_common"),
        F.round((1 - RBO_P) * F.col("s") / 1000000.0)
        .cast("long")
        .alias("rbo_1e3"),
    )
