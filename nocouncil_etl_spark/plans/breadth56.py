"""Breadth batch 36 (round 6): sampled closeness centrality, 1-D GMM EM,
AR(2) Yule-Walker forecast, newsvendor stocking, Bollinger-band breaches,
hierarchical forecast reconciliation.

Six operators (reference scope: graph centrality beyond degree/PageRank,
soft clustering of a numeric signal, classical linear time-series
forecasting, inventory optimization under asymmetric cost, volatility-band
anomaly flags, and keeping a forecast hierarchy coherent):

- ``graph_closeness_sampled``   — per-seed truncated-BFS closeness
  centrality (Wasserman-Faust style, within a fixed hop radius).
- ``ml_gmm_em_1d``              — two-component 1-D Gaussian mixture fit
  by three unrolled EM iterations with moment-based init.
- ``ts_ar2_yule_walker``        — AR(2) coefficients from the biased ACF
  via Yule-Walker, then a 5-step recursive forecast.
- ``agg_newsvendor_quantile``   — critical-fractile optimal stock per
  group + expected overage/underage cost at that level.
- ``window_bollinger_bands``    — 7-day rolling mean ± 2σ bands and
  breach counts per event type.
- ``ts_hierarchical_reconcile`` — bottom-up vs proportional top-down
  reconciliation of per-nation revenue forecasts.

Reference parity: north-star extension — no reference analogue
(the reference has no analytics layer); these are the standard deepenings a lake-scale
engine is asked for on the same tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nocouncil_etl_spark.io import load
from nocouncil_etl_spark.plans.graph_plans import _EDGES_SQL, _graph
from nocouncil_etl_spark.registry import query

CLOSENESS_SEED_MOD = 97  # node % 97 == 0 → seed set for sampled closeness
CLOSENESS_HOPS = 4
GMM_ITERS = 3
AR_FORECAST_H = 5
NV_CU = 3  # newsvendor underage cost / unit
NV_CO = 1  # newsvendor overage cost / unit (critical ratio = 3/4)
BOLL_WIN = 7  # Bollinger window (6 preceding + current)

# --------------------------------------------------------------------------
# 1. Sampled closeness centrality (truncated BFS per seed)
# --------------------------------------------------------------------------


def _closeness_oracle() -> str:
    cte = [f"WITH {_EDGES_SQL},"]
    cte.append(f"""
c0 AS (
  SELECT node AS seed, node, 0 AS d FROM nodes
  WHERE node % {CLOSENESS_SEED_MOD} = 0
)""")
    for k in range(CLOSENESS_HOPS):
        cte.append(f""",
x{k} AS (
  SELECT c.seed, e.dst AS node, c.d + 1 AS d
  FROM c{k} c JOIN edges0 e ON c.node = e.src
),
c{k + 1} AS (
  SELECT seed, node, min(d) AS d
  FROM (SELECT * FROM c{k} UNION ALL SELECT * FROM x{k})
  GROUP BY seed, node
)""")
    cte.append(f"""
SELECT seed,
       CAST(count(*) - 1 AS BIGINT) AS n_reached,
       CAST(sum(d) AS BIGINT) AS sum_dist,
       CAST(CASE WHEN sum(d) > 0
                 THEN round(1000000.0 * (count(*) - 1) / sum(d))
                 ELSE 0 END AS BIGINT) AS closeness_micro
FROM c{CLOSENESS_HOPS}
GROUP BY seed""")
    return "".join(cte)


@query("graph_closeness_sampled", oracle=_closeness_oracle())
def graph_closeness_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sampled closeness centrality: from each seed (node % 97 == 0) run a
    {CLOSENESS_HOPS}-hop truncated BFS, then report per seed the count of
    reached nodes, the sum of shortest-path distances, and the
    Wasserman-Faust closeness (reached / sum-dist, micro-scaled). The
    landmark/sampled form is THE scalable closeness estimator — exact
    closeness is all-pairs BFS, O(V·E), a non-starter at crawl scale;
    per-seed truncated frontiers are |seeds| independent PageRank-shaped
    join chains.

    Scale shape: state is (seed, node, d) — |seeds| × reachable-set rows;
    each hop is one equi-join frontier expansion + a map-side-combined
    min keyed by (seed, node). Seeds fan out independently, so the job
    parallelizes across seeds with no cross-seed shuffle dependency.
    Integer labels keep every hop bit-identical across engines; the
    oracle unrolls one CTE per hop (the PageRank technique)."""
    nodes, edges, _ = _graph(spark, sf_dir)
    edges0 = edges.select("src", "dst")
    dist = (
        nodes.filter(F.col("node") % CLOSENESS_SEED_MOD == 0)
        .select(F.col("node").alias("seed"), "node", F.lit(0).alias("d"))
    )
    for _ in range(CLOSENESS_HOPS):
        nxt = (
            dist.join(edges0, dist["node"] == edges0["src"])
            .select("seed", F.col("dst").alias("node"), (F.col("d") + 1).alias("d"))
        )
        dist = (
            dist.unionByName(nxt)
            .groupBy("seed", "node")
            .agg(F.min("d").alias("d"))
        )
    return dist.groupBy("seed").agg(
        (F.count(F.lit(1)) - 1).cast("long").alias("n_reached"),
        F.sum("d").cast("long").alias("sum_dist"),
        F.when(
            F.sum("d") > 0,
            F.round(1e6 * (F.count(F.lit(1)) - 1) / F.sum("d")),
        )
        .otherwise(0)
        .cast("long")
        .alias("closeness_micro"),
    )


# --------------------------------------------------------------------------
# 2. Two-component 1-D Gaussian mixture via unrolled EM
# --------------------------------------------------------------------------


def _gmm_oracle() -> str:
    cte = ["""WITH d AS (SELECT value AS x FROM events WHERE value IS NOT NULL),
p0 AS (
  SELECT avg(x) - stddev_pop(x) AS mu1, avg(x) + stddev_pop(x) AS mu2,
         var_pop(x) AS v1, var_pop(x) AS v2, 0.5 AS w1
  FROM d
)"""]
    for k in range(GMM_ITERS):
        cte.append(f""",
r{k} AS (
  SELECT d.x,
         p.w1 * exp(-(d.x - p.mu1) * (d.x - p.mu1) / (2 * p.v1)) / sqrt(p.v1) AS a,
         (1 - p.w1) * exp(-(d.x - p.mu2) * (d.x - p.mu2) / (2 * p.v2)) / sqrt(p.v2) AS b
  FROM d CROSS JOIN p{k} p
),
g{k} AS (SELECT x, a / (a + b) AS r FROM r{k}),
mn{k} AS (
  SELECT sum(r * x) / sum(r) AS mu1,
         sum((1 - r) * x) / sum(1 - r) AS mu2,
         avg(r) AS w1
  FROM g{k}
),
p{k + 1} AS (
  SELECT mn.mu1, mn.mu2,
         sum(g.r * (g.x - mn.mu1) * (g.x - mn.mu1)) / sum(g.r) AS v1,
         sum((1 - g.r) * (g.x - mn.mu2) * (g.x - mn.mu2)) / sum(1 - g.r) AS v2,
         mn.w1
  FROM g{k} g CROSS JOIN mn{k} mn
  GROUP BY mn.mu1, mn.mu2, mn.w1
)""")
    cte.append(f"""
SELECT (SELECT CAST(count(*) AS BIGINT) FROM d) AS n,
       CAST(round(1000000 * w1) AS BIGINT) AS w1_micro,
       CAST(round(1000 * mu1) AS BIGINT) AS mu1_milli,
       CAST(round(1000 * mu2) AS BIGINT) AS mu2_milli,
       CAST(round(1000 * v1) AS BIGINT) AS v1_milli,
       CAST(round(1000 * v2) AS BIGINT) AS v2_milli
FROM p{GMM_ITERS}""")
    return "".join(cte)


@query("ml_gmm_em_1d", oracle=_gmm_oracle())
def ml_gmm_em_1d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-component 1-D Gaussian mixture over event values, fit by
    {GMM_ITERS} unrolled EM iterations. Init is deterministic from exact
    moments (μ ± σ, pooled variance, equal weights); the E-step computes
    per-row responsibilities against broadcast scalar parameters, the
    M-step is one hash aggregate. The oracle unrolls the identical
    arithmetic one CTE block per iteration (window-function form for the
    weighted variances).

    Scale shape: each iteration is ONE full scan + map-side-combined
    aggregate; parameters are 5 scalars fetched to the driver per
    iteration (the documented iterative-scalar pattern — a param
    subquery per iteration would double the logical plan per step).
    Weighted variance uses the two-pass (mean-then-moments) form on both
    sides so float rounding agrees to the reported milli precision."""
    d = (
        load(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(F.col("value").alias("x"))
    )
    init = d.agg(
        (F.avg("x") - F.stddev_pop("x")).alias("mu1"),
        (F.avg("x") + F.stddev_pop("x")).alias("mu2"),
        F.var_pop("x").alias("v1"),
        F.var_pop("x").alias("v2"),
        F.count(F.lit(1)).alias("n"),
    ).first()
    mu1, mu2, v1, v2, w1, n = init.mu1, init.mu2, init.v1, init.v2, 0.5, init.n
    import math

    for _ in range(GMM_ITERS):
        a = F.lit(w1) * F.exp(
            -(F.col("x") - F.lit(mu1)) * (F.col("x") - F.lit(mu1)) / (2 * F.lit(v1))
        ) / math.sqrt(v1)
        b = F.lit(1 - w1) * F.exp(
            -(F.col("x") - F.lit(mu2)) * (F.col("x") - F.lit(mu2)) / (2 * F.lit(v2))
        ) / math.sqrt(v2)
        g = d.select("x", (a / (a + b)).alias("r"))
        # two-pass weighted variance: means first, then central moments
        m = g.agg(
            (F.sum(F.col("r") * F.col("x")) / F.sum("r")).alias("mu1"),
            (F.sum((1 - F.col("r")) * F.col("x")) / F.sum(1 - F.col("r"))).alias("mu2"),
            F.avg("r").alias("w1"),
        ).first()
        mu1n, mu2n, w1n = m.mu1, m.mu2, m.w1
        v = g.agg(
            (
                F.sum(F.col("r") * (F.col("x") - F.lit(mu1n)) * (F.col("x") - F.lit(mu1n)))
                / F.sum("r")
            ).alias("v1"),
            (
                F.sum(
                    (1 - F.col("r"))
                    * (F.col("x") - F.lit(mu2n))
                    * (F.col("x") - F.lit(mu2n))
                )
                / F.sum(1 - F.col("r"))
            ).alias("v2"),
        ).first()
        mu1, mu2, v1, v2, w1 = mu1n, mu2n, v.v1, v.v2, w1n
    return d.sparkSession.range(1).select(
        F.lit(n).cast("long").alias("n"),
        F.round(F.lit(1e6 * w1)).cast("long").alias("w1_micro"),
        F.round(F.lit(1e3 * mu1)).cast("long").alias("mu1_milli"),
        F.round(F.lit(1e3 * mu2)).cast("long").alias("mu2_milli"),
        F.round(F.lit(1e3 * v1)).cast("long").alias("v1_milli"),
        F.round(F.lit(1e3 * v2)).cast("long").alias("v2_milli"),
    )


# --------------------------------------------------------------------------
# 3. AR(2) Yule-Walker fit + recursive forecast
# --------------------------------------------------------------------------


def _ar2_sql_series() -> str:
    return """
s AS (
  SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS DOUBLE) AS y
  FROM events GROUP BY 1
),
idx AS (
  SELECT y, row_number() OVER (ORDER BY day) AS t,
         count(*) OVER () AS n, avg(y) OVER () AS m
  FROM s
),
z AS (SELECT t, n, y - m AS z, m FROM idx),
acf AS (
  SELECT max(a.n) AS n, max(a.m) AS m,
         sum(a.z * a.z) / max(a.n) AS c0,
         sum(CASE WHEN b1.z IS NOT NULL THEN a.z * b1.z END) / max(a.n) AS c1,
         sum(CASE WHEN b2.z IS NOT NULL THEN a.z * b2.z END) / max(a.n) AS c2
  FROM z a
  LEFT JOIN z b1 ON b1.t = a.t - 1
  LEFT JOIN z b2 ON b2.t = a.t - 2
),
fit AS (
  SELECT n, m,
         (c1 / c0) * (1 - c2 / c0) / (1 - (c1 / c0) * (c1 / c0)) AS phi1,
         (c2 / c0 - (c1 / c0) * (c1 / c0)) / (1 - (c1 / c0) * (c1 / c0)) AS phi2
  FROM acf
),
tail AS (
  SELECT max(CASE WHEN t = n THEN z END) AS z0,
         max(CASE WHEN t = n - 1 THEN z END) AS zm1
  FROM z
)"""


def _ar2_oracle() -> str:
    cte = [f"WITH {_ar2_sql_series()},", "f0 AS (SELECT f.phi1, f.phi2, f.m, t.z0 AS a, t.zm1 AS b FROM fit f CROSS JOIN tail t)"]
    for h in range(1, AR_FORECAST_H + 1):
        cte.append(
            f", f{h} AS (SELECT phi1, phi2, m, phi1 * a + phi2 * b AS a, a AS b FROM f{h - 1})"
        )
    sel = "\nUNION ALL\n".join(
        f"SELECT {h} AS h, CAST(round(1000 * (m + a)) AS BIGINT) AS forecast_milli FROM f{h}"
        for h in range(1, AR_FORECAST_H + 1)
    )
    cte.append(
        f"""
SELECT h, forecast_milli,
       (SELECT CAST(round(1000000 * phi1) AS BIGINT) FROM fit) AS phi1_micro,
       (SELECT CAST(round(1000000 * phi2) AS BIGINT) FROM fit) AS phi2_micro
FROM ({sel})"""
    )
    return "".join(cte)


@query("ts_ar2_yule_walker", oracle=_ar2_oracle())
def ts_ar2_yule_walker(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AR(2) model of the daily event-count series: biased autocovariances
    c0/c1/c2 → Yule-Walker closed form for (φ1, φ2) → a
    {AR_FORECAST_H}-step recursive forecast from the last two demeaned
    observations (forecast_h = φ1·f_{{h-1}} + φ2·f_{{h-2}}, mean added
    back). Companion to ts_pacf_durbin (which stops at the PACF): this
    is the fit-and-forecast half of the classical Box-Jenkins loop.

    Scale shape: the series is one date-keyed aggregate of the raw
    events (tiny); ACF lags are a self-join on the row index (equi-join,
    no window spill); the 5-step recursion is closed-form scalar math on
    a 1-row frame. The heavy lifting — raw events → daily series — is
    one map-side-combined aggregate."""
    s = (
        load(spark, sf_dir, "events")
        .groupBy(F.to_date("ts").alias("day"))
        .agg(F.count(F.lit(1)).cast("double").alias("y"))
    )
    w = Window.orderBy("day")
    idx = s.select(
        "y",
        F.row_number().over(w).alias("t"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
        F.avg("y").over(Window.partitionBy()).alias("m"),
    )
    z = idx.select("t", "n", (F.col("y") - F.col("m")).alias("z"), "m")
    a, b1, b2 = z.alias("a"), z.alias("b1"), z.alias("b2")
    acf = (
        a.join(b1, F.col("b1.t") == F.col("a.t") - 1, "left")
        .join(b2, F.col("b2.t") == F.col("a.t") - 2, "left")
        .agg(
            F.max("a.n").alias("n"),
            F.max("a.m").alias("m"),
            (F.sum(F.col("a.z") * F.col("a.z")) / F.max("a.n")).alias("c0"),
            (
                F.sum(
                    F.when(F.col("b1.z").isNotNull(), F.col("a.z") * F.col("b1.z"))
                )
                / F.max("a.n")
            ).alias("c1"),
            (
                F.sum(
                    F.when(F.col("b2.z").isNotNull(), F.col("a.z") * F.col("b2.z"))
                )
                / F.max("a.n")
            ).alias("c2"),
        )
        .first()
    )
    r1, r2 = acf.c1 / acf.c0, acf.c2 / acf.c0
    phi1 = r1 * (1 - r2) / (1 - r1 * r1)
    phi2 = (r2 - r1 * r1) / (1 - r1 * r1)
    tail = z.agg(
        F.max(F.when(F.col("t") == F.col("n"), F.col("z"))).alias("z0"),
        F.max(F.when(F.col("t") == F.col("n") - 1, F.col("z"))).alias("zm1"),
    ).first()
    fa, fb = tail.z0, tail.zm1

    def r_away(x: float) -> int:
        # round-half-away-from-zero, matching SQL round() (Python's
        # built-in round is half-even and would disagree at exact .5)
        import math as _m

        return int(_m.copysign(_m.floor(abs(x) + 0.5), x))

    rows = []
    for h in range(1, AR_FORECAST_H + 1):
        fa, fb = phi1 * fa + phi2 * fb, fa
        rows.append((h, r_away(1000 * (acf.m + fa))))
    return spark.createDataFrame(
        [(h, v, r_away(1e6 * phi1), r_away(1e6 * phi2)) for h, v in rows],
        "h int, forecast_milli long, phi1_micro long, phi2_micro long",
    )


# --------------------------------------------------------------------------
# 4. Newsvendor critical-fractile stocking
# --------------------------------------------------------------------------


@query(
    "agg_newsvendor_quantile",
    oracle=f"""
WITH demand AS (
  SELECT l_returnflag AS flag, CAST(l_shipdate AS DATE) AS day,
         sum(l_quantity) AS d
  FROM lineitem GROUP BY 1, 2
),
r AS (
  SELECT flag, d, row_number() OVER (PARTITION BY flag ORDER BY d) AS rn,
         count(*) OVER (PARTITION BY flag) AS n
  FROM demand
),
q AS (
  SELECT flag, max(n) AS n_days,
         max(CASE WHEN rn = CAST(ceil(n * {NV_CU}.0 / ({NV_CU} + {NV_CO})) AS BIGINT)
                  THEN d END) AS qstar
  FROM r GROUP BY flag
)
SELECT q.flag,
       CAST(q.n_days AS BIGINT) AS n_days,
       CAST(round(100 * q.qstar) AS BIGINT) AS q_star_cents,
       CAST(round(1000 * sum(greatest(q.qstar - dm.d, 0)) / q.n_days) AS BIGINT)
         AS exp_over_milli,
       CAST(round(1000 * sum(greatest(dm.d - q.qstar, 0)) / q.n_days) AS BIGINT)
         AS exp_under_milli,
       {NV_CO} * CAST(round(1000 * sum(greatest(q.qstar - dm.d, 0)) / q.n_days)
                      AS BIGINT)
       + {NV_CU} * CAST(round(1000 * sum(greatest(dm.d - q.qstar, 0)) / q.n_days)
                        AS BIGINT) AS exp_cost_milli
FROM q JOIN demand dm ON dm.flag = q.flag
GROUP BY q.flag, q.n_days, q.qstar
""",
)
def agg_newsvendor_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newsvendor optimal stocking per return-flag: the empirical
    critical-fractile order quantity Q* = the ⌈n·cu/(cu+co)⌉-th order
    statistic of daily demand (cu={NV_CU}, co={NV_CO} → 75th
    percentile), plus the expected overage, underage, and total cost the
    policy pays against the SAME empirical distribution. The order-stat
    form makes Q* exact (no percentile interpolation ambiguity) and the
    cost evaluation is one re-join of the demand series against Q*.

    Scale shape: demand is a two-key hash aggregate of lineitem; the
    order statistic is a partition-keyed sort (window per flag — 3
    partitions here, demand-days-sized at scale); the cost pass is a
    broadcast-joinable 3-row Q* table against the demand series."""
    cr_num, cr_den = NV_CU, NV_CU + NV_CO
    demand = (
        load(spark, sf_dir, "lineitem")
        .groupBy(
            F.col("l_returnflag").alias("flag"),
            F.to_date("l_shipdate").alias("day"),
        )
        .agg(F.sum("l_quantity").alias("d"))
    )
    w = Window.partitionBy("flag").orderBy("d")
    r = demand.select(
        "flag",
        "d",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("flag")).alias("n"),
    )
    q = r.groupBy("flag").agg(
        F.max("n").alias("n_days"),
        F.max(
            F.when(
                F.col("rn")
                == F.ceil(F.col("n") * cr_num / cr_den).cast("long"),
                F.col("d"),
            )
        ).alias("qstar"),
    )
    return (
        F.broadcast(q)
        .join(demand.withColumnRenamed("flag", "dflag"), F.col("dflag") == q["flag"])
        .groupBy("flag", "n_days", "qstar")
        .agg(
            F.sum(F.greatest(F.col("qstar") - F.col("d"), F.lit(0.0))).alias("ov"),
            F.sum(F.greatest(F.col("d") - F.col("qstar"), F.lit(0.0))).alias("un"),
        )
        .select(
            "flag",
            F.col("n_days").cast("long"),
            F.round(100 * F.col("qstar")).cast("long").alias("q_star_cents"),
            F.round(1000 * F.col("ov") / F.col("n_days"))
            .cast("long")
            .alias("exp_over_milli"),
            F.round(1000 * F.col("un") / F.col("n_days"))
            .cast("long")
            .alias("exp_under_milli"),
        )
        .withColumn(
            "exp_cost_milli",
            NV_CO * F.col("exp_over_milli") + NV_CU * F.col("exp_under_milli"),
        )
    )


# --------------------------------------------------------------------------
# 5. Bollinger bands + breach counts
# --------------------------------------------------------------------------


@query(
    "window_bollinger_bands",
    oracle=f"""
WITH s AS (
  SELECT event_type, CAST(ts AS DATE) AS day, avg(value) AS v
  FROM events WHERE value IS NOT NULL GROUP BY 1, 2
),
b AS (
  SELECT event_type, day, v,
         avg(v) OVER w AS m,
         stddev_pop(v) OVER w AS sd,
         row_number() OVER (PARTITION BY event_type ORDER BY day) AS rn
  FROM s
  WINDOW w AS (PARTITION BY event_type ORDER BY day
               ROWS BETWEEN {BOLL_WIN - 1} PRECEDING AND CURRENT ROW)
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_days,
       CAST(sum(CASE WHEN rn >= {BOLL_WIN} AND v > m + 2 * sd THEN 1 ELSE 0 END)
            AS BIGINT) AS n_upper_breach,
       CAST(sum(CASE WHEN rn >= {BOLL_WIN} AND v < m - 2 * sd THEN 1 ELSE 0 END)
            AS BIGINT) AS n_lower_breach,
       CAST(round(1000 * max(CASE WHEN rn >= {BOLL_WIN} THEN 4 * sd END))
            AS BIGINT) AS max_bandwidth_milli
FROM b GROUP BY event_type
""",
)
def window_bollinger_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bollinger bands over the per-type daily mean-value series: a
    {BOLL_WIN}-day rolling mean ± 2 rolling population σ, counting the
    days that close outside either band (volatility-adjusted anomalies —
    the adaptive-threshold sibling of the global ts_zscore_outliers) and
    the widest band seen. Warm-up rows (fewer than {BOLL_WIN}
    observations) are excluded from breach/bandwidth accounting on both
    sides.

    Scale shape: one hash aggregate events→daily series, then a single
    partition-keyed bounded-frame window pass (rolling mean and σ share
    one sort); the final rollup is a tiny per-type hash aggregate. No
    global sort, no unbounded frame."""
    s = (
        load(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.avg("value").alias("v"))
    )
    wroll = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-(BOLL_WIN - 1), 0)
    )
    wrn = Window.partitionBy("event_type").orderBy("day")
    b = s.select(
        "event_type",
        "v",
        F.avg("v").over(wroll).alias("m"),
        F.stddev_pop("v").over(wroll).alias("sd"),
        F.row_number().over(wrn).alias("rn"),
    )
    warm = F.col("rn") >= BOLL_WIN
    return b.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum(
            F.when(warm & (F.col("v") > F.col("m") + 2 * F.col("sd")), 1).otherwise(0)
        )
        .cast("long")
        .alias("n_upper_breach"),
        F.sum(
            F.when(warm & (F.col("v") < F.col("m") - 2 * F.col("sd")), 1).otherwise(0)
        )
        .cast("long")
        .alias("n_lower_breach"),
        F.round(1000 * F.max(F.when(warm, 4 * F.col("sd"))))
        .cast("long")
        .alias("max_bandwidth_milli"),
    )


# --------------------------------------------------------------------------
# 6. Hierarchical forecast reconciliation (bottom-up vs top-down)
# --------------------------------------------------------------------------


@query(
    "ts_hierarchical_reconcile",
    oracle="""
WITH hist AS (
  SELECT n.n_name AS nation, strftime(o.o_orderdate, '%Y-%m') AS mon,
         sum(CAST(round(100 * o.o_totalprice) AS BIGINT)) AS rev_c
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  GROUP BY 1, 2
),
base AS (
  SELECT nation, sum(rev_c) AS sc, count(*) AS nm FROM hist GROUP BY nation
),
tot AS (SELECT count(DISTINCT mon) AS nt FROM hist)
SELECT b.nation,
       CAST(round(CAST(b.sc AS DOUBLE) / b.nm) AS BIGINT) AS bu_forecast_cents,
       CAST(round(CAST(b.sc AS DOUBLE) / t.nt) AS BIGINT) AS td_forecast_cents,
       CAST(round(CAST(b.sc AS DOUBLE) / t.nt
                  - CAST(b.sc AS DOUBLE) / b.nm) AS BIGINT) AS gap_cents
FROM base b CROSS JOIN tot t
""",
)
def ts_hierarchical_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical forecast reconciliation over the nation→total revenue
    hierarchy: each nation's bottom-up base forecast (its own historical
    monthly mean) against the proportional top-down allocation (the
    total-level monthly-mean forecast split by historical revenue
    share), with the coherence gap per nation. The two classical
    reconciliation strategies disagree exactly when series-level and
    aggregate-level dynamics differ — the gap column IS the signal a
    forecast platform monitors.

    Proportional top-down with a monthly-mean total forecast reduces
    algebraically: f_total·p = (grand/n_total_months)·(nation/grand) =
    nation_total / n_total_months — the grand total cancels, so both
    forecasts are one integer-cents ratio (exact-rational inputs; no
    order-dependent double summation can perturb the cent rounding).

    Scale shape: history is one three-table join (nation broadcast) +
    hash aggregate; base is nation-cardinality; the month count is a
    1-row broadcast cross join."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    hist = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy(
            F.col("n_name").alias("nation"),
            F.date_format("o_orderdate", "yyyy-MM").alias("mon"),
        )
        .agg(F.sum(F.round(100 * F.col("o_totalprice")).cast("long")).alias("rev_c"))
    )
    base = hist.groupBy("nation").agg(
        F.sum("rev_c").alias("sc"), F.count(F.lit(1)).alias("nm")
    )
    tot = hist.agg(F.countDistinct("mon").alias("nt"))
    sc = F.col("sc").cast("double")
    return (
        base.crossJoin(F.broadcast(tot))
        .select(
            "nation",
            F.round(sc / F.col("nm")).cast("long").alias("bu_forecast_cents"),
            F.round(sc / F.col("nt")).cast("long").alias("td_forecast_cents"),
            F.round(sc / F.col("nt") - sc / F.col("nm"))
            .cast("long")
            .alias("gap_cents"),
        )
    )
