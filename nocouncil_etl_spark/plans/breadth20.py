"""Breadth batch 20: retention decay fitting and structural graph metrics.

- ``ts_exp_decay_fit`` — fit an exponential decay to the aggregate
  retention curve (share of users active d days after their first day):
  ln(rate_d) is quantized to integer micro-nats (the Kaplan-Meier
  libm-parity discipline: ln of identical rationals, round-6-absorbed),
  then the decay constant comes from EXACT integer OLS moments — slope,
  intercept and the implied half-life. "How fast do users churn" as one
  number, with the whole curve alongside.
- ``graph_reciprocity_density`` — directed density and reciprocity
  (share of edges whose reverse also exists) of the link graph: the
  two structural scalars read before any community/centrality work —
  a near-zero reciprocity citation graph and a high-reciprocity social
  graph need different algorithms downstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nocouncil_etl_spark.io import load
from nocouncil_etl_spark.plans.graph_plans import _EDGES_SQL, _graph
from nocouncil_etl_spark.registry import query

MAX_OFFSET = 14  # fit over day offsets 1..14
LN_SCALE = 1_000_000


# --------------------------------------------------------------------------
# 1. Exponential decay fit on the retention curve
# --------------------------------------------------------------------------


@query(
    "ts_exp_decay_fit",
    oracle=f"""
WITH ud AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
),
fs AS (SELECT user_id, min(day) AS first_day FROM ud GROUP BY user_id),
maxd AS (SELECT max(day) AS mx FROM ud),
offs AS (SELECT unnest(range(1, {MAX_OFFSET + 1})) AS d),
base AS (
  SELECT o.d, CAST(count(*) AS BIGINT) AS n_base
  FROM offs o JOIN fs f ON f.first_day + to_days(CAST(o.d AS INT))
                           <= (SELECT mx FROM maxd)
  GROUP BY o.d
),
ret AS (
  SELECT o.d, CAST(count(*) AS BIGINT) AS n_ret
  FROM offs o
  JOIN fs f ON f.first_day + to_days(CAST(o.d AS INT)) <= (SELECT mx FROM maxd)
  JOIN ud u ON u.user_id = f.user_id
           AND u.day = f.first_day + to_days(CAST(o.d AS INT))
  GROUP BY o.d
),
curve AS (
  SELECT b.d, b.n_base, coalesce(r.n_ret, 0) AS n_ret,
         CAST((coalesce(r.n_ret, 0) * {LN_SCALE}) // b.n_base AS BIGINT)
           AS rate_1e6,
         CAST(round(ln(CAST(coalesce(r.n_ret, 0) AS DOUBLE) / b.n_base) * {LN_SCALE})
              AS BIGINT) AS ln_rate_1e6
  FROM base b LEFT JOIN ret r ON b.d = r.d
  WHERE coalesce(r.n_ret, 0) > 0
),
fit AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(d) AS BIGINT) AS sd, CAST(sum(d * d) AS BIGINT) AS sdd,
         CAST(sum(ln_rate_1e6) AS BIGINT) AS sl,
         CAST(sum(d * ln_rate_1e6) AS BIGINT) AS sdl
  FROM curve
)
SELECT c.d, c.n_base, c.n_ret, c.rate_1e6, c.ln_rate_1e6,
       round((f.n * CAST(f.sdl AS DOUBLE) - CAST(f.sd AS DOUBLE) * f.sl)
             / (f.n * CAST(f.sdd AS DOUBLE) - CAST(f.sd AS DOUBLE) * f.sd)
             / {LN_SCALE}.0, 6) AS slope_per_day,
       round(0.693147 / (-((f.n * CAST(f.sdl AS DOUBLE) - CAST(f.sd AS DOUBLE) * f.sl)
             / (f.n * CAST(f.sdd AS DOUBLE) - CAST(f.sd AS DOUBLE) * f.sd)
             / {LN_SCALE}.0)), 4) AS half_life_days
FROM curve c CROSS JOIN fit f
""",
)
def ts_exp_decay_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponential decay fit on the aggregate retention curve: rate_d =
    (users active exactly d days after their first day) / (users whose
    offset-d day is observable), for d = 1..{MAX_OFFSET}; ln(rate)
    quantized to integer micro-nats (libm parity on identical rationals,
    round absorbed — the Kaplan-Meier discipline), slope from EXACT
    integer OLS moments over (d, ln_rate), half-life = ln2/(−slope).
    Positive-rate offsets only (ln is undefined at zero, identically on
    both engines).

    Scale shape: the user-day distinct + first-seen combine, then a
    {MAX_OFFSET}-row offsets frame joined against the per-user firsts —
    the curve and the fit are constant-size; only the user-day dedup
    touches corpus-scale data."""
    ev = load(spark, sf_dir, "events")
    ud = ev.select("user_id", F.col("ts").cast("date").alias("day")).distinct()
    ud = ud.persist()
    fs = ud.groupBy("user_id").agg(F.min("day").alias("first_day"))
    mx = ud.agg(F.max("day").alias("mx")).collect()[0].mx  # one scalar
    offs = spark.range(1, MAX_OFFSET + 1).select(F.col("id").cast("int").alias("d"))
    fs_off = (
        fs.crossJoin(F.broadcast(offs))
        .withColumn("target", F.date_add("first_day", F.col("d")))
        .filter(F.col("target") <= F.lit(mx))
    )
    base = fs_off.groupBy("d").agg(F.count("*").cast("long").alias("n_base"))
    ret = (
        fs_off.join(
            ud.select(F.col("user_id"), F.col("day").alias("target")),
            ["user_id", "target"],
        )
        .groupBy("d")
        .agg(F.count("*").cast("long").alias("n_ret"))
    )
    curve = (
        base.join(ret, "d", "left")
        .withColumn("n_ret", F.coalesce("n_ret", F.lit(0)).cast("long"))
        .filter(F.col("n_ret") > 0)
        .select(
            F.col("d").cast("long").alias("d"),
            "n_base",
            "n_ret",
            F.expr(f"(n_ret * {LN_SCALE}) div n_base").cast("long").alias("rate_1e6"),
            F.round(
                F.log(F.col("n_ret").cast("double") / F.col("n_base")) * LN_SCALE
            )
            .cast("long")
            .alias("ln_rate_1e6"),
        )
    )
    curve = curve.persist()
    fit = curve.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("d").cast("long").alias("sd"),
        F.sum(F.col("d") * F.col("d")).cast("long").alias("sdd"),
        F.sum("ln_rate_1e6").cast("long").alias("sl"),
        F.sum(F.col("d") * F.col("ln_rate_1e6")).cast("long").alias("sdl"),
    )
    slope = (
        (
            F.col("n") * F.col("sdl").cast("double")
            - F.col("sd").cast("double") * F.col("sl")
        )
        / (
            F.col("n") * F.col("sdd").cast("double")
            - F.col("sd").cast("double") * F.col("sd")
        )
        / float(LN_SCALE)
    )
    out = curve.crossJoin(F.broadcast(fit)).select(
        "d",
        "n_base",
        "n_ret",
        "rate_1e6",
        "ln_rate_1e6",
        F.round(slope, 6).alias("slope_per_day"),
        F.round(0.693147 / (-slope), 4).alias("half_life_days"),
    )
    out = out.persist()
    out.count()
    curve.unpersist()
    ud.unpersist()
    return out


# --------------------------------------------------------------------------
# 2. Density + reciprocity
# --------------------------------------------------------------------------


@query(
    "graph_reciprocity_density",
    oracle=f"""
WITH {_EDGES_SQL},
n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),
m AS (SELECT CAST(count(*) AS BIGINT) AS m FROM edges0),
recip AS (
  SELECT CAST(count(*) AS BIGINT) AS r
  FROM edges0 e JOIN edges0 b ON e.src = b.dst AND e.dst = b.src
)
SELECT (SELECT n FROM n) AS n_nodes, (SELECT m FROM m) AS n_edges,
       (SELECT r FROM recip) AS n_reciprocal,
       round(CAST((SELECT m FROM m) AS DOUBLE)
             / ((SELECT n FROM n) * (CAST((SELECT n FROM n) AS DOUBLE) - 1)), 9)
         AS density,
       round(CAST((SELECT r FROM recip) AS DOUBLE) / (SELECT m FROM m), 6)
         AS reciprocity
""",
)
def graph_reciprocity_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed density m/(n(n−1)) and reciprocity (share of edges whose
    reverse edge exists — counted by one self-join on the swapped key)
    of the link graph: the two structural scalars that pick the
    downstream algorithm family (near-zero reciprocity ⇒ citation-style
    flow ranking; high ⇒ social-style community structure).

    Scale shape: one count, one self equi-join on (src,dst)=(dst,src) —
    key-partitioned, linear in edges."""
    nodes, edges, n = _graph(spark, sf_dir)
    e0 = edges.select("src", "dst")
    m = e0.count()  # one scalar
    r = (
        e0.join(
            e0.select(F.col("src").alias("dst"), F.col("dst").alias("src")),
            ["src", "dst"],
        ).count()
    )
    # final rounding happens IN-ENGINE (Spark HALF_UP pairs with DuckDB
    # round; Python's banker's round does not)
    return spark.createDataFrame(
        [(n, m, r)],
        "n_nodes BIGINT, n_edges BIGINT, n_reciprocal BIGINT",
    ).select(
        "n_nodes",
        "n_edges",
        "n_reciprocal",
        F.round(
            F.col("n_edges").cast("double")
            / (F.col("n_nodes") * (F.col("n_nodes").cast("double") - 1)),
            9,
        ).alias("density"),
        F.round(
            F.col("n_reciprocal").cast("double") / F.col("n_edges"), 6
        ).alias("reciprocity"),
    )
