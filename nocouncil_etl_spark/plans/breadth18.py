"""Breadth batch 18: experiment power planning, FK integrity audit,
rolling correlation.

- ``stat_power_binomial`` — two-proportion sample-size planning per
  event type: from each type's OBSERVED conversion-proxy rate p₀, the
  n per arm needed to detect a 10% relative lift at α=5% (two-sided),
  power 80% — normal-approximation formula with the z quantiles as
  design constants quantized to millionths. The "how long must this
  A/B run" planner, computed in-engine from live rates; completes the
  experimentation suite (design → CUPED/diff-in-diff analysis → SPRT
  monitoring → BH-FDR reporting).
- ``dq_referential_integrity`` — orphan-key audit across the star
  schema (lineitem→orders, lineitem→part, orders→customer) with
  PLANTED orphan rows (offset ids), so the anti-join machinery provably
  catches dangling references and the healthy baseline provably
  reports zero. The FK half of the data-quality family
  (dq_validation_report covers value rules).
- ``window_rolling_corr`` — 7-day rolling Pearson correlation between
  the purchase and error daily value series (exact integer window
  moments, one final double expression): "do failures track sales this
  week" — the windowed sibling of agg_correlation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nocouncil_etl_spark.io import load
from nocouncil_etl_spark.registry import query

# z quantiles as design constants (millionths): z_{0.975}, z_{0.80}
Z_ALPHA_1E6 = 1_959_964
Z_BETA_1E6 = 841_621
MDE_REL_PCT = 10  # detect a 10% relative lift

ORPHAN_OFFSET = 7_000_000
ORPHAN_MOD = 997  # plant ~0.1% orphan children per relationship

ROLL_DAYS = 7


# --------------------------------------------------------------------------
# 1. Binomial power / sample-size planning
# --------------------------------------------------------------------------


@query(
    "stat_power_binomial",
    oracle=f"""
WITH rates AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n_events,
         CAST(sum(CASE WHEN value > 150 THEN 1 ELSE 0 END) AS BIGINT) AS n_hit
  FROM events GROUP BY event_type
),
calc AS (
  SELECT event_type, n_events, n_hit,
         CAST(n_hit AS DOUBLE) / n_events AS p0,
         (CAST(n_hit AS DOUBLE) / n_events) * (1.0 + {MDE_REL_PCT} / 100.0) AS p1
  FROM rates
)
SELECT event_type, n_events, n_hit, round(p0, 6) AS p0_6, round(p1, 6) AS p1_6,
       CAST(ceil(
         (({Z_ALPHA_1E6} / 1e6) * sqrt(2.0 * ((p0 + p1) / 2.0) * (1.0 - (p0 + p1) / 2.0))
          + ({Z_BETA_1E6} / 1e6) * sqrt(p0 * (1.0 - p0) + p1 * (1.0 - p1)))
         * (({Z_ALPHA_1E6} / 1e6) * sqrt(2.0 * ((p0 + p1) / 2.0) * (1.0 - (p0 + p1) / 2.0))
            + ({Z_BETA_1E6} / 1e6) * sqrt(p0 * (1.0 - p0) + p1 * (1.0 - p1)))
         / ((p1 - p0) * (p1 - p0))) AS BIGINT) AS n_per_arm
FROM calc WHERE n_hit > 0 AND n_hit < n_events
""",
)
def stat_power_binomial(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion sample-size planning per event type: baseline rate
    p₀ = share of events with value > 150, target p₁ = p₀·1.1 (a
    {MDE_REL_PCT}% relative lift), n per arm = ⌈(z_α√(2p̄(1−p̄)) +
    z_β√(p₀q₀+p₁q₁))² / (p₁−p₀)²⌉ with z quantiles fixed design
    constants in millionths — identical double expression trees on both
    engines, so even ceil lands identically. The pre-experiment planner
    beside the post-experiment analyzers.

    Scale shape: one combine-agg per type, constant arithmetic after."""
    ev = load(spark, sf_dir, "events")
    rates = ev.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_events"),
        F.sum(F.when(F.col("value") > 150, 1).otherwise(0))
        .cast("long")
        .alias("n_hit"),
    )
    p0 = F.col("n_hit").cast("double") / F.col("n_events")
    p1 = p0 * (1.0 + MDE_REL_PCT / 100.0)
    pbar = (p0 + p1) / 2.0
    za = Z_ALPHA_1E6 / 1e6
    zb = Z_BETA_1E6 / 1e6
    root = za * F.sqrt(2.0 * pbar * (1.0 - pbar)) + zb * F.sqrt(
        p0 * (1.0 - p0) + p1 * (1.0 - p1)
    )
    n_arm = F.ceil(root * root / ((p1 - p0) * (p1 - p0))).cast("long")
    return (
        rates.filter((F.col("n_hit") > 0) & (F.col("n_hit") < F.col("n_events")))
        .select(
            "event_type",
            "n_events",
            "n_hit",
            F.round(p0, 6).alias("p0_6"),
            F.round(p1, 6).alias("p1_6"),
            n_arm.alias("n_per_arm"),
        )
    )


# --------------------------------------------------------------------------
# 2. Referential-integrity audit
# --------------------------------------------------------------------------


def _ri_pair_sql(child: str, child_key: str, parent: str, parent_key: str,
                 mod_salt: int) -> str:
    return f"""
SELECT '{child}.{child_key} -> {parent}.{parent_key}' AS relationship,
       CAST(count(*) AS BIGINT) AS n_child,
       CAST(sum(CASE WHEN p.{parent_key} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_orphans
FROM (
  SELECT {child_key} FROM {child}
  UNION ALL
  SELECT {child_key} + {ORPHAN_OFFSET} FROM {child}
  WHERE {child_key} % {ORPHAN_MOD} = {mod_salt}
) c
LEFT JOIN (SELECT DISTINCT {parent_key} FROM {parent}) p
  ON c.{child_key} = p.{parent_key}"""


@query(
    "dq_referential_integrity",
    oracle=" UNION ALL ".join(
        [
            _ri_pair_sql("lineitem", "l_orderkey", "orders", "o_orderkey", 1),
            _ri_pair_sql("orders", "o_custkey", "customer", "c_custkey", 2),
            _ri_pair_sql("lineitem", "l_partkey", "part", "p_partkey", 3),
        ]
    ),
)
def dq_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Foreign-key orphan audit over the star schema with planted orphans:
    each child table is unioned with offset-id copies of ~1/{ORPHAN_MOD}
    of its rows (ids shifted by {ORPHAN_OFFSET}, guaranteed dangling), and
    each relationship reports child cardinality and orphan count via an
    anti-join-shaped LEFT JOIN against the distinct parent keys. The
    planted rows prove the detector fires; the un-planted remainder
    proves the healthy baseline reads zero.

    Scale shape: per relationship one distinct on the parent key and one
    keyed join — the join AQE would broadcast when the parent is small;
    counts combine map-side."""
    frames = []
    for child_t, ck, parent_t, pk, salt in [
        ("lineitem", "l_orderkey", "orders", "o_orderkey", 1),
        ("orders", "o_custkey", "customer", "c_custkey", 2),
        ("lineitem", "l_partkey", "part", "p_partkey", 3),
    ]:
        child = load(spark, sf_dir, child_t).select(F.col(ck).alias("k"))
        planted = child.filter(F.col("k") % ORPHAN_MOD == salt).select(
            (F.col("k") + ORPHAN_OFFSET).alias("k")
        )
        allc = child.unionByName(planted)
        parent = (
            load(spark, sf_dir, parent_t).select(F.col(pk).alias("pk")).distinct()
        )
        joined = allc.join(parent, allc["k"] == parent["pk"], "left")
        frames.append(
            joined.agg(
                F.lit(f"{child_t}.{ck} -> {parent_t}.{pk}").alias("relationship"),
                F.count("*").cast("long").alias("n_child"),
                F.sum(F.when(F.col("pk").isNull(), 1).otherwise(0))
                .cast("long")
                .alias("n_orphans"),
            )
        )
    out = frames[0]
    for fdf in frames[1:]:
        out = out.unionByName(fdf)
    return out


# --------------------------------------------------------------------------
# 3. Rolling correlation
# --------------------------------------------------------------------------


@query(
    "window_rolling_corr",
    oracle=f"""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day,
         CAST(sum(CASE WHEN event_type = 'purchase'
                  THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS a,
         CAST(sum(CASE WHEN event_type = 'error'
                  THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS b
  FROM events GROUP BY 1
),
win AS (
  SELECT day, a, b,
         CAST(count(*) OVER w AS BIGINT) AS n,
         CAST(sum(a) OVER w AS BIGINT) AS sa, CAST(sum(b) OVER w AS BIGINT) AS sb,
         CAST(sum(a * a) OVER w AS BIGINT) AS saa,
         CAST(sum(b * b) OVER w AS BIGINT) AS sbb,
         CAST(sum(a * b) OVER w AS BIGINT) AS sab
  FROM daily
  WINDOW w AS (ORDER BY day ROWS BETWEEN {ROLL_DAYS - 1} PRECEDING AND CURRENT ROW)
)
SELECT CAST(day AS VARCHAR) AS day, n,
       round((n * sab - CAST(sa AS DOUBLE) * sb)
             / (sqrt(n * CAST(saa AS DOUBLE) - CAST(sa AS DOUBLE) * sa)
                * sqrt(n * CAST(sbb AS DOUBLE) - CAST(sb AS DOUBLE) * sb)), 6)
         AS corr_7d
FROM win
WHERE n = {ROLL_DAYS}
  AND n * CAST(saa AS DOUBLE) - CAST(sa AS DOUBLE) * sa > 0
  AND n * CAST(sbb AS DOUBLE) - CAST(sb AS DOUBLE) * sb > 0
""",
)
def window_rolling_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{ROLL_DAYS}-day rolling Pearson correlation between daily purchase
    and error spend (exact integer window moments; one final double
    expression rounded 6dp): the windowed sibling of agg_correlation —
    "did failures start tracking sales this week". Degenerate windows
    (zero variance or shorter than {ROLL_DAYS} days) are excluded on
    both engines.

    Scale shape: the corpus collapses to one row per day, then five
    banded ROWS-frame window sums over the calendar-length series."""
    ev = load(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    daily = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.sum(F.when(F.col("event_type") == "purchase", cents).otherwise(0))
        .cast("long")
        .alias("a"),
        F.sum(F.when(F.col("event_type") == "error", cents).otherwise(0))
        .cast("long")
        .alias("b"),
    )
    w = Window.orderBy("day").rowsBetween(-(ROLL_DAYS - 1), 0)
    win = daily.select(
        "day",
        F.count("*").over(w).cast("long").alias("n"),
        F.sum("a").over(w).cast("long").alias("sa"),
        F.sum("b").over(w).cast("long").alias("sb"),
        F.sum(F.col("a") * F.col("a")).over(w).cast("long").alias("saa"),
        F.sum(F.col("b") * F.col("b")).over(w).cast("long").alias("sbb"),
        F.sum(F.col("a") * F.col("b")).over(w).cast("long").alias("sab"),
    )
    var_a = F.col("n") * F.col("saa").cast("double") - F.col("sa").cast(
        "double"
    ) * F.col("sa")
    var_b = F.col("n") * F.col("sbb").cast("double") - F.col("sb").cast(
        "double"
    ) * F.col("sb")
    corr = (
        F.col("n") * F.col("sab") - F.col("sa").cast("double") * F.col("sb")
    ) / (F.sqrt(var_a) * F.sqrt(var_b))
    return (
        win.filter((F.col("n") == ROLL_DAYS) & (var_a > 0) & (var_b > 0))
        .select(
            F.col("day").cast("string").alias("day"),
            "n",
            F.round(corr, 6).alias("corr_7d"),
        )
    )
