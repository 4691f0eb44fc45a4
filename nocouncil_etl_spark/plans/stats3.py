"""Nonparametric statistics batch: rank-based tests that need no normality
assumption — the robust siblings of ``agg_ttest_welch`` (evalstats.py).
A data pipeline reaches for these when comparing metric distributions
across cohorts/sources where outliers would wreck a t-test: A/B value
distributions (Mann-Whitney), drift between two snapshots' distributions
(Kolmogorov-Smirnov — the ECDF sibling of the binned PSI drift check), and
monotone association between per-user metrics (Spearman).

Exactness contract: every rank is computed on integer cents over the
DISTINCT-value table as ``2·avg_rank = 2·(#below) + (#tied) + 1`` — an
exact BIGINT (the ×2 absorbs the .5-granular midrank), so every rank sum,
Σrank², and cross-moment is an exact integer and combine-order-independent;
the test statistics finish in identical double expressions on both engines,
rounded 6dp. No window is needed AT ALL (r7): cumulative counts and
midranks come from Fenwick prefix sums over the distinct-value histogram
(operators/quantiles.cumulate/midrank2) — hash aggregates and keyed joins
only, the at-scale shape for rank statistics over billions of rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nocouncil_etl_spark.io import load
from nocouncil_etl_spark.operators.quantiles import cumulate, midrank2
from nocouncil_etl_spark.plans.evalstats import T_GROUP_A, T_GROUP_B
from nocouncil_etl_spark.registry import query

_CENTS_SQL = f"""
cents AS (
  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS v
  FROM events WHERE event_type IN ('{T_GROUP_A}', '{T_GROUP_B}')
),
byv AS (
  SELECT v,
         CAST(count(*) AS BIGINT) AS c,
         CAST(sum(CASE WHEN event_type = '{T_GROUP_A}' THEN 1 ELSE 0 END) AS BIGINT) AS c_a,
         CAST(sum(CASE WHEN event_type = '{T_GROUP_B}' THEN 1 ELSE 0 END) AS BIGINT) AS c_b
  FROM cents GROUP BY v
),
cum AS (
  SELECT v, c, c_a, c_b,
         CAST(coalesce(sum(c) OVER (ORDER BY v
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS below,
         CAST(sum(c_a) OVER (ORDER BY v) AS BIGINT) AS cum_a,
         CAST(sum(c_b) OVER (ORDER BY v) AS BIGINT) AS cum_b
  FROM byv
)
"""


def _cents_cum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark twin of the cents→distinct-value→cumulative CTE chain:
    (v, c, c_a, c_b, below, cum_a, cum_b), one row per distinct cent value.

    r7: NO window at all — the cumulative counts come from Fenwick
    prefix sums over the distinct-value histogram
    (operators/quantiles.cumulate): hash aggregates + keyed joins only,
    so the plan has no single-partition stage even if the value grid
    itself grows (the round-6 window here was global-order over the
    histogram — fine while the grid saturates, but a sort that the
    prefix decomposition makes unnecessary)."""
    ev = load(spark, sf_dir, "events")
    cents = ev.filter(F.col("event_type").isin(T_GROUP_A, T_GROUP_B)).select(
        "event_type", F.round(F.col("value") * 100).cast("long").alias("v")
    )
    byv = cents.groupBy("v").agg(
        F.count(F.lit(1)).cast("long").alias("c"),
        F.sum(F.when(F.col("event_type") == T_GROUP_A, 1).otherwise(0))
        .cast("long")
        .alias("c_a"),
        F.sum(F.when(F.col("event_type") == T_GROUP_B, 1).otherwise(0))
        .cast("long")
        .alias("c_b"),
    )
    cum = cumulate(byv, "v", ("c", "c_a", "c_b"))
    return cum.select(
        "v",
        "c",
        "c_a",
        "c_b",
        (F.col("cum_c") - F.col("c")).cast("long").alias("below"),
        F.col("cum_c_a").cast("long").alias("cum_a"),
        F.col("cum_c_b").cast("long").alias("cum_b"),
    )


# --------------------------------------------------------------------------
# 1. Mann-Whitney U (midranks + tie-corrected normal approximation)
# --------------------------------------------------------------------------


@query(
    "stat_mann_whitney_u",
    oracle=f"""
WITH {_CENTS_SQL},
acc AS (
  SELECT
    CAST(sum(c_a) AS BIGINT) AS n_a,
    CAST(sum(c_b) AS BIGINT) AS n_b,
    CAST(sum(c_a * (2 * below + c + 1)) AS BIGINT) AS r2_a,
    CAST(sum(c * c * c - c) AS BIGINT) AS tie3
  FROM cum
),
u AS (
  SELECT n_a, n_b, tie3,
         (CAST(r2_a AS DOUBLE) / 2) - CAST(n_a AS BIGINT) * (n_a + 1) / 2.0 AS u_a,
         CAST(n_a AS DOUBLE) * n_b AS nab,
         CAST(n_a + n_b AS BIGINT) AS n
  FROM acc
)
SELECT n_a, n_b,
       round(u_a, 1) AS u_a,
       round(nab - u_a, 1) AS u_b,
       round(least(u_a, nab - u_a), 1) AS u_stat,
       round((u_a - nab / 2)
             / sqrt(nab / 12.0 * ((n + 1) - CAST(tie3 AS DOUBLE) / (n * (n - 1)))),
             6) AS z_stat
FROM u
""",
)
def stat_mann_whitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U for {T_GROUP_A} vs {T_GROUP_B} event values: midranks
    via the exact doubled-rank identity (2·rank sum for group A =
    Σ c_a·(2·below + c + 1), a BIGINT), U_a = R_a − n_a(n_a+1)/2, and the
    tie-corrected normal approximation
    z = (U_a − n_a·n_b/2) / √(n_a·n_b/12·((N+1) − Σ(t³−t)/(N(N−1)))).
    U values are .5-granular (rounded 1dp — exact), z rounds 6dp.

    Scale shape: one filtered hash-agg to the distinct-value table,
    Fenwick prefix-sum joins over it (no window), one scalar row out.
    The raw-row term never shuffles more than (value, count) pairs."""
    acc = _cents_cum(spark, sf_dir).agg(
        F.sum("c_a").cast("long").alias("n_a"),
        F.sum("c_b").cast("long").alias("n_b"),
        F.sum(F.col("c_a") * (2 * F.col("below") + F.col("c") + 1))
        .cast("long")
        .alias("r2_a"),
        F.sum(F.col("c") * F.col("c") * F.col("c") - F.col("c"))
        .cast("long")
        .alias("tie3"),
    )
    u = acc.select(
        "n_a",
        "n_b",
        "tie3",
        (
            F.col("r2_a").cast("double") / 2
            - F.col("n_a").cast("long") * (F.col("n_a") + 1) / 2.0
        ).alias("u_a"),
        (F.col("n_a").cast("double") * F.col("n_b")).alias("nab"),
        (F.col("n_a") + F.col("n_b")).cast("long").alias("n"),
    )
    return u.select(
        "n_a",
        "n_b",
        F.round("u_a", 1).alias("u_a"),
        F.round(F.col("nab") - F.col("u_a"), 1).alias("u_b"),
        F.round(F.least(F.col("u_a"), F.col("nab") - F.col("u_a")), 1).alias(
            "u_stat"
        ),
        F.round(
            (F.col("u_a") - F.col("nab") / 2)
            / F.sqrt(
                F.col("nab")
                / 12.0
                * (
                    (F.col("n") + 1)
                    - F.col("tie3").cast("double")
                    / (F.col("n") * (F.col("n") - 1))
                )
            ),
            6,
        ).alias("z_stat"),
    )


# --------------------------------------------------------------------------
# 2. Kolmogorov-Smirnov two-sample
# --------------------------------------------------------------------------


@query(
    "stat_ks_two_sample",
    oracle=f"""
WITH {_CENTS_SQL},
tot AS (
  SELECT CAST(max(cum_a) AS BIGINT) AS n_a, CAST(max(cum_b) AS BIGINT) AS n_b FROM cum
),
gaps AS (
  SELECT cum.v, abs(cum_a * t.n_b - cum_b * t.n_a) AS gap_num
  FROM cum CROSS JOIN tot t
),
best AS (
  SELECT CAST(max(gap_num) AS BIGINT) AS d_numer,
         CAST(min(CASE WHEN gap_num = (SELECT max(gap_num) FROM gaps) THEN v END) AS BIGINT)
           AS v_at_max
  FROM gaps
)
SELECT t.n_a, t.n_b, b.d_numer, b.v_at_max,
       round(CAST(b.d_numer AS DOUBLE) / (t.n_a * CAST(t.n_b AS DOUBLE)), 6) AS d_stat,
       round(CAST(b.d_numer AS DOUBLE) / (t.n_a * CAST(t.n_b AS DOUBLE))
             * sqrt(t.n_a * CAST(t.n_b AS DOUBLE) / (t.n_a + t.n_b)), 6) AS k_stat
FROM tot t CROSS JOIN best b
""",
)
def stat_ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov over {T_GROUP_A} vs {T_GROUP_B} event
    values: D = max_v |F̂_a(v) − F̂_b(v)|, held exact as the BIGINT
    numerator |cum_a·n_b − cum_b·n_a| over the distinct-value grid (the
    ECDFs only change at sample points, so the grid max IS the sup);
    v_at_max = smallest argmax cent (deterministic). K = D·√(n_a·n_b/N)
    is the scale-free statistic compared against c(α). Doubles only in the
    final two expressions, rounded 6dp.

    Scale shape: identical to stat_mann_whitney_u — the distinct-value
    table bounds every post-agg stage; the argmax is a 1-row agg with a
    broadcast scalar, no re-sort of data-sized state."""
    cum = _cents_cum(spark, sf_dir)
    tot = cum.agg(
        F.max("cum_a").cast("long").alias("n_a"),
        F.max("cum_b").cast("long").alias("n_b"),
    )
    gaps = cum.crossJoin(F.broadcast(tot)).select(
        "v",
        "n_a",
        "n_b",
        F.abs(
            F.col("cum_a") * F.col("n_b") - F.col("cum_b") * F.col("n_a")
        ).alias("gap_num"),
    )
    best = (
        gaps.join(
            gaps.groupBy("n_a", "n_b").agg(
                F.max("gap_num").alias("mx")
            ),
            ["n_a", "n_b"],
        )
        .filter(F.col("gap_num") == F.col("mx"))
        .groupBy("n_a", "n_b")
        .agg(
            F.max("gap_num").cast("long").alias("d_numer"),
            F.min("v").cast("long").alias("v_at_max"),
        )
    )
    nab = F.col("n_a") * F.col("n_b").cast("double")
    d = F.col("d_numer").cast("double") / nab
    return best.select(
        "n_a",
        "n_b",
        "d_numer",
        "v_at_max",
        F.round(d, 6).alias("d_stat"),
        F.round(
            d * F.sqrt(nab / (F.col("n_a") + F.col("n_b"))), 6
        ).alias("k_stat"),
    )


# --------------------------------------------------------------------------
# 3. Spearman rank correlation (per-user activity vs spend)
# --------------------------------------------------------------------------


@query(
    "corr_spearman",
    oracle="""
WITH per_user AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS x,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
  FROM events GROUP BY user_id
),
rx AS (
  SELECT x AS val, CAST(count(*) AS BIGINT) AS c FROM per_user GROUP BY x
),
rx2 AS (
  SELECT val,
         2 * CAST(coalesce(sum(c) OVER (ORDER BY val
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
         + c + 1 AS r2
  FROM rx
),
ry AS (
  SELECT y AS val, CAST(count(*) AS BIGINT) AS c FROM per_user GROUP BY y
),
ry2 AS (
  SELECT val,
         2 * CAST(coalesce(sum(c) OVER (ORDER BY val
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
         + c + 1 AS r2
  FROM ry
),
ranked AS (
  SELECT u.user_id, rx2.r2 AS a, ry2.r2 AS b
  FROM per_user u JOIN rx2 ON rx2.val = u.x JOIN ry2 ON ry2.val = u.y
),
mom AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(a) AS BIGINT) AS sa, CAST(sum(b) AS BIGINT) AS sb,
         CAST(sum(a * a) AS BIGINT) AS saa, CAST(sum(b * b) AS BIGINT) AS sbb,
         CAST(sum(a * b) AS BIGINT) AS sab
  FROM ranked
)
SELECT n,
       round((n * CAST(sab AS DOUBLE) - CAST(sa AS DOUBLE) * sb)
             / sqrt((n * CAST(saa AS DOUBLE) - CAST(sa AS DOUBLE) * sa)
                    * (n * CAST(sbb AS DOUBLE) - CAST(sb AS DOUBLE) * sb)),
             6) AS rho
FROM mom
""",
)
def corr_spearman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between per-user event count and total
    spend (cents): midranks for both axes come from the doubled-rank
    identity over each axis's DISTINCT-value table (exact BIGINTs — no
    row-level window), joined back to the users; ρ is Pearson on the
    doubled ranks (the ×2 cancels), with all five moments exact BIGINTs
    and one rounded double out.

    Scale shape: per-user agg (one shuffle on user_id) → two
    distinct-value tables ranked by Fenwick prefix sums (no window) →
    two broadcast-shaped joins back → a 5-moment 1-row agg. Nothing is
    ever globally sorted."""
    ev = load(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("x"),
        F.sum(F.round(F.col("value") * 100).cast("long"))
        .cast("long")
        .alias("y"),
    )

    def rank2(col: str) -> DataFrame:
        byv = per_user.groupBy(F.col(col).alias("val")).agg(
            F.count(F.lit(1)).cast("long").alias("c")
        )
        # r7: doubled midranks via Fenwick prefix sums — no global window
        return midrank2(byv, "val", "c").select("val", "r2")

    rx2 = rank2("x").withColumnRenamed("val", "x").withColumnRenamed("r2", "a")
    ry2 = rank2("y").withColumnRenamed("val", "y").withColumnRenamed("r2", "b")
    ranked = per_user.join(rx2, "x").join(ry2, "y")
    mom = ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("a").cast("long").alias("sa"),
        F.sum("b").cast("long").alias("sb"),
        F.sum(F.col("a") * F.col("a")).cast("long").alias("saa"),
        F.sum(F.col("b") * F.col("b")).cast("long").alias("sbb"),
        F.sum(F.col("a") * F.col("b")).cast("long").alias("sab"),
    )
    n = F.col("n")
    return mom.select(
        "n",
        F.round(
            (n * F.col("sab").cast("double") - F.col("sa").cast("double") * F.col("sb"))
            / F.sqrt(
                (n * F.col("saa").cast("double") - F.col("sa").cast("double") * F.col("sa"))
                * (n * F.col("sbb").cast("double") - F.col("sb").cast("double") * F.col("sb"))
            ),
            6,
        ).alias("rho"),
    )
