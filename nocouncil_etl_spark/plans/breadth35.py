"""Breadth batch 35 (round 6): Friedman test, Hurst exponent, Cohen's d,
dynamic partition overwrite, sign test, Bartlett test.

Six operators (reference scope: repeated-measures comparison of feed
volumes, long-memory detection in fetch-rate series, experiment effect
sizes, lake partition corrections, paired comparisons, and variance
homogeneity with the classic log form):

- ``stat_friedman_blocks``  — Friedman repeated-measures rank test
  (blocks = days, treatments = event types) with exact doubled midranks.
- ``ts_hurst_rs``           — rescaled-range (R/S) Hurst exponent over
  dyadic scales; per-block R/S quantized before cross-block means.
- ``eval_cohens_d``         — standardized effect size between md5 arms
  with the Hedges small-sample correction.
- ``io_dynamic_partition_overwrite`` — the lake correction contract:
  rewrite ONE hive partition in dynamic-overwrite mode, prove the
  others byte-identical.
- ``stat_sign_test``        — paired sign test on common-date daily
  series (click vs purchase).
- ``stat_bartlett_variance`` — Bartlett's homogeneity-of-variance chi
  square (the log-pooled classic), per-group terms quantized to fixed
  point before the cross-group sum.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nocouncil_etl_spark.io import load
from nocouncil_etl_spark.plans.breadth15 import _pt, _pt_sql
from nocouncil_etl_spark.registry import query

# --------------------------------------------------------------------------
# 1. Friedman repeated-measures rank test
# --------------------------------------------------------------------------


@query(
    "stat_friedman_blocks",
    oracle="""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS d,
         CAST(sum(CAST(round(value) AS BIGINT)) AS BIGINT) AS x
  FROM events GROUP BY 1, 2
),
k AS (SELECT CAST(count(DISTINCT event_type) AS BIGINT) AS k FROM daily),
complete AS (
  SELECT d FROM daily GROUP BY d
  HAVING count(*) = (SELECT k FROM k)
),
obs AS (
  SELECT dl.event_type, dl.d, dl.x FROM daily dl JOIN complete c ON dl.d = c.d
),
byv AS (
  SELECT d, x, CAST(count(*) AS BIGINT) AS c FROM obs GROUP BY 1, 2
),
cum AS (
  SELECT d, x, c,
         CAST(coalesce(sum(c) OVER (PARTITION BY d ORDER BY x
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS below
  FROM byv
),
r2 AS (
  SELECT o.event_type,
         CAST(sum(2 * u.below + u.c + 1) AS BIGINT) AS r2_j
  FROM obs o JOIN cum u ON o.d = u.d AND o.x = u.x
  GROUP BY 1
),
acc AS (
  SELECT CAST(count(*) AS BIGINT) AS k,
         CAST(sum(r2_j * r2_j) AS BIGINT) AS sr22,
         (SELECT CAST(count(*) AS BIGINT) FROM complete) AS n
  FROM r2
)
SELECT n, k,
       round(12.0 / (n * k * (k + 1.0)) * (CAST(sr22 AS DOUBLE) / 4)
             - 3.0 * n * (k + 1), 6) AS friedman_chi2
FROM acc
""",
)
def stat_friedman_blocks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Friedman repeated-measures rank test: within every COMPLETE day
    (all k event types present), the types are midranked by their daily
    totals; chi2_F = 12/(nk(k+1))·Sigma R_j² − 3n(k+1) detects whether
    some feed systematically outranks the others across days — the
    nonparametric two-way sibling of stat_kruskal_wallis (and its exact
    doubled-midrank identity, applied per block). Rank sums are exact
    BIGINTs; only the final chi2 is floating.

    Scale shape: per-block ranking runs on k rows per day (bounded);
    everything else is hash-aggs on the date-bounded daily table."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy("event_type", F.to_date("ts").alias("d")).agg(
        F.sum(F.round("value").cast("long")).cast("long").alias("x")
    )
    kf = daily.agg(
        F.countDistinct("event_type").cast("long").alias("k")
    )
    complete = (
        daily.groupBy("d")
        .agg(F.count("*").alias("c"))
        .crossJoin(F.broadcast(kf))
        .filter(F.col("c") == F.col("k"))
        .select("d")
    )
    obs = daily.join(complete, "d")
    byv = obs.groupBy("d", "x").agg(F.count("*").cast("long").alias("c"))
    wd = Window.partitionBy("d").orderBy("x").rowsBetween(
        Window.unboundedPreceding, -1
    )
    cum = byv.select(
        "d",
        "x",
        "c",
        F.coalesce(F.sum("c").over(wd), F.lit(0)).cast("long").alias("below"),
    )
    r2 = (
        obs.join(cum, ["d", "x"])
        .groupBy("event_type")
        .agg(
            F.sum(2 * F.col("below") + F.col("c") + 1)
            .cast("long")
            .alias("r2_j")
        )
    )
    n_blocks = complete.count()
    acc = r2.agg(
        F.count("*").cast("long").alias("k"),
        F.sum(F.col("r2_j") * F.col("r2_j")).cast("long").alias("sr22"),
    ).withColumn("n", F.lit(n_blocks).cast("long"))
    return acc.select(
        "n",
        "k",
        F.round(
            12.0
            / (F.col("n") * F.col("k") * (F.col("k") + F.lit(1.0)))
            * (F.col("sr22").cast("double") / 4)
            - 3.0 * F.col("n") * (F.col("k") + 1),
            6,
        ).alias("friedman_chi2"),
    )


# --------------------------------------------------------------------------
# 2. Hurst exponent via rescaled range
# --------------------------------------------------------------------------

HURST_SCALES = (4, 8, 16)


@query(
    "ts_hurst_rs",
    oracle=f"""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS d,
         CAST(sum(CAST(round(value) AS BIGINT)) AS BIGINT) AS x
  FROM events GROUP BY 1, 2
),
idx AS (
  SELECT event_type,
         CAST(row_number() OVER (PARTITION BY event_type ORDER BY d)
              AS BIGINT) - 1 AS j,
         x
  FROM daily
),
sc AS (SELECT unnest([{', '.join(str(s) for s in HURST_SCALES)}]) AS s),
blk AS (
  SELECT i.event_type, sc.s, i.j // sc.s AS b, i.j % sc.s AS o, i.x
  FROM idx i JOIN sc ON true
),
bsum AS (
  SELECT event_type, s, b, CAST(sum(x) AS BIGINT) AS sx,
         CAST(count(*) AS BIGINT) AS cnt
  FROM blk GROUP BY 1, 2, 3
),
devs AS (
  SELECT k.event_type, k.s, k.b, k.o,
         CAST(k.s * k.x - m.sx AS BIGINT) AS dev
  FROM blk k JOIN bsum m
    ON k.event_type = m.event_type AND k.s = m.s AND k.b = m.b
  WHERE m.cnt = k.s
),
cumdev AS (
  SELECT event_type, s, b, o, dev,
         CAST(sum(dev) OVER (PARTITION BY event_type, s, b ORDER BY o)
              AS BIGINT) AS cd
  FROM devs
),
per_block AS (
  SELECT event_type, s, b,
         CAST(round(1000000.0 * (max(cd) - min(cd))
               / sqrt(CAST(sum(dev * dev) AS DOUBLE) / s)) AS BIGINT)
           AS rs_1e6
  FROM cumdev GROUP BY 1, 2, 3
  HAVING sum(dev * dev) > 0
),
per_scale AS (
  SELECT event_type, s,
         CAST(sum(rs_1e6) AS BIGINT) // count(*) AS mean_rs_1e6,
         CAST(count(*) AS BIGINT) AS n_blocks
  FROM per_block GROUP BY 1, 2
),
fitm AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS np,
         sum(ln(CAST(s AS DOUBLE))) AS slx,
         sum(ln(CAST(mean_rs_1e6 AS DOUBLE) / 1000000)) AS sly,
         sum(ln(CAST(s AS DOUBLE)) * ln(CAST(s AS DOUBLE))) AS slxx,
         sum(ln(CAST(s AS DOUBLE))
             * ln(CAST(mean_rs_1e6 AS DOUBLE) / 1000000)) AS slxy
  FROM per_scale GROUP BY 1
)
SELECT f.event_type,
       p4.mean_rs_1e6 AS rs4_1e6, p8.mean_rs_1e6 AS rs8_1e6,
       p16.mean_rs_1e6 AS rs16_1e6,
       round((f.np * f.slxy - f.slx * f.sly)
             / (f.np * f.slxx - f.slx * f.slx), 6) AS hurst
FROM fitm f
JOIN per_scale p4 ON f.event_type = p4.event_type AND p4.s = 4
JOIN per_scale p8 ON f.event_type = p8.event_type AND p8.s = 8
JOIN per_scale p16 ON f.event_type = p16.event_type AND p16.s = 16
""",
)
def ts_hurst_rs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hurst exponent by classical rescaled-range analysis: each series
    splits into complete blocks at scales {HURST_SCALES}; per block the
    range of cumulative mean-deviations over the in-block std is the R/S
    statistic (computed on s-SCALED integers — dev = s·x − Sigma x — so
    range and variance stay exact BIGINTs until one final division),
    quantized to ppm BEFORE cross-block averaging (order-free sums), and
    H is the log-log OLS slope of mean R/S vs scale. H ≈ 0.5 = memoryless
    walk, H > 0.5 = persistent/trending feed, H < 0.5 = mean-reverting.
    The 3-point ln fit sums over 3 rows — grouped floats, but over a
    3-row frame whose values are identical doubles in both engines.

    Scale shape: the scale fan-out is ×{len(HURST_SCALES)} on the
    date-bounded daily table; per-block windows are ≤ 16 rows each."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy("event_type", F.to_date("ts").alias("d")).agg(
        F.sum(F.round("value").cast("long")).cast("long").alias("x")
    )
    idx = daily.select(
        "event_type",
        (
            F.row_number().over(
                Window.partitionBy("event_type").orderBy("d")
            ).cast("long")
            - 1
        ).alias("j"),
        "x",
    )
    sc = spark.createDataFrame([(s,) for s in HURST_SCALES], "s BIGINT")
    blk = idx.crossJoin(F.broadcast(sc)).select(
        "event_type",
        "s",
        F.expr("j div s").alias("b"),
        (F.col("j") % F.col("s")).alias("o"),
        "x",
    )
    bsum = blk.groupBy("event_type", "s", "b").agg(
        F.sum("x").cast("long").alias("sx"),
        F.count("*").cast("long").alias("cnt"),
    )
    devs = (
        blk.join(bsum, ["event_type", "s", "b"])
        .filter(F.col("cnt") == F.col("s"))
        .select(
            "event_type",
            "s",
            "b",
            "o",
            (F.col("s") * F.col("x") - F.col("sx")).cast("long").alias("dev"),
        )
    )
    wb = Window.partitionBy("event_type", "s", "b").orderBy("o").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cumdev = devs.select(
        "event_type", "s", "b", "dev", F.sum("dev").over(wb).cast("long").alias("cd")
    )
    per_block = (
        cumdev.groupBy("event_type", "s", "b")
        .agg(
            F.max("cd").alias("mx"),
            F.min("cd").alias("mn"),
            F.sum(F.col("dev") * F.col("dev")).cast("long").alias("sdd"),
        )
        .filter(F.col("sdd") > 0)
        .select(
            "event_type",
            "s",
            F.round(
                1000000.0
                * (F.col("mx") - F.col("mn"))
                / F.sqrt(F.col("sdd").cast("double") / F.col("s"))
            )
            .cast("long")
            .alias("rs_1e6"),
        )
    )
    per_scale = per_block.groupBy("event_type", "s").agg(
        F.expr("CAST(sum(rs_1e6) AS BIGINT) div count(*)").alias("mean_rs_1e6"),
        F.count("*").cast("long").alias("n_blocks"),
    )
    lx = F.log(F.col("s").cast("double"))
    ly = F.log(F.col("mean_rs_1e6").cast("double") / 1000000)
    fitm = per_scale.groupBy("event_type").agg(
        F.count("*").cast("long").alias("np"),
        F.sum(lx).alias("slx"),
        F.sum(ly).alias("sly"),
        F.sum(lx * lx).alias("slxx"),
        F.sum(lx * ly).alias("slxy"),
    )
    wide = (
        per_scale.groupBy("event_type")
        .pivot("s", [4, 8, 16])
        .agg(F.first("mean_rs_1e6"))
        .withColumnRenamed("4", "rs4_1e6")
        .withColumnRenamed("8", "rs8_1e6")
        .withColumnRenamed("16", "rs16_1e6")
    )
    return fitm.join(wide, "event_type").select(
        "event_type",
        "rs4_1e6",
        "rs8_1e6",
        "rs16_1e6",
        F.round(
            (F.col("np") * F.col("slxy") - F.col("slx") * F.col("sly"))
            / (F.col("np") * F.col("slxx") - F.col("slx") * F.col("slx")),
            6,
        ).alias("hurst"),
    )


# --------------------------------------------------------------------------
# 3. Cohen's d / Hedges g effect size
# --------------------------------------------------------------------------


@query(
    "eval_cohens_d",
    oracle=f"""
WITH per_user AS (
  SELECT user_id, CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
           AS x
  FROM events GROUP BY user_id
),
armed AS (
  SELECT CASE WHEN {_pt_sql('srm#', 'user_id', 1000)} % 2 = 0
              THEN 0 ELSE 1 END AS arm, x
  FROM per_user
),
mom AS (
  SELECT arm, CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS sx,
         CAST(sum(x * x) AS BIGINT) AS sxx
  FROM armed GROUP BY arm
),
wide AS (
  SELECT max(CASE WHEN arm = 0 THEN n END) AS n0,
         max(CASE WHEN arm = 0 THEN sx END) AS sx0,
         max(CASE WHEN arm = 0 THEN sxx END) AS sxx0,
         max(CASE WHEN arm = 1 THEN n END) AS n1,
         max(CASE WHEN arm = 1 THEN sx END) AS sx1,
         max(CASE WHEN arm = 1 THEN sxx END) AS sxx1
  FROM mom
)
SELECT n0, n1,
       round((CAST(sx1 AS DOUBLE) / n1 - CAST(sx0 AS DOUBLE) / n0)
             / sqrt(((CAST(sxx0 AS DOUBLE) - CAST(sx0 AS DOUBLE) * sx0 / n0)
                     + (CAST(sxx1 AS DOUBLE) - CAST(sx1 AS DOUBLE) * sx1 / n1))
                    / (n0 + n1 - 2)), 6) AS cohens_d,
       round(((CAST(sx1 AS DOUBLE) / n1 - CAST(sx0 AS DOUBLE) / n0)
              / sqrt(((CAST(sxx0 AS DOUBLE) - CAST(sx0 AS DOUBLE) * sx0 / n0)
                      + (CAST(sxx1 AS DOUBLE)
                         - CAST(sx1 AS DOUBLE) * sx1 / n1))
                     / (n0 + n1 - 2)))
             * (1.0 - 3.0 / (4.0 * (n0 + n1) - 9.0)), 6) AS hedges_g
FROM wide
""",
)
def eval_cohens_d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Standardized effect size between the two md5 experiment arms on
    per-user total spend: Cohen's d = (x̄1 − x̄0)/s_pooled with the exact
    pooled-variance moments, plus the Hedges g small-sample correction
    (1 − 3/(4N−9)) — the number a meta-analysis actually wants next to
    every p-value the stat_* family produces. Moments exact; one fixed
    IEEE expression each.

    Scale shape: per-user collapse map-side, 2-row moment table."""
    ev = load(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.sum(F.round(F.col("value") * 100).cast("long")).cast("long").alias("x")
    )
    armed = per_user.select(
        F.when((_pt("srm#", F.col("user_id")) % 1000) % 2 == 0, 0)
        .otherwise(1)
        .alias("arm"),
        "x",
    )
    mom = armed.groupBy("arm").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
    )
    wide = mom.agg(
        *[
            F.max(F.when(F.col("arm") == a, F.col(c))).alias(f"{c}{a}")
            for a in (0, 1)
            for c in ("n", "sx", "sxx")
        ]
    )
    diff = F.col("sx1").cast("double") / F.col("n1") - F.col("sx0").cast(
        "double"
    ) / F.col("n0")
    ss0 = F.col("sxx0").cast("double") - F.col("sx0").cast("double") * F.col(
        "sx0"
    ) / F.col("n0")
    ss1 = F.col("sxx1").cast("double") - F.col("sx1").cast("double") * F.col(
        "sx1"
    ) / F.col("n1")
    d = diff / F.sqrt((ss0 + ss1) / (F.col("n0") + F.col("n1") - 2))
    return wide.select(
        "n0",
        "n1",
        F.round(d, 6).alias("cohens_d"),
        F.round(
            d * (1.0 - 3.0 / (4.0 * (F.col("n0") + F.col("n1")) - 9.0)), 6
        ).alias("hedges_g"),
    )


# --------------------------------------------------------------------------
# 4. Dynamic partition overwrite
# --------------------------------------------------------------------------


@query(
    "io_dynamic_partition_overwrite",
    oracle="""
SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CASE WHEN event_type = 'error'
                     THEN 2 * CAST(round(value * 100) AS BIGINT)
                     ELSE CAST(round(value * 100) AS BIGINT) END)
            AS BIGINT) AS cents
FROM events GROUP BY event_type
""",
)
def io_dynamic_partition_overwrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The lake correction contract: publish the feed hive-partitioned by
    event_type, then land a day-2 correction that rewrites ONLY the
    'error' partition (cents doubled) using dynamic partition overwrite —
    mode('overwrite') with partitionOverwriteMode=dynamic replaces
    exactly the partitions present in the incoming frame and leaves the
    other four untouched (static mode would wipe them; the test asserts
    the untouched partitions still hash to their original content). The
    readback aggregate must equal source-with-doubled-errors.

    Scale shape: the correction writes |changed partition| bytes, not
    |table| — THE pattern for backfills at 100 TB. The overwritten
    partition shuffles once on the partition key."""
    ev = load(spark, sf_dir, "events")
    out = os.path.join(
        tempfile.gettempdir(),
        "nocouncil_etl_spark_scratch",
        f"dyn_overwrite_{os.path.basename(sf_dir.rstrip('/'))}",
    )
    sel = ev.select(
        "event_id",
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    sel.repartition("event_type").write.mode("overwrite").partitionBy(
        "event_type"
    ).parquet(out)
    fix = sel.filter(F.col("event_type") == "error").withColumn(
        "cents", 2 * F.col("cents")
    )
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        fix.repartition("event_type").write.mode("overwrite").partitionBy(
            "event_type"
        ).parquet(out)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    return (
        spark.read.parquet(out)
        .groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("cents").cast("long").alias("cents"),
        )
    )


# --------------------------------------------------------------------------
# 5. Paired sign test
# --------------------------------------------------------------------------


@query(
    "stat_sign_test",
    oracle="""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS d,
         CAST(sum(CAST(round(value) AS BIGINT)) AS BIGINT) AS x
  FROM events WHERE event_type IN ('click', 'purchase')
  GROUP BY 1, 2
),
paired AS (
  SELECT a.d, a.x AS xa, b.x AS xb
  FROM (SELECT d, x FROM daily WHERE event_type = 'click') a
  JOIN (SELECT d, x FROM daily WHERE event_type = 'purchase') b
    ON a.d = b.d
)
SELECT CAST(count(*) AS BIGINT) AS n_days,
       CAST(sum(CASE WHEN xa > xb THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
       CAST(sum(CASE WHEN xa < xb THEN 1 ELSE 0 END) AS BIGINT) AS n_neg,
       CAST(sum(CASE WHEN xa = xb THEN 1 ELSE 0 END) AS BIGINT) AS n_tie,
       round((CAST(sum(CASE WHEN xa > xb THEN 1 ELSE 0 END) AS DOUBLE)
              - sum(CASE WHEN xa < xb THEN 1 ELSE 0 END))
             / sqrt(CAST(sum(CASE WHEN xa <> xb THEN 1 ELSE 0 END)
                         AS DOUBLE)), 6) AS z_sign
FROM paired
""",
)
def stat_sign_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paired sign test on common days: does click volume exceed purchase
    volume more often than chance? Counts days with positive/negative/
    tied differences (exact), ties dropped from the denominator, normal
    approximation z = (n+ − n−)/sqrt(n+ + n−) (no continuity correction,
    documented). The assumption-free sibling of the paired t-test —
    only the SIGN of each day's difference matters.

    Scale shape: daily collapse map-side, one equi-join on the date,
    scalar reduce."""
    ev = load(spark, sf_dir, "events")
    daily = (
        ev.filter(F.col("event_type").isin("click", "purchase"))
        .groupBy("event_type", F.to_date("ts").alias("d"))
        .agg(F.sum(F.round("value").cast("long")).cast("long").alias("x"))
    )
    a = daily.filter(F.col("event_type") == "click").select("d", F.col("x").alias("xa"))
    b = daily.filter(F.col("event_type") == "purchase").select(
        "d", F.col("x").alias("xb")
    )
    paired = a.join(b, "d")
    npos = F.sum(F.when(F.col("xa") > F.col("xb"), 1).otherwise(0)).cast("long")
    nneg = F.sum(F.when(F.col("xa") < F.col("xb"), 1).otherwise(0)).cast("long")
    return paired.agg(
        F.count("*").cast("long").alias("n_days"),
        npos.alias("n_pos"),
        nneg.alias("n_neg"),
        F.sum(F.when(F.col("xa") == F.col("xb"), 1).otherwise(0))
        .cast("long")
        .alias("n_tie"),
        F.round(
            (npos.cast("double") - nneg)
            / F.sqrt(
                F.sum(F.when(F.col("xa") != F.col("xb"), 1).otherwise(0)).cast(
                    "double"
                )
            ),
            6,
        ).alias("z_sign"),
    )


# --------------------------------------------------------------------------
# 6. Bartlett's test
# --------------------------------------------------------------------------


@query(
    "stat_bartlett_variance",
    oracle="""
WITH cents AS (
  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS v FROM events
),
mom AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(v) AS BIGINT) AS sv, CAST(sum(v * v) AS BIGINT) AS svv
  FROM cents GROUP BY 1
),
terms AS (
  SELECT event_type, n,
         (CAST(svv AS DOUBLE) - CAST(sv AS DOUBLE) * sv / n) / (n - 1) AS s2,
         CAST(round(1000000000.0 * (n - 1)
               * ln((CAST(svv AS DOUBLE) - CAST(sv AS DOUBLE) * sv / n)
                    / (n - 1))) AS BIGINT) AS lnterm_1e9,
         CAST(round(1000000000000.0 / (n - 1)) AS BIGINT) AS inv_1e12,
         CAST(round(CAST(svv AS DOUBLE) - CAST(sv AS DOUBLE) * sv / n)
              AS BIGINT) AS ss_int
  FROM mom
),
acc AS (
  SELECT CAST(count(*) AS BIGINT) AS k, CAST(sum(n) AS BIGINT) AS nn,
         CAST(sum(lnterm_1e9) AS BIGINT) AS sum_ln_1e9,
         CAST(sum(inv_1e12) AS BIGINT) AS sum_inv_1e12,
         CAST(sum(ss_int) AS BIGINT) AS sum_ss
  FROM terms
)
SELECT nn AS n, k,
       round(((nn - k) * ln(CAST(sum_ss AS DOUBLE) / (nn - k))
              - CAST(sum_ln_1e9 AS DOUBLE) / 1e9)
             / (1.0 + (CAST(sum_inv_1e12 AS DOUBLE) / 1e12
                       - 1.0 / (nn - k)) / (3.0 * (k - 1))), 6)
         AS bartlett_chi2
FROM acc
""",
)
def stat_bartlett_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bartlett's homogeneity-of-variance test (the log-pooled classic,
    more powerful than stat_levene_mean under normality): chi2 =
    [(N−k)·ln(s_p²) − Sigma (n_i−1)·ln(s_i²)] / C with the standard
    correction C. Per-group ln terms, 1/(n_i−1) terms and sums of
    squares are quantized to fixed-point BIGINTs BEFORE the cross-group
    sums (order-free; ln itself follows the eval_ndcg_at_k precedent —
    IEEE libm agreement at the rounded precision). Group moments exact.

    Scale shape: one hash-agg to k group moments, a k-row reduce."""
    ev = load(spark, sf_dir, "events")
    cents = ev.select(
        "event_type", F.round(F.col("value") * 100).cast("long").alias("v")
    )
    mom = cents.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("v").cast("long").alias("sv"),
        F.sum(F.col("v") * F.col("v")).cast("long").alias("svv"),
    )
    ss = F.col("svv").cast("double") - F.col("sv").cast("double") * F.col(
        "sv"
    ) / F.col("n")
    terms = mom.select(
        "n",
        F.round(1000000000.0 * (F.col("n") - 1) * F.log(ss / (F.col("n") - 1)))
        .cast("long")
        .alias("lnterm_1e9"),
        F.round(1000000000000.0 / (F.col("n") - 1)).cast("long").alias(
            "inv_1e12"
        ),
        F.round(ss).cast("long").alias("ss_int"),
    )
    acc = terms.agg(
        F.count("*").cast("long").alias("k"),
        F.sum("n").cast("long").alias("nn"),
        F.sum("lnterm_1e9").cast("long").alias("sum_ln_1e9"),
        F.sum("inv_1e12").cast("long").alias("sum_inv_1e12"),
        F.sum("ss_int").cast("long").alias("sum_ss"),
    )
    num = (F.col("nn") - F.col("k")) * F.log(
        F.col("sum_ss").cast("double") / (F.col("nn") - F.col("k"))
    ) - F.col("sum_ln_1e9").cast("double") / 1e9
    c = 1.0 + (
        F.col("sum_inv_1e12").cast("double") / 1e12
        - 1.0 / (F.col("nn") - F.col("k"))
    ) / (3.0 * (F.col("k") - 1))
    return acc.select(
        F.col("nn").alias("n"),
        "k",
        F.round(num / c, 6).alias("bartlett_chi2"),
    )
