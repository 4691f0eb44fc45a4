"""Breadth batch 45 (round 6): bitemporal as-of, quantile-regression GD,
merge-on-read deletes, Anderson-Darling, block bootstrap, column masking.

Six operators (reference scope: "what did we believe on date T about
date V" over late-arriving corrections, robust median trend fits, the
lake delete-vector read path, a better-powered two-sample EDF test,
autocorrelation-honest uncertainty for series means, and stable PII
surrogates that keep joins working):

- ``join_bitemporal_asof``   — two-axis (valid-time × transaction-time)
  point-in-time lookup over versioned records.
- ``ml_quantile_regression_gd`` — median (pinball-loss) regression by
  3 rounds of exact fixed-point subgradient descent.
- ``io_merge_on_read_deletes`` — Iceberg/Delta-style equality-delete
  vectors applied at read time via an anti-join.
- ``stat_anderson_darling``  — two-sample A² over pooled order
  statistics of two daily series.
- ``ts_block_bootstrap``     — deterministic moving-block bootstrap CI
  for the mean of an autocorrelated daily series.
- ``privacy_column_masking`` — deterministic masking surrogates with a
  referential-consistency audit.
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
# 1. Bitemporal as-of lookup
# --------------------------------------------------------------------------


@query(
    "join_bitemporal_asof",
    oracle="""
WITH vers AS (
  SELECT o_custkey, o_orderkey,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
         CAST(o_orderdate AS DATE) AS vf,
         CAST(o_orderdate AS DATE) + CAST(o_orderkey % 5 AS INTEGER) AS tf
  FROM orders
),
tpick AS (
  SELECT max(CAST(o_orderdate AS DATE)) - 30 AS tx,
         max(CAST(o_orderdate AS DATE)) - 45 AS vt
  FROM orders
),
vis AS (
  SELECT v.*, row_number() OVER (PARTITION BY v.o_custkey
           ORDER BY v.vf DESC, v.tf DESC, v.o_orderkey DESC) AS rk
  FROM vers v, tpick a
  WHERE v.tf <= a.tx AND v.vf <= a.vt
)
SELECT o_custkey, o_orderkey, cents,
       CAST(vf - DATE '1970-01-01' AS BIGINT) AS vf_day,
       CAST(tf - DATE '1970-01-01' AS BIGINT) AS tf_day
FROM vis WHERE rk = 1
""",
)
def join_bitemporal_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitemporal as-of lookup: each order is a record VERSION with a
    valid-from date (the business fact's effective date) and a
    transaction-from date (when the record became visible — here the
    order date plus a deterministic 0-4 day ingestion lag, modeling
    late-arriving corrections). The query answers "as of transaction
    time TX, what did we believe was true at valid time VT" — the
    regulatory-replay primitive that plain SCD2
    (``join_scd2_point_in_time``) cannot answer, because SCD2 tracks
    only ONE time axis and silently rewrites history when corrections
    land. Selection = filter both axes, then one per-key window argmax
    (valid_from desc, then tx desc as the newer-knowledge tie-break).

    Scale shape: one partition-pruned scan (at 100 TB the version table
    partitions by tx date, so the tf ≤ TX filter prunes partitions),
    one per-key bounded window — no self-join, no inequality join."""
    o = load(spark, sf_dir, "orders")
    vers = o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        F.to_date("o_orderdate").alias("vf"),
        F.date_add(
            F.to_date("o_orderdate"), (F.col("o_orderkey") % 5).cast("int")
        ).alias("tf"),
    )
    asof = o.agg(
        F.date_sub(F.max(F.to_date("o_orderdate")), 30).alias("tx"),
        F.date_sub(F.max(F.to_date("o_orderdate")), 45).alias("vt"),
    )
    vis = (
        vers.crossJoin(F.broadcast(asof))
        .filter((F.col("tf") <= F.col("tx")) & (F.col("vf") <= F.col("vt")))
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("o_custkey").orderBy(
                    F.desc("vf"), F.desc("tf"), F.desc("o_orderkey")
                )
            ),
        )
        .filter(F.col("rk") == 1)
    )
    epoch = F.lit("1970-01-01").cast("date")
    return vis.select(
        "o_custkey",
        "o_orderkey",
        "cents",
        F.datediff("vf", epoch).cast("long").alias("vf_day"),
        F.datediff("tf", epoch).cast("long").alias("tf_day"),
    )


# --------------------------------------------------------------------------
# 2. Quantile (median) regression by subgradient descent
# --------------------------------------------------------------------------

QR_LR_A = 2000  # intercept step scale (micro-cents per unit subgradient)
QR_LR_B = 20  # slope step scale
QR_ROUNDS = 3


def _qr_oracle() -> str:
    parts = [
        """WITH data AS MATERIALIZED (
  SELECT CAST(round(value * 100) AS BIGINT) * 1000000 AS ym,
         CAST(hour(ts) AS BIGINT) AS x
  FROM events
),
meta AS (SELECT CAST(count(*) AS BIGINT) AS n FROM data),
p0 AS (SELECT CAST(0 AS BIGINT) AS a, CAST(0 AS BIGINT) AS b)"""
    ]
    for r in range(1, QR_ROUNDS + 1):
        parts.append(
            f"""g{r} AS (
  SELECT CAST(sum(CASE WHEN d.ym < p.a + p.b * d.x
                       THEN 500000 ELSE -500000 END) AS BIGINT) AS ga,
         CAST(sum(CASE WHEN d.ym < p.a + p.b * d.x
                       THEN 500000 * d.x ELSE -500000 * d.x END) AS BIGINT)
           AS gb
  FROM data d, p{r - 1} p
)"""
        )
        parts.append(
            f"""p{r} AS (
  SELECT p.a - ({QR_LR_A} * g.ga) // m.n AS a,
         p.b - ({QR_LR_B} * g.gb) // (m.n * 100) AS b
  FROM p{r - 1} p, g{r} g, meta m
)"""
        )
    parts.append(
        f"""l0 AS (SELECT CAST(sum(abs(ym)) AS BIGINT) AS loss FROM data),
l{QR_ROUNDS} AS (
  SELECT CAST(sum(abs(d.ym - (p.a + p.b * d.x))) AS BIGINT) AS loss
  FROM data d, p{QR_ROUNDS} p
)"""
    )
    return (
        ",\n".join(parts)
        + f"""
SELECT m.n, p.a AS a_micro, p.b AS b_micro,
       z.loss AS loss0_sum, f.loss AS loss{QR_ROUNDS}_sum,
       CAST(CASE WHEN f.loss < z.loss THEN 1 ELSE 0 END AS BIGINT)
         AS improved
FROM meta m, p{QR_ROUNDS} p, l0 z, l{QR_ROUNDS} f
"""
    )


@query("ml_quantile_regression_gd", oracle=_qr_oracle())
def ml_quantile_regression_gd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median (τ=0.5 quantile) regression of event cents on hour-of-day
    by {QR_ROUNDS} rounds of exact fixed-point SUBGRADIENT descent on
    the pinball loss — the robust-trend member of the GD family
    (ml_logistic_gd minimizes log loss, ml_svm_hinge_gd hinge; this one
    the check loss whose minimizer is the conditional median, immune to
    the value column's heavy tail where OLS is not). The subgradient of
    the pinball loss w.r.t. the prediction is −τ above / (1−τ) below —
    ±500000 ppm exactly — so every gradient sum is an exact BIGINT and
    both parameter trajectories match the unrolled oracle bit-for-bit.
    Emits the fitted intercept/slope and Σ|residual| before vs after
    (for τ=0.5 the pinball loss is |err|/2).

    Scale shape: each round is ONE map-side-combined agg over the scan
    (two conditional sums) plus scalar parameter math — the same
    full-batch-GD shape as the logistic/SVM twins."""
    ev = load(spark, sf_dir, "events")
    data = ev.select(
        (F.round(F.col("value") * 100).cast("long") * 1000000).alias("ym"),
        F.hour("ts").cast("long").alias("x"),
    )
    meta = data.agg(F.count("*").cast("long").alias("n"))
    params = spark.createDataFrame([(0, 0)], "a LONG, b LONG")
    for _ in range(QR_ROUNDS):
        g = (
            data.crossJoin(F.broadcast(params))
            .agg(
                F.sum(
                    F.when(F.col("ym") < F.col("a") + F.col("b") * F.col("x"), 500000)
                    .otherwise(-500000)
                )
                .cast("long")
                .alias("ga"),
                F.sum(
                    F.when(
                        F.col("ym") < F.col("a") + F.col("b") * F.col("x"),
                        500000 * F.col("x"),
                    ).otherwise(-500000 * F.col("x"))
                )
                .cast("long")
                .alias("gb"),
            )
        )
        params = (
            params.crossJoin(F.broadcast(g))
            .crossJoin(F.broadcast(meta))
            .select(
                F.expr(f"a - ({QR_LR_A} * ga) div n").alias("a"),
                F.expr(f"b - ({QR_LR_B} * gb) div (n * 100)").alias("b"),
            )
        )
    l0 = data.agg(F.sum(F.abs("ym")).cast("long").alias("loss0_sum"))
    lf = (
        data.crossJoin(F.broadcast(params))
        .agg(
            F.sum(F.abs(F.col("ym") - (F.col("a") + F.col("b") * F.col("x"))))
            .cast("long")
            .alias("lossf")
        )
    )
    return (
        meta.crossJoin(F.broadcast(params))
        .crossJoin(F.broadcast(l0))
        .crossJoin(F.broadcast(lf))
        .select(
            "n",
            F.col("a").alias("a_micro"),
            F.col("b").alias("b_micro"),
            "loss0_sum",
            F.col("lossf").alias(f"loss{QR_ROUNDS}_sum"),
            F.when(F.col("lossf") < F.col("loss0_sum"), 1)
            .otherwise(0)
            .cast("long")
            .alias("improved"),
        )
    )


# --------------------------------------------------------------------------
# 3. Merge-on-read equality deletes
# --------------------------------------------------------------------------


@query(
    "io_merge_on_read_deletes",
    oracle="""
WITH live AS (
  SELECT o_orderstatus, CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
  WHERE NOT (o_orderkey % 7 = 0 AND o_orderstatus = 'F')
),
dels AS (
  SELECT CAST(count(*) AS BIGINT) AS n_deletes FROM orders
  WHERE o_orderkey % 7 = 0 AND o_orderstatus = 'F'
)
SELECT l.o_orderstatus, CAST(count(*) AS BIGINT) AS n_live,
       CAST(sum(l.cents) AS BIGINT) AS cents_live,
       (SELECT n_deletes FROM dels) AS n_deletes
FROM live l GROUP BY 1
""",
)
def io_merge_on_read_deletes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge-on-read equality deletes — the Iceberg v2 / Delta deletion-
    vector layout: the base data files are IMMUTABLE; a delete is one
    small file of keys, and every reader applies it as an anti-join at
    scan time. Here the base orders table and a delete file (finished
    orders whose key ≡ 0 mod 7) are physically written to scratch
    parquet, then the read path re-opens both and serves per-status
    live totals. Copy-on-write (``io_dynamic_partition_overwrite``)
    rewrites data to delete; merge-on-read defers that cost to readers
    until the next compaction folds the vectors in — the right trade
    when deletes are frequent and small relative to 100 TB of base.

    Scale shape: the delete side is broadcast-sized by construction
    (it's a correction stream, not a data stream), so the anti-join is
    a broadcast hash anti-join — zero shuffle of the base table."""
    o = load(spark, sf_dir, "orders")
    base = os.path.join(
        tempfile.gettempdir(),
        "nocouncil_etl_spark_scratch",
        f"mor_{os.path.basename(sf_dir.rstrip('/'))}",
    )
    data_dir, del_dir = os.path.join(base, "data"), os.path.join(base, "deletes")
    o.select(
        "o_orderkey",
        "o_orderstatus",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    ).write.mode("overwrite").parquet(data_dir)
    o.filter(
        (F.col("o_orderkey") % 7 == 0) & (F.col("o_orderstatus") == "F")
    ).select("o_orderkey").write.mode("overwrite").parquet(del_dir)
    data = spark.read.parquet(data_dir)
    dels = spark.read.parquet(del_dir)
    n_del = dels.agg(F.count("*").cast("long").alias("n_deletes"))
    return (
        data.join(F.broadcast(dels), "o_orderkey", "left_anti")
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").cast("long").alias("n_live"),
            F.sum("cents").cast("long").alias("cents_live"),
        )
        .crossJoin(F.broadcast(n_del))
    )


# --------------------------------------------------------------------------
# 4. Two-sample Anderson-Darling
# --------------------------------------------------------------------------


@query(
    "stat_anderson_darling",
    oracle="""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS d,
         CAST(sum(CAST(round(value) AS BIGINT)) AS BIGINT) AS y
  FROM events WHERE event_type IN ('click', 'view')
  GROUP BY 1, 2
),
pool AS (
  SELECT y, d, CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS isa
  FROM daily
),
meta AS (
  SELECT CAST(count(*) AS BIGINT) AS nn, CAST(sum(isa) AS BIGINT) AS m
  FROM pool
),
ordered AS (
  SELECT CAST(row_number() OVER (ORDER BY y, isa, d) AS BIGINT) AS i,
         CAST(sum(isa) OVER (ORDER BY y, isa, d
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS mi
  FROM pool
),
terms AS (
  SELECT o.i,
         ((o.mi * e.nn - o.i * e.m) * (o.mi * e.nn - o.i * e.m) * 1000000)
           // (o.i * (e.nn - o.i)) AS t_micro
  FROM ordered o, meta e
  WHERE o.i < e.nn
)
SELECT e.nn AS n_pooled, e.m AS n_a, e.nn - e.m AS n_b,
       CAST(sum(t.t_micro) // (e.m * (e.nn - e.m)) AS BIGINT) AS a2_micro
FROM terms t, meta e
GROUP BY e.nn, e.m
""",
)
def stat_anderson_darling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Anderson-Darling A² (Pettitt 1976) between the click
    and view daily-revenue distributions: A² = 1/(mn) Σ_{i<N}
    (M_i·N − i·m)² / (i(N−i)) over the pooled order statistics, where
    M_i counts sample-A members among the first i. A-D weights the EDF
    discrepancy by the inverse variance of the empirical process, so it
    out-powers KS (``stat_ks_two_sample``) in the TAILS — exactly where
    revenue distributions differ. Ties are broken deterministically by
    (value, sample, date), documented; every term is one exact integer
    micro-quantized division.

    Scale shape: the pooled frame is the BOUNDED daily table (2×days
    rows), so the global order window is over a tiny frame; applying
    the same test to raw values would switch to the count-of-values
    cumulative form like the KS/KW queries."""
    ev = load(spark, sf_dir, "events")
    daily = (
        ev.filter(F.col("event_type").isin("click", "view"))
        .groupBy("event_type", F.to_date("ts").alias("d"))
        .agg(F.sum(F.round("value").cast("long")).cast("long").alias("y"))
    )
    pool = daily.select(
        "y",
        "d",
        F.when(F.col("event_type") == "click", 1).otherwise(0).alias("isa"),
    )
    meta = pool.agg(
        F.count("*").cast("long").alias("nn"), F.sum("isa").cast("long").alias("m")
    )
    wo = Window.orderBy("y", "isa", "d")
    ordered = pool.select(
        F.row_number().over(wo).cast("long").alias("i"),
        F.sum("isa")
        .over(wo.rowsBetween(Window.unboundedPreceding, 0))
        .cast("long")
        .alias("mi"),
    )
    terms = (
        ordered.crossJoin(F.broadcast(meta))
        .filter(F.col("i") < F.col("nn"))
        .select(
            F.expr(
                "((mi * nn - i * m) * (mi * nn - i * m) * 1000000)"
                " div (i * (nn - i))"
            ).alias("t_micro"),
            "nn",
            "m",
        )
    )
    return terms.groupBy("nn", "m").agg(
        F.sum("t_micro").alias("ts_")
    ).select(
        F.col("nn").alias("n_pooled"),
        F.col("m").alias("n_a"),
        (F.col("nn") - F.col("m")).alias("n_b"),
        F.expr("CAST(ts_ div (m * (nn - m)) AS BIGINT)").alias("a2_micro"),
    )


# --------------------------------------------------------------------------
# 5. Moving-block bootstrap
# --------------------------------------------------------------------------

BB_REPS = 32
BB_BLOCKS = 6
BB_LEN = 5


@query(
    "ts_block_bootstrap",
    oracle=f"""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d,
         CAST(sum(CAST(round(value) AS BIGINT)) AS BIGINT) AS y
  FROM events GROUP BY 1
),
idx AS (
  SELECT CAST(row_number() OVER (ORDER BY d) - 1 AS BIGINT) AS r, y
  FROM daily
),
meta AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS sy
         FROM idx),
grid AS (
  SELECT rep.rep, blk.j,
         {_pt_sql('bb#', 'rep.rep * 100 + blk.j', 1_000_000_000)}
           % (SELECT n - {BB_LEN - 1} FROM meta) AS start
  FROM (SELECT unnest(range(1, {BB_REPS + 1})) AS rep) rep,
       (SELECT unnest(range({BB_BLOCKS})) AS j) blk
),
reps AS (
  SELECT g.rep, CAST(sum(i.y) AS BIGINT) AS s
  FROM grid g JOIN idx i ON i.r >= g.start AND i.r < g.start + {BB_LEN}
  GROUP BY g.rep
),
means AS (
  SELECT rep, (1000 * s) // {BB_BLOCKS * BB_LEN} AS m FROM reps
),
mm AS (SELECT CAST(sum(m) AS BIGINT) // {BB_REPS} AS mbar FROM means)
SELECT CAST({BB_REPS} AS BIGINT) AS n_reps,
       (SELECT n FROM meta) AS n_days,
       CAST((1000 * (SELECT sy FROM meta)) // (SELECT n FROM meta) AS BIGINT)
         AS mean_milli,
       (SELECT mbar FROM mm) AS boot_mean_milli,
       CAST(min(m) AS BIGINT) AS lo_milli,
       CAST(max(m) AS BIGINT) AS hi_milli,
       CAST(sum((m - (SELECT mbar FROM mm)) * (m - (SELECT mbar FROM mm)))
            // {BB_REPS - 1} AS BIGINT) AS var_milli2
FROM means
""",
)
def ts_block_bootstrap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moving-block bootstrap (Künsch 1989) for the mean of the daily
    revenue series: {BB_REPS} deterministic replicates, each the sum of
    {BB_BLOCKS} length-{BB_LEN} contiguous blocks whose start offsets
    come from an md5 inversion — blocks preserve the LOCAL
    autocorrelation that an iid bootstrap (``sample_poisson_bootstrap``)
    would destroy, so the CI is honest for dependent data. Replicate
    means are exact milli integers; the spread is reported as min/max
    (the nearest-rank 2.5/97.5 percentiles at B={BB_REPS}) plus the
    deviation-form variance (no Σm² overflow at any revenue scale).

    Scale shape: replicate construction is a range-join of the bounded
    {BB_REPS}×{BB_BLOCKS} grid against the daily index; per-series cost
    is O(B·k·L) rows regardless of raw event volume."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("d")).agg(
        F.sum(F.round("value").cast("long")).cast("long").alias("y")
    )
    idx = daily.select(
        (F.row_number().over(Window.orderBy("d")) - 1).cast("long").alias("r"),
        "y",
    )
    meta = idx.agg(
        F.count("*").cast("long").alias("n"), F.sum("y").cast("long").alias("sy")
    )
    grid = (
        spark.range(1, BB_REPS + 1)
        .select(F.col("id").alias("rep"))
        .crossJoin(spark.range(BB_BLOCKS).select(F.col("id").alias("j")))
        .crossJoin(F.broadcast(meta.select("n")))
        .select(
            "rep",
            "j",
            (
                (_pt("bb#", F.col("rep") * 100 + F.col("j")) % 1_000_000_000)
                % (F.col("n") - (BB_LEN - 1))
            ).alias("start"),
        )
    )
    reps = (
        F.broadcast(grid)
        .join(
            idx,
            (idx.r >= grid.start) & (idx.r < grid.start + BB_LEN),
        )
        .groupBy("rep")
        .agg(F.sum("y").cast("long").alias("s"))
    )
    means = reps.select(
        "rep", F.expr(f"(1000 * s) div {BB_BLOCKS * BB_LEN}").alias("m")
    )
    mm = means.agg(F.expr(f"CAST(sum(m) AS BIGINT) div {BB_REPS}").alias("mbar"))
    return (
        means.crossJoin(F.broadcast(mm))
        .agg(
            F.min("m").cast("long").alias("lo_milli"),
            F.max("m").cast("long").alias("hi_milli"),
            F.expr(
                f"CAST(sum((m - mbar) * (m - mbar)) div {BB_REPS - 1}"
                " AS BIGINT)"
            ).alias("var_milli2"),
            F.max("mbar").cast("long").alias("boot_mean_milli"),
        )
        .crossJoin(F.broadcast(meta))
        .select(
            F.lit(BB_REPS).cast("long").alias("n_reps"),
            F.col("n").alias("n_days"),
            F.expr("CAST((1000 * sy) div n AS BIGINT)").alias("mean_milli"),
            "boot_mean_milli",
            "lo_milli",
            "hi_milli",
            "var_milli2",
        )
    )


# --------------------------------------------------------------------------
# 6. Deterministic column masking with referential audit
# --------------------------------------------------------------------------


@query(
    "privacy_column_masking",
    oracle=f"""
WITH dim AS (
  SELECT c_custkey,
         {_pt_sql('mask#', 'c_custkey', 1_000_000_000_000)} AS mk,
         'cust_' || substring(md5(c_name), 1, 8) AS mname
  FROM customer
),
ka AS (
  SELECT CAST(count(*) AS BIGINT) AS n_customers,
         CAST(count(DISTINCT mk) AS BIGINT) AS n_masked_distinct,
         CAST(count(DISTINCT mname) AS BIGINT) AS n_names_distinct
  FROM dim
),
o AS (
  SELECT o_orderkey, o_custkey,
         {_pt_sql('mask#', 'o_custkey', 1_000_000_000_000)} AS mk
  FROM orders
),
jraw AS (
  SELECT CAST(count(*) AS BIGINT) AS n_join_raw
  FROM orders JOIN customer ON o_custkey = c_custkey
),
jmask AS (
  SELECT CAST(count(*) AS BIGINT) AS n_join_masked
  FROM o JOIN dim ON o.mk = dim.mk
)
SELECT k.n_customers, k.n_masked_distinct, k.n_names_distinct,
       k.n_customers - k.n_masked_distinct AS n_key_collisions,
       (SELECT count(*) FROM orders) AS n_orders,
       r.n_join_raw, m.n_join_masked,
       CAST(CASE WHEN r.n_join_raw = m.n_join_masked THEN 1 ELSE 0 END
            AS BIGINT) AS join_preserved
FROM ka k, jraw r, jmask m
""",
)
def privacy_column_masking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic column masking with a referential-consistency
    audit: customer keys get a keyed-hash surrogate (md5 inversion into
    a 10^12 space) and names a 'cust_'+hash8 pseudonym — the static-
    masking discipline for shipping a dataset to a lower-trust zone
    (``text_redact_pii``'s structured-column sibling). Because the
    surrogate is a deterministic function of the key, the SAME masking
    applied independently to the fact table MUST preserve every join —
    the audit proves it by counting orders⋈customers on raw vs masked
    keys, and counts surrogate collisions (birthday-bounded by the
    10^12 space) since a collision silently merges two identities.

    Scale shape: masking is pure map-side expression work; the audit is
    two broadcast-dim joins and scalar compares."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    dim = c.select(
        "c_custkey",
        (_pt("mask#", F.col("c_custkey")) % 1_000_000_000_000).alias("mk"),
        F.concat(F.lit("cust_"), F.substring(F.md5("c_name"), 1, 8)).alias(
            "mname"
        ),
    )
    ka = dim.agg(
        F.count("*").cast("long").alias("n_customers"),
        F.countDistinct("mk").cast("long").alias("n_masked_distinct"),
        F.countDistinct("mname").cast("long").alias("n_names_distinct"),
    )
    om = o.select(
        "o_orderkey",
        (_pt("mask#", F.col("o_custkey")) % 1_000_000_000_000).alias("mk"),
    )
    jraw = o.join(c, o.o_custkey == c.c_custkey).agg(
        F.count("*").cast("long").alias("n_join_raw")
    )
    jmask = om.join(F.broadcast(dim.select("mk")), "mk").agg(
        F.count("*").cast("long").alias("n_join_masked")
    )
    n_orders = o.agg(F.count("*").cast("long").alias("n_orders"))
    return (
        ka.crossJoin(F.broadcast(n_orders))
        .crossJoin(F.broadcast(jraw))
        .crossJoin(F.broadcast(jmask))
        .select(
            "n_customers",
            "n_masked_distinct",
            "n_names_distinct",
            (F.col("n_customers") - F.col("n_masked_distinct")).alias(
                "n_key_collisions"
            ),
            "n_orders",
            "n_join_raw",
            "n_join_masked",
            F.when(F.col("n_join_raw") == F.col("n_join_masked"), 1)
            .otherwise(0)
            .cast("long")
            .alias("join_preserved"),
        )
    )
