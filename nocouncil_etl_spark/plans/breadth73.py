"""Breadth batch 53 (round 6): survivorship bias, Wasserstein drift,
microaggregation, Breusch-Pagan test, WRAcc rule mining, adaptive file
sizing.

Six operators (reference scope: the backtest bias audit, the continuous
drift distance, the other classical disclosure-control transform,
the regression heteroscedasticity diagnostic, single-rule subgroup
discovery, and file-layout right-sizing):

- ``dq_survivorship_bias``    — growth measured on both-period
  survivors vs the full cohort; the gap is the bias.
- ``dq_drift_wasserstein``    — exact 1-D W1 distance between first-
  and second-half value distributions per event type.
- ``privacy_microaggregation``— k=5 sorted microaggregation of account
  balances with exact information-loss accounting.
- ``stat_breusch_pagan``      — LM heteroscedasticity test on the
  revenue~balance regression's squared residuals.
- ``ml_best_rule_wracc``      — top subgroup rules (value band ×
  weekday) by weighted relative accuracy.
- ``io_adaptive_file_sizing`` — per-partition file-count plan against
  the median partition size, with skew before/after.

Reference parity: north-star extension — no reference analogue
(the reference has no analytics layer); these are the audit layers a lake-scale engine
adds on the same tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nocouncil_etl_spark.io import load
from nocouncil_etl_spark.operators.quantiles import with_global_rank
from nocouncil_etl_spark.registry import query

SB_SPLIT_YEAR = 1998
MA_K = 5
WR_TOP = 3
AF_ROW_BYTES = 128


# --------------------------------------------------------------------------
# 1. Survivorship bias
# --------------------------------------------------------------------------


@query(
    "dq_survivorship_bias",
    oracle=f"""
WITH per AS (
  SELECT o_custkey,
         CAST(sum(CASE WHEN extract(year FROM o_orderdate) < {SB_SPLIT_YEAR}
                  THEN CAST(round(100 * o_totalprice) AS BIGINT) ELSE 0 END)
              AS BIGINT) AS r1,
         CAST(sum(CASE WHEN extract(year FROM o_orderdate) >= {SB_SPLIT_YEAR}
                  THEN CAST(round(100 * o_totalprice) AS BIGINT) ELSE 0 END)
              AS BIGINT) AS r2
  FROM orders GROUP BY o_custkey
),
full_ AS (
  SELECT CAST(sum(r1) AS BIGINT) AS r1, CAST(sum(r2) AS BIGINT) AS r2,
         CAST(count(*) AS BIGINT) AS n
  FROM per
),
surv AS (
  SELECT CAST(sum(r1) AS BIGINT) AS r1, CAST(sum(r2) AS BIGINT) AS r2,
         CAST(count(*) AS BIGINT) AS n
  FROM per WHERE r1 > 0 AND r2 > 0
)
SELECT (SELECT n FROM full_) AS n_customers,
       (SELECT n FROM surv) AS n_survivors,
       CAST(round(1000.0 * (SELECT r2 FROM full_) / (SELECT r1 FROM full_))
            AS BIGINT) AS full_growth_milli,
       CAST(round(1000.0 * (SELECT r2 FROM surv) / (SELECT r1 FROM surv))
            AS BIGINT) AS survivor_growth_milli,
       CAST(round(1000.0 * (SELECT r2 FROM surv) / (SELECT r1 FROM surv))
            - round(1000.0 * (SELECT r2 FROM full_) / (SELECT r1 FROM full_))
            AS BIGINT) AS bias_milli
""",
)
def dq_survivorship_bias(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survivorship bias, quantified: the revenue growth ratio between
    the pre-/post-{SB_SPLIT_YEAR} periods computed on the FULL cohort
    vs only on SURVIVORS (customers transacting in both periods) — the
    restriction every naive backtest silently applies, and the bias is
    exactly the gap (survivors mechanically over-represent winners).
    One integer rollup per customer; both ratios are exact integer
    divisions of the same table.

    Scale shape: one per-customer hash agg, two 1-row conditional
    rollups — the audit costs one scan."""
    per = load(spark, sf_dir, "orders").groupBy("o_custkey").agg(
        F.sum(
            F.when(
                F.year("o_orderdate") < SB_SPLIT_YEAR,
                F.round(100 * F.col("o_totalprice")).cast("long"),
            ).otherwise(0)
        )
        .cast("long")
        .alias("r1"),
        F.sum(
            F.when(
                F.year("o_orderdate") >= SB_SPLIT_YEAR,
                F.round(100 * F.col("o_totalprice")).cast("long"),
            ).otherwise(0)
        )
        .cast("long")
        .alias("r2"),
    )
    per.persist()
    full_ = per.agg(
        F.sum("r1").alias("fr1"),
        F.sum("r2").alias("fr2"),
        F.count(F.lit(1)).cast("long").alias("n_customers"),
    )
    surv = per.filter((F.col("r1") > 0) & (F.col("r2") > 0)).agg(
        F.sum("r1").alias("sr1"),
        F.sum("r2").alias("sr2"),
        F.count(F.lit(1)).cast("long").alias("n_survivors"),
    )
    fg = F.round(1000.0 * F.col("fr2") / F.col("fr1"))
    sg = F.round(1000.0 * F.col("sr2") / F.col("sr1"))
    return full_.crossJoin(F.broadcast(surv)).select(
        "n_customers",
        "n_survivors",
        fg.cast("long").alias("full_growth_milli"),
        sg.cast("long").alias("survivor_growth_milli"),
        (sg - fg).cast("long").alias("bias_milli"),
    )


# --------------------------------------------------------------------------
# 2. Wasserstein drift
# --------------------------------------------------------------------------


@query(
    "dq_drift_wasserstein",
    oracle="""
WITH mid AS (
  SELECT epoch_us(min(ts))
         + (epoch_us(max(ts)) - epoch_us(min(ts))) // 2 AS m
  FROM events
),
s AS (
  SELECT event_type, event_id, CAST(round(100 * value) AS BIGINT) AS x,
         CASE WHEN epoch_us(ts) < (SELECT m FROM mid) THEN 1 ELSE 0 END AS h1
  FROM events WHERE value IS NOT NULL
),
meta AS (
  SELECT event_type, CAST(sum(h1) AS BIGINT) AS n1,
         CAST(sum(1 - h1) AS BIGINT) AS n2
  FROM s GROUP BY event_type
),
o AS (
  SELECT event_type, x, h1,
         sum(h1) OVER w AS c1, sum(1 - h1) OVER w AS c2,
         lead(x) OVER w AS x_next
  FROM s
  WINDOW w AS (PARTITION BY event_type ORDER BY x, event_id)
),
terms AS (
  SELECT o.event_type,
         abs(o.c1 * m.n2 - o.c2 * m.n1) * (o.x_next - o.x) AS t
  FROM o JOIN meta m ON m.event_type = o.event_type
  WHERE o.x_next IS NOT NULL
)
SELECT t.event_type, m.n1, m.n2,
       CAST(round(1000.0 * sum(t.t)
                  / (CAST(m.n1 AS DOUBLE) * m.n2)) AS BIGINT)
         AS w1_cents_milli
FROM terms t JOIN meta m ON m.event_type = t.event_type
GROUP BY t.event_type, m.n1, m.n2
""",
)
def dq_drift_wasserstein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 1-D Wasserstein-1 drift per event type between the first
    and second time halves: W1 = ∫|F₁ − F₂| dx evaluated on the pooled
    sorted values — each inter-point segment contributes
    |c₁·n₂ − c₂·n₁|·Δx (exact BIGINT numerators; ONE division by n₁n₂
    at the end). W1 reads in value units ('the distributions moved by
    this many cents on average') where agg_psi_drift's bins and
    stat_ks_two_sample's supremum don't — the standard trio of drift
    monitors, completed.

    Scale shape: one per-type ordered window over the pooled values
    (type-partitioned sort), one hash agg — exact optimal transport at
    sort cost."""
    ev = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    mid = ev.agg(
        (
            F.unix_micros(F.min("ts"))
            + F.expr(
                "(unix_micros(max(ts)) - unix_micros(min(ts))) div 2"
            )
        ).alias("m")
    )
    s = ev.crossJoin(F.broadcast(mid)).select(
        "event_type",
        "event_id",
        F.round(100 * F.col("value")).cast("long").alias("x"),
        F.when(F.unix_micros("ts") < F.col("m"), 1).otherwise(0).alias("h1"),
    )
    meta = s.groupBy("event_type").agg(
        F.sum("h1").cast("long").alias("n1"),
        F.sum(1 - F.col("h1")).cast("long").alias("n2"),
    )
    w = Window.partitionBy("event_type").orderBy("x", "event_id")
    wcum = w.rowsBetween(Window.unboundedPreceding, 0)
    o = s.select(
        "event_type",
        "x",
        F.sum("h1").over(wcum).alias("c1"),
        F.sum(1 - F.col("h1")).over(wcum).alias("c2"),
        F.lead("x").over(w).alias("x_next"),
    ).filter(F.col("x_next").isNotNull())
    terms = o.join(F.broadcast(meta), "event_type").select(
        "event_type",
        (
            F.abs(F.col("c1") * F.col("n2") - F.col("c2") * F.col("n1"))
            * (F.col("x_next") - F.col("x"))
        ).alias("t"),
    )
    return (
        terms.groupBy("event_type")
        .agg(F.sum("t").alias("st"))
        .join(F.broadcast(meta), "event_type")
        .select(
            "event_type",
            "n1",
            "n2",
            F.round(
                1000.0 * F.col("st") / (F.col("n1").cast("double") * F.col("n2"))
            )
            .cast("long")
            .alias("w1_cents_milli"),
        )
    )


# --------------------------------------------------------------------------
# 3. Microaggregation
# --------------------------------------------------------------------------


@query(
    "privacy_microaggregation",
    oracle=f"""
WITH v AS (
  SELECT c_custkey, CAST(round(100 * c_acctbal) AS BIGINT) AS x FROM customer
),
r AS (
  SELECT x,
         row_number() OVER (ORDER BY x, c_custkey) AS rn,
         count(*) OVER () AS n
  FROM v
),
grouped AS (
  SELECT x,
         least((rn - 1) // {MA_K}, n // {MA_K} - 1) AS gid
  FROM r
),
pergroup AS (
  SELECT gid, CAST(count(*) AS BIGINT) AS gn, CAST(sum(x) AS BIGINT) AS gs,
         CAST(sum(CAST(x AS HUGEINT) * x) AS DOUBLE) AS gss
  FROM grouped GROUP BY gid
)
SELECT CAST(count(*) AS BIGINT) AS n_groups,
       CAST(min(gn) AS BIGINT) AS min_group_size,
       CAST(max(gn) AS BIGINT) AS max_group_size,
       CAST(round(sum(gss - CAST(gs AS DOUBLE) * gs / gn)) AS BIGINT)
         AS info_loss_sse
FROM pergroup
""",
)
def privacy_microaggregation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Univariate microaggregation (the OTHER classical SDC transform,
    Domingo-Ferrer): account balances sort, split into consecutive
    groups of k = {MA_K} (the remainder folds into the last group, so
    every group has ≥ k members — that IS the k-anonymity guarantee for
    the released group means), and the within-group SSE is the exact
    information-loss price. Complements suppression
    (privacy_cell_suppression) and recoding (privacy_generalize_to_k):
    microaggregation keeps numeric utility by replacing, not hiding.

    Scale shape (r7): ranks via Fenwick prefix counts + tie windows
    (no global sort), one
    group hash agg, 1-row rollup."""
    v = load(spark, sf_dir, "customer").select(
        "c_custkey", F.round(100 * F.col("c_acctbal")).cast("long").alias("x")
    )
    # r7: global rank via Fenwick prefix counts + tie-block window; n via
    # a broadcast 1-row aggregate — no global sort
    tot = v.agg(F.count(F.lit(1)).cast("long").alias("n"))
    r = with_global_rank(v, "x", "c_custkey", "rn").crossJoin(
        F.broadcast(tot)
    ).select("x", "rn", "n")
    grouped = r.select(
        "x",
        F.least(
            F.expr(f"(rn - 1) div {MA_K}"),
            F.expr(f"n div {MA_K}") - 1,
        ).alias("gid"),
    )
    pergroup = grouped.groupBy("gid").agg(
        F.count(F.lit(1)).cast("long").alias("gn"),
        F.sum("x").cast("long").alias("gs"),
        F.sum((F.col("x").cast("decimal(38,0)") * F.col("x")))
        .cast("double")
        .alias("gss"),
    )
    return pergroup.agg(
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.min("gn").cast("long").alias("min_group_size"),
        F.max("gn").cast("long").alias("max_group_size"),
        F.round(
            F.sum(
                F.col("gss") - F.col("gs").cast("double") * F.col("gs") / F.col("gn")
            )
        )
        .cast("long")
        .alias("info_loss_sse"),
    )


# --------------------------------------------------------------------------
# 4. Breusch-Pagan
# --------------------------------------------------------------------------


@query(
    "stat_breusch_pagan",
    oracle="""
WITH d AS (
  SELECT CAST(round(100 * c.c_acctbal) AS BIGINT) AS x,
         coalesce(o.rev, 0) AS y
  FROM customer c
  LEFT JOIN (SELECT o_custkey, CAST(sum(CAST(round(100 * o_totalprice)
                    AS BIGINT)) AS BIGINT) AS rev
             FROM orders GROUP BY 1) o ON o.o_custkey = c.c_custkey
),
m AS (
  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS sx,
         CAST(sum(CAST(x AS HUGEINT) * x) AS DOUBLE) AS sxx,
         CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(CAST(x AS HUGEINT) * y) AS DOUBLE) AS sxy
  FROM d
),
fit AS (
  SELECT n, sx, sxx,
         (n * sxy - CAST(sx AS DOUBLE) * sy) / (n * sxx - CAST(sx AS DOUBLE) * sx)
           AS b,
         (CAST(sy AS DOUBLE) - (n * sxy - CAST(sx AS DOUBLE) * sy)
          / (n * sxx - CAST(sx AS DOUBLE) * sx) * sx) / n AS a
  FROM m
),
e AS (
  SELECT d.x,
         CAST(round(d.y - (SELECT a FROM fit) - (SELECT b FROM fit) * d.x)
              AS BIGINT) // 1024 AS eq
  FROM d
),
aux AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx,
         CAST(sum(CAST(x AS HUGEINT) * x) AS DOUBLE) AS sxx,
         CAST(sum(CAST(eq AS HUGEINT) * eq) AS DOUBLE) AS sy,
         CAST(sum(CAST(x AS HUGEINT) * eq * eq) AS DOUBLE) AS sxy,
         CAST(sum(CAST(eq AS HUGEINT) * eq * eq * eq) AS DOUBLE) AS syy
  FROM e
)
SELECT n,
       CAST(round(1000 * n
            * (n * sxy - CAST(sx AS DOUBLE) * sy)
            * (n * sxy - CAST(sx AS DOUBLE) * sy)
            / ((n * sxx - CAST(sx AS DOUBLE) * sx)
               * (n * syy - sy * sy))) AS BIGINT) AS lm_milli,
       CASE WHEN 1000 * n
            * (n * sxy - CAST(sx AS DOUBLE) * sy)
            * (n * sxy - CAST(sx AS DOUBLE) * sy)
            / ((n * sxx - CAST(sx AS DOUBLE) * sx)
               * (n * syy - sy * sy)) > 3841 THEN 1 ELSE 0 END
         AS heteroscedastic
FROM aux
""",
)
def stat_breusch_pagan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Breusch-Pagan heteroscedasticity test on the revenue ~ balance
    regression: the OLS fit comes from exact moments; per-row residuals
    (identical doubles on both engines) quantize to integers and
    rescale by 2^10 truncating division so the QUARTIC auxiliary
    moments stay exact in 128 bits; LM = n·R² of e² on x, flagged
    against the χ²₁ 5% point (3.841). Significant LM means the constant-
    variance assumption behind ml_regression_diagnostics' standard
    errors is false — use robust errors or model the variance
    (ts_arch1_fit's job in time series).

    Scale shape: two moment scans (fit, then auxiliary), both
    map-side-combined; 1-row arithmetic."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    per = orders.groupBy("o_custkey").agg(
        F.sum(F.round(100 * F.col("o_totalprice")).cast("long"))
        .cast("long")
        .alias("rev")
    )
    d = cust.join(per, cust["c_custkey"] == per["o_custkey"], "left").select(
        F.round(100 * F.col("c_acctbal")).cast("long").alias("x"),
        F.coalesce("rev", F.lit(0)).alias("y"),
    )
    d.persist()
    dec = "decimal(38,0)"
    m = d.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum((F.col("x").cast(dec) * F.col("x"))).cast("double").alias("sxx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum((F.col("x").cast(dec) * F.col("y"))).cast("double").alias("sxy"),
    ).first()
    n, sx, sxx, sy, sxy = (
        int(m.n),
        int(m.sx),
        float(m.sxx),
        int(m.sy),
        float(m.sxy),
    )
    b = (n * sxy - float(sx) * sy) / (n * sxx - float(sx) * sx)
    a = (float(sy) - b * sx) / n
    e = d.select(
        "x",
        F.expr(
            f"CAST(round(y - ({a!r}) - ({b!r}) * x) AS BIGINT) div 1024"
        ).alias("eq"),
    )
    aux = e.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum((F.col("x").cast(dec) * F.col("x"))).cast("double").alias("sxx"),
        F.sum((F.col("eq").cast(dec) * F.col("eq"))).cast("double").alias("sy"),
        F.sum((F.col("x").cast(dec) * F.col("eq") * F.col("eq")))
        .cast("double")
        .alias("sxy"),
        F.sum(
            (F.col("eq").cast(dec) * F.col("eq") * F.col("eq") * F.col("eq"))
        )
        .cast("double")
        .alias("syy"),
    )
    nn = F.col("n")
    cov = nn * F.col("sxy") - F.col("sx").cast("double") * F.col("sy")
    lm = (
        1000
        * nn
        * cov
        * cov
        / (
            (nn * F.col("sxx") - F.col("sx").cast("double") * F.col("sx"))
            * (nn * F.col("syy") - F.col("sy") * F.col("sy"))
        )
    )
    return aux.select(
        "n",
        F.round(lm).cast("long").alias("lm_milli"),
        F.when(lm > 3841, 1).otherwise(0).alias("heteroscedastic"),
    )


# --------------------------------------------------------------------------
# 5. Best rule by WRAcc
# --------------------------------------------------------------------------


@query(
    "ml_best_rule_wracc",
    oracle=f"""
WITH d AS (
  SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y,
         CAST(round(100 * value) AS BIGINT) // 1000000 AS band,
         isodow(CAST(ts AS DATE)) AS dow
  FROM events WHERE value IS NOT NULL
),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS pos
        FROM d),
cells AS (
  SELECT band, dow, CAST(count(*) AS BIGINT) AS nc, CAST(sum(y) AS BIGINT)
           AS posc
  FROM d GROUP BY 1, 2
),
scored AS (
  SELECT band, dow, nc, posc,
         CAST(round(1000000.0 * nc / (SELECT n FROM tot)
              * (CAST(posc AS DOUBLE) / nc
                 - CAST((SELECT pos FROM tot) AS DOUBLE) / (SELECT n FROM tot)))
              AS BIGINT) AS wracc_micro
  FROM cells
)
SELECT band, dow, nc AS n_covered, posc AS n_pos, wracc_micro,
       CAST(rk AS BIGINT) AS rank
FROM (SELECT *, row_number() OVER (ORDER BY wracc_micro DESC, band, dow)
             AS rk FROM scored)
WHERE rk <= {WR_TOP}
""",
)
def ml_best_rule_wracc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Subgroup discovery by weighted relative accuracy: every
    (value band × weekday) rule scores
    WRAcc = coverage · (precision − base rate) — the CN2-SD objective
    that balances 'interesting' (high lift) against 'trivial' (tiny
    coverage), which raw precision ranking gets wrong. The top
    {WR_TOP} rules for predicting purchases are reported with exact
    integer counts and micro-quantized scores (ties → band, weekday).

    Scale shape: one cell hash agg, scalar scoring, TakeOrdered."""
    d = (
        load(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
            F.expr("CAST(round(100 * value) AS BIGINT) div 1000000").alias(
                "band"
            ),
            F.when(F.dayofweek(F.col("ts").cast("date")) == 1, 7)
            .otherwise(F.dayofweek(F.col("ts").cast("date")) - 1)
            .alias("dow"),
        )
    )
    tot = d.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").cast("long").alias("pos"),
    )
    cells = d.groupBy("band", "dow").agg(
        F.count(F.lit(1)).cast("long").alias("nc"),
        F.sum("y").cast("long").alias("posc"),
    )
    scored = cells.crossJoin(F.broadcast(tot)).select(
        "band",
        "dow",
        "nc",
        "posc",
        F.round(
            1_000_000.0
            * F.col("nc")
            / F.col("n")
            * (
                F.col("posc").cast("double") / F.col("nc")
                - F.col("pos").cast("double") / F.col("n")
            )
        )
        .cast("long")
        .alias("wracc_micro"),
    )
    return (
        scored.withColumn(
            "rank",
            F.row_number()
            .over(Window.orderBy(F.desc("wracc_micro"), "band", "dow"))
            .cast("long"),
        )
        .filter(F.col("rank") <= WR_TOP)
        .select(
            "band",
            "dow",
            F.col("nc").alias("n_covered"),
            F.col("posc").alias("n_pos"),
            "wracc_micro",
            "rank",
        )
    )


# --------------------------------------------------------------------------
# 6. Adaptive file sizing
# --------------------------------------------------------------------------


@query(
    "io_adaptive_file_sizing",
    oracle=f"""
WITH part AS (
  SELECT strftime(o_orderdate, '%Y-%m') AS mon,
         CAST(count(*) * {AF_ROW_BYTES} AS BIGINT) AS bytes
  FROM orders GROUP BY 1
),
med AS (
  SELECT max(CASE WHEN rn = CAST(ceil(n / 2.0) AS BIGINT) THEN bytes END)
           AS target
  FROM (SELECT bytes, row_number() OVER (ORDER BY bytes, mon) AS rn,
               count(*) OVER () AS n
        FROM part)
),
plan_ AS (
  SELECT mon, bytes,
         greatest(1, (bytes + (SELECT target FROM med) - 1)
                     // (SELECT target FROM med)) AS n_files,
         (bytes + greatest(1, (bytes + (SELECT target FROM med) - 1)
                           // (SELECT target FROM med)) - 1)
         // greatest(1, (bytes + (SELECT target FROM med) - 1)
                     // (SELECT target FROM med)) AS file_bytes
  FROM part
)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM part) AS n_partitions,
       (SELECT CAST(target AS BIGINT) FROM med) AS target_bytes,
       CAST(sum(n_files) AS BIGINT) AS total_files,
       CAST(round(1000.0 * max(bytes) / (SELECT target FROM med)) AS BIGINT)
         AS skew_before_milli,
       CAST(round(1000.0 * max(file_bytes) / (SELECT target FROM med))
            AS BIGINT) AS skew_after_milli
FROM plan_
""",
)
def io_adaptive_file_sizing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adaptive file sizing: the median monthly-partition size becomes
    the target file size, each partition splits into
    ⌈bytes/target⌉ equal files, and the max-over-median SKEW is
    reported before and after — the planner loop behind
    spark.sql.files.maxPartitionBytes tuning and every table-format
    OPTIMIZE: after right-sizing, no task reads much more than the
    median (stragglers die). Median is an exact order statistic;
    splitting is integer ceiling division.

    Scale shape: partition-grain hash agg (metadata-sized), one tiny
    rank window, scalar plan arithmetic."""
    part = (
        load(spark, sf_dir, "orders")
        .groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("mon"))
        .agg((F.count(F.lit(1)) * AF_ROW_BYTES).cast("long").alias("bytes"))
    )
    r = part.select(
        "mon",
        "bytes",
        F.row_number().over(Window.orderBy("bytes", "mon")).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy(F.lit(1))).alias("n"),
    )
    med = r.agg(
        F.max(
            F.when(
                F.col("rn") == F.ceil(F.col("n") / 2.0).cast("long"),
                F.col("bytes"),
            )
        ).alias("target")
    )
    plan_ = part.crossJoin(F.broadcast(med)).select(
        "bytes",
        "target",
        F.greatest(
            F.lit(1),
            F.expr("(bytes + target - 1) div target"),
        ).alias("n_files"),
    ).withColumn(
        "file_bytes", F.expr("(bytes + n_files - 1) div n_files")
    )
    return plan_.agg(
        F.count(F.lit(1)).cast("long").alias("n_partitions"),
        F.max("target").cast("long").alias("target_bytes"),
        F.sum("n_files").cast("long").alias("total_files"),
        F.round(1000.0 * F.max("bytes") / F.max("target"))
        .cast("long")
        .alias("skew_before_milli"),
        F.round(1000.0 * F.max("file_bytes") / F.max("target"))
        .cast("long")
        .alias("skew_after_milli"),
    )
