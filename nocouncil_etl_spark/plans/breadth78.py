"""Breadth batch 58 (round 6): variance-ratio test, label-noise
sensitivity, partition-scheme advisor, Brown-Forsythe test, hour-shift
detector, classifier two-sample test.

Six operators (reference scope: the random-walk test, robustness to
label corruption, partition-granularity planning, the robust variance
homogeneity test, timezone-bug detection, and the modern
classifier-based distribution test):

- ``ts_variance_ratio``       — Lo-MacKinlay VR(q): q-period vs 1-period
  variance of daily changes.
- ``ml_label_noise_sensitivity`` — decision flips of the band-rate
  model after hash-chosen label corruption.
- ``io_partition_scheme_advisor`` — day/month/year partition schemes
  compared by count, size, and small-partition share.
- ``stat_brown_forsythe``     — median-centered Levene (robust variance
  homogeneity across event types).
- ``dq_hour_shift_detect``    — hour-of-day histogram chi-square
  between time halves (the timezone-regression detector).
- ``stat_c2st``               — classifier two-sample test: can a
  band model tell the halves apart better than chance?

Reference parity: north-star extension — no reference analogue
(the reference has no analytics layer); these are the audit layers a lake-scale engine
adds on the same tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nocouncil_etl_spark.io import load
from nocouncil_etl_spark.plans.breadth15 import _pt, _pt_sql
from nocouncil_etl_spark.registry import query

VR_Q = 5
LNS_FLIP_MOD = 10  # flip ~10% of labels
PSA_SMALL_ROWS = 1000


# --------------------------------------------------------------------------
# 1. Variance ratio
# --------------------------------------------------------------------------


@query(
    "ts_variance_ratio",
    oracle=f"""
WITH s AS (
  SELECT CAST(ts AS DATE) AS day,
         sum(CAST(round(10000 * value) AS BIGINT)) AS v4
  FROM events WHERE value IS NOT NULL GROUP BY 1
),
r AS (
  SELECT v4 - lag(v4, 1) OVER w AS r1,
         v4 - lag(v4, {VR_Q}) OVER w AS rq
  FROM s WINDOW w AS (ORDER BY day)
),
m1 AS (
  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(r1) AS BIGINT) AS sr,
         CAST(sum(CAST(r1 AS HUGEINT) * r1) AS DOUBLE) AS srr
  FROM r WHERE r1 IS NOT NULL
),
mq AS (
  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(rq) AS BIGINT) AS sr,
         CAST(sum(CAST(rq AS HUGEINT) * rq) AS DOUBLE) AS srr
  FROM r WHERE rq IS NOT NULL
)
SELECT (SELECT n FROM m1) AS n1,
       (SELECT n FROM mq) AS nq,
       CAST(round(1000.0
            * (((SELECT srr FROM mq)
                - CAST((SELECT sr FROM mq) AS DOUBLE) * (SELECT sr FROM mq)
                  / (SELECT n FROM mq)) / (SELECT n FROM mq))
            / ({VR_Q} * ((SELECT srr FROM m1)
                - CAST((SELECT sr FROM m1) AS DOUBLE) * (SELECT sr FROM m1)
                  / (SELECT n FROM m1)) / (SELECT n FROM m1)))
            AS BIGINT) AS vr_milli
""",
)
def ts_variance_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lo-MacKinlay variance ratio at q = {VR_Q}: the variance of
    {VR_Q}-day changes over {VR_Q}× the 1-day variance — exactly 1
    under a random walk (variances add), > 1 under momentum
    (trending), < 1 under mean reversion. The finance-standard random-
    walk test, complementing ts_hurst_rs (which reads the same
    property from rescaled ranges) and ts_arch1_fit (variance
    dynamics). Both variances come from exact 128-bit moments of
    integer differences.

    Scale shape: ONE window sort serves both lags; two moment
    aggregates; 1-row arithmetic."""
    s = (
        load(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .groupBy(F.col("ts").cast("date").alias("day"))
        .agg(F.sum(F.round(10000 * F.col("value")).cast("long")).alias("v4"))
    )
    w = Window.orderBy("day")
    r = s.select(
        (F.col("v4") - F.lag("v4", 1).over(w)).alias("r1"),
        (F.col("v4") - F.lag("v4", VR_Q).over(w)).alias("rq"),
    )
    r.persist()
    dec = "decimal(38,0)"

    def mom(col: str):
        return r.filter(F.col(col).isNotNull()).agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(col).cast("long").alias("sr"),
            F.sum((F.col(col).cast(dec) * F.col(col)))
            .cast("double")
            .alias("srr"),
        )

    m1 = mom("r1").select(
        F.col("n").alias("n1"), F.col("sr").alias("sr1"),
        F.col("srr").alias("srr1"),
    )
    mq = mom("rq").select(
        F.col("n").alias("nq"), F.col("sr").alias("srq"),
        F.col("srr").alias("srrq"),
    )
    var1 = (
        F.col("srr1")
        - F.col("sr1").cast("double") * F.col("sr1") / F.col("n1")
    ) / F.col("n1")
    varq = (
        F.col("srrq")
        - F.col("srq").cast("double") * F.col("srq") / F.col("nq")
    ) / F.col("nq")
    return m1.crossJoin(F.broadcast(mq)).select(
        "n1",
        "nq",
        F.round(1000.0 * varq / (VR_Q * var1)).cast("long").alias("vr_milli"),
    )


# --------------------------------------------------------------------------
# 2. Label-noise sensitivity
# --------------------------------------------------------------------------


@query(
    "ml_label_noise_sensitivity",
    oracle=f"""
WITH d AS (
  SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y,
         CAST(round(100 * value) AS BIGINT) // 2000 AS band,
         CASE WHEN ({_pt_sql("lns#", "event_id", LNS_FLIP_MOD)}) = 0
              THEN 1 ELSE 0 END AS flip
  FROM events WHERE value IS NOT NULL
),
clean AS (
  SELECT band, CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS pos
  FROM d GROUP BY band
),
noisy AS (
  SELECT band, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN flip = 1 THEN 1 - y ELSE y END) AS BIGINT) AS pos
  FROM d GROUP BY band
),
tot AS (SELECT CAST(sum(pos) AS BIGINT) AS p, CAST(sum(n) AS BIGINT) AS nn
        FROM clean),
dec AS (
  SELECT c.band, c.n,
         CASE WHEN c.pos * (SELECT nn FROM tot) > c.n * (SELECT p FROM tot)
              THEN 1 ELSE 0 END AS clean_pred,
         CASE WHEN x.pos * (SELECT nn FROM tot) > x.n * (SELECT p FROM tot)
              THEN 1 ELSE 0 END AS noisy_pred
  FROM clean c JOIN noisy x ON x.band = c.band
)
SELECT CAST(count(*) AS BIGINT) AS n_bands,
       CAST(sum(CASE WHEN clean_pred <> noisy_pred THEN 1 ELSE 0 END)
            AS BIGINT) AS n_flipped_bands,
       CAST(sum(CASE WHEN clean_pred <> noisy_pred THEN n ELSE 0 END)
            AS BIGINT) AS n_rows_affected,
       CAST(round(1000.0 * sum(CASE WHEN clean_pred <> noisy_pred
                                    THEN n ELSE 0 END)
                  / sum(n)) AS BIGINT) AS affected_share_milli
FROM dec
""",
)
def ml_label_noise_sensitivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-noise robustness audit: ~1/{LNS_FLIP_MOD} of labels flip
    (md5-chosen — the reproducible corruption), the band-rate decision
    rule (above/below global base rate) retrains on the corrupted
    labels, and the report counts DECISION flips and the population
    share they cover — low sensitivity means the downstream curation
    gates built on such rules (curation_license_gate-style) survive
    annotation noise; high sensitivity says collect cleaner labels
    before automating. Exact counts end-to-end.

    Scale shape: two band histograms over one scan (the flip is a
    column expression), a band equi-join, one rollup."""
    d = (
        load(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
            F.expr("CAST(round(100 * value) AS BIGINT) div 2000").alias(
                "band"
            ),
            F.when(
                _pt("lns#", F.col("event_id")) % LNS_FLIP_MOD == 0, 1
            )
            .otherwise(0)
            .alias("flip"),
        )
    )
    clean = d.groupBy("band").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").cast("long").alias("pos"),
    )
    noisy = d.groupBy("band").agg(
        F.sum(
            F.when(F.col("flip") == 1, 1 - F.col("y")).otherwise(F.col("y"))
        )
        .cast("long")
        .alias("npos"),
        F.count(F.lit(1)).cast("long").alias("nn2"),
    )
    tot = clean.agg(
        F.sum("pos").cast("long").alias("p"),
        F.sum("n").cast("long").alias("nn"),
    )
    dec = (
        clean.join(noisy, "band")
        .crossJoin(F.broadcast(tot))
        .select(
            "n",
            F.when(
                F.col("pos") * F.col("nn") > F.col("n") * F.col("p"), 1
            )
            .otherwise(0)
            .alias("clean_pred"),
            F.when(
                F.col("npos") * F.col("nn") > F.col("nn2") * F.col("p"), 1
            )
            .otherwise(0)
            .alias("noisy_pred"),
        )
    )
    diff = F.col("clean_pred") != F.col("noisy_pred")
    return dec.agg(
        F.count(F.lit(1)).cast("long").alias("n_bands"),
        F.sum(F.when(diff, 1).otherwise(0)).cast("long").alias(
            "n_flipped_bands"
        ),
        F.sum(F.when(diff, F.col("n")).otherwise(0))
        .cast("long")
        .alias("n_rows_affected"),
        F.round(
            1000.0
            * F.sum(F.when(diff, F.col("n")).otherwise(0))
            / F.sum("n")
        )
        .cast("long")
        .alias("affected_share_milli"),
    )


# --------------------------------------------------------------------------
# 3. Partition-scheme advisor
# --------------------------------------------------------------------------


def _psa_oracle() -> str:
    arms = []
    for name, expr in (
        ("day", "CAST(o_orderdate AS DATE)"),
        ("month", "strftime(o_orderdate, '%Y-%m')"),
        ("year", "strftime(o_orderdate, '%Y')"),
    ):
        arms.append(f"""
SELECT '{name}' AS scheme,
       CAST(count(*) AS BIGINT) AS n_partitions,
       CAST(round(avg(CAST(n AS DOUBLE))) AS BIGINT) AS avg_rows,
       CAST(min(n) AS BIGINT) AS min_rows,
       CAST(sum(CASE WHEN n < {PSA_SMALL_ROWS} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_small,
       CAST(round(1000.0 * sum(CASE WHEN n < {PSA_SMALL_ROWS} THEN 1 ELSE 0
                               END) / count(*)) AS BIGINT) AS small_milli
FROM (SELECT {expr} AS p, CAST(count(*) AS BIGINT) AS n
      FROM orders GROUP BY 1)""")
    return "\nUNION ALL\n".join(arms)


@query("io_partition_scheme_advisor", oracle=_psa_oracle())
def io_partition_scheme_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-granularity advisor: the same table partitioned by
    day, month, or year — per scheme the partition count, average/min
    rows, and the SMALL-partition share (< {PSA_SMALL_ROWS} rows, the
    small-files disease io_compact_small_files cures after the fact) —
    pick the finest scheme whose small share stays near zero, because
    finer pruning is free only until partitions shrink below one file.
    THE decision every table DDL makes once and lives with.

    Scale shape: three partition-grain hash aggs over one column, tiny
    rollups."""
    orders = load(spark, sf_dir, "orders")
    arms = None
    for name, col in (
        ("day", F.col("o_orderdate").cast("date").cast("string")),
        ("month", F.date_format("o_orderdate", "yyyy-MM")),
        ("year", F.date_format("o_orderdate", "yyyy")),
    ):
        per = orders.groupBy(col.alias("p")).agg(
            F.count(F.lit(1)).cast("long").alias("n")
        )
        arm = per.agg(
            F.lit(name).alias("scheme"),
            F.count(F.lit(1)).cast("long").alias("n_partitions"),
            F.round(F.avg(F.col("n").cast("double")))
            .cast("long")
            .alias("avg_rows"),
            F.min("n").cast("long").alias("min_rows"),
            F.sum(F.when(F.col("n") < PSA_SMALL_ROWS, 1).otherwise(0))
            .cast("long")
            .alias("n_small"),
            F.round(
                1000.0
                * F.sum(F.when(F.col("n") < PSA_SMALL_ROWS, 1).otherwise(0))
                / F.count(F.lit(1))
            )
            .cast("long")
            .alias("small_milli"),
        ).select(
            "scheme", "n_partitions", "avg_rows", "min_rows", "n_small",
            "small_milli",
        )
        arms = arm if arms is None else arms.unionByName(arm)
    return arms


# --------------------------------------------------------------------------
# 4. Brown-Forsythe
# --------------------------------------------------------------------------


@query(
    "stat_brown_forsythe",
    oracle="""
WITH v AS (
  SELECT event_id, event_type, CAST(round(100 * value) AS BIGINT) AS x
  FROM events WHERE value IS NOT NULL
),
med AS (
  SELECT event_type,
         max(CASE WHEN rn = CAST(ceil(n / 2.0) AS BIGINT) THEN x END) AS m
  FROM (SELECT event_type, x,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY x, event_id) AS rn,
               count(*) OVER (PARTITION BY event_type) AS n
        FROM v)
  GROUP BY event_type
),
z AS (
  SELECT v.event_type, abs(v.x - med.m) AS z
  FROM v JOIN med ON med.event_type = v.event_type
),
g AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n, CAST(sum(z) AS BIGINT) AS s,
         CAST(sum(CAST(z AS HUGEINT) * z) AS DOUBLE) AS ss
  FROM z GROUP BY event_type
),
tot AS (
  SELECT CAST(sum(n) AS BIGINT) AS nn, CAST(sum(s) AS BIGINT) AS st,
         CAST(count(*) AS BIGINT) AS k
  FROM g
)
SELECT (SELECT k FROM tot) AS k_groups,
       (SELECT nn FROM tot) AS n_total,
       CAST(round(1000.0
            * (sum(n * (CAST(s AS DOUBLE) / n
                 - CAST((SELECT st FROM tot) AS DOUBLE) / (SELECT nn FROM tot))
                 * (CAST(s AS DOUBLE) / n
                 - CAST((SELECT st FROM tot) AS DOUBLE) / (SELECT nn FROM tot)))
               / ((SELECT k FROM tot) - 1))
            / (sum(ss - CAST(s AS DOUBLE) * s / n)
               / ((SELECT nn FROM tot) - (SELECT k FROM tot))))
            AS BIGINT) AS f_milli
FROM g
""",
)
def stat_brown_forsythe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown-Forsythe test: Levene's variance-homogeneity F computed on
    deviations from the group MEDIAN (exact ⌈n/2⌉ order statistics)
    instead of the mean — the modification that keeps the test honest
    under heavy tails, where mean-centered Levene (stat_levene_mean)
    loses its size. Between/within sums of the |x − med| scores come
    from exact integer moments; one F ratio at the end.

    Scale shape: per-type rank window for medians, one scored scan,
    k-group moment rollup."""
    v = (
        load(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            "event_id",
            "event_type",
            F.round(100 * F.col("value")).cast("long").alias("x"),
        )
    )
    wp = Window.partitionBy("event_type")
    r = v.select(
        "event_type",
        "x",
        F.row_number().over(wp.orderBy("x", "event_id")).alias("rn"),
        F.count(F.lit(1)).over(wp).alias("n"),
    )
    med = r.groupBy("event_type").agg(
        F.max(
            F.when(
                F.col("rn") == F.ceil(F.col("n") / 2.0).cast("long"),
                F.col("x"),
            )
        ).alias("m")
    )
    z = v.join(F.broadcast(med), "event_type").select(
        "event_type", F.abs(F.col("x") - F.col("m")).alias("z")
    )
    g = z.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("z").cast("long").alias("s"),
        F.sum((F.col("z").cast("decimal(38,0)") * F.col("z")))
        .cast("double")
        .alias("ss"),
    )
    tot = g.agg(
        F.sum("n").cast("long").alias("nn"),
        F.sum("s").cast("long").alias("st"),
        F.count(F.lit(1)).cast("long").alias("k"),
    )
    gmean = F.col("st").cast("double") / F.col("nn")
    zbar = F.col("s").cast("double") / F.col("n")
    return (
        g.crossJoin(F.broadcast(tot))
        .agg(
            F.max("k").alias("k_groups"),
            F.max("nn").alias("n_total"),
            F.round(
                1000.0
                * (
                    F.sum(F.col("n") * (zbar - gmean) * (zbar - gmean))
                    / (F.max("k") - 1)
                )
                / (
                    F.sum(
                        F.col("ss")
                        - F.col("s").cast("double") * F.col("s") / F.col("n")
                    )
                    / (F.max("nn") - F.max("k"))
                )
            )
            .cast("long")
            .alias("f_milli"),
        )
        .select(
            F.col("k_groups").cast("long"),
            F.col("n_total").cast("long"),
            "f_milli",
        )
    )


# --------------------------------------------------------------------------
# 5. Hour-shift detector
# --------------------------------------------------------------------------


@query(
    "dq_hour_shift_detect",
    oracle="""
WITH mid AS (
  SELECT epoch_us(min(ts))
         + (epoch_us(max(ts)) - epoch_us(min(ts))) // 2 AS m
  FROM events
),
h AS (
  SELECT extract(hour FROM ts) AS hr,
         CASE WHEN epoch_us(ts) < (SELECT m FROM mid) THEN 0 ELSE 1 END AS half
  FROM events
),
cell AS (
  SELECT hr, half, CAST(count(*) AS BIGINT) AS n FROM h GROUP BY 1, 2
),
hm AS (
  SELECT hr,
         CAST(sum(CASE WHEN half = 0 THEN n ELSE 0 END) AS BIGINT) AS n0,
         CAST(sum(CASE WHEN half = 1 THEN n ELSE 0 END) AS BIGINT) AS n1
  FROM cell GROUP BY hr
),
tot AS (SELECT CAST(sum(n0) AS BIGINT) AS t0, CAST(sum(n1) AS BIGINT) AS t1
        FROM hm),
terms AS (
  SELECT hr,
         CAST(round(1000000.0
              * (n0 * (SELECT t1 FROM tot) - n1 * (SELECT t0 FROM tot))
              * (CAST(n0 AS DOUBLE) * (SELECT t1 FROM tot)
                 - CAST(n1 AS DOUBLE) * (SELECT t0 FROM tot))
              / (CAST((SELECT t0 FROM tot) AS DOUBLE) * (SELECT t1 FROM tot)
                 * ((SELECT t0 FROM tot) + (SELECT t1 FROM tot))
                 * (n0 + n1))) AS BIGINT) AS chi_micro
  FROM hm WHERE n0 + n1 > 0
)
SELECT CAST(count(*) AS BIGINT) AS n_hours,
       CAST(sum(chi_micro) AS BIGINT) AS chi2_micro,
       CAST((SELECT hr FROM terms ORDER BY chi_micro DESC, hr LIMIT 1)
            AS BIGINT) AS worst_hour
FROM terms
""",
)
def dq_hour_shift_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timezone-regression detector: the hour-of-day histograms of the
    first and second time halves compare by the two-sample chi-square
    (the median-test identity form — exact integer numerators, one
    division per hour), and the hour with the largest contribution is
    named. A wall-clock ingestion bug (DST handling, a server moved to
    UTC) shows up as a COHERENT shift here long before row counts
    drift — the specialized sibling of dq_null_drift/agg_psi_drift
    aimed at the clock.

    Scale shape: one (hour, half) hash agg (48 cells), scalar terms."""
    ev = load(spark, sf_dir, "events")
    mid = ev.agg(
        (
            F.unix_micros(F.min("ts"))
            + F.expr("(unix_micros(max(ts)) - unix_micros(min(ts))) div 2")
        ).alias("m")
    )
    h = ev.crossJoin(F.broadcast(mid)).select(
        F.hour("ts").alias("hr"),
        F.when(F.unix_micros("ts") < F.col("m"), 0).otherwise(1).alias("half"),
    )
    hm = h.groupBy("hr").agg(
        F.sum(F.when(F.col("half") == 0, 1).otherwise(0))
        .cast("long")
        .alias("n0"),
        F.sum(F.when(F.col("half") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n1"),
    )
    tot = hm.agg(
        F.sum("n0").cast("long").alias("t0"),
        F.sum("n1").cast("long").alias("t1"),
    )
    num = F.col("n0") * F.col("t1") - F.col("n1") * F.col("t0")
    terms = (
        hm.crossJoin(F.broadcast(tot))
        .filter(F.col("n0") + F.col("n1") > 0)
        .select(
            "hr",
            F.round(
                1_000_000.0
                * num
                * (
                    F.col("n0").cast("double") * F.col("t1")
                    - F.col("n1").cast("double") * F.col("t0")
                )
                / (
                    F.col("t0").cast("double")
                    * F.col("t1")
                    * (F.col("t0") + F.col("t1"))
                    * (F.col("n0") + F.col("n1"))
                )
            )
            .cast("long")
            .alias("chi_micro"),
        )
    )
    terms.persist()
    worst = (
        terms.orderBy(F.desc("chi_micro"), "hr")
        .limit(1)
        .select(F.col("hr").cast("long").alias("worst_hour"))
    )
    return (
        terms.agg(
            F.count(F.lit(1)).cast("long").alias("n_hours"),
            F.sum("chi_micro").cast("long").alias("chi2_micro"),
        )
        .crossJoin(F.broadcast(worst))
    )


# --------------------------------------------------------------------------
# 6. Classifier two-sample test
# --------------------------------------------------------------------------


@query(
    "stat_c2st",
    oracle="""
WITH mid AS (
  SELECT epoch_us(min(ts))
         + (epoch_us(max(ts)) - epoch_us(min(ts))) // 2 AS m
  FROM events
),
d AS (
  SELECT CAST(round(100 * value) AS BIGINT) // 2000 AS band,
         CASE WHEN epoch_us(ts) < (SELECT m FROM mid) THEN 0 ELSE 1 END AS y,
         event_id % 2 AS fold
  FROM events WHERE value IS NOT NULL
),
model AS (
  SELECT band, CAST(sum(y) AS BIGINT) AS pos, CAST(count(*) AS BIGINT) AS n
  FROM d WHERE fold = 0 GROUP BY band
),
scored AS (
  SELECT d.y,
         CASE WHEN m.pos * 2 > m.n THEN 1 ELSE 0 END AS pred
  FROM d JOIN model m ON m.band = d.band
  WHERE d.fold = 1
),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN y = pred THEN 1 ELSE 0 END) AS BIGINT) AS correct
  FROM scored
)
SELECT n AS n_eval, correct,
       CAST(round(1000.0 * correct / n) AS BIGINT) AS acc_milli,
       CAST(round(1000.0 * (correct - n / 2.0) / sqrt(n / 4.0)) AS BIGINT)
         AS z_milli
FROM agg
""",
)
def stat_c2st(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier two-sample test (Lopez-Paz & Oquab 2017): train a
    value-band majority classifier ON FOLD 0 to predict which TIME HALF
    a row came from, evaluate on fold 1 — accuracy significantly above
    ½ (binomial z against n/2, sd √(n/4)) means the halves differ in
    distribution, with the classifier's features saying WHERE. The
    modern test that turns any model into a distribution test —
    complements the closed-form family (KS/CvM/energy) when the
    difference is multivariate or nonlinear.

    Scale shape: one band histogram on fold 0 (broadcast), one scored
    pass on fold 1, 1-row arithmetic."""
    ev = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    mid = ev.agg(
        (
            F.unix_micros(F.min("ts"))
            + F.expr("(unix_micros(max(ts)) - unix_micros(min(ts))) div 2")
        ).alias("m")
    )
    d = ev.crossJoin(F.broadcast(mid)).select(
        F.expr("CAST(round(100 * value) AS BIGINT) div 2000").alias("band"),
        F.when(F.unix_micros("ts") < F.col("m"), 0).otherwise(1).alias("y"),
        (F.col("event_id") % 2).alias("fold"),
    )
    model = (
        d.filter(F.col("fold") == 0)
        .groupBy("band")
        .agg(
            F.sum("y").cast("long").alias("pos"),
            F.count(F.lit(1)).cast("long").alias("nb"),
        )
    )
    scored = (
        d.filter(F.col("fold") == 1)
        .join(F.broadcast(model), "band")
        .select(
            "y",
            F.when(F.col("pos") * 2 > F.col("nb"), 1).otherwise(0).alias(
                "pred"
            ),
        )
    )
    agg = scored.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.when(F.col("y") == F.col("pred"), 1).otherwise(0))
        .cast("long")
        .alias("correct"),
    )
    return agg.select(
        F.col("n").alias("n_eval"),
        "correct",
        F.round(1000.0 * F.col("correct") / F.col("n"))
        .cast("long")
        .alias("acc_milli"),
        F.round(
            1000.0
            * (F.col("correct") - F.col("n") / 2.0)
            / F.sqrt(F.col("n") / 4.0)
        )
        .cast("long")
        .alias("z_milli"),
    )
