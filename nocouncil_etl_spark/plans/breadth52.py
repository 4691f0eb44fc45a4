"""Breadth batch 52 (round 6): theta forecast, decile migration, orphan
files, permutation importance, char entropy, rounding policy.

Six operators (reference scope: a strong simple forecaster with a
holdout scorecard, who-moved-between-deciles churn analysis, the lake
janitor's orphan report, which feature the classifier actually uses,
binary/garbage document screening, and the cent-level consequences of a
rounding-policy choice):

- ``ts_theta_forecast``     — theta-method forecast (SES level + damped
  trend) scored against naive persistence on a holdout.
- ``agg_decile_migration``  — user revenue-decile transition matrix
  between horizon halves.
- ``io_orphan_file_audit``  — physical partitions on disk vs the
  manifest: orphan detection and exposure accounting.
- ``ml_permutation_importance`` — accuracy drop of the Gaussian-NB
  scorer under a deterministic per-feature permutation.
- ``text_char_entropy``     — character-distribution entropy per doc;
  the low-entropy (repetitive/garbage) screen.
- ``fn_rounding_policy_audit`` — half-up vs banker's rounding on
  discount cents, divergence quantified exactly.
"""

from __future__ import annotations

import os
import tempfile

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nocouncil_etl_spark.io import fan_out, load
from nocouncil_etl_spark.operators.quantiles import ranged_rank_cumsum
from nocouncil_etl_spark.plans.breadth15 import _pt, _pt_sql
from nocouncil_etl_spark.registry import query

# --------------------------------------------------------------------------
# 1. Theta-method forecast with holdout scoring
# --------------------------------------------------------------------------

TH_TRAIN = 20
TH_ALPHA_NUM, TH_ALPHA_DEN = 1, 4  # SES alpha = 1/4 in fixed point


@query(
    "ts_theta_forecast",
    oracle=f"""
WITH RECURSIVE daily AS (
  SELECT event_type, CAST(ts AS DATE) AS d,
         CAST(sum(CAST(round(value) AS BIGINT)) AS BIGINT) AS y
  FROM events GROUP BY 1, 2
),
idx AS (
  SELECT event_type, y,
         CAST(row_number() OVER (PARTITION BY event_type ORDER BY d)
              AS BIGINT) AS t
  FROM daily
),
train AS (SELECT * FROM idx WHERE t <= {TH_TRAIN}),
test AS (SELECT * FROM idx WHERE t > {TH_TRAIN}),
ols AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS m,
         CAST(sum(t) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(t * y) AS BIGINT) AS sxy, CAST(sum(t * t) AS BIGINT) AS sxx
  FROM train GROUP BY 1
),
fit AS (
  SELECT event_type,
         (1000 * (m * sxy - sx * sy)) // (m * sxx - sx * sx) AS slope_milli
  FROM ols
),
ses AS (
  SELECT event_type, t, y AS lvl FROM train WHERE t = 1
  UNION ALL
  SELECT x.event_type, x.t,
         CAST((s.lvl * ({TH_ALPHA_DEN} - {TH_ALPHA_NUM}) + x.y
               * {TH_ALPHA_NUM}) // {TH_ALPHA_DEN} AS BIGINT)
  FROM ses s JOIN train x ON x.event_type = s.event_type AND x.t = s.t + 1
),
lvl AS (SELECT event_type, lvl FROM ses WHERE t = {TH_TRAIN}),
naive AS (SELECT event_type, y AS last_y FROM train WHERE t = {TH_TRAIN}),
scored AS (
  SELECT te.event_type,
         abs(te.y - (l.lvl + (f.slope_milli * (te.t - {TH_TRAIN})) // 2000))
           AS e_theta,
         abs(te.y - nv.last_y) AS e_naive
  FROM test te
  JOIN lvl l ON te.event_type = l.event_type
  JOIN fit f ON te.event_type = f.event_type
  JOIN naive nv ON te.event_type = nv.event_type
)
SELECT s.event_type,
       CAST({TH_TRAIN} AS BIGINT) AS n_train,
       CAST(count(*) AS BIGINT) AS n_test,
       (SELECT lvl FROM lvl WHERE event_type = s.event_type) AS ses_level,
       (SELECT slope_milli FROM fit WHERE event_type = s.event_type)
         AS slope_milli,
       CAST(sum(e_theta) AS BIGINT) AS sae_theta,
       CAST(sum(e_naive) AS BIGINT) AS sae_naive,
       CAST(CASE WHEN sum(e_theta) < sum(e_naive) THEN 1 ELSE 0 END
            AS BIGINT) AS theta_wins
FROM scored s GROUP BY s.event_type
""",
)
def ts_theta_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta-method forecast (Assimakopoulos & Nikolopoulos 2000, the
    M3-competition winner): the h-step forecast is the SES level (alpha
    = {TH_ALPHA_NUM}/{TH_ALPHA_DEN}, exact fixed-point recursion) plus
    HALF the linear-trend slope times the horizon — the theta
    decomposition's damped drift, which is what makes it beat both pure
    SES (no drift) and pure trend (over-extrapolates). Trained on the
    first {TH_TRAIN} days, scored on the rest against naive persistence
    — the ``eval_forecast_mase`` discipline with the model swapped in.
    All state is integer; slope is one milli division.

    Scale shape: per-key recursion over the bounded train window (one
    Arrow batch, one BIGINT of SES state); scoring is a broadcast join
    of three k-row model tables against the test slice."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy("event_type", F.to_date("ts").alias("d")).agg(
        F.sum(F.round("value").cast("long")).cast("long").alias("y")
    )
    idx = daily.select(
        "event_type",
        "y",
        F.row_number()
        .over(Window.partitionBy("event_type").orderBy("d"))
        .cast("long")
        .alias("t"),
    )
    train = idx.filter(F.col("t") <= TH_TRAIN)
    test = idx.filter(F.col("t") > TH_TRAIN)
    ols = train.groupBy("event_type").agg(
        F.count("*").cast("long").alias("m"),
        F.sum("t").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("t") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("t") * F.col("t")).cast("long").alias("sxx"),
    )
    fit = ols.select(
        "event_type",
        F.expr(
            "(1000 * (m * sxy - sx * sy)) div (m * sxx - sx * sx)"
        ).alias("slope_milli"),
    )

    def ses(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("t")
        lvl = int(pdf["y"].iloc[0])
        for y in pdf["y"].iloc[1:]:
            lvl = (lvl * (TH_ALPHA_DEN - TH_ALPHA_NUM) + int(y) * TH_ALPHA_NUM) // TH_ALPHA_DEN
        return pd.DataFrame(
            {"event_type": [pdf["event_type"].iloc[0]], "lvl": [lvl]}
        )

    lvl = train.groupBy("event_type").applyInPandas(
        ses, "event_type string, lvl long"
    )
    naive = train.filter(F.col("t") == TH_TRAIN).select(
        "event_type", F.col("y").alias("last_y")
    )
    scored = (
        test.join(F.broadcast(lvl), "event_type")
        .join(F.broadcast(fit), "event_type")
        .join(F.broadcast(naive), "event_type")
        .select(
            "event_type",
            "lvl",
            "slope_milli",
            F.abs(
                F.col("y")
                - (
                    F.col("lvl")
                    + F.expr(f"(slope_milli * (t - {TH_TRAIN})) div 2000")
                )
            ).alias("e_theta"),
            F.abs(F.col("y") - F.col("last_y")).alias("e_naive"),
        )
    )
    return scored.groupBy("event_type").agg(
        F.lit(TH_TRAIN).cast("long").alias("n_train"),
        F.count("*").cast("long").alias("n_test"),
        F.max("lvl").cast("long").alias("ses_level"),
        F.max("slope_milli").cast("long").alias("slope_milli"),
        F.sum("e_theta").cast("long").alias("sae_theta"),
        F.sum("e_naive").cast("long").alias("sae_naive"),
        F.when(F.sum("e_theta") < F.sum("e_naive"), 1)
        .otherwise(0)
        .cast("long")
        .alias("theta_wins"),
    )


# --------------------------------------------------------------------------
# 2. Decile migration matrix
# --------------------------------------------------------------------------


@query(
    "agg_decile_migration",
    oracle="""
WITH mid AS (
  SELECT min(CAST(ts AS DATE))
         + CAST((max(CAST(ts AS DATE)) - min(CAST(ts AS DATE))) // 2
                AS INTEGER) AS m
  FROM events
),
per AS (
  SELECT user_id,
         CASE WHEN CAST(ts AS DATE) < (SELECT m FROM mid) THEN 1 ELSE 2 END
           AS half,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM events GROUP BY 1, 2
),
both_users AS (
  SELECT user_id FROM per GROUP BY user_id HAVING count(*) = 2
),
dec AS (
  SELECT p.user_id, p.half,
         CAST(ntile(10) OVER (PARTITION BY p.half
                              ORDER BY p.cents, p.user_id) AS BIGINT) AS d
  FROM per p JOIN both_users b ON p.user_id = b.user_id
)
SELECT a.d AS d1, b.d AS d2, CAST(count(*) AS BIGINT) AS n_users,
       CAST(CASE WHEN a.d = b.d THEN 1 ELSE 0 END AS BIGINT) AS stayed
FROM (SELECT * FROM dec WHERE half = 1) a
JOIN (SELECT * FROM dec WHERE half = 2) b ON a.user_id = b.user_id
GROUP BY a.d, b.d
""",
)
def agg_decile_migration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue-decile migration matrix: users active in BOTH horizon
    halves are decile-ranked within each half (ntile over exact cents,
    user-id tie-break) and the (from-decile, to-decile) transition
    counts are the churn-of-rank report — mass on the diagonal means a
    stable customer base; mass below it means the top is leaking (the
    rank-level complement of ``cohort_retention``, which only tracks
    presence). The `stayed` flag rides along so diagonal share is one
    filter away.

    Scale shape: per-(user, half) collapse map-side; ntile is one
    partition sort per half over the user frame; the matrix is ≤100
    rows."""
    ev = load(spark, sf_dir, "events")
    mid = ev.agg(
        F.expr(
            "min(to_date(ts)) + CAST(datediff(max(to_date(ts)),"
            " min(to_date(ts))) div 2 AS INT)"
        ).alias("m")
    )
    per = (
        ev.crossJoin(F.broadcast(mid))
        .groupBy(
            "user_id",
            F.when(F.to_date("ts") < F.col("m"), 1).otherwise(2).alias("half"),
        )
        .agg(
            F.sum(F.round(F.col("value") * 100).cast("long"))
            .cast("long")
            .alias("cents")
        )
    )
    both_users = per.groupBy("user_id").count().filter(F.col("count") == 2).select(
        "user_id"
    )
    dec = per.join(both_users, "user_id").select(
        "user_id",
        "half",
        F.ntile(10)
        .over(Window.partitionBy("half").orderBy("cents", "user_id"))
        .cast("long")
        .alias("d"),
    )
    a = dec.filter(F.col("half") == 1).select("user_id", F.col("d").alias("d1"))
    b = dec.filter(F.col("half") == 2).select("user_id", F.col("d").alias("d2"))
    return (
        a.join(b, "user_id")
        .groupBy("d1", "d2")
        .agg(F.count("*").cast("long").alias("n_users"))
        .select(
            "d1",
            "d2",
            "n_users",
            F.when(F.col("d1") == F.col("d2"), 1)
            .otherwise(0)
            .cast("long")
            .alias("stayed"),
        )
    )


# --------------------------------------------------------------------------
# 3. Orphan-file audit
# --------------------------------------------------------------------------

ORPH_BUCKETS = 8
ORPH_DROP = 2  # buckets written but never registered in the manifest


@query(
    "io_orphan_file_audit",
    oracle=f"""
WITH o AS (
  SELECT o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
         CAST(o_orderkey % {ORPH_BUCKETS} AS BIGINT) AS b
  FROM orders
),
orphan_pick AS (
  SELECT b FROM (
    SELECT b, row_number() OVER (
        ORDER BY {_pt_sql('orph#', 'b', 1_000_000)}, b) AS rk
    FROM (SELECT DISTINCT b FROM o)
  ) WHERE rk <= {ORPH_DROP}
),
stats AS (
  SELECT o.b, CAST(count(*) AS BIGINT) AS n_rows,
         CAST(sum(o.cents) AS BIGINT) AS cents,
         CAST(CASE WHEN o.b IN (SELECT b FROM orphan_pick)
              THEN 1 ELSE 0 END AS BIGINT) AS orphan
  FROM o GROUP BY o.b
)
SELECT CAST({ORPH_BUCKETS} AS BIGINT) AS n_partitions,
       CAST(sum(1 - orphan) AS BIGINT) AS n_referenced,
       CAST(sum(orphan) AS BIGINT) AS n_orphans,
       CAST(sum(CASE WHEN orphan = 0 THEN n_rows ELSE 0 END) AS BIGINT)
         AS rows_live,
       CAST(sum(CASE WHEN orphan = 1 THEN n_rows ELSE 0 END) AS BIGINT)
         AS rows_orphaned,
       CAST(sum(CASE WHEN orphan = 1 THEN cents ELSE 0 END) AS BIGINT)
         AS cents_orphaned
FROM stats
""",
)
def io_orphan_file_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orphan-file audit — the lake janitor's other job (``io_snapshot_
    vacuum`` expires SUPERSEDED versions; this finds data that was
    WRITTEN but never registered): orders land physically in
    {ORPH_BUCKETS} hive partitions on scratch disk, the manifest
    registers all but {ORPH_DROP} md5-chosen buckets (modeling a failed
    commit that left its files behind), and the audit diffs the
    DIRECTORY LISTING against the manifest — reporting orphan count
    plus the row/value exposure sitting in unreachable files. Orphans
    are invisible to every manifest-respecting reader yet still cost
    storage and can leak data; the listing-vs-metadata diff is the only
    way to find them.

    Scale shape: the diff is an anti-join of two partition-name sets
    (metadata-sized); exposure accounting reads only the orphaned
    partitions' footers in a real lake."""
    o = load(spark, sf_dir, "orders")
    base = os.path.join(
        tempfile.gettempdir(),
        "nocouncil_etl_spark_scratch",
        f"orph_{os.path.basename(sf_dir.rstrip('/'))}",
    )
    data_dir = os.path.join(base, "data")
    man_dir = os.path.join(base, "manifest")
    src = o.select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        (F.col("o_orderkey") % ORPH_BUCKETS).cast("long").alias("b"),
    )
    src.write.mode("overwrite").partitionBy("b").parquet(data_dir)
    buckets = src.select("b").distinct()
    orphan_pick = (
        buckets.withColumn(
            "rk",
            F.row_number().over(
                Window.orderBy((_pt("orph#", F.col("b")) % 1_000_000), "b")
            ),
        )
        .filter(F.col("rk") <= ORPH_DROP)
        .select("b")
    )
    manifest = buckets.join(orphan_pick, "b", "left_anti")
    manifest.write.mode("overwrite").parquet(man_dir)
    on_disk = spark.read.parquet(data_dir)
    man = spark.read.parquet(man_dir)
    stats = on_disk.groupBy("b").agg(
        F.count("*").cast("long").alias("n_rows"),
        F.sum("cents").cast("long").alias("cents"),
    ).join(
        man.withColumn("ref", F.lit(1)), "b", "left"
    ).withColumn("orphan", F.when(F.col("ref").isNull(), 1).otherwise(0))
    return stats.agg(
        F.lit(ORPH_BUCKETS).cast("long").alias("n_partitions"),
        F.sum(1 - F.col("orphan")).cast("long").alias("n_referenced"),
        F.sum("orphan").cast("long").alias("n_orphans"),
        F.sum(F.when(F.col("orphan") == 0, F.col("n_rows")).otherwise(0))
        .cast("long")
        .alias("rows_live"),
        F.sum(F.when(F.col("orphan") == 1, F.col("n_rows")).otherwise(0))
        .cast("long")
        .alias("rows_orphaned"),
        F.sum(F.when(F.col("orphan") == 1, F.col("cents")).otherwise(0))
        .cast("long")
        .alias("cents_orphaned"),
    )


# --------------------------------------------------------------------------
# 4. Permutation feature importance
# --------------------------------------------------------------------------


@query(
    "ml_permutation_importance",
    oracle=f"""
WITH data AS MATERIALIZED (
  SELECT event_id, CAST(round(value) AS BIGINT) AS v,
         CAST(hour(ts) AS BIGINT) AS hr,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
  FROM events
),
cls AS (
  SELECT y, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(v) AS BIGINT) AS sv, CAST(sum(v * v) AS BIGINT) AS svv,
         CAST(sum(hr) AS BIGINT) AS sh, CAST(sum(hr * hr) AS BIGINT) AS shh
  FROM data GROUP BY y
),
tot AS (SELECT CAST(sum(n) AS BIGINT) AS nn FROM cls),
mom AS (
  SELECT y,
         CAST(sv AS DOUBLE) / n AS mv,
         (CAST(n AS DOUBLE) * svv - CAST(sv AS DOUBLE) * sv)
           / (CAST(n AS DOUBLE) * n) + 0.5 AS vv,
         CAST(sh AS DOUBLE) / n AS mh,
         (CAST(n AS DOUBLE) * shh - CAST(sh AS DOUBLE) * sh)
           / (CAST(n AS DOUBLE) * n) + 0.5 AS vh,
         ln(CAST(n AS DOUBLE) / (SELECT nn FROM tot)) AS prior
  FROM cls
),
ranked AS (
  SELECT *, row_number() OVER (ORDER BY event_id) AS r,
         row_number() OVER (
             ORDER BY {_pt_sql('pfi#', 'event_id', 1_000_000_000)}, event_id)
           AS rp
  FROM data
),
perm0 AS (
  SELECT a.event_id, a.y, a.v, a.hr, b.v AS pv, b.hr AS phr
  FROM ranked a JOIN ranked b ON a.r = b.rp
),
accs AS (
  SELECT 'baseline' AS feature, y, v, hr FROM perm0
  UNION ALL
  SELECT 'value', y, pv, hr FROM perm0
  UNION ALL
  SELECT 'hour', y, v, phr FROM perm0
),
scored AS (
  SELECT a.feature, a.y,
         CASE WHEN
           (SELECT prior - 0.5 * ln(vv) - (a.v - mv) * (a.v - mv) / (2 * vv)
                   - 0.5 * ln(vh) - (a.hr - mh) * (a.hr - mh) / (2 * vh)
            FROM mom WHERE y = 1)
           >
           (SELECT prior - 0.5 * ln(vv) - (a.v - mv) * (a.v - mv) / (2 * vv)
                   - 0.5 * ln(vh) - (a.hr - mh) * (a.hr - mh) / (2 * vh)
            FROM mom WHERE y = 0)
         THEN 1 ELSE 0 END AS pred
  FROM accs a
),
accf AS (
  SELECT feature,
         CAST((sum(CASE WHEN y = pred THEN 1 ELSE 0 END) * 1000000)
              // count(*) AS BIGINT) AS acc_ppm
  FROM scored GROUP BY feature
)
SELECT f.feature, f.acc_ppm,
       b.acc_ppm - f.acc_ppm AS drop_ppm
FROM accf f, (SELECT acc_ppm FROM accf WHERE feature = 'baseline') b
""",
)
def ml_permutation_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Permutation feature importance (Breiman's measure, model-
    agnostic form): score the ``ml_gaussian_nb`` model on the intact
    data, then with each feature column REPLACED by a deterministic
    md5-rank permutation of itself (marginal distribution preserved,
    joint broken), and report the accuracy drop — the importance of a
    feature IS what breaks when you sever its link to the label. The
    permutation is a rank-to-rank self-join (row at original rank r
    takes the feature of the row at permuted rank r), so both engines
    shuffle identically.

    Scale shape: model moments are one hash-agg; the permutation join
    is rank-keyed (at 100 TB: per-partition ranks + offset composition,
    same as ``sample_systematic``); scoring is three conditional
    passes expressible as one union scan."""
    ev = load(spark, sf_dir, "events")
    data = ev.select(
        "event_id",
        F.round("value").cast("long").alias("v"),
        F.hour("ts").cast("long").alias("hr"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
    )
    cls = data.groupBy("y").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("v").cast("long").alias("sv"),
        F.sum(F.col("v") * F.col("v")).cast("long").alias("svv"),
        F.sum("hr").cast("long").alias("sh"),
        F.sum(F.col("hr") * F.col("hr")).cast("long").alias("shh"),
    )
    tot = cls.agg(F.sum("n").cast("long").alias("nn"))
    mom = cls.crossJoin(F.broadcast(tot)).select(
        "y",
        (F.col("sv").cast("double") / F.col("n")).alias("mv"),
        (
            (F.col("n").cast("double") * F.col("svv")
             - F.col("sv").cast("double") * F.col("sv"))
            / (F.col("n").cast("double") * F.col("n"))
            + 0.5
        ).alias("vv"),
        (F.col("sh").cast("double") / F.col("n")).alias("mh"),
        (
            (F.col("n").cast("double") * F.col("shh")
             - F.col("sh").cast("double") * F.col("sh"))
            / (F.col("n").cast("double") * F.col("n"))
            + 0.5
        ).alias("vh"),
        F.log(F.col("n").cast("double") / F.col("nn")).alias("prior"),
    )
    m1 = mom.filter(F.col("y") == 1).select(
        F.col("mv").alias("mv1"), F.col("vv").alias("vv1"),
        F.col("mh").alias("mh1"), F.col("vh").alias("vh1"),
        F.col("prior").alias("pr1"),
    )
    m0 = mom.filter(F.col("y") == 0).select(
        F.col("mv").alias("mv0"), F.col("vv").alias("vv0"),
        F.col("mh").alias("mh0"), F.col("vh").alias("vh0"),
        F.col("prior").alias("pr0"),
    )
    # r9: both permutation ranks via the range-partitioned two-phase scan
    # — event_id and the md5 hash are NEAR-UNIQUE domains, exactly where
    # Fenwick pays its O(levels) explode per distinct value for nothing
    # (the engine's encoded rule; same swap cut sample_systematic 6.8→1.9 s
    # at sf1). No global sorts; ties (impossible on event_id, hash ties
    # broken by event_id) handled identically.
    ranked = ranged_rank_cumsum(
        ranged_rank_cumsum(data, "event_id", "event_id", rank_col="r")
        .withColumn("_ph", _pt("pfi#", F.col("event_id")) % 1_000_000_000),
        "_ph",
        "event_id",
        rank_col="rp",
    ).drop("_ph")
    bperm = ranked.select(
        F.col("rp").alias("rj"), F.col("v").alias("pv"), F.col("hr").alias("phr")
    )
    # shuffle_hash hint: both sides are EVENTS-SIZED, but their size
    # estimates degrade through the rank machinery and Spark elected to
    # broadcast one — OOM at sf1 (found by the r9 scale run). Rank keys
    # are unique and uniform, so a shuffled hash join is the right shape
    # at any scale; never broadcast a fact-sized side.
    perm0 = ranked.join(
        bperm.hint("shuffle_hash"), ranked.r == bperm.rj
    ).select("y", "v", "hr", "pv", "phr")
    accs = (
        perm0.select(F.lit("baseline").alias("feature"), "y",
                     F.col("v").alias("fv"), F.col("hr").alias("fh"))
        .unionByName(
            perm0.select(F.lit("value").alias("feature"), "y",
                         F.col("pv").alias("fv"), F.col("hr").alias("fh"))
        )
        .unionByName(
            perm0.select(F.lit("hour").alias("feature"), "y",
                         F.col("v").alias("fv"), F.col("phr").alias("fh"))
        )
    )
    scored = (
        accs.crossJoin(F.broadcast(m1))
        .crossJoin(F.broadcast(m0))
        .select(
            "feature",
            "y",
            F.when(
                F.expr(
                    "pr1 - 0.5 * ln(vv1) - (fv - mv1) * (fv - mv1) / (2 * vv1)"
                    " - 0.5 * ln(vh1) - (fh - mh1) * (fh - mh1) / (2 * vh1)"
                    " > pr0 - 0.5 * ln(vv0) - (fv - mv0) * (fv - mv0) / (2 * vv0)"
                    " - 0.5 * ln(vh0) - (fh - mh0) * (fh - mh0) / (2 * vh0)"
                ),
                1,
            )
            .otherwise(0)
            .alias("pred"),
        )
    )
    accf = scored.groupBy("feature").agg(
        F.expr(
            "CAST((sum(CASE WHEN y = pred THEN 1 ELSE 0 END) * 1000000)"
            " div count(*) AS BIGINT)"
        ).alias("acc_ppm")
    )
    base = accf.filter(F.col("feature") == "baseline").select(
        F.col("acc_ppm").alias("base_ppm")
    )
    return accf.crossJoin(F.broadcast(base)).select(
        "feature",
        "acc_ppm",
        (F.col("base_ppm") - F.col("acc_ppm")).cast("long").alias("drop_ppm"),
    )


# --------------------------------------------------------------------------
# 5. Character entropy screen
# --------------------------------------------------------------------------

CE_BOTTOM = 10


@query(
    "text_char_entropy",
    oracle=f"""
WITH chars AS (
  SELECT doc_id, c, CAST(count(*) AS BIGINT) AS k
  FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, len(text) + 1),
                  i -> substring(text, CAST(i AS INTEGER), 1))) AS c
    FROM documents
  ) GROUP BY 1, 2
),
dl AS (
  SELECT doc_id, CAST(sum(k) AS BIGINT) AS n_chars,
         CAST(count(*) AS BIGINT) AS n_distinct
  FROM chars GROUP BY 1
),
ent AS (
  SELECT c.doc_id, d.n_chars, d.n_distinct,
         CAST(sum(CAST(round(-(CAST(c.k AS DOUBLE) / d.n_chars)
                    * ln(CAST(c.k AS DOUBLE) / d.n_chars) * 1000000)
                    AS BIGINT)) AS BIGINT) AS entropy_micro
  FROM chars c JOIN dl d ON c.doc_id = d.doc_id
  GROUP BY 1, 2, 3
)
SELECT rk, doc_id, n_chars, n_distinct, entropy_micro FROM (
  SELECT *, CAST(row_number() OVER (ORDER BY entropy_micro, doc_id) AS INT)
              AS rk
  FROM ent
) WHERE rk <= {CE_BOTTOM}
""",
)
def text_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-distribution Shannon entropy per document, lowest
    {CE_BOTTOM} reported — the cheap pre-tokenization screen for
    repetitive or degenerate documents (a char-level entropy far below
    the corpus norm means boilerplate loops, padding runs, or
    base64-ish noise — each a different kind of training-data poison;
    ``text_repetition`` finds REPEATED SPANS, this catches
    distributional collapse even without exact repeats). Each −p·ln p
    term quantizes once to micro-nats from the exact rational k/len
    (the ``agg_entropy_diversity`` discipline at character granularity).

    Scale shape: per-(doc, char) counts collapse map-side from a
    sequence-transform explode; entropy is one keyed agg over ≤
    |alphabet| rows per doc; the report is a bounded bottom-k."""
    docs = load(spark, sf_dir, "documents")
    chars = (
        fan_out(docs)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, length(text)),"
                    " i -> substring(text, i, 1))"
                )
            ).alias("c"),
        )
        .groupBy("doc_id", "c")
        .agg(F.count("*").cast("long").alias("k"))
    )
    dl = chars.groupBy("doc_id").agg(
        F.sum("k").cast("long").alias("n_chars"),
        F.count("*").cast("long").alias("n_distinct"),
    )
    p = F.col("k").cast("double") / F.col("n_chars")
    ent = (
        chars.join(dl, "doc_id")
        .select(
            "doc_id",
            "n_chars",
            "n_distinct",
            F.round(-p * F.log(p) * 1000000).cast("long").alias("h"),
        )
        .groupBy("doc_id", "n_chars", "n_distinct")
        .agg(F.sum("h").cast("long").alias("entropy_micro"))
    )
    return (
        ent.withColumn(
            "rk",
            F.row_number()
            .over(Window.orderBy("entropy_micro", "doc_id"))
            .cast("int"),
        )
        .filter(F.col("rk") <= CE_BOTTOM)
        .select("rk", "doc_id", "n_chars", "n_distinct", "entropy_micro")
    )


# --------------------------------------------------------------------------
# 6. Rounding-policy audit
# --------------------------------------------------------------------------


@query(
    "fn_rounding_policy_audit",
    oracle="""
WITH li AS (
  SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
         CAST(round(l_discount * 100) AS BIGINT) AS pct
  FROM lineitem
),
raw AS (
  SELECT cents * pct AS r FROM li  -- discount amount in 1e-4 dollars
),
pol AS (
  SELECT r, r // 100 AS q, r % 100 AS f,
         (r + 50) // 100 AS half_up,
         r // 100 + CASE WHEN r % 100 > 50
                          OR (r % 100 = 50 AND (r // 100) % 2 = 1)
                    THEN 1 ELSE 0 END AS banker
  FROM raw
)
SELECT CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CASE WHEN f = 50 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_half_cases,
       CAST(sum(half_up) AS BIGINT) AS halfup_total_cents,
       CAST(sum(banker) AS BIGINT) AS banker_total_cents,
       CAST(sum(half_up) - sum(banker) AS BIGINT) AS delta_cents,
       CAST(sum(CASE WHEN half_up <> banker THEN 1 ELSE 0 END) AS BIGINT)
         AS n_divergent
FROM pol
""",
)
def fn_rounding_policy_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rounding-policy audit on discount cents: each lineitem's discount
    amount is an EXACT integer in 10⁻⁴ dollars (cents × integer
    percent), so the half-cent cases (fraction exactly 50) are
    identifiable precisely — and half-up vs banker's (round-half-to-
    even) rounding divergence is countable to the cent. Half-up
    systematically overstates totals by ~half a cent per half-case;
    banker's is unbiased — which is why ledgers mandate it and why the
    policy must be IDENTICAL across engines (the repo-wide
    round-once-then-integer discipline exists precisely because Python,
    DuckDB and Java all default to different tie-breaking).

    Scale shape: one projection + one conditional-sum agg, fully
    map-side."""
    li = load(spark, sf_dir, "lineitem").select(
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
        F.round(F.col("l_discount") * 100).cast("long").alias("pct"),
    )
    pol = li.select((F.col("cents") * F.col("pct")).alias("r")).select(
        "r",
        F.expr("r % 100").alias("f"),
        F.expr("(r + 50) div 100").alias("half_up"),
        F.expr(
            "r div 100 + CASE WHEN r % 100 > 50"
            " OR (r % 100 = 50 AND (r div 100) % 2 = 1) THEN 1 ELSE 0 END"
        ).alias("banker"),
    )
    return pol.agg(
        F.count("*").cast("long").alias("n_rows"),
        F.sum(F.when(F.col("f") == 50, 1).otherwise(0))
        .cast("long")
        .alias("n_half_cases"),
        F.sum("half_up").cast("long").alias("halfup_total_cents"),
        F.sum("banker").cast("long").alias("banker_total_cents"),
        (F.sum("half_up") - F.sum("banker")).cast("long").alias("delta_cents"),
        F.sum(F.when(F.col("half_up") != F.col("banker"), 1).otherwise(0))
        .cast("long")
        .alias("n_divergent"),
    )
