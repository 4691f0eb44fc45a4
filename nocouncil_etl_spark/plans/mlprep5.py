"""ML-prep batch 5: multi-feature gradient-boosted stumps.

``ml_gbdt_two_features`` — the ml_gbdt_stump_rounds trainer with a real
split SEARCH ACROSS FEATURES: each round builds one residual histogram
per feature (account balance banded at cents-scale; order count banded
at 1), scores every candidate threshold of every feature with the
variance gain from one cumulative pass, and commits the globally best
(feature, threshold) stump with shrinkage. This is the actual
histogram-GBDT inner loop — LightGBM evaluates exactly this
per-feature-histogram argmax — with one stump row of driver state per
round and an unrolled SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nocouncil_etl_spark.io import load
from nocouncil_etl_spark.plans.breadth11 import (
    GB_BAND,
    GB_NU_DEN,
    GB_NU_NUM,
    _tdiv,
)
from nocouncil_etl_spark.registry import query

GB2_ROUNDS = 2
# feature id 1: acctbal cents (band GB_BAND); feature id 2: order count (band 1)
F1_BAND = GB_BAND
F2_BAND = 1


def _feat_cand_sql(rd: int, fid: int, x: str, band: int) -> str:
    """One feature's banded candidate set over residual CTE r{rd}."""
    return f"""
bands{rd}_{fid} AS (
  SELECT CAST(floor(CAST({x} AS DOUBLE) / {band}) AS BIGINT) AS band,
         CAST(count(*) AS BIGINT) AS n, CAST(sum(r) AS BIGINT) AS s
  FROM r{rd} GROUP BY 1
),
cum{rd}_{fid} AS (
  SELECT band,
         CAST(sum(n) OVER (ORDER BY band) AS BIGINT) AS nl,
         CAST(sum(s) OVER (ORDER BY band) AS BIGINT) AS sl
  FROM bands{rd}_{fid}
),
tot{rd}_{fid} AS (
  SELECT CAST(sum(n) AS BIGINT) AS n, CAST(sum(s) AS BIGINT) AS s
  FROM bands{rd}_{fid}
),
cand{rd}_{fid} AS (
  SELECT CAST({fid} AS BIGINT) AS fid, (c.band + 1) * {band} - 1 AS thr,
         c.nl, c.sl, t.n - c.nl AS nr, t.s - c.sl AS sr,
         round((CAST(c.sl AS DOUBLE) * c.sl) / c.nl
               + (CAST(t.s - c.sl AS DOUBLE) * (t.s - c.sl)) / (t.n - c.nl), 6)
           AS gain
  FROM cum{rd}_{fid} c CROSS JOIN tot{rd}_{fid} t
  WHERE c.nl < t.n
)"""


def _gbdt2_oracle() -> str:
    base = f"""
WITH y0 AS (
  SELECT c.c_custkey, CAST(round(c.c_acctbal * 100) AS BIGINT) AS x1,
         coalesce((SELECT CAST(count(*) AS BIGINT)
                   FROM orders o WHERE o.o_custkey = c.c_custkey), 0) AS x2,
         coalesce((SELECT CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   FROM orders o WHERE o.o_custkey = c.c_custkey), 0) // 100 AS y
  FROM customer c
),
f0 AS (SELECT CAST(sum(y) AS BIGINT) // CAST(count(*) AS BIGINT) AS m FROM y0),
r1 AS MATERIALIZED (
  SELECT c_custkey, x1, x2, y, y - (SELECT m FROM f0) AS r FROM y0
)"""
    parts = []
    prev = "r1"
    for rd in range(1, GB2_ROUNDS + 1):
        parts.append("," + _feat_cand_sql(rd, 1, "x1", F1_BAND))
        parts.append("," + _feat_cand_sql(rd, 2, "x2", F2_BAND))
        parts.append(f""",
best{rd} AS MATERIALIZED (
  SELECT * FROM (
    SELECT * FROM cand{rd}_1 UNION ALL SELECT * FROM cand{rd}_2
  ) ORDER BY gain DESC, fid, thr LIMIT 1
),
leaf{rd} AS MATERIALIZED (
  SELECT fid, thr, nl, nr, gain,
         ((sl // nl) * {GB_NU_NUM}) // {GB_NU_DEN} AS vl,
         ((sr // nr) * {GB_NU_NUM}) // {GB_NU_DEN} AS vr
  FROM best{rd}
),
r{rd + 1} AS MATERIALIZED (
  SELECT p.c_custkey, p.x1, p.x2, p.y,
         p.r - CASE WHEN (CASE WHEN (SELECT fid FROM leaf{rd}) = 1
                          THEN p.x1 ELSE p.x2 END) <= (SELECT thr FROM leaf{rd})
                    THEN (SELECT vl FROM leaf{rd})
                    ELSE (SELECT vr FROM leaf{rd}) END AS r
  FROM {prev} p
),
mae{rd} AS (
  SELECT CAST(sum(abs(r)) AS BIGINT) // CAST(count(*) AS BIGINT) AS mae
  FROM r{rd + 1}
)""")
        prev = f"r{rd + 1}"
    selects = " UNION ALL ".join(
        f"""SELECT CAST({rd} AS BIGINT) AS round, fid AS feature,
       CAST(thr AS BIGINT) AS threshold,
       CAST(nl AS BIGINT) AS n_left, CAST(nr AS BIGINT) AS n_right,
       CAST(vl AS BIGINT) AS value_left, CAST(vr AS BIGINT) AS value_right,
       gain, (SELECT CAST(mae AS BIGINT) FROM mae{rd}) AS mae_after
FROM leaf{rd}"""
        for rd in range(1, GB2_ROUNDS + 1)
    )
    return base + "".join(parts) + "\n" + selects


@query("ml_gbdt_two_features", oracle=_gbdt2_oracle())
def ml_gbdt_two_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{GB2_ROUNDS} boosting rounds with a split search ACROSS two
    features: per round, one residual histogram per feature (balance
    banded at {F1_BAND} cents, order count at unit granularity), every
    candidate threshold of every feature scored from one cumulative pass,
    the global argmax (gain desc, feature asc, threshold asc) committed
    with shrinkage {GB_NU_NUM}/{GB_NU_DEN}, residuals updated under the
    CHOSEN feature. The multi-feature histogram-GBDT inner loop —
    ml_gbdt_stump_rounds is the single-feature warm-up.

    Scale shape: per round, one map-side-combined histogram PER FEATURE
    (the per-feature histograms are what a distributed GBDT shuffles —
    never rows), one window per histogram, one collected stump row.
    Features add histograms, not passes: both histograms ride the same
    residual scan."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    per = o.groupBy(F.col("o_custkey").alias("c_custkey")).agg(
        F.count("*").cast("long").alias("n_ord"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("cents"),
    )
    y0 = c.join(per, "c_custkey", "left").select(
        "c_custkey",
        F.round(F.col("c_acctbal") * 100).cast("long").alias("x1"),
        F.coalesce("n_ord", F.lit(0)).cast("long").alias("x2"),
        F.expr("coalesce(cents, 0L) div 100").cast("long").alias("y"),
    )
    y0 = y0.persist()
    tot = y0.agg(
        F.sum("y").cast("long").alias("s"), F.count("*").cast("long").alias("n")
    ).collect()[0]
    f0 = _tdiv(tot.s, tot.n)
    cur = y0.withColumn("r", (F.col("y") - F.lit(f0)).cast("long"))

    # r12 opt (guide §1.2: fewer driver jobs per boosting round): the old
    # loop ran 3 jobs/round — (a) cur.count() to materialize the persist,
    # (b) the two-histogram argmax collect, (c) a separate MAE collect over
    # the updated residuals. But round rd's incoming residual frame IS the
    # frame round rd-1's MAE is defined over, so the MAE rides round rd's
    # argmax job as one extra crossJoined 1-row aggregate (same cached
    # scan), the count() materializer is subsumed by that same job, and
    # only the LAST round pays a dedicated MAE job. 3 jobs/round -> 1
    # job/round + 1 final; identical integer arithmetic (_tdiv on the same
    # sum(abs(r))/count pair), so every reported number is unchanged.
    stumps: list[tuple] = []
    maes: list[int] = []
    prev_cache = y0
    for rd in range(1, GB2_ROUNDS + 1):
        cur = cur.persist()

        def cands(fid: int, x: str, band: int) -> DataFrame:
            bands = cur.groupBy(
                F.floor(F.col(x).cast("double") / band).cast("long").alias("band")
            ).agg(
                F.count(F.lit(1)).cast("long").alias("n"),
                F.sum("r").cast("long").alias("s"),
            )
            w = Window.orderBy("band")
            cum = bands.select(
                "band",
                F.sum("n").over(w).cast("long").alias("nl"),
                F.sum("s").over(w).cast("long").alias("sl"),
            )
            t = bands.agg(
                F.sum("n").cast("long").alias("tn"),
                F.sum("s").cast("long").alias("ts"),
            )
            return (
                cum.crossJoin(F.broadcast(t))
                .filter(F.col("nl") < F.col("tn"))
                .select(
                    F.lit(fid).cast("long").alias("fid"),
                    ((F.col("band") + 1) * band - 1).alias("thr"),
                    "nl",
                    "sl",
                    (F.col("tn") - F.col("nl")).cast("long").alias("nr"),
                    (F.col("ts") - F.col("sl")).cast("long").alias("sr"),
                    F.round(
                        (F.col("sl").cast("double") * F.col("sl")) / F.col("nl")
                        + (
                            (F.col("ts") - F.col("sl")).cast("double")
                            * (F.col("ts") - F.col("sl"))
                        )
                        / (F.col("tn") - F.col("nl")),
                        6,
                    ).alias("gain"),
                )
            )

        allc = cands(1, "x1", F1_BAND).unionByName(cands(2, "x2", F2_BAND))
        top1 = allc.orderBy(F.desc("gain"), F.asc("fid"), F.asc("thr")).limit(1)
        if rd > 1:
            # previous round's MAE rides this round's job: cur's r column
            # at loop top is exactly the post-stump residual the old
            # mae{rd-1} job aggregated; the 1-row stats agg shares the
            # newly-persisted scan
            stats = cur.agg(
                F.sum(F.abs("r")).cast("long").alias("_sa"),
                F.count("*").cast("long").alias("_n"),
            )
            top1 = top1.crossJoin(F.broadcast(stats))
        best = top1.collect()[0]
        if rd > 1:
            maes.append(_tdiv(best._sa, best._n))
        prev_cache.unpersist()
        prev_cache = cur
        vl = _tdiv(_tdiv(best.sl, best.nl) * GB_NU_NUM, GB_NU_DEN)
        vr = _tdiv(_tdiv(best.sr, best.nr) * GB_NU_NUM, GB_NU_DEN)
        xcol = F.col("x1") if best.fid == 1 else F.col("x2")
        cur = cur.withColumn(
            "r",
            (
                F.col("r")
                - F.when(xcol <= best.thr, F.lit(vl)).otherwise(F.lit(vr))
            ).cast("long"),
        )
        stumps.append(
            (rd, int(best.fid), int(best.thr), int(best.nl), int(best.nr),
             vl, vr, float(best.gain))
        )
    # the last round's MAE is the only one without a following round to
    # ride on — one dedicated job, computed from the final residuals
    mae_row = cur.agg(
        F.sum(F.abs("r")).cast("long").alias("sa"),
        F.count("*").cast("long").alias("n"),
    ).collect()[0]
    maes.append(_tdiv(mae_row.sa, mae_row.n))
    rows = [s + (m,) for s, m in zip(stumps, maes)]
    prev_cache.unpersist()
    return spark.createDataFrame(
        rows,
        "round BIGINT, feature BIGINT, threshold BIGINT, n_left BIGINT, "
        "n_right BIGINT, value_left BIGINT, value_right BIGINT, gain DOUBLE, "
        "mae_after BIGINT",
    )
