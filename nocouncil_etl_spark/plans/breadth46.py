"""Breadth batch 46 (round 6): seasonal strength, MA crossover,
write-audit-publish, price-volume-mix bridge, CDC chunk dedup, ABC/XYZ.

Six operators (reference scope: how seasonal a feed really is, signal
detection on smoothed series, gated lake publishes, explaining a revenue
delta, storage-style chunk dedup of long documents, and inventory-ops
segmentation):

- ``ts_seasonal_strength``  — Hyndman-style trend/seasonal strength from
  an exact integer STL-lite decomposition.
- ``window_ma_crossover``   — fast/slow moving-average crossover events
  via exact cross-multiplied comparison (no division).
- ``io_write_audit_publish`` — the WAP gate: stage → audit → publish
  only what passes; a planted partial snapshot stays unpublished.
- ``agg_price_volume_mix``  — period-over-period revenue bridge split
  into price, volume, and residual effects per brand.
- ``dedup_cdc_chunks``      — content-defined chunking (hash-boundary
  splits) with cross-document duplicate-chunk stats.
- ``agg_abc_xyz``           — ABC (revenue share) × XYZ (demand
  variability) part segmentation.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nocouncil_etl_spark.io import fan_out, load
from nocouncil_etl_spark.operators.quantiles import cumulate
from nocouncil_etl_spark.plans.breadth15 import _pt, _pt_sql
from nocouncil_etl_spark.registry import query

# --------------------------------------------------------------------------
# 1. Trend / seasonal strength
# --------------------------------------------------------------------------


@query(
    "ts_seasonal_strength",
    oracle="""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS d,
         CAST(sum(CAST(round(value) AS BIGINT)) AS BIGINT) AS y
  FROM events GROUP BY 1, 2
),
tr AS (
  SELECT event_type, d, y,
         CAST(sum(y) OVER w // count(*) OVER w AS BIGINT) AS t
  FROM daily
  WINDOW w AS (PARTITION BY event_type ORDER BY d
               ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
),
dt AS (
  SELECT event_type, d,
         CAST((d - DATE '1970-01-05') % 7 AS BIGINT) AS dow,
         y, t, y - t AS detr
  FROM tr
),
seas AS (
  SELECT event_type, dow, CAST(sum(detr) AS BIGINT) // count(*) AS s
  FROM dt GROUP BY 1, 2
),
comp AS (
  SELECT dt.event_type, dt.detr, dt.detr - seas.s AS r,
         dt.y - seas.s AS des
  FROM dt JOIN seas ON dt.event_type = seas.event_type
                   AND dt.dow = seas.dow
),
vars AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         CAST(count(*) * sum(r * r) - sum(r) * sum(r) AS BIGINT) AS vr,
         CAST(count(*) * sum(detr * detr) - sum(detr) * sum(detr) AS BIGINT)
           AS vdt,
         CAST(count(*) * sum(des * des) - sum(des) * sum(des) AS BIGINT)
           AS vds
  FROM comp GROUP BY 1
)
SELECT event_type, n,
       CAST(greatest(0, 1000000 - vr // greatest(vdt // 1000000, 1))
            AS BIGINT) AS f_seasonal_ppm,
       CAST(greatest(0, 1000000 - vr // greatest(vds // 1000000, 1))
            AS BIGINT) AS f_trend_ppm
FROM vars
""",
)
def ts_seasonal_strength(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trend and seasonal STRENGTH (Hyndman & Athanasopoulos, FPP):
    decompose each daily series with an STL-lite pass — trend = centered
    ±3-day integer moving mean, seasonal = per-weekday integer mean of
    the detrended series, remainder = what's left — then
    F_seasonal = max(0, 1 − Var(R)/Var(detrended)) and
    F_trend = max(0, 1 − Var(R)/Var(deseasonalized)). Strengths near 1 =
    the component explains the series; near 0 = noise. This is the
    one-number-per-series summary that decides whether the
    seasonal-baseline forecaster (``ts_seasonal_weekday_baseline``) is
    even applicable to a feed. Variances are exact deviation-form
    integers (n·Σx² − (Σx)²), ratios one div-first floor division.

    Scale shape: daily collapse map-side; the moving mean is a bounded
    per-key window; everything after runs on |types|×days rows."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy("event_type", F.to_date("ts").alias("d")).agg(
        F.sum(F.round("value").cast("long")).cast("long").alias("y")
    )
    wmv = (
        Window.partitionBy("event_type").orderBy("d").rowsBetween(-3, 3)
    )
    tr = daily.select(
        "event_type",
        "d",
        "y",
        F.expr(
            "CAST(sum(y) OVER (PARTITION BY event_type ORDER BY d"
            " ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)"
            " div count(*) OVER (PARTITION BY event_type ORDER BY d"
            " ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS BIGINT)"
        ).alias("t"),
    )
    dt = tr.select(
        "event_type",
        (F.datediff("d", F.lit("1970-01-05").cast("date")) % 7)
        .cast("long")
        .alias("dow"),
        "y",
        (F.col("y") - F.col("t")).alias("detr"),
    )
    seas = dt.groupBy("event_type", "dow").agg(
        F.expr("CAST(sum(detr) AS BIGINT) div count(*)").alias("s")
    )
    comp = dt.join(seas, ["event_type", "dow"]).select(
        "event_type",
        "detr",
        (F.col("detr") - F.col("s")).alias("r"),
        (F.col("y") - F.col("s")).alias("des"),
    )
    vars_ = comp.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n"),
        (
            F.count("*") * F.sum(F.col("r") * F.col("r"))
            - F.sum("r") * F.sum("r")
        )
        .cast("long")
        .alias("vr"),
        (
            F.count("*") * F.sum(F.col("detr") * F.col("detr"))
            - F.sum("detr") * F.sum("detr")
        )
        .cast("long")
        .alias("vdt"),
        (
            F.count("*") * F.sum(F.col("des") * F.col("des"))
            - F.sum("des") * F.sum("des")
        )
        .cast("long")
        .alias("vds"),
    )
    return vars_.select(
        "event_type",
        "n",
        F.expr(
            "CAST(greatest(0, 1000000 - vr div greatest(vdt div 1000000, 1))"
            " AS BIGINT)"
        ).alias("f_seasonal_ppm"),
        F.expr(
            "CAST(greatest(0, 1000000 - vr div greatest(vds div 1000000, 1))"
            " AS BIGINT)"
        ).alias("f_trend_ppm"),
    )


# --------------------------------------------------------------------------
# 2. Moving-average crossover events
# --------------------------------------------------------------------------

MA_FAST = 3
MA_SLOW = 10


@query(
    "window_ma_crossover",
    oracle=f"""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS d,
         CAST(sum(CAST(round(value) AS BIGINT)) AS BIGINT) AS y
  FROM events GROUP BY 1, 2
),
d0 AS (SELECT min(d) AS start FROM daily),
ma AS (
  SELECT event_type, d - d0.start AS off,
         CAST(row_number() OVER w AS BIGINT) AS rn,
         CAST(sum(y) OVER (w ROWS BETWEEN {MA_FAST - 1} PRECEDING
                           AND CURRENT ROW) AS BIGINT) AS sf,
         CAST(sum(y) OVER (w ROWS BETWEEN {MA_SLOW - 1} PRECEDING
                           AND CURRENT ROW) AS BIGINT) AS ss
  FROM daily, d0
  WINDOW w AS (PARTITION BY event_type ORDER BY d)
),
sig AS (
  SELECT event_type, off, rn,
         CASE WHEN sf * {MA_SLOW} > ss * {MA_FAST} THEN 1
              WHEN sf * {MA_SLOW} < ss * {MA_FAST} THEN -1 ELSE 0 END AS s,
         (1000 * sf) // {MA_FAST} AS fast_milli,
         (1000 * ss) // {MA_SLOW} AS slow_milli
  FROM ma WHERE rn >= {MA_SLOW}
),
ev AS (
  SELECT *, lag(s) OVER (PARTITION BY event_type ORDER BY off) AS ps
  FROM sig
)
SELECT event_type, CAST(off AS BIGINT) AS off,
       CAST(s AS BIGINT) AS direction,
       CAST(fast_milli AS BIGINT) AS fast_milli,
       CAST(slow_milli AS BIGINT) AS slow_milli
FROM ev
WHERE s <> 0 AND ps IS NOT NULL AND s <> ps
""",
)
def window_ma_crossover(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fast/slow moving-average crossover detection ({MA_FAST}-day vs
    {MA_SLOW}-day) on each daily-revenue series — the golden-cross /
    death-cross signal generalized to any metric stream (regime-change
    alerts on feed volume). The comparison is CROSS-MULTIPLIED
    (sf·{MA_SLOW} vs ss·{MA_FAST}), so the signal is exact integer
    arithmetic with no division rounding at the decision boundary; the
    milli-scaled averages are emitted for display only. A crossover row
    fires when today's sign differs from yesterday's and is nonzero.

    Scale shape: two bounded trailing windows + one lag per key — a
    single per-key sort, no self-joins; identical to the streaming
    sliding-window form."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy("event_type", F.to_date("ts").alias("d")).agg(
        F.sum(F.round("value").cast("long")).cast("long").alias("y")
    )
    d0 = daily.agg(F.min("d").alias("start"))
    w = Window.partitionBy("event_type").orderBy("d")
    ma = (
        daily.crossJoin(F.broadcast(d0))
        .select(
            "event_type",
            F.datediff("d", "start").cast("long").alias("off"),
            F.row_number().over(w).cast("long").alias("rn"),
            F.sum("y").over(w.rowsBetween(-(MA_FAST - 1), 0)).cast("long").alias("sf"),
            F.sum("y").over(w.rowsBetween(-(MA_SLOW - 1), 0)).cast("long").alias("ss"),
        )
        .filter(F.col("rn") >= MA_SLOW)
    )
    sig = ma.select(
        "event_type",
        "off",
        F.expr(
            f"CASE WHEN sf * {MA_SLOW} > ss * {MA_FAST} THEN 1"
            f" WHEN sf * {MA_SLOW} < ss * {MA_FAST} THEN -1 ELSE 0 END"
        ).alias("s"),
        F.expr(f"(1000 * sf) div {MA_FAST}").alias("fast_milli"),
        F.expr(f"(1000 * ss) div {MA_SLOW}").alias("slow_milli"),
    )
    evd = sig.withColumn(
        "ps", F.lag("s").over(Window.partitionBy("event_type").orderBy("off"))
    )
    return evd.filter(
        (F.col("s") != 0) & F.col("ps").isNotNull() & (F.col("s") != F.col("ps"))
    ).select(
        "event_type",
        F.col("off").cast("long"),
        F.col("s").cast("long").alias("direction"),
        F.col("fast_milli").cast("long"),
        F.col("slow_milli").cast("long"),
    )


# --------------------------------------------------------------------------
# 3. Write-audit-publish gate
# --------------------------------------------------------------------------


@query(
    "io_write_audit_publish",
    oracle="""
WITH full_agg AS (
  SELECT event_type, CAST(ts AS DATE) AS d, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM events GROUP BY 1, 2
),
partial_agg AS (
  SELECT event_type, CAST(ts AS DATE) AS d, CAST(count(*) AS BIGINT) AS n
  FROM events WHERE event_id % 2 = 0 GROUP BY 1, 2
),
src AS (SELECT CAST(count(*) AS BIGINT) AS n_src FROM events),
audits AS (
  SELECT CAST(CASE WHEN (SELECT sum(n) FROM full_agg) = (SELECT n_src FROM src)
                    AND (SELECT min(cents) FROM full_agg) >= 0
              THEN 1 ELSE 0 END AS BIGINT) AS audit_a_pass,
         CAST(CASE WHEN (SELECT sum(n) FROM partial_agg)
                        = (SELECT n_src FROM src)
              THEN 1 ELSE 0 END AS BIGINT) AS audit_b_pass
)
SELECT f.event_type, CAST(sum(f.n) AS BIGINT) AS n,
       CAST(sum(f.cents) AS BIGINT) AS cents,
       a.audit_a_pass, a.audit_b_pass
FROM full_agg f, audits a
GROUP BY f.event_type, a.audit_a_pass, a.audit_b_pass
""",
)
def io_write_audit_publish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write-audit-publish (the Iceberg/Netflix WAP gate): every
    snapshot lands in a STAGING area first, a data-quality audit runs
    against the staged files, and only a passing snapshot is promoted
    to the published path readers see. Two snapshots are staged here —
    the full daily rollup (audit: row counts reconcile with the source
    and no negative totals → pass) and a planted partial ingest (only
    even event ids; the reconciliation audit fails → NOT published).
    The returned frame re-reads the PUBLISHED path, proving the bad
    snapshot never leaked, with both audit verdicts alongside.

    Scale shape: audits are aggregate scans of the staged snapshot
    (cheap relative to the write); the publish is a metadata-level
    promotion, not a rewrite, in a real table format."""
    ev = load(spark, sf_dir, "events")
    base = os.path.join(
        tempfile.gettempdir(),
        "nocouncil_etl_spark_scratch",
        f"wap_{os.path.basename(sf_dir.rstrip('/'))}",
    )
    stage_a = os.path.join(base, "stage_a")
    stage_b = os.path.join(base, "stage_b")
    pub = os.path.join(base, "published")
    full_agg = ev.groupBy("event_type", F.to_date("ts").alias("d")).agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.round(F.col("value") * 100).cast("long")).cast("long").alias("cents"),
    )
    partial_agg = (
        ev.filter(F.col("event_id") % 2 == 0)
        .groupBy("event_type", F.to_date("ts").alias("d"))
        .agg(F.count("*").cast("long").alias("n"))
    )
    full_agg.write.mode("overwrite").parquet(stage_a)
    partial_agg.write.mode("overwrite").parquet(stage_b)
    n_src = ev.count()
    a = spark.read.parquet(stage_a)
    b = spark.read.parquet(stage_b)
    arow = a.agg(F.sum("n").alias("sn"), F.min("cents").alias("mc")).first()
    audit_a = 1 if (arow.sn == n_src and arow.mc >= 0) else 0
    audit_b = 1 if b.agg(F.sum("n")).first()[0] == n_src else 0
    if audit_a:
        spark.read.parquet(stage_a).write.mode("overwrite").parquet(pub)
    if audit_b:  # pragma: no cover - the planted snapshot must fail
        spark.read.parquet(stage_b).write.mode("overwrite").parquet(pub)
    return (
        spark.read.parquet(pub)
        .groupBy("event_type")
        .agg(
            F.sum("n").cast("long").alias("n"),
            F.sum("cents").cast("long").alias("cents"),
        )
        .select(
            "*",
            F.lit(audit_a).cast("long").alias("audit_a_pass"),
            F.lit(audit_b).cast("long").alias("audit_b_pass"),
        )
    )


# --------------------------------------------------------------------------
# 4. Price-volume-mix revenue bridge
# --------------------------------------------------------------------------


@query(
    "agg_price_volume_mix",
    oracle="""
WITH li AS (
  SELECT p.p_brand AS brand, CAST(l.l_shipdate AS DATE) AS d,
         CAST(round(l.l_quantity) AS BIGINT) AS qty,
         CAST(round(l.l_extendedprice * 100) AS BIGINT) AS cents
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
),
span AS (
  SELECT min(d) + CAST((max(d) - min(d)) // 2 AS INTEGER) AS mid FROM li
),
per AS (
  SELECT brand, CASE WHEN d < (SELECT mid FROM span) THEN 1 ELSE 2 END AS pd,
         CAST(sum(qty) AS BIGINT) AS q, CAST(sum(cents) AS BIGINT) AS rev
  FROM li GROUP BY 1, 2
),
wide AS (
  SELECT a.brand, a.q AS q1, a.rev AS rev1, b.q AS q2, b.rev AS rev2,
         (1000 * a.rev) // a.q AS p1m, (1000 * b.rev) // b.q AS p2m
  FROM (SELECT * FROM per WHERE pd = 1 AND q > 0) a
  JOIN (SELECT * FROM per WHERE pd = 2 AND q > 0) b ON a.brand = b.brand
)
SELECT brand, q1, q2, rev1, rev2, rev2 - rev1 AS delta_cents,
       CAST(((p2m - p1m) * q2) // 1000 AS BIGINT) AS price_eff_cents,
       CAST((p1m * (q2 - q1)) // 1000 AS BIGINT) AS volume_eff_cents,
       CAST(rev2 - rev1 - ((p2m - p1m) * q2) // 1000
            - (p1m * (q2 - q1)) // 1000 AS BIGINT) AS residual_cents
FROM wide
""",
)
def agg_price_volume_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Price-volume-mix revenue bridge per brand between the first and
    second halves of the shipping horizon: Δrevenue decomposes into a
    PRICE effect ((p₂−p₁)·q₂ — what changed because unit realization
    moved), a VOLUME effect (p₁·(q₂−q₁) — what changed because quantity
    moved), and the residual rounding remainder — the decomposition
    every revenue-review deck runs, as a deterministic integer query
    (unit prices in milli-cents, one floor division per effect; the
    residual column makes the rounding explicit instead of hiding it).

    Scale shape: one broadcast part-dim join, one (brand, period)
    hash-agg, then a brand-keyed self-join of the two period slices —
    all map-side-combinable, no windows."""
    li = load(spark, sf_dir, "lineitem")
    pt = load(spark, sf_dir, "part")
    j = li.join(F.broadcast(pt), li.l_partkey == pt.p_partkey).select(
        F.col("p_brand").alias("brand"),
        F.to_date("l_shipdate").alias("d"),
        F.round("l_quantity").cast("long").alias("qty"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
    )
    span = j.agg(
        F.expr(
            "min(d) + CAST(datediff(max(d), min(d)) div 2 AS INT)"
        ).alias("mid")
    )
    per = (
        j.crossJoin(F.broadcast(span))
        .groupBy(
            "brand",
            F.when(F.col("d") < F.col("mid"), 1).otherwise(2).alias("pd"),
        )
        .agg(
            F.sum("qty").cast("long").alias("q"),
            F.sum("cents").cast("long").alias("rev"),
        )
    )
    a = (
        per.filter((F.col("pd") == 1) & (F.col("q") > 0))
        .select(
            "brand",
            F.col("q").alias("q1"),
            F.col("rev").alias("rev1"),
            F.expr("(1000 * rev) div q").alias("p1m"),
        )
    )
    b = (
        per.filter((F.col("pd") == 2) & (F.col("q") > 0))
        .select(
            "brand",
            F.col("q").alias("q2"),
            F.col("rev").alias("rev2"),
            F.expr("(1000 * rev) div q").alias("p2m"),
        )
    )
    return a.join(b, "brand").select(
        "brand",
        "q1",
        "q2",
        "rev1",
        "rev2",
        (F.col("rev2") - F.col("rev1")).alias("delta_cents"),
        F.expr("CAST(((p2m - p1m) * q2) div 1000 AS BIGINT)").alias(
            "price_eff_cents"
        ),
        F.expr("CAST((p1m * (q2 - q1)) div 1000 AS BIGINT)").alias(
            "volume_eff_cents"
        ),
        F.expr(
            "CAST(rev2 - rev1 - ((p2m - p1m) * q2) div 1000"
            " - (p1m * (q2 - q1)) div 1000 AS BIGINT)"
        ).alias("residual_cents"),
    )


# --------------------------------------------------------------------------
# 5. Content-defined chunk dedup
# --------------------------------------------------------------------------

CDC_MOD = 8
CDC_TOP = 20


@query(
    "dedup_cdc_chunks",
    oracle=f"""
WITH words AS (
  SELECT doc_id, CAST(i AS BIGINT) AS pos, ws[CAST(i AS INTEGER)] AS w
  FROM (SELECT doc_id, string_split(text, ' ') AS ws,
               unnest(range(1, len(string_split(text, ' ')) + 1)) AS i
        FROM documents)
),
flagged AS (
  SELECT doc_id, pos, w,
         CASE WHEN {_pt_sql('cdc#', 'w', CDC_MOD)} = 0 THEN 1 ELSE 0 END
           AS bnd
  FROM words
),
chunked AS (
  SELECT doc_id, pos, w,
         CAST(sum(bnd) OVER (PARTITION BY doc_id ORDER BY pos
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS cid
  FROM flagged
),
chunks AS MATERIALIZED (
  SELECT doc_id, cid,
         md5(string_agg(w, ' ' ORDER BY pos)) AS chash,
         CAST(count(*) AS BIGINT) AS n_words
  FROM chunked GROUP BY doc_id, cid
),
dups AS (
  SELECT chash, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
         CAST(count(*) AS BIGINT) AS n_occ,
         CAST(max(n_words) AS BIGINT) AS n_words
  FROM chunks GROUP BY chash
  HAVING count(*) >= 2
)
SELECT rk, chash, n_docs, n_occ, n_words FROM (
  SELECT *, CAST(row_number() OVER (ORDER BY n_occ DESC, chash) AS INT)
              AS rk
  FROM dups
) WHERE rk <= {CDC_TOP}
""",
)
def dedup_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking dedup — the backup-storage primitive
    (LBFS/Venti lineage) applied to documents: split each text at words
    whose keyed hash ≡ 0 mod {CDC_MOD} (boundaries depend only on LOCAL
    content, so an insertion early in a doc does NOT shift every later
    chunk the way fixed-size chunking does), hash each chunk, and
    report the top duplicated chunks across the corpus. This is how a
    100 TB blob/document store finds shared boilerplate at sub-document
    granularity — the storage-layer sibling of ``dedup_span_ngrams``
    (which needs every n-gram; CDC pays one chunk row per ~{CDC_MOD}
    words).

    Scale shape: boundary flags are pure map-side hashing; chunk
    assembly is one per-doc window + hash-agg (ordered listagg stays
    JVM-side); the duplicate report groups by chunk hash — shuffle
    keyed on content, exactly like exact dedup."""
    docs = load(spark, sf_dir, "documents")
    words = fan_out(docs).select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("p0", "w")
    ).select("doc_id", (F.col("p0") + 1).cast("long").alias("pos"), "w")
    flagged = words.withColumn(
        "bnd",
        F.when((_pt("cdc#", F.col("w")) % CDC_MOD) == 0, 1).otherwise(0),
    )
    chunked = flagged.withColumn(
        "cid",
        F.sum("bnd")
        .over(
            Window.partitionBy("doc_id")
            .orderBy("pos")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        .cast("long"),
    )
    chunked.createOrReplaceTempView("cdc_chunked")
    chunks = spark.sql(
        """
        SELECT doc_id, cid,
               md5(listagg(w, ' ') WITHIN GROUP (ORDER BY pos)) AS chash,
               CAST(count(*) AS BIGINT) AS n_words
        FROM cdc_chunked GROUP BY doc_id, cid
        """
    )
    dups = (
        chunks.groupBy("chash")
        .agg(
            F.countDistinct("doc_id").cast("long").alias("n_docs"),
            F.count("*").cast("long").alias("n_occ"),
            F.max("n_words").cast("long").alias("n_words"),
        )
        .filter(F.col("n_occ") >= 2)
    )
    return (
        dups.withColumn(
            "rk",
            F.row_number()
            .over(Window.orderBy(F.desc("n_occ"), "chash"))
            .cast("int"),
        )
        .filter(F.col("rk") <= CDC_TOP)
        .select("rk", "chash", "n_docs", "n_occ", "n_words")
    )


# --------------------------------------------------------------------------
# 6. ABC / XYZ segmentation
# --------------------------------------------------------------------------


@query(
    "agg_abc_xyz",
    oracle="""
WITH li AS (
  SELECT l_partkey, CAST(l_shipdate AS DATE) AS d,
         CAST(round(l_quantity) AS BIGINT) AS qty,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
  FROM lineitem
),
span AS (
  SELECT min(d) AS d0, CAST((max(d) - min(d)) // 7 + 1 AS BIGINT) AS nw
  FROM li
),
weekly AS (
  SELECT l_partkey, (d - (SELECT d0 FROM span)) // 7 AS wk,
         CAST(sum(qty) AS BIGINT) AS q
  FROM li GROUP BY 1, 2
),
per_part AS (
  SELECT w.l_partkey, CAST(sum(w.q) AS BIGINT) AS tq,
         CAST(sum(w.q * w.q) AS BIGINT) AS sq2
  FROM weekly w GROUP BY 1
),
rev AS (
  SELECT l_partkey, CAST(sum(cents) AS BIGINT) AS rev FROM li GROUP BY 1
),
ranked AS (
  SELECT r.l_partkey, r.rev,
         CAST(sum(r.rev) OVER (ORDER BY r.rev DESC, r.l_partkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS cum,
         (SELECT CAST(sum(rev) AS BIGINT) FROM rev) AS tot
  FROM rev r
),
cls AS (
  SELECT rk.l_partkey, rk.rev,
         CASE WHEN (1000000 * rk.cum) // rk.tot <= 700000 THEN 'A'
              WHEN (1000000 * rk.cum) // rk.tot <= 900000 THEN 'B'
              ELSE 'C' END AS abc,
         CASE
           WHEN ((SELECT nw FROM span) * pp.sq2 - pp.tq * pp.tq) * 1000000
                <= 250000 * pp.tq * pp.tq THEN 'X'
           WHEN ((SELECT nw FROM span) * pp.sq2 - pp.tq * pp.tq) * 1000000
                <= 1000000 * pp.tq * pp.tq THEN 'Y'
           ELSE 'Z' END AS xyz
  FROM ranked rk JOIN per_part pp ON rk.l_partkey = pp.l_partkey
)
SELECT abc, xyz, CAST(count(*) AS BIGINT) AS n_parts,
       CAST(sum(rev) AS BIGINT) AS rev_cents
FROM cls GROUP BY 1, 2
""",
)
def agg_abc_xyz(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC/XYZ segmentation of parts: ABC buckets by cumulative revenue
    share (A = the head through 70%, B through 90%, C the tail — Pareto
    operationalized), XYZ by demand variability (squared coefficient of
    variation of WEEKLY quantities including zero weeks, computed as
    W·Σq² − (Σq)² against thresholds cv² ≤ 0.25 / ≤ 1 — X is steady and
    forecastable, Z is erratic). The 9-cell grid is the standard
    planning matrix: AX = automate, CZ = don't bother. All comparisons
    are exact cross-multiplied integers; zero-week handling falls out of
    the closed form (missing weeks contribute only to W).

    Scale shape: facts collapse to per-part rows map-side; the one
    global cumulative window runs over the DIMENSION-sized part list
    (the same bounded-result justification as the top-k rankings), and
    the XYZ math is per-part scalar work."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.to_date("l_shipdate").alias("d"),
        F.round("l_quantity").cast("long").alias("qty"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
    )
    span = li.agg(
        F.min("d").alias("d0"),
        F.expr("CAST(datediff(max(d), min(d)) div 7 + 1 AS BIGINT)").alias("nw"),
    )
    lid = li.crossJoin(F.broadcast(span))
    weekly = lid.groupBy(
        "l_partkey", F.expr("datediff(d, d0) div 7").alias("wk")
    ).agg(F.sum("qty").cast("long").alias("q"))
    per_part = weekly.groupBy("l_partkey").agg(
        F.sum("q").cast("long").alias("tq"),
        F.sum(F.col("q") * F.col("q")).cast("long").alias("sq2"),
    )
    rev = li.groupBy("l_partkey").agg(F.sum("cents").cast("long").alias("rev"))
    tot = rev.agg(F.sum("rev").cast("long").alias("tot"))
    # r7: descending cumulative revenue via Fenwick prefix sums on the
    # negated revenue (count + revenue mass) + a tie-block window — no
    # global sort; within a tie block every rev is equal, so
    # cum = (mass of strictly-larger revenues) + rev·(tie position)
    b2 = rev.withColumn("_neg", -F.col("rev"))
    byv = b2.groupBy("_neg").agg(
        F.count(F.lit(1)).cast("long").alias("c"),
        F.sum("rev").cast("long").alias("sx"),
    )
    bel = cumulate(byv, "_neg", ("c", "sx")).select(
        "_neg", (F.col("cum_sx") - F.col("sx")).alias("sx_above")
    )
    j = F.row_number().over(Window.partitionBy("_neg").orderBy("l_partkey"))
    ranked = (
        b2.join(bel, "_neg")
        .withColumn("cum", (F.col("sx_above") + F.col("rev") * j).cast("long"))
        .drop("_neg", "sx_above")
        .crossJoin(F.broadcast(tot))
    )
    cls = (
        ranked.join(per_part, "l_partkey")
        .crossJoin(F.broadcast(span.select("nw")))
        .select(
            "rev",
            # DECIMAL(30,0) intermediates: 1e6 * cum overflows BIGINT once
            # total revenue cents passes ~9.2e12 (hit at sf1 — found by the
            # r9 scale run); div on decimals is exact and returns BIGINT
            F.expr(
                "CASE WHEN (CAST(cum AS DECIMAL(30,0)) * 1000000) div tot"
                " <= 700000 THEN 'A'"
                " WHEN (CAST(cum AS DECIMAL(30,0)) * 1000000) div tot"
                " <= 900000 THEN 'B'"
                " ELSE 'C' END"
            ).alias("abc"),
            F.expr(
                "CASE WHEN (CAST(nw AS DECIMAL(30,0)) * sq2"
                " - CAST(tq AS DECIMAL(30,0)) * tq) * 1000000"
                " <= 250000 * (CAST(tq AS DECIMAL(30,0)) * tq) THEN 'X'"
                " WHEN (CAST(nw AS DECIMAL(30,0)) * sq2"
                " - CAST(tq AS DECIMAL(30,0)) * tq) * 1000000"
                " <= 1000000 * (CAST(tq AS DECIMAL(30,0)) * tq)"
                " THEN 'Y' ELSE 'Z' END"
            ).alias("xyz"),
        )
    )
    return cls.groupBy("abc", "xyz").agg(
        F.count("*").cast("long").alias("n_parts"),
        F.sum("rev").cast("long").alias("rev_cents"),
    )
