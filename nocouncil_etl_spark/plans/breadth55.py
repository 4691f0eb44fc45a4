"""Breadth batch 55 (round 6): two-feature OLS, optimistic concurrency,
prefix autocomplete, trajectory unicity, cycle-time percentiles,
cumulative gains.

Six operators (reference scope: multivariate trend fits, safe
concurrent lake commits, serving-side type-ahead, how identifying a
"harmless" behavioral signature really is, order-to-ship operational
latency, and the model-targeting lift chart):

- ``ml_ols_two_features``   — closed-form 2-feature multiple regression
  from exact integer moments (Cramer's rule).
- ``io_optimistic_concurrency`` — two writers, version-checked commits:
  the loser detects the conflict, rebases, retries; nothing is lost.
- ``search_prefix_autocomplete`` — top-k completions per 1-3 char
  prefix by corpus frequency.
- ``privacy_trajectory_unicity`` — share of users uniquely identified
  by their top-2 (weekday, hour-band) activity cells.
- ``agg_cycle_time_percentiles`` — order→ship lag p50/p90/p99 per
  priority via the count-of-values cumulative technique.
- ``eval_cumulative_gains``  — decile gains/lift table of the
  Gaussian-NB purchase score.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nocouncil_etl_spark.io import fan_out, load
from nocouncil_etl_spark.operators.quantiles import cumulate
from nocouncil_etl_spark.registry import query

# --------------------------------------------------------------------------
# 1. Two-feature OLS by Cramer's rule
# --------------------------------------------------------------------------


@query(
    "ml_ols_two_features",
    oracle="""
WITH d AS (
  SELECT CAST(round(value * 100) AS BIGINT) AS y,
         CAST(hour(ts) AS BIGINT) AS x1,
         CAST((CAST(ts AS DATE) - DATE '1970-01-05') % 7 AS BIGINT) AS x2
  FROM events
),
m AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x1) AS BIGINT) AS s1, CAST(sum(x2) AS BIGINT) AS s2,
         CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x1 * x1) AS BIGINT) AS s11,
         CAST(sum(x2 * x2) AS BIGINT) AS s22,
         CAST(sum(x1 * x2) AS BIGINT) AS s12,
         CAST(sum(x1 * y) AS BIGINT) AS s1y,
         CAST(sum(x2 * y) AS BIGINT) AS s2y,
         CAST(sum(y * y) AS BIGINT) AS syy
  FROM d
),
a AS (
  SELECT n, s1, s2, sy,
         CAST(n AS DOUBLE) * s11 - CAST(s1 AS DOUBLE) * s1 AS a11,
         CAST(n AS DOUBLE) * s22 - CAST(s2 AS DOUBLE) * s2 AS a22,
         CAST(n AS DOUBLE) * s12 - CAST(s1 AS DOUBLE) * s2 AS a12,
         CAST(n AS DOUBLE) * s1y - CAST(s1 AS DOUBLE) * sy AS b1,
         CAST(n AS DOUBLE) * s2y - CAST(s2 AS DOUBLE) * sy AS b2,
         CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy AS tss
  FROM m
),
sol AS (
  SELECT *, a11 * a22 - a12 * a12 AS det FROM a
)
SELECT n,
       CAST(round(1000000 * (a22 * b1 - a12 * b2) / det) AS BIGINT)
         AS b1_micro,
       CAST(round(1000000 * (a11 * b2 - a12 * b1) / det) AS BIGINT)
         AS b2_micro,
       CAST(round(1000.0 * (sy - ((a22 * b1 - a12 * b2) / det) * s1
                          - ((a11 * b2 - a12 * b1) / det) * s2) / n)
            AS BIGINT) AS intercept_milli,
       CAST(round(1000000 * (((a22 * b1 - a12 * b2) / det) * b1
                           + ((a11 * b2 - a12 * b1) / det) * b2) / tss)
            AS BIGINT) AS r2_ppm
FROM sol WHERE det <> 0
""",
)
def ml_ols_two_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiple regression of event cents on (hour, weekday) — the
    2-feature normal equations solved in closed form by Cramer's rule
    on CENTERED cross-moments (A·b = B with A = n·ΣXX′ − ΣXΣX′). This
    extends ``agg_linear_regression`` (one feature) to the multivariate
    case without any gradient loop, and the R² = b′B/TSS falls out of
    the same moments. Every moment is an exact BIGINT from one scan;
    the 2×2 solve runs in double on those exact inputs with one
    rounding per coefficient (determinant products exceed int64, so
    the float step is structural, fixed-shape, and engine-identical).

    Scale shape: one map-side-combined hash-agg to a single moment row
    — the same pattern scales to k features as a k×k driver-side
    solve on a k²-sized aggregate."""
    ev = load(spark, sf_dir, "events")
    d = ev.select(
        F.round(F.col("value") * 100).cast("long").alias("y"),
        F.hour("ts").cast("long").alias("x1"),
        (F.datediff(F.to_date("ts"), F.lit("1970-01-05").cast("date")) % 7)
        .cast("long")
        .alias("x2"),
    )
    m = d.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x1").cast("long").alias("s1"),
        F.sum("x2").cast("long").alias("s2"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x1") * F.col("x1")).cast("long").alias("s11"),
        F.sum(F.col("x2") * F.col("x2")).cast("long").alias("s22"),
        F.sum(F.col("x1") * F.col("x2")).cast("long").alias("s12"),
        F.sum(F.col("x1") * F.col("y")).cast("long").alias("s1y"),
        F.sum(F.col("x2") * F.col("y")).cast("long").alias("s2y"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
    )
    a = m.select(
        "n",
        "s1",
        "s2",
        "sy",
        (F.col("n").cast("double") * F.col("s11") - F.col("s1").cast("double") * F.col("s1")).alias("a11"),
        (F.col("n").cast("double") * F.col("s22") - F.col("s2").cast("double") * F.col("s2")).alias("a22"),
        (F.col("n").cast("double") * F.col("s12") - F.col("s1").cast("double") * F.col("s2")).alias("a12"),
        (F.col("n").cast("double") * F.col("s1y") - F.col("s1").cast("double") * F.col("sy")).alias("b1"),
        (F.col("n").cast("double") * F.col("s2y") - F.col("s2").cast("double") * F.col("sy")).alias("b2"),
        (F.col("n").cast("double") * F.col("syy") - F.col("sy").cast("double") * F.col("sy")).alias("tss"),
    ).withColumn("det", F.expr("a11 * a22 - a12 * a12"))
    return a.filter(F.col("det") != 0).select(
        "n",
        F.round(1000000 * F.expr("(a22 * b1 - a12 * b2) / det"))
        .cast("long")
        .alias("b1_micro"),
        F.round(1000000 * F.expr("(a11 * b2 - a12 * b1) / det"))
        .cast("long")
        .alias("b2_micro"),
        F.round(
            F.expr(
                "1000.0 * (sy - ((a22 * b1 - a12 * b2) / det) * s1"
                " - ((a11 * b2 - a12 * b1) / det) * s2) / n"
            )
        )
        .cast("long")
        .alias("intercept_milli"),
        F.round(
            F.expr(
                "1000000 * (((a22 * b1 - a12 * b2) / det) * b1"
                " + ((a11 * b2 - a12 * b1) / det) * b2) / tss"
            )
        )
        .cast("long")
        .alias("r2_ppm"),
    )


# --------------------------------------------------------------------------
# 2. Optimistic concurrency control
# --------------------------------------------------------------------------


@query(
    "io_optimistic_concurrency",
    oracle="""
WITH src AS (
  SELECT event_type, CAST(ts AS DATE) AS d,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
)
SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(cents) AS BIGINT) AS cents,
       CAST(1 AS BIGINT) AS a_committed_version,
       CAST(1 AS BIGINT) AS b_first_attempt_conflict,
       CAST(2 AS BIGINT) AS b_committed_version
FROM src GROUP BY event_type
""",
)
def io_optimistic_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Optimistic concurrency control on a versioned table: the base
    snapshot is version 0; writer A (middle third of the horizon)
    prepares against v0 and commits v1 (its expected version matches —
    success); writer B (final third) ALSO prepared against v0, so its
    commit attempt sees current=1 ≠ expected=0 — the conflict every
    serious table format (Iceberg/Delta) detects via atomic
    version-file swaps — and must REBASE: re-read v1, reapply its
    delta, commit v2. The read-back totals reconcile with the full
    source, proving the conflict protocol lost nothing and applied
    nothing twice; the version trail (1, conflict, 2) rides along as
    columns. Last-writer-wins without the version check would have
    silently dropped A's rows.

    Scale shape: commits are metadata pointer swaps; the rebase re-
    applies only B's delta (never rewrites A's data); conflict
    detection is one integer compare."""
    ev = load(spark, sf_dir, "events")
    base = os.path.join(
        tempfile.gettempdir(),
        "nocouncil_etl_spark_scratch",
        f"occ_{os.path.basename(sf_dir.rstrip('/'))}",
    )
    span = ev.agg(
        F.min(F.to_date("ts")).alias("d0"), F.max(F.to_date("ts")).alias("d1")
    ).first()
    third = (
        spark.createDataFrame([(span.d0, span.d1)], "d0 DATE, d1 DATE")
        .select(F.expr("CAST(datediff(d1, d0) div 3 AS INT)").alias("t"))
        .first()
        .t
    )
    src = ev.select(
        "event_type",
        F.to_date("ts").alias("d"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    cut1 = F.date_add(F.lit(span.d0), third)
    cut2 = F.date_add(F.lit(span.d0), 2 * third)
    versions = {
        0: src.filter(F.col("d") < cut1),
        "a": src.filter((F.col("d") >= cut1) & (F.col("d") < cut2)),
        "b": src.filter(F.col("d") >= cut2),
    }
    v0 = os.path.join(base, "v0")
    v1 = os.path.join(base, "v1")
    v2 = os.path.join(base, "v2")
    versions[0].write.mode("overwrite").parquet(v0)
    current_version = 0
    # writer A: expected 0, current 0 -> commit v1 = v0 + delta_a
    a_expected = 0
    assert a_expected == current_version
    spark.read.parquet(v0).unionByName(versions["a"]).write.mode(
        "overwrite"
    ).parquet(v1)
    current_version = 1
    # writer B: prepared against 0, sees 1 -> conflict -> rebase on v1
    b_expected = 0
    b_conflict = 1 if b_expected != current_version else 0
    spark.read.parquet(v1).unionByName(versions["b"]).write.mode(
        "overwrite"
    ).parquet(v2)
    current_version = 2
    return (
        spark.read.parquet(v2)
        .groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("cents").cast("long").alias("cents"),
        )
        .select(
            "*",
            F.lit(1).cast("long").alias("a_committed_version"),
            F.lit(b_conflict).cast("long").alias("b_first_attempt_conflict"),
            F.lit(current_version).cast("long").alias("b_committed_version"),
        )
    )


# --------------------------------------------------------------------------
# 3. Prefix autocomplete
# --------------------------------------------------------------------------

AC_MAXPRE = 3
AC_TOPK = 3


@query(
    "search_prefix_autocomplete",
    oracle=f"""
WITH vocab AS (
  SELECT term, CAST(count(*) AS BIGINT) AS cf FROM (
    SELECT unnest(string_split(text, ' ')) AS term FROM documents
  ) GROUP BY term HAVING length(term) >= 2
),
pre AS (
  SELECT substring(term, 1, CAST(p AS INTEGER)) AS prefix, term, cf
  FROM (SELECT term, cf, unnest(range(1, {AC_MAXPRE} + 1)) AS p
        FROM vocab)
  WHERE p < length(term)
),
ranked AS (
  SELECT prefix, term, cf,
         CAST(row_number() OVER (PARTITION BY prefix
                                 ORDER BY cf DESC, term) AS BIGINT) AS rk,
         CAST(count(*) OVER (PARTITION BY prefix) AS BIGINT) AS n_terms
  FROM pre
)
SELECT prefix, CAST(rk AS BIGINT) AS rk, term, cf, n_terms
FROM ranked WHERE rk <= {AC_TOPK} AND n_terms >= 2
""",
)
def search_prefix_autocomplete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix autocomplete index: every 1-{AC_MAXPRE} character prefix
    maps to its top-{AC_TOPK} completions by corpus frequency (only
    prefixes with a real choice — ≥2 completions — emitted). This is
    the materialized type-ahead table a search box serves from — the
    serving-side sibling of ``search_symspell_correct`` (that handles
    typos, this handles partial input), and at scale the precomputed
    (prefix → top-k) table IS the index: lookups are point reads, the
    expensive ranking is this one batch job.

    Scale shape: the prefix explode is ≤{AC_MAXPRE} rows per vocab
    entry (vocabulary-sized, not corpus-sized); top-k is a bounded
    per-prefix window."""
    docs = fan_out(load(spark, sf_dir, "documents"))
    vocab = (
        docs.select(F.explode(F.split("text", " ")).alias("term"))
        .groupBy("term")
        .agg(F.count("*").cast("long").alias("cf"))
        .filter(F.length("term") >= 2)
    )
    pre = (
        vocab.select(
            "term", "cf", F.explode(F.sequence(F.lit(1), F.lit(AC_MAXPRE))).alias("p")
        )
        .filter(F.col("p") < F.length("term"))
        .select(
            F.expr("substring(term, 1, CAST(p AS INT))").alias("prefix"),
            "term",
            "cf",
        )
    )
    wp = Window.partitionBy("prefix")
    ranked = pre.select(
        "prefix",
        "term",
        "cf",
        F.row_number()
        .over(wp.orderBy(F.desc("cf"), "term"))
        .cast("long")
        .alias("rk"),
        F.count("*").over(wp).cast("long").alias("n_terms"),
    )
    return ranked.filter(
        (F.col("rk") <= AC_TOPK) & (F.col("n_terms") >= 2)
    ).select("prefix", "rk", "term", "cf", "n_terms")


# --------------------------------------------------------------------------
# 4. Trajectory unicity
# --------------------------------------------------------------------------


@query(
    "privacy_trajectory_unicity",
    oracle="""
WITH cells AS (
  SELECT user_id,
         CAST((CAST(ts AS DATE) - DATE '1970-01-05') % 7 AS BIGINT) AS dw,
         CAST(hour(ts) // 6 AS BIGINT) AS hb,
         CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2, 3
),
top2 AS (
  SELECT user_id, dw, hb FROM (
    SELECT *, row_number() OVER (PARTITION BY user_id
                                 ORDER BY c DESC, dw, hb) AS rk
    FROM cells
  ) WHERE rk <= 2
),
sig AS (
  SELECT user_id,
         string_agg(CAST(dw AS VARCHAR) || ':' || CAST(hb AS VARCHAR), '|'
                    ORDER BY dw, hb) AS s
  FROM top2 GROUP BY user_id
),
mult AS (
  SELECT s, CAST(count(*) AS BIGINT) AS k FROM sig GROUP BY s
),
cls AS (
  SELECT CASE WHEN k = 1 THEN '1-unique'
              WHEN k = 2 THEN '2'
              ELSE '3+' END AS anonymity,
         CAST(sum(k) AS BIGINT) AS n_users
  FROM mult GROUP BY 1
),
tot AS (SELECT CAST(sum(n_users) AS BIGINT) AS n FROM cls)
SELECT c.anonymity, c.n_users,
       CAST((c.n_users * 1000000) // t.n AS BIGINT) AS share_ppm
FROM cls c, tot t
""",
)
def privacy_trajectory_unicity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trajectory unicity (de Montjoye et al. 2013, 'Unique in the
    Crowd'): how many users are UNIQUELY identified by just their two
    most-active (weekday × 6-hour-band) cells — the famous result that
    four spatiotemporal points identify 95% of people, run on the
    behavioral grid this dataset has. The anonymity histogram (unique /
    pair / 3+) is the k-anonymity spectrum of the signature, which is
    what makes this the THREAT-MODEL companion to
    ``privacy_k_anonymity`` (that audits a release's quasi-identifiers;
    this shows how identifying an innocuous-looking derived signature
    already is — motivating the generalization ladder of
    ``privacy_generalize_to_k``).

    Scale shape: cell counts collapse map-side; top-2 is a bounded
    per-user window; signature multiplicity is one hash-agg on short
    strings."""
    ev = load(spark, sf_dir, "events")
    cells = ev.groupBy(
        "user_id",
        (F.datediff(F.to_date("ts"), F.lit("1970-01-05").cast("date")) % 7)
        .cast("long")
        .alias("dw"),
        F.expr("CAST(hour(ts) div 6 AS BIGINT)").alias("hb"),
    ).agg(F.count("*").cast("long").alias("c"))
    top2 = (
        cells.withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("user_id").orderBy(F.desc("c"), "dw", "hb")
            ),
        )
        .filter(F.col("rk") <= 2)
    )
    top2.createOrReplaceTempView("unicity_top2")
    sig = top2.sparkSession.sql(
        """
        SELECT user_id,
               listagg(concat(CAST(dw AS STRING), ':', CAST(hb AS STRING)),
                       '|') WITHIN GROUP (ORDER BY dw, hb) AS s
        FROM unicity_top2 GROUP BY user_id
        """
    )
    mult = sig.groupBy("s").agg(F.count("*").cast("long").alias("k"))
    cls = mult.groupBy(
        F.when(F.col("k") == 1, "1-unique")
        .when(F.col("k") == 2, "2")
        .otherwise("3+")
        .alias("anonymity")
    ).agg(F.sum("k").cast("long").alias("n_users"))
    tot = cls.agg(F.sum("n_users").cast("long").alias("n"))
    return cls.crossJoin(F.broadcast(tot)).select(
        "anonymity",
        "n_users",
        F.expr("CAST((n_users * 1000000) div n AS BIGINT)").alias("share_ppm"),
    )


# --------------------------------------------------------------------------
# 5. Cycle-time percentiles
# --------------------------------------------------------------------------


@query(
    "agg_cycle_time_percentiles",
    oracle="""
WITH lag_ AS (
  SELECT o.o_orderpriority AS priority,
         CAST(CAST(l.l_shipdate AS DATE) - CAST(o.o_orderdate AS DATE)
              AS BIGINT) AS lag_days
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
),
byv AS (
  SELECT priority, lag_days, CAST(count(*) AS BIGINT) AS c
  FROM lag_ GROUP BY 1, 2
),
cum AS (
  SELECT priority, lag_days, c,
         CAST(sum(c) OVER (PARTITION BY priority ORDER BY lag_days) AS BIGINT)
           AS cumc,
         CAST(sum(c) OVER (PARTITION BY priority) AS BIGINT) AS n,
         CAST(sum(c * lag_days) OVER (PARTITION BY priority) AS BIGINT) AS s
  FROM byv
)
SELECT priority, max(n) AS n,
       CAST((1000 * max(s)) // max(n) AS BIGINT) AS mean_milli,
       CAST(min(CASE WHEN cumc * 100 >= 50 * n THEN lag_days END) AS BIGINT)
         AS p50,
       CAST(min(CASE WHEN cumc * 100 >= 90 * n THEN lag_days END) AS BIGINT)
         AS p90,
       CAST(min(CASE WHEN cumc * 100 >= 99 * n THEN lag_days END) AS BIGINT)
         AS p99
FROM cum GROUP BY priority
""",
)
def agg_cycle_time_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order→ship cycle time per order priority: exact nearest-rank
    p50/p90/p99 and the milli mean of the shipping lag in days — the
    operational-latency SLO table (does URGENT actually ship faster?),
    computed with the count-of-values cumulative technique: percentiles
    come from the BOUNDED (priority, lag_days) distinct table, never a
    per-row sort — the documented 100 TB path that the raw-window
    percentile queries (``agg_percentile_exact_rank``) name as their
    scale alternative, here as the primary implementation.

    Scale shape: one fact-fact equi-join (co-partitioned on orderkey),
    one hash-agg to the value histogram, windows over that tiny
    frame."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    lag_ = li.join(o, li.l_orderkey == o.o_orderkey).select(
        F.col("o_orderpriority").alias("priority"),
        F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate"))
        .cast("long")
        .alias("lag_days"),
    )
    byv = lag_.groupBy("priority", "lag_days").agg(
        F.count("*").cast("long").alias("c")
    )
    wp = Window.partitionBy("priority")
    cum = byv.select(
        "priority",
        "lag_days",
        F.sum("c")
        .over(wp.orderBy("lag_days").rowsBetween(Window.unboundedPreceding, 0))
        .cast("long")
        .alias("cumc"),
        F.sum("c").over(wp).cast("long").alias("n"),
        F.sum(F.col("c") * F.col("lag_days")).over(wp).cast("long").alias("s"),
    )
    return cum.groupBy("priority").agg(
        F.max("n").alias("n"),
        F.expr("CAST((1000 * max(s)) div max(n) AS BIGINT)").alias("mean_milli"),
        F.min(F.when(F.col("cumc") * 100 >= 50 * F.col("n"), F.col("lag_days")))
        .cast("long")
        .alias("p50"),
        F.min(F.when(F.col("cumc") * 100 >= 90 * F.col("n"), F.col("lag_days")))
        .cast("long")
        .alias("p90"),
        F.min(F.when(F.col("cumc") * 100 >= 99 * F.col("n"), F.col("lag_days")))
        .cast("long")
        .alias("p99"),
    )


# --------------------------------------------------------------------------
# 6. Cumulative gains / lift table
# --------------------------------------------------------------------------


@query(
    "eval_cumulative_gains",
    oracle="""
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
  SELECT y, CAST(sv AS DOUBLE) / n AS mv,
         (CAST(n AS DOUBLE) * svv - CAST(sv AS DOUBLE) * sv)
           / (CAST(n AS DOUBLE) * n) + 0.5 AS vv,
         CAST(sh AS DOUBLE) / n AS mh,
         (CAST(n AS DOUBLE) * shh - CAST(sh AS DOUBLE) * sh)
           / (CAST(n AS DOUBLE) * n) + 0.5 AS vh,
         ln(CAST(n AS DOUBLE) / (SELECT nn FROM tot)) AS prior
  FROM cls
),
scored AS (
  SELECT d.event_id, d.y,
         (SELECT prior - 0.5 * ln(vv) - (d.v - mv) * (d.v - mv) / (2 * vv)
                 - 0.5 * ln(vh) - (d.hr - mh) * (d.hr - mh) / (2 * vh)
          FROM mom WHERE y = 1)
         - (SELECT prior - 0.5 * ln(vv) - (d.v - mv) * (d.v - mv) / (2 * vv)
                   - 0.5 * ln(vh) - (d.hr - mh) * (d.hr - mh) / (2 * vh)
            FROM mom WHERE y = 0) AS s
  FROM data d
),
dec AS (
  SELECT y, CAST(ntile(10) OVER (ORDER BY s DESC, event_id) AS BIGINT) AS d
  FROM scored
),
per AS (
  SELECT d, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(y) AS BIGINT) AS n_pos
  FROM dec GROUP BY d
),
tp AS (SELECT CAST(sum(n_pos) AS BIGINT) AS pos, CAST(sum(n) AS BIGINT) AS nn
       FROM per)
SELECT p.d AS decile, p.n, p.n_pos,
       CAST((sum(p.n_pos) OVER (ORDER BY p.d) * 1000000) // t.pos AS BIGINT)
         AS cum_capture_ppm,
       CAST((p.n_pos * t.nn * 1000) // (p.n * t.pos) AS BIGINT)
         AS lift_milli
FROM per p, tp t
""",
)
def eval_cumulative_gains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative gains / lift table of the Gaussian-NB purchase score:
    rank everything by score, cut into deciles, and report each
    decile's positive count, the CUMULATIVE share of all positives
    captured, and the decile lift vs. random targeting — the chart a
    campaign-targeting review reads ("the top 20% of scores captures
    X% of buyers"). ``eval_roc_auc`` summarizes ranking skill in one
    number and ``eval_calibration_bins`` checks probability honesty;
    gains answer the operational budget question. Scores are doubles
    from exact moments; every reported number is an integer count or
    one floor division.

    Scale shape (r7): scoring is one broadcast-model pass; the decile
    cut is Fenwick prefix counts over the quantized-score histogram +
    bucket-partitioned tie windows + closed-form ntile arithmetic — no
    global sort; the table is 10 rows."""
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
    scored = (
        data.crossJoin(F.broadcast(m1))
        .crossJoin(F.broadcast(m0))
        .select(
            "event_id",
            "y",
            F.expr(
                "(pr1 - 0.5 * ln(vv1) - (v - mv1) * (v - mv1) / (2 * vv1)"
                " - 0.5 * ln(vh1) - (hr - mh1) * (hr - mh1) / (2 * vh1))"
                " - (pr0 - 0.5 * ln(vv0) - (v - mv0) * (v - mv0) / (2 * vv0)"
                " - 0.5 * ln(vh0) - (hr - mh0) * (hr - mh0) / (2 * vh0))"
            ).alias("s"),
        )
    )
    # r7: ntile without a global sort — bucket rows by a weakly-monotone
    # integer quantization of the score (micro units), get "#rows in
    # strictly-better buckets" from Fenwick prefix sums, and finish the
    # exact (s DESC, event_id) order with a bucket-partitioned window;
    # the decile is then pure arithmetic on the global rank (Spark ntile
    # semantics: the first n % 10 buckets hold ceil(n/10) rows).
    q = scored.withColumn("q", F.round(F.col("s") * 1_000_000).cast("long"))
    byq = q.groupBy("q").agg(F.count(F.lit(1)).cast("long").alias("c"))
    nrow = byq.agg(F.sum("c").cast("long").alias("n"))
    above = (
        cumulate(byq, "q", ("c",))
        .crossJoin(F.broadcast(nrow))
        .select("q", (F.col("n") - F.col("cum_c")).alias("above"), "n")
    )
    jb = F.row_number().over(
        Window.partitionBy("q").orderBy(F.desc("s"), "event_id")
    )
    rked = q.join(above, "q").select(
        "y", (F.col("above") + jb).cast("long").alias("r"), "n"
    )
    big = F.expr("n div 10 + 1")  # rows per bucket in the first n%10 buckets
    small = F.expr("n div 10")
    cut = F.expr("(n % 10) * (n div 10 + 1)")  # rows covered by big buckets
    dec = rked.select(
        "y",
        F.when(F.col("r") <= cut, F.ceil(F.col("r") / big))
        .otherwise(F.expr("n % 10") + F.ceil((F.col("r") - cut) / small))
        .cast("long")
        .alias("d"),
    )
    per = dec.groupBy("d").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("y").cast("long").alias("n_pos"),
    )
    tp = per.agg(
        F.sum("n_pos").cast("long").alias("pos"),
        F.sum("n").cast("long").alias("nn2"),
    )
    wc = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    return per.crossJoin(F.broadcast(tp)).select(
        F.col("d").alias("decile"),
        "n",
        "n_pos",
        F.expr(
            "CAST((sum(n_pos) OVER (ORDER BY d"
            " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
            " * 1000000) div pos AS BIGINT)"
        ).alias("cum_capture_ppm"),
        F.expr("CAST((n_pos * nn2 * 1000) div (n * pos) AS BIGINT)").alias(
            "lift_milli"
        ),
    )
