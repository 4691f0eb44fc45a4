"""Breadth batch 4: time-range window frames and blocked fuzzy matching.

- ``window_range_time_sum`` — a true RANGE frame over event time (trailing
  10 minutes), as opposed to the ROWS frames elsewhere: the frame is defined
  by a time interval, so bursty series get wide frames and sparse series
  narrow ones. Both engines order by epoch-µs BIGINT so the range arithmetic
  is integer-identical.
- ``join_fuzzy_dedup`` — edit-distance near-duplicate pairing with blocking:
  candidates must share (lang, 4-char prefix, length bucket) before the
  Levenshtein kernel runs — the classic entity-resolution shape that keeps
  the quadratic inside blocks. Typo'd copies are synthesized (one character
  overwritten) so the matcher provably fires.
- ``agg_correlation`` — Pearson correlation from decimal-exact co-moments
  (built-in corr() folds floats in engine-specific order and drifts).
- ``window_rolling_median`` — rolling 21-row exact median per series, the
  robust smoother next to window_moving_avg.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nocouncil_etl_spark.io import load
from nocouncil_etl_spark.registry import query

RANGE_US = 600_000_000  # 10 minutes
LEV_MAX = 3
PREFIX = 40


@query(
    "window_range_time_sum",
    oracle=f"""
SELECT event_id, user_id,
       count(*) OVER w AS frame_n,
       CAST(round(sum(CAST(value AS DECIMAL(18,6))) OVER w, 2) AS DOUBLE) AS trail_sum
FROM (SELECT event_id, user_id, value, epoch_us(ts) AS tus FROM events)
WINDOW w AS (PARTITION BY user_id ORDER BY tus
             RANGE BETWEEN {RANGE_US} PRECEDING AND CURRENT ROW)
""",
)
def window_range_time_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-10-minute per-user sum as a RANGE window frame over epoch-µs:
    the frame width is a time interval, not a row count — the semantics a
    rate limiter or sliding SLA monitor needs. Equal-timestamp peers are in
    the same frame by RANGE definition, identically in both engines; the
    frame sum is decimal-exact so engine-internal combine order can't move
    the rounded value.

    Scale shape: one user_id shuffle + an ordered scan per partition; RANGE
    frames evaluate incrementally over the sorted run."""
    ev = load(spark, sf_dir, "events").select(
        "event_id", "user_id", "value", F.unix_micros("ts").alias("tus")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("tus")
        .rangeBetween(-RANGE_US, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(w).alias("frame_n"),
        F.round(F.sum(F.col("value").cast("decimal(18,6)")).over(w), 2)
        .cast("double")
        .alias("trail_sum"),
    )


_FUZZY_AUG = """
SELECT doc_id, lang, n_chars, text FROM documents
UNION ALL
SELECT doc_id + 300000, lang, n_chars,
       substr(text, 1, 5) || 'X' || substr(text, 7) AS text
FROM documents WHERE doc_id % 10 = 0
UNION ALL
SELECT doc_id + 600000, lang, n_chars,
       'X' || substr(text, 2) AS text
FROM documents WHERE doc_id % 10 = 5
"""

_FUZZY_LEV = f"levenshtein(substr(a.text, 1, {PREFIX}), substr(b.text, 1, {PREFIX}))"


def _fuzzy_pass_sql(key: str) -> str:
    return f"""
SELECT a.doc_id AS id_a, b.doc_id AS id_b, {_FUZZY_LEV} AS lev
FROM keyed a
JOIN keyed b
  ON a.lang = b.lang AND a.{key} = b.{key} AND a.lb = b.lb
     AND a.doc_id < b.doc_id
WHERE {_FUZZY_LEV} <= {LEV_MAX}"""


@query(
    "join_fuzzy_dedup",
    oracle=f"""
WITH aug AS ({_FUZZY_AUG}),
keyed AS (
  SELECT doc_id, lang, text,
         substr(text, 1, 4) AS pfx, substr(text, 5, 4) AS pfx2,
         n_chars // 8 AS lb
  FROM aug
)
{_fuzzy_pass_sql("pfx")}
UNION
{_fuzzy_pass_sql("pfx2")}
""",
)
def join_fuzzy_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy near-duplicate pairing with TWO blocking passes:
    candidates share language and an 8-char length bucket plus either the
    first 4-gram (chars 1-4) or the second 4-gram (chars 5-8); pairs from
    both passes union (dedup'd) before a 40-char-prefix Levenshtein ≤
    {LEV_MAX} confirms. A single-character substitution damages at most one
    of the two 4-grams, so EVERY one-char-substitution copy is reachable —
    the single-prefix round-4 version missed edits in the first 4 chars
    (the standard multi-pass blocking discipline fixes exactly this).
    Planted copies prove both passes: a position-6 overwrite (caught by
    pass 1) and a position-1 overwrite (caught only by pass 2).

    Scale shape: each blocking key turns the all-pairs comparison into an
    equi-join; Levenshtein (quadratic per pair) runs only inside blocks;
    the union dedups on (id_a, id_b, lev) — two shuffles of candidate
    pairs, never doc×doc. Both engines' levenshtein is plain edit distance,
    so the kernel is integer-portable."""
    docs = load(spark, sf_dir, "documents")
    copies_mid = docs.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 300000).alias("doc_id"),
        "lang",
        "n_chars",
        F.concat(
            F.substring("text", 1, 5), F.lit("X"), F.expr("substr(text, 7)")
        ).alias("text"),
    )
    copies_head = docs.filter(F.col("doc_id") % 10 == 5).select(
        (F.col("doc_id") + 600000).alias("doc_id"),
        "lang",
        "n_chars",
        F.concat(F.lit("X"), F.expr("substr(text, 2)")).alias("text"),
    )
    aug = (
        docs.select("doc_id", "lang", "n_chars", "text")
        .unionByName(copies_mid)
        .unionByName(copies_head)
    )
    keyed = aug.select(
        "doc_id",
        "lang",
        "text",
        F.substring("text", 1, 4).alias("pfx"),
        F.substring("text", 5, 4).alias("pfx2"),
        F.expr("n_chars div 8").alias("lb"),
    )
    lev = F.levenshtein(F.substring("ta", 1, PREFIX), F.substring("tb", 1, PREFIX))

    def block_pass(key: str) -> DataFrame:
        a = keyed.select(
            F.col("doc_id").alias("id_a"), "lang", F.col(key).alias("k"),
            "lb", F.col("text").alias("ta"),
        )
        b = keyed.select(
            F.col("doc_id").alias("id_b"), F.col("lang").alias("lang_b"),
            F.col(key).alias("k_b"), F.col("lb").alias("lb_b"),
            F.col("text").alias("tb"),
        )
        return (
            a.join(
                b,
                (F.col("lang") == F.col("lang_b"))
                & (F.col("k") == F.col("k_b"))
                & (F.col("lb") == F.col("lb_b"))
                & (F.col("id_a") < F.col("id_b")),
            )
            .select("id_a", "id_b", lev.alias("lev"))
            .filter(F.col("lev") <= LEV_MAX)
        )

    return block_pass("pfx").unionByName(block_pass("pfx2")).distinct()

@query(
    "agg_correlation",
    oracle="""
WITH c AS (
  SELECT event_type, value,
         (epoch_us(ts) - 1704067200000000) / 1000000 AS tsec
  FROM events
),
m AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sx,
         CAST(sum(CAST(tsec AS DECIMAL(18,6))) AS DOUBLE) AS sy,
         CAST(sum(CAST(value * value AS DECIMAL(18,6))) AS DOUBLE) AS sxx,
         CAST(sum(CAST(tsec * tsec AS DECIMAL(24,6))) AS DOUBLE) AS syy,
         CAST(sum(CAST(value * tsec AS DECIMAL(24,6))) AS DOUBLE) AS sxy
  FROM c GROUP BY event_type
)
SELECT event_type, n,
       round((n * sxy - sx * sy)
             / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 6) AS corr_value_time
FROM m
""",
)
def agg_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation between event value and event time per type,
    computed from decimal-exact co-moments (n, Σx, Σy, Σx², Σy², Σxy) so the
    closed form divides identical doubles on both engines — built-in corr()
    would fold floats in engine-specific order and drift at the 1e-15 level,
    which a value-hash notices. Time is seconds since 2024-01-01 — Pearson
    is translation-invariant, and centering keeps t² inside the decimal
    grid (raw epoch² overflows DECIMAL(24,6)).

    Scale shape: one hash agg with map-side combine; six decimal
    accumulators per group."""
    ev = load(spark, sf_dir, "events")
    x = F.col("value")
    y = (F.unix_micros("ts") - F.lit(1704067200000000)) / F.lit(1000000)
    m = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x.cast("decimal(18,6)")).cast("double").alias("sx"),
        F.sum(y.cast("decimal(18,6)")).cast("double").alias("sy"),
        F.sum((x * x).cast("decimal(18,6)")).cast("double").alias("sxx"),
        F.sum((y * y).cast("decimal(24,6)")).cast("double").alias("syy"),
        F.sum((x * y).cast("decimal(24,6)")).cast("double").alias("sxy"),
    )
    n = F.col("n")
    corr = (n * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.sqrt(n * F.col("sxx") - F.col("sx") * F.col("sx"))
        * F.sqrt(n * F.col("syy") - F.col("sy") * F.col("sy"))
    )
    return m.select("event_type", "n", F.round(corr, 6).alias("corr_value_time"))


@query(
    "window_rolling_median",
    oracle="""
SELECT event_id, user_id,
       round(quantile_cont(round(value, 2), 0.5) OVER w, 4) AS med21
FROM (SELECT event_id, user_id, value, ts FROM events)
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 20 PRECEDING AND CURRENT ROW)
""",
)
def window_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 21-row median per series — the robust (outlier-immune)
    smoother a metrics pipeline pairs with the moving average. Inputs are
    pre-rounded to the 2dp money grid so the linear interpolation between
    the two middle order statistics divides identical doubles on both
    engines (Spark percentile ≡ DuckDB quantile_cont, both type-7).

    Scale shape: one user_id shuffle; the ROWS frame re-ranks only the
    21-row window per step."""
    ev = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-20, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.round(F.percentile(F.round("value", 2), F.lit(0.5)).over(w), 4).alias("med21"),
    )


DEBOUNCE_US = 300_000_000  # 5 minutes


@query(
    "dedup_debounce",
    oracle=f"""
WITH g AS (
  SELECT event_id, user_id, event_type, ts,
         CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER (
                PARTITION BY user_id, event_type ORDER BY ts, event_id))
              < {DEBOUNCE_US} THEN 0 ELSE 1 END AS is_start
  FROM events
),
isl AS (
  SELECT event_id, user_id, event_type, ts,
         CAST(sum(is_start) OVER (
           PARTITION BY user_id, event_type ORDER BY ts, event_id
         ) AS BIGINT) AS island
  FROM g
)
SELECT user_id, event_type, island,
       min(event_id) AS kept_event_id,
       epoch_us(min(ts)) AS first_us,
       count(*) AS n_collapsed
FROM isl
GROUP BY user_id, event_type, island
""",
)
def dedup_debounce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Debounce dedup: bursts of same-key events closer than 5 minutes
    collapse to their first occurrence (gaps-and-islands: lag() marks island
    starts, a running sum numbers islands, one agg keeps the head) — the
    ingest-side "drop retry storms / double-clicks" operator, the windowed
    sibling of dedup_exact. NULL lag (first event per key) starts an island
    by the CASE's ELSE arm, identically in both engines.

    Scale shape: one (user, type) shuffle shared by both windows and the
    final agg; the island id is a BIGINT running sum (HUGEINT digest rule)."""
    ev = load(spark, sf_dir, "events")
    wk = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    gap_us = F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(wk))
    is_start = F.when(gap_us < DEBOUNCE_US, F.lit(0)).otherwise(F.lit(1))
    isl = ev.select(
        "event_id",
        "user_id",
        "event_type",
        "ts",
        F.sum(is_start).over(wk).alias("island"),
    )
    return isl.groupBy("user_id", "event_type", "island").agg(
        F.min("event_id").alias("kept_event_id"),
        F.unix_micros(F.min("ts")).alias("first_us"),
        F.count("*").alias("n_collapsed"),
    )


@query(
    "dq_validation_report",
    oracle="""
SELECT 'orders_custkey_fk' AS check_name,
       (SELECT count(*) FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
        WHERE c.c_custkey IS NULL) AS n_violations,
       (SELECT count(*) FROM orders) AS n_rows
UNION ALL
SELECT 'lineitem_qty_range',
       (SELECT count(*) FROM lineitem WHERE l_quantity < 0 OR l_quantity > 100),
       (SELECT count(*) FROM lineitem)
UNION ALL
SELECT 'events_type_domain',
       (SELECT count(*) FROM events
        WHERE event_type NOT IN ('view','click','purchase','signup','error')),
       (SELECT count(*) FROM events)
UNION ALL
SELECT 'documents_nchars_consistent',
       (SELECT count(*) FROM documents WHERE n_chars <> len(text)),
       (SELECT count(*) FROM documents)
UNION ALL
SELECT 'events_id_unique',
       (SELECT CAST(coalesce(sum(n - 1), 0) AS BIGINT) FROM
         (SELECT count(*) AS n FROM events GROUP BY event_id) WHERE n > 1),
       (SELECT count(*) FROM events)
""",
)
def dq_validation_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality gate (the dbt-tests / Deequ shape): one row per
    constraint with its violation count — FK integrity (orders→customer via
    anti-join), numeric range, categorical domain, derived-column
    consistency (n_chars == len(text)), and key uniqueness. A pipeline
    promotes a batch only when every n_violations is 0 (or a tracked
    baseline); the report IS the contract.

    Scale shape: each check is an independent scan/agg (FK check is one
    anti-join); Spark runs them as separate jobs unioned at the end —
    embarrassingly parallel across checks, each check linear."""
    from nocouncil_etl_spark.io import load as _load

    orders = _load(spark, sf_dir, "orders")
    customer = _load(spark, sf_dir, "customer")
    lineitem = _load(spark, sf_dir, "lineitem")
    events = _load(spark, sf_dir, "events")
    documents = _load(spark, sf_dir, "documents")

    def report(name: str, violations, total) -> DataFrame:
        return violations.crossJoin(total).select(
            F.lit(name).alias("check_name"), "n_violations", "n_rows"
        )

    fk = report(
        "orders_custkey_fk",
        orders.join(
            customer, orders["o_custkey"] == customer["c_custkey"], "left_anti"
        ).agg(F.count("*").alias("n_violations")),
        orders.agg(F.count("*").alias("n_rows")),
    )
    rng = report(
        "lineitem_qty_range",
        lineitem.filter((F.col("l_quantity") < 0) | (F.col("l_quantity") > 100)).agg(
            F.count("*").alias("n_violations")
        ),
        lineitem.agg(F.count("*").alias("n_rows")),
    )
    dom = report(
        "events_type_domain",
        events.filter(
            ~F.col("event_type").isin("view", "click", "purchase", "signup", "error")
        ).agg(F.count("*").alias("n_violations")),
        events.agg(F.count("*").alias("n_rows")),
    )
    cons = report(
        "documents_nchars_consistent",
        documents.filter(F.col("n_chars") != F.length("text")).agg(
            F.count("*").alias("n_violations")
        ),
        documents.agg(F.count("*").alias("n_rows")),
    )
    uniq = report(
        "events_id_unique",
        events.groupBy("event_id")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") > 1)
        # coalesce: an empty violation set (the healthy case) must report 0,
        # not NULL — a promotion gate checks n_violations = 0
        .agg(F.coalesce(F.sum(F.col("n") - 1), F.lit(0)).alias("n_violations")),
        events.agg(F.count("*").alias("n_rows")),
    )
    return fk.unionByName(rng).unionByName(dom).unionByName(cons).unionByName(uniq)


@query(
    "agg_value_histogram",
    oracle="""
SELECT event_type,
       CASE WHEN round(value, 2) < 0 THEN 0
            WHEN round(value, 2) >= 200 THEN 21
            ELSE CAST(floor(round(value, 2) / 10.0) AS INT) + 1 END AS bin,
       count(*) AS n
FROM events
GROUP BY 1, 2
""",
)
def agg_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram per event type: 20 bins of width 10 over
    [0,200), underflow bin 0, overflow bin 21 (width_bucket semantics,
    spelled as explicit floor arithmetic because the binning math must be
    the SAME expression in both engines — DuckDB has no width_bucket, and
    engine-internal bucket functions may disagree at edges). Inputs snap to
    the 2dp money grid first.

    Scale shape: a narrow codegen'd expression + one hash agg with map-side
    combine; output is bounded by types × 22 bins regardless of data size."""
    ev = load(spark, sf_dir, "events")
    v = F.round("value", 2)
    bin_ = (
        F.when(v < 0, F.lit(0))
        .when(v >= 200, F.lit(21))
        .otherwise(F.floor(v / 10.0).cast("int") + 1)
    )
    return (
        ev.select("event_type", bin_.alias("bin"))
        .groupBy("event_type", "bin")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "agg_share_of_total",
    oracle="""
WITH s AS (
  SELECT event_type,
         CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS type_total
  FROM events GROUP BY event_type
)
SELECT event_type,
       round(type_total, 2) AS type_total,
       round(type_total / sum(type_total) OVER (), 6) AS share
FROM s
""",
)
def agg_share_of_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contribution analysis: each type's share of the global value total via
    an unpartitioned window over the (tiny) aggregate — the grand total is
    computed from the per-group decimal-exact sums, so numerator and
    denominator are identical doubles on both engines.

    Scale shape: the corpus-sized work is one hash agg; the window runs over
    |event_type| rows, not data."""
    ev = load(spark, sf_dir, "events")
    s = ev.groupBy("event_type").agg(
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("type_total")
    )
    w = Window.partitionBy()
    return s.select(
        "event_type",
        F.round("type_total", 2).alias("type_total"),
        F.round(F.col("type_total") / F.sum("type_total").over(w), 6).alias("share"),
    )


@query(
    "agg_mode_per_group",
    oracle="""
SELECT user_id, event_type AS mode_type, n FROM (
  SELECT user_id, event_type, count(*) AS n,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY count(*) DESC, event_type) AS rk
  FROM events GROUP BY user_id, event_type
) WHERE rk = 1
""",
)
def agg_mode_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mode (most frequent value) per group with a deterministic tie-break
    on the value itself — engine-native mode() functions break ties
    arbitrarily, which a value-hash can't tolerate, so the portable spelling
    is count + rank.

    Scale shape: one hash agg with map-side combine, then a window over the
    already-aggregated (group, value) pairs — never over raw rows."""
    ev = load(spark, sf_dir, "events")
    c = ev.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("user_id").orderBy(F.desc("n"), F.asc("event_type"))
    return (
        c.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("user_id", F.col("event_type").alias("mode_type"), "n")
    )


@query(
    "window_pct_change",
    oracle="""
WITH d AS (
  SELECT event_type, date_trunc('day', ts) AS day,
         CAST(round(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS day_total
  FROM events GROUP BY 1, 2
)
SELECT event_type, epoch_us(day) AS day_us, day_total,
       round((day_total - lag(day_total) OVER w)
             / lag(day_total) OVER w * 100, 4) AS pct_change
FROM d
WINDOW w AS (PARTITION BY event_type ORDER BY day)
""",
)
def window_pct_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Period-over-period percent change of the daily total per event type —
    the day-over-day KPI delta. Daily totals are decimal-exact and 2dp-
    rounded BEFORE the ratio, so both engines divide identical doubles; the
    first day of each series has no predecessor and emits NULL.

    Scale shape: one hash agg to days (bounded output), then a lag over the
    aggregate — the window never sees raw events."""
    ev = load(spark, sf_dir, "events")
    d = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(
        F.round(F.sum(F.col("value").cast("decimal(18,6)")), 2)
        .cast("double")
        .alias("day_total")
    )
    w = Window.partitionBy("event_type").orderBy("day")
    prev = F.lag("day_total").over(w)
    return d.select(
        "event_type",
        F.unix_micros("day").alias("day_us"),
        "day_total",
        F.round((F.col("day_total") - prev) / prev * 100, 4).alias("pct_change"),
    )
