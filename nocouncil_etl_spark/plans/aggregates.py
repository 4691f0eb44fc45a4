"""Aggregations / grouping (SURVEY.md §2.7 G1-G7, §2.5 A1-A5, plus the
cube/rollup/stats surface the engine exposes beyond the reference).

Every implicit ordering in the reference becomes an explicit (ts, event_id)
sort key (SURVEY §7.3-1). All aggregates are partial+final (map-side combine)
under Catalyst — no driver-side loops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nocouncil_etl_spark.functions.numeric import (
    exact_sum,
    ravg,
    ravg_sql,
    rstddev,
    rstddev_sql,
    rsum,
    rsum_sql,
)
from nocouncil_etl_spark.io import load
from nocouncil_etl_spark.registry import query

CHUNK = 20  # events per chunk; reference uses 100 segments (summarize.py:110)


@query(
    "chunked_agg",
    oracle=f"""
WITH numbered AS (
  SELECT user_id, ts, value, event_type,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS rn
  FROM events
)
SELECT user_id,
       CAST(floor(rn / {CHUNK}) AS BIGINT) AS chunk,
       count(*) AS n_rows,
       epoch_us(min(ts)) AS start_us,
       epoch_us(max(ts)) AS end_us,
       {rsum_sql("value")} AS chunk_value
FROM numbered
GROUP BY user_id, CAST(floor(rn / {CHUNK}) AS BIGINT)
""",
)
def chunked_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G1+G3: fixed-size chunking (bucketed group-by position) with per-chunk
    bounds — `range(0, len, 100)` chunk loop at summarize.py:110-118 and
    first/last bounds at :116-117,143-146."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.withColumn("rn", F.row_number().over(w) - 1)
        .withColumn("chunk", F.floor(F.col("rn") / CHUNK).cast("bigint"))
        .groupBy("user_id", "chunk")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.unix_micros(F.min("ts")).alias("start_us"),
            F.unix_micros(F.max("ts")).alias("end_us"),
            rsum("value").alias("chunk_value"),
        )
    )


@query(
    "ordered_string_agg",
    oracle="""
SELECT user_id,
       string_agg(event_type, ' ' ORDER BY ts, event_id) AS activity,
       string_agg(event_type, ' ' ORDER BY ts, event_id)
         FILTER (WHERE value < 100) AS quiet_activity
FROM events
GROUP BY user_id
""",
)
def ordered_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G2 + the G3 quirk: ordered string-agg per group, plus a variant where
    the *text* comes only from filtered rows while grouping covers all rows —
    summarize.py:20-25 (no_speech filter) vs :116-117 (bounds from raw
    window). listagg WITHIN GROUP keeps this JVM-side (Spark 4)."""
    ev = load(spark, sf_dir, "events")
    ev.createOrReplaceTempView("events_osa")
    return spark.sql(
        """
        SELECT user_id,
               listagg(event_type, ' ') WITHIN GROUP (ORDER BY ts, event_id) AS activity,
               listagg(CASE WHEN value < 100 THEN event_type END, ' ')
                 WITHIN GROUP (ORDER BY ts, event_id) AS quiet_activity
        FROM events_osa
        GROUP BY user_id
        """
    )


@query(
    "hierarchical_agg",
    oracle=f"""
WITH numbered AS (
  SELECT user_id, value,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS rn
  FROM events
),
chunks AS (
  SELECT user_id, CAST(floor(rn / {CHUNK}) AS BIGINT) AS chunk,
         {rsum_sql("value")} AS chunk_value, count(*) AS n
  FROM numbered GROUP BY 1, 2
)
SELECT user_id,
       count(*) AS n_chunks,
       {rsum_sql("chunk_value")} AS total_value,
       string_agg(chunk || ':' || n, ',' ORDER BY chunk) AS chunk_report
FROM chunks
GROUP BY user_id
""",
)
def hierarchical_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G4: hierarchical reduce (agg-of-aggs) — meeting summary over chunk
    summaries (summarize.py:147). Two groupBys; at 100 TB the second level is
    tiny because the first level pre-aggregated per chunk."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    chunks = (
        ev.withColumn("rn", F.row_number().over(w) - 1)
        .withColumn("chunk", F.floor(F.col("rn") / CHUNK).cast("bigint"))
        .groupBy("user_id", "chunk")
        .agg(rsum("value").alias("chunk_value"), F.count(F.lit(1)).alias("n"))
    )
    report = F.array_join(
        F.transform(
            F.array_sort(F.collect_list(F.struct("chunk", "n"))),
            lambda s: F.concat_ws(":", s.chunk, s.n),
        ),
        ",",
    )
    return chunks.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        rsum("chunk_value").alias("total_value"),
        report.alias("chunk_report"),
    )


@query(
    "global_stats",
    oracle="""
SELECT source,
       count(*) AS n_docs,
       count(DISTINCT lang) AS n_langs,
       CAST(round(avg(n_chars), 2) AS DOUBLE) AS avg_chars
FROM documents
GROUP BY source
""",
)
def global_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G5+G6: global counts / distinct-key stats (reconciliation counters at
    newscrawler.py:104,170-171,443-460)."""
    docs = load(spark, sf_dir, "documents")
    return docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("lang").alias("n_langs"),
        F.round(F.avg("n_chars"), 2).alias("avg_chars"),
    )


@query(
    "dedup_keep_latest",
    oracle="""
SELECT user_id, event_type, event_id, epoch_us(ts) AS ts_us
FROM (
  SELECT user_id, event_type, event_id, ts,
         row_number() OVER (PARTITION BY user_id, event_type
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
)
WHERE rn = 1
""",
)
def dedup_keep_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G7: dedup by content key with keep-latest upsert semantics —
    "duplicates will be updated" (article_vectorize.py:361-363); one row per
    sha16(url) (newscrawler.py:366-369). Deterministic tie-break per J6."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_type", "event_id", F.unix_micros("ts").alias("ts_us"))
    )


@query(
    "agg_cube",
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       {rsum_sql("l_quantity")} AS sum_qty, count(*) AS n
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
""",
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouping-sets surface (SURVEY §2.7 note): CUBE over lineitem.

    Two-phase: aggregate at the finest granularity first (one linear scan,
    map-side combine, no Expand), then CUBE the ~|rf|x|ls| base rows —
    sum/count are decomposable, so re-aggregation is exact. Cubing the raw
    scan multiplies the Expand input 4x (measured 13.6 s vs 4 s at sf1);
    both grouping columns are non-null in TPC-H, so CUBE's null-indicator
    rows cannot collide with data groups."""
    li = load(spark, sf_dir, "lineitem")
    base = li.groupBy("l_returnflag", "l_linestatus").agg(
        exact_sum("l_quantity").alias("sq_dec"),
        F.count(F.lit(1)).alias("n"),
    )
    return base.cube("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("sq_dec"), 2).cast("double").alias("sum_qty"),
        F.sum("n").alias("n"),
    )


@query(
    "agg_rollup",
    oracle=f"""
SELECT o_orderstatus, o_orderpriority,
       count(*) AS n, {rsum_sql("o_totalprice")} AS total
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
""",
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouping-sets surface: ROLLUP over orders.

    Same two-phase shape as agg_cube: finest-granularity exact aggregate
    first (linear scan, no Expand), ROLLUP over the bounded base — the
    Expand otherwise triples the scan's shuffle input. Both grouping
    columns are non-null in TPC-H."""
    o = load(spark, sf_dir, "orders")
    base = o.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        exact_sum("o_totalprice").alias("tot_dec"),
    )
    return base.rollup("o_orderstatus", "o_orderpriority").agg(
        F.sum("n").alias("n"),
        F.round(F.sum("tot_dec"), 2).cast("double").alias("total"),
    )


@query(
    "agg_numeric_stats",
    oracle=f"""
SELECT event_type,
       round(min(value), 2) AS min_v,
       round(max(value), 2) AS max_v,
       {ravg_sql("value")} AS avg_v,
       {rstddev_sql("value")} AS sd_v,
       round(quantile_cont(value, 0.5), 4) AS median_v
FROM events
GROUP BY event_type
""",
)
def agg_numeric_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Numeric stats surface: min/max/avg/stddev/exact median per group.
    avg/stddev fold exact decimal moments (functions.numeric) so the rounded
    values are combine-order-independent; min/max/median are already
    order-free."""
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.min("value"), 2).alias("min_v"),
        F.round(F.max("value"), 2).alias("max_v"),
        ravg("value").alias("avg_v"),
        rstddev("value").alias("sd_v"),
        F.round(F.percentile("value", F.lit(0.5)), 4).alias("median_v"),
    )


@query(
    "array_flatten_join",
    oracle="""
SELECT doc_id,
       array_to_string((string_split(text, ' '))[1:8], '|||') AS head_words,
       len(string_split(text, ' ')) AS n_words
FROM documents
""",
)
def array_flatten_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1: array flatten-to-string with a delimiter — `'|||'.join(quotes)` at
    vectorize.py:89-92 (Chroma metadata must be scalar)."""
    docs = load(spark, sf_dir, "documents")
    words = F.split("text", " ")
    return docs.select(
        "doc_id",
        F.array_join(F.slice(words, 1, 8), "|||").alias("head_words"),
        F.size(words).alias("n_words"),
    )


@query(
    "rollup_prepend",
    oracle=f"""
WITH numbered AS (
  SELECT user_id, value,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS rn
  FROM events
),
chunks AS (
  SELECT user_id, CAST(floor(rn / {CHUNK}) AS BIGINT) AS chunk,
         {rsum_sql("value")} AS chunk_value
  FROM numbered GROUP BY 1, 2
)
SELECT user_id, FALSE AS is_rollup, chunk, chunk_value FROM chunks
UNION ALL
SELECT user_id, TRUE AS is_rollup, -1 AS chunk,
       {rsum_sql("chunk_value")} AS chunk_value
FROM chunks GROUP BY user_id
""",
)
def rollup_prepend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4: prepend a rollup row per group — `summaries.insert(0, meeting)` at
    summarize.py:148-155. Positional row-0 becomes an explicit `is_rollup`
    flag (SURVEY §7.3-1); downstream drop-row-0 (vectorize.py:76) becomes a
    flag filter."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    chunks = (
        ev.withColumn("rn", F.row_number().over(w) - 1)
        .withColumn("chunk", F.floor(F.col("rn") / CHUNK).cast("bigint"))
        .groupBy("user_id", "chunk")
        .agg(rsum("value").alias("chunk_value"))
    )
    detail = chunks.select(
        "user_id", F.lit(False).alias("is_rollup"), "chunk", "chunk_value"
    )
    rollup = chunks.groupBy("user_id").agg(
        rsum("chunk_value").alias("chunk_value")
    ).select(
        "user_id", F.lit(True).alias("is_rollup"), F.lit(-1).cast("bigint").alias("chunk"),
        "chunk_value",
    )
    return detail.unionByName(rollup)
