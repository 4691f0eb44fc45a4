"""Window functions (SURVEY.md §2.8 O3 + engine surface): running aggregates,
top-k per group, lag deltas, batch sessionization.

All implicit positional orderings from the reference become explicit
(ts, event_id) / (price, key) sort keys so results are deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nocouncil_etl_spark.io import load
from nocouncil_etl_spark.registry import query

SESSION_GAP_MIN = 30


@query(
    "window_running_sum",
    oracle="""
SELECT event_id, user_id,
       row_number() OVER w AS rn,
       CAST(round(sum(CAST(value AS DECIMAL(18,6)))
                    OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING), 2) AS DOUBLE) AS running_value
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
""",
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O3: explicit-order positional semantics — running sum + row_number per
    user (replaces list-position logic at summarize.py:116-117,151-154).
    Decimal-quantized accumulation: window-sum association order is
    engine-internal (DuckDB uses segment trees, Spark accumulates in frame
    order), so float prefix sums are not parity-safe — exact decimals are."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        F.row_number().over(w).alias("rn"),
        F.round(
            F.sum(F.col("value").cast("decimal(18,6)")).over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            ),
            2,
        ).cast("double").alias("running_value"),
    )


@query(
    "window_topk_per_group",
    oracle="""
SELECT o_custkey, o_orderkey, o_totalprice
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rk
  FROM orders
)
WHERE rk <= 3
""",
)
def window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group — the kernel of similarity search (E3) and of any
    per-entity ranking; one shuffle on the group key."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    return (
        o.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice")
    )


@query(
    "window_lag_delta",
    oracle="""
SELECT event_id, user_id,
       round(value - lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id), 2)
         AS delta
FROM events
""",
)
def window_lag_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag/lead surface: per-user value delta over event time."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        F.round(F.col("value") - F.lag("value").over(w), 2).alias("delta"),
    )


@query(
    "sessionize_batch",
    oracle=f"""
WITH flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > {SESSION_GAP_MIN} * 60 * 1000000
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessions AS (
  SELECT user_id, ts, event_id,
         CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
  FROM flagged
)
SELECT user_id, session_id, count(*) AS n_events,
       epoch_us(min(ts)) AS session_start_us, epoch_us(max(ts)) AS session_end_us
FROM sessions
GROUP BY user_id, session_id
""",
)
def sessionize_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization (gaps-and-islands): lag + cumulative sum on
    gap > 30 min. The streaming twin is `session_window` (see streaming plans);
    this batch form is the oracle-checkable kernel."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = SESSION_GAP_MIN * 60 * 1_000_000
    new_session = F.when(
        F.lag("ts").over(w).isNull()
        | (F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w)) > gap_us),
        1,
    ).otherwise(0)
    return (
        ev.withColumn("new_session", new_session)
        .withColumn(
            "session_id",
            F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.unix_micros(F.min("ts")).alias("session_start_us"),
            F.unix_micros(F.max("ts")).alias("session_end_us"),
        )
    )


@query(
    "window_rank_dense",
    oracle="""
SELECT c_mktsegment, c_custkey,
       rank() OVER (PARTITION BY c_mktsegment ORDER BY round(c_acctbal, 2) DESC, c_custkey) AS rnk,
       dense_rank() OVER (PARTITION BY c_mktsegment ORDER BY round(c_acctbal, 2) DESC) AS drnk,
       CAST(ntile(4) OVER (PARTITION BY c_mktsegment ORDER BY round(c_acctbal, 2) DESC, c_custkey) AS INT) AS quartile
FROM customer
""",
)
def window_rank_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking surface: rank / dense_rank / ntile per segment."""
    c = load(spark, sf_dir, "customer")
    bal = F.round(F.col("c_acctbal"), 2)
    w = Window.partitionBy("c_mktsegment").orderBy(bal.desc(), "c_custkey")
    wd = Window.partitionBy("c_mktsegment").orderBy(bal.desc())
    return c.select(
        "c_mktsegment",
        "c_custkey",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(wd).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
    )
