"""Second breadth batch: explicit grouping sets, full-outer and cross joins,
first/last window values, bitwise functions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nocouncil_etl_spark.io import load
from nocouncil_etl_spark.registry import query


@query(
    "agg_grouping_sets",
    oracle="""
SELECT o_orderstatus, o_orderpriority,
       CAST(grouping(o_orderstatus) AS INT) AS g_status,
       CAST(grouping(o_orderpriority) AS INT) AS g_prio,
       count(*) AS n
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
""",
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS + grouping() marker columns."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders_gs")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               CAST(grouping(o_orderstatus) AS INT) AS g_status,
               CAST(grouping(o_orderpriority) AS INT) AS g_prio,
               count(*) AS n
        FROM orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


@query(
    "join_full_outer",
    oracle="""
WITH a AS (SELECT user_id, count(*) AS n_err FROM events WHERE event_type = 'error' GROUP BY user_id),
b AS (SELECT user_id, count(*) AS n_buy FROM events WHERE event_type = 'purchase' GROUP BY user_id)
SELECT coalesce(a.user_id, b.user_id) AS user_id,
       coalesce(a.n_err, 0) AS n_err,
       coalesce(b.n_buy, 0) AS n_buy
FROM a FULL OUTER JOIN b ON a.user_id = b.user_id
""",
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join surface: error-vs-purchase counts per user, keeping
    users that appear on only one side."""
    ev = load(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "error").groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_err")
    )
    b = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy(F.col("user_id").alias("user_id_b"))
        .agg(F.count(F.lit(1)).alias("n_buy"))
    )
    return (
        a.join(b, a.user_id == b.user_id_b, "full_outer")
        .select(
            F.coalesce("user_id", "user_id_b").alias("user_id"),
            F.coalesce("n_err", F.lit(0)).alias("n_err"),
            F.coalesce("n_buy", F.lit(0)).alias("n_buy"),
        )
    )


@query(
    "join_cross_dims",
    oracle="""
SELECT a.r_name AS from_region, b.r_name AS to_region
FROM region a CROSS JOIN region b
WHERE a.r_regionkey <> b.r_regionkey
""",
)
def join_cross_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross join surface — legitimate only for tiny dims (route matrix)."""
    r = load(spark, sf_dir, "region")
    a = r.select(F.col("r_regionkey").alias("ka"), F.col("r_name").alias("from_region"))
    b = r.select(F.col("r_regionkey").alias("kb"), F.col("r_name").alias("to_region"))
    return (
        a.crossJoin(b).filter(F.col("ka") != F.col("kb")).select("from_region", "to_region")
    )


@query(
    "window_first_last",
    oracle="""
SELECT event_id, user_id,
       first_value(event_type) OVER w AS first_type,
       last_value(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND UNBOUNDED FOLLOWING) AS last_type
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
""",
)
def window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value/last_value with explicit frames (the positional
    jsons[0]/jsons[-1] access at summarize.py:151-154, made explicit)."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return ev.select(
        "event_id",
        "user_id",
        F.first("event_type").over(w).alias("first_type"),
        F.last("event_type").over(w_full).alias("last_type"),
    )


@query(
    "fn_bitwise",
    oracle="""
SELECT event_id,
       event_id & 255 AS low_byte,
       event_id >> 4 AS shifted,
       xor(event_id, 21) AS xored,
       event_id | 1 AS odd_forced
FROM events
""",
)
def fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise surface: and/or/xor/shift (hash bucketing building blocks)."""
    ev = load(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.expr("event_id & 255").alias("low_byte"),
        F.expr("shiftright(event_id, 4)").alias("shifted"),
        F.expr("event_id ^ 21").alias("xored"),
        F.expr("event_id | 1").alias("odd_forced"),
    )
