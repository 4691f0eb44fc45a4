"""Flagship query (SURVEY.md §7.1 M0): TPC-H-Q1-style pricing summary.

Exercises scan → filter (pushed to parquet) → projection → hash aggregate →
sort in one plan; Catalyst runs it as partial+final agg with whole-stage
codegen, so it is the canonical "is the engine wired correctly" probe at any
scale. Money sums/avgs fold DECIMAL(18,6)-quantized addends (functions.numeric)
so the rounded values are exact and combine-order-independent on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nocouncil_etl_spark.functions.numeric import ravg, ravg_sql, rsum, rsum_sql
from nocouncil_etl_spark.io import load
from nocouncil_etl_spark.registry import query

_ORACLE = f"""
SELECT
  l_returnflag,
  l_linestatus,
  {rsum_sql("l_quantity")}                                         AS sum_qty,
  {rsum_sql("l_extendedprice")}                                    AS sum_base_price,
  {rsum_sql("l_extendedprice * (1 - l_discount)")}                 AS sum_disc_price,
  {rsum_sql("l_extendedprice * (1 - l_discount) * (1 + l_tax)")}   AS sum_charge,
  {ravg_sql("l_quantity")}                                         AS avg_qty,
  {ravg_sql("l_extendedprice")}                                    AS avg_price,
  {ravg_sql("l_discount", 6)}                                      AS avg_disc,
  count(*)                                                         AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


@query("pricing_summary", oracle=_ORACLE)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing summary report over lineitem (scan/filter/agg/sort)."""
    li = load(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            rsum("l_quantity").alias("sum_qty"),
            rsum("l_extendedprice").alias("sum_base_price"),
            rsum(disc_price).alias("sum_disc_price"),
            rsum(disc_price * (1 + F.col("l_tax"))).alias("sum_charge"),
            ravg("l_quantity").alias("avg_qty"),
            ravg("l_extendedprice").alias("avg_price"),
            ravg("l_discount", 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )
