"""Flagship query (SURVEY.md §7.1 M0): TPC-H-Q1-style pricing summary.

Exercises scan → filter (pushed to parquet) → projection → hash aggregate →
sort in one plan; Catalyst runs it as partial+final agg with whole-stage
codegen, so it is the canonical "is the engine wired correctly" probe at any
scale.

Money aggregation uses the split-sum kernel (functions.numeric.money_parts):
two primitive LONG accumulators per column (integer part + 6dp fraction), so
sums are exact and combine-order-independent like the round-2 decimal kernel,
but the aggregate buffer stays primitive and Catalyst never enters the
decimal precision-promotion rules that cost ~1.3 s of per-build analysis
(measured in scripts/bench_money_grid.py). For this schema (prices on a 2dp
grid, discount/tax 2dp ⇒ disc_price 4dp, charge 6dp) the 6dp quantization is
lossless, so the finished values are identical to the decimal kernel's.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nocouncil_etl_spark.functions.numeric import (
    money_avg_col,
    money_avg_sql,
    money_parts,
    money_parts_sql,
    money_sum_col,
    money_sum_sql,
)
from nocouncil_etl_spark.io import load
from nocouncil_etl_spark.registry import query

_DISC_PRICE = "l_extendedprice * (1 - l_discount)"
_CHARGE = "l_extendedprice * (1 - l_discount) * (1 + l_tax)"

_ORACLE = f"""
WITH parts AS (
  SELECT
    l_returnflag,
    l_linestatus,
    {money_parts_sql("l_quantity", "qty")},
    {money_parts_sql("l_extendedprice", "base_price")},
    {money_parts_sql(_DISC_PRICE, "disc_price")},
    {money_parts_sql(_CHARGE, "charge")},
    {money_parts_sql("l_discount", "disc")},
    count(*) AS count_order
  FROM lineitem
  WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
  GROUP BY l_returnflag, l_linestatus
)
SELECT
  l_returnflag,
  l_linestatus,
  {money_sum_sql("qty")}                                  AS sum_qty,
  {money_sum_sql("base_price")}                           AS sum_base_price,
  {money_sum_sql("disc_price")}                           AS sum_disc_price,
  {money_sum_sql("charge")}                               AS sum_charge,
  {money_avg_sql("qty", "count_order")}                   AS avg_qty,
  {money_avg_sql("base_price", "count_order")}            AS avg_price,
  {money_avg_sql("disc", "count_order", 6)}               AS avg_disc,
  count_order
FROM parts
ORDER BY l_returnflag, l_linestatus
"""


@query("pricing_summary", oracle=_ORACLE)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing summary report over lineitem (scan/filter/agg/sort)."""
    li = load(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            *money_parts("l_quantity", "qty"),
            *money_parts("l_extendedprice", "base_price"),
            *money_parts(disc_price, "disc_price"),
            *money_parts(charge, "charge"),
            *money_parts("l_discount", "disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .select(
            "l_returnflag",
            "l_linestatus",
            money_sum_col("qty").alias("sum_qty"),
            money_sum_col("base_price").alias("sum_base_price"),
            money_sum_col("disc_price").alias("sum_disc_price"),
            money_sum_col("charge").alias("sum_charge"),
            money_avg_col("qty", "count_order").alias("avg_qty"),
            money_avg_col("base_price", "count_order").alias("avg_price"),
            money_avg_col("disc", "count_order", 6).alias("avg_disc"),
            "count_order",
        )
        .orderBy("l_returnflag", "l_linestatus")
    )
