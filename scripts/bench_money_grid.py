"""Micro-benchmark: accumulator strategies for pricing_summary money sums.

Variants:
  dec18_6 -- current: addends cast DECIMAL(18,6); sum accumulator DECIMAL(28,6)
             (beyond the 18-digit compact long range -> slow agg buffer)
  dec8_2  -- money grid: addends DECIMAL(8,2); sum accumulator DECIMAL(18,2)
             (compact long-backed end-to-end)
  long_c  -- scaled-long cents: round(x*100) cast LONG; primitive sum
  double  -- raw double sum (non-deterministic baseline, for the floor)

Run: python scripts/bench_money_grid.py [sf_dir] [reps]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def variants():
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc * (1 + F.col("l_tax"))

    def dec(c, p, s):
        return F.sum(c.cast(f"decimal({p},{s})"))

    def agg_dec(p, s):
        return [
            F.round(dec(F.col("l_quantity"), p, s), 2).cast("double").alias("sum_qty"),
            F.round(dec(F.col("l_extendedprice"), p, s), 2).cast("double").alias("sum_base_price"),
            F.round(dec(disc, p, s), 2).cast("double").alias("sum_disc_price"),
            F.round(dec(charge, p, s), 2).cast("double").alias("sum_charge"),
            F.round(dec(F.col("l_quantity"), p, s).cast("double") / F.count("l_quantity"), 4).alias("avg_qty"),
            F.round(dec(F.col("l_extendedprice"), p, s).cast("double") / F.count("l_extendedprice"), 4).alias("avg_price"),
            F.round(dec(F.col("l_discount"), p, s).cast("double") / F.count("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        ]

    def lc(c, scale):
        return F.sum(F.round(c * scale).cast("long"))

    def agg_long(scale):
        return [
            (F.round(lc(F.col("l_quantity"), scale) / scale, 2)).alias("sum_qty"),
            (F.round(lc(F.col("l_extendedprice"), scale) / scale, 2)).alias("sum_base_price"),
            (F.round(lc(disc, scale) / scale, 2)).alias("sum_disc_price"),
            (F.round(lc(charge, scale) / scale, 2)).alias("sum_charge"),
            F.round(lc(F.col("l_quantity"), scale) / scale / F.count("l_quantity"), 4).alias("avg_qty"),
            F.round(lc(F.col("l_extendedprice"), scale) / scale / F.count("l_extendedprice"), 4).alias("avg_price"),
            F.round(lc(F.col("l_discount"), scale) / scale / F.count("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        ]

    def agg_double():
        return [
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc), 2).alias("sum_disc_price"),
            F.round(F.sum(charge), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        ]

    return {
        "dec18_6": agg_dec(18, 6),
        "dec8_2": agg_dec(8, 2),
        "dec12_6": agg_dec(12, 6),
        "long_c2": agg_long(100),
        "long_c6": agg_long(1_000_000),
        "double": agg_double(),
    }


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    li = li.filter(
        F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp")
    )

    for name, aggs in variants().items():
        q = li.groupBy("l_returnflag", "l_linestatus").agg(*aggs)
        q.collect()  # warm
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            q.collect()
            ts.append(time.perf_counter() - t0)
        print(f"{name:10s} min={min(ts):.3f}s median={sorted(ts)[len(ts)//2]:.3f}s")

    # accumulator-dedup probe: does sum(qty) appear once or twice when used
    # by both sum_qty and avg_qty?
    plan = (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.sum(F.col("l_quantity").cast("decimal(18,6)")), 2).alias("s"),
            F.round(
                F.sum(F.col("l_quantity").cast("decimal(18,6)")).cast("double")
                / F.count("l_quantity"),
                4,
            ).alias("a"),
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    n_sums = plan.count("sum(")
    print(f"dedup probe: physical plan contains {n_sums} sum() aggregates (expect 1 if deduped)")


if __name__ == "__main__":
    main()
