"""Second TPC-H breadth batch: bidirectional nation-pair volumes (Q7 shape),
market share with a ratio-of-sums (Q8), left-join count distribution (Q13),
conditional revenue ratio (Q14), and scalar-subquery + anti-join gate (Q22
shape, adapted to the synthetic schema — no phone column, so the grouping is
c_mktsegment).

All money sums/ratios fold DECIMAL(18,6)-quantized addends
(functions.numeric) so rounded values and threshold comparisons are
combine-order-independent on both engines.

Plan-shape intent: nation/region/part/supplier/customer dims broadcast;
orders⋈lineitem is the only fact-fact shuffle; ratios divide two exact sums
computed in ONE aggregate pass (no second scan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nocouncil_etl_spark.functions.numeric import rsum, rsum_sql
from nocouncil_etl_spark.io import load
from nocouncil_etl_spark.registry import query

_N1, _N2 = "NATION_1", "NATION_2"


@query(
    "tpch_q7_nation_volume",
    oracle=f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l.l_shipdate) AS INT) AS l_year,
       {rsum_sql("l.l_extendedprice * (1 - l.l_discount)")} AS revenue
FROM supplier s
JOIN lineitem l ON s.s_suppkey = l.l_suppkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
WHERE ((n1.n_name = '{_N1}' AND n2.n_name = '{_N2}')
    OR (n1.n_name = '{_N2}' AND n2.n_name = '{_N1}'))
GROUP BY 1, 2, 3
""",
)
def tpch_q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7 shape: bidirectional nation-pair trade volume by ship year. Both
    nation dims broadcast; the disjunctive pair predicate lands on the
    broadcast-joined frame, before the aggregate shuffle."""
    s = load(spark, sf_dir, "supplier")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    n1 = n.select(F.col("n_nationkey").alias("k1"), F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("k2"), F.col("n_name").alias("cust_nation"))
    sd = s.join(F.broadcast(n1), s.s_nationkey == F.col("k1")).select(
        "s_suppkey", "supp_nation"
    )
    cd = c.join(F.broadcast(n2), c.c_nationkey == F.col("k2")).select(
        "c_custkey", "cust_nation"
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(sd), li.l_suppkey == sd.s_suppkey)
        .join(F.broadcast(cd), o.o_custkey == cd.c_custkey)
        .filter(
            ((F.col("supp_nation") == _N1) & (F.col("cust_nation") == _N2))
            | ((F.col("supp_nation") == _N2) & (F.col("cust_nation") == _N1))
        )
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year(F.col("l_shipdate").cast("timestamp")).alias("l_year"),
        )
        .agg(rsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
    )


@query(
    "tpch_q8_market_share",
    oracle=f"""
WITH flat AS (
  SELECT CAST(year(o.o_orderdate) AS INT) AS o_year,
         l.l_extendedprice * (1 - l.l_discount) AS volume,
         n2.n_name AS supp_nation
  FROM part p
  JOIN lineitem l ON p.p_partkey = l.l_partkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
  JOIN region r ON n1.n_regionkey = r.r_regionkey
  JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
  WHERE r.r_name = 'ASIA' AND p.p_type = 'PROMO'
)
SELECT o_year,
       round(coalesce(CAST(sum(CASE WHEN supp_nation = '{_N2}'
                                    THEN CAST(volume AS DECIMAL(18,6)) END) AS DOUBLE),
                      0)
             / CAST(sum(CAST(volume AS DECIMAL(18,6))) AS DOUBLE), 6) AS mkt_share
FROM flat
GROUP BY o_year
""",
)
def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 shape: one nation's share of regional PROMO volume by order year —
    a ratio of two conditional sums from a single aggregate pass (never two
    scans), both folded as exact decimals so the quotient is stable."""
    p = load(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    s = load(spark, sf_dir, "supplier")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")

    cust_region = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("c_custkey")
    )
    supp_nation = s.join(
        F.broadcast(n.select(F.col("n_nationkey").alias("sk"), F.col("n_name").alias("supp_nation"))),
        s.s_nationkey == F.col("sk"),
    ).select("s_suppkey", "supp_nation")

    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    dec = "decimal(18,6)"
    flat = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p.select("p_partkey")), li.l_partkey == F.col("p_partkey"))
        .join(F.broadcast(cust_region), o.o_custkey == F.col("c_custkey"))
        .join(F.broadcast(supp_nation), li.l_suppkey == F.col("s_suppkey"))
        .select(
            F.year(F.col("o_orderdate").cast("timestamp")).alias("o_year"),
            vol.alias("volume"),
            "supp_nation",
        )
    )
    nation_sum = F.sum(
        F.when(F.col("supp_nation") == _N2, F.col("volume")).cast(dec)
    ).cast("double")
    total_sum = F.sum(F.col("volume").cast(dec)).cast("double")
    return flat.groupBy("o_year").agg(
        F.round(F.coalesce(nation_sum, F.lit(0.0)) / total_sum, 6).alias("mkt_share")
    )


@query(
    "tpch_q13_custdist",
    oracle="""
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
  FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
  GROUP BY c.c_custkey
)
GROUP BY c_count
""",
)
def tpch_q13_custdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13 shape: order-count distribution over a left join — the two-level
    aggregate where the inner keeps zero-order customers (count of the
    right side's key, not count(*))."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@query(
    "tpch_q14_promo_revenue",
    oracle="""
SELECT round(100.0 * coalesce(CAST(sum(CASE WHEN p.p_type = 'PROMO'
                 THEN CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6)) END)
              AS DOUBLE), 0)
       / CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6))) AS DOUBLE),
       4) AS promo_revenue
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= TIMESTAMP '1997-06-01 00:00:00'
  AND l.l_shipdate < TIMESTAMP '1997-07-01 00:00:00'
""",
)
def tpch_q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14 shape: conditional revenue percentage in one month — part
    broadcast, single pass, ratio of exact decimal sums."""
    dec = "decimal(18,6)"
    p = load(spark, sf_dir, "part").select("p_partkey", "p_type")
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-06-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-07-01 00:00:00").cast("timestamp"))
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.sum(F.when(F.col("p_type") == "PROMO", vol).cast(dec)).cast("double")
    total = F.sum(vol.cast(dec)).cast("double")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            F.round(
                100.0 * F.coalesce(promo, F.lit(0.0)) / total, 4
            ).alias("promo_revenue")
        )
    )


@query(
    "tpch_q22_idle_rich_customers",
    oracle="""
WITH threshold AS (
  SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) / count(*) AS avg_bal
  FROM customer WHERE c_acctbal > 0
)
SELECT c.c_mktsegment, count(*) AS numcust,
       CAST(round(sum(CAST(c.c_acctbal AS DECIMAL(18,6))), 2) AS DOUBLE) AS totacctbal
FROM customer c, threshold t
WHERE c.c_acctbal > t.avg_bal
  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
GROUP BY c.c_mktsegment
""",
)
def tpch_q22_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 shape (adapted: segment instead of phone prefix): customers with
    above-average balance and no orders — scalar-subquery threshold
    (broadcast 1-row agg, exact decimal avg so the > comparison is stable)
    plus an anti join."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    avg_bal = (
        c.filter(F.col("c_acctbal") > 0)
        .agg(
            (
                F.sum(F.col("c_acctbal").cast("decimal(18,6)")).cast("double")
                / F.count(F.lit(1))
            ).alias("avg_bal")
        )
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o.select(F.col("o_custkey").alias("c_custkey")), "c_custkey", "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            rsum("c_acctbal").alias("totacctbal"),
        )
    )
