"""TPC-H-style multi-join analytical queries — the engine's join/agg
performance surface (SURVEY.md §2.6-2.7 note: inner/semi/anti come free; the
north star is superset capability at 100 TB).

Plan-shape intent, asserted in tests/test_plans.py:
- dimension chains (region→nation→customer/supplier) broadcast — zero
  shuffle on the probe side until the final aggregate;
- fact-fact joins (orders⋈lineitem) shuffle on the join key once, with AQE
  choosing partitioning at runtime;
- filters sit against the parquet scans (pushdown), aggregates are
  partial+final.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nocouncil_etl_spark.functions.numeric import rsum, rsum_sql
from nocouncil_etl_spark.io import load
from nocouncil_etl_spark.registry import query


@query(
    "tpch_q3_shipping",
    oracle=f"""
SELECT l.l_orderkey,
       {rsum_sql("l.l_extendedprice * (1 - l.l_discount)")} AS revenue,
       epoch_us(o.o_orderdate) AS orderdate_us,
       o.o_orderpriority
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l.l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue DESC, l.l_orderkey
LIMIT 10
""",
)
def tpch_q3_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3 shape: segment filter → customer⋈orders⋈lineitem → top-10 revenue.
    customer is a broadcast dim; orders⋈lineitem is the one real shuffle."""
    c = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp")
    )
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01 00:00:00").cast("timestamp")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c.select("c_custkey")), o.o_custkey == F.col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            rsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            )
        )
        .select(
            "l_orderkey",
            "revenue",
            # parquet timestamps surface as TIMESTAMP_NTZ; cast is identity
            # under the pinned UTC session and lets unix_micros apply
            F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias("orderdate_us"),
            "o_orderpriority",
        )
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


@query(
    "tpch_q5_local_supplier",
    oracle=f"""
SELECT n.n_name,
       {rsum_sql("l.l_extendedprice * (1 - l.l_discount)")} AS revenue
FROM region r
JOIN nation n ON r.r_regionkey = n.n_regionkey
JOIN customer c ON c.c_nationkey = n.n_nationkey
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey AND s.s_nationkey = n.n_nationkey
WHERE r.r_name = 'ASIA'
GROUP BY n.n_name
""",
)
def tpch_q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5 shape: 6-way join with the local-supplier constraint
    (s_nationkey = c_nationkey). region/nation/customer/supplier broadcast;
    the plan has exactly one fact-fact shuffle (orders⋈lineitem)."""
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = load(spark, sf_dir, "nation")
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")

    dims = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("c_custkey", "n_nationkey", "n_name")
    )
    # r11 opt (guide §3.2 spirit): apply the selective broadcast dim chain
    # to ORDERS before the fact-fact join, so the orders side entering the
    # one orderkey shuffle is already cut to ASIA customers (~1/5) and the
    # region/nation columns ride the small side — inner joins commute, so
    # the result is unchanged. At bench scale AQE is then free to convert
    # the shrunken orders side to a runtime broadcast; at 100 TB it stays
    # a shuffle join of the pruned side.
    o2 = o.join(F.broadcast(dims), o.o_custkey == dims.c_custkey).select(
        "o_orderkey", "n_nationkey", "n_name"
    )
    return (
        li.join(o2, li.l_orderkey == o2.o_orderkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (s.s_nationkey == F.col("n_nationkey")),
        )
        .groupBy("n_name")
        .agg(
            rsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            )
        )
    )


@query(
    "tpch_q6_forecast",
    oracle=f"""
SELECT {rsum_sql("l_extendedprice * l_discount")} AS revenue,
       count(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l_discount BETWEEN 0.04 AND 0.08
  AND l_quantity < 24
""",
)
def tpch_q6_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6 shape: pure scan+filter+global agg — measures pushdown quality.
    Every predicate reaches the parquet reader (PushedFilters)."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_discount") >= 0.04)
            & (F.col("l_discount") <= 0.08)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            rsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "tpch_q10_returns",
    oracle=f"""
SELECT c.c_custkey, c.c_name,
       {rsum_sql("l.l_extendedprice * (1 - l.l_discount)")} AS revenue,
       round(max(c.c_acctbal), 2) AS acctbal,
       n.n_name
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE l.l_returnflag = 'R'
  AND o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
GROUP BY c.c_custkey, c.c_name, n.n_name
ORDER BY revenue DESC, c.c_custkey
LIMIT 20
""",
)
def tpch_q10_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10 shape: returned-item revenue per customer, top 20 with a
    deterministic tie-break."""
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp")
    )
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    dims = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).select(
        "c_custkey", "c_name", "c_acctbal", "n_name"
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(dims), o.o_custkey == dims.c_custkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            rsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            ),
            F.round(F.max("c_acctbal"), 2).alias("acctbal"),
        )
        .select("c_custkey", "c_name", "revenue", "acctbal", "n_name")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


def _pivot_sql(status: str) -> str:
    """One pivot cell: exact decimal sum of the status bucket, 0 when empty
    (same quantization as functions.numeric.rsum_sql)."""
    return (
        "round(coalesce(CAST(sum(CASE WHEN o_orderstatus = "
        f"'{status}' THEN CAST(o_totalprice AS DECIMAL(18,6)) END) AS DOUBLE)"
        ", 0), 2)"
    )


@query(
    "pivot_priority_by_status",
    oracle=f"""
SELECT o_orderpriority,
       {_pivot_sql("O")} AS open_total,
       {_pivot_sql("F")} AS fulfilled_total,
       {_pivot_sql("P")} AS partial_total
FROM orders
GROUP BY o_orderpriority
""",
)
def pivot_priority_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot surface (SURVEY §2.8 note): order totals by priority × status,
    with an explicit value list so the plan is a single pass (no distinct
    scan to discover pivot columns)."""
    o = load(spark, sf_dir, "orders").withColumn(
        "price_dec", F.col("o_totalprice").cast("decimal(18,6)")
    )
    p = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .sum("price_dec")
    )

    def cell(col: str, alias: str):
        return F.round(F.coalesce(F.col(col).cast("double"), F.lit(0.0)), 2).alias(alias)

    return p.select(
        "o_orderpriority",
        cell("O", "open_total"),
        cell("F", "fulfilled_total"),
        cell("P", "partial_total"),
    )


@query(
    "unpivot_stack",
    oracle="""
SELECT doc_id, 'n_chars' AS metric, CAST(n_chars AS DOUBLE) AS v FROM documents
UNION ALL
SELECT doc_id, 'n_words' AS metric,
       CAST(len(string_split(text, ' ')) AS DOUBLE) AS v FROM documents
""",
)
def unpivot_stack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot surface: wide → long via stack (melt)."""
    docs = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.col("n_chars").cast("double").alias("n_chars"),
        F.size(F.split("text", " ")).cast("double").alias("n_words"),
    )
    return docs.unpivot("doc_id", ["n_chars", "n_words"], "metric", "v")
