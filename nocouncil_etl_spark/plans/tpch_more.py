"""More TPC-H-shaped queries: correlated-exists (Q4), group-having join-back
(Q18), and simhash-bucket near-dup pairs (the hamming-distance dedup step).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nocouncil_etl_spark.io import load
from nocouncil_etl_spark.operators.dedup import simhash_table, words
from nocouncil_etl_spark.registry import query


@query(
    "tpch_q4_priority_exists",
    oracle="""
SELECT o.o_orderpriority, count(*) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
  )
GROUP BY o.o_orderpriority
""",
)
def tpch_q4_priority_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 shape: correlated EXISTS as a left-semi join with a non-equi
    residual (l_shipdate > o_orderdate) — the subquery decorrelation Catalyst
    does for free when expressed as a semi join."""
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    semi = o.join(
        li,
        (o.o_orderkey == li.l_orderkey) & (li.l_shipdate > o.o_orderdate),
        "left_semi",
    )
    return semi.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count"))


@query(
    "tpch_q18_large_orders",
    oracle="""
WITH big AS (
  SELECT l_orderkey, sum(l_quantity) AS total_qty
  FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 150
)
SELECT o.o_orderkey, epoch_us(o.o_orderdate) AS orderdate_us,
       round(o.o_totalprice, 2) AS totalprice,
       round(b.total_qty, 2) AS total_qty
FROM orders o JOIN big b ON o.o_orderkey = b.l_orderkey
""",
)
def tpch_q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18 shape: group-by + HAVING feeding a join back to the fact — the
    aggregate side shrinks first, so the join input is already reduced."""
    li = load(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 150)
    )
    o = load(spark, sf_dir, "orders")
    return o.join(big, o.o_orderkey == big.l_orderkey).select(
        "o_orderkey",
        F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias("orderdate_us"),
        F.round("o_totalprice", 2).alias("totalprice"),
        F.round("total_qty", 2).alias("total_qty"),
    )


_SIMHASH_PAIR_BITS = 16
_HAMMING_MAX = 3


def _sql_simhash_expr(ws: str) -> str:
    return " || ".join(
        f"(CASE WHEN 2 * len(list_filter({ws}, w -> substr(md5(w), {i}, 1) >= '8')) > len({ws}) "
        f"THEN '1' ELSE '0' END)"
        for i in range(1, _SIMHASH_PAIR_BITS + 1)
    )


_HAMMING_SQL = " + ".join(
    f"(CASE WHEN substr(a.simhash, {i}, 1) <> substr(b.simhash, {i}, 1) THEN 1 ELSE 0 END)"
    for i in range(1, _SIMHASH_PAIR_BITS + 1)
)


@query(
    "dedup_simhash_pairs",
    oracle=f"""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 100000, text || ' tiny edit' FROM documents WHERE doc_id % 4 = 0
),
sh AS (
  SELECT doc_id, {_sql_simhash_expr("string_split(text, ' ')")} AS simhash
  FROM corpus
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST({_HAMMING_SQL} AS INT) AS hamming
FROM sh a
JOIN sh b ON substr(a.simhash, 1, 8) = substr(b.simhash, 1, 8)
         AND a.doc_id < b.doc_id
WHERE {_HAMMING_SQL} <= {_HAMMING_MAX}
""",
)
def dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs: bucket by the 8-bit signature prefix (the
    hamming-LSH trick — near-dups agree on most bits, so prefix buckets
    catch them), verify full hamming distance ≤ 3 inside buckets only. Same
    linear candidate-generation shape as minhash-LSH."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    mutated = docs.filter(F.col("doc_id") % 4 == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat("text", F.lit(" tiny edit")).alias("text"),
    )
    corpus = docs.unionByName(mutated).select(
        "doc_id", words("text").alias("w")
    )
    sh = simhash_table(corpus, "doc_id", "w", _SIMHASH_PAIR_BITS).withColumn(
        "prefix", F.substring("simhash", 1, 8)
    )
    a = sh.select(
        F.col("doc_id").alias("id_a"), F.col("simhash").alias("sh_a"), "prefix"
    )
    b = sh.select(
        F.col("doc_id").alias("id_b"), F.col("simhash").alias("sh_b"), "prefix"
    )
    hamming = sum(
        F.when(
            F.substring("sh_a", i, 1) != F.substring("sh_b", i, 1), 1
        ).otherwise(0)
        for i in range(1, _SIMHASH_PAIR_BITS + 1)
    )
    return (
        a.join(b, "prefix")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("hamming", hamming.cast("int"))
        .filter(F.col("hamming") <= _HAMMING_MAX)
        .select("id_a", "id_b", "hamming")
    )
