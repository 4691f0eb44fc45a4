"""Custom-aggregate / approximate / skew queries.

- mean-pool UDAF over embeddings (applyInPandas; §2.11 GROUPED_AGG row)
- approximate aggregates (HLL distinct, approx quantile) — engine surface
  with exact-SQL reference values where semantics allow
- salted two-phase aggregation — the hot-key skew idiom, result-identical
  to the plain group-by (the oracle proves it)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nocouncil_etl_spark.functions.numeric import exact_sum, rsum, rsum_sql
from nocouncil_etl_spark.io import load
from nocouncil_etl_spark.operators.udaf import mean_pool
from nocouncil_etl_spark.registry import query

POOL_DIMS = 4
SALT_BUCKETS = 8


@query(
    "udaf_mean_pool",
    oracle=f"""
WITH e AS (SELECT label, embedding::DOUBLE[] AS v FROM embeddings)
SELECT label,
       {", ".join(
           f"round(CAST(sum(CAST(v[{i + 1}] AS DECIMAL(18,6))) AS DOUBLE)"
           f" / count(*), 6) AS p{i}"
           for i in range(POOL_DIMS)
       )}
FROM e
GROUP BY label
""",
)
def udaf_mean_pool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.11 custom aggregate: per-label mean-pooled embedding via
    applyInPandas (one group in → one pooled row out) — the chunk→document
    embedding pooling the reference's meeting-level querying implies."""
    e = load(spark, sf_dir, "embeddings").select(
        F.col("label").cast("long").alias("label"), "embedding"
    )
    pooled = mean_pool(e, key="label", vec_col="embedding", out_dims=POOL_DIMS)
    return pooled.select(
        "label", *[F.round(F.col(f"p{i}"), 6).alias(f"p{i}") for i in range(POOL_DIMS)]
    )


@query("agg_approx_sketches")
def agg_approx_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate-aggregate surface (SURVEY §2.7 note): HLL++ distinct and
    approximate quantiles. Sketch values are engine-specific, so this is a
    rows-only check; the exact twins live in global_stats/agg_numeric_stats."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey").alias("approx_orders"),
        F.percentile_approx("l_extendedprice", 0.5).alias("approx_median_price"),
        F.percentile_approx("l_extendedprice", 0.99).alias("approx_p99_price"),
    )


@query(
    "agg_salted_skew",
    oracle=f"""
SELECT event_type, count(*) AS n, {rsum_sql("value")} AS total
FROM events
GROUP BY event_type
""",
)
def agg_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew idiom (SURVEY §4.1 shuffle row): two-phase salted aggregation —
    partial agg on (key, salt) spreads a hot key over N reducers, final agg
    merges. Result-identical to the plain group-by (the oracle proves it);
    AQE's skew-join handling covers joins, this covers aggregations."""
    ev = load(spark, sf_dir, "events")
    salted = ev.withColumn("_salt", F.pmod(F.col("event_id"), F.lit(SALT_BUCKETS)))
    partial = salted.groupBy("event_type", "_salt").agg(
        F.count(F.lit(1)).alias("n"), exact_sum("value").alias("total")
    )
    return partial.groupBy("event_type").agg(
        F.sum("n").alias("n"),
        F.round(F.sum("total"), 2).cast("double").alias("total"),
    )


@query(
    "join_salted_skew",
    oracle=f"""
SELECT n.n_name, count(*) AS n, {rsum_sql("e.value")} AS total
FROM events e JOIN nation n ON e.user_id % 25 = n.n_nationkey
GROUP BY n.n_name
""",
)
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew idiom, join edition (SURVEY §4.1): salt the fact side
    (pmod(event_id, SALT)), explode the dim side over the salt range, and
    equi-join on (key, salt) — a hot key spreads over SALT reducers instead
    of melting one. Result-identical to the plain join (the oracle IS the
    plain join). The shuffle-merge hint forces the shuffle path the idiom
    exists for — a broadcast-able dim wouldn't need salting."""
    ev = load(spark, sf_dir, "events").select(
        (F.col("user_id") % 25).alias("nk"),
        F.pmod(F.col("event_id"), F.lit(SALT_BUCKETS)).alias("_salt"),
        "value",
    )
    n = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("nk"),
        "n_name",
        F.explode(F.sequence(F.lit(0), F.lit(SALT_BUCKETS - 1))).alias("_salt"),
    )
    return (
        ev.join(n.hint("shuffle_merge"), ["nk", "_salt"])
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("n"), rsum("value").alias("total"))
    )
