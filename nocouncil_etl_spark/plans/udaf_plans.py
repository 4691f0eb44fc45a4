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


APPROX_EPS = 0.05   # HLL++ bound: rsd=1% sketch checked against a 5% fence
RANK_EPS = 0.005    # quantile bound: estimate's true rank within p ± 0.5%


@query(
    "agg_approx_sketches",
    oracle="""
SELECT l_returnflag,
       count(DISTINCT l_orderkey) AS exact_orders,
       TRUE AS hll_ok, TRUE AS median_ok, TRUE AS p99_ok
FROM lineitem GROUP BY l_returnflag
""",
)
def agg_approx_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate-aggregate surface (SURVEY §2.7 note): HLL++ distinct and
    approximate quantiles. Sketch values are engine-specific so they can't
    hash-match — instead the query emits the EXACT distinct counts plus
    booleans asserting each estimate sits within its error bound, and the
    oracle pins the exact values and literal TRUEs: an out-of-bound sketch
    flips a boolean and fails the value hash (the KMV-sketch pattern,
    plans/analytics4.py).

    The quantile bound is a RANK check, not a value check: re-scan the
    column counting values ≤ the estimate and assert that fraction lands in
    p ± {RANK_EPS} — exactly the guarantee percentile_approx makes
    (Greenwald-Khanna rank error ≤ 1/accuracy). The naive alternative —
    computing the EXACT percentile to compare against — materializes every
    group's values in the aggregation buffer and measured 52 s at sf0.1
    (vs <1 s for this shape); rank-checking is one broadcast join + a
    linear scan, the only way to verify a quantile sketch at 100 TB.

    Scale shape: one hash agg for the sketches (+ the distinct shuffle for
    the exact HLL twin — the term the sketch exists to avoid), then one
    broadcast of the 3-row estimate table back over the scan. The sketch
    agg and the countDistinct agg are SEPARATE aggregations joined on the
    3-row key on purpose: fusing them puts the HLL register merge and both
    GK percentile buffers inside countDistinct's Expand rewrite and the
    generated code blows up janino compile to ~49 s (measured at sf0.1);
    split, the whole query is ~4 s cold and 0.1 s warm."""
    li = load(spark, sf_dir, "lineitem").select("l_returnflag", "l_orderkey",
                                                "l_extendedprice")
    sketches = li.groupBy("l_returnflag").agg(
        # rsd=1% => the 5% fence is ~5 sigma: deterministic headroom (the
        # default 5% rsd measured an 8.6% miss on one group at sf0.01)
        F.approx_count_distinct("l_orderkey", rsd=0.01).alias("est_orders"),
        F.percentile_approx("l_extendedprice", 0.5).alias("est_med"),
        F.percentile_approx("l_extendedprice", 0.99).alias("est_p99"),
    )
    exact = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_orderkey").alias("exact_orders"),
    )
    est = sketches.join(exact, "l_returnflag")
    ranked = (
        li.join(F.broadcast(est), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(
            F.first("exact_orders").alias("exact_orders"),
            F.first("est_orders").alias("est_orders"),
            F.avg((F.col("l_extendedprice") <= F.col("est_med")).cast("double"))
            .alias("frac_med"),
            F.avg((F.col("l_extendedprice") <= F.col("est_p99")).cast("double"))
            .alias("frac_p99"),
        )
    )
    return ranked.select(
        "l_returnflag",
        "exact_orders",
        (
            F.abs(F.col("est_orders") - F.col("exact_orders"))
            / F.col("exact_orders")
            <= APPROX_EPS
        ).alias("hll_ok"),
        F.col("frac_med").between(0.5 - RANK_EPS, 0.5 + RANK_EPS).alias("median_ok"),
        F.col("frac_p99").between(0.99 - RANK_EPS, 0.99 + RANK_EPS).alias("p99_ok"),
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
