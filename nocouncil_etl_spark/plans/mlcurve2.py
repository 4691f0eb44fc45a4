"""ML-evaluation wave 2: non-parametric classification and interval algebra.

- ``ml_knn_classifier_eval`` — leave-one-out k-NN majority-vote
  classification on the labeled embeddings: each query point (vec_id %
  QUERY_MOD) takes its 5 nearest neighbors' majority label (ties → lower
  label, the total order), scored against the truth — the lazy-learner
  diagnostic that separates LOCAL label structure from global: on this
  corpus it scores ~chance while the centroid model reaches 41%
  (ml_learning_curve_centroid), i.e. the labels are linearly separable in
  the mean but not neighborhood-clustered — exactly the distinction this
  pair of evaluations exists to expose.
- ``fn_intervals_coalesce`` — merge overlapping intervals (order
  fulfillment windows per customer): the gaps-and-islands kernel applied
  to (start, end) INTERVALS rather than event points (sessionize_batch is
  the point-wise sibling) — the relational-algebra classic behind
  availability/coverage/dedup-by-validity computations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nocouncil_etl_spark.io import load
from nocouncil_etl_spark.registry import query

KNN_K = 5
QUERY_MOD = 20  # denser query set than the knn ladder: 25 queries at sf0.01


@query(
    "ml_knn_classifier_eval",
    oracle=f"""
WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
scored AS (
  SELECT a.vec_id AS q_id, a.label AS actual, b.label AS nlabel,
         round(list_dot_product(a.v, b.v)
               / (sqrt(list_dot_product(a.v, a.v))
                  * sqrt(list_dot_product(b.v, b.v))), 6) AS sim,
         b.vec_id AS c_id
  FROM (SELECT * FROM e WHERE vec_id % {QUERY_MOD} = 0) a
  JOIN e b ON a.vec_id <> b.vec_id
),
topk AS (
  SELECT q_id, actual, nlabel FROM (
    SELECT q_id, actual, nlabel,
           row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, c_id) AS rk
    FROM scored
  ) WHERE rk <= {KNN_K}
),
votes AS (
  SELECT q_id, actual, nlabel, CAST(count(*) AS BIGINT) AS c
  FROM topk GROUP BY q_id, actual, nlabel
),
pred AS (
  SELECT q_id, actual, nlabel AS predicted FROM (
    SELECT q_id, actual, nlabel,
           row_number() OVER (PARTITION BY q_id ORDER BY c DESC, nlabel) AS rn
    FROM votes
  ) WHERE rn = 1
)
SELECT CAST(count(*) AS BIGINT) AS n_queries,
       CAST(sum(CASE WHEN predicted = actual THEN 1 ELSE 0 END) AS BIGINT)
         AS n_correct,
       round(sum(CASE WHEN predicted = actual THEN 1 ELSE 0 END)
             / CAST(count(*) AS DOUBLE), 6) AS accuracy
FROM pred
""",
)
def ml_knn_classifier_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out {KNN_K}-NN majority-vote accuracy on the labeled
    embeddings (queries = vec_id % {QUERY_MOD}, self excluded): cosine
    top-{KNN_K} by (sim desc, id), majority label with (count desc, label)
    ties — every ordering total, so the vote is engine-exact. The
    no-training baseline for "is this embedding space linearly usable":
    compare against ml_learning_curve_centroid's 100% stage.

    Scale shape: the exact scoring stage rides knn_exact_blocked (the
    engine's Arrow-batched matmul exact path — corpus streams once,
    per-batch top-k, final window over <= (k+1)|Q| n_batches rows) with
    its built-in self-exclusion = leave-one-out, identical (sim desc,
    c_id) tie-break and Spark-rule rounding. The interpreted all-pairs
    expression cosine it replaces was 126x wall at 10x data (952 s at
    sf1 -> ~4 s). The production path swaps in the banded index
    candidates (vec_knn_from_index) with identical vote logic
    downstream — top-k + two windowed aggs, both query-partitioned."""
    from nocouncil_etl_spark.operators.similarity import knn_exact_blocked

    e = load(spark, sf_dir, "embeddings").select(
        "vec_id",
        "label",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    q = e.filter(F.col("vec_id") % QUERY_MOD == 0).select(
        F.col("vec_id").alias("q_id"),
        F.col("label").alias("actual"),
        F.col("v").alias("q_vec"),
    )
    knn = knn_exact_blocked(
        q.select("q_id", "q_vec"),
        e.select(F.col("vec_id").alias("c_id"), F.col("v").alias("c_vec")),
        KNN_K,
    )
    topk = (
        knn.join(
            e.select(F.col("vec_id").alias("c_id"), F.col("label").alias("nlabel")),
            "c_id",
        )
        .join(q.select("q_id", "actual"), "q_id")
        .select("q_id", "actual", "nlabel")
    )
    votes = topk.groupBy("q_id", "actual", "nlabel").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    pred = (
        votes.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("q_id").orderBy(F.desc("c"), "nlabel")
            ),
        )
        .filter(F.col("rn") == 1)
        .select("q_id", "actual", F.col("nlabel").alias("predicted"))
    )
    return pred.agg(
        F.count(F.lit(1)).cast("long").alias("n_queries"),
        F.sum(F.when(F.col("predicted") == F.col("actual"), 1).otherwise(0))
        .cast("long")
        .alias("n_correct"),
        F.round(
            F.sum(
                F.when(F.col("predicted") == F.col("actual"), 1).otherwise(0)
            )
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("accuracy"),
    )


FULFILL_DAYS = 7


@query(
    "fn_intervals_coalesce",
    oracle=f"""
WITH iv AS (
  SELECT o_custkey AS custkey,
         CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS s,
         CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT)
           + {FULFILL_DAYS} AS e
  FROM orders
),
marked AS (
  SELECT custkey, s, e,
         CASE WHEN s <= coalesce(max(e) OVER (PARTITION BY custkey ORDER BY s, e
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
              THEN 0 ELSE 1 END AS new_island
  FROM iv
),
islands AS (
  SELECT custkey, s, e,
         CAST(sum(new_island) OVER (PARTITION BY custkey ORDER BY s, e
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS island
  FROM marked
),
merged AS (
  SELECT custkey, island,
         CAST(min(s) AS BIGINT) AS start_day, CAST(max(e) AS BIGINT) AS end_day,
         CAST(count(*) AS BIGINT) AS n_orders
  FROM islands GROUP BY custkey, island
)
SELECT custkey,
       CAST(count(*) AS BIGINT) AS n_intervals,
       CAST(sum(end_day - start_day) AS BIGINT) AS covered_days,
       CAST(sum(n_orders) AS BIGINT) AS n_orders,
       CAST(max(end_day - start_day) AS BIGINT) AS longest_interval
FROM merged GROUP BY custkey
""",
)
def fn_intervals_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Coalesce overlapping fulfillment windows (order date + {FULFILL_DAYS}
    days) per customer into maximal disjoint intervals — the
    gaps-and-islands kernel on INTERVALS: a row starts a new island iff
    its start exceeds the running max end of everything before it (the
    running max handles contained intervals that a lag-based version
    misses). Emits per customer: merged-interval count, covered days,
    order count, longest stretch.

    Scale shape: one partitioned sort per customer + two running windows
    + a rollup — all key-partitioned, no global sort, no join."""
    o = load(spark, sf_dir, "orders")
    iv = o.select(
        F.col("o_custkey").alias("custkey"),
        F.datediff(F.to_date("o_orderdate"), F.lit("1970-01-01").cast("date"))
        .cast("long")
        .alias("s"),
    ).select("custkey", "s", (F.col("s") + FULFILL_DAYS).alias("e"))
    w = Window.partitionBy("custkey").orderBy("s", "e")
    marked = iv.select(
        "custkey",
        "s",
        "e",
        F.when(
            F.col("s")
            <= F.coalesce(
                F.max("e").over(
                    w.rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(-1),
            ),
            0,
        )
        .otherwise(1)
        .alias("new_island"),
    )
    islands = marked.select(
        "custkey",
        "s",
        "e",
        F.sum("new_island")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("long")
        .alias("island"),
    )
    merged = islands.groupBy("custkey", "island").agg(
        F.min("s").cast("long").alias("start_day"),
        F.max("e").cast("long").alias("end_day"),
        F.count(F.lit(1)).cast("long").alias("n_orders"),
    )
    return merged.groupBy("custkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_intervals"),
        F.sum(F.col("end_day") - F.col("start_day"))
        .cast("long")
        .alias("covered_days"),
        F.sum("n_orders").cast("long").alias("n_orders"),
        F.max(F.col("end_day") - F.col("start_day"))
        .cast("long")
        .alias("longest_interval"),
    )
