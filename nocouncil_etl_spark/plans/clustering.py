"""Trained fixed-k clustering (operators/kmeans.py) — the round-5 headline.

``cluster_kmeans_fixed`` runs a genuinely iterative, distributed Lloyd's
k-means and still gets an exact value-hash oracle: every update is integer
arithmetic on a quantized grid, so the DuckDB side can replay the identical
recurrence as one unrolled CTE block per iteration — the same technique the
PageRank oracle uses (plans/graph_plans.py:48).

Why it matters at 100 TB: k is a CONSTANT chosen up front (guarded by
operators/kmeans.MAX_CENTROIDS), so nearest-centroid assignment is O(n·k)
with a fixed-size task closure — unlike a corpus-sampled centroid set whose
k grows with n (the round-4 SemDeDup flaw this replaces). The reference's
index adapts to its data the same way (HNSW builds from the actual vectors,
vectorize.py:119-123); training centroids is the Spark-shaped analogue.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nocouncil_etl_spark.io import load
from nocouncil_etl_spark.operators.kmeans import (
    OFFSET,
    QUANT,
    assign_l2,
    kmeans_fit,
    quantize_vectors,
)
from nocouncil_etl_spark.registry import query

K = 16
ITERS = 4
DIMS = 64

_QUANT_LAMBDA = (
    f"x -> CAST(round(x * {QUANT}) AS BIGINT) + {OFFSET}"
)


def quantize_sql(vec_expr: str) -> str:
    """DuckDB twin of operators/kmeans.quantize_vectors."""
    return f"list_transform({vec_expr}, {_QUANT_LAMBDA})"


def kmeans_cte(src: str, k: int, iters: int, dims: int = DIMS) -> str:
    """Unrolled Lloyd's CTE block over a prior CTE ``src`` with columns
    (vec_id, xq BIGINT[]). Emits ``cent0``..``cent{iters}`` and the final
    assignment ``asg_final(vid, cid, dist)`` — the exact recurrence the
    Spark operator runs (seeds = first k in (md5(id), id) order; integer
    squared-L2 argmin tie-broken on cid; floor-division centroid means;
    empty clusters carry forward). Caller splices this after its own WITH
    entries and selects from cent{iters}/asg_final."""
    dist = (
        f"CAST(list_sum(list_transform(range(1, {dims + 1}), "
        f"i -> (p.xq[i] - c.cv[i]) * (p.xq[i] - c.cv[i]))) AS BIGINT)"
    )
    parts = [
        f"""
cent0 AS (
  SELECT CAST(row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id)
         AS BIGINT) AS cid, xq AS cv
  FROM {src} QUALIFY cid <= {k}
)"""
    ]
    for t in range(iters):
        parts.append(f""",
scored{t} AS (
  SELECT p.vec_id AS vid, c.cid, {dist} AS dist
  FROM {src} p CROSS JOIN cent{t} c
),
asg{t} AS (
  SELECT vid, cid FROM (
    SELECT vid, cid,
           row_number() OVER (PARTITION BY vid ORDER BY dist, cid) AS rn
    FROM scored{t}
  ) WHERE rn = 1
),
sums{t} AS (
  SELECT cid, pos, CAST(sum(val) AS BIGINT) AS s, count(*) AS n FROM (
    SELECT a.cid, generate_subscripts(p.xq, 1) AS pos, unnest(p.xq) AS val
    FROM asg{t} a JOIN {src} p ON a.vid = p.vec_id
  ) GROUP BY cid, pos
),
cent{t + 1} AS (
  SELECT cid, list(CAST(s // n AS BIGINT) ORDER BY pos) AS cv
  FROM sums{t} GROUP BY cid
  UNION ALL
  SELECT c.cid, c.cv FROM cent{t} c
  WHERE c.cid NOT IN (SELECT cid FROM sums{t})
)""")
    parts.append(f""",
scoredF AS (
  SELECT p.vec_id AS vid, c.cid, {dist} AS dist
  FROM {src} p CROSS JOIN cent{iters} c
),
asg_final AS (
  SELECT vid, cid, dist FROM (
    SELECT vid, cid, dist,
           row_number() OVER (PARTITION BY vid ORDER BY dist, cid) AS rn
    FROM scoredF
  ) WHERE rn = 1
)""")
    return "".join(parts)


@query(
    "cluster_kmeans_fixed",
    oracle=f"""
WITH base AS (
  SELECT vec_id, {quantize_sql("embedding::DOUBLE[]")} AS xq FROM embeddings
),
{kmeans_cte("base", K, ITERS)},
centf AS (
  SELECT cid, CAST(list_sum(cv) AS BIGINT) AS cv_sum FROM cent{ITERS}
)
SELECT c.cid AS cluster_id, c.cv_sum,
       count(a.vid) AS n_points,
       CAST(coalesce(sum(a.dist), 0) AS BIGINT) AS inertia
FROM centf c LEFT JOIN asg_final a ON c.cid = a.cid
GROUP BY c.cid, c.cv_sum
""",
)
def cluster_kmeans_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-k (k=16), fixed-iteration (4) Lloyd's k-means over the
    embeddings table, reported as per-cluster accounting: size, centroid
    checksum (sum of quantized dims), and integer inertia (Σ squared L2 of
    members to their final centroid). The oracle replays the identical
    integer recurrence as 4 unrolled CTE blocks — an exact check of an
    iterative distributed clustering, like the PageRank oracle.

    Scale shape: per iteration, one narrow Arrow assignment pass (k×dim
    closure, MAX_CENTROIDS-guarded) + one posexplode agg combined map-side
    into k·dim groups; only k·dim rows reach the driver per iteration. k is
    data-independent, so the plan is linear in n at any corpus size."""
    e = load(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    eq = quantize_vectors(e, "v", "xq").select("vec_id", "xq").persist()
    try:
        cent_ids, cm = kmeans_fit(eq, K, ITERS)
        asg = assign_l2(eq, cent_ids, cm, with_dist=True)
        stats = asg.groupBy("cid").agg(
            F.count(F.lit(1)).alias("n_points"), F.sum("dist").alias("inertia")
        )
        cent = spark.createDataFrame(
            [(int(c), int(cm[i].sum())) for i, c in enumerate(cent_ids)],
            "cid long, cv_sum long",
        )
        return (
            cent.join(stats, "cid", "left")
            .select(
                F.col("cid").alias("cluster_id"),
                "cv_sum",
                F.coalesce("n_points", F.lit(0)).alias("n_points"),
                F.coalesce("inertia", F.lit(0)).alias("inertia"),
            )
        )
    finally:
        eq.unpersist()
