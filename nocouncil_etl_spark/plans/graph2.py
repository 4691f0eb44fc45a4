"""Graph batch 2: weighted single-source shortest paths.

``graph_sssp_weighted`` — multi-source Bellman-Ford over the deterministic
link graph (plans/graph_plans._EDGES_SQL) with integer edge weights
w(src,dst) = (src·7 + dst·13) mod 20 + 1: after R synchronous relaxation
rounds, report the distance histogram. Completes the graph family
(PageRank / triangles / degrees / k-core / BFS / link-pred) with the
weighted-reachability primitive behind latency maps and cost-bounded
crawls.

All-integer labels ⇒ every round is bit-identical across engines, so the
oracle unrolls one CTE block per round — the PageRank/BFS technique.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nocouncil_etl_spark.plans.graph_plans import _EDGES_SQL, _graph
from nocouncil_etl_spark.registry import query

SSSP_ROUNDS = 6
SEED_MOD = 101  # node % 101 == 0 → the source set (BFS uses the same seeds)
W_MOD, W_A, W_B = 20, 7, 13  # weight = (src*7 + dst*13) % 20 + 1


def _sssp_oracle() -> str:
    cte = [f"WITH {_EDGES_SQL},"]
    cte.append(f"""
we AS (
  SELECT src, dst, (src * {W_A} + dst * {W_B}) % {W_MOD} + 1 AS w FROM edges0
),
d0 AS (
  SELECT node, CASE WHEN node % {SEED_MOD} = 0 THEN 0 END AS d FROM nodes
)""")
    for k in range(SSSP_ROUNDS):
        cte.append(f""",
p{k} AS (
  SELECT e.dst AS node, min(d.d + e.w) AS nd
  FROM we e JOIN d{k} d ON e.src = d.node
  WHERE d.d IS NOT NULL GROUP BY e.dst
),
d{k + 1} AS (
  SELECT n.node,
         CASE WHEN n.d IS NULL THEN p.nd
              WHEN p.nd IS NULL THEN n.d
              ELSE least(n.d, p.nd) END AS d
  FROM d{k} n LEFT JOIN p{k} p ON n.node = p.node
)""")
    cte.append(f"""
SELECT CAST(coalesce(d, -1) AS BIGINT) AS dist,
       CAST(count(*) AS BIGINT) AS n_nodes,
       CAST(min(node) AS BIGINT) AS sample_node
FROM d{SSSP_ROUNDS} GROUP BY 1""")
    return "".join(cte)


@query("graph_sssp_weighted", oracle=_sssp_oracle())
def graph_sssp_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-source weighted shortest paths: {SSSP_ROUNDS} synchronous
    Bellman-Ford rounds (d(v) ← min(d(v), min over in-edges d(u) + w)) from
    the node % {SEED_MOD} = 0 seed set, integer weights in [1, {W_MOD}].
    Unreached nodes report −1. Bounded rounds = bounded-lineage, the same
    contract as PageRank/BFS; at diameter-exceeding round counts the last
    rounds relax nothing and cost one no-op join each.

    Scale shape: per round one equi-join (edges ⋈ frontier on src) + one
    map-side-combined min keyed by dst + one left join back; state is one
    row per node, weights are computed inline (no weight table to store).
    """
    nodes, edges, _ = _graph(spark, sf_dir)
    we = edges.select(
        "src",
        "dst",
        ((F.col("src") * W_A + F.col("dst") * W_B) % W_MOD + 1).alias("w"),
    )
    dist = nodes.withColumn(
        "d", F.when(F.col("node") % SEED_MOD == 0, F.lit(0))
    )
    for _ in range(SSSP_ROUNDS):
        prop = (
            we.join(dist, we["src"] == dist["node"])
            .filter(F.col("d").isNotNull())
            .select("dst", (F.col("d") + F.col("w")).alias("nd"))
            .groupBy("dst")
            .agg(F.min("nd").alias("nd"))
        )
        dist = dist.join(prop, dist["node"] == prop["dst"], "left").select(
            "node",
            F.when(F.col("d").isNull(), F.col("nd"))
            .when(F.col("nd").isNull(), F.col("d"))
            .otherwise(F.least("d", "nd"))
            .alias("d"),
        )
    return dist.groupBy(
        F.coalesce("d", F.lit(-1)).cast("long").alias("dist")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes"),
        F.min("node").cast("long").alias("sample_node"),
    )
