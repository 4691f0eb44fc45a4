"""Breadth batch 10: local graph structure, HITS, and item-item recs.

- ``graph_clustering_coefficient`` — local clustering coefficient per
  node: lcc(v) = 2·tri(v) / (deg(v)·(deg(v)−1)) on the canonical
  undirected edge set (the per-NODE refinement of graph_triangle_count's
  global scalar — "how clique-like is each node's neighborhood", the
  community-structure diagnostic link-spam detection and graph-sampling
  audits both read). Emitted in exact integer millionths.
- ``graph_hits_hubs_auth`` — HITS hubs & authorities by synchronous
  fixed-point power iteration with max-normalization in integer
  arithmetic, oracle = one unrolled CTE pair per iteration (the
  bipartite-flavored sibling of graph_pagerank_topk: PageRank ranks by
  random-walk mass, HITS separates "points at good pages" from "is
  pointed at by good hubs"; reference has no graph analytics; this is a north-star
  extension, the two-sided generalization of a single-score rank).
- ``rec_item_covisitation`` — item-to-item collaborative filtering from
  order baskets: co-occurrence counts normalized by item frequencies
  (squared-cosine in exact integer millionths), top-3 recommendations
  per item. The classic "customers who bought X also bought Y"
  covisitation matrix, the workhorse candidate generator of large-scale
  recommenders.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nocouncil_etl_spark.io import load
from nocouncil_etl_spark.operators.graph import hits_fixed_point
from nocouncil_etl_spark.operators.recsys import covisitation_topk
from nocouncil_etl_spark.plans.graph_plans import _EDGES_SQL, _graph
from nocouncil_etl_spark.registry import query

LCC_SCALE = 1_000_000

HITS_ITERS = 4
HSCALE = 1_000_000  # hub/auth fixed-point scale; raw sums stay far below 2^63
HITS_TOPK = 15

REC_TOPK = 3
REC_SCALE = 1_000_000


# --------------------------------------------------------------------------
# 1. Local clustering coefficient
# --------------------------------------------------------------------------


@query(
    "graph_clustering_coefficient",
    oracle=f"""
WITH {_EDGES_SQL},
und AS (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b FROM edges0
),
sym AS (SELECT a AS u, b AS v FROM und UNION ALL SELECT b AS u, a AS v FROM und),
degu AS (SELECT u AS node, CAST(count(*) AS BIGINT) AS deg FROM sym GROUP BY u),
tri AS (
  SELECT e1.a AS x, e1.b AS y, e3.b AS z
  FROM und e1
  JOIN und e2 ON e2.a = e1.b
  JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b
),
corners AS (
  SELECT x AS node FROM tri
  UNION ALL SELECT y FROM tri
  UNION ALL SELECT z FROM tri
),
tv AS (SELECT node, CAST(count(*) AS BIGINT) AS tri FROM corners GROUP BY node)
SELECT d.node, d.deg, CAST(coalesce(t.tri, 0) AS BIGINT) AS tri,
       CAST((2 * coalesce(t.tri, 0) * {LCC_SCALE}) // (d.deg * (d.deg - 1))
            AS BIGINT) AS lcc_1e6
FROM degu d LEFT JOIN tv t ON d.node = t.node
WHERE d.deg >= 2
""",
)
def graph_clustering_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local clustering coefficient on the deterministic link graph
    (north-star extension; no reference analogue): per node,
    the fraction of its neighbor pairs that are themselves connected —
    2·tri(v)/(deg·(deg−1)) in exact integer millionths, nodes with
    undirected degree ≥ 2.

    Scale shape: the same canonical a<b<c wedge join as
    graph_triangle_count (bounded by Σ deg²), then each triangle explodes
    to its three corners and a map-side-combined count per node; degree is
    one hash-agg on the symmetrized edges. No per-node neighbor lists are
    ever materialized — the quadratic term stays inside the wedge join."""
    _, edges, _ = _graph(spark, sf_dir)
    und = edges.select(
        F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
    ).distinct()
    sym = und.select(F.col("a").alias("u")).unionByName(
        und.select(F.col("b").alias("u"))
    )
    deg = sym.groupBy(F.col("u").alias("node")).agg(
        F.count("*").cast("long").alias("deg")
    )
    e1 = und.select(F.col("a").alias("x"), F.col("b").alias("y"))
    e2 = und.select(F.col("a").alias("y"), F.col("b").alias("z"))
    e3 = und.select(F.col("a").alias("x"), F.col("b").alias("z"))
    tri = e1.join(e2, "y").join(e3, ["x", "z"])
    corners = (
        tri.select(F.col("x").alias("node"))
        .unionByName(tri.select(F.col("y").alias("node")))
        .unionByName(tri.select(F.col("z").alias("node")))
    )
    tv = corners.groupBy("node").agg(F.count("*").cast("long").alias("tri"))
    return (
        deg.join(tv, "node", "left")
        .withColumn("tri", F.coalesce(F.col("tri"), F.lit(0)).cast("long"))
        .filter(F.col("deg") >= 2)
        .select(
            "node",
            "deg",
            "tri",
            F.expr(f"(2 * tri * {LCC_SCALE}) div (deg * (deg - 1))")
            .cast("long")
            .alias("lcc_1e6"),
        )
    )


# --------------------------------------------------------------------------
# 2. HITS hubs & authorities
# --------------------------------------------------------------------------


def _hits_oracle() -> str:
    # araw{k}/hraw{k} are each referenced twice (normalizer + normalized
    # projection); MATERIALIZED stops DuckDB's CTE inlining from doubling
    # the tree per half-step (4^iters blowup — the same hazard the Spark
    # side dodges by fetching the max as a driver scalar per half-step).
    cte = [f"WITH {_EDGES_SQL},"]
    cte.append(f"hub0 AS (SELECT node, {HSCALE}::BIGINT AS h FROM nodes)")
    for k in range(HITS_ITERS):
        cte.append(f""",
araw{k} AS MATERIALIZED (
  SELECT n.node, CAST(coalesce(sum(h.h), 0) AS BIGINT) AS a
  FROM nodes n
  LEFT JOIN edges0 e ON e.dst = n.node
  LEFT JOIN hub{k} h ON h.node = e.src
  GROUP BY n.node
),
auth{k + 1} AS MATERIALIZED (
  SELECT node, (a * {HSCALE}) // (SELECT greatest(max(a), 1) FROM araw{k}) AS a
  FROM araw{k}
),
hraw{k} AS MATERIALIZED (
  SELECT n.node, CAST(coalesce(sum(a.a), 0) AS BIGINT) AS h
  FROM nodes n
  LEFT JOIN edges0 e ON e.src = n.node
  LEFT JOIN auth{k + 1} a ON a.node = e.dst
  GROUP BY n.node
),
hub{k + 1} AS MATERIALIZED (
  SELECT node, (h * {HSCALE}) // (SELECT greatest(max(h), 1) FROM hraw{k}) AS h
  FROM hraw{k}
)""")
    cte.append(f"""
SELECT node, auth_1e6, hub_1e6, rk FROM (
  SELECT a.node, a.a AS auth_1e6, h.h AS hub_1e6,
         CAST(row_number() OVER (ORDER BY a.a DESC, h.h DESC, a.node) AS INT) AS rk
  FROM auth{HITS_ITERS} a JOIN hub{HITS_ITERS} h ON a.node = h.node
) WHERE rk <= {HITS_TOPK}""")
    return "".join(cte)


@query("graph_hits_hubs_auth", oracle=_hits_oracle())
def graph_hits_hubs_auth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS on the directed link graph: {HITS_ITERS} synchronous iterations
    of auth(v) = Σ_in hub, hub(u) = Σ_out auth, each half-step
    max-normalized to the fixed-point scale in exact integer arithmetic
    (a·HSCALE // max) so the oracle's unrolled CTE pair per iteration
    value-hashes exactly. Top-{HITS_TOPK} by authority.

    Scale shape: per iteration two keyed agg+join rounds (the PageRank
    shape run twice) plus a 1-row max broadcast for the normalizer —
    no driver state beyond one scalar per half-step; integer
    normalization keeps every value ≤ HSCALE·max_degree, far from
    overflow, with no float drift across engines. State is persisted
    per iteration inside hits_fixed_point; like Engine.pagerank, the
    returned frame is backed by that cache and the caller owns the
    ``.unpersist()`` once consumed."""
    nodes, edges, _ = _graph(spark, sf_dir)
    scores = hits_fixed_point(
        nodes, edges.select("src", "dst"), HITS_ITERS, scale=HSCALE
    )
    joined = scores.select(
        "node", F.col("a").alias("auth_1e6"), F.col("h").alias("hub_1e6")
    )
    w = Window.orderBy(F.desc("auth_1e6"), F.desc("hub_1e6"), F.asc("node"))
    return (
        joined.select(
            "node",
            "auth_1e6",
            "hub_1e6",
            F.row_number().over(w).cast("int").alias("rk"),
        )
        .filter(F.col("rk") <= HITS_TOPK)
    )


# --------------------------------------------------------------------------
# 3. Item-item covisitation recommendations
# --------------------------------------------------------------------------


@query(
    "rec_item_covisitation",
    oracle=f"""
WITH basket AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS item FROM lineitem),
cnt AS (SELECT item, CAST(count(*) AS BIGINT) AS c FROM basket GROUP BY item),
pairs AS (
  SELECT a.item AS ia, b.item AS ib, CAST(count(*) AS BIGINT) AS co
  FROM basket a JOIN basket b ON a.ok = b.ok AND a.item < b.item
  GROUP BY a.item, b.item
),
sym AS (
  SELECT ia AS item, ib AS rec, co FROM pairs
  UNION ALL
  SELECT ib AS item, ia AS rec, co FROM pairs
),
scored AS (
  SELECT s.item, s.rec, s.co,
         (s.co * s.co * {REC_SCALE}) // (ca.c * cb.c) AS score_1e6
  FROM sym s
  JOIN cnt ca ON s.item = ca.item
  JOIN cnt cb ON s.rec = cb.item
)
SELECT item, rec, co, CAST(score_1e6 AS BIGINT) AS score_1e6, rk FROM (
  SELECT *, CAST(row_number() OVER (
      PARTITION BY item ORDER BY score_1e6 DESC, co DESC, rec) AS INT) AS rk
  FROM scored
) WHERE rk <= {REC_TOPK}
""",
)
def rec_item_covisitation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-to-item covisitation recommender from order baskets: parts
    co-occurring in the same order are scored co²·1e6/(cnt_a·cnt_b)
    (squared cosine of the binary item-order incidence vectors, in exact
    integer millionths — monotone in cosine, so the ranking is the
    cosine ranking), top-{REC_TOPK} recommendations per item with a
    total (score, co, rec-id) tie order.

    Scale shape: the basket self-join is keyed on the order id, so the
    quadratic term is bounded by the basket size (≤7 lineitems in
    TPC-H; real carts are similarly tiny) — never all-pairs over items;
    the co-count aggregation is map-side combinable; the two frequency
    joins are against the item dimension (broadcast-sized); top-k per
    item is one window over the scored pairs."""
    li = load(spark, sf_dir, "lineitem")
    return covisitation_topk(
        li, "l_orderkey", "l_partkey", REC_TOPK, scale=REC_SCALE
    )
