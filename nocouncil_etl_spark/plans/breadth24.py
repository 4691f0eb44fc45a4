"""Breadth batch 24 (round 6): shortest-path flow, windowFunnel depth.

- ``graph_shortest_path_flow`` — which edges carry the shortest s→t paths,
  and how many each: forward BFS accumulates σ (path counts from s),
  reverse level-restricted accumulation gives τ (path counts to t), and an
  edge on the shortest-path DAG carries σ(u)·τ(v) paths — the integer
  two-sided-count core of Brandes betweenness, exact with no fractions.
- ``window_funnel_depth``     — ClickHouse windowFunnel semantics: the
  longest strictly-ordered prefix of [view, click, signup, purchase]
  completed within a window of the first step, per user (earliest-chain
  greedy, so both engines agree deterministically).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nocouncil_etl_spark.io import load
from nocouncil_etl_spark.plans.graph_plans import _EDGES_SQL, _graph
from nocouncil_etl_spark.registry import query

# --------------------------------------------------------------------------
# 1. shortest-path edge flow (σ·τ on the BFS DAG)
# --------------------------------------------------------------------------

SPF_SOURCE = 0
SPF_LEVELS = 4  # BFS depth bound; t = smallest node at the deepest level


def _spf_oracle() -> str:
    cte = [f"WITH {_EDGES_SQL},"]
    cte.append(f"""
lvl0 AS (SELECT {SPF_SOURCE}::BIGINT AS node, 0 AS lvl, 1::BIGINT AS sigma)""")
    for k in range(SPF_LEVELS):
        cte.append(f""",
seen{k} AS MATERIALIZED (SELECT node FROM ({" UNION ALL ".join(f"SELECT node FROM lvl{j}" for j in range(k + 1))})),
lvl{k + 1} AS MATERIALIZED (
  SELECT e.dst AS node, {k + 1} AS lvl, CAST(sum(p.sigma) AS BIGINT) AS sigma
  FROM edges0 e
  JOIN lvl{k} p ON e.src = p.node
  WHERE e.dst NOT IN (SELECT node FROM seen{k})
  GROUP BY e.dst
)""")
    all_lvls = " UNION ALL ".join(
        f"SELECT * FROM lvl{j}" for j in range(SPF_LEVELS + 1)
    )
    cte.append(f""",
bfs AS MATERIALIZED ({all_lvls}),
tgt AS MATERIALIZED (
  SELECT node AS t, lvl AS tl FROM bfs
  WHERE lvl = (SELECT max(lvl) FROM bfs)
  ORDER BY node LIMIT 1
),
tau{SPF_LEVELS} AS MATERIALIZED (
  SELECT b.node, 1::BIGINT AS tau FROM bfs b JOIN tgt ON b.node = tgt.t
)""")
    for k in range(SPF_LEVELS, 0, -1):
        cte.append(f""",
tau{k - 1} AS MATERIALIZED (
  SELECT bu.node, CAST(sum(t.tau) AS BIGINT) AS tau
  FROM bfs bu
  JOIN edges0 e ON e.src = bu.node
  JOIN bfs bv ON bv.node = e.dst AND bv.lvl = bu.lvl + 1
  JOIN tau{k} t ON t.node = bv.node
  WHERE bu.lvl = (SELECT tl FROM tgt) - {SPF_LEVELS - k + 1}
  GROUP BY bu.node
)""")
    all_taus = " UNION ALL ".join(
        f"SELECT * FROM tau{j}" for j in range(SPF_LEVELS + 1)
    )
    cte.append(f"""
SELECT e.src, e.dst, CAST(bs.sigma * td.tau AS BIGINT) AS flow
FROM edges0 e
JOIN bfs bs ON bs.node = e.src
JOIN bfs bd ON bd.node = e.dst AND bd.lvl = bs.lvl + 1
JOIN ({all_taus}) ts ON ts.node = e.src
JOIN ({all_taus}) td ON td.node = e.dst
WHERE bd.lvl <= (SELECT tl FROM tgt)""")
    return "".join(cte)


@query("graph_shortest_path_flow", oracle=_spf_oracle())
def graph_shortest_path_flow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shortest-path edge flow from source {SPF_SOURCE} to the
    deterministic target t (smallest node at the deepest BFS level within
    {SPF_LEVELS}): forward level-synchronous BFS accumulates σ(v) = the
    number of shortest s→v paths (integer sums over the frontier), the
    reverse pass accumulates τ(u) = shortest u→t path counts down the
    level-respecting DAG, and every DAG edge (u,v) with both endpoints on
    some s→t shortest path carries σ(u)·τ(v) of them. This is the exact
    integer core of Brandes' betweenness (the δ accumulation is these
    products normalized) — kept fraction-free so the unrolled-CTE oracle
    hash-matches. Output: (src, dst, flow) for shortest-path-DAG edges
    reachable in both directions.

    Scale shape: each BFS level is one frontier⋈edges equi-join +
    map-side-combined sum + an anti-join against the visited set; the
    reverse pass is the same shape down the levels. State per level is
    one row per reached node."""
    nodes, edges, _ = _graph(spark, sf_dir)
    e0 = edges.select("src", "dst").localCheckpoint(eager=False)

    frontier = spark.createDataFrame(
        [(SPF_SOURCE, 0, 1)], "node long, lvl int, sigma long"
    )
    bfs = frontier
    for k in range(SPF_LEVELS):
        nxt = (
            e0.join(frontier, e0.src == frontier.node)
            .select(F.col("dst").alias("node"), F.col("sigma"))
            .join(bfs.select("node").distinct(), "node", "left_anti")
            .groupBy("node")
            .agg(F.sum("sigma").cast("long").alias("sigma"))
            .select("node", F.lit(k + 1).alias("lvl"), "sigma")
        )
        frontier = nxt.localCheckpoint(eager=True)
        bfs = bfs.unionByName(frontier).localCheckpoint(eager=True)

    tl, t = (
        bfs.orderBy(F.desc("lvl"), F.asc("node"))
        .select("lvl", "node")
        .first()
    )
    tau = spark.createDataFrame([(int(t), 1)], "node long, tau long")
    taus = tau
    lv = bfs.select("node", "lvl")
    for back in range(1, SPF_LEVELS + 1):
        cur_lvl = tl - back
        if cur_lvl < 0:
            break
        prev = tau
        tau = (
            lv.filter(F.col("lvl") == cur_lvl)
            .join(e0, lv.node == e0.src)
            .join(
                lv.select(F.col("node").alias("dn"), F.col("lvl").alias("dl")),
                (F.col("dst") == F.col("dn")) & (F.col("dl") == cur_lvl + 1),
            )
            .join(prev.select(F.col("node").alias("dn"), "tau"), "dn")
            .groupBy(lv.node)
            .agg(F.sum("tau").cast("long").alias("tau"))
            .localCheckpoint(eager=True)
        )
        taus = taus.unionByName(tau)

    sig = bfs.select("node", "lvl", "sigma")
    return (
        e0.join(
            sig.select(
                F.col("node").alias("src"), F.col("lvl").alias("sl"),
                F.col("sigma").alias("sg"),
            ),
            "src",
        )
        .join(
            sig.select(F.col("node").alias("dst"), F.col("lvl").alias("dl")),
            "dst",
        )
        .filter((F.col("dl") == F.col("sl") + 1) & (F.col("dl") <= tl))
        .join(taus.select(F.col("node").alias("src"), F.col("tau").alias("ts")), "src")
        .join(taus.select(F.col("node").alias("dst"), F.col("tau").alias("td")), "dst")
        .select(
            "src", "dst", (F.col("sg") * F.col("td")).cast("long").alias("flow")
        )
    )


# --------------------------------------------------------------------------
# 2. windowFunnel depth
# --------------------------------------------------------------------------

FUNNEL_STEPS = ["view", "click", "signup", "purchase"]
FUNNEL_WINDOW_US = 7 * 24 * 3600 * 1_000_000  # 7 days from the first step


@query(
    "window_funnel_depth",
    oracle=f"""
WITH ev AS (
  SELECT user_id, event_type, epoch_us(ts) AS t_us FROM events
),
s1 AS (
  SELECT user_id, min(t_us) AS t1 FROM ev
  WHERE event_type = '{FUNNEL_STEPS[0]}' GROUP BY user_id
),
s2 AS (
  SELECT e.user_id, min(e.t_us) AS t2
  FROM ev e JOIN s1 ON e.user_id = s1.user_id
  WHERE e.event_type = '{FUNNEL_STEPS[1]}' AND e.t_us > s1.t1
    AND e.t_us <= s1.t1 + {FUNNEL_WINDOW_US}
  GROUP BY e.user_id
),
s3 AS (
  SELECT e.user_id, min(e.t_us) AS t3
  FROM ev e JOIN s1 ON e.user_id = s1.user_id
  JOIN s2 ON e.user_id = s2.user_id
  WHERE e.event_type = '{FUNNEL_STEPS[2]}' AND e.t_us > s2.t2
    AND e.t_us <= s1.t1 + {FUNNEL_WINDOW_US}
  GROUP BY e.user_id
),
s4 AS (
  SELECT e.user_id, min(e.t_us) AS t4
  FROM ev e JOIN s1 ON e.user_id = s1.user_id
  JOIN s3 ON e.user_id = s3.user_id
  WHERE e.event_type = '{FUNNEL_STEPS[3]}' AND e.t_us > s3.t3
    AND e.t_us <= s1.t1 + {FUNNEL_WINDOW_US}
  GROUP BY e.user_id
)
SELECT s1.user_id,
       CAST(1 + (s2.user_id IS NOT NULL)::INT + (s3.user_id IS NOT NULL)::INT
              + (s4.user_id IS NOT NULL)::INT AS INT) AS depth,
       s1.t1 AS t1_us,
       CAST(coalesce(s4.t4, s3.t3, s2.t2, s1.t1) - s1.t1 AS BIGINT) AS span_us
FROM s1
LEFT JOIN s2 ON s1.user_id = s2.user_id
LEFT JOIN s3 ON s1.user_id = s3.user_id
LEFT JOIN s4 ON s1.user_id = s4.user_id
""",
)
def window_funnel_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse-style windowFunnel: per user, the longest strictly
    ordered prefix of {FUNNEL_STEPS} completed within {FUNNEL_WINDOW_US}µs
    of the FIRST step, using the earliest-chain greedy (step k+1 = the
    earliest qualifying event after step k) — deterministic, so both
    engines compute the identical chain. Output: depth 1-4, first-step
    time, chain span. funnel_conversion counts stage populations; this
    reports each user's exact progression depth — the per-user funnel
    primitive sequence analyses build on.

    Scale shape: four conditional min-aggregations keyed on user_id,
    each joined to the previous step's (user, time) — all
    hash-partitioned on the same key, so at 100 TB the chain resolves in
    one shuffle's partitioning reused four times. No window sorts, no
    per-user state."""
    ev = load(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_micros("ts").alias("t_us")
    )
    s1 = (
        ev.filter(F.col("event_type") == FUNNEL_STEPS[0])
        .groupBy("user_id")
        .agg(F.min("t_us").alias("t1"))
    )
    prev = s1
    steps = [s1]
    bound = F.col("t1") + FUNNEL_WINDOW_US
    for i, step in enumerate(FUNNEL_STEPS[1:], start=2):
        tprev = f"t{i - 1}"
        cur = (
            ev.filter(F.col("event_type") == step)
            .join(prev, "user_id")
            .filter(
                (F.col("t_us") > F.col(tprev)) & (F.col("t_us") <= bound)
            )
            .groupBy("user_id", "t1")
            .agg(F.min("t_us").alias(f"t{i}"))
        )
        steps.append(cur)
        prev = cur
    out = steps[0]
    for i, cur in enumerate(steps[1:], start=2):
        out = out.join(
            cur.select("user_id", f"t{i}"), "user_id", "left"
        )
    depth = (
        F.lit(1)
        + F.col("t2").isNotNull().cast("int")
        + F.col("t3").isNotNull().cast("int")
        + F.col("t4").isNotNull().cast("int")
    )
    return out.select(
        "user_id",
        depth.cast("int").alias("depth"),
        F.col("t1").alias("t1_us"),
        (F.coalesce("t4", "t3", "t2", "t1") - F.col("t1"))
        .cast("long")
        .alias("span_us"),
    )
