"""Breadth batch 42 (round 6): Brandes betweenness, doubly-robust OPE,
time-decay totals, partition-skew report, residual VQ, MASE.

Six operators (reference scope: which pages broker the crawl graph,
trustworthy off-policy values, recency-weighted accounting, join-key
health reports, cheap vector compression, and scale-free forecast
scoring):

- ``graph_betweenness_sampled`` — single-source Brandes dependency
  accumulation (fixed 6-layer BFS both ways, quantized deltas) — the
  sampled-source betweenness estimator.
- ``eval_doubly_robust_value`` — doubly-robust off-policy estimate
  (direct method + IPS residual correction) beside both components.
- ``agg_time_decay_totals``  — exponential time-decay weighted revenue
  per type with an exact fixed-point weight table.
- ``dq_partition_skew``      — join-key distribution health: top key,
  max share, p99/p50 skew ratio from the bounded count-of-counts.
- ``vec_rq_two_stage``       — two-stage residual vector quantization
  with fixed deterministic codebooks; per-stage MSE must shrink.
- ``eval_forecast_mase``     — mean absolute scaled error of the
  weekday-baseline forecast against the naive one-step MAE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nocouncil_etl_spark.io import load
from nocouncil_etl_spark.plans.breadth15 import _pt, _pt_sql
from nocouncil_etl_spark.plans.graph_plans import _EDGES_SQL, _graph
from nocouncil_etl_spark.registry import query

# --------------------------------------------------------------------------
# 1. Single-source Brandes betweenness
# --------------------------------------------------------------------------

BC_LAYERS = 6
BC_TOP = 10


def _bc_oracle() -> str:
    parts = [
        f"WITH {_EDGES_SQL}",
        """sym AS MATERIALIZED (
  SELECT src AS u, dst AS v FROM (SELECT DISTINCT src, dst FROM edges0
                                  WHERE src <> dst)
  UNION
  SELECT dst, src FROM (SELECT DISTINCT src, dst FROM edges0
                        WHERE src <> dst)
)""",
        "seed AS (SELECT CAST(min(u) AS BIGINT) AS s FROM sym)",
        "l0 AS (SELECT s AS v, CAST(1 AS BIGINT) AS sigma FROM seed)",
        "seen0 AS (SELECT v FROM l0)",
    ]
    for l in range(1, BC_LAYERS + 1):
        parts.append(
            f"""l{l} AS MATERIALIZED (
  SELECT sym.v, CAST(sum(p.sigma) AS BIGINT) AS sigma
  FROM l{l - 1} p JOIN sym ON sym.u = p.v
  WHERE sym.v NOT IN (SELECT v FROM seen{l - 1})
  GROUP BY sym.v
)"""
        )
        parts.append(
            f"seen{l} AS MATERIALIZED"
            f" (SELECT v FROM seen{l - 1} UNION SELECT v FROM l{l})"
        )
    # backward: delta at deepest layer = 0; flow toward the seed
    parts.append(
        f"d{BC_LAYERS} AS MATERIALIZED"
        f" (SELECT v, CAST(0 AS BIGINT) AS delta FROM l{BC_LAYERS})"
    )
    for l in range(BC_LAYERS - 1, -1, -1):
        parts.append(
            f"""d{l} AS MATERIALIZED (
  SELECT u.v,
         CAST(coalesce(sum((u.sigma * (1000000 + coalesce(dn.delta, 0)))
                           // w.sigma), 0) AS BIGINT) AS delta
  FROM l{l} u
  LEFT JOIN sym e ON e.u = u.v
  LEFT JOIN l{l + 1} w ON w.v = e.v
  LEFT JOIN d{l + 1} dn ON dn.v = w.v
  GROUP BY u.v
)"""
        )
    unions = " UNION ALL ".join(
        f"SELECT v, delta FROM d{l}" for l in range(1, BC_LAYERS + 1)
    )
    return (
        ",\n".join(parts)
        + f"""
SELECT v, bc_1e6, rk FROM (
  SELECT v, CAST(delta AS BIGINT) AS bc_1e6,
         CAST(row_number() OVER (ORDER BY delta DESC, v) AS INT) AS rk
  FROM ({unions}) WHERE delta > 0
) WHERE rk <= {BC_TOP}
"""
    )


@query("graph_betweenness_sampled", oracle=_bc_oracle())
def graph_betweenness_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sampled-source betweenness centrality (Brandes 2001 / Brandes-Pich
    2007): from ONE deterministic source, BFS forward for {BC_LAYERS}
    fixed layers accumulating shortest-path counts sigma (exact
    BIGINTs), then accumulate dependencies BACKWARD layer by layer —
    delta(u) = Sigma over DAG successors w of sigma_u·(1 + delta_w)/
    sigma_w, kept deterministic by quantizing delta to 1e6 units with
    truncating division at every edge term. The full metric sums this
    over all sources; production estimators sum a seed SAMPLE — this op
    is exactly one term of that sum, and its top-{BC_TOP} already ranks
    the graph's brokers. Both directions are the same fixed unrolled
    recursion in the oracle.

    Scale shape: each layer (either direction) is one equi-join +
    hash-agg; depth is fixed. Sampling more sources multiplies by the
    seed count and sums — embarrassingly parallel across seeds."""
    nodes, edges, n = _graph(spark, sf_dir)
    e = edges.select("src", "dst").filter(F.col("src") != F.col("dst")).distinct()
    sym = (
        e.select(F.col("src").alias("u"), F.col("dst").alias("v"))
        .unionByName(e.select(F.col("dst").alias("u"), F.col("src").alias("v")))
        .distinct()
        .coalesce(8)
        .localCheckpoint(eager=True)
    )
    seed = sym.agg(F.min("u")).collect()[0][0]
    layers = [
        spark.createDataFrame([(seed, 1)], "v BIGINT, sigma BIGINT").localCheckpoint(
            eager=True
        )
    ]
    seen = layers[0].select("v").localCheckpoint(eager=True)
    for _ in range(BC_LAYERS):
        nxt = (
            layers[-1]
            .join(sym, layers[-1].v == sym.u)
            .select(sym.v.alias("v"), "sigma")
            .join(seen, "v", "left_anti")
            .groupBy("v")
            .agg(F.sum("sigma").cast("long").alias("sigma"))
            .coalesce(4)
            .localCheckpoint(eager=True)
        )
        layers.append(nxt)
        seen = (
            seen.unionByName(nxt.select("v")).coalesce(4).localCheckpoint(eager=True)
        )
    deltas = [None] * (BC_LAYERS + 1)
    deltas[BC_LAYERS] = layers[BC_LAYERS].select(
        "v", F.lit(0).cast("long").alias("delta")
    )
    for l in range(BC_LAYERS - 1, -1, -1):
        up = layers[l].select(F.col("v").alias("uv"), F.col("sigma").alias("us"))
        down = layers[l + 1].select(F.col("v").alias("wv"), F.col("sigma").alias("ws"))
        dn = deltas[l + 1].select(F.col("v").alias("wv"), F.col("delta").alias("wd"))
        term = (
            up.join(sym, up.uv == sym.u, "left")
            .join(down, sym.v == down.wv, "left")
            .join(dn, "wv", "left")
            .groupBy("uv", "us")
            .agg(
                F.coalesce(
                    F.sum(
                        F.expr(
                            "(us * (1000000 + coalesce(wd, 0))) div ws"
                        )
                    ),
                    F.lit(0),
                )
                .cast("long")
                .alias("delta")
            )
            .select(F.col("uv").alias("v"), "delta")
            .coalesce(4)
            .localCheckpoint(eager=True)
        )
        deltas[l] = term
    allv = deltas[1]
    for l in range(2, BC_LAYERS + 1):
        allv = allv.unionByName(deltas[l])
    return (
        allv.filter(F.col("delta") > 0)
        .select(
            "v",
            F.col("delta").alias("bc_1e6"),
            F.row_number()
            .over(Window.orderBy(F.desc("delta"), "v"))
            .cast("int")
            .alias("rk"),
        )
        .filter(F.col("rk") <= BC_TOP)
    )


# --------------------------------------------------------------------------
# 2. Doubly-robust off-policy value
# --------------------------------------------------------------------------


@query(
    "eval_doubly_robust_value",
    oracle=f"""
WITH arms AS (
  SELECT event_type AS arm,
         CAST(row_number() OVER (ORDER BY event_type) - 1 AS BIGINT) AS aid
  FROM (SELECT DISTINCT event_type FROM events)
),
k AS (SELECT CAST(count(*) AS BIGINT) AS n_arms FROM arms),
logged AS (
  SELECT e.event_type AS arm, CAST(round(e.value * 100) AS BIGINT) AS r,
         {_pt_sql('pol#', 'e.user_id', 1000)} % (SELECT n_arms FROM k)
           AS pick
  FROM events e
),
rhat AS (
  SELECT arm, CAST(sum(r) AS BIGINT) AS sr, CAST(count(*) AS BIGINT) AS n_a
  FROM logged GROUP BY arm
),
dm AS (
  -- direct method: E[rhat(pi(u))] over the logged population
  SELECT CAST(sum(CAST(round(1000.0 * h.sr / h.n_a) AS BIGINT)) AS BIGINT)
           AS dm_milli_sum,
         CAST(count(*) AS BIGINT) AS n
  FROM logged l JOIN arms a ON a.aid = l.pick JOIN rhat h ON h.arm = a.arm
),
corr AS (
  -- IPS residual correction on matched rows
  SELECT l.arm,
         CAST(sum(l.r) AS BIGINT) AS s_match,
         CAST(count(*) AS BIGINT) AS n_match,
         max(h.sr) AS sr, max(h.n_a) AS n_a
  FROM logged l
  JOIN arms a ON a.arm = l.arm AND a.aid = l.pick
  JOIN rhat h ON h.arm = l.arm
  GROUP BY l.arm
),
corr_sum AS (
  SELECT CAST(sum(CAST(round(1000.0 * (CAST(s_match AS DOUBLE)
                   - CAST(n_match AS DOUBLE) * sr / n_a) / n_a) AS BIGINT))
              AS BIGINT) AS corr_milli
  FROM corr
)
SELECT d.n,
       CAST(d.dm_milli_sum // d.n AS BIGINT) AS dm_value_milli,
       c.corr_milli AS ips_corr_milli,
       CAST(d.dm_milli_sum // d.n + c.corr_milli AS BIGINT)
         AS dr_value_milli
FROM dm d, corr_sum c
""",
)
def eval_doubly_robust_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Doubly-robust off-policy evaluation (Dudík, Langford & Li 2011):
    DR = direct-method estimate (the reward model r̂(a) = per-arm mean,
    evaluated at the target policy's picks) PLUS the inverse-propensity
    correction of the model's residuals on matched rows — unbiased when
    EITHER the reward model OR the propensities are right, and lower
    variance than plain IPS (eval_policy_replay_ips) when both are
    decent. All three numbers are emitted so the correction is visible.
    Per-arm terms quantize to milli-units before the k-term sums.

    Scale shape: two hash-aggs over one scan plus k-row reduces."""
    ev = load(spark, sf_dir, "events")
    arms = (
        ev.select("event_type").distinct()
        .select(
            F.col("event_type").alias("arm"),
            (F.row_number().over(Window.orderBy("event_type")) - 1)
            .cast("long")
            .alias("aid"),
        )
    )
    n_arms = arms.count()
    logged = ev.select(
        F.col("event_type").alias("arm"),
        F.round(F.col("value") * 100).cast("long").alias("r"),
        ((_pt("pol#", F.col("user_id")) % 1000) % n_arms).alias("pick"),
    )
    rhat = logged.groupBy("arm").agg(
        F.sum("r").cast("long").alias("sr"), F.count("*").cast("long").alias("n_a")
    )
    dm = (
        logged.join(F.broadcast(arms), logged.pick == arms.aid)
        .join(
            F.broadcast(rhat.withColumnRenamed("arm", "harm")),
            F.col("harm") == arms.arm,
        )
        .agg(
            F.sum(
                F.round(1000.0 * F.col("sr") / F.col("n_a")).cast("long")
            )
            .cast("long")
            .alias("dm_milli_sum"),
            F.count("*").cast("long").alias("n"),
        )
    )
    corr = (
        logged.join(F.broadcast(arms), (logged.arm == arms.arm) & (logged.pick == arms.aid))
        .groupBy(logged.arm)
        .agg(
            F.sum("r").cast("long").alias("s_match"),
            F.count("*").cast("long").alias("n_match"),
        )
        .join(rhat, "arm")
    )
    corr_sum = corr.agg(
        F.sum(
            F.round(
                1000.0
                * (
                    F.col("s_match").cast("double")
                    - F.col("n_match").cast("double") * F.col("sr") / F.col("n_a")
                )
                / F.col("n_a")
            ).cast("long")
        )
        .cast("long")
        .alias("corr_milli")
    )
    return dm.crossJoin(corr_sum).select(
        "n",
        F.expr("CAST(dm_milli_sum div n AS BIGINT)").alias("dm_value_milli"),
        F.col("corr_milli").alias("ips_corr_milli"),
        F.expr("CAST(dm_milli_sum div n + corr_milli AS BIGINT)").alias(
            "dr_value_milli"
        ),
    )


# --------------------------------------------------------------------------
# 3. Time-decay weighted totals
# --------------------------------------------------------------------------

DECAY_WEIGHTS = tuple(
    round(1_000_000 * (7 / 8) ** age) for age in range(31)
)


@query(
    "agg_time_decay_totals",
    oracle=f"""
WITH mx AS (SELECT max(CAST(ts AS DATE)) AS last FROM events),
aged AS (
  SELECT event_type,
         CAST(mx.last - CAST(ts AS DATE) AS BIGINT) AS age,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events, mx
),
w(age, w_1e6) AS (VALUES
  {', '.join(f'({a}, {w})' for a, w in enumerate(DECAY_WEIGHTS))}
)
SELECT a.event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(a.cents) AS BIGINT) AS raw_cents,
       CAST(sum(a.cents * w.w_1e6) // 1000000 AS BIGINT) AS decayed_cents
FROM aged a JOIN w ON a.age = w.age
GROUP BY 1
""",
)
def agg_time_decay_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponential time-decay weighted revenue per event type: each
    event's cents are weighted by (7/8)^age_days relative to the newest
    event, with the weight table precomputed as EXACT ppm integers
    (shared literal constants, the sample_poisson_bootstrap technique —
    no runtime pow()). Decayed totals are what freshness-sensitive
    ranking and billing actually use; the raw totals sit beside them so
    the recency discount is visible.

    Scale shape: the 31-row weight table broadcasts; everything else is
    one map-side-combined hash-agg. The streaming twin decays state by
    re-multiplying per window."""
    ev = load(spark, sf_dir, "events")
    mx = ev.agg(F.max(F.to_date("ts")).alias("last"))
    aged = ev.crossJoin(F.broadcast(mx)).select(
        "event_type",
        F.datediff(F.col("last"), F.to_date("ts")).cast("long").alias("age"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    w = spark.createDataFrame(
        list(enumerate(DECAY_WEIGHTS)), "age LONG, w_1e6 LONG"
    )
    return (
        aged.join(F.broadcast(w), "age")
        .groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("cents").cast("long").alias("raw_cents"),
            F.expr("CAST(sum(cents * w_1e6) div 1000000 AS BIGINT)").alias(
                "decayed_cents"
            ),
        )
    )


# --------------------------------------------------------------------------
# 4. Partition-skew report
# --------------------------------------------------------------------------


@query(
    "dq_partition_skew",
    oracle="""
WITH per_key AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS c FROM events GROUP BY user_id
),
tot AS (
  SELECT CAST(count(*) AS BIGINT) AS n_keys, CAST(sum(c) AS BIGINT) AS n_rows
  FROM per_key
),
topk AS (
  SELECT user_id, c FROM per_key ORDER BY c DESC, user_id LIMIT 1
),
coc AS (
  SELECT c, CAST(count(*) AS BIGINT) AS k FROM per_key GROUP BY c
),
cum AS (
  SELECT c, CAST(sum(k) OVER (ORDER BY c) AS BIGINT) AS cum,
         (SELECT n_keys FROM tot) AS nk
  FROM coc
),
p50 AS (SELECT min(c) AS v FROM cum WHERE cum * 100 >= 50 * nk),
p99 AS (SELECT min(c) AS v FROM cum WHERE cum * 100 >= 99 * nk)
SELECT t.n_keys, t.n_rows,
       (SELECT user_id FROM topk) AS top_key,
       (SELECT c FROM topk) AS top_count,
       CAST((1000000 * (SELECT c FROM topk)) // t.n_rows AS BIGINT)
         AS max_share_1e6,
       CAST((SELECT v FROM p50) AS BIGINT) AS p50_count,
       CAST((SELECT v FROM p99) AS BIGINT) AS p99_count,
       CAST((1000 * (SELECT v FROM p99)) // (SELECT v FROM p50) AS BIGINT)
         AS skew_ratio_1e3
FROM tot t
""",
)
def dq_partition_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key distribution health report for the user_id key — the
    diagnostic run BEFORE choosing between a plain shuffle join,
    broadcast, AQE skew splitting, or the manual salt
    (join_salted_skew): key count, heaviest key and its row share,
    exact p50/p99 of per-key cardinalities (nearest-rank on the BOUNDED
    count-of-counts table), and the p99/p50 skew ratio. A ratio near 1
    = uniform keys, shuffle joins are safe; orders of magnitude = salt
    or broadcast. All integer.

    Scale shape: per-key collapse map-side; every later step runs on
    the count-of-counts table, whose size is the number of DISTINCT
    per-key cardinalities — tiny at any scale."""
    ev = load(spark, sf_dir, "events")
    per_key = ev.groupBy("user_id").agg(F.count("*").cast("long").alias("c"))
    tot = per_key.agg(
        F.count("*").cast("long").alias("n_keys"),
        F.sum("c").cast("long").alias("n_rows"),
    )
    top = per_key.orderBy(F.desc("c"), "user_id").limit(1).collect()[0]
    coc = per_key.groupBy("c").agg(F.count("*").cast("long").alias("k"))
    wb = Window.orderBy("c").rowsBetween(Window.unboundedPreceding, 0)
    cum = coc.select(
        "c", F.sum("k").over(wb).cast("long").alias("cum")
    ).crossJoin(F.broadcast(tot.select("n_keys")))
    p50 = (
        cum.filter(F.col("cum") * 100 >= 50 * F.col("n_keys"))
        .agg(F.min("c"))
        .collect()[0][0]
    )
    p99 = (
        cum.filter(F.col("cum") * 100 >= 99 * F.col("n_keys"))
        .agg(F.min("c"))
        .collect()[0][0]
    )
    return tot.select(
        "n_keys",
        "n_rows",
        F.lit(top.user_id).cast("long").alias("top_key"),
        F.lit(top.c).cast("long").alias("top_count"),
        F.expr(f"CAST((1000000 * {top.c}) div n_rows AS BIGINT)").alias(
            "max_share_1e6"
        ),
        F.lit(p50).cast("long").alias("p50_count"),
        F.lit(p99).cast("long").alias("p99_count"),
        F.lit((1000 * p99) // p50).cast("long").alias("skew_ratio_1e3"),
    )


# --------------------------------------------------------------------------
# 5. Two-stage residual VQ
# --------------------------------------------------------------------------

RQ_CB = 16  # codebook size per stage


@query(
    "vec_rq_two_stage",
    oracle=f"""
WITH comp AS MATERIALIZED (
  SELECT c0.vec_id, c0.label, CAST(c0.i AS BIGINT) AS i,
         CAST(round(1000 * CAST(c0.embedding[CAST(c0.i AS INTEGER)]
                                AS DOUBLE)) AS BIGINT) AS x
  FROM (SELECT vec_id, label, embedding,
               unnest(range(1, len(embedding) + 1)) AS i FROM embeddings) c0
),
cb1 AS MATERIALIZED (
  SELECT label AS cid, i, CAST(sum(x) AS BIGINT) // count(*) AS x
  FROM comp GROUP BY 1, 2
),
d1 AS (
  SELECT c.vec_id, b.cid, CAST(sum((c.x - b.x) * (c.x - b.x)) AS BIGINT)
           AS d2
  FROM comp c JOIN cb1 b ON c.i = b.i
  GROUP BY 1, 2
),
a1 AS MATERIALIZED (
  SELECT vec_id, cid FROM (
    SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id
                                           ORDER BY d2, cid) AS rk
    FROM d1
  ) WHERE rk = 1
),
res AS MATERIALIZED (
  SELECT c.vec_id, a1.cid AS g1, c.vec_id % 4 AS g2, c.i, c.x - b.x AS r
  FROM comp c JOIN a1 ON c.vec_id = a1.vec_id
  JOIN cb1 b ON b.cid = a1.cid AND b.i = c.i
),
cb2 AS MATERIALIZED (
  SELECT g1, g2, i, CAST(sum(r) AS BIGINT) // count(*) AS x
  FROM res GROUP BY 1, 2, 3
),
d2_ AS (
  SELECT c.vec_id, b.g1, b.g2,
         CAST(sum((c.r - b.x) * (c.r - b.x)) AS BIGINT) AS d2
  FROM res c JOIN cb2 b ON c.i = b.i
  GROUP BY 1, 2, 3
),
a2 AS (
  SELECT vec_id, d2 FROM (
    SELECT vec_id, d2, row_number() OVER (PARTITION BY vec_id
                                          ORDER BY d2, g1, g2) AS rk
    FROM d2_
  ) WHERE rk = 1
),
mse AS (
  SELECT (SELECT CAST(sum(x * x) AS BIGINT) FROM comp) AS e0,
         (SELECT CAST(sum(r * r) AS BIGINT) FROM res) AS e1,
         (SELECT CAST(sum(d2) AS BIGINT) FROM a2) AS e2,
         (SELECT CAST(count(DISTINCT vec_id) AS BIGINT) FROM comp) AS n
)
SELECT n, e0 AS sse_stage0, e1 AS sse_stage1, e2 AS sse_stage2,
       CAST((1000 * e1) // e0 AS BIGINT) AS ratio1_1e3,
       CAST((1000 * e2) // e0 AS BIGINT) AS ratio2_1e3
FROM mse
""",
)
def vec_rq_two_stage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage residual vector quantization (the RVQ layout behind
    neural-codec and coarse-quantizer stacks): stage 1 assigns each
    vector to its nearest per-label CENTROID (exact integer means — the
    assignment can only beat the own-label mean, so SSE provably
    drops), stage 2 quantizes the RESIDUAL against per-(cell, id mod 4)
    residual centroids, and the per-stage sum of squared errors must
    fall —
    reported as exact integers with ppt compression ratios. The additive
    sibling of vec_pq (which splits dims; RVQ splits magnitude).

    Scale shape: each stage is one broadcast codebook join + per-vector
    argmin — O(n·k·d) exactly like the IVF coarse quantizer; stages
    compose linearly."""
    e = load(spark, sf_dir, "embeddings")
    comp = e.select(
        "vec_id", "label", F.posexplode("embedding").alias("i0", "xv")
    ).select(
        "vec_id",
        "label",
        (F.col("i0") + 1).alias("i"),
        F.round(1000 * F.col("xv").cast("double")).cast("long").alias("x"),
    ).localCheckpoint(eager=True)
    cb1 = comp.groupBy(F.col("label").alias("cid"), "i").agg(
        F.expr("CAST(sum(x) AS BIGINT) div count(*)").alias("bx")
    )
    d1 = (
        comp.join(F.broadcast(cb1), "i")
        .groupBy("vec_id", "cid")
        .agg(
            F.sum((F.col("x") - F.col("bx")) * (F.col("x") - F.col("bx")))
            .cast("long")
            .alias("d2")
        )
    )
    a1 = (
        d1.withColumn(
            "rk",
            F.row_number().over(Window.partitionBy("vec_id").orderBy("d2", "cid")),
        )
        .filter(F.col("rk") == 1)
        .select("vec_id", "cid")
    )
    res = (
        comp.join(a1, "vec_id")
        .join(cb1, ["cid", "i"])
        .select(
            "vec_id",
            F.col("cid").alias("g1"),
            (F.col("vec_id") % 4).alias("g2"),
            "i",
            (F.col("x") - F.col("bx")).alias("r"),
        )
        .localCheckpoint(eager=True)
    )
    cb2 = res.groupBy("g1", "g2", "i").agg(
        F.expr("CAST(sum(r) AS BIGINT) div count(*)").alias("bx")
    )
    d2_ = (
        res.drop("g1", "g2")
        .join(F.broadcast(cb2), "i")
        .groupBy("vec_id", "g1", "g2")
        .agg(
            F.sum((F.col("r") - F.col("bx")) * (F.col("r") - F.col("bx")))
            .cast("long")
            .alias("d2")
        )
    )
    a2 = (
        d2_.withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("vec_id").orderBy("d2", "g1", "g2")
            ),
        )
        .filter(F.col("rk") == 1)
        .select("vec_id", "d2")
    )
    e0 = comp.agg(F.sum(F.col("x") * F.col("x"))).collect()[0][0]
    e1 = res.agg(F.sum(F.col("r") * F.col("r"))).collect()[0][0]
    e2 = a2.agg(F.sum("d2")).collect()[0][0]
    n = comp.select("vec_id").distinct().count()
    return spark.createDataFrame(
        [(n, e0, e1, e2, (1000 * e1) // e0, (1000 * e2) // e0)],
        "n BIGINT, sse_stage0 BIGINT, sse_stage1 BIGINT, sse_stage2 BIGINT,"
        " ratio1_1e3 BIGINT, ratio2_1e3 BIGINT",
    )


# --------------------------------------------------------------------------
# 6. MASE forecast scoring
# --------------------------------------------------------------------------

MASE_TRAIN_D = 20


@query(
    "eval_forecast_mase",
    oracle=f"""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS d,
         CAST(sum(CAST(round(value) AS BIGINT)) AS BIGINT) AS y
  FROM events GROUP BY 1, 2
),
d0 AS (SELECT min(d) AS start FROM daily),
idx AS (
  SELECT event_type, d - d0.start AS off,
         CAST((d - DATE '1970-01-05') % 7 AS BIGINT) AS dow,
         y
  FROM daily, d0
),
fc AS (
  SELECT event_type, dow, CAST(sum(y) AS BIGINT) // count(*) AS f
  FROM idx WHERE off < {MASE_TRAIN_D} GROUP BY 1, 2
),
test_err AS (
  SELECT i.event_type, CAST(count(*) AS BIGINT) AS n_test,
         CAST(sum(abs(i.y - f.f)) AS BIGINT) AS sae
  FROM idx i JOIN fc f ON i.event_type = f.event_type AND i.dow = f.dow
  WHERE i.off >= {MASE_TRAIN_D}
  GROUP BY 1
),
naive AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n_naive,
         CAST(sum(abs(y - py)) AS BIGINT) AS snae
  FROM (
    SELECT event_type, off, y,
           lag(y) OVER (PARTITION BY event_type ORDER BY off) AS py
    FROM idx WHERE off < {MASE_TRAIN_D}
  ) WHERE py IS NOT NULL
  GROUP BY 1
)
SELECT t.event_type, t.n_test, t.sae, v.snae,
       CAST((1000000 * t.sae * v.n_naive) // (v.snae * t.n_test) AS BIGINT)
         AS mase_1e6
FROM test_err t JOIN naive v ON t.event_type = v.event_type
""",
)
def eval_forecast_mase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean absolute SCALED error (Hyndman & Koehler 2006) of the
    weekday-baseline forecast: test MAE divided by the TRAIN naive
    one-step MAE — the scale-free forecast score that is comparable
    across series of wildly different volumes (unlike MAPE it survives
    zeros, unlike MAE it survives unit changes). MASE < 1 = the model
    beats naive persistence. Exact integer absolute-error sums; the
    ratio is one ppm floor division.

    Scale shape: daily collapse map-side, per-type hash-aggs; the naive
    denominator is a per-key lag window on the bounded train slice."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy("event_type", F.to_date("ts").alias("d")).agg(
        F.sum(F.round("value").cast("long")).cast("long").alias("y")
    )
    d0 = daily.agg(F.min("d").alias("start"))
    idx = daily.crossJoin(F.broadcast(d0)).select(
        "event_type",
        F.datediff("d", "start").alias("off"),
        (F.datediff("d", F.lit("1970-01-05").cast("date")) % 7)
        .cast("long")
        .alias("dow"),
        "y",
    )
    fc = (
        idx.filter(F.col("off") < MASE_TRAIN_D)
        .groupBy("event_type", "dow")
        .agg(F.expr("CAST(sum(y) AS BIGINT) div count(*)").alias("f"))
    )
    test_err = (
        idx.filter(F.col("off") >= MASE_TRAIN_D)
        .join(fc, ["event_type", "dow"])
        .groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_test"),
            F.sum(F.abs(F.col("y") - F.col("f"))).cast("long").alias("sae"),
        )
    )
    naive = (
        idx.filter(F.col("off") < MASE_TRAIN_D)
        .withColumn(
            "py",
            F.lag("y").over(Window.partitionBy("event_type").orderBy("off")),
        )
        .filter(F.col("py").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_naive"),
            F.sum(F.abs(F.col("y") - F.col("py"))).cast("long").alias("snae"),
        )
    )
    return test_err.join(naive, "event_type").select(
        "event_type",
        "n_test",
        "sae",
        "snae",
        F.expr(
            "CAST((1000000 * sae * n_naive) div (snae * n_test) AS BIGINT)"
        ).alias("mase_1e6"),
    )
