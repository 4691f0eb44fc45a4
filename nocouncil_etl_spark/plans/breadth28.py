"""Breadth batch 28 (round 6): logistic GD, ALS sweep, Yule's K,
partitioned-write pruning, Morton hotspots, Cochran-Armitage trend.

Six operators continuing the round-6 breadth push (reference scope: the
crawl corpus implies per-source classifiers, recommendation over the
fetch log, lexical-diversity quality gates, and partitioned lake layout):

- ``ml_logistic_gd``       — 2-parameter logistic-style classifier trained
  by 3 rounds of exact integer-fixed-point batch gradient descent with the
  rational sigmoid link (no transcendentals, bit-exact in both engines).
- ``ml_als_half_step``     — one full rank-1 ALS sweep (users solved from
  pinned item factors, items re-solved from the users) over the
  customer x part quantity matrix; exact closed-form integer ridge.
- ``text_yules_k``         — Yule's K / Simpson's D lexical-diversity
  indices from the corpus frequency spectrum.
- ``io_partitioned_write_prune`` — hive-partitioned parquet publish +
  partition-pruned readback aggregation (the lake-layout contract).
- ``geo_morton_hotspots``  — Z-order (Morton) cell rollup of the synthetic
  customer point cloud; top-k densest cells.
- ``stat_cochran_armitage`` — dose-ordered 2 x k trend test (the ordered
  sibling of the chi-square independence test).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nocouncil_etl_spark.io import fan_out, load
from nocouncil_etl_spark.plans.breadth15 import _pt, _pt_sql
from nocouncil_etl_spark.registry import query

# --------------------------------------------------------------------------
# 1. Logistic-style GD with the rational sigmoid (exact fixed point)
# --------------------------------------------------------------------------

LOGIT_ITERS = 3
LR0_DIV = 4           # b0 step = avg residual (micro) / 4
LR1_DIV = 25_000_000  # b1 step = avg x-weighted residual / E[x^2]-scale


def _logit_pred_sql(b0: str, b1: str) -> str:
    """micro-prob of the rational sigmoid p = 1/2 + z / (2(1+|z|))."""
    z = f"({b0} + {b1} * x)"
    return f"(500000 + ({z} * 500000) // (1000000 + abs({z})))"


def _logit_oracle() -> str:
    params = "SELECT CAST(0 AS BIGINT) AS b0, CAST(0 AS BIGINT) AS b1"
    ctes = [
        "xy AS (SELECT CAST(round(value * 100) AS BIGINT) AS x,"
        " CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS y FROM events)",
        f"p0 AS ({params})",
    ]
    for i in range(LOGIT_ITERS):
        pred = _logit_pred_sql("p.b0", "p.b1")
        ctes.append(
            f"""g{i} AS (
  SELECT p.b0, p.b1, CAST(count(*) AS BIGINT) AS n,
         CAST(sum({pred} - 1000000 * y) AS BIGINT) AS g0,
         CAST(sum(({pred} - 1000000 * y) * x) AS BIGINT) AS gx
  FROM xy, p{i} p GROUP BY p.b0, p.b1
)"""
        )
        ctes.append(
            f"p{i + 1} AS (SELECT b0 - (g0 // n) // {LR0_DIV} AS b0,"
            f" b1 - (gx // n) // {LR1_DIV} AS b1 FROM g{i})"
        )
    pred = _logit_pred_sql("p.b0", "p.b1")
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT CAST(count(*) AS BIGINT) AS n, p.b0 AS b0_1e6, p.b1 AS b1_1e6,
       (1000000 * CAST(sum(CASE WHEN ({pred} >= 500000) = (y = 1)
                                THEN 1 ELSE 0 END) AS BIGINT)) // count(*)
         AS acc_1e6,
       (1000000 * CAST(sum(y) AS BIGINT)) // count(*) AS pos_rate_1e6
FROM xy, p{LOGIT_ITERS} p GROUP BY p.b0, p.b1
"""
    )




def _logit_xy(ev):
    return ev.select(
        F.round(F.col("value") * 100).cast("long").alias("x"),
        F.when(F.col("event_type") == "error", 1).otherwise(0).alias("y"),
    )


def _logit_pred_expr(b0v: int, b1v: int) -> "F.Column":
    z = f"({b0v} + {b1v} * x)"
    return F.expr(
        f"500000 + ({z} * 500000) div (1000000 + abs({z}))"
    ).cast("long")


def train_logistic_gd(spark: SparkSession, sf_dir: str) -> tuple[int, int]:
    """The ml_logistic_gd training loop (rational sigmoid, exact fixed
    point), exposed so downstream ops (active-learning margin sampling)
    reuse the identical fit. Driver state is two BIGINTs."""
    ev = load(spark, sf_dir, "events")
    xy = _logit_xy(ev)
    b0, b1 = 0, 0

    def tdiv(a: int, b: int) -> int:
        q = abs(a) // b
        return -q if a < 0 else q

    for _ in range(LOGIT_ITERS):
        p = _logit_pred_expr(b0, b1)
        g = xy.agg(
            F.count("*").cast("long").alias("n"),
            F.sum(p - 1000000 * F.col("y")).cast("long").alias("g0"),
            F.sum((p - 1000000 * F.col("y")) * F.col("x"))
            .cast("long")
            .alias("gx"),
        ).collect()[0]
        b0 = b0 - tdiv(tdiv(g.g0, g.n), LR0_DIV)
        b1 = b1 - tdiv(tdiv(g.gx, g.n), LR1_DIV)
    return b0, b1


@query("ml_logistic_gd", oracle=_logit_oracle())
def ml_logistic_gd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary classifier (is this event an 'error'?) on the value column,
    trained by {LOGIT_ITERS} rounds of full-batch gradient descent with the
    RATIONAL sigmoid link p = 1/2 + z/(2(1+|z|)) — the algebraic sigmoid
    every fixed-point ML runtime uses when exp() is unavailable — so the
    whole fit is exact BIGINT arithmetic and both engines agree bit-for-bit
    (exp()-based logistic differs across libms in the last ulp). Params
    live in micro-units; each round is one map-side-combined aggregate of
    (residual, x-weighted residual); updates use truncating integer
    division (verified identical semantics for negatives in both engines).

    Scale shape: per round, ONE codegen'd scan + scalar aggregate; driver
    state is two BIGINTs (the GBDT bounded-driver-state precedent,
    plans/breadth11.py). Rounds are fixed, so the 100 TB cost is
    {LOGIT_ITERS}+1 scans — the textbook distributed full-batch GD layout.
    Reference parity: ingest.py's fetch loop implies an error-prediction
    gate; this is its minimal in-engine learner."""
    ev = load(spark, sf_dir, "events")
    xy = _logit_xy(ev)
    b0, b1 = train_logistic_gd(spark, sf_dir)
    p = _logit_pred_expr(b0, b1)
    correct = F.when((p >= 500000) == (F.col("y") == 1), 1).otherwise(0)
    return xy.agg(
        F.count("*").cast("long").alias("n"),
        F.lit(b0).cast("long").alias("b0_1e6"),
        F.lit(b1).cast("long").alias("b1_1e6"),
        F.expr(
            "(1000000 * CAST(sum(CASE WHEN (500000 + "
            f"(({b0} + {b1} * x) * 500000) div (1000000 + abs({b0} + {b1} * x))"
            " >= 500000) = (y = 1) THEN 1 ELSE 0 END) AS BIGINT)) div count(*)"
        ).alias("acc_1e6"),
        F.expr("(1000000 * CAST(sum(y) AS BIGINT)) div count(*)").alias(
            "pos_rate_1e6"
        ),
    )


# --------------------------------------------------------------------------
# 2. Rank-1 ALS sweep
# --------------------------------------------------------------------------

ALS_LAMBDA_MILLI = 1000  # ridge lambda = 1.0 in milli-units
ALS_TOPK = 20


@query(
    "ml_als_half_step",
    oracle=f"""
WITH ratings AS (
  SELECT o.o_custkey AS cid, l.l_partkey AS pid,
         CAST(round(sum(l.l_quantity)) AS BIGINT) AS r
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  GROUP BY 1, 2
),
q0 AS (
  SELECT DISTINCT pid, 1000 + (pid * 31) % 1000 AS q FROM ratings
),
users AS (
  SELECT r.cid,
         (1000 * CAST(sum(r.r * q.q) AS BIGINT))
           // (CAST(sum(q.q * q.q) AS BIGINT) // 1000 + {ALS_LAMBDA_MILLI})
           AS u
  FROM ratings r JOIN q0 q ON r.pid = q.pid
  GROUP BY r.cid
),
items AS (
  SELECT r.pid, CAST(count(*) AS BIGINT) AS n_raters,
         (1000 * CAST(sum(r.r * u.u) AS BIGINT))
           // (CAST(sum(u.u * u.u) AS BIGINT) // 1000 + {ALS_LAMBDA_MILLI})
           AS q1
  FROM ratings r JOIN users u ON r.cid = u.cid
  GROUP BY r.pid
)
SELECT pid, n_raters, q AS q0_milli, q1 AS q1_milli, rk FROM (
  SELECT i.pid, i.n_raters, q.q, i.q1,
         CAST(row_number() OVER (ORDER BY i.q1 DESC, i.pid) AS INT) AS rk
  FROM items i JOIN q0 q ON i.pid = q.pid
) WHERE rk <= {ALS_TOPK}
""",
)
def ml_als_half_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One full rank-1 ALS sweep over the implicit customer x part rating
    matrix (rating = total quantity ever ordered): item factors are pinned
    to a deterministic affine-mod init q0, every user factor is solved in
    closed form u = (Sigma r*q) / (Sigma q^2 + lambda), then every item
    factor is re-solved from the users — the exact alternating-least-
    squares half-steps, rank 1, in milli-unit integer arithmetic (the
    scalar ridge solve needs no matrix inverse, so the whole sweep is two
    grouped aggregates and stays bit-exact). Top-{ALS_TOPK} items by the
    refreshed factor.

    Scale shape: the canonical distributed ALS data layout — each half-step
    is one equi-join of the ratings table with the (small) factor table on
    its key followed by a hash-agg on the other key; nothing is ever
    materialized per-pair beyond the ratings themselves. At 100 TB the
    factor tables broadcast (one row per user/item) and the ratings never
    leave their partitions twice. Reference parity: vectorize.py's
    doc-query affinity loop is this matrix under another name."""
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    ratings = (
        li.join(orders.select("o_orderkey", "o_custkey"),
                li.l_orderkey == F.col("o_orderkey"))
        .groupBy(F.col("o_custkey").alias("cid"), F.col("l_partkey").alias("pid"))
        .agg(F.round(F.sum("l_quantity")).cast("long").alias("r"))
        # three consumers (q0, user solve, item solve) would each re-run
        # the lineitem join+agg; pin the ratings once (HITS discipline)
        .localCheckpoint(eager=True)
    )
    q0 = ratings.select("pid").distinct().select(
        "pid", (1000 + (F.col("pid") * 31) % 1000).alias("q")
    )
    users = (
        ratings.join(q0, "pid")
        .groupBy("cid")
        .agg(
            F.expr(
                f"(1000 * CAST(sum(r * q) AS BIGINT)) div "
                f"(CAST(sum(q * q) AS BIGINT) div 1000 + {ALS_LAMBDA_MILLI})"
            ).alias("u")
        )
    )
    items = (
        ratings.join(users, "cid")
        .groupBy("pid")
        .agg(
            F.count("*").cast("long").alias("n_raters"),
            F.expr(
                f"(1000 * CAST(sum(r * u) AS BIGINT)) div "
                f"(CAST(sum(u * u) AS BIGINT) div 1000 + {ALS_LAMBDA_MILLI})"
            ).alias("q1"),
        )
    )
    return (
        items.join(q0, "pid")
        .withColumn(
            "rk",
            F.row_number().over(Window.orderBy(F.desc("q1"), "pid")).cast("int"),
        )
        .filter(F.col("rk") <= ALS_TOPK)
        .select(
            "pid",
            "n_raters",
            F.col("q").alias("q0_milli"),
            F.col("q1").alias("q1_milli"),
            "rk",
        )
    )


# --------------------------------------------------------------------------
# 3. Yule's K / Simpson's D lexical diversity
# --------------------------------------------------------------------------


@query(
    "text_yules_k",
    oracle="""
WITH tok AS (
  SELECT unnest(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                            t -> t <> '')) AS w
  FROM documents
),
tf AS (SELECT w, CAST(count(*) AS BIGINT) AS m FROM tok GROUP BY w),
agg AS (
  SELECT CAST(sum(m) AS BIGINT) AS n_tokens,
         CAST(count(*) AS BIGINT) AS n_types,
         CAST(sum(m * m) AS BIGINT) AS s2,
         CAST(sum(m * (m - 1)) AS BIGINT) AS rep2
  FROM tf
)
SELECT n_tokens, n_types, s2,
       round(10000.0 * (s2 - n_tokens)
             / (CAST(n_tokens AS DOUBLE) * n_tokens), 6) AS yules_k,
       round(CAST(rep2 AS DOUBLE)
             / (CAST(n_tokens AS DOUBLE) * (n_tokens - 1)), 9) AS simpson_d,
       round(CAST(n_types AS DOUBLE) / n_tokens, 6) AS ttr
FROM agg
""",
)
def text_yules_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus lexical-diversity indices from the token frequency spectrum:
    Yule's K = 10^4 (Sigma m^2 - N) / N^2 (repeat-rate characteristic,
    length-invariant), Simpson's D = Sigma m(m-1) / (N(N-1)) (probability
    two random tokens are the same type), and the raw type-token ratio.
    All spectrum moments are exact BIGINTs; each index is a single
    division from exact integers, so both engines round identically.

    Scale shape: tokenize map-side, one hash-agg to the type table (the
    vocabulary — bounded far below corpus size by Heaps' law), one scalar
    reduce over its moments. The classic data-quality gate for crawl
    corpora: boilerplate-heavy sources show inflated K/D (few types
    dominate). Reference parity: the corpus quality scoring implied by
    ingest.py's content filters."""
    docs = fan_out(load(spark, sf_dir, "documents"))
    tok = docs.select(
        F.explode(
            F.filter(
                F.split(F.lower(F.col("text")), "[^a-z0-9]+"),
                lambda t: t != "",
            )
        ).alias("w")
    )
    tf = tok.groupBy("w").agg(F.count("*").cast("long").alias("m"))
    agg = tf.agg(
        F.sum("m").cast("long").alias("n_tokens"),
        F.count("*").cast("long").alias("n_types"),
        F.sum(F.col("m") * F.col("m")).cast("long").alias("s2"),
        F.sum(F.col("m") * (F.col("m") - 1)).cast("long").alias("rep2"),
    )
    n = F.col("n_tokens").cast("double")
    return agg.select(
        "n_tokens",
        "n_types",
        "s2",
        F.round(10000.0 * (F.col("s2") - F.col("n_tokens")) / (n * n), 6).alias(
            "yules_k"
        ),
        F.round(F.col("rep2").cast("double") / (n * (F.col("n_tokens") - 1)), 9)
        .alias("simpson_d"),
        F.round(F.col("n_types").cast("double") / n, 6).alias("ttr"),
    )


# --------------------------------------------------------------------------
# 4. Hive-partitioned publish + partition-pruned readback
# --------------------------------------------------------------------------

PRUNE_TYPE = "click"


@query(
    "io_partitioned_write_prune",
    oracle=f"""
SELECT CAST(ts AS DATE) AS d,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
FROM events
WHERE event_type = '{PRUNE_TYPE}'
GROUP BY 1
""",
)
def io_partitioned_write_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The lake-layout contract end-to-end: publish the event feed as
    hive-partitioned parquet (partitionBy event_type — the reference's
    per-category output directories, ingest.py's by-feed layout), then
    read it back filtered to ONE partition value and aggregate. The
    readback plan must show PartitionFilters (directory pruning), i.e.
    the '{PRUNE_TYPE}' aggregate touches 1/5 of the files — asserted in
    tests/test_breadth28.py. The oracle recomputes from the unpartitioned
    source, so the hash check proves write→prune→agg lost nothing.

    Scale shape: this IS the 100 TB answer to "don't scan what you don't
    need" — partition pruning happens at file-listing time, before any
    IO; at scale you'd partition by (event_type, date) and both predicate
    classes prune. The write shuffles once on the partition key
    (repartition before write keeps one file per partition per task)."""
    ev = load(spark, sf_dir, "events")
    out = os.path.join(
        tempfile.gettempdir(),
        "nocouncil_etl_spark_scratch",
        f"events_by_type_{os.path.basename(sf_dir.rstrip('/'))}",
    )
    (
        ev.select(
            "event_id",
            "event_type",
            F.to_date("ts").alias("d"),
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
        .repartition("event_type")
        .write.mode("overwrite")
        .partitionBy("event_type")
        .parquet(out)
    )
    back = spark.read.parquet(out).filter(F.col("event_type") == PRUNE_TYPE)
    return back.groupBy("d").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("cents").cast("long").alias("cents"),
    )


# --------------------------------------------------------------------------
# 5. Morton (Z-order) hotspot cells
# --------------------------------------------------------------------------

MORTON_RANGE = 32768  # point coords in [0, 32768)
MORTON_CELL = 2048    # 16 cells/axis -> 4 bits/axis, 256 Z-cells
MORTON_BITS = 4
MORTON_TOPK = 20


def _morton_sql(cx: str, cy: str) -> str:
    terms = []
    for j in range(MORTON_BITS):
        terms.append(f"(({cx} // {1 << j}) % 2) * {1 << (2 * j)}")
        terms.append(f"(({cy} // {1 << j}) % 2) * {1 << (2 * j + 1)}")
    return " + ".join(terms)


@query(
    "geo_morton_hotspots",
    oracle=f"""
WITH pts AS (
  SELECT c_custkey,
         {_pt_sql('mx#', 'c_custkey', MORTON_RANGE)} AS x,
         {_pt_sql('my#', 'c_custkey', MORTON_RANGE)} AS y,
         CAST(round(c_acctbal * 100) AS BIGINT) AS bal
  FROM customer
),
cells AS (
  SELECT x // {MORTON_CELL} AS cx, y // {MORTON_CELL} AS cy,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(bal) AS BIGINT) AS bal_cents
  FROM pts GROUP BY 1, 2
),
coded AS (
  SELECT CAST({_morton_sql('cx', 'cy')} AS BIGINT) AS morton,
         cx, cy, n, bal_cents
  FROM cells
)
SELECT morton, cx, cy, n, bal_cents, rk FROM (
  SELECT *, CAST(row_number() OVER (ORDER BY n DESC, morton) AS INT) AS rk
  FROM coded
) WHERE rk <= {MORTON_TOPK}
""",
)
def geo_morton_hotspots(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) spatial rollup: the synthetic customer point cloud
    (md5-derived millidegree coords, the geo_* convention from
    plans/breadth15.py) is bucketed into a {1 << MORTON_BITS} x
    {1 << MORTON_BITS} grid, each cell keyed by its interleaved-bit Morton
    code — the space-filling-curve key every lake engine (Delta Z-ORDER,
    Iceberg sort orders) uses so that spatially-near cells are also
    KEY-near and range scans touch contiguous files. Top-{MORTON_TOPK}
    densest cells with balance mass. The interleave is pure integer
    shift/mask arithmetic unrolled over {MORTON_BITS} bits — exact in both
    engines.

    Scale shape: one map-side-combined hash-agg to the (bounded) cell
    table; the Morton code computes on {1 << (2 * MORTON_BITS)} cell rows,
    not raw points. At 100 TB you deepen the curve (more bits) and
    range-partition output files BY the Morton key — the rollup shape is
    unchanged."""
    c = load(spark, sf_dir, "customer")
    pts = c.select(
        (_pt("mx#", F.col("c_custkey")) % MORTON_RANGE).alias("x"),
        (_pt("my#", F.col("c_custkey")) % MORTON_RANGE).alias("y"),
        F.round(F.col("c_acctbal") * 100).cast("long").alias("bal"),
    )
    cells = (
        pts.groupBy(
            F.expr(f"x div {MORTON_CELL}").alias("cx"),
            F.expr(f"y div {MORTON_CELL}").alias("cy"),
        )
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("bal").cast("long").alias("bal_cents"),
        )
    )
    morton = F.expr(_morton_sql("cx", "cy").replace("//", "div")).cast("long")
    return (
        cells.withColumn("morton", morton)
        .withColumn(
            "rk",
            F.row_number().over(Window.orderBy(F.desc("n"), "morton")).cast("int"),
        )
        .filter(F.col("rk") <= MORTON_TOPK)
        .select("morton", "cx", "cy", "n", "bal_cents", "rk")
    )


# --------------------------------------------------------------------------
# 6. Cochran-Armitage trend test
# --------------------------------------------------------------------------


@query(
    "stat_cochran_armitage",
    oracle="""
WITH xy AS (
  SELECT CAST(substring(o_orderpriority, 1, 1) AS BIGINT) AS w,
         CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
  FROM orders
),
grp AS (
  SELECT w, CAST(count(*) AS BIGINT) AS n_i, CAST(sum(y) AS BIGINT) AS r_i
  FROM xy GROUP BY w
),
tot AS (
  SELECT CAST(sum(n_i) AS BIGINT) AS n, CAST(sum(r_i) AS BIGINT) AS r,
         CAST(count(*) AS BIGINT) AS k
  FROM grp
),
terms AS (
  SELECT CAST(sum(w * (g.r_i * t.n - g.n_i * t.r)) AS BIGINT) AS t_stat,
         CAST(sum(w * w * g.n_i) AS BIGINT) AS sw2n,
         CAST(sum(w * g.n_i) AS BIGINT) AS swn
  FROM grp g, tot t
)
SELECT t.n, t.r, t.k, m.t_stat,
       round(CAST(m.t_stat AS DOUBLE)
             / sqrt((CAST(t.r AS DOUBLE) * (t.n - t.r) / t.n)
                    * (CAST(t.n AS DOUBLE) * m.sw2n
                       - CAST(m.swn AS DOUBLE) * m.swn)), 6) AS z_trend
FROM tot t, terms m
""",
)
def stat_cochran_armitage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran-Armitage test for trend: does the fulfilled-order rate
    (o_orderstatus = 'F') trend monotonically across the ORDERED priority
    doses w = 1..5 (the leading digit of o_orderpriority)? The trend
    statistic T = Sigma w_i (r_i N - n_i R) and its variance terms are
    exact BIGINT group sums; only the final z = T / sqrt(R(N-R)/N *
    (N Sigma w^2 n - (Sigma w n)^2)) is floating (products cast to DOUBLE
    before multiplying — the raw integer product overflows BIGINT at
    sf >= 0.1 — and IEEE sqrt/divide are correctly rounded, so the
    engines agree). The ordered sibling of the chi-square independence
    test: strictly more powerful when the alternative is monotone.

    Scale shape: one hash-agg to k=5 dose rows, two scalar reduces."""
    orders = load(spark, sf_dir, "orders")
    xy = orders.select(
        F.substring("o_orderpriority", 1, 1).cast("long").alias("w"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("y"),
    )
    grp = xy.groupBy("w").agg(
        F.count("*").cast("long").alias("n_i"),
        F.sum("y").cast("long").alias("r_i"),
    )
    tot = grp.agg(
        F.sum("n_i").cast("long").alias("n"),
        F.sum("r_i").cast("long").alias("r"),
        F.count("*").cast("long").alias("k"),
    )
    terms = grp.crossJoin(F.broadcast(tot)).agg(
        F.sum(F.col("w") * (F.col("r_i") * F.col("n") - F.col("n_i") * F.col("r")))
        .cast("long")
        .alias("t_stat"),
        F.sum(F.col("w") * F.col("w") * F.col("n_i")).cast("long").alias("sw2n"),
        F.sum(F.col("w") * F.col("n_i")).cast("long").alias("swn"),
    )
    var = (
        F.col("r").cast("double")
        * (F.col("n") - F.col("r"))
        / F.col("n")
        * (
            F.col("n").cast("double") * F.col("sw2n")
            - F.col("swn").cast("double") * F.col("swn")
        )
    )
    return tot.crossJoin(terms).select(
        "n",
        "r",
        "k",
        "t_stat",
        F.round(F.col("t_stat").cast("double") / F.sqrt(var), 6).alias("z_trend"),
    )
