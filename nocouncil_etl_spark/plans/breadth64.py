"""Breadth batch 44 (round 6): Gini mean difference, id-gap islands,
rich-club coefficient, Cucconi test, dictionary-encoding model, Page
trend test.

Six operators (reference scope: robust dispersion, sequence-integrity
auditing, hub interconnection structure, joint location-scale two-sample
testing, storage encoding planning, and ordered-alternative trend
testing across blocks):

- ``stat_gini_mean_difference`` — GMD per event type via the sorted
  order-statistic identity (exact integers).
- ``dq_id_gap_islands``         — gaps-and-islands audit of the order
  key sequence (missing ranges, largest gap).
- ``graph_rich_club``           — rich-club coefficient phi(k) over a
  degree-threshold grid.
- ``stat_cucconi_location_scale`` — Cucconi two-sample test (squared
  ranks + antiranks, jointly location and scale).
- ``io_dictionary_encoding_model`` — per-column dictionary-encoding
  size model (bit-width from distinct count) vs raw.
- ``stat_page_trend``           — Page's L test for an ordered weekday
  trend within event-type blocks.

Reference parity: north-star extension — no reference analogue
(the reference has no analytics layer); these are the audit layers a lake-scale engine
adds on the same tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nocouncil_etl_spark.io import load
from nocouncil_etl_spark.operators.quantiles import (
    ranged_rank_cumsum,
    with_global_rank,
)
from nocouncil_etl_spark.plans.graph_plans import _EDGES_SQL, _graph
from nocouncil_etl_spark.registry import query

RC_KS = (2, 4, 6, 8)
CUC_A, CUC_B = "purchase", "view"
DICT_COLS = ("o_orderstatus", "o_orderpriority")


# --------------------------------------------------------------------------
# 1. Gini mean difference
# --------------------------------------------------------------------------


@query(
    "stat_gini_mean_difference",
    oracle="""
WITH v AS (
  SELECT event_type, CAST(round(100 * value) AS BIGINT) AS x
  FROM events WHERE value IS NOT NULL
),
r AS (
  SELECT event_type, x,
         row_number() OVER (PARTITION BY event_type ORDER BY x) AS i,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM v
)
SELECT event_type, CAST(max(n) AS BIGINT) AS n,
       CAST(sum((2 * i - n - 1) * x) AS BIGINT) AS s_num,
       CAST(round(2000.0 * sum((2 * i - n - 1) * x)
                  / (max(n) * (max(n) - 1))) AS BIGINT) AS gmd_milli
FROM r GROUP BY event_type
""",
)
def stat_gini_mean_difference(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini mean difference per event type — the mean absolute
    difference over all value pairs, E|X−X'| — computed WITHOUT the
    quadratic pair join via the sorted identity
    GMD = 2/(n(n−1)) · Σᵢ (2i − n − 1)·x₍ᵢ₎ (x sorted, i the rank).
    The robust dispersion scale behind Gini concentration
    (agg_gini_concentration normalizes it by the mean); numerator is an
    exact BIGINT, one division at the end.

    Scale shape: one type-partitioned window sort, one hash agg — the
    O(n²) pair semantics at O(n log n) cost, which is the whole point
    at 100 TB."""
    v = (
        load(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            "event_type", F.round(100 * F.col("value")).cast("long").alias("x")
        )
    )
    wp = Window.partitionBy("event_type")
    r = v.select(
        "event_type",
        "x",
        F.row_number().over(wp.orderBy("x")).alias("i"),
        F.count(F.lit(1)).over(wp).alias("n"),
    )
    s = F.sum((2 * F.col("i") - F.col("n") - 1) * F.col("x"))
    return r.groupBy("event_type").agg(
        F.max("n").cast("long").alias("n"),
        s.cast("long").alias("s_num"),
        F.round(2000.0 * s / (F.max("n") * (F.max("n") - 1)))
        .cast("long")
        .alias("gmd_milli"),
    )


# --------------------------------------------------------------------------
# 2. Id gaps and islands
# --------------------------------------------------------------------------


@query(
    "dq_id_gap_islands",
    oracle="""
WITH k AS (SELECT DISTINCT o_orderkey AS id FROM orders),
g AS (
  SELECT id, lag(id) OVER (ORDER BY id) AS prev FROM k
),
gaps AS (
  SELECT prev + 1 AS gap_start, id - prev - 1 AS gap_len
  FROM g WHERE prev IS NOT NULL AND id - prev > 1
),
big AS (
  SELECT gap_start, gap_len FROM gaps
  ORDER BY gap_len DESC, gap_start LIMIT 1
)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM k) AS n_keys,
       (SELECT CAST(min(id) AS BIGINT) FROM k) AS min_id,
       (SELECT CAST(max(id) AS BIGINT) FROM k) AS max_id,
       (SELECT CAST(count(*) AS BIGINT) FROM gaps) AS n_gaps,
       (SELECT CAST(coalesce(sum(gap_len), 0) AS BIGINT) FROM gaps)
         AS missing_total,
       (SELECT CAST(gap_len AS BIGINT) FROM big) AS largest_gap,
       (SELECT CAST(gap_start AS BIGINT) FROM big) AS largest_gap_start
""",
)
def dq_id_gap_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands audit of the order-key sequence: how many
    contiguous id islands the table actually holds, how many ids are
    missing inside the observed range, and where the largest hole is —
    the sequence-integrity check that catches dropped ingest batches
    and id-generator skips (islands = n_gaps + 1).

    Scale shape (r9): adjacency in id order via ONE ranged scan carrying
    the lag (ids are UNIQUE — the ranged scan's domain; the r7 Fenwick
    rank + consecutive-rank join paid the O(levels) explode and a second
    shuffle for the same lag): no global sort at any row count."""
    k = load(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("id")
    ).distinct()
    g = ranged_rank_cumsum(k, "id", "id", lag_col="id").select(
        "id", F.col("prev_id").alias("prev")
    )
    gaps = g.filter(F.col("id") - F.col("prev") > 1).select(
        (F.col("prev") + 1).alias("gap_start"),
        (F.col("id") - F.col("prev") - 1).alias("gap_len"),
    )
    gaps.persist()
    meta = k.agg(
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.min("id").cast("long").alias("min_id"),
        F.max("id").cast("long").alias("max_id"),
    )
    gstats = gaps.agg(
        F.count(F.lit(1)).cast("long").alias("n_gaps"),
        F.coalesce(F.sum("gap_len"), F.lit(0)).cast("long").alias(
            "missing_total"
        ),
    )
    big = (
        gaps.orderBy(F.desc("gap_len"), "gap_start")
        .limit(1)
        .select(
            F.col("gap_len").cast("long").alias("largest_gap"),
            F.col("gap_start").cast("long").alias("largest_gap_start"),
        )
    )
    return (
        meta.crossJoin(F.broadcast(gstats))
        .join(F.broadcast(big), F.lit(True), "left")
        .select(
            "n_keys",
            "min_id",
            "max_id",
            "n_gaps",
            "missing_total",
            "largest_gap",
            "largest_gap_start",
        )
    )


# --------------------------------------------------------------------------
# 3. Rich-club coefficient
# --------------------------------------------------------------------------


def _rc_oracle() -> str:
    arms = "\nUNION ALL\n".join(
        f"""SELECT {k} AS k,
       (SELECT CAST(count(*) AS BIGINT) FROM udeg WHERE d > {k}) AS n_rich,
       (SELECT CAST(count(*) AS BIGINT)
        FROM und u
        JOIN udeg ga ON ga.node = u.a AND ga.d > {k}
        JOIN udeg gb ON gb.node = u.b AND gb.d > {k}) AS dir_edges"""
        for k in RC_KS
    )
    return f"""
WITH {_EDGES_SQL},
und AS MATERIALIZED (
  SELECT src AS a, dst AS b FROM edges0 UNION SELECT dst, src FROM edges0),
udeg AS MATERIALIZED (
  SELECT a AS node, CAST(count(*) AS BIGINT) AS d FROM und GROUP BY a),
arms AS (
{arms}
)
SELECT k, n_rich, dir_edges // 2 AS club_edges,
       CASE WHEN n_rich >= 2
            THEN CAST(round(1000.0 * dir_edges / (n_rich * (n_rich - 1)))
                 AS BIGINT) END AS phi_milli
FROM arms
"""


@query("graph_rich_club", oracle=_rc_oracle())
def graph_rich_club(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rich-club coefficient phi(k) = E_k / (R_k choose 2) over the
    degree grid k in {RC_KS}: among nodes of degree > k, what fraction
    of possible ties actually exist — rising phi with k means the hubs
    form an elite club (infrastructure nets), flat/falling means hubs
    avoid each other (many biological nets). Computed on the undirected
    link graph; phi in exact milli units, NULL when fewer than 2 club
    members.

    Scale shape: degrees once; per k one degree-filtered double
    semi-join on the edge list (broadcastable club membership) + count
    — no materialized club subgraph."""
    nodes, edges, _n = _graph(spark, sf_dir)
    und = (
        edges.select(F.col("src").alias("a"), F.col("dst").alias("b"))
        .unionByName(edges.select(F.col("dst").alias("a"), F.col("src").alias("b")))
        .distinct()
    )
    und.persist()
    udeg = und.groupBy(F.col("a").alias("node")).agg(
        F.count(F.lit(1)).cast("long").alias("d")
    )
    udeg.persist()
    out = None
    for k in RC_KS:
        rich = udeg.filter(F.col("d") > k).select("node")
        n_rich = rich.agg(F.count(F.lit(1)).cast("long").alias("n_rich"))
        dir_edges = (
            und.join(rich.withColumnRenamed("node", "a"), "a")
            .join(rich.withColumnRenamed("node", "b"), "b")
            .agg(F.count(F.lit(1)).cast("long").alias("dir_edges"))
        )
        arm = (
            n_rich.crossJoin(F.broadcast(dir_edges))
            .select(
                F.lit(k).cast("int").alias("k"),
                "n_rich",
                F.expr("dir_edges div 2").cast("long").alias("club_edges"),
                F.when(
                    F.col("n_rich") >= 2,
                    F.round(
                        1000.0
                        * F.col("dir_edges")
                        / (F.col("n_rich") * (F.col("n_rich") - 1))
                    ).cast("long"),
                ).alias("phi_milli"),
            )
        )
        out = arm if out is None else out.unionByName(arm)
    return out


# --------------------------------------------------------------------------
# 4. Cucconi two-sample test
# --------------------------------------------------------------------------


@query(
    "stat_cucconi_location_scale",
    oracle=f"""
WITH s AS (
  SELECT event_id, CAST(round(100 * value) AS BIGINT) AS x,
         CASE WHEN event_type = '{CUC_A}' THEN 1 ELSE 0 END AS is_a
  FROM events
  WHERE value IS NOT NULL AND event_type IN ('{CUC_A}', '{CUC_B}')
),
r AS (
  SELECT is_a,
         CAST(row_number() OVER (ORDER BY x, event_id) AS BIGINT) AS rk,
         CAST(count(*) OVER () AS BIGINT) AS n
  FROM s
),
agg AS (
  SELECT max(n) AS n,
         CAST(sum(CASE WHEN is_a = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         CAST(sum(CASE WHEN is_a = 1 THEN rk * rk ELSE 0 END) AS BIGINT) AS u,
         CAST(sum(CASE WHEN is_a = 1 THEN (n + 1 - rk) * (n + 1 - rk)
                       ELSE 0 END) AS BIGINT) AS v
  FROM r
),
std AS (
  SELECT n, n1, n - n1 AS n2,
         (u - n1 * (n + 1.0) * (2 * n + 1.0) / 6.0)
         / sqrt(n1 * (n - n1) * (n + 1.0) * (2 * n + 1.0)
                * (8 * n + 11.0) / 180.0) AS us,
         (v - n1 * (n + 1.0) * (2 * n + 1.0) / 6.0)
         / sqrt(n1 * (n - n1) * (n + 1.0) * (2 * n + 1.0)
                * (8 * n + 11.0) / 180.0) AS vs,
         2.0 * (n * n - 4.0) / ((2 * n + 1.0) * (8 * n + 11.0)) - 1.0 AS rho
  FROM agg
)
SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
       CAST(round(1000 * us) AS BIGINT) AS u_std_milli,
       CAST(round(1000 * vs) AS BIGINT) AS v_std_milli,
       CAST(round(1000 * (us * us + vs * vs - 2 * rho * us * vs)
                  / (2 * (1 - rho * rho))) AS BIGINT) AS c_milli
FROM std
""",
)
def stat_cucconi_location_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cucconi (1968) two-sample test of '{CUC_A}' vs '{CUC_B}' values:
    squared ranks U and squared ANTIranks V of sample A in the pooled
    ordering (ties broken by event id — a total order, so both engines
    rank identically), each standardized by the exact null moments, and
    combined as C = (U² + V² − 2ρUV)/(2(1−ρ²)) — ONE statistic
    sensitive to location AND scale shifts jointly, which
    stat_mann_whitney_u (location) and stat_levene_mean (scale) can
    each miss alone. Rank sums are exact BIGINTs; only the
    standardization divides.

    Scale shape (r7): ranks over the (value, id) total order come from
    Fenwick prefix counts + a value-partitioned tie-block window
    (operators/quantiles.with_global_rank) — no global sort anywhere;
    then one moment aggregate, 1-row arithmetic."""
    s = (
        load(spark, sf_dir, "events")
        .filter(
            F.col("value").isNotNull()
            & F.col("event_type").isin(CUC_A, CUC_B)
        )
        .select(
            "event_id",
            F.round(100 * F.col("value")).cast("long").alias("x"),
            F.when(F.col("event_type") == CUC_A, 1).otherwise(0).alias("is_a"),
        )
    )
    tot = s.agg(F.count(F.lit(1)).cast("long").alias("n"))
    r = with_global_rank(s, "x", "event_id", "rk").crossJoin(
        F.broadcast(tot)
    ).select("is_a", "rk", "n")
    anti = F.col("n") + 1 - F.col("rk")
    agg = r.agg(
        F.max("n").alias("n"),
        F.sum("is_a").cast("long").alias("n1"),
        F.sum(F.when(F.col("is_a") == 1, F.col("rk") * F.col("rk")).otherwise(0))
        .cast("long")
        .alias("u"),
        F.sum(F.when(F.col("is_a") == 1, anti * anti).otherwise(0))
        .cast("long")
        .alias("v"),
    )
    n, n1 = F.col("n"), F.col("n1")
    mean = n1 * (n + 1.0) * (2 * n + 1.0) / 6.0
    sd = F.sqrt(
        n1 * (n - n1) * (n + 1.0) * (2 * n + 1.0) * (8 * n + 11.0) / 180.0
    )
    rho = 2.0 * (n * n - 4.0) / ((2 * n + 1.0) * (8 * n + 11.0)) - 1.0
    std = agg.select(
        n1.alias("n1"),
        (n - n1).alias("n2"),
        ((F.col("u") - mean) / sd).alias("us"),
        ((F.col("v") - mean) / sd).alias("vs"),
        rho.alias("rho"),
    )
    return std.select(
        F.col("n1").cast("long"),
        F.col("n2").cast("long"),
        F.round(1000 * F.col("us")).cast("long").alias("u_std_milli"),
        F.round(1000 * F.col("vs")).cast("long").alias("v_std_milli"),
        F.round(
            1000
            * (
                F.col("us") * F.col("us")
                + F.col("vs") * F.col("vs")
                - 2 * F.col("rho") * F.col("us") * F.col("vs")
            )
            / (2 * (1 - F.col("rho") * F.col("rho")))
        )
        .cast("long")
        .alias("c_milli"),
    )


# --------------------------------------------------------------------------
# 5. Dictionary-encoding model
# --------------------------------------------------------------------------


def _dict_oracle() -> str:
    arms = "\nUNION ALL\n".join(
        f"SELECT '{c}' AS col, {c} AS val FROM orders" for c in DICT_COLS
    )
    return f"""
WITH long_ AS (
{arms}
),
per AS (
  SELECT col, CAST(count(*) AS BIGINT) AS n,
         CAST(count(DISTINCT val) AS BIGINT) AS n_distinct,
         CAST(sum(length(val)) AS BIGINT) AS raw_bytes
  FROM long_ GROUP BY col
),
dist AS (
  SELECT col, CAST(sum(length(val)) AS BIGINT) AS dict_payload
  FROM (SELECT DISTINCT col, val FROM long_) GROUP BY col
)
SELECT p.col, p.n, p.n_distinct, p.raw_bytes,
       d.dict_payload
       + (p.n * CASE WHEN p.n_distinct <= 1 THEN 1
                     ELSE length(bin(p.n_distinct - 1)) END + 7) // 8
         AS dict_bytes,
       CAST(round(1000.0 * p.raw_bytes
                  / (d.dict_payload
                     + (p.n * CASE WHEN p.n_distinct <= 1 THEN 1
                              ELSE length(bin(p.n_distinct - 1)) END + 7) // 8))
            AS BIGINT) AS ratio_milli
FROM per p JOIN dist d ON d.col = p.col
"""


@query("io_dictionary_encoding_model", oracle=_dict_oracle())
def io_dictionary_encoding_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dictionary-encoding size model per string column of orders: raw
    bytes vs (distinct-value payload + n·ceil(log2(distinct)) bits of
    codes) — the first-order model every columnar writer (Parquet/ORC)
    uses to decide dictionary vs plain encoding, and the planner input
    for column-order/compression choices. Bit width comes from the
    binary representation length of (distinct−1) — integer-exact on
    both engines; compression ratio in milli.

    Scale shape: one unpivoted scan, two hash aggs (per-column counts,
    distinct payload) — the model never materializes codes."""
    orders = load(spark, sf_dir, "orders")
    long_ = None
    for c in DICT_COLS:
        arm = orders.select(
            F.lit(c).alias("col"), F.col(c).alias("val")
        )
        long_ = arm if long_ is None else long_.unionByName(arm)
    per = long_.groupBy("col").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.countDistinct("val").cast("long").alias("n_distinct"),
        F.sum(F.length("val")).cast("long").alias("raw_bytes"),
    )
    dist = (
        long_.distinct()
        .groupBy("col")
        .agg(F.sum(F.length("val")).cast("long").alias("dict_payload"))
    )
    bits = F.when(F.col("n_distinct") <= 1, 1).otherwise(
        F.length(F.bin(F.col("n_distinct") - 1))
    )
    dict_bytes = F.col("dict_payload") + F.floor(
        (F.col("n") * bits + 7) / 8
    ).cast("long")
    return per.join(dist, "col").select(
        "col",
        "n",
        "n_distinct",
        "raw_bytes",
        dict_bytes.cast("long").alias("dict_bytes"),
        F.round(1000.0 * F.col("raw_bytes") / dict_bytes)
        .cast("long")
        .alias("ratio_milli"),
    )


# --------------------------------------------------------------------------
# 6. Page trend test
# --------------------------------------------------------------------------


@query(
    "stat_page_trend",
    oracle="""
WITH cell AS (
  SELECT event_type AS blk, isodow(CAST(ts AS DATE)) AS trt,
         sum(CAST(round(100 * value) AS BIGINT)) AS x
  FROM events WHERE value IS NOT NULL GROUP BY 1, 2
),
rk AS (
  SELECT blk, trt,
         CAST(row_number() OVER (PARTITION BY blk ORDER BY x, trt) AS BIGINT)
           AS r
  FROM cell
),
colsum AS (
  SELECT trt, CAST(sum(r) AS BIGINT) AS rsum FROM rk GROUP BY trt
),
meta AS (
  SELECT CAST(count(DISTINCT blk) AS BIGINT) AS n_blocks,
         CAST(count(DISTINCT trt) AS BIGINT) AS k
  FROM cell
),
l AS (SELECT CAST(sum(trt * rsum) AS BIGINT) AS l_stat FROM colsum)
SELECT (SELECT n_blocks FROM meta) AS n_blocks,
       (SELECT k FROM meta) AS k_treatments,
       (SELECT l_stat FROM l) AS l_stat,
       CAST(round(1000.0 * ((SELECT l_stat FROM l)
              - (SELECT n_blocks * k * (k + 1) * (k + 1) / 4.0 FROM meta))
            / sqrt((SELECT n_blocks * k * k * (k + 1)
                           * (k * k - 1) * (k + 1) / 144.0 FROM meta)))
            AS BIGINT) AS z_milli
FROM l
""",
)
def stat_page_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page's L test (Page 1963) for an ORDERED weekday trend: within
    each event-type block, the 7 weekday revenue totals are ranked
    (ties broken by weekday — a total order both engines share), and
    L = Σ_j j·R_j weights rank sums by the hypothesized order
    (Mon → Sun). Against stat_friedman_blocks (any difference) and
    stat_jonckheere_terpstra (ordered, unblocked), Page's test is THE
    blocked ordered-alternative: maximal power when the trend is
    monotone across the week. z uses the exact null mean/variance of L.

    Scale shape: one hash agg to the |types|×7 cell table, one tiny
    window, 1-row arithmetic."""
    cell = (
        load(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .groupBy(
            F.col("event_type").alias("blk"),
            F.dayofweek(F.col("ts").cast("date")).alias("dow_raw"),
        )
        .agg(
            F.sum(F.round(100 * F.col("value")).cast("long"))
            .cast("long")
            .alias("x")
        )
        .select(
            "blk",
            # convert Spark's Sun=1..Sat=7 to ISO Mon=1..Sun=7
            F.when(F.col("dow_raw") == 1, 7)
            .otherwise(F.col("dow_raw") - 1)
            .alias("trt"),
            "x",
        )
    )
    w = Window.partitionBy("blk").orderBy("x", "trt")
    rk = cell.select("blk", "trt", F.row_number().over(w).cast("long").alias("r"))
    colsum = rk.groupBy("trt").agg(F.sum("r").cast("long").alias("rsum"))
    meta = cell.agg(
        F.countDistinct("blk").cast("long").alias("n_blocks"),
        F.countDistinct("trt").cast("long").alias("k"),
    )
    l = colsum.agg(
        F.sum(F.col("trt") * F.col("rsum")).cast("long").alias("l_stat")
    )
    nb, kk, ls = F.col("n_blocks"), F.col("k"), F.col("l_stat")
    mean = nb * kk * (kk + 1) * (kk + 1) / 4.0
    var = nb * kk * kk * (kk + 1) * (kk * kk - 1) * (kk + 1) / 144.0
    return l.crossJoin(F.broadcast(meta)).select(
        nb.alias("n_blocks"),
        kk.alias("k_treatments"),
        ls.alias("l_stat"),
        F.round(1000.0 * (ls - mean) / F.sqrt(var))
        .cast("long")
        .alias("z_milli"),
    )
