"""Breadth batch 61 (round 6): activity-based costing, temporal leakage
audit, Yuen's trimmed t, Burt's constraint, random-effects
meta-analysis, split-criteria agreement.

Six operators (reference scope: cost allocation accounting, the
time-series split hygiene check, robust two-sample testing, structural-
holes network capital, the standard heterogeneous meta-analysis, and
decision-tree criterion sensitivity):

- ``agg_activity_based_costing`` — driver-based allocation of two cost
  pools to nations with cost-to-serve margins.
- ``dq_temporal_leakage``   — future-information leakage of a random
  split vs a temporal split.
- ``stat_yuen_trimmed_t``   — Yuen's 20%-trimmed two-sample t on
  winsorized variances (exact order statistics).
- ``graph_burt_constraint`` — Burt's structural-holes constraint per
  node on the undirected link graph.
- ``stat_meta_random_effects`` — DerSimonian-Laird tau² and the
  random-effects pooled mean across per-nation studies.
- ``ml_split_criteria_agreement`` — best threshold under Gini vs
  entropy vs misclassification, and whether they agree.

Reference parity: north-star extension — no reference analogue
(the reference has no analytics layer); these are the audit layers a lake-scale engine
adds on the same tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nocouncil_etl_spark.io import load
from nocouncil_etl_spark.registry import query

ABC_POOL_FULFILL = 1_000_000_00  # fulfillment pool, cents
ABC_POOL_SUPPORT = 400_000_00  # support pool, cents
TL_TEST_FRACTION_MOD = 5  # random split: event_id % 5 == 0 -> test
YUEN_TRIM_MILLI = 200  # 20% trim each side
SC_BAND = 2000


# --------------------------------------------------------------------------
# 1. Activity-based costing
# --------------------------------------------------------------------------


@query(
    "agg_activity_based_costing",
    oracle=f"""
WITH act AS (
  SELECT n.n_name AS nation,
         CAST(count(*) AS BIGINT) AS n_lines,
         CAST(count(DISTINCT o.o_orderkey) AS BIGINT) AS n_orders,
         CAST(sum(CAST(round(100 * l.l_extendedprice) AS BIGINT)) AS BIGINT)
           AS revenue
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n ON n.n_nationkey = c.c_nationkey
  GROUP BY 1
),
tot AS (
  SELECT CAST(sum(n_lines) AS BIGINT) AS tl, CAST(sum(n_orders) AS BIGINT)
           AS torders
  FROM act
),
alloc AS (
  SELECT nation, n_lines, n_orders, revenue,
         CAST(round({ABC_POOL_FULFILL}.0 * n_lines / (SELECT tl FROM tot))
              AS BIGINT) AS fulfillment_cost,
         CAST(round({ABC_POOL_SUPPORT}.0 * n_orders
              / (SELECT torders FROM tot)) AS BIGINT) AS support_cost
  FROM act
)
SELECT nation, n_lines, n_orders, revenue,
       fulfillment_cost, support_cost,
       CAST(revenue - fulfillment_cost - support_cost AS BIGINT)
         AS margin_cents,
       CAST(round(1000.0 * (revenue - fulfillment_cost - support_cost)
                  / revenue) AS BIGINT) AS margin_milli
FROM alloc
""",
)
def agg_activity_based_costing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Activity-based costing: two cost pools allocate to nations by
    their actual activity DRIVERS — fulfillment by line items handled,
    support by orders placed — and the resulting cost-to-serve margins
    expose the customers volume-based allocation flatters (many small
    orders eat support cost that revenue-proportional allocation would
    hide). The canonical management-accounting correction, as one
    rollup + broadcast ratios (agg_apportion_seats handles the
    integer-seat variant of the same allocation problem).

    Scale shape: one four-table join + nation rollup; drivers and
    pools are nation-cardinality arithmetic."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    act = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            F.countDistinct("o_orderkey").cast("long").alias("n_orders"),
            F.sum(F.round(100 * F.col("l_extendedprice")).cast("long"))
            .cast("long")
            .alias("revenue"),
        )
    )
    tot = act.agg(
        F.sum("n_lines").cast("long").alias("tl"),
        F.sum("n_orders").cast("long").alias("torders"),
    )
    alloc = act.crossJoin(F.broadcast(tot)).select(
        "nation",
        "n_lines",
        "n_orders",
        "revenue",
        F.round(float(ABC_POOL_FULFILL) * F.col("n_lines") / F.col("tl"))
        .cast("long")
        .alias("fulfillment_cost"),
        F.round(float(ABC_POOL_SUPPORT) * F.col("n_orders") / F.col("torders"))
        .cast("long")
        .alias("support_cost"),
    )
    margin = F.col("revenue") - F.col("fulfillment_cost") - F.col(
        "support_cost"
    )
    return alloc.select(
        "nation",
        "n_lines",
        "n_orders",
        "revenue",
        "fulfillment_cost",
        "support_cost",
        margin.cast("long").alias("margin_cents"),
        F.round(1000.0 * margin / F.col("revenue"))
        .cast("long")
        .alias("margin_milli"),
    )


# --------------------------------------------------------------------------
# 2. Temporal leakage audit
# --------------------------------------------------------------------------


@query(
    "dq_temporal_leakage",
    oracle=f"""
WITH d AS (
  SELECT epoch_us(ts) AS tus, event_id,
         CASE WHEN event_id % {TL_TEST_FRACTION_MOD} = 0 THEN 1 ELSE 0 END
           AS rnd_test
  FROM events
),
rnd AS (
  SELECT (SELECT min(tus) FROM d WHERE rnd_test = 1) AS test_min,
         (SELECT CAST(count(*) AS BIGINT) FROM d WHERE rnd_test = 0) AS n_train
),
leak AS (
  SELECT CAST(count(*) AS BIGINT) AS n_leaked
  FROM d WHERE rnd_test = 0 AND tus > (SELECT test_min FROM rnd)
),
temporal AS (
  SELECT CAST(round(0.8 * count(*)) AS BIGINT) AS cut_rank FROM d
)
SELECT (SELECT n_train FROM rnd) AS n_train_random,
       (SELECT n_leaked FROM leak) AS n_leaked_random,
       CAST(round(1000.0 * (SELECT n_leaked FROM leak)
                  / (SELECT n_train FROM rnd)) AS BIGINT)
         AS leak_share_milli,
       0 AS n_leaked_temporal
""",
)
def dq_temporal_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal-leakage audit of split design: under a RANDOM train/test
    split (1/{TL_TEST_FRACTION_MOD} by id), count training rows that
    POSTDATE the earliest test row — every one of them lets a
    time-series model peek at the future, the classic inflated-offline-
    metrics bug; the temporal split (cut at the 80% time rank) leaks
    ZERO by construction, printed alongside as the contract. The audit
    to run before trusting any eval on temporal data
    (ml_kfold_cv's folds are only valid for exchangeable rows).

    Scale shape: one scan with two split labels, two scalar rollups."""
    d = load(spark, sf_dir, "events").select(
        F.unix_micros("ts").alias("tus"),
        (F.col("event_id") % TL_TEST_FRACTION_MOD == 0).alias("rnd_test"),
    )
    d.persist()
    test_min = d.filter(F.col("rnd_test")).agg(
        F.min("tus").alias("test_min")
    )
    train = d.filter(~F.col("rnd_test"))
    stats = (
        train.crossJoin(F.broadcast(test_min))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_train_random"),
            F.sum(
                F.when(F.col("tus") > F.col("test_min"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_leaked_random"),
        )
    )
    return stats.select(
        "n_train_random",
        "n_leaked_random",
        F.round(
            1000.0 * F.col("n_leaked_random") / F.col("n_train_random")
        )
        .cast("long")
        .alias("leak_share_milli"),
        F.lit(0).cast("int").alias("n_leaked_temporal"),
    )


# --------------------------------------------------------------------------
# 3. Yuen's trimmed t
# --------------------------------------------------------------------------


@query(
    "stat_yuen_trimmed_t",
    oracle=f"""
WITH s AS (
  SELECT event_id, CAST(round(100 * value) AS BIGINT) AS x,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_a
  FROM events
  WHERE value IS NOT NULL AND event_type IN ('purchase', 'view')
),
r AS (
  SELECT is_a, x,
         row_number() OVER (PARTITION BY is_a ORDER BY x, event_id) AS rn,
         count(*) OVER (PARTITION BY is_a) AS n
  FROM s
),
marks AS (
  SELECT is_a, x, rn, n,
         (n * {YUEN_TRIM_MILLI}) // 1000 AS g
  FROM r
),
wins AS (
  SELECT is_a, n, g,
         CASE WHEN rn <= g + 1 AND rn >= g + 1 THEN x END AS lo_val,
         CASE WHEN rn = n - g THEN x END AS hi_val,
         CASE WHEN rn > g AND rn <= n - g THEN x END AS trim_x,
         rn, x
  FROM marks
),
bounds AS (
  SELECT is_a, max(n) AS n, max(g) AS g,
         max(CASE WHEN rn = g + 1 THEN x END) AS lo,
         max(CASE WHEN rn = n - g THEN x END) AS hi
  FROM wins GROUP BY is_a
),
winz AS (
  SELECT w.is_a, b.n, b.g,
         greatest(least(w.x, b.hi), b.lo) AS wx,
         CASE WHEN w.rn > b.g AND w.rn <= b.n - b.g THEN w.x END AS tx
  FROM marks w JOIN bounds b ON b.is_a = w.is_a
),
mom AS (
  SELECT is_a, max(n) AS n, max(g) AS g,
         CAST(count(tx) AS BIGINT) AS h,
         CAST(sum(tx) AS BIGINT) AS st,
         CAST(sum(CAST(wx AS HUGEINT) * wx) AS DOUBLE) AS sww,
         CAST(sum(wx) AS BIGINT) AS sw
  FROM winz GROUP BY is_a
),
f AS (
  SELECT is_a, n, h,
         CAST(st AS DOUBLE) / h AS tmean,
         (sww - CAST(sw AS DOUBLE) * sw / n) / ((h - 1) * h) AS se2
  FROM mom
)
SELECT (SELECT h FROM f WHERE is_a = 1) AS h1,
       (SELECT h FROM f WHERE is_a = 0) AS h2,
       CAST(round((SELECT tmean FROM f WHERE is_a = 1)
                  - (SELECT tmean FROM f WHERE is_a = 0)) AS BIGINT)
         AS trimmed_diff_cents,
       CAST(round(1000.0 * ((SELECT tmean FROM f WHERE is_a = 1)
                            - (SELECT tmean FROM f WHERE is_a = 0))
            / sqrt((SELECT se2 FROM f WHERE is_a = 1)
                   + (SELECT se2 FROM f WHERE is_a = 0))) AS BIGINT)
         AS t_milli
""",
)
def stat_yuen_trimmed_t(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Yuen's trimmed-mean two-sample t: each group drops its top and
    bottom {YUEN_TRIM_MILLI / 10}% (exact order-statistic cutoffs),
    compares TRIMMED means, and standardizes with the WINSORIZED
    variance over h(h−1) — the robust location test that keeps its
    nominal size under heavy tails and outliers where agg_ttest_welch
    degrades (and unlike rank tests it still estimates a mean-like
    quantity in cents). The winsorized/trimmed split is Tukey's:
    winsorize for spread, trim for location.

    Scale shape: two per-group rank windows, one winsorize join
    (group-bounds broadcast), one moment rollup."""
    s = (
        load(spark, sf_dir, "events")
        .filter(
            F.col("value").isNotNull()
            & F.col("event_type").isin("purchase", "view")
        )
        .select(
            "event_id",
            F.round(100 * F.col("value")).cast("long").alias("x"),
            F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias(
                "is_a"
            ),
        )
    )
    wp = Window.partitionBy("is_a")
    r = s.select(
        "is_a",
        "x",
        F.row_number().over(wp.orderBy("x", "event_id")).alias("rn"),
        F.count(F.lit(1)).over(wp).alias("n"),
    ).withColumn("g", F.expr(f"(n * {YUEN_TRIM_MILLI}) div 1000"))
    bounds = r.groupBy("is_a").agg(
        F.max("n").alias("n"),
        F.max("g").alias("g"),
        F.max(F.when(F.col("rn") == F.col("g") + 1, F.col("x"))).alias("lo"),
        F.max(
            F.when(F.col("rn") == F.col("n") - F.col("g"), F.col("x"))
        ).alias("hi"),
    )
    winz = r.join(
        F.broadcast(
            bounds.select(
                "is_a",
                F.col("lo").alias("blo"),
                F.col("hi").alias("bhi"),
            )
        ),
        "is_a",
    ).select(
        "is_a",
        "n",
        "g",
        F.greatest(F.least(F.col("x"), F.col("bhi")), F.col("blo")).alias(
            "wx"
        ),
        F.when(
            (F.col("rn") > F.col("g")) & (F.col("rn") <= F.col("n") - F.col("g")),
            F.col("x"),
        ).alias("tx"),
    )
    mom = winz.groupBy("is_a").agg(
        F.max("n").alias("n"),
        F.count("tx").cast("long").alias("h"),
        F.sum("tx").cast("long").alias("st"),
        F.sum((F.col("wx").cast("decimal(38,0)") * F.col("wx")))
        .cast("double")
        .alias("sww"),
        F.sum("wx").cast("long").alias("sw"),
    )
    f = mom.select(
        "is_a",
        "h",
        (F.col("st").cast("double") / F.col("h")).alias("tmean"),
        (
            (
                F.col("sww")
                - F.col("sw").cast("double") * F.col("sw") / F.col("n")
            )
            / ((F.col("h") - 1) * F.col("h"))
        ).alias("se2"),
    )
    a = f.filter(F.col("is_a") == 1).select(
        F.col("h").alias("h1"),
        F.col("tmean").alias("m1"),
        F.col("se2").alias("v1"),
    )
    b = f.filter(F.col("is_a") == 0).select(
        F.col("h").alias("h2"),
        F.col("tmean").alias("m2"),
        F.col("se2").alias("v2"),
    )
    return a.crossJoin(F.broadcast(b)).select(
        "h1",
        "h2",
        F.round(F.col("m1") - F.col("m2"))
        .cast("long")
        .alias("trimmed_diff_cents"),
        F.round(
            1000.0
            * (F.col("m1") - F.col("m2"))
            / F.sqrt(F.col("v1") + F.col("v2"))
        )
        .cast("long")
        .alias("t_milli"),
    )


# --------------------------------------------------------------------------
# 4. Burt's constraint
# --------------------------------------------------------------------------


@query(
    "graph_burt_constraint",
    oracle="""
WITH nodes AS (SELECT doc_id AS node FROM documents),
meta AS (SELECT count(*) AS n FROM nodes),
edges_raw AS (
  SELECT node AS src, (node * 31 + 7) % (SELECT n FROM meta) AS dst FROM nodes
  UNION
  SELECT node, (node * 17 + 3) % (SELECT n FROM meta) FROM nodes
  WHERE node % 11 <> 0
  UNION
  SELECT node, (node * 13 + 5) % (SELECT n FROM meta) FROM nodes
  WHERE node % 3 = 0
),
edges0 AS (SELECT DISTINCT src, dst FROM edges_raw WHERE src <> dst),
und AS MATERIALIZED (
  SELECT src AS a, dst AS b FROM edges0 UNION SELECT dst, src FROM edges0),
deg AS MATERIALIZED (
  SELECT a AS node, CAST(count(*) AS BIGINT) AS d FROM und GROUP BY a),
-- p_ij = 1/d_i for each neighbor; indirect term sums p_iq * p_qj over
-- common neighbors q of i and j
ind AS (
  SELECT u1.a AS i, u2.b AS j,
         CAST(sum(CAST(round(1000000.0 / (di.d * dq.d)) AS BIGINT))
              AS BIGINT) AS ind_micro
  FROM und u1
  JOIN und u2 ON u2.a = u1.b AND u2.b <> u1.a
  JOIN deg di ON di.node = u1.a
  JOIN deg dq ON dq.node = u1.b
  GROUP BY 1, 2
),
pij AS (
  SELECT u.a AS i, u.b AS j,
         CAST(round(1000000.0 / d.d) AS BIGINT) AS p_micro
  FROM und u JOIN deg d ON d.node = u.a
),
terms AS (
  SELECT p.i,
         CAST(round(1000000.0 * pow((p.p_micro
                + coalesce(x.ind_micro, 0)) / 1000000.0, 2)) AS BIGINT)
           AS c_micro
  FROM pij p LEFT JOIN ind x ON x.i = p.i AND x.j = p.j
)
SELECT i AS node, CAST(sum(c_micro) AS BIGINT) AS constraint_micro,
       (SELECT CAST(d AS BIGINT) FROM deg WHERE deg.node = terms.i) AS degree
FROM terms GROUP BY i
ORDER BY sum(c_micro) DESC, i LIMIT 15
""",
)
def graph_burt_constraint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burt's structural-holes constraint: for node i,
    c_i = Σ_j (p_ij + Σ_q p_iq·p_qj)² with p the 1/degree investment
    shares — HIGH constraint means i's contacts all know each other
    (no brokerage opportunity), LOW means i bridges structural holes,
    the network-capital number behind brokerage theory (Burt 1992).
    The top-15 most constrained nodes are reported with degrees.
    Per-edge shares quantize to micro before the two-hop sum, so the
    quadratic form is exact.

    Scale shape: the indirect term is one two-hop wedge join (Σd²
    volume — the triangle-join bound), aggregated per (i, j); the
    final rollup is node-cardinality; TakeOrdered caps output."""
    docs = load(spark, sf_dir, "documents")
    nodes = docs.select(F.col("doc_id").alias("node"))
    n = nodes.count()
    e1 = nodes.select("node", ((F.col("node") * 31 + 7) % n).alias("dst"))
    e2 = nodes.filter(F.col("node") % 11 != 0).select(
        "node", ((F.col("node") * 17 + 3) % n).alias("dst")
    )
    e3 = nodes.filter(F.col("node") % 3 == 0).select(
        "node", ((F.col("node") * 13 + 5) % n).alias("dst")
    )
    edges0 = (
        e1.unionByName(e2)
        .unionByName(e3)
        .filter(F.col("node") != F.col("dst"))
        .distinct()
        .select(F.col("node").alias("src"), "dst")
    )
    und = (
        edges0.select(F.col("src").alias("a"), F.col("dst").alias("b"))
        .unionByName(
            edges0.select(F.col("dst").alias("a"), F.col("src").alias("b"))
        )
        .distinct()
    )
    und.persist()
    deg = und.groupBy(F.col("a").alias("node")).agg(
        F.count(F.lit(1)).cast("long").alias("d")
    )
    deg.persist()
    u2 = und.select(F.col("a").alias("q"), F.col("b").alias("j"))
    ind = (
        und.join(u2, F.col("b") == F.col("q"))
        .filter(F.col("j") != F.col("a"))
        .join(deg.select(F.col("node").alias("a"), F.col("d").alias("di")), "a")
        .join(
            deg.select(F.col("node").alias("b"), F.col("d").alias("dq")), "b"
        )
        .groupBy(F.col("a").alias("i"), "j")
        .agg(
            F.sum(
                F.round(1_000_000.0 / (F.col("di") * F.col("dq"))).cast("long")
            )
            .cast("long")
            .alias("ind_micro")
        )
    )
    pij = und.join(
        deg.select(F.col("node").alias("a"), "d"), "a"
    ).select(
        F.col("a").alias("i"),
        F.col("b").alias("j"),
        F.round(1_000_000.0 / F.col("d")).cast("long").alias("p_micro"),
    )
    terms = pij.join(ind, ["i", "j"], "left").select(
        "i",
        F.round(
            1_000_000.0
            * F.pow(
                (F.col("p_micro") + F.coalesce("ind_micro", F.lit(0)))
                / 1_000_000.0,
                2.0,
            )
        )
        .cast("long")
        .alias("c_micro"),
    )
    out = terms.groupBy(F.col("i").alias("node")).agg(
        F.sum("c_micro").cast("long").alias("constraint_micro")
    )
    return (
        out.join(deg.select(F.col("node"), F.col("d").alias("degree")), "node")
        .orderBy(F.desc("constraint_micro"), "node")
        .limit(15)
        .select("node", "constraint_micro", F.col("degree").cast("long"))
    )


# --------------------------------------------------------------------------
# 5. Random-effects meta-analysis
# --------------------------------------------------------------------------


@query(
    "stat_meta_random_effects",
    oracle="""
WITH study AS (
  SELECT c.c_nationkey AS nation,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(round(100 * o.o_totalprice) AS BIGINT)) AS BIGINT)
           AS s,
         CAST(sum(CAST(round(100 * o.o_totalprice) AS HUGEINT)
                  * CAST(round(100 * o.o_totalprice) AS BIGINT)) AS DOUBLE)
           AS ss
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
  GROUP BY 1 HAVING count(*) > 1
),
eff AS (
  SELECT nation, n,
         CAST(s AS DOUBLE) / n AS mean,
         ((ss - CAST(s AS DOUBLE) * s / n) / (n - 1)) / n AS var
  FROM study
),
fixed AS (
  SELECT CAST(count(*) AS BIGINT) AS k,
         sum(mean / var) / sum(1.0 / var) AS mu_f,
         sum(1.0 / var) AS sw, sum(1.0 / var / var) AS sw2
  FROM eff
),
q AS (
  SELECT sum((mean - (SELECT mu_f FROM fixed))
             * (mean - (SELECT mu_f FROM fixed)) / var) AS q
  FROM eff
),
tau AS (
  SELECT greatest(0.0, ((SELECT q FROM q) - ((SELECT k FROM fixed) - 1))
         / ((SELECT sw FROM fixed)
            - (SELECT sw2 FROM fixed) / (SELECT sw FROM fixed))) AS tau2
),
re AS (
  SELECT sum(mean / (var + (SELECT tau2 FROM tau)))
         / sum(1.0 / (var + (SELECT tau2 FROM tau))) AS mu_re
  FROM eff
)
SELECT (SELECT k FROM fixed) AS k_studies,
       CAST(round((SELECT mu_f FROM fixed)) AS BIGINT) AS fixed_mean_cents,
       CAST(round((SELECT mu_re FROM re)) AS BIGINT) AS re_mean_cents,
       CAST(round((SELECT q FROM q) * 1000) AS BIGINT) AS q_milli,
       CAST(round(sqrt((SELECT tau2 FROM tau))) AS BIGINT) AS tau_cents
""",
)
def stat_meta_random_effects(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DerSimonian-Laird random-effects meta-analysis: per-nation mean
    order values are the 'studies' (effect = mean, variance = s²/n from
    exact moments); Cochran's Q over the fixed-effect pool estimates
    the between-study variance τ² = max(0, (Q − (k−1))/(Σw − Σw²/Σw)),
    and the RANDOM-effects pooled mean reweights by 1/(v + τ²) — the
    standard when heterogeneity is real (τ > 0 pulls the pool toward
    the unweighted mean; stat_meta_fixed_effect is the τ = 0 special
    case). Study moments are exact; the solve is scalar.

    Scale shape: one study rollup, three 1-row passes over the k-row
    study table."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    cents = F.round(100 * F.col("o_totalprice")).cast("long")
    study = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .groupBy(F.col("c_nationkey").alias("nation"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(cents).cast("long").alias("s"),
            F.sum((cents.cast("decimal(38,0)") * cents))
            .cast("double")
            .alias("ss"),
        )
        .filter(F.col("n") > 1)
    )
    eff = study.select(
        "nation",
        "n",
        (F.col("s").cast("double") / F.col("n")).alias("mean"),
        (
            (
                (F.col("ss") - F.col("s").cast("double") * F.col("s") / F.col("n"))
                / (F.col("n") - 1)
            )
            / F.col("n")
        ).alias("var"),
    )
    eff.persist()
    fixed = eff.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        (
            F.sum(F.col("mean") / F.col("var")) / F.sum(1.0 / F.col("var"))
        ).alias("mu_f"),
        F.sum(1.0 / F.col("var")).alias("sw"),
        F.sum(1.0 / F.col("var") / F.col("var")).alias("sw2"),
    )
    q = (
        eff.crossJoin(F.broadcast(fixed))
        .agg(
            F.sum(
                (F.col("mean") - F.col("mu_f"))
                * (F.col("mean") - F.col("mu_f"))
                / F.col("var")
            ).alias("q")
        )
    )
    tau = (
        fixed.crossJoin(F.broadcast(q))
        .select(
            F.greatest(
                F.lit(0.0),
                (F.col("q") - (F.col("k") - 1))
                / (F.col("sw") - F.col("sw2") / F.col("sw")),
            ).alias("tau2"),
            "k",
            "mu_f",
            "q",
        )
    )
    re = (
        eff.crossJoin(F.broadcast(tau.select("tau2")))
        .agg(
            (
                F.sum(F.col("mean") / (F.col("var") + F.col("tau2")))
                / F.sum(1.0 / (F.col("var") + F.col("tau2")))
            ).alias("mu_re")
        )
    )
    return tau.crossJoin(F.broadcast(re)).select(
        F.col("k").alias("k_studies"),
        F.round("mu_f").cast("long").alias("fixed_mean_cents"),
        F.round("mu_re").cast("long").alias("re_mean_cents"),
        F.round(F.col("q") * 1000).cast("long").alias("q_milli"),
        F.round(F.sqrt("tau2")).cast("long").alias("tau_cents"),
    )


# --------------------------------------------------------------------------
# 6. Split-criteria agreement
# --------------------------------------------------------------------------


def _sc_crit_sql(crit: str) -> str:
    """Weighted impurity of a (nl, pl, nr, pr) split under a criterion,
    as SQL over cumulative columns; lower is better for all three."""
    if crit == "gini":
        return (
            "(2.0 * pl * (nl - pl) / nl + 2.0 * pr * (nr - pr) / nr)"
        )
    if crit == "entropy":
        return (
            "(CASE WHEN pl > 0 AND pl < nl THEN"
            " - pl * ln(pl / CAST(nl AS DOUBLE))"
            " - (nl - pl) * ln((nl - pl) / CAST(nl AS DOUBLE)) ELSE 0 END"
            " + CASE WHEN pr > 0 AND pr < nr THEN"
            " - pr * ln(pr / CAST(nr AS DOUBLE))"
            " - (nr - pr) * ln((nr - pr) / CAST(nr AS DOUBLE)) ELSE 0 END)"
        )
    return "(least(pl, nl - pl) + least(pr, nr - pr))"


def _sc_oracle() -> str:
    arms = "\nUNION ALL\n".join(
        f"""SELECT '{crit}' AS criterion, band AS best_band
FROM (
  SELECT band,
         row_number() OVER (ORDER BY
           CAST(round(1000000 * {_sc_crit_sql(crit)}) AS BIGINT), band) AS rk
  FROM cand
) WHERE rk = 1"""
        for crit in ("gini", "entropy", "misclass")
    )
    return f"""
WITH labeled AS (
  SELECT CAST(round(100 * value) AS BIGINT) // {SC_BAND} AS band,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
  FROM events WHERE value IS NOT NULL
),
hist AS (
  SELECT band, CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS pos
  FROM labeled GROUP BY band
),
cum AS (
  SELECT band,
         sum(n) OVER (ORDER BY band) AS nl, sum(pos) OVER (ORDER BY band) AS pl
  FROM hist
),
tot AS (SELECT sum(n) AS nt, sum(pos) AS pt FROM hist),
cand AS (
  SELECT band, nl, pl,
         (SELECT nt FROM tot) - nl AS nr, (SELECT pt FROM tot) - pl AS pr
  FROM cum WHERE nl < (SELECT nt FROM tot)
),
picks AS (
{arms}
)
SELECT criterion, CAST(best_band AS BIGINT) AS best_band,
       CASE WHEN (SELECT count(DISTINCT best_band) FROM picks) = 1
            THEN 1 ELSE 0 END AS all_agree
FROM picks
"""


@query("ml_split_criteria_agreement", oracle=_sc_oracle())
def ml_split_criteria_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-criterion sensitivity audit: the best value-band threshold
    for predicting purchases under Gini impurity, entropy, and
    misclassification rate — plus whether all three AGREE. Gini and
    entropy almost always pick the same split (both strictly concave);
    misclassification (piecewise-linear) is the one that diverges, and
    when it does the tree is on a knife edge worth seeing
    (ml_best_split_gini commits to one criterion; this measures how
    much that choice mattered). Impurities quantize to micro before
    the argmin (ties → lower band).

    Scale shape: ONE histogram feeds all three criteria; candidates are
    a cumulative window over the band table."""
    labeled = (
        load(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            F.expr(f"CAST(round(100 * value) AS BIGINT) div {SC_BAND}").alias(
                "band"
            ),
            F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
        )
    )
    hist = labeled.groupBy("band").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").cast("long").alias("pos"),
    )
    wb = Window.orderBy("band").rowsBetween(Window.unboundedPreceding, 0)
    tot = hist.agg(F.sum("n").alias("nt"), F.sum("pos").alias("pt"))
    cand = (
        hist.select(
            "band",
            F.sum("n").over(wb).alias("nl"),
            F.sum("pos").over(wb).alias("pl"),
        )
        .crossJoin(F.broadcast(tot))
        .filter(F.col("nl") < F.col("nt"))
        .select(
            "band",
            "nl",
            "pl",
            (F.col("nt") - F.col("nl")).alias("nr"),
            (F.col("pt") - F.col("pl")).alias("pr"),
        )
    )
    cand.persist()
    picks = None
    for crit in ("gini", "entropy", "misclass"):
        score = F.round(1_000_000 * F.expr(_sc_crit_sql(crit))).cast("long")
        arm = (
            cand.withColumn("score", score)
            .withColumn(
                "rk", F.row_number().over(Window.orderBy("score", "band"))
            )
            .filter(F.col("rk") == 1)
            .select(
                F.lit(crit).alias("criterion"),
                F.col("band").cast("long").alias("best_band"),
            )
        )
        picks = arm if picks is None else picks.unionByName(arm)
    agree = picks.agg(
        F.when(F.countDistinct("best_band") == 1, 1).otherwise(0).alias("a")
    )
    return picks.crossJoin(F.broadcast(agree)).select(
        "criterion", "best_band", F.col("a").alias("all_agree")
    )
