"""Breadth batch 52 (round 6): exposure fairness, parallel-trends
check, bullwhip effect, inference-risk baseline, recommendation
diversity, Cramér-von Mises test.

Six operators (reference scope: fairness of ranked exposure, the
pre-trend validity check behind difference-in-differences, supply-chain
variance amplification, disclosure-risk baselining, beyond-accuracy
recommender metrics, and the integral-type two-sample test):

- ``eval_exposure_fairness``  — group exposure share under logarithmic
  position weights vs population share in the revenue ranking.
- ``eval_parallel_trends``    — pre-period slope gap between treatment
  and control (the DiD identification check).
- ``agg_bullwhip_effect``     — order-vs-demand variance ratio per
  brand (the supply-chain amplification index).
- ``privacy_inference_risk``  — majority-rule attribute-inference
  accuracy of language from source vs the global baseline.
- ``eval_rec_diversity``      — catalog coverage and intra-list brand
  diversity of each customer's top spends.
- ``stat_cvm_two_sample``     — two-sample Cramér-von Mises T from the
  exact integer rank identity.

Reference parity: north-star extension — no reference analogue
(the reference has no analytics layer); these are the audit layers a lake-scale engine
adds on the same tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nocouncil_etl_spark.io import load
from nocouncil_etl_spark.operators.quantiles import cumulate
from nocouncil_etl_spark.registry import query

EXP_TOPK = 200
PT_SPLIT_YEAR = 1998
REC_TOPK = 3


# --------------------------------------------------------------------------
# 1. Exposure fairness
# --------------------------------------------------------------------------


@query(
    "eval_exposure_fairness",
    oracle=f"""
WITH ranked AS (
  SELECT c.c_custkey, n.n_name AS grp,
         row_number() OVER (ORDER BY coalesce(o.rev, 0) DESC, c.c_custkey)
           AS rk
  FROM customer c
  JOIN nation n ON n.n_nationkey = c.c_nationkey
  LEFT JOIN (SELECT o_custkey, CAST(sum(CAST(round(100 * o_totalprice)
                    AS BIGINT)) AS BIGINT) AS rev
             FROM orders GROUP BY 1) o ON o.o_custkey = c.c_custkey
),
exp_ AS (
  SELECT grp,
         CAST(sum(CAST(round(1000000.0 / ln(1.0 + rk) * ln(2.0)) AS BIGINT))
              AS BIGINT) AS exposure_micro
  FROM ranked WHERE rk <= {EXP_TOPK} GROUP BY grp
),
pop AS (
  SELECT grp, CAST(count(*) AS BIGINT) AS n_pop FROM ranked GROUP BY grp
),
tot AS (
  SELECT CAST(sum(exposure_micro) AS BIGINT) AS te FROM exp_
),
totp AS (SELECT CAST(sum(n_pop) AS BIGINT) AS tp FROM pop)
SELECT p.grp AS nation, p.n_pop,
       coalesce(e.exposure_micro, 0) AS exposure_micro,
       CAST(round(1000.0 * coalesce(e.exposure_micro, 0)
                  / (SELECT te FROM tot)) AS BIGINT) AS exposure_share_milli,
       CAST(round(1000.0 * p.n_pop / (SELECT tp FROM totp)) AS BIGINT)
         AS population_share_milli,
       CAST(round(1000.0 * coalesce(e.exposure_micro, 0)
                  / (SELECT te FROM tot))
            - round(1000.0 * p.n_pop / (SELECT tp FROM totp)) AS BIGINT)
         AS exposure_gap_milli
FROM pop p LEFT JOIN exp_ e ON e.grp = p.grp
""",
)
def eval_exposure_fairness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exposure fairness of the customer revenue ranking: position
    exposure follows the DCG discount ln2/ln(1+rank) over the top
    {EXP_TOPK} (quantized micro per position, so group sums are exact
    integers); each nation's exposure SHARE is compared with its
    POPULATION share — the gap is the Singh-Joachims style disparity a
    ranked surface gives or denies a group, which accuracy metrics
    (eval_ndcg_at_k) never show. Ties break by customer key.

    Scale shape: one revenue rollup + one global rank window
    (documented single-sequence sort; per-shard rankings at scale),
    group-cardinality rollups."""
    cust = load(spark, sf_dir, "customer")
    nat = load(spark, sf_dir, "nation")
    orders = load(spark, sf_dir, "orders")
    rev = orders.groupBy("o_custkey").agg(
        F.sum(F.round(100 * F.col("o_totalprice")).cast("long"))
        .cast("long")
        .alias("rev")
    )
    ranked = (
        cust.join(F.broadcast(nat), cust["c_nationkey"] == nat["n_nationkey"])
        .join(rev, cust["c_custkey"] == rev["o_custkey"], "left")
        .select(
            F.col("n_name").alias("grp"),
            F.row_number()
            .over(
                Window.orderBy(
                    F.desc(F.coalesce("rev", F.lit(0))), "c_custkey"
                )
            )
            .alias("rk"),
        )
    )
    import math

    exp_ = (
        ranked.filter(F.col("rk") <= EXP_TOPK)
        .select(
            "grp",
            F.round(1_000_000.0 / F.log(1.0 + F.col("rk")) * math.log(2.0))
            .cast("long")
            .alias("e"),
        )
        .groupBy("grp")
        .agg(F.sum("e").cast("long").alias("exposure_micro"))
    )
    pop = ranked.groupBy("grp").agg(
        F.count(F.lit(1)).cast("long").alias("n_pop")
    )
    tot = exp_.agg(F.sum("exposure_micro").alias("te"))
    totp = pop.agg(F.sum("n_pop").alias("tp"))
    es = F.round(
        1000.0 * F.coalesce("exposure_micro", F.lit(0)) / F.col("te")
    )
    ps = F.round(1000.0 * F.col("n_pop") / F.col("tp"))
    return (
        pop.join(exp_, "grp", "left")
        .crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(totp))
        .select(
            F.col("grp").alias("nation"),
            "n_pop",
            F.coalesce("exposure_micro", F.lit(0))
            .cast("long")
            .alias("exposure_micro"),
            es.cast("long").alias("exposure_share_milli"),
            ps.cast("long").alias("population_share_milli"),
            (es - ps).cast("long").alias("exposure_gap_milli"),
        )
    )


# --------------------------------------------------------------------------
# 2. Parallel trends
# --------------------------------------------------------------------------


@query(
    "eval_parallel_trends",
    oracle=f"""
WITH m AS (
  SELECT c.c_nationkey % 2 AS treat,
         (extract(year FROM o.o_orderdate) - 1995) * 12
           + extract(month FROM o.o_orderdate) AS t,
         CAST(sum(CAST(round(100 * o.o_totalprice) AS BIGINT)) AS BIGINT)
           AS rev
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  WHERE extract(year FROM o.o_orderdate) < {PT_SPLIT_YEAR}
  GROUP BY 1, 2
),
mom AS (
  SELECT treat, CAST(count(*) AS BIGINT) AS n, CAST(sum(t) AS BIGINT) AS st,
         CAST(sum(t * t) AS BIGINT) AS stt, CAST(sum(rev) AS BIGINT) AS sy,
         CAST(sum(CAST(t AS HUGEINT) * rev) AS DOUBLE) AS sty
  FROM m GROUP BY treat
),
fit AS (
  SELECT treat,
         (n * sty - CAST(st AS DOUBLE) * sy)
         / (n * stt - CAST(st AS DOUBLE) * st) AS slope,
         n
  FROM mom
)
SELECT t1.n AS n_months_treat, t0.n AS n_months_ctrl,
       CAST(round(t1.slope) AS BIGINT) AS treat_slope_cents,
       CAST(round(t0.slope) AS BIGINT) AS ctrl_slope_cents,
       CAST(round(t1.slope - t0.slope) AS BIGINT) AS pretrend_gap_cents
FROM (SELECT * FROM fit WHERE treat = 1) t1
CROSS JOIN (SELECT * FROM fit WHERE treat = 0) t0
""",
)
def eval_parallel_trends(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parallel-trends check for difference-in-differences: BEFORE the
    {PT_SPLIT_YEAR} policy date, the monthly revenue slopes of the
    treatment (odd nations) and control (even nations) groups are fit
    by exact-moment OLS; their gap IS the identification threat —
    eval_diff_in_diff's estimate is only causal if this gap is ≈ 0
    (the check every DiD referee asks for first). Month indices are
    integers; only the slope division is floating.

    Scale shape: one filtered join + (group, month) hash agg, a 2-group
    moment aggregate, 1-row arithmetic."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    m = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .filter(F.year("o_orderdate") < PT_SPLIT_YEAR)
        .groupBy(
            (F.col("c_nationkey") % 2).alias("treat"),
            (
                (F.year("o_orderdate") - 1995) * 12
                + F.month("o_orderdate")
            ).alias("t"),
        )
        .agg(
            F.sum(F.round(100 * F.col("o_totalprice")).cast("long"))
            .cast("long")
            .alias("rev")
        )
    )
    mom = m.groupBy("treat").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("t").cast("long").alias("st"),
        F.sum(F.col("t") * F.col("t")).cast("long").alias("stt"),
        F.sum("rev").cast("long").alias("sy"),
        F.sum((F.col("t").cast("decimal(38,0)") * F.col("rev")))
        .cast("double")
        .alias("sty"),
    )
    slope = (
        F.col("n") * F.col("sty") - F.col("st").cast("double") * F.col("sy")
    ) / (F.col("n") * F.col("stt") - F.col("st").cast("double") * F.col("st"))
    fit = mom.select("treat", "n", slope.alias("slope"))
    t1 = fit.filter(F.col("treat") == 1).select(
        F.col("n").alias("n_months_treat"), F.col("slope").alias("s1")
    )
    t0 = fit.filter(F.col("treat") == 0).select(
        F.col("n").alias("n_months_ctrl"), F.col("slope").alias("s0")
    )
    return t1.crossJoin(F.broadcast(t0)).select(
        "n_months_treat",
        "n_months_ctrl",
        F.round("s1").cast("long").alias("treat_slope_cents"),
        F.round("s0").cast("long").alias("ctrl_slope_cents"),
        F.round(F.col("s1") - F.col("s0"))
        .cast("long")
        .alias("pretrend_gap_cents"),
    )


# --------------------------------------------------------------------------
# 3. Bullwhip effect
# --------------------------------------------------------------------------


@query(
    "agg_bullwhip_effect",
    oracle="""
WITH demand AS (
  SELECT p.p_brand AS brand, strftime(l.l_shipdate, '%Y-%m') AS mon,
         CAST(sum(CAST(round(1000 * l.l_quantity) AS BIGINT)) AS BIGINT) AS q
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
  GROUP BY 1, 2
),
orders_ AS (
  SELECT p.p_brand AS brand, strftime(o.o_orderdate, '%Y-%m') AS mon,
         CAST(count(DISTINCT o.o_orderkey) AS BIGINT) AS q
  FROM lineitem l
  JOIN part p ON p.p_partkey = l.l_partkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  GROUP BY 1, 2
),
vd AS (
  SELECT brand, CAST(count(*) AS BIGINT) AS n, CAST(sum(q) AS BIGINT) AS s,
         CAST(sum(CAST(q AS HUGEINT) * q) AS DOUBLE) AS ss
  FROM demand GROUP BY brand
),
vo AS (
  SELECT brand, CAST(count(*) AS BIGINT) AS n, CAST(sum(q) AS BIGINT) AS s,
         CAST(sum(CAST(q AS HUGEINT) * q) AS DOUBLE) AS ss
  FROM orders_ GROUP BY brand
)
SELECT vd.brand,
       vd.n AS n_months,
       CAST(round(1000.0
            * ((vo.ss - CAST(vo.s AS DOUBLE) * vo.s / vo.n) / vo.n
               / (CAST(vo.s AS DOUBLE) / vo.n)
               / (CAST(vo.s AS DOUBLE) / vo.n))
            / ((vd.ss - CAST(vd.s AS DOUBLE) * vd.s / vd.n) / vd.n
               / (CAST(vd.s AS DOUBLE) / vd.n)
               / (CAST(vd.s AS DOUBLE) / vd.n))) AS BIGINT)
         AS bullwhip_milli
FROM vd JOIN vo ON vo.brand = vd.brand AND vo.n = vd.n
WHERE vd.ss - CAST(vd.s AS DOUBLE) * vd.s / vd.n > 0
""",
)
def agg_bullwhip_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bullwhip effect per brand: the coefficient-of-variation ratio
    CV²(orders)/CV²(demand) over monthly series — the Lee-Padmanabhan-
    Whang amplification index (>1 means order batching/forecast
    gaming amplifies demand noise upstream, the supply-chain failure
    mode). Demand = shipped quantity, orders = distinct order count,
    both exact integer monthly sums; variances from 128-bit moments;
    only brands with identical month coverage and positive demand
    variance compare.

    Scale shape: two join+hash-agg passes to brand-month grains, two
    brand-grain moment rollups, a brand equi-join."""
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    orders = load(spark, sf_dir, "orders")
    demand = (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .groupBy(
            F.col("p_brand").alias("brand"),
            F.date_format("l_shipdate", "yyyy-MM").alias("mon"),
        )
        .agg(
            F.sum(F.round(1000 * F.col("l_quantity")).cast("long"))
            .cast("long")
            .alias("q")
        )
    )
    orders_ = (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .groupBy(
            F.col("p_brand").alias("brand"),
            F.date_format("o_orderdate", "yyyy-MM").alias("mon"),
        )
        .agg(F.countDistinct("o_orderkey").cast("long").alias("q"))
    )

    def mom(df: DataFrame, pre: str) -> DataFrame:
        return df.groupBy("brand").agg(
            F.count(F.lit(1)).cast("long").alias(f"{pre}n"),
            F.sum("q").cast("long").alias(f"{pre}s"),
            F.sum((F.col("q").cast("decimal(38,0)") * F.col("q")))
            .cast("double")
            .alias(f"{pre}ss"),
        )

    vd = mom(demand, "d")
    vo = mom(orders_, "o")

    def cv2(pre: str):
        n = F.col(f"{pre}n")
        s = F.col(f"{pre}s").cast("double")
        ss = F.col(f"{pre}ss")
        return ((ss - s * s / n) / n) / (s / n) / (s / n)

    return (
        vd.join(vo, "brand")
        .filter(
            (F.col("dn") == F.col("on"))
            & (
                F.col("dss")
                - F.col("ds").cast("double") * F.col("ds") / F.col("dn")
                > 0
            )
        )
        .select(
            "brand",
            F.col("dn").alias("n_months"),
            F.round(1000.0 * cv2("o") / cv2("d"))
            .cast("long")
            .alias("bullwhip_milli"),
        )
    )


# --------------------------------------------------------------------------
# 4. Inference risk
# --------------------------------------------------------------------------


@query(
    "privacy_inference_risk",
    oracle="""
WITH cell AS (
  SELECT source, lang, CAST(count(*) AS BIGINT) AS n
  FROM documents GROUP BY 1, 2
),
best AS (
  SELECT source, max(n) AS top_n FROM cell GROUP BY source
),
base AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS n FROM documents GROUP BY lang
),
basebest AS (SELECT max(n) AS bn, CAST(sum(n) AS BIGINT) AS total FROM base)
SELECT CAST(sum(top_n) AS BIGINT) AS n_correct,
       (SELECT total FROM basebest) AS n_total,
       CAST(round(1000.0 * sum(top_n) / (SELECT total FROM basebest))
            AS BIGINT) AS attacker_acc_milli,
       CAST(round(1000.0 * (SELECT bn FROM basebest)
                  / (SELECT total FROM basebest)) AS BIGINT)
         AS baseline_acc_milli,
       CAST(round(1000.0 * sum(top_n) / (SELECT total FROM basebest))
            - round(1000.0 * (SELECT bn FROM basebest)
                    / (SELECT total FROM basebest)) AS BIGINT)
         AS inference_gain_milli
FROM best
""",
)
def privacy_inference_risk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attribute-inference risk baseline: an attacker who sees only a
    document's SOURCE and guesses the majority language of that source
    achieves some accuracy; compared against the no-information
    baseline (global majority language), the GAIN quantifies how much
    the quasi-identifier leaks about the sensitive attribute — the
    measurement privacy_l_diversity and privacy_t_closeness bound but
    don't report as an attack number. Majority ties break by language
    string (max_by on the (count, lang) pair — a total order).

    Scale shape: one (source, lang) hash agg, a per-source argmax, two
    1-row baselines."""
    docs = load(spark, sf_dir, "documents")
    cell = docs.groupBy("source", "lang").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    best = cell.groupBy("source").agg(F.max("n").alias("top_n"))
    base = docs.groupBy("lang").agg(F.count(F.lit(1)).cast("long").alias("n"))
    basebest = base.agg(
        F.max("n").alias("bn"), F.sum("n").cast("long").alias("total")
    )
    agg = best.agg(F.sum("top_n").cast("long").alias("n_correct"))
    acc = F.round(1000.0 * F.col("n_correct") / F.col("total"))
    bacc = F.round(1000.0 * F.col("bn") / F.col("total"))
    return agg.crossJoin(F.broadcast(basebest)).select(
        "n_correct",
        F.col("total").alias("n_total"),
        acc.cast("long").alias("attacker_acc_milli"),
        bacc.cast("long").alias("baseline_acc_milli"),
        (acc - bacc).cast("long").alias("inference_gain_milli"),
    )


# --------------------------------------------------------------------------
# 5. Recommendation diversity
# --------------------------------------------------------------------------


@query(
    "eval_rec_diversity",
    oracle=f"""
WITH spend AS (
  SELECT o.o_custkey AS cid, p.p_brand AS brand, l.l_partkey AS pid,
         CAST(sum(CAST(round(100 * l.l_extendedprice) AS BIGINT)) AS BIGINT)
           AS cents
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN part p ON p.p_partkey = l.l_partkey
  GROUP BY 1, 2, 3
),
topk AS (
  SELECT cid, pid, brand FROM (
    SELECT cid, pid, brand,
           row_number() OVER (PARTITION BY cid ORDER BY cents DESC, pid) AS rk
    FROM spend
  ) WHERE rk <= {REC_TOPK}
),
peruser AS (
  SELECT cid, CAST(count(*) AS BIGINT) AS k,
         CAST(count(DISTINCT brand) AS BIGINT) AS kb
  FROM topk GROUP BY cid
),
cat AS (SELECT CAST(count(*) AS BIGINT) AS n_items FROM part)
SELECT CAST(count(*) AS BIGINT) AS n_users,
       (SELECT CAST(count(DISTINCT pid) AS BIGINT) FROM topk) AS items_shown,
       CAST(round(1000.0 * (SELECT count(DISTINCT pid) FROM topk)
                  / (SELECT n_items FROM cat)) AS BIGINT)
         AS catalog_coverage_milli,
       CAST(round(1000.0 * sum(CAST(kb AS DOUBLE) / k) / count(*))
            AS BIGINT) AS mean_brand_diversity_milli
FROM peruser
""",
)
def eval_rec_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Beyond-accuracy recommender metrics over each customer's
    top-{REC_TOPK} spend items (the implicit-feedback 'recommendation'
    list rec_item_cosine would re-rank): CATALOG COVERAGE (share of the
    part catalog any list surfaces — low coverage = popularity bias)
    and mean intra-list BRAND DIVERSITY (distinct brands / list size) —
    the two standard checks that a recommender isn't just accurate but
    useful (Ziegler 2005 / Ge 2010). Counts are exact; ties break by
    part key.

    Scale shape: one three-table rollup, a per-customer top-k window,
    two tiny aggregates."""
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    part = load(spark, sf_dir, "part")
    spend = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .groupBy(
            F.col("o_custkey").alias("cid"),
            F.col("p_brand").alias("brand"),
            F.col("l_partkey").alias("pid"),
        )
        .agg(
            F.sum(F.round(100 * F.col("l_extendedprice")).cast("long"))
            .cast("long")
            .alias("cents")
        )
    )
    w = Window.partitionBy("cid").orderBy(F.desc("cents"), "pid")
    topk = (
        spend.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= REC_TOPK)
        .select("cid", "pid", "brand")
    )
    topk.persist()
    peruser = topk.groupBy("cid").agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.countDistinct("brand").cast("long").alias("kb"),
    )
    shown = topk.agg(
        F.countDistinct("pid").cast("long").alias("items_shown")
    )
    cat = part.agg(F.count(F.lit(1)).cast("long").alias("n_items"))
    return (
        peruser.agg(
            F.count(F.lit(1)).cast("long").alias("n_users"),
            F.round(
                1000.0
                * F.sum(F.col("kb").cast("double") / F.col("k"))
                / F.count(F.lit(1))
            )
            .cast("long")
            .alias("mean_brand_diversity_milli"),
        )
        .crossJoin(F.broadcast(shown))
        .crossJoin(F.broadcast(cat))
        .select(
            "n_users",
            "items_shown",
            F.round(1000.0 * F.col("items_shown") / F.col("n_items"))
            .cast("long")
            .alias("catalog_coverage_milli"),
            "mean_brand_diversity_milli",
        )
    )


# --------------------------------------------------------------------------
# 6. Cramér-von Mises
# --------------------------------------------------------------------------


@query(
    "stat_cvm_two_sample",
    oracle="""
WITH s AS (
  SELECT event_id, CAST(round(100 * value) AS BIGINT) AS x,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_a
  FROM events
  WHERE value IS NOT NULL AND event_type IN ('purchase', 'view')
),
r AS (
  SELECT is_a,
         CAST(row_number() OVER (ORDER BY x, event_id) AS BIGINT) AS rk,
         CAST(row_number() OVER (PARTITION BY is_a ORDER BY x, event_id)
              AS BIGINT) AS i
  FROM s
),
u AS (
  SELECT CAST(sum(CASE WHEN is_a = 1
                       THEN CAST(rk - i AS HUGEINT) * (rk - i) END)
              AS DOUBLE) AS ua,
         CAST(sum(CASE WHEN is_a = 0
                       THEN CAST(rk - i AS HUGEINT) * (rk - i) END)
              AS DOUBLE) AS ub,
         CAST(sum(is_a) AS BIGINT) AS n1,
         CAST(sum(1 - is_a) AS BIGINT) AS n2
  FROM r
)
SELECT n1, n2,
       CAST(round(1000000 * (
         (n1 * ua + n2 * ub)
         / (CAST(n1 AS DOUBLE) * n2 * (n1 + n2))
         - (4.0 * n1 * n2 - 1) / (6.0 * (n1 + n2)))) AS BIGINT)
         AS t_micro
FROM u
""",
)
def stat_cvm_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Cramér-von Mises test via Anderson's exact rank
    identity: with pooled ranks r and within-sample indices i,
    U = n₁Σ(r−i)²|A + n₂Σ(r−i)²|B and
    T = U/(n₁n₂N) − (4n₁n₂−1)/(6N) — the INTEGRAL of the squared ECDF
    gap, weighing the whole distribution where stat_ks_two_sample takes
    only the supremum (CvM has more power against diffuse
    differences). Every sum is an exact BIGINT over the (value, id)
    total order; T divides once.

    Scale shape (r7): the same Fenwick prefix-sum rank recipe as
    Brunner-Munzel (no global sort), one rollup — the full integral
    statistic at hash-aggregate cost."""
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
    # r7: both rank systems from one Fenwick prefix-sum pass + value-
    # partitioned tie-block windows (the Brunner-Munzel recipe) — no
    # global or 2-partition sort
    byv = s.groupBy("x").agg(
        F.count(F.lit(1)).cast("long").alias("c"),
        F.sum("is_a").cast("long").alias("c_a"),
    )
    bel = cumulate(byv, "x", ("c", "c_a")).select(
        "x",
        (F.col("cum_c") - F.col("c")).alias("below"),
        (F.col("cum_c_a") - F.col("c_a")).alias("below_a"),
        (
            (F.col("cum_c") - F.col("cum_c_a"))
            - (F.col("c") - F.col("c_a"))
        ).alias("below_b"),
    )
    j_all = F.row_number().over(Window.partitionBy("x").orderBy("event_id"))
    j_grp = F.row_number().over(
        Window.partitionBy("is_a", "x").orderBy("event_id")
    )
    r = s.join(bel, "x").select(
        "is_a",
        (F.col("below") + j_all).cast("long").alias("rk"),
        (
            F.when(F.col("is_a") == 1, F.col("below_a")).otherwise(
                F.col("below_b")
            )
            + j_grp
        )
        .cast("long")
        .alias("i"),
    )
    d2 = (F.col("rk") - F.col("i")).cast("decimal(38,0)") * (
        F.col("rk") - F.col("i")
    )
    u = r.agg(
        F.sum(F.when(F.col("is_a") == 1, d2)).cast("double").alias("ua"),
        F.sum(F.when(F.col("is_a") == 0, d2)).cast("double").alias("ub"),
        F.sum("is_a").cast("long").alias("n1"),
        F.sum(1 - F.col("is_a")).cast("long").alias("n2"),
    )
    n1, n2 = F.col("n1"), F.col("n2")
    return u.select(
        "n1",
        "n2",
        F.round(
            1_000_000
            * (
                (n1 * F.col("ua") + n2 * F.col("ub"))
                / (n1.cast("double") * n2 * (n1 + n2))
                - (4.0 * n1 * n2 - 1) / (6.0 * (n1 + n2))
            )
        )
        .cast("long")
        .alias("t_micro"),
    )
