"""Breadth batch 56 (round 6): G-test, h-index, natural clustering
audit, Durbin-Watson, membership-inference gap, recommendation novelty.

Six operators (reference scope: the likelihood-ratio independence test,
the bibliometric productivity index, physical-layout correlation
measurement, residual autocorrelation diagnostics, the memorization
privacy audit, and beyond-accuracy recommendation novelty):

- ``stat_g_test``             — G = 2Σo·ln(o/e) on purchase × weekend
  (the LR twin of the Pearson chi-square).
- ``agg_h_index``             — h-index of customers by order counts
  (h customers with ≥ h orders).
- ``io_natural_clustering_audit`` — per-file date-span coverage under
  key ordering: how well min/max zone maps will prune.
- ``stat_durbin_watson``      — DW statistic of the daily-count trend
  residuals.
- ``privacy_membership_gap``  — train/holdout logloss gap of the
  band-rate model (membership-inference exposure).
- ``eval_rec_novelty``        — mean self-information of each
  customer's top items (popularity novelty).

Reference parity: north-star extension — no reference analogue
(the reference has no analytics layer); these are the audit layers a lake-scale engine
adds on the same tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nocouncil_etl_spark.io import load
from nocouncil_etl_spark.operators.quantiles import with_global_rank
from nocouncil_etl_spark.registry import query

NC_FILE_ROWS = 1000
REC_NOV_TOPK = 3


# --------------------------------------------------------------------------
# 1. G-test
# --------------------------------------------------------------------------


@query(
    "stat_g_test",
    oracle="""
WITH d AS (
  SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos,
         CASE WHEN isodow(CAST(ts AS DATE)) >= 6 THEN 1 ELSE 0 END AS wknd
  FROM events
),
cell AS (
  SELECT pos, wknd, CAST(count(*) AS BIGINT) AS o FROM d GROUP BY 1, 2
),
marg AS (
  SELECT (SELECT CAST(sum(o) AS BIGINT) FROM cell) AS n,
         (SELECT CAST(sum(o) AS BIGINT) FROM cell WHERE pos = 1) AS rp,
         (SELECT CAST(sum(o) AS BIGINT) FROM cell WHERE wknd = 1) AS cw
),
terms AS (
  SELECT c.o,
         CAST(round(1000000 * 2.0 * c.o * ln(
           CAST(c.o AS DOUBLE) * (SELECT n FROM marg)
           / ((CASE WHEN c.pos = 1 THEN (SELECT rp FROM marg)
                    ELSE (SELECT n FROM marg) - (SELECT rp FROM marg) END)
              * (CASE WHEN c.wknd = 1 THEN (SELECT cw FROM marg)
                      ELSE (SELECT n FROM marg) - (SELECT cw FROM marg) END)
              * 1.0))) AS BIGINT) AS g_micro
  FROM cell c WHERE c.o > 0
)
SELECT CAST(count(*) AS BIGINT) AS n_cells,
       CAST(sum(g_micro) AS BIGINT) AS g_micro,
       CASE WHEN sum(g_micro) > 3841000 THEN 1 ELSE 0 END AS significant
FROM terms
""",
)
def stat_g_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G-test (likelihood-ratio) of purchase × weekend independence:
    G = 2Σ o·ln(o·N/(row·col)) over the 2x2 cells — asymptotically the
    same χ²₁ null as agg_chi_square_independence but additive across
    partitions of the data (the property that makes G the right choice
    for hierarchical/log-linear decompositions, and why
    text_collocation_g2 already uses it for collocations). Per-cell
    terms quantize to micro before the sum; flagged against 3.841.

    Scale shape: one 4-cell hash agg, scalar arithmetic."""
    d = load(spark, sf_dir, "events").select(
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("pos"),
        F.when(
            F.when(F.dayofweek(F.col("ts").cast("date")) == 1, 7).otherwise(
                F.dayofweek(F.col("ts").cast("date")) - 1
            )
            >= 6,
            1,
        )
        .otherwise(0)
        .alias("wknd"),
    )
    cell = d.groupBy("pos", "wknd").agg(
        F.count(F.lit(1)).cast("long").alias("o")
    )
    cell.persist()
    marg = cell.agg(
        F.sum("o").cast("long").alias("n"),
        F.sum(F.when(F.col("pos") == 1, F.col("o")).otherwise(0))
        .cast("long")
        .alias("rp"),
        F.sum(F.when(F.col("wknd") == 1, F.col("o")).otherwise(0))
        .cast("long")
        .alias("cw"),
    )
    row = F.when(F.col("pos") == 1, F.col("rp")).otherwise(
        F.col("n") - F.col("rp")
    )
    col = F.when(F.col("wknd") == 1, F.col("cw")).otherwise(
        F.col("n") - F.col("cw")
    )
    terms = cell.crossJoin(F.broadcast(marg)).filter(F.col("o") > 0).select(
        F.round(
            1_000_000
            * 2.0
            * F.col("o")
            * F.log(
                F.col("o").cast("double") * F.col("n") / (row * col * 1.0)
            )
        )
        .cast("long")
        .alias("g_micro")
    )
    return terms.agg(
        F.count(F.lit(1)).cast("long").alias("n_cells"),
        F.sum("g_micro").cast("long").alias("g_micro"),
        F.when(F.sum("g_micro") > 3_841_000, 1).otherwise(0).alias(
            "significant"
        ),
    )


# --------------------------------------------------------------------------
# 2. h-index
# --------------------------------------------------------------------------


@query(
    "agg_h_index",
    oracle="""
WITH per AS (
  SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders
  FROM orders GROUP BY o_custkey
),
r AS (
  SELECT n_orders,
         CAST(row_number() OVER (ORDER BY n_orders DESC, o_custkey)
              AS BIGINT) AS rk
  FROM per
)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM per) AS n_customers,
       (SELECT CAST(max(n_orders) AS BIGINT) FROM per) AS max_orders,
       CAST(coalesce((SELECT max(rk) FROM r WHERE n_orders >= rk), 0)
            AS BIGINT) AS h_index,
       CAST((SELECT sum(n_orders) FROM r
             WHERE rk <= coalesce((SELECT max(rk) FROM r
                                   WHERE n_orders >= rk), 0)) AS BIGINT)
         AS core_orders
""",
)
def agg_h_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """h-index of the customer base (Hirsch 2005, transplanted): the
    largest h such that h customers each placed ≥ h orders — the
    robust 'engaged-core size' that neither whales (max) nor the long
    tail (mean) can move, plus the total orders that core contributes.
    Computed from the exact descending rank: h = max{{rk : n₍rk₎ ≥ rk}}
    (ties broken by key).

    Scale shape (r7): one per-customer hash agg, Fenwick ranks over the
    count column (no global sort), two scalar lookups."""
    per = load(spark, sf_dir, "orders").groupBy("o_custkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders")
    )
    # r7: rank via with_global_rank on the negated count (desc order) —
    # Fenwick prefix counts + tie-block window, no global sort
    r = with_global_rank(
        per.withColumn("_neg", -F.col("n_orders")), "_neg", "o_custkey", "rk"
    ).select("n_orders", "rk")
    r.persist()
    h = r.filter(F.col("n_orders") >= F.col("rk")).agg(
        F.coalesce(F.max("rk"), F.lit(0)).cast("long").alias("h_index")
    )
    meta = per.agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"),
        F.max("n_orders").cast("long").alias("max_orders"),
    )
    core = (
        r.crossJoin(F.broadcast(h))
        .filter(F.col("rk") <= F.col("h_index"))
        .agg(F.sum("n_orders").cast("long").alias("core_orders"))
    )
    return (
        meta.crossJoin(F.broadcast(h))
        .crossJoin(F.broadcast(core))
        .select("n_customers", "max_orders", "h_index", "core_orders")
    )


# --------------------------------------------------------------------------
# 3. Natural clustering audit
# --------------------------------------------------------------------------


@query(
    "io_natural_clustering_audit",
    oracle=f"""
WITH f AS (
  SELECT o_orderkey // {NC_FILE_ROWS} AS file_id,
         CAST(min(CAST(o_orderdate AS DATE)) AS DATE) AS lo,
         CAST(max(CAST(o_orderdate AS DATE)) AS DATE) AS hi
  FROM orders GROUP BY 1
),
tot AS (
  SELECT CAST(min(lo) AS DATE) AS glo, CAST(max(hi) AS DATE) AS ghi,
         CAST(max(hi) - min(lo) AS BIGINT) + 1 AS span
  FROM f
)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM f) AS n_files,
       (SELECT CAST(span AS BIGINT) FROM tot) AS table_span_days,
       CAST(round(CAST(sum(hi - lo + 1) AS DOUBLE) / count(*)) AS BIGINT)
         AS mean_file_span_days,
       CAST(round(1000.0 * sum(hi - lo + 1)
                  / (count(*) * (SELECT span FROM tot))) AS BIGINT)
         AS clustering_factor_milli
FROM f
""",
)
def io_natural_clustering_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Natural-clustering audit for zone-map pruning: files are
    key-ordered {NC_FILE_ROWS}-row blocks; each file's DATE min/max
    span over the table's span is the CLUSTERING FACTOR — near 0 means
    date predicates prune almost every file even though the table is
    sorted by KEY (insertion order correlates with time — the free
    lunch behind layout_minmax_pruning); near 1000 means the zone maps
    are useless and a Z-order/sort rewrite (layout_zorder_skip) pays.
    The factor is the single number a layout advisor computes per
    (sort key, predicate column) pair.

    Scale shape: one file-grain min/max hash agg, 1-row rollups."""
    f = load(spark, sf_dir, "orders").groupBy(
        F.expr(f"o_orderkey div {NC_FILE_ROWS}").alias("file_id")
    ).agg(
        F.min(F.col("o_orderdate").cast("date")).alias("lo"),
        F.max(F.col("o_orderdate").cast("date")).alias("hi"),
    )
    f.persist()
    tot = f.agg(
        (F.datediff(F.max("hi"), F.min("lo")) + 1)
        .cast("long")
        .alias("span")
    )
    return (
        f.agg(
            F.count(F.lit(1)).cast("long").alias("n_files"),
            F.sum(F.datediff("hi", "lo") + 1).alias("sspan"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "n_files",
            F.col("span").alias("table_span_days"),
            F.round(F.col("sspan").cast("double") / F.col("n_files"))
            .cast("long")
            .alias("mean_file_span_days"),
            F.round(
                1000.0 * F.col("sspan") / (F.col("n_files") * F.col("span"))
            )
            .cast("long")
            .alias("clustering_factor_milli"),
        )
    )


# --------------------------------------------------------------------------
# 4. Durbin-Watson
# --------------------------------------------------------------------------


@query(
    "stat_durbin_watson",
    oracle="""
WITH cnt AS (
  SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS y
  FROM events GROUP BY 1
),
idx AS (
  SELECT y, CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS t FROM cnt
),
m AS (
  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(t) AS BIGINT) AS st,
         CAST(sum(t * t) AS BIGINT) AS stt, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(t * y) AS BIGINT) AS sty
  FROM idx
),
fit AS (
  SELECT (n * sty - CAST(st AS DOUBLE) * sy)
           / (n * stt - CAST(st AS DOUBLE) * st) AS b,
         (CAST(sy AS DOUBLE) - (n * sty - CAST(st AS DOUBLE) * sy)
          / (n * stt - CAST(st AS DOUBLE) * st) * st) / n AS a
  FROM m
),
e AS (
  SELECT t, CAST(round(1000 * (y - (SELECT a FROM fit)
                               - (SELECT b FROM fit) * t)) AS BIGINT) AS eq
  FROM idx
),
d AS (
  SELECT eq, lag(eq) OVER (ORDER BY t) AS prev FROM e
)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM e) AS n,
       CAST(round(1000.0
            * sum(CASE WHEN prev IS NOT NULL
                       THEN CAST((eq - prev) AS DOUBLE) * (eq - prev) END)
            / sum(CAST(eq AS DOUBLE) * eq)) AS BIGINT) AS dw_milli
FROM d
""",
)
def stat_durbin_watson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Durbin-Watson statistic of the daily-event-count trend
    residuals: DW = Σ(eₜ − eₜ₋₁)² / Σeₜ² ≈ 2(1 − ρ₁) — near 2 means the
    trend fit left white noise, toward 0 means positive autocorrelation
    (standard errors are lies; the series needs ts_ar2_yule_walker's
    dynamics), toward 4 negative. Residuals come from the exact-moment
    OLS and quantize to milli integers, so both sums are exact; one
    division at the end. The time-series sibling of stat_breusch_pagan
    (variance structure) — DW checks CORRELATION structure.

    Scale shape: calendar-sized series, one trend fit, one lag window,
    one rollup."""
    cnt = (
        load(spark, sf_dir, "events")
        .groupBy(F.col("ts").cast("date").alias("day"))
        .agg(F.count(F.lit(1)).cast("long").alias("y"))
    )
    idx = cnt.select(
        "y",
        F.row_number().over(Window.orderBy("day")).cast("long").alias("t"),
    )
    m = idx.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("t").cast("long").alias("st"),
        F.sum(F.col("t") * F.col("t")).cast("long").alias("stt"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("t") * F.col("y")).cast("long").alias("sty"),
    ).first()
    n, st, stt, sy, sty = (
        int(m.n),
        int(m.st),
        int(m.stt),
        int(m.sy),
        int(m.sty),
    )
    b = (n * sty - float(st) * sy) / (n * stt - float(st) * st)
    a = (float(sy) - b * st) / n
    e = idx.select(
        "t",
        F.round(1000 * (F.col("y") - F.lit(a) - F.lit(b) * F.col("t")))
        .cast("long")
        .alias("eq"),
    )
    d = e.select("eq", F.lag("eq").over(Window.orderBy("t")).alias("prev"))
    return d.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.round(
            1000.0
            * F.sum(
                F.when(
                    F.col("prev").isNotNull(),
                    (F.col("eq") - F.col("prev")).cast("double")
                    * (F.col("eq") - F.col("prev")),
                )
            )
            / F.sum(F.col("eq").cast("double") * F.col("eq"))
        )
        .cast("long")
        .alias("dw_milli"),
    )


# --------------------------------------------------------------------------
# 5. Membership-inference gap
# --------------------------------------------------------------------------


@query(
    "privacy_membership_gap",
    oracle="""
WITH d AS (
  SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y,
         CAST(round(100 * value) AS BIGINT) // 2000 AS band,
         event_id % 2 AS holdout
  FROM events WHERE value IS NOT NULL
),
model AS (
  SELECT band, sum(y) + 1.0 AS a, count(*) + 2.0 AS b
  FROM d WHERE holdout = 0 GROUP BY band
),
scored AS (
  SELECT d.y, d.holdout, m.a / m.b AS p
  FROM d JOIN model m ON m.band = d.band
),
ll AS (
  SELECT holdout,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(round(1000000 * (CASE WHEN y = 1 THEN -ln(p)
                                             ELSE -ln(1 - p) END))
                       AS BIGINT)) AS BIGINT) AS sll
  FROM scored GROUP BY holdout
)
SELECT (SELECT n FROM ll WHERE holdout = 0) AS n_train,
       (SELECT n FROM ll WHERE holdout = 1) AS n_holdout,
       (SELECT CAST(round(CAST(sll AS DOUBLE) / n) AS BIGINT)
        FROM ll WHERE holdout = 0) AS train_logloss_micro,
       (SELECT CAST(round(CAST(sll AS DOUBLE) / n) AS BIGINT)
        FROM ll WHERE holdout = 1) AS holdout_logloss_micro,
       (SELECT CAST(round(CAST(sll AS DOUBLE) / n) AS BIGINT)
        FROM ll WHERE holdout = 1)
       - (SELECT CAST(round(CAST(sll AS DOUBLE) / n) AS BIGINT)
          FROM ll WHERE holdout = 0) AS membership_gap_micro
""",
)
def privacy_membership_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Membership-inference exposure, measured the standard way
    (Yeom 2018): train the Laplace-smoothed band-rate model on the
    even-id half, score BOTH halves, and report the train-vs-holdout
    mean logloss gap — the gap IS the signal a membership attacker
    thresholds on, and (bounded by ε) what DP training would cap. Zero
    gap = no memorization; the audit that motivates the privacy_dp_*
    operators. Per-row loglosses quantize to micro before the means.

    Scale shape: one filtered hash agg for the model (broadcast), one
    scored scan, a 2-group rollup."""
    d = (
        load(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
            F.expr("CAST(round(100 * value) AS BIGINT) div 2000").alias(
                "band"
            ),
            (F.col("event_id") % 2).alias("holdout"),
        )
    )
    model = (
        d.filter(F.col("holdout") == 0)
        .groupBy("band")
        .agg(((F.sum("y") + 1.0) / (F.count(F.lit(1)) + 2.0)).alias("p"))
    )
    scored = d.join(F.broadcast(model), "band")
    ll = F.when(F.col("y") == 1, -F.log("p")).otherwise(
        -F.log(1 - F.col("p"))
    )
    agg = scored.groupBy("holdout").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.round(1_000_000 * ll).cast("long")).alias("sll"),
    )
    tr = agg.filter(F.col("holdout") == 0).select(
        F.col("n").alias("n_train"),
        F.round(F.col("sll").cast("double") / F.col("n"))
        .cast("long")
        .alias("train_logloss_micro"),
    )
    ho = agg.filter(F.col("holdout") == 1).select(
        F.col("n").alias("n_holdout"),
        F.round(F.col("sll").cast("double") / F.col("n"))
        .cast("long")
        .alias("holdout_logloss_micro"),
    )
    return tr.crossJoin(F.broadcast(ho)).select(
        "n_train",
        "n_holdout",
        "train_logloss_micro",
        "holdout_logloss_micro",
        (F.col("holdout_logloss_micro") - F.col("train_logloss_micro"))
        .cast("long")
        .alias("membership_gap_micro"),
    )


# --------------------------------------------------------------------------
# 6. Recommendation novelty
# --------------------------------------------------------------------------


@query(
    "eval_rec_novelty",
    oracle=f"""
WITH spend AS (
  SELECT o.o_custkey AS cid, l.l_partkey AS pid,
         CAST(sum(CAST(round(100 * l.l_extendedprice) AS BIGINT)) AS BIGINT)
           AS cents
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
  GROUP BY 1, 2
),
pop AS (
  SELECT pid, CAST(count(*) AS BIGINT) AS n_buyers FROM spend GROUP BY pid
),
nu AS (SELECT CAST(count(DISTINCT cid) AS BIGINT) AS n_users FROM spend),
topk AS (
  SELECT cid, pid FROM (
    SELECT cid, pid,
           row_number() OVER (PARTITION BY cid ORDER BY cents DESC, pid) AS rk
    FROM spend
  ) WHERE rk <= {REC_NOV_TOPK}
),
scored AS (
  SELECT t.cid,
         CAST(round(1000000 * ln(CAST((SELECT n_users FROM nu) AS DOUBLE)
                                 / p.n_buyers) / ln(2)) AS BIGINT)
           AS si_micro
  FROM topk t JOIN pop p ON p.pid = t.pid
)
SELECT CAST(count(DISTINCT cid) AS BIGINT) AS n_users,
       CAST(count(*) AS BIGINT) AS n_recs,
       CAST(round(CAST(sum(si_micro) AS DOUBLE) / count(*) / 1000) AS BIGINT)
         AS mean_novelty_milli_bits,
       CAST(min(si_micro) AS BIGINT) AS min_si_micro
FROM scored
""",
)
def eval_rec_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recommendation novelty (Zhou 2010 self-information): each
    top-{REC_NOV_TOPK} item scores −log₂(buyers/users) bits — popular
    items carry little information ('everyone already knows'), long-
    tail items much — and the mean over all lists is THE novelty
    number read alongside eval_rec_diversity (coverage/variety) and
    accuracy. Per-item bits quantize to micro before the mean; the
    popularity table is exact counts.

    Scale shape: one spend rollup, popularity counts (broadcast), a
    per-customer top-k window, one rollup."""
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    spend = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .groupBy(
            F.col("o_custkey").alias("cid"), F.col("l_partkey").alias("pid")
        )
        .agg(
            F.sum(F.round(100 * F.col("l_extendedprice")).cast("long"))
            .cast("long")
            .alias("cents")
        )
    )
    spend.persist()
    pop = spend.groupBy("pid").agg(
        F.count(F.lit(1)).cast("long").alias("n_buyers")
    )
    nu = spend.agg(F.countDistinct("cid").cast("long").alias("n_users_t"))
    topk = (
        spend.withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("cid").orderBy(F.desc("cents"), "pid")
            ),
        )
        .filter(F.col("rk") <= REC_NOV_TOPK)
        .select("cid", "pid")
    )
    import math

    scored = (
        topk.join(pop, "pid")
        .crossJoin(F.broadcast(nu))
        .select(
            "cid",
            F.round(
                1_000_000
                * F.log(
                    F.col("n_users_t").cast("double") / F.col("n_buyers")
                )
                / math.log(2)
            )
            .cast("long")
            .alias("si_micro"),
        )
    )
    return scored.agg(
        F.countDistinct("cid").cast("long").alias("n_users"),
        F.count(F.lit(1)).cast("long").alias("n_recs"),
        F.round(F.sum("si_micro").cast("double") / F.count(F.lit(1)) / 1000)
        .cast("long")
        .alias("mean_novelty_milli_bits"),
        F.min("si_micro").cast("long").alias("min_si_micro"),
    )
