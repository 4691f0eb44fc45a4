"""Breadth batch 38 (round 6): Croston forecasting, CMH test, Theil
decomposition, Kendall tau-b, PRF query expansion, triplet mining.

Six operators (reference scope: intermittent-event forecasting on the
fetch log, stratified association, inequality accounting of the feed,
rank agreement without Pearson assumptions, retrieval query expansion,
and metric-learning training-data mining):

- ``ts_croston_intermittent`` — Croston's method for intermittent
  demand (separate EMAs of nonzero size and inter-arrival gap), exact
  fixed point, recursive-CTE oracle.
- ``stat_cmh_stratified``   — Cochran-Mantel-Haenszel common-odds test
  across priority strata (per-stratum 2x2, quantized E/V terms).
- ``agg_theil_decomposition`` — Theil inequality index with its exact
  between-group / within-group decomposition over md5 cohorts.
- ``eval_kendall_tau_deciles`` — Kendall tau-b rank agreement between
  per-user spend and activity, on power-of-two buckets, all pair
  counts exact from the joint cell table.
- ``search_prf_expansion``  — pseudo-relevance-feedback query expansion:
  top terms of the query's top-10 docs weighted against corpus df.
- ``vec_triplet_semihard``  — semi-hard triplet mining over labeled
  embeddings (FaceNet recipe) with exact integer distances.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nocouncil_etl_spark.io import fan_out, load
from nocouncil_etl_spark.plans.breadth15 import _pt, _pt_sql
from nocouncil_etl_spark.registry import query

# --------------------------------------------------------------------------
# 1. Croston's intermittent-demand forecast
# --------------------------------------------------------------------------

CROSTON_THRESH = 450  # dollars; "large purchase" events are intermittent
CROSTON_ALPHA_DIV = 8  # alpha = 1/8


@query(
    "ts_croston_intermittent",
    oracle=f"""
WITH RECURSIVE demand AS (
  SELECT event_type, CAST(ts AS DATE) AS d, CAST(count(*) AS BIGINT) AS q
  FROM events WHERE value > {CROSTON_THRESH}
  GROUP BY 1, 2
),
idx AS (
  SELECT event_type,
         CAST(row_number() OVER (PARTITION BY event_type ORDER BY d)
              AS BIGINT) AS i,
         q,
         CAST(coalesce(d - lag(d) OVER (PARTITION BY event_type ORDER BY d),
                       1) AS BIGINT) AS gap
  FROM demand
),
dp AS (
  SELECT event_type, i,
         CAST(q * 1000 AS BIGINT) AS z, CAST(gap * 1000 AS BIGINT) AS p
  FROM idx WHERE i = 1
  UNION ALL
  SELECT i.event_type, i.i,
         CAST(dp.z + (i.q * 1000 - dp.z) // {CROSTON_ALPHA_DIV} AS BIGINT),
         CAST(dp.p + (i.gap * 1000 - dp.p) // {CROSTON_ALPHA_DIV} AS BIGINT)
  FROM dp JOIN idx i ON i.event_type = dp.event_type AND i.i = dp.i + 1
),
fin AS (
  SELECT d.event_type, d.z, d.p,
         (SELECT CAST(max(i) AS BIGINT) FROM idx x
          WHERE x.event_type = d.event_type) AS n_demands
  FROM dp d
  WHERE d.i = (SELECT max(i) FROM idx x WHERE x.event_type = d.event_type)
)
SELECT event_type, n_demands, z AS z_milli, p AS p_milli,
       (z * 1000) // p AS forecast_milli
FROM fin
""",
)
def ts_croston_intermittent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Croston's method (1972), the standard forecaster for INTERMITTENT
    demand (many zero days): maintain two separate exponential smoothers
    — one over the nonzero demand sizes, one over the inter-arrival
    gaps — updated only on demand days, and forecast demand-per-period
    as z/p. Here the intermittent signal is daily counts of large
    (> ${CROSTON_THRESH}) purchases; alpha = 1/{CROSTON_ALPHA_DIV} in
    exact milli fixed point, so both engines replay the identical
    recursion (recursive-CTE oracle, ts_dtw_pattern technique).

    Scale shape: the demand-day table is date-range-bounded; the
    recursion carries two BIGINTs per key — applyInPandasWithState
    shaped if run streaming."""
    import pandas as pd

    ev = load(spark, sf_dir, "events")
    demand = (
        ev.filter(F.col("value") > CROSTON_THRESH)
        .groupBy("event_type", F.to_date("ts").alias("d"))
        .agg(F.count("*").cast("long").alias("q"))
    )
    out_schema = (
        "event_type string, n_demands long, z_milli long, p_milli long, "
        "forecast_milli long"
    )

    def croston(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("d")
        qs = [int(v) for v in pdf["q"]]
        ds = list(pdf["d"])
        gaps = [1] + [(ds[i] - ds[i - 1]).days for i in range(1, len(ds))]
        z, p = qs[0] * 1000, gaps[0] * 1000

        def tdiv(a: int, b: int) -> int:
            r = abs(a) // b
            return -r if a < 0 else r

        for q, g in zip(qs[1:], gaps[1:]):
            z = z + tdiv(q * 1000 - z, CROSTON_ALPHA_DIV)
            p = p + tdiv(g * 1000 - p, CROSTON_ALPHA_DIV)
        return pd.DataFrame(
            {
                "event_type": [pdf["event_type"].iloc[0]],
                "n_demands": [len(qs)],
                "z_milli": [z],
                "p_milli": [p],
                "forecast_milli": [(z * 1000) // p],
            }
        )

    return demand.groupBy("event_type").applyInPandas(croston, out_schema)


# --------------------------------------------------------------------------
# 2. Cochran-Mantel-Haenszel stratified test
# --------------------------------------------------------------------------

CMH_VALUE_THRESH = 15_000_000  # cents


@query(
    "stat_cmh_stratified",
    oracle=f"""
WITH rows_ AS (
  SELECT o_orderpriority AS stratum,
         CASE WHEN CAST(round(o_totalprice * 100) AS BIGINT)
                   > {CMH_VALUE_THRESH} THEN 1 ELSE 0 END AS e,
         CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
  FROM orders
),
cells AS (
  SELECT stratum, CAST(count(*) AS BIGINT) AS t,
         CAST(sum(e) AS BIGINT) AS n1, CAST(sum(y) AS BIGINT) AS m1,
         CAST(sum(e * y) AS BIGINT) AS a
  FROM rows_ GROUP BY 1
),
terms AS (
  SELECT stratum, a,
         CAST(round(1000000.0 * n1 * m1 / t) AS BIGINT) AS e_1e6,
         CAST(round(1000000.0 * n1 * (t - n1) * m1 * (t - m1)
               / (CAST(t AS DOUBLE) * t * (t - 1))) AS BIGINT) AS v_1e6
  FROM cells
),
acc AS (
  SELECT CAST(sum(a) AS BIGINT) AS sum_a,
         CAST(sum(e_1e6) AS BIGINT) AS sum_e_1e6,
         CAST(sum(v_1e6) AS BIGINT) AS sum_v_1e6,
         CAST(count(*) AS BIGINT) AS k
  FROM terms
)
SELECT k, sum_a, sum_e_1e6, sum_v_1e6,
       round((CAST(sum_a AS DOUBLE) - CAST(sum_e_1e6 AS DOUBLE) / 1e6)
             * (CAST(sum_a AS DOUBLE) - CAST(sum_e_1e6 AS DOUBLE) / 1e6)
             / (CAST(sum_v_1e6 AS DOUBLE) / 1e6), 6) AS cmh_chi2
FROM acc
""",
)
def stat_cmh_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran-Mantel-Haenszel test for a common high-value → fulfilled
    association ACROSS priority strata — the stratified 2x2 test that
    asks the association question while CONTROLLING for the stratum
    confounder (pooling naively invites Simpson's paradox; the per-
    stratum chi-squares waste power). Per-stratum expected counts E_i =
    n1·m1/T and hypergeometric variances V_i quantize to micro-units
    before the k-term sums (order-free); chi2 = (Sigma a − Sigma E)² /
    Sigma V, no continuity correction (documented).

    Scale shape: one hash-agg to k stratum cells, a k-row reduce."""
    orders = load(spark, sf_dir, "orders")
    rows_ = orders.select(
        F.col("o_orderpriority").alias("stratum"),
        F.when(
            F.round(F.col("o_totalprice") * 100).cast("long") > CMH_VALUE_THRESH,
            1,
        )
        .otherwise(0)
        .alias("e"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("y"),
    )
    cells = rows_.groupBy("stratum").agg(
        F.count("*").cast("long").alias("t"),
        F.sum("e").cast("long").alias("n1"),
        F.sum("y").cast("long").alias("m1"),
        F.sum(F.col("e") * F.col("y")).cast("long").alias("a"),
    )
    terms = cells.select(
        "a",
        F.round(
            1000000.0 * F.col("n1") * F.col("m1") / F.col("t")
        )
        .cast("long")
        .alias("e_1e6"),
        F.round(
            1000000.0
            * F.col("n1")
            * (F.col("t") - F.col("n1"))
            * F.col("m1")
            * (F.col("t") - F.col("m1"))
            / (F.col("t").cast("double") * F.col("t") * (F.col("t") - 1))
        )
        .cast("long")
        .alias("v_1e6"),
    )
    acc = terms.agg(
        F.sum("a").cast("long").alias("sum_a"),
        F.sum("e_1e6").cast("long").alias("sum_e_1e6"),
        F.sum("v_1e6").cast("long").alias("sum_v_1e6"),
        F.count("*").cast("long").alias("k"),
    )
    diff = F.col("sum_a").cast("double") - F.col("sum_e_1e6").cast("double") / 1e6
    return acc.select(
        "k",
        "sum_a",
        "sum_e_1e6",
        "sum_v_1e6",
        F.round(diff * diff / (F.col("sum_v_1e6").cast("double") / 1e6), 6).alias(
            "cmh_chi2"
        ),
    )


# --------------------------------------------------------------------------
# 3. Theil index decomposition
# --------------------------------------------------------------------------


@query(
    "agg_theil_decomposition",
    oracle=f"""
WITH spend AS (
  SELECT user_id,
         {_pt_sql('coh#', 'user_id', 4)} AS g,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS x
  FROM events GROUP BY 1
),
pos AS (SELECT * FROM spend WHERE x > 0),
tot AS (
  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS xx
  FROM pos
),
uterm AS (
  SELECT p.g,
         CAST(round(1000000.0 * p.x
               * ln(CAST(p.x AS DOUBLE) * t.n / t.xx)) AS BIGINT) AS v
  FROM pos p, tot t
),
gstat AS (
  SELECT g, CAST(count(*) AS BIGINT) AS ng, CAST(sum(x) AS BIGINT) AS xg
  FROM pos GROUP BY g
),
gterm AS (
  SELECT CAST(sum(CAST(round(1000000.0 * g.xg
               * ln((CAST(g.xg AS DOUBLE) / t.xx)
                    / (CAST(g.ng AS DOUBLE) / t.n))) AS BIGINT)) AS BIGINT)
           AS vb
  FROM gstat g, tot t
),
total_t AS (SELECT CAST(sum(v) AS BIGINT) AS vt FROM uterm)
SELECT t.n AS n_users,
       round(CAST(u.vt AS DOUBLE) / 1e6 / t.xx, 9) AS theil_total,
       round(CAST(b.vb AS DOUBLE) / 1e6 / t.xx, 9) AS theil_between,
       round((CAST(u.vt AS DOUBLE) - b.vb) / 1e6 / t.xx, 9) AS theil_within
FROM tot t, total_t u, gterm b
""",
)
def agg_theil_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil inequality index of per-user spend with its EXACT
    between/within decomposition over four md5 cohorts — the property
    that makes Theil the inequality measure for pipelines (Gini does not
    decompose additively): T = T_between + T_within, so the result shows
    HOW MUCH of the spend concentration lives across cohorts vs inside
    them. Per-user ln terms quantize to micro-units before the corpus
    sum (order-free; ln precedent as in eval_ndcg_at_k), within is
    derived as the exact difference of the two quantized sums so the
    identity holds bit-for-bit in the output.

    Scale shape: per-user collapse map-side, one scalar + one 4-row agg."""
    ev = load(spark, sf_dir, "events")
    spend = ev.groupBy("user_id").agg(
        F.sum(F.round(F.col("value") * 100).cast("long")).cast("long").alias("x")
    ).select(
        (_pt("coh#", F.col("user_id")) % 4).alias("g"), "x"
    ).filter(F.col("x") > 0)
    tot = spend.agg(
        F.count("*").cast("long").alias("n"), F.sum("x").cast("long").alias("xx")
    )
    uterm = spend.crossJoin(F.broadcast(tot)).select(
        F.round(
            1000000.0
            * F.col("x")
            * F.log(F.col("x").cast("double") * F.col("n") / F.col("xx"))
        )
        .cast("long")
        .alias("v")
    )
    vt = uterm.agg(F.sum("v").cast("long").alias("vt"))
    gstat = spend.groupBy("g").agg(
        F.count("*").cast("long").alias("ng"), F.sum("x").cast("long").alias("xg")
    )
    vb = gstat.crossJoin(F.broadcast(tot)).agg(
        F.sum(
            F.round(
                1000000.0
                * F.col("xg")
                * F.log(
                    (F.col("xg").cast("double") / F.col("xx"))
                    / (F.col("ng").cast("double") / F.col("n"))
                )
            ).cast("long")
        )
        .cast("long")
        .alias("vb")
    )
    return (
        tot.crossJoin(vt)
        .crossJoin(vb)
        .select(
            F.col("n").alias("n_users"),
            F.round(F.col("vt").cast("double") / 1e6 / F.col("xx"), 9).alias(
                "theil_total"
            ),
            F.round(F.col("vb").cast("double") / 1e6 / F.col("xx"), 9).alias(
                "theil_between"
            ),
            F.round(
                (F.col("vt").cast("double") - F.col("vb")) / 1e6 / F.col("xx"), 9
            ).alias("theil_within"),
        )
    )


# --------------------------------------------------------------------------
# 4. Kendall tau-b on power-of-two buckets
# --------------------------------------------------------------------------


@query(
    "eval_kendall_tau_deciles",
    oracle="""
WITH per_user AS (
  SELECT user_id,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS x,
         CAST(count(*) AS BIGINT) AS y
  FROM events GROUP BY user_id
),
bucketed AS (
  SELECT CAST(length(bin(x + 1)) - 1 AS BIGINT) AS bx,
         CAST(length(bin(y + 1)) - 1 AS BIGINT) AS by_
  FROM per_user
),
cells AS (
  SELECT bx, by_, CAST(count(*) AS BIGINT) AS c FROM bucketed GROUP BY 1, 2
),
pairs AS (
  SELECT
    CAST(sum(CASE WHEN b.bx > a.bx AND b.by_ > a.by_
                  THEN a.c * b.c ELSE 0 END) AS BIGINT) AS conc2,
    CAST(sum(CASE WHEN b.bx > a.bx AND b.by_ < a.by_
                  THEN a.c * b.c ELSE 0 END) AS BIGINT) AS disc2
  FROM cells a JOIN cells b ON true
),
margins AS (
  SELECT (SELECT CAST(sum(c) AS BIGINT) FROM cells) AS n,
         (SELECT CAST(sum(cx * (cx - 1) / 2) AS BIGINT)
          FROM (SELECT CAST(sum(c) AS BIGINT) AS cx FROM cells GROUP BY bx))
           AS same_x,
         (SELECT CAST(sum(cy * (cy - 1) / 2) AS BIGINT)
          FROM (SELECT CAST(sum(c) AS BIGINT) AS cy FROM cells GROUP BY by_))
           AS same_y
)
SELECT m.n, p.conc2 AS concordant, p.disc2 AS discordant,
       round((CAST(p.conc2 AS DOUBLE) - p.disc2)
             / sqrt((CAST(m.n AS DOUBLE) * (m.n - 1) / 2 - m.same_x)
                    * (CAST(m.n AS DOUBLE) * (m.n - 1) / 2 - m.same_y)), 6)
         AS kendall_tau_b
FROM margins m, pairs p
""",
)
def eval_kendall_tau_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall tau-b rank agreement between per-user spend and activity,
    computed EXACTLY from the joint distribution over power-of-two
    buckets (the sketch_ddsketch_log2 bucketing — deterministic, no
    quantile pass): concordant/discordant pair counts come from the
    bounded cell-table self-join (every pair of users lands in exactly
    one ordered cell pair), tie corrections from the bucket margins, and
    tau-b = (C − D)/sqrt((P − Tx)(P − Ty)). The concordance sibling of
    corr_spearman — robust to the monotone-transform choice and exact
    under heavy ties (which bucketing creates by design, and tau-b
    corrects for).

    Scale shape: per-user collapse map-side; the pair algebra runs on
    ≤ 64x64 cells regardless of user count — the O(n log n)-free
    distributed Kendall recipe."""
    ev = load(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.sum(F.round(F.col("value") * 100).cast("long")).cast("long").alias("x"),
        F.count("*").cast("long").alias("y"),
    )
    bucketed = per_user.select(
        (F.length(F.bin(F.col("x") + 1)) - 1).cast("long").alias("bx"),
        (F.length(F.bin(F.col("y") + 1)) - 1).cast("long").alias("by_"),
    )
    cells = bucketed.groupBy("bx", "by_").agg(
        F.count("*").cast("long").alias("c")
    )
    a = cells.select(
        F.col("bx").alias("ax"), F.col("by_").alias("ay"), F.col("c").alias("ac")
    )
    b = cells.select(
        F.col("bx").alias("bx2"), F.col("by_").alias("by2"), F.col("c").alias("bc")
    )
    pairs = a.crossJoin(b).agg(
        F.sum(
            F.when(
                (F.col("bx2") > F.col("ax")) & (F.col("by2") > F.col("ay")),
                F.col("ac") * F.col("bc"),
            ).otherwise(0)
        )
        .cast("long")
        .alias("conc2"),
        F.sum(
            F.when(
                (F.col("bx2") > F.col("ax")) & (F.col("by2") < F.col("ay")),
                F.col("ac") * F.col("bc"),
            ).otherwise(0)
        )
        .cast("long")
        .alias("disc2"),
    )
    n = cells.agg(F.sum("c").cast("long").alias("n"))
    same_x = (
        cells.groupBy("bx")
        .agg(F.sum("c").alias("cx"))
        .agg(
            F.sum(F.col("cx") * (F.col("cx") - 1) / 2).cast("long").alias("same_x")
        )
    )
    same_y = (
        cells.groupBy("by_")
        .agg(F.sum("c").alias("cy"))
        .agg(
            F.sum(F.col("cy") * (F.col("cy") - 1) / 2).cast("long").alias("same_y")
        )
    )
    p_tot = F.col("n").cast("double") * (F.col("n") - 1) / 2
    return (
        n.crossJoin(pairs)
        .crossJoin(same_x)
        .crossJoin(same_y)
        .select(
            "n",
            F.col("conc2").alias("concordant"),
            F.col("disc2").alias("discordant"),
            F.round(
                (F.col("conc2").cast("double") - F.col("disc2"))
                / F.sqrt((p_tot - F.col("same_x")) * (p_tot - F.col("same_y"))),
                6,
            ).alias("kendall_tau_b"),
        )
    )


# --------------------------------------------------------------------------
# 5. Pseudo-relevance-feedback expansion
# --------------------------------------------------------------------------

PRF_QUERY = "spark"
PRF_TOP_DOCS = 10
PRF_TOP_TERMS = 10


@query(
    "search_prf_expansion",
    oracle=f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
qtf AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS tf
  FROM tok WHERE term = '{PRF_QUERY}' GROUP BY doc_id
),
top_docs AS (
  SELECT doc_id FROM (
    SELECT doc_id, row_number() OVER (ORDER BY tf DESC, doc_id) AS rk
    FROM qtf
  ) WHERE rk <= {PRF_TOP_DOCS}
),
fb AS (
  SELECT t.term, CAST(count(*) AS BIGINT) AS tf_top
  FROM tok t JOIN top_docs d ON t.doc_id = d.doc_id
  WHERE t.term <> '{PRF_QUERY}'
  GROUP BY t.term
),
df AS (
  SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
  FROM tok GROUP BY term
)
SELECT term, tf_top, df, w_1e6, rk FROM (
  SELECT f.term, f.tf_top, d.df,
         (1000000 * f.tf_top) // d.df AS w_1e6,
         CAST(row_number() OVER (ORDER BY (1000000 * f.tf_top) // d.df DESC,
                                 f.term) AS INT) AS rk
  FROM fb f JOIN df d ON f.term = d.term
) WHERE rk <= {PRF_TOP_TERMS}
""",
)
def search_prf_expansion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pseudo-relevance-feedback query expansion (Rocchio's modern
    descendant): retrieve the query's top-{PRF_TOP_DOCS} documents by
    exact tf ranking (the eval_mrr integer ranking), then mine the
    feedback set for expansion terms scored tf_in_feedback / corpus_df
    in exact ppm — terms frequent in the relevant neighborhood but rare
    corpus-wide are the ones worth adding to the query. Top
    {PRF_TOP_TERMS} with deterministic tie-break.

    Scale shape: posting-list hash-aggs; the feedback mining touches
    only the {PRF_TOP_DOCS} retrieved docs' tokens; df comes from the
    Heaps-bounded vocabulary table."""
    docs = fan_out(load(spark, sf_dir, "documents"))
    tok = docs.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    qtf = (
        tok.filter(F.col("term") == PRF_QUERY)
        .groupBy("doc_id")
        .agg(F.count("*").cast("long").alias("tf"))
    )
    top_docs = (
        qtf.select(
            "doc_id",
            F.row_number().over(Window.orderBy(F.desc("tf"), "doc_id")).alias("rk"),
        )
        .filter(F.col("rk") <= PRF_TOP_DOCS)
        .select("doc_id")
    )
    fb = (
        tok.join(F.broadcast(top_docs), "doc_id")
        .filter(F.col("term") != PRF_QUERY)
        .groupBy("term")
        .agg(F.count("*").cast("long").alias("tf_top"))
    )
    df = tok.groupBy("term").agg(
        F.countDistinct("doc_id").cast("long").alias("df")
    )
    scored = fb.join(df, "term").select(
        "term",
        "tf_top",
        "df",
        F.expr("(1000000 * tf_top) div df").cast("long").alias("w_1e6"),
    )
    return (
        scored.withColumn(
            "rk",
            F.row_number()
            .over(Window.orderBy(F.desc("w_1e6"), "term"))
            .cast("int"),
        )
        .filter(F.col("rk") <= PRF_TOP_TERMS)
        .select("term", "tf_top", "df", "w_1e6", "rk")
    )


# --------------------------------------------------------------------------
# 6. Semi-hard triplet mining
# --------------------------------------------------------------------------

TRIPLET_ANCHORS = 30


@query(
    "vec_triplet_semihard",
    oracle=f"""
WITH comp AS (
  SELECT vec_id, label, CAST(i AS BIGINT) AS i,
         CAST(round(1000 * CAST(embedding[CAST(i AS INTEGER)] AS DOUBLE))
              AS BIGINT) AS x
  FROM (SELECT vec_id, label, embedding,
               unnest(range(1, len(embedding) + 1)) AS i
        FROM embeddings)
),
anchors AS (SELECT DISTINCT vec_id, label FROM comp
            WHERE vec_id < {TRIPLET_ANCHORS}),
dists AS (
  SELECT a.vec_id AS anchor, c.vec_id AS other,
         max(co.label) AS olabel, max(a.label) AS alabel,
         CAST(sum((ac.x - c.x) * (ac.x - c.x)) AS BIGINT) AS d2
  FROM anchors a
  JOIN comp ac ON ac.vec_id = a.vec_id
  JOIN comp c ON c.i = ac.i AND c.vec_id <> a.vec_id
  JOIN (SELECT DISTINCT vec_id, label FROM comp) co ON co.vec_id = c.vec_id
  GROUP BY 1, 2
),
pos AS (
  SELECT anchor, other AS pos_id, d2 AS pos_d2 FROM (
    SELECT *, row_number() OVER (PARTITION BY anchor
                                 ORDER BY d2, other) AS rk
    FROM dists WHERE olabel = alabel
  ) WHERE rk = 1
),
neg AS (
  SELECT d.anchor, d.other, d.d2, p.pos_d2,
         CASE WHEN d.d2 > p.pos_d2 THEN 0 ELSE 1 END AS not_semihard
  FROM dists d JOIN pos p ON d.anchor = p.anchor
  WHERE d.olabel <> d.alabel
),
best_neg AS (
  SELECT anchor, other AS neg_id, d2 AS neg_d2,
         CAST(1 - not_semihard AS BIGINT) AS semihard
  FROM (
    SELECT *, row_number() OVER (PARTITION BY anchor
                                 ORDER BY not_semihard, d2, other) AS rk
    FROM neg
  ) WHERE rk = 1
)
SELECT p.anchor, p.pos_id, p.pos_d2, b.neg_id, b.neg_d2, b.semihard
FROM pos p JOIN best_neg b ON p.anchor = b.anchor
""",
)
def vec_triplet_semihard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-hard triplet mining (the FaceNet recipe) over the labeled
    embedding table: for each anchor, the positive is its nearest
    same-label vector, and the negative is the CLOSEST different-label
    vector that is still FARTHER than the positive (semi-hard: violates
    the margin without collapsing training; when none exists the
    hardest negative is taken and flagged). Distances are exact integer
    milli-squared-euclidean, so both engines mine the identical
    triplets. The training-data op behind every contrastive/metric-
    learning pipeline.

    Scale shape: the probe set is a fixed {TRIPLET_ANCHORS}-anchor batch
    shipped in the task closure (the blocked-kernel contract); the
    corpus streams through ONE Arrow pass computing all anchor distances
    as an int64 numpy broadcast — exact (|x| <= 1000, 64 dims: every
    intermediate < 2.7e8). The dimension-keyed join it replaces shuffled
    |anchors| x |corpus| x dims rows over only 64 join keys (19 s at
    sf1 -> ~2 s). Full-corpus mining swaps the probe set for the
    blocked/IVF k-NN ladder (vec_knn_*)."""
    import numpy as np
    import pandas as pd

    e = load(spark, sf_dir, "embeddings")
    # quantize JVM-side: Spark round is HALF_UP on doubles (np.round is
    # half-even — not the same rule), so the exact integer grid must be
    # built before the Arrow boundary
    quant = e.select(
        "vec_id",
        "label",
        F.expr(
            "transform(embedding,"
            " x -> CAST(round(1000 * CAST(x AS DOUBLE)) AS BIGINT))"
        ).alias("qx"),
    )
    a_rows = quant.filter(F.col("vec_id") < TRIPLET_ANCHORS).collect()
    a_ids = np.array([r["vec_id"] for r in a_rows], dtype=np.int64)
    a_lab = {int(r["vec_id"]): r["label"] for r in a_rows}
    am = np.array([r["qx"] for r in a_rows], dtype=np.int64)

    def score(batches):
        for pdf in batches:
            cm = np.vstack(pdf["qx"].to_numpy()).astype(np.int64)
            ids = pdf["vec_id"].to_numpy().astype(np.int64)
            labs = pdf["label"].to_numpy()
            # (batch, anchors, dims) diff without materializing: expand sum
            # d2 = |c|^2 + |a|^2 - 2 c.a  — all int64-exact at this grid
            c2 = (cm * cm).sum(axis=1)
            a2 = (am * am).sum(axis=1)
            d2 = c2[:, None] + a2[None, :] - 2 * (cm @ am.T)
            out = {
                "anchor": [], "other": [], "olabel": [], "alabel": [], "d2": []
            }
            for j, aid in enumerate(a_ids):
                keep = ids != aid
                out["anchor"].extend([aid] * int(keep.sum()))
                out["other"].extend(ids[keep])
                out["olabel"].extend(labs[keep])
                out["alabel"].extend([a_lab[int(aid)]] * int(keep.sum()))
                out["d2"].extend(d2[keep, j])
            yield pd.DataFrame(out)

    dists = fan_out(quant).mapInPandas(
        score,
        schema="anchor long, other long, olabel int, alabel int, d2 long",
    ).localCheckpoint(eager=True)
    pos = (
        dists.filter(F.col("olabel") == F.col("alabel"))
        .withColumn(
            "rk",
            F.row_number().over(Window.partitionBy("anchor").orderBy("d2", "other")),
        )
        .filter(F.col("rk") == 1)
        .select("anchor", F.col("other").alias("pos_id"), F.col("d2").alias("pos_d2"))
    )
    neg = (
        dists.filter(F.col("olabel") != F.col("alabel"))
        .join(pos, "anchor")
        .withColumn(
            "not_semihard",
            F.when(F.col("d2") > F.col("pos_d2"), 0).otherwise(1),
        )
    )
    best_neg = (
        neg.withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("anchor").orderBy("not_semihard", "d2", "other")
            ),
        )
        .filter(F.col("rk") == 1)
        .select(
            "anchor",
            F.col("other").alias("neg_id"),
            F.col("d2").alias("neg_d2"),
            (1 - F.col("not_semihard")).cast("long").alias("semihard"),
        )
    )
    return pos.join(best_neg, "anchor").select(
        "anchor", "pos_id", "pos_d2", "neg_id", "neg_d2", "semihard"
    )
