"""Breadth batch 44 (round 6): PACF, AdaBoost stumps, Heaps' law,
Nelson-Aalen hazard, DP clipped mean, Dunn post-hoc.

Six operators (reference scope: AR-order diagnosis of feed cadence,
boosted weak-learner baselines, vocabulary-growth law fits for corpus
planning, the hazard-side twin of the retention curve, DP release of a
bounded mean, and which-pairs-differ after an omnibus rank test):

- ``ts_pacf_durbin``       — partial autocorrelation at lags 1-3 via the
  Durbin-Levinson recursion in exact micro-unit integers.
- ``ml_adaboost_stumps``   — two rounds of discrete AdaBoost over a
  fixed stump pool with exact integer weight updates.
- ``text_heaps_law``       — vocabulary-growth checkpoints V(n) and the
  log-log OLS slope (Heaps' beta) from quantized ln terms.
- ``survival_nelson_aalen`` — cumulative-hazard estimator over the same
  life table as ``survival_kaplan_meier``.
- ``privacy_dp_clipped_mean`` — clip-then-noise bounded-mean release
  with discrete-Laplace noise (reuses the breadth41 noise inverter).
- ``stat_dunn_posthoc``    — pairwise Dunn z tests with Bonferroni
  flags after ``stat_kruskal_wallis``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nocouncil_etl_spark.io import fan_out, load
from nocouncil_etl_spark.operators.quantiles import cumulate, with_below
from nocouncil_etl_spark.plans.breadth15 import _pt, _pt_sql
from nocouncil_etl_spark.plans.breadth41 import _DLAP_KS, _DLAP_THRESH, _dlap_sql
from nocouncil_etl_spark.registry import query

# --------------------------------------------------------------------------
# 1. Partial autocorrelation (Durbin-Levinson, lags 1-3)
# --------------------------------------------------------------------------


@query(
    "ts_pacf_durbin",
    oracle="""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS d,
         CAST(sum(CAST(round(value) AS BIGINT)) AS BIGINT) AS y
  FROM events GROUP BY 1, 2
),
mu AS (
  SELECT event_type, CAST(sum(y) AS BIGINT) // count(*) AS mu
  FROM daily GROUP BY 1
),
c AS (
  SELECT daily.event_type, daily.d, (daily.y - mu.mu) // 100 AS yd
  FROM daily JOIN mu ON daily.event_type = mu.event_type
),
lagged AS (
  SELECT event_type, yd,
         lag(yd, 1) OVER w AS l1,
         lag(yd, 2) OVER w AS l2,
         lag(yd, 3) OVER w AS l3
  FROM c WINDOW w AS (PARTITION BY event_type ORDER BY d)
),
cov AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(yd * yd) AS BIGINT) AS c0,
         CAST(sum(CASE WHEN l1 IS NULL THEN 0 ELSE yd * l1 END) AS BIGINT) AS c1,
         CAST(sum(CASE WHEN l2 IS NULL THEN 0 ELSE yd * l2 END) AS BIGINT) AS c2,
         CAST(sum(CASE WHEN l3 IS NULL THEN 0 ELSE yd * l3 END) AS BIGINT) AS c3
  FROM lagged GROUP BY 1
),
p1 AS (
  SELECT *, (c1 * 1000000) // c0 AS f11 FROM cov WHERE c0 > 0
),
p2 AS (
  SELECT *,
         (c2 * 1000000 - f11 * c1) // greatest((c0 * 1000000 - f11 * c1)
                                               // 1000000, 1) AS f22
  FROM p1
),
p3 AS (
  SELECT *, f11 - (f22 * f11) // 1000000 AS f21 FROM p2
),
p4 AS (
  SELECT *,
         (c3 * 1000000 - f21 * c2 - f22 * c1)
           // greatest((c0 * 1000000 - f21 * c1 - f22 * c2) // 1000000, 1)
           AS f33
  FROM p3
)
SELECT event_type, n,
       CAST((c1 * 1000000) // c0 AS BIGINT) AS acf1_1e6,
       CAST((c2 * 1000000) // c0 AS BIGINT) AS acf2_1e6,
       CAST((c3 * 1000000) // c0 AS BIGINT) AS acf3_1e6,
       CAST(f11 AS BIGINT) AS pacf1_1e6,
       CAST(f22 AS BIGINT) AS pacf2_1e6,
       CAST(f33 AS BIGINT) AS pacf3_1e6
FROM p4
""",
)
def ts_pacf_durbin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial autocorrelation at lags 1-3 via the Durbin-Levinson
    recursion — THE diagnostic for picking an AR order (PACF cuts off
    after lag p for an AR(p) process, where plain ACF just decays).
    Autocovariances are exact BIGINT sums of the centered,
    centi-quantized daily series; each recursion level does one micro-
    unit truncating division (Spark ``div`` ≡ DuckDB ``//`` — both
    truncate toward zero, verified), so φ11/φ22/φ33 agree bit-for-bit
    with the unrolled oracle. ACF at the same lags sits beside them.

    Scale shape: daily collapse map-side; the lag window runs per key
    over the bounded day count; the recursion is per-key scalar math on
    a |types|-row frame."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy("event_type", F.to_date("ts").alias("d")).agg(
        F.sum(F.round("value").cast("long")).cast("long").alias("y")
    )
    mu = daily.groupBy("event_type").agg(
        F.expr("CAST(sum(y) AS BIGINT) div count(*)").alias("mu")
    )
    c = daily.join(F.broadcast(mu), "event_type").select(
        "event_type", "d", F.expr("(y - mu) div 100").alias("yd")
    )
    w = Window.partitionBy("event_type").orderBy("d")
    lagged = c.select(
        "event_type",
        "yd",
        F.lag("yd", 1).over(w).alias("l1"),
        F.lag("yd", 2).over(w).alias("l2"),
        F.lag("yd", 3).over(w).alias("l3"),
    )
    cov = lagged.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.col("yd") * F.col("yd")).cast("long").alias("c0"),
        *[
            F.sum(
                F.when(F.col(f"l{k}").isNull(), 0).otherwise(
                    F.col("yd") * F.col(f"l{k}")
                )
            )
            .cast("long")
            .alias(f"c{k}")
            for k in (1, 2, 3)
        ],
    )
    return (
        cov.filter(F.col("c0") > 0)
        .withColumn("f11", F.expr("(c1 * 1000000) div c0"))
        .withColumn(
            "f22",
            F.expr(
                "(c2 * 1000000 - f11 * c1)"
                " div greatest((c0 * 1000000 - f11 * c1) div 1000000, 1)"
            ),
        )
        .withColumn("f21", F.expr("f11 - (f22 * f11) div 1000000"))
        .withColumn(
            "f33",
            F.expr(
                "(c3 * 1000000 - f21 * c2 - f22 * c1) div"
                " greatest((c0 * 1000000 - f21 * c1 - f22 * c2)"
                " div 1000000, 1)"
            ),
        )
        .select(
            "event_type",
            "n",
            F.expr("CAST((c1 * 1000000) div c0 AS BIGINT)").alias("acf1_1e6"),
            F.expr("CAST((c2 * 1000000) div c0 AS BIGINT)").alias("acf2_1e6"),
            F.expr("CAST((c3 * 1000000) div c0 AS BIGINT)").alias("acf3_1e6"),
            F.col("f11").cast("long").alias("pacf1_1e6"),
            F.col("f22").cast("long").alias("pacf2_1e6"),
            F.col("f33").cast("long").alias("pacf3_1e6"),
        )
    )


# --------------------------------------------------------------------------
# 2. Discrete AdaBoost over a stump pool
# --------------------------------------------------------------------------

# (stump id, feature selector, threshold): h(x) = +1 iff feature >= thr
ADA_STUMPS = (
    (1, "v", 20),
    (2, "v", 50),
    (3, "v", 80),
    (4, "dw", 5),
    (5, "hr", 12),
)
_ADA_STUMPS_SQL = ", ".join(f"({s}, '{f}', {t})" for s, f, t in ADA_STUMPS)


@query(
    "ml_adaboost_stumps",
    oracle=f"""
WITH data0 AS MATERIALIZED (
  SELECT CAST(round(value) AS BIGINT) AS v,
         CAST((CAST(ts AS DATE) - DATE '1970-01-05') % 7 AS BIGINT) AS dw,
         CAST(hour(ts) AS BIGINT) AS hr,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE -1 END AS y,
         CAST(1000 AS BIGINT) AS w
  FROM events
),
stumps(sid, feat, thr) AS (VALUES {_ADA_STUMPS_SQL}),
h0 AS (
  SELECT d.*, s.sid,
         CASE WHEN (CASE s.feat WHEN 'v' THEN d.v WHEN 'dw' THEN d.dw
                    ELSE d.hr END) >= s.thr THEN 1 ELSE -1 END AS h
  FROM data0 d, stumps s
),
err1 AS (
  SELECT sid, CAST(sum(CASE WHEN h <> y THEN w ELSE 0 END) AS BIGINT) AS err
  FROM h0 GROUP BY sid
),
tot1 AS (SELECT CAST(sum(w) AS BIGINT) AS tot, CAST(count(*) AS BIGINT) AS n
         FROM data0),
win1 AS (SELECT sid, err FROM err1 ORDER BY err, sid LIMIT 1),
d1 AS MATERIALIZED (
  SELECT h0.v, h0.dw, h0.hr, h0.y, h0.h AS h1,
         CASE WHEN h0.h <> h0.y THEN h0.w * (t.tot - w1.err)
              ELSE h0.w * w1.err END AS wp
  FROM h0 JOIN win1 w1 ON h0.sid = w1.sid, tot1 t
),
norm1 AS (
  SELECT greatest((2 * w1.err * (t.tot - w1.err)) // (t.n * 1000), 1) AS nrm
  FROM win1 w1, tot1 t
),
data1 AS MATERIALIZED (
  SELECT v, dw, hr, y, h1, wp // (SELECT nrm FROM norm1) AS w FROM d1
),
h1s AS (
  SELECT d.*, s.sid,
         CASE WHEN (CASE s.feat WHEN 'v' THEN d.v WHEN 'dw' THEN d.dw
                    ELSE d.hr END) >= s.thr THEN 1 ELSE -1 END AS h
  FROM data1 d, stumps s
),
err2 AS (
  SELECT sid, CAST(sum(CASE WHEN h <> y THEN w ELSE 0 END) AS BIGINT) AS err
  FROM h1s GROUP BY sid
),
tot2 AS (SELECT CAST(sum(w) AS BIGINT) AS tot FROM data1),
win2 AS (SELECT sid, err FROM err2 ORDER BY err, sid LIMIT 1),
alph AS (
  SELECT w1.sid AS r1_sid,
         (w1.err * 1000000) // t1.tot AS r1_eps_ppm,
         CAST(round(500000 * ln(CAST(t1.tot - w1.err AS DOUBLE) / w1.err))
              AS BIGINT) AS r1_alpha_micro,
         w2.sid AS r2_sid,
         (w2.err * 1000000) // t2.tot AS r2_eps_ppm,
         CAST(round(500000 * ln(CAST(t2.tot - w2.err AS DOUBLE) / w2.err))
              AS BIGINT) AS r2_alpha_micro,
         t1.n
  FROM win1 w1, tot1 t1, win2 w2, tot2 t2
),
final AS (
  SELECT h.y, h.h1, h.h AS h2, a.*
  FROM h1s h JOIN win2 w2 ON h.sid = w2.sid, alph a
),
acc AS (
  SELECT CAST(sum(CASE WHEN (CASE WHEN r1_alpha_micro * h1
                                       + r2_alpha_micro * h2 >= 0
                             THEN 1 ELSE -1 END) = y
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_correct
  FROM final
)
SELECT a.n, CAST(a.r1_sid AS BIGINT) AS r1_sid,
       CAST(a.r1_eps_ppm AS BIGINT) AS r1_eps_ppm, a.r1_alpha_micro,
       CAST(a.r2_sid AS BIGINT) AS r2_sid,
       CAST(a.r2_eps_ppm AS BIGINT) AS r2_eps_ppm, a.r2_alpha_micro,
       c.n_correct,
       CAST((c.n_correct * 1000000) // a.n AS BIGINT) AS acc_ppm
FROM alph a, acc c
""",
)
def ml_adaboost_stumps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two rounds of discrete AdaBoost (Freund & Schapire 1997) over a
    fixed pool of {len(ADA_STUMPS)} threshold stumps predicting whether
    an event is a purchase. Weights start at 1000 integer units; after
    each round, correct rows scale by err and wrong rows by (tot−err) —
    the EXACT multiplicative update (the usual e^±α form divided by the
    normalizer), then renormalize to mean ≈1000 via the closed-form
    total Σw' = 2·err·(tot−err) so no intermediate sum can overflow.
    α = ½ln((1−ε)/ε) quantizes once to micro from exact integer inputs.
    Emits both rounds' chosen stump, weighted error and α, plus the
    2-stump ensemble's training accuracy.

    Scale shape: each round is one broadcast-stump conditional agg over
    the scan plus scalar picks; weight update is a map-side projection.
    Boosting's sequential rounds are inherent; per-round cost is one
    pass."""
    ev = load(spark, sf_dir, "events")
    data = ev.select(
        F.round("value").cast("long").alias("v"),
        (F.datediff(F.to_date("ts"), F.lit("1970-01-05").cast("date")) % 7)
        .cast("long")
        .alias("dw"),
        F.hour("ts").cast("long").alias("hr"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(-1).alias("y"),
        F.lit(1000).cast("long").alias("w"),
    )
    stumps = spark.createDataFrame(
        list(ADA_STUMPS), "sid LONG, feat STRING, thr LONG"
    )
    h_expr = (
        "CASE WHEN (CASE feat WHEN 'v' THEN v WHEN 'dw' THEN dw ELSE hr END)"
        " >= thr THEN 1 ELSE -1 END"
    )

    def round_pass(d: DataFrame):
        h = d.crossJoin(F.broadcast(stumps)).withColumn("h", F.expr(h_expr))
        errs = h.groupBy("sid").agg(
            F.sum(F.when(F.col("h") != F.col("y"), F.col("w")).otherwise(0))
            .cast("long")
            .alias("err")
        )
        win = errs.orderBy("err", "sid").limit(1)
        return h, win

    tot1 = data.agg(
        F.sum("w").cast("long").alias("tot"), F.count("*").cast("long").alias("n")
    )
    h0, win1 = round_pass(data)
    d1 = (
        h0.join(F.broadcast(win1), "sid")
        .crossJoin(F.broadcast(tot1))
        .select(
            "v",
            "dw",
            "hr",
            "y",
            F.col("h").alias("h1"),
            F.expr(
                "CASE WHEN h <> y THEN w * (tot - err) ELSE w * err END"
            ).alias("wp"),
            F.expr(
                "greatest((2 * err * (tot - err)) div (n * 1000), 1)"
            ).alias("nrm"),
        )
        .select(
            "v", "dw", "hr", "y", "h1", F.expr("wp div nrm").alias("w")
        )
    )
    tot2 = d1.agg(F.sum("w").cast("long").alias("tot2"))
    h1s, win2 = round_pass(d1)
    alph = (
        win1.select(F.col("sid").alias("r1_sid"), F.col("err").alias("e1"))
        .crossJoin(tot1)
        .crossJoin(
            win2.select(F.col("sid").alias("r2_sid"), F.col("err").alias("e2"))
        )
        .crossJoin(tot2)
        .select(
            "n",
            F.col("r1_sid").cast("long"),
            F.expr("CAST((e1 * 1000000) div tot AS BIGINT)").alias("r1_eps_ppm"),
            F.round(
                500000 * F.log((F.col("tot") - F.col("e1")).cast("double") / F.col("e1"))
            )
            .cast("long")
            .alias("r1_alpha_micro"),
            F.col("r2_sid").cast("long"),
            F.expr("CAST((e2 * 1000000) div tot2 AS BIGINT)").alias("r2_eps_ppm"),
            F.round(
                500000
                * F.log((F.col("tot2") - F.col("e2")).cast("double") / F.col("e2"))
            )
            .cast("long")
            .alias("r2_alpha_micro"),
        )
    )
    final = h1s.join(F.broadcast(win2.select("sid")), "sid").crossJoin(
        F.broadcast(alph)
    )
    acc = final.agg(
        F.sum(
            F.when(
                F.expr(
                    "(CASE WHEN r1_alpha_micro * h1 + r2_alpha_micro * h"
                    " >= 0 THEN 1 ELSE -1 END) = y"
                ),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_correct")
    )
    return alph.crossJoin(F.broadcast(acc)).select(
        "n",
        "r1_sid",
        "r1_eps_ppm",
        "r1_alpha_micro",
        "r2_sid",
        "r2_eps_ppm",
        "r2_alpha_micro",
        "n_correct",
        F.expr("CAST((n_correct * 1000000) div n AS BIGINT)").alias("acc_ppm"),
    )


# --------------------------------------------------------------------------
# 3. Heaps' law vocabulary growth
# --------------------------------------------------------------------------

HEAPS_CKPTS = 64


@query(
    "text_heaps_law",
    oracle=f"""
WITH ws AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
),
toks AS MATERIALIZED (
  SELECT doc_id,
         ws[CAST(i AS INTEGER)] || '_' || ws[CAST(i + 1 AS INTEGER)]
           || '_' || ws[CAST(i + 2 AS INTEGER)] AS term
  FROM (SELECT doc_id, ws, unnest(range(1, len(ws) - 1)) AS i FROM ws)
),
tk AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS tk FROM toks GROUP BY 1),
firsts AS (
  SELECT min(doc_id) AS f FROM toks GROUP BY term
),
nv AS (SELECT f AS doc_id, CAST(count(*) AS BIGINT) AS nv FROM firsts
       GROUP BY 1),
meta AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM tk),
cum AS (
  SELECT tk.doc_id,
         CAST(row_number() OVER (ORDER BY tk.doc_id) AS BIGINT) AS r,
         CAST(sum(tk.tk) OVER (ORDER BY tk.doc_id) AS BIGINT) AS cumt,
         CAST(sum(coalesce(nv.nv, 0)) OVER (ORDER BY tk.doc_id) AS BIGINT)
           AS cumv
  FROM tk LEFT JOIN nv ON tk.doc_id = nv.doc_id
),
ck AS (
  SELECT r, cumt, cumv,
         CAST(round(ln(CAST(cumt AS DOUBLE)) * 1000000) AS BIGINT) AS x,
         CAST(round(ln(CAST(cumv AS DOUBLE)) * 1000000) AS BIGINT) AS yv
  FROM cum, meta
  WHERE r % greatest((n_docs + {HEAPS_CKPTS - 1}) // {HEAPS_CKPTS}, 1) = 0
),
ols AS (
  SELECT CAST(count(*) AS BIGINT) AS m,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(yv) AS BIGINT) AS sy,
         CAST(sum(x * yv) AS BIGINT) AS sxy,
         CAST(sum(x * x) AS BIGINT) AS sxx,
         CAST(max(cumt) AS BIGINT) AS total_tokens,
         CAST(max(cumv) AS BIGINT) AS vocab
  FROM ck
)
SELECT (SELECT n_docs FROM meta) AS n_docs, m AS n_ckpts,
       total_tokens, vocab,
       CAST((m * sxy - sx * sy)
            // greatest((m * sxx - sx * sx) // 1000000, 1) AS BIGINT)
         AS beta_1e6
FROM ols
""",
)
def text_heaps_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law fit of vocabulary growth: V(n) ≈ K·n^β, with word
    TRIGRAMS as the vocabulary unit (the synthetic corpus draws unigrams
    from a ~31-word pool that saturates after a handful of docs;
    trigrams grow combinatorially like a real vocabulary). Walk the
    corpus in doc_id order, take ≤{HEAPS_CKPTS} evenly spaced
    checkpoints of (cumulative terms, cumulative distinct vocabulary —
    counted via each term's FIRST document, no per-prefix re-distinct),
    quantize
    ln of both to exact micro BIGINTs, and fit the log-log OLS slope β
    with integer moment sums (bounded by the checkpoint count, so no
    overflow at any corpus size). β ≈ 0.4-0.6 for natural text; the
    fit is what sizes tokenizer vocabularies and dedup hash tables
    before a 100 TB run.

    Scale shape: token counts and first-occurrence collapse are two
    hash-aggs over the token stream; the prefix walk is one window over
    the |docs|-row frame; the OLS runs on ≤{HEAPS_CKPTS} rows."""
    docs = fan_out(load(spark, sf_dir, "documents"))
    toks = docs.select(
        "doc_id", F.split("text", " ").alias("ws")
    ).select(
        "doc_id",
        F.explode(
            F.expr(
                "CASE WHEN size(ws) >= 3 THEN"
                " transform(sequence(0, size(ws) - 3),"
                " i -> concat(ws[i], '_', ws[i + 1], '_', ws[i + 2]))"
                " ELSE array() END"
            )
        ).alias("term"),
    )
    tk = toks.groupBy("doc_id").agg(F.count("*").cast("long").alias("tk"))
    nv = (
        toks.groupBy("term")
        .agg(F.min("doc_id").alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count("*").cast("long").alias("nv"))
    )
    meta = tk.agg(F.count("*").cast("long").alias("n_docs"))
    # r7: the three running totals (rank, cum tokens, cum vocab) via one
    # Fenwick prefix-sum pass over doc_id — no global window/sort
    joined = tk.join(nv, "doc_id", "left").select(
        "doc_id",
        "tk",
        F.coalesce("nv", F.lit(0)).cast("long").alias("nv"),
        F.lit(1).cast("long").alias("one"),
    )
    cum = (
        cumulate(joined, "doc_id", ("one", "tk", "nv"))
        .select(
            "doc_id",
            F.col("cum_one").cast("long").alias("r"),
            F.col("cum_tk").cast("long").alias("cumt"),
            F.col("cum_nv").cast("long").alias("cumv"),
        )
        .crossJoin(F.broadcast(meta))
    )
    ck = cum.filter(
        F.expr(
            f"r % greatest((n_docs + {HEAPS_CKPTS - 1}) div {HEAPS_CKPTS}, 1) = 0"
        )
    ).select(
        "cumt",
        "cumv",
        F.round(F.log(F.col("cumt").cast("double")) * 1000000)
        .cast("long")
        .alias("x"),
        F.round(F.log(F.col("cumv").cast("double")) * 1000000)
        .cast("long")
        .alias("yv"),
    )
    ols = ck.agg(
        F.count("*").cast("long").alias("m"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("yv").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("yv")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.max("cumt").cast("long").alias("total_tokens"),
        F.max("cumv").cast("long").alias("vocab"),
    )
    return ols.crossJoin(F.broadcast(meta)).select(
        "n_docs",
        F.col("m").alias("n_ckpts"),
        "total_tokens",
        "vocab",
        F.expr(
            "CAST((m * sxy - sx * sy)"
            " div greatest((m * sxx - sx * sx) div 1000000, 1) AS BIGINT)"
        ).alias("beta_1e6"),
    )


# --------------------------------------------------------------------------
# 4. Nelson-Aalen cumulative hazard
# --------------------------------------------------------------------------


@query(
    "survival_nelson_aalen",
    oracle="""
WITH span AS (
  SELECT user_id, min(ts) AS first_ts, max(ts) AS last_ts FROM events GROUP BY 1
),
horizon AS (SELECT max(ts) AS mx FROM events),
life AS (
  SELECT CAST(date_diff('day', first_ts, last_ts) // 7 AS BIGINT) AS t,
         CASE WHEN last_ts < (SELECT mx FROM horizon) - INTERVAL 7 DAY
              THEN 1 ELSE 0 END AS died
  FROM span
),
tab AS (
  SELECT t, CAST(sum(died) AS BIGINT) AS d,
         CAST(sum(1 - died) AS BIGINT) AS c
  FROM life GROUP BY t
),
risk AS (
  SELECT t, d, c,
         CAST(sum(d + c) OVER (ORDER BY t DESC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS n_risk
  FROM tab
),
haz AS (
  SELECT t, d, c, n_risk,
         CAST(round(1000000.0 * d / n_risk) AS BIGINT) AS h_micro
  FROM risk
)
SELECT t AS week, n_risk, d AS deaths, c AS censored, h_micro,
       CAST(sum(h_micro) OVER (ORDER BY t
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS cumhaz_micro,
       round(exp(-CAST(sum(h_micro) OVER (ORDER BY t
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
         / 1000000), 6) AS na_survival
FROM haz
""",
)
def survival_nelson_aalen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nelson-Aalen cumulative-hazard estimator over the SAME per-user
    life table as ``survival_kaplan_meier``: H(t) = Σ_{s≤t} d_s/n_s,
    each hazard increment quantized ONCE to micro units from the exact
    rational d/n_risk, then an exact BIGINT running sum; the survival
    translation exp(−H) (Breslow's estimator) sits beside it. KM and NA
    answer the same question with different small-sample behavior —
    hazard increments are additive (mergeable across shards) where KM's
    product is not, which is why NA is the streaming-friendly form.

    Scale shape: identical to KM — two hash-aggs to a ≤horizon-weeks
    life table, then windows over that tiny frame."""
    ev = load(spark, sf_dir, "events")
    span = ev.groupBy("user_id").agg(
        F.min("ts").alias("first_ts"), F.max("ts").alias("last_ts")
    )
    horizon = ev.agg(F.max("ts").alias("mx"))
    life = span.crossJoin(F.broadcast(horizon)).select(
        (F.datediff("last_ts", "first_ts") / 7).cast("long").alias("t"),
        F.when(F.col("last_ts") < F.col("mx") - F.expr("INTERVAL 7 DAY"), 1)
        .otherwise(0)
        .alias("died"),
    )
    tab = life.groupBy("t").agg(
        F.sum("died").cast("long").alias("d"),
        F.sum(F.lit(1) - F.col("died")).cast("long").alias("c"),
    )
    wdesc = Window.orderBy(F.desc("t")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wasc = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    risk = tab.withColumn(
        "n_risk", F.sum(F.col("d") + F.col("c")).over(wdesc).cast("long")
    )
    haz = risk.withColumn(
        "h_micro",
        F.round(1000000.0 * F.col("d") / F.col("n_risk")).cast("long"),
    )
    return haz.select(
        F.col("t").alias("week"),
        "n_risk",
        F.col("d").alias("deaths"),
        F.col("c").alias("censored"),
        "h_micro",
        F.sum("h_micro").over(wasc).cast("long").alias("cumhaz_micro"),
        F.round(
            F.exp(-F.sum("h_micro").over(wasc).cast("double") / 1000000), 6
        ).alias("na_survival"),
    )


# --------------------------------------------------------------------------
# 5. DP clipped-mean release
# --------------------------------------------------------------------------

DPM_CLIP = 5000  # cents


@query(
    "privacy_dp_clipped_mean",
    oracle=f"""
WITH cents AS (
  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents FROM events
),
agg AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(least(greatest(cents, 0), {DPM_CLIP})) AS BIGINT)
           AS sum_clip,
         CAST(sum(CASE WHEN cents > {DPM_CLIP} OR cents < 0 THEN 1 ELSE 0 END)
              AS BIGINT) AS n_clipped
  FROM cents GROUP BY 1
),
noisy AS (
  SELECT *,
         CAST({_dlap_sql(_pt_sql('dpm#', 'event_type', 1_000_000_000))}
              AS BIGINT) * {DPM_CLIP // 100} AS noise
  FROM agg
)
SELECT event_type, n, n_clipped,
       CAST((n_clipped * 1000000) // n AS BIGINT) AS clip_frac_ppm,
       CAST((1000 * sum_clip) // n AS BIGINT) AS true_mean_milli,
       noise,
       CAST((1000 * (sum_clip + noise)) // n AS BIGINT) AS dp_mean_milli
FROM noisy
""",
)
def privacy_dp_clipped_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differentially-private bounded-mean release: clip each value to
    [0, {DPM_CLIP}] cents (clipping bounds the per-record sensitivity —
    the step that makes the noise scale finite), sum exactly, add
    discrete-Laplace noise scaled by the sensitivity ({DPM_CLIP}/100
    units per noise step, the breadth41 CDF inverter at an md5-uniform),
    and divide by the true count. The clipped fraction is reported so
    the bias-variance trade of the clip bound is visible — the companion
    to dp_count_laplace (counts) and privacy_discrete_laplace_argmax
    (selection): this is the numeric-release member of the DP toolkit.

    Scale shape: one map-side-combined hash-agg; noise is k-row math."""
    ev = load(spark, sf_dir, "events")
    cents = ev.select(
        "event_type", F.round(F.col("value") * 100).cast("long").alias("cents")
    )
    agg = cents.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.least(F.greatest("cents", F.lit(0)), F.lit(DPM_CLIP)))
        .cast("long")
        .alias("sum_clip"),
        F.sum(
            F.when((F.col("cents") > DPM_CLIP) | (F.col("cents") < 0), 1).otherwise(0)
        )
        .cast("long")
        .alias("n_clipped"),
    )
    u = _pt("dpm#", F.col("event_type")) % 1_000_000_000
    noise = F.lit(_DLAP_KS[-1])
    for k, t in zip(reversed(_DLAP_KS[:-1]), reversed(_DLAP_THRESH[:-1])):
        noise = F.when(u < t, k).otherwise(noise)
    return agg.withColumn(
        "noise", noise.cast("long") * (DPM_CLIP // 100)
    ).select(
        "event_type",
        "n",
        "n_clipped",
        F.expr("CAST((n_clipped * 1000000) div n AS BIGINT)").alias(
            "clip_frac_ppm"
        ),
        F.expr("CAST((1000 * sum_clip) div n AS BIGINT)").alias(
            "true_mean_milli"
        ),
        "noise",
        F.expr("CAST((1000 * (sum_clip + noise)) div n AS BIGINT)").alias(
            "dp_mean_milli"
        ),
    )


# --------------------------------------------------------------------------
# 6. Dunn post-hoc pairwise tests
# --------------------------------------------------------------------------

DUNN_ZCRIT = 2.807  # two-sided alpha=0.05, Bonferroni over C(5,2)=10 pairs


@query(
    "stat_dunn_posthoc",
    oracle=f"""
WITH cents AS (
  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS v FROM events
),
byv AS (
  SELECT v, CAST(count(*) AS BIGINT) AS c FROM cents GROUP BY v
),
cum AS (
  SELECT v, c,
         CAST(coalesce(sum(c) OVER (ORDER BY v
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS below
  FROM byv
),
grp AS (
  SELECT event_type, v, CAST(count(*) AS BIGINT) AS cg
  FROM cents GROUP BY event_type, v
),
per_group AS (
  SELECT g.event_type,
         CAST(sum(g.cg) AS BIGINT) AS n_g,
         CAST(sum(g.cg * (2 * u.below + u.c + 1)) AS BIGINT) AS r2_g
  FROM grp g JOIN cum u ON g.v = u.v
  GROUP BY g.event_type
),
gstat AS (
  SELECT CAST(sum(n_g) AS BIGINT) AS n,
         (SELECT CAST(sum(c * c * c - c) AS BIGINT) FROM byv) AS tie3
  FROM per_group
),
pairs AS (
  SELECT a.event_type AS et_a, b.event_type AS et_b,
         a.n_g AS n_a, b.n_g AS n_b,
         a.r2_g AS r2_a, b.r2_g AS r2_b, g.n, g.tie3
  FROM per_group a JOIN per_group b ON a.event_type < b.event_type, gstat g
)
SELECT et_a, et_b, n_a, n_b,
       round((CAST(r2_a AS DOUBLE) / (2 * n_a)
              - CAST(r2_b AS DOUBLE) / (2 * n_b))
             / sqrt((CAST(n AS DOUBLE) * (n + 1) / 12
                     - CAST(tie3 AS DOUBLE) / (12 * (n - 1)))
                    * (1.0 / n_a + 1.0 / n_b)), 6) AS z_dunn,
       CAST(CASE WHEN abs((CAST(r2_a AS DOUBLE) / (2 * n_a)
                           - CAST(r2_b AS DOUBLE) / (2 * n_b))
             / sqrt((CAST(n AS DOUBLE) * (n + 1) / 12
                     - CAST(tie3 AS DOUBLE) / (12 * (n - 1)))
                    * (1.0 / n_a + 1.0 / n_b))) > {DUNN_ZCRIT}
            THEN 1 ELSE 0 END AS BIGINT) AS significant
FROM pairs
""",
)
def stat_dunn_posthoc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dunn's post-hoc pairwise z tests after ``stat_kruskal_wallis``:
    the omnibus H says SOME group differs; Dunn says WHICH pairs, using
    mean pooled ranks (the exact doubled-rank count-of-values machinery
    shared with the KW query — no per-row rank window), the tie-corrected
    rank variance N(N+1)/12 − Σ(t³−t)/(12(N−1)), and a Bonferroni
    critical value {DUNN_ZCRIT} for the C(k,2) comparisons. Doubles only
    at the final z from exact integer moments, rounded once.

    Scale shape: ranks come from the count-of-values table via Fenwick
    prefix sums (no window — r7); the pair frame is C(k,2) rows of
    scalar math."""
    ev = load(spark, sf_dir, "events")
    cents = ev.select(
        "event_type", F.round(F.col("value") * 100).cast("long").alias("v")
    )
    byv = cents.groupBy("v").agg(F.count("*").cast("long").alias("c"))
    # r7: below via Fenwick prefix sums — no global window over the grid
    cum = with_below(byv, "v", "c")
    grp = cents.groupBy("event_type", "v").agg(
        F.count("*").cast("long").alias("cg")
    )
    per_group = (
        grp.join(cum, "v")
        .groupBy("event_type")
        .agg(
            F.sum("cg").cast("long").alias("n_g"),
            F.sum(F.col("cg") * (2 * F.col("below") + F.col("c") + 1))
            .cast("long")
            .alias("r2_g"),
        )
    )
    tie3 = byv.agg(
        F.sum(F.col("c") * F.col("c") * F.col("c") - F.col("c"))
        .cast("long")
        .alias("tie3")
    )
    glob = per_group.agg(F.sum("n_g").cast("long").alias("n")).crossJoin(
        F.broadcast(tie3)
    )
    a = per_group.select(
        F.col("event_type").alias("et_a"),
        F.col("n_g").alias("n_a"),
        F.col("r2_g").alias("r2_a"),
    )
    b = per_group.select(
        F.col("event_type").alias("et_b"),
        F.col("n_g").alias("n_b"),
        F.col("r2_g").alias("r2_b"),
    )
    pairs = (
        a.crossJoin(b)
        .filter(F.col("et_a") < F.col("et_b"))
        .crossJoin(F.broadcast(glob))
    )
    z = (
        F.col("r2_a").cast("double") / (2 * F.col("n_a"))
        - F.col("r2_b").cast("double") / (2 * F.col("n_b"))
    ) / F.sqrt(
        (
            F.col("n").cast("double") * (F.col("n") + 1) / 12
            - F.col("tie3").cast("double") / (12 * (F.col("n") - 1))
        )
        * (1.0 / F.col("n_a") + 1.0 / F.col("n_b"))
    )
    return pairs.select(
        "et_a",
        "et_b",
        "n_a",
        "n_b",
        F.round(z, 6).alias("z_dunn"),
        F.when(F.abs(z) > DUNN_ZCRIT, 1).otherwise(0).cast("long").alias(
            "significant"
        ),
    )
