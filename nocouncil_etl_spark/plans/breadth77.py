"""Breadth batch 57 (round 6): softmax GD, log-rank test, AIC/BIC trend
selection, aggregation-strategy memory model, surrogate fidelity,
vocabulary coverage curve.

Six operators (reference scope: multiclass linear classification
training, the canonical two-group survival comparison, information-
criterion model selection, the planner's hash-vs-sort aggregate choice,
interpretability-surrogate validation, and the tokenizer budget curve):

- ``ml_softmax_gd``        — two gradient steps of softmax regression
  (event type from the value band), quantized gradients.
- ``survival_log_rank``    — log-rank test of time-to-first-purchase
  between user cohorts, exact risk-set arithmetic.
- ``stat_aic_bic_trend``   — constant vs linear vs quadratic daily
  trend, ranked by AIC and BIC.
- ``io_agg_strategy_model``— per-key NDV-based hash-vs-sort aggregation
  recommendation under a memory budget.
- ``ml_surrogate_fidelity``— depth-1 surrogate's agreement with the
  two-level oblivious tree's predictions.
- ``text_vocab_coverage_curve`` — corpus token coverage of the top-k
  vocabulary over a k grid.

Reference parity: north-star extension — no reference analogue
(the reference has no analytics layer); these are the audit layers a lake-scale engine
adds on the same tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nocouncil_etl_spark.io import fan_out, load
from nocouncil_etl_spark.plans.retrieval_plans import _TOK_SPARK, _TOK_SQL
from nocouncil_etl_spark.registry import query

SM_LR_MICRO = 500  # softmax learning rate 0.0005 on normalized features
SM_STEPS = 2
AGG_BUDGET_BYTES = 64 * 1024 * 1024
AGG_STATE_WIDTH = 64
VC_KS = (10, 20, 50, 100)
OBL_LABEL_CENTS = 46_710_000
OBL_BAND1 = 100_000
OBL_BAND2 = 2


# --------------------------------------------------------------------------
# 1. Softmax gradient descent
# --------------------------------------------------------------------------


SM_CLASSES = ("click", "error", "purchase", "signup", "view")


def _sm_oracle() -> str:
    classes = SM_CLASSES
    k = len(classes)
    lr = SM_LR_MICRO / 1_000_000.0
    ctes = [
        """
d AS MATERIALIZED (
  SELECT event_type,
         CAST(CAST(round(100 * value) AS BIGINT) // 2000 AS DOUBLE) AS x
  FROM events WHERE value IS NOT NULL
),
nn AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS n FROM d)"""
    ]
    w = {i: "0.0" for i in range(k)}
    b = {i: "0.0" for i in range(k)}
    for step in (1, 2):
        scores = [f"(({w[i]}) * x + ({b[i]}))" for i in range(k)]
        mx = "greatest(" + ", ".join(scores) + ")"
        exps = [f"exp({s} - {mx})" for s in scores]
        z = " + ".join(exps)
        grads = []
        for i, c in enumerate(classes):
            ind = f"(CASE WHEN event_type = '{c}' THEN 1.0 ELSE 0.0 END)"
            p = f"(({exps[i]}) / ({z}))"
            grads.append(
                f"sum(CAST(round(1000000 * ({p} - {ind}) * x) AS BIGINT))"
                f" AS gw{i}"
            )
            grads.append(
                f"sum(CAST(round(1000000 * ({p} - {ind})) AS BIGINT))"
                f" AS gb{i}"
            )
        ctes.append(
            f",\ng{step} AS MATERIALIZED (SELECT {', '.join(grads)} FROM d)"
        )
        upd = []
        for i in range(k):
            upd.append(
                f"({w[i]}) - {lr!r} * ((SELECT gw{i} FROM g{step})"
                f" / 1000000.0) / (SELECT n FROM nn) * 1000 AS w{i}"
            )
            upd.append(
                f"({b[i]}) - {lr!r} * ((SELECT gb{i} FROM g{step})"
                f" / 1000000.0) / (SELECT n FROM nn) * 1000 AS b{i}"
            )
        ctes.append(
            f",\nab{step} AS MATERIALIZED (SELECT {', '.join(upd)})"
        )
        w = {i: f"(SELECT w{i} FROM ab{step})" for i in range(k)}
        b = {i: f"(SELECT b{i} FROM ab{step})" for i in range(k)}
    scores = [f"(({w[i]}) * x + ({b[i]}))" for i in range(k)]
    # argmax with earlier-class-wins ties: strict > chain in class order
    pred = f"'{classes[0]}'"
    best = scores[0]
    for i in range(1, k):
        pred = f"CASE WHEN {scores[i]} > {best} THEN '{classes[i]}' ELSE {pred} END"
        best = f"greatest({best}, {scores[i]})"
    ctes.append(f""",
acc AS MATERIALIZED (
  SELECT CAST(round(1000.0 * sum(CASE WHEN event_type = ({pred})
                                      THEN 1 ELSE 0 END) / count(*))
              AS BIGINT) AS acc_milli
  FROM d
)""")
    finals = "\nUNION ALL\n".join(
        f"""SELECT '{c}' AS class,
       CAST(round(1000000 * ({w[i]})) AS BIGINT) AS w_micro,
       CAST(round(1000000 * ({b[i]})) AS BIGINT) AS b_micro,
       (SELECT acc_milli FROM acc) AS train_acc_milli"""
        for i, c in enumerate(classes)
    )
    return "WITH " + "".join(ctes) + "\n" + finals


@query("ml_softmax_gd", oracle=_sm_oracle())
def ml_softmax_gd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two full-batch gradient steps of softmax (multinomial logistic)
    regression predicting the event type from the normalized value
    band — the multiclass generalization of ml_logistic_gd: per class
    the gradient is Σ(p_c − 1[y=c])·x with p from the shared
    max-shifted softmax, each per-row contribution quantized to micro
    integers before the sum (so the distributed reduce is exact), and
    the weight state (2 scalars per class) crosses the driver between
    steps — the data-parallel training loop at its purest. Reports
    per-class (w, b) after {SM_STEPS} steps and the training accuracy
    of the argmax rule (ties → first class in sorted order).

    Scale shape: each step is ONE map-side-combined aggregate emitting
    k gradient pairs; scoring is a narrow pass."""
    classes = list(SM_CLASSES)
    k = len(classes)
    d = (
        load(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            "event_type",
            (
                F.expr("CAST(round(100 * value) AS BIGINT) div 2000")
                .cast("double")
            ).alias("x"),
        )
    )
    d.persist()
    n = d.count()
    w = {c: 0.0 for c in classes}
    b = {c: 0.0 for c in classes}
    lr = SM_LR_MICRO / 1_000_000.0
    for _ in range(SM_STEPS):
        scores = [
            (F.lit(w[c]) * F.col("x") + F.lit(b[c])).alias(f"s{i}")
            for i, c in enumerate(classes)
        ]
        sc = d.select("event_type", "x", *scores)
        mx = F.greatest(*[F.col(f"s{i}") for i in range(k)])
        exps = [F.exp(F.col(f"s{i}") - mx).alias(f"e{i}") for i in range(k)]
        sc = sc.select("event_type", "x", *exps)
        z = sum(F.col(f"e{i}") for i in range(k))
        grads = []
        for i, c in enumerate(classes):
            p = F.col(f"e{i}") / z
            ind = F.when(F.col("event_type") == c, 1.0).otherwise(0.0)
            grads.append(
                F.sum(F.round(1_000_000 * (p - ind) * F.col("x")).cast("long"))
                .alias(f"gw{i}")
            )
            grads.append(
                F.sum(F.round(1_000_000 * (p - ind)).cast("long")).alias(
                    f"gb{i}"
                )
            )
        g = sc.agg(*grads).first()
        for i, c in enumerate(classes):
            w[c] -= lr * (g[f"gw{i}"] / 1_000_000.0) / n * 1000
            b[c] -= lr * (g[f"gb{i}"] / 1_000_000.0) / n * 1000
    # training accuracy of the argmax rule
    scores = [
        (F.lit(w[c]) * F.col("x") + F.lit(b[c])).alias(f"s{i}")
        for i, c in enumerate(classes)
    ]
    sc = d.select("event_type", *scores)
    pred = None
    best = None
    for i, c in enumerate(classes):
        if pred is None:
            pred, best = F.lit(c), F.col(f"s{i}")
        else:
            cond = F.col(f"s{i}") > best
            pred = F.when(cond, c).otherwise(pred)
            best = F.when(cond, F.col(f"s{i}")).otherwise(best)
    acc = sc.select(
        (F.col("event_type") == pred).cast("int").alias("ok")
    ).agg(
        F.round(1000.0 * F.sum("ok") / F.count(F.lit(1)))
        .cast("long")
        .alias("acc_milli")
    ).first()
    import math

    def rha(x: float) -> int:
        """Round half away from zero — SQL round(), not banker's."""
        return int(math.floor(x + 0.5)) if x >= 0 else int(math.ceil(x - 0.5))

    rows = [
        (
            c,
            rha(1_000_000 * w[c]),
            rha(1_000_000 * b[c]),
            int(acc.acc_milli),
        )
        for c in classes
    ]
    return spark.createDataFrame(
        rows, "class string, w_micro long, b_micro long, train_acc_milli long"
    )


# --------------------------------------------------------------------------
# 2. Log-rank test
# --------------------------------------------------------------------------


@query(
    "survival_log_rank",
    oracle="""
WITH span AS (
  SELECT user_id, user_id % 2 AS grp, min(ts) AS first_ts,
         min(CASE WHEN event_type = 'purchase' THEN ts END) AS first_buy,
         max(ts) AS last_ts
  FROM events GROUP BY user_id
),
life AS (
  SELECT grp,
         CASE WHEN first_buy IS NOT NULL
              THEN CAST(date_diff('day', first_ts, first_buy) AS BIGINT) + 1
              ELSE CAST(date_diff('day', first_ts, last_ts) AS BIGINT) + 1
         END AS t,
         CASE WHEN first_buy IS NOT NULL THEN 1 ELSE 0 END AS died
  FROM span
),
tab AS (
  SELECT t,
         CAST(sum(died) AS BIGINT) AS d,
         CAST(sum(died * grp) AS BIGINT) AS d1,
         CAST(count(*) AS BIGINT) AS leaving,
         CAST(sum(grp) AS BIGINT) AS leaving1
  FROM life GROUP BY t
),
risk AS (
  SELECT t, d, d1,
         sum(leaving) OVER (ORDER BY t DESC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n,
         sum(leaving1) OVER (ORDER BY t DESC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n1
  FROM tab
),
terms AS (
  SELECT d1,
         CAST(round(1000000.0 * d * n1 / n) AS BIGINT) AS e1_micro,
         CASE WHEN n > 1
              THEN CAST(round(1000000.0 * d * (CAST(n1 AS DOUBLE) / n)
                   * (1.0 - CAST(n1 AS DOUBLE) / n)
                   * (n - d) / (n - 1)) AS BIGINT) ELSE 0 END AS v_micro
  FROM risk WHERE d > 0
)
SELECT CAST(sum(d1) AS BIGINT) AS o1,
       CAST(round(CAST(sum(e1_micro) AS DOUBLE) / 1000000) AS BIGINT) AS e1,
       CAST(round(1000.0 * (sum(d1) - sum(e1_micro) / 1000000.0)
            / sqrt(sum(v_micro) / 1000000.0)) AS BIGINT) AS z_milli
FROM terms
""",
)
def survival_log_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-rank test comparing time-to-first-purchase between user
    cohorts (id parity), with never-purchasers right-censored at their
    last activity: at every event time the observed group-1 conversions
    compare against the hypergeometric expectation d·n₁/n from the risk
    sets (reverse-cumulative counts — the KM machinery), variance
    summed the Mantel-Haenszel way — THE standard two-group survival
    comparison (survival_kaplan_meier draws the curves; this says
    whether they differ). Per-time terms quantize to micro before
    summing.

    Scale shape: per-user span rollup, time-grain life table, one
    reverse window, scalar arithmetic."""
    ev = load(spark, sf_dir, "events")
    span = ev.groupBy("user_id").agg(
        F.min("ts").alias("first_ts"),
        F.min(
            F.when(F.col("event_type") == "purchase", F.col("ts"))
        ).alias("first_buy"),
        F.max("ts").alias("last_ts"),
    )
    life = span.select(
        (F.col("user_id") % 2).alias("grp"),
        F.when(
            F.col("first_buy").isNotNull(),
            F.datediff("first_buy", "first_ts") + 1,
        )
        .otherwise(F.datediff("last_ts", "first_ts") + 1)
        .cast("long")
        .alias("t"),
        F.when(F.col("first_buy").isNotNull(), 1).otherwise(0).alias("died"),
    )
    tab = life.groupBy("t").agg(
        F.sum("died").cast("long").alias("d"),
        F.sum(F.col("died") * F.col("grp")).cast("long").alias("d1"),
        F.count(F.lit(1)).cast("long").alias("leaving"),
        F.sum("grp").cast("long").alias("leaving1"),
    )
    wd = Window.orderBy(F.desc("t")).rowsBetween(Window.unboundedPreceding, 0)
    risk = tab.select(
        "d",
        "d1",
        F.sum("leaving").over(wd).alias("n"),
        F.sum("leaving1").over(wd).alias("n1"),
    ).filter(F.col("d") > 0)
    e1 = F.round(1_000_000.0 * F.col("d") * F.col("n1") / F.col("n")).cast(
        "long"
    )
    p1 = F.col("n1").cast("double") / F.col("n")
    v = F.when(
        F.col("n") > 1,
        F.round(
            1_000_000.0
            * F.col("d")
            * p1
            * (1.0 - p1)
            * (F.col("n") - F.col("d"))
            / (F.col("n") - 1)
        ).cast("long"),
    ).otherwise(0)
    terms = risk.select("d1", e1.alias("e1_micro"), v.alias("v_micro"))
    return terms.agg(
        F.sum("d1").cast("long").alias("o1"),
        F.round(F.sum("e1_micro").cast("double") / 1_000_000)
        .cast("long")
        .alias("e1"),
        F.round(
            1000.0
            * (F.sum("d1") - F.sum("e1_micro") / 1_000_000.0)
            / F.sqrt(F.sum("v_micro") / 1_000_000.0)
        )
        .cast("long")
        .alias("z_milli"),
    )


# --------------------------------------------------------------------------
# 3. AIC/BIC trend selection
# --------------------------------------------------------------------------


@query(
    "stat_aic_bic_trend",
    oracle="""
WITH cnt AS (
  SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS y
  FROM events GROUP BY 1
),
idx AS (
  SELECT y, CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS t FROM cnt
),
m AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(t) AS BIGINT) AS s1, CAST(sum(t * t) AS BIGINT) AS s2,
         CAST(sum(t * t * t) AS BIGINT) AS s3,
         CAST(sum(CAST(t AS HUGEINT) * t * t * t) AS DOUBLE) AS s4,
         CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(t * y) AS BIGINT) AS sty,
         CAST(sum(CAST(t AS HUGEINT) * t * y) AS DOUBLE) AS st2y,
         CAST(sum(CAST(y AS HUGEINT) * y) AS DOUBLE) AS syy
  FROM idx
),
f0 AS (
  SELECT n, syy - CAST(sy AS DOUBLE) * sy / n AS sse, 1 AS k FROM m
),
f1 AS (
  SELECT n,
         (syy - CAST(sy AS DOUBLE) * sy / n)
         - (sty - CAST(s1 AS DOUBLE) * sy / n)
           * (sty - CAST(s1 AS DOUBLE) * sy / n)
           / (s2 - CAST(s1 AS DOUBLE) * s1 / n) AS sse,
         2 AS k
  FROM m
),
f2 AS (
  SELECT m.n,
         f1.sse
         - pow(st2y - CAST(s2 AS DOUBLE) * sy / m.n
               - (s3 - CAST(s2 AS DOUBLE) * s1 / m.n)
                 * (sty - CAST(s1 AS DOUBLE) * sy / m.n)
                 / (s2 - CAST(s1 AS DOUBLE) * s1 / m.n), 2)
           / (s4 - CAST(s2 AS DOUBLE) * s2 / m.n
              - pow(s3 - CAST(s2 AS DOUBLE) * s1 / m.n, 2)
                / (s2 - CAST(s1 AS DOUBLE) * s1 / m.n)) AS sse,
         3 AS k
  FROM m, f1
),
models AS (
  SELECT 'constant' AS model, k, sse, n FROM f0
  UNION ALL SELECT 'linear', k, sse, n FROM f1
  UNION ALL SELECT 'quadratic', k, sse, n FROM f2
)
SELECT model, CAST(k AS BIGINT) AS k_params,
       CAST(round(sse) AS BIGINT) AS sse,
       CAST(round(1000 * (n * ln(sse / n) + 2 * k)) AS BIGINT) AS aic_milli,
       CAST(round(1000 * (n * ln(sse / n) + k * ln(CAST(n AS DOUBLE))))
            AS BIGINT) AS bic_milli
FROM models
""",
)
def stat_aic_bic_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Information-criterion model selection for the daily-count trend:
    constant, linear, and quadratic fits (nested OLS — each SSE drops
    by the next orthogonalized regressor's contribution, all from exact
    integer/128-bit moments), ranked by AIC = n·ln(SSE/n) + 2k and
    BIC (which penalizes the extra parameter by ln n instead of 2) —
    the discipline that stops ts_segmented_trend-style models from
    overfitting: pick the row with the smallest criterion. Gaussian
    likelihood up to constants, identical on both engines.

    Scale shape: one moment scan serves all three fits; output is a
    3-row table."""
    cnt = (
        load(spark, sf_dir, "events")
        .groupBy(F.col("ts").cast("date").alias("day"))
        .agg(F.count(F.lit(1)).cast("long").alias("y"))
    )
    idx = cnt.select(
        "y",
        F.row_number().over(Window.orderBy("day")).cast("long").alias("t"),
    )
    dec = "decimal(38,0)"
    m = idx.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("t").cast("long").alias("s1"),
        F.sum(F.col("t") * F.col("t")).cast("long").alias("s2"),
        F.sum(F.col("t") * F.col("t") * F.col("t")).cast("long").alias("s3"),
        F.sum((F.col("t").cast(dec) * F.col("t") * F.col("t") * F.col("t")))
        .cast("double")
        .alias("s4"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("t") * F.col("y")).cast("long").alias("sty"),
        F.sum((F.col("t").cast(dec) * F.col("t") * F.col("y")))
        .cast("double")
        .alias("st2y"),
        F.sum((F.col("y").cast(dec) * F.col("y"))).cast("double").alias("syy"),
    )
    n = F.col("n")
    syy_c = F.col("syy") - F.col("sy").cast("double") * F.col("sy") / n
    sty_c = F.col("sty") - F.col("s1").cast("double") * F.col("sy") / n
    stt_c = F.col("s2") - F.col("s1").cast("double") * F.col("s1") / n
    sse1 = syy_c - sty_c * sty_c / stt_c
    s2y_c = F.col("st2y") - F.col("s2").cast("double") * F.col("sy") / n
    s2t_c = F.col("s3") - F.col("s2").cast("double") * F.col("s1") / n
    s22_c = F.col("s4") - F.col("s2").cast("double") * F.col("s2") / n
    resid2 = s2y_c - s2t_c * sty_c / stt_c
    denom2 = s22_c - s2t_c * s2t_c / stt_c
    sse2 = sse1 - resid2 * resid2 / denom2
    rows = None
    for name, kparams, sse in (
        ("constant", 1, syy_c),
        ("linear", 2, sse1),
        ("quadratic", 3, sse2),
    ):
        aic = 1000 * (n * F.log(sse / n) + 2 * kparams)
        bic = 1000 * (n * F.log(sse / n) + kparams * F.log(n.cast("double")))
        arm = m.select(
            F.lit(name).alias("model"),
            F.lit(kparams).cast("long").alias("k_params"),
            F.round(sse).cast("long").alias("sse"),
            F.round(aic).cast("long").alias("aic_milli"),
            F.round(bic).cast("long").alias("bic_milli"),
        )
        rows = arm if rows is None else rows.unionByName(arm)
    return rows


# --------------------------------------------------------------------------
# 4. Aggregation strategy model
# --------------------------------------------------------------------------


def _agg_keys() -> tuple[str, ...]:
    return ("o_orderstatus", "o_orderpriority", "o_custkey", "o_orderkey")


def _agg_oracle() -> str:
    arms = "\nUNION ALL\n".join(
        f"""SELECT '{k}' AS key_col,
       CAST(count(DISTINCT {k}) AS BIGINT) AS ndv,
       CAST(count(*) AS BIGINT) AS n_rows
FROM orders"""
        for k in _agg_keys()
    )
    return f"""
WITH arms AS (
{arms}
)
SELECT key_col, ndv, n_rows,
       CAST(ndv * {AGG_STATE_WIDTH} AS BIGINT) AS est_state_bytes,
       CASE WHEN ndv * {AGG_STATE_WIDTH} <= {AGG_BUDGET_BYTES}
            THEN 'hash' ELSE 'sort' END AS strategy,
       CAST(round(1000.0 * ndv / n_rows) AS BIGINT) AS reduction_milli
FROM arms
"""


@query("io_agg_strategy_model", oracle=_agg_oracle())
def io_agg_strategy_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The planner's hash-vs-sort aggregation choice, modeled per
    candidate group key: estimated hash-table state = NDV ×
    {AGG_STATE_WIDTH} B against a {AGG_BUDGET_BYTES >> 20} MB budget —
    below it, hash aggregation holds state in memory; above it, the
    sort-based strategy (or partial-agg + shuffle) avoids the spill.
    The reduction ratio NDV/rows is the other planner signal: near
    1000 milli (all-distinct keys, o_orderkey) partial aggregation is
    WASTED work — exactly the decision Spark's AQE and DuckDB's
    aggregate planner make from io_analyze_table_stats-style NDVs.

    Scale shape: one distinct-count scan per candidate key (one pass
    each, map-side combined), 4-row output."""
    orders = load(spark, sf_dir, "orders")
    rows = None
    for k in _agg_keys():
        arm = orders.agg(
            F.lit(k).alias("key_col"),
            F.countDistinct(k).cast("long").alias("ndv"),
            F.count(F.lit(1)).cast("long").alias("n_rows"),
        ).select(
            "key_col",
            "ndv",
            "n_rows",
            (F.col("ndv") * AGG_STATE_WIDTH).cast("long").alias(
                "est_state_bytes"
            ),
            F.when(
                F.col("ndv") * AGG_STATE_WIDTH <= AGG_BUDGET_BYTES, "hash"
            )
            .otherwise("sort")
            .alias("strategy"),
            F.round(1000.0 * F.col("ndv") / F.col("n_rows"))
            .cast("long")
            .alias("reduction_milli"),
        )
        rows = arm if rows is None else rows.unionByName(arm)
    return rows


# --------------------------------------------------------------------------
# 5. Surrogate fidelity
# --------------------------------------------------------------------------


@query(
    "ml_surrogate_fidelity",
    oracle=f"""
WITH labeled AS (
  SELECT CAST(round(c.c_acctbal * 100) AS BIGINT) AS x1,
         coalesce(o.cnt, 0) AS x2,
         CASE WHEN coalesce(o.mx, 0) > {OBL_LABEL_CENTS} THEN 1 ELSE 0 END AS y
  FROM customer c
  LEFT JOIN (SELECT o_custkey, CAST(count(*) AS BIGINT) AS cnt,
                    CAST(round(max(o_totalprice) * 100) AS BIGINT) AS mx
             FROM orders GROUP BY 1) o ON o.o_custkey = c.c_custkey
),
base AS (SELECT CAST(sum(y) AS BIGINT) AS pos, CAST(count(*) AS BIGINT) AS n
         FROM labeled),
-- the full model: 2x2 leaf rates over the two median-ish fixed splits
cells AS (
  SELECT CASE WHEN x1 <= 0 THEN 0 ELSE 1 END AS s1,
         CASE WHEN x2 <= 4 THEN 0 ELSE 1 END AS s2,
         CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS pos
  FROM labeled GROUP BY 1, 2
),
tree_pred AS (
  SELECT s1, s2,
         CASE WHEN pos * (SELECT n FROM base)
                   > n * (SELECT pos FROM base) THEN 1 ELSE 0 END AS pred
  FROM cells
),
-- the depth-1 surrogate: split on x1 only, majority of the tree's output
surro AS (
  SELECT s1,
         CASE WHEN sum(CASE WHEN t.pred = 1 THEN c.n ELSE 0 END) * 2
                   > sum(c.n) THEN 1 ELSE 0 END AS pred
  FROM cells c JOIN tree_pred t USING (s1, s2)
  GROUP BY s1
),
joined AS (
  SELECT c.n, t.pred AS tree_p, s.pred AS surro_p
  FROM cells c
  JOIN tree_pred t USING (s1, s2)
  JOIN surro s USING (s1)
)
SELECT CAST(sum(n) AS BIGINT) AS n_rows,
       CAST(sum(CASE WHEN tree_p = surro_p THEN n ELSE 0 END) AS BIGINT)
         AS n_agree,
       CAST(round(1000.0 * sum(CASE WHEN tree_p = surro_p THEN n ELSE 0 END)
                  / sum(n)) AS BIGINT) AS fidelity_milli
FROM joined
""",
)
def ml_surrogate_fidelity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Surrogate-model fidelity: a depth-2 model (2x2 cells over fixed
    balance/order-count splits, predicting above-base-rate leaves) is
    distilled into a depth-1 SURROGATE (balance split only, majority of
    the full model's predictions per side), and fidelity = the
    population fraction where surrogate and model AGREE — the number
    that decides whether the simple explanation offered to a reviewer
    actually describes the model (the interpretability-audit version of
    distillation; low fidelity means the dropped feature carries real
    decision weight). All counts exact.

    Scale shape: one labeled scan to the 4-cell table; everything else
    is arithmetic on it."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    per = orders.groupBy("o_custkey").agg(
        F.count(F.lit(1)).cast("long").alias("cnt"),
        F.round(F.max("o_totalprice") * 100).cast("long").alias("mx"),
    )
    labeled = (
        cust.join(per, cust["c_custkey"] == per["o_custkey"], "left")
        .select(
            F.round(F.col("c_acctbal") * 100).cast("long").alias("x1"),
            F.coalesce("cnt", F.lit(0)).alias("x2"),
            F.when(F.coalesce("mx", F.lit(0)) > OBL_LABEL_CENTS, 1)
            .otherwise(0)
            .alias("y"),
        )
    )
    base = labeled.agg(
        F.sum("y").cast("long").alias("bpos"),
        F.count(F.lit(1)).cast("long").alias("bn"),
    )
    cells = labeled.groupBy(
        F.when(F.col("x1") <= 0, 0).otherwise(1).alias("s1"),
        F.when(F.col("x2") <= 4, 0).otherwise(1).alias("s2"),
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").cast("long").alias("pos"),
    )
    tree = cells.crossJoin(F.broadcast(base)).select(
        "s1",
        "s2",
        "n",
        F.when(
            F.col("pos") * F.col("bn") > F.col("n") * F.col("bpos"), 1
        )
        .otherwise(0)
        .alias("pred"),
    )
    tree.persist()
    surro = tree.groupBy("s1").agg(
        F.when(
            F.sum(F.when(F.col("pred") == 1, F.col("n")).otherwise(0)) * 2
            > F.sum("n"),
            1,
        )
        .otherwise(0)
        .alias("spred")
    )
    joined = tree.join(F.broadcast(surro), "s1")
    return joined.agg(
        F.sum("n").cast("long").alias("n_rows"),
        F.sum(
            F.when(F.col("pred") == F.col("spred"), F.col("n")).otherwise(0)
        )
        .cast("long")
        .alias("n_agree"),
        F.round(
            1000.0
            * F.sum(
                F.when(F.col("pred") == F.col("spred"), F.col("n")).otherwise(
                    0
                )
            )
            / F.sum("n")
        )
        .cast("long")
        .alias("fidelity_milli"),
    )


# --------------------------------------------------------------------------
# 6. Vocabulary coverage curve
# --------------------------------------------------------------------------


def _vc_oracle() -> str:
    arms = "\nUNION ALL\n".join(
        f"""SELECT {k} AS top_k,
       (SELECT CAST(sum(c) AS BIGINT) FROM ranked WHERE rk <= {k}) AS covered,
       (SELECT CAST(sum(c) AS BIGINT) FROM ranked) AS total"""
        for k in VC_KS
    )
    return f"""
WITH tf AS (
  SELECT term, CAST(count(*) AS BIGINT) AS c
  FROM (SELECT unnest({_TOK_SQL}) AS term FROM documents) GROUP BY term
),
ranked AS (
  SELECT c, row_number() OVER (ORDER BY c DESC, term) AS rk FROM tf
),
arms AS (
{arms}
)
SELECT top_k, covered, total,
       CAST(round(1000.0 * covered / total) AS BIGINT) AS coverage_milli
FROM arms
"""


@query("text_vocab_coverage_curve", oracle=_vc_oracle())
def text_vocab_coverage_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary coverage curve: the share of all corpus tokens
    covered by the top-k vocabulary for k in {VC_KS} — the budget curve
    every tokenizer/feature-hash decision reads (text_heaps_law models
    vocabulary GROWTH; this is the dual: how much a truncated
    vocabulary keeps; text_oov_rate is one point on this curve).
    Exact integer counts; ranking ties break by term.

    Scale shape: one tokenization pass + vocabulary hash agg, one rank
    window over the Heaps-bounded vocabulary, |grid| scalar lookups."""
    docs = fan_out(load(spark, sf_dir, "documents"))
    tf = (
        docs.select(F.explode(F.expr(_TOK_SPARK)).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    ranked = tf.select(
        "c",
        F.row_number().over(Window.orderBy(F.desc("c"), "term")).alias("rk"),
    )
    ranked.persist()
    total = ranked.agg(F.sum("c").cast("long").alias("total"))
    rows = None
    for k in VC_KS:
        arm = (
            ranked.filter(F.col("rk") <= k)
            .agg(F.sum("c").cast("long").alias("covered"))
            .crossJoin(F.broadcast(total))
            .select(
                F.lit(k).cast("long").alias("top_k"),
                "covered",
                "total",
                F.round(1000.0 * F.col("covered") / F.col("total"))
                .cast("long")
                .alias("coverage_milli"),
            )
        )
        rows = arm if rows is None else rows.unionByName(arm)
    return rows
