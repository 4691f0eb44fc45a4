"""Breadth batch 54 (round 6): Wald-Wolfowitz runs, Lorenz asymmetry,
4-4-5 fiscal calendar, DP utility curve, word error rate, Cook's
distance.

Six operators (reference scope: the distribution-free two-sample runs
test, the inequality-direction diagnostic, the retail fiscal calendar,
the privacy-utility tradeoff curve, the sequence-alignment error
metric, and regression influence diagnostics):

- ``stat_wald_wolfowitz``   — two-sample runs test on the pooled value
  ordering.
- ``agg_lorenz_asymmetry``  — Lorenz asymmetry coefficient S = F(μ) +
  L(μ) of customer revenue (which tail drives inequality).
- ``fn_fiscal_445_calendar``— 4-4-5 fiscal period mapping with per-
  period revenue and week-count validation.
- ``privacy_dp_utility_curve`` — Laplace-noised type counts at an ε
  grid (hash-deterministic noise) with L1 utility loss.
- ``eval_word_error_rate``  — token-level WER via vocabulary-coded
  Levenshtein between each document's halves.
- ``stat_cooks_distance``   — top influential customers by Cook's D on
  the revenue ~ balance regression.

Reference parity: north-star extension — no reference analogue
(the reference has no analytics layer); these are the audit layers a lake-scale engine
adds on the same tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nocouncil_etl_spark.io import fan_out, load
from nocouncil_etl_spark.operators.quantiles import cumulate, ranged_rank_cumsum
from nocouncil_etl_spark.plans.breadth15 import _pt, _pt_sql
from nocouncil_etl_spark.plans.retrieval_plans import _TOK_SPARK, _TOK_SQL
from nocouncil_etl_spark.registry import query

DP_EPS_MILLI = (100, 1000, 10000)
WER_SAMPLE_MOD = 11
CD_TOP = 10


# --------------------------------------------------------------------------
# 1. Wald-Wolfowitz runs test
# --------------------------------------------------------------------------


@query(
    "stat_wald_wolfowitz",
    oracle="""
WITH s AS (
  SELECT event_id, CAST(round(100 * value) AS BIGINT) AS x,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_a
  FROM events
  WHERE value IS NOT NULL AND event_type IN ('purchase', 'view')
),
o AS (
  SELECT is_a, lag(is_a) OVER (ORDER BY x, event_id) AS prev
  FROM s
),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(is_a) AS BIGINT) AS n1,
         CAST(1 + sum(CASE WHEN prev IS NOT NULL AND is_a <> prev
                           THEN 1 ELSE 0 END) AS BIGINT) AS runs
  FROM o
)
SELECT n1, CAST(n - n1 AS BIGINT) AS n2, runs,
       CAST(round(1000.0 * (runs - (2.0 * n1 * (n - n1) / n + 1))
            / sqrt(2.0 * n1 * (n - n1) * (2.0 * n1 * (n - n1) - n)
                   / (CAST(n AS DOUBLE) * n * (n - 1)))) AS BIGINT)
         AS z_milli
FROM agg
""",
)
def stat_wald_wolfowitz(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald-Wolfowitz two-sample runs test: pool purchase and view
    values in the (value, id) total order and count RUNS of same-group
    labels — too few runs means the groups separate somewhere (ANY
    difference: location, scale, or shape), the completely assumption-
    free omnibus that predates and complements stat_ks_two_sample /
    stat_cvm_two_sample (it trades power for generality). Run counting
    is one lag comparison; z uses the exact null moments.

    Scale shape (r9): adjacency via ONE ranged scan carrying the lag
    over the (value, id) total order — no Fenwick explode, no
    consecutive-rank self-join, no global sort; one rollup."""
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
    # r9: lag over the (value, id) total order via the ranged scan's
    # lag_col (prev NULL on the global first row, matching lag())
    o = ranged_rank_cumsum(s, "x", "event_id", lag_col="is_a").select(
        "is_a", F.col("prev_is_a").alias("prev")
    )
    agg = o.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("is_a").cast("long").alias("n1"),
        (
            1
            + F.sum(
                F.when(
                    F.col("prev").isNotNull()
                    & (F.col("is_a") != F.col("prev")),
                    1,
                ).otherwise(0)
            )
        )
        .cast("long")
        .alias("runs"),
    )
    n, n1 = F.col("n"), F.col("n1")
    mu = 2.0 * n1 * (n - n1) / n + 1
    var = (
        2.0
        * n1
        * (n - n1)
        * (2.0 * n1 * (n - n1) - n)
        / (n.cast("double") * n * (n - 1))
    )
    return agg.select(
        n1.alias("n1"),
        (n - n1).cast("long").alias("n2"),
        F.col("runs"),
        F.round(1000.0 * (F.col("runs") - mu) / F.sqrt(var))
        .cast("long")
        .alias("z_milli"),
    )


# --------------------------------------------------------------------------
# 2. Lorenz asymmetry
# --------------------------------------------------------------------------


@query(
    "agg_lorenz_asymmetry",
    oracle="""
WITH rev AS (
  SELECT coalesce(o.rev, 0) AS x, c.c_custkey
  FROM customer c
  LEFT JOIN (SELECT o_custkey, CAST(sum(CAST(round(100 * o_totalprice)
                    AS BIGINT)) AS BIGINT) AS rev
             FROM orders GROUP BY 1) o ON o.o_custkey = c.c_custkey
),
r AS (
  SELECT x,
         row_number() OVER (ORDER BY x, c_custkey) AS rn,
         count(*) OVER () AS n,
         CAST(sum(x) OVER () AS BIGINT) AS total,
         CAST(sum(x) OVER (ORDER BY x, c_custkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS cum
  FROM rev
),
mstats AS (
  SELECT (SELECT max(n) FROM r) AS n,
         (SELECT max(total) FROM r) AS total,
         (SELECT CAST(count(*) AS BIGINT) FROM r
          WHERE x * (SELECT max(n) FROM r) < (SELECT max(total) FROM r))
           AS m
),
pts AS (
  SELECT
    (SELECT max(CASE WHEN rn = (SELECT m FROM mstats) THEN x END) FROM r)
      AS xm,
    (SELECT max(CASE WHEN rn = (SELECT m FROM mstats) + 1 THEN x END) FROM r)
      AS xm1,
    (SELECT max(CASE WHEN rn = (SELECT m FROM mstats) THEN cum END) FROM r)
      AS lm
)
SELECT (SELECT n FROM mstats) AS n,
       CAST(round(CAST((SELECT total FROM mstats) AS DOUBLE)
                  / (SELECT n FROM mstats)) AS BIGINT) AS mu_cents,
       CAST(round(1000.0 * (
         ((SELECT m FROM mstats)
          + (CAST((SELECT total FROM mstats) AS DOUBLE) / (SELECT n FROM mstats)
             - (SELECT xm FROM pts))
            / ((SELECT xm1 FROM pts) - (SELECT xm FROM pts)))
         / (SELECT n FROM mstats)
         + ((SELECT lm FROM pts)
            + (CAST((SELECT total FROM mstats) AS DOUBLE)
               / (SELECT n FROM mstats) - (SELECT xm FROM pts))
              / ((SELECT xm1 FROM pts) - (SELECT xm FROM pts))
              * (SELECT xm1 FROM pts))
           / (SELECT total FROM mstats))) AS BIGINT) AS s_lac_milli
""",
)
def agg_lorenz_asymmetry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lorenz asymmetry coefficient (Damgaard & Weiner 2000) of customer
    revenue: S = F(μ) + L(μ) — where the Lorenz curve is steepest
    relative to the mean. S > 1 means inequality is driven by a FEW
    VERY LARGE customers; S < 1 by many tiny ones — the direction
    agg_gini_concentration's single number cannot tell, computed from
    exact order statistics around the mean (m = #below-mean, linear
    interpolation δ between the bracketing order stats).

    Scale shape (r7): rank and running revenue come from Fenwick prefix
    sums over the distinct-revenue histogram (counts + revenue mass)
    plus a value-partitioned tie-block window — within a tie block every
    x is equal, so cum = (revenue mass below) + x·(tie position); no
    global sort anywhere, scalar arithmetic after."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    per = orders.groupBy("o_custkey").agg(
        F.sum(F.round(100 * F.col("o_totalprice")).cast("long"))
        .cast("long")
        .alias("rev")
    )
    rev = cust.join(per, cust["c_custkey"] == per["o_custkey"], "left").select(
        F.coalesce("rev", F.lit(0)).alias("x"), "c_custkey"
    )
    byv = rev.groupBy("x").agg(
        F.count(F.lit(1)).cast("long").alias("c"),
        F.sum("x").cast("long").alias("sx"),
    )
    bel = cumulate(byv, "x", ("c", "sx")).select(
        "x",
        (F.col("cum_c") - F.col("c")).alias("below"),
        (F.col("cum_sx") - F.col("sx")).alias("sx_below"),
    )
    tot = rev.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("total"),
    )
    j = F.row_number().over(Window.partitionBy("x").orderBy("c_custkey"))
    r = (
        rev.join(bel, "x")
        .crossJoin(F.broadcast(tot))
        .select(
            "x",
            (F.col("below") + j).cast("long").alias("rn"),
            "n",
            "total",
            (F.col("sx_below") + F.col("x") * j).cast("long").alias("cum"),
        )
    )
    r.persist()
    stats = r.agg(
        F.max("n").alias("n"),
        F.max("total").alias("total"),
        F.sum(
            F.when(F.col("x") * F.col("n") < F.col("total"), 1).otherwise(0)
        )
        .cast("long")
        .alias("m"),
    ).first()
    n, total, m = int(stats.n), int(stats.total), int(stats.m)
    pts = r.agg(
        F.max(F.when(F.col("rn") == m, F.col("x"))).alias("xm"),
        F.max(F.when(F.col("rn") == m + 1, F.col("x"))).alias("xm1"),
        F.max(F.when(F.col("rn") == m, F.col("cum"))).alias("lm"),
    )
    mu = float(total) / n
    delta = (F.lit(mu) - F.col("xm")) / (F.col("xm1") - F.col("xm"))
    s_lac = (F.lit(float(m)) + delta) / n + (
        F.col("lm") + delta * F.col("xm1")
    ) / total
    return pts.select(
        F.lit(n).cast("long").alias("n"),
        F.round(F.lit(mu)).cast("long").alias("mu_cents"),
        F.round(1000.0 * s_lac).cast("long").alias("s_lac_milli"),
    )


# --------------------------------------------------------------------------
# 3. 4-4-5 fiscal calendar
# --------------------------------------------------------------------------


@query(
    "fn_fiscal_445_calendar",
    oracle="""
WITH d AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(round(100 * o_totalprice) AS BIGINT) AS cents
  FROM orders
),
fy AS (
  SELECT day, cents,
         CASE WHEN extract(month FROM day) >= 2
              THEN extract(year FROM day)
              ELSE extract(year FROM day) - 1 END AS fiscal_year
  FROM d
),
mapped AS (
  SELECT fiscal_year, cents,
         least(day - make_date(CAST(fiscal_year AS INT), 2, 1), 363) // 7
           AS wk
  FROM fy
),
per AS (
  SELECT fiscal_year, cents, wk,
         (wk // 13) * 3
         + CASE WHEN wk % 13 < 4 THEN 1
                WHEN wk % 13 < 8 THEN 2 ELSE 3 END AS period
  FROM mapped
)
SELECT fiscal_year, CAST(period AS BIGINT) AS period,
       CAST(count(DISTINCT wk) AS BIGINT) AS n_weeks,
       CAST(sum(cents) AS BIGINT) AS revenue_cents
FROM per GROUP BY 1, 2
""",
)
def fn_fiscal_445_calendar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4-4-5 fiscal calendar mapping (the retail-standard reporting
    grid): the fiscal year starts Feb 1, weeks are 7-day blocks from
    that anchor (week 53 folds into week 52, the leap-week convention),
    and each quarter splits 4-4-5 weeks into three periods — so every
    period has the SAME number of weekends and period-over-period
    comparisons aren't distorted by month lengths (the whole point of
    4-4-5 vs calendar months). Emits revenue and the week-count
    validation per (fiscal year, period 1..12).

    Scale shape: pure date arithmetic in the scan + one hash agg."""
    d = load(spark, sf_dir, "orders").select(
        F.col("o_orderdate").cast("date").alias("day"),
        F.round(100 * F.col("o_totalprice")).cast("long").alias("cents"),
    )
    fy = d.withColumn(
        "fiscal_year",
        F.when(F.month("day") >= 2, F.year("day")).otherwise(
            F.year("day") - 1
        ),
    )
    wk = F.expr(
        "least(datediff(day, make_date(fiscal_year, 2, 1)), 363) div 7"
    )
    per = fy.withColumn("wk", wk).withColumn(
        "period",
        F.expr(
            "(wk div 13) * 3 + CASE WHEN wk % 13 < 4 THEN 1"
            " WHEN wk % 13 < 8 THEN 2 ELSE 3 END"
        ),
    )
    return per.groupBy("fiscal_year", F.col("period").cast("long").alias("period")).agg(
        F.countDistinct("wk").cast("long").alias("n_weeks"),
        F.sum("cents").cast("long").alias("revenue_cents"),
    )


# --------------------------------------------------------------------------
# 4. DP utility curve
# --------------------------------------------------------------------------


def _dp_oracle() -> str:
    arms = []
    for em in DP_EPS_MILLI:
        key = f"event_type || '{em}'"
        u = f"(({_pt_sql('dpu#', key, 1_000_000)}) + 0.5) / 1000000.0"
        lap = (
            f"-(1000.0 / {em}) * (CASE WHEN {u} < 0.5 THEN -1 ELSE 1 END)"
            f" * ln(1.0 - 2.0 * abs({u} - 0.5))"
        )
        arms.append(f"""
SELECT {em} AS eps_milli, event_type, n,
       n + CAST(round({lap}) AS BIGINT) AS noisy
FROM true_""")
    body = "\nUNION ALL\n".join(arms)
    return f"""
WITH true_ AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n FROM events GROUP BY 1
),
noised AS ({body}),
tot AS (SELECT CAST(sum(n) AS BIGINT) AS t FROM true_)
SELECT eps_milli,
       CAST(sum(abs(noisy - n)) AS BIGINT) AS l1_err,
       CAST(max(abs(noisy - n)) AS BIGINT) AS max_abs_err,
       CAST(round(1000000.0 * sum(abs(noisy - n)) / (SELECT t FROM tot))
            AS BIGINT) AS rel_err_micro
FROM noised GROUP BY eps_milli
"""


@query("privacy_dp_utility_curve", oracle=_dp_oracle())
def privacy_dp_utility_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The privacy-utility tradeoff, measured: per-type counts receive
    Laplace(1/ε) noise at ε ∈ {[e / 1000 for e in DP_EPS_MILLI]} — the
    inverse-CDF transform of an md5-derived uniform (the reproducible
    stand-in for the sampler, per this repo's hash-randomness
    convention) — and the L1 / max / relative count error is reported
    per ε. This is the curve a privacy review actually negotiates over
    (privacy_dp_clipped_mean and dp_count_laplace publish single
    points; the ε-sweep shows the cost of tightening).

    Scale shape: one type hash agg; the ε arms are literal transforms
    of that tiny table."""
    ev = load(spark, sf_dir, "events")
    true_ = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    true_.persist()
    tot = true_.agg(F.sum("n").cast("long").alias("t"))
    arms = None
    for em in DP_EPS_MILLI:
        u = (
            _pt("dpu#", F.concat(F.col("event_type"), F.lit(str(em))))
            % 1_000_000
            + 0.5
        ) / 1_000_000.0
        lap = (
            -(1000.0 / em)
            * F.when(u < 0.5, -1).otherwise(1)
            * F.log(1.0 - 2.0 * F.abs(u - 0.5))
        )
        arm = true_.select(
            F.lit(em).cast("long").alias("eps_milli"),
            "n",
            (F.col("n") + F.round(lap).cast("long")).alias("noisy"),
        )
        arms = arm if arms is None else arms.unionByName(arm)
    return (
        arms.groupBy("eps_milli")
        .agg(
            F.sum(F.abs(F.col("noisy") - F.col("n")))
            .cast("long")
            .alias("l1_err"),
            F.max(F.abs(F.col("noisy") - F.col("n")))
            .cast("long")
            .alias("max_abs_err"),
            F.sum(F.abs(F.col("noisy") - F.col("n"))).alias("sl1"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "eps_milli",
            "l1_err",
            "max_abs_err",
            F.round(1_000_000.0 * F.col("sl1") / F.col("t"))
            .cast("long")
            .alias("rel_err_micro"),
        )
    )


# --------------------------------------------------------------------------
# 5. Word error rate
# --------------------------------------------------------------------------


@query(
    "eval_word_error_rate",
    oracle=f"""
WITH vocab AS (
  SELECT term, row_number() OVER (ORDER BY term) AS vid
  FROM (SELECT DISTINCT unnest({_TOK_SQL}) AS term FROM documents)
),
toks AS (
  SELECT doc_id, generate_subscripts(w, 1) AS pos, unnest(w) AS term,
         len(w) AS n_tok
  FROM (SELECT doc_id, {_TOK_SQL} AS w FROM documents
        WHERE doc_id % {WER_SAMPLE_MOD} = 0)
),
coded AS (
  SELECT t.doc_id, t.pos, t.n_tok, chr(96 + CAST(v.vid AS INT)) AS ch,
         CASE WHEN t.pos * 2 <= t.n_tok THEN 0 ELSE 1 END AS half
  FROM toks t JOIN vocab v ON v.term = t.term
),
strs AS (
  SELECT doc_id, half, string_agg(ch, '' ORDER BY pos) AS s
  FROM coded GROUP BY doc_id, half
),
pairs AS (
  SELECT a.doc_id, length(a.s) AS ref_len,
         levenshtein(a.s, b.s) AS dist
  FROM (SELECT * FROM strs WHERE half = 0) a
  JOIN (SELECT * FROM strs WHERE half = 1) b ON b.doc_id = a.doc_id
)
SELECT doc_id, CAST(ref_len AS BIGINT) AS ref_tokens,
       CAST(dist AS BIGINT) AS edit_ops,
       CAST(round(1000.0 * dist / ref_len) AS BIGINT) AS wer_milli
FROM pairs
""",
)
def eval_word_error_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-level word error rate between each sampled document's
    first and second halves: the vocabulary (tiny in this corpus) maps
    to single characters, so CHARACTER Levenshtein on the coded strings
    IS token-level edit distance — insertions + deletions +
    substitutions over words, the ASR/translation WER metric
    (eval_bleu_ngram measures n-gram precision; WER measures alignment
    cost). Both engines' levenshtein implement the same Wagner-Fischer
    recurrence; the vocabulary coding is an ordered row_number.

    Scale shape: vocabulary is Heaps-bounded and broadcast; coded
    strings build with an ordered string_agg per (doc, half); the DP
    runs per doc pair on ≤doc-length strings."""
    docs = fan_out(load(spark, sf_dir, "documents"))
    vocab = (
        docs.select(F.explode(F.expr(_TOK_SPARK)).alias("term"))
        .distinct()
        .select(
            "term",
            F.row_number().over(Window.orderBy("term")).alias("vid"),
        )
    )
    toks = (
        docs.filter(F.col("doc_id") % WER_SAMPLE_MOD == 0)
        .select(
            "doc_id",
            F.posexplode(F.expr(_TOK_SPARK)).alias("pos0", "term"),
            F.size(F.expr(_TOK_SPARK)).alias("n_tok"),
        )
        .select("doc_id", (F.col("pos0") + 1).alias("pos"), "term", "n_tok")
    )
    coded = toks.join(F.broadcast(vocab), "term").select(
        "doc_id",
        "pos",
        F.chr(96 + F.col("vid").cast("int")).alias("ch"),
        F.when(F.col("pos") * 2 <= F.col("n_tok"), 0).otherwise(1).alias(
            "half"
        ),
    )
    strs = (
        coded.groupBy("doc_id", "half")
        .agg(
            F.concat_ws(
                "", F.array_sort(F.collect_list(F.struct("pos", "ch"))).getField("ch")
            ).alias("s")
        )
    )
    a = strs.filter(F.col("half") == 0).select(
        "doc_id", F.col("s").alias("sa")
    )
    b = strs.filter(F.col("half") == 1).select(
        F.col("doc_id").alias("d2"), F.col("s").alias("sb")
    )
    pairs = a.join(b, F.col("doc_id") == F.col("d2")).select(
        "doc_id",
        F.length("sa").cast("long").alias("ref_tokens"),
        F.levenshtein("sa", "sb").cast("long").alias("edit_ops"),
    )
    return pairs.select(
        "doc_id",
        "ref_tokens",
        "edit_ops",
        F.round(1000.0 * F.col("edit_ops") / F.col("ref_tokens"))
        .cast("long")
        .alias("wer_milli"),
    )


# --------------------------------------------------------------------------
# 6. Cook's distance
# --------------------------------------------------------------------------


@query(
    "stat_cooks_distance",
    oracle=f"""
WITH d AS (
  SELECT c.c_custkey, CAST(round(100 * c.c_acctbal) AS BIGINT) AS x,
         coalesce(o.rev, 0) AS y
  FROM customer c
  LEFT JOIN (SELECT o_custkey, CAST(sum(CAST(round(100 * o_totalprice)
                    AS BIGINT)) AS BIGINT) AS rev
             FROM orders GROUP BY 1) o ON o.o_custkey = c.c_custkey
),
m AS (
  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS sx,
         CAST(sum(CAST(x AS HUGEINT) * x) AS DOUBLE) AS sxx,
         CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(CAST(x AS HUGEINT) * y) AS DOUBLE) AS sxy
  FROM d
),
fit AS (
  SELECT n, sx, sxx, sy,
         (n * sxy - CAST(sx AS DOUBLE) * sy)
           / (n * sxx - CAST(sx AS DOUBLE) * sx) AS b
  FROM m
),
scored AS (
  SELECT d.c_custkey, d.x,
         CAST(round(d.y - ((SELECT (sy - b * sx) / CAST(n AS DOUBLE) FROM fit)
                + (SELECT b FROM fit) * d.x)) AS BIGINT) AS eq,
         1.0 / (SELECT n FROM fit)
         + (d.x - CAST((SELECT sx FROM fit) AS DOUBLE) / (SELECT n FROM fit))
           * (d.x - CAST((SELECT sx FROM fit) AS DOUBLE) / (SELECT n FROM fit))
           / ((SELECT sxx FROM fit)
              - CAST((SELECT sx FROM fit) AS DOUBLE) * (SELECT sx FROM fit)
                / (SELECT n FROM fit)) AS h
  FROM d
),
mse AS (
  SELECT CAST(sum(CAST(eq AS HUGEINT) * eq) AS DOUBLE) / (count(*) - 2) AS s2
  FROM scored
)
SELECT c_custkey,
       CAST(round(1000000 * CAST(eq AS DOUBLE) * eq * h
            / (2 * (SELECT s2 FROM mse) * (1 - h) * (1 - h))) AS BIGINT)
         AS cooks_d_micro
FROM scored
ORDER BY CAST(eq AS DOUBLE) * eq * h / ((1 - h) * (1 - h)) DESC, c_custkey
LIMIT {CD_TOP}
""",
)
def stat_cooks_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cook's distance for the revenue ~ balance regression: per
    customer D = e²·h / (2s²(1−h)²) with leverage
    h = 1/n + (x−x̄)²/Sxx — the influence diagnostic that says WHICH
    rows move the fitted line (high-residual AND high-leverage), the
    row-level complement of stat_breusch_pagan's global check. The top
    {CD_TOP} influential customers are exactly the rows an analyst
    inspects before trusting ml_ols_two_features-style fits. Fitted
    coefficients are identical doubles from exact moments; ranking uses
    the unrounded score with a key tie-break.

    Scale shape: one moment scan, one narrow scoring pass (no second
    shuffle — h and e are row-local given the broadcast fit), one
    1-row MSE, TakeOrdered top-k."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    per = orders.groupBy("o_custkey").agg(
        F.sum(F.round(100 * F.col("o_totalprice")).cast("long"))
        .cast("long")
        .alias("rev")
    )
    d = cust.join(per, cust["c_custkey"] == per["o_custkey"], "left").select(
        "c_custkey",
        F.round(100 * F.col("c_acctbal")).cast("long").alias("x"),
        F.coalesce("rev", F.lit(0)).alias("y"),
    )
    d.persist()
    dec = "decimal(38,0)"
    m = d.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum((F.col("x").cast(dec) * F.col("x"))).cast("double").alias("sxx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum((F.col("x").cast(dec) * F.col("y"))).cast("double").alias("sxy"),
    ).first()
    n, sx, sxx, sy, sxy = (
        int(m.n),
        int(m.sx),
        float(m.sxx),
        int(m.sy),
        float(m.sxy),
    )
    b = (n * sxy - float(sx) * sy) / (n * sxx - float(sx) * sx)
    a = (float(sy) - b * sx) / n
    xbar = float(sx) / n
    sxx_c = sxx - float(sx) * sx / n
    scored = d.select(
        "c_custkey",
        F.round(F.col("y") - (F.lit(a) + F.lit(b) * F.col("x")))
        .cast("long")
        .alias("eq"),
        (
            F.lit(1.0 / n)
            + (F.col("x") - F.lit(xbar)) * (F.col("x") - F.lit(xbar))
            / F.lit(sxx_c)
        ).alias("h"),
    )
    scored.persist()
    s2 = float(
        scored.agg(
            (
                F.sum((F.col("eq").cast("decimal(38,0)") * F.col("eq")))
                .cast("double")
                / (F.count(F.lit(1)) - 2)
            ).alias("s2")
        )
        .first()
        .s2
    )
    key = (
        F.col("eq").cast("double")
        * F.col("eq")
        * F.col("h")
        / ((1 - F.col("h")) * (1 - F.col("h")))
    )
    return (
        scored.orderBy(key.desc(), "c_custkey")
        .limit(CD_TOP)
        .select(
            "c_custkey",
            F.round(
                1_000_000
                * F.col("eq").cast("double")
                * F.col("eq")
                * F.col("h")
                / (2 * F.lit(s2) * (1 - F.col("h")) * (1 - F.col("h")))
            )
            .cast("long")
            .alias("cooks_d_micro"),
        )
    )
