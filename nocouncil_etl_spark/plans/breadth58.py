"""Breadth batch 38 (round 6): shift-share decomposition, Kneser-Ney
bigram LM, PPS systematic sampling, binary-segmentation changepoints,
Platt calibration by Newton steps, Cronbach's alpha.

Six operators (reference scope: regional-growth accounting, the standard
LM smoothing beyond add-k, unequal-probability survey sampling, the
multi-changepoint extension of CUSUM, classifier probability calibration
with a parametric head, and multi-item reliability measurement):

- ``agg_shift_share``         — national / industry-mix / competitive
  decomposition of each nation's revenue growth between halves.
- ``text_kneser_ney_bigram``  — interpolated Kneser-Ney bigram LM
  (D = 0.75) self-scored per document, with high-NLL flags.
- ``sample_pps_systematic``   — systematic probability-proportional-to-
  size draw over documents with Horvitz-Thompson weights.
- ``ts_binary_segmentation``  — two-level binary segmentation of the
  daily event count (CUSUM argmax, then per-half recursion).
- ``ml_platt_newton``         — Platt sigmoid calibration fit by two
  closed-form 2x2 Newton steps on quantized moment sums.
- ``stat_cronbach_alpha``     — Cronbach's alpha over the user x
  event-type count matrix from exact integer moments.

Reference parity: north-star extension — no reference analogue
(the reference has no analytics layer); these are the model-selection/audit layers a
lake-scale engine runs on the same tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nocouncil_etl_spark.io import fan_out, load
from nocouncil_etl_spark.operators.quantiles import cumulate
from nocouncil_etl_spark.registry import query

SS_SPLIT_YEAR = 1998  # period 1 = years < split, period 2 = years >= split
KN_D_MILLI = 750  # Kneser-Ney absolute discount D = 0.75
KN_FLAG_MICRO = 4_200_000  # flag docs with avg bigram NLL > 4.2 nats
PPS_M = 25  # number of systematic selection points
BSEG_SCALE = 1000
PLATT_QP = 10_000  # moment quantization grid (1e-4)


# --------------------------------------------------------------------------
# 1. Shift-share growth decomposition
# --------------------------------------------------------------------------


@query(
    "agg_shift_share",
    oracle=f"""
WITH cell AS (
  SELECT n.n_name AS nation, o.o_orderpriority AS ind,
         sum(CASE WHEN extract(year FROM o.o_orderdate) < {SS_SPLIT_YEAR}
                  THEN CAST(round(100 * o.o_totalprice) AS BIGINT) ELSE 0 END)
           AS r1,
         sum(CASE WHEN extract(year FROM o.o_orderdate) >= {SS_SPLIT_YEAR}
                  THEN CAST(round(100 * o.o_totalprice) AS BIGINT) ELSE 0 END)
           AS r2
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  GROUP BY 1, 2
),
tot AS (SELECT sum(r1) AS t1, sum(r2) AS t2 FROM cell),
ind AS (SELECT ind, sum(r1) AS i1, sum(r2) AS i2 FROM cell GROUP BY ind),
terms AS (
  SELECT c.nation,
         c.r2 - c.r1 AS actual,
         CAST(round(c.r1 * (CAST((SELECT t2 FROM tot) AS DOUBLE)
                            / (SELECT t1 FROM tot) - 1.0)) AS BIGINT)
           AS nat_term,
         CAST(round(c.r1 * (CAST(i.i2 AS DOUBLE) / i.i1
                            - CAST((SELECT t2 FROM tot) AS DOUBLE)
                              / (SELECT t1 FROM tot))) AS BIGINT) AS mix_term
  FROM cell c JOIN ind i ON i.ind = c.ind
)
SELECT nation,
       CAST(sum(actual) AS BIGINT) AS actual_growth_cents,
       CAST(sum(nat_term) AS BIGINT) AS national_cents,
       CAST(sum(mix_term) AS BIGINT) AS industry_mix_cents,
       CAST(sum(actual) - sum(nat_term) - sum(mix_term) AS BIGINT)
         AS competitive_cents
FROM terms GROUP BY nation
""",
)
def agg_shift_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shift-share analysis of each nation's revenue growth between the
    pre-{SS_SPLIT_YEAR} and post periods, industry = order priority:
    actual growth decomposes into the national component (what growing
    at the all-nations rate would give), the industry-mix component
    (the nation's priority portfolio growing at per-industry national
    rates), and the competitive residual (local out/under-performance;
    closes the identity exactly). Per-cell terms round to integer cents
    BEFORE the per-nation sum, so the decomposition is exact integer
    arithmetic — no order-dependent double accumulation.

    Scale shape: one fact-scan hash agg to the nation x industry cell
    table; national and industry rates are 1-row / |industries|-row
    broadcasts; everything downstream is cell-table sized."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    cents = F.round(100 * F.col("o_totalprice")).cast("long")
    is1 = F.year("o_orderdate") < SS_SPLIT_YEAR
    cell = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy(
            F.col("n_name").alias("nation"),
            F.col("o_orderpriority").alias("ind"),
        )
        .agg(
            F.sum(F.when(is1, cents).otherwise(F.lit(0))).alias("r1"),
            F.sum(F.when(~is1, cents).otherwise(F.lit(0))).alias("r2"),
        )
    )
    tot = cell.agg(F.sum("r1").alias("t1"), F.sum("r2").alias("t2"))
    ind = cell.groupBy("ind").agg(
        F.sum("r1").alias("i1"), F.sum("r2").alias("i2")
    )
    g_nat = F.col("t2").cast("double") / F.col("t1") - 1.0
    g_gap = (
        F.col("i2").cast("double") / F.col("i1")
        - F.col("t2").cast("double") / F.col("t1")
    )
    terms = (
        cell.join(F.broadcast(ind), "ind")
        .crossJoin(F.broadcast(tot))
        .select(
            "nation",
            (F.col("r2") - F.col("r1")).alias("actual"),
            F.round(F.col("r1") * g_nat).cast("long").alias("nat_term"),
            F.round(F.col("r1") * g_gap).cast("long").alias("mix_term"),
        )
    )
    return terms.groupBy("nation").agg(
        F.sum("actual").cast("long").alias("actual_growth_cents"),
        F.sum("nat_term").cast("long").alias("national_cents"),
        F.sum("mix_term").cast("long").alias("industry_mix_cents"),
        (F.sum("actual") - F.sum("nat_term") - F.sum("mix_term"))
        .cast("long")
        .alias("competitive_cents"),
    )


# --------------------------------------------------------------------------
# 2. Kneser-Ney bigram LM
# --------------------------------------------------------------------------


@query(
    "text_kneser_ney_bigram",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, generate_subscripts(w, 1) AS pos, unnest(w) AS term
  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
),
bg AS (
  SELECT a.doc_id, a.term AS w1, b.term AS w2
  FROM toks a JOIN toks b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
),
c12 AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS n12 FROM bg GROUP BY 1, 2),
c1 AS (
  SELECT w1, CAST(sum(n12) AS BIGINT) AS n1,
         CAST(count(*) AS BIGINT) AS fanout
  FROM c12 GROUP BY w1
),
cont AS (SELECT w2, CAST(count(*) AS BIGINT) AS nleft FROM c12 GROUP BY w2),
types AS (SELECT CAST(count(*) AS BIGINT) AS nt FROM c12),
scored AS (
  SELECT bg.doc_id,
         CAST(round(1000000 * -ln(
           (greatest(c12.n12 - {KN_D_MILLI / 1000.0}, 0.0)
            + {KN_D_MILLI / 1000.0} * c1.fanout * cont.nleft
              / CAST((SELECT nt FROM types) AS DOUBLE))
           / c1.n1)) AS BIGINT) AS nll_micro
  FROM bg
  JOIN c12 ON c12.w1 = bg.w1 AND c12.w2 = bg.w2
  JOIN c1 ON c1.w1 = bg.w1
  JOIN cont ON cont.w2 = bg.w2
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
       CAST(round(CAST(sum(nll_micro) AS DOUBLE) / count(*)) AS BIGINT)
         AS avg_nll_micro,
       CASE WHEN round(CAST(sum(nll_micro) AS DOUBLE) / count(*))
                 > {KN_FLAG_MICRO} THEN 1 ELSE 0 END AS flagged
FROM scored GROUP BY doc_id
""",
)
def text_kneser_ney_bigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser-Ney bigram language model (absolute discount
    D = {KN_D_MILLI / 1000}) self-scored over the corpus: P(w2|w1) =
    max(c12 − D, 0)/c1 + D·fanout(w1)/c1 · P_cont(w2), where the
    continuation probability P_cont counts DISTINCT left contexts —
    the smoothing that fixed add-k's overestimate of frequent unigrams
    in novel contexts (Kneser & Ney 1995). Per-bigram NLL quantizes to
    micro-nats before the per-doc mean, so the doc score is exact; docs
    with mean NLL above {KN_FLAG_MICRO / 1e6} nats are flagged (the
    perplexity-filter curation gate, KN edition — the add-k sibling is
    model_bigram_lm_ppl).

    Scale shape: the model is three hash aggs (bigram, left-context,
    continuation counts) over one tokenization pass; scoring re-joins
    the bigram stream against model tables keyed by w1/w2 — all
    equi-joins, vocabulary-sized model side."""
    docs = fan_out(load(spark, sf_dir, "documents"))
    toks = docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "term")
    )
    nxt = toks.select(
        F.col("doc_id").alias("d2"),
        (F.col("pos") - 1).alias("p2"),
        F.col("term").alias("w2"),
    )
    bg = toks.join(
        nxt,
        (F.col("doc_id") == F.col("d2")) & (F.col("pos") == F.col("p2")),
    ).select("doc_id", F.col("term").alias("w1"), "w2")
    c12 = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).cast("long").alias("n12"))
    c1 = c12.groupBy("w1").agg(
        F.sum("n12").cast("long").alias("n1"),
        F.count(F.lit(1)).cast("long").alias("fanout"),
    )
    cont = c12.groupBy("w2").agg(F.count(F.lit(1)).cast("long").alias("nleft"))
    types = c12.agg(F.count(F.lit(1)).cast("long").alias("nt"))
    d = KN_D_MILLI / 1000.0
    p = (
        F.greatest(F.col("n12") - d, F.lit(0.0))
        + d * F.col("fanout") * F.col("nleft") / F.col("nt").cast("double")
    ) / F.col("n1")
    scored = (
        bg.join(c12, ["w1", "w2"])
        .join(c1, "w1")
        .join(cont, "w2")
        .crossJoin(F.broadcast(types))
        .select(
            "doc_id",
            F.round(1_000_000 * -F.log(p)).cast("long").alias("nll_micro"),
        )
    )
    avg = F.round(F.sum("nll_micro").cast("double") / F.count(F.lit(1)))
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_bigrams"),
        avg.cast("long").alias("avg_nll_micro"),
        F.when(avg > KN_FLAG_MICRO, 1).otherwise(0).alias("flagged"),
    )


# --------------------------------------------------------------------------
# 3. PPS systematic sampling
# --------------------------------------------------------------------------


@query(
    "sample_pps_systematic",
    oracle=f"""
WITH d AS (
  SELECT doc_id, CAST(n_chars AS BIGINT) AS size,
         sum(CAST(n_chars AS BIGINT)) OVER (ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM documents
),
meta AS (
  SELECT max(cum) AS total, max(cum) // {PPS_M} AS step,
         (max(cum) // {PPS_M}) // 2 AS off
  FROM d
),
hits AS (
  SELECT doc_id, size,
         least({PPS_M}, (greatest(cum - (SELECT off FROM meta), 0)
                         + (SELECT step FROM meta) - 1)
                        // (SELECT step FROM meta))
         - least({PPS_M}, (greatest(cum - size - (SELECT off FROM meta), 0)
                           + (SELECT step FROM meta) - 1)
                          // (SELECT step FROM meta)) AS n_hits
  FROM d
)
SELECT doc_id, size, CAST(n_hits AS BIGINT) AS n_hits,
       CAST(round(1000000.0 * (SELECT total FROM meta)
                  / ({PPS_M} * size)) AS BIGINT) AS ht_weight_micro
FROM hits WHERE n_hits > 0
""",
)
def sample_pps_systematic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Systematic probability-proportional-to-size sampling of documents
    by character count: docs are laid end-to-end on the cumulative-size
    line (doc_id order — the deterministic frame), {PPS_M} equally
    spaced selection points (step = total/{PPS_M}, offset = step/2) pick
    the doc whose interval they land in. Inclusion probability is
    proportional to size (big docs can be hit multiple times — n_hits
    reports multiplicity), and the Horvitz-Thompson weight total/(m·size)
    makes size-weighted totals unbiased. The survey-sampling twin of
    sample_systematic (equal-probability) and sample_weighted_priority
    (Poisson PPS without fixed m).

    Scale shape (r7): the running size total comes from Fenwick prefix
    sums over doc_id (operators/quantiles.cumulate — no window, no
    global sort), one 1-row broadcast of (total, step), then a narrow
    filter."""
    d = fan_out(load(spark, sf_dir, "documents")).select(
        "doc_id", F.col("n_chars").cast("long").alias("size")
    )
    d = cumulate(d, "doc_id", ("size",)).withColumnRenamed("cum_size", "cum")
    meta = d.agg(
        F.max("cum").alias("total"),
        F.floor(F.max("cum") / PPS_M).cast("long").alias("step"),
        F.floor(F.floor(F.max("cum") / PPS_M) / 2).cast("long").alias("off"),
    )

    def pts_below(x):
        g = F.greatest(x - F.col("off"), F.lit(0))
        return F.least(
            F.lit(PPS_M), F.floor((g + F.col("step") - 1) / F.col("step"))
        )

    hits = d.crossJoin(F.broadcast(meta)).select(
        "doc_id",
        "size",
        (pts_below(F.col("cum")) - pts_below(F.col("cum") - F.col("size")))
        .cast("long")
        .alias("n_hits"),
        F.round(1_000_000.0 * F.col("total") / (PPS_M * F.col("size")))
        .cast("long")
        .alias("ht_weight_micro"),
    )
    return hits.filter(F.col("n_hits") > 0)


# --------------------------------------------------------------------------
# 4. Binary segmentation (two-level CUSUM tree)
# --------------------------------------------------------------------------


def _bseg_level_sql(src: str, out: str) -> str:
    """CTE pair: argmax-|CUSUM| day of table ``src``(day, c) → ``{out}``
    (1 row: pd, n_days, mean_milli)."""
    return f"""
{out}_m AS (
  SELECT CAST(count(*) AS BIGINT) AS d, CAST(sum(c) AS BIGINT) AS t FROM {src}
),
{out}_c AS (
  SELECT day,
         sum((SELECT d FROM {out}_m) * c - (SELECT t FROM {out}_m))
           OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
                 AND CURRENT ROW) AS cusum
  FROM {src}
),
{out} AS (
  SELECT min(day) AS pd,
         (SELECT d FROM {out}_m) AS n_days,
         CAST(round({BSEG_SCALE} * CAST((SELECT t FROM {out}_m) AS DOUBLE)
                    / (SELECT d FROM {out}_m)) AS BIGINT) AS mean_milli
  FROM {out}_c
  WHERE abs(cusum) = (SELECT max(abs(cusum)) FROM {out}_c)
)"""


@query(
    "ts_binary_segmentation",
    oracle=f"""
WITH cnt AS (
  SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1
),{_bseg_level_sql("cnt", "l0")},
lhs AS (SELECT * FROM cnt WHERE day <= (SELECT pd FROM l0)),
rhs AS (SELECT * FROM cnt WHERE day > (SELECT pd FROM l0)),{
    _bseg_level_sql("lhs", "l1")},{_bseg_level_sql("rhs", "l2")}
SELECT 0 AS level, 'all' AS segment, CAST(pd AS VARCHAR) AS change_day,
       n_days, mean_milli FROM l0
UNION ALL
SELECT 1, 'left', CAST(pd AS VARCHAR), n_days, mean_milli FROM l1
UNION ALL
SELECT 1, 'right', CAST(pd AS VARCHAR), n_days, mean_milli FROM l2
""",
)
def ts_binary_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level binary segmentation of the daily event count: the root
    changepoint is the first day attaining max |CUSUM| (exact integer
    D·c − total form, as in ts_cusum_changepoint), then each half is
    recursively split by its own local CUSUM — the classic greedy
    multi-changepoint estimator (Scott & Knott 1974). Emits the tree:
    (level, segment, change day, segment length, segment mean in
    {BSEG_SCALE}ths).

    Scale shape: the series is calendar-sized after one hash agg; each
    node is one window + 1-row argmax broadcast over that tiny frame —
    the recursion depth is fixed, so lineage is bounded."""
    cnt = (
        load(spark, sf_dir, "events")
        .groupBy(F.col("ts").cast("date").alias("day"))
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )

    def split(src: DataFrame) -> DataFrame:
        m = src.agg(
            F.count(F.lit(1)).cast("long").alias("d"),
            F.sum("c").cast("long").alias("t"),
        )
        w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
        cus = src.crossJoin(F.broadcast(m)).withColumn(
            "cusum", F.sum(F.col("d") * F.col("c") - F.col("t")).over(w)
        )
        mx = cus.agg(F.max(F.abs("cusum")).alias("m"))
        return (
            cus.crossJoin(F.broadcast(mx))
            .filter(F.abs("cusum") == F.col("m"))
            .agg(
                F.min("day").alias("pd"),
                F.max("d").alias("n_days"),
                F.round(
                    BSEG_SCALE * F.max("t").cast("double") / F.max("d")
                )
                .cast("long")
                .alias("mean_milli"),
            )
        )

    l0 = split(cnt)
    pd0 = l0.select(F.col("pd").alias("pd0"))
    lhs = cnt.crossJoin(F.broadcast(pd0)).filter(F.col("day") <= F.col("pd0"))
    rhs = cnt.crossJoin(F.broadcast(pd0)).filter(F.col("day") > F.col("pd0"))
    l1, l2 = split(lhs.drop("pd0")), split(rhs.drop("pd0"))

    def tag(df: DataFrame, level: int, seg: str) -> DataFrame:
        return df.select(
            F.lit(level).cast("int").alias("level"),
            F.lit(seg).alias("segment"),
            F.col("pd").cast("string").alias("change_day"),
            "n_days",
            "mean_milli",
        )

    return tag(l0, 0, "all").unionByName(tag(l1, 1, "left")).unionByName(
        tag(l2, 1, "right")
    )


# --------------------------------------------------------------------------
# 5. Platt calibration by Newton steps
# --------------------------------------------------------------------------


def _platt_step_sql(k: int, a: str, b: str) -> str:
    """CTE chain for one Newton step from scalar SQL (a, b) → mom{k}
    (quantized moment sums) and ab{k} (1 row: a, b doubles)."""
    qp = PLATT_QP
    return f"""
p{k} AS (
  SELECT y, s, 1.0 / (1.0 + exp(-(({a}) * s + ({b})))) AS p FROM d
),
mom{k} AS (
  SELECT sum(CAST(round({qp} * (p - y) * s) AS BIGINT)) AS ga,
         sum(CAST(round({qp} * (p - y)) AS BIGINT)) AS gb,
         sum(CAST(round({qp} * p * (1 - p) * s * s) AS BIGINT)) AS haa,
         sum(CAST(round({qp} * p * (1 - p) * s) AS BIGINT)) AS hab,
         sum(CAST(round({qp} * p * (1 - p)) AS BIGINT)) AS hbb
  FROM p{k}
),
ab{k} AS (
  SELECT ({a}) - (CAST(hbb AS DOUBLE) * ga - CAST(hab AS DOUBLE) * gb)
           / (CAST(haa AS DOUBLE) * hbb - CAST(hab AS DOUBLE) * hab) AS a,
         ({b}) - (CAST(haa AS DOUBLE) * gb - CAST(hab AS DOUBLE) * ga)
           / (CAST(haa AS DOUBLE) * hbb - CAST(hab AS DOUBLE) * hab) AS b
  FROM mom{k}
)"""


def _platt_nll_sql(a: str, b: str) -> str:
    return f"""
  SELECT CAST(round(CAST(sum(CAST(round(1000000 * (
           CASE WHEN y = 1 THEN ln(1.0 + exp(-(({a}) * s + ({b}))))
                ELSE ln(1.0 + exp(({a}) * s + ({b}))) END)) AS BIGINT))
         AS DOUBLE) / count(*)) AS BIGINT) AS nll FROM d"""


def _platt_oracle() -> str:
    a1, b1 = "(SELECT a FROM ab1)", "(SELECT b FROM ab1)"
    a2, b2 = "(SELECT a FROM ab2)", "(SELECT b FROM ab2)"
    return f"""
WITH d AS (
  SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y,
         CAST(round(100 * value) AS BIGINT) / 100.0 AS s
  FROM events WHERE value IS NOT NULL
),{_platt_step_sql(1, "0.0", "0.0")},{_platt_step_sql(2, a1, b1)},
n1 AS ({_platt_nll_sql(a1, b1)}),
n2 AS ({_platt_nll_sql(a2, b2)})
SELECT 1 AS step, CAST(round(1000000 * {a1}) AS BIGINT) AS a_micro,
       CAST(round(1000000 * {b1}) AS BIGINT) AS b_micro,
       (SELECT nll FROM n1) AS avg_nll_micro
UNION ALL
SELECT 2, CAST(round(1000000 * {a2}) AS BIGINT),
       CAST(round(1000000 * {b2}) AS BIGINT), (SELECT nll FROM n2)
"""


@query("ml_platt_newton", oracle=_platt_oracle())
def ml_platt_newton(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Platt scaling (Platt 1999) of the raw event value as a purchase
    score: fit P(y=1|s) = sigmoid(a·s + b) by TWO closed-form Newton
    steps — gradient (Σ(p−y)s, Σ(p−y)) and 2x2 Hessian of p(1−p)
    moments, each per-row contribution quantized to the 1e-4 grid so
    the moment sums are exact integers and the solved (a, b) doubles
    are identical on both engines. Reports (a, b) and the mean NLL
    after each step. The parametric sibling of ml_isotonic_calibration
    (monotone nonparametric) — two interpretable parameters, no
    pooling pass.

    Scale shape: each step is ONE map-side-combined 5-moment aggregate
    over the fact scan (the distributed-Newton pattern: driver state is
    five integers); the NLL report is one more narrow aggregate."""
    d = (
        load(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
            (F.round(100 * F.col("value")).cast("long") / 100.0).alias("s"),
        )
    )
    qp = PLATT_QP

    def step(rows: DataFrame, a, b) -> DataFrame:
        """One Newton update from margin a·s+b; returns 1-row (a, b)."""
        p = 1.0 / (1.0 + F.exp(-(a * F.col("s") + b)))
        w = p * (1.0 - p)
        mom = rows.agg(
            F.sum(F.round(qp * (p - F.col("y")) * F.col("s")).cast("long")).alias("ga"),
            F.sum(F.round(qp * (p - F.col("y"))).cast("long")).alias("gb"),
            F.sum(F.round(qp * w * F.col("s") * F.col("s")).cast("long")).alias("haa"),
            F.sum(F.round(qp * w * F.col("s")).cast("long")).alias("hab"),
            F.sum(F.round(qp * w).cast("long")).alias("hbb"),
            F.max(a + F.lit(0.0)).alias("a0"),  # carry (a, b) past the agg
            F.max(b + F.lit(0.0)).alias("b0"),
        )
        det = (
            F.col("haa").cast("double") * F.col("hbb")
            - F.col("hab").cast("double") * F.col("hab")
        )
        return mom.select(
            (
                F.col("a0")
                - (F.col("hbb").cast("double") * F.col("ga")
                   - F.col("hab").cast("double") * F.col("gb"))
                / det
            ).alias("a"),
            (
                F.col("b0")
                - (F.col("haa").cast("double") * F.col("gb")
                   - F.col("hab").cast("double") * F.col("ga"))
                / det
            ).alias("b"),
        )

    def nll(rows: DataFrame, a, b) -> DataFrame:
        z = a * F.col("s") + b
        ll = F.when(F.col("y") == 1, F.log(1.0 + F.exp(-z))).otherwise(
            F.log(1.0 + F.exp(z))
        )
        return rows.agg(
            F.round(
                F.sum(F.round(1_000_000 * ll).cast("long")).cast("double")
                / F.count(F.lit(1))
            )
            .cast("long")
            .alias("nll")
        )

    ab1 = step(d, F.lit(0.0), F.lit(0.0))
    d1 = d.crossJoin(F.broadcast(ab1.select(F.col("a").alias("a1"), F.col("b").alias("b1"))))
    ab2 = step(d1, F.col("a1"), F.col("b1")).select(
        F.col("a").alias("a2"), F.col("b").alias("b2")
    )
    n1 = nll(d1, F.col("a1"), F.col("b1"))
    d2 = d1.crossJoin(F.broadcast(ab2))
    n2 = nll(d2, F.col("a2"), F.col("b2"))
    r1 = (
        ab1.crossJoin(F.broadcast(n1))
        .select(
            F.lit(1).cast("int").alias("step"),
            F.round(1_000_000 * F.col("a")).cast("long").alias("a_micro"),
            F.round(1_000_000 * F.col("b")).cast("long").alias("b_micro"),
            F.col("nll").alias("avg_nll_micro"),
        )
    )
    r2 = (
        ab2.crossJoin(F.broadcast(n2))
        .select(
            F.lit(2).cast("int").alias("step"),
            F.round(1_000_000 * F.col("a2")).cast("long").alias("a_micro"),
            F.round(1_000_000 * F.col("b2")).cast("long").alias("b_micro"),
            F.col("nll").alias("avg_nll_micro"),
        )
    )
    return r1.unionByName(r2)


# --------------------------------------------------------------------------
# 6. Cronbach's alpha
# --------------------------------------------------------------------------


@query(
    "stat_cronbach_alpha",
    oracle="""
WITH x AS (
  SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
),
nu AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n FROM events),
k AS (SELECT CAST(count(DISTINCT event_type) AS BIGINT) AS k FROM events),
item AS (
  SELECT event_type, sum(c) AS s, sum(c * c) AS ss FROM x GROUP BY event_type
),
itemvar AS (
  SELECT sum((SELECT n FROM nu) * ss - s * s) AS num FROM item
),
tot AS (
  SELECT user_id, sum(c) AS t FROM x GROUP BY user_id
),
totvar AS (
  SELECT (SELECT n FROM nu) * sum(t * t) - sum(t) * sum(t) AS den FROM tot
)
SELECT (SELECT n FROM nu) AS n_users,
       (SELECT k FROM k) AS k_items,
       CAST(round(1000000.0 * (SELECT k FROM k) / ((SELECT k FROM k) - 1)
                  * (1.0 - CAST((SELECT num FROM itemvar) AS DOUBLE)
                           / (SELECT den FROM totvar))) AS BIGINT)
         AS alpha_micro
""",
)
def stat_cronbach_alpha(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cronbach's alpha internal-consistency reliability of the user x
    event-type count matrix: items = event types, subjects = users,
    alpha = k/(k−1)·(1 − Σvar_items/var_total). Both variance sums use
    the exact integer moment form n·Σx² − (Σx)² over the SAME user count
    n (absent cells are exact zeros — they contribute nothing to either
    moment, so the sparse (user, type, count) table never needs
    densifying), making alpha one ratio of BIGINTs. The measurement-
    theory cousin of stat_fleiss_kappa (agreement) and
    eval_krippendorff_alpha.

    Scale shape: one hash agg to the sparse count matrix, then two
    aggregate-sized rollups (per-item moments, per-user totals) — no
    pivot, no densification, single-row output."""
    ev = load(spark, sf_dir, "events")
    x = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    nu = ev.agg(F.countDistinct("user_id").cast("long").alias("n"))
    kk = ev.agg(F.countDistinct("event_type").cast("long").alias("k"))
    item = x.groupBy("event_type").agg(
        F.sum("c").alias("s"), F.sum(F.col("c") * F.col("c")).alias("ss")
    )
    num = (
        item.crossJoin(F.broadcast(nu))
        .agg(F.sum(F.col("n") * F.col("ss") - F.col("s") * F.col("s")).alias("num"))
    )
    tot = x.groupBy("user_id").agg(F.sum("c").alias("t"))
    den = (
        tot.crossJoin(F.broadcast(nu))
        .agg(
            (
                F.max("n") * F.sum(F.col("t") * F.col("t"))
                - F.sum("t") * F.sum("t")
            ).alias("den")
        )
    )
    return (
        nu.crossJoin(F.broadcast(kk))
        .crossJoin(F.broadcast(num))
        .crossJoin(F.broadcast(den))
        .select(
            F.col("n").alias("n_users"),
            F.col("k").alias("k_items"),
            F.round(
                1_000_000.0
                * F.col("k")
                / (F.col("k") - 1)
                * (1.0 - F.col("num").cast("double") / F.col("den"))
            )
            .cast("long")
            .alias("alpha_micro"),
        )
    )
