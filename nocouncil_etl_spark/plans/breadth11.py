"""Breadth batch 11: boosting, ANOVA, and generation-eval n-gram overlap.

- ``ml_gbdt_stump_rounds`` — two rounds of L2 gradient boosting with
  histogram decision stumps on the customer-value regression target:
  each round runs the LightGBM-style banded split search (one
  cumulative pass over residual histograms — the ml_best_split_gini
  machinery pointed at variance gain), commits the best stump with
  shrinkage, and re-residualizes. The TRAINING LOOP of a distributed
  GBDT, not just one split: state crossing the driver per round is one
  stump (threshold + two leaf values).
- ``stat_anova_f_oneway`` — one-way ANOVA F over event-type groups:
  between/within sums of squares from exact integer moments, the
  k-group generalization of agg_ttest_welch's two-sample test.
- ``eval_rouge_ngram`` — ROUGE-1/ROUGE-2 clipped n-gram overlap of a
  deterministic extractive candidate (the document's first half)
  against its reference text, with precision/recall/F1 in exact
  integer millionths. The summarization-eval counterpart of the
  retrieval metrics (nDCG/P@k): in production the candidate column is
  the model seam's output (model_summarize); the operator under test
  is the clipped-count machinery, which is exact either way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nocouncil_etl_spark.io import load
from nocouncil_etl_spark.operators.texteval import rouge_scores
from nocouncil_etl_spark.plans.dedup_plans import _sql_shingles
from nocouncil_etl_spark.registry import query

GB_BAND = 100_000  # split candidates every 1000 currency units (cents·100)
GB_ROUNDS = 2
GB_NU_NUM, GB_NU_DEN = 5, 10  # shrinkage 0.5 as an integer ratio

ANOVA_SCALE = 1_000_000

ROUGE_SCALE = 1_000_000


def _tdiv(x: int, d: int) -> int:
    """Truncate-toward-zero integer division (DuckDB ``//`` semantics)."""
    return abs(x) // d if x >= 0 else -(abs(x) // d)


# --------------------------------------------------------------------------
# 1. Gradient-boosted stumps, two rounds
# --------------------------------------------------------------------------


def _gbdt_oracle() -> str:
    base = f"""
WITH y0 AS (
  SELECT c.c_custkey, CAST(round(c.c_acctbal * 100) AS BIGINT) AS x,
         coalesce((SELECT CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   FROM orders o WHERE o.o_custkey = c.c_custkey), 0) // 100 AS y
  FROM customer c
),
f0 AS (SELECT CAST(sum(y) AS BIGINT) // CAST(count(*) AS BIGINT) AS m FROM y0),
r1 AS MATERIALIZED (
  SELECT c_custkey, x, y, y - (SELECT m FROM f0) AS r FROM y0
)"""
    stumps = []
    prev = "r1"
    for rd in range(1, GB_ROUNDS + 1):
        stumps.append(f""",
bands{rd} AS (
  SELECT CAST(floor(CAST(x AS DOUBLE) / {GB_BAND}) AS BIGINT) AS band,
         CAST(count(*) AS BIGINT) AS n, CAST(sum(r) AS BIGINT) AS s
  FROM {prev} GROUP BY 1
),
cum{rd} AS (
  SELECT band,
         CAST(sum(n) OVER (ORDER BY band) AS BIGINT) AS nl,
         CAST(sum(s) OVER (ORDER BY band) AS BIGINT) AS sl
  FROM bands{rd}
),
tot{rd} AS (
  SELECT CAST(sum(n) AS BIGINT) AS n, CAST(sum(s) AS BIGINT) AS s FROM bands{rd}
),
best{rd} AS MATERIALIZED (
  SELECT * FROM (
    SELECT (c.band + 1) * {GB_BAND} - 1 AS thr,
           c.nl, c.sl, t.n - c.nl AS nr, t.s - c.sl AS sr,
           round((CAST(c.sl AS DOUBLE) * c.sl) / c.nl
                 + (CAST(t.s - c.sl AS DOUBLE) * (t.s - c.sl)) / (t.n - c.nl), 6)
             AS gain
    FROM cum{rd} c CROSS JOIN tot{rd} t
    WHERE c.nl < t.n
  ) ORDER BY gain DESC, thr LIMIT 1
),
leaf{rd} AS MATERIALIZED (
  SELECT thr, nl, nr, gain,
         ((sl // nl) * {GB_NU_NUM}) // {GB_NU_DEN} AS vl,
         ((sr // nr) * {GB_NU_NUM}) // {GB_NU_DEN} AS vr
  FROM best{rd}
),
r{rd + 1} AS MATERIALIZED (
  SELECT p.c_custkey, p.x, p.y,
         p.r - CASE WHEN p.x <= (SELECT thr FROM leaf{rd})
                    THEN (SELECT vl FROM leaf{rd})
                    ELSE (SELECT vr FROM leaf{rd}) END AS r
  FROM {prev} p
),
mae{rd} AS (
  SELECT CAST(sum(abs(r)) AS BIGINT) // CAST(count(*) AS BIGINT) AS mae
  FROM r{rd + 1}
)""")
        prev = f"r{rd + 1}"
    selects = " UNION ALL ".join(
        f"""SELECT CAST({rd} AS BIGINT) AS round,
       CAST(thr AS BIGINT) AS threshold_cents,
       CAST(nl AS BIGINT) AS n_left, CAST(nr AS BIGINT) AS n_right,
       CAST(vl AS BIGINT) AS value_left, CAST(vr AS BIGINT) AS value_right,
       gain, (SELECT CAST(mae AS BIGINT) FROM mae{rd}) AS mae_after
FROM leaf{rd}"""
        for rd in range(1, GB_ROUNDS + 1)
    )
    return base + "".join(stumps) + "\n" + selects


@query("ml_gbdt_stump_rounds", oracle=_gbdt_oracle())
def ml_gbdt_stump_rounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{GB_ROUNDS} rounds of L2 gradient boosting with histogram stumps:
    target y = per-customer lifetime order value in exact currency units,
    feature x = account balance in cents. Per round: band the residuals
    at {GB_BAND}-cent boundaries, score every candidate threshold's
    variance gain sl²/nl + sr²/nr from ONE cumulative pass, commit the
    argmax stump with shrinkage {GB_NU_NUM}/{GB_NU_DEN} (leaf value =
    truncated residual mean), re-residualize, report the post-round MAE.
    All counts/sums/leaves are exact integers; the gain is an identical
    double rounded 6dp on both engines.

    Scale shape: each round is one residual histogram (map-side-combined,
    ≤|range|/{GB_BAND} groups), one window over the band table, and ONE
    collected stump row — driver state per round is a single (threshold,
    leaf, leaf) triple, never the residual vector. That is precisely the
    histogram-based GBDT training loop (LightGBM-style) at cluster scale;
    the residual update is a narrow column expression, so the re-scan
    pipelines with the next round's histogram."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    per = o.groupBy(F.col("o_custkey").alias("c_custkey")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("cents")
    )
    y0 = c.join(per, "c_custkey", "left").select(
        "c_custkey",
        F.round(F.col("c_acctbal") * 100).cast("long").alias("x"),
        F.expr("coalesce(cents, 0L) div 100").cast("long").alias("y"),
    )
    y0 = y0.persist()
    tot = y0.agg(
        F.sum("y").cast("long").alias("s"), F.count("*").cast("long").alias("n")
    ).collect()[0]
    f0 = _tdiv(tot.s, tot.n)  # one scalar: the global mean base score
    cur = y0.withColumn("r", (F.col("y") - F.lit(f0)).cast("long"))

    rows = []
    prev_cache = y0
    for rd in range(1, GB_ROUNDS + 1):
        cur = cur.persist()
        cur.count()
        prev_cache.unpersist()
        prev_cache = cur
        bands = cur.groupBy(
            F.floor(F.col("x").cast("double") / GB_BAND).cast("long").alias("band")
        ).agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("r").cast("long").alias("s"),
        )
        w = Window.orderBy("band")
        cum = bands.select(
            "band",
            F.sum("n").over(w).cast("long").alias("nl"),
            F.sum("s").over(w).cast("long").alias("sl"),
        )
        t = bands.agg(
            F.sum("n").cast("long").alias("tn"), F.sum("s").cast("long").alias("ts")
        )
        cand = (
            cum.crossJoin(F.broadcast(t))
            .filter(F.col("nl") < F.col("tn"))
            .select(
                ((F.col("band") + 1) * GB_BAND - 1).alias("thr"),
                "nl",
                "sl",
                (F.col("tn") - F.col("nl")).cast("long").alias("nr"),
                (F.col("ts") - F.col("sl")).cast("long").alias("sr"),
                F.round(
                    (F.col("sl").cast("double") * F.col("sl")) / F.col("nl")
                    + (
                        (F.col("ts") - F.col("sl")).cast("double")
                        * (F.col("ts") - F.col("sl"))
                    )
                    / (F.col("tn") - F.col("nl")),
                    6,
                ).alias("gain"),
            )
        )
        best = cand.orderBy(F.desc("gain"), F.asc("thr")).limit(1).collect()[0]
        vl = _tdiv(_tdiv(best.sl, best.nl) * GB_NU_NUM, GB_NU_DEN)
        vr = _tdiv(_tdiv(best.sr, best.nr) * GB_NU_NUM, GB_NU_DEN)
        cur = cur.withColumn(
            "r",
            (
                F.col("r")
                - F.when(F.col("x") <= best.thr, F.lit(vl)).otherwise(F.lit(vr))
            ).cast("long"),
        )
        mae_row = cur.agg(
            F.sum(F.abs("r")).cast("long").alias("sa"),
            F.count("*").cast("long").alias("n"),
        ).collect()[0]
        rows.append(
            (
                rd,
                int(best.thr),
                int(best.nl),
                int(best.nr),
                vl,
                vr,
                float(best.gain),
                _tdiv(mae_row.sa, mae_row.n),
            )
        )
    prev_cache.unpersist()
    return spark.createDataFrame(
        rows,
        "round BIGINT, threshold_cents BIGINT, n_left BIGINT, n_right BIGINT, "
        "value_left BIGINT, value_right BIGINT, gain DOUBLE, mae_after BIGINT",
    )


# --------------------------------------------------------------------------
# 2. One-way ANOVA
# --------------------------------------------------------------------------


@query(
    "stat_anova_f_oneway",
    oracle=f"""
WITH g AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS s,
         CAST(sum(CAST(round(value * 100) AS BIGINT)
                  * CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS ss
  FROM events GROUP BY event_type
),
tot AS (
  SELECT CAST(count(*) AS BIGINT) AS k, CAST(sum(n) AS BIGINT) AS n,
         CAST(sum(s) AS BIGINT) AS s, CAST(sum(ss) AS BIGINT) AS ss
  FROM g
),
parts AS (
  SELECT t.k, t.n,
         round(sum((CAST(g.s AS DOUBLE) * g.s) / g.n)
               - (CAST(t.s AS DOUBLE) * t.s) / t.n, 6) AS ssb,
         round(t.ss - sum((CAST(g.s AS DOUBLE) * g.s) / g.n), 6) AS ssw
  FROM g CROSS JOIN tot t
  GROUP BY t.k, t.n, t.s, t.ss
)
SELECT k, n, ssb, ssw,
       round((ssb / (k - 1)) / (ssw / (n - k)), 6) AS f_value,
       round(ssb / (ssb + ssw), 6) AS eta_sq
FROM parts
""",
)
def stat_anova_f_oneway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA across event types on spend cents: F = (SSB/(k−1)) /
    (SSW/(n−k)) with both sums of squares assembled from exact integer
    per-group moments (n, Σx, Σx²) — the k-group generalization of the
    Welch t (agg_ttest_welch), sharing its no-CDF discipline: the F value
    itself is the checked output, threshold lookups stay downstream.

    Scale shape: one map-side-combined moment aggregation per group, then
    arithmetic over the k-row frame — the canonical moments-only test."""
    ev = load(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    g = ev.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n"),
        F.sum(cents).cast("long").alias("s"),
        F.sum(cents * cents).cast("long").alias("ss"),
    )
    tot = g.agg(
        F.count("*").cast("long").alias("k"),
        F.sum("n").cast("long").alias("tn"),
        F.sum("s").cast("long").alias("ts"),
        F.sum("ss").cast("long").alias("tss"),
    )
    parts = (
        g.crossJoin(F.broadcast(tot))
        .groupBy("k", "tn", "ts", "tss")
        .agg(
            F.round(
                F.sum((F.col("s").cast("double") * F.col("s")) / F.col("n"))
                - (F.col("ts").cast("double") * F.col("ts")) / F.col("tn"),
                6,
            ).alias("ssb"),
            F.round(
                F.col("tss")
                - F.sum((F.col("s").cast("double") * F.col("s")) / F.col("n")),
                6,
            ).alias("ssw"),
        )
    )
    return parts.select(
        F.col("k"),
        F.col("tn").alias("n"),
        "ssb",
        "ssw",
        F.round(
            (F.col("ssb") / (F.col("k") - 1)) / (F.col("ssw") / (F.col("tn") - F.col("k"))),
            6,
        ).alias("f_value"),
        F.round(F.col("ssb") / (F.col("ssb") + F.col("ssw")), 6).alias("eta_sq"),
    )


# --------------------------------------------------------------------------
# 3. ROUGE-N clipped overlap
# --------------------------------------------------------------------------


def _rouge_side_sql(n: int) -> str:
    """Per-doc gram multiset counts for reference and candidate at gram
    size ``n`` (candidate = first half of the tokens)."""
    return f"""
toks{n} AS (
  SELECT doc_id, string_split(text, ' ') AS wr,
         string_split(text, ' ')[1:greatest(len(string_split(text, ' ')) // 2, 1)] AS wc
  FROM documents
),
grams{n} AS (
  SELECT doc_id, {_sql_shingles('wr', n)} AS gr, {_sql_shingles('wc', n)} AS gc
  FROM toks{n}
),
ref{n} AS (
  SELECT doc_id, gram, CAST(count(*) AS BIGINT) AS cr
  FROM (SELECT doc_id, unnest(gr) AS gram FROM grams{n}) GROUP BY doc_id, gram
),
cand{n} AS (
  SELECT doc_id, gram, CAST(count(*) AS BIGINT) AS cc
  FROM (SELECT doc_id, unnest(gc) AS gram FROM grams{n}) GROUP BY doc_id, gram
),
ov{n} AS (
  SELECT r.doc_id, CAST(sum(least(r.cr, c.cc)) AS BIGINT) AS ov
  FROM ref{n} r JOIN cand{n} c ON r.doc_id = c.doc_id AND r.gram = c.gram
  GROUP BY r.doc_id
),
tot{n} AS (
  SELECT doc_id, CAST(len(gr) AS BIGINT) AS nref, CAST(len(gc) AS BIGINT) AS ncand
  FROM grams{n}
),
m{n} AS (
  SELECT t.doc_id, coalesce(o.ov, 0) AS ov, t.nref, t.ncand
  FROM tot{n} t LEFT JOIN ov{n} o ON t.doc_id = o.doc_id
  WHERE t.nref > 0 AND t.ncand > 0
)"""


@query(
    "eval_rouge_ngram",
    oracle=f"""
WITH {_rouge_side_sql(1)},
{_rouge_side_sql(2).lstrip()}
SELECT a.doc_id,
       a.ov AS r1_overlap,
       CAST((a.ov * {ROUGE_SCALE}) // a.ncand AS BIGINT) AS r1_p_1e6,
       CAST((a.ov * {ROUGE_SCALE}) // a.nref AS BIGINT) AS r1_r_1e6,
       CAST((2 * a.ov * {ROUGE_SCALE}) // (a.ncand + a.nref) AS BIGINT) AS r1_f1_1e6,
       CAST(coalesce(b.ov, 0) AS BIGINT) AS r2_overlap,
       CAST(coalesce((b.ov * {ROUGE_SCALE}) // b.ncand, 0) AS BIGINT) AS r2_p_1e6,
       CAST(coalesce((b.ov * {ROUGE_SCALE}) // b.nref, 0) AS BIGINT) AS r2_r_1e6,
       CAST(coalesce((2 * b.ov * {ROUGE_SCALE}) // (b.ncand + b.nref), 0) AS BIGINT)
         AS r2_f1_1e6
FROM m1 a LEFT JOIN m2 b ON a.doc_id = b.doc_id
""",
)
def eval_rouge_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROUGE-1 and ROUGE-2 of a deterministic extractive candidate (the
    first half of each document's whitespace tokens) against the full
    text: clipped gram-multiset overlap Σ min(count_cand, count_ref),
    precision/recall/F1 in exact integer millionths (F1 = 2·ov/(|c|+|r|)
    — exact, no float division anywhere). Swap the candidate column for
    the model seam's summaries (model_summarize) and this is the
    summarization eval table.

    Scale shape: gram counting is explode → map-side-combined count per
    (doc, gram); the clip join is keyed on (doc, gram) — one shuffle,
    linear in gram instances, the contamination_ngrams shape pointed at
    evaluation."""
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.col("text").alias("ref_text"),
        F.array_join(
            F.expr(
                "slice(split(text, ' '), 1, greatest(CAST(size(split(text, ' ')) / 2 AS INT), 1))"
            ),
            " ",
        ).alias("cand_text"),
    )
    return rouge_scores(toks, "doc_id", "ref_text", "cand_text", scale=ROUGE_SCALE)
