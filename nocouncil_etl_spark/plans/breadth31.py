"""Breadth batch 31 (round 6): peak detection, Levene variance test, MRR,
delta-method ratio SE, pinball loss, source MinHash similarity.

Six operators (reference scope: spike triage on the fetch-rate series,
retrieval ranking quality, ratio-metric experiment readouts, quantile
forecast scoring, and cheap cross-source similarity screening):

- ``ts_peak_detection``    — strict local maxima over a +/-2-day window
  per event-type daily series.
- ``stat_levene_mean``     — Levene's homogeneity-of-variance test
  (mean-centered form): one-way ANOVA F over |x − mean_g|.
- ``eval_mrr``             — mean reciprocal rank over term queries with
  tf-ranked results and count-thresholded relevance labels (all integer).
- ``eval_delta_method_ratio`` — per-arm ratio metric (purchase cents per
  event) with the delta-method standard error.
- ``eval_pinball_loss``    — quantile-forecast evaluation: nearest-rank
  train quantiles scored on the test split with integer pinball loss.
- ``text_source_minhash_sim`` — bottom-k (KMV) MinHash Jaccard estimate
  between source vocabularies (sketch-only, the scale path).
- ``text_source_minhash_sim_exact`` — the sketch side-by-side with the
  exact vocabulary Jaccard (accuracy anchor, audit scale only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nocouncil_etl_spark.io import fan_out, load
from nocouncil_etl_spark.plans.breadth15 import _pt, _pt_sql
from nocouncil_etl_spark.registry import query

# --------------------------------------------------------------------------
# 1. Local-maxima peak detection
# --------------------------------------------------------------------------

PEAK_W = 2


@query(
    "ts_peak_detection",
    oracle=f"""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS d,
         CAST(sum(CAST(round(value) AS BIGINT)) AS BIGINT) AS x
  FROM events GROUP BY 1, 2
),
w AS (
  SELECT event_type, d, x,
         CAST(row_number() OVER win AS BIGINT) AS rn,
         CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n,
         CAST(max(x) OVER (win ROWS BETWEEN {PEAK_W} PRECEDING
                           AND 1 PRECEDING) AS BIGINT) AS lmax,
         CAST(max(x) OVER (win ROWS BETWEEN 1 FOLLOWING
                           AND {PEAK_W} FOLLOWING) AS BIGINT) AS rmax
  FROM daily
  WINDOW win AS (PARTITION BY event_type ORDER BY d)
)
SELECT event_type, d, x, lmax, rmax
FROM w
WHERE rn > {PEAK_W} AND rn <= n - {PEAK_W} AND x > lmax AND x > rmax
""",
)
def ts_peak_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict local maxima of each event-type's daily-total series: a day
    is a peak when its value exceeds every value in the ±{PEAK_W}-day
    neighborhood (strict on both sides, so plateaus never double-count),
    and the full neighborhood must exist (series edges excluded). Emits
    the peak with its neighborhood maxima — the spike-triage feed an
    on-call dashboard pages on. All integer.

    Scale shape: daily collapse map-side; the neighborhood maxima are
    bounded ROWS-window aggregates inside the per-key sort — no global
    window, no self-join. Reference parity: spike days in ingest.py's
    per-feed fetch counts."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy("event_type", F.to_date("ts").alias("d")).agg(
        F.sum(F.round("value").cast("long")).cast("long").alias("x")
    )
    win = Window.partitionBy("event_type").orderBy("d")
    w = daily.select(
        "event_type",
        "d",
        "x",
        F.row_number().over(win).cast("long").alias("rn"),
        F.count("*").over(Window.partitionBy("event_type")).cast("long").alias("n"),
        F.max("x").over(win.rowsBetween(-PEAK_W, -1)).cast("long").alias("lmax"),
        F.max("x").over(win.rowsBetween(1, PEAK_W)).cast("long").alias("rmax"),
    )
    return w.filter(
        (F.col("rn") > PEAK_W)
        & (F.col("rn") <= F.col("n") - PEAK_W)
        & (F.col("x") > F.col("lmax"))
        & (F.col("x") > F.col("rmax"))
    ).select("event_type", "d", "x", "lmax", "rmax")


# --------------------------------------------------------------------------
# 2. Levene's test (mean-centered)
# --------------------------------------------------------------------------


@query(
    "stat_levene_mean",
    oracle="""
WITH cents AS (
  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS v FROM events
),
mean_g AS (
  SELECT event_type, CAST(sum(v) AS BIGINT) // count(*) AS m
  FROM cents GROUP BY 1
),
z AS (
  SELECT c.event_type, abs(c.v - m.m) AS z
  FROM cents c JOIN mean_g m ON c.event_type = m.event_type
),
grp AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n_g,
         CAST(sum(z) AS BIGINT) AS sz,
         CAST(sum(z * z) AS BIGINT) AS szz,
         CAST(round(CAST(sum(z) AS DOUBLE) * sum(z) / count(*)) AS BIGINT)
           AS sz2n
  FROM z GROUP BY 1
),
acc AS (
  SELECT CAST(count(*) AS BIGINT) AS k, CAST(sum(n_g) AS BIGINT) AS n,
         CAST(sum(sz) AS BIGINT) AS sz_all,
         CAST(sum(szz) AS BIGINT) AS szz_all,
         CAST(sum(sz2n) AS BIGINT) AS b_raw
  FROM grp
)
SELECT n, k,
       round((CAST(b_raw AS DOUBLE)
              - CAST(sz_all AS DOUBLE) * sz_all / n) / (k - 1)
             / ((CAST(szz_all AS DOUBLE) - b_raw) / (n - k)), 6) AS f_stat
FROM acc
""",
)
def stat_levene_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Levene's homogeneity-of-variance test across event types (the
    classic mean-centered 1960 form): transform each observation to its
    absolute deviation from the group's EXACT integer mean, then run a
    one-way ANOVA F on the deviations — F large means the value spread
    itself differs by group (the assumption-check before stat_anova_f /
    t-tests). Group moments of z are exact BIGINTs; the per-group
    Sz²/n_g terms round to integer units before the cross-group sum
    (the stat_kruskal_wallis order-free-sum discipline), and only the
    final F assembly is floating.

    Scale shape: two hash-aggs (group means, then deviation moments) and
    a k-row reduce — raw rows cross the shuffle once, as (type, value)."""
    ev = load(spark, sf_dir, "events")
    cents = ev.select(
        "event_type", F.round(F.col("value") * 100).cast("long").alias("v")
    )
    mean_g = cents.groupBy("event_type").agg(
        F.expr("CAST(sum(v) AS BIGINT) div count(*)").alias("m")
    )
    z = cents.join(mean_g, "event_type").select(
        "event_type", F.abs(F.col("v") - F.col("m")).alias("z")
    )
    grp = z.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_g"),
        F.sum("z").cast("long").alias("sz"),
        F.sum(F.col("z") * F.col("z")).cast("long").alias("szz"),
        F.round(
            F.sum("z").cast("double") * F.sum("z") / F.count("*")
        )
        .cast("long")
        .alias("sz2n"),
    )
    acc = grp.agg(
        F.count("*").cast("long").alias("k"),
        F.sum("n_g").cast("long").alias("n"),
        F.sum("sz").cast("long").alias("sz_all"),
        F.sum("szz").cast("long").alias("szz_all"),
        F.sum("sz2n").cast("long").alias("b_raw"),
    )
    ssb = (
        F.col("b_raw").cast("double")
        - F.col("sz_all").cast("double") * F.col("sz_all") / F.col("n")
    )
    ssw = F.col("szz_all").cast("double") - F.col("b_raw")
    return acc.select(
        "n",
        "k",
        F.round(
            (ssb / (F.col("k") - 1)) / (ssw / (F.col("n") - F.col("k"))), 6
        ).alias("f_stat"),
    )


# --------------------------------------------------------------------------
# 3. Mean reciprocal rank
# --------------------------------------------------------------------------

MRR_TERMS = ("spark", "query", "window", "stream", "vector")
MRR_REL_MIN_TF = 3


@query(
    "eval_mrr",
    oracle=f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
tf AS (
  SELECT term, doc_id, CAST(count(*) AS BIGINT) AS tf
  FROM tok
  WHERE term IN {MRR_TERMS}
  GROUP BY 1, 2
),
ranked AS (
  SELECT term, doc_id, tf,
         CAST(row_number() OVER (PARTITION BY term
                                 ORDER BY tf DESC, doc_id) AS BIGINT) AS rk
  FROM tf
),
firstrel AS (
  SELECT term, min(rk) AS first_rank
  FROM ranked WHERE tf >= {MRR_REL_MIN_TF}
  GROUP BY term
)
SELECT term, CAST(first_rank AS BIGINT) AS first_rank,
       CAST(1000000 // first_rank AS BIGINT) AS rr_1e6
FROM firstrel
""",
)
def eval_mrr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal rank per term query: results are ranked by raw term
    frequency (desc, doc_id tie-break — an exact integer ranking, unlike
    the float BM25 in eval_ndcg_at_k), relevance labels are
    count-thresholded (tf ≥ {MRR_REL_MIN_TF}), and the metric is the
    rank of the FIRST relevant result, reported as integer micro-units
    1e6 div rank. The corpus-level MRR is the mean of rr over queries —
    left per-query here so individual ranking regressions stay visible.

    Scale shape: one filtered hash-agg to the (term, doc) tf table, one
    per-term window over the term's own posting list, a k-row reduce.
    The posting-list window is vocabulary-term-bounded, not corpus-
    bounded. Reference parity: vectorize.py's retrieval QA loop."""
    docs = fan_out(load(spark, sf_dir, "documents"))
    tok = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    ).filter(F.col("term").isin(*MRR_TERMS))
    tf = tok.groupBy("term", "doc_id").agg(F.count("*").cast("long").alias("tf"))
    ranked = tf.select(
        "term",
        "doc_id",
        "tf",
        F.row_number()
        .over(Window.partitionBy("term").orderBy(F.desc("tf"), "doc_id"))
        .cast("long")
        .alias("rk"),
    )
    return (
        ranked.filter(F.col("tf") >= MRR_REL_MIN_TF)
        .groupBy("term")
        .agg(F.min("rk").cast("long").alias("first_rank"))
        .select(
            "term",
            "first_rank",
            F.expr("1000000 div first_rank").cast("long").alias("rr_1e6"),
        )
    )


# --------------------------------------------------------------------------
# 4. Delta-method SE for a ratio metric
# --------------------------------------------------------------------------


@query(
    "eval_delta_method_ratio",
    oracle=f"""
WITH per_user AS (
  SELECT user_id,
         CAST(sum(CASE WHEN event_type = 'purchase'
                       THEN CAST(round(value * 100) AS BIGINT)
                       ELSE 0 END) AS BIGINT) AS x,
         CAST(count(*) AS BIGINT) AS y
  FROM events GROUP BY user_id
),
armed AS (
  SELECT CASE WHEN {_pt_sql('srm#', 'user_id', 1000)} % 2 = 0
              THEN 0 ELSE 1 END AS arm,
         x, y
  FROM per_user
),
mom AS (
  SELECT arm, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * x) AS BIGINT) AS sxx,
         CAST(sum(x * y) AS BIGINT) AS sxy,
         CAST(sum(y * y) AS BIGINT) AS syy
  FROM armed GROUP BY arm
)
SELECT arm, n, sx, sy,
       round(CAST(sx AS DOUBLE) / sy, 6) AS ratio,
       round(sqrt((CAST(sxx AS DOUBLE)
                   - 2 * (CAST(sx AS DOUBLE) / sy) * sxy
                   + (CAST(sx AS DOUBLE) / sy) * (CAST(sx AS DOUBLE) / sy)
                     * syy)
                  / (n - 1) / n)
             / (CAST(sy AS DOUBLE) / n), 6) AS se
FROM mom
""",
)
def eval_delta_method_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-arm ratio metric (purchase cents per event) with the
    delta-method standard error — the correct way to read a ratio whose
    numerator and denominator are BOTH per-user random (naively treating
    the ratio as a mean understates variance). Users are the i.i.d.
    units; with R = Sx/Sy the residuals d_i = x_i − R·y_i have mean
    exactly 0, so Sigma d² = Sxx − 2R·Sxy + R²·Syy needs no mean
    correction and SE = sqrt(Sigma d²/(n−1)/n) / ybar. Per-user moments
    are exact BIGINTs; the SE assembly is one fixed IEEE expression
    mirrored across engines. Arm assignment reuses the stat_srm_check
    md5 hash.

    Scale shape: per-user collapse map-side, then a 2-row moment table —
    the experiment readout costs one scan regardless of event volume."""
    ev = load(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.sum(
            F.when(
                F.col("event_type") == "purchase",
                F.round(F.col("value") * 100).cast("long"),
            ).otherwise(0)
        )
        .cast("long")
        .alias("x"),
        F.count("*").cast("long").alias("y"),
    )
    armed = per_user.select(
        F.when((_pt("srm#", F.col("user_id")) % 1000) % 2 == 0, 0)
        .otherwise(1)
        .alias("arm"),
        "x",
        "y",
    )
    mom = armed.groupBy("arm").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
    )
    r = F.col("sx").cast("double") / F.col("sy")
    d2 = (
        F.col("sxx").cast("double")
        - 2 * r * F.col("sxy")
        + r * r * F.col("syy")
    )
    return mom.select(
        "arm",
        "n",
        "sx",
        "sy",
        F.round(r, 6).alias("ratio"),
        F.round(
            F.sqrt(d2 / (F.col("n") - 1) / F.col("n"))
            / (F.col("sy").cast("double") / F.col("n")),
            6,
        ).alias("se"),
    )


# --------------------------------------------------------------------------
# 5. Pinball loss for quantile forecasts
# --------------------------------------------------------------------------

PINBALL_TRAIN_DAYS = 20
PINBALL_QS = (1, 5, 9)  # tenths


@query(
    "eval_pinball_loss",
    oracle=f"""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS d,
         CAST(sum(CAST(round(value) AS BIGINT)) AS BIGINT) AS x
  FROM events GROUP BY 1, 2
),
d0 AS (SELECT min(d) AS start FROM daily),
train AS (
  SELECT event_type, x FROM daily, d0
  WHERE d < start + {PINBALL_TRAIN_DAYS}
),
trn AS (
  SELECT event_type, x,
         CAST(row_number() OVER (PARTITION BY event_type ORDER BY x, event_type)
              AS BIGINT) AS rn,
         CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
  FROM train
),
qs AS (SELECT unnest([{', '.join(str(q) for q in PINBALL_QS)}]) AS q),
fc AS (
  SELECT t.event_type, qs.q, t.x AS f
  FROM trn t JOIN qs ON t.rn = (qs.q * t.n + 9) // 10
),
test AS (
  SELECT event_type, x FROM daily, d0
  WHERE d >= start + {PINBALL_TRAIN_DAYS}
)
SELECT f.event_type, CAST(f.q AS BIGINT) AS q, f.f,
       CAST(count(*) AS BIGINT) AS n_test,
       CAST(sum(CASE WHEN t.x >= f.f THEN f.q * (t.x - f.f)
                     ELSE (10 - f.q) * (f.f - t.x) END) AS BIGINT)
         AS loss_tenths
FROM fc f JOIN test t ON f.event_type = t.event_type
GROUP BY 1, 2, 3
""",
)
def eval_pinball_loss(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile-forecast evaluation with the pinball (quantile) loss: the
    first {PINBALL_TRAIN_DAYS} days of each event-type's daily series
    train nearest-rank quantile forecasts at q in {{0.1, 0.5, 0.9}}
    (order statistic at ceil(q·n), exact — no interpolation), and the
    remaining days score them with 10x the pinball loss so everything
    stays integer: q·(y−f) on underforecast days, (10−q)·(f−y) on
    overforecast days. The loss that makes quantile forecasts honest —
    minimized in expectation exactly at the true quantile.

    Scale shape: daily collapse map-side; the rank window runs per type
    on the date-bounded train slice; scoring is an equi-join of the
    3-row-per-type forecast table against the test slice."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy("event_type", F.to_date("ts").alias("d")).agg(
        F.sum(F.round("value").cast("long")).cast("long").alias("x")
    )
    d0 = daily.agg(F.min("d").alias("start"))
    daily2 = daily.crossJoin(F.broadcast(d0))
    train = daily2.filter(
        F.col("d") < F.date_add(F.col("start"), PINBALL_TRAIN_DAYS)
    ).select("event_type", "x")
    trn = train.select(
        "event_type",
        "x",
        F.row_number()
        .over(Window.partitionBy("event_type").orderBy("x", "event_type"))
        .cast("long")
        .alias("rn"),
        F.count("*")
        .over(Window.partitionBy("event_type"))
        .cast("long")
        .alias("n"),
    )
    qs = spark.createDataFrame([(q,) for q in PINBALL_QS], "q BIGINT")
    fc = trn.crossJoin(F.broadcast(qs)).filter(
        F.col("rn") == F.expr("(q * n + 9) div 10")
    ).select("event_type", "q", F.col("x").alias("f"))
    test = daily2.filter(
        F.col("d") >= F.date_add(F.col("start"), PINBALL_TRAIN_DAYS)
    ).select("event_type", "x")
    loss = F.when(
        F.col("x") >= F.col("f"), F.col("q") * (F.col("x") - F.col("f"))
    ).otherwise((10 - F.col("q")) * (F.col("f") - F.col("x")))
    return (
        fc.join(test, "event_type")
        .groupBy("event_type", "q", "f")
        .agg(
            F.count("*").cast("long").alias("n_test"),
            F.sum(loss).cast("long").alias("loss_tenths"),
        )
    )


# --------------------------------------------------------------------------
# 6. Source-level MinHash (bottom-k) similarity
# --------------------------------------------------------------------------

KMV_K = 64


# Shared CTE prefix: tokenize → per-source bottom-k sketch → pooled
# pairwise Broder estimate. The sketch-only query appends nothing; the
# _exact anchor appends the vocabulary² exact-Jaccard comparison.
_MINHASH_SKETCH_CTES = f"""
WITH ws AS (SELECT source, string_split(text, ' ') AS w FROM documents),
tok AS (
  SELECT DISTINCT source,
         unnest(CASE WHEN len(w) >= 2
                     THEN list_transform(range(1, len(w)),
                                         i -> array_to_string(w[i:i+1], ' '))
                     ELSE [] END) AS term
  FROM ws
),
hashed AS (
  SELECT source, term,
         {_pt_sql('kmv#', 'term', 1_000_000_007)} AS h
  FROM tok
),
mins AS (
  SELECT source, h FROM (
    SELECT source, h,
           row_number() OVER (PARTITION BY source ORDER BY h, term) AS rn
    FROM hashed
  ) WHERE rn <= {KMV_K}
),
srcs AS (SELECT DISTINCT source FROM tok),
pairs AS (
  SELECT a.source AS s1, b.source AS s2
  FROM srcs a JOIN srcs b ON a.source < b.source
),
pooled AS (
  SELECT p.s1, p.s2, m.h,
         max(CASE WHEN m.source = p.s1 THEN 1 ELSE 0 END) AS in1,
         max(CASE WHEN m.source = p.s2 THEN 1 ELSE 0 END) AS in2
  FROM pairs p JOIN mins m ON m.source IN (p.s1, p.s2)
  GROUP BY 1, 2, 3
),
bottom AS (
  SELECT s1, s2, in1, in2,
         row_number() OVER (PARTITION BY s1, s2 ORDER BY h) AS rn
  FROM pooled
),
est AS (
  SELECT s1, s2,
         CAST(sum(CASE WHEN rn <= {KMV_K} AND in1 = 1 AND in2 = 1
                       THEN 1 ELSE 0 END) AS BIGINT) AS est_num,
         CAST(sum(CASE WHEN rn <= {KMV_K} THEN 1 ELSE 0 END) AS BIGINT)
           AS denom
  FROM bottom GROUP BY 1, 2
)"""


def _minhash_sketch_est(spark: SparkSession, sf_dir: str):
    """(tok, est) building blocks shared by the sketch query and the
    exact anchor: distinct source bigrams, and the pooled bottom-k
    Broder estimate per source pair."""
    docs = fan_out(load(spark, sf_dir, "documents"))
    w = F.split("text", " ")
    bigrams = F.when(
        F.size(w) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(w) - 1),
            lambda i: F.concat_ws(" ", F.slice(w, i, 2)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    tok = docs.select("source", F.explode(bigrams).alias("term")).distinct()
    hashed = tok.select(
        "source", "term", (_pt("kmv#", F.col("term")) % 1_000_000_007).alias("h")
    )
    mins = (
        hashed.select(
            "source",
            "h",
            F.row_number()
            .over(Window.partitionBy("source").orderBy("h", "term"))
            .alias("rn"),
        )
        .filter(F.col("rn") <= KMV_K)
        .select("source", "h")
    )
    srcs = tok.select("source").distinct()
    pairs = (
        srcs.select(F.col("source").alias("s1"))
        .join(srcs.select(F.col("source").alias("s2")))
        .filter(F.col("s1") < F.col("s2"))
    )
    pooled = (
        pairs.join(
            mins, (F.col("source") == F.col("s1")) | (F.col("source") == F.col("s2"))
        )
        .groupBy("s1", "s2", "h")
        .agg(
            F.max(F.when(F.col("source") == F.col("s1"), 1).otherwise(0)).alias(
                "in1"
            ),
            F.max(F.when(F.col("source") == F.col("s2"), 1).otherwise(0)).alias(
                "in2"
            ),
        )
    )
    bottom = pooled.select(
        "s1",
        "s2",
        "in1",
        "in2",
        F.row_number().over(Window.partitionBy("s1", "s2").orderBy("h")).alias("rn"),
    )
    est = bottom.groupBy("s1", "s2").agg(
        F.sum(
            F.when(
                (F.col("rn") <= KMV_K) & (F.col("in1") == 1) & (F.col("in2") == 1),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("est_num"),
        F.sum(F.when(F.col("rn") <= KMV_K, 1).otherwise(0))
        .cast("long")
        .alias("denom"),
    )
    return tok, est


@query(
    "text_source_minhash_sim",
    oracle=_MINHASH_SKETCH_CTES
    + f"""
SELECT s1, s2, est_num, denom,
       CAST(est_num * 1000000 // denom AS BIGINT) AS jac_est_1e6
FROM est
""",
)
def text_source_minhash_sim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bottom-k (one-permutation / KMV) MinHash similarity between source
    VOCABULARIES: each source keeps only its {KMV_K} smallest md5 token
    hashes, and for every source pair the Jaccard estimate is the share
    of the pooled bottom-{KMV_K} hashes present in both sketches — the
    classic Broder estimator. All integer (hash ranks and ppm ratios).

    Scale shape: THE point of the sketch — per-source state is {KMV_K}
    hashes regardless of vocabulary size, sketches merge by min, and the
    pair comparison touches 2·{KMV_K} rows per pair instead of the
    vocabularies. This registered query is sketch-ONLY (the 100 TB path);
    the vocabulary² exact-Jaccard comparison lives in the separate
    text_source_minhash_sim_exact anchor, excluded from scale claims
    (round-6 verdict: the hot query must not execute its own oracle
    anchor). Same family as sketch_kmv_distinct (cardinality) but
    estimating SIMILARITY (Broder resemblance)."""
    _, est = _minhash_sketch_est(spark, sf_dir)
    return est.select(
        "s1",
        "s2",
        "est_num",
        "denom",
        F.expr("est_num * 1000000 div denom").cast("long").alias("jac_est_1e6"),
    )


@query(
    "text_source_minhash_sim_exact",
    oracle=_MINHASH_SKETCH_CTES
    + f""",
sizes AS (SELECT source, CAST(count(*) AS BIGINT) AS v FROM tok GROUP BY 1),
inter AS (
  SELECT a.source AS s1, b.source AS s2, CAST(count(*) AS BIGINT) AS inter
  FROM tok a JOIN tok b ON a.term = b.term AND a.source < b.source
  GROUP BY 1, 2
),
exact AS (
  SELECT i.s1, i.s2, i.inter, x.v + y.v - i.inter AS uni
  FROM inter i
  JOIN sizes x ON i.s1 = x.source
  JOIN sizes y ON i.s2 = y.source
)
SELECT e.s1, e.s2, e.est_num, e.denom,
       CAST(e.est_num * 1000000 // e.denom AS BIGINT) AS jac_est_1e6,
       CAST(x.inter * 1000000 // x.uni AS BIGINT) AS jac_exact_1e6
FROM est e JOIN exact x ON e.s1 = x.s1 AND e.s2 = x.s2
""",
)
def text_source_minhash_sim_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT-anchor twin of text_source_minhash_sim: the sketch estimate
    laid side-by-side with the exact vocabulary Jaccard so the sketch
    error is visible in the result itself — the estimator's accuracy
    proof, NOT the serving path. The exact intersection is a term-keyed
    vocabulary self-join (vocabulary² in the worst case); deliberately
    excluded from 100 TB scale claims — run it at test/audit scale to
    validate the sketch, ship the sketch."""
    tok, est = _minhash_sketch_est(spark, sf_dir)
    # exact Jaccard via inclusion-exclusion on per-source vocab sizes
    t1 = tok.select(F.col("source").alias("s1"), "term")
    t2 = tok.select(F.col("source").alias("s2"), "term")
    sizes = tok.groupBy("source").agg(F.count("*").cast("long").alias("v"))
    inter = (
        t1.join(t2, "term")
        .filter(F.col("s1") < F.col("s2"))
        .groupBy("s1", "s2")
        .agg(F.count("*").cast("long").alias("inter"))
    )
    exact = (
        inter.join(sizes.withColumnRenamed("source", "s1").withColumnRenamed("v", "v1"), "s1")
        .join(sizes.withColumnRenamed("source", "s2").withColumnRenamed("v", "v2"), "s2")
        .select(
            "s1",
            "s2",
            "inter",
            (F.col("v1") + F.col("v2") - F.col("inter")).alias("uni"),
        )
    )
    return est.join(exact, ["s1", "s2"]).select(
        "s1",
        "s2",
        "est_num",
        "denom",
        F.expr("est_num * 1000000 div denom").cast("long").alias("jac_est_1e6"),
        F.expr("inter * 1000000 div uni").cast("long").alias("jac_exact_1e6"),
    )
