"""Breadth batch 40 (round 6): COW-vs-MOR write amplification, WoE/IV
binning, Burrows' Delta stylometry, seasonal Mann-Kendall, stochastic
oscillator, Allen interval relations.

Six operators (reference scope: the lakehouse update-strategy trade
audit, the credit-scoring feature screen, corpus authorship attribution,
seasonality-robust trend testing, another bounded momentum indicator,
and temporal-logic classification of interval pairs):

- ``io_cow_vs_mor_cost``         — copy-on-write vs merge-on-read
  write/read amplification for the same update set.
- ``ml_woe_information_value``   — weight-of-evidence bins + information
  value of account balance against the high-value label.
- ``text_burrows_delta``         — Burrows' Delta distance between
  sources over the top function words (z-scored rates).
- ``stat_seasonal_mann_kendall`` — Mann-Kendall S summed within
  weekday seasons, tie-corrected variance, continuity-corrected z.
- ``window_stochastic_oscillator`` — %K/%D from rolling 14-day
  min/max with overbought/oversold counts.
- ``fn_allen_interval_relations`` — Allen's interval-algebra relation
  between each order's commit window and its shipment span.

Reference parity: north-star extension — no reference analogue
(the reference has no analytics layer); these are the audit layers a lake-scale engine
adds over the same tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nocouncil_etl_spark.io import fan_out, load
from nocouncil_etl_spark.plans.retrieval_plans import _TOK_SPARK, _TOK_SQL
from nocouncil_etl_spark.registry import query

COW_FILE_ROWS = 1000  # synthetic file = orderkey block of 1000
COW_UPDATE_MOD = 97  # update set: o_orderkey % 97 == 0
WOE_BAND = 100_000  # acctbal bins: 1000 currency units
WOE_LABEL_CENTS = 46_710_000  # ml_best_split_gini's label threshold
BD_TOP_WORDS = 10
STOCH_WIN = 14
STOCH_D = 3
ALLEN_COMMIT_DAYS = 14


# --------------------------------------------------------------------------
# 1. COW vs MOR cost audit
# --------------------------------------------------------------------------


@query(
    "io_cow_vs_mor_cost",
    oracle=f"""
WITH base AS (
  SELECT o_orderkey, o_orderkey // {COW_FILE_ROWS} AS file_id,
         o_orderkey % {COW_UPDATE_MOD} = 0 AS upd
  FROM orders
),
files AS (
  SELECT file_id, CAST(count(*) AS BIGINT) AS n_rows,
         CAST(sum(CASE WHEN upd THEN 1 ELSE 0 END) AS BIGINT) AS n_upd
  FROM base GROUP BY file_id
),
m AS (
  SELECT CAST(sum(n_rows) AS BIGINT) AS total_rows,
         CAST(sum(n_upd) AS BIGINT) AS n_updates,
         CAST(sum(CASE WHEN n_upd > 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS files_touched,
         CAST(sum(CASE WHEN n_upd > 0 THEN n_rows ELSE 0 END) AS BIGINT)
           AS touched_rows
  FROM files
)
SELECT 'cow' AS strategy, n_updates, files_touched,
       touched_rows AS rows_written,
       total_rows AS read_rows
FROM m
UNION ALL
SELECT 'mor', n_updates, CAST(0 AS BIGINT),
       2 * n_updates,
       total_rows + n_updates
FROM m
""",
)
def io_cow_vs_mor_cost(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Copy-on-write vs merge-on-read amplification for one update set
    (every {COW_UPDATE_MOD}th order) against a synthetic file layout
    ({COW_FILE_ROWS}-row orderkey blocks): COW rewrites every file that
    contains an updated row (rows_written = full size of touched files;
    readers then scan exactly the base row count), MOR writes one delete
    marker + one insert per update (rows_written = 2·updates, zero files
    rewritten; readers scan base + delete records to reconcile). The
    two rows quantify the write-amp/read-amp trade every table-format
    tuning guide describes — the decision input for choosing a strategy
    per table's update rate (sibling of io_merge_on_read_deletes, which
    executes the MOR read path).

    Scale shape: one hash agg to the file inventory, one 1-row rollup —
    the planner math never touches row payloads."""
    base = load(spark, sf_dir, "orders").select(
        F.floor(F.col("o_orderkey") / COW_FILE_ROWS).alias("file_id"),
        (F.col("o_orderkey") % COW_UPDATE_MOD == 0).alias("upd"),
    )
    files = base.groupBy("file_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum(F.when(F.col("upd"), 1).otherwise(0)).cast("long").alias("n_upd"),
    )
    m = files.agg(
        F.sum("n_rows").cast("long").alias("total_rows"),
        F.sum("n_upd").cast("long").alias("n_updates"),
        F.sum(F.when(F.col("n_upd") > 0, 1).otherwise(0))
        .cast("long")
        .alias("files_touched"),
        F.sum(F.when(F.col("n_upd") > 0, F.col("n_rows")).otherwise(0))
        .cast("long")
        .alias("touched_rows"),
    )
    cow = m.select(
        F.lit("cow").alias("strategy"),
        "n_updates",
        "files_touched",
        F.col("touched_rows").alias("rows_written"),
        F.col("total_rows").alias("read_rows"),
    )
    mor = m.select(
        F.lit("mor").alias("strategy"),
        "n_updates",
        F.lit(0).cast("long").alias("files_touched"),
        (2 * F.col("n_updates")).cast("long").alias("rows_written"),
        (F.col("total_rows") + F.col("n_updates")).cast("long").alias(
            "read_rows"
        ),
    )
    return cow.unionByName(mor)


# --------------------------------------------------------------------------
# 2. WoE / Information Value
# --------------------------------------------------------------------------


@query(
    "ml_woe_information_value",
    oracle=f"""
WITH labeled AS (
  SELECT CAST(floor(CAST(CAST(round(c.c_acctbal * 100) AS BIGINT) AS DOUBLE)
                    / {WOE_BAND}) AS BIGINT) AS band,
         CASE WHEN (SELECT CAST(round(max(o.o_totalprice) * 100) AS BIGINT)
                    FROM orders o WHERE o.o_custkey = c.c_custkey)
              > {WOE_LABEL_CENTS} THEN 1 ELSE 0 END AS y
  FROM customer c
),
bins AS (
  SELECT band, CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS pos
  FROM labeled GROUP BY band
),
tot AS (SELECT sum(pos) AS tp, sum(n) - sum(pos) AS tn FROM bins),
scored AS (
  SELECT band, n, pos, n - pos AS neg,
         CAST(round(1000 * ln(((pos + 0.5) / ((SELECT tp FROM tot) + 0.5))
                    / ((n - pos + 0.5) / ((SELECT tn FROM tot) + 0.5))))
              AS BIGINT) AS woe_milli,
         CAST(round(1000000 * ((pos + 0.5) / ((SELECT tp FROM tot) + 0.5)
                    - (n - pos + 0.5) / ((SELECT tn FROM tot) + 0.5))
                    * ln(((pos + 0.5) / ((SELECT tp FROM tot) + 0.5))
                    / ((n - pos + 0.5) / ((SELECT tn FROM tot) + 0.5))))
              AS BIGINT) AS iv_term_micro
  FROM bins
)
SELECT band, n, pos, woe_milli, iv_term_micro,
       (SELECT CAST(sum(iv_term_micro) AS BIGINT) FROM scored) AS iv_total_micro
FROM scored
""",
)
def ml_woe_information_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-of-Evidence binning and Information Value of account
    balance against the high-lifetime-value label (same label as
    ml_best_split_gini): per {WOE_BAND}-cent bin, WoE = ln(P(bin|pos)/
    P(bin|neg)) with the +0.5 Laplace guard, and the IV contribution
    (P(bin|pos) − P(bin|neg))·WoE — Σ IV is THE standard univariate
    screen in credit scoring (rule of thumb: <0.02 useless, >0.3
    strong). Per-bin IV terms quantize to micro before the total so the
    headline number is an exact integer sum.

    Scale shape: one labeled scan (orders side pre-aggregated per
    customer), one histogram hash agg, 1-row totals broadcast — the
    screen costs one pass per feature, embarrassingly parallel across
    features."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    per = orders.groupBy("o_custkey").agg(
        F.round(F.max("o_totalprice") * 100).cast("long").alias("mx")
    )
    labeled = (
        cust.join(per, cust["c_custkey"] == per["o_custkey"], "left")
        .select(
            F.floor(
                F.round(F.col("c_acctbal") * 100).cast("long").cast("double")
                / WOE_BAND
            )
            .cast("long")
            .alias("band"),
            F.when(F.coalesce("mx", F.lit(0)) > WOE_LABEL_CENTS, 1)
            .otherwise(0)
            .alias("y"),
        )
    )
    bins = labeled.groupBy("band").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").cast("long").alias("pos"),
    )
    tot = bins.agg(
        F.sum("pos").alias("tp"), (F.sum("n") - F.sum("pos")).alias("tn")
    )
    pp = (F.col("pos") + 0.5) / (F.col("tp") + 0.5)
    pn = (F.col("n") - F.col("pos") + 0.5) / (F.col("tn") + 0.5)
    scored = bins.crossJoin(F.broadcast(tot)).select(
        "band",
        "n",
        "pos",
        F.round(1000 * F.log(pp / pn)).cast("long").alias("woe_milli"),
        F.round(1_000_000 * (pp - pn) * F.log(pp / pn))
        .cast("long")
        .alias("iv_term_micro"),
    )
    total = scored.agg(
        F.sum("iv_term_micro").cast("long").alias("iv_total_micro")
    )
    return scored.crossJoin(F.broadcast(total))


# --------------------------------------------------------------------------
# 3. Burrows' Delta
# --------------------------------------------------------------------------


@query(
    "text_burrows_delta",
    oracle=f"""
WITH tok AS (
  SELECT source, unnest({_TOK_SQL}) AS term FROM documents
),
top AS (
  SELECT term FROM (
    SELECT term, count(*) AS c,
           row_number() OVER (ORDER BY count(*) DESC, term) AS rk
    FROM tok GROUP BY term
  ) WHERE rk <= {BD_TOP_WORDS}
),
slen AS (SELECT source, CAST(count(*) AS BIGINT) AS toks FROM tok GROUP BY source),
rate AS (
  SELECT s.source, t.term,
         CAST(round(1000000.0 * coalesce(c.c, 0) / s.toks) AS BIGINT) AS fq
  FROM slen s
  CROSS JOIN top t
  LEFT JOIN (
    SELECT source, term, CAST(count(*) AS BIGINT) AS c
    FROM tok WHERE term IN (SELECT term FROM top) GROUP BY 1, 2
  ) c ON c.source = s.source AND c.term = t.term
),
mom AS (
  SELECT term, CAST(count(*) AS BIGINT) AS k, CAST(sum(fq) AS BIGINT) AS s,
         CAST(sum(fq * fq) AS BIGINT) AS ss
  FROM rate GROUP BY term
),
z AS (
  SELECT r.source, r.term,
         CASE WHEN m.k * m.ss - m.s * m.s > 0
              THEN CAST(round(1000.0 * (r.fq * m.k - m.s)
                         / sqrt(CAST(m.k AS DOUBLE) * m.ss
                                - CAST(m.s AS DOUBLE) * m.s)) AS BIGINT)
              ELSE 0 END AS zq
  FROM rate r JOIN mom m ON m.term = r.term
)
SELECT a.source AS source_a, b.source AS source_b,
       CAST(round(CAST(sum(abs(a.zq - b.zq)) AS DOUBLE) / {BD_TOP_WORDS})
            AS BIGINT) AS delta_milli
FROM z a JOIN z b ON a.term = b.term AND a.source < b.source
GROUP BY a.source, b.source
""",
)
def text_burrows_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burrows' Delta (Burrows 2002), the standard stylometric
    authorship distance: the top-{BD_TOP_WORDS} corpus words play the
    function-word role, each source's usage rate (per-million, exact
    integer) z-scores across sources from integer moments, and
    Delta(a,b) = mean |z_a − z_b| over the word set (z quantized to
    milli before the pair sum, so the distance is exact). Low Delta
    between two sources = same authorial fingerprint — the duplicate-
    PROVENANCE detector that content dedup (minhash et al.) cannot see.

    Scale shape: rates are one tokenization pass + a vocabulary-top-k
    window; the z table is |sources|×{BD_TOP_WORDS} rows; the pair join
    is over that tiny frame, never the corpus."""
    docs = fan_out(load(spark, sf_dir, "documents"))
    tok = docs.select("source", F.explode(F.expr(_TOK_SPARK)).alias("term"))
    top = (
        tok.groupBy("term")
        .agg(F.count(F.lit(1)).alias("c"))
        .withColumn(
            "rk", F.row_number().over(Window.orderBy(F.desc("c"), "term"))
        )
        .filter(F.col("rk") <= BD_TOP_WORDS)
        .select("term")
    )
    slen = tok.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("toks")
    )
    cnt = (
        tok.join(F.broadcast(top), "term")
        .groupBy("source", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    rate = (
        slen.crossJoin(F.broadcast(top))
        .join(cnt, ["source", "term"], "left")
        .select(
            "source",
            "term",
            F.round(
                1_000_000.0 * F.coalesce("c", F.lit(0)) / F.col("toks")
            )
            .cast("long")
            .alias("fq"),
        )
    )
    mom = rate.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("fq").cast("long").alias("s"),
        F.sum(F.col("fq") * F.col("fq")).cast("long").alias("ss"),
    )
    var_pos = F.col("k") * F.col("ss") - F.col("s") * F.col("s") > 0
    z = rate.join(F.broadcast(mom), "term").select(
        "source",
        "term",
        F.when(
            var_pos,
            F.round(
                1000.0
                * (F.col("fq") * F.col("k") - F.col("s"))
                / F.sqrt(
                    F.col("k").cast("double") * F.col("ss")
                    - F.col("s").cast("double") * F.col("s")
                )
            ).cast("long"),
        )
        .otherwise(F.lit(0))
        .alias("zq"),
    )
    a = z.select(
        F.col("source").alias("source_a"), "term", F.col("zq").alias("za")
    )
    b = z.select(
        F.col("source").alias("source_b"), "term", F.col("zq").alias("zb")
    )
    return (
        a.join(b, "term")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(
            F.round(
                F.sum(F.abs(F.col("za") - F.col("zb"))).cast("double")
                / BD_TOP_WORDS
            )
            .cast("long")
            .alias("delta_milli")
        )
    )


# --------------------------------------------------------------------------
# 4. Seasonal Mann-Kendall
# --------------------------------------------------------------------------


@query(
    "stat_seasonal_mann_kendall",
    oracle="""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         isodow(CAST(ts AS DATE)) AS season,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS x
  FROM events WHERE value IS NOT NULL GROUP BY 1, 2, 3
),
pairs AS (
  SELECT a.event_type,
         CASE WHEN b.x > a.x THEN 1 WHEN b.x < a.x THEN -1 ELSE 0 END AS sgn
  FROM daily a JOIN daily b
    ON b.event_type = a.event_type AND b.season = a.season AND b.day > a.day
),
s AS (
  SELECT event_type, CAST(sum(sgn) AS BIGINT) AS s_stat FROM pairs GROUP BY 1
),
szn AS (
  SELECT event_type, season, CAST(count(*) AS BIGINT) AS n
  FROM daily GROUP BY 1, 2
),
ties AS (
  SELECT event_type, season, x, CAST(count(*) AS BIGINT) AS t
  FROM daily GROUP BY 1, 2, 3 HAVING count(*) > 1
),
var18 AS (
  SELECT z.event_type,
         CAST(sum(z.n * (z.n - 1) * (2 * z.n + 5)) AS BIGINT)
         - coalesce((SELECT CAST(sum(t.t * (t.t - 1) * (2 * t.t + 5)) AS BIGINT)
                     FROM ties t WHERE t.event_type = z.event_type), 0)
           AS v18
  FROM szn z GROUP BY z.event_type
)
SELECT s.event_type, s.s_stat, v.v18 AS var_x18,
       CAST(round(1000.0 * (s.s_stat - CASE WHEN s.s_stat > 0 THEN 1
                                            WHEN s.s_stat < 0 THEN -1
                                            ELSE 0 END)
                  / sqrt(CAST(v.v18 AS DOUBLE) / 18.0)) AS BIGINT) AS z_milli,
       CASE WHEN s.s_stat > 0 THEN 'increasing'
            WHEN s.s_stat < 0 THEN 'decreasing' ELSE 'none' END AS trend
FROM s JOIN var18 v ON v.event_type = s.event_type
""",
)
def stat_seasonal_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal Mann-Kendall trend test (Hirsch & Slack 1984): the
    pairwise sign statistic S is summed only WITHIN weekday seasons
    (Monday compares to Mondays), so a strong weekly cycle cannot
    masquerade as — or mask — a monotone trend, which is exactly the
    failure mode of the plain test (ts_mann_kendall_trend) on cyclic
    series. Variance is the per-season tie-corrected sum (kept as the
    integer 18·Var), z gets the continuity correction. Both engines
    compare exact integers end-to-end; only the final z divides.

    Scale shape: per-(type, season) pair joins over the calendar-sized
    daily frame — season partitioning CUTS the pair count ~7× vs the
    plain test; moments/ties are hash aggs on the same frame."""
    daily = (
        load(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .groupBy(
            "event_type",
            F.col("ts").cast("date").alias("day"),
            F.dayofweek(F.col("ts").cast("date")).alias("season"),
        )
        .agg(
            F.sum(F.round(F.col("value") * 100).cast("long"))
            .cast("long")
            .alias("x")
        )
    )
    b = daily.select(
        F.col("event_type").alias("et"),
        F.col("season").alias("sz"),
        F.col("day").alias("day_b"),
        F.col("x").alias("xb"),
    )
    pairs = daily.join(
        b,
        (F.col("event_type") == F.col("et"))
        & (F.col("season") == F.col("sz"))
        & (F.col("day_b") > F.col("day")),
    ).select(
        "event_type",
        F.when(F.col("xb") > F.col("x"), 1)
        .when(F.col("xb") < F.col("x"), -1)
        .otherwise(0)
        .alias("sgn"),
    )
    s = pairs.groupBy("event_type").agg(
        F.sum("sgn").cast("long").alias("s_stat")
    )
    szn = daily.groupBy("event_type", "season").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    base = szn.groupBy("event_type").agg(
        F.sum(
            F.col("n") * (F.col("n") - 1) * (2 * F.col("n") + 5)
        ).alias("raw18")
    )
    ties = (
        daily.groupBy("event_type", "season", "x")
        .agg(F.count(F.lit(1)).cast("long").alias("t"))
        .filter(F.col("t") > 1)
        .groupBy("event_type")
        .agg(
            F.sum(
                F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)
            ).alias("tie18")
        )
    )
    var18 = base.join(ties, "event_type", "left").select(
        "event_type",
        (F.col("raw18") - F.coalesce("tie18", F.lit(0)))
        .cast("long")
        .alias("var_x18"),
    )
    cc = F.when(F.col("s_stat") > 0, 1).when(F.col("s_stat") < 0, -1).otherwise(0)
    return s.join(var18, "event_type").select(
        "event_type",
        "s_stat",
        "var_x18",
        F.round(
            1000.0
            * (F.col("s_stat") - cc)
            / F.sqrt(F.col("var_x18").cast("double") / 18.0)
        )
        .cast("long")
        .alias("z_milli"),
        F.when(F.col("s_stat") > 0, "increasing")
        .when(F.col("s_stat") < 0, "decreasing")
        .otherwise("none")
        .alias("trend"),
    )


# --------------------------------------------------------------------------
# 5. Stochastic oscillator
# --------------------------------------------------------------------------


@query(
    "window_stochastic_oscillator",
    oracle=f"""
WITH s AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         sum(CAST(round(10000 * value) AS BIGINT)) AS v4
  FROM events WHERE value IS NOT NULL GROUP BY 1, 2
),
k AS (
  SELECT event_type, day,
         CASE WHEN max(v4) OVER w > min(v4) OVER w
              THEN CAST(round(100000.0 * (v4 - min(v4) OVER w)
                        / (max(v4) OVER w - min(v4) OVER w)) AS BIGINT) END
           AS k_milli,
         row_number() OVER (PARTITION BY event_type ORDER BY day) AS rn
  FROM s
  WINDOW w AS (PARTITION BY event_type ORDER BY day
               ROWS BETWEEN {STOCH_WIN - 1} PRECEDING AND CURRENT ROW)
),
kd AS (
  SELECT event_type, day, k_milli,
         CASE WHEN rn >= {STOCH_WIN + STOCH_D - 1}
              THEN avg(CAST(k_milli AS DOUBLE)) OVER wd END AS d_raw,
         row_number() OVER (PARTITION BY event_type ORDER BY day DESC) AS rnd,
         rn
  FROM k
  WINDOW wd AS (PARTITION BY event_type ORDER BY day
                ROWS BETWEEN {STOCH_D - 1} PRECEDING AND CURRENT ROW)
)
SELECT event_type,
       CAST(sum(CASE WHEN rn >= {STOCH_WIN} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_days,
       CAST(sum(CASE WHEN rn >= {STOCH_WIN} AND k_milli > 80000
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_overbought,
       CAST(sum(CASE WHEN rn >= {STOCH_WIN} AND k_milli < 20000
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_oversold,
       CAST(max(CASE WHEN rnd = 1 THEN k_milli END) AS BIGINT) AS last_k_milli,
       CAST(max(CASE WHEN rnd = 1 THEN CAST(round(d_raw) AS BIGINT) END)
            AS BIGINT) AS last_d_milli
FROM kd GROUP BY event_type
""",
)
def window_stochastic_oscillator(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stochastic oscillator per event type on the exact 1e-4 daily
    grid: %K = 100·(v − min{STOCH_WIN})/(max{STOCH_WIN} − min{STOCH_WIN})
    (rolling range position, NULL on a flat window), %D = {STOCH_D}-day
    SMA of %K — the momentum indicator family's range-normalized member
    (window_rsi_cutler normalizes by gain share, window_bollinger_bands
    by dispersion). Emits full-window day counts, overbought (>80) /
    oversold (<20) day counts, and the latest %K/%D.

    Scale shape: one hash agg to the daily grid, one per-type window
    sort shared by min/max/rank/SMA — days-per-type sized."""
    s = (
        load(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .groupBy("event_type", F.col("ts").cast("date").alias("day"))
        .agg(F.sum(F.round(10000 * F.col("value")).cast("long")).alias("v4"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-(STOCH_WIN - 1), 0)
    )
    wr = Window.partitionBy("event_type").orderBy("day")
    k = s.select(
        "event_type",
        "day",
        F.when(
            F.max("v4").over(w) > F.min("v4").over(w),
            F.round(
                100000.0
                * (F.col("v4") - F.min("v4").over(w))
                / (F.max("v4").over(w) - F.min("v4").over(w))
            ).cast("long"),
        ).alias("k_milli"),
        F.row_number().over(wr).alias("rn"),
    )
    wd = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-(STOCH_D - 1), 0)
    )
    wrd = Window.partitionBy("event_type").orderBy(F.desc("day"))
    kd = k.select(
        "event_type",
        "k_milli",
        F.when(
            F.col("rn") >= STOCH_WIN + STOCH_D - 1,
            F.avg(F.col("k_milli").cast("double")).over(wd),
        ).alias("d_raw"),
        F.row_number().over(wrd).alias("rnd"),
        "rn",
    )
    full = F.col("rn") >= STOCH_WIN
    return kd.groupBy("event_type").agg(
        F.sum(F.when(full, 1).otherwise(0)).cast("long").alias("n_days"),
        F.sum(F.when(full & (F.col("k_milli") > 80000), 1).otherwise(0))
        .cast("long")
        .alias("n_overbought"),
        F.sum(F.when(full & (F.col("k_milli") < 20000), 1).otherwise(0))
        .cast("long")
        .alias("n_oversold"),
        F.max(F.when(F.col("rnd") == 1, F.col("k_milli")))
        .cast("long")
        .alias("last_k_milli"),
        F.max(
            F.when(F.col("rnd") == 1, F.round(F.col("d_raw")).cast("long"))
        )
        .cast("long")
        .alias("last_d_milli"),
    )


# --------------------------------------------------------------------------
# 6. Allen interval relations
# --------------------------------------------------------------------------


@query(
    "fn_allen_interval_relations",
    oracle=f"""
WITH iv0 AS (
  SELECT o.o_orderkey,
         CAST(o.o_orderdate AS DATE) AS xs,
         CAST(min(l.l_shipdate) AS DATE) AS ys,
         CAST(max(l.l_shipdate) AS DATE) AS ye
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  GROUP BY 1, 2
),
iv AS (SELECT *, xs + {ALLEN_COMMIT_DAYS} AS xe FROM iv0),
rel AS (
  SELECT CASE
    WHEN xs = ys AND xe = ye THEN 'equals'
    WHEN xe < ys THEN 'precedes'
    WHEN ye < xs THEN 'preceded_by'
    WHEN xe = ys THEN 'meets'
    WHEN ye = xs THEN 'met_by'
    WHEN xs = ys AND xe < ye THEN 'starts'
    WHEN xs = ys AND xe > ye THEN 'started_by'
    WHEN xe = ye AND xs > ys THEN 'finishes'
    WHEN xe = ye AND xs < ys THEN 'finished_by'
    WHEN xs > ys AND xe < ye THEN 'during'
    WHEN xs < ys AND xe > ye THEN 'contains'
    WHEN xs < ys AND xe >= ys AND xe < ye THEN 'overlaps'
    ELSE 'overlapped_by' END AS relation
  FROM iv
)
SELECT relation, CAST(count(*) AS BIGINT) AS n
FROM rel GROUP BY relation
""",
)
def fn_allen_interval_relations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Allen's interval algebra (Allen 1983) census: classify each
    order's commit window [orderdate, +{ALLEN_COMMIT_DAYS}d] against its
    shipment span [min shipdate, max shipdate] into the 13 basic
    relations (equals, precedes/preceded_by, meets/met_by,
    starts/started_by, finishes/finished_by, during/contains,
    overlaps/overlapped_by) — the temporal-logic audit behind SLA
    checks (\"did shipping begin inside the commit window?\") that plain
    overlap joins (join_interval_overlap) collapse into one bit. Case
    order resolves the boundary overlaps exactly as the mutually
    exclusive definitions require (equality tests first).

    Scale shape: one orderkey equi-join + hash agg to per-order spans,
    one narrow CASE, one 13-group rollup."""
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    iv = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .groupBy("o_orderkey", F.col("o_orderdate").cast("date").alias("xs"))
        .agg(
            F.min(F.col("l_shipdate").cast("date")).alias("ys"),
            F.max(F.col("l_shipdate").cast("date")).alias("ye"),
        )
        .withColumn("xe", F.date_add("xs", ALLEN_COMMIT_DAYS))
    )
    xs, xe, ys, ye = F.col("xs"), F.col("xe"), F.col("ys"), F.col("ye")
    rel = iv.select(
        F.when((xs == ys) & (xe == ye), "equals")
        .when(xe < ys, "precedes")
        .when(ye < xs, "preceded_by")
        .when(xe == ys, "meets")
        .when(ye == xs, "met_by")
        .when((xs == ys) & (xe < ye), "starts")
        .when((xs == ys) & (xe > ye), "started_by")
        .when((xe == ye) & (xs > ys), "finishes")
        .when((xe == ye) & (xs < ys), "finished_by")
        .when((xs > ys) & (xe < ye), "during")
        .when((xs < ys) & (xe > ye), "contains")
        .when((xs < ys) & (xe >= ys) & (xe < ye), "overlaps")
        .otherwise("overlapped_by")
        .alias("relation")
    )
    return rel.groupBy("relation").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
