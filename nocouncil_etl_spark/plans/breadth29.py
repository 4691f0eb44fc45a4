"""Breadth batch 29 (round 6): cross-correlation, Haar wavelets, Granger
lag regression, SRM guardrail, LCS subsequence match, file compaction.

Six operators rounding out the time-series / experimentation / lake-ops
families (reference scope: per-feed daily series from ingest.py's fetch
log, corpus phrase matching, and the partitioned output layout):

- ``ts_cross_correlation`` — lagged Pearson cross-correlation between the
  click and purchase daily series (lags -7..+7), exact integer residual
  moments.
- ``ts_haar_wavelet``      — unnormalized Haar detail-coefficient energy
  per dyadic level of each event-type's daily series; fully declarative
  (sign/block arithmetic, no recursion, no UDF).
- ``ts_granger_lag``       — Granger-style test: does yesterday's click
  traffic explain today's purchases beyond yesterday's purchases?
  Closed-form OLS on centered integer moments, nested-model F statistic.
- ``stat_srm_check``       — sample-ratio-mismatch guardrail over two
  deterministic assignment rules (one fair, one biased 49/51).
- ``text_lcs_subsequence`` — longest-common-subsequence length of each
  document against a 6-token query phrase; recursive-CTE DP oracle (the
  ts_dtw_pattern carried-columns technique).
- ``io_compact_small_files`` — the lake compaction contract: many small
  parquet files rewritten to few, readback aggregate proven lossless.
"""

from __future__ import annotations

import os
import re
import tempfile

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nocouncil_etl_spark.io import load
from nocouncil_etl_spark.plans.breadth15 import _pt, _pt_sql
from nocouncil_etl_spark.registry import query

# --------------------------------------------------------------------------
# 1. Lagged cross-correlation
# --------------------------------------------------------------------------

XCORR_MAX_LAG = 7
XCORR_A, XCORR_B = "click", "purchase"


@query(
    "ts_cross_correlation",
    oracle=f"""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS d,
         CAST(sum(CAST(round(value) AS BIGINT)) AS BIGINT) AS x
  FROM events WHERE event_type IN ('{XCORR_A}', '{XCORR_B}')
  GROUP BY 1, 2
),
mu AS (
  SELECT event_type, CAST(sum(x) AS BIGINT) // count(*) AS m
  FROM daily GROUP BY 1
),
ctr AS (
  SELECT d.event_type, d.d, d.x - mu.m AS r
  FROM daily d JOIN mu ON d.event_type = mu.event_type
),
a AS (SELECT d, r FROM ctr WHERE event_type = '{XCORR_A}'),
b AS (SELECT d, r FROM ctr WHERE event_type = '{XCORR_B}'),
lags AS (SELECT unnest(range(-{XCORR_MAX_LAG}, {XCORR_MAX_LAG + 1})) AS lag),
paired AS (
  SELECT l.lag, a.r AS ra, b.r AS rb
  FROM lags l JOIN a ON true JOIN b ON b.d = a.d + CAST(l.lag AS INTEGER)
)
SELECT lag, CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(sum(ra * rb) AS BIGINT) AS sab,
       round(CAST(sum(ra * rb) AS DOUBLE)
             / sqrt(CAST(sum(ra * ra) AS DOUBLE)
                    * CAST(sum(rb * rb) AS DOUBLE)), 6) AS r
FROM paired GROUP BY lag
""",
)
def ts_cross_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lagged cross-correlation between the {XCORR_A} and {XCORR_B} daily
    series: r(L) = corr({XCORR_A}_t, {XCORR_B}_(t+L)) for L in
    [-{XCORR_MAX_LAG}, {XCORR_MAX_LAG}] — "does a click surge lead a
    purchase surge, and by how many days?". Series are centered by their
    EXACT integer full-series means (floor division, deterministic), so
    every per-lag moment (Sigma ra·rb, Sigma ra², Sigma rb²) is an exact
    BIGINT and only the final ratio is floating. Per-lag denominators use
    the pairs actually present at that lag (the windowed estimator).

    Scale shape: the daily collapse is map-side; the lag fan-out joins the
    (date-range-bounded) daily tables, never raw events — 100 TB of
    events still becomes ≤ n_days rows per series before the ×15 lag
    explode. Reference parity: per-feed fetch-vs-update lead/lag over
    ingest.py's crawl log."""
    ev = load(spark, sf_dir, "events")
    daily = (
        ev.filter(F.col("event_type").isin(XCORR_A, XCORR_B))
        .groupBy("event_type", F.to_date("ts").alias("d"))
        .agg(F.sum(F.round("value").cast("long")).cast("long").alias("x"))
    )
    mu = daily.groupBy("event_type").agg(
        F.expr("CAST(sum(x) AS BIGINT) div count(*)").alias("m")
    )
    ctr = daily.join(mu, "event_type").select(
        "event_type", "d", (F.col("x") - F.col("m")).alias("r")
    )
    a = ctr.filter(F.col("event_type") == XCORR_A).select("d", F.col("r").alias("ra"))
    b = ctr.filter(F.col("event_type") == XCORR_B).select(
        F.col("d").alias("bd"), F.col("r").alias("rb")
    )
    lags = spark.range(-XCORR_MAX_LAG, XCORR_MAX_LAG + 1).select(
        F.col("id").cast("int").alias("lag")
    )
    paired = (
        a.crossJoin(F.broadcast(lags))
        .join(b, F.col("bd") == F.date_add(F.col("d"), F.col("lag")))
    )
    return paired.groupBy("lag").agg(
        F.count("*").cast("long").alias("n_pairs"),
        F.sum(F.col("ra") * F.col("rb")).cast("long").alias("sab"),
        F.round(
            F.sum(F.col("ra") * F.col("rb")).cast("double")
            / F.sqrt(
                F.sum(F.col("ra") * F.col("ra")).cast("double")
                * F.sum(F.col("rb") * F.col("rb")).cast("double")
            ),
            6,
        ).alias("r"),
    )


# --------------------------------------------------------------------------
# 2. Haar wavelet detail energy
# --------------------------------------------------------------------------

HAAR_LEVELS = 4


@query(
    "ts_haar_wavelet",
    oracle=f"""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS d,
         CAST(sum(CAST(round(value) AS BIGINT)) AS BIGINT) AS x
  FROM events GROUP BY 1, 2
),
idx AS (
  SELECT event_type,
         CAST(row_number() OVER (PARTITION BY event_type ORDER BY d) AS BIGINT)
           - 1 AS j,
         x
  FROM daily
),
lv AS (
  SELECT CAST(k AS BIGINT) AS k,
         CAST(2 ** (k - 1) AS BIGINT) AS half,
         CAST(2 ** k AS BIGINT) AS blksz
  FROM (SELECT unnest(range(1, {HAAR_LEVELS + 1})) AS k)
),
coeff AS (
  SELECT i.event_type, l.k, i.j // l.blksz AS blk,
         CAST(sum(CASE WHEN (i.j // l.half) % 2 = 0 THEN i.x ELSE -i.x END)
              AS BIGINT) AS det,
         CAST(count(*) AS BIGINT) AS cnt,
         l.blksz AS blksz
  FROM idx i JOIN lv l ON true
  GROUP BY 1, 2, 3, 6
)
SELECT event_type, k AS level, CAST(count(*) AS BIGINT) AS n_coeffs,
       CAST(sum(det * det) AS BIGINT) AS energy,
       CAST(max(abs(det)) AS BIGINT) AS max_abs_det
FROM coeff WHERE cnt = blksz
GROUP BY 1, 2
""",
)
def ts_haar_wavelet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unnormalized Haar wavelet detail energy per dyadic level of each
    event-type's daily series: the level-k detail coefficient of block i
    is (sum of first half) − (sum of second half) of the 2^k-day block —
    computed DIRECTLY as a signed sum (sign = parity of j div 2^(k-1),
    block = j div 2^k), no pyramid recursion, no UDF: the whole transform
    is one hash-agg over the (day x level) fan-out. Incomplete trailing
    blocks are dropped (cnt = 2^k filter), the standard dyadic contract.
    Energy per level localizes WHERE the series' variance lives in time
    scale — the burst detector (high level-1 energy = day-to-day spikes;
    high level-{HAAR_LEVELS} = week-scale regime shifts). All BIGINT.

    Scale shape: events collapse to n_days rows map-side; the level
    fan-out is ×{HAAR_LEVELS} on the bounded daily table; one hash-agg to
    (type, level, block), one to (type, level). The streaming-friendly
    wavelet layout (signed partial sums merge by addition)."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("d")
    ).agg(F.sum(F.round("value").cast("long")).cast("long").alias("x"))
    idx = daily.select(
        "event_type",
        (
            F.row_number().over(
                Window.partitionBy("event_type").orderBy("d")
            ).cast("long")
            - 1
        ).alias("j"),
        "x",
    )
    lv = spark.createDataFrame(
        [(k, 1 << (k - 1), 1 << k) for k in range(1, HAAR_LEVELS + 1)],
        "k BIGINT, half BIGINT, blksz BIGINT",
    )
    coeff = (
        idx.crossJoin(F.broadcast(lv))
        .groupBy(
            "event_type",
            "k",
            F.expr("j div blksz").alias("blk"),
            "blksz",
        )
        .agg(
            F.sum(
                F.when(F.expr("(j div half) % 2") == 0, F.col("x")).otherwise(
                    -F.col("x")
                )
            )
            .cast("long")
            .alias("det"),
            F.count("*").cast("long").alias("cnt"),
        )
    )
    return (
        coeff.filter(F.col("cnt") == F.col("blksz"))
        .groupBy("event_type", F.col("k").alias("level"))
        .agg(
            F.count("*").cast("long").alias("n_coeffs"),
            F.sum(F.col("det") * F.col("det")).cast("long").alias("energy"),
            F.max(F.abs("det")).cast("long").alias("max_abs_det"),
        )
    )


# --------------------------------------------------------------------------
# 3. Granger-style lag regression
# --------------------------------------------------------------------------


@query(
    "ts_granger_lag",
    oracle=f"""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS d,
         CAST(sum(CAST(round(value) AS BIGINT)) AS BIGINT) AS x
  FROM events WHERE event_type IN ('{XCORR_A}', '{XCORR_B}')
  GROUP BY 1, 2
),
p AS (SELECT d, x FROM daily WHERE event_type = '{XCORR_B}'),
c AS (SELECT d, x FROM daily WHERE event_type = '{XCORR_A}'),
obs AS (
  SELECT t.x AS y, y1.x AS x1, c1.x AS x2
  FROM p t
  JOIN p y1 ON y1.d = t.d - 1
  JOIN c c1 ON c1.d = t.d - 1
),
mu AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(y) AS BIGINT) // count(*) AS my,
         CAST(sum(x1) AS BIGINT) // count(*) AS m1,
         CAST(sum(x2) AS BIGINT) // count(*) AS m2
  FROM obs
),
mom AS (
  SELECT mu.n,
         CAST(sum((y - my) * (y - my)) AS BIGINT) AS syy,
         CAST(sum((x1 - m1) * (x1 - m1)) AS BIGINT) AS s11,
         CAST(sum((x2 - m2) * (x2 - m2)) AS BIGINT) AS s22,
         CAST(sum((x1 - m1) * (x2 - m2)) AS BIGINT) AS s12,
         CAST(sum((x1 - m1) * (y - my)) AS BIGINT) AS s1y,
         CAST(sum((x2 - m2) * (y - my)) AS BIGINT) AS s2y
  FROM obs, mu GROUP BY mu.n
)
SELECT n, syy, s11, s22, s12, s1y, s2y,
       round((CAST(syy AS DOUBLE) - (CAST(s1y AS DOUBLE) / s11) * s1y)
             - (CAST(syy AS DOUBLE)
                - ((CAST(s1y AS DOUBLE) * s22 - CAST(s2y AS DOUBLE) * s12)
                   / (CAST(s11 AS DOUBLE) * s22
                      - CAST(s12 AS DOUBLE) * s12)) * s1y
                - ((CAST(s2y AS DOUBLE) * s11 - CAST(s1y AS DOUBLE) * s12)
                   / (CAST(s11 AS DOUBLE) * s22
                      - CAST(s12 AS DOUBLE) * s12)) * s2y), 4) AS rss_drop,
       round(((CAST(syy AS DOUBLE) - (CAST(s1y AS DOUBLE) / s11) * s1y)
              - (CAST(syy AS DOUBLE)
                 - ((CAST(s1y AS DOUBLE) * s22 - CAST(s2y AS DOUBLE) * s12)
                    / (CAST(s11 AS DOUBLE) * s22
                       - CAST(s12 AS DOUBLE) * s12)) * s1y
                 - ((CAST(s2y AS DOUBLE) * s11 - CAST(s1y AS DOUBLE) * s12)
                    / (CAST(s11 AS DOUBLE) * s22
                       - CAST(s12 AS DOUBLE) * s12)) * s2y))
             / ((CAST(syy AS DOUBLE)
                 - ((CAST(s1y AS DOUBLE) * s22 - CAST(s2y AS DOUBLE) * s12)
                    / (CAST(s11 AS DOUBLE) * s22
                       - CAST(s12 AS DOUBLE) * s12)) * s1y
                 - ((CAST(s2y AS DOUBLE) * s11 - CAST(s1y AS DOUBLE) * s12)
                    / (CAST(s11 AS DOUBLE) * s22
                       - CAST(s12 AS DOUBLE) * s12)) * s2y)
                / (n - 3)), 4) AS f_stat
FROM mom
""",
)
def ts_granger_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Granger-style nested-model test: does yesterday's {XCORR_A} volume
    explain today's {XCORR_B} volume beyond yesterday's {XCORR_B}?
    Restricted model y ~ y_lag1; unrestricted y ~ y_lag1 + click_lag1 —
    both solved in closed form on CENTERED moments (centering uses exact
    integer means, so every moment is an exact BIGINT and the 2x2 Cramer
    solve + RSS arithmetic is a fixed IEEE expression both engines
    evaluate identically). Emits the exact moments, the RSS drop, and
    F = (RSS_r − RSS_u) / (RSS_u / (n − 3)).

    Scale shape: daily collapse map-side; the lag self-join runs on the
    date-bounded daily table; moments are one scalar reduce. The
    production pattern for any cross-series causality sweep: per-pair
    moments are tiny, so at 100 TB you run ALL type-pairs in one grouped
    agg rather than per-pair jobs."""
    ev = load(spark, sf_dir, "events")
    daily = (
        ev.filter(F.col("event_type").isin(XCORR_A, XCORR_B))
        .groupBy("event_type", F.to_date("ts").alias("d"))
        .agg(F.sum(F.round("value").cast("long")).cast("long").alias("x"))
    )
    p = daily.filter(F.col("event_type") == XCORR_B).select("d", "x")
    c = daily.filter(F.col("event_type") == XCORR_A).select(
        F.col("d").alias("cd"), F.col("x").alias("cx")
    )
    p1 = p.select(F.col("d").alias("pd"), F.col("x").alias("px"))
    obs = (
        p.join(p1, F.col("pd") == F.date_sub(F.col("d"), 1))
        .join(c, F.col("cd") == F.date_sub(F.col("d"), 1))
        .select(
            F.col("x").alias("y"), F.col("px").alias("x1"), F.col("cx").alias("x2")
        )
    )
    mu = obs.agg(
        F.count("*").cast("long").alias("n"),
        F.expr("CAST(sum(y) AS BIGINT) div count(*)").alias("my"),
        F.expr("CAST(sum(x1) AS BIGINT) div count(*)").alias("m1"),
        F.expr("CAST(sum(x2) AS BIGINT) div count(*)").alias("m2"),
    )
    mom = obs.crossJoin(F.broadcast(mu)).agg(
        F.first("n").alias("n"),
        F.sum((F.col("y") - F.col("my")) * (F.col("y") - F.col("my")))
        .cast("long")
        .alias("syy"),
        F.sum((F.col("x1") - F.col("m1")) * (F.col("x1") - F.col("m1")))
        .cast("long")
        .alias("s11"),
        F.sum((F.col("x2") - F.col("m2")) * (F.col("x2") - F.col("m2")))
        .cast("long")
        .alias("s22"),
        F.sum((F.col("x1") - F.col("m1")) * (F.col("x2") - F.col("m2")))
        .cast("long")
        .alias("s12"),
        F.sum((F.col("x1") - F.col("m1")) * (F.col("y") - F.col("my")))
        .cast("long")
        .alias("s1y"),
        F.sum((F.col("x2") - F.col("m2")) * (F.col("y") - F.col("my")))
        .cast("long")
        .alias("s2y"),
    )
    det = "(CAST(s11 AS DOUBLE) * s22 - CAST(s12 AS DOUBLE) * s12)"
    b1 = f"((CAST(s1y AS DOUBLE) * s22 - CAST(s2y AS DOUBLE) * s12) / {det})"
    b2 = f"((CAST(s2y AS DOUBLE) * s11 - CAST(s1y AS DOUBLE) * s12) / {det})"
    rss_r = "(CAST(syy AS DOUBLE) - (CAST(s1y AS DOUBLE) / s11) * s1y)"
    rss_u = f"(CAST(syy AS DOUBLE) - {b1} * s1y - {b2} * s2y)"
    return mom.select(
        "n",
        "syy",
        "s11",
        "s22",
        "s12",
        "s1y",
        "s2y",
        F.expr(f"round({rss_r} - {rss_u}, 4)").alias("rss_drop"),
        F.expr(f"round(({rss_r} - {rss_u}) / ({rss_u} / (n - 3)), 4)").alias(
            "f_stat"
        ),
    )


# --------------------------------------------------------------------------
# 4. Sample-ratio-mismatch guardrail
# --------------------------------------------------------------------------


@query(
    "stat_srm_check",
    oracle=f"""
WITH users AS (SELECT DISTINCT user_id FROM events),
h AS (
  SELECT user_id, {_pt_sql('srm#', 'user_id', 1000)} AS hv FROM users
),
assigned AS (
  SELECT 'hash_mod2' AS assignment,
         CASE WHEN hv % 2 = 0 THEN 0 ELSE 1 END AS arm
  FROM h
  UNION ALL
  SELECT 'biased_49', CASE WHEN hv % 100 < 49 THEN 0 ELSE 1 END FROM h
),
cnt AS (
  SELECT assignment,
         CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
         CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1
  FROM assigned GROUP BY 1
)
SELECT assignment, n0, n1,
       round(CAST((n0 - n1) * (n0 - n1) AS DOUBLE) / (n0 + n1), 6) AS chi2,
       CAST(CAST((n0 - n1) * (n0 - n1) AS DOUBLE) / (n0 + n1) > 3.841
            AS BOOLEAN) AS srm_flag
FROM cnt
""",
)
def stat_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio-mismatch guardrail: the first chart every experiment
    dashboard draws. Distinct users are assigned to two arms by two
    deterministic md5 rules — a fair 50/50 split (hv % 2) and a
    deliberately biased 49/51 split — and each assignment's observed
    counts are tested against the expected equal split with the 1-df
    chi-square, which for a two-cell GOF collapses exactly to
    (n0 − n1)² / n. Flag at the 0.05 critical value 3.841. Counts are
    exact BIGINTs; chi2 is one division.

    Scale shape: distinct-user collapse (hash-agg), then per-rule
    map-side-combined counts — the whole guardrail is two scans of the
    user table regardless of event volume. Reference parity: ingest.py's
    feed sharding implies exactly this fairness check on the shard hash."""
    ev = load(spark, sf_dir, "events")
    users = ev.select("user_id").distinct()
    h = users.select((_pt("srm#", F.col("user_id")) % 1000).alias("hv"))
    assigned = h.select(
        F.lit("hash_mod2").alias("assignment"),
        F.when(F.col("hv") % 2 == 0, 0).otherwise(1).alias("arm"),
    ).unionByName(
        h.select(
            F.lit("biased_49").alias("assignment"),
            F.when(F.col("hv") % 100 < 49, 0).otherwise(1).alias("arm"),
        )
    )
    cnt = assigned.groupBy("assignment").agg(
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).cast("long").alias("n0"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).cast("long").alias("n1"),
    )
    chi2 = ((F.col("n0") - F.col("n1")) * (F.col("n0") - F.col("n1"))).cast(
        "double"
    ) / (F.col("n0") + F.col("n1"))
    return cnt.select(
        "assignment",
        "n0",
        "n1",
        F.round(chi2, 6).alias("chi2"),
        (chi2 > 3.841).alias("srm_flag"),
    )


# --------------------------------------------------------------------------
# 5. LCS subsequence match against a query phrase
# --------------------------------------------------------------------------

LCS_QUERY = ("data", "table", "join", "merge", "sort", "scan")
LCS_CAP = 200


def _lcs_oracle() -> str:
    q = LCS_QUERY
    eq = [f"CASE WHEN t.t = '{w}' THEN 1 ELSE 0 END" for w in q]
    base = [eq[0]]
    for j in range(1, 6):
        base.append(f"greatest({base[-1]}, {eq[j]})")
    step = [f"greatest(dp.l1, {eq[0]})"]
    for j in range(1, 6):
        step.append(
            f"greatest(dp.l{j + 1}, {step[-1]}, dp.l{j} + {eq[j]})"
        )
    cols = ",\n         ".join(
        f"CAST({e} AS BIGINT) AS l{j + 1}" for j, e in enumerate(base)
    )
    scols = ",\n         ".join(f"CAST({e} AS BIGINT)" for e in step)
    return f"""
WITH RECURSIVE toks AS (
  SELECT doc_id,
         list_slice(list_filter(regexp_split_to_array(lower(text),
                                                      '[^a-z0-9]+'),
                    t -> t <> ''), 1, {LCS_CAP}) AS arr
  FROM documents
),
flat AS (
  SELECT doc_id, CAST(j AS BIGINT) AS i,
         list_extract(arr, CAST(j AS INTEGER)) AS t,
         CAST(len(arr) AS BIGINT) AS n
  FROM (SELECT doc_id, arr, unnest(range(1, len(arr) + 1)) AS j FROM toks)
),
dp AS (
  SELECT t.doc_id, t.i, t.n,
         {cols}
  FROM flat t WHERE t.i = 1
  UNION ALL
  SELECT t.doc_id, t.i, t.n,
         {scols}
  FROM dp JOIN flat t ON t.doc_id = dp.doc_id AND t.i = dp.i + 1
),
fin AS (
  SELECT doc_id, l6 AS lcs_len FROM dp WHERE i = n
  UNION ALL
  SELECT doc_id, 0 FROM toks WHERE len(arr) = 0
)
SELECT lcs_len, CAST(count(*) AS BIGINT) AS n_docs
FROM fin GROUP BY lcs_len
"""


@query("text_lcs_subsequence", oracle=_lcs_oracle())
def text_lcs_subsequence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest-common-subsequence length of every document's token stream
    (first {LCS_CAP} tokens) against the 6-token query phrase
    {LCS_QUERY} — "how much of this phrase appears, in order, possibly
    with gaps?", the order-aware sibling of keyword_relevance and the
    kernel behind plagiarism/citation span matching. Rolling-array DP in
    an Arrow-batched pandas UDF (state = 6 ints per doc); the oracle
    replays the identical max-recurrence as a recursive CTE carrying the
    6 DP columns row by row (the ts_dtw_pattern technique), so the
    sequential algorithm still gets an exact value-hash check. Output is
    the corpus histogram of LCS lengths (7 rows).

    Scale shape: embarrassingly parallel — one Arrow map over documents,
    O(tokens x 6) per doc with the {LCS_CAP}-token cap bounding worst-case
    docs; the histogram agg is map-side-combined to ≤ 7 rows."""
    docs = load(spark, sf_dir, "documents")
    q = LCS_QUERY

    @F.pandas_udf("long")
    def lcs_len(texts: pd.Series) -> pd.Series:
        out = []
        for s in texts:
            toks = [t for t in re.split(r"[^a-z0-9]+", s.lower()) if t][:LCS_CAP]
            dp = [0] * 6
            for t in toks:
                new = [0] * 6
                for j in range(6):
                    left = new[j - 1] if j else 0
                    diag = (dp[j - 1] if j else 0) + (1 if t == q[j] else 0)
                    new[j] = max(dp[j], left, diag)
                dp = new
            out.append(dp[5])
        return pd.Series(out)

    return (
        docs.select(lcs_len(F.col("text")).alias("lcs_len"))
        .groupBy("lcs_len")
        .agg(F.count("*").cast("long").alias("n_docs"))
    )


# --------------------------------------------------------------------------
# 6. Small-file compaction
# --------------------------------------------------------------------------

COMPACT_SMALL = 32
COMPACT_TARGET = 4


@query(
    "io_compact_small_files",
    oracle="""
SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
FROM events GROUP BY event_type
""",
)
def io_compact_small_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The lake-maintenance compaction contract end-to-end: the event feed
    is first published as {COMPACT_SMALL} small parquet files (the
    many-tiny-files state every streaming ingest produces), then rewritten
    to {COMPACT_TARGET} right-sized files with coalesce (a narrow,
    shuffle-free plan — each output task concatenates whole input files),
    and the compacted table's per-type accounting is hash-checked against
    the unpartitioned source: compaction lost and duplicated nothing.
    tests/test_breadth29.py asserts the file count actually dropped.

    Scale shape: small files are THE silent 100 TB killer (one task +
    one open/close per file; 10^7 files = a dead NameNode/listing). The
    fix is exactly this: periodic coalesce-rewrite sized to
    files.maxPartitionBytes, narrow so it costs one read+write pass with
    no shuffle. Reference parity: ingest.py's per-fetch output files
    accumulate identically."""
    ev = load(spark, sf_dir, "events")
    base = os.path.join(
        tempfile.gettempdir(),
        "nocouncil_etl_spark_scratch",
        f"compact_{os.path.basename(sf_dir.rstrip('/'))}",
    )
    small_dir, big_dir = os.path.join(base, "small"), os.path.join(base, "big")
    sel = ev.select(
        "event_id",
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    sel.repartition(COMPACT_SMALL).write.mode("overwrite").parquet(small_dir)
    (
        spark.read.parquet(small_dir)
        .coalesce(COMPACT_TARGET)
        .write.mode("overwrite")
        .parquet(big_dir)
    )
    return (
        spark.read.parquet(big_dir)
        .groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("cents").cast("long").alias("cents"),
        )
    )
