"""Breadth batch 27 (round 6): link prediction, DTW, omnibus rank test,
forecast-calibration decomposition, AMS F2 sketch, randomized response.

Six operators a reference user doing analytics over the crawled corpus +
event stream would reach for next (reference scope: the crawl/dedup/index
loop in ``ingest.py``/``vectorize.py`` implies link graphs, per-source time
series, and privacy-aware aggregate reporting):

- ``graph_resource_allocation`` — Zhou/Lü/Zhang resource-allocation link
  prediction (the Adamic-Adar family, with 1/deg instead of 1/log deg so
  the kernel stays in exact integer fixed-point).
- ``ts_dtw_pattern``        — banded-free dynamic-time-warping distance of
  each event-type's daily series to a reference shape; the DuckDB oracle
  replays the DP row-by-row as a recursive CTE carrying the 4 DP columns.
- ``stat_kruskal_wallis``   — k-group omnibus rank test (the ANOVA-shaped
  sibling of stat_mann_whitney_u, same doubled-midrank identity).
- ``eval_brier_decomposition`` — Brier score + Murphy reliability /
  resolution / uncertainty decomposition over probability deciles.
- ``sketch_ams_f2``         — Alon-Matias-Szegedy second-frequency-moment
  sketch: 16 md5-signed counters, median-of-estimators vs the exact F2.
- ``privacy_rr_estimate``   — randomized-response debiasing: recover the
  true sensitive-attribute rate from gamma=1/4 flipped reports.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nocouncil_etl_spark.io import load
from nocouncil_etl_spark.operators.quantiles import with_below
from nocouncil_etl_spark.plans.graph_plans import _EDGES_SQL, _graph
from nocouncil_etl_spark.registry import query

# --------------------------------------------------------------------------
# 1. Resource-allocation link prediction
# --------------------------------------------------------------------------

RA_TOPK = 20
RA_SCALE = 1_000_000_000


@query(
    "graph_resource_allocation",
    oracle=f"""
WITH {_EDGES_SQL},
sym AS (
  SELECT src AS node, dst AS nbr FROM edges0
  UNION
  SELECT dst, src FROM edges0
),
degs AS (SELECT node, count(*) AS d FROM sym GROUP BY node),
pairs AS (
  SELECT s1.nbr AS u, s2.nbr AS v, s1.node AS w
  FROM sym s1 JOIN sym s2 ON s1.node = s2.node AND s1.nbr < s2.nbr
),
scored AS (
  SELECT u, v,
         CAST(sum({RA_SCALE} // g.d) AS BIGINT) AS ra_1e9,
         CAST(count(*) AS BIGINT) AS common_nbrs
  FROM pairs p JOIN degs g ON p.w = g.node
  GROUP BY u, v
),
und AS (
  SELECT least(src, dst) AS a, greatest(src, dst) AS b FROM edges0 GROUP BY 1, 2
)
SELECT u, v, ra_1e9, common_nbrs, rk FROM (
  SELECT s.u, s.v, s.ra_1e9, s.common_nbrs,
         CAST(row_number() OVER (ORDER BY s.ra_1e9 DESC, s.u, s.v) AS INT) AS rk
  FROM scored s LEFT JOIN und ON s.u = und.a AND s.v = und.b
  WHERE und.a IS NULL
) WHERE rk <= {RA_TOPK}
""",
)
def graph_resource_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resource-allocation link prediction (Zhou, Lü & Zhang 2009) on the
    deterministic link graph: score every NON-adjacent pair (u, v) by
    sum over common neighbors w of 1/deg(w) — high-degree hubs contribute
    less evidence — in exact integer fixed-point (floor(1e9/deg), so both
    engines agree bit-for-bit where Adamic-Adar's 1/log(deg) would float).
    Existing edges are removed with an anti-join; top-20 predicted links.

    Scale shape: the common-neighbor self-join emits sum-of-deg² pairs —
    the standard triangle-join bound. Degrees here are small constants
    (≤3 out-links/doc); on a power-law web graph the hub rows need the
    same top-degree cap every production link-prediction system applies
    (drop w with deg > cap: their per-pair contribution → 0 anyway).
    Reference parity: ingest.py's link extraction implies this graph;
    prediction = which crawl frontier edges to fetch next."""
    nodes, edges, n = _graph(spark, sf_dir)
    edges0 = edges.select("src", "dst")
    sym = (
        edges0.select(F.col("src").alias("node"), F.col("dst").alias("nbr"))
        .unionByName(edges0.select(F.col("dst").alias("node"), F.col("src").alias("nbr")))
        .distinct()
    )
    degs = sym.groupBy("node").agg(F.count("*").alias("d"))
    s1 = sym.select(F.col("node").alias("w"), F.col("nbr").alias("u"))
    s2 = sym.select(F.col("node").alias("w"), F.col("nbr").alias("v"))
    pairs = s1.join(s2, "w").filter(F.col("u") < F.col("v"))
    scored = (
        pairs.join(degs.withColumnRenamed("node", "w"), "w")
        .groupBy("u", "v")
        .agg(
            F.sum(F.expr(f"{RA_SCALE} div d")).cast("long").alias("ra_1e9"),
            F.count("*").cast("long").alias("common_nbrs"),
        )
    )
    und = edges0.select(
        F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
    ).distinct()
    nonedges = scored.join(
        und,
        (F.col("u") == F.col("a")) & (F.col("v") == F.col("b")),
        "left_anti",
    )
    return (
        nonedges.withColumn(
            "rk",
            F.row_number()
            .over(Window.orderBy(F.desc("ra_1e9"), "u", "v"))
            .cast("int"),
        )
        .filter(F.col("rk") <= RA_TOPK)
        .select("u", "v", "ra_1e9", "common_nbrs", "rk")
    )


# --------------------------------------------------------------------------
# 2. DTW distance to a reference pattern
# --------------------------------------------------------------------------

# reference shape as percent of the series' own mean daily total: a
# dip-spike-recover-surge template
DTW_PATTERN_PCT = (50, 150, 100, 200)


def _dtw_oracle() -> str:
    pat_cols = ", ".join(
        f"mu * {c} // 100 AS p{j + 1}" for j, c in enumerate(DTW_PATTERN_PCT)
    )
    # base row (i = 1): dp[1][j] = cost(1, j) + dp[1][j-1]  (top edge)
    base = ["abs(i.x - p.p1)"]
    for j in (2, 3, 4):
        base.append(f"{base[-1]} + abs(i.x - p.p{j})")
    # step row: dp[i][1] = cost + dp[i-1][1];
    # dp[i][j] = cost + least(dp[i-1][j], dp[i][j-1], dp[i-1][j-1])
    step = ["abs(i.x - p.p1) + dp.dp1"]
    for j in (2, 3, 4):
        step.append(
            f"abs(i.x - p.p{j}) + least(dp.dp{j}, {step[-1]}, dp.dp{j - 1})"
        )
    return f"""
WITH RECURSIVE daily AS (
  SELECT event_type, CAST(ts AS DATE) AS d,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS x
  FROM events GROUP BY 1, 2
),
idx AS (
  SELECT event_type,
         CAST(row_number() OVER (PARTITION BY event_type ORDER BY d) AS BIGINT) AS i,
         x
  FROM daily
),
meta AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) // count(*) AS mu
  FROM idx GROUP BY 1
),
pat AS (SELECT event_type, {pat_cols} FROM meta),
dp AS (
  SELECT i.event_type, i.i,
         CAST({base[0]} AS BIGINT) AS dp1,
         CAST({base[1]} AS BIGINT) AS dp2,
         CAST({base[2]} AS BIGINT) AS dp3,
         CAST({base[3]} AS BIGINT) AS dp4
  FROM idx i JOIN pat p ON p.event_type = i.event_type
  WHERE i.i = 1
  UNION ALL
  SELECT i.event_type, i.i,
         CAST({step[0]} AS BIGINT),
         CAST({step[1]} AS BIGINT),
         CAST({step[2]} AS BIGINT),
         CAST({step[3]} AS BIGINT)
  FROM dp
  JOIN idx i ON i.event_type = dp.event_type AND i.i = dp.i + 1
  JOIN pat p ON p.event_type = i.event_type
)
SELECT d.event_type, m.n AS n_days, d.dp4 AS dtw_cost
FROM dp d JOIN meta m ON m.event_type = d.event_type AND d.i = m.n
"""


@query("ts_dtw_pattern", oracle=_dtw_oracle())
def ts_dtw_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic-time-warping distance of each event-type's daily-total
    series (integer cents) to a dip-spike-recover-surge reference pattern
    expressed as percentages of the series' own mean daily total — "which
    signal's shape best matches the template, allowing time stretch".
    Exact integer DP (cost = |x_i − p_j|, the classic three-way min
    recurrence); the oracle replays the same DP as a recursive CTE that
    carries the 4 pattern-column DP values row by row, so an inherently
    sequential algorithm still gets an exact value-hash check.

    Scale shape: the shuffle carries one row per (type, day) — the daily
    collapse happens map-side — and the DP runs per-key in one Arrow batch
    (applyInPandas), O(n_days · |pattern|) per key. Like
    ts_mann_kendall_trend, the per-key series length is date-range-bounded
    (90 days here), not corpus-bounded: 100 TB of events collapses to the
    same 90 rows per key before the Python stage sees it."""
    ev = load(spark, sf_dir, "events")
    daily = (
        ev.select(
            "event_type",
            F.to_date("ts").alias("d"),
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
        .groupBy("event_type", "d")
        .agg(F.sum("cents").cast("long").alias("x"))
    )
    pct = DTW_PATTERN_PCT
    out_schema = "event_type string, n_days long, dtw_cost long"

    def dtw(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("d")
        xs = [int(v) for v in pdf["x"]]
        n = len(xs)
        mu = sum(xs) // n
        pat = [mu * c // 100 for c in pct]
        prev = [abs(xs[0] - pat[0])]
        for j in range(1, 4):
            prev.append(prev[-1] + abs(xs[0] - pat[j]))
        for i in range(1, n):
            cur = [abs(xs[i] - pat[0]) + prev[0]]
            for j in range(1, 4):
                cur.append(abs(xs[i] - pat[j]) + min(prev[j], cur[j - 1], prev[j - 1]))
            prev = cur
        return pd.DataFrame(
            {
                "event_type": [pdf["event_type"].iloc[0]],
                "n_days": [n],
                "dtw_cost": [prev[3]],
            }
        )

    return daily.groupBy("event_type").applyInPandas(dtw, out_schema)


# --------------------------------------------------------------------------
# 3. Kruskal-Wallis omnibus rank test
# --------------------------------------------------------------------------


@query(
    "stat_kruskal_wallis",
    oracle="""
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
acc AS (
  SELECT CAST(count(*) AS BIGINT) AS k,
         CAST(sum(n_g) AS BIGINT) AS n,
         CAST(sum(CAST(round((CAST(r2_g AS DOUBLE) / 2)
                             * (CAST(r2_g AS DOUBLE) / 2) / n_g) AS BIGINT))
              AS BIGINT) AS s_rank
  FROM per_group
),
ties AS (
  SELECT CAST(sum(c * c * c - c) AS BIGINT) AS tie3 FROM byv
)
SELECT a.n, a.k,
       round(12.0 * a.s_rank / (a.n * (a.n + 1.0)) - 3.0 * (a.n + 1), 6)
         AS h_stat,
       round((12.0 * a.s_rank / (a.n * (a.n + 1.0)) - 3.0 * (a.n + 1))
             / (1.0 - CAST(t.tie3 AS DOUBLE)
                      / (CAST(a.n AS DOUBLE) * a.n * a.n - a.n)), 6)
         AS h_tie_corrected
FROM acc a, ties t
""",
)
def stat_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal-Wallis H across ALL event types (the k-group omnibus
    sibling of stat_mann_whitney_u, same doubled-midrank identity:
    2·R_g = Σ c_g·(2·below + c + 1), exact BIGINT). Per-group rank terms
    (R_g²/n_g) are rounded to integer units BEFORE the cross-group sum so
    the only floating-point additions happen over exact BIGINTs — the sum
    is order-free and the engines agree bit-for-bit. Tie correction
    H' = H / (1 − Σ(t³−t)/(N³−N)).

    Scale shape: two hash-aggs to the distinct-value table (bounded: cents
    granularity), Fenwick prefix-sum joins for the cumulative counts (no
    window — r7), k-row reduce. Raw rows never cross the shuffle as more
    than (type, value, count)."""
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
    acc = per_group.agg(
        F.count("*").cast("long").alias("k"),
        F.sum("n_g").cast("long").alias("n"),
        F.sum(
            F.round(
                (F.col("r2_g").cast("double") / 2)
                * (F.col("r2_g").cast("double") / 2)
                / F.col("n_g")
            ).cast("long")
        )
        .cast("long")
        .alias("s_rank"),
    )
    ties = byv.agg(
        F.sum(F.col("c") * F.col("c") * F.col("c") - F.col("c"))
        .cast("long")
        .alias("tie3")
    )
    h = 12.0 * F.col("s_rank") / (F.col("n") * (F.col("n") + F.lit(1.0))) - 3.0 * (
        F.col("n") + 1
    )
    return acc.crossJoin(ties).select(
        "n",
        "k",
        F.round(h, 6).alias("h_stat"),
        F.round(
            h
            / (
                F.lit(1.0)
                - F.col("tie3").cast("double")
                / (
                    F.col("n").cast("double") * F.col("n") * F.col("n")
                    - F.col("n")
                )
            ),
            6,
        ).alias("h_tie_corrected"),
    )


# --------------------------------------------------------------------------
# 4. Brier score + Murphy decomposition
# --------------------------------------------------------------------------


@query(
    "eval_brier_decomposition",
    oracle="""
WITH preds AS (
  SELECT (event_id * 37 + 11) % 1000 AS p_milli,
         CASE WHEN (event_id * 101 + 7) % 997
                   < (((event_id * 37 + 11) % 1000) * 997) // 1000
              THEN 1 ELSE 0 END AS y
  FROM events
),
bins AS (
  SELECT p_milli // 100 AS bin,
         CAST(count(*) AS BIGINT) AS n_b,
         CAST(sum(p_milli) AS BIGINT) AS sp,
         CAST(sum(y) AS BIGINT) AS sy
  FROM preds GROUP BY 1
),
tot AS (
  SELECT CAST(sum(n_b) AS BIGINT) AS n, CAST(sum(sy) AS BIGINT) AS sy_all,
         CAST(sum(CAST(round((sp - 1000.0 * sy) * (sp - 1000.0 * sy) / n_b)
                       AS BIGINT)) AS BIGINT) AS rel_raw
  FROM bins
),
res_t AS (
  SELECT CAST(sum(CAST(round(n_b
           * (1000.0 * sy / n_b - 1000.0 * t.sy_all / t.n)
           * (1000.0 * sy / n_b - 1000.0 * t.sy_all / t.n)) AS BIGINT))
         AS BIGINT) AS res_raw
  FROM bins, tot t
),
brier_t AS (
  SELECT CAST(sum((p_milli - 1000 * y) * (p_milli - 1000 * y)) AS BIGINT)
           AS b_raw
  FROM preds
)
SELECT t.n,
       round(CAST(b.b_raw AS DOUBLE) / (t.n * 1000000.0), 6) AS brier,
       round(CAST(t.rel_raw AS DOUBLE) / (t.n * 1000000.0), 6) AS reliability,
       round(CAST(r.res_raw AS DOUBLE) / (t.n * 1000000.0), 6) AS resolution,
       round((CAST(t.sy_all AS DOUBLE) / t.n)
             * (1.0 - CAST(t.sy_all AS DOUBLE) / t.n), 6) AS uncertainty
FROM tot t, res_t r, brier_t b
""",
)
def eval_brier_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brier score with the Murphy reliability/resolution/uncertainty
    decomposition over probability deciles, for a deterministic synthetic
    forecaster (p = affine-mod milli-probability of event_id; outcome drawn
    by a second affine-mod coin calibrated to p, so the forecaster is
    roughly reliable and the decomposition is non-degenerate). All base
    aggregates are exact BIGINTs in milli-units; the per-bin REL/RES terms
    round to integer units before the 10-term cross-bin sum (same
    order-free-sum discipline as stat_kruskal_wallis). brier ≈ reliability
    − resolution + uncertainty up to within-decile forecast variance (the
    textbook identity is exact only for bin-constant forecasts).

    Scale shape: one hash-agg to 10 decile rows, two scalar reduces."""
    ev = load(spark, sf_dir, "events")
    preds = ev.select(
        ((F.col("event_id") * 37 + 11) % 1000).alias("p_milli"),
        F.when(
            (F.col("event_id") * 101 + 7) % 997
            < F.expr("(((event_id * 37 + 11) % 1000) * 997) div 1000"),
            1,
        )
        .otherwise(0)
        .alias("y"),
    )
    bins = preds.groupBy(F.expr("p_milli div 100").alias("bin")).agg(
        F.count("*").cast("long").alias("n_b"),
        F.sum("p_milli").cast("long").alias("sp"),
        F.sum("y").cast("long").alias("sy"),
    )
    tot = bins.agg(
        F.sum("n_b").cast("long").alias("n"),
        F.sum("sy").cast("long").alias("sy_all"),
        F.sum(
            F.round(
                (F.col("sp") - 1000.0 * F.col("sy"))
                * (F.col("sp") - 1000.0 * F.col("sy"))
                / F.col("n_b")
            ).cast("long")
        )
        .cast("long")
        .alias("rel_raw"),
    )
    ybar_b = 1000.0 * F.col("sy") / F.col("n_b")
    ybar = 1000.0 * F.col("sy_all") / F.col("n")
    res_t = bins.crossJoin(tot.select("n", "sy_all")).agg(
        F.sum(
            F.round(F.col("n_b") * (ybar_b - ybar) * (ybar_b - ybar)).cast("long")
        )
        .cast("long")
        .alias("res_raw")
    )
    brier_t = preds.agg(
        F.sum(
            (F.col("p_milli") - 1000 * F.col("y"))
            * (F.col("p_milli") - 1000 * F.col("y"))
        )
        .cast("long")
        .alias("b_raw")
    )
    denom = F.col("n") * F.lit(1000000.0)
    return (
        tot.crossJoin(res_t)
        .crossJoin(brier_t)
        .select(
            "n",
            F.round(F.col("b_raw").cast("double") / denom, 6).alias("brier"),
            F.round(F.col("rel_raw").cast("double") / denom, 6).alias(
                "reliability"
            ),
            F.round(F.col("res_raw").cast("double") / denom, 6).alias(
                "resolution"
            ),
            F.round(
                (F.col("sy_all").cast("double") / F.col("n"))
                * (1.0 - F.col("sy_all").cast("double") / F.col("n")),
                6,
            ).alias("uncertainty"),
        )
    )


# --------------------------------------------------------------------------
# 5. AMS F2 sketch
# --------------------------------------------------------------------------

AMS_REPS = 16


@query(
    "sketch_ams_f2",
    oracle=f"""
WITH counts AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS c FROM events GROUP BY user_id
),
reps AS (SELECT unnest(range(0, {AMS_REPS})) AS r),
signs AS (
  SELECT k.user_id, k.c, reps.r,
         CASE WHEN CAST(('0x' || substring(md5(CAST(k.user_id AS VARCHAR)
                || '#' || CAST(reps.r AS VARCHAR)), 1, 8)) AS BIGINT) % 2 = 0
              THEN 1 ELSE -1 END AS s
  FROM counts k, reps
),
z AS (
  SELECT r, CAST(sum(c * s) AS BIGINT) AS zr FROM signs GROUP BY r
),
est AS (
  SELECT r, zr * zr AS e,
         CAST(row_number() OVER (ORDER BY zr * zr, r) AS BIGINT) AS rn
  FROM z
),
exact AS (SELECT CAST(sum(c * c) AS BIGINT) AS f2,
                 CAST(count(*) AS BIGINT) AS n_keys FROM counts)
SELECT x.n_keys, x.f2 AS exact_f2,
       CAST(sum(CASE WHEN e.rn IN ({AMS_REPS // 2}, {AMS_REPS // 2 + 1})
                     THEN e.e ELSE 0 END) AS BIGINT) AS est_med2x,
       round(abs(CAST(sum(CASE WHEN e.rn IN ({AMS_REPS // 2},
                                             {AMS_REPS // 2 + 1})
                               THEN e.e ELSE 0 END) AS DOUBLE) / 2 - x.f2)
             / x.f2, 4) AS rel_err
FROM est e, exact x
GROUP BY x.n_keys, x.f2
""",
)
def sketch_ams_f2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Alon-Matias-Szegedy F2 (second frequency moment / self-join size)
    sketch over per-user event counts: {AMS_REPS} independent ±1
    md5-derived sign functions, Z_r = Σ c_u·s_r(u), estimator = median of
    Z_r² (reported as the sum of the two middle order statistics, an exact
    BIGINT), against the exact F2 = Σ c_u². The sketch state is
    {AMS_REPS} counters TOTAL — the streaming/distributed F2 answer: each
    partition keeps 16 signed sums, merge = add (the map-side combine does
    exactly this), the final estimate needs no key table at all.

    Scale shape: explode ×{AMS_REPS} happens AFTER the per-user collapse;
    the second agg reduces to {AMS_REPS} rows regardless of corpus size.
    Reference parity: duplicate-URL mass in ingest.py's seen-set is an F2
    question ("how concentrated are re-fetches") answerable in 16 ints."""
    ev = load(spark, sf_dir, "events")
    counts = ev.groupBy("user_id").agg(F.count("*").cast("long").alias("c"))
    reps = spark.range(AMS_REPS).select(F.col("id").alias("r"))
    h = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    "#", F.col("user_id").cast("string"), F.col("r").cast("string")
                )
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    signs = counts.crossJoin(F.broadcast(reps)).select(
        "user_id", "c", "r", F.when(h % 2 == 0, 1).otherwise(-1).alias("s")
    )
    z = signs.groupBy("r").agg(F.sum(F.col("c") * F.col("s")).cast("long").alias("zr"))
    est = z.select(
        "r",
        (F.col("zr") * F.col("zr")).alias("e"),
        F.row_number()
        .over(Window.orderBy(F.col("zr") * F.col("zr"), "r"))
        .cast("long")
        .alias("rn"),
    )
    exact = counts.agg(
        F.sum(F.col("c") * F.col("c")).cast("long").alias("f2"),
        F.count("*").cast("long").alias("n_keys"),
    )
    mid = (AMS_REPS // 2, AMS_REPS // 2 + 1)
    med2 = F.sum(
        F.when(F.col("rn").isin(*mid), F.col("e")).otherwise(F.lit(0))
    ).cast("long")
    return (
        est.crossJoin(F.broadcast(exact))
        .groupBy("n_keys", "f2")
        .agg(
            med2.alias("est_med2x"),
            F.round(
                F.abs(med2.cast("double") / 2 - F.col("f2")) / F.col("f2"), 4
            ).alias("rel_err"),
        )
        .select(
            "n_keys",
            F.col("f2").alias("exact_f2"),
            "est_med2x",
            "rel_err",
        )
    )


# --------------------------------------------------------------------------
# 6. Randomized response
# --------------------------------------------------------------------------


@query(
    "privacy_rr_estimate",
    oracle="""
WITH rr AS (
  SELECT CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS s,
         CASE WHEN (event_id * 73 + 19) % 1000 < 250 THEN 1 ELSE 0 END
           AS flip
  FROM events
),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(s) AS BIGINT) AS true_cnt,
         CAST(sum(CASE WHEN flip = 1 THEN 1 - s ELSE s END) AS BIGINT)
           AS obs_cnt
  FROM rr
)
SELECT n, true_cnt, obs_cnt,
       (1000000 * true_cnt) // n AS true_rate_1e6,
       (1000000 * obs_cnt) // n AS obs_rate_1e6,
       (2000000 * obs_cnt - 500000 * n) // n AS est_rate_1e6
FROM agg
""",
)
def privacy_rr_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Warner randomized response: each event reports its sensitive bit
    (event_type = 'error') flipped with probability gamma = 1/4 by a
    deterministic affine-mod coin; the debiased estimator
    p̂ = (obs − gamma)/(1 − 2·gamma) = 2·obs − 1/2 recovers the true rate
    from the perturbed reports. All rates in exact integer parts-per-
    million (floor division) — the estimate, observed, and ground-truth
    rates are emitted side-by-side so the debiasing is visible.

    Scale shape: one map-side-combined scalar aggregate; the flip is
    per-row arithmetic in codegen. This is the local-DP collection
    pattern: no raw sensitive bit ever needs to be stored centrally."""
    ev = load(spark, sf_dir, "events")
    rr = ev.select(
        F.when(F.col("event_type") == "error", 1).otherwise(0).alias("s"),
        F.when((F.col("event_id") * 73 + 19) % 1000 < 250, 1)
        .otherwise(0)
        .alias("flip"),
    )
    agg = rr.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("s").cast("long").alias("true_cnt"),
        F.sum(
            F.when(F.col("flip") == 1, 1 - F.col("s")).otherwise(F.col("s"))
        )
        .cast("long")
        .alias("obs_cnt"),
    )
    return agg.select(
        "n",
        "true_cnt",
        "obs_cnt",
        F.expr("(1000000 * true_cnt) div n").alias("true_rate_1e6"),
        F.expr("(1000000 * obs_cnt) div n").alias("obs_rate_1e6"),
        F.expr("(2000000 * obs_cnt - 500000 * n) div n").alias("est_rate_1e6"),
    )
