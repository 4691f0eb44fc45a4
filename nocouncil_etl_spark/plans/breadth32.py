"""Breadth batch 32 (round 6): segmented trend, directed motifs, DDSketch,
SVM hinge GD, Poisson dispersion, regression diagnostics.

Six operators (reference scope: regime shifts in the fetch-rate series,
link-graph micro-structure, latency-quantile sketching, a margin-based
error gate, count overdispersion, and trend-model health checks):

- ``ts_segmented_trend``    — two-segment least-squares fit with a grid
  argmin over breakpoints (the minimal changepoint regression).
- ``graph_motif_ffl``       — directed 3-node motif census: feed-forward
  loops vs 3-cycles (Milo et al. network motifs).
- ``sketch_ddsketch_log2``  — base-2 DDSketch: power-of-two bucket
  histogram with relative-error-bounded quantiles, exact twin inline.
- ``ml_svm_hinge_gd``       — linear SVM by 3 rounds of exact fixed-point
  subgradient descent on the hinge loss.
- ``stat_poisson_dispersion`` — per-type overdispersion index and the
  chi-square dispersion test on daily counts.
- ``ml_regression_diagnostics`` — linear-trend OLS with R2 and the
  Durbin-Watson autocorrelation statistic on milli-rounded residuals.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nocouncil_etl_spark.io import load
from nocouncil_etl_spark.operators.quantiles import cumulate
from nocouncil_etl_spark.plans.graph_plans import _EDGES_SQL, _graph
from nocouncil_etl_spark.registry import query

# --------------------------------------------------------------------------
# 1. Two-segment trend with breakpoint grid
# --------------------------------------------------------------------------

SEG_MARGIN = 5  # breakpoint grid: b in [SEG_MARGIN, n - SEG_MARGIN]

# centered-moment RSS of one segment, from raw BIGINT moments (identical
# expression text in both engines so the doubles agree bit-for-bit)
_RSS = (
    "((CAST({p}syy AS DOUBLE) - CAST({p}sy AS DOUBLE) * {p}sy / {p}n)"
    " - (CAST({p}sty AS DOUBLE) - CAST({p}st AS DOUBLE) * {p}sy / {p}n)"
    "   * (CAST({p}sty AS DOUBLE) - CAST({p}st AS DOUBLE) * {p}sy / {p}n)"
    "   / (CAST({p}stt AS DOUBLE) - CAST({p}st AS DOUBLE) * {p}st / {p}n))"
)


def _seg_oracle() -> str:
    rss1 = _RSS.format(p="l.")
    rss2 = _RSS.format(p="r.")
    return f"""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS d,
         CAST(sum(CAST(round(value) AS BIGINT)) AS BIGINT) AS y
  FROM events GROUP BY 1, 2
),
idx AS (
  SELECT event_type,
         CAST(row_number() OVER (PARTITION BY event_type ORDER BY d)
              AS BIGINT) AS t,
         y,
         CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
  FROM daily
),
bks AS (
  SELECT DISTINCT event_type, t AS b FROM idx
  WHERE t >= {SEG_MARGIN} AND t <= n - {SEG_MARGIN}
),
seg AS (
  SELECT i.event_type, k.b, CASE WHEN i.t <= k.b THEN 0 ELSE 1 END AS s,
         CAST(count(*) AS BIGINT) AS n, CAST(sum(i.t) AS BIGINT) AS st,
         CAST(sum(i.y) AS BIGINT) AS sy,
         CAST(sum(i.t * i.t) AS BIGINT) AS stt,
         CAST(sum(i.t * i.y) AS BIGINT) AS sty,
         CAST(sum(i.y * i.y) AS BIGINT) AS syy
  FROM idx i JOIN bks k ON i.event_type = k.event_type
  GROUP BY 1, 2, 3
),
scored AS (
  SELECT l.event_type, l.b, round({rss1} + {rss2}, 4) AS rss
  FROM (SELECT * FROM seg WHERE s = 0) l
  JOIN (SELECT * FROM seg WHERE s = 1) r
    ON l.event_type = r.event_type AND l.b = r.b
)
SELECT event_type, b AS best_b, rss FROM (
  SELECT *, row_number() OVER (PARTITION BY event_type
                               ORDER BY rss, b) AS rk
  FROM scored
) WHERE rk = 1
"""


@query("ts_segmented_trend", oracle=_seg_oracle())
def ts_segmented_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimal changepoint regression: fit a separate least-squares line
    to each side of every candidate breakpoint b (grid: all days at least
    {SEG_MARGIN} in from each edge) and keep the b minimizing total RSS —
    "when did the trend change?". Segment moments are exact BIGINTs; the
    two RSS terms are the identical centered-moment expression text in
    both engines (granger discipline), rounded to 4 decimals BEFORE the
    argmin so the ranking is stable.

    Scale shape: the day x breakpoint fan-out runs on the date-range-
    bounded daily table (n_days² rows per type, n_days ≤ date range, not
    corpus size); one hash-agg to (type, b, segment) moments, one k-row
    window. 100 TB of events changes none of it."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy("event_type", F.to_date("ts").alias("d")).agg(
        F.sum(F.round("value").cast("long")).cast("long").alias("y")
    )
    win = Window.partitionBy("event_type")
    idx = daily.select(
        "event_type",
        F.row_number().over(win.orderBy("d")).cast("long").alias("t"),
        "y",
        F.count("*").over(win).cast("long").alias("n"),
    )
    bks = (
        idx.filter(
            (F.col("t") >= SEG_MARGIN) & (F.col("t") <= F.col("n") - SEG_MARGIN)
        )
        .select("event_type", F.col("t").alias("b"))
        .distinct()
    )
    seg = (
        idx.join(bks, "event_type")
        .groupBy(
            "event_type",
            "b",
            F.when(F.col("t") <= F.col("b"), 0).otherwise(1).alias("s"),
        )
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("t").cast("long").alias("st"),
            F.sum("y").cast("long").alias("sy"),
            F.sum(F.col("t") * F.col("t")).cast("long").alias("stt"),
            F.sum(F.col("t") * F.col("y")).cast("long").alias("sty"),
            F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
        )
    )
    left = seg.filter(F.col("s") == 0).select(
        "event_type", "b",
        *[F.col(c).alias(f"lq_{c}") for c in ("n", "st", "sy", "stt", "sty", "syy")],
    )
    right = seg.filter(F.col("s") == 1).select(
        "event_type", "b",
        *[F.col(c).alias(f"rq_{c}") for c in ("n", "st", "sy", "stt", "sty", "syy")],
    )
    rss = F.expr(
        "round("
        + _RSS.format(p="lq_")
        + " + "
        + _RSS.format(p="rq_")
        + ", 4)"
    )
    scored = left.join(right, ["event_type", "b"]).select(
        "event_type", "b", rss.alias("rss")
    )
    return (
        scored.withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("event_type").orderBy("rss", "b")
            ),
        )
        .filter(F.col("rk") == 1)
        .select("event_type", F.col("b").alias("best_b"), "rss")
    )


# --------------------------------------------------------------------------
# 2. Directed 3-node motif census
# --------------------------------------------------------------------------


@query(
    "graph_motif_ffl",
    oracle=f"""
WITH {_EDGES_SQL},
e AS (SELECT DISTINCT src, dst FROM edges0 WHERE src <> dst),
p2 AS (
  SELECT a.src AS x, a.dst AS y, b.dst AS z
  FROM e a JOIN e b ON a.dst = b.src
  WHERE a.src <> b.dst
),
ffl AS (
  SELECT CAST(count(*) AS BIGINT) AS n
  FROM p2 JOIN e c ON p2.x = c.src AND p2.z = c.dst
),
cyc AS (
  SELECT CAST(count(*) AS BIGINT) AS n
  FROM p2 JOIN e c ON p2.z = c.src AND p2.x = c.dst
)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM e) AS n_edges,
       (SELECT CAST(count(*) AS BIGINT) FROM p2) AS n_paths2,
       (SELECT n FROM ffl) AS n_ffl,
       (SELECT n FROM cyc) // 3 AS n_cycles
""",
)
def graph_motif_ffl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed 3-node motif census on the deterministic link graph (Milo
    et al. 2002): feed-forward loops (x→y→z closed by the shortcut x→z —
    the signal-processing motif) vs directed 3-cycles (x→y→z→x — the
    feedback motif, counted once per cycle: the raw path-closure count is
    exactly 3 rotations). Exact integer joins only.

    Scale shape: the 2-path join is the standard triangle-join bound
    (Sigma out-deg·in-deg); the closures are equi-joins of the path set
    back to the edge list. At web scale the same top-degree cap as
    graph_resource_allocation applies. Reference parity: ingest.py's
    link graph — FFL density distinguishes hierarchy from circular
    citation."""
    nodes, edges, n = _graph(spark, sf_dir)
    e = (
        edges.select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        # consumed four times (two path sides + two closures)
        .localCheckpoint(eager=True)
    )
    a = e.select(F.col("src").alias("x"), F.col("dst").alias("y"))
    b = e.select(F.col("src").alias("y"), F.col("dst").alias("z"))
    p2 = a.join(b, "y").filter(F.col("x") != F.col("z"))
    closure = e.select(F.col("src").alias("x"), F.col("dst").alias("z"))
    back = e.select(F.col("src").alias("z"), F.col("dst").alias("x"))
    n_edges = e.count()
    n_paths2 = p2.count()
    n_ffl = p2.join(closure, ["x", "z"]).count()
    n_cyc = p2.join(back, ["z", "x"]).count() // 3
    return spark.createDataFrame(
        [(n_edges, n_paths2, n_ffl, n_cyc)],
        "n_edges BIGINT, n_paths2 BIGINT, n_ffl BIGINT, n_cycles BIGINT",
    )


# --------------------------------------------------------------------------
# 3. Base-2 DDSketch quantiles
# --------------------------------------------------------------------------

DD_PS = (50, 95, 99)


@query(
    "sketch_ddsketch_log2",
    oracle=f"""
WITH cents AS (
  SELECT greatest(CAST(round(value * 100) AS BIGINT), 1) AS v FROM events
),
bucketed AS (
  SELECT CAST(length(bin(v)) - 1 AS BIGINT) AS bk,
         CAST(count(*) AS BIGINT) AS c
  FROM cents GROUP BY 1
),
cum AS (
  SELECT bk, c,
         CAST(sum(c) OVER (ORDER BY bk) AS BIGINT) AS cum,
         CAST(sum(c) OVER () AS BIGINT) AS n
  FROM bucketed
),
ps AS (SELECT unnest([{', '.join(str(p) for p in DD_PS)}]) AS p),
hit AS (
  SELECT ps.p, min(cum.bk) AS bk
  FROM ps JOIN cum ON cum.cum * 100 >= ps.p * cum.n
  GROUP BY ps.p
),
byv AS (SELECT v, CAST(count(*) AS BIGINT) AS c FROM cents GROUP BY v),
cv AS (
  SELECT v, CAST(sum(c) OVER (ORDER BY v) AS BIGINT) AS cum,
         CAST(sum(c) OVER () AS BIGINT) AS n
  FROM byv
),
exact AS (
  SELECT ps.p, min(cv.v) AS exact_v
  FROM ps JOIN cv ON cv.cum * 100 >= ps.p * cv.n
  GROUP BY ps.p
)
SELECT h.p, h.bk,
       CAST(2 ** h.bk AS BIGINT) AS lb,
       CAST(2 ** (h.bk + 1) - 1 AS BIGINT) AS ub,
       x.exact_v
FROM hit h JOIN exact x ON h.p = x.p
""",
)
def sketch_ddsketch_log2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Base-2 DDSketch over event value cents: every value collapses to
    its power-of-two bucket floor(log2 v) — computed EXACTLY as
    length(bin(v))−1, no floating log — and each requested quantile is
    answered from the cumulative bucket histogram with a guaranteed
    relative error ≤ 2x (the value provably lies in [2^bk, 2^(bk+1))).
    The exact nearest-rank quantile is computed inline beside it so the
    containment guarantee is checkable in the result (asserted in
    tests/test_breadth32.py).

    Scale shape: sketch state is ≤ 64 counters TOTAL, merge = add — the
    mergeable-quantile answer when even sketch_quantile_histogram's grid
    is too wide to ship; the map-side combine does the whole reduction.
    The exact twin is the expensive path and exists for the oracle."""
    ev = load(spark, sf_dir, "events")
    cents = ev.select(
        F.greatest(F.round(F.col("value") * 100).cast("long"), F.lit(1)).alias("v")
    )
    bucketed = cents.groupBy(
        (F.length(F.bin("v")) - 1).cast("long").alias("bk")
    ).agg(F.count("*").cast("long").alias("c"))
    # r7: cumulative counts via Fenwick prefix sums; n via broadcast agg
    nb = bucketed.agg(F.sum("c").cast("long").alias("n"))
    cum = (
        cumulate(bucketed, "bk", ("c",))
        .crossJoin(F.broadcast(nb))
        .select("bk", F.col("cum_c").cast("long").alias("cum"), "n")
    )
    ps = spark.createDataFrame([(p,) for p in DD_PS], "p BIGINT")
    hit = (
        ps.crossJoin(cum)
        .filter(F.col("cum") * 100 >= F.col("p") * F.col("n"))
        .groupBy("p")
        .agg(F.min("bk").alias("bk"))
    )
    byv = cents.groupBy("v").agg(F.count("*").cast("long").alias("c"))
    nv = byv.agg(F.sum("c").cast("long").alias("n"))
    cv = (
        cumulate(byv, "v", ("c",))
        .crossJoin(F.broadcast(nv))
        .select("v", F.col("cum_c").cast("long").alias("cum"), "n")
    )
    exact = (
        ps.crossJoin(cv)
        .filter(F.col("cum") * 100 >= F.col("p") * F.col("n"))
        .groupBy("p")
        .agg(F.min("v").alias("exact_v"))
    )
    return hit.join(exact, "p").select(
        "p",
        "bk",
        F.expr("CAST(pow(2, bk) AS BIGINT)").alias("lb"),
        F.expr("CAST(pow(2, bk + 1) - 1 AS BIGINT)").alias("ub"),
        "exact_v",
    )


# --------------------------------------------------------------------------
# 4. Linear SVM via hinge subgradient descent
# --------------------------------------------------------------------------

SVM_ITERS = 3
SVM_LR0_DIV = 4
SVM_LR1_DIV = 25_000_000


def _svm_oracle() -> str:
    ctes = [
        "xy AS (SELECT CAST(round(value * 100) AS BIGINT) AS x,"
        " CASE WHEN event_type = 'error' THEN 1 ELSE -1 END AS y FROM events)",
        "p0 AS (SELECT CAST(0 AS BIGINT) AS b0, CAST(0 AS BIGINT) AS b1)",
    ]
    for i in range(SVM_ITERS):
        viol = "(p.b0 + p.b1 * x) * y < 1000000"
        ctes.append(
            f"""g{i} AS (
  SELECT p.b0, p.b1, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN {viol} THEN -y * 1000000 ELSE 0 END)
              AS BIGINT) AS g0,
         CAST(sum(CASE WHEN {viol} THEN -y * x ELSE 0 END) AS BIGINT) AS gx
  FROM xy, p{i} p GROUP BY p.b0, p.b1
)"""
        )
        ctes.append(
            f"p{i + 1} AS (SELECT b0 - (g0 // n) // {SVM_LR0_DIV} AS b0,"
            f" b1 - ((gx // n) * 1000000 // {SVM_LR1_DIV}) AS b1 FROM g{i})"
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT CAST(count(*) AS BIGINT) AS n, p.b0 AS b0_1e6, p.b1 AS b1_1e6,
       CAST(sum(CASE WHEN (p.b0 + p.b1 * x) * y < 1000000
                     THEN 1000000 - (p.b0 + p.b1 * x) * y // 1000000 * 1000000
                     ELSE 0 END) AS BIGINT) AS hinge_raw,
       (1000000 * CAST(sum(CASE WHEN ((p.b0 + p.b1 * x) >= 0) = (y = 1)
                                THEN 1 ELSE 0 END) AS BIGINT)) // count(*)
         AS acc_1e6
FROM xy, p{SVM_ITERS} p GROUP BY p.b0, p.b1
"""
    )


@query("ml_svm_hinge_gd", oracle=_svm_oracle())
def ml_svm_hinge_gd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear SVM (no-regularizer perceptron-with-margin form) trained by
    {SVM_ITERS} rounds of full-batch hinge subgradient descent in exact
    integer micro-units: rows with margin y·f(x) < 1 contribute −y (bias)
    and −y·x (weight) to the subgradient, updates use truncating integer
    division — the max-margin sibling of ml_logistic_gd, same bounded-
    driver-state layout (two BIGINTs), zero transcendentals. Emits the
    final params, a quantized total hinge loss, and training accuracy.

    Scale shape: one codegen'd scan + scalar aggregate per round —
    {SVM_ITERS}+1 scans at any corpus size."""
    ev = load(spark, sf_dir, "events")
    xy = ev.select(
        F.round(F.col("value") * 100).cast("long").alias("x"),
        F.when(F.col("event_type") == "error", 1).otherwise(-1).alias("y"),
    )
    b0, b1 = 0, 0

    def tdiv(a: int, b: int) -> int:
        q = abs(a) // b
        return -q if a < 0 else q

    for _ in range(SVM_ITERS):
        viol = (F.lit(b0) + F.lit(b1) * F.col("x")) * F.col("y") < 1000000
        g = xy.agg(
            F.count("*").cast("long").alias("n"),
            F.sum(F.when(viol, -F.col("y") * 1000000).otherwise(0))
            .cast("long")
            .alias("g0"),
            F.sum(F.when(viol, -F.col("y") * F.col("x")).otherwise(0))
            .cast("long")
            .alias("gx"),
        ).collect()[0]
        b0 = b0 - tdiv(tdiv(g.g0, g.n), SVM_LR0_DIV)
        b1 = b1 - tdiv(tdiv(g.gx, g.n) * 1000000, SVM_LR1_DIV)
    f_ = F.lit(b0) + F.lit(b1) * F.col("x")
    margin = f_ * F.col("y")
    return xy.agg(
        F.count("*").cast("long").alias("n"),
        F.lit(b0).cast("long").alias("b0_1e6"),
        F.lit(b1).cast("long").alias("b1_1e6"),
        F.sum(
            F.when(
                margin < 1000000,
                F.lit(1000000) - F.expr(
                    f"(({b0} + {b1} * x) * y) div 1000000 * 1000000"
                ),
            ).otherwise(0)
        )
        .cast("long")
        .alias("hinge_raw"),
        F.expr(
            f"(1000000 * CAST(sum(CASE WHEN (({b0} + {b1} * x) >= 0) = (y = 1)"
            " THEN 1 ELSE 0 END) AS BIGINT)) div count(*)"
        ).alias("acc_1e6"),
    )


# --------------------------------------------------------------------------
# 5. Poisson overdispersion test
# --------------------------------------------------------------------------


@query(
    "stat_poisson_dispersion",
    oracle="""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS d, CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
),
mom AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(c) AS BIGINT) AS sc,
         CAST(sum(c * c) AS BIGINT) AS scc
  FROM daily GROUP BY 1
)
SELECT event_type, n, sc AS total,
       round((CAST(scc AS DOUBLE) - CAST(sc AS DOUBLE) * sc / n) / (n - 1)
             / (CAST(sc AS DOUBLE) / n), 6) AS dispersion,
       round((CAST(scc AS DOUBLE) - CAST(sc AS DOUBLE) * sc / n)
             / (CAST(sc AS DOUBLE) / n), 4) AS chi2
FROM mom
""",
)
def stat_poisson_dispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson overdispersion check on each event-type's daily counts:
    dispersion index D = s²/x̄ (D ≈ 1 under Poisson arrivals, D ≫ 1 =
    bursty/clumped traffic, D < 1 = regularized) and the chi-square
    dispersion statistic (n−1)·D against χ²(n−1) — the one-line test for
    "is this feed actually Poisson?". Count moments are exact BIGINTs;
    the two ratios are fixed IEEE expressions.

    Scale shape: daily collapse map-side to a date-bounded table, one
    k-row moment agg. Reference parity: the arrival model behind
    ingest.py's politeness/rate-limit assumptions, checked from data."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy("event_type", F.to_date("ts").alias("d")).agg(
        F.count("*").cast("long").alias("c")
    )
    mom = daily.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("c").cast("long").alias("sc"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("scc"),
    )
    ssc = F.col("scc").cast("double") - F.col("sc").cast("double") * F.col(
        "sc"
    ) / F.col("n")
    mean = F.col("sc").cast("double") / F.col("n")
    return mom.select(
        "event_type",
        "n",
        F.col("sc").alias("total"),
        F.round(ssc / (F.col("n") - 1) / mean, 6).alias("dispersion"),
        F.round(ssc / mean, 4).alias("chi2"),
    )


# --------------------------------------------------------------------------
# 6. OLS trend diagnostics (R², Durbin-Watson)
# --------------------------------------------------------------------------

# slope/intercept of y ~ t from raw BIGINT moments, as shared expression text
_B_EXPR = (
    "((CAST(sty AS DOUBLE) - CAST(st AS DOUBLE) * sy / n)"
    " / (CAST(stt AS DOUBLE) - CAST(st AS DOUBLE) * st / n))"
)
_A_EXPR = f"((CAST(sy AS DOUBLE) - {_B_EXPR} * st) / n)"


@query(
    "ml_regression_diagnostics",
    oracle=f"""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS d,
         CAST(sum(CAST(round(value) AS BIGINT)) AS BIGINT) AS y
  FROM events GROUP BY 1, 2
),
idx AS (
  SELECT event_type,
         CAST(row_number() OVER (PARTITION BY event_type ORDER BY d)
              AS BIGINT) AS t,
         y
  FROM daily
),
mom AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(t) AS BIGINT) AS st, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(t * t) AS BIGINT) AS stt,
         CAST(sum(t * y) AS BIGINT) AS sty,
         CAST(sum(y * y) AS BIGINT) AS syy
  FROM idx GROUP BY 1
),
resid AS (
  SELECT i.event_type, i.t,
         CAST(round(1000 * (i.y - ({_A_EXPR} + {_B_EXPR} * i.t)))
              AS BIGINT) AS e
  FROM idx i JOIN mom ON i.event_type = mom.event_type
),
dw AS (
  SELECT event_type,
         CAST(sum(e * e) AS BIGINT) AS see,
         CAST(sum(CASE WHEN pe IS NULL THEN 0
                       ELSE (e - pe) * (e - pe) END) AS BIGINT) AS sd2
  FROM (
    SELECT event_type, e,
           lag(e) OVER (PARTITION BY event_type ORDER BY t) AS pe
    FROM resid
  ) GROUP BY 1
)
SELECT m.event_type, m.n,
       round({_B_EXPR}, 6) AS slope,
       round(1.0 - CAST(w.see AS DOUBLE) / 1000000
                   / (CAST(m.syy AS DOUBLE) - CAST(m.sy AS DOUBLE) * m.sy / m.n),
             6) AS r2,
       round(CAST(w.sd2 AS DOUBLE) / w.see, 6) AS durbin_watson
FROM mom m JOIN dw w ON m.event_type = w.event_type
""",
)
def ml_regression_diagnostics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-trend OLS per event type with the two diagnostics every
    forecast review asks for: R² (share of variance the trend explains)
    and Durbin-Watson (≈2 when residuals are uncorrelated; ≪2 = positive
    autocorrelation, the trend is missing structure). Residuals are
    rounded to exact integer MILLI-units immediately after the (identical
    IEEE) fit expression, so the DW/R² sums are order-free BIGINTs — the
    float-sum-order trap that breaks cross-engine hashing never opens.

    Scale shape: raw moments in one hash-agg; residuals live on the
    date-bounded daily table; lag is a per-key window. One scan of the
    events table total."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy("event_type", F.to_date("ts").alias("d")).agg(
        F.sum(F.round("value").cast("long")).cast("long").alias("y")
    )
    idx = daily.select(
        "event_type",
        F.row_number()
        .over(Window.partitionBy("event_type").orderBy("d"))
        .cast("long")
        .alias("t"),
        "y",
    )
    mom = idx.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("t").cast("long").alias("st"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("t") * F.col("t")).cast("long").alias("stt"),
        F.sum(F.col("t") * F.col("y")).cast("long").alias("sty"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
    )
    resid = idx.join(mom, "event_type").select(
        "event_type",
        "t",
        F.expr(f"CAST(round(1000 * (y - ({_A_EXPR} + {_B_EXPR} * t))) AS BIGINT)")
        .alias("e"),
    )
    lagw = Window.partitionBy("event_type").orderBy("t")
    dw = (
        resid.withColumn("pe", F.lag("e").over(lagw))
        .groupBy("event_type")
        .agg(
            F.sum(F.col("e") * F.col("e")).cast("long").alias("see"),
            F.sum(
                F.when(F.col("pe").isNull(), 0).otherwise(
                    (F.col("e") - F.col("pe")) * (F.col("e") - F.col("pe"))
                )
            )
            .cast("long")
            .alias("sd2"),
        )
    )
    syy_c = (
        F.col("syy").cast("double")
        - F.col("sy").cast("double") * F.col("sy") / F.col("n")
    )
    return mom.join(dw, "event_type").select(
        "event_type",
        "n",
        F.expr(f"round({_B_EXPR}, 6)").alias("slope"),
        F.round(
            1.0 - F.col("see").cast("double") / 1000000 / syy_c, 6
        ).alias("r2"),
        F.round(F.col("sd2").cast("double") / F.col("see"), 6).alias(
            "durbin_watson"
        ),
    )
