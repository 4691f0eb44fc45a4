"""Breadth batch 41 (round 6): spectral graph bisection, Bass diffusion
fit, interrupted time series, DFT periodogram top-k, positive-unlabeled
prior estimation, train/eval n-gram novelty.

Six operators (reference scope: eigenvector-based graph partitioning,
product-adoption curve fitting, single-series causal inference, spectral
cadence discovery beyond one probe bin, learning from positive-only
labels, and the memorization/novelty audit an LLM data pipeline runs on
its own split):

- ``graph_spectral_bisection``  — Fiedler-style bisection by integer
  power iteration on (cI − L), centered each step.
- ``ts_bass_diffusion``         — Bass (1969) innovation/imitation
  coefficients from the closed-form quadratic adoption regression.
- ``ts_interrupted_series``     — interrupted-time-series level and
  slope change at the series midpoint, exact pre/post OLS.
- ``ts_periodogram_topk``       — DFT power at periods 2..{PG_PMAX}
  via literal trig tables; top-{PG_TOP} cadences.
- ``ml_pu_prior_elkan``         — Elkan-Noto (2008) class prior from a
  50%-labeled positive set and a histogram calibrator, exact rationals.
- ``text_train_eval_overlap``   — per-source {TE_N}-gram novelty of the
  eval split against the train split (memorization audit).

Reference parity: north-star extension — no reference analogue
(the reference has no analytics layer); the split-novelty audit is the hygiene check its
corpus pipeline (fetch→clean→vectorize) never runs but any training-data
engine must.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nocouncil_etl_spark.io import fan_out, load
from nocouncil_etl_spark.plans.retrieval_plans import _TOK_SPARK, _TOK_SQL
from nocouncil_etl_spark.plans.graph_plans import _EDGES_SQL, _graph
from nocouncil_etl_spark.registry import query

SB_ITERS = 4
SB_SCALE = 1_000_000
PG_PMAX = 10
PG_TOP = 3
TE_N = 5  # shingle width for the novelty audit


# --------------------------------------------------------------------------
# 1. Spectral bisection
# --------------------------------------------------------------------------


def _sb_cte_body() -> str:
    """Unrolled power iteration on (cI − L) with per-step exact centering
    (scaled by n) and trunc-div renormalization to ±{SB_SCALE}."""
    cte = [f"WITH {_EDGES_SQL},"]
    cte.append(f"""
und AS MATERIALIZED (
  SELECT src AS a, dst AS b FROM edges0 UNION SELECT dst, src FROM edges0),
udeg AS MATERIALIZED (
  SELECT a AS node, CAST(count(*) AS BIGINT) AS d FROM und GROUP BY a),
cshift AS (SELECT max(d) + 1 AS c FROM udeg),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),
x0 AS MATERIALIZED (
  SELECT node, CASE WHEN node % 2 = 0 THEN {SB_SCALE}
                    ELSE -{SB_SCALE} END AS x
  FROM nodes
)""")
    for k in range(SB_ITERS):
        cte.append(f""",
mv{k} AS MATERIALIZED (
  SELECT p.node,
         ((SELECT c FROM cshift) - coalesce(g.d, 0)) * p.x
         + coalesce(s.acc, 0) AS y
  FROM x{k} p
  LEFT JOIN udeg g ON g.node = p.node
  LEFT JOIN (
    SELECT u.a AS node, sum(q.x) AS acc
    FROM und u JOIN x{k} q ON q.node = u.b GROUP BY u.a
  ) s ON s.node = p.node
),
ctr{k} AS MATERIALIZED (
  SELECT node, y * (SELECT n FROM nn) - (SELECT sum(y) FROM mv{k}) AS yc
  FROM mv{k}
),
mx{k} AS (SELECT max(abs(yc)) AS m FROM ctr{k}),
x{k + 1} AS MATERIALIZED (
  SELECT node, CAST(yc * {SB_SCALE} // (SELECT m FROM mx{k}) AS BIGINT) AS x
  FROM ctr{k}
)""")
    return "".join(cte)


def _sb_oracle() -> str:
    return (
        _sb_cte_body()
        + f""",
side AS (
  SELECT node, CASE WHEN x >= 0 THEN 1 ELSE 0 END AS side
  FROM x{SB_ITERS}
),
cutc AS (
  SELECT CAST(count(*) AS BIGINT) AS cut2
  FROM und u
  JOIN side sa ON sa.node = u.a
  JOIN side sb ON sb.node = u.b
  WHERE sa.side <> sb.side
)
SELECT s.side, CAST(count(*) AS BIGINT) AS n_nodes,
       CAST(sum(coalesce(g.d, 0)) AS BIGINT) AS volume,
       (SELECT cut2 FROM cutc) // 2 AS cut_edges
FROM side s LEFT JOIN udeg g ON g.node = s.node
GROUP BY s.side"""
    )


@query("graph_spectral_bisection", oracle=_sb_oracle())
def graph_spectral_bisection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fiedler-style spectral bisection by {SB_ITERS} integer power
    iterations on (cI − L), c = max degree + 1 (so the matrix is PSD and
    the dominant eigenvector of the shifted operator is the Laplacian's
    smallest): each step does the sparse matvec, projects out the trivial
    all-ones eigenvector by EXACT centering (y·n − Σy — no float mean
    anywhere), and renormalizes to ±{SB_SCALE} with truncate-toward-zero
    division (both engines' integer `div`). Node signs give the 2-way
    partition; emits per-side node count, volume, and the (shared) cut
    size. The linear-algebra sibling of graph_label_propagation —
    partition quality audited by graph_community_conductance's metric.

    Scale shape: per iteration one node-keyed equi-join matvec; the two
    normalizers (Σy, max|y|) cross the driver as SINGLE scalars and the
    iterate is localCheckpoint-ed — the documented bounded-lineage
    contract from operators/graph.py (a normalizer subquery would double
    the logical plan per iteration and choke Catalyst, exactly the HITS
    plan-explosion case); all arithmetic BIGINT."""
    nodes, edges, n_nodes = _graph(spark, sf_dir)
    und = (
        edges.select(F.col("src").alias("a"), F.col("dst").alias("b"))
        .unionByName(edges.select(F.col("dst").alias("a"), F.col("src").alias("b")))
        .distinct()
        # r11 opt: cache the edge list already partitioned on the per-
        # iteration join key, so the matvec's edges side is never
        # re-shuffled inside the loop (guide §2.4; same move as LPA/HITS)
        .repartition("b")
    )
    und.persist()
    udeg = und.groupBy(F.col("a").alias("node")).agg(
        F.count(F.lit(1)).cast("long").alias("d")
    )
    udeg.persist()
    c_shift = int(udeg.agg((F.max("d") + 1).alias("c")).first().c)
    x = nodes.select(
        "node",
        F.when(F.col("node") % 2 == 0, SB_SCALE)
        .otherwise(-SB_SCALE)
        .cast("long")
        .alias("x"),
    ).localCheckpoint(eager=True)
    for _ in range(SB_ITERS):
        acc = (
            und.join(
                x.select(F.col("node").alias("b"), F.col("x").alias("xb")), "b"
            )
            .groupBy(F.col("a").alias("node"))
            .agg(F.sum("xb").alias("acc"))
        )
        mv = (
            x.join(udeg, "node", "left")
            .join(acc, "node", "left")
            .select(
                "node",
                (
                    (c_shift - F.coalesce("d", F.lit(0))) * F.col("x")
                    + F.coalesce("acc", F.lit(0))
                ).alias("y"),
            )
            .localCheckpoint(eager=False)
        )
        # r11 opt (guide §1.2): ONE normalizer job per iteration instead
        # of three (eager checkpoint + Σy + max|yc|): yc = y·n − Σy is
        # MONOTONE in y, so max|yc| = max(y_max·n − Σy, Σy − y_min·n) —
        # (sum, max, min) come back in a single agg over the lazily
        # checkpointed matvec (the agg job materializes the blocks), and
        # the centered iterate needs no second pass. Identical integers.
        st = mv.agg(
            F.sum("y").alias("sy"), F.max("y").alias("mx"), F.min("y").alias("mn")
        ).first()
        sy = int(st.sy)
        m = max(int(st.mx) * n_nodes - sy, sy - int(st.mn) * n_nodes)
        ctr = mv.select(
            "node", (F.col("y") * n_nodes - F.lit(sy)).alias("yc")
        )
        x = ctr.select(
            "node",
            F.expr(f"yc * {SB_SCALE} div {m}").cast("long").alias("x"),
        ).localCheckpoint(eager=False)
    side = x.select(
        "node", F.when(F.col("x") >= 0, 1).otherwise(0).alias("side")
    )
    sa = side.select(F.col("node").alias("a"), F.col("side").alias("side_a"))
    sb = side.select(F.col("node").alias("b"), F.col("side").alias("side_b"))
    cutc = (
        und.join(sa, "a")
        .join(sb, "b")
        .filter(F.col("side_a") != F.col("side_b"))
        .agg(F.count(F.lit(1)).cast("long").alias("cut2"))
    )
    return (
        side.join(udeg, "node", "left")
        .groupBy("side")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_nodes"),
            F.sum(F.coalesce("d", F.lit(0))).cast("long").alias("volume"),
        )
        .crossJoin(F.broadcast(cutc))
        .select(
            "side",
            "n_nodes",
            "volume",
            F.expr("cut2 div 2").cast("long").alias("cut_edges"),
        )
    )


# --------------------------------------------------------------------------
# 2. Bass diffusion
# --------------------------------------------------------------------------


@query(
    "ts_bass_diffusion",
    oracle="""
WITH first AS (
  SELECT o_custkey, min(CAST(o_orderdate AS DATE)) AS day
  FROM orders GROUP BY o_custkey
),
adopt AS (
  SELECT CAST(date_trunc('week', day) AS DATE) AS wk,
         CAST(count(*) AS BIGINT) AS s
  FROM first GROUP BY 1
),
series AS (
  SELECT s,
         coalesce(sum(s) OVER (ORDER BY wk
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS nprev
  FROM adopt
),
mom AS (
  SELECT CAST(count(*) AS DOUBLE) AS n,
         CAST(sum(CAST(nprev AS HUGEINT)) AS DOUBLE) AS sx,
         CAST(sum(CAST(nprev AS HUGEINT) * nprev) AS DOUBLE) AS sxx,
         CAST(sum(CAST(nprev AS HUGEINT) * nprev * nprev) AS DOUBLE) AS sx3,
         CAST(sum(CAST(nprev AS HUGEINT) * nprev * nprev * nprev) AS DOUBLE)
           AS sx4,
         CAST(sum(CAST(s AS HUGEINT)) AS DOUBLE) AS sy,
         CAST(sum(CAST(s AS HUGEINT) * nprev) AS DOUBLE) AS sxy,
         CAST(sum(CAST(s AS HUGEINT) * nprev * nprev) AS DOUBLE) AS sx2y,
         CAST(count(*) AS BIGINT) AS n_weeks
  FROM series
),
coefs AS (
  SELECT n_weeks,
         n * (sxx * sx4 - sx3 * sx3) - sx * (sx * sx4 - sxx * sx3)
           + sxx * (sx * sx3 - sxx * sxx) AS det,
         sy * (sxx * sx4 - sx3 * sx3) - sxy * (sx * sx4 - sxx * sx3)
           + sx2y * (sx * sx3 - sxx * sxx) AS na,
         n * (sxy * sx4 - sx2y * sx3) - sx * (sy * sx4 - sx2y * sxx)
           + sxx * (sy * sx3 - sxy * sxx) AS nb,
         n * (sxx * sx2y - sx3 * sxy) - sx * (sx * sx2y - sx3 * sy)
           + sxx * (sx * sxy - sxx * sy) AS nc
  FROM mom
),
abc AS (
  SELECT n_weeks,
         CASE WHEN det <> 0 THEN na / det END AS a,
         CASE WHEN det <> 0 THEN nb / det END AS b,
         CASE WHEN det <> 0 THEN nc / det END AS c
  FROM coefs
),
solved AS (
  SELECT n_weeks, a, c,
         CASE WHEN c < 0 AND b * b - 4 * c * a > 0
              THEN (-b - sqrt(b * b - 4 * c * a)) / (2 * c) END AS m
  FROM abc
)
SELECT n_weeks,
       CASE WHEN m > 0 THEN CAST(round(1000000 * a / m) AS BIGINT) END
         AS p_micro,
       CASE WHEN m > 0 THEN CAST(round(1000000 * -c * m) AS BIGINT) END
         AS q_micro,
       CAST(round(m) AS BIGINT) AS m_units,
       CASE WHEN m > 0 AND a / m > 0 AND -c * m > 0
            THEN CAST(round(1000 * ln((-c * m) / (a / m))
                            / (a / m + -c * m)) AS BIGINT) END
         AS peak_t_milli
FROM solved
""",
)
def ts_bass_diffusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bass diffusion model (Bass 1969) fit to the customer adoption
    curve (first order per customer, weekly grain — the 1995-2001 order
    history gives a real multi-year curve): weekly new adopters S_t
    regress on cumulative adopters N_{t−1} and N², i.e.
    S = pM + (q−p)N − (q/M)N², solved in closed form by Cramer's rule.
    Moment sums up to ΣN⁴ are kept EXACT in 128-bit integers (HUGEINT /
    DECIMAL(38,0) — BIGINT would overflow the quartic at sf ≥ 1) and
    cast to identical doubles only for the determinant arithmetic; then
    p (innovation), q (imitation), market size M and the peak-adoption
    time ln(q/p)/(p+q) follow. Singular or non-concave fits yield NULLs
    by the same integer-decided guards on both engines.

    Scale shape: adoption series is two hash aggs; moments are one
    8-sum aggregate; the solve is 1-row arithmetic."""
    orders = load(spark, sf_dir, "orders")
    first = orders.groupBy("o_custkey").agg(
        F.min(F.col("o_orderdate").cast("date")).alias("day")
    )
    adopt = first.groupBy(
        F.date_trunc("week", "day").cast("date").alias("wk")
    ).agg(F.count(F.lit(1)).cast("long").alias("s"))
    w = Window.orderBy("wk").rowsBetween(Window.unboundedPreceding, -1)
    series = adopt.select(
        "s", F.coalesce(F.sum("s").over(w), F.lit(0)).alias("nprev")
    )
    np_, s_ = F.col("nprev"), F.col("s")
    dec = "decimal(38,0)"
    mom = series.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(np_.cast(dec)).cast("double").alias("sx"),
        F.sum((np_ * np_).cast(dec)).cast("double").alias("sxx"),
        F.sum((np_ * np_ * np_).cast(dec)).cast("double").alias("sx3"),
        F.sum((np_.cast(dec) * np_ * np_ * np_)).cast("double").alias("sx4"),
        F.sum(s_.cast(dec)).cast("double").alias("sy"),
        F.sum((s_ * np_).cast(dec)).cast("double").alias("sxy"),
        F.sum((s_.cast(dec) * np_ * np_)).cast("double").alias("sx2y"),
        F.count(F.lit(1)).cast("long").alias("n_weeks"),
    )
    n, sx, sxx = F.col("n"), F.col("sx"), F.col("sxx")
    sx3, sx4 = F.col("sx3"), F.col("sx4")
    sy, sxy, sx2y = F.col("sy"), F.col("sxy"), F.col("sx2y")
    det = (
        n * (sxx * sx4 - sx3 * sx3)
        - sx * (sx * sx4 - sxx * sx3)
        + sxx * (sx * sx3 - sxx * sxx)
    )
    na = (
        sy * (sxx * sx4 - sx3 * sx3)
        - sxy * (sx * sx4 - sxx * sx3)
        + sx2y * (sx * sx3 - sxx * sxx)
    )
    nb = (
        n * (sxy * sx4 - sx2y * sx3)
        - sx * (sy * sx4 - sx2y * sxx)
        + sxx * (sy * sx3 - sxy * sxx)
    )
    nc = (
        n * (sxx * sx2y - sx3 * sxy)
        - sx * (sx * sx2y - sx3 * sy)
        + sxx * (sx * sxy - sxx * sy)
    )
    guard = det != 0
    abc = mom.select(
        "n_weeks",
        F.when(guard, na / det).alias("a"),
        F.when(guard, nb / det).alias("b"),
        F.when(guard, nc / det).alias("c"),
    )
    m = F.when(
        (F.col("c") < 0)
        & (F.col("b") * F.col("b") - 4 * F.col("c") * F.col("a") > 0),
        (-F.col("b") - F.sqrt(F.col("b") * F.col("b") - 4 * F.col("c") * F.col("a")))
        / (2 * F.col("c")),
    )
    solved = abc.select("n_weeks", "a", "c", m.alias("m"))
    ok = F.col("m") > 0
    p = F.col("a") / F.col("m")
    q = -F.col("c") * F.col("m")
    return solved.select(
        "n_weeks",
        F.when(ok, F.round(1_000_000 * p).cast("long")).alias("p_micro"),
        F.when(ok, F.round(1_000_000 * q).cast("long")).alias("q_micro"),
        F.round("m").cast("long").alias("m_units"),
        F.when(
            ok & (p > 0) & (q > 0),
            F.round(1000 * F.log(q / p) / (p + q)).cast("long"),
        ).alias("peak_t_milli"),
    )


# --------------------------------------------------------------------------
# 3. Interrupted time series
# --------------------------------------------------------------------------


@query(
    "ts_interrupted_series",
    oracle="""
WITH cnt AS (
  SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS y
  FROM events GROUP BY 1
),
idx AS (
  SELECT y, CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS t,
         CAST(count(*) OVER () AS BIGINT) AS n
  FROM cnt
),
t0v AS (SELECT max(n) // 2 AS t0 FROM idx),
halves AS (
  SELECT CASE WHEN t < (SELECT t0 FROM t0v) THEN 0 ELSE 1 END AS half, t, y
  FROM idx
),
mom AS (
  SELECT half, CAST(count(*) AS BIGINT) AS n, CAST(sum(t) AS BIGINT) AS st,
         CAST(sum(t * t) AS BIGINT) AS stt, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(t * y) AS BIGINT) AS sty
  FROM halves GROUP BY half
),
fit AS (
  SELECT half,
         (CAST(n AS DOUBLE) * sty - CAST(st AS DOUBLE) * sy)
         / (CAST(n AS DOUBLE) * stt - CAST(st AS DOUBLE) * st) AS slope,
         (CAST(sy AS DOUBLE) - (CAST(n AS DOUBLE) * sty - CAST(st AS DOUBLE) * sy)
          / (CAST(n AS DOUBLE) * stt - CAST(st AS DOUBLE) * st) * st)
         / n AS icept
  FROM mom
)
SELECT (SELECT CAST(t0 AS BIGINT) FROM t0v) AS t0,
       CAST(round(1000 * pre.slope) AS BIGINT) AS pre_slope_milli,
       CAST(round(1000 * post.slope) AS BIGINT) AS post_slope_milli,
       CAST(round(1000 * (post.slope - pre.slope)) AS BIGINT)
         AS slope_change_milli,
       CAST(round(1000 * ((post.icept + post.slope * (SELECT t0 FROM t0v))
                  - (pre.icept + pre.slope * (SELECT t0 FROM t0v))))
            AS BIGINT) AS level_change_milli
FROM (SELECT * FROM fit WHERE half = 0) pre
CROSS JOIN (SELECT * FROM fit WHERE half = 1) post
""",
)
def ts_interrupted_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interrupted time series at the series midpoint: independent OLS
    fits of the daily event count on time for the pre and post halves
    (slopes/intercepts from exact integer moments — the
    agg_linear_regression kernel twice), then the two ITS effect
    estimates: the LEVEL change (gap between the post fit and the
    pre-trend counterfactual at the interruption) and the SLOPE change.
    The single-series sibling of eval_diff_in_diff — same counterfactual
    logic, trend-projected instead of control-differenced.

    Scale shape: calendar-sized frame, one rank window, one 2-group
    5-moment hash agg, 1-row join."""
    cnt = (
        load(spark, sf_dir, "events")
        .groupBy(F.col("ts").cast("date").alias("day"))
        .agg(F.count(F.lit(1)).cast("long").alias("y"))
    )
    idx = cnt.select(
        "y",
        F.row_number().over(Window.orderBy("day")).cast("long").alias("t"),
    )
    nrow = idx.agg(F.floor(F.max("t") / 2).cast("long").alias("t0"))
    halves = idx.crossJoin(F.broadcast(nrow)).select(
        F.when(F.col("t") < F.col("t0"), 0).otherwise(1).alias("half"),
        "t",
        "y",
        "t0",
    )
    mom = halves.groupBy("half").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("t").cast("long").alias("st"),
        F.sum(F.col("t") * F.col("t")).cast("long").alias("stt"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("t") * F.col("y")).cast("long").alias("sty"),
        F.max("t0").alias("t0"),
    )
    slope = (
        F.col("n").cast("double") * F.col("sty")
        - F.col("st").cast("double") * F.col("sy")
    ) / (
        F.col("n").cast("double") * F.col("stt")
        - F.col("st").cast("double") * F.col("st")
    )
    fit = mom.select(
        "half",
        "t0",
        slope.alias("slope"),
        ((F.col("sy").cast("double") - slope * F.col("st")) / F.col("n")).alias(
            "icept"
        ),
    )
    pre = fit.filter(F.col("half") == 0).select(
        F.col("t0"),
        F.col("slope").alias("s0"),
        F.col("icept").alias("i0"),
    )
    post = fit.filter(F.col("half") == 1).select(
        F.col("slope").alias("s1"), F.col("icept").alias("i1")
    )
    return pre.crossJoin(F.broadcast(post)).select(
        F.col("t0").cast("long").alias("t0"),
        F.round(1000 * F.col("s0")).cast("long").alias("pre_slope_milli"),
        F.round(1000 * F.col("s1")).cast("long").alias("post_slope_milli"),
        F.round(1000 * (F.col("s1") - F.col("s0")))
        .cast("long")
        .alias("slope_change_milli"),
        F.round(
            1000
            * (
                (F.col("i1") + F.col("s1") * F.col("t0"))
                - (F.col("i0") + F.col("s0") * F.col("t0"))
            )
        )
        .cast("long")
        .alias("level_change_milli"),
    )


# --------------------------------------------------------------------------
# 4. Periodogram top-k
# --------------------------------------------------------------------------


def _pg_trig_rows() -> list[tuple[int, int, float, float]]:
    rows = []
    for p in range(2, PG_PMAX + 1):
        for r in range(p):
            ang = 2.0 * math.pi * r / p
            rows.append((p, r, math.cos(ang), math.sin(ang)))
    return rows


def _pg_oracle() -> str:
    vals = ", ".join(
        f"({p}, {r}, {c!r}, {s!r})" for p, r, c, s in _pg_trig_rows()
    )
    return f"""
WITH cnt AS (
  SELECT CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS day,
         CAST(count(*) AS BIGINT) AS y
  FROM events GROUP BY 1
),
m AS (SELECT count(*) AS n, sum(y) AS s FROM cnt),
ctr AS (
  SELECT day, y * (SELECT n FROM m) - (SELECT s FROM m) AS x FROM cnt
),
trig(p, r, c, s) AS (VALUES {vals}),
terms AS (
  SELECT t.p,
         CAST(round(ctr.x * t.c) AS BIGINT) AS xc,
         CAST(round(ctr.x * t.s) AS BIGINT) AS xs
  FROM ctr JOIN trig t ON t.r = ctr.day % t.p
),
power AS (
  SELECT p, CAST(sum(xc) AS BIGINT) AS cr, CAST(sum(xs) AS BIGINT) AS si
  FROM terms GROUP BY p
)
SELECT p AS period,
       CAST(round(sqrt(CAST(cr AS DOUBLE) * cr + CAST(si AS DOUBLE) * si))
            AS BIGINT) AS amplitude
FROM power
ORDER BY CAST(cr AS DOUBLE) * cr + CAST(si AS DOUBLE) * si DESC, p
LIMIT {PG_TOP}
"""


@query("ts_periodogram_topk", oracle=_pg_oracle())
def ts_periodogram_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DFT periodogram of the exactly-centered daily event count at
    candidate periods 2..{PG_PMAX}: the cos/sin values live in a LITERAL
    trig table keyed by (period, day mod period) — identical doubles on
    both engines, no per-row libm calls to drift — and each x·cos term
    quantizes to an integer before the per-period sum, so the spectrum
    is exact. Emits the top-{PG_TOP} cadences by power. Generalizes
    ts_goertzel_weekly's two fixed probe bins into cadence DISCOVERY
    (ts_seasonal_strength then quantifies the winner).

    Scale shape: calendar-sized series; the trig join is a broadcast of
    Σp rows; one hash agg per period; TakeOrdered caps the output."""
    cnt = (
        load(spark, sf_dir, "events")
        .groupBy(F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01")).alias("day"))
        .agg(F.count(F.lit(1)).cast("long").alias("y"))
    )
    m = cnt.agg(F.count(F.lit(1)).alias("n"), F.sum("y").alias("s"))
    ctr = cnt.crossJoin(F.broadcast(m)).select(
        F.col("day").cast("long").alias("day"),
        (F.col("y") * F.col("n") - F.col("s")).alias("x"),
    )
    trig = spark.createDataFrame(
        _pg_trig_rows(), "p long, r long, c double, s double"
    )
    terms = ctr.join(
        F.broadcast(trig), F.col("r") == F.col("day") % F.col("p")
    ).select(
        "p",
        F.round(F.col("x") * F.col("c")).cast("long").alias("xc"),
        F.round(F.col("x") * F.col("s")).cast("long").alias("xs"),
    )
    power = terms.groupBy("p").agg(
        F.sum("xc").cast("long").alias("cr"),
        F.sum("xs").cast("long").alias("si"),
    )
    pw = (
        F.col("cr").cast("double") * F.col("cr")
        + F.col("si").cast("double") * F.col("si")
    )
    return (
        power.orderBy(pw.desc(), "p")
        .limit(PG_TOP)
        .select(
            F.col("p").alias("period"),
            F.round(F.sqrt(pw)).cast("long").alias("amplitude"),
        )
    )


# --------------------------------------------------------------------------
# 5. Positive-unlabeled prior (Elkan-Noto)
# --------------------------------------------------------------------------


@query(
    "ml_pu_prior_elkan",
    oracle=f"""
WITH d AS (
  SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos,
         CASE WHEN event_type = 'purchase' AND event_id % 2 = 0
              THEN 1 ELSE 0 END AS lab,
         event_type AS band
  FROM events
),
g AS (
  SELECT band, CAST(count(*) AS BIGINT) AS n, CAST(sum(lab) AS BIGINT) AS l
  FROM d GROUP BY band
),
est AS (
  SELECT CAST(sum(n) AS BIGINT) AS n_total,
         CAST(sum(l) AS BIGINT) AS n_labeled,
         sum(CAST(l AS DOUBLE) * l / n) AS sum_g_over_labeled
  FROM g
),
truth AS (SELECT CAST(sum(pos) AS BIGINT) AS n_pos FROM d)
SELECT n_total, n_labeled,
       CAST(round(1000000 * sum_g_over_labeled / n_labeled) AS BIGINT)
         AS c_hat_micro,
       CAST(round(1000000.0 * n_labeled / n_total
                  / (sum_g_over_labeled / n_labeled)) AS BIGINT)
         AS pi_hat_micro,
       CAST(round(1000000.0 * (SELECT n_pos FROM truth) / n_total) AS BIGINT)
         AS pi_true_micro
FROM est
""",
)
def ml_pu_prior_elkan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Elkan-Noto (2008) positive-unlabeled learning: only half the
    positives carry labels (purchase events with even id — the SCAR
    labeling assumption made literal), a histogram calibrator
    g(x) = P(labeled|x) over the event category — the perfectly
    informative discrete feature, so this validates the ESTIMATOR's
    algebra end-to-end: the label frequency ĉ = E[g|labeled]
    = Σ l_b²/n_b / L recovers the true labeling rate (≈½) and the class
    prior π̂ = P(labeled)/ĉ recovers the true positive rate (reported
    alongside; with an uninformative feature g collapses to P(labeled)
    and π̂ → 1, the documented failure mode — in production the band
    column is any calibrated classifier's score bucket). Everything is
    a ratio of exact integer band counts — Σ l²/n quantizes only at the
    final micro rounding.

    Scale shape: one labeled scan → band histogram (map-side combined),
    1-row estimator arithmetic; the calibrator never materializes
    per-row scores."""
    d = load(spark, sf_dir, "events").select(
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("pos"),
        F.when(
            (F.col("event_type") == "purchase") & (F.col("event_id") % 2 == 0),
            1,
        )
        .otherwise(0)
        .alias("lab"),
        F.col("event_type").alias("band"),
    )
    g = d.groupBy("band").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("lab").cast("long").alias("l"),
    )
    est = g.agg(
        F.sum("n").cast("long").alias("n_total"),
        F.sum("l").cast("long").alias("n_labeled"),
        F.sum(F.col("l").cast("double") * F.col("l") / F.col("n")).alias(
            "sgl"
        ),
    )
    truth = d.agg(F.sum("pos").cast("long").alias("n_pos"))
    c_hat = F.col("sgl") / F.col("n_labeled")
    return est.crossJoin(F.broadcast(truth)).select(
        "n_total",
        "n_labeled",
        F.round(1_000_000 * c_hat).cast("long").alias("c_hat_micro"),
        F.round(
            1_000_000.0 * F.col("n_labeled") / F.col("n_total") / c_hat
        )
        .cast("long")
        .alias("pi_hat_micro"),
        F.round(1_000_000.0 * F.col("n_pos") / F.col("n_total"))
        .cast("long")
        .alias("pi_true_micro"),
    )


# --------------------------------------------------------------------------
# 6. Train/eval n-gram novelty
# --------------------------------------------------------------------------


@query(
    "text_train_eval_overlap",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, source, doc_id % 2 AS split,
         generate_subscripts(w, 1) AS pos, unnest(w) AS term
  FROM (SELECT doc_id, source, {_TOK_SQL} AS w FROM documents)
),
sh AS (
  SELECT a.source, a.split,
         a.term || ' ' || b1.term || ' ' || b2.term || ' '
           || b3.term || ' ' || b4.term AS shingle
  FROM toks a
  JOIN toks b1 ON b1.doc_id = a.doc_id AND b1.pos = a.pos + 1
  JOIN toks b2 ON b2.doc_id = a.doc_id AND b2.pos = a.pos + 2
  JOIN toks b3 ON b3.doc_id = a.doc_id AND b3.pos = a.pos + 3
  JOIN toks b4 ON b4.doc_id = a.doc_id AND b4.pos = a.pos + 4
),
ev AS (SELECT DISTINCT source, shingle FROM sh WHERE split = 1),
tr AS (SELECT DISTINCT source, shingle FROM sh WHERE split = 0),
novel AS (
  SELECT e.source,
         CAST(count(*) AS BIGINT) AS n_eval_types,
         CAST(sum(CASE WHEN t.shingle IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_novel
  FROM ev e LEFT JOIN tr t ON t.source = e.source AND t.shingle = e.shingle
  GROUP BY e.source
)
SELECT source, n_eval_types, n_novel,
       CAST(round(1000000.0 * n_novel / n_eval_types) AS BIGINT)
         AS novelty_micro
FROM novel
""",
)
def text_train_eval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/eval split novelty audit: per source, docs split by id
    parity; the fraction of the eval half's distinct {TE_N}-gram word
    shingles ABSENT from the same source's train half. Low novelty means
    the eval split leaks training text (template/boilerplate-heavy
    sources), inflating any LM metric computed on it — the within-
    corpus sibling of contamination_ngrams (which checks against an
    external benchmark). Counts are exact set cardinalities via one
    anti-join-shaped left join.

    Scale shape: shingles are position equi-joins (linear per doc);
    dedup per (source, split) is a hash agg; the audit join is keyed by
    (source, shingle) — at 100 TB the same shape runs on shingle HASHES
    (the dedup_span_ngrams trick) to keep the shuffle narrow."""
    docs = fan_out(load(spark, sf_dir, "documents"))
    toks = docs.select(
        "doc_id",
        "source",
        (F.col("doc_id") % 2).alias("split"),
        F.posexplode(F.expr(_TOK_SPARK)).alias("pos", "term"),
    )
    sh = toks
    joined = toks.alias("a")
    parts = [F.col("a.term")]
    for j in range(1, TE_N):
        bj = toks.select(
            F.col("doc_id").alias(f"d{j}"),
            F.col("pos").alias(f"p{j}"),
            F.col("term").alias(f"t{j}"),
        )
        joined = joined.join(
            bj,
            (F.col("a.doc_id") == F.col(f"d{j}"))
            & (F.col(f"p{j}") == F.col("a.pos") + j),
        )
        parts.append(F.col(f"t{j}"))
    sh = joined.select(
        F.col("a.source").alias("source"),
        F.col("a.split").alias("split"),
        F.concat_ws(" ", *parts).alias("shingle"),
    )
    ev = sh.filter(F.col("split") == 1).select("source", "shingle").distinct()
    tr = (
        sh.filter(F.col("split") == 0)
        .select(F.col("source").alias("ts"), F.col("shingle").alias("tsh"))
        .distinct()
    )
    novel = (
        ev.join(
            tr,
            (F.col("source") == F.col("ts")) & (F.col("shingle") == F.col("tsh")),
            "left",
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_eval_types"),
            F.sum(F.when(F.col("tsh").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_novel"),
        )
    )
    return novel.select(
        "source",
        "n_eval_types",
        "n_novel",
        F.round(1_000_000.0 * F.col("n_novel") / F.col("n_eval_types"))
        .cast("long")
        .alias("novelty_micro"),
    )
