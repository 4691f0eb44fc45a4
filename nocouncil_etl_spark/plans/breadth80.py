"""Breadth batch 60 (round 6): turning-points test, acceptance-sampling
OC curve, inspection paradox, zone-map false positives, LSH parameter
planner, record-highs test.

Six operators (reference scope: the classical randomness tests on
series, industrial quality-control sampling plans, the length-biased
sampling correction, zone-map effectiveness refinement, MinHash-LSH
band/row planning, and extreme-record statistics):

- ``ts_turning_points``      — local-extrema count vs the iid null.
- ``stat_acceptance_sampling_oc`` — OC curve of the (n=50, c=2) single
  sampling plan over a defect-rate grid (exact binomial tails).
- ``agg_inspection_paradox`` — event inter-arrival mean vs the
  length-biased mean a random observer sees (1 + CV² law).
- ``io_zonemap_false_positive`` — files whose min/max overlaps a range
  predicate but contain no matching rows.
- ``dedup_lsh_planner``      — (bands, rows) S-curve error against a
  target Jaccard threshold over a literal similarity grid.
- ``ts_record_highs``        — record-high count vs the Σ1/k iid
  expectation (the records test for trend).

Reference parity: north-star extension — no reference analogue
(the reference has no analytics layer); the LSH planner parameterizes the dedup family
(`operators/dedup.py`) the way a 100 TB corpus run must.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nocouncil_etl_spark.io import load
from nocouncil_etl_spark.operators.quantiles import ranged_rank_cumsum
from nocouncil_etl_spark.registry import query

OC_N, OC_C = 50, 2
OC_PS = (10, 20, 50, 100, 200)  # defect rates, milli
ZM_FILE_ROWS = 1000
ZM_LO, ZM_HI = 15_000_000, 15_500_000  # cents range predicate
LSH_TARGET_MILLI = 700
LSH_PLANS = ((4, 4), (8, 2), (2, 8), (16, 1), (5, 3))
REC_SCALE = 1000


# --------------------------------------------------------------------------
# 1. Turning points
# --------------------------------------------------------------------------


@query(
    "ts_turning_points",
    oracle="""
WITH s AS (
  SELECT CAST(ts AS DATE) AS day,
         sum(CAST(round(10000 * value) AS BIGINT)) AS v4
  FROM events WHERE value IS NOT NULL GROUP BY 1
),
t AS (
  SELECT v4, lag(v4) OVER w AS prev, lead(v4) OVER w AS nxt
  FROM s WINDOW w AS (ORDER BY day)
),
agg AS (
  SELECT CAST(count(*) AS BIGINT) + 2 AS n,
         CAST(sum(CASE WHEN (v4 > prev AND v4 > nxt)
                         OR (v4 < prev AND v4 < nxt) THEN 1 ELSE 0 END)
              AS BIGINT) AS tp
  FROM t WHERE prev IS NOT NULL AND nxt IS NOT NULL
)
SELECT n, tp AS turning_points,
       CAST(round(1000.0 * 2 * (n - 2) / 3) AS BIGINT) AS expected_milli,
       CAST(round(1000.0 * (tp - 2.0 * (n - 2) / 3)
            / sqrt((16.0 * n - 29) / 90)) AS BIGINT) AS z_milli
FROM agg
""",
)
def ts_turning_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Turning-points randomness test: count strict local maxima and
    minima of the daily total — under iid noise E[T] = 2(n−2)/3 and
    Var = (16n−29)/90, so too FEW turning points means trend/momentum
    and too MANY means alternating (negatively autocorrelated) noise.
    The oldest nonparametric randomness check (Bienaymé 1874),
    complementing agg_runs_test (sign runs) and stat_durbin_watson
    (residual form). Exact integer comparisons; one z at the end.

    Scale shape: one calendar window for lag/lead, one rollup."""
    s = (
        load(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .groupBy(F.col("ts").cast("date").alias("day"))
        .agg(F.sum(F.round(10000 * F.col("value")).cast("long")).alias("v4"))
    )
    w = Window.orderBy("day")
    t = s.select(
        "v4",
        F.lag("v4").over(w).alias("prev"),
        F.lead("v4").over(w).alias("nxt"),
    ).filter(F.col("prev").isNotNull() & F.col("nxt").isNotNull())
    is_tp = (
        (F.col("v4") > F.col("prev")) & (F.col("v4") > F.col("nxt"))
    ) | ((F.col("v4") < F.col("prev")) & (F.col("v4") < F.col("nxt")))
    agg = t.agg(
        (F.count(F.lit(1)) + 2).cast("long").alias("n"),
        F.sum(F.when(is_tp, 1).otherwise(0)).cast("long").alias("tp"),
    )
    n, tp = F.col("n"), F.col("tp")
    return agg.select(
        "n",
        tp.alias("turning_points"),
        F.round(1000.0 * 2 * (n - 2) / 3).cast("long").alias("expected_milli"),
        F.round(
            1000.0
            * (tp - 2.0 * (n - 2) / 3)
            / F.sqrt((16.0 * n - 29) / 90)
        )
        .cast("long")
        .alias("z_milli"),
    )


# --------------------------------------------------------------------------
# 2. Acceptance sampling OC curve
# --------------------------------------------------------------------------


def _oc_rows() -> list[tuple[int, int]]:
    """(p_milli, accept_prob_micro) for the (OC_N, OC_C) plan — exact
    binomial tails computed in Python with integer binomials and
    embedded as the SAME literals in both engines."""
    rows = []
    for pm in OC_PS:
        p = pm / 1000.0
        acc = 0.0
        for j in range(OC_C + 1):
            acc += math.comb(OC_N, j) * p**j * (1 - p) ** (OC_N - j)
        x = 1_000_000 * acc
        rows.append(
            (pm, int(math.floor(x + 0.5)))
        )
    return rows


@query(
    "stat_acceptance_sampling_oc",
    oracle=f"""
WITH plan(p_milli, accept_micro) AS (
  VALUES {", ".join(f"({p}, {a})" for p, a in _oc_rows())}
),
lot AS (
  SELECT CAST(count(*) AS BIGINT) AS n_lot,
         CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
              AS BIGINT) AS n_defect
  FROM events
)
SELECT p.p_milli, p.accept_micro,
       (SELECT CAST(round(1000.0 * n_defect / n_lot) AS BIGINT) FROM lot)
         AS observed_defect_milli,
       CASE WHEN p.p_milli >= (SELECT round(1000.0 * n_defect / n_lot)
                               FROM lot)
            THEN 1 ELSE 0 END AS at_or_above_observed
FROM plan p
""",
)
def stat_acceptance_sampling_oc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Operating-characteristic curve of the classic single acceptance-
    sampling plan (inspect n={OC_N}, accept if ≤ c={OC_C} defects):
    P(accept) = Σ_j≤c C(n,j)p^j(1−p)^(n−j) at each defect rate in
    {OC_PS} milli — computed ONCE with exact integer binomial
    coefficients and embedded as identical literals (the trig-table
    discipline), then joined against the lot's OBSERVED defect rate
    (error events) so the report says where on the curve this data
    sits. The quality-control plan every inbound-data contract
    implicitly is.

    Scale shape: the curve is a literal broadcast; the lot stats are
    one aggregate."""
    lot = load(spark, sf_dir, "events").agg(
        F.count(F.lit(1)).cast("long").alias("n_lot"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
        .cast("long")
        .alias("n_defect"),
    )
    plan = spark.createDataFrame(
        _oc_rows(), "p_milli long, accept_micro long"
    )
    obs = F.round(1000.0 * F.col("n_defect") / F.col("n_lot"))
    return (
        F.broadcast(plan)
        .crossJoin(lot)
        .select(
            "p_milli",
            "accept_micro",
            obs.cast("long").alias("observed_defect_milli"),
            F.when(F.col("p_milli") >= obs, 1).otherwise(0).alias(
                "at_or_above_observed"
            ),
        )
    )


# --------------------------------------------------------------------------
# 3. Inspection paradox
# --------------------------------------------------------------------------


@query(
    "agg_inspection_paradox",
    oracle="""
WITH g AS (
  SELECT epoch_us(ts) - lag(epoch_us(ts)) OVER (ORDER BY ts, event_id) AS gap
  FROM events
),
m AS (
  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(gap) AS BIGINT) AS s,
         CAST(sum(CAST(gap AS HUGEINT) * gap) AS DOUBLE) AS ss
  FROM g WHERE gap IS NOT NULL
)
SELECT n AS n_gaps,
       CAST(s // n // 1000 AS BIGINT) AS mean_gap_ms,
       CAST(round(ss / s / 1000) AS BIGINT) AS length_biased_gap_ms,
       CAST(round(1000.0 * (ss / s) / (CAST(s AS DOUBLE) / n)) AS BIGINT)
         AS paradox_ratio_milli
FROM m
""",
)
def agg_inspection_paradox(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The inspection (waiting-time) paradox, measured: the plain mean
    inter-event gap vs the LENGTH-BIASED mean Σg²/Σg — the gap a
    randomly arriving observer actually lands in — whose ratio is
    exactly 1 + CV² (≈ 2 for Poisson arrivals, higher for bursty
    streams). The correction every 'average wait' claim needs, and a
    burstiness summary in its own right (the moment twin of
    ts_burst_viterbi's state model). Gaps are exact epoch-microsecond
    integers; moments 128-bit.

    Scale shape (r9): arrival adjacency via ONE ranged scan carrying the
    lag (µs timestamps are near-unique — no Fenwick explode, no
    consecutive-rank self-join, no global sort), one 3-moment rollup."""
    ev = load(spark, sf_dir, "events")
    rk = ranged_rank_cumsum(
        ev.select(F.unix_micros("ts").alias("tsu"), "event_id"),
        "tsu",
        "event_id",
        lag_col="tsu",
    )
    g = rk.filter(F.col("prev_tsu").isNotNull()).select(
        (F.col("tsu") - F.col("prev_tsu")).alias("gap")
    )
    m = g.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("gap").cast("long").alias("s"),
        F.sum((F.col("gap").cast("decimal(38,0)") * F.col("gap")))
        .cast("double")
        .alias("ss"),
    )
    return m.select(
        F.col("n").alias("n_gaps"),
        F.expr("s div n div 1000").cast("long").alias("mean_gap_ms"),
        F.round(F.col("ss") / F.col("s") / 1000)
        .cast("long")
        .alias("length_biased_gap_ms"),
        F.round(
            1000.0
            * (F.col("ss") / F.col("s"))
            / (F.col("s").cast("double") / F.col("n"))
        )
        .cast("long")
        .alias("paradox_ratio_milli"),
    )


# --------------------------------------------------------------------------
# 4. Zone-map false positives
# --------------------------------------------------------------------------


@query(
    "io_zonemap_false_positive",
    oracle=f"""
WITH f AS (
  SELECT o_orderkey // {ZM_FILE_ROWS} AS file_id,
         CAST(round(100 * o_totalprice) AS BIGINT) AS cents
  FROM orders
),
zone AS (
  SELECT file_id, min(cents) AS lo, max(cents) AS hi,
         CAST(sum(CASE WHEN cents BETWEEN {ZM_LO} AND {ZM_HI}
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_match
  FROM f GROUP BY file_id
)
SELECT CAST(count(*) AS BIGINT) AS n_files,
       CAST(sum(CASE WHEN hi >= {ZM_LO} AND lo <= {ZM_HI}
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_overlap,
       CAST(sum(CASE WHEN n_match > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_truly_matching,
       CAST(sum(CASE WHEN hi >= {ZM_LO} AND lo <= {ZM_HI} AND n_match = 0
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_false_positive,
       CAST(round(1000.0 * sum(CASE WHEN hi >= {ZM_LO} AND lo <= {ZM_HI}
                                    AND n_match = 0 THEN 1 ELSE 0 END)
                  / greatest(sum(CASE WHEN hi >= {ZM_LO} AND lo <= {ZM_HI}
                                      THEN 1 ELSE 0 END), 1)) AS BIGINT)
         AS fpr_milli
FROM zone
""",
)
def io_zonemap_false_positive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zone-map FALSE-POSITIVE rate for a point-range predicate: files
    whose [min, max] OVERLAPS the range [{ZM_LO}, {ZM_HI}] cents but
    contain NO matching row — the reads min/max pruning admits and then
    wastes, which is precisely what Bloom footers (io_bloom_file_skip)
    exist to kill. High FPR on an unsorted column is the quantitative
    case for a sort/Z-order rewrite (io_natural_clustering_audit gives
    the layout-level view; this gives the per-predicate cost).

    Scale shape: one file-grain hash agg carrying min/max AND the true
    match count in the same pass, one rollup."""
    f = load(spark, sf_dir, "orders").select(
        F.expr(f"o_orderkey div {ZM_FILE_ROWS}").alias("file_id"),
        F.round(100 * F.col("o_totalprice")).cast("long").alias("cents"),
    )
    zone = f.groupBy("file_id").agg(
        F.min("cents").alias("lo"),
        F.max("cents").alias("hi"),
        F.sum(
            F.when(F.col("cents").between(ZM_LO, ZM_HI), 1).otherwise(0)
        )
        .cast("long")
        .alias("n_match"),
    )
    overlap = (F.col("hi") >= ZM_LO) & (F.col("lo") <= ZM_HI)
    fp = overlap & (F.col("n_match") == 0)
    return zone.agg(
        F.count(F.lit(1)).cast("long").alias("n_files"),
        F.sum(F.when(overlap, 1).otherwise(0)).cast("long").alias("n_overlap"),
        F.sum(F.when(F.col("n_match") > 0, 1).otherwise(0))
        .cast("long")
        .alias("n_truly_matching"),
        F.sum(F.when(fp, 1).otherwise(0)).cast("long").alias(
            "n_false_positive"
        ),
        F.round(
            1000.0
            * F.sum(F.when(fp, 1).otherwise(0))
            / F.greatest(F.sum(F.when(overlap, 1).otherwise(0)), F.lit(1))
        )
        .cast("long")
        .alias("fpr_milli"),
    )


# --------------------------------------------------------------------------
# 5. LSH parameter planner
# --------------------------------------------------------------------------


def _lsh_rows() -> list[tuple[int, int, int, int, int]]:
    """(bands, rows, fp_milli, fn_milli, total_err_milli) per plan —
    the S-curve P(candidate|s) = 1 − (1 − s^r)^b integrated on a 99-
    point similarity grid against the step at the target threshold.
    Pure Python floats embedded identically in both engines."""
    out = []
    t = LSH_TARGET_MILLI / 1000.0
    for b, r in LSH_PLANS:
        fp = 0.0
        fn = 0.0
        for i in range(1, 100):
            s = i / 100.0
            pc = 1.0 - (1.0 - s**r) ** b
            if s < t:
                fp += pc
            else:
                fn += 1.0 - pc
        fp /= 99.0
        fn /= 99.0

        def rha(x: float) -> int:
            return int(math.floor(x + 0.5))

        out.append(
            (b, r, rha(1000 * fp), rha(1000 * fn), rha(1000 * (fp + fn)))
        )
    return out


@query(
    "dedup_lsh_planner",
    oracle=f"""
WITH plans(bands, rows_, fp_milli, fn_milli, total_err_milli) AS (
  VALUES {", ".join(f"({b}, {r}, {fp}, {fn}, {te})" for b, r, fp, fn, te in _lsh_rows())}
)
SELECT bands, rows_, fp_milli, fn_milli, total_err_milli,
       CASE WHEN total_err_milli = (SELECT min(total_err_milli) FROM plans)
            THEN 1 ELSE 0 END AS recommended
FROM plans
""",
)
def dedup_lsh_planner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH parameter planner: for candidate (bands b, rows r)
    plans with b·r ≈ 16 signature slots, the S-curve
    P(candidate | s) = 1 − (1 − s^r)^b integrates against the ideal
    step at the target Jaccard {LSH_TARGET_MILLI} milli — false-
    positive mass below the threshold (wasted verification joins) and
    false-negative mass above it (missed duplicates), with the
    minimum-total-error plan flagged. THE tuning computation behind
    dedup_minhash_lsh's banding at a new corpus/threshold — run it
    before burning a 100 TB pass. Curve values are exact shared
    literals (the trig-table discipline).

    Scale shape: pure literal arithmetic — the planner costs nothing;
    that is the point."""
    plan = spark.createDataFrame(
        _lsh_rows(),
        "bands long, rows_ long, fp_milli long, fn_milli long,"
        " total_err_milli long",
    )
    mn = plan.agg(F.min("total_err_milli").alias("mn"))
    return plan.crossJoin(F.broadcast(mn)).select(
        "bands",
        "rows_",
        "fp_milli",
        "fn_milli",
        "total_err_milli",
        F.when(F.col("total_err_milli") == F.col("mn"), 1)
        .otherwise(0)
        .alias("recommended"),
    )


# --------------------------------------------------------------------------
# 6. Record highs
# --------------------------------------------------------------------------


@query(
    "ts_record_highs",
    oracle="""
WITH s AS (
  SELECT CAST(ts AS DATE) AS day,
         sum(CAST(round(10000 * value) AS BIGINT)) AS v4
  FROM events WHERE value IS NOT NULL GROUP BY 1
),
r AS (
  SELECT v4,
         max(v4) OVER (ORDER BY day
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max,
         row_number() OVER (ORDER BY day) AS rn,
         count(*) OVER () AS n
  FROM s
),
agg AS (
  SELECT max(n) AS n,
         CAST(sum(CASE WHEN prev_max IS NULL OR v4 > prev_max
                       THEN 1 ELSE 0 END) AS BIGINT) AS records
  FROM r
),
harm AS (
  SELECT CAST(sum(CAST(round(1000000.0 / j) AS BIGINT)) AS BIGINT) AS h_micro,
         CAST(sum(CAST(round(1000000.0 / j) AS BIGINT)
                  - CAST(round(1000000.0 / (CAST(j AS DOUBLE) * j))
                         AS BIGINT)) AS BIGINT) AS v_micro
  FROM (SELECT unnest(range(1, (SELECT CAST(n AS BIGINT) FROM agg) + 1)) AS j)
)
SELECT (SELECT CAST(n AS BIGINT) FROM agg) AS n,
       (SELECT records FROM agg) AS records,
       CAST(round(CAST((SELECT h_micro FROM harm) AS DOUBLE) / 1000)
            AS BIGINT) AS expected_milli,
       CAST(round(1000.0 * ((SELECT records FROM agg)
            - (SELECT h_micro FROM harm) / 1000000.0)
            / sqrt((SELECT v_micro FROM harm) / 1000000.0)) AS BIGINT)
         AS z_milli
FROM agg
""",
)
def ts_record_highs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Records test for trend: count strict record highs of the daily
    total — under iid exchangeability the k-th observation is a record
    with probability 1/k, so E[R] = H_n (harmonic) and
    Var = Σ(1/k − 1/k²); an excess of records is among the most
    trend-sensitive distribution-free signals there is (extreme-value
    theory's entry door; the running max is window_drawdown's
    machinery pointed at inference). Harmonic sums quantize per-term
    to micro before adding.

    Scale shape: one running-max window, a generated 1..n harmonic
    table, scalar z."""
    s = (
        load(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .groupBy(F.col("ts").cast("date").alias("day"))
        .agg(F.sum(F.round(10000 * F.col("value")).cast("long")).alias("v4"))
    )
    w = Window.orderBy("day")
    r = s.select(
        "v4",
        F.max("v4").over(w.rowsBetween(Window.unboundedPreceding, -1)).alias(
            "prev_max"
        ),
    )
    agg = r.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(
            F.when(
                F.col("prev_max").isNull() | (F.col("v4") > F.col("prev_max")),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("records"),
    ).first()
    n, records = int(agg.n), int(agg.records)
    harm = (
        spark.range(1, n + 1)
        .select(
            F.round(1_000_000.0 / F.col("id")).cast("long").alias("hj"),
            (
                F.round(1_000_000.0 / F.col("id")).cast("long")
                - F.round(
                    1_000_000.0 / (F.col("id").cast("double") * F.col("id"))
                ).cast("long")
            ).alias("vj"),
        )
        .agg(
            F.sum("hj").cast("long").alias("h_micro"),
            F.sum("vj").cast("long").alias("v_micro"),
        )
    )
    return harm.select(
        F.lit(n).cast("long").alias("n"),
        F.lit(records).cast("long").alias("records"),
        F.round(F.col("h_micro").cast("double") / 1000)
        .cast("long")
        .alias("expected_milli"),
        F.round(
            1000.0
            * (records - F.col("h_micro") / 1_000_000.0)
            / F.sqrt(F.col("v_micro") / 1_000_000.0)
        )
        .cast("long")
        .alias("z_milli"),
    )
