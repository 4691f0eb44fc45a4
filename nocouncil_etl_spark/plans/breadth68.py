"""Breadth batch 48 (round 6): Fisher's exact test, ChiMerge binning,
watermark lateness audit, CAGR, Ulcer index, geohash codec.

Six operators (reference scope: the exact small-table independence
test, supervised discretization, streaming watermark sizing, compound
growth accounting, drawdown-pain measurement, and geospatial cell
encoding):

- ``stat_fisher_exact``      — two-sided Fisher exact test on the
  purchase × weekend 2x2 table via quantized log-factorials.
- ``ml_chimerge_binning``    — ChiMerge: 3 rounds of merging the
  adjacent bin pair with the lowest chi-square.
- ``dq_watermark_lateness``  — event-time lateness under a jittered
  arrival order: inversion rate and the watermark delay needed.
- ``agg_cagr_revenue``       — compound annual growth rate per nation
  (exp/ln form on integer-cent ratios).
- ``window_ulcer_index``     — Ulcer index (RMS drawdown) of the
  monthly centered-NAV series.
- ``geo_geohash_codec``      — 30-bit interleaved geohash encode +
  base32 render + exact decode roundtrip.

Reference parity: north-star extension — no reference analogue
(the reference has no analytics layer); these are the audit layers a lake-scale engine
adds on the same tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nocouncil_etl_spark.io import load
from nocouncil_etl_spark.operators.quantiles import dense_cumsum, ranged_rank_cumsum
from nocouncil_etl_spark.registry import query

CM_BAND = 200_000  # ChiMerge initial bins: 2000 currency units
CM_ROUNDS = 3
WM_JITTER_MOD = 7  # deterministic delivery jitter seconds: event_id % 7
GH_BITS = 15  # per-coordinate geohash resolution
GH_ALPHABET = "0123456789bcdefghjkmnpqrstuvwxyz"


# --------------------------------------------------------------------------
# 1. Fisher's exact test
# --------------------------------------------------------------------------


@query(
    "stat_fisher_exact",
    oracle="""
WITH d AS (
  SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos,
         CASE WHEN isodow(CAST(ts AS DATE)) >= 6 THEN 1 ELSE 0 END AS wknd
  FROM events
),
tab AS (
  SELECT CAST(sum(pos * wknd) AS BIGINT) AS a,
         CAST(sum(pos * (1 - wknd)) AS BIGINT) AS b,
         CAST(sum((1 - pos) * wknd) AS BIGINT) AS c,
         CAST(sum((1 - pos) * (1 - wknd)) AS BIGINT) AS d,
         CAST(count(*) AS BIGINT) AS n
  FROM d
),
lf AS MATERIALIZED (
  SELECT 0 AS j, CAST(0 AS BIGINT) AS lf
  UNION ALL
  SELECT j,
         sum(CAST(round(1000000 * ln(CAST(j AS DOUBLE))) AS BIGINT))
           OVER (ORDER BY j ROWS BETWEEN UNBOUNDED PRECEDING
                 AND CURRENT ROW) AS lf
  FROM (SELECT unnest(range(1, (SELECT n FROM tab) + 1)) AS j)
),
const AS (
  SELECT t.a, t.b, t.c, t.d, t.n,
         t.a + t.b AS m1, t.c + t.d AS m2, t.a + t.c AS n1, t.b + t.d AS n2,
         (SELECT lf FROM lf WHERE j = t.a + t.b)
         + (SELECT lf FROM lf WHERE j = t.c + t.d)
         + (SELECT lf FROM lf WHERE j = t.a + t.c)
         + (SELECT lf FROM lf WHERE j = t.b + t.d)
         - (SELECT lf FROM lf WHERE j = t.n) AS base
  FROM tab t
),
ks AS (
  SELECT unnest(range(greatest(0, (SELECT m1 + n1 - n FROM const)),
                      least((SELECT m1 FROM const),
                            (SELECT n1 FROM const)) + 1)) AS k
),
lnp AS (
  SELECT ks.k,
         (SELECT base FROM const)
         - l1.lf - l2.lf - l3.lf - l4.lf AS lnp_micro
  FROM ks
  JOIN lf l1 ON l1.j = ks.k
  JOIN lf l2 ON l2.j = (SELECT m1 FROM const) - ks.k
  JOIN lf l3 ON l3.j = (SELECT n1 FROM const) - ks.k
  JOIN lf l4 ON l4.j = (SELECT m2 FROM const) - (SELECT n1 FROM const) + ks.k
),
obs AS (SELECT lnp_micro FROM lnp WHERE k = (SELECT a FROM const)),
tail AS (
  SELECT CAST(sum(CAST(round(1000000000000 * exp(lnp_micro / 1000000.0))
                       AS BIGINT)) AS BIGINT) AS p_pico
  FROM lnp WHERE lnp_micro <= (SELECT lnp_micro FROM obs)
)
SELECT (SELECT a FROM const) AS a, (SELECT b FROM const) AS b,
       (SELECT c FROM const) AS c, (SELECT d FROM const) AS d,
       CAST(round((SELECT p_pico FROM tail) / 1000000.0) AS BIGINT)
         AS p_two_sided_micro,
       CAST(round(1000.0 * (SELECT a FROM const) * (SELECT d FROM const)
                  / ((SELECT b FROM const) * (SELECT c FROM const)))
            AS BIGINT) AS odds_ratio_milli
""",
)
def stat_fisher_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sided Fisher EXACT test of purchase × weekend independence:
    the hypergeometric probability of every achievable 2x2 table with
    the observed margins, summed over tables no more likely than the
    observed one (the method of small p-values). The whole computation
    rides on a quantized log-factorial table — ln j rounds to
    micro-nats BEFORE the cumulative sum, so ln k! is an exact BIGINT
    and every table's log-probability is integer arithmetic; only the
    final exp/sum quantizes (pico grid). This is the test
    agg_chi_square_independence approximates — and the exact machinery
    (lnfact + hypergeometric enumeration) is reusable for any
    permutation-style p-value.

    Scale shape (r11 opt, guide §2.3/§2.4): the old plan materialized the
    FULL n-row log-factorial table, persisted it, and equi-joined it FOUR
    times against the k-range — four shuffles of an n-row table. But only
    13 prefix sums of it are ever consumed as absolute values (5 margin
    lookups for `base`, 4 for lnp(klo), 4 for lnp(a) = the observed
    table's log-probability), and consecutive lnp values telescope:
    lnp(k) − lnp(k−1) = −l(k) + l(m1−k+1) + l(n1−k+1) − l(m2−n1+k),
    where l(j) = round(1e6·ln j) is computable per row. So now ONE
    conditional-sum agg over range(1, n] yields all 13 point lookups, and
    the k-range carries its own increments through a dense two-phase
    cumsum — zero joins, zero persisted n-row state. Integer addition is
    associative, so the reassociated sums are bit-identical to the old
    table lookups. (At 100 TB margins, Stirling replaces enumeration —
    unchanged caveat.)"""
    d = load(spark, sf_dir, "events").select(
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("pos"),
        F.when(
            F.when(F.dayofweek(F.col("ts").cast("date")) == 1, 7)
            .otherwise(F.dayofweek(F.col("ts").cast("date")) - 1)
            >= 6,
            1,
        )
        .otherwise(0)
        .alias("wknd"),
    )
    tab = d.agg(
        F.sum(F.col("pos") * F.col("wknd")).cast("long").alias("a"),
        F.sum(F.col("pos") * (1 - F.col("wknd"))).cast("long").alias("b"),
        F.sum((1 - F.col("pos")) * F.col("wknd")).cast("long").alias("c"),
        F.sum((1 - F.col("pos")) * (1 - F.col("wknd"))).cast("long").alias("d"),
        F.count(F.lit(1)).cast("long").alias("n"),
    ).first()
    a, b, c, dd, n = int(tab.a), int(tab.b), int(tab.c), int(tab.d), int(tab.n)
    m1, m2, n1, n2 = a + b, c + dd, a + c, b + dd
    klo, khi = max(0, m1 + n1 - n), min(m1, n1)

    # l(j) = round(1e6·ln j) — the SAME quantized-log expression the full
    # table used; every value below is an (associative) integer sum of
    # these, so the rewrite is bit-identical to the joined-table plan.
    def _l(col):
        return (
            F.round(1_000_000 * F.log(col.cast("double"))).cast("long")
        )

    # all 13 needed prefix sums lf(p) = Σ_{j≤p} l(j) from ONE scan
    points = sorted(
        {m1, m2, n1, n2, n, klo, m1 - klo, n1 - klo, m2 - n1 + klo,
         a, m1 - a, n1 - a, m2 - n1 + a} - {0}
    )
    sums_row = (
        spark.range(1, n + 1)
        .select(_l(F.col("id")).alias("l"), "id")
        .agg(
            *[
                F.sum(F.when(F.col("id") <= p, F.col("l")))
                .cast("long")
                .alias(f"p{i}")
                for i, p in enumerate(points)
            ]
        )
        .first()
    )
    lf_map = {p: int(sums_row[f"p{i}"]) for i, p in enumerate(points)}
    lf_map[0] = 0

    def lf_at(j: int) -> int:
        return lf_map[j]

    base = lf_at(m1) + lf_at(m2) + lf_at(n1) + lf_at(n2) - lf_at(n)

    def lnp_at(k: int) -> int:
        return (
            base
            - lf_at(k)
            - lf_at(m1 - k)
            - lf_at(n1 - k)
            - lf_at(m2 - n1 + k)
        )

    obs = lnp_at(a)
    lnp0 = lnp_at(klo)
    # k-range log-probabilities via the telescoped increment cumsum: the
    # (contiguous) range carries inc(k) per row, the dense two-phase scan
    # accumulates it, and lnp(k) = lnp(klo) + cum(k) — no joins at all
    kc = F.col("id")
    inc = F.when(kc == klo, F.lit(0).cast("long")).otherwise(
        -_l(kc) + _l(F.lit(m1) + 1 - kc) + _l(F.lit(n1) + 1 - kc)
        - _l(kc + F.lit(m2 - n1))
    )
    ks = spark.range(klo, khi + 1).select(
        F.col("id").alias("k"), inc.alias("inc")
    )
    lnp = dense_cumsum(ks, "k", "inc").select(
        "k", (F.lit(lnp0) + F.col("cum")).alias("lnp_micro")
    )
    tail = lnp.filter(F.col("lnp_micro") <= obs).agg(
        F.sum(
            F.round(
                1_000_000_000_000 * F.exp(F.col("lnp_micro") / 1_000_000.0)
            ).cast("long")
        ).alias("p_pico")
    )
    return tail.select(
        F.lit(a).cast("long").alias("a"),
        F.lit(b).cast("long").alias("b"),
        F.lit(c).cast("long").alias("c"),
        F.lit(dd).cast("long").alias("d"),
        F.round(F.col("p_pico") / 1_000_000.0)
        .cast("long")
        .alias("p_two_sided_micro"),
        F.round(F.lit(1000.0) * a * dd / (b * c))
        .cast("long")
        .alias("odds_ratio_milli"),
    )


# --------------------------------------------------------------------------
# 2. ChiMerge binning
# --------------------------------------------------------------------------


def _cm_round_sql(k: int) -> str:
    """One ChiMerge round: merge the adjacent pair of bins{k} with the
    minimum chi-square (quantized micro; tie → lower ordinal)."""
    return f"""
p{k} AS (
  SELECT o AS lo, n AS n1, pos AS p1,
         lead(n) OVER (ORDER BY o) AS n2, lead(pos) OVER (ORDER BY o) AS p2
  FROM bins{k}
),
chi{k} AS (
  SELECT lo,
         CAST(round(1000000.0 * (n1 + n2)
              * ((CAST(p1 AS DOUBLE) * n2 - CAST(p2 AS DOUBLE) * n1)
                 * (CAST(p1 AS DOUBLE) * n2 - CAST(p2 AS DOUBLE) * n1))
              / (CAST(n1 AS DOUBLE) * n2 * (p1 + p2)
                 * (n1 + n2 - p1 - p2))) AS BIGINT) AS chi_micro
  FROM p{k} WHERE n2 IS NOT NULL AND p1 + p2 > 0
    AND n1 + n2 - p1 - p2 > 0
),
pick{k} AS (
  SELECT lo FROM chi{k} ORDER BY chi_micro, lo LIMIT 1
),
bins{k + 1} AS MATERIALIZED (
  SELECT CASE WHEN o > (SELECT lo FROM pick{k}) THEN o - 1 ELSE o END AS o,
         CAST(sum(n) AS BIGINT) AS n, CAST(sum(pos) AS BIGINT) AS pos,
         min(band_lo) AS band_lo, max(band_hi) AS band_hi
  FROM bins{k} GROUP BY 1
)"""


def _cm_oracle() -> str:
    rounds = "".join("," + _cm_round_sql(k) for k in range(CM_ROUNDS))
    return f"""
WITH labeled AS (
  SELECT CAST(floor(CAST(CAST(round(c.c_acctbal * 100) AS BIGINT) AS DOUBLE)
                    / {CM_BAND}) AS BIGINT) AS band,
         CASE WHEN coalesce(o.mx, 0) > 46710000 THEN 1 ELSE 0 END AS y
  FROM customer c
  LEFT JOIN (SELECT o_custkey, CAST(round(max(o_totalprice) * 100) AS BIGINT)
                    AS mx FROM orders GROUP BY 1) o
    ON o.o_custkey = c.c_custkey
),
b0 AS (
  SELECT band, CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS pos
  FROM labeled GROUP BY band
),
bins0 AS MATERIALIZED (
  SELECT CAST(row_number() OVER (ORDER BY band) AS BIGINT) AS o, n, pos,
         band AS band_lo, band AS band_hi
  FROM b0
){rounds}
SELECT o AS bin_ord, n, pos,
       CAST(round(1000.0 * pos / n) AS BIGINT) AS rate_milli,
       CAST(band_lo AS BIGINT) AS band_lo, CAST(band_hi AS BIGINT) AS band_hi
FROM bins{CM_ROUNDS}
"""


@query("ml_chimerge_binning", oracle=_cm_oracle())
def ml_chimerge_binning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ChiMerge supervised discretization (Kerber 1992): start from
    {CM_BAND}-cent account-balance bins and repeatedly merge the
    ADJACENT pair with the smallest 2x2 chi-square against the
    high-value label ({CM_ROUNDS} rounds; chi quantized to micro, tie →
    lower bin) — the bottom-up alternative to the top-down splits of
    ml_oblivious_tree_depth2, and the classic way to hand a scorecard
    monotone bins (feeds ml_woe_information_value). Emits the final
    bins with counts, rates, and merged band ranges.

    Scale shape: one histogram hash agg; each round is one window +
    1-row argmin + regroup over the BIN table (tiny) — the microdata is
    scanned once."""
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
                / CM_BAND
            )
            .cast("long")
            .alias("band"),
            F.when(F.coalesce("mx", F.lit(0)) > 46_710_000, 1)
            .otherwise(0)
            .alias("y"),
        )
    )
    b0 = labeled.groupBy("band").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").cast("long").alias("pos"),
    )
    bins = b0.select(
        F.row_number().over(Window.orderBy("band")).cast("long").alias("o"),
        "n",
        "pos",
        F.col("band").alias("band_lo"),
        F.col("band").alias("band_hi"),
    ).localCheckpoint(eager=True)
    for _ in range(CM_ROUNDS):
        w = Window.orderBy("o")
        p = bins.select(
            F.col("o").alias("lo"),
            F.col("n").alias("n1"),
            F.col("pos").alias("p1"),
            F.lead("n").over(w).alias("n2"),
            F.lead("pos").over(w).alias("p2"),
        ).filter(F.col("n2").isNotNull())
        diff = (
            F.col("p1").cast("double") * F.col("n2")
            - F.col("p2").cast("double") * F.col("n1")
        )
        chi = p.filter(
            (F.col("p1") + F.col("p2") > 0)
            & (F.col("n1") + F.col("n2") - F.col("p1") - F.col("p2") > 0)
        ).select(
            "lo",
            F.round(
                1_000_000.0
                * (F.col("n1") + F.col("n2"))
                * diff
                * diff
                / (
                    F.col("n1").cast("double")
                    * F.col("n2")
                    * (F.col("p1") + F.col("p2"))
                    * (F.col("n1") + F.col("n2") - F.col("p1") - F.col("p2"))
                )
            )
            .cast("long")
            .alias("chi_micro"),
        )
        pick = int(chi.orderBy("chi_micro", "lo").limit(1).first().lo)
        bins = (
            bins.groupBy(
                F.when(F.col("o") > pick, F.col("o") - 1)
                .otherwise(F.col("o"))
                .alias("o")
            )
            .agg(
                F.sum("n").cast("long").alias("n"),
                F.sum("pos").cast("long").alias("pos"),
                F.min("band_lo").alias("band_lo"),
                F.max("band_hi").alias("band_hi"),
            )
            .localCheckpoint(eager=True)
        )
    return bins.select(
        F.col("o").alias("bin_ord"),
        "n",
        "pos",
        F.round(1000.0 * F.col("pos") / F.col("n")).cast("long").alias(
            "rate_milli"
        ),
        F.col("band_lo").cast("long"),
        F.col("band_hi").cast("long"),
    )


# --------------------------------------------------------------------------
# 3. Watermark lateness audit
# --------------------------------------------------------------------------


@query(
    "dq_watermark_lateness",
    oracle=f"""
WITH gap AS (
  SELECT (epoch_us(max(ts)) - epoch_us(min(ts))) // count(*) AS g
  FROM events
),
arr AS (
  SELECT epoch_us(ts) AS tus,
         epoch_us(ts) + (event_id % {WM_JITTER_MOD}) * (SELECT g FROM gap)
           AS arrival,
         event_id
  FROM events
),
seq AS (
  SELECT tus,
         max(tus) OVER (ORDER BY arrival, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS high_us,
         lag(tus) OVER (ORDER BY arrival, event_id) AS prev_us
  FROM arr
),
late AS (
  SELECT (high_us - tus) // 1000 AS late_ms,
         CASE WHEN prev_us IS NOT NULL AND tus < prev_us THEN 1 ELSE 0 END
           AS inv
  FROM seq
)
SELECT CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(inv) AS BIGINT) AS n_inversions,
       CAST(round(1000000.0 * sum(inv) / count(*)) AS BIGINT)
         AS inversion_rate_micro,
       CAST(max(late_ms) AS BIGINT) AS max_late_ms,
       CAST(round(CAST(sum(late_ms) AS DOUBLE) / count(*)) AS BIGINT)
         AS mean_late_ms
FROM late
""",
)
def dq_watermark_lateness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark sizing audit: events are replayed in a deterministic
    jittered ARRIVAL order (delivery delay = event_id mod
    {WM_JITTER_MOD} multiples of the mean inter-event gap — data-scaled
    so the shuffle is real at every scale factor; the reproducible
    stand-in for network skew), and each event's event-time lateness is
    measured against the running high watermark of the arrival stream. Emits the adjacent-
    inversion rate and the max/mean lateness in ms — max_late_ms IS the
    withWatermark() delay that would lose zero events, and the mean
    says how much state a tighter bound would drop. The batch twin of
    what stream_dedup_watermark assumes.

    Scale shape (r7): the watermark and the lag both decompose into
    Fenwick prefix aggregates + arrival-partitioned tie windows (no
    global sort; per-key watermarks shard further in production), one
    rollup."""
    ev = load(spark, sf_dir, "events")
    gap = ev.agg(
        F.expr(
            "(unix_micros(max(ts)) - unix_micros(min(ts))) div count(*)"
        ).alias("g")
    )
    arr = ev.crossJoin(F.broadcast(gap)).select(
        F.unix_micros("ts").alias("tus"),
        (
            F.unix_micros("ts")
            + (F.col("event_id") % WM_JITTER_MOD) * F.col("g")
        ).alias("arrival"),
        "event_id",
    )
    # r7: the running watermark and the lag ride ONE range-partitioned
    # two-phase scan (ranged_rank_cumsum: distributed range sort +
    # partition-local windows + a #partitions-sized broadcast offset
    # table) — arrival domains are near-unique, where this beats the
    # Fenwick form's per-distinct-value explode by ~3×; no global sort,
    # no single-partition stage
    sc = ranged_rank_cumsum(
        arr, "arrival", "event_id", max_cols=("tus",), lag_col="tus"
    )
    seq = sc.select(
        "tus",
        F.col("cummax_tus").alias("high_us"),
        F.col("prev_tus").alias("prev_us"),
    )
    late = seq.select(
        F.expr("(high_us - tus) div 1000").alias("late_ms"),
        F.when(
            F.col("prev_us").isNotNull() & (F.col("tus") < F.col("prev_us")), 1
        )
        .otherwise(0)
        .alias("inv"),
    )
    return late.agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum("inv").cast("long").alias("n_inversions"),
        F.round(1_000_000.0 * F.sum("inv") / F.count(F.lit(1)))
        .cast("long")
        .alias("inversion_rate_micro"),
        F.max("late_ms").cast("long").alias("max_late_ms"),
        F.round(F.sum("late_ms").cast("double") / F.count(F.lit(1)))
        .cast("long")
        .alias("mean_late_ms"),
    )


# --------------------------------------------------------------------------
# 4. CAGR
# --------------------------------------------------------------------------


@query(
    "agg_cagr_revenue",
    oracle="""
WITH yr AS (
  SELECT n.n_name AS nation, extract(year FROM o.o_orderdate) AS y,
         CAST(sum(CAST(round(100 * o.o_totalprice) AS BIGINT)) AS BIGINT)
           AS rev
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  GROUP BY 1, 2
),
fl AS (
  SELECT nation,
         min(y) AS y0, max(y) AS y1,
         max(CASE WHEN y = (SELECT min(y2.y) FROM yr y2
                            WHERE y2.nation = yr.nation) THEN rev END) AS rev0,
         max(CASE WHEN y = (SELECT max(y2.y) FROM yr y2
                            WHERE y2.nation = yr.nation) THEN rev END) AS rev1
  FROM yr GROUP BY nation
)
SELECT nation, CAST(y1 - y0 AS BIGINT) AS span_years,
       rev0 AS first_year_cents, rev1 AS last_year_cents,
       CASE WHEN y1 > y0 AND rev0 > 0
            THEN CAST(round(1000000 * (exp(ln(CAST(rev1 AS DOUBLE) / rev0)
                                           / (y1 - y0)) - 1)) AS BIGINT)
       END AS cagr_micro
FROM fl
""",
)
def agg_cagr_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compound annual growth rate of revenue per nation between its
    first and last order years: CAGR = (rev_last/rev_first)^(1/span)−1,
    computed as exp(ln(ratio)/span) on the exact integer-cent ratio —
    the ln/exp form both engines' libm agree on (the KM 'libm-parity
    grid' precedent), where pow() would risk a final-ulp flip. The
    single normalized growth number the per-period bridges
    (agg_revenue_retention_bridge) don't give.

    Scale shape: one three-table join + year hash agg, a nation-grain
    first/last pick, narrow arithmetic."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    yr = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("y"))
        .agg(
            F.sum(F.round(100 * F.col("o_totalprice")).cast("long"))
            .cast("long")
            .alias("rev")
        )
    )
    wn = Window.partitionBy("nation")
    fl = (
        yr.withColumn("y0", F.min("y").over(wn))
        .withColumn("y1", F.max("y").over(wn))
        .groupBy("nation")
        .agg(
            F.max("y0").alias("y0"),
            F.max("y1").alias("y1"),
            F.max(F.when(F.col("y") == F.col("y0"), F.col("rev"))).alias("rev0"),
            F.max(F.when(F.col("y") == F.col("y1"), F.col("rev"))).alias("rev1"),
        )
    )
    span = F.col("y1") - F.col("y0")
    return fl.select(
        "nation",
        span.cast("long").alias("span_years"),
        F.col("rev0").cast("long").alias("first_year_cents"),
        F.col("rev1").cast("long").alias("last_year_cents"),
        F.when(
            (span > 0) & (F.col("rev0") > 0),
            F.round(
                1_000_000
                * (
                    F.exp(
                        F.log(F.col("rev1").cast("double") / F.col("rev0"))
                        / span
                    )
                    - 1
                )
            ).cast("long"),
        ).alias("cagr_micro"),
    )


# --------------------------------------------------------------------------
# 5. Ulcer index
# --------------------------------------------------------------------------


@query(
    "window_ulcer_index",
    oracle="""
WITH m AS (
  SELECT strftime(o_orderdate, '%Y-%m') AS mon,
         CAST(sum(CAST(round(100 * o_totalprice) AS BIGINT)) AS BIGINT) AS rev
  FROM orders GROUP BY 1
),
tot AS (SELECT CAST(sum(rev) AS BIGINT) AS t, CAST(count(*) AS BIGINT) AS k FROM m),
nav AS (
  SELECT mon,
         sum(rev * (SELECT k FROM tot) - (SELECT t FROM tot))
           OVER (ORDER BY mon ROWS BETWEEN UNBOUNDED PRECEDING
                 AND CURRENT ROW) AS nav
  FROM m
),
dd AS (
  SELECT nav,
         max(nav) OVER (ORDER BY mon ROWS BETWEEN UNBOUNDED PRECEDING
                        AND CURRENT ROW) - nav AS drawdown
  FROM nav
)
SELECT CAST(count(*) AS BIGINT) AS n_months,
       CAST(max(drawdown) AS BIGINT) AS max_drawdown,
       CAST(round(sqrt(CAST(sum(CAST(drawdown AS HUGEINT) * drawdown)
                            AS DOUBLE) / count(*)))
            AS BIGINT) AS ulcer_index
FROM dd
""",
)
def window_ulcer_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ulcer index of the monthly centered-NAV series (the CUSUM NAV
    from agg_high_watermark_fees): UI = RMS of the running-max drawdown
    — unlike max drawdown (window_drawdown), it penalizes DEPTH AND
    DURATION of underwater stretches, which is why risk desks prefer it
    to volatility for pain measurement. Drawdowns are exact integers
    off one running max; only the final sqrt divides.

    Scale shape: month-grain hash agg, one ordered window serving the
    CUSUM and the running max, 1-row rollup."""
    m = (
        load(spark, sf_dir, "orders")
        .groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("mon"))
        .agg(
            F.sum(F.round(100 * F.col("o_totalprice")).cast("long"))
            .cast("long")
            .alias("rev")
        )
    )
    tot = m.agg(
        F.sum("rev").cast("long").alias("t"),
        F.count(F.lit(1)).cast("long").alias("k"),
    )
    w = Window.orderBy("mon").rowsBetween(Window.unboundedPreceding, 0)
    nav = m.crossJoin(F.broadcast(tot)).select(
        "mon",
        F.sum(F.col("rev") * F.col("k") - F.col("t")).over(w).alias("nav"),
    )
    dd = nav.select((F.max("nav").over(w) - F.col("nav")).alias("drawdown"))
    return dd.agg(
        F.count(F.lit(1)).cast("long").alias("n_months"),
        F.max("drawdown").cast("long").alias("max_drawdown"),
        F.round(
            F.sqrt(
                F.sum(
                    F.col("drawdown").cast("decimal(38,0)") * F.col("drawdown")
                ).cast("double")
                / F.count(F.lit(1))
            )
        )
        .cast("long")
        .alias("ulcer_index"),
    )


# --------------------------------------------------------------------------
# 6. Geohash codec
# --------------------------------------------------------------------------


def _gh_interleave_sql(lon: str, lat: str) -> str:
    terms = []
    for i in range(GH_BITS):
        terms.append(f"(({lon} // {1 << i}) % 2) * {1 << (2 * i + 1)}")
        terms.append(f"(({lat} // {1 << i}) % 2) * {1 << (2 * i)}")
    return " + ".join(terms)


def _gh_extract_sql(g: str, offset: int) -> str:
    terms = [
        f"(({g} // {1 << (2 * i + offset)}) % 2) * {1 << i}"
        for i in range(GH_BITS)
    ]
    return " + ".join(terms)


@query(
    "geo_geohash_codec",
    oracle=f"""
WITH pts AS (
  SELECT c_custkey AS id,
         (c_custkey * 7919) % 18000 AS lat_c,
         (c_custkey * 104729) % 36000 AS lon_c
  FROM customer
),
q AS (
  SELECT id,
         (lat_c * {1 << GH_BITS}) // 18000 AS lat_i,
         (lon_c * {1 << GH_BITS}) // 36000 AS lon_i
  FROM pts
),
enc AS (
  SELECT id, lat_i, lon_i,
         {_gh_interleave_sql("lon_i", "lat_i")} AS g
  FROM q
),
txt AS (
  SELECT id, lat_i, lon_i, g,
         substr('{GH_ALPHABET}', CAST((g // 33554432) % 32 AS BIGINT) + 1, 1)
         || substr('{GH_ALPHABET}', CAST((g // 1048576) % 32 AS BIGINT) + 1, 1)
         || substr('{GH_ALPHABET}', CAST((g // 32768) % 32 AS BIGINT) + 1, 1)
         || substr('{GH_ALPHABET}', CAST((g // 1024) % 32 AS BIGINT) + 1, 1)
         || substr('{GH_ALPHABET}', CAST((g // 32) % 32 AS BIGINT) + 1, 1)
         || substr('{GH_ALPHABET}', CAST(g % 32 AS BIGINT) + 1, 1) AS geohash
  FROM enc
),
dec AS (
  SELECT id, geohash,
         ({_gh_extract_sql("g", 1)}) = lon_i AS lon_ok,
         ({_gh_extract_sql("g", 0)}) = lat_i AS lat_ok
  FROM txt
)
SELECT CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CASE WHEN lon_ok AND lat_ok THEN 1 ELSE 0 END) AS BIGINT)
         AS n_roundtrip_ok,
       CAST(count(DISTINCT geohash) AS BIGINT) AS n_distinct_cells,
       min(geohash) AS min_hash, max(geohash) AS max_hash
FROM dec
""",
)
def geo_geohash_codec(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geohash encode/decode over synthetic customer coordinates:
    lat/lon quantize to {GH_BITS}-bit cell indices, interleave
    (longitude first — the geohash convention) into a 30-bit cell id,
    render as a 6-character base32 string with the standard geohash
    alphabet, then EXTRACT both indices back and verify the roundtrip —
    the prefix-searchable spatial key (shared prefixes = nearby cells)
    behind geo-sharded storage, complementing fn_morton_zorder (raw
    curve) and geo_morton_hotspots (aggregation). All bit plumbing is
    integer div/mod arithmetic generated from ONE Python template for
    both engines.

    Scale shape: pure narrow arithmetic in whole-stage codegen + one
    rollup."""
    pts = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("id"),
        ((F.col("c_custkey") * 7919) % 18000).alias("lat_c"),
        ((F.col("c_custkey") * 104729) % 36000).alias("lon_c"),
    )
    q = pts.select(
        "id",
        F.expr(f"(lat_c * {1 << GH_BITS}) div 18000").alias("lat_i"),
        F.expr(f"(lon_c * {1 << GH_BITS}) div 36000").alias("lon_i"),
    )
    inter = _gh_interleave_sql("lon_i", "lat_i").replace("//", "div")
    enc = q.select("id", "lat_i", "lon_i", F.expr(inter).alias("g"))
    parts = [
        F.expr(
            f"substr('{GH_ALPHABET}', CAST((g div {32 ** (5 - j)}) % 32 AS INT)"
            " + 1, 1)"
        )
        for j in range(6)
    ]
    txt = enc.select(
        "id",
        "lat_i",
        "lon_i",
        "g",
        F.concat(*parts).alias("geohash"),
    )
    lon_back = _gh_extract_sql("g", 1).replace("//", "div")
    lat_back = _gh_extract_sql("g", 0).replace("//", "div")
    dec = txt.select(
        "geohash",
        (F.expr(lon_back) == F.col("lon_i")).alias("lon_ok"),
        (F.expr(lat_back) == F.col("lat_i")).alias("lat_ok"),
    )
    return dec.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.when(F.col("lon_ok") & F.col("lat_ok"), 1).otherwise(0))
        .cast("long")
        .alias("n_roundtrip_ok"),
        F.countDistinct("geohash").cast("long").alias("n_distinct_cells"),
        F.min("geohash").alias("min_hash"),
        F.max("geohash").alias("max_hash"),
    )
