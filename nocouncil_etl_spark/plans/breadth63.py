"""Breadth batch 43 (round 6): Hilbert-vs-Morton layout locality,
soft-dedup weighting, Snowflake id codec, Apdex scoring, Oaxaca-Blinder
decomposition, Markov entropy rate.

Six operators (reference scope: space-filling-curve layout choice, the
down-weight-don't-drop dedup policy, distributed id generation audit,
the SLA satisfaction index, two-group gap econometrics, and the
information rate of the behavioral event stream):

- ``layout_hilbert_skip``       — files touched and contiguous runs for
  one 2-D box query under Hilbert vs Morton file ordering.
- ``curation_soft_dedup_weights`` — SoftDeDup: 1/cluster-size sampling
  weights instead of dropping duplicates; effective sizes per source.
- ``fn_snowflake_id_codec``     — Snowflake-style (ts|worker|seq) id
  encode/decode roundtrip and per-worker monotonicity audit.
- ``agg_apdex_score``           — Apdex = (satisfied + tolerating/2)/n
  per event type on the exact cents grid.
- ``agg_oaxaca_blinder``        — two-fold Oaxaca-Blinder decomposition
  of the revenue gap between customer groups.
- ``ts_markov_entropy_rate``    — empirical entropy rate of the
  event-type transition chain (nats, exact-integer inputs).

Reference parity: north-star extension — no reference analogue
(the reference has no analytics layer); these are standard lake-engine audits over the
same tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nocouncil_etl_spark.io import load
from nocouncil_etl_spark.registry import query

HB_N = 16  # Hilbert/Morton grid side (order-4 curve)
HB_FILE = 16  # cells per file
HB_BOX = (4, 11, 2, 9)  # gx_lo, gx_hi, gy_lo, gy_hi
SNOW_WORKER_BITS = 10
SNOW_SEQ_BITS = 12
APDEX_T_CENTS = 25_000  # satisfied threshold (tolerating = 4T)
OB_SCALE = 1000


def _xy2d(n: int, x: int, y: int) -> int:
    """Classic Hilbert xy→d (Wikipedia's algorithm), evaluated in Python
    so both engines read the SAME literal lookup table."""
    d = 0
    s = n // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        s //= 2
    return d


def _morton(x: int, y: int) -> int:
    m = 0
    for i in range(8):
        m |= ((x >> i) & 1) << (2 * i) | ((y >> i) & 1) << (2 * i + 1)
    return m


def _curve_rows() -> list[tuple[int, int, int, int]]:
    return [
        (x, y, _xy2d(HB_N, x, y), _morton(x, y))
        for x in range(HB_N)
        for y in range(HB_N)
    ]


# --------------------------------------------------------------------------
# 1. Hilbert vs Morton skip
# --------------------------------------------------------------------------


def _hb_oracle_real() -> str:
    vals = ", ".join(f"({x}, {y}, {h}, {m})" for x, y, h, m in _curve_rows())
    lo_x, hi_x, lo_y, hi_y = HB_BOX
    per_curve = []
    for name, col in (("hilbert", "hd"), ("morton", "md")):
        per_curve.append(f"""
SELECT '{name}' AS curve,
       (SELECT CAST(count(*) AS BIGINT) FROM boxed) AS n_points,
       CAST(count(*) AS BIGINT) AS n_files,
       CAST(count(*) - sum(CASE WHEN prev = f - 1 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_runs
FROM (
  SELECT f, lag(f) OVER (ORDER BY f) AS prev FROM (
    SELECT DISTINCT {col} // {HB_FILE} AS f FROM boxed
  )
)""")
    body = "\nUNION ALL\n".join(per_curve)
    return f"""
WITH pts AS (
  SELECT CAST(round(c_acctbal * 100) AS BIGINT) % {HB_N} AS gx,
         c_nationkey % {HB_N} AS gy
  FROM customer
),
curve(gx, gy, hd, md) AS (VALUES {vals}),
boxed AS (
  SELECT c.hd, c.md FROM pts p JOIN curve c ON c.gx = p.gx AND c.gy = p.gy
  WHERE p.gx BETWEEN {lo_x} AND {hi_x} AND p.gy BETWEEN {lo_y} AND {hi_y}
)
{body}
"""


@query("layout_hilbert_skip", oracle=_hb_oracle_real())
def layout_hilbert_skip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Space-filling-curve layout choice, measured: customers land on a
    {HB_N}x{HB_N} (balance, nation) grid; files hold {HB_FILE}
    consecutive CURVE positions; one 2-D box query then touches some
    files under Hilbert ordering and some under Morton
    (layout_zorder_skip's curve). Reports, per curve, files touched AND
    the number of contiguous file RUNS — the number Hilbert actually
    improves (fewer, longer runs = fewer seeks / range reads; Morton's
    Z-jumps split them). Both curves come from ONE literal 256-cell
    lookup table computed in Python, so the engines agree bit-for-bit.

    Scale shape: the curve table is a broadcast literal; the box filter
    prunes before the join; run-counting is a window over ≤{HB_N * HB_N
    // HB_FILE} file ids."""
    lo_x, hi_x, lo_y, hi_y = HB_BOX
    pts = load(spark, sf_dir, "customer").select(
        (F.round(F.col("c_acctbal") * 100).cast("long") % HB_N).alias("gx"),
        (F.col("c_nationkey") % HB_N).alias("gy"),
    )
    curve = spark.createDataFrame(
        _curve_rows(), "gx long, gy long, hd long, md long"
    )
    boxed = (
        pts.filter(
            F.col("gx").between(lo_x, hi_x) & F.col("gy").between(lo_y, hi_y)
        )
        .join(F.broadcast(curve), ["gx", "gy"])
        .select("hd", "md")
    )
    boxed.persist()
    n_points = boxed.count()

    def stats(col: str, name: str) -> DataFrame:
        files = boxed.select(
            F.floor(F.col(col) / HB_FILE).cast("long").alias("f")
        ).distinct()
        w = Window.orderBy("f")
        runs = files.select("f", F.lag("f").over(w).alias("prev"))
        return runs.agg(
            F.lit(name).alias("curve"),
            F.lit(n_points).cast("long").alias("n_points"),
            F.count(F.lit(1)).cast("long").alias("n_files"),
            (
                F.count(F.lit(1))
                - F.sum(
                    F.when(F.col("prev") == F.col("f") - 1, 1).otherwise(0)
                )
            )
            .cast("long")
            .alias("n_runs"),
        ).select("curve", "n_points", "n_files", "n_runs")

    return stats("hd", "hilbert").unionByName(stats("md", "morton"))


# --------------------------------------------------------------------------
# 2. Soft-dedup weighting
# --------------------------------------------------------------------------


@query(
    "curation_soft_dedup_weights",
    oracle="""
WITH cl AS (
  SELECT source, md5(text) AS fp,
         len(string_split(text, ' ')) AS toks
  FROM documents
),
sizes AS (SELECT fp, CAST(count(*) AS BIGINT) AS csize FROM cl GROUP BY fp),
wt AS (
  SELECT cl.source, cl.toks, s.csize,
         CAST(1000000 // s.csize AS BIGINT) AS w_micro
  FROM cl JOIN sizes s ON s.fp = cl.fp
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(toks) AS BIGINT) AS tokens,
       CAST(sum(w_micro) AS BIGINT) AS effective_docs_micro,
       CAST(sum(w_micro * toks) AS BIGINT) AS effective_tokens_micro,
       CAST(sum(CASE WHEN csize > 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_in_dup_clusters
FROM wt GROUP BY source
""",
)
def curation_soft_dedup_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SoftDeDup (down-weight, don't drop): every document gets sampling
    weight 1/|duplicate cluster| (content-hash clusters — swap in the
    minhash components from dedup_cluster_components for near-dup
    clusters), so a k-way duplicate family contributes exactly one
    document's worth of expected training mass while keeping its best
    copies available to the sampler — the curation policy that beats
    hard dedup when duplicates differ in quality. Weights are exact
    integer micro units (1e6 // k); emits per-source document/token
    counts and their EFFECTIVE (weighted) counterparts — the numbers a
    mixture planner (curation_mix_waterfill) should consume instead of
    raw counts.

    Scale shape: one fingerprint hash agg for cluster sizes, one
    equi-join back, one source rollup — identical cost to exact dedup,
    but lossless."""
    cl = load(spark, sf_dir, "documents").select(
        "source",
        F.md5("text").alias("fp"),
        F.size(F.split("text", " ")).cast("long").alias("toks"),
    )
    sizes = cl.groupBy("fp").agg(F.count(F.lit(1)).cast("long").alias("csize"))
    wt = cl.join(sizes, "fp").select(
        "source",
        "toks",
        "csize",
        F.expr("1000000 div csize").cast("long").alias("w_micro"),
    )
    return wt.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("toks").cast("long").alias("tokens"),
        F.sum("w_micro").cast("long").alias("effective_docs_micro"),
        F.sum(F.col("w_micro") * F.col("toks"))
        .cast("long")
        .alias("effective_tokens_micro"),
        F.sum(F.when(F.col("csize") > 1, 1).otherwise(0))
        .cast("long")
        .alias("n_in_dup_clusters"),
    )


# --------------------------------------------------------------------------
# 3. Snowflake id codec
# --------------------------------------------------------------------------


@query(
    "fn_snowflake_id_codec",
    oracle=f"""
WITH base AS (
  SELECT epoch_ms(ts) AS ms, user_id % {1 << SNOW_WORKER_BITS} AS worker,
         event_id
  FROM events
),
seqd AS (
  SELECT ms, worker,
         (row_number() OVER (PARTITION BY ms, worker ORDER BY event_id) - 1)
           % {1 << SNOW_SEQ_BITS} AS seq
  FROM base
),
ids AS (
  SELECT ms, worker, seq,
         ms * {1 << (SNOW_WORKER_BITS + SNOW_SEQ_BITS)}
         + worker * {1 << SNOW_SEQ_BITS} + seq AS id
  FROM seqd
),
dec AS (
  SELECT ms, worker, seq, id,
         id // {1 << (SNOW_WORKER_BITS + SNOW_SEQ_BITS)} AS ms2,
         (id // {1 << SNOW_SEQ_BITS}) % {1 << SNOW_WORKER_BITS} AS worker2,
         id % {1 << SNOW_SEQ_BITS} AS seq2
  FROM ids
)
SELECT CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CASE WHEN ms = ms2 AND worker = worker2 AND seq = seq2
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_roundtrip_ok,
       CAST(count(DISTINCT id) AS BIGINT) AS n_distinct_ids,
       CAST(count(DISTINCT worker) AS BIGINT) AS n_workers,
       CAST(max(seq) AS BIGINT) AS max_seq
FROM dec
""",
)
def fn_snowflake_id_codec(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snowflake-style distributed id generation, encoded and audited:
    id = timestamp_ms · 2^{SNOW_WORKER_BITS + SNOW_SEQ_BITS} + worker ·
    2^{SNOW_SEQ_BITS} + sequence (the Twitter layout — time-sortable,
    worker-unique, {1 << SNOW_SEQ_BITS}-per-ms throughput). Sequence
    numbers come from a (ms, worker) window rank; decoding is pure
    integer division/modulo. The audit: every id roundtrips its three
    fields exactly and ids are globally distinct — the property the
    layout exists to guarantee without coordination.

    Scale shape: one (ms, worker)-partitioned window (tiny partitions by
    construction — that IS the generator's shard), narrow arithmetic,
    one rollup."""
    shift_w = 1 << SNOW_SEQ_BITS
    shift_t = 1 << (SNOW_WORKER_BITS + SNOW_SEQ_BITS)
    base = load(spark, sf_dir, "events").select(
        F.expr("unix_micros(ts) div 1000").alias("ms"),
        (F.col("user_id") % (1 << SNOW_WORKER_BITS)).alias("worker"),
        "event_id",
    )
    w = Window.partitionBy("ms", "worker").orderBy("event_id")
    seqd = base.select(
        "ms",
        "worker",
        ((F.row_number().over(w) - 1) % (1 << SNOW_SEQ_BITS)).alias("seq"),
    )
    ids = seqd.withColumn(
        "id",
        F.col("ms") * shift_t + F.col("worker") * shift_w + F.col("seq"),
    )
    dec = ids.select(
        "ms",
        "worker",
        "seq",
        "id",
        F.expr(f"id div {shift_t}").alias("ms2"),
        (F.expr(f"id div {shift_w}") % (1 << SNOW_WORKER_BITS)).alias("worker2"),
        (F.col("id") % (1 << SNOW_SEQ_BITS)).alias("seq2"),
    )
    ok = (
        (F.col("ms") == F.col("ms2"))
        & (F.col("worker") == F.col("worker2"))
        & (F.col("seq") == F.col("seq2"))
    )
    return dec.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.when(ok, 1).otherwise(0)).cast("long").alias("n_roundtrip_ok"),
        F.countDistinct("id").cast("long").alias("n_distinct_ids"),
        F.countDistinct("worker").cast("long").alias("n_workers"),
        F.max("seq").cast("long").alias("max_seq"),
    )


# --------------------------------------------------------------------------
# 4. Apdex
# --------------------------------------------------------------------------


@query(
    "agg_apdex_score",
    oracle=f"""
WITH v AS (
  SELECT event_type, CAST(round(100 * value) AS BIGINT) AS x
  FROM events WHERE value IS NOT NULL
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CASE WHEN x <= {APDEX_T_CENTS} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_satisfied,
       CAST(sum(CASE WHEN x > {APDEX_T_CENTS} AND x <= {4 * APDEX_T_CENTS}
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_tolerating,
       CAST(round(1000.0 * (sum(CASE WHEN x <= {APDEX_T_CENTS} THEN 2
                                     WHEN x <= {4 * APDEX_T_CENTS} THEN 1
                                     ELSE 0 END)) / (2 * count(*)))
            AS BIGINT) AS apdex_milli
FROM v GROUP BY event_type
""",
)
def agg_apdex_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apdex (Application Performance Index) per event type with the
    value column as the latency proxy: satisfied ≤ T
    ({APDEX_T_CENTS} cents), tolerating ≤ 4T, frustrated beyond;
    Apdex = (satisfied + tolerating/2) / n — the industry SLA
    satisfaction index, computed halved-integer exactly (the 2x trick
    avoids any fractional intermediate). The single-number cousin of
    agg_cycle_time_percentiles.

    Scale shape: one map-side-combined hash agg; entirely
    whole-stage-codegen arithmetic."""
    v = (
        load(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            "event_type", F.round(100 * F.col("value")).cast("long").alias("x")
        )
    )
    sat = F.col("x") <= APDEX_T_CENTS
    tol = (F.col("x") > APDEX_T_CENTS) & (F.col("x") <= 4 * APDEX_T_CENTS)
    twox = F.when(sat, 2).when(F.col("x") <= 4 * APDEX_T_CENTS, 1).otherwise(0)
    return v.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.when(sat, 1).otherwise(0)).cast("long").alias("n_satisfied"),
        F.sum(F.when(tol, 1).otherwise(0)).cast("long").alias("n_tolerating"),
        F.round(1000.0 * F.sum(twox) / (2 * F.count(F.lit(1))))
        .cast("long")
        .alias("apdex_milli"),
    )


# --------------------------------------------------------------------------
# 5. Oaxaca-Blinder
# --------------------------------------------------------------------------


@query(
    "agg_oaxaca_blinder",
    oracle="""
WITH cust AS (
  SELECT c.c_custkey, c.c_nationkey % 2 AS grp,
         coalesce(o.cnt, 0) AS x, coalesce(o.rev, 0) AS y
  FROM customer c
  LEFT JOIN (
    SELECT o_custkey, CAST(count(*) AS BIGINT) AS cnt,
           CAST(sum(CAST(round(100 * o_totalprice) AS BIGINT)) AS BIGINT) AS rev
    FROM orders GROUP BY 1
  ) o ON o.o_custkey = c.c_custkey
),
mom AS (
  SELECT grp, CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS sx,
         CAST(sum(CAST(x AS HUGEINT) * x) AS DOUBLE) AS sxx,
         CAST(sum(CAST(y AS HUGEINT)) AS DOUBLE) AS sy,
         CAST(sum(CAST(y AS HUGEINT) * x) AS DOUBLE) AS sxy
  FROM cust GROUP BY grp
),
fit AS (
  SELECT grp, n, sx, sy,
         (n * sxy - sx * sy) / (n * sxx - CAST(sx AS DOUBLE) * sx) AS beta,
         sy / n - (n * sxy - sx * sy) / (n * sxx - CAST(sx AS DOUBLE) * sx)
           * (CAST(sx AS DOUBLE) / n) AS alpha,
         CAST(sx AS DOUBLE) / n AS xbar, sy / n AS ybar
  FROM mom
)
SELECT CAST(round(a.ybar - b.ybar) AS BIGINT) AS gap_cents,
       CAST(round((a.xbar - b.xbar) * b.beta) AS BIGINT) AS explained_cents,
       CAST(round((a.beta - b.beta) * a.xbar + (a.alpha - b.alpha)) AS BIGINT)
         AS unexplained_cents,
       a.n AS n_group_a, b.n AS n_group_b
FROM (SELECT * FROM fit WHERE grp = 0) a
CROSS JOIN (SELECT * FROM fit WHERE grp = 1) b
""",
)
def agg_oaxaca_blinder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-fold Oaxaca-Blinder decomposition of the mean revenue gap
    between customer groups (nation parity): gap = ȳ_A − ȳ_B splits
    into the EXPLAINED part (endowment difference x̄_A − x̄_B priced at
    group B's coefficient) and the UNEXPLAINED part (coefficient +
    intercept differences at A's endowment) — the standard wage-gap /
    fairness-audit econometric, here on order-count as the endowment.
    Per-group OLS comes from exact integer moments (HUGEINT/DECIMAL for
    the cross term); the decomposition closes by construction.

    Scale shape: one per-customer pre-aggregate, one 2-group moment
    hash agg, 1-row arithmetic."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    per = orders.groupBy("o_custkey").agg(
        F.count(F.lit(1)).cast("long").alias("cnt"),
        F.sum(F.round(100 * F.col("o_totalprice")).cast("long"))
        .cast("long")
        .alias("rev"),
    )
    base = cust.join(per, cust["c_custkey"] == per["o_custkey"], "left").select(
        (F.col("c_nationkey") % 2).alias("grp"),
        F.coalesce("cnt", F.lit(0)).alias("x"),
        F.coalesce("rev", F.lit(0)).alias("y"),
    )
    dec = "decimal(38,0)"
    mom = base.groupBy("grp").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum((F.col("x") * F.col("x")).cast(dec)).cast("double").alias("sxx"),
        F.sum(F.col("y").cast(dec)).cast("double").alias("sy"),
        F.sum((F.col("y").cast(dec) * F.col("x"))).cast("double").alias("sxy"),
    )
    n, sx = F.col("n"), F.col("sx")
    beta = (n * F.col("sxy") - sx * F.col("sy")) / (
        n * F.col("sxx") - sx.cast("double") * sx
    )
    fit = mom.select(
        "grp",
        "n",
        beta.alias("beta"),
        (F.col("sy") / n - beta * (sx.cast("double") / n)).alias("alpha"),
        (sx.cast("double") / n).alias("xbar"),
        (F.col("sy") / n).alias("ybar"),
    )
    a = fit.filter(F.col("grp") == 0).select(
        F.col("n").alias("na"),
        F.col("beta").alias("ba"),
        F.col("alpha").alias("aa"),
        F.col("xbar").alias("xa"),
        F.col("ybar").alias("ya"),
    )
    b = fit.filter(F.col("grp") == 1).select(
        F.col("n").alias("nb"),
        F.col("beta").alias("bb"),
        F.col("alpha").alias("ab"),
        F.col("xbar").alias("xb"),
        F.col("ybar").alias("yb"),
    )
    return a.crossJoin(F.broadcast(b)).select(
        F.round(F.col("ya") - F.col("yb")).cast("long").alias("gap_cents"),
        F.round((F.col("xa") - F.col("xb")) * F.col("bb"))
        .cast("long")
        .alias("explained_cents"),
        F.round(
            (F.col("ba") - F.col("bb")) * F.col("xa")
            + (F.col("aa") - F.col("ab"))
        )
        .cast("long")
        .alias("unexplained_cents"),
        F.col("na").alias("n_group_a"),
        F.col("nb").alias("n_group_b"),
    )


# --------------------------------------------------------------------------
# 6. Markov entropy rate
# --------------------------------------------------------------------------


@query(
    "ts_markov_entropy_rate",
    oracle="""
WITH t AS (
  SELECT event_type,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev
  FROM events
),
cnt AS (
  SELECT prev, event_type, CAST(count(*) AS BIGINT) AS nij
  FROM t WHERE prev IS NOT NULL GROUP BY 1, 2
),
rowt AS (SELECT prev, CAST(sum(nij) AS BIGINT) AS ni FROM cnt GROUP BY prev),
tot AS (SELECT CAST(sum(nij) AS BIGINT) AS nn FROM cnt),
terms AS (
  SELECT CAST(round(1000000.0 * c.nij / (SELECT nn FROM tot)
                    * ln(CAST(r.ni AS DOUBLE) / c.nij)) AS BIGINT) AS h_micro
  FROM cnt c JOIN rowt r ON r.prev = c.prev
)
SELECT (SELECT nn FROM tot) AS n_transitions,
       (SELECT CAST(count(*) AS BIGINT) FROM rowt) AS n_states,
       CAST(sum(h_micro) AS BIGINT) AS entropy_rate_micro
FROM terms
""",
)
def ts_markov_entropy_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empirical entropy rate of the per-user event-type Markov chain:
    H = −Σ_ij (n_ij/N)·ln(p_ij) with p_ij = n_ij/n_i, i.e. the expected
    per-step surprise of the NEXT event given the current one (nats) —
    the scalar that says how predictable user behavior is
    (session_transitions exposes the matrix; this is its information
    rate, the compressibility floor for behavioral logs). Per-cell
    terms quantize to micro-nats before the sum, so the scalar is an
    exact integer.

    Scale shape: one user-partitioned lag window, one |types|² hash
    agg, arithmetic on the tiny matrix."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t = ev.select("event_type", F.lag("event_type").over(w).alias("prev"))
    cnt = (
        t.filter(F.col("prev").isNotNull())
        .groupBy("prev", "event_type")
        .agg(F.count(F.lit(1)).cast("long").alias("nij"))
    )
    rowt = cnt.groupBy("prev").agg(F.sum("nij").cast("long").alias("ni"))
    tot = cnt.agg(F.sum("nij").cast("long").alias("nn"))
    nstates = rowt.agg(F.count(F.lit(1)).cast("long").alias("n_states"))
    terms = (
        cnt.join(rowt, "prev")
        .crossJoin(F.broadcast(tot))
        .select(
            F.round(
                1_000_000.0
                * F.col("nij")
                / F.col("nn")
                * F.log(F.col("ni").cast("double") / F.col("nij"))
            )
            .cast("long")
            .alias("h_micro")
        )
    )
    return (
        terms.agg(F.sum("h_micro").cast("long").alias("entropy_rate_micro"))
        .crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(nstates))
        .select(
            F.col("nn").alias("n_transitions"),
            "n_states",
            "entropy_rate_micro",
        )
    )
