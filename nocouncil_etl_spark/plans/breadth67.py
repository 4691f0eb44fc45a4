"""Breadth batch 47 (round 6): Erlang-C staffing, Mondrian
k-anonymization, k-gram fuzzy search, CAPM beta, histogram
selectivity, Simpson diversity.

Six operators (reference scope: queueing-based capacity planning,
the canonical multidimensional anonymization partitioner, tolerant
retrieval by character k-grams, the finance factor regression, the
histogram upgrade to CBO selectivity, and the second classical
diversity index):

- ``agg_erlang_c_staffing``   — Erlang B/C over a server grid from the
  measured arrival rate (unrolled exact recursion).
- ``privacy_mondrian_2level`` — two-level Mondrian median splits on
  (balance, order count) with per-leaf k and generalized ranges.
- ``search_kgram_fuzzy``      — character-bigram candidate generation
  + edit-distance-1 verification for misspelled queries.
- ``ts_capm_beta``            — per-type beta/alpha/R² against the
  market (total) daily series from exact moments.
- ``io_histogram_selectivity``— equi-depth histogram range estimate vs
  the uniform assumption vs truth.
- ``text_simpson_diversity``  — Simpson and inverse-Simpson vocabulary
  concentration per source.

Reference parity: north-star extension — no reference analogue
(the reference has no analytics layer); these are the audit layers a lake-scale engine
adds on the same tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nocouncil_etl_spark.io import fan_out, load
from nocouncil_etl_spark.operators.quantiles import cumulate, with_below, with_global_rank
from nocouncil_etl_spark.plans.retrieval_plans import _TOK_SPARK, _TOK_SQL
from nocouncil_etl_spark.registry import query

ERL_MU = 20  # service rate per hour (literal)
ERL_CMAX = 10
KG_QUERIES = ("spork", "windoe", "strem")  # misspelled vocabulary words
KG_MIN_SHARED = 3
HIST_BUCKETS = 8
HIST_LO, HIST_HI = 5_000_000, 20_000_000  # range predicate on cents


# --------------------------------------------------------------------------
# 1. Erlang C staffing
# --------------------------------------------------------------------------


def _erlang_ctes() -> str:
    cte = ["""
lam AS (
  SELECT CAST(count(*) AS BIGINT) AS n_events,
         (CAST(floor(epoch(max(ts))) AS BIGINT)
          - CAST(floor(epoch(min(ts))) AS BIGINT)) // 3600 + 1 AS hours
  FROM events
),
a0 AS (SELECT CAST(n_events AS DOUBLE) / hours / %d AS a, n_events, hours
       FROM lam),
b0 AS (SELECT a, 1.0 AS b FROM a0)""" % ERL_MU]
    for k in range(1, ERL_CMAX + 1):
        cte.append(f""",
b{k} AS (SELECT a, a * b / ({k} + a * b) AS b FROM b{k - 1})""")
    arms = "\nUNION ALL\n".join(
        f"""SELECT {k} AS c, (SELECT a FROM a0) AS a, (SELECT b FROM b{k}) AS b"""
        for k in range(1, ERL_CMAX + 1)
    )
    return "".join(cte) + f",\narms AS (\n{arms}\n)"


@query(
    "agg_erlang_c_staffing",
    oracle=f"""
WITH {_erlang_ctes()}
SELECT c,
       CAST(round(1000000 * b) AS BIGINT) AS erlang_b_micro,
       CASE WHEN a / c < 1
            THEN CAST(round(1000000 * b / (1 - (a / c) * (1 - b))) AS BIGINT)
       END AS erlang_c_micro,
       CAST(round(1000 * a / c) AS BIGINT) AS utilization_milli
FROM arms
""",
)
def agg_erlang_c_staffing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Erlang staffing table from the measured event arrival rate
    (events/hour over the observed span) and a literal service rate of
    {ERL_MU}/hour: the Erlang B blocking probability via the exact
    recursion B_k = a·B_(k-1)/(k + a·B_(k-1)) unrolled to
    c = {ERL_CMAX} servers, and Erlang C (probability a job waits)
    C = B/(1 − ρ(1−B)) wherever the system is stable (ρ < 1; NULL
    otherwise — the integer-decided guard). The offered load a is one
    rational of exact integers, so the whole table is engine-identical.
    This is THE call-center / thread-pool sizing computation.

    Scale shape: one 2-number scan; the recursion is {ERL_CMAX} chained
    1-row steps; output is a {ERL_CMAX}-row grid."""
    ev = load(spark, sf_dir, "events")
    lam = ev.agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        (F.unix_timestamp(F.max("ts")) - F.unix_timestamp(F.min("ts"))).alias(
            "secs"
        ),
    ).select(
        "n_events", (F.expr("secs div 3600") + 1).alias("hours")
    )
    a0 = lam.select(
        (F.col("n_events").cast("double") / F.col("hours") / ERL_MU).alias("a")
    )
    rows = a0.withColumn("b", F.lit(1.0))
    out = None
    for k in range(1, ERL_CMAX + 1):
        rows = rows.select(
            "a",
            (F.col("a") * F.col("b") / (k + F.col("a") * F.col("b"))).alias("b"),
        )
        rho = F.col("a") / k
        arm = rows.select(
            F.lit(k).cast("int").alias("c"),
            F.round(1_000_000 * F.col("b")).cast("long").alias("erlang_b_micro"),
            F.when(
                rho < 1,
                F.round(
                    1_000_000 * F.col("b") / (1 - rho * (1 - F.col("b")))
                ).cast("long"),
            ).alias("erlang_c_micro"),
            F.round(1000 * rho).cast("long").alias("utilization_milli"),
        )
        out = arm if out is None else out.unionByName(arm)
    return out


# --------------------------------------------------------------------------
# 2. Mondrian two-level k-anonymization
# --------------------------------------------------------------------------


@query(
    "privacy_mondrian_2level",
    oracle="""
WITH pts AS (
  SELECT CAST(round(100 * c.c_acctbal) AS BIGINT) AS x,
         coalesce(o.cnt, 0) AS y
  FROM customer c
  LEFT JOIN (SELECT o_custkey, CAST(count(*) AS BIGINT) AS cnt
             FROM orders GROUP BY 1) o ON o.o_custkey = c.c_custkey
),
rx AS (
  SELECT x, y, row_number() OVER (ORDER BY x, y) AS rn,
         count(*) OVER () AS n
  FROM pts
),
mx AS (
  SELECT max(CASE WHEN rn = CAST(ceil(n / 2.0) AS BIGINT) THEN x END) AS medx
  FROM rx
),
sided AS (
  SELECT x, y, CASE WHEN x <= (SELECT medx FROM mx) THEN 0 ELSE 1 END AS sx
  FROM pts
),
ry AS (
  SELECT sx, x, y,
         row_number() OVER (PARTITION BY sx ORDER BY y, x) AS rn,
         count(*) OVER (PARTITION BY sx) AS n
  FROM sided
),
my AS (
  SELECT sx, max(CASE WHEN rn = CAST(ceil(n / 2.0) AS BIGINT) THEN y END)
           AS medy
  FROM ry GROUP BY sx
),
leaves AS (
  SELECT s.sx, CASE WHEN s.y <= m.medy THEN 0 ELSE 1 END AS sy, s.x, s.y
  FROM sided s JOIN my m ON m.sx = s.sx
)
SELECT sx, sy,
       CAST(count(*) AS BIGINT) AS k_size,
       CAST(min(x) AS BIGINT) AS x_lo, CAST(max(x) AS BIGINT) AS x_hi,
       CAST(min(y) AS BIGINT) AS y_lo, CAST(max(y) AS BIGINT) AS y_hi
FROM leaves GROUP BY sx, sy
""",
)
def privacy_mondrian_2level(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mondrian multidimensional k-anonymization (LeFevre 2006), two
    levels: split all records at the median account balance (exact
    ⌈n/2⌉ order statistic on the (x, y) total order), then split each
    half at ITS median order count — producing four equivalence classes
    whose generalized ranges (min..max per attribute) replace the raw
    quasi-identifiers. Per-leaf size IS the k each class guarantees.
    Median-split recursion is what makes Mondrian near-optimal for
    range utility vs the single-attribute ladder of
    privacy_generalize_to_k.

    Scale shape (r7): both split medians via Fenwick prefix counts
    (value-histogram order statistics — no rank windows), hash aggs for
    leaf summaries — each level is a few keyed shuffles, depth is fixed."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    per = orders.groupBy("o_custkey").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    pts = cust.join(per, cust["c_custkey"] == per["o_custkey"], "left").select(
        F.round(100 * F.col("c_acctbal")).cast("long").alias("x"),
        F.coalesce("cnt", F.lit(0)).alias("y"),
    )
    # r7: both split medians via Fenwick prefix counts — the value at
    # rank ⌈n/2⌉ of a (v, tiebreak) total order depends only on the
    # v-histogram, so medians need no row-level window at all
    byx = pts.groupBy("x").agg(F.count(F.lit(1)).cast("long").alias("c"))
    totx = byx.agg(F.sum("c").cast("long").alias("n"))
    mx = (
        with_below(byx, "x", "c")
        .crossJoin(F.broadcast(totx))
        .filter(
            F.col("below") + F.col("c")
            >= F.ceil(F.col("n") / 2.0).cast("long")
        )
        .agg(F.min("x").alias("medx"))
    )
    sided = pts.crossJoin(F.broadcast(mx)).select(
        "x",
        "y",
        F.when(F.col("x") <= F.col("medx"), 0).otherwise(1).alias("sx"),
    )
    # per-side y medians: one Fenwick pass over the y histogram carrying
    # per-side counts as separate measures
    byy = sided.groupBy("y").agg(
        F.sum(F.when(F.col("sx") == 0, 1).otherwise(0)).cast("long").alias("c0"),
        F.sum(F.when(F.col("sx") == 1, 1).otherwise(0)).cast("long").alias("c1"),
    )
    ns = sided.groupBy("sx").agg(F.count(F.lit(1)).cast("long").alias("n_s"))
    cy = cumulate(byy, "y", ("c0", "c1"))
    my = (
        cy.crossJoin(
            F.broadcast(
                ns.groupBy().pivot("sx", [0, 1]).sum("n_s")
                .select(F.col("0").alias("n0"), F.col("1").alias("n1"))
            )
        )
        .select(
            "y",
            F.when(
                F.col("cum_c0") >= F.ceil(F.col("n0") / 2.0).cast("long"),
                F.col("y"),
            ).alias("hit0"),
            F.when(
                F.col("cum_c1") >= F.ceil(F.col("n1") / 2.0).cast("long"),
                F.col("y"),
            ).alias("hit1"),
        )
        .agg(F.min("hit0").alias("m0"), F.min("hit1").alias("m1"))
        .select(
            F.explode(
                F.array(
                    F.struct(F.lit(0).alias("sx"), F.col("m0").alias("medy")),
                    F.struct(F.lit(1).alias("sx"), F.col("m1").alias("medy")),
                )
            ).alias("s")
        )
        .select("s.sx", "s.medy")
    )
    leaves = sided.join(F.broadcast(my), "sx").select(
        "sx",
        F.when(F.col("y") <= F.col("medy"), 0).otherwise(1).alias("sy"),
        "x",
        "y",
    )
    return leaves.groupBy("sx", "sy").agg(
        F.count(F.lit(1)).cast("long").alias("k_size"),
        F.min("x").cast("long").alias("x_lo"),
        F.max("x").cast("long").alias("x_hi"),
        F.min("y").cast("long").alias("y_lo"),
        F.max("y").cast("long").alias("y_hi"),
    )


# --------------------------------------------------------------------------
# 3. K-gram fuzzy search
# --------------------------------------------------------------------------


def _kg_grams(term: str) -> list[str]:
    padded = f"${term}$"
    return sorted({padded[i : i + 2] for i in range(len(padded) - 1)})


def _kg_oracle() -> str:
    qrows = ", ".join(
        f"('{q}', '{g}')" for q in KG_QUERIES for g in _kg_grams(q)
    )
    return f"""
WITH vocab AS (
  SELECT DISTINCT unnest({_TOK_SQL}) AS term FROM documents
),
vg AS (
  SELECT term, unnest(list_distinct(
    list_transform(range(length('$' || term || '$') - 1),
                   i -> substr('$' || term || '$', i + 1, 2)))) AS gram
  FROM vocab
),
q(pattern, gram) AS (VALUES {qrows}),
shared AS (
  SELECT q.pattern, vg.term, CAST(count(*) AS BIGINT) AS n_shared
  FROM q JOIN vg ON vg.gram = q.gram
  GROUP BY q.pattern, vg.term
  HAVING count(*) >= {KG_MIN_SHARED}
),
verified AS (
  SELECT pattern, term, n_shared,
         levenshtein(pattern, term) AS dist
  FROM shared
)
SELECT pattern,
       CAST(count(*) AS BIGINT) AS n_candidates,
       CAST(sum(CASE WHEN dist <= 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_verified,
       min(CASE WHEN dist <= 1 THEN term END) AS best_term
FROM verified GROUP BY pattern
"""


@query("search_kgram_fuzzy", oracle=_kg_oracle())
def search_kgram_fuzzy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-gram fuzzy term lookup (IIR ch. 3.3): each vocabulary term is
    indexed by its boundary-padded character BIGRAMS; a misspelled
    query pulls candidate terms sharing ≥ {KG_MIN_SHARED} bigrams (the
    cheap set-overlap filter), and only candidates pay the
    edit-distance verification (≤ 1 accepted). Queries: {KG_QUERIES}.
    The candidate-then-verify shape is the same index discipline as
    search_champion_lists — the expensive predicate never scans the
    vocabulary. Complements search_symspell_correct (delete-
    neighborhood generation) with the posting-intersection classic.

    Scale shape: the gram index is vocabulary-sized and build-once; the
    query side is a literal broadcast; levenshtein runs on the
    candidate slice only."""
    docs = fan_out(load(spark, sf_dir, "documents"))
    vocab = docs.select(F.explode(F.expr(_TOK_SPARK)).alias("term")).distinct()
    vg = (
        vocab.select(
            "term",
            F.explode(
                F.array_distinct(
                    F.expr(
                        "transform(sequence(1, length(term) + 1),"
                        " i -> substr('$' || term || '$', i, 2))"
                    )
                )
            ).alias("gram"),
        )
    )
    q = spark.createDataFrame(
        [(qq, g) for qq in KG_QUERIES for g in _kg_grams(qq)],
        "pattern string, gram string",
    )
    shared = (
        F.broadcast(q)
        .join(vg, "gram")
        .groupBy("pattern", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
        .filter(F.col("n_shared") >= KG_MIN_SHARED)
    )
    verified = shared.withColumn(
        "dist", F.levenshtein(F.col("pattern"), F.col("term"))
    )
    return verified.groupBy("pattern").agg(
        F.count(F.lit(1)).cast("long").alias("n_candidates"),
        F.sum(F.when(F.col("dist") <= 1, 1).otherwise(0))
        .cast("long")
        .alias("n_verified"),
        F.min(F.when(F.col("dist") <= 1, F.col("term"))).alias("best_term"),
    )


# --------------------------------------------------------------------------
# 4. CAPM beta
# --------------------------------------------------------------------------


@query(
    "ts_capm_beta",
    oracle="""
WITH s AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         sum(CAST(round(10000 * value) AS BIGINT)) AS v4
  FROM events WHERE value IS NOT NULL GROUP BY 1, 2
),
r AS (
  SELECT event_type, day, v4 - lag(v4) OVER w AS ret
  FROM s WINDOW w AS (PARTITION BY event_type ORDER BY day)
),
mkt AS (
  SELECT day, CAST(sum(ret) AS BIGINT) AS mret
  FROM r WHERE ret IS NOT NULL GROUP BY day
  HAVING count(*) = (SELECT count(DISTINCT event_type) FROM s)
),
j AS (
  SELECT r.event_type, r.ret, m.mret
  FROM r JOIN mkt m ON m.day = r.day WHERE r.ret IS NOT NULL
),
mom AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(ret) AS BIGINT) AS si, CAST(sum(mret) AS BIGINT) AS sm,
         CAST(sum(CAST(ret AS HUGEINT) * mret) AS DOUBLE) AS sim,
         CAST(sum(CAST(mret AS HUGEINT) * mret) AS DOUBLE) AS smm,
         CAST(sum(CAST(ret AS HUGEINT) * ret) AS DOUBLE) AS sii
  FROM j GROUP BY event_type
)
SELECT event_type, n,
       CAST(round(1000 * (n * sim - CAST(si AS DOUBLE) * sm)
                  / (n * smm - CAST(sm AS DOUBLE) * sm)) AS BIGINT)
         AS beta_milli,
       CAST(round(1000 * (CAST(si AS DOUBLE) / n
                  - (n * sim - CAST(si AS DOUBLE) * sm)
                    / (n * smm - CAST(sm AS DOUBLE) * sm)
                    * CAST(sm AS DOUBLE) / n)) AS BIGINT) AS alpha_milli,
       CAST(round(1000 * (n * sim - CAST(si AS DOUBLE) * sm)
                  * (n * sim - CAST(si AS DOUBLE) * sm)
                  / ((n * smm - CAST(sm AS DOUBLE) * sm)
                     * (n * sii - CAST(si AS DOUBLE) * si))) AS BIGINT)
         AS r2_milli
FROM mom
""",
)
def ts_capm_beta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CAPM-style factor regression per event type: daily changes of
    each type's series regress on the MARKET (the cross-type sum of
    the same day's changes, kept only on days where every type
    reports — the balanced-panel guard that makes the market series
    identical on both engines). Beta (systematic exposure), alpha
    (idiosyncratic drift) and R² come from exact integer/128-bit
    moments — the single-factor model behind 'does this segment just
    follow the book, or has it its own dynamics?'.

    Scale shape: one type-day hash agg, one per-type lag window, a
    day-keyed equi-join against the broadcastable market series, one
    5-moment agg per type."""
    s = (
        load(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .groupBy("event_type", F.col("ts").cast("date").alias("day"))
        .agg(F.sum(F.round(10000 * F.col("value")).cast("long")).alias("v4"))
    )
    w = Window.partitionBy("event_type").orderBy("day")
    r = s.select(
        "event_type", "day", (F.col("v4") - F.lag("v4").over(w)).alias("ret")
    ).filter(F.col("ret").isNotNull())
    ntypes = s.select("event_type").distinct().count()
    mkt = (
        r.groupBy("day")
        .agg(
            F.sum("ret").cast("long").alias("mret"),
            F.count(F.lit(1)).alias("k"),
        )
        .filter(F.col("k") == ntypes)
        .select("day", "mret")
    )
    j = r.join(F.broadcast(mkt), "day")
    dec = "decimal(38,0)"
    mom = j.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("ret").cast("long").alias("si"),
        F.sum("mret").cast("long").alias("sm"),
        F.sum((F.col("ret").cast(dec) * F.col("mret"))).cast("double").alias("sim"),
        F.sum((F.col("mret").cast(dec) * F.col("mret"))).cast("double").alias("smm"),
        F.sum((F.col("ret").cast(dec) * F.col("ret"))).cast("double").alias("sii"),
    )
    n = F.col("n")
    cov = n * F.col("sim") - F.col("si").cast("double") * F.col("sm")
    varm = n * F.col("smm") - F.col("sm").cast("double") * F.col("sm")
    vari = n * F.col("sii") - F.col("si").cast("double") * F.col("si")
    beta = cov / varm
    return mom.select(
        "event_type",
        "n",
        F.round(1000 * beta).cast("long").alias("beta_milli"),
        F.round(
            1000
            * (
                F.col("si").cast("double") / n
                - beta * F.col("sm").cast("double") / n
            )
        )
        .cast("long")
        .alias("alpha_milli"),
        F.round(1000 * cov * cov / (varm * vari))
        .cast("long")
        .alias("r2_milli"),
    )


# --------------------------------------------------------------------------
# 5. Histogram selectivity
# --------------------------------------------------------------------------


@query(
    "io_histogram_selectivity",
    oracle=f"""
WITH v AS (
  SELECT CAST(round(100 * o_totalprice) AS BIGINT) AS x FROM orders
),
r AS (
  SELECT x, row_number() OVER (ORDER BY x) AS rn, count(*) OVER () AS n
  FROM v
),
bounds AS (
  SELECT CAST(ceil(CAST(rn AS DOUBLE) * {HIST_BUCKETS} / n) AS BIGINT) AS b,
         min(x) AS lo, max(x) AS hi, CAST(count(*) AS BIGINT) AS cnt
  FROM (SELECT x, rn, n FROM r) GROUP BY 1
),
est AS (
  SELECT sum(CASE
    WHEN lo >= {HIST_LO} AND hi <= {HIST_HI} THEN CAST(cnt AS DOUBLE)
    WHEN hi < {HIST_LO} OR lo > {HIST_HI} THEN 0.0
    ELSE cnt * (CAST(least(hi, {HIST_HI}) - greatest(lo, {HIST_LO})
                AS DOUBLE) + 1) / (hi - lo + 1)
  END) AS hist_est
  FROM bounds
),
uni AS (
  SELECT CAST(count(*) AS DOUBLE)
         * (least(CAST(max(x) AS DOUBLE), {HIST_HI})
            - greatest(CAST(min(x) AS DOUBLE), {HIST_LO}) + 1)
         / (max(x) - min(x) + 1) AS uniform_est
  FROM v
),
act AS (
  SELECT CAST(count(*) AS BIGINT) AS actual FROM v
  WHERE x BETWEEN {HIST_LO} AND {HIST_HI}
)
SELECT (SELECT actual FROM act) AS actual,
       CAST(round((SELECT hist_est FROM est)) AS BIGINT) AS hist_est,
       CAST(round((SELECT uniform_est FROM uni)) AS BIGINT) AS uniform_est,
       CAST(round(1000.0 * (SELECT hist_est FROM est)
                  / (SELECT actual FROM act)) AS BIGINT) AS hist_ratio_milli,
       CAST(round(1000.0 * (SELECT uniform_est FROM uni)
                  / (SELECT actual FROM act)) AS BIGINT) AS uniform_ratio_milli
""",
)
def io_histogram_selectivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth histogram selectivity, audited: an {HIST_BUCKETS}-
    bucket equal-frequency histogram of order totals (bucket = ceil of
    the rank fraction — exact order statistics) estimates the range
    predicate [{HIST_LO}, {HIST_HI}] cents by full buckets + linear
    interpolation of the boundary buckets, compared against the
    no-histogram uniform estimate AND the true count — exactly how a
    CBO decides whether ANALYZE with histograms pays for itself
    (io_join_cardinality_estimate is the join-side audit; this is the
    filter side).

    Scale shape: one rank window to place bucket boundaries (the exact
    twin; at 100 TB the boundaries come from the quantile-grid join),
    tiny bucket table, scalar estimate arithmetic."""
    v = load(spark, sf_dir, "orders").select(
        F.round(100 * F.col("o_totalprice")).cast("long").alias("x")
    )
    # r7: equi-depth ranks via Fenwick prefix counts + per-value tie
    # windows — no global sort. The within-tie order is arbitrary (mid
    # ids), which cannot change the result: bucket COUNTS are fixed by
    # the rank layout and tied rows share one x, so per-bucket min/max
    # are tie-assignment-invariant.
    totn = v.agg(F.count(F.lit(1)).cast("long").alias("n"))
    r = with_global_rank(
        v.withColumn("_mid", F.monotonically_increasing_id()),
        "x",
        "_mid",
        "rn",
    ).crossJoin(F.broadcast(totn)).select("x", "rn", "n")
    bounds = r.groupBy(
        F.ceil(F.col("rn").cast("double") * HIST_BUCKETS / F.col("n"))
        .cast("long")
        .alias("b")
    ).agg(
        F.min("x").alias("lo"),
        F.max("x").alias("hi"),
        F.count(F.lit(1)).cast("long").alias("cnt"),
    )
    full = (F.col("lo") >= HIST_LO) & (F.col("hi") <= HIST_HI)
    out = (F.col("hi") < HIST_LO) | (F.col("lo") > HIST_HI)
    part = (
        F.col("cnt")
        * (
            (
                F.least(F.col("hi"), F.lit(HIST_HI))
                - F.greatest(F.col("lo"), F.lit(HIST_LO))
            ).cast("double")
            + 1
        )
        / (F.col("hi") - F.col("lo") + 1)
    )
    est = bounds.agg(
        F.sum(
            F.when(full, F.col("cnt").cast("double"))
            .when(out, F.lit(0.0))
            .otherwise(part)
        ).alias("hist_est")
    )
    uni = v.agg(
        (
            F.count(F.lit(1)).cast("double")
            * (
                F.least(F.max("x").cast("double"), F.lit(float(HIST_HI)))
                - F.greatest(F.min("x").cast("double"), F.lit(float(HIST_LO)))
                + 1
            )
            / (F.max("x") - F.min("x") + 1)
        ).alias("uniform_est")
    )
    act = v.filter(F.col("x").between(HIST_LO, HIST_HI)).agg(
        F.count(F.lit(1)).cast("long").alias("actual")
    )
    return (
        act.crossJoin(F.broadcast(est))
        .crossJoin(F.broadcast(uni))
        .select(
            "actual",
            F.round("hist_est").cast("long").alias("hist_est"),
            F.round("uniform_est").cast("long").alias("uniform_est"),
            F.round(1000.0 * F.col("hist_est") / F.col("actual"))
            .cast("long")
            .alias("hist_ratio_milli"),
            F.round(1000.0 * F.col("uniform_est") / F.col("actual"))
            .cast("long")
            .alias("uniform_ratio_milli"),
        )
    )


# --------------------------------------------------------------------------
# 6. Simpson diversity
# --------------------------------------------------------------------------


@query(
    "text_simpson_diversity",
    oracle=f"""
WITH tok AS (
  SELECT source, unnest({_TOK_SQL}) AS term FROM documents
),
tf AS (
  SELECT source, term, CAST(count(*) AS BIGINT) AS c
  FROM tok GROUP BY 1, 2
),
per AS (
  SELECT source,
         CAST(sum(c) AS BIGINT) AS n_tokens,
         CAST(count(*) AS BIGINT) AS n_types,
         CAST(sum(c * (c - 1)) AS BIGINT) AS pairs,
         CAST(sum(c * c) AS BIGINT) AS sq
  FROM tf GROUP BY source
)
SELECT source, n_tokens, n_types,
       CAST(round(1000000.0 * pairs / (n_tokens * (n_tokens - 1)))
            AS BIGINT) AS simpson_micro,
       CAST(round(1000.0 * n_tokens * n_tokens / sq) AS BIGINT)
         AS inv_simpson_milli
FROM per
""",
)
def text_simpson_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simpson diversity of each source's vocabulary: the collision
    probability λ = Σ n_i(n_i−1)/(N(N−1)) (two random tokens are the
    same type — unbiased form) and the inverse-Simpson effective
    vocabulary size N²/Σn_i² ('how many equally-common types would look
    like this') — the concentration-based companion to
    agg_entropy_diversity (Shannon) and text_yules_k (which is Simpson
    scaled); all three together are the ecologist's Hill-number ladder.
    Everything is one ratio of exact BIGINTs.

    Scale shape: one tokenization pass, one (source, term) hash agg,
    one source rollup."""
    docs = fan_out(load(spark, sf_dir, "documents"))
    tok = docs.select("source", F.explode(F.expr(_TOK_SPARK)).alias("term"))
    tf = tok.groupBy("source", "term").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    per = tf.groupBy("source").agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_types"),
        F.sum(F.col("c") * (F.col("c") - 1)).cast("long").alias("pairs"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("sq"),
    )
    return per.select(
        "source",
        "n_tokens",
        "n_types",
        F.round(
            1_000_000.0
            * F.col("pairs")
            / (F.col("n_tokens") * (F.col("n_tokens") - 1))
        )
        .cast("long")
        .alias("simpson_micro"),
        F.round(
            1000.0 * F.col("n_tokens") * F.col("n_tokens") / F.col("sq")
        )
        .cast("long")
        .alias("inv_simpson_milli"),
    )
