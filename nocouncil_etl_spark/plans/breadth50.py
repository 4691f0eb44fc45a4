"""Breadth batch 50 (round 6): chain ladder, G² collocations, bloom file
skipping, Welch ANOVA, percent-of-parent, k-anonymity generalization.

Six operators (reference scope: projecting cohort revenue to ultimate,
statistically-sound phrase mining, point-lookup file pruning where
min/max is useless, robust group comparisons under unequal variances,
the BI percent-of-parent staple, and the remediation step after a
k-anonymity audit fails):

- ``agg_chain_ladder``      — claims-triangle development factors and
  cohort ultimates in exact milli arithmetic.
- ``text_collocation_g2``   — Dunning log-likelihood-ratio bigram
  collocations (the robust alternative to PMI on sparse counts).
- ``io_bloom_file_skip``    — per-bucket Bloom bitsets vs min/max
  footers for a point lookup on an unsorted key.
- ``stat_welch_anova``      — one-way ANOVA that does not assume equal
  group variances.
- ``window_percent_of_parent`` — nation→region→total hierarchical
  revenue shares.
- ``privacy_generalize_to_k`` — global-recoding generalization ladder
  until every quasi-identifier group reaches k.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nocouncil_etl_spark.io import fan_out, load
from nocouncil_etl_spark.operators.quantiles import ranged_rank_cumsum
from nocouncil_etl_spark.plans.breadth15 import _pt, _pt_sql
from nocouncil_etl_spark.registry import query

# --------------------------------------------------------------------------
# 1. Chain-ladder cohort projection
# --------------------------------------------------------------------------

CL_MAX_AGE = 3  # development ages 0..3 (weeks)


def _cl_oracle() -> str:
    parts = [
        f"""WITH firsts AS (
  SELECT user_id, min(CAST(ts AS DATE)) AS f FROM events GROUP BY 1
),
d0 AS (SELECT min(f) AS start FROM firsts),
fact AS (
  SELECT (fi.f - d0.start) // 7 AS w,
         (CAST(e.ts AS DATE) - d0.start) // 7 - (fi.f - d0.start) // 7
           AS age,
         CAST(round(e.value * 100) AS BIGINT) AS cents
  FROM events e JOIN firsts fi ON e.user_id = fi.user_id, d0
),
incr AS (
  SELECT w, age, CAST(sum(cents) AS BIGINT) AS c
  FROM fact WHERE age BETWEEN 0 AND {CL_MAX_AGE} GROUP BY 1, 2
),
cum AS (
  SELECT w, age,
         CAST(sum(c) OVER (PARTITION BY w ORDER BY age
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS cc
  FROM incr
),
horizon AS (SELECT max(w + age) AS h FROM cum),
tri AS (SELECT * FROM cum, horizon WHERE w + age <= h),
factors AS (
  SELECT a.age AS age,
         CAST((1000 * sum(b.cc)) // sum(a.cc) AS BIGINT) AS f_milli
  FROM tri a JOIN tri b ON a.w = b.w AND b.age = a.age + 1
  GROUP BY a.age
),
latest AS (
  SELECT w, age, cc FROM (
    SELECT w, age, cc, row_number() OVER (PARTITION BY w
                                          ORDER BY age DESC) AS rk
    FROM tri
  ) WHERE rk = 1
)"""
    ]
    # unroll the remaining-factor chain: ult = latest, then for each age
    # level >= current age multiply by f_milli once
    steps = ["SELECT w, age, cc AS ult FROM latest"]
    for a in range(CL_MAX_AGE):
        steps.append(
            f"""SELECT u.w, u.age, CAST(CASE WHEN u.age <= {a}
       THEN (u.ult * coalesce(f{a}.f_milli, 1000)) // 1000
       ELSE u.ult END AS BIGINT) AS ult
FROM step{a} u LEFT JOIN (SELECT f_milli FROM factors WHERE age = {a}) f{a}
  ON TRUE"""
        )
    for i, q in enumerate(steps[1:]):
        parts.append(f"step{i} AS ({steps[i]})" if i == 0 else f"step{i} AS ({q.replace(f'step{i - 1}', f'step{i - 1}')})")
    # rebuild cleanly: step0 = base; step_a uses step_{a-1}
    parts = parts[:1]
    parts.append("step0 AS (SELECT w, age, cc AS ult FROM latest)")
    for a in range(CL_MAX_AGE):
        parts.append(
            f"""step{a + 1} AS (
  SELECT u.w, u.age, CAST(CASE WHEN u.age <= {a}
         THEN (u.ult * coalesce((SELECT f_milli FROM factors
                                 WHERE age = {a}), 1000)) // 1000
         ELSE u.ult END AS BIGINT) AS ult
  FROM step{a} u
)"""
        )
    return (
        ",\n".join(parts)
        + f"""
SELECT l.w AS cohort_week, l.age AS age_latest, l.cc AS cents_latest,
       s.ult AS ultimate_cents
FROM latest l JOIN step{CL_MAX_AGE} s ON l.w = s.w
"""
    )


@query("agg_chain_ladder", oracle=_cl_oracle())
def agg_chain_ladder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chain-ladder projection (the actuarial claims-triangle method,
    Mack 1993) on weekly signup cohorts: build the cumulative
    (cohort-week × age) revenue triangle, estimate each age-to-age
    development factor as Σ C(w,a+1) / Σ C(w,a) over cohorts observing
    BOTH ages, and run every cohort's latest diagonal out to ultimate
    by multiplying the remaining factors — how unfinished cohorts'
    lifetime revenue is projected from finished cohorts' development
    pattern (``agg_cohort_ltv`` reports the observed triangle; this
    completes it). Factors are milli integers with one floor division
    per age step.

    Scale shape: the triangle is weeks² cells from one hash-agg; factor
    estimation and the unrolled projection run on that tiny frame."""
    ev = load(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(F.min(F.to_date("ts")).alias("f"))
    d0 = firsts.agg(F.min("f").alias("start"))
    fact = (
        ev.join(firsts, "user_id")
        .crossJoin(F.broadcast(d0))
        .select(
            F.expr("datediff(f, start) div 7").alias("w"),
            F.expr(
                "datediff(to_date(ts), start) div 7 - datediff(f, start) div 7"
            ).alias("age"),
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
        .filter(F.col("age").between(0, CL_MAX_AGE))
    )
    incr = fact.groupBy("w", "age").agg(F.sum("cents").cast("long").alias("c"))
    wcum = Window.partitionBy("w").orderBy("age").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = incr.withColumn("cc", F.sum("c").over(wcum).cast("long"))
    h = cum.agg(F.max(F.col("w") + F.col("age"))).collect()[0][0]
    tri = cum.filter(F.col("w") + F.col("age") <= h)
    b = tri.select(
        F.col("w").alias("wb"), F.col("age").alias("ageb"), F.col("cc").alias("ccb")
    )
    factors = (
        tri.join(b, (tri.w == b.wb) & (b.ageb == tri.age + 1))
        .groupBy(tri.age)
        .agg(F.expr("CAST((1000 * sum(ccb)) div sum(cc) AS BIGINT)").alias("f_milli"))
        .select(F.col("age").alias("fage"), "f_milli")
    )
    fmap = {r.fage: r.f_milli for r in factors.collect()}  # <= CL_MAX_AGE rows
    latest = (
        tri.withColumn(
            "rk", F.row_number().over(Window.partitionBy("w").orderBy(F.desc("age")))
        )
        .filter(F.col("rk") == 1)
        .select("w", "age", "cc")
    )
    ult = latest.withColumn("ult", F.col("cc"))
    for a in range(CL_MAX_AGE):
        fm = int(fmap.get(a, 1000))
        ult = ult.withColumn(
            "ult",
            F.expr(
                f"CAST(CASE WHEN age <= {a} THEN (ult * {fm}) div 1000"
                " ELSE ult END AS BIGINT)"
            ),
        )
    return ult.select(
        F.col("w").alias("cohort_week"),
        F.col("age").alias("age_latest"),
        F.col("cc").alias("cents_latest"),
        F.col("ult").alias("ultimate_cents"),
    )


# --------------------------------------------------------------------------
# 2. Dunning G-squared collocations
# --------------------------------------------------------------------------

G2_TOP = 20


@query(
    "text_collocation_g2",
    oracle=f"""
WITH ws AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
),
big AS MATERIALIZED (
  SELECT ws[CAST(i AS INTEGER)] AS w1, ws[CAST(i + 1 AS INTEGER)] AS w2
  FROM (SELECT ws, unnest(range(1, len(ws))) AS i FROM ws)
),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM big),
c12 AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS k11 FROM big GROUP BY 1, 2),
c1 AS (SELECT w1, CAST(count(*) AS BIGINT) AS r1 FROM big GROUP BY 1),
c2 AS (SELECT w2, CAST(count(*) AS BIGINT) AS c1n FROM big GROUP BY 1),
cells AS (
  SELECT p.w1, p.w2, p.k11,
         a.r1 - p.k11 AS k12, b.c1n - p.k11 AS k21,
         (SELECT n FROM nn) - a.r1 - b.c1n + p.k11 AS k22,
         a.r1, b.c1n, (SELECT n FROM nn) AS n
  FROM c12 p JOIN c1 a ON p.w1 = a.w1 JOIN c2 b ON p.w2 = b.w2
),
g2 AS (
  SELECT w1, w2, k11,
         CAST(
           (CASE WHEN k11 = 0 THEN 0 ELSE CAST(round(2000000.0 * k11 *
              ln(CAST(k11 AS DOUBLE) * n / (CAST(r1 AS DOUBLE) * c1n)))
              AS BIGINT) END)
         + (CASE WHEN k12 = 0 THEN 0 ELSE CAST(round(2000000.0 * k12 *
              ln(CAST(k12 AS DOUBLE) * n / (CAST(r1 AS DOUBLE) * (n - c1n))))
              AS BIGINT) END)
         + (CASE WHEN k21 = 0 THEN 0 ELSE CAST(round(2000000.0 * k21 *
              ln(CAST(k21 AS DOUBLE) * n / (CAST(n - r1 AS DOUBLE) * c1n)))
              AS BIGINT) END)
         + (CASE WHEN k22 = 0 THEN 0 ELSE CAST(round(2000000.0 * k22 *
              ln(CAST(k22 AS DOUBLE) * n
                 / (CAST(n - r1 AS DOUBLE) * (n - c1n))))
              AS BIGINT) END) AS BIGINT) AS g2_micro
  FROM cells
)
SELECT rk, w1, w2, k11, g2_micro FROM (
  SELECT *, CAST(row_number() OVER (ORDER BY g2_micro DESC, w1, w2) AS INT)
              AS rk
  FROM g2
) WHERE rk <= {G2_TOP}
""",
)
def text_collocation_g2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dunning log-likelihood-ratio (G²) collocation mining (Dunning
    1993): for each adjacent word bigram, the 2×2 contingency table
    (bigram vs its margins) scored by G² = 2Σ k·ln(k·N/(row·col)) —
    the test PMI should have been (``text_term_cooccurrence``'s PMI
    overweights rare pairs; G² is χ²-distributed and sane on sparse
    counts, which is why phrase tables and tokenizer merge rules use
    it). Each of the four cell terms quantizes once to micro from
    exact integer rationals; zero cells contribute zero by the x·ln x
    limit. Top-{G2_TOP} by score.

    Scale shape: bigram counts and both margins are hash-aggs over the
    bigram stream; scoring joins the margins back (two broadcast-sized
    maps at real vocabulary scale); ranking is a bounded top-k."""
    docs = fan_out(load(spark, sf_dir, "documents"))
    big = (
        docs.select(F.split("text", " ").alias("ws"))
        .select(
            F.explode(
                F.expr(
                    "CASE WHEN size(ws) >= 2 THEN"
                    " transform(sequence(0, size(ws) - 2),"
                    " i -> struct(ws[i] AS w1, ws[i + 1] AS w2))"
                    " ELSE array() END"
                )
            ).alias("p")
        )
        .select("p.w1", "p.w2")
    )
    nn = big.count()
    c12 = big.groupBy("w1", "w2").agg(F.count("*").cast("long").alias("k11"))
    c1 = big.groupBy("w1").agg(F.count("*").cast("long").alias("r1"))
    c2 = big.groupBy("w2").agg(F.count("*").cast("long").alias("c1n"))
    cells = (
        c12.join(F.broadcast(c1), "w1")
        .join(F.broadcast(c2), "w2")
        .select(
            "w1",
            "w2",
            "k11",
            (F.col("r1") - F.col("k11")).alias("k12"),
            (F.col("c1n") - F.col("k11")).alias("k21"),
            (F.lit(nn) - F.col("r1") - F.col("c1n") + F.col("k11")).alias("k22"),
            "r1",
            "c1n",
            F.lit(nn).cast("long").alias("n"),
        )
    )

    def term(k: str, row: str, col: str):
        return F.when(F.col(k) == 0, F.lit(0).cast("long")).otherwise(
            F.round(
                2000000.0
                * F.col(k)
                * F.log(
                    F.col(k).cast("double")
                    * F.col("n")
                    / (F.expr(row).cast("double") * F.expr(col))
                )
            ).cast("long")
        )

    g2 = cells.select(
        "w1",
        "w2",
        "k11",
        (
            term("k11", "r1", "c1n")
            + term("k12", "r1", "(n - c1n)")
            + term("k21", "(n - r1)", "c1n")
            + term("k22", "(n - r1)", "(n - c1n)")
        )
        .cast("long")
        .alias("g2_micro"),
    )
    return (
        g2.withColumn(
            "rk",
            F.row_number()
            .over(Window.orderBy(F.desc("g2_micro"), "w1", "w2"))
            .cast("int"),
        )
        .filter(F.col("rk") <= G2_TOP)
        .select("rk", "w1", "w2", "k11", "g2_micro")
    )


# --------------------------------------------------------------------------
# 3. Bloom-bitset file skipping
# --------------------------------------------------------------------------

BF_BUCKETS = 16
BF_WORDS = 4
BF_BITS_PER_WORD = 62  # stay clear of the sign bit


def _bf_pos_sql(salt: str, key: str) -> str:
    return _pt_sql(salt, key, BF_WORDS * BF_BITS_PER_WORD)


@query(
    "io_bloom_file_skip",
    oracle=f"""
WITH o AS (
  SELECT o_orderkey, o_custkey,
         ((row_number() OVER (ORDER BY o_orderkey) - 1) * {BF_BUCKETS})
           // (SELECT count(*) FROM orders) AS b
  FROM orders
),
probe AS (
  SELECT o_custkey AS k FROM (
    SELECT o_custkey, row_number() OVER (ORDER BY o_custkey) AS rk
    FROM (SELECT DISTINCT o_custkey FROM orders)
  ) WHERE rk = 7
),
bits AS (
  SELECT b, o_custkey,
         {_bf_pos_sql('bfa#', 'o_custkey')} AS p1,
         {_bf_pos_sql('bfb#', 'o_custkey')} AS p2
  FROM o
),
words AS (
  SELECT b,
         min(o_custkey) AS k0, max(o_custkey) AS k1,
         {', '.join(
             f"CAST(bit_or(CASE WHEN p1 // {BF_BITS_PER_WORD} = {wi}"
             f" THEN (CAST(1 AS BIGINT) << (p1 % {BF_BITS_PER_WORD}))"
             f" ELSE 0 END | CASE WHEN p2 // {BF_BITS_PER_WORD} = {wi}"
             f" THEN (CAST(1 AS BIGINT) << (p2 % {BF_BITS_PER_WORD}))"
             f" ELSE 0 END) AS BIGINT) AS w{wi}" for wi in range(BF_WORDS)
         )}
  FROM bits GROUP BY b
),
pk AS (
  SELECT k, {_bf_pos_sql('bfa#', 'k')} AS p1, {_bf_pos_sql('bfb#', 'k')} AS p2
  FROM probe
),
verdicts AS (
  SELECT w.b,
         CASE WHEN p.k BETWEEN w.k0 AND w.k1 THEN 1 ELSE 0 END AS mm,
         CASE WHEN
             (CASE p.p1 // {BF_BITS_PER_WORD}
                {' '.join(f'WHEN {wi} THEN w.w{wi}' for wi in range(BF_WORDS))}
              END & (CAST(1 AS BIGINT) << (p.p1 % {BF_BITS_PER_WORD}))) <> 0
           AND
             (CASE p.p2 // {BF_BITS_PER_WORD}
                {' '.join(f'WHEN {wi} THEN w.w{wi}' for wi in range(BF_WORDS))}
              END & (CAST(1 AS BIGINT) << (p.p2 % {BF_BITS_PER_WORD}))) <> 0
         THEN 1 ELSE 0 END AS bl
  FROM words w, pk p
),
actual AS (
  SELECT o.b, CAST(1 AS BIGINT) AS act
  FROM o, probe p WHERE o.o_custkey = p.k GROUP BY o.b
)
SELECT CAST({BF_BUCKETS} AS BIGINT) AS n_buckets,
       CAST(sum(v.mm) AS BIGINT) AS touched_minmax,
       CAST(sum(v.bl) AS BIGINT) AS touched_bloom,
       CAST((SELECT count(*) FROM actual) AS BIGINT) AS buckets_actual
FROM verdicts v
""",
)
def io_bloom_file_skip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-bitset file skipping for point lookups: the orders table is
    laid out in {BF_BUCKETS} arrival-order buckets (so customer keys
    are SCATTERED — min/max footers span nearly the full key range and
    prune nothing), each bucket publishes a {BF_WORDS}×{BF_BITS_PER_WORD}-bit
    Bloom bitset over its customer keys (two md5-derived bit positions
    per key, OR-aggregated exactly like ``sketch_bloom_membership``),
    and a point probe counts buckets touched under min/max vs Bloom
    pruning. This is parquet's bloom_filter column option / Iceberg
    puffin files in miniature: for high-cardinality unsorted keys the
    bloom skips what zone maps (``layout_zorder_skip``) fundamentally
    cannot. The true containing-bucket count bounds both from below.

    Scale shape: bitset construction is one bit_or hash-agg per bucket
    (map-side combinable, {BF_WORDS} words of state); probing is
    constant work per bucket against broadcast probe positions."""
    o = load(spark, sf_dir, "orders")
    n = o.count()
    # r9: the key-order file bucket via the range-partitioned two-phase
    # scan — order keys are UNIQUE, the domain where the r7 Fenwick pass
    # paid its O(levels) explode per key for nothing (13.6 s → ~5 s at
    # sf1, factor 2.9x → ~1x). No global sort either way.
    ob = ranged_rank_cumsum(
        o.select("o_custkey", "o_orderkey"),
        "o_orderkey",
        "o_orderkey",
        rank_col="_rk",
    ).select(
        "o_custkey",
        F.expr(f"((_rk - 1) * {BF_BUCKETS}) div {n}").alias("b"),
    )
    # the probe key is the 7th-smallest distinct custkey: a bounded
    # TakeOrderedAndProject, not a ranked scan
    probe = (
        o.select("o_custkey")
        .distinct()
        .orderBy("o_custkey")
        .limit(7)
        .agg(F.max("o_custkey").alias("k"))
    )
    span = BF_WORDS * BF_BITS_PER_WORD
    bits = ob.select(
        "b",
        "o_custkey",
        (_pt("bfa#", F.col("o_custkey")) % span).alias("p1"),
        (_pt("bfb#", F.col("o_custkey")) % span).alias("p2"),
    )
    word_aggs = [
        F.expr(
            f"CAST(bit_or(CASE WHEN p1 div {BF_BITS_PER_WORD} = {wi}"
            f" THEN shiftleft(CAST(1 AS BIGINT), CAST(p1 % {BF_BITS_PER_WORD} AS INT))"
            f" ELSE 0 END | CASE WHEN p2 div {BF_BITS_PER_WORD} = {wi}"
            f" THEN shiftleft(CAST(1 AS BIGINT), CAST(p2 % {BF_BITS_PER_WORD} AS INT))"
            f" ELSE 0 END) AS BIGINT)"
        ).alias(f"w{wi}")
        for wi in range(BF_WORDS)
    ]
    words = bits.groupBy("b").agg(
        F.min("o_custkey").alias("k0"), F.max("o_custkey").alias("k1"), *word_aggs
    )
    pk = probe.select(
        "k",
        (_pt("bfa#", F.col("k")) % span).alias("p1"),
        (_pt("bfb#", F.col("k")) % span).alias("p2"),
    )
    word_case = lambda p: (
        f"CASE {p} div {BF_BITS_PER_WORD} "
        + " ".join(f"WHEN {wi} THEN w{wi}" for wi in range(BF_WORDS))
        + " END"
    )
    verdicts = words.crossJoin(F.broadcast(pk)).select(
        "b",
        F.expr("CASE WHEN k BETWEEN k0 AND k1 THEN 1 ELSE 0 END").alias("mm"),
        F.expr(
            f"CASE WHEN ({word_case('p1')}"
            f" & shiftleft(CAST(1 AS BIGINT), CAST(p1 % {BF_BITS_PER_WORD} AS INT))) <> 0"
            f" AND ({word_case('p2')}"
            f" & shiftleft(CAST(1 AS BIGINT), CAST(p2 % {BF_BITS_PER_WORD} AS INT))) <> 0"
            " THEN 1 ELSE 0 END"
        ).alias("bl"),
    )
    actual = (
        ob.join(F.broadcast(probe), ob.o_custkey == probe.k)
        .select("b")
        .distinct()
        .agg(F.count("*").cast("long").alias("buckets_actual"))
    )
    return (
        verdicts.agg(
            F.sum("mm").cast("long").alias("touched_minmax"),
            F.sum("bl").cast("long").alias("touched_bloom"),
        )
        .crossJoin(F.broadcast(actual))
        .select(
            F.lit(BF_BUCKETS).cast("long").alias("n_buckets"),
            "touched_minmax",
            "touched_bloom",
            "buckets_actual",
        )
    )


# --------------------------------------------------------------------------
# 4. Welch's ANOVA
# --------------------------------------------------------------------------


@query(
    "stat_welch_anova",
    oracle="""
WITH g AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS s,
         CAST(sum(CAST(round(value * 100) AS BIGINT)
                  * CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS s2
  FROM events GROUP BY 1
),
mom AS (
  SELECT event_type, n,
         CAST(s AS DOUBLE) / n AS mean,
         (CAST(n AS DOUBLE) * s2 - CAST(s AS DOUBLE) * s)
           / (CAST(n AS DOUBLE) * (n - 1)) AS var
  FROM g WHERE n > 1
),
wts AS (
  SELECT event_type, n, mean, var, CAST(n AS DOUBLE) / var AS w FROM mom
),
tot AS (
  SELECT CAST(count(*) AS BIGINT) AS k, sum(w) AS sw,
         sum(w * mean) / sum(w) AS xbar
  FROM wts
),
pieces AS (
  SELECT t.k, sum(x.w * (x.mean - t.xbar) * (x.mean - t.xbar)) / (t.k - 1)
           AS num,
         sum((1 - x.w / t.sw) * (1 - x.w / t.sw) / (x.n - 1)) AS lam
  FROM wts x, tot t GROUP BY t.k, t.sw
)
SELECT k,
       round(num / (1 + 2.0 * (k - 2) / (k * k - 1) * lam), 6) AS f_welch,
       CAST(k - 1 AS BIGINT) AS df1,
       CAST(round(1000.0 * (k * k - 1) / (3 * lam)) AS BIGINT) AS df2_milli
FROM pieces
""",
)
def stat_welch_anova(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's heteroscedastic one-way ANOVA over event-type cent
    values: groups are weighted by n/s² so no equal-variance assumption
    is needed — the k-group generalization of ``agg_ttest_welch`` and
    the robust alternative to the classical F of
    ``stat_anova_f_oneway`` (which Bartlett/Levene often veto on real
    revenue data). All moments are exact integer sums; doubles appear
    only in the final fixed-shape expression (means, variances,
    weights), rounded once for F and once for the Welch-Satterthwaite
    df₂.

    Scale shape: one map-side-combined hash-agg to k rows; everything
    after is k-row scalar math."""
    ev = load(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    g = ev.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n"),
        F.sum(cents).cast("long").alias("s"),
        F.sum(cents * cents).cast("long").alias("s2"),
    )
    mom = g.filter(F.col("n") > 1).select(
        "event_type",
        "n",
        (F.col("s").cast("double") / F.col("n")).alias("mean"),
        (
            (F.col("n").cast("double") * F.col("s2")
             - F.col("s").cast("double") * F.col("s"))
            / (F.col("n").cast("double") * (F.col("n") - 1))
        ).alias("var"),
    )
    wts = mom.withColumn("w", F.col("n").cast("double") / F.col("var"))
    tot = wts.agg(
        F.count("*").cast("long").alias("k"),
        F.sum("w").alias("sw"),
        (F.sum(F.col("w") * F.col("mean")) / F.sum("w")).alias("xbar"),
    )
    pieces = (
        wts.crossJoin(F.broadcast(tot))
        .groupBy("k", "sw")
        .agg(
            (
                F.sum(
                    F.col("w")
                    * (F.col("mean") - F.col("xbar"))
                    * (F.col("mean") - F.col("xbar"))
                )
                / (F.max("k") - 1)
            ).alias("num"),
            F.sum(
                (1 - F.col("w") / F.col("sw"))
                * (1 - F.col("w") / F.col("sw"))
                / (F.col("n") - 1)
            ).alias("lam"),
        )
    )
    return pieces.select(
        "k",
        F.round(
            F.col("num")
            / (1 + 2.0 * (F.col("k") - 2) / (F.col("k") * F.col("k") - 1) * F.col("lam")),
            6,
        ).alias("f_welch"),
        (F.col("k") - 1).cast("long").alias("df1"),
        F.round(
            1000.0 * (F.col("k") * F.col("k") - 1) / (3 * F.col("lam"))
        )
        .cast("long")
        .alias("df2_milli"),
    )


# --------------------------------------------------------------------------
# 5. Percent-of-parent hierarchy shares
# --------------------------------------------------------------------------


@query(
    "window_percent_of_parent",
    oracle="""
WITH rev AS (
  SELECT r.r_name AS region, n.n_name AS nation,
         CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS cents
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  GROUP BY 1, 2
)
SELECT region, nation, cents,
       CAST((cents * 1000000) // sum(cents) OVER (PARTITION BY region)
            AS BIGINT) AS pct_of_region_ppm,
       CAST((sum(cents) OVER (PARTITION BY region) * 1000000)
            // sum(cents) OVER () AS BIGINT) AS region_pct_of_total_ppm
FROM rev
""",
)
def window_percent_of_parent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percent-of-parent along the nation → region → total hierarchy:
    each nation's revenue share within its region and each region's
    share of the grand total, in one pass of window aggregates over the
    collapsed (region, nation) frame — the BI drill-down staple
    (``rollup_prepend``/``agg_rollup`` emit the parent TOTALS; this
    emits the RATIOS, which is what the treemap actually renders). All
    shares are ppm floor divisions of exact cent sums.

    Scale shape: facts collapse to |nations| rows map-side through two
    broadcast dim joins; both windows then run on that dimension-sized
    frame — the partition-by-region window never sees fact rows."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    rev = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
            .cast("long")
            .alias("cents")
        )
    )
    wr = Window.partitionBy("region")
    wt = Window.partitionBy()
    return rev.select(
        "region",
        "nation",
        "cents",
        F.expr(
            "CAST((cents * 1000000) div sum(cents)"
            " OVER (PARTITION BY region) AS BIGINT)"
        ).alias("pct_of_region_ppm"),
        (
            (F.sum("cents").over(wr) * 1000000)
            / F.sum("cents").over(wt)
        )
        .cast("long")
        .alias("region_pct_of_total_ppm"),
    )


# --------------------------------------------------------------------------
# 6. Generalize-to-k ladder
# --------------------------------------------------------------------------

GK_K = 25
# generalization levels: (cents divisor, use weekday?)
GK_LEVELS = ((100, True), (1000, True), (10000, True), (10000, False))


def _gk_oracle() -> str:
    parts = [
        """WITH base AS (
  SELECT CAST(round(value * 100) AS BIGINT) AS cents,
         CAST((CAST(ts AS DATE) - DATE '1970-01-05') % 7 AS BIGINT) AS dw
  FROM events
)"""
    ]
    sels = []
    for lvl, (dv, use_dw) in enumerate(GK_LEVELS):
        dwe = "dw" if use_dw else "CAST(0 AS BIGINT)"
        parts.append(
            f"""l{lvl} AS (
  SELECT CAST(count(*) AS BIGINT) AS n_groups,
         CAST(min(c) AS BIGINT) AS min_group
  FROM (SELECT count(*) AS c FROM base GROUP BY cents // {dv}, {dwe})
)"""
        )
        sels.append(
            f"""SELECT CAST({lvl} AS BIGINT) AS level, n_groups, min_group,
       CAST(CASE WHEN min_group >= {GK_K} THEN 1 ELSE 0 END AS BIGINT)
         AS k_ok
FROM l{lvl}"""
        )
    union = "\nUNION ALL\n".join(sels)
    return (
        ",\n".join(parts)
        + f""",
lvls AS ({union}),
chosen AS (
  SELECT coalesce(min(level), {len(GK_LEVELS)}) AS c FROM lvls WHERE k_ok = 1
)
SELECT l.level, l.n_groups, l.min_group, l.k_ok,
       CAST(CASE WHEN l.level = (SELECT c FROM chosen) THEN 1 ELSE 0 END
            AS BIGINT) AS chosen
FROM lvls l
"""
    )


@query("privacy_generalize_to_k", oracle=_gk_oracle())
def privacy_generalize_to_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global-recoding generalization ladder — the REMEDIATION step
    after ``privacy_k_anonymity`` flags a release: coarsen the
    quasi-identifier (cents bucket × weekday) level by level (dollar →
    10-dollar → 100-dollar → drop the weekday) until the smallest
    equivalence class reaches k={GK_K}, and report every level's group
    count and minimum class size with the chosen level marked. Global
    recoding (one granularity for everyone) is the deterministic,
    join-stable choice; the utility cost is visible as the collapsing
    n_groups column.

    Scale shape: each ladder level is one map-side-combined hash-agg;
    levels are independent scans that could share one pass via
    grouping sets at scale."""
    ev = load(spark, sf_dir, "events")
    base = ev.select(
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        (F.datediff(F.to_date("ts"), F.lit("1970-01-05").cast("date")) % 7)
        .cast("long")
        .alias("dw"),
    )
    rows = []
    for lvl, (dv, use_dw) in enumerate(GK_LEVELS):
        dwe = F.col("dw") if use_dw else F.lit(0).cast("long")
        per = base.groupBy(
            F.expr(f"cents div {dv}").alias("qb"), dwe.alias("qd")
        ).agg(F.count("*").alias("c"))
        st = per.agg(
            F.count("*").cast("long").alias("n_groups"),
            F.min("c").cast("long").alias("min_group"),
        ).select(
            F.lit(lvl).cast("long").alias("level"),
            "n_groups",
            "min_group",
            F.when(F.col("min_group") >= GK_K, 1)
            .otherwise(0)
            .cast("long")
            .alias("k_ok"),
        )
        rows.append(st)
    lvls = rows[0]
    for st in rows[1:]:
        lvls = lvls.unionByName(st)
    chosen = lvls.filter(F.col("k_ok") == 1).agg(
        F.coalesce(F.min("level"), F.lit(len(GK_LEVELS))).alias("c")
    )
    return lvls.crossJoin(F.broadcast(chosen)).select(
        "level",
        "n_groups",
        "min_group",
        "k_ok",
        F.when(F.col("level") == F.col("c"), 1)
        .otherwise(0)
        .cast("long")
        .alias("chosen"),
    )
