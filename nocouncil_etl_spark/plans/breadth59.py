"""Breadth batch 39 (round 6): generalized ESD outliers, restricted mean
survival time, permuterm wildcard search, proximity (slop) search,
oblivious depth-2 tree, Lindley backlog recursion.

Six operators (reference scope: iterated outlier testing, the standard
clinical summary of a survival curve, tolerant retrieval over wildcard
queries, positional proximity retrieval, CatBoost-style level-wise tree
growth, and queueing/backlog accounting via the prefix-min closed form):

- ``stat_esd_outliers``        — 3-round generalized ESD (iterated
  Grubbs) on the daily event count, exact integer moments per round.
- ``survival_rmst``            — restricted mean survival time (area
  under the Kaplan-Meier step curve to a fixed horizon).
- ``search_permuterm_wildcard``— permuterm (rotated-term) index
  answering single-star wildcard queries by prefix match.
- ``search_proximity_slop``    — two-term proximity search with a
  positional slop bound (min token distance per doc).
- ``ml_oblivious_tree_depth2`` — depth-2 oblivious tree: one shared
  threshold per level (level 1 on balance, level 2 on order count),
  gini-scored from integer counts.
- ``ts_lindley_backlog``       — daily demand vs fixed capacity backlog
  via Lindley's recursion solved as cumsum minus running minimum.

Reference parity: north-star extension — no reference analogue
(the reference has no analytics layer); retrieval ops extend its build-once index
discipline (`vectorize.py:119-123`) to tolerant/positional queries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nocouncil_etl_spark.io import fan_out, load
from nocouncil_etl_spark.plans.retrieval_plans import _TOK_SPARK, _TOK_SQL
from nocouncil_etl_spark.registry import query

ESD_ROUNDS = 3
ESD_FLAG_MILLI = 3000  # flag |z| > 3.0 (milli-quantized comparison)
RMST_TAU_WEEKS = 8
PERM_QUERIES = ("s*n", "c*n", "st*m", "*alue")  # single-star wildcards
SLOP_T1, SLOP_T2, SLOP_MAX = "join", "hash", 3
OBL_LABEL_CENTS = 46_710_000  # label: max order value above ~median
OBL_BAND1 = 100_000  # level-1 bands: acctbal cents per 1000 units
OBL_BAND2 = 2  # level-2 bands: order count per 2 orders


# --------------------------------------------------------------------------
# 1. Generalized ESD (iterated Grubbs)
# --------------------------------------------------------------------------


def _esd_round_sql(k: int, src: str) -> str:
    """One ESD round over ``src``(day, c): pick{k} = the extreme day +
    statistic; rest{k} = src minus that day."""
    return f"""
m{k} AS (
  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(c) AS BIGINT) AS s,
         CAST(sum(c * c) AS BIGINT) AS ss
  FROM {src}
),
r{k} AS (
  SELECT day, c,
         abs(c * (SELECT n FROM m{k}) - (SELECT s FROM m{k})) AS numer
  FROM {src}
),
pick{k} AS (
  SELECT day, c,
         CAST(round(1000.0 * numer / sqrt(
           CAST((SELECT n FROM m{k}) AS DOUBLE) * (SELECT ss FROM m{k})
           - CAST((SELECT s FROM m{k}) AS DOUBLE) * (SELECT s FROM m{k})))
           AS BIGINT) AS r_milli
  FROM r{k}
  ORDER BY numer DESC, day LIMIT 1
),
rest{k} AS (SELECT * FROM {src} WHERE day <> (SELECT day FROM pick{k}))"""


def _esd_oracle() -> str:
    rounds, src = [], "cnt"
    for k in range(1, ESD_ROUNDS + 1):
        rounds.append(_esd_round_sql(k, src))
        src = f"rest{k}"
    picks = "\nUNION ALL\n".join(
        f"SELECT {k} AS round, CAST(day AS VARCHAR) AS day, c, r_milli,"
        f" CASE WHEN r_milli > {ESD_FLAG_MILLI} THEN 1 ELSE 0 END AS flagged"
        f" FROM pick{k}"
        for k in range(1, ESD_ROUNDS + 1)
    )
    return f"""
WITH cnt AS (
  SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1
),{",".join(rounds)}
{picks}
"""


@query("stat_esd_outliers", oracle=_esd_oracle())
def stat_esd_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generalized ESD outlier test (Rosner 1983), {ESD_ROUNDS} rounds on
    the daily event count: each round recomputes mean/sd of the REMAINING
    series from exact integer moments, extracts the most extreme day
    (|x·n − S| maximized — the integer form of |x − mean|, tie → earliest
    day), and removes it before the next round — the iteration Grubbs
    (stat_grubbs_outlier) lacks, which is what masks multiple outliers.
    The studentized statistic is reported in milli units and flagged
    against {ESD_FLAG_MILLI / 1000} (fixed critical value in place of
    the t-quantile, which neither engine exposes).

    Scale shape: the series is calendar-sized after one hash agg; each
    round is one 3-moment aggregate + one top-1 (TakeOrdered) over that
    tiny frame — the fact stream is scanned exactly once."""
    cnt = (
        load(spark, sf_dir, "events")
        .groupBy(F.col("ts").cast("date").alias("day"))
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    out = None
    src = cnt
    for k in range(1, ESD_ROUNDS + 1):
        m = src.agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("c").cast("long").alias("s"),
            F.sum(F.col("c") * F.col("c")).cast("long").alias("ss"),
        )
        scored = src.crossJoin(F.broadcast(m)).withColumn(
            "numer", F.abs(F.col("c") * F.col("n") - F.col("s"))
        )
        pick = (
            scored.orderBy(F.desc("numer"), "day")
            .limit(1)
            .select(
                "day",
                "c",
                F.round(
                    1000.0
                    * F.col("numer")
                    / F.sqrt(
                        F.col("n").cast("double") * F.col("ss")
                        - F.col("s").cast("double") * F.col("s")
                    )
                )
                .cast("long")
                .alias("r_milli"),
            )
        )
        row = pick.select(
            F.lit(k).cast("int").alias("round"),
            F.col("day").cast("string").alias("day"),
            "c",
            "r_milli",
            F.when(F.col("r_milli") > ESD_FLAG_MILLI, 1).otherwise(0).alias(
                "flagged"
            ),
        )
        out = row if out is None else out.unionByName(row)
        pd = pick.select(F.col("day").alias("pd"))
        src = (
            src.crossJoin(F.broadcast(pd))
            .filter(F.col("day") != F.col("pd"))
            .drop("pd")
        )
    return out


# --------------------------------------------------------------------------
# 2. Restricted mean survival time
# --------------------------------------------------------------------------


@query(
    "survival_rmst",
    oracle=f"""
WITH span AS (
  SELECT user_id, min(ts) AS first_ts, max(ts) AS last_ts FROM events GROUP BY 1
),
horizon AS (SELECT max(ts) AS mx FROM events),
life AS (
  SELECT CAST(date_diff('day', first_ts, last_ts) // 7 AS BIGINT) AS t,
         CASE WHEN last_ts < (SELECT mx FROM horizon) - INTERVAL 7 DAY
              THEN 1 ELSE 0 END AS died
  FROM span
),
tab AS (
  SELECT t, CAST(sum(died) AS BIGINT) AS d, CAST(sum(1 - died) AS BIGINT) AS c
  FROM life GROUP BY t
),
risk AS (
  SELECT t, d,
         sum(d + c) OVER (ORDER BY t DESC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_risk
  FROM tab
),
surv AS (
  SELECT t,
         lead(t) OVER (ORDER BY t) AS t_next,
         sum(CAST(round(ln((n_risk - d) / CAST(n_risk AS DOUBLE)), 6)
                  AS DECIMAL(18, 6))) OVER (ORDER BY t
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS logS
  FROM risk
),
pieces AS (
  SELECT CAST(round(1000000 * exp(CAST(logS AS DOUBLE))) AS BIGINT)
           * greatest(least(coalesce(t_next, {RMST_TAU_WEEKS}),
                            {RMST_TAU_WEEKS}) - least(t, {RMST_TAU_WEEKS}), 0)
           AS area_micro
  FROM surv
),
head AS (
  SELECT 1000000 * least(min(t), {RMST_TAU_WEEKS}) AS area_micro FROM tab
)
SELECT CAST({RMST_TAU_WEEKS} AS BIGINT) AS tau_weeks,
       CAST((SELECT area_micro FROM head)
            + (SELECT sum(area_micro) FROM pieces) AS BIGINT)
         AS rmst_microweeks,
       (SELECT CAST(count(*) AS BIGINT) FROM span) AS n_users
""",
)
def survival_rmst(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Restricted mean survival time at tau = {RMST_TAU_WEEKS} weeks:
    the area under the Kaplan-Meier step curve (exactly the
    survival_kaplan_meier lifetime/censoring definitions, so the two
    operators audit the same curve) — S(t) is constant between event
    weeks, so RMST = Σ S(tᵢ)·(min(tᵢ₊₁,τ) − min(tᵢ,τ)) plus the S=1 head
    segment before the first event week. Each piece quantizes S to
    exact micro units before multiplying by the integer week width, so
    the area is one BIGINT sum. RMST is the standard clinical summary
    when hazards aren't proportional (no median needed, no PH
    assumption).

    Scale shape: identical to the KM operator — two hash aggs to the
    weekly life table, windows over that calendar-sized frame, 1-row
    output."""
    ev = load(spark, sf_dir, "events")
    span = ev.groupBy("user_id").agg(
        F.min("ts").alias("first_ts"), F.max("ts").alias("last_ts")
    )
    horizon = ev.agg(F.max("ts").alias("mx"))
    life = span.crossJoin(F.broadcast(horizon)).select(
        (F.datediff("last_ts", "first_ts") / 7).cast("long").alias("t"),
        F.when(
            F.col("last_ts") < F.col("mx") - F.expr("INTERVAL 7 DAY"), 1
        )
        .otherwise(0)
        .alias("died"),
    )
    tab = life.groupBy("t").agg(
        F.sum("died").cast("long").alias("d"),
        F.sum(1 - F.col("died")).cast("long").alias("c"),
    )
    wdesc = Window.orderBy(F.desc("t")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    risk = tab.select(
        "t", "d", F.sum(F.col("d") + F.col("c")).over(wdesc).alias("n_risk")
    )
    wasc = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    logs = (
        F.round(
            F.log(
                (F.col("n_risk") - F.col("d")) / F.col("n_risk").cast("double")
            ),
            6,
        )
    ).cast("decimal(18,6)")
    surv = risk.select(
        "t",
        F.lead("t").over(Window.orderBy("t")).alias("t_next"),
        F.sum(logs).over(wasc).alias("logS"),
    )
    tau = F.lit(RMST_TAU_WEEKS)
    width = F.greatest(
        F.least(F.coalesce("t_next", tau), tau) - F.least(F.col("t"), tau),
        F.lit(0),
    )
    pieces = surv.select(
        (
            F.round(1_000_000 * F.exp(F.col("logS").cast("double"))).cast(
                "long"
            )
            * width
        ).alias("area_micro")
    ).agg(F.sum("area_micro").alias("tail"))
    head = tab.agg(
        (1_000_000 * F.least(F.min("t"), tau)).alias("head")
    )
    n = span.agg(F.count(F.lit(1)).cast("long").alias("n_users"))
    return (
        head.crossJoin(F.broadcast(pieces))
        .crossJoin(F.broadcast(n))
        .select(
            tau.cast("long").alias("tau_weeks"),
            (F.col("head") + F.col("tail")).cast("long").alias(
                "rmst_microweeks"
            ),
            "n_users",
        )
    )


# --------------------------------------------------------------------------
# 3. Permuterm wildcard search
# --------------------------------------------------------------------------


def _perm_key(pattern: str) -> str:
    """Rotate a single-star wildcard X*Y to the permuterm prefix Y$X."""
    x, y = pattern.split("*")
    return f"{y}${x}"


def _perm_oracle() -> str:
    qrows = ", ".join(
        f"('{p}', '{_perm_key(p)}')" for p in PERM_QUERIES
    )
    return f"""
WITH vocab AS (
  SELECT DISTINCT unnest({_TOK_SQL}) AS term FROM documents
),
rot AS (
  SELECT term,
         substr(term || '$' || term || '$', i + 1, length(term) + 1) AS rotation
  FROM vocab, LATERAL (SELECT unnest(range(length(term) + 1)) AS i)
),
q(pattern, key) AS (VALUES {qrows}),
hits AS (
  SELECT DISTINCT q.pattern, r.term
  FROM q JOIN rot r ON r.rotation LIKE q.key || '%'
),
docs AS (
  SELECT doc_id, unnest({_TOK_SQL}) AS term FROM documents
),
perq AS (
  SELECT h.pattern,
         CAST(count(DISTINCT h.term) AS BIGINT) AS n_terms,
         CAST(count(DISTINCT d.doc_id) AS BIGINT) AS n_docs,
         min(h.term) AS first_term
  FROM hits h LEFT JOIN docs d ON d.term = h.term
  GROUP BY h.pattern
)
SELECT q.pattern, coalesce(p.n_terms, 0) AS n_terms,
       coalesce(p.n_docs, 0) AS n_docs, p.first_term
FROM q LEFT JOIN perq p ON p.pattern = q.pattern
"""


@query("search_permuterm_wildcard", oracle=_perm_oracle())
def search_permuterm_wildcard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Permuterm index (Garfield 1976; the tolerant-retrieval structure
    in IIR ch. 3) answering single-star wildcard queries: every
    vocabulary term is stored under all rotations of term+'$'; a query
    X*Y rotates to the prefix Y$X, so ONE prefix scan finds exactly the
    terms matching the wildcard (no post-verification needed for one
    star). Reports matched-term and matched-doc counts per pattern
    {PERM_QUERIES}. The B-tree-friendly alternative to scanning the
    whole vocabulary with a regex per query.

    Scale shape: the rotation table is Σ(len+1) rows over the VOCABULARY
    (not the corpus) — tiny and build-once; each query is a prefix range
    scan + one semi-join into the postings; the corpus is tokenized
    once."""
    docs = fan_out(load(spark, sf_dir, "documents"))
    vocab = (
        docs.select(F.explode(F.expr(_TOK_SPARK)).alias("term")).distinct()
    )
    rot = vocab.select(
        "term",
        F.explode(
            F.expr("sequence(0, length(term))")
        ).alias("i"),
    ).select(
        "term",
        F.expr(
            "substr(term || '$' || term || '$', i + 1, length(term) + 1)"
        ).alias("rotation"),
    )
    q = spark.createDataFrame(
        [(p, _perm_key(p)) for p in PERM_QUERIES], "pattern string, key string"
    )
    hits = (
        F.broadcast(q)
        .join(rot, rot["rotation"].startswith(F.col("key")))
        .select("pattern", "term")
        .distinct()
    )
    toks = docs.select("doc_id", F.explode(F.expr(_TOK_SPARK)).alias("term"))
    perq = (
        hits.join(toks, "term", "left")
        .groupBy("pattern")
        .agg(
            F.countDistinct("term").cast("long").alias("n_terms"),
            F.countDistinct("doc_id").cast("long").alias("n_docs"),
            F.min("term").alias("first_term"),
        )
    )
    return (
        q.select("pattern")
        .join(perq, "pattern", "left")
        .select(
            "pattern",
            F.coalesce("n_terms", F.lit(0)).cast("long").alias("n_terms"),
            F.coalesce("n_docs", F.lit(0)).cast("long").alias("n_docs"),
            "first_term",
        )
    )


# --------------------------------------------------------------------------
# 4. Proximity (slop) search
# --------------------------------------------------------------------------


@query(
    "search_proximity_slop",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, generate_subscripts(w, 1) AS pos, unnest(w) AS term
  FROM (SELECT doc_id, {_TOK_SQL} AS w FROM documents)
),
p1 AS (SELECT doc_id, pos FROM toks WHERE term = '{SLOP_T1}'),
p2 AS (SELECT doc_id, pos FROM toks WHERE term = '{SLOP_T2}'),
pairs AS (
  SELECT p1.doc_id, abs(p1.pos - p2.pos) AS dist
  FROM p1 JOIN p2 ON p1.doc_id = p2.doc_id
)
SELECT doc_id,
       CAST(min(dist) AS BIGINT) AS min_dist,
       CAST(sum(CASE WHEN dist <= {SLOP_MAX} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_pairs_within
FROM pairs GROUP BY doc_id
HAVING min(dist) <= {SLOP_MAX}
""",
)
def search_proximity_slop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional proximity search: docs where '{SLOP_T1}' and
    '{SLOP_T2}' occur within {SLOP_MAX} tokens of each other (Lucene's
    slop / IIR positional-postings query) — the step between bag-of-
    words retrieval (text_bm25_search) and exact adjacency
    (text_phrase_search). Emits the minimum token distance and the
    number of qualifying position pairs per matching doc.

    Scale shape: positional postings for the TWO query terms only
    (term-filtered before the join), equi-joined on doc_id — per-doc
    pair counts are occurrence products of two rare terms, never the
    corpus; one hash agg finishes it."""
    docs = fan_out(load(spark, sf_dir, "documents"))
    toks = docs.select(
        "doc_id", F.posexplode(F.expr(_TOK_SPARK)).alias("pos0", "term")
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "term")
    p1 = toks.filter(F.col("term") == SLOP_T1).select("doc_id", "pos")
    p2 = toks.filter(F.col("term") == SLOP_T2).select(
        F.col("doc_id").alias("d2"), F.col("pos").alias("pos2")
    )
    pairs = p1.join(p2, F.col("doc_id") == F.col("d2")).select(
        "doc_id", F.abs(F.col("pos") - F.col("pos2")).alias("dist")
    )
    return (
        pairs.groupBy("doc_id")
        .agg(
            F.min("dist").cast("long").alias("min_dist"),
            F.sum(F.when(F.col("dist") <= SLOP_MAX, 1).otherwise(0))
            .cast("long")
            .alias("n_pairs_within"),
        )
        .filter(F.col("min_dist") <= SLOP_MAX)
    )


# --------------------------------------------------------------------------
# 5. Oblivious depth-2 tree
# --------------------------------------------------------------------------


def _obl_oracle() -> str:
    return f"""
WITH labeled AS (
  SELECT CAST(round(c.c_acctbal * 100) AS BIGINT) AS x1,
         coalesce(o.n_orders, 0) AS x2,
         CASE WHEN coalesce(o.mx, 0) > {OBL_LABEL_CENTS} THEN 1 ELSE 0 END AS y
  FROM customer c
  LEFT JOIN (
    SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders,
           CAST(round(max(o_totalprice) * 100) AS BIGINT) AS mx
    FROM orders GROUP BY 1
  ) o ON o.o_custkey = c.c_custkey
),
b1 AS (
  SELECT CAST(floor(CAST(x1 AS DOUBLE) / {OBL_BAND1}) AS BIGINT) AS band,
         CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS pos
  FROM labeled GROUP BY 1
),
c1 AS (
  SELECT band, sum(n) OVER (ORDER BY band) AS nl, sum(pos) OVER (ORDER BY band) AS pl
  FROM b1
),
t1 AS (SELECT sum(n) AS n, sum(pos) AS pos FROM b1),
s1 AS (
  SELECT band, nl, pl, (SELECT n FROM t1) - nl AS nr,
         (SELECT pos FROM t1) - pl AS pr,
         CAST(round(1000000.0 * (
           CAST(pl AS DOUBLE) * pl / nl
           + CAST((SELECT pos FROM t1) - pl AS DOUBLE)
             * ((SELECT pos FROM t1) - pl) / ((SELECT n FROM t1) - nl)))
           AS BIGINT) AS score
  FROM c1 WHERE nl < (SELECT n FROM t1)
),
best1 AS (
  SELECT * FROM (SELECT *, row_number() OVER (ORDER BY score DESC, band) AS rk
                 FROM s1) WHERE rk = 1
),
sided AS (
  SELECT CASE WHEN CAST(floor(CAST(x1 AS DOUBLE) / {OBL_BAND1}) AS BIGINT)
                   <= (SELECT band FROM best1) THEN 0 ELSE 1 END AS side,
         CAST(floor(CAST(x2 AS DOUBLE) / {OBL_BAND2}) AS BIGINT) AS band2, y
  FROM labeled
),
b2 AS (
  SELECT side, band2, CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS pos
  FROM sided GROUP BY 1, 2
),
c2 AS (
  SELECT side, band2,
         sum(n) OVER (PARTITION BY side ORDER BY band2) AS nl,
         sum(pos) OVER (PARTITION BY side ORDER BY band2) AS pl,
         sum(n) OVER (PARTITION BY side) AS nt,
         sum(pos) OVER (PARTITION BY side) AS pt
  FROM b2
),
s2 AS (
  SELECT band2,
         sum(CASE WHEN nl > 0 AND nl < nt
                  THEN CAST(round(1000000.0 * (
                         CAST(pl AS DOUBLE) * pl / nl
                         + CAST(pt - pl AS DOUBLE) * (pt - pl) / (nt - nl)))
                       AS BIGINT)
                  ELSE NULL END) AS score,
         CAST(count(*) AS BIGINT) AS n_valid_sides
  FROM c2 GROUP BY band2 HAVING count(*) = 2 AND min(nl) > 0
     AND min(nt - nl) > 0
),
best2 AS (
  SELECT * FROM (SELECT *, row_number() OVER (ORDER BY score DESC, band2) AS rk
                 FROM s2) WHERE rk = 1
),
leaves AS (
  SELECT s.side,
         CASE WHEN s.band2 <= (SELECT band2 FROM best2) THEN 0 ELSE 1 END AS sub,
         CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS pos
  FROM sided s GROUP BY 1, 2
)
SELECT side, sub, n, pos,
       CAST(round(1000.0 * pos / n) AS BIGINT) AS rate_milli,
       (SELECT CAST((band + 1) * {OBL_BAND1} - 1 AS BIGINT) FROM best1)
         AS t1_cents,
       (SELECT CAST((band2 + 1) * {OBL_BAND2} - 1 AS BIGINT) FROM best2)
         AS t2_orders
FROM leaves
"""


@query("ml_oblivious_tree_depth2", oracle=_obl_oracle())
def ml_oblivious_tree_depth2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Depth-2 OBLIVIOUS decision tree (CatBoost's level-wise structure:
    every node at a level shares ONE split): level 1 picks the best
    account-balance band threshold by the gini-equivalent score
    Σ pos²/n over the two children (maximizing it minimizes weighted
    gini impurity); level 2 picks a single order-count threshold
    maximizing the SUMMED score across both level-1 sides — the
    constraint that makes the tree a 4-cell lookup table (two
    comparisons at serve time, branchless). All scores are doubles of
    exact integer counts, quantized to micro before the argmax
    (tie → smaller band). Emits the 4 leaves with counts, positive
    rates, and both committed thresholds.

    Scale shape: two histogram passes (band → n, pos), each map-side
    combined; candidate scoring is a cumulative window over the tiny
    band table (level 2 partitioned by side with a 2-row-per-band
    validity gate); leaves are one final hash agg. Identical cost
    profile to ml_best_split_gini, run twice."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    per = orders.groupBy("o_custkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.round(F.max("o_totalprice") * 100).cast("long").alias("mx"),
    )
    labeled = (
        cust.join(per, cust["c_custkey"] == per["o_custkey"], "left")
        .select(
            F.round(F.col("c_acctbal") * 100).cast("long").alias("x1"),
            F.coalesce("n_orders", F.lit(0)).alias("x2"),
            F.when(F.coalesce("mx", F.lit(0)) > OBL_LABEL_CENTS, 1)
            .otherwise(0)
            .alias("y"),
        )
    )

    def score(pl, nl, pt, nt):
        pr, nr = pt - pl, nt - nl
        return F.round(
            1_000_000.0
            * (
                pl.cast("double") * pl / nl
                + pr.cast("double") * pr / nr
            )
        ).cast("long")

    b1 = labeled.groupBy(
        F.floor(F.col("x1").cast("double") / OBL_BAND1).cast("long").alias(
            "band"
        )
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").cast("long").alias("pos"),
    )
    wb = Window.orderBy("band").rowsBetween(Window.unboundedPreceding, 0)
    t1 = b1.agg(F.sum("n").alias("nt"), F.sum("pos").alias("pt"))
    c1 = (
        b1.select(
            "band",
            F.sum("n").over(wb).alias("nl"),
            F.sum("pos").over(wb).alias("pl"),
        )
        .crossJoin(F.broadcast(t1))
        .filter(F.col("nl") < F.col("nt"))
    )
    s1 = c1.select(
        "band",
        score(F.col("pl"), F.col("nl"), F.col("pt"), F.col("nt")).alias(
            "score"
        ),
    )
    best1 = (
        s1.withColumn(
            "rk", F.row_number().over(Window.orderBy(F.desc("score"), "band"))
        )
        .filter(F.col("rk") == 1)
        .select(F.col("band").alias("band1"))
    )
    sided = labeled.crossJoin(F.broadcast(best1)).select(
        F.when(
            F.floor(F.col("x1").cast("double") / OBL_BAND1).cast("long")
            <= F.col("band1"),
            0,
        )
        .otherwise(1)
        .alias("side"),
        F.floor(F.col("x2").cast("double") / OBL_BAND2).cast("long").alias(
            "band2"
        ),
        "y",
    )
    b2 = sided.groupBy("side", "band2").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").cast("long").alias("pos"),
    )
    ws = Window.partitionBy("side").orderBy("band2").rowsBetween(
        Window.unboundedPreceding, 0
    )
    wside = Window.partitionBy("side")
    c2 = b2.select(
        "side",
        "band2",
        F.sum("n").over(ws).alias("nl"),
        F.sum("pos").over(ws).alias("pl"),
        F.sum("n").over(wside).alias("nt"),
        F.sum("pos").over(wside).alias("pt"),
    )
    valid = (F.col("nl") > 0) & (F.col("nl") < F.col("nt"))
    s2 = (
        c2.groupBy("band2")
        .agg(
            F.sum(
                F.when(
                    valid,
                    score(F.col("pl"), F.col("nl"), F.col("pt"), F.col("nt")),
                )
            ).alias("score"),
            F.count(F.lit(1)).cast("long").alias("k"),
            F.min("nl").alias("min_nl"),
            F.min(F.col("nt") - F.col("nl")).alias("min_nr"),
        )
        .filter(
            (F.col("k") == 2) & (F.col("min_nl") > 0) & (F.col("min_nr") > 0)
        )
    )
    best2 = (
        s2.withColumn(
            "rk",
            F.row_number().over(Window.orderBy(F.desc("score"), "band2")),
        )
        .filter(F.col("rk") == 1)
        .select(F.col("band2").alias("bb2"))
    )
    leaves = (
        sided.crossJoin(F.broadcast(best2))
        .groupBy(
            "side",
            F.when(F.col("band2") <= F.col("bb2"), 0).otherwise(1).alias("sub"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("y").cast("long").alias("pos"),
        )
    )
    th1 = best1.select(
        ((F.col("band1") + 1) * OBL_BAND1 - 1).cast("long").alias("t1_cents")
    )
    th2 = best2.select(
        ((F.col("bb2") + 1) * OBL_BAND2 - 1).cast("long").alias("t2_orders")
    )
    return (
        leaves.crossJoin(F.broadcast(th1))
        .crossJoin(F.broadcast(th2))
        .select(
            "side",
            "sub",
            "n",
            "pos",
            F.round(1000.0 * F.col("pos") / F.col("n")).cast("long").alias(
                "rate_milli"
            ),
            "t1_cents",
            "t2_orders",
        )
    )


# --------------------------------------------------------------------------
# 6. Lindley backlog recursion
# --------------------------------------------------------------------------


@query(
    "ts_lindley_backlog",
    oracle="""
WITH cnt AS (
  SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS d
  FROM events GROUP BY 1
),
cap AS (SELECT sum(d) // count(*) AS c FROM cnt),
s AS (
  SELECT day, d,
         sum(d - (SELECT c FROM cap)) OVER (ORDER BY day
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS st
  FROM cnt
),
b AS (
  SELECT day, d, st,
         st - least(0, min(st) OVER (ORDER BY day
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS backlog
  FROM s
)
SELECT CAST(day AS VARCHAR) AS day, d AS demand,
       (SELECT CAST(c AS BIGINT) FROM cap) AS capacity,
       CAST(backlog AS BIGINT) AS backlog,
       CAST(d - (backlog - coalesce(lag(backlog) OVER (ORDER BY day), 0))
            AS BIGINT) AS served
FROM b
""",
)
def ts_lindley_backlog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily backlog under a fixed service capacity (mean daily demand,
    floor): Lindley's recursion B_t = max(0, B_{t−1} + d_t − c) — the
    single-server queue waiting-time equation — solved IN CLOSED FORM as
    B_t = S_t − min(0, min_{k≤t} S_k) with S the running sum of (d − c),
    i.e. one cumulative sum and one running minimum instead of a
    sequential scan. Emits per-day demand, backlog, and units actually
    served (d minus backlog growth). The recursion-to-prefix-extremum
    rewrite is what makes day-ordered queue semantics distributable.

    Scale shape: calendar-sized series after one hash agg; two windows
    share one sort (documented single-series global window, as in
    ts_cusum_changepoint); everything else is narrow arithmetic."""
    cnt = (
        load(spark, sf_dir, "events")
        .groupBy(F.col("ts").cast("date").alias("day"))
        .agg(F.count(F.lit(1)).cast("long").alias("d"))
    )
    cap = cnt.agg(
        F.floor(F.sum("d") / F.count(F.lit(1))).cast("long").alias("c")
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    s = cnt.crossJoin(F.broadcast(cap)).withColumn(
        "st", F.sum(F.col("d") - F.col("c")).over(w)
    )
    b = s.withColumn(
        "backlog", F.col("st") - F.least(F.lit(0), F.min("st").over(w))
    )
    lagb = F.lag("backlog").over(Window.orderBy("day"))
    return b.select(
        F.col("day").cast("string").alias("day"),
        F.col("d").alias("demand"),
        F.col("c").cast("long").alias("capacity"),
        F.col("backlog").cast("long").alias("backlog"),
        (F.col("d") - (F.col("backlog") - F.coalesce(lagb, F.lit(0))))
        .cast("long")
        .alias("served"),
    )
