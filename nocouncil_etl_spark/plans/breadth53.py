"""Breadth batch 53 (round 6): harmonic regression, mutual best match,
expected shortfall, stopword discovery, critical path, late-arriving dim.

Six operators (reference scope: amplitude/phase of the weekly cadence,
one-to-one entity resolution from candidate pairs, tail-risk accounting,
corpus-specific stopword lists, pipeline-DAG scheduling depth, and the
warehouse pattern for facts that arrive before their dimension row):

- ``ts_harmonic_regression`` — weekly-harmonic amplitude, phase and
  variance share from exact DFT projections.
- ``join_mutual_best_match`` — 1:1 record linkage: accept a candidate
  pair only when each side is the other's best.
- ``agg_expected_shortfall`` — VaR95 and CVaR (tail mean) per type,
  nearest-rank exact.
- ``text_stopword_discovery`` — document-frequency-based stopword
  mining with IDF alongside.
- ``graph_critical_path``   — longest-path depth over the DAG subgraph
  by fixed relaxation rounds.
- ``io_late_arriving_dim``  — placeholder-then-backfill resolution of
  facts against a dimension that arrives late.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nocouncil_etl_spark.io import fan_out, load
from nocouncil_etl_spark.plans.breadth43 import SPEC_W
from nocouncil_etl_spark.plans.graph_plans import _EDGES_SQL, _graph
from nocouncil_etl_spark.registry import query

# --------------------------------------------------------------------------
# 1. Harmonic regression at the weekly frequency
# --------------------------------------------------------------------------

_W7 = [(r, c, s) for (p, r, c, s) in SPEC_W if p == 7]


@query(
    "ts_harmonic_regression",
    oracle=f"""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS d,
         CAST(sum(CAST(round(value) AS BIGINT)) AS BIGINT) AS y
  FROM events GROUP BY 1, 2
),
d0 AS (SELECT min(d) AS start FROM daily),
mu AS (
  SELECT event_type, CAST(sum(y) AS BIGINT) // count(*) AS mu
  FROM daily GROUP BY 1
),
idx AS (
  SELECT daily.event_type, daily.d - d0.start AS t, daily.y - mu.mu AS yc
  FROM daily, d0 JOIN mu ON daily.event_type = mu.event_type
),
w(r, c1024, s1024) AS (VALUES
  {', '.join(f'({r}, {c}, {s})' for r, c, s in _W7)}
),
sums AS (
  SELECT i.event_type,
         CAST(sum(i.yc * w.c1024) AS BIGINT) AS sr,
         CAST(sum(i.yc * w.s1024) AS BIGINT) AS si,
         CAST(sum(i.yc * i.yc) AS BIGINT) AS ss,
         CAST(count(*) AS BIGINT) AS n
  FROM idx i JOIN w ON w.r = i.t % 7
  GROUP BY 1
)
SELECT event_type, n,
       CAST(round(2000.0 * sqrt(CAST(sr AS DOUBLE) * sr
                                + CAST(si AS DOUBLE) * si)
                  / (n * 1024.0)) AS BIGINT) AS amp_milli,
       CAST(round(1000.0 * atan2(CAST(si AS DOUBLE), CAST(sr AS DOUBLE)))
            AS BIGINT) AS phase_milli,
       CAST(round(1000000.0 * 2.0
                  * (CAST(sr AS DOUBLE) * sr + CAST(si AS DOUBLE) * si)
                  / (1024.0 * 1024.0 * n * ss)) AS BIGINT) AS r2_ppm
FROM sums WHERE ss > 0
""",
)
def ts_harmonic_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Harmonic regression at the weekly frequency: because sin/cos over
    whole periods are orthogonal regressors, the least-squares
    amplitude and phase come straight from the DFT projection — no
    normal equations: amp = 2√(sr²+si²)/n, phase = atan2(si, sr),
    explained-variance share = 2(sr²+si²)/(n·SS). This turns the
    detection queries (``ts_goertzel_weekly`` says THAT the cadence
    exists, ``ts_spectral_entropy`` says HOW concentrated) into a
    fitted MODEL — amplitude in revenue units and a phase that names
    the peak weekday. Projections are exact BIGINTs from the shared
    1024-scaled trig table; doubles enter only the three fixed-shape
    output expressions, each rounded once.

    Scale shape: daily collapse map-side; one broadcast 7-row trig
    join; one hash-agg per key — identical to the spectral queries."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy("event_type", F.to_date("ts").alias("d")).agg(
        F.sum(F.round("value").cast("long")).cast("long").alias("y")
    )
    d0 = daily.agg(F.min("d").alias("start"))
    mu = daily.groupBy("event_type").agg(
        F.expr("CAST(sum(y) AS BIGINT) div count(*)").alias("mu")
    )
    idx = (
        daily.crossJoin(F.broadcast(d0))
        .join(F.broadcast(mu), "event_type")
        .select(
            "event_type",
            F.datediff("d", "start").alias("t"),
            (F.col("y") - F.col("mu")).alias("yc"),
        )
    )
    w = spark.createDataFrame(list(_W7), "r LONG, c1024 LONG, s1024 LONG")
    sums = (
        idx.join(F.broadcast(w), w.r == idx.t % 7)
        .groupBy("event_type")
        .agg(
            F.sum(F.col("yc") * F.col("c1024")).cast("long").alias("sr"),
            F.sum(F.col("yc") * F.col("s1024")).cast("long").alias("si"),
            F.sum(F.col("yc") * F.col("yc")).cast("long").alias("ss"),
            F.count("*").cast("long").alias("n"),
        )
    )
    return sums.filter(F.col("ss") > 0).select(
        "event_type",
        "n",
        F.round(
            2000.0
            * F.sqrt(
                F.col("sr").cast("double") * F.col("sr")
                + F.col("si").cast("double") * F.col("si")
            )
            / (F.col("n") * 1024.0)
        )
        .cast("long")
        .alias("amp_milli"),
        F.round(
            1000.0
            * F.atan2(F.col("si").cast("double"), F.col("sr").cast("double"))
        )
        .cast("long")
        .alias("phase_milli"),
        F.round(
            1000000.0
            * 2.0
            * (
                F.col("sr").cast("double") * F.col("sr")
                + F.col("si").cast("double") * F.col("si")
            )
            / (1024.0 * 1024.0 * F.col("n") * F.col("ss"))
        )
        .cast("long")
        .alias("r2_ppm"),
    )


# --------------------------------------------------------------------------
# 2. Mutual best match (1:1 linkage)
# --------------------------------------------------------------------------


@query(
    "join_mutual_best_match",
    oracle="""
WITH s AS (
  SELECT s_suppkey, s_nationkey,
         CAST(round(s_acctbal * 100) AS BIGINT) AS sb
  FROM supplier
),
c AS (
  SELECT c_custkey, c_nationkey,
         CAST(round(c_acctbal * 100) AS BIGINT) AS cb
  FROM customer
),
cand AS (
  SELECT s.s_suppkey, c.c_custkey, abs(s.sb - c.cb) AS diff
  FROM s JOIN c ON s.s_nationkey = c.c_nationkey
),
bests AS (
  SELECT s_suppkey, c_custkey, diff FROM (
    SELECT *, row_number() OVER (PARTITION BY s_suppkey
                                 ORDER BY diff, c_custkey) AS rk
    FROM cand
  ) WHERE rk = 1
),
bestc AS (
  SELECT s_suppkey, c_custkey FROM (
    SELECT *, row_number() OVER (PARTITION BY c_custkey
                                 ORDER BY diff, s_suppkey) AS rk
    FROM cand
  ) WHERE rk = 1
)
SELECT b.s_suppkey, b.c_custkey, CAST(b.diff AS BIGINT) AS diff_cents
FROM bests b JOIN bestc x
  ON b.s_suppkey = x.s_suppkey AND b.c_custkey = x.c_custkey
""",
)
def join_mutual_best_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual-best 1:1 matching — the entity-resolution ASSIGNMENT step
    that follows candidate generation (``join_fuzzy_dedup`` /
    ``dedup_phonetic_block`` produce many-to-many candidates; a
    crosswalk needs each entity used at most once): within a nation
    block, each supplier's closest customer by account balance and
    each customer's closest supplier are computed independently, and a
    pair is accepted only when BOTH point at each other — the first
    round of stable matching, which provably yields a conflict-free
    partial matching with no sequential greedy loop (every step is a
    window argmax + one equi-join, fully parallel).

    Scale shape: "closest by balance" is 1-D nearest neighbor, so the
    per-nation candidate CROSS product (|S|x|C| per block — 87x wall at
    10x data, quadratic death at 100 TB) is the wrong primitive. Each
    side's best match is found by SORT, not by pairing: distinct balance
    values of the target side (one row per value, min-id representative
    — exactly the (diff, id) tie-break order), union-tagged with the
    query side, one per-nation ordered window reads the bracketing
    value below and above, and the closer one wins (ties -> smaller
    representative id, matching the quadratic form's ordering). Two
    linear sort-merge passes + one tiny equi-join."""
    s = load(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("qid"),
        F.col("s_nationkey").alias("nat"),
        F.round(F.col("s_acctbal") * 100).cast("long").alias("bal"),
    )
    c = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("qid"),
        F.col("c_nationkey").alias("nat"),
        F.round(F.col("c_acctbal") * 100).cast("long").alias("bal"),
    )

    def nearest_1d(queries: DataFrame, targets: DataFrame) -> DataFrame:
        """(qid, match, diff): for each query row, the target id minimizing
        (|bal_q - bal_t|, target id) within its nation — by sorted bracket,
        never by pairing. Queries with no same-nation target drop (the
        inner-join semantics of the quadratic form)."""
        grp = targets.groupBy("nat", "bal").agg(F.min("qid").alias("rep"))
        tagged = grp.select(
            "nat", "bal", "rep", F.lit(1).alias("is_t"),
            F.lit(None).cast("long").alias("qid"),
        ).unionByName(
            queries.select(
                "nat", "bal", F.lit(None).cast("long").alias("rep"),
                F.lit(0).alias("is_t"), "qid",
            )
        )
        # targets sort BEFORE queries at equal balance (is_t desc), so the
        # "previous target" window sees an exact-balance match as diff 0.
        # Both brackets use running (UnboundedPreceding) frames — the
        # "next" one over the REVERSED sort — because Spark evaluates an
        # UnboundedFollowing frame by rescanning the whole tail per row
        # (O(n^2) per partition; measured 18 s on 160k rows), while the
        # running frame is incremental.
        wp = (
            Window.partitionBy("nat")
            .orderBy(F.col("bal"), F.col("is_t").desc())
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        wn = (
            Window.partitionBy("nat")
            .orderBy(F.col("bal").desc(), F.col("is_t"))
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        tb = F.when(F.col("is_t") == 1, F.col("bal"))
        tr = F.when(F.col("is_t") == 1, F.col("rep"))
        br = tagged.select(
            "*",
            F.last(tb, ignorenulls=True).over(wp).alias("pb"),
            F.last(tr, ignorenulls=True).over(wp).alias("pr"),
            F.last(tb, ignorenulls=True).over(wn).alias("nb"),
            F.last(tr, ignorenulls=True).over(wn).alias("nr"),
        ).filter(F.col("is_t") == 0)
        pd_ = F.col("bal") - F.col("pb")
        nd = F.col("nb") - F.col("bal")
        pick_prev = F.col("nb").isNull() | (
            F.col("pb").isNotNull()
            & (
                (pd_ < nd)
                | ((pd_ == nd) & (F.col("pr") <= F.col("nr")))
            )
        )
        return br.filter(
            F.col("pb").isNotNull() | F.col("nb").isNotNull()
        ).select(
            "qid",
            F.when(pick_prev, F.col("pr")).otherwise(F.col("nr")).alias("match"),
            F.when(pick_prev, pd_).otherwise(nd).alias("diff"),
        )

    bests = nearest_1d(s, c).select(
        F.col("qid").alias("s_suppkey"),
        F.col("match").alias("c_custkey"),
        "diff",
    )
    bestc = nearest_1d(c, s).select(
        F.col("match").alias("s_suppkey"),
        F.col("qid").alias("c_custkey"),
    )
    return bests.join(bestc, ["s_suppkey", "c_custkey"]).select(
        "s_suppkey", "c_custkey", F.col("diff").cast("long").alias("diff_cents")
    )


# --------------------------------------------------------------------------
# 3. Expected shortfall (CVaR)
# --------------------------------------------------------------------------

ES_PCT = 95


@query(
    "agg_expected_shortfall",
    oracle=f"""
WITH cents AS (
  SELECT event_type, event_id,
         CAST(round(value * 100) AS BIGINT) AS v
  FROM events
),
ranked AS (
  SELECT event_type, v,
         CAST(row_number() OVER (PARTITION BY event_type
                                 ORDER BY v, event_id) AS BIGINT) AS r,
         CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
  FROM cents
),
var_ AS (
  SELECT event_type, n, v AS var95
  FROM ranked WHERE r = ({ES_PCT} * n + 99) // 100
),
tail AS (
  SELECT rk.event_type,
         CAST(count(*) AS BIGINT) AS n_tail,
         CAST(sum(rk.v) AS BIGINT) AS s_tail
  FROM ranked rk
  WHERE rk.r >= ({ES_PCT} * rk.n + 99) // 100
  GROUP BY 1
)
SELECT v.event_type, v.n, v.var95, t.n_tail,
       CAST((1000 * t.s_tail) // t.n_tail AS BIGINT) AS cvar_milli
FROM var_ v JOIN tail t ON v.event_type = t.event_type
""",
)
def agg_expected_shortfall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-at-risk and expected shortfall (CVaR) of the per-type cent
    distribution: VaR{ES_PCT} is the nearest-rank {ES_PCT}th percentile
    (ceiling rank, deterministic (value, id) tie-break) and CVaR is the
    exact MEAN of the tail at or beyond it — the coherent risk measure
    Basel moved to precisely because two distributions can share a VaR
    while hiding very different tails (the percentile family —
    ``agg_percentile_exact_rank`` et al — reports the cut point; this
    reports what lives past it). Integer throughout; one milli
    division at the end.

    Scale shape: one per-key rank window + one keyed tail agg; at
    100 TB the same numbers come from the count-of-values cumulative
    table with no per-row window (the KS/KW machinery)."""
    ev = load(spark, sf_dir, "events")
    cents = ev.select(
        "event_type",
        "event_id",
        F.round(F.col("value") * 100).cast("long").alias("v"),
    )
    wp = Window.partitionBy("event_type")
    ranked = cents.select(
        "event_type",
        "v",
        F.row_number()
        .over(wp.orderBy("v", "event_id"))
        .cast("long")
        .alias("r"),
        F.count("*").over(wp).cast("long").alias("n"),
    )
    kexpr = f"({ES_PCT} * n + 99) div 100"
    var_ = ranked.filter(F.expr(f"r = {kexpr}")).select(
        "event_type", "n", F.col("v").alias("var95")
    )
    tail = (
        ranked.filter(F.expr(f"r >= {kexpr}"))
        .groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_tail"),
            F.sum("v").cast("long").alias("s_tail"),
        )
    )
    return var_.join(tail, "event_type").select(
        "event_type",
        "n",
        "var95",
        "n_tail",
        F.expr("CAST((1000 * s_tail) div n_tail AS BIGINT)").alias("cvar_milli"),
    )


# --------------------------------------------------------------------------
# 4. Stopword discovery
# --------------------------------------------------------------------------

SW_TOP = 20
SW_DF_PPM = 500000  # document-frequency ratio threshold


@query(
    "text_stopword_discovery",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
nd AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS d FROM toks),
stats AS (
  SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df,
         CAST(count(*) AS BIGINT) AS cf
  FROM toks GROUP BY term
)
SELECT rk, term, df, cf,
       CAST((df * 1000000) // (SELECT d FROM nd) AS BIGINT) AS df_ppm,
       CAST(round(1000000 * ln(CAST((SELECT d FROM nd) AS DOUBLE) / df))
            AS BIGINT) AS idf_micro,
       CAST(CASE WHEN (df * 1000000) // (SELECT d FROM nd) >= {SW_DF_PPM}
            THEN 1 ELSE 0 END AS BIGINT) AS is_stopword
FROM (
  SELECT *, CAST(row_number() OVER (ORDER BY df DESC, cf DESC, term) AS INT)
              AS rk
  FROM stats
) WHERE rk <= {SW_TOP}
""",
)
def text_stopword_discovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-specific stopword discovery: rank terms by DOCUMENT
    frequency and flag those appearing in ≥{SW_DF_PPM}/1e6 of documents
    — the data-driven replacement for a fixed stopword list (a crawl of
    council minutes has its own boilerplate vocabulary no English list
    contains; ``text_keyphrase_rake`` and ``text_bm25_search`` both
    consume exactly this list). IDF sits alongside so the flag's
    information-theoretic cost is visible: a 50%-DF term carries under
    0.7 nats.

    Scale shape: one (term, doc) distinct + hash-agg over the token
    stream; ranking is a bounded top-k."""
    docs = fan_out(load(spark, sf_dir, "documents"))
    toks = docs.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    d = toks.select("doc_id").distinct().count()
    stats = toks.groupBy("term").agg(
        F.countDistinct("doc_id").cast("long").alias("df"),
        F.count("*").cast("long").alias("cf"),
    )
    return (
        stats.withColumn(
            "rk",
            F.row_number()
            .over(Window.orderBy(F.desc("df"), F.desc("cf"), "term"))
            .cast("int"),
        )
        .filter(F.col("rk") <= SW_TOP)
        .select(
            "rk",
            "term",
            "df",
            "cf",
            F.expr(f"CAST((df * 1000000) div {d} AS BIGINT)").alias("df_ppm"),
            F.round(1000000 * F.log(F.lit(float(d)) / F.col("df")))
            .cast("long")
            .alias("idf_micro"),
            F.when(F.expr(f"(df * 1000000) div {d} >= {SW_DF_PPM}"), 1)
            .otherwise(0)
            .cast("long")
            .alias("is_stopword"),
        )
    )


# --------------------------------------------------------------------------
# 5. Critical path over the DAG subgraph
# --------------------------------------------------------------------------

CP_ROUNDS = 6
CP_TOP = 10


def _cp_oracle() -> str:
    parts = [
        f"WITH {_EDGES_SQL}",
        "dag AS MATERIALIZED (SELECT src, dst FROM edges0 WHERE src < dst)",
        "d0 AS (SELECT node AS v, CAST(0 AS BIGINT) AS dep FROM nodes)",
    ]
    for r in range(1, CP_ROUNDS + 1):
        parts.append(
            f"""d{r} AS MATERIALIZED (
  SELECT p.v,
         CAST(greatest(p.dep, coalesce(
             (SELECT max(q.dep + 1) FROM d{r - 1} q
              JOIN dag e ON e.src = q.v AND e.dst = p.v), 0)) AS BIGINT)
           AS dep
  FROM d{r - 1} p
)"""
        )
    return (
        ",\n".join(parts)
        + f"""
SELECT rk, v AS node, depth FROM (
  SELECT v, dep AS depth,
         CAST(row_number() OVER (ORDER BY dep DESC, v) AS INT) AS rk
  FROM d{CP_ROUNDS}
) WHERE rk <= {CP_TOP}
"""
    )


@query("graph_critical_path", oracle=_cp_oracle())
def graph_critical_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Critical-path depth over the DAG subgraph (edges oriented
    low→high id, the standard acyclic restriction): {CP_ROUNDS}
    Bellman-Ford-style relaxation rounds of dep(v) = max(dep(v),
    max_{{u→v}} dep(u)+1) — the longest-path layering that schedules a
    pipeline DAG (a node's depth IS its earliest wave; the max depth is
    the critical path no parallelism can beat, Amdahl's floor for the
    whole job graph). Longest path is NP-hard on general graphs but
    linear on DAGs, which is exactly why the orientation step matters.
    Top-{CP_TOP} deepest nodes reported.

    Scale shape: each round is one equi-join + max-agg + coalesce —
    the ``graph_bfs_layers`` shape with max instead of min; depth is
    bounded by the round count, documented."""
    nodes, edges, n = _graph(spark, sf_dir)
    dag = (
        edges.select("src", "dst")
        .filter(F.col("src") < F.col("dst"))
        .localCheckpoint(eager=True)
    )
    dep = nodes.select(F.col("node").alias("v"), F.lit(0).cast("long").alias("dep"))
    for _ in range(CP_ROUNDS):
        inc = (
            dep.join(dag, dep.v == dag.src)
            .groupBy(F.col("dst").alias("v"))
            .agg(F.max(F.col("dep") + 1).cast("long").alias("cand"))
        )
        dep = (
            dep.join(inc, "v", "left")
            .select(
                "v",
                F.greatest(F.col("dep"), F.coalesce("cand", F.lit(0)))
                .cast("long")
                .alias("dep"),
            )
            .localCheckpoint(eager=True)
        )
    return (
        dep.withColumn(
            "rk",
            F.row_number().over(Window.orderBy(F.desc("dep"), "v")).cast("int"),
        )
        .filter(F.col("rk") <= CP_TOP)
        .select("rk", F.col("v").alias("node"), F.col("dep").alias("depth"))
    )


# --------------------------------------------------------------------------
# 6. Late-arriving dimension resolution
# --------------------------------------------------------------------------

LAD_MOD = 11  # customers with key % 11 == 0 arrive late


@query(
    "io_late_arriving_dim",
    oracle=f"""
WITH facts AS (
  SELECT o_orderkey, o_custkey,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
),
dim_v1 AS (
  SELECT c_custkey, c_nationkey FROM customer
  WHERE c_custkey % {LAD_MOD} <> 0
),
v1 AS (
  SELECT f.o_orderkey, f.cents,
         CASE WHEN d.c_custkey IS NULL THEN 1 ELSE 0 END AS placeholder
  FROM facts f LEFT JOIN dim_v1 d ON f.o_custkey = d.c_custkey
),
v2 AS (
  SELECT f.o_orderkey,
         CASE WHEN d.c_custkey IS NULL THEN 1 ELSE 0 END AS unresolved
  FROM facts f LEFT JOIN customer d ON f.o_custkey = d.c_custkey
)
SELECT CAST(count(*) AS BIGINT) AS n_facts,
       CAST(sum(1 - v1.placeholder) AS BIGINT) AS resolved_v1,
       CAST(sum(v1.placeholder) AS BIGINT) AS placeholder_v1,
       CAST(sum(CASE WHEN v1.placeholder = 1 THEN v1.cents ELSE 0 END)
            AS BIGINT) AS cents_parked,
       CAST((SELECT sum(1 - unresolved) FROM v2) AS BIGINT) AS resolved_v2,
       CAST((SELECT sum(unresolved) FROM v2) AS BIGINT) AS still_unresolved
FROM v1
""",
)
def io_late_arriving_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Late-arriving dimension handling (Kimball's early-arriving
    facts): the first dimension publish is missing every {LAD_MOD}th
    customer (their profile rows haven't ingested yet), so fact rows
    referencing them land against a PLACEHOLDER member instead of being
    dropped — preserving the fact total while parking the revenue in an
    'unknown member' bucket (the cents_parked column is what finance
    sees until backfill). When the full dimension publishes, the
    re-resolution pass retires the placeholders; both generations are
    physically written and re-read so the audit is against real files.
    Dropping or inner-joining instead silently loses revenue — the
    anti-pattern this op exists to prevent.

    Scale shape: two broadcast-dim left joins and counting; the
    placeholder re-resolution touches only parked rows in an
    incremental implementation."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    base = os.path.join(
        tempfile.gettempdir(),
        "nocouncil_etl_spark_scratch",
        f"lad_{os.path.basename(sf_dir.rstrip('/'))}",
    )
    v1_dir, v2_dir = os.path.join(base, "dim_v1"), os.path.join(base, "dim_v2")
    c.filter(F.col("c_custkey") % LAD_MOD != 0).select(
        "c_custkey", "c_nationkey"
    ).write.mode("overwrite").parquet(v1_dir)
    c.select("c_custkey", "c_nationkey").write.mode("overwrite").parquet(v2_dir)
    facts = o.select(
        "o_orderkey",
        "o_custkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    d1 = spark.read.parquet(v1_dir)
    d2 = spark.read.parquet(v2_dir)
    v1 = facts.join(
        F.broadcast(d1), facts.o_custkey == d1.c_custkey, "left"
    ).select(
        "cents",
        F.when(F.col("c_custkey").isNull(), 1).otherwise(0).alias("placeholder"),
    )
    v2 = facts.join(
        F.broadcast(d2), facts.o_custkey == d2.c_custkey, "left"
    ).select(
        F.when(F.col("c_custkey").isNull(), 1).otherwise(0).alias("unresolved")
    )
    a = v1.agg(
        F.count("*").cast("long").alias("n_facts"),
        F.sum(1 - F.col("placeholder")).cast("long").alias("resolved_v1"),
        F.sum("placeholder").cast("long").alias("placeholder_v1"),
        F.sum(F.when(F.col("placeholder") == 1, F.col("cents")).otherwise(0))
        .cast("long")
        .alias("cents_parked"),
    )
    b = v2.agg(
        F.sum(1 - F.col("unresolved")).cast("long").alias("resolved_v2"),
        F.sum("unresolved").cast("long").alias("still_unresolved"),
    )
    return a.crossJoin(F.broadcast(b))
