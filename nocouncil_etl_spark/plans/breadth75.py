"""Breadth batch 55 (round 6): Little's law audit, embedding hubness,
Merkle root, Bowker symmetry, lexicon scoring, clustering-degree curve.

Six operators (reference scope: the queueing identity as a data-quality
invariant, the high-dimensional kNN pathology metric, tamper-evident
dataset fingerprinting, transition-matrix symmetry testing, lexicon
sentiment scoring, and the clustering-vs-degree structure curve):

- ``agg_littles_law_audit``  — L = λW measured three ways on the
  order→ship pipeline; the ratio is the consistency audit.
- ``vec_hubness_skew``       — k-occurrence distribution of the sampled
  kNN graph: hub skewness and orphan count.
- ``io_merkle_root``         — 3-level Merkle tree over orderkey-bucket
  digests: one tamper-evident root.
- ``stat_bowker_symmetry``   — Bowker test of event-transition
  symmetry (the k×k McNemar).
- ``text_lexicon_score``     — literal-lexicon sentiment per source.
- ``graph_clustering_degree_curve`` — mean local clustering by degree.

Reference parity: north-star extension — no reference analogue
(the reference has no analytics layer); these are the audit layers a lake-scale engine
adds on the same tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nocouncil_etl_spark.io import fan_out, load
from nocouncil_etl_spark.plans.graph_plans import _EDGES_SQL, _graph
from nocouncil_etl_spark.plans.retrieval_plans import _TOK_SPARK, _TOK_SQL
from nocouncil_etl_spark.registry import query

HUB_MOD = 7  # sample floor: vec_id % max(7, n div HUB_TARGET) == 0
# Cap the hubness audit's sample at ~HUB_TARGET vectors regardless of
# corpus size: the all-pairs dot is quadratic IN THE SAMPLE, so a fixed
# 1/7 rate turned 10x data into 100x work (r7 sf1 run: 2.4 s -> 238 s).
# A statistical audit needs a fixed sample budget, not a fixed rate —
# the auto_nlist philosophy applied to sampling.
HUB_TARGET = 300
HUB_K = 5
MERKLE_BUCKET = 1000
LEXICON = {"fast": 1, "big": 1, "slow": -1, "small": -1}


# --------------------------------------------------------------------------
# 1. Little's law audit
# --------------------------------------------------------------------------


@query(
    "agg_littles_law_audit",
    oracle="""
WITH o AS (
  SELECT o.o_orderkey, CAST(o.o_orderdate AS DATE) AS arr,
         CAST(max(l.l_shipdate) AS DATE) AS done
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  GROUP BY 1, 2
),
win AS (
  SELECT min(arr) AS lo, max(arr) AS hi,
         CAST(max(arr) - min(arr) AS BIGINT) + 1 AS days
  FROM o
),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(done - arr + 1) AS BIGINT) AS total_dur
  FROM o
)
SELECT (SELECT n FROM agg) AS n_orders,
       (SELECT CAST(days AS BIGINT) FROM win) AS window_days,
       CAST(round(1000000.0 * (SELECT n FROM agg) / (SELECT days FROM win))
            AS BIGINT) AS lambda_micro,
       CAST(round(1000.0 * (SELECT total_dur FROM agg) / (SELECT n FROM agg))
            AS BIGINT) AS w_days_milli,
       CAST(round(1000.0 * (SELECT total_dur FROM agg)
                  / (SELECT days FROM win)) AS BIGINT) AS l_wip_milli,
       CAST(round(1000.0 * ((SELECT total_dur FROM agg)
                            / CAST((SELECT days FROM win) AS DOUBLE))
            / ((CAST((SELECT n FROM agg) AS DOUBLE) / (SELECT days FROM win))
               * ((SELECT total_dur FROM agg)
                  / CAST((SELECT n FROM agg) AS DOUBLE)))) AS BIGINT)
         AS littles_ratio_milli
""",
)
def agg_littles_law_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Little's law (L = λ·W) audit of the order→ship pipeline: arrival
    rate λ = orders/day over the observed window, mean time-in-system
    W = mean(ship span), and time-averaged WIP L = Σ durations / window
    days — three independently meaningful operational metrics whose
    RATIO L/(λW) must be 1 by the finite-window identity (it is, up to
    edge effects), making it the cross-check that catches broken
    timestamp pipelines (agg_max_concurrency measures the same WIP by
    interval sweep). All three come from one integer duration rollup.

    Scale shape: one orderkey join + hash agg to per-order spans, 1-row
    arithmetic."""
    o = (
        load(spark, sf_dir, "orders")
        .join(
            load(spark, sf_dir, "lineitem"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .groupBy(
            "o_orderkey", F.col("o_orderdate").cast("date").alias("arr")
        )
        .agg(F.max(F.col("l_shipdate").cast("date")).alias("done"))
    )
    win = o.agg(
        (F.datediff(F.max("arr"), F.min("arr")) + 1)
        .cast("long")
        .alias("days")
    )
    agg = o.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.datediff("done", "arr") + 1).cast("long").alias("total_dur"),
    )
    lam = 1_000_000.0 * F.col("n") / F.col("days")
    wmean = 1000.0 * F.col("total_dur") / F.col("n")
    lwip = 1000.0 * F.col("total_dur") / F.col("days")
    ratio = (
        1000.0
        * (F.col("total_dur") / F.col("days").cast("double"))
        / (
            (F.col("n").cast("double") / F.col("days"))
            * (F.col("total_dur") / F.col("n").cast("double"))
        )
    )
    return agg.crossJoin(F.broadcast(win)).select(
        F.col("n").alias("n_orders"),
        F.col("days").alias("window_days"),
        F.round(lam).cast("long").alias("lambda_micro"),
        F.round(wmean).cast("long").alias("w_days_milli"),
        F.round(lwip).cast("long").alias("l_wip_milli"),
        F.round(ratio).cast("long").alias("littles_ratio_milli"),
    )


# --------------------------------------------------------------------------
# 2. Hubness skew
# --------------------------------------------------------------------------


@query(
    "vec_hubness_skew",
    oracle=f"""
WITH sub AS (
  SELECT vec_id, embedding FROM embeddings
  WHERE vec_id % greatest({HUB_MOD},
        (SELECT count(*) FROM embeddings) // {HUB_TARGET}) = 0
),
dims AS (
  SELECT s.vec_id, generate_subscripts(s.embedding, 1) AS i,
         unnest(s.embedding) AS v
  FROM sub s
),
dots AS (
  SELECT a.vec_id AS qa, b.vec_id AS qb,
         CAST(sum(CAST(round(1000000 * CAST(a.v AS DOUBLE)
                             * CAST(b.v AS DOUBLE)) AS BIGINT)) AS BIGINT)
           AS dot_q
  FROM dims a JOIN dims b ON b.i = a.i AND b.vec_id <> a.vec_id
  GROUP BY 1, 2
),
topk AS (
  SELECT qa, qb FROM (
    SELECT qa, qb, row_number() OVER (PARTITION BY qa
             ORDER BY dot_q DESC, qb) AS rk
    FROM dots
  ) WHERE rk <= {HUB_K}
),
nk AS (
  SELECT s.vec_id, CAST(count(t.qa) AS BIGINT) AS n_k
  FROM sub s LEFT JOIN topk t ON t.qb = s.vec_id
  GROUP BY s.vec_id
),
mom AS (
  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(n_k) AS BIGINT) AS s1,
         CAST(sum(n_k * n_k) AS BIGINT) AS s2,
         CAST(sum(n_k * n_k * n_k) AS BIGINT) AS s3,
         CAST(max(n_k) AS BIGINT) AS mx,
         CAST(sum(CASE WHEN n_k = 0 THEN 1 ELSE 0 END) AS BIGINT) AS orphans
  FROM nk
)
SELECT n AS n_vecs, mx AS max_nk, orphans AS n_orphans,
       CAST(round(1000.0
            * (CAST(s3 AS DOUBLE) / n
               - 3.0 * (CAST(s1 AS DOUBLE) / n) * (CAST(s2 AS DOUBLE) / n)
               + 2.0 * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)
                 * (CAST(s1 AS DOUBLE) / n))
            / pow(CAST(s2 AS DOUBLE) / n
                  - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n),
                  1.5)) AS BIGINT) AS skew_milli
FROM mom
""",
)
def vec_hubness_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hubness of the embedding space (Radovanović 2010): on a
    deterministic 1/{HUB_MOD} sample, count how often each vector
    appears in OTHERS' top-{HUB_K} by dot product (per-dimension
    products quantized to micro integers before summing, so rankings
    are exact); the SKEWNESS of that k-occurrence distribution is the
    high-dimensional pathology number — heavy right skew means a few
    hub vectors dominate every neighborhood and kNN-based ops
    (vec_knn_*, dedup_semantic_*) degrade. Orphans (never retrieved)
    are the other tail.

    Scale shape (r7): the all-pairs dot is quadratic IN THE SAMPLE, so
    the sampling modulus grows with the corpus (max({HUB_MOD},
    n div {HUB_TARGET}) — a fixed ~{HUB_TARGET}-vector audit budget at
    any scale; the r7 sf1 run caught the fixed-rate version at 101× on
    10× data); moments are one rollup."""
    emb = fan_out(load(spark, sf_dir, "embeddings"))
    modrow = emb.agg(
        F.greatest(
            F.lit(HUB_MOD).cast("long"),
            F.expr(f"count(1) div {HUB_TARGET}"),
        ).alias("_m")
    )
    sub = (
        emb.crossJoin(F.broadcast(modrow))
        .filter(F.col("vec_id") % F.col("_m") == 0)
        .drop("_m")
    )
    dims = sub.select(
        "vec_id", F.posexplode("embedding").alias("i", "v")
    ).select("vec_id", "i", F.col("v").cast("double").alias("v"))
    b = dims.select(
        F.col("vec_id").alias("qb"), F.col("i").alias("ib"),
        F.col("v").alias("vb"),
    )
    dots = (
        dims.join(
            b,
            (F.col("i") == F.col("ib")) & (F.col("vec_id") != F.col("qb")),
        )
        .groupBy(F.col("vec_id").alias("qa"), "qb")
        .agg(
            F.sum(
                F.round(1_000_000 * F.col("v") * F.col("vb")).cast("long")
            )
            .cast("long")
            .alias("dot_q")
        )
    )
    topk = (
        dots.withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("qa").orderBy(F.desc("dot_q"), "qb")
            ),
        )
        .filter(F.col("rk") <= HUB_K)
        .select("qa", "qb")
    )
    nk = (
        sub.select("vec_id")
        .join(topk, topk["qb"] == F.col("vec_id"), "left")
        .groupBy("vec_id")
        .agg(F.count("qa").cast("long").alias("n_k"))
    )
    mom = nk.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("n_k").cast("long").alias("s1"),
        F.sum(F.col("n_k") * F.col("n_k")).cast("long").alias("s2"),
        F.sum(F.col("n_k") * F.col("n_k") * F.col("n_k"))
        .cast("long")
        .alias("s3"),
        F.max("n_k").cast("long").alias("mx"),
        F.sum(F.when(F.col("n_k") == 0, 1).otherwise(0))
        .cast("long")
        .alias("orphans"),
    )
    n = F.col("n")
    m1 = F.col("s1").cast("double") / n
    m2 = F.col("s2").cast("double") / n
    m3 = F.col("s3").cast("double") / n
    return mom.select(
        n.alias("n_vecs"),
        F.col("mx").alias("max_nk"),
        F.col("orphans").alias("n_orphans"),
        F.round(
            1000.0
            * (m3 - 3.0 * m1 * m2 + 2.0 * m1 * m1 * m1)
            / F.pow(m2 - m1 * m1, 1.5)
        )
        .cast("long")
        .alias("skew_milli"),
    )


# --------------------------------------------------------------------------
# 3. Merkle root
# --------------------------------------------------------------------------


@query(
    "io_merkle_root",
    oracle=f"""
WITH rows_ AS (
  SELECT o_orderkey // {MERKLE_BUCKET} AS bucket,
         md5(CAST(o_orderkey AS VARCHAR) || '|'
             || CAST(CAST(round(100 * o_totalprice) AS BIGINT) AS VARCHAR))
           AS digest,
         o_orderkey
  FROM orders
),
leaves AS (
  SELECT bucket, md5(string_agg(digest, '' ORDER BY o_orderkey)) AS h
  FROM rows_ GROUP BY bucket
),
l1 AS (
  SELECT bucket // 2 AS b1, md5(string_agg(h, '' ORDER BY bucket)) AS h
  FROM leaves GROUP BY bucket // 2
),
l2 AS (
  SELECT b1 // 2 AS b2, md5(string_agg(h, '' ORDER BY b1)) AS h
  FROM l1 GROUP BY b1 // 2
),
root AS (
  SELECT md5(string_agg(h, '' ORDER BY b2)) AS root_hash FROM l2
)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM leaves) AS n_leaves,
       (SELECT CAST(count(*) AS BIGINT) FROM l1) AS n_level1,
       (SELECT CAST(count(*) AS BIGINT) FROM l2) AS n_level2,
       (SELECT root_hash FROM root) AS root_hash
""",
)
def io_merkle_root(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merkle tree over the orders table: per-row md5 digests roll into
    {MERKLE_BUCKET}-row leaf hashes (ordered within the leaf), leaves
    pair up two levels, and the final root is ONE tamper-evident hash
    of the whole table — change any cell and the root changes, and the
    changed LEAF is locatable in log time (the structure behind
    Iceberg/Delta content verification and io_hash_chain_ledger's
    linear cousin — trees verify subranges, chains verify order).

    Scale shape: per-level ordered string_agg within bounded groups
    ({MERKLE_BUCKET} rows, then 2 nodes) — each level is one hash agg;
    depth is logarithmic and fixed here."""
    rows_ = load(spark, sf_dir, "orders").select(
        F.expr(f"o_orderkey div {MERKLE_BUCKET}").alias("bucket"),
        F.md5(
            F.concat_ws(
                "|",
                F.col("o_orderkey").cast("string"),
                F.round(100 * F.col("o_totalprice")).cast("long").cast("string"),
            )
        ).alias("digest"),
        "o_orderkey",
    )

    def level(df: DataFrame, key, order, out: str) -> DataFrame:
        return df.groupBy(key.alias(out)).agg(
            F.md5(
                F.concat_ws(
                    "",
                    F.array_sort(
                        F.collect_list(F.struct(order, F.col("h")))
                    ).getField("h"),
                )
            ).alias("h")
        )

    leaves = rows_.groupBy("bucket").agg(
        F.md5(
            F.concat_ws(
                "",
                F.array_sort(
                    F.collect_list(F.struct("o_orderkey", "digest"))
                ).getField("digest"),
            )
        ).alias("h")
    )
    leaves.persist()
    l1 = level(leaves, F.expr("bucket div 2"), F.col("bucket"), "b1")
    l1.persist()
    l2 = level(l1, F.expr("b1 div 2"), F.col("b1"), "b2")
    l2.persist()
    root = l2.agg(
        F.md5(
            F.concat_ws(
                "",
                F.array_sort(F.collect_list(F.struct("b2", "h"))).getField(
                    "h"
                ),
            )
        ).alias("root_hash")
    )
    nl = leaves.agg(F.count(F.lit(1)).cast("long").alias("n_leaves"))
    n1 = l1.agg(F.count(F.lit(1)).cast("long").alias("n_level1"))
    n2 = l2.agg(F.count(F.lit(1)).cast("long").alias("n_level2"))
    return (
        nl.crossJoin(F.broadcast(n1))
        .crossJoin(F.broadcast(n2))
        .crossJoin(F.broadcast(root))
    )


# --------------------------------------------------------------------------
# 4. Bowker symmetry
# --------------------------------------------------------------------------


@query(
    "stat_bowker_symmetry",
    oracle="""
WITH t AS (
  SELECT event_type AS nxt,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev
  FROM events
),
cnt AS (
  SELECT prev, nxt, CAST(count(*) AS BIGINT) AS n
  FROM t WHERE prev IS NOT NULL GROUP BY 1, 2
),
pairs AS (
  SELECT a.prev AS i, a.nxt AS j, a.n AS nij, coalesce(b.n, 0) AS nji
  FROM cnt a
  LEFT JOIN cnt b ON b.prev = a.nxt AND b.nxt = a.prev
  WHERE a.prev < a.nxt
)
SELECT CAST(count(*) AS BIGINT) AS df,
       CAST(round(1000.0 * sum(
         CAST((nij - nji) AS DOUBLE) * (nij - nji) / (nij + nji)))
         AS BIGINT) AS bowker_milli,
       max(CASE WHEN abs(nij - nji) = (SELECT max(abs(nij - nji)) FROM pairs)
                THEN i || '->' || j END) AS most_asymmetric
FROM pairs
WHERE nij + nji > 0
""",
)
def stat_bowker_symmetry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bowker's symmetry test (the k×k generalization of eval_mcnemar)
    on the event-type transition matrix: B = Σ_{{i<j}}
    (n_ij − n_ji)²/(n_ij + n_ji) — symmetric flow means users wander
    (reversible chain); a significant B localizes DIRECTED behavioral
    currents (e.g. view→purchase ≫ purchase→view), and the most
    asymmetric pair is named. Counts are exact; one division per pair.

    Scale shape: one user-partitioned lag window, a |types|² hash agg,
    pair arithmetic on the tiny matrix."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t = ev.select(
        F.col("event_type").alias("nxt"),
        F.lag("event_type").over(w).alias("prev"),
    )
    cnt = (
        t.filter(F.col("prev").isNotNull())
        .groupBy("prev", "nxt")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    b = cnt.select(
        F.col("prev").alias("bp"), F.col("nxt").alias("bn"),
        F.col("n").alias("nji"),
    )
    pairs = (
        cnt.join(
            b,
            (F.col("bp") == F.col("nxt")) & (F.col("bn") == F.col("prev")),
            "left",
        )
        .filter(F.col("prev") < F.col("nxt"))
        .select(
            F.col("prev").alias("i"),
            F.col("nxt").alias("j"),
            F.col("n").alias("nij"),
            F.coalesce("nji", F.lit(0)).alias("nji"),
        )
        .filter(F.col("nij") + F.col("nji") > 0)
    )
    pairs.persist()
    mx = pairs.agg(
        F.max(F.abs(F.col("nij") - F.col("nji"))).alias("mxd")
    )
    return (
        pairs.crossJoin(F.broadcast(mx))
        .agg(
            F.count(F.lit(1)).cast("long").alias("df"),
            F.round(
                1000.0
                * F.sum(
                    (F.col("nij") - F.col("nji")).cast("double")
                    * (F.col("nij") - F.col("nji"))
                    / (F.col("nij") + F.col("nji"))
                )
            )
            .cast("long")
            .alias("bowker_milli"),
            F.max(
                F.when(
                    F.abs(F.col("nij") - F.col("nji")) == F.col("mxd"),
                    F.concat(F.col("i"), F.lit("->"), F.col("j")),
                )
            ).alias("most_asymmetric"),
        )
    )


# --------------------------------------------------------------------------
# 5. Lexicon scoring
# --------------------------------------------------------------------------


def _lex_rows() -> str:
    return ", ".join(f"('{t}', {w})" for t, w in sorted(LEXICON.items()))


@query(
    "text_lexicon_score",
    oracle=f"""
WITH tok AS (
  SELECT source, unnest({_TOK_SQL}) AS term FROM documents
),
lex(term, w) AS (VALUES {_lex_rows()}),
hits AS (
  SELECT t.source, l.w FROM tok t JOIN lex l ON l.term = t.term
),
lens AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_tokens FROM tok GROUP BY source
)
SELECT lens.source, lens.n_tokens,
       CAST(coalesce(sum(CASE WHEN h.w > 0 THEN 1 END), 0) AS BIGINT)
         AS pos_hits,
       CAST(coalesce(sum(CASE WHEN h.w < 0 THEN 1 END), 0) AS BIGINT)
         AS neg_hits,
       CAST(round(1000.0 * coalesce(sum(h.w), 0) / lens.n_tokens) AS BIGINT)
         AS sentiment_milli
FROM lens LEFT JOIN hits h ON h.source = lens.source
GROUP BY lens.source, lens.n_tokens
""",
)
def text_lexicon_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexicon-based sentiment per source with the literal valence
    dictionary {dict(sorted(LEXICON.items()))}: score = Σ weights /
    tokens — the VADER/AFINN mechanism reduced to its dataflow (a
    broadcast lexicon join + normalized rollup). In production the
    VALUES table is the full lexicon; the engine-side shape (one token
    pass, one tiny join) is identical — the classic pre-LLM text
    signal, complementing heuristic quality (text_quality) and model
    seams (model_extract_entities).

    Scale shape: tokenization pass + broadcast lexicon join + source
    rollup."""
    docs = fan_out(load(spark, sf_dir, "documents"))
    tok = docs.select("source", F.explode(F.expr(_TOK_SPARK)).alias("term"))
    lex = spark.createDataFrame(
        sorted(LEXICON.items()), "term string, w long"
    )
    hits = tok.join(F.broadcast(lex), "term").select("source", "w")
    lens = tok.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens")
    )
    agg = hits.groupBy("source").agg(
        F.sum(F.when(F.col("w") > 0, 1)).cast("long").alias("pos_hits"),
        F.sum(F.when(F.col("w") < 0, 1)).cast("long").alias("neg_hits"),
        F.sum("w").cast("long").alias("sw"),
    )
    return lens.join(agg, "source", "left").select(
        "source",
        "n_tokens",
        F.coalesce("pos_hits", F.lit(0)).cast("long").alias("pos_hits"),
        F.coalesce("neg_hits", F.lit(0)).cast("long").alias("neg_hits"),
        F.round(
            1000.0 * F.coalesce("sw", F.lit(0)) / F.col("n_tokens")
        )
        .cast("long")
        .alias("sentiment_milli"),
    )


# --------------------------------------------------------------------------
# 6. Clustering-degree curve
# --------------------------------------------------------------------------


@query(
    "graph_clustering_degree_curve",
    oracle=f"""
WITH {_EDGES_SQL},
und AS MATERIALIZED (
  SELECT src AS a, dst AS b FROM edges0 UNION SELECT dst, src FROM edges0),
udeg AS MATERIALIZED (
  SELECT a AS node, CAST(count(*) AS BIGINT) AS d FROM und GROUP BY a),
wedge AS (
  SELECT u1.a AS v, u1.b AS x, u2.b AS y
  FROM und u1 JOIN und u2 ON u2.a = u1.a AND u2.b > u1.b
),
tri AS (
  SELECT w.v, CAST(count(*) AS BIGINT) AS t
  FROM wedge w JOIN und e ON e.a = w.x AND e.b = w.y
  GROUP BY w.v
),
pern AS (
  SELECT g.node, g.d, coalesce(t.t, 0) AS t,
         CASE WHEN g.d >= 2
              THEN CAST(round(1000000.0 * 2 * coalesce(t.t, 0)
                        / (g.d * (g.d - 1))) AS BIGINT) END AS c_micro
  FROM udeg g LEFT JOIN tri t ON t.v = g.node
)
SELECT d AS degree, CAST(count(*) AS BIGINT) AS n_nodes,
       CAST(round(avg(CAST(c_micro AS DOUBLE)) / 1000) AS BIGINT)
         AS mean_c_milli
FROM pern WHERE d >= 2 GROUP BY d
""",
)
def graph_clustering_degree_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local clustering coefficient BY DEGREE: each node's
    C_v = 2T_v/(d_v(d_v−1)) (neighbor-pair wedges closed into
    triangles), averaged per degree class — a falling C(k) ~ k^-1 curve
    is the hierarchical-modularity signature (Ravasz-Barabási), which
    the single global number (graph_clustering_coefficient) flattens
    away. Per-node C quantizes to micro before the class mean; wedges
    enumerate only b₁ < b₂ neighbor pairs.

    Scale shape: the wedge join is Σd² (the triangle-join bound, same
    as graph_triangle_count); the closure check is one edge equi-join;
    the curve is a degree-cardinality rollup."""
    nodes, edges, _n = _graph(spark, sf_dir)
    und = (
        edges.select(F.col("src").alias("a"), F.col("dst").alias("b"))
        .unionByName(edges.select(F.col("dst").alias("a"), F.col("src").alias("b")))
        .distinct()
    )
    und.persist()
    udeg = und.groupBy(F.col("a").alias("node")).agg(
        F.count(F.lit(1)).cast("long").alias("d")
    )
    u2 = und.select(
        F.col("a").alias("a2"), F.col("b").alias("y")
    )
    wedge = und.join(
        u2, (F.col("a") == F.col("a2")) & (F.col("y") > F.col("b"))
    ).select(F.col("a").alias("v"), F.col("b").alias("x"), "y")
    closure = und.select(
        F.col("a").alias("x"), F.col("b").alias("y"), F.lit(1).alias("hit")
    )
    tri = (
        wedge.join(closure, ["x", "y"])
        .groupBy("v")
        .agg(F.count(F.lit(1)).cast("long").alias("t"))
    )
    pern = (
        udeg.join(tri, udeg["node"] == tri["v"], "left")
        .filter(F.col("d") >= 2)
        .select(
            "d",
            F.round(
                1_000_000.0
                * 2
                * F.coalesce("t", F.lit(0))
                / (F.col("d") * (F.col("d") - 1))
            )
            .cast("long")
            .alias("c_micro"),
        )
    )
    return pern.groupBy(F.col("d").alias("degree")).agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes"),
        F.round(F.avg(F.col("c_micro").cast("double")) / 1000)
        .cast("long")
        .alias("mean_c_milli"),
    )
