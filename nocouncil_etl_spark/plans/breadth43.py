"""Breadth batch 43 (round 6): phonetic blocking, IPF raking, spectral
entropy, candidate-key audit, mutual k-NN graph, LTTB downsampling.

Six operators (reference scope: fuzzy entity blocking before linkage,
survey-style reweighting of event mixes, periodicity profiling of feeds,
primary-key discovery on unfamiliar tables, neighborhood graphs for
semantic dedup, and plot-shaped series reduction):

- ``dedup_phonetic_block`` — simplified-Soundex phonetic keys over part
  name heads; the classic record-linkage blocking primitive.
- ``agg_raking_ipf``       — iterative proportional fitting (raking) of
  the (event_type × weekday) cell counts to uniform margins, two full
  row/column rounds in exact ppm integers.
- ``ts_spectral_entropy``  — DFT power at 3/5/7/14-day periods from
  shared fixed-point cos/sin tables; Shannon entropy of the normalized
  spectrum (low = strongly periodic feed).
- ``dq_candidate_keys``    — uniqueness audit over declared candidate
  key combos (the ANALYZE step before choosing merge/dedup keys).
- ``vec_knn_graph_mutual`` — label-blocked mutual top-3 cosine neighbor
  graph (the k-NN-graph substrate of SemDeDup-style clustering).
- ``ts_lttb_downsample``   — largest-triangle downsampling with bucket-
  average anchors (the parallelizable LTTB variant).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nocouncil_etl_spark.io import load
from nocouncil_etl_spark.registry import query

# --------------------------------------------------------------------------
# 1. Phonetic blocking keys (simplified Soundex)
# --------------------------------------------------------------------------

_PHON_CLASSES = (
    ("[BFPV]", "1"),
    ("[CGJKQSXZ]", "2"),
    ("[DT]", "3"),
    ("L", "4"),
    ("[MN]", "5"),
    ("R", "6"),
    ("[AEIOUHWY]", "0"),
)
PHON_TOP = 20


def _phon_digits_sql(inner: str, duck: bool) -> str:
    """SQL expression: consonant-class digits of ``inner`` (an upper-case
    string expr), adjacent duplicates collapsed, vowel class removed.

    Shared between the Spark plan and the DuckDB oracle so the key is
    structurally identical on both engines. DuckDB's regexp_replace
    replaces only the first match unless given the 'g' flag; Spark always
    replaces all. The pairwise ``replace(dd → d)`` applied three times
    collapses any run up to length 8 (each pass halves a run; word heads
    are far shorter).
    """
    e = inner
    g = ", 'g'" if duck else ""
    for pat, rep in _PHON_CLASSES:
        e = f"regexp_replace({e}, '{pat}', '{rep}'{g})"
    for d in "0123456":
        for _ in range(3):
            e = f"replace({e}, '{d}{d}', '{d}')"
    return f"replace({e}, '0', '')"


def _phon_key_sql(word: str, duck: bool) -> str:
    up = f"upper({word})"
    digits = _phon_digits_sql(f"substring({up}, 2)", duck)
    return f"substring({up}, 1, 1) || rpad(substring({digits}, 1, 3), 3, '0')"


@query(
    "dedup_phonetic_block",
    oracle=f"""
WITH w AS (
  SELECT split_part(p_name, ' ', 1) AS word FROM part
),
keyed AS (
  SELECT {_phon_key_sql('word', True)} AS pkey, word FROM w
),
g AS (
  SELECT pkey, CAST(count(*) AS BIGINT) AS n_parts,
         CAST(count(DISTINCT word) AS BIGINT) AS n_words,
         min(word) AS exemplar
  FROM keyed GROUP BY pkey
)
SELECT rk, pkey, n_parts, n_words, exemplar FROM (
  SELECT *, CAST(row_number() OVER (ORDER BY n_words DESC, n_parts DESC,
                                    pkey) AS INT) AS rk
  FROM g
) WHERE rk <= {PHON_TOP}
""",
)
def dedup_phonetic_block(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Phonetic blocking keys — a simplified Soundex (documented variant:
    H/W join the vowel class; the key is first letter + the first three
    consonant-class digits of the REST of the word, adjacent duplicates
    collapsed, zero-padded to 4 chars). Phonetic keys are the classic
    record-linkage blocker: candidate pairs are generated within a key
    bucket only, never all-pairs (the same contract as the MinHash-LSH
    bands in ``dedup_minhash_lsh`` and the SNM window in
    ``dedup_sorted_neighborhood``). Reference scope: the crawler's
    entity-matching of council member names across documents. The whole
    key is string builtins (regexp_replace/replace/rpad) shared verbatim
    with the oracle via one SQL builder.

    Scale shape: one projection + one hash-agg; the key computation is
    whole-stage-codegen string ops, no UDF."""
    part = load(spark, sf_dir, "part")
    keyed = part.select(
        F.expr("split_part(p_name, ' ', 1)").alias("word")
    ).select(F.expr(_phon_key_sql("word", False)).alias("pkey"), "word")
    g = keyed.groupBy("pkey").agg(
        F.count("*").cast("long").alias("n_parts"),
        F.countDistinct("word").cast("long").alias("n_words"),
        F.min("word").alias("exemplar"),
    )
    return (
        g.withColumn(
            "rk",
            F.row_number()
            .over(Window.orderBy(F.desc("n_words"), F.desc("n_parts"), "pkey"))
            .cast("int"),
        )
        .filter(F.col("rk") <= PHON_TOP)
        .select("rk", "pkey", "n_parts", "n_words", "exemplar")
    )


# --------------------------------------------------------------------------
# 2. Iterative proportional fitting (raking)
# --------------------------------------------------------------------------

_DOW_SQL = "CAST((CAST(ts AS DATE) - DATE '1970-01-05') % 7 AS BIGINT)"


@query(
    "agg_raking_ipf",
    oracle=f"""
WITH cells AS (
  SELECT event_type AS et, {_DOW_SQL} AS dw,
         CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
),
tot AS (
  SELECT CAST(sum(c) AS BIGINT) AS n,
         CAST(count(DISTINCT et) AS BIGINT) AS nr,
         CAST(count(DISTINCT dw) AS BIGINT) AS nc
  FROM cells
),
t AS (
  SELECT (n * 1000000) // nr AS tr, (n * 1000000) // nc AS tc FROM tot
),
w0 AS (SELECT et, dw, c, CAST(1000000 AS BIGINT) AS w FROM cells),
r0 AS (SELECT et, CAST(sum(c * w) AS BIGINT) AS s FROM w0 GROUP BY et),
w1 AS (
  SELECT w0.et, w0.dw, w0.c, (w0.w * t.tr) // r0.s AS w
  FROM w0 JOIN r0 ON w0.et = r0.et, t
),
c1 AS (SELECT dw, CAST(sum(c * w) AS BIGINT) AS s FROM w1 GROUP BY dw),
w2 AS (
  SELECT w1.et, w1.dw, w1.c, (w1.w * t.tc) // c1.s AS w
  FROM w1 JOIN c1 ON w1.dw = c1.dw, t
),
r2 AS (SELECT et, CAST(sum(c * w) AS BIGINT) AS s FROM w2 GROUP BY et),
w3 AS (
  SELECT w2.et, w2.dw, w2.c, (w2.w * t.tr) // r2.s AS w
  FROM w2 JOIN r2 ON w2.et = r2.et, t
),
c3 AS (SELECT dw, CAST(sum(c * w) AS BIGINT) AS s FROM w3 GROUP BY dw),
w4 AS (
  SELECT w3.et, w3.dw, w3.c, (w3.w * t.tc) // c3.s AS w
  FROM w3 JOIN c3 ON w3.dw = c3.dw, t
)
SELECT et AS event_type, dw AS dow, c AS n_raw,
       CAST(w AS BIGINT) AS w_1e6,
       CAST((c * w) // 1000000 AS BIGINT) AS fitted
FROM w4
""",
)
def agg_raking_ipf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterative proportional fitting / raking (Deming & Stephan 1940):
    rescale the (event_type × weekday) contingency cells so row and
    column margins both approach UNIFORM targets — the survey-weighting
    step a curation pipeline runs to de-bias a crawl toward a declared
    source/time mix (``curation_mix_waterfill``'s statistical sibling).
    Two full row→column rounds; every weight is an exact ppm integer
    with one floor division per scaling, so Spark and the unrolled-CTE
    oracle agree bit-for-bit. Emits raw count, final ppm weight, and the
    fitted count per cell.

    Scale shape: the cell table is |types|×7 rows regardless of corpus
    size — one map-side-combined hash-agg over the scan, then every IPF
    step runs on the tiny cell table (broadcast joins against per-row /
    per-column sums)."""
    ev = load(spark, sf_dir, "events")
    cells = ev.groupBy(
        F.col("event_type").alias("et"),
        (F.datediff(F.to_date("ts"), F.lit("1970-01-05").cast("date")) % 7)
        .cast("long")
        .alias("dw"),
    ).agg(F.count("*").cast("long").alias("c"))
    tot = cells.agg(
        F.sum("c").cast("long").alias("n"),
        F.countDistinct("et").cast("long").alias("nr"),
        F.countDistinct("dw").cast("long").alias("nc"),
    ).select(
        F.expr("(n * 1000000) div nr").alias("tr"),
        F.expr("(n * 1000000) div nc").alias("tc"),
    )
    w = cells.withColumn("w", F.lit(1000000).cast("long"))
    for rnd, (axis, target) in enumerate(
        [("et", "tr"), ("dw", "tc"), ("et", "tr"), ("dw", "tc")]
    ):
        s = w.groupBy(axis).agg(F.sum(F.col("c") * F.col("w")).alias(f"s{rnd}"))
        w = (
            w.join(F.broadcast(s), axis)
            .crossJoin(F.broadcast(tot))
            .select(
                "et",
                "dw",
                "c",
                F.expr(f"(w * {target}) div s{rnd}").alias("w"),
            )
        )
    return w.select(
        F.col("et").alias("event_type"),
        F.col("dw").alias("dow"),
        F.col("c").alias("n_raw"),
        F.col("w").cast("long").alias("w_1e6"),
        F.expr("CAST((c * w) div 1000000 AS BIGINT)").alias("fitted"),
    )


# --------------------------------------------------------------------------
# 3. Spectral entropy over fixed periods
# --------------------------------------------------------------------------

SPEC_PERIODS = (3, 5, 7, 14)
# 1024-scaled cos/sin tables per (period, day-offset residue): shared literal
# constants so the DFT sums are exact BIGINT on both engines (the
# ts_goertzel_weekly fixed-point discipline, table form).
SPEC_W = tuple(
    (p, r, round(1024 * math.cos(2 * math.pi * r / p)),
     round(1024 * math.sin(2 * math.pi * r / p)))
    for p in SPEC_PERIODS
    for r in range(p)
)


@query(
    "ts_spectral_entropy",
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
w(p, r, c1024, s1024) AS (VALUES
  {', '.join(f'({p}, {r}, {c}, {s})' for p, r, c, s in SPEC_W)}
),
sums AS (
  SELECT i.event_type, w.p,
         CAST(sum(i.yc * w.c1024) AS BIGINT) AS sr,
         CAST(sum(i.yc * w.s1024) AS BIGINT) AS si,
         CAST(count(*) AS BIGINT) AS n_days
  FROM idx i JOIN w ON w.r = i.t % w.p
  GROUP BY 1, 2
),
piv AS (
  SELECT event_type, max(n_days) AS n_days,
         max(CASE WHEN p = 3 THEN sr END) AS sr3,
         max(CASE WHEN p = 3 THEN si END) AS si3,
         max(CASE WHEN p = 5 THEN sr END) AS sr5,
         max(CASE WHEN p = 5 THEN si END) AS si5,
         max(CASE WHEN p = 7 THEN sr END) AS sr7,
         max(CASE WHEN p = 7 THEN si END) AS si7,
         max(CASE WHEN p = 14 THEN sr END) AS sr14,
         max(CASE WHEN p = 14 THEN si END) AS si14
  FROM sums GROUP BY 1
),
pw AS (
  SELECT event_type, n_days,
         CAST(sr3 AS DOUBLE) * sr3 + CAST(si3 AS DOUBLE) * si3 AS p3,
         CAST(sr5 AS DOUBLE) * sr5 + CAST(si5 AS DOUBLE) * si5 AS p5,
         CAST(sr7 AS DOUBLE) * sr7 + CAST(si7 AS DOUBLE) * si7 AS p7,
         CAST(sr14 AS DOUBLE) * sr14 + CAST(si14 AS DOUBLE) * si14 AS p14
  FROM piv
),
tt AS (
  SELECT *, ((p3 + p5) + p7) + p14 AS tot FROM pw
)
SELECT event_type, n_days,
       CAST(round(1000000 * p3 / tot) AS BIGINT) AS p3_1e6,
       CAST(round(1000000 * p5 / tot) AS BIGINT) AS p5_1e6,
       CAST(round(1000000 * p7 / tot) AS BIGINT) AS p7_1e6,
       CAST(round(1000000 * p14 / tot) AS BIGINT) AS p14_1e6,
       CAST(CASE WHEN p3 = 0 THEN 0 ELSE
              CAST(round(-(p3 / tot) * ln(p3 / tot) * 1000000) AS BIGINT)
            END
          + CASE WHEN p5 = 0 THEN 0 ELSE
              CAST(round(-(p5 / tot) * ln(p5 / tot) * 1000000) AS BIGINT)
            END
          + CASE WHEN p7 = 0 THEN 0 ELSE
              CAST(round(-(p7 / tot) * ln(p7 / tot) * 1000000) AS BIGINT)
            END
          + CASE WHEN p14 = 0 THEN 0 ELSE
              CAST(round(-(p14 / tot) * ln(p14 / tot) * 1000000) AS BIGINT)
            END AS BIGINT) AS entropy_micro
FROM tt
""",
)
def ts_spectral_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spectral entropy of each feed's daily-revenue series over the
    3/5/7/14-day bins: DFT power per period from SHARED 1024-scaled
    cos/sin literal tables (so the DFT sums are exact BIGINTs — the
    ts_goertzel_weekly fixed-point discipline in table form, fully
    parallel instead of a recurrence). Powers square the exact sums in
    DOUBLE (sr² overflows int64 at scale; IEEE ops on identical inputs
    are engine-identical), the 4-term total is summed in one FIXED
    expression order after a pivot (no aggregation-order sensitivity),
    and each −p·ln p entropy term quantizes once to micro-nats (the
    agg_entropy_diversity discipline). Low entropy = power concentrated
    in one period = a strongly cadenced feed; ln 4 ≈ 1.386 = white.

    Scale shape: daily collapse map-side; the weight join explodes each
    daily row into 4 period rows against a broadcast 29-row table; one
    keyed hash-agg per (type, period); everything after runs on
    |types|×4 rows."""
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
    w = spark.createDataFrame(
        list(SPEC_W), "p LONG, r LONG, c1024 LONG, s1024 LONG"
    )
    sums = (
        idx.join(F.broadcast(w), w.r == idx.t % w.p)
        .groupBy("event_type", "p")
        .agg(
            F.sum(F.col("yc") * F.col("c1024")).cast("long").alias("sr"),
            F.sum(F.col("yc") * F.col("s1024")).cast("long").alias("si"),
            F.count("*").cast("long").alias("n_days"),
        )
    )
    piv = sums.groupBy("event_type").agg(
        F.max("n_days").alias("n_days"),
        *[
            F.max(F.when(F.col("p") == p, F.col(c))).alias(f"{c}{p}")
            for p in SPEC_PERIODS
            for c in ("sr", "si")
        ],
    )
    pw = piv.select(
        "event_type",
        "n_days",
        *[
            (
                F.col(f"sr{p}").cast("double") * F.col(f"sr{p}")
                + F.col(f"si{p}").cast("double") * F.col(f"si{p}")
            ).alias(f"p{p}")
            for p in SPEC_PERIODS
        ],
    )
    tt = pw.withColumn("tot", F.expr("((p3 + p5) + p7) + p14"))

    def h_term(p: int):
        pr = F.col(f"p{p}") / F.col("tot")
        return F.when(F.col(f"p{p}") == 0, F.lit(0).cast("long")).otherwise(
            F.round(-pr * F.log(pr) * 1000000, 0).cast("long")
        )

    return tt.select(
        "event_type",
        "n_days",
        *[
            F.round(1000000 * F.col(f"p{p}") / F.col("tot"), 0)
            .cast("long")
            .alias(f"p{p}_1e6")
            for p in SPEC_PERIODS
        ],
        sum([h_term(p) for p in SPEC_PERIODS[1:]], h_term(SPEC_PERIODS[0]))
        .cast("long")
        .alias("entropy_micro"),
    )


# --------------------------------------------------------------------------
# 4. Candidate-key uniqueness audit
# --------------------------------------------------------------------------

# (label, table, group-by column list) — the declared key hypotheses.
_CK_COMBOS = (
    ("orders.o_orderkey", "orders", ("o_orderkey",)),
    ("orders.o_custkey", "orders", ("o_custkey",)),
    ("orders.o_custkey+o_orderdate", "orders", ("o_custkey", "o_orderdate")),
    ("lineitem.l_orderkey+l_linenumber", "lineitem",
     ("l_orderkey", "l_linenumber")),
    ("events.event_id", "events", ("event_id",)),
    ("events.user_id+ts", "events", ("user_id", "ts")),
    ("documents.doc_id", "documents", ("doc_id",)),
)


def _ck_oracle() -> str:
    parts = []
    for label, table, cols in _CK_COMBOS:
        gb = ", ".join(cols)
        parts.append(
            f"""SELECT '{label}' AS ckey, CAST(sum(c) AS BIGINT) AS n_rows,
       CAST(count(*) AS BIGINT) AS n_keys,
       CAST(sum(c) - count(*) AS BIGINT) AS dup_rows,
       CAST(max(c) AS BIGINT) AS max_per_key,
       CAST(CASE WHEN max(c) = 1 THEN 1 ELSE 0 END AS BIGINT) AS is_unique
FROM (SELECT count(*) AS c FROM {table} GROUP BY {gb})"""
        )
    return "\nUNION ALL\n".join(parts)


@query("dq_candidate_keys", oracle=_ck_oracle())
def dq_candidate_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate-key uniqueness audit: for each declared key hypothesis,
    report row count, distinct-key count, duplicate-row count, the
    heaviest key's multiplicity, and an is_unique verdict — the
    discovery step before choosing merge keys (``merge_upsert_cdc``),
    dedup keys (``dedup_keep_latest``) or join keys
    (``dq_referential_integrity``'s sibling: that checks FKs point
    somewhere, this checks PKs are actually keys).

    Scale shape: one map-side-combined hash-agg per hypothesis; the
    audits are independent scans that run in parallel and each reduces
    to a single row before the union."""
    out = None
    for label, table, cols in _CK_COMBOS:
        t = load(spark, sf_dir, table)
        per = t.groupBy(*cols).agg(F.count("*").cast("long").alias("c"))
        row = per.agg(
            F.sum("c").cast("long").alias("n_rows"),
            F.count("*").cast("long").alias("n_keys"),
            (F.sum("c") - F.count("*")).cast("long").alias("dup_rows"),
            F.max("c").cast("long").alias("max_per_key"),
            F.when(F.max("c") == 1, F.lit(1))
            .otherwise(F.lit(0))
            .cast("long")
            .alias("is_unique"),
        ).select(F.lit(label).alias("ckey"), "*")
        out = row if out is None else out.unionByName(row)
    return out


# --------------------------------------------------------------------------
# 5. Mutual k-NN graph (label-blocked)
# --------------------------------------------------------------------------

KNNG_K = 3
# Element budget for one tile of the within-block score matrix: the kernel
# chunks its query rows so dot/denominator intermediates hold at most this
# many int64s (2M ≈ 16 MB each) regardless of block cardinality — the
# applyInPandas task's quadratic intermediate becomes tile_rows × n, linear
# in n. Tests shrink this to force multi-tile execution on small blocks.
KNNG_TILE_ELEMS = 1 << 21
# Row cap for EXACT within-block scoring (round-10 verdict #4): tiling made
# the kernel's MEMORY linear, but its WORK is still O(n²) per block — at
# 100× data with the fixed label arity that is 10,000× compute. Blocks over
# this cap route through celling.subcell_over_cap (sign-LSH sub-cells sized
# to ~cap/2 expected rows), bounding per-block work at ~cap² regardless of
# corpus growth, at the documented SimHash recall cost. Every test/bench
# scale (sf0.01: 59-row max block, sf0.1: 218, sf1: ~2.2k) is under the cap,
# so oracle results stay exact; tests shrink the cap to force the celled
# path.
KNNG_BLOCK_CAP = 4096
_Q_SQL = (
    "list_transform(embedding,"
    " x -> CAST(round(1000 * CAST(x AS DOUBLE)) AS BIGINT))"
)


@query(
    "vec_knn_graph_mutual",
    oracle=f"""
WITH comp AS MATERIALIZED (
  SELECT vec_id, label, CAST(i AS BIGINT) AS i, q[CAST(i AS INTEGER)] AS q
  FROM (SELECT vec_id, label, {_Q_SQL} AS q,
               unnest(range(1, len(embedding) + 1)) AS i
        FROM embeddings)
),
n2 AS MATERIALIZED (
  SELECT vec_id, CAST(sum(q * q) AS BIGINT) AS n2 FROM comp GROUP BY 1
),
dots AS (
  SELECT a.vec_id AS u, b.vec_id AS v,
         CAST(sum(a.q * b.q) AS BIGINT) AS dot
  FROM comp a JOIN comp b ON a.label = b.label AND a.i = b.i
                         AND a.vec_id <> b.vec_id
  GROUP BY 1, 2
),
scored AS MATERIALIZED (
  SELECT d.u, d.v,
         CASE WHEN d.dot >= 0
              THEN (d.dot * d.dot) // ((na.n2 * nb.n2) // 1000000)
              ELSE -((d.dot * d.dot) // ((na.n2 * nb.n2) // 1000000)) END
           AS score_1e6
  FROM dots d
  JOIN n2 na ON na.vec_id = d.u JOIN n2 nb ON nb.vec_id = d.v
  WHERE (na.n2 * nb.n2) // 1000000 > 0
),
topk AS MATERIALIZED (
  SELECT u, v, score_1e6 FROM (
    SELECT *, row_number() OVER (PARTITION BY u
                                 ORDER BY score_1e6 DESC, v) AS rk
    FROM scored
  ) WHERE rk <= {KNNG_K}
)
SELECT a.u, a.v, CAST(a.score_1e6 AS BIGINT) AS score_1e6
FROM topk a JOIN topk b ON a.u = b.v AND a.v = b.u
WHERE a.u < a.v
""",
)
def vec_knn_graph_mutual(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual k-NN graph over the embedding corpus: each vector ranks its
    top-{KNNG_K} cosine neighbors WITHIN its label block (the coarse-cell
    candidate generation of the IVF family — never all-pairs across the
    corpus), and an edge survives only if BOTH endpoints chose each
    other. Mutual k-NN graphs are the substrate of SemDeDup-style
    cluster pruning and of graph-based ANN (HNSW's base layer). Ranking
    uses the signed-squared-cosine integer key sign(dot)·(dot²//(‖a‖²
    ‖b‖²//1e6)) — monotone in cosine, exact BIGINT on both engines (no
    sqrt), ties broken by neighbor id.

    Scale shape: candidates come from an equi-join on the block key
    (swap in the trained-IVF cells of ``vec_knn_index_kmeans`` or LSH
    bands for an unlabeled corpus); the within-block scoring is one
    int64 numpy matmul per block (applyInPandas) emitting only each
    vector's top-{KNNG_K} — exact-integer-identical to the pairwise
    zip_with/aggregate expression it replaces, which evaluated
    interpreted per pair and went 115x wall at 10x data (360 s at sf1
    -> ~3 s). The kernel TILES its query rows (KNNG_TILE_ELEMS budget):
    each tile scores tile_rows x n and keeps only its rows' top-{KNNG_K},
    so per-task memory is the block's row data (n x d, linear) plus one
    bounded tile — never the n^2 score matrix. A block therefore only
    needs its VECTORS to fit an executor, the same linear contract as
    the Arrow-batched exact path.

    WORK is capped too (round-10 verdict #4): a block over
    KNNG_BLOCK_CAP rows is split into sign-LSH sub-cells
    (operators/celling.subcell_over_cap) and the kernel scores per
    sub-cell — candidates become cell-mates, exactly the graceful
    degradation real corpora use (bounded IVF cells / LSH bands for
    candidate generation). Under the cap the cell id is the constant 0
    and results are EXACT — every test/bench scale is under it, so the
    DuckDB oracle stays valid; over it, recall follows the documented
    SimHash curve (identical vectors always share a cell)."""
    import numpy as np
    import pandas as pd

    e = load(spark, sf_dir, "embeddings")
    q = e.select(
        "vec_id",
        "label",
        F.expr(
            "transform(embedding,"
            " x -> CAST(round(1000 * CAST(x AS DOUBLE)) AS BIGINT))"
        ).alias("q"),
    )

    def block_topk(pdf: pd.DataFrame) -> pd.DataFrame:
        qm = np.vstack(pdf["q"].to_numpy()).astype(np.int64)
        ids = pdf["vec_id"].to_numpy().astype(np.int64)
        # |x| <= 1000, d = 32: dot <= 3.2e7, dot^2 and n2*n2 <= ~1e15 —
        # every intermediate stays exact in int64
        n2 = (qm * qm).sum(axis=1)
        n = len(ids)
        # Tile the query rows: each tile's dot/den matrices are
        # tile_rows x n elements (<= KNNG_TILE_ELEMS), never n x n.
        tile = max(1, KNNG_TILE_ELEMS // max(n, 1))
        out_u, out_v, out_s = [], [], []
        for lo in range(0, n, tile):
            hi = min(lo + tile, n)
            dot = qm[lo:hi] @ qm.T
            den = np.outer(n2[lo:hi], n2) // 1_000_000
            for ti in range(hi - lo):
                i = lo + ti
                mask = den[ti] > 0
                mask[i] = False
                vs = np.nonzero(mask)[0]
                if len(vs) == 0:
                    continue
                d = dot[ti, vs]
                sc = d * d // den[ti, vs]
                sc = np.where(d >= 0, sc, -sc)
                pick = np.lexsort((ids[vs], -sc))[:KNNG_K]
                out_u.extend([ids[i]] * len(pick))
                out_v.extend(ids[vs[pick]])
                out_s.extend(sc[pick])
        return pd.DataFrame({"u": out_u, "v": out_v, "score_1e6": out_s})

    from nocouncil_etl_spark.operators.celling import subcell_over_cap

    celled = subcell_over_cap(q, ["label"], "q", KNNG_BLOCK_CAP)
    topk = celled.groupBy("label", "_cell").applyInPandas(
        block_topk, schema="u long, v long, score_1e6 long"
    )
    rev = topk.select(F.col("u").alias("v"), F.col("v").alias("u"))
    return (
        topk.join(rev, ["u", "v"])
        .filter(F.col("u") < F.col("v"))
        .select("u", "v", F.col("score_1e6").cast("long").alias("score_1e6"))
    )


# --------------------------------------------------------------------------
# 6. LTTB downsampling with bucket-average anchors
# --------------------------------------------------------------------------

LTTB_B = 8


@query(
    "ts_lttb_downsample",
    oracle=f"""
WITH daily AS (
  SELECT CAST(CAST(ts AS DATE) - (SELECT min(CAST(ts AS DATE)) FROM events)
              AS BIGINT) AS t,
         CAST(sum(CAST(round(value) AS BIGINT)) AS BIGINT) AS y
  FROM events GROUP BY 1
),
meta AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         min(t) AS t_first, max(t) AS t_last
  FROM daily
),
fl AS (
  SELECT m.n, m.t_first, m.t_last,
         (SELECT y FROM daily WHERE t = m.t_first) AS y_first,
         (SELECT y FROM daily WHERE t = m.t_last) AS y_last
  FROM meta m
),
interior AS (
  SELECT t, y,
         ((CAST(row_number() OVER (ORDER BY t) AS BIGINT) - 1) * {LTTB_B})
           // (SELECT n - 2 FROM fl) AS b
  FROM daily
  WHERE t > (SELECT t_first FROM fl) AND t < (SELECT t_last FROM fl)
),
bavg AS (
  SELECT b, (1000 * CAST(sum(t) AS BIGINT)) // count(*) AS at,
         (1000 * CAST(sum(y) AS BIGINT)) // count(*) AS ay
  FROM interior GROUP BY b
),
anch AS (
  SELECT i.t, i.y, i.b,
         CASE WHEN i.b = 0 THEN 1000 * (SELECT t_first FROM fl)
              ELSE pb.at END AS xp,
         CASE WHEN i.b = 0 THEN 1000 * (SELECT y_first FROM fl)
              ELSE pb.ay END AS yp,
         CASE WHEN i.b = {LTTB_B - 1} THEN 1000 * (SELECT t_last FROM fl)
              ELSE nb.at END AS xn,
         CASE WHEN i.b = {LTTB_B - 1} THEN 1000 * (SELECT y_last FROM fl)
              ELSE nb.ay END AS yn
  FROM interior i
  LEFT JOIN bavg pb ON pb.b = i.b - 1
  LEFT JOIN bavg nb ON nb.b = i.b + 1
),
area AS (
  SELECT t, y, b,
         abs((xp - xn) * (1000 * y - yp) - (xp - 1000 * t) * (yn - yp))
           AS a2
  FROM anch
),
pick AS (
  SELECT t, y FROM (
    SELECT t, y, row_number() OVER (PARTITION BY b
                                    ORDER BY a2 DESC, t) AS rk
    FROM area
  ) WHERE rk = 1
)
SELECT CAST(t AS BIGINT) AS off, CAST(y AS BIGINT) AS y FROM pick
UNION ALL
SELECT t_first, y_first FROM fl
UNION ALL
SELECT t_last, y_last FROM fl
""",
)
def ts_lttb_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Largest-triangle downsampling (Steinarsson 2013's LTTB) with
    BUCKET-AVERAGE anchors: first and last points are always kept,
    interior points split into {LTTB_B} even buckets, and each bucket
    keeps the point with the largest triangle area against the PREVIOUS
    and NEXT bucket averages. Classic LTTB anchors on the previously
    SELECTED point, which makes it inherently sequential; the
    bucket-average variant (the paper's "largest-triangle-three-buckets
    dynamic" simplification) is embarrassingly parallel — every bucket's
    argmax is independent — at near-identical visual fidelity. All
    coordinates are milli-scaled integers (bucket averages take one
    floor division), so areas are exact BIGINTs.

    Scale shape: per-bucket argmax is one bounded window over bucket-
    partitioned data; the bucket-average table is {LTTB_B} rows; at
    100 TB the same shape runs per series key after a keyed daily
    collapse."""
    ev = load(spark, sf_dir, "events")
    d0 = ev.agg(F.min(F.to_date("ts")).alias("start"))
    daily = (
        ev.crossJoin(F.broadcast(d0))
        .groupBy(F.datediff(F.to_date("ts"), F.col("start")).cast("long").alias("t"))
        .agg(F.sum(F.round("value").cast("long")).cast("long").alias("y"))
    )
    fl = daily.agg(
        F.count("*").cast("long").alias("n"),
        F.min("t").alias("t_first"),
        F.max("t").alias("t_last"),
        F.min_by("y", "t").cast("long").alias("y_first"),
        F.max_by("y", "t").cast("long").alias("y_last"),
    )
    interior = (
        daily.crossJoin(F.broadcast(fl))
        .filter((F.col("t") > F.col("t_first")) & (F.col("t") < F.col("t_last")))
        .withColumn(
            "b",
            F.expr(
                f"((CAST(row_number() OVER (ORDER BY t) AS BIGINT) - 1)"
                f" * {LTTB_B}) div (n - 2)"
            ),
        )
    )
    bavg = interior.groupBy("b").agg(
        F.expr("(1000 * CAST(sum(t) AS BIGINT)) div count(*)").alias("at"),
        F.expr("(1000 * CAST(sum(y) AS BIGINT)) div count(*)").alias("ay"),
    )
    pb = bavg.select((F.col("b") + 1).alias("b"), F.col("at").alias("p_at"),
                     F.col("ay").alias("p_ay"))
    nb = bavg.select((F.col("b") - 1).alias("b"), F.col("at").alias("n_at"),
                     F.col("ay").alias("n_ay"))
    anch = (
        interior.join(F.broadcast(pb), "b", "left")
        .join(F.broadcast(nb), "b", "left")
        .select(
            "t",
            "y",
            "b",
            F.when(F.col("b") == 0, 1000 * F.col("t_first"))
            .otherwise(F.col("p_at"))
            .alias("xp"),
            F.when(F.col("b") == 0, 1000 * F.col("y_first"))
            .otherwise(F.col("p_ay"))
            .alias("yp"),
            F.when(F.col("b") == LTTB_B - 1, 1000 * F.col("t_last"))
            .otherwise(F.col("n_at"))
            .alias("xn"),
            F.when(F.col("b") == LTTB_B - 1, 1000 * F.col("y_last"))
            .otherwise(F.col("n_ay"))
            .alias("yn"),
        )
    )
    area = anch.select(
        "t",
        "y",
        "b",
        F.abs(
            (F.col("xp") - F.col("xn")) * (1000 * F.col("y") - F.col("yp"))
            - (F.col("xp") - 1000 * F.col("t")) * (F.col("yn") - F.col("yp"))
        ).alias("a2"),
    )
    pick = (
        area.withColumn(
            "rk",
            F.row_number().over(Window.partitionBy("b").orderBy(F.desc("a2"), "t")),
        )
        .filter(F.col("rk") == 1)
        .select(F.col("t").cast("long").alias("off"), F.col("y").cast("long").alias("y"))
    )
    ends = fl.select(
        F.col("t_first").alias("off"), F.col("y_first").alias("y")
    ).unionByName(fl.select(F.col("t_last").alias("off"), F.col("y_last").alias("y")))
    return pick.unionByName(ends)
