"""Breadth batch 42 (round 6): truncated hitting times, anchored VWAP,
tokenizer fertility, deletion-vector reads, Feistel id scrambling,
robust shape statistics.

Six operators (reference scope: absorbing-walk distance on the link
graph, the execution-benchmark price average, per-language tokenizer
efficiency, the modern lakehouse delete encoding, format-preserving id
pseudonymization, and quantile-based distribution shape):

- ``graph_hitting_time_truncated`` — expected steps to the absorbing
  seed set by {HT_ITERS} integer value-iteration rounds.
- ``window_anchored_vwap``         — month-anchored cumulative
  volume-weighted average price over shipped lineitems.
- ``curation_tokenizer_fertility`` — words vs fixed-width subword
  chunks per language: fertility and bytes/token.
- ``io_deletion_vector_read``      — per-file deletion-vector sizes and
  live-row reconstruction (the MOR delete encoding).
- ``fn_feistel_id_scramble``       — 4-round Feistel network over
  32-bit ids: bijective format-preserving pseudonymization.
- ``agg_robust_shape_stats``       — Bowley skewness and Moors kurtosis
  from exact order statistics per event type.

Reference parity: north-star extension — no reference analogue
(the reference has no analytics layer); these extend the same tables with the audits a
lake-scale engine is asked for.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nocouncil_etl_spark.io import fan_out, load
from nocouncil_etl_spark.plans.graph_plans import _EDGES_SQL, _graph
from nocouncil_etl_spark.registry import query

HT_ITERS = 6
HT_SCALE = 1000  # hitting times in milli-steps
HT_ABS_MOD = 101  # absorbing set: node % 101 == 0
DV_FILE_ROWS = 1000
DV_DELETE_MOD = 97
FERT_CHUNK = 4  # fixed-width subword chunk length
FEISTEL_KEYS = (40503, 52711, 14867, 60013)
FEISTEL_MULT = 2654435761  # Knuth's multiplicative hash constant


# --------------------------------------------------------------------------
# 1. Truncated hitting time
# --------------------------------------------------------------------------


def _ht_cte_body() -> str:
    cte = [f"WITH {_EDGES_SQL},"]
    cte.append(f"""
absorb AS (SELECT node FROM nodes WHERE node % {HT_ABS_MOD} = 0),
h0 AS MATERIALIZED (SELECT node, CAST(0 AS BIGINT) AS h FROM nodes)""")
    for k in range(HT_ITERS):
        cte.append(f""",
h{k + 1} AS MATERIALIZED (
  SELECT n.node,
         CASE WHEN n.node % {HT_ABS_MOD} = 0 THEN CAST(0 AS BIGINT)
              ELSE {HT_SCALE} + coalesce(s.acc // s.d, {HT_ITERS * HT_SCALE})
         END AS h
  FROM nodes n
  LEFT JOIN (
    SELECT e.src, CAST(count(*) AS BIGINT) AS d, sum(p.h) AS acc
    FROM edges0 e JOIN h{k} p ON p.node = e.dst GROUP BY e.src
  ) s ON s.src = n.node
)""")
    return "".join(cte)


def _ht_oracle() -> str:
    return (
        _ht_cte_body()
        + f"""
SELECT CAST(h AS BIGINT) AS h_milli, CAST(count(*) AS BIGINT) AS n_nodes
FROM h{HT_ITERS} GROUP BY h"""
    )


@query("graph_hitting_time_truncated", oracle=_ht_oracle())
def graph_hitting_time_truncated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expected hitting time to the absorbing seed set (node %
    {HT_ABS_MOD} = 0) on the directed link graph, by {HT_ITERS} rounds
    of value iteration on h ← 1 + mean(h(out-neighbors)) with absorbing
    nodes pinned at 0 — the Markov-chain distance behind \"how many
    clicks to a hub\". Times are integer milli-steps; the out-neighbor
    mean uses truncate-toward-zero division (both engines' `div`);
    dangling or horizon-exceeded mass is pinned at the {HT_ITERS}-step
    cap (truncated hitting time — the unbounded expectation may not
    exist). Emits the hitting-time histogram. Complements
    graph_bfs_layers (shortest hops) with EXPECTED random-walk steps.

    Scale shape: per round one src-keyed equi-join + hash agg (the
    pagerank matvec shape) with localCheckpoint-bounded lineage; the
    histogram is value-cardinality."""
    nodes, edges, _n = _graph(spark, sf_dir)
    edges0 = edges.select("src", "dst")
    edges0.persist()
    cap = HT_ITERS * HT_SCALE
    h = nodes.select(
        "node", F.lit(0).cast("long").alias("h")
    ).localCheckpoint(eager=True)
    for _ in range(HT_ITERS):
        s = (
            edges0.join(
                h.select(F.col("node").alias("dst"), F.col("h").alias("hd")),
                "dst",
            )
            .groupBy(F.col("src").alias("node"))
            .agg(
                F.count(F.lit(1)).cast("long").alias("d"),
                F.sum("hd").alias("acc"),
            )
        )
        h = (
            nodes.join(s, "node", "left")
            .select(
                "node",
                F.when(F.col("node") % HT_ABS_MOD == 0, F.lit(0).cast("long"))
                .otherwise(
                    HT_SCALE
                    + F.coalesce(
                        F.expr("acc div d"), F.lit(cap)
                    ).cast("long")
                )
                .alias("h"),
            )
            .localCheckpoint(eager=True)
        )
    return h.groupBy(F.col("h").alias("h_milli")).agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes")
    )


# --------------------------------------------------------------------------
# 2. Anchored VWAP
# --------------------------------------------------------------------------


@query(
    "window_anchored_vwap",
    oracle="""
WITH d AS (
  SELECT strftime(l_shipdate, '%Y-%m') AS mon, CAST(l_shipdate AS DATE) AS day,
         sum(CAST(round(100 * l_extendedprice) AS BIGINT)
             * CAST(round(1000 * l_quantity) AS BIGINT)) AS pv,
         sum(CAST(round(1000 * l_quantity) AS BIGINT)) AS v
  FROM lineitem GROUP BY 1, 2
),
c AS (
  SELECT mon, day,
         sum(pv) OVER w AS cpv, sum(v) OVER w AS cv
  FROM d WINDOW w AS (PARTITION BY mon ORDER BY day
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT mon, CAST(day AS VARCHAR) AS day,
       CAST(round(CAST(cpv AS DOUBLE) / cv) AS BIGINT) AS vwap_cents
FROM c
""",
)
def window_anchored_vwap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-anchored VWAP of shipped lineitems: within each calendar
    month the cumulative Σ(price·quantity)/Σquantity re-anchors — the
    execution benchmark traders compare fills against, and the
    volume-weighted sibling of ts_twap (time-weighted). Price and
    quantity live on exact integer grids (cents, milli-units), so the
    running numerator/denominator are BIGINT sums and only the final
    per-day ratio divides.

    Scale shape: one hash agg to the daily grid, one month-partitioned
    cumulative window — month keys bound each partition; no global
    sort."""
    d = (
        load(spark, sf_dir, "lineitem")
        .groupBy(
            F.date_format("l_shipdate", "yyyy-MM").alias("mon"),
            F.col("l_shipdate").cast("date").alias("day"),
        )
        .agg(
            F.sum(
                F.round(100 * F.col("l_extendedprice")).cast("long")
                * F.round(1000 * F.col("l_quantity")).cast("long")
            ).alias("pv"),
            F.sum(F.round(1000 * F.col("l_quantity")).cast("long")).alias("v"),
        )
    )
    w = (
        Window.partitionBy("mon")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return d.select(
        "mon",
        F.col("day").cast("string").alias("day"),
        F.round(F.sum("pv").over(w).cast("double") / F.sum("v").over(w))
        .cast("long")
        .alias("vwap_cents"),
    )


# --------------------------------------------------------------------------
# 3. Tokenizer fertility
# --------------------------------------------------------------------------


@query(
    "curation_tokenizer_fertility",
    oracle=f"""
WITH w AS (
  SELECT lang, n_chars, unnest(string_split(text, ' ')) AS word
  FROM documents
),
per AS (
  SELECT lang,
         CAST(count(*) AS BIGINT) AS words,
         CAST(sum((length(word) + {FERT_CHUNK - 1}) // {FERT_CHUNK})
              AS BIGINT) AS subtokens
  FROM w GROUP BY lang
),
chars AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(n_chars) AS BIGINT) AS chars
  FROM documents GROUP BY lang
)
SELECT p.lang, c.n_docs, p.words, p.subtokens,
       CAST(round(1000.0 * p.subtokens / p.words) AS BIGINT)
         AS fertility_milli,
       CAST(round(1000.0 * c.chars / p.subtokens) AS BIGINT)
         AS chars_per_token_milli
FROM per p JOIN chars c ON c.lang = p.lang
""",
)
def curation_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility per language: words (whitespace) vs subword
    tokens under a fixed-width {FERT_CHUNK}-char chunking proxy —
    fertility = subtokens/word and chars/token, THE two numbers a
    training-data pipeline reports per language before committing to a
    tokenizer (high fertility = that language pays more sequence length
    per word; chars/token tracks byte efficiency). The proxy makes the
    metric exact-integer and model-free; swap the chunker for a real BPE
    via the tokenize_bpe_top_merges machinery in production.

    Scale shape: one tokenization pass + two language-cardinality hash
    aggs; nothing retains per-doc state."""
    docs = fan_out(load(spark, sf_dir, "documents"))
    w = docs.select("lang", F.explode(F.split("text", " ")).alias("word"))
    per = w.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("words"),
        F.sum(
            F.floor((F.length("word") + (FERT_CHUNK - 1)) / FERT_CHUNK)
        )
        .cast("long")
        .alias("subtokens"),
    )
    chars = docs.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("chars"),
    )
    return per.join(chars, "lang").select(
        "lang",
        "n_docs",
        "words",
        "subtokens",
        F.round(1000.0 * F.col("subtokens") / F.col("words"))
        .cast("long")
        .alias("fertility_milli"),
        F.round(1000.0 * F.col("chars") / F.col("subtokens"))
        .cast("long")
        .alias("chars_per_token_milli"),
    )


# --------------------------------------------------------------------------
# 4. Deletion-vector read
# --------------------------------------------------------------------------


@query(
    "io_deletion_vector_read",
    oracle=f"""
WITH base AS (
  SELECT o_orderkey // {DV_FILE_ROWS} AS file_id,
         o_orderkey % {DV_FILE_ROWS} AS pos,
         o_orderkey % {DV_DELETE_MOD} = 0 AS deleted
  FROM orders
),
perfile AS (
  SELECT file_id,
         CAST(count(*) AS BIGINT) AS n_rows,
         CAST(sum(CASE WHEN deleted THEN 1 ELSE 0 END) AS BIGINT) AS dv_size,
         CAST(min(CASE WHEN deleted THEN pos END) AS BIGINT)
           AS first_deleted_pos
  FROM base GROUP BY file_id
)
SELECT file_id, n_rows, dv_size,
       n_rows - dv_size AS n_live,
       first_deleted_pos
FROM perfile
""",
)
def io_deletion_vector_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deletion-vector read path (the Delta/Iceberg v2 MOR delete
    encoding): each synthetic {DV_FILE_ROWS}-row file carries a vector
    of deleted ROW POSITIONS (not keys — position-based DVs are what
    make the merge a cheap positional anti-join instead of a key
    shuffle); the reader reconstructs live counts as n_rows − |DV|.
    Emits per-file row count, DV cardinality, live rows, and the first
    deleted position (the skip-scan entry point). Completes the
    io_cow_vs_mor_cost decision operator with the MOR read mechanics.

    Scale shape: one hash agg keyed by file — the DV table is
    deleted-rows-sized and never joins the payload."""
    base = load(spark, sf_dir, "orders").select(
        F.floor(F.col("o_orderkey") / DV_FILE_ROWS).cast("long").alias("file_id"),
        (F.col("o_orderkey") % DV_FILE_ROWS).alias("pos"),
        (F.col("o_orderkey") % DV_DELETE_MOD == 0).alias("deleted"),
    )
    return base.groupBy("file_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum(F.when(F.col("deleted"), 1).otherwise(0))
        .cast("long")
        .alias("dv_size"),
        (
            F.count(F.lit(1))
            - F.sum(F.when(F.col("deleted"), 1).otherwise(0))
        )
        .cast("long")
        .alias("n_live"),
        F.min(F.when(F.col("deleted"), F.col("pos")))
        .cast("long")
        .alias("first_deleted_pos"),
    ).select(
        "file_id", "n_rows", "dv_size", "n_live", "first_deleted_pos"
    )


# --------------------------------------------------------------------------
# 5. Feistel id scrambling
# --------------------------------------------------------------------------


def _feistel_sql() -> str:
    l, r = "(id // 65536)", "(id % 65536)"
    for k in FEISTEL_KEYS:
        f = f"(({r} * {FEISTEL_MULT} + {k}) % 65536)"
        l, r = r, f"xor({l}, {f})"
    return f"({l} * 65536 + {r})"


@query(
    "fn_feistel_id_scramble",
    oracle=f"""
WITH ids AS (SELECT o_orderkey % 4294967296 AS id FROM orders),
scr AS (SELECT id, {_feistel_sql()} AS scrambled FROM ids)
SELECT CAST(count(*) AS BIGINT) AS n,
       CAST(count(DISTINCT id) AS BIGINT) AS n_distinct_in,
       CAST(count(DISTINCT scrambled) AS BIGINT) AS n_distinct_out,
       CAST(min(scrambled) AS BIGINT) AS min_scrambled,
       CAST(max(scrambled) AS BIGINT) AS max_scrambled,
       CAST(sum(scrambled) AS BIGINT) AS checksum
FROM scr
""",
)
def fn_feistel_id_scramble(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Format-preserving id pseudonymization via a 4-round Feistel
    network over 32-bit ids (16-bit halves, multiplicative round
    function r·{FEISTEL_MULT} + k mod 2¹⁶, XOR mix): a PROVABLE
    bijection on [0, 2³²) — unlike hashing (privacy_column_masking),
    scrambled ids can never collide, so referential integrity survives
    pseudonymization and the mapping inverts given the keys. Emits
    distinct-in vs distinct-out (equal ⟺ injective on the data),
    range, and a checksum.

    Scale shape: pure narrow column arithmetic inside whole-stage
    codegen + one aggregate — zero shuffles beyond the final rollup."""
    ids = load(spark, sf_dir, "orders").select(
        (F.col("o_orderkey") % 4294967296).alias("id")
    )
    l = F.floor(F.col("id") / 65536).cast("long")
    r = (F.col("id") % 65536).cast("long")
    for k in FEISTEL_KEYS:
        f = (r * FEISTEL_MULT + k) % 65536
        l, r = r, l.bitwiseXOR(f)
    scr = ids.select((l * 65536 + r).alias("scrambled"), "id")
    return scr.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.countDistinct("id").cast("long").alias("n_distinct_in"),
        F.countDistinct("scrambled").cast("long").alias("n_distinct_out"),
        F.min("scrambled").cast("long").alias("min_scrambled"),
        F.max("scrambled").cast("long").alias("max_scrambled"),
        F.sum("scrambled").cast("long").alias("checksum"),
    )


# --------------------------------------------------------------------------
# 6. Robust shape statistics
# --------------------------------------------------------------------------


@query(
    "agg_robust_shape_stats",
    oracle="""
WITH v AS (
  SELECT event_type, CAST(round(100 * value) AS BIGINT) AS x
  FROM events WHERE value IS NOT NULL
),
r AS (
  SELECT event_type, x,
         row_number() OVER (PARTITION BY event_type ORDER BY x) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM v
),
oct AS (
  SELECT event_type, max(n) AS n,
         max(CASE WHEN rn = greatest(1, CAST(ceil(n * 1 / 8.0) AS BIGINT))
                  THEN x END) AS e1,
         max(CASE WHEN rn = greatest(1, CAST(ceil(n * 2 / 8.0) AS BIGINT))
                  THEN x END) AS e2,
         max(CASE WHEN rn = greatest(1, CAST(ceil(n * 3 / 8.0) AS BIGINT))
                  THEN x END) AS e3,
         max(CASE WHEN rn = greatest(1, CAST(ceil(n * 4 / 8.0) AS BIGINT))
                  THEN x END) AS e4,
         max(CASE WHEN rn = greatest(1, CAST(ceil(n * 5 / 8.0) AS BIGINT))
                  THEN x END) AS e5,
         max(CASE WHEN rn = greatest(1, CAST(ceil(n * 6 / 8.0) AS BIGINT))
                  THEN x END) AS e6,
         max(CASE WHEN rn = greatest(1, CAST(ceil(n * 7 / 8.0) AS BIGINT))
                  THEN x END) AS e7
  FROM r GROUP BY event_type
)
SELECT event_type, CAST(n AS BIGINT) AS n,
       e2 AS q1_cents, e4 AS q2_cents, e6 AS q3_cents,
       CASE WHEN e6 > e2
            THEN CAST(round(1000.0 * (e6 + e2 - 2 * e4) / (e6 - e2)) AS BIGINT)
       END AS bowley_skew_milli,
       CASE WHEN e6 > e2
            THEN CAST(round(1000.0 * ((e7 - e5) + (e3 - e1)) / (e6 - e2))
                 AS BIGINT)
       END AS moors_kurt_milli
FROM oct
""",
)
def agg_robust_shape_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile-based distribution shape per event type: Bowley
    skewness (Q3 + Q1 − 2·Q2)/(Q3 − Q1) and Moors kurtosis
    ((E7−E5)+(E3−E1))/(E6−E2) from EXACT octile order statistics
    (⌈n·k/8⌉-th values — no interpolation, so both engines agree to the
    cent) — the outlier-immune alternatives to the moment skew/kurtosis
    in agg_numeric_stats, which a single corrupt point can dominate.

    Scale shape: one type-partitioned window sort supplies all seven
    order statistics; the rollup is type-cardinality. At 100 TB the
    same positions come from the fixed quantile-grid join
    (curation_quantile_normalize_grid's documented shape)."""
    v = (
        load(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            "event_type",
            F.round(100 * F.col("value")).cast("long").alias("x"),
        )
    )
    wp = Window.partitionBy("event_type")
    r = v.select(
        "event_type",
        "x",
        F.row_number().over(wp.orderBy("x")).alias("rn"),
        F.count(F.lit(1)).over(wp).alias("n"),
    )

    def oct_stat(k: int):
        pos = F.greatest(
            F.lit(1), F.ceil(F.col("n") * k / 8.0).cast("long")
        )
        return F.max(F.when(F.col("rn") == pos, F.col("x")))

    oct_ = r.groupBy("event_type").agg(
        F.max("n").cast("long").alias("n"),
        *[oct_stat(k).alias(f"e{k}") for k in range(1, 8)],
    )
    spread = F.col("e6") - F.col("e2")
    return oct_.select(
        "event_type",
        "n",
        F.col("e2").alias("q1_cents"),
        F.col("e4").alias("q2_cents"),
        F.col("e6").alias("q3_cents"),
        F.when(
            spread > 0,
            F.round(
                1000.0 * (F.col("e6") + F.col("e2") - 2 * F.col("e4")) / spread
            ).cast("long"),
        ).alias("bowley_skew_milli"),
        F.when(
            spread > 0,
            F.round(
                1000.0
                * ((F.col("e7") - F.col("e5")) + (F.col("e3") - F.col("e1")))
                / spread
            ).cast("long"),
        ).alias("moors_kurt_milli"),
    )
