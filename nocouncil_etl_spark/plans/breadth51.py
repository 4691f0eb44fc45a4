"""Breadth batch 51 (round 6): isolation depth, hash-chain ledger,
packing attention waste, bridge allocation, James-Stein, SymSpell.

Six operators (reference scope: unsupervised anomaly surfacing,
tamper-evident publishing, the hidden cost of sequence packing, exact
money allocation across child rows, shrinkage for noisy leaderboards,
and index-backed spelling correction):

- ``ml_isolation_depth``    — quadtree isolation depth (isolation-forest
  intuition as a fully parallel prefix-count computation).
- ``io_hash_chain_ledger``  — md5 hash chain over daily totals with a
  planted-tamper detection proof.
- ``curation_pack_attention_waste`` — concat-then-chunk packing: how
  many attention pairs cross document boundaries per window.
- ``join_bridge_allocation`` — largest-remainder allocation of order
  totals across lineitems, cent-exact conservation.
- ``stat_james_stein``      — positive-part James-Stein shrinkage of
  per-type means toward the grand mean.
- ``search_symspell_correct`` — symmetric-delete (SymSpell) spelling
  correction via a deletion-key equi-join.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nocouncil_etl_spark.io import fan_out, load
from nocouncil_etl_spark.operators.quantiles import cumulate
from nocouncil_etl_spark.plans.breadth15 import _pt, _pt_sql
from nocouncil_etl_spark.plans.breadth49 import _morton_sql
from nocouncil_etl_spark.registry import query

# --------------------------------------------------------------------------
# 1. Quadtree isolation depth
# --------------------------------------------------------------------------

ISO_MAXL = 8
ISO_TOP = 15


def _iso_oracle() -> str:
    parts = [
        f"""WITH pts AS (
  SELECT event_id, CAST(round(value) AS BIGINT) AS v,
         CAST(hour(ts) AS BIGINT) AS hr
  FROM events
),
mx AS (SELECT max(v) + 1 AS mv FROM pts),
norm AS (
  SELECT event_id, v, hr,
         (v * 256) // (SELECT mv FROM mx) AS cx,
         (hr * 256) // 24 AS cy
  FROM pts
),
keyed AS (
  SELECT event_id, v, hr, {_morton_sql('cx', 'cy')} AS mz FROM norm
)"""
    ]
    for lv in range(1, ISO_MAXL + 1):
        shift = 4 ** (ISO_MAXL - lv)
        parts.append(
            f"""c{lv} AS (
  SELECT mz // {shift} AS p, CAST(count(*) AS BIGINT) AS c
  FROM keyed GROUP BY 1
)"""
        )
    joins = " ".join(
        f"JOIN c{lv} ON c{lv}.p = k.mz // {4 ** (ISO_MAXL - lv)}"
        for lv in range(1, ISO_MAXL + 1)
    )
    depth = (
        "CASE "
        + " ".join(
            f"WHEN c{lv}.c = 1 THEN {lv}" for lv in range(1, ISO_MAXL + 1)
        )
        + f" ELSE {ISO_MAXL + 1} END"
    )
    return (
        ",\n".join(parts)
        + f"""
SELECT rk, event_id, v, hr, iso_depth FROM (
  SELECT k.event_id, k.v, k.hr, CAST({depth} AS BIGINT) AS iso_depth,
         CAST(row_number() OVER (ORDER BY {depth}, k.event_id) AS INT) AS rk
  FROM keyed k {joins}
) WHERE rk <= {ISO_TOP}
"""
    )


@query("ml_isolation_depth", oracle=_iso_oracle())
def ml_isolation_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Isolation depth via quadtree prefix counts — the isolation-forest
    intuition (anomalies isolate in FEW cuts) made fully parallel: map
    each event to a 256×256 (value, hour) grid, Morton-interleave the
    coordinates, and find the shallowest quadtree level at which the
    point is ALONE in its 2L-bit prefix cell. A point alone at level 2
    sits in an empty quadrant of the population — the top-{ISO_TOP}
    shallowest-isolation rows are the anomaly report (the unsupervised
    companion to ``agg_mad_outliers``/``stat_grubbs_outlier``, which
    need a parametric center). No trees, no randomness: every level is
    one hash-agg on a Morton prefix.

    Scale shape: {ISO_MAXL} prefix hash-aggs (all map-side combinable)
    + {ISO_MAXL} equi-joins back; the level tables shrink geometrically
    and broadcast at the shallow end."""
    ev = load(spark, sf_dir, "events")
    pts = ev.select(
        "event_id",
        F.round("value").cast("long").alias("v"),
        F.hour("ts").cast("long").alias("hr"),
    )
    mv = pts.agg((F.max("v") + 1).alias("mv"))
    keyed = (
        pts.crossJoin(F.broadcast(mv))
        .select(
            "event_id",
            "v",
            "hr",
            F.expr("(v * 256) div mv").alias("cx"),
            F.expr("(hr * 256) div 24").alias("cy"),
        )
        .withColumn("mz", F.expr(_morton_sql("cx", "cy", "div")))
        # pinned: every quadtree level re-aggregates this frame and joins
        # back onto it — unpinned, the scan+morton map re-executed once per
        # level plus once per join (measured 31 s at sf1 -> 4 s)
        .localCheckpoint(eager=True)
    )
    out = keyed
    for lv in range(1, ISO_MAXL + 1):
        shift = 4 ** (ISO_MAXL - lv)
        cnt = (
            keyed.groupBy(F.expr(f"mz div {shift}").alias(f"p{lv}"))
            .agg(F.count("*").cast("long").alias(f"c{lv}"))
        )
        out = out.withColumn(f"p{lv}", F.expr(f"mz div {shift}")).join(
            cnt, f"p{lv}"
        )
    depth = "CASE " + " ".join(
        f"WHEN c{lv} = 1 THEN {lv}" for lv in range(1, ISO_MAXL + 1)
    ) + f" ELSE {ISO_MAXL + 1} END"
    return (
        out.select(
            "event_id", "v", "hr", F.expr(depth).cast("long").alias("iso_depth")
        )
        .withColumn(
            "rk",
            F.row_number()
            .over(Window.orderBy("iso_depth", "event_id"))
            .cast("int"),
        )
        .filter(F.col("rk") <= ISO_TOP)
        .select("rk", "event_id", "v", "hr", "iso_depth")
    )


# --------------------------------------------------------------------------
# 2. Tamper-evident hash chain
# --------------------------------------------------------------------------


@query(
    "io_hash_chain_ledger",
    oracle="""
WITH RECURSIVE daily AS (
  SELECT CAST(CAST(ts AS DATE)
              - (SELECT min(CAST(ts AS DATE)) FROM events) AS BIGINT)
           AS off,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM events GROUP BY 1
),
idx AS (
  SELECT off, cents,
         CAST(row_number() OVER (ORDER BY off) AS BIGINT) AS i
  FROM daily
),
meta AS (SELECT CAST(count(*) AS BIGINT) AS n FROM idx),
chain AS (
  SELECT CAST(0 AS BIGINT) AS i, md5('genesis') AS h,
         md5('genesis') AS h2
  UNION ALL
  SELECT x.i,
         md5(c.h || ':' || CAST(x.off AS VARCHAR) || ':'
             || CAST(x.cents AS VARCHAR)),
         md5(c.h2 || ':' || CAST(x.off AS VARCHAR) || ':'
             || CAST(CASE WHEN x.i = 5 THEN x.cents + 1 ELSE x.cents END
                     AS VARCHAR))
  FROM chain c JOIN idx x ON x.i = c.i + 1
),
heads AS (
  SELECT h AS head, h2 AS head_tampered FROM chain, meta
  WHERE i = (SELECT n FROM meta)
)
SELECT x.off, x.cents, substring(c.h, 1, 8) AS chain_hash8,
       CAST(CASE WHEN (SELECT head FROM heads)
                      <> (SELECT head_tampered FROM heads)
            THEN 1 ELSE 0 END AS BIGINT) AS tamper_detected
FROM idx x JOIN chain c ON c.i = x.i
""",
)
def io_hash_chain_ledger(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tamper-evident ledger: the daily revenue closings are chained as
    h_i = md5(h_{i−1} ‖ day ‖ cents) from a genesis value — the
    append-only audit-log discipline (each published day commits to ALL
    history before it, so a silent retro-edit changes every later
    hash). A second chain with day 5's cents bumped by one cent is
    computed alongside, and the diverging head is the proof — emitted
    as tamper_detected=1 on every row. The content-hash cousin of
    ``fn_table_checksum`` (which is order-invariant; a LEDGER must be
    order-committing) and ``io_integrity_audit`` (per-file; this is
    per-record-in-sequence).

    Scale shape: chaining is inherently sequential but runs on the
    BOUNDED daily closings, one Arrow batch with one hash of state —
    the per-partition variant (chain per day-file, then chain the
    heads) is how it shards at 100 TB."""
    ev = load(spark, sf_dir, "events")
    d0 = ev.agg(F.min(F.to_date("ts")).alias("start"))
    daily = (
        ev.crossJoin(F.broadcast(d0))
        .groupBy(F.datediff(F.to_date("ts"), F.col("start")).cast("long").alias("off"))
        .agg(
            F.sum(F.round(F.col("value") * 100).cast("long"))
            .cast("long")
            .alias("cents")
        )
        .withColumn("g", F.lit(1))
    )
    out_schema = "off long, cents long, chain_hash8 string, tamper_detected long"

    def chain(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("off").reset_index(drop=True)
        h = hashlib.md5(b"genesis").hexdigest()
        h2 = h
        hashes = []
        for i, row in pdf.iterrows():
            off, cents = int(row["off"]), int(row["cents"])
            h = hashlib.md5(f"{h}:{off}:{cents}".encode()).hexdigest()
            c2 = cents + 1 if i + 1 == 5 else cents  # oracle tampers row i=5
            h2 = hashlib.md5(f"{h2}:{off}:{c2}".encode()).hexdigest()
            hashes.append(h[:8])
        return pd.DataFrame(
            {
                "off": pdf["off"].astype("int64"),
                "cents": pdf["cents"].astype("int64"),
                "chain_hash8": hashes,
                "tamper_detected": [1 if h != h2 else 0] * len(pdf),
            }
        )

    return daily.groupBy("g").applyInPandas(chain, out_schema)


# --------------------------------------------------------------------------
# 3. Packing attention waste
# --------------------------------------------------------------------------

PACK_W = 256


@query(
    "curation_pack_attention_waste",
    oracle=f"""
WITH dl AS (
  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS tk
  FROM documents
),
pos AS (
  SELECT doc_id, tk,
         CAST(coalesce(sum(tk) OVER (ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS start
  FROM dl
),
spans AS (
  SELECT doc_id, start, start + tk AS fin,
         start // {PACK_W} AS c0, (start + tk - 1) // {PACK_W} AS c1
  FROM pos WHERE tk > 0
),
segs AS (
  SELECT s.doc_id, u.c,
         least(s.fin, (u.c + 1) * {PACK_W})
           - greatest(s.start, u.c * {PACK_W}) AS seg
  FROM (SELECT doc_id, start, fin,
               unnest(range(c0, c1 + 1)) AS c FROM spans) u
  JOIN spans s ON s.doc_id = u.doc_id
),
per_chunk AS (
  SELECT c, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(seg) AS BIGINT) AS w,
         CAST(sum(seg * (seg + 1) // 2) AS BIGINT) AS same_pairs
  FROM segs GROUP BY c
),
full_chunks AS (
  SELECT c, n_docs, same_pairs, w * (w + 1) // 2 AS total_pairs
  FROM per_chunk WHERE w = {PACK_W}
)
SELECT CAST(count(*) AS BIGINT) AS n_chunks,
       CAST(max(n_docs) AS BIGINT) AS max_docs_per_chunk,
       CAST(sum(total_pairs) AS BIGINT) AS total_pairs,
       CAST(sum(total_pairs - same_pairs) AS BIGINT) AS cross_pairs,
       CAST((sum(total_pairs - same_pairs) * 1000000) // sum(total_pairs)
            AS BIGINT) AS waste_ppm
FROM full_chunks
""",
)
def curation_pack_attention_waste(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attention contamination of concat-then-chunk sequence packing:
    stream the corpus in doc order, cut windows of {PACK_W} tokens, and
    for every FULL window count causal attention pairs (i, j ≤ i) that
    CROSS a document boundary — the pairs a model wastes capacity on
    (or must block-mask away) when training on naively packed data.
    Per-window cross pairs fall out in closed form from the segment
    lengths: total W(W+1)/2 minus Σ s_k(s_k+1)/2 — no pair
    materialization. This quantifies what ``pack_sequences`` /
    ``pack_length_buckets`` trade away, the number a packing-strategy
    review actually needs.

    Scale shape: one prefix-sum window over per-doc token counts, a
    bounded range-explode of each doc into its ≤(len/W + 1) chunks, and
    one hash-agg per chunk — never per-token, never per-pair."""
    docs = fan_out(load(spark, sf_dir, "documents"))
    dl = docs.select(
        "doc_id", F.size(F.split("text", " ")).cast("long").alias("tk")
    )
    # r7: the packing offset via Fenwick prefix sums over doc_id — no
    # global window (start = cumulative tokens minus own)
    pos = cumulate(dl, "doc_id", ("tk",)).withColumn(
        "start", (F.col("cum_tk") - F.col("tk")).cast("long")
    )
    spans = pos.filter(F.col("tk") > 0).select(
        "doc_id",
        "start",
        (F.col("start") + F.col("tk")).alias("fin"),
        F.expr(f"start div {PACK_W}").alias("c0"),
        F.expr(f"(start + tk - 1) div {PACK_W}").alias("c1"),
    )
    segs = spans.select(
        "doc_id",
        "start",
        "fin",
        F.explode(F.sequence("c0", "c1")).alias("c"),
    ).select(
        "c",
        (
            F.least(F.col("fin"), (F.col("c") + 1) * PACK_W)
            - F.greatest(F.col("start"), F.col("c") * PACK_W)
        ).alias("seg"),
    )
    per_chunk = segs.groupBy("c").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("seg").cast("long").alias("w"),
        F.sum(F.expr("seg * (seg + 1) div 2")).cast("long").alias("same_pairs"),
    )
    full_chunks = per_chunk.filter(F.col("w") == PACK_W).withColumn(
        "total_pairs", F.expr(f"CAST({PACK_W} * {PACK_W + 1} div 2 AS BIGINT)")
    )
    return full_chunks.agg(
        F.count("*").cast("long").alias("n_chunks"),
        F.max("n_docs").cast("long").alias("max_docs_per_chunk"),
        F.sum("total_pairs").cast("long").alias("total_pairs"),
        F.sum(F.col("total_pairs") - F.col("same_pairs"))
        .cast("long")
        .alias("cross_pairs"),
        F.expr(
            "CAST((sum(total_pairs - same_pairs) * 1000000)"
            " div sum(total_pairs) AS BIGINT)"
        ).alias("waste_ppm"),
    )


# --------------------------------------------------------------------------
# 4. Largest-remainder bridge allocation
# --------------------------------------------------------------------------


@query(
    "join_bridge_allocation",
    oracle="""
WITH o AS (
  SELECT o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) AS total
  FROM orders
),
li AS (
  SELECT l_orderkey, l_linenumber,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS w
  FROM lineitem
),
wsum AS (
  SELECT l_orderkey, CAST(sum(w) AS BIGINT) AS sw,
         CAST(count(*) AS BIGINT) AS n_items
  FROM li GROUP BY 1
),
base AS (
  SELECT li.l_orderkey, li.l_linenumber, o.total, ws.sw, ws.n_items,
         (o.total * li.w) // ws.sw AS alloc0,
         (o.total * li.w) % ws.sw AS frac
  FROM li JOIN wsum ws ON li.l_orderkey = ws.l_orderkey
  JOIN o ON li.l_orderkey = o.o_orderkey
),
rem AS (
  SELECT l_orderkey, CAST(max(total) - sum(alloc0) AS BIGINT) AS r
  FROM base GROUP BY 1
),
bumped AS (
  SELECT b.l_orderkey, b.n_items, b.total,
         b.alloc0 + CASE WHEN row_number() OVER (PARTITION BY b.l_orderkey
                           ORDER BY b.frac DESC, b.l_linenumber) <= rem.r
                    THEN 1 ELSE 0 END AS alloc
  FROM base b JOIN rem ON b.l_orderkey = rem.l_orderkey
)
SELECT l_orderkey AS o_orderkey, CAST(max(n_items) AS BIGINT) AS n_items,
       CAST(max(total) AS BIGINT) AS total_cents,
       CAST(sum(alloc) AS BIGINT) AS allocated_cents,
       CAST(min(alloc) AS BIGINT) AS alloc_min,
       CAST(max(alloc) AS BIGINT) AS alloc_max,
       CAST(max(total) - sum(alloc) AS BIGINT) AS residual
FROM bumped GROUP BY l_orderkey
""",
)
def join_bridge_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Largest-remainder bridge allocation: spread each order's total
    cents across its lineitems proportionally to extended price,
    CONSERVING every cent — floor allocations first, then the leftover
    R cents go to the R largest fractional remainders (ties by line
    number). This is ``agg_apportion_seats``' Hamilton method applied
    to the fact-to-fact bridge problem (allocating invoice totals,
    shipping costs, or discounts across child rows), where "just
    multiply and round" silently creates or destroys money. The
    residual column is structurally zero — the conservation proof rides
    along in the output.

    Scale shape: one per-order hash-agg for weights, one broadcast-less
    keyed join back (same key, co-partitioned), one bounded per-order
    window for the remainder ranks."""
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("total"),
    )
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("w"),
    )
    wsum = li.groupBy("l_orderkey").agg(
        F.sum("w").cast("long").alias("sw"),
        F.count("*").cast("long").alias("n_items"),
    )
    base = (
        li.join(wsum, "l_orderkey")
        .join(o, li.l_orderkey == o.o_orderkey)
        .select(
            "l_orderkey",
            "l_linenumber",
            "total",
            "sw",
            "n_items",
            F.expr("(total * w) div sw").alias("alloc0"),
            F.expr("(total * w) % sw").alias("frac"),
        )
    )
    rem = base.groupBy("l_orderkey").agg(
        (F.max("total") - F.sum("alloc0")).cast("long").alias("r")
    )
    bumped = (
        base.join(rem, "l_orderkey")
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("l_orderkey").orderBy(
                    F.desc("frac"), "l_linenumber"
                )
            ),
        )
        .withColumn(
            "alloc",
            F.col("alloc0") + F.when(F.col("rk") <= F.col("r"), 1).otherwise(0),
        )
    )
    return bumped.groupBy(F.col("l_orderkey").alias("o_orderkey")).agg(
        F.max("n_items").cast("long").alias("n_items"),
        F.max("total").cast("long").alias("total_cents"),
        F.sum("alloc").cast("long").alias("allocated_cents"),
        F.min("alloc").cast("long").alias("alloc_min"),
        F.max("alloc").cast("long").alias("alloc_max"),
        (F.max("total") - F.sum("alloc")).cast("long").alias("residual"),
    )


# --------------------------------------------------------------------------
# 5. James-Stein shrinkage
# --------------------------------------------------------------------------


@query(
    "stat_james_stein",
    oracle="""
WITH g AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS s,
         CAST(sum(CAST(round(value * 100) AS BIGINT)
                  * CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS s2
  FROM events GROUP BY 1
),
mom AS (
  SELECT event_type, n, CAST(s AS DOUBLE) / n AS mean,
         (CAST(n AS DOUBLE) * s2 - CAST(s AS DOUBLE) * s)
           / (CAST(n AS DOUBLE) * (n - 1) * n) AS se2
  FROM g WHERE n > 1
),
tot AS (
  SELECT CAST(count(*) AS BIGINT) AS k, avg(mean) AS grand, avg(se2) AS s2bar
  FROM mom
),
spread AS (
  SELECT t.k, t.grand, t.s2bar,
         sum((m.mean - t.grand) * (m.mean - t.grand)) AS ss
  FROM mom m, tot t GROUP BY t.k, t.grand, t.s2bar
),
fac AS (
  SELECT k, grand,
         greatest(0.0, 1.0 - (k - 3) * s2bar / ss) AS c
  FROM spread
)
SELECT m.event_type, m.n,
       CAST(round(1000 * m.mean) AS BIGINT) AS raw_mean_milli,
       CAST(round(1000 * (f.grand + f.c * (m.mean - f.grand))) AS BIGINT)
         AS js_mean_milli,
       CAST(round(1000000 * f.c) AS BIGINT) AS shrink_ppm
FROM mom m, fac f
""",
)
def stat_james_stein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positive-part James-Stein shrinkage of the per-type mean cents
    toward the grand mean: x̃_i = x̄ + c·(x̄_i − x̄) with
    c = max(0, 1 − (k−3)·s̄²/Σ(x̄_i−x̄)²) — the estimator that
    DOMINATES the raw group means in total squared error whenever
    k ≥ 4 (Stein's paradox), and the standard fix for winner's-curse
    leaderboards (a group that looks best partly by luck gets pulled
    in proportionally to its noise). All moments are exact integer
    sums; doubles enter only the fixed-shape shrink expression, each
    output quantized once.

    Scale shape: one map-side-combined hash-agg to k rows; the
    shrinkage is k-row scalar math."""
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
            / (F.col("n").cast("double") * (F.col("n") - 1) * F.col("n"))
        ).alias("se2"),
    )
    tot = mom.agg(
        F.count("*").cast("long").alias("k"),
        F.avg("mean").alias("grand"),
        F.avg("se2").alias("s2bar"),
    )
    spread = (
        mom.crossJoin(F.broadcast(tot))
        .groupBy("k", "grand", "s2bar")
        .agg(
            F.sum(
                (F.col("mean") - F.col("grand")) * (F.col("mean") - F.col("grand"))
            ).alias("ss")
        )
    )
    fac = spread.select(
        "grand",
        F.greatest(
            F.lit(0.0),
            1.0 - (F.col("k") - 3) * F.col("s2bar") / F.col("ss"),
        ).alias("c"),
    )
    return mom.crossJoin(F.broadcast(fac)).select(
        "event_type",
        "n",
        F.round(1000 * F.col("mean")).cast("long").alias("raw_mean_milli"),
        F.round(
            1000 * (F.col("grand") + F.col("c") * (F.col("mean") - F.col("grand")))
        )
        .cast("long")
        .alias("js_mean_milli"),
        F.round(1000000 * F.col("c")).cast("long").alias("shrink_ppm"),
    )


# --------------------------------------------------------------------------
# 6. SymSpell spelling correction
# --------------------------------------------------------------------------

SS_NQ = 5


def _del1_sql(word: str, duck: bool) -> str:
    """SQL: list of all distance-1 deletions of ``word`` plus the word."""
    if duck:
        return (
            f"list_append(list_transform(range(1, len({word}) + 1),"
            f" i -> substring({word}, 1, CAST(i - 1 AS INTEGER))"
            f" || substring({word}, CAST(i + 1 AS INTEGER))), {word})"
        )
    return (
        f"array_append(transform(sequence(1, length({word})),"
        f" i -> concat(substring({word}, 1, i - 1),"
        f" substring({word}, i + 1))), {word})"
    )


@query(
    "search_symspell_correct",
    oracle=f"""
WITH vocab AS (
  SELECT term, CAST(count(*) AS BIGINT) AS cf FROM (
    SELECT unnest(string_split(text, ' ')) AS term FROM documents
  ) GROUP BY term HAVING length(term) >= 4
),
qsrc AS (
  SELECT term AS original, cf FROM (
    SELECT term, cf, row_number() OVER (ORDER BY cf DESC, term) AS rk
    FROM vocab
  ) WHERE rk <= {SS_NQ}
),
qreal AS (
  SELECT original,
         substring(original, 1, CAST(p - 1 AS INTEGER))
           || substring(original, CAST(p + 1 AS INTEGER)) AS q
  FROM (SELECT original,
               1 + {_pt_sql('ss#', 'original', 1000)} % length(original) AS p
        FROM qsrc)
),
vkeys AS (
  SELECT term, cf, unnest({_del1_sql('term', True)}) AS k FROM vocab
),
qkeys AS (
  SELECT original, q, unnest({_del1_sql('q', True)}) AS k FROM qreal
),
cands AS (
  SELECT DISTINCT qk.original, qk.q, vk.term, vk.cf
  FROM qkeys qk JOIN vkeys vk ON qk.k = vk.k
),
best AS (
  SELECT original, q, term AS suggestion, cf,
         CAST(count(*) OVER (PARTITION BY original) AS BIGINT)
           AS n_candidates
  FROM (
    SELECT *, row_number() OVER (PARTITION BY original
                                 ORDER BY cf DESC, term) AS rk
    FROM cands
  ) WHERE rk = 1
)
SELECT original, q AS query, suggestion, n_candidates,
       CAST(CASE WHEN suggestion = original THEN 1 ELSE 0 END AS BIGINT)
         AS corrected
FROM best
""",
)
def search_symspell_correct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SymSpell symmetric-delete spelling correction (Garbe's
    algorithm): index every vocabulary word under itself AND all its
    distance-1 deletions, expand the query the same way, and candidate
    retrieval becomes a pure EQUI-JOIN on deletion keys — no edit
    distance is ever computed at lookup (the trick that makes spell
    correction a bucket join instead of a scan, the same shape shift
    as ``dedup_minhash_lsh``). Queries here are the top-{SS_NQ} corpus
    words each with one md5-chosen letter dropped; the best candidate
    (by corpus frequency, tie alphabetical) must reconstruct the
    original, and the `corrected` flag proves it per query.

    Scale shape: the deletion-key index is ~len(word) rows per vocab
    entry, built map-side; retrieval is an equi-join keyed on short
    strings — broadcastable from the query side."""
    docs = fan_out(load(spark, sf_dir, "documents"))
    vocab = (
        docs.select(F.explode(F.split("text", " ")).alias("term"))
        .groupBy("term")
        .agg(F.count("*").cast("long").alias("cf"))
        .filter(F.length("term") >= 4)
    )
    qsrc = (
        vocab.withColumn(
            "rk", F.row_number().over(Window.orderBy(F.desc("cf"), "term"))
        )
        .filter(F.col("rk") <= SS_NQ)
        .select(F.col("term").alias("original"))
    )
    qreal = qsrc.withColumn(
        "p",
        1 + (_pt("ss#", F.col("original")) % 1000) % F.length("original"),
    ).select(
        "original",
        F.expr(
            "concat(substring(original, 1, CAST(p - 1 AS INT)),"
            " substring(original, CAST(p + 1 AS INT)))"
        ).alias("q"),
    )
    vkeys = vocab.select(
        "term", "cf", F.explode(F.expr(_del1_sql("term", False))).alias("k")
    )
    qkeys = qreal.select(
        "original", "q", F.explode(F.expr(_del1_sql("q", False))).alias("k")
    )
    cands = (
        F.broadcast(qkeys)
        .join(vkeys, "k")
        .select("original", "q", "term", "cf")
        .distinct()
    )
    best = (
        cands.withColumn(
            "n_candidates",
            F.count("*").over(Window.partitionBy("original")).cast("long"),
        )
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("original").orderBy(F.desc("cf"), "term")
            ),
        )
        .filter(F.col("rk") == 1)
    )
    return best.select(
        "original",
        F.col("q").alias("query"),
        F.col("term").alias("suggestion"),
        "n_candidates",
        F.when(F.col("term") == F.col("original"), 1)
        .otherwise(0)
        .cast("long")
        .alias("corrected"),
    )
