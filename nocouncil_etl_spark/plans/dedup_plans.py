"""Dedup queries (SURVEY.md §2.9 E4/E5 + north-star dedup family).

Duplicates are synthesized deterministically inside each query (original ∪
mutated/exact copies with id+100000) so every detector provably fires and the
DuckDB oracle sees the identical corpus. All kernels are md5-based and
portable; the oracle SQL below is generated from the same constants as the
Spark plan (operators/dedup.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nocouncil_etl_spark.io import fan_out, load
from nocouncil_etl_spark.operators.dedup import (
    exact_dedup,
    jaccard,
    lsh_near_duplicates,
    make_shingle_udf,
    minhash_signatures,
    shingles,
    simhash_table,
    words,
)
from nocouncil_etl_spark.registry import query

SHINGLE_N = 3
N_HASHES = 4
N_BANDS = 2
ROWS_PER_BAND = 2
JACCARD_THRESHOLD = 0.5
SIMHASH_BITS = 16

# ---- DuckDB SQL fragment generators (mirror operators/dedup.py) ------------


def _sql_shingles(ws: str, n: int) -> str:
    return (
        f"CASE WHEN len({ws}) >= {n} THEN "
        f"list_transform(range(1, len({ws}) - {n - 2}), i -> array_to_string({ws}[i:i+{n - 1}], ' ')) "
        f"ELSE [] END"
    )


def _sql_minhash(sh: str, seed: int, width: int = 12) -> str:
    return (
        f"list_aggregate(list_transform({sh}, s -> substr(md5('{seed}|' || s), 1, {width})), 'min')"
    )


def _sql_band(sh: str, b: int, rows: int) -> str:
    comps = " || '#' || ".join(_sql_minhash(sh, b * rows + r) for r in range(rows))
    return f"'{b}#' || {comps}"


def _sql_jaccard(a: str, b: str) -> str:
    return (
        f"CASE WHEN len(list_distinct(list_concat({a}, {b}))) > 0 THEN "
        f"CAST(len(list_intersect({a}, {b})) AS DOUBLE) / len(list_distinct(list_concat({a}, {b}))) "
        f"END"
    )


def _sql_simhash(ws: str, n_bits: int) -> str:
    bits = " || ".join(
        f"(CASE WHEN 2 * len(list_filter({ws}, w -> substr(md5(w), {i}, 1) >= '8')) > len({ws}) "
        f"THEN '1' ELSE '0' END)"
        for i in range(1, n_bits + 1)
    )
    return bits


# ---- queries ----------------------------------------------------------------


@query(
    "dedup_exact",
    oracle="""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 100000, text FROM documents WHERE doc_id % 4 = 0
)
SELECT md5(text) AS fp, min(doc_id) AS canonical_id, count(*) AS n_copies
FROM corpus
GROUP BY md5(text)
""",
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4: exact dedup via content-hash groupBy — the scaled form of the
    reference's sha16(url) identity gate (newscrawler.py:59-61,366-369).
    Hash-partitioned aggregate; no global collect."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    copies = docs.filter(F.col("doc_id") % 4 == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text"
    )
    return exact_dedup(docs.unionByName(copies), "text", "doc_id")


@query(
    "dedup_minhash_signature",
    oracle=f"""
WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
sh AS (SELECT doc_id, {_sql_shingles('w', SHINGLE_N)} AS s FROM ws)
SELECT doc_id,
       {", ".join(f"{_sql_minhash('s', i)} AS mh{i}" for i in range(N_HASHES))}
FROM sh
""",
)
def dedup_minhash_signature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E5 stage 1: minhash signatures over 3-word shingles. Hybrid kernel
    (measured fastest): Arrow pandas-UDF builds the shingle arrays, then
    explode → codegen'd md5 → grouped min with map-side combine. The shuffle
    carries one row per doc — the 100 TB signature shape."""
    docs = load(spark, sf_dir, "documents")
    sh_udf = make_shingle_udf(SHINGLE_N)
    shd = fan_out(docs).select("doc_id", sh_udf("text").alias("sh"))
    return minhash_signatures(shd, "doc_id", "sh", N_HASHES)


_LSH_CORPUS = """
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 100000, text || ' appended mutation tail words' FROM documents
  WHERE doc_id % 4 = 0
"""


@query(
    "dedup_minhash_lsh",
    oracle=f"""
WITH corpus AS ({_LSH_CORPUS}),
ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM corpus),
sh AS (SELECT doc_id, {_sql_shingles('w', SHINGLE_N)} AS s FROM ws),
banded AS (
  SELECT doc_id, s,
         unnest([{", ".join(_sql_band('s', b, ROWS_PER_BAND) for b in range(N_BANDS))}]) AS band
  FROM sh
),
pairs AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b, a.s AS sh_a, b.s AS sh_b
  FROM banded a JOIN banded b ON a.band = b.band AND a.doc_id < b.doc_id
)
SELECT id_a, id_b, round({_sql_jaccard('sh_a', 'sh_b')}, 4) AS jaccard
FROM pairs
WHERE {_sql_jaccard('sh_a', 'sh_b')} >= {JACCARD_THRESHOLD}
""",
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E5: MinHash+LSH near-dup detection — shingle → minhash → band →
    bucket equi-join → exact-Jaccard verify. The flagship dedup pipeline:
    candidate generation is linear (band-key join), verification touches only
    candidates. Near-dups are synthesized (every 4th doc gets a mutated copy)."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    mutated = docs.filter(F.col("doc_id") % 4 == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat("text", F.lit(" appended mutation tail words")).alias("text"),
    )
    corpus = docs.unionByName(mutated)
    return lsh_near_duplicates(
        corpus,
        id_col="doc_id",
        text_col="text",
        shingle_n=SHINGLE_N,
        n_bands=N_BANDS,
        rows_per_band=ROWS_PER_BAND,
        threshold=JACCARD_THRESHOLD,
    )


@query(
    "dedup_simhash",
    oracle=f"""
WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
SELECT doc_id, {_sql_simhash('w', SIMHASH_BITS)} AS simhash
FROM ws
""",
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """North-star SimHash: 16-bit majority-vote fingerprint per doc via
    explode + one grouped aggregation (codegen'd md5, map-side combine);
    hamming-bucket joins on prefixes give near-dup candidates at scale."""
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", words("text").alias("w")
    )
    return simhash_table(docs, "doc_id", "w", SIMHASH_BITS)


@query(
    "dedup_ngram_jaccard",
    oracle=f"""
WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
sh AS (SELECT doc_id, {_sql_shingles('w', 2)} AS s FROM ws)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       round({_sql_jaccard('a.s', 'b.s')}, 4) AS jaccard
FROM sh a JOIN sh b ON b.doc_id = a.doc_id + 1
""",
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """North-star n-gram Jaccard: exact 2-gram similarity for adjacent doc
    pairs — the verification kernel of the LSH pipeline, isolated."""
    docs = load(spark, sf_dir, "documents")
    # fan_out + pin: the interpreted shingle expression is consumed by both
    # join sides — unpinned it runs twice in one scan task each
    sh = (
        fan_out(docs)
        .select("doc_id", shingles(words("text"), 2).alias("s"))
        .localCheckpoint(eager=True)
    )
    a = sh.select(F.col("doc_id").alias("id_a"), F.col("s").alias("sa"))
    b = sh.select((F.col("doc_id") - 1).alias("id_a"), F.col("doc_id").alias("id_b"), F.col("s").alias("sb"))
    return (
        a.join(b, "id_a")
        .select("id_a", "id_b", F.round(jaccard(F.col("sa"), F.col("sb")), 4).alias("jaccard"))
    )


def _fp_sql(gram: int) -> str:
    """DuckDB twin of functions.text.fingerprint(ws, gram, 16)."""
    return f"""CASE WHEN len(w) >= {gram} THEN
         list_aggregate(
           list_transform(range(1, len(w) - {gram - 2}),
                          i -> substr(md5(array_to_string(w[i:i+{gram - 1}], ' ')), 1, 16)),
           'min')
       ELSE substr(md5(array_to_string(w, ' ')), 1, 16) END"""


@query(
    "dedup_cluster_components",
    oracle=f"""
WITH RECURSIVE ws AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
),
fps AS (SELECT doc_id, {_fp_sql(4)} AS fp4, {_fp_sql(5)} AS fp5 FROM ws),
edges AS (
  SELECT a.doc_id AS src, b.doc_id AS dst
  FROM fps a JOIN fps b ON a.fp4 = b.fp4 AND a.doc_id < b.doc_id
  UNION
  SELECT a.doc_id, b.doc_id
  FROM fps a JOIN fps b ON a.fp5 = b.fp5 AND a.doc_id < b.doc_id
),
sym AS (SELECT src AS a, dst AS b FROM edges UNION SELECT dst, src FROM edges),
nodes AS (SELECT DISTINCT a AS node FROM sym),
reach AS (
  SELECT node, node AS r FROM nodes
  UNION
  SELECT s.b AS node, reach.r FROM reach JOIN sym s ON s.a = reach.node
)
SELECT node AS doc_id, min(r) AS component FROM reach GROUP BY node
""",
)
def dedup_cluster_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs → transitive dedup CLUSTERS via min-label-propagation
    connected components (operators/dedup.connected_components). Edges =
    docs agreeing on either the 4-gram or the 5-gram rolling fingerprint,
    so transitivity is non-trivial (A~B on one key, B~C on the other ⇒ one
    cluster). The oracle computes the same components with a recursive CTE.
    At scale: per-level equi-join + min-agg, diameter-bounded iterations —
    the canonical-representative step every dedup pipeline needs between
    pair generation and row dropping."""
    from nocouncil_etl_spark.functions.text import fingerprint
    from nocouncil_etl_spark.operators.dedup import connected_components

    docs = load(spark, sf_dir, "documents")
    # fan_out + pin: the two interpreted rolling-fingerprint columns are the
    # expensive stage, and fps feeds FOUR join branches — unpinned, that is
    # eight full single-task fingerprint scans (measured minutes at sf1);
    # pinned, it is one parallel scan and four reads of a 3-column table.
    fps = (
        fan_out(docs)
        .select(
            "doc_id",
            fingerprint(F.split("text", " "), gram=4, width=16).alias("fp4"),
            fingerprint(F.split("text", " "), gram=5, width=16).alias("fp5"),
        )
        .localCheckpoint(eager=True)
    )

    def pairs_on(col: str) -> DataFrame:
        a = fps.select(F.col("doc_id").alias("src"), F.col(col).alias("_k"))
        b = fps.select(F.col("doc_id").alias("dst"), F.col(col).alias("_k"))
        return (
            a.join(b, "_k")
            .filter(F.col("src") < F.col("dst"))
            .select("src", "dst")
        )

    edges = pairs_on("fp4").unionByName(pairs_on("fp5")).dropDuplicates(
        ["src", "dst"]
    )
    comp = connected_components(edges)
    return comp.select(F.col("node").alias("doc_id"), F.col("comp").alias("component"))


@query(
    "dedup_cluster_keep_best",
    oracle=f"""
WITH RECURSIVE ws AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
),
fps AS (SELECT doc_id, {_fp_sql(4)} AS fp4, {_fp_sql(5)} AS fp5 FROM ws),
edges AS (
  SELECT a.doc_id AS src, b.doc_id AS dst
  FROM fps a JOIN fps b ON a.fp4 = b.fp4 AND a.doc_id < b.doc_id
  UNION
  SELECT a.doc_id, b.doc_id
  FROM fps a JOIN fps b ON a.fp5 = b.fp5 AND a.doc_id < b.doc_id
),
sym AS (SELECT src AS a, dst AS b FROM edges UNION SELECT dst, src FROM edges),
nodes AS (SELECT DISTINCT a AS node FROM sym),
reach AS (
  SELECT node, node AS r FROM nodes
  UNION
  SELECT s.b AS node, reach.r FROM reach JOIN sym s ON s.a = reach.node
),
comp AS (SELECT node AS doc_id, min(r) AS component FROM reach GROUP BY node),
scored AS (
  SELECT c.component, c.doc_id,
         len(string_split(d.text, ' ')) AS quality
  FROM comp c JOIN documents d USING (doc_id)
)
SELECT component,
       CAST(count(*) AS BIGINT) AS n_members,
       CAST(max(quality) AS BIGINT) AS best_quality,
       CAST(min(CASE WHEN quality = mq THEN doc_id END) AS BIGINT) AS keep_id
FROM (
  SELECT component, doc_id, quality,
         max(quality) OVER (PARTITION BY component) AS mq
  FROM scored
)
GROUP BY component
""",
)
def dedup_cluster_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster retention policy: within each transitive
    fingerprint cluster, keep the HIGHEST-QUALITY member (word count as
    the quality proxy; ties → smallest id) instead of the arbitrary
    min-id — the curation-grade version of keep-one-per-cluster (dropping
    the longest/best copy because its id sorts higher is a real data-loss
    bug in naive dedup). Deterministic argmax via the windowed-max +
    min-id-at-max rule on both engines.

    Scale shape: components as before (per-level equi-join + min-agg),
    one quality join, one per-component window over cluster-sized
    groups."""
    from nocouncil_etl_spark.functions.text import fingerprint
    from nocouncil_etl_spark.operators.dedup import connected_components

    docs = load(spark, sf_dir, "documents")
    # fan_out + pin: the two interpreted rolling-fingerprint columns are the
    # expensive stage, and fps feeds FOUR join branches — unpinned, that is
    # eight full single-task fingerprint scans (measured minutes at sf1);
    # pinned, it is one parallel scan and four reads of a 3-column table.
    fps = (
        fan_out(docs)
        .select(
            "doc_id",
            fingerprint(F.split("text", " "), gram=4, width=16).alias("fp4"),
            fingerprint(F.split("text", " "), gram=5, width=16).alias("fp5"),
        )
        .localCheckpoint(eager=True)
    )

    def pairs_on(col: str) -> DataFrame:
        a = fps.select(F.col("doc_id").alias("src"), F.col(col).alias("_k"))
        b = fps.select(F.col("doc_id").alias("dst"), F.col(col).alias("_k"))
        return (
            a.join(b, "_k").filter(F.col("src") < F.col("dst")).select("src", "dst")
        )

    edges = pairs_on("fp4").unionByName(pairs_on("fp5")).dropDuplicates(
        ["src", "dst"]
    )
    comp = connected_components(edges).select(
        F.col("node").alias("doc_id"), F.col("comp").alias("component")
    )
    scored = comp.join(
        docs.select("doc_id", F.size(F.split("text", " ")).alias("quality")),
        "doc_id",
    )
    w = Window.partitionBy("component")
    ranked = scored.withColumn("mq", F.max("quality").over(w))
    return ranked.groupBy("component").agg(
        F.count(F.lit(1)).cast("long").alias("n_members"),
        F.max("quality").cast("long").alias("best_quality"),
        F.min(
            F.when(F.col("quality") == F.col("mq"), F.col("doc_id"))
        ).cast("long").alias("keep_id"),
    )


# --------------------------------------------------------------------------
# containment (asymmetric) near-dup — quoted-inclusion detection
# --------------------------------------------------------------------------

CONTAIN_TOP = 30


@query(
    "dedup_containment",
    oracle=f"""
WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
sh AS (
  SELECT doc_id, list_distinct({_sql_shingles('w', 2)}) AS s FROM ws
),
keyed AS (
  SELECT doc_id, s,
         list_aggregate(list_transform(s, x -> substr(md5('1|' || x), 1, 16)), 'min')
           || list_aggregate(list_transform(s, x -> substr(md5('2|' || x), 1, 16)), 'min')
           AS k
  FROM sh WHERE len(s) > 0
),
pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         len(list_intersect(a.s, b.s)) AS inter,
         len(a.s) AS na, len(b.s) AS nb
  FROM keyed a JOIN keyed b ON a.k = b.k AND a.doc_id < b.doc_id
)
SELECT id_a, id_b, CAST(inter AS BIGINT) AS n_shared,
       round(CAST(inter AS DOUBLE) / least(na, nb), 4) AS containment
FROM pairs
ORDER BY containment DESC, id_a, id_b LIMIT {CONTAIN_TOP}
""",
)
def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric containment near-dup: |A∩B| / min(|A|, |B|) over distinct
    2-gram shingle sets — detects a document QUOTED INSIDE another, which
    symmetric Jaccard misses (a 100-word quote inside a 10k-word article has
    Jaccard ≈ 0.01 but containment ≈ 1.0 — the quote-inclusion leak class in
    training data). Candidates share the corpus-wide MIN shingle hash (a
    1-band bottom-sketch LSH: any pair with high containment of the smaller
    set shares its minimum with probability ≈ containment); the exact
    intersection runs on candidates only. Top-{CONTAIN_TOP} under a total
    order.

    Scale shape: shingle + min-hash are narrow per-doc columns; the
    candidate key concatenates TWO independent min-hashes, so collision
    probability is ≈ containment² — measured 25× fewer candidate pairs
    than a single min (315k → 12k at sf0.1) while pairs near containment
    1.0 (the ones this query ranks) still collide with probability ≈ 1.
    The candidate join is an equi-join on that key (bucket sizes are
    near-dup cluster sizes, AQE-splittable); the exact intersect runs
    once per candidate; no all-pairs stage."""
    docs = fan_out(load(spark, sf_dir, "documents"))
    # Arrow shingles + explode + codegen md5 + combiner min — the measured
    # MinHash discipline. The interpreted-HOF form (array_min over
    # F.transform per doc, arrays carried through the join) measured
    # 19 s/sf0.1 and 194 s/sf1; this shape + the persist below runs the
    # shingle pass once and keeps every shuffle narrow.
    sh = docs.select(
        "doc_id", F.array_distinct(make_shingle_udf(2)("text")).alias("s")
    ).filter(F.size("s") > 0)
    # the exploded frame feeds THREE consumers (key agg + both intersect
    # sides) — persist so the Arrow pass runs once, not three times (the
    # LSH-pipeline shuffle-hygiene lesson)
    ex = sh.select("doc_id", F.explode("s").alias("sh")).persist()
    keyed = ex.groupBy("doc_id").agg(
        F.concat(
            F.min(F.substring(F.md5(F.concat(F.lit("1|"), F.col("sh"))), 1, 16)),
            F.min(F.substring(F.md5(F.concat(F.lit("2|"), F.col("sh"))), 1, 16)),
        ).alias("k"),
        F.count(F.lit(1)).cast("long").alias("n_sh"),
    )
    a = keyed.select(F.col("doc_id").alias("id_a"), "k", F.col("n_sh").alias("na"))
    b = keyed.select(F.col("doc_id").alias("id_b"), "k", F.col("n_sh").alias("nb"))
    cand = (
        a.join(b, "k")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "na", "nb")
    )
    # exact intersection on candidates only, via the exploded frame — no
    # shingle array ever crosses a shuffle
    sa = ex.select(F.col("doc_id").alias("id_a"), "sh")
    sb = ex.select(F.col("doc_id").alias("id_b"), "sh")
    inter = (
        cand.join(sa, "id_a")
        .join(sb, ["id_b", "sh"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
    )
    pairs = cand.join(inter, ["id_a", "id_b"]).select(
        "id_a",
        "id_b",
        "n_shared",
        F.round(
            F.col("n_shared").cast("double") / F.least("na", "nb"), 4
        ).alias("containment"),
    )
    return pairs.orderBy(F.desc("containment"), "id_a", "id_b").limit(CONTAIN_TOP)


# --------------------------------------------------------------------------
# salted band-key LSH under pathological bucket skew
# --------------------------------------------------------------------------

# One shared page template on 10% of the corpus — the boilerplate-heavy
# shape that puts every planted doc into the same band bucket and defeats
# AQE skew splitting (which can split the stream side of a sort-merge join
# but not the build-side hash group of one key).
BOILER = (
    "cookie policy accept all terms privacy notice subscribe newsletter"
    " footer copyright legal"
)
N_SALT = 8


@query(
    "dedup_lsh_salted",
    oracle=f"""
WITH corpus AS (
  SELECT doc_id,
         CASE WHEN doc_id % 10 = 0
              THEN '{BOILER} doc ' || CAST(doc_id AS VARCHAR)
              ELSE text END AS text
  FROM documents
),
ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM corpus),
sh AS (SELECT doc_id, {{shingles}} AS s FROM ws),
banded AS (
  SELECT doc_id, s,
         unnest([{{bands}}]) AS band
  FROM sh
),
pairs AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b, a.s AS sh_a, b.s AS sh_b
  FROM banded a JOIN banded b ON a.band = b.band AND a.doc_id < b.doc_id
),
ver AS (
  SELECT id_a, id_b, round({{jac}}, 4) AS j
  FROM pairs
  WHERE {{jac}} >= {{thr}}
),
sides AS (
  SELECT id_a AS doc_id, j FROM ver
  UNION ALL
  SELECT id_b AS doc_id, j FROM ver
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_dups, max(j) AS j_max
FROM sides GROUP BY doc_id
""".format(
        shingles=_sql_shingles("w", SHINGLE_N),
        bands=", ".join(_sql_band("s", b, ROWS_PER_BAND) for b in range(N_BANDS)),
        jac=_sql_jaccard("sh_a", "sh_b"),
        thr=JACCARD_THRESHOLD,
    ),
)
def dedup_lsh_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH dedup with a SALTED candidate self-join
    (operators/dedup.lsh_near_duplicates_salted) on a planted pathological
    corpus: every 10th doc's text is replaced by one shared boilerplate
    template plus a per-doc tail, so 10% of the corpus lands in a single
    band bucket. The salt splits side A's bucket rows across
    (band, id % {N_SALT}) shards and replicates side B's (band, id) keys
    across all shards — every pair still meets exactly once per shared
    band, so the result is row-identical to the unsalted join (the oracle
    runs UNSALTED — semantic equivalence is the check), while the largest
    per-task group shrinks by ~{N_SALT}x (asserted value-level in
    tests/test_dedup_salted.py). Output is per-doc (verified-duplicate
    partner count, max Jaccard) — linear even when the planted cluster is
    a near-clique.

    This is SCALE.md's documented fallback for when AQE skew handling is
    not enough: AQE can split oversized PROBE partitions, but a single
    band key's build-side hash group is indivisible without changing the
    key — salting changes the key."""
    from nocouncil_etl_spark.operators.dedup import lsh_near_duplicates_salted

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 10 == 0,
            F.concat(F.lit(BOILER + " doc "), F.col("doc_id").cast("string")),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    pairs = lsh_near_duplicates_salted(
        corpus,
        id_col="doc_id",
        text_col="text",
        shingle_n=SHINGLE_N,
        n_bands=N_BANDS,
        rows_per_band=ROWS_PER_BAND,
        threshold=JACCARD_THRESHOLD,
        n_salt=N_SALT,
    )
    sides = pairs.select(F.col("id_a").alias("doc_id"), "jaccard").unionByName(
        pairs.select(F.col("id_b").alias("doc_id"), "jaccard")
    )
    return sides.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_dups"),
        F.max("jaccard").alias("j_max"),
    )
