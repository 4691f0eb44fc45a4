"""Corpus-preparation queries (north-star training-data ops, batch 4):
overlapping chunking for embedding/RAG prep, per-source token-budget
sampling, global vocabulary, and TF-IDF term extraction. All pure DataFrame
expressions — tokenization stays in codegen (split/filter/transform), the
only shuffles are the keyed aggregations the semantics require.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nocouncil_etl_spark.io import load
from nocouncil_etl_spark.registry import query

CHUNK = 64       # tokens per chunk
OVERLAP = 16     # tokens shared with the previous chunk
STRIDE = CHUNK - OVERLAP

# alnum-run tokens, lowercased — the same BPE-ish stream as text_token_count
_TOK_SPARK = "filter(split(lower(text), '[^a-z0-9]+'), t -> t != '')"
_TOK_SQL = (
    "list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),"
    " t -> length(t) > 0)"
)


@query(
    "text_chunk_overlap",
    oracle=f"""
WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
c AS (
  SELECT doc_id, w,
         CAST(unnest(range(0, CAST(ceil(greatest(len(w) - {OVERLAP}, 1) / {STRIDE}.0) AS INT))) AS INT) AS chunk_id
  FROM ws
)
SELECT doc_id, chunk_id,
       CAST(len(w[chunk_id * {STRIDE} + 1 : chunk_id * {STRIDE} + {CHUNK}]) AS INT) AS n_tok,
       array_to_string(w[chunk_id * {STRIDE} + 1 : chunk_id * {STRIDE} + {CHUNK}], ' ') AS chunk_text
FROM c
""",
)
def text_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG/embedding prep: split each document into {CHUNK}-token chunks with
    {OVERLAP}-token overlap (the chunking in front of every embed step —
    summarize.py chunks transcripts before the LLM for the same reason).
    Narrow per-row expressions: split → sequence of chunk starts →
    posexplode → slice; no shuffle at all until a downstream op needs one."""
    docs = load(spark, sf_dir, "documents")
    w = F.split("text", " ")
    n_chunks = F.ceil(
        F.greatest(F.size(w) - F.lit(OVERLAP), F.lit(1)) / F.lit(float(STRIDE))
    ).cast("int")
    chunked = docs.select(
        "doc_id",
        w.alias("w"),
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_id"),
    )
    piece = F.slice("w", F.col("chunk_id") * STRIDE + 1, CHUNK)
    return chunked.select(
        "doc_id",
        "chunk_id",
        F.size(piece).cast("int").alias("n_tok"),
        F.array_join(piece, " ").alias("chunk_text"),
    )


BUDGET = 20_000  # whitespace tokens per source


@query(
    "sample_token_budget",
    oracle=f"""
WITH t AS (
  SELECT doc_id, source,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
  FROM documents
),
c AS (
  SELECT doc_id, source, n_tok,
         CAST(sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
                               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tok
  FROM t
)
SELECT doc_id, source, n_tok, cum_tok
FROM c WHERE cum_tok - n_tok < {BUDGET}
""",
)
def sample_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curation: take documents per source, in deterministic order, until the
    source's token budget is spent (the 'mix N tokens of each source' recipe
    behind every pretraining data mix). One keyed window cumsum + filter —
    a doc is admitted while the budget has room when it arrives (the
    admitting doc may overshoot; the next one is cut). No global sort, no
    driver state; each source streams independently."""
    docs = load(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id",
        "source",
        F.size(F.split("text", " ")).cast("long").alias("n_tok"),
    )
    win = Window.partitionBy("source").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        t.withColumn("cum_tok", F.sum("n_tok").over(win))
        .filter(F.col("cum_tok") - F.col("n_tok") < BUDGET)
        .select("doc_id", "source", "n_tok", "cum_tok")
    )


VOCAB_K = 200


@query(
    "text_vocab_topk",
    oracle=f"""
WITH tok AS (SELECT unnest({_TOK_SQL}) AS term FROM documents),
counts AS (SELECT term, CAST(count(*) AS BIGINT) AS n FROM tok GROUP BY term)
SELECT term, n, rk FROM (
  SELECT term, n,
         CAST(row_number() OVER (ORDER BY n DESC, term) AS INT) AS rk
  FROM counts
) WHERE rk <= {VOCAB_K}
""",
)
def text_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary: global token frequencies, top {VOCAB_K} (count
    desc, term asc — fully deterministic). explode → map-side-combined
    count → TakeOrdered; one row per distinct term crosses the shuffle,
    never one per token."""
    docs = load(spark, sf_dir, "documents")
    tok = docs.select(F.explode(F.expr(_TOK_SPARK)).alias("term"))
    counts = tok.groupBy("term").agg(F.count(F.lit(1)).alias("n"))
    # orderBy+limit compiles to TakeOrderedAndProject (distributed per-
    # partition top-K, merged on the driver) — NOT a global-order window,
    # which would funnel every distinct term through one partition. The
    # rank is attached afterwards on the K surviving rows only.
    top = counts.orderBy(F.col("n").desc(), F.col("term")).limit(VOCAB_K)
    w = Window.orderBy(F.col("n").desc(), F.col("term"))
    return top.withColumn("rk", F.row_number().over(w).cast("int")).select(
        "term", "n", "rk"
    )


TOP_TERMS = 3


@query(
    "text_tfidf_topterms",
    oracle=f"""
WITH tok AS (
  SELECT doc_id, unnest({_TOK_SQL}) AS term FROM documents
),
tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
n AS (SELECT count(*) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term,
         round(tf.tf * ln((n.n_docs + 1.0) / (df.df + 1.0)), 6) AS score
  FROM tf JOIN df USING (term) CROSS JOIN n
)
SELECT doc_id, term, score, rk FROM (
  SELECT doc_id, term, score,
         CAST(row_number() OVER (PARTITION BY doc_id
                                 ORDER BY score DESC, term) AS INT) AS rk
  FROM scored
) WHERE rk <= {TOP_TERMS}
""",
)
def text_tfidf_topterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyword extraction: classic TF-IDF, top {TOP_TERMS} terms per document
    (smoothed idf = ln((N+1)/(df+1)); ties broken by term so both engines
    agree exactly). The df table is term-cardinality-sized → broadcast to
    the tf side; N rides along as a broadcast scalar, not a collect."""
    docs = load(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(F.expr(_TOK_SPARK)).alias("term"))
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    # df = rows per term in tf (one row per (doc, term)) — a window count
    # over term instead of a second aggregation + join, so the token stream
    # is scanned and aggregated exactly once
    dfw = Window.partitionBy("term")
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.withColumn("df", F.count(F.lit(1)).over(dfw))
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            F.round(
                F.col("tf") * F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0)), 6
            ).alias("score"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), F.col("term"))
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("int"))
        .filter(F.col("rk") <= TOP_TERMS)
        .select("doc_id", "term", "score", "rk")
    )
