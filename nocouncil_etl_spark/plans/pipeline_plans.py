"""Driver-visible end-to-end pipeline queries, each with a full DuckDB SQL
oracle: the whole council DAG (media → transcribe → chunk-summarize → rollup
gate → vectorize), its top-k consumer, and the articles DAG (dedup gate →
relevance → preview → embed) are SQL-expressible because every model op runs
the deterministic backend whose kernel the oracle recomputes (SURVEY §5.2-2).
Structural invariants are additionally asserted in tests/test_pipelines.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nocouncil_etl_spark.functions.text import KEYWORDS
from nocouncil_etl_spark.operators.models import (
    EMBED_DIM,
    MAX_QUOTES,
    QUOTE_MIN_LEN,
    SEGMENT_BYTES,
    SUMMARY_WORDS,
    hash_projection_embed,
)
from nocouncil_etl_spark.pipelines.articles import MIN_CONTENT_CHARS, articles_pipeline
from nocouncil_etl_spark.pipelines.council import (
    CHUNK_SIZE,
    NO_SPEECH_THRESHOLD,
    council_pipeline,
    topk_stage,
)
from nocouncil_etl_spark.plans.model_plans import _sql_embed_dim
from nocouncil_etl_spark.registry import query

TOPK_QUERY_TEXT = "spark query window stream table"
TOPK_K = 5

# Stages shared by the council oracles. ASCII corpus ⇒ byte and char windows
# coincide, so substr() reproduces the byte-window transcriber exactly.
_COUNCIL_INDEX_SQL = f"""
m AS (
  SELECT doc_id, text,
         greatest(1, CAST(ceil(octet_length(encode(text)) / {SEGMENT_BYTES}.0) AS BIGINT)) AS nseg
  FROM documents
),
segs AS (
  SELECT doc_id, text, CAST(unnest(range(0, nseg)) AS INT) AS seg_id FROM m
),
seg2 AS (
  SELECT 'v' || doc_id || '.mp4' AS file,
         seg_id AS id,
         substr(text, seg_id * {SEGMENT_BYTES} + 1, {SEGMENT_BYTES}) AS txt,
         ((doc_id * 7 + seg_id) % 10) / 10.0 AS nsp
  FROM segs
),
chunks AS (
  SELECT file, CAST(floor(id / {CHUNK_SIZE}) AS BIGINT) AS chunk,
         coalesce(string_agg(CASE WHEN nsp < {NO_SPEECH_THRESHOLD} THEN txt END,
                             ' ' ORDER BY id), '') AS chunk_text,
         min(id) AS start_id, max(id) AS end_id
  FROM seg2
  GROUP BY 1, 2
),
kept AS (SELECT * FROM chunks WHERE length(trim(chunk_text)) >= 2),
detail AS (
  SELECT file, chunk, start_id, end_id,
         array_to_string((string_split(chunk_text, ' '))[1:{SUMMARY_WORDS}], ' ') AS summary,
         coalesce(array_to_string(
           list_filter(string_split(chunk_text, ' '),
                       w -> length(w) >= {QUOTE_MIN_LEN})[1:{MAX_QUOTES}],
           '|||'), '') AS quotes
  FROM kept
),
vecsrc AS (
  SELECT file || ':' || start_id AS id, summary AS document, quotes,
         start_id, end_id, string_split(summary, ' ') AS ws
  FROM detail
  WHERE length(trim(summary)) > 0
),
vec AS (
  SELECT id, document, quotes, start_id, end_id,
         [{", ".join(_sql_embed_dim(d) for d in range(EMBED_DIM))}] AS v
  FROM vecsrc
),
vecn AS (
  SELECT *, sqrt(list_reduce(list_transform(v, x -> x * x), (a, b) -> a + b)) AS norm
  FROM vec
)
"""


@query(
    "pipeline_council_e2e",
    oracle=f"""
WITH {_COUNCIL_INDEX_SQL}
SELECT id, document, quotes, start_id, end_id,
       round(v[1] / norm, 6) AS e0,
       round(v[2] / norm, 6) AS e1
FROM vecn
""",
)
def pipeline_council_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's whole council DAG on this engine: media → transcribe →
    chunk-summarize (with the G3 bounds quirk) → rollup → vectorize → index.
    Returns the vector-index table (embedding reported as first dims)."""
    index = council_pipeline(spark, sf_dir)
    return index.select(
        "id",
        "document",
        "quotes",
        "start_id",
        "end_id",
        F.round(F.element_at("embedding", 1), 6).alias("e0"),
        F.round(F.element_at("embedding", 2), 6).alias("e1"),
    )


def _q_vec_sql() -> str:
    """The top-k query embedding as a literal DOUBLE[]: the SAME Python
    kernel the Arrow UDF runs, evaluated at plan-build time (shortest-repr
    literals round-trip exactly)."""
    qv = hash_projection_embed(TOPK_QUERY_TEXT)
    return "[" + ", ".join(repr(x) for x in qv) + "]::DOUBLE[]"


@query(
    "pipeline_council_topk",
    oracle=f"""
WITH {_COUNCIL_INDEX_SQL},
norme AS (
  SELECT id, document, list_transform(v, x -> x / norm) AS e FROM vecn
),
scored AS (
  SELECT id, document,
         round(list_dot_product(e, {_q_vec_sql()})
               / (sqrt(list_dot_product(e, e))
                  * sqrt(list_dot_product({_q_vec_sql()}, {_q_vec_sql()}))), 6) AS sim
  FROM norme
)
SELECT id, document, sim, rk FROM (
  SELECT id, document, sim,
         CAST(row_number() OVER (ORDER BY sim DESC, id) AS INT) AS rk
  FROM scored
) WHERE rk <= {TOPK_K}
""",
)
def pipeline_council_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index + similarity query — the downstream consumer the reference
    serves via Chroma HNSW, here exact top-k over the built index."""
    index = council_pipeline(spark, sf_dir)
    return topk_stage(index, TOPK_QUERY_TEXT, k=TOPK_K).select(
        "id", "document", "sim", "rk"
    )


@query(
    "pipeline_articles_e2e",
    oracle=f"""
WITH arts AS (
  SELECT substr(sha256('url://' || doc_id), 1, 16) AS id,
         source, text AS content
  FROM documents
),
rel AS (
  SELECT id, source, content,
         list_filter({list(KEYWORDS)},
                     k -> contains(lower(content), k)) AS matched
  FROM arts
),
keep AS (
  SELECT * FROM rel
  WHERE len(matched) > 0 AND length(trim(content)) >= {MIN_CONTENT_CHARS}
),
emb AS (
  SELECT id, source,
         array_to_string(matched, ',') AS matched_kw,
         CASE WHEN length(content) > 200
              THEN substr(content, 1, 200) || '...'
              ELSE content END AS content_preview,
         string_split(content, ' ') AS ws
  FROM keep
),
vec AS (
  SELECT id, source, matched_kw, content_preview,
         [{", ".join(_sql_embed_dim(d) for d in range(EMBED_DIM))}] AS v
  FROM emb
)
SELECT id, source, matched_kw, content_preview,
       round(v[1] / sqrt(list_reduce(list_transform(v, x -> x * x),
                                     (a, b) -> a + b)), 6) AS e0
FROM vec
""",
)
def pipeline_articles_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """newscrawler→article_vectorize end-to-end: dedup gate → relevance →
    preview → embed."""
    out = articles_pipeline(spark, sf_dir)
    return out.select(
        "id",
        "source",
        "matched_kw",
        "content_preview",
        F.round(F.element_at("embedding", 1), 6).alias("e0"),
    )
