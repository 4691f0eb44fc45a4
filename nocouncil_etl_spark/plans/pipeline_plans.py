"""Driver-visible end-to-end pipeline queries (rows-only checks — the full
DAGs are not single SQL statements; structural invariants are asserted in
tests/test_pipelines.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nocouncil_etl_spark.pipelines.articles import articles_pipeline
from nocouncil_etl_spark.pipelines.council import council_pipeline, topk_stage
from nocouncil_etl_spark.registry import query


@query("pipeline_council_e2e")
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


@query("pipeline_council_topk")
def pipeline_council_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index + similarity query — the downstream consumer the reference
    serves via Chroma HNSW, here exact top-k over the built index."""
    index = council_pipeline(spark, sf_dir)
    return topk_stage(index, "spark query window stream table", k=5)


@query("pipeline_articles_e2e")
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
