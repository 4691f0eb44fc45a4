"""Articles pipeline: crawl → dedup gate → relevance filter → extract →
preview → embed → index (newscrawler.py + article_vectorize.py end-to-end).

Stage mapping: ingest (S6/S7 via injected fetcher or an existing corpus) →
J4 anti-join against the seen-set → P7 keyword relevance → E10 extraction
cascade → P6 min-length gate → F3 id mint → P10 preview → E1 embed → K4
upsert. One lazy plan; the seen-set is a parquet table at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nocouncil_etl_spark.io import load
from nocouncil_etl_spark.functions.text import KEYWORDS
from nocouncil_etl_spark.operators.models import embed_text_udf

MIN_CONTENT_CHARS = 100  # newscrawler.py:382-384


def articles_pipeline(
    spark: SparkSession, sf_dir: str, seen: DataFrame | None = None
) -> DataFrame:
    """documents as the fetched-article corpus → indexed article table."""
    docs = load(spark, sf_dir, "documents")
    arts = docs.select(
        F.substring(F.sha2(F.concat(F.lit("url://"), "doc_id"), 256), 1, 16).alias("id"),
        F.col("source"),
        F.col("text").alias("content"),
        F.col("lang"),
    )
    if seen is not None:  # J4 dedup gate across runs
        arts = arts.join(seen.select("id"), "id", "left_anti")

    kw = F.array(*[F.lit(k) for k in KEYWORDS])
    matched = F.filter(kw, lambda k: F.lower(F.col("content")).contains(k))
    relevant = (
        arts.withColumn("matched_kw", F.array_join(matched, ","))
        .filter(F.size(matched) > 0)  # P7
        .filter(F.length(F.trim("content")) >= MIN_CONTENT_CHARS)  # P6
    )
    preview = F.when(
        F.length("content") > 200,
        F.concat(F.substring("content", 1, 200), F.lit("...")),
    ).otherwise(F.col("content"))
    return relevant.select(
        "id",
        "source",
        "lang",
        "matched_kw",
        preview.alias("content_preview"),
        embed_text_udf("content").alias("embedding"),
    )
