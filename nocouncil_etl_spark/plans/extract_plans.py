"""Content-extraction cascade (SURVEY.md §2.9 E10).

The reference tries trafilatura → selenium → BeautifulSoup in order and takes
the first extractor that yields usable text (newscrawler.py:187-299). The
engine expresses the cascade as a coalesce over per-extractor columns — one
pass, no branching control flow, and the 'which extractor won' lineage is a
first-class column. Extractor availability is simulated deterministically so
the oracle sees identical behavior.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nocouncil_etl_spark.io import load
from nocouncil_etl_spark.registry import query


@query(
    "extract_cascade",
    oracle="""
WITH tries AS (
  SELECT doc_id,
         CASE WHEN doc_id % 3 <> 0 THEN trim(substring(text, 1, 120)) END AS t_trafilatura,
         CASE WHEN lang <> 'zh' THEN upper(substring(text, 1, 60)) END AS t_selenium,
         substring(text, 1, 30) AS t_bs4
  FROM documents
)
SELECT doc_id,
       coalesce(t_trafilatura, t_selenium, t_bs4) AS content,
       CASE WHEN t_trafilatura IS NOT NULL THEN 'trafilatura'
            WHEN t_selenium IS NOT NULL THEN 'selenium'
            ELSE 'bs4' END AS extractor
FROM tries
""",
)
def extract_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E10: first-success extractor cascade as coalesce of per-extractor
    columns (newscrawler.py:187-299). Each 'extractor' is a deterministic
    column expression standing in for an HTTP+parse UDF; in production each
    would be a mapInPandas stage and the coalesce shape is unchanged."""
    docs = load(spark, sf_dir, "documents")
    t_traf = F.when(F.col("doc_id") % 3 != 0, F.trim(F.substring("text", 1, 120)))
    t_sel = F.when(F.col("lang") != "zh", F.upper(F.substring("text", 1, 60)))
    t_bs4 = F.substring("text", 1, 30)
    extractor = (
        F.when(t_traf.isNotNull(), "trafilatura")
        .when(t_sel.isNotNull(), "selenium")
        .otherwise("bs4")
    )
    return docs.select(
        "doc_id",
        F.coalesce(t_traf, t_sel, t_bs4).alias("content"),
        extractor.alias("extractor"),
    )


@query(
    "extract_html_real",
    oracle="""
SELECT doc_id,
       CASE WHEN text IS NULL OR trim(text) = '' THEN '' ELSE text END AS content,
       CASE WHEN text IS NULL OR trim(text) = '' THEN 'none' ELSE 'builtin' END AS extractor,
       CAST(NULL AS VARCHAR) AS error
FROM documents
""",
)
def extract_html_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S7/E10 through the REAL extraction seam: wrap each document in HTML
    (tags + script/style/comment noise), run the mapInPandas extractor
    cascade (operators/backends.make_extract_html_map — production rungs are
    trafilatura/bs4, import-guarded), and recover exactly the original text
    via the stdlib rung. The corpus is entity-free and single-spaced
    (checked), so extraction is the identity — the oracle pins the full
    plumbing without reimplementing the stripper in SQL. Degenerate rows
    (null/whitespace-only text) extract to '' with extractor='none' on both
    sides, so a future fixture with empty documents stays digest-green."""
    from nocouncil_etl_spark.operators.backends import (
        HTML_EXTRACT_FAKE,
        HTML_EXTRACT_SCHEMA,
        make_extract_html_map,
        resolve_backend,
    )

    backend = resolve_backend(spark, "extractBackend", HTML_EXTRACT_FAKE)
    docs = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.lit("<html><head><style>p{}</style></head><body>"
                  "<script>var x=1;</script><!-- boilerplate --><p>"),
            "text",
            F.lit("</p></body></html>"),
        ).alias("html"),
    )
    return docs.mapInPandas(
        make_extract_html_map(backend), schema=HTML_EXTRACT_SCHEMA
    )
