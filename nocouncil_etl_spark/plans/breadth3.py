"""Breadth batch 3: URL parsing, JSON struct encode/decode roundtrip, map
(dictionary) column operations — the semi-structured surface the reference
touches in its crawler (URLs at newscrawler.py; JSON payloads throughout).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from nocouncil_etl_spark.io import load
from nocouncil_etl_spark.registry import query


@query(
    "fn_url_parse",
    oracle="""
WITH u AS (
  SELECT doc_id,
         'https://ex' || (doc_id % 7) || '.org/p/' || doc_id || '?lang=' || lang AS url
  FROM documents
)
SELECT doc_id,
       regexp_extract(url, '^https?://([^/]+)', 1) AS host,
       regexp_extract(url, '^https?://[^/?]+(/[^?]*)', 1) AS path,
       regexp_extract(url, '\\?(.*)$', 1) AS query
FROM u
""",
)
def fn_url_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL decomposition via Spark's native parse_url (host/path/query) —
    the crawler's URL handling (sha16(url) keys, feed URLs) as expressions;
    the oracle recomputes with regexes."""
    docs = load(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://ex"),
        (F.col("doc_id") % 7).cast("string"),
        F.lit(".org/p/"),
        F.col("doc_id").cast("string"),
        F.lit("?lang="),
        F.col("lang"),
    )
    return docs.select(
        "doc_id",
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY")).alias("query"),
    )


@query(
    "fn_json_struct_roundtrip",
    oracle="""
SELECT doc_id, source AS src_back, n_chars AS nc_back, lang AS lang_back
FROM documents
""",
)
def fn_json_struct_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured encode/decode: struct → to_json → from_json (declared
    schema) → fields. Matching the identity oracle proves the JSON codec
    path is lossless — the engine's interchange for nested payloads."""
    docs = load(spark, sf_dir, "documents")
    payload = F.to_json(F.struct("source", "n_chars", "lang"))
    schema = T.StructType(
        [
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
            T.StructField("lang", T.StringType()),
        ]
    )
    parsed = F.from_json(payload, schema)
    return docs.select(
        "doc_id",
        parsed["source"].alias("src_back"),
        parsed["n_chars"].alias("nc_back"),
        parsed["lang"].alias("lang_back"),
    )


@query(
    "fn_map_ops",
    oracle="""
SELECT doc_id,
       'lang=' || lang || ',len=' || n_chars || ',src=' || source AS entries,
       3 AS n_keys,
       lang AS lang_val
FROM documents
""",
)
def fn_map_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-column surface: map_from_entries → map_concat → transform via
    element_at / map_entries, serialized as sorted k=v pairs so the oracle
    (which has no shared map literal syntax) compares strings."""
    docs = load(spark, sf_dir, "documents")
    base = F.map_from_entries(
        F.array(
            F.struct(F.lit("lang").alias("key"), F.col("lang").alias("value")),
            F.struct(F.lit("len").alias("key"), F.col("n_chars").cast("string").alias("value")),
        )
    )
    m = F.map_concat(
        base,
        F.create_map(F.lit("src"), F.col("source")),
    )
    entries = F.array_join(
        F.array_sort(
            F.transform(F.map_entries(m), lambda e: F.concat(e.key, F.lit("="), e.value))
        ),
        ",",
    )
    return docs.select(
        "doc_id",
        entries.alias("entries"),
        F.size(m).alias("n_keys"),
        F.element_at(m, "lang").alias("lang_val"),
    )
