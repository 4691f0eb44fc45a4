"""Relational core: projections, filters, derived columns, limits, unions.

Covers SURVEY.md §2.3 (P1-P12) and §2.8 (O1/O4). Every query is a pure
declarative plan — filters and projections reach the parquet scan via
Catalyst pushdown (verified in tests/test_plans.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nocouncil_etl_spark.io import load
from nocouncil_etl_spark.registry import query

from nocouncil_etl_spark.functions.text import KEYWORDS  # P7 keyword set


@query(
    "scan_project",
    oracle="""
SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
FROM orders
WHERE o_orderstatus = 'F'
""",
)
def scan_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1+P1+P4: scan → column projection → membership filter.

    Reference: pd.read_json + column access (transcribe_council.py:96,
    vectorize.py:94); filter on required field (transcribe_council.py:70-71).
    Filter + projection push down to the parquet scan.
    """
    return (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    )


@query(
    "filter_threshold",
    oracle="""
SELECT event_id, event_type, value
FROM events
WHERE value < 20.0
""",
)
def filter_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5: threshold filter (no_speech_prob < 0.2 at summarize.py:20-25)."""
    return (
        load(spark, sf_dir, "events")
        .filter(F.col("value") < F.lit(20.0))
        .select("event_id", "event_type", "value")
    )


@query(
    "filter_min_length",
    oracle="""
SELECT doc_id, n_chars
FROM documents
WHERE length(trim(text)) >= 300
""",
)
def filter_min_length(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6: min-length filter (len(text) < 100 skip at newscrawler.py:382-384,
    summarize.py:119-121, vectorize.py:77)."""
    return (
        load(spark, sf_dir, "documents")
        .filter(F.length(F.trim(F.col("text"))) >= 300)
        .select("doc_id", "n_chars")
    )


@query(
    "filter_json_field",
    oracle="""
SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val
FROM events
WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) > 50
""",
)
def filter_json_field(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3+F13: JSON field access + null-safe predicate.

    Reference parses JSON per line (summarize.py:175, vectorize.py:76); the
    engine keeps JSON as a string column and projects fields lazily.
    """
    ev = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return ev.select("event_id", k.alias("k_val")).filter(F.col("k_val") > 50)


@query(
    "keyword_relevance",
    oracle=f"""
SELECT doc_id,
       array_to_string(
         list_filter({list(KEYWORDS)!r}, k -> contains(lower(text), k)), ',') AS matched_kw
FROM documents
WHERE len(list_filter({list(KEYWORDS)!r}, k -> contains(lower(text), k))) > 0
""",
)
def keyword_relevance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7+E11: keyword-relevance filter reporting WHICH keywords matched
    (newscrawler.py:48-57,301-311). Higher-order filter over a literal array
    stays in whole-stage codegen — no UDF."""
    docs = load(spark, sf_dir, "documents")
    kw = F.array(*[F.lit(k) for k in KEYWORDS])
    matched = F.filter(kw, lambda k: F.lower(F.col("text")).contains(k))
    return (
        docs.select("doc_id", F.array_join(matched, ",").alias("matched_kw"))
        .filter(F.length("matched_kw") > 0)
    )


@query(
    "preview_substring",
    oracle="""
SELECT doc_id,
       CASE WHEN length(text) > 50 THEN substring(text, 1, 50) || '...'
            ELSE text END AS preview
FROM documents
""",
)
def preview_substring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P10: content preview `content[:200] + '...'` (newscrawler.py:400)."""
    docs = load(spark, sf_dir, "documents")
    preview = F.when(
        F.length("text") > 50, F.concat(F.substring("text", 1, 50), F.lit("..."))
    ).otherwise(F.col("text"))
    return docs.select("doc_id", preview.alias("preview"))


@query(
    "conditional_classify",
    oracle="""
SELECT event_id,
       CASE WHEN event_type = 'purchase' AND value > 100 THEN 'big_purchase'
            WHEN event_type = 'purchase' THEN 'small_purchase'
            WHEN event_type = 'error' THEN 'incident'
            ELSE 'engagement' END AS klass
FROM events
""",
)
def conditional_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P11: conditional classification via when-chain (URL classification at
    transcribe_council.py:61-68)."""
    ev = load(spark, sf_dir, "events")
    klass = (
        F.when((F.col("event_type") == "purchase") & (F.col("value") > 100), "big_purchase")
        .when(F.col("event_type") == "purchase", "small_purchase")
        .when(F.col("event_type") == "error", "incident")
        .otherwise("engagement")
    )
    return ev.select("event_id", klass.alias("klass"))


@query(
    "coalesce_fallback",
    oracle="""
SELECT doc_id,
       coalesce(nullif(lang, 'en'), nullif(source, 'src0'), 'doc_' || doc_id) AS resolved_id
FROM documents
""",
)
def coalesce_fallback(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P12: coalesce fallback chain (`article.get('id') or url or f"article_{i}"`
    at article_vectorize.py:249; title fallback newscrawler.py:380)."""
    docs = load(spark, sf_dir, "documents")
    resolved = F.coalesce(
        F.nullif(F.col("lang"), F.lit("en")),
        F.nullif(F.col("source"), F.lit("src0")),
        F.concat(F.lit("doc_"), F.col("doc_id")),
    )
    return docs.select("doc_id", resolved.alias("resolved_id"))


@query(
    "union_sources",
    oracle="""
SELECT event_id, 'incident' AS src, value FROM events WHERE event_type = 'error'
UNION ALL
SELECT event_id, 'activity' AS src, value FROM events WHERE event_type <> 'error'
""",
)
def union_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O4: multi-source union (RSS feed chaining newscrawler.py:41-45,158-180;
    JSON+md article merge article_vectorize.py:189-201)."""
    ev = load(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "error").select(
        "event_id", F.lit("incident").alias("src"), "value"
    )
    b = ev.filter(F.col("event_type") != "error").select(
        "event_id", F.lit("activity").alias("src"), "value"
    )
    return a.unionByName(b)


@query(
    "top_n_orders",
    oracle="""
SELECT o_orderkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 10
""",
)
def top_n_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1: sort-based top-N with deterministic tie-break (head/preview limits
    at newscrawler.py:108-110,133-135). Spark plans this as TakeOrderedAndProject
    — no global sort, scales to any row count."""
    return (
        load(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
    )
