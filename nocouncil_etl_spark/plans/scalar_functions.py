"""Scalar string / regex / hash / date functions (SURVEY.md §2.4 F1-F13).

All JVM-side built-ins — no Python in the hot path. Each query exercises one
function family over the synthetic tables with a DuckDB-identical oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nocouncil_etl_spark.io import load
from nocouncil_etl_spark.registry import query


@query(
    "fn_regex_extract",
    oracle="""
SELECT event_id,
       regexp_extract(props, '"k": ([0-9]+)', 1) AS k_digits,
       regexp_extract(event_type, '^([a-z]{3})', 1) AS type_prefix
FROM events
""",
)
def fn_regex_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1: regex group extraction (date/time out of listing text at
    transcribe_council.py:22-26; URL out of onclick at :56-58)."""
    ev = load(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.regexp_extract("props", '"k": ([0-9]+)', 1).alias("k_digits"),
        F.regexp_extract("event_type", "^([a-z]{3})", 1).alias("type_prefix"),
    )


@query(
    "fn_regex_replace",
    oracle="""
SELECT doc_id,
       regexp_replace(substring(text, 1, 60), '[aeiou]', '*', 'g') AS redacted,
       regexp_replace(source, 'src', 'feed_', 'g') AS feed
FROM documents
""",
)
def fn_regex_replace(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2: regex replace (filename rewrites `.mp4`→`.txt` at
    transcribe_council.py:125-126, summarize.py:172-173; Box URL rewrite at
    get_box_links.py:58-59 — we use literal-dot semantics, SURVEY §7.3-3)."""
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.regexp_replace(F.substring("text", 1, 60), "[aeiou]", "*").alias("redacted"),
        F.regexp_replace("source", "src", "feed_").alias("feed"),
    )


@query(
    "fn_hash_id",
    oracle="""
SELECT doc_id, substring(sha256(text), 1, 16) AS fp
FROM documents
""",
)
def fn_hash_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3: 16-hex sha-256 prefix fingerprint — the reference's dedup id mint
    (newscrawler.py:59-61)."""
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", F.substring(F.sha2("text", 256), 1, 16).alias("fp")
    )


@query(
    "fn_basename",
    oracle="""
SELECT doc_id,
       regexp_extract('bucket/' || source || '/f' || doc_id || '.mp4', '([^/]+)$', 1) AS base,
       regexp_replace(regexp_extract('bucket/' || source || '/f' || doc_id || '.mp4', '([^/]+)$', 1),
                      '\\.mp4$', '.txt') AS txt_name
FROM documents
""",
)
def fn_basename(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4: basename / path ops (os.path.basename at transcribe_council.py:117;
    `filename.split('/')[-1]` at vectorize.py:63, get_box_links.py:65)."""
    docs = load(spark, sf_dir, "documents")
    path = F.concat(F.lit("bucket/"), F.col("source"), F.lit("/f"), F.col("doc_id"), F.lit(".mp4"))
    base = F.regexp_extract(path, "([^/]+)$", 1)
    return docs.select(
        "doc_id",
        base.alias("base"),
        F.regexp_replace(base, r"\.mp4$", ".txt").alias("txt_name"),
    )


@query(
    "fn_whitespace_norm",
    oracle="""
SELECT doc_id,
       trim(regexp_replace(substring(text, 1, 40) || '  padded   tail ', '\\s+', ' ', 'g')) AS norm
FROM documents
""",
)
def fn_whitespace_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5: whitespace normalization (`' '.join(text.split())` at
    transcribe_council.py:48; strip() at newscrawler.py:177,390)."""
    docs = load(spark, sf_dir, "documents")
    messy = F.concat(F.substring("text", 1, 40), F.lit("  padded   tail "))
    return docs.select(
        "doc_id", F.trim(F.regexp_replace(messy, r"\s+", " ")).alias("norm")
    )


@query(
    "fn_slug_template",
    oracle="""
SELECT doc_id,
       lang || '_' || source || '_' ||
         substring(regexp_replace(substring(text, 1, 80), '[^A-Za-z0-9 _-]', '', 'g'), 1, 50) AS filename
FROM documents
""",
)
def fn_slug_template(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F7+F8: charset-clean slug + filename templating
    (newscrawler.py:404-407: keep alnum/space/dash/underscore, truncate 50,
    then `f"{date}_{key}_{title}.md"`)."""
    docs = load(spark, sf_dir, "documents")
    slug = F.substring(
        F.regexp_replace(F.substring("text", 1, 80), "[^A-Za-z0-9 _-]", ""), 1, 50
    )
    return docs.select(
        "doc_id", F.concat_ws("_", F.col("lang"), F.col("source"), slug).alias("filename")
    )


@query(
    "fn_rfc2822_parse",
    oracle="""
WITH pub AS (
  SELECT event_id,
         CASE WHEN event_id % 7 = 0 THEN 'not a real date'
              ELSE strftime(ts, '%d %b %Y %H:%M:%S') || ' +0000' END AS published
  FROM events
)
SELECT event_id, CAST(epoch(try_strptime(published, '%d %b %Y %H:%M:%S %z')) AS BIGINT) AS published_unix
FROM pub
""",
)
def fn_rfc2822_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F9+F10: RFC-2822-style date string → unix seconds, null on parse
    failure (article_vectorize.py:29-42 try/except→None; unix int at
    vectorize.py:95). Inputs are synthesized from `events.ts` with a malformed
    value every 7th row to exercise the null path."""
    ev = load(spark, sf_dir, "events")
    published = F.when(F.col("event_id") % 7 == 0, F.lit("not a real date")).otherwise(
        F.concat(F.date_format("ts", "dd MMM yyyy HH:mm:ss"), F.lit(" +0000"))
    )
    parsed = F.try_to_timestamp(published, F.lit("dd MMM yyyy HH:mm:ss Z"))
    return ev.select(
        "event_id", parsed.cast("long").alias("published_unix")
    )


@query(
    "fn_date_parts",
    oracle="""
SELECT o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS order_day,
       substring(strftime(o_orderdate, '%Y-%m-%d'), 1, 7) AS order_month,
       epoch_us(date_trunc('hour', o_orderdate)) AS hour_bucket_us,
       year(o_orderdate) AS yr, month(o_orderdate) AS mo, dayofweek(o_orderdate) % 7 AS dow
FROM orders
""",
)
def fn_date_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F11+F12: date formatting, prefix slicing, truncation, calendar parts
    (ISO timestamps newscrawler.py:399; `published[:10]` at :404).
    DuckDB dayofweek is 0=Sun..6; Spark dayofweek is 1=Sun..7 → normalized
    to 0-based on both sides."""
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_day"),
        F.substring(F.date_format("o_orderdate", "yyyy-MM-dd"), 1, 7).alias("order_month"),
        F.unix_micros(F.date_trunc("hour", "o_orderdate")).alias("hour_bucket_us"),
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        (F.dayofweek("o_orderdate") - 1).alias("dow"),
    )
