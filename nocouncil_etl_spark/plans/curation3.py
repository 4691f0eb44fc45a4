"""Third curation batch (north-star training-data ops): Gopher-style quality
rules, PII redaction, and intra-document repetition detection — the filters a
100 TB pretraining pipeline runs between raw scrape and dedup. All pure
column expressions (codegen, pushdown-friendly); every ratio divides exact
integer counts so both engines compare identical doubles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nocouncil_etl_spark.functions.text import STOPWORDS
from nocouncil_etl_spark.io import fan_out_if_narrow, load
from nocouncil_etl_spark.registry import query

# Gopher-rule thresholds (Rae et al. 2021 §A1.1 style, tuned to the synthetic
# corpus so both pass and fail populations exist)
MIN_WORDS = 30
MAX_WORDS = 100_000
MAX_MEAN_WORD_LEN = 5.0
MAX_SYMBOL_RATIO = 0.1

_EN_STOPS = ", ".join(f"'{w}'" for w in STOPWORDS["en"])


@query(
    "text_gopher_rules",
    oracle=f"""
WITH ws AS (SELECT doc_id, text, string_split(text, ' ') AS w FROM documents),
m AS (
  SELECT doc_id,
         CAST(len(w) AS BIGINT) AS n_words,
         CAST(list_aggregate(list_transform(w, x -> len(x)), 'sum') AS BIGINT) AS n_chars_in_words,
         CAST(len(regexp_replace(text, '[A-Za-z0-9 ]', '', 'g')) AS BIGINT) AS n_symbols,
         CAST(len(text) AS BIGINT) AS n_chars,
         CAST(len(list_filter(w, x -> list_contains([{_EN_STOPS}], x))) AS BIGINT) AS n_stops
  FROM ws
)
SELECT doc_id, n_words,
       round(n_chars_in_words / CAST(n_words AS DOUBLE), 4) AS mean_word_len,
       round(n_symbols / CAST(n_chars AS DOUBLE), 4) AS symbol_ratio,
       round(n_stops / CAST(n_words AS DOUBLE), 4) AS stopword_frac,
       (n_words BETWEEN {MIN_WORDS} AND {MAX_WORDS}
        AND n_chars_in_words / CAST(n_words AS DOUBLE) <= {MAX_MEAN_WORD_LEN}
        AND n_symbols / CAST(n_chars AS DOUBLE) < {MAX_SYMBOL_RATIO}) AS passes
FROM m
""",
)
def text_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """North-star quality gate: Gopher-style document rules (word-count
    bounds, mean word length, symbol ratio, stopword fraction) as one narrow
    projection — each rule an explicit column so downstream can audit WHY a
    document was dropped, plus the combined pass flag. Ratios divide exact
    integer counts; thresholds compare un-rounded doubles identically on
    both engines. Narrow 1:1 map at cluster scan widths —
    fan_out_if_narrow shuffles only in the local single-small-file case
    where the interpreted HOF pass would otherwise run in one task."""
    docs = fan_out_if_narrow(load(spark, sf_dir, "documents"))
    w = F.split("text", " ")
    n_words = F.size(w).cast("long")
    n_chars_in_words = F.aggregate(
        F.transform(w, lambda x: F.length(x).cast("long")),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )
    n_symbols = F.length(F.regexp_replace("text", "[A-Za-z0-9 ]", "")).cast("long")
    n_chars = F.length("text").cast("long")
    n_stops = F.size(
        F.filter(w, lambda x: x.isin(*STOPWORDS["en"]))
    ).cast("long")
    mean_wl = n_chars_in_words / n_words.cast("double")
    sym_ratio = n_symbols / n_chars.cast("double")
    return docs.select(
        "doc_id",
        n_words.alias("n_words"),
        F.round(mean_wl, 4).alias("mean_word_len"),
        F.round(sym_ratio, 4).alias("symbol_ratio"),
        F.round(n_stops / n_words.cast("double"), 4).alias("stopword_frac"),
        (
            n_words.between(MIN_WORDS, MAX_WORDS)
            & (mean_wl <= MAX_MEAN_WORD_LEN)
            & (sym_ratio < MAX_SYMBOL_RATIO)
        ).alias("passes"),
    )


_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PHONE_RE = r"\+1-555-[0-9]{4}"


@query(
    "text_redact_pii",
    oracle=f"""
WITH body AS (
  SELECT doc_id,
         text || ' contact user' || (doc_id % 7) || '@example.com or +1-555-'
              || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS b
  FROM documents
)
SELECT doc_id,
       regexp_replace(regexp_replace(b, '{_EMAIL_RE}', '[EMAIL]', 'g'),
                      '{_PHONE_RE}', '[PHONE]', 'g') AS redacted,
       CAST(len(regexp_extract_all(b, '{_EMAIL_RE}')) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(b, '{_PHONE_RE}')) AS BIGINT) AS n_phones
FROM body
""",
)
def text_redact_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """North-star PII scrubbing: email/phone redaction with per-doc counts
    (the audit trail). PII markers are synthesized deterministically so the
    redactor provably fires; patterns are RE2-safe so Java and DuckDB match
    identically. At 100 TB this is a narrow map — no shuffle, no UDF
    (fan_out_if_narrow is a no-op at cluster scan widths; it repartitions
    only when the scan plans fewer tasks than the session target, the
    local single-file case where the regex pass would serialize)."""
    docs = fan_out_if_narrow(load(spark, sf_dir, "documents"))
    body = F.concat(
        "text",
        F.lit(" contact user"),
        (F.col("doc_id") % 7).cast("string"),
        F.lit("@example.com or +1-555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    redacted = F.regexp_replace(
        F.regexp_replace(body, _EMAIL_RE, "[EMAIL]"), _PHONE_RE, "[PHONE]"
    )
    return docs.select(
        "doc_id",
        redacted.alias("redacted"),
        F.size(F.regexp_extract_all(body, F.lit(_EMAIL_RE), 0)).cast("long").alias("n_emails"),
        F.size(F.regexp_extract_all(body, F.lit(_PHONE_RE), 0)).cast("long").alias("n_phones"),
    )


@query(
    "text_repetition",
    oracle="""
WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
m AS (
  SELECT doc_id,
         CAST(len(w) AS BIGINT) AS n_words,
         CAST(len(list_distinct(w)) AS BIGINT) AS n_distinct
  FROM ws
)
SELECT doc_id, n_words, n_distinct,
       round(1 - n_distinct / CAST(n_words AS DOUBLE), 4) AS rep_ratio,
       (1 - n_distinct / CAST(n_words AS DOUBLE)) > 0.5 AS repetitive
FROM m
""",
)
def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """North-star repetition detection: duplicate-word fraction per document
    (the cheap tier of repeated-span filtering — high-rep docs are boilerplate
    or generation loops). Pure integer counts; one narrow map."""
    docs = load(spark, sf_dir, "documents")
    w = F.split("text", " ")
    n_words = F.size(w).cast("long")
    n_distinct = F.size(F.array_distinct(w)).cast("long")
    rep = 1 - n_distinct / n_words.cast("double")
    return docs.select(
        "doc_id",
        n_words.alias("n_words"),
        n_distinct.alias("n_distinct"),
        F.round(rep, 4).alias("rep_ratio"),
        (rep > 0.5).alias("repetitive"),
    )
