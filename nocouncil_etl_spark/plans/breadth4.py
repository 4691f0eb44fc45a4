"""Breadth batch 4: time-range window frames and blocked fuzzy matching.

- ``window_range_time_sum`` — a true RANGE frame over event time (trailing
  10 minutes), as opposed to the ROWS frames elsewhere: the frame is defined
  by a time interval, so bursty series get wide frames and sparse series
  narrow ones. Both engines order by epoch-µs BIGINT so the range arithmetic
  is integer-identical.
- ``join_fuzzy_dedup`` — edit-distance near-duplicate pairing with blocking:
  candidates must share (lang, 4-char prefix, length bucket) before the
  Levenshtein kernel runs — the classic entity-resolution shape that keeps
  the quadratic inside blocks. Typo'd copies are synthesized (one character
  overwritten) so the matcher provably fires.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nocouncil_etl_spark.io import load
from nocouncil_etl_spark.registry import query

RANGE_US = 600_000_000  # 10 minutes
LEV_MAX = 3
PREFIX = 40


@query(
    "window_range_time_sum",
    oracle=f"""
SELECT event_id, user_id,
       count(*) OVER w AS frame_n,
       CAST(round(sum(CAST(value AS DECIMAL(18,6))) OVER w, 2) AS DOUBLE) AS trail_sum
FROM (SELECT event_id, user_id, value, epoch_us(ts) AS tus FROM events)
WINDOW w AS (PARTITION BY user_id ORDER BY tus
             RANGE BETWEEN {RANGE_US} PRECEDING AND CURRENT ROW)
""",
)
def window_range_time_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-10-minute per-user sum as a RANGE window frame over epoch-µs:
    the frame width is a time interval, not a row count — the semantics a
    rate limiter or sliding SLA monitor needs. Equal-timestamp peers are in
    the same frame by RANGE definition, identically in both engines; the
    frame sum is decimal-exact so engine-internal combine order can't move
    the rounded value.

    Scale shape: one user_id shuffle + an ordered scan per partition; RANGE
    frames evaluate incrementally over the sorted run."""
    ev = load(spark, sf_dir, "events").select(
        "event_id", "user_id", "value", F.unix_micros("ts").alias("tus")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("tus")
        .rangeBetween(-RANGE_US, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(w).alias("frame_n"),
        F.round(F.sum(F.col("value").cast("decimal(18,6)")).over(w), 2)
        .cast("double")
        .alias("trail_sum"),
    )


_FUZZY_AUG = """
SELECT doc_id, lang, n_chars, text FROM documents
UNION ALL
SELECT doc_id + 300000, lang, n_chars,
       substr(text, 1, 5) || 'X' || substr(text, 7) AS text
FROM documents WHERE doc_id % 10 = 0
"""


@query(
    "join_fuzzy_dedup",
    oracle=f"""
WITH aug AS ({_FUZZY_AUG}),
keyed AS (
  SELECT doc_id, lang, text,
         substr(text, 1, 4) AS pfx, n_chars // 8 AS lb
  FROM aug
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       levenshtein(substr(a.text, 1, {PREFIX}), substr(b.text, 1, {PREFIX})) AS lev
FROM keyed a
JOIN keyed b
  ON a.lang = b.lang AND a.pfx = b.pfx AND a.lb = b.lb AND a.doc_id < b.doc_id
WHERE levenshtein(substr(a.text, 1, {PREFIX}), substr(b.text, 1, {PREFIX})) <= {LEV_MAX}
""",
)
def join_fuzzy_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy near-duplicate pairing: candidates share language,
    4-char prefix and an 8-char length bucket (a one-character overwrite at
    position 6 preserves all three, so the planted typo copies are provably
    reachable), then a 40-char-prefix Levenshtein ≤ {LEV_MAX} confirms.

    Scale shape: the blocking key turns the all-pairs comparison into an
    equi-join; Levenshtein (quadratic per pair) runs only inside blocks —
    the standard entity-resolution discipline. Both engines' levenshtein is
    plain edit distance, so the kernel is integer-portable."""
    docs = load(spark, sf_dir, "documents")
    copies = docs.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 300000).alias("doc_id"),
        "lang",
        "n_chars",
        F.concat(
            F.substring("text", 1, 5), F.lit("X"), F.expr("substr(text, 7)")
        ).alias("text"),
    )
    aug = docs.select("doc_id", "lang", "n_chars", "text").unionByName(copies)
    keyed = aug.select(
        "doc_id",
        "lang",
        "text",
        F.substring("text", 1, 4).alias("pfx"),
        F.expr("n_chars div 8").alias("lb"),
    )
    a = keyed.select(
        F.col("doc_id").alias("id_a"), "lang", "pfx", "lb", F.col("text").alias("ta")
    )
    b = keyed.select(
        F.col("doc_id").alias("id_b"),
        F.col("lang").alias("lang_b"),
        F.col("pfx").alias("pfx_b"),
        F.col("lb").alias("lb_b"),
        F.col("text").alias("tb"),
    )
    lev = F.levenshtein(F.substring("ta", 1, PREFIX), F.substring("tb", 1, PREFIX))
    return (
        a.join(
            b,
            (F.col("lang") == F.col("lang_b"))
            & (F.col("pfx") == F.col("pfx_b"))
            & (F.col("lb") == F.col("lb_b"))
            & (F.col("id_a") < F.col("id_b")),
        )
        .select("id_a", "id_b", lev.alias("lev"))
        .filter(F.col("lev") <= LEV_MAX)
    )