"""Training-data curation pipeline in one plan (the north-star use case):
quality gate → language filter → exact dedup → fingerprint near-dup drop →
token accounting. Every stage is a composition from the operator library and
the whole DAG is SQL-expressible, so the oracle checks it end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nocouncil_etl_spark.functions.text import quality_score, token_count_ws
from nocouncil_etl_spark.io import load
from nocouncil_etl_spark.registry import query

QUALITY_MIN = 0.7
LANGS = ("en", "es")


@query(
    "curation_e2e",
    oracle=f"""
WITH scored AS (
  SELECT doc_id, text, lang, string_split(text, ' ') AS w FROM documents
),
feat AS (
  SELECT doc_id, text, lang, w,
         round((
           (CASE WHEN len(w) BETWEEN 20 AND 1000 THEN 1.0 ELSE 0.5 END)
           + (CASE WHEN list_reduce(list_transform(w, x -> CAST(length(x) AS DOUBLE)), (a, b) -> a + b) / len(w)
                   BETWEEN 3.0 AND 10.0 THEN 1.0 ELSE 0.5 END)
           + least(CAST(len(list_filter(w, x -> list_contains(['the','a','of','and','to'], x))) AS DOUBLE)
                   / len(w) * 5.0, 1.0)
           + CAST(len(list_distinct(w)) AS DOUBLE) / len(w)
         ) / 4.0, 4) AS quality
  FROM scored
),
gated AS (
  SELECT * FROM feat
  WHERE quality >= {QUALITY_MIN} AND lang IN {LANGS!r}
),
exact_kept AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
    FROM gated
  ) WHERE rn = 1
),
fp AS (
  SELECT doc_id, lang, quality, w,
         CASE WHEN len(w) >= 5 THEN
           list_aggregate(
             list_transform(range(1, len(w) - 3),
                            i -> substr(md5(array_to_string(w[i:i+4], ' ')), 1, 16)),
             'min')
         ELSE substr(md5(array_to_string(w, ' ')), 1, 16) END AS fp
  FROM exact_kept
),
final AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn2 FROM fp
  ) WHERE rn2 = 1
)
SELECT doc_id, lang, quality,
       len(regexp_split_to_array(trim(
         (SELECT text FROM documents d WHERE d.doc_id = final.doc_id)), '\\s+')) AS n_tokens,
       fp
FROM final
""",
)
def curation_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """North-star curation DAG as one lazy plan. Stage shapes: quality and
    fingerprint are narrow maps (per-doc expressions); the two dedup stages
    are keep-min-doc hash AGGREGATES (r11 opt — the former
    window-over-hash-key form paid an exchange PLUS a per-key sort per
    stage and shipped every duplicate to the reducer; min_by is the
    groupBy-min form the old docstring already blessed as
    identical-keeps, it partial-aggregates map-side so duplicates
    collapse before the shuffle, and no sort runs at all)."""
    docs = load(spark, sf_dir, "documents")
    ws = F.split("text", " ")
    scored = docs.select(
        "doc_id",
        "text",
        "lang",
        F.round(quality_score("text", ws), 4).alias("quality"),
    )
    gated = scored.filter(
        (F.col("quality") >= QUALITY_MIN) & F.col("lang").isin(*LANGS)
    )
    exact_kept = (
        gated.groupBy(F.md5("text").alias("_k"))
        .agg(
            F.min_by(
                F.struct("doc_id", "text", "lang", "quality"), F.col("doc_id")
            ).alias("_r")
        )
        .select("_r.*")
    )
    from nocouncil_etl_spark.functions.text import fingerprint

    fp = exact_kept.withColumn("fp", fingerprint(F.split("text", " "), gram=5, width=16))
    final = (
        fp.groupBy("fp")
        .agg(
            F.min_by(
                F.struct("doc_id", "lang", "quality", "text"), F.col("doc_id")
            ).alias("_r")
        )
        .select("fp", "_r.*")
    )
    return final.select(
        "doc_id",
        "lang",
        "quality",
        token_count_ws("text").alias("n_tokens"),
        "fp",
    )
