"""Grouped chunk-summarize query — the MeetingSummarizer.forward shape
(one group in → chunk rows + rollup out) through applyInPandas, verified by
a full SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nocouncil_etl_spark.io import load
from nocouncil_etl_spark.operators.chunk_summarize import chunk_summarize
from nocouncil_etl_spark.registry import query

CHUNK = 5
THRESHOLD = 100.0
SUMMARY_WORDS = 12  # operators/models.SUMMARY_WORDS


@query(
    "model_chunk_summarize_grouped",
    oracle=f"""
WITH numbered AS (
  SELECT user_id, event_type, value,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS rn
  FROM events
),
chunks AS (
  SELECT user_id, CAST(floor(rn / {CHUNK}) AS BIGINT) AS chunk,
         string_agg(event_type, ' ' ORDER BY rn) FILTER (WHERE value < {THRESHOLD}) AS text,
         CAST(count(*) AS INT) AS n_segments,
         min(rn) AS lo, max(rn) AS hi
  FROM numbered
  GROUP BY 1, 2
),
kept AS (
  SELECT user_id, chunk,
         array_to_string((string_split(text, ' '))[1:{SUMMARY_WORDS}], ' ') AS summary,
         n_segments, lo, hi
  FROM chunks
  WHERE length(trim(text)) >= 2
)
SELECT user_id AS group_key, FALSE AS is_rollup, chunk, summary, n_segments,
       lo AS start_pos, hi AS end_pos
FROM kept
UNION ALL
SELECT user_id AS group_key, TRUE AS is_rollup, CAST(-1 AS BIGINT) AS chunk,
       array_to_string(
         (string_split(string_agg(summary, ' ' ORDER BY chunk), ' '))[1:{SUMMARY_WORDS}],
         ' ') AS summary,
       CAST(sum(n_segments) AS INT) AS n_segments,
       min(lo) AS start_pos, max(hi) AS end_pos
FROM kept
GROUP BY user_id
""",
)
def model_chunk_summarize_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.11 table-valued grouped UDF: the whole MeetingSummarizer.forward
    dataflow (chunk → filtered text / raw bounds → blank skip → rollup
    prepend; summarize.py:110-156) runs inside one applyInPandas group
    transform, and the SQL oracle replays it relationally — proving the two
    formulations equivalent."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    items = ev.select(
        "user_id",
        (F.row_number().over(w) - 1).alias("pos"),
        "event_type",
        "value",
    )
    return chunk_summarize(
        items,
        group_key="user_id",
        pos="pos",
        token="event_type",
        value="value",
        chunk_size=CHUNK,
        value_threshold=THRESHOLD,
    )
