"""Council pipeline: media → transcript segments → chunked summaries →
meeting rollup → vector index → top-k query.

Mirrors the reference DAG end-to-end (SURVEY.md §3):
- transcribe: binary media column → timed segments (E9;
  transcribe_council.py:86-90) with a deterministic no_speech_prob;
- summarize: fixed-size chunking (G1, summarize.py:110-118), text from
  no_speech-filtered rows BUT bounds from the raw window (the G3 quirk at
  summarize.py:116-118, replicated deliberately), blank-chunk skip (P6),
  extractive summary + quote extraction (E6/E7 stubs), meeting rollup as an
  explicit is_rollup flag instead of positional row 0 (A4; SURVEY §7.3-1);
- vectorize: drop rollup + empties (P8/P6, vectorize.py:76-78), join the
  meetings catalog by derived file key (J3 rewrite), flatten quotes with
  '|||' (A1, vectorize.py:89-92), embed (E1), composite id (vectorize.py:99);
- index/query: upsert vector table (K4) + exact top-k (E3).

Everything below is lazy DataFrame composition — stages pipeline inside
Spark; at 100 TB each arrow is a narrow map or one keyed shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nocouncil_etl_spark.io import load
from nocouncil_etl_spark.operators.models import (
    MAX_QUOTES,
    QUOTE_MIN_LEN,
    SUMMARY_WORDS,
    TRANSCRIBE_SCHEMA,
    embed_text_udf,
    transcribe_map,
)
from nocouncil_etl_spark.operators.multimodal import to_media_column

NO_SPEECH_THRESHOLD = 0.2  # summarize.py:20
CHUNK_SIZE = 10  # segments per chunk (reference: 100, summarize.py:110)


def media_catalog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stand-in meetings catalog: one media row per document
    (file, media bytes, date-ish metadata) — the data.jsonl analogue."""
    docs = load(spark, sf_dir, "documents")
    media = to_media_column(docs, "text", "doc_id")
    return media.withColumn(
        "file", F.concat(F.lit("v"), F.col("doc_id"), F.lit(".mp4"))
    )


def transcribe_stage(media: DataFrame) -> DataFrame:
    """E9: segments with a deterministic no_speech_prob per segment."""
    segs = media.select("doc_id", "content").mapInPandas(
        transcribe_map, schema=TRANSCRIBE_SCHEMA
    )
    return segs.select(
        F.concat(F.lit("v"), F.col("doc_id"), F.lit(".mp4")).alias("file"),
        F.col("seg_id").alias("id"),
        "start",
        "end",
        F.col("seg_text").alias("text"),
        (((F.col("doc_id") * 7 + F.col("seg_id")) % 10) / 10.0).alias("no_speech_prob"),
    )


def summarize_stage(segments: DataFrame, chunk_size: int = CHUNK_SIZE) -> DataFrame:
    """G1/G2/G3 + E6/E7 + A4: chunked summaries with a rollup row per file."""
    chunked = segments.withColumn(
        "chunk", F.floor(F.col("id") / chunk_size).cast("bigint")
    )
    passing = F.when(F.col("no_speech_prob") < NO_SPEECH_THRESHOLD, F.col("text"))
    per_chunk = (
        chunked.groupBy("file", "chunk")
        .agg(
            # text from filtered rows, ordered by segment id (G2)
            F.array_join(
                F.transform(
                    F.filter(
                        F.array_sort(F.collect_list(F.struct("id", passing.alias("t")))),
                        lambda s: s.t.isNotNull(),
                    ),
                    lambda s: s.t,
                ),
                " ",
            ).alias("chunk_text"),
            # bounds from the UNFILTERED window (the G3 quirk)
            F.min("start").alias("start_time"),
            F.max("end").alias("end_time"),
            F.min("id").alias("start_id"),
            F.max("id").alias("end_id"),
        )
        .filter(F.length(F.trim("chunk_text")) >= 2)  # P6 blank-chunk skip
    )
    ws = F.split("chunk_text", " ")
    detail = per_chunk.select(
        "file",
        F.lit(False).alias("is_rollup"),
        "chunk",
        F.array_join(F.slice(ws, 1, SUMMARY_WORDS), " ").alias("summary"),
        F.slice(
            F.filter(ws, lambda w: F.length(w) >= QUOTE_MIN_LEN), 1, MAX_QUOTES
        ).alias("quotes"),
        # E7 stub: 'names' = distinct long tokens (first 2, sorted)
        F.slice(
            F.array_sort(
                F.array_distinct(F.filter(ws, lambda w: F.length(w) >= 8))
            ),
            1,
            2,
        ).alias("names"),
        "start_time",
        "end_time",
        "start_id",
        "end_id",
    )
    # E8/G4: meeting rollup = summary over ordered chunk summaries (built
    # from the surviving detail rows, like summarize.py:147-155)
    merged = F.array_join(
        F.transform(
            F.array_sort(F.collect_list(F.struct("chunk", F.col("summary").alias("s")))),
            lambda s: s.s,
        ),
        " ",
    )
    rollup = detail.groupBy("file").agg(
        merged.alias("all_text"),
        F.min("start_time").alias("start_time"),
        F.max("end_time").alias("end_time"),
        F.min("start_id").alias("start_id"),
        F.max("end_id").alias("end_id"),
    )
    # rollup rows reuse the extractive kernel over the concatenated summaries
    rollup = rollup.select(
        "file",
        F.lit(True).alias("is_rollup"),
        F.lit(-1).cast("bigint").alias("chunk"),
        F.array_join(F.slice(F.split("all_text", " "), 1, SUMMARY_WORDS), " ").alias(
            "summary"
        ),
        F.array().cast("array<string>").alias("quotes"),  # summarize.py:148-155
        F.array().cast("array<string>").alias("names"),
        "start_time",
        "end_time",
        "start_id",
        "end_id",
    )
    return detail.unionByName(rollup)


def vectorize_stage(summaries: DataFrame, media: DataFrame) -> DataFrame:
    """P8/P6 filters → J3-rewrite catalog join → A1 flatten → E1 embed →
    composite id (vectorize.py:66-102)."""
    detail = summaries.filter(
        (~F.col("is_rollup")) & (F.length(F.trim("summary")) > 0)
    )
    catalog = media.select("file", F.col("media_meta.byte_len").alias("byte_len"))
    joined = detail.join(F.broadcast(catalog), "file")
    return joined.select(
        F.concat_ws(":", "file", F.col("start_id").cast("string")).alias("id"),
        F.col("summary").alias("document"),
        F.array_join("quotes", "|||").alias("quotes"),
        F.array_join("names", "|||").alias("names"),
        "start_time",
        "end_time",
        "start_id",
        "end_id",
        "file",
        "byte_len",
        embed_text_udf("summary").alias("embedding"),
    )


def topk_stage(index: DataFrame, query_text: str, k: int = 5) -> DataFrame:
    """E3: embed the query with the same backend, exact cosine top-k.

    Global top-k goes through orderBy().limit(k) — planned as
    TakeOrderedAndProject (per-partition heaps + driver merge of k rows),
    never a single-partition window over the whole scored index. The rank
    window that numbers the survivors runs over k rows only."""
    from nocouncil_etl_spark.functions.vectors import cosine

    spark = index.sparkSession
    q = spark.createDataFrame([(query_text,)], "qtext string").select(
        embed_text_udf("qtext").alias("q_vec")
    )
    scored = index.crossJoin(F.broadcast(q)).select(
        "id", "document", F.round(cosine("embedding", "q_vec"), 6).alias("sim")
    )
    top = scored.orderBy(F.col("sim").desc(), "id").limit(k)
    w = Window.orderBy(F.col("sim").desc(), "id")  # input bounded to k rows
    return top.withColumn("rk", F.row_number().over(w))


def council_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full DAG; returns the vector-index table."""
    media = media_catalog(spark, sf_dir)
    segments = transcribe_stage(media)
    summaries = summarize_stage(segments)
    return vectorize_stage(summaries, media)
