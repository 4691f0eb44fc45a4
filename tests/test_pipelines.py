"""Structural invariants of the end-to-end pipelines (golden-style checks,
SURVEY.md §5.2-4): rollup semantics, the G3 bounds quirk, blank-chunk skip,
index hygiene, top-k shape.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from nocouncil_etl_spark.pipelines.council import (
    CHUNK_SIZE,
    NO_SPEECH_THRESHOLD,
    council_pipeline,
    media_catalog,
    summarize_stage,
    topk_stage,
    transcribe_stage,
)


def test_every_file_has_exactly_one_rollup(spark, sf_dir):
    media = media_catalog(spark, sf_dir)
    summaries = summarize_stage(transcribe_stage(media))
    per_file = (
        summaries.groupBy("file")
        .agg(F.sum(F.col("is_rollup").cast("int")).alias("n_rollups"))
        .collect()
    )
    assert per_file and all(r.n_rollups == 1 for r in per_file)


def test_bounds_quirk_covers_filtered_rows(spark, sf_dir):
    """G3: chunk bounds span ALL segments of the chunk, including those the
    no_speech filter removed from the text (summarize.py:116-118)."""
    media = media_catalog(spark, sf_dir)
    segments = transcribe_stage(media)
    summaries = summarize_stage(segments)
    detail = summaries.filter(~F.col("is_rollup"))
    # pick chunks whose id-range contains filtered-out segments
    seg_counts = (
        segments.withColumn("chunk", F.floor(F.col("id") / CHUNK_SIZE))
        .groupBy("file", "chunk")
        .agg(
            F.count(F.lit(1)).alias("n_all"),
            F.sum(
                (F.col("no_speech_prob") < NO_SPEECH_THRESHOLD).cast("int")
            ).alias("n_pass"),
            F.min("id").alias("lo"),
            F.max("id").alias("hi"),
        )
        .filter(F.col("n_pass") < F.col("n_all"))
        .filter(F.col("n_pass") > 0)
    )
    joined = detail.join(seg_counts, ["file", "chunk"]).collect()
    assert joined, "fixture must include chunks with filtered segments"
    for r in joined:
        assert r.start_id == r.lo and r.end_id == r.hi


def test_rollup_has_no_quotes_and_detail_summaries_nonempty(spark, sf_dir):
    media = media_catalog(spark, sf_dir)
    summaries = summarize_stage(transcribe_stage(media)).collect()
    for r in summaries:
        if r.is_rollup:
            assert r.quotes == [] and r.names == []  # summarize.py:148-155
        else:
            assert len(r.summary.strip()) > 0


def test_index_excludes_rollups_and_embeds_normalized(spark, sf_dir):
    from nocouncil_etl_spark.functions.vectors import l2_norm

    index = council_pipeline(spark, sf_dir)
    assert index.filter(F.col("id").endswith(":-1")).count() == 0
    norms = index.select(F.round(l2_norm("embedding"), 4).alias("n")).distinct().collect()
    assert all(abs(r.n - 1.0) < 1e-3 for r in norms)


def test_topk_returns_k_ranked(spark, sf_dir):
    index = council_pipeline(spark, sf_dir)
    top = topk_stage(index, "spark query window stream table", k=5).collect()
    assert [r.rk for r in top] == [1, 2, 3, 4, 5]
    sims = [r.sim for r in top]
    assert sims == sorted(sims, reverse=True)


def test_articles_pipeline_dedup_gate(spark, sf_dir):
    from nocouncil_etl_spark.pipelines.articles import articles_pipeline

    full = articles_pipeline(spark, sf_dir)
    n = full.count()
    assert n > 0
    # feeding the output ids back as the seen-set drops everything (T2)
    seen = full.select("id")
    again = articles_pipeline(spark, sf_dir, seen=seen)
    assert again.count() == 0
