"""Incremental idioms, vector-index sink, edge ingestion (T1-T3, K4-K6,
S5-S8): idempotence, upsert keep-latest, resumable streaming sink, fetcher
error quarantine.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from nocouncil_etl_spark.io import load


def test_new_keys_then_mark_processed_is_idempotent(spark, sf_dir):
    from nocouncil_etl_spark.operators.incremental import mark_processed, new_keys

    ev = load(spark, sf_dir, "events")
    processed = ev.limit(0).select("event_id")  # empty table, run 1
    batch1 = new_keys(ev, processed, "event_id")
    assert batch1.count() == ev.count()
    processed = mark_processed(processed, batch1, "event_id")
    batch2 = new_keys(ev, processed, "event_id")  # run 2: nothing new
    assert batch2.count() == 0


def test_merge_state_keeps_latest(spark):
    from nocouncil_etl_spark.operators.incremental import merge_state

    state = spark.createDataFrame(
        [("a", 1, "old"), ("b", 1, "keep")], "id string, version int, payload string"
    )
    updates = spark.createDataFrame(
        [("a", 2, "new"), ("c", 1, "add")], "id string, version int, payload string"
    )
    out = {r.id: (r.version, r.payload) for r in merge_state(state, updates, "id", "version").collect()}
    assert out == {"a": (2, "new"), "b": (1, "keep"), "c": (1, "add")}


def test_merge_state_tie_prefers_update(spark):
    from nocouncil_etl_spark.operators.incremental import merge_state

    state = spark.createDataFrame([("a", 1, "old")], "id string, version int, payload string")
    updates = spark.createDataFrame([("a", 1, "new")], "id string, version int, payload string")
    assert merge_state(state, updates, "id", "version").collect()[0].payload == "new"


def test_resumable_sink_exactly_once(spark, sf_dir, tmp_path):
    """K6/T3: re-running the checkpointed sink does not duplicate rows."""
    from nocouncil_etl_spark.operators.incremental import resumable_sink
    from nocouncil_etl_spark.streaming.windows import read_events_stream

    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    n_src = load(spark, sf_dir, "events").count()

    for _ in range(2):  # second run must be a no-op (checkpoint remembers)
        stream = read_events_stream(spark, sf_dir).select("event_id", "event_type")
        q = resumable_sink(stream, out, ckpt)
        q.processAllAvailable()
        q.stop()

    assert spark.read.parquet(out).count() == n_src


def test_vector_index_upsert(spark, sf_dir):
    from nocouncil_etl_spark.operators.vector_index import upsert_vectors

    emb = load(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("id"), "embedding", F.lit(1).alias("version")
    )
    replacement = emb.filter(F.col("id") < 10).withColumn("version", F.lit(2))
    merged = upsert_vectors(emb, replacement, "id", "version")
    assert merged.count() == emb.count()  # upsert, not append
    assert merged.filter((F.col("id") < 10) & (F.col("version") == 2)).count() == 10


def test_ingest_feeds_fake_fetcher(spark):
    from nocouncil_etl_spark.sources.ingest import ingest_feeds

    seeds = spark.createDataFrame(
        [("tribune", "http://feeds/a"), ("gazette", "http://feeds/bb")],
        "source string, feed_url string",
    )
    rows = ingest_feeds(seeds).collect()
    assert all(r.error is None for r in rows)
    assert {r.source for r in rows} == {"tribune", "gazette"}
    assert all(r.url.startswith("http://feeds/") for r in rows)


def test_ingest_feeds_error_quarantine(spark):
    from nocouncil_etl_spark.sources.ingest import ingest_feeds

    def flaky(url: str):
        if "bad" in url:
            raise RuntimeError("connection refused")
        return [{"url": url + "/1", "title": "t", "published": "p"}]

    seeds = spark.createDataFrame(
        [("s1", "http://ok"), ("s2", "http://bad")], "source string, feed_url string"
    )
    rows = {r.source: r for r in ingest_feeds(seeds, fetcher=flaky).collect()}
    assert rows["s1"].error is None
    assert "connection refused" in rows["s2"].error  # row, not stage failure


def test_streaming_cdc_merge_into_curated_state(spark, sf_dir, tmp_path):
    """The daily-cron composition end-to-end, streaming edition: the CDC
    feed arrives as a checkpointed stream; each micro-batch merges into the
    published curated state with epoch-keyed (idempotent) writes; the final
    state is row-identical to applying the feed in one batch — and a full
    re-run of the drained stream is a no-op (exactly-once via checkpoint),
    composing merge_upsert_cdc's semantics with resumable_sink's durability
    contract."""
    from nocouncil_etl_spark.plans.curation4 import _changes
    from nocouncil_etl_spark.plans.curation5 import _curate

    base = load(spark, sf_dir, "documents").select("doc_id", "source", "text")
    state0_dir = str(tmp_path / "state0")
    _curate(base, "text", 1).write.mode("overwrite").parquet(state0_dir)

    feed_dir = str(tmp_path / "feed")
    chg = _changes(base)
    chg.write.mode("overwrite").parquet(feed_dir)

    states_dir = str(tmp_path / "states")

    def merge_into(state, batch):
        upd = _curate(
            batch.filter(F.col("op") == "U")
            .join(base.select("doc_id", "source"), "doc_id")
            .select("doc_id", "source", F.col("new_text").alias("text")),
            "text", 2,
        )
        ins = _curate(
            batch.filter(F.col("op") == "I").select(
                "doc_id", F.lit("cdc").alias("source"),
                F.col("new_text").alias("text"),
            ),
            "text", 2,
        )
        touched = batch.filter(F.col("op") != "I").select("doc_id")
        return (
            state.join(touched, "doc_id", "left_anti")
            .unionByName(upd)
            .unionByName(ins)
        )

    def apply_batch(batch, epoch_id):
        state = batch.sparkSession.read.parquet(state0_dir)
        merge_into(state, batch).write.mode("overwrite").parquet(
            f"{states_dir}/epoch={epoch_id}"
        )

    for _ in range(2):  # replay must be a no-op (checkpoint remembers)
        stream = spark.readStream.schema(chg.schema).parquet(feed_dir)
        q = (
            stream.writeStream.foreachBatch(apply_batch)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.processAllAvailable()
        q.stop()

    import os

    epochs = sorted(
        d for d in os.listdir(states_dir) if d.startswith("epoch=")
    )
    assert len(epochs) == 1  # one micro-batch, not re-applied on replay
    got = spark.read.parquet(f"{states_dir}/{epochs[-1]}")
    want = merge_into(spark.read.parquet(state0_dir), chg)
    cols = ["doc_id", "source", "n_words", "version"]
    assert got.select(cols).exceptAll(want.select(cols)).count() == 0
    assert want.select(cols).exceptAll(got.select(cols)).count() == 0
