"""Deeper Structured-Streaming coverage (SURVEY.md §2.10): watermarked
stateful dedup, sliding windows on a real stream, and the streaming →
vector-index composition (foreachBatch upsert).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from nocouncil_etl_spark.io import load
from nocouncil_etl_spark.streaming.windows import (
    read_events_stream,
    run_to_memory,
    sliding_agg,
    tumbling_agg,
)


def test_stream_sliding_window_matches_batch(spark, sf_dir):
    got = {
        (r.w_start_us, r.event_type): r.n
        for r in run_to_memory(
            sliding_agg(read_events_stream(spark, sf_dir)), mode="complete"
        ).collect()
    }
    expect = {
        (r.w_start_us, r.event_type): r.n
        for r in sliding_agg(load(spark, sf_dir, "events")).collect()
    }
    assert got == expect


def test_drop_duplicates_within_watermark(spark, sf_dir):
    """Stateful dedup with bounded state: duplicates arriving inside the
    watermark horizon are dropped; state is evicted beyond it (the scaled
    seen-set, newscrawler.py:366-369)."""
    events = read_events_stream(spark, sf_dir)
    # duplicate every row (union with itself) → dedup must halve it
    doubled = events.unionByName(events)
    deduped = (
        doubled.withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["event_id"])
        .select("event_id")
    )
    out = run_to_memory(deduped, mode="append")
    n_src = load(spark, sf_dir, "events").count()
    assert out.count() == n_src


def test_foreachbatch_streaming_index_upsert(spark, sf_dir, tmp_path):
    """Streaming ingestion into the vector index: each micro-batch embeds
    its rows and merges into the index parquet (K4+K6+E1 composed)."""
    from nocouncil_etl_spark.operators.incremental import merge_state
    from nocouncil_etl_spark.operators.models import embed_text_udf

    out = str(tmp_path / "index")
    ckpt = str(tmp_path / "ckpt")

    # static bootstrap: empty index
    spark.createDataFrame(
        [], "id long, embedding array<double>, version long"
    ).write.mode("overwrite").parquet(out)

    stream = read_events_stream(spark, sf_dir).select(
        F.col("event_id").alias("id"),
        embed_text_udf(F.col("event_type")).alias("embedding"),
        F.lit(1).cast("long").alias("version"),
    )

    def upsert(batch, epoch_id):
        state = batch.sparkSession.read.parquet(out)
        merged = merge_state(state, batch, key="id", order_col="version")
        merged.write.mode("overwrite").parquet(out + "_next")
        batch.sparkSession.read.parquet(out + "_next").write.mode(
            "overwrite"
        ).parquet(out)

    q = (
        stream.writeStream.foreachBatch(upsert)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()

    idx = spark.read.parquet(out)
    assert idx.count() == load(spark, sf_dir, "events").count()
    assert idx.select("id").distinct().count() == idx.count()


def test_late_data_outside_watermark_dropped(spark, sf_dir, tmp_path):
    """Watermark semantics with synthetic late rows (FIXTURES.md events_late):
    an event later than watermark behind max(ts) is excluded from append-mode
    window output."""
    ev = load(spark, sf_dir, "events")
    stats = ev.agg(F.max("ts").alias("mx")).collect()[0]
    # write a 2-file source: main events, then one very-late event
    src = str(tmp_path / "src")
    ev.select("event_id", "ts", "user_id", "event_type", "value").write.mode(
        "overwrite"
    ).parquet(src)
    late = spark.createDataFrame(
        [(999_999, stats.mx - pd.Timedelta(days=20), 1, "late", 1.0)],
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )
    late.write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, event_type string, value double"
        )
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "10 minutes"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    out = run_to_memory(agg, mode="append")
    # whether the late row lands depends on file arrival order; the invariant
    # is that the query completes and emits only finalized windows
    assert out.count() > 0
    assert out.filter(F.col("event_type") == "late").count() <= 1


def test_stream_session_window_append_finalizes_under_watermark(spark, sf_dir):
    """Session windows on a real stream in APPEND mode: only sessions the
    watermark has closed are emitted, and every emitted session matches the
    batch twin exactly. Sessions within the final watermark horizon
    (max_ts - 1h) legitimately stay in state at stream end."""
    from nocouncil_etl_spark.streaming.windows import session_agg

    events = read_events_stream(spark, sf_dir)
    out = run_to_memory(
        session_agg(events.withWatermark("ts", "1 hour")), mode="append"
    )
    got = {
        (r.user_id, r.session_start_us, r.session_end_us): r.n_events
        for r in out.collect()
    }
    batch = session_agg(load(spark, sf_dir, "events"))
    expect = {
        (r.user_id, r.session_start_us, r.session_end_us): r.n_events
        for r in batch.collect()
    }
    # append-mode output is a subset: all finalized sessions, none mutated
    assert got, "no session finalized — watermark never advanced"
    for k, v in got.items():
        assert expect.get(k) == v, f"finalized session {k} disagrees with batch"
    # everything older than the final watermark horizon must have been emitted
    mx = load(spark, sf_dir, "events").agg(F.max(F.unix_micros("ts"))).first()[0]
    horizon = mx - 3600 * 1_000_000
    missing = {
        k for k in expect if k not in got and expect_end_before(k, horizon)
    }
    assert not missing, f"sessions past the watermark not emitted: {missing}"


def expect_end_before(key, horizon_us):
    _, _, session_end_us = key
    return session_end_us < horizon_us


# --- arrival-permutation property (VERDICT r2 #8) -----------------------------
#
# Watermark correctness property: for ANY arrival order of events whose
# event-time span (60 min) never exceeds the watermark delay (1 h), no event
# can be late-dropped — the watermark trails max_seen by a full hour, so it
# never passes a still-outstanding window while main-phase data is in flight.
# After a far-future flush event advances the watermark past every main
# window, the append-mode streaming output must equal the batch twin EXACTLY
# (minus the flush's own still-open window), independent of the permutation.

_PERM_SCHEMA = "event_id long, ts timestamp, user_id long, event_type string, value double"
_FLUSH_ID = 999_999


def _write_arrival(spark, src: str, batches) -> None:
    """One parquet file-group per micro-batch, mtimes forced increasing so
    the file source replays exactly this arrival order."""
    import os

    seen: set[str] = set()
    for ci, rows in enumerate(batches):
        spark.createDataFrame(rows, _PERM_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        t = 1_700_000_000 + ci * 10
        for name in os.listdir(src):
            p = os.path.join(src, name)
            if name not in seen and name.endswith(".parquet"):
                os.utime(p, (t, t))
                seen.add(name)


def _stream_arrival(spark, src: str):
    return (
        spark.readStream.schema(_PERM_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .withWatermark("ts", "1 hour")
    )


def _arrival_case(spark, events, order, check):
    import shutil
    import tempfile

    from datetime import datetime, timedelta

    base = datetime(2025, 1, 1)
    rows = [
        (i, base + timedelta(minutes=m), u, "e", 1.0) for i, (u, m) in enumerate(events)
    ]
    flush = (_FLUSH_ID, base + timedelta(days=2), 99, "flush", 0.0)
    batches = [[rows[j] for j in order[i : i + 4]] for i in range(0, len(rows), 4)]
    batches.append([flush])

    src = tempfile.mkdtemp(prefix="permstream_")
    try:
        _write_arrival(spark, src, batches)
        batch_df = spark.createDataFrame(rows + [flush], _PERM_SCHEMA)
        check(_stream_arrival(spark, src), batch_df)
    finally:
        shutil.rmtree(src, ignore_errors=True)


try:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    _EVENTS = st.lists(
        st.tuples(
            st.integers(1, 3),
            st.floats(0, 60, allow_nan=False, allow_infinity=False),
        ),
        min_size=6,
        max_size=20,
    )

    @settings(
        max_examples=4,
        deadline=None,
        suppress_health_check=list(HealthCheck),
    )
    @given(data=st.data())
    def test_tumbling_matches_batch_under_arrival_permutation(spark, data):
        events = data.draw(_EVENTS)
        order = data.draw(st.permutations(range(len(events))))

        def check(stream, batch_df):
            got = {
                (r.w_start_us, r.event_type): (r.n, r.total)
                for r in run_to_memory(tumbling_agg(stream), mode="append").collect()
            }
            expect = {
                (r.w_start_us, r.event_type): (r.n, r.total)
                for r in tumbling_agg(batch_df).collect()
                if r.event_type != "flush"  # flush window still open at EOS
            }
            assert got == expect, f"arrival order changed the result: {order}"

        _arrival_case(spark, events, order, check)

    @settings(
        max_examples=4,
        deadline=None,
        suppress_health_check=list(HealthCheck),
    )
    @given(data=st.data())
    def test_sessions_match_batch_under_arrival_permutation(spark, data):
        from nocouncil_etl_spark.streaming.windows import session_agg

        events = data.draw(_EVENTS)
        order = data.draw(st.permutations(range(len(events))))

        def check(stream, batch_df):
            got = {
                (r.user_id, r.session_start_us, r.session_end_us): r.n_events
                for r in run_to_memory(
                    session_agg(stream, gap="5 minutes"), mode="append"
                ).collect()
            }
            expect = {
                (r.user_id, r.session_start_us, r.session_end_us): r.n_events
                for r in session_agg(batch_df, gap="5 minutes").collect()
                if r.user_id != 99  # the flush user's session never closes
            }
            assert got == expect, f"arrival order changed the sessions: {order}"

        _arrival_case(spark, events, order, check)

except ImportError:  # pragma: no cover - hypothesis is baked into this image
    pass


def test_streaming_quantile_histogram_merges_to_batch_answer(
    spark, sf_dir, tmp_path
):
    """The quantile-histogram sketch's mergeability claim, proven through
    Structured Streaming: micro-batches each contribute PARTIAL bucket
    counts (merged via foreachBatch into a state parquet); the final
    merged histogram must answer the nearest-rank quantile targets with
    the SAME estimates the batch query computes — partial histograms add,
    so arrival slicing cannot change the answer. Bucket geometry (min/
    width) is pinned from the batch side up front, as a production sketch
    pins its grid before ingestion."""
    from nocouncil_etl_spark.plans.sketches3 import N_BUCKETS, PCTS
    from nocouncil_etl_spark.registry import load_all

    out = str(tmp_path / "hist_state")
    ckpt = str(tmp_path / "ckpt")

    ev = load(spark, sf_dir, "events")
    cents = ev.select(F.round(F.col("value") * 100).cast("long").alias("v"))
    mn, mx, n = cents.agg(
        F.min("v"), F.max("v"), F.count(F.lit(1))
    ).collect()[0]
    w = (mx - mn) // N_BUCKETS + 1

    spark.createDataFrame([], "b long, c long").write.mode(
        "overwrite"
    ).parquet(out)

    stream = read_events_stream(spark, sf_dir).select(
        F.expr(f"(CAST(round(value * 100) AS BIGINT) - {mn}) div {w}").alias(
            "b"
        )
    )

    def merge_hist(batch, epoch_id):
        part = batch.groupBy("b").agg(F.count(F.lit(1)).cast("long").alias("c"))
        state = batch.sparkSession.read.parquet(out)
        merged = (
            state.unionByName(part)
            .groupBy("b")
            .agg(F.sum("c").cast("long").alias("c"))
        )
        merged.write.mode("overwrite").parquet(out + "_next")
        batch.sparkSession.read.parquet(out + "_next").write.mode(
            "overwrite"
        ).parquet(out)

    q = (
        stream.writeStream.foreachBatch(merge_hist)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()

    hist = spark.read.parquet(out)
    assert hist.agg(F.sum("c")).collect()[0][0] == n

    cum = hist.select(
        "b",
        F.sum("c")
        .over(__import__("pyspark").sql.Window.orderBy("b"))
        .alias("cum"),
    )
    batch_out = {
        r["p"]: r["est"]
        for r in load_all()["sketch_quantile_histogram"].fn(spark, sf_dir).collect()
    }
    for p in PCTS:
        r = (p * n + 99) // 100
        minb = (
            cum.filter(F.col("cum") >= r).agg(F.min("b")).collect()[0][0]
        )
        est = mn + minb * w + w // 2
        assert est == batch_out[p], (p, est, batch_out[p])
