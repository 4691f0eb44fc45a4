"""Incremental-processing idioms (SURVEY.md §2.10 T1-T3, §2.2 K6).

The reference memoizes with file-existence checks
(transcribe_council.py:119,127; summarize.py:174), an in-memory seen-set
(newscrawler.py:349-351,366-369), and a save-after-every-record loop
(newscrawler.py:421-427). At scale those become:

- a processed-keys parquet table + left-anti join (new_keys);
- keep-latest upsert into a state table (merge_state);
- a checkpointed foreachBatch streaming sink for durable progress
  (resumable_sink) — micro-batch commits replace per-record commits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def new_keys(incoming: DataFrame, processed: DataFrame, key: str) -> DataFrame:
    """T1/T2: rows of ``incoming`` whose key is not yet processed."""
    return incoming.join(processed.select(key).distinct(), key, "left_anti")


def mark_processed(processed: DataFrame, done: DataFrame, key: str) -> DataFrame:
    """Append newly-done keys to the processed table (write side of T1)."""
    return processed.select(key).unionByName(done.select(key)).distinct()


def merge_state(
    state: DataFrame, updates: DataFrame, key: str, order_col: str
) -> DataFrame:
    """G7/K4 upsert: union old+new, keep the latest row per key
    ("duplicates will be updated", article_vectorize.py:361-363).
    Deterministic tie-break on the order column descending."""
    merged = state.withColumn("_src", F.lit(0)).unionByName(
        updates.withColumn("_src", F.lit(1))
    )
    w = Window.partitionBy(key).orderBy(F.col(order_col).desc(), F.col("_src").desc())
    return (
        merged.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_src")
    )


def resumable_sink(stream_df: DataFrame, out_path: str, checkpoint: str):
    """T3/K6: exactly-once durable progress via checkpointed foreachBatch —
    the scaled replacement for save-state-after-every-article
    (newscrawler.py:421-427). Returns the StreamingQuery (caller awaits).

    foreachBatch is at-least-once: a batch replayed after a crash between
    write and checkpoint commit would double-append. Keying the write on
    epoch_id (one overwritten directory per micro-batch) makes the replay
    idempotent, which upgrades the end-to-end contract to exactly-once."""

    def write_batch(batch: DataFrame, epoch_id: int) -> None:
        batch.write.mode("overwrite").parquet(f"{out_path}/epoch={epoch_id}")

    return (
        stream_df.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
