"""Multimodal column operators (north star; SURVEY.md §1.4 binaryFile row).

Design: media rides in DataFrames as an opaque ``binary`` column plus a typed
metadata struct — the Spark-native version of the reference's on-disk .mp4
artifacts (transcribe_council.py:76-90). Real ingestion is
``spark.read.format("binaryFile")`` (path, modificationTime, length, content);
the synthetic harness derives binary content from `documents.text` so plans
are testable without media fixtures.

Decode / feature-extract / resize / frame-sample are Arrow-batched
mapInPandas operators. The image/audio codecs are NOT in this environment, so
the real decoders raise NotImplementedError behind the backend switch, and a
deterministic fake backend (pure function of the bytes) keeps the Spark-side
plumbing — schema, partitioning, batch shape — real and oracle-checkable.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

FRAME_BYTES = 30  # fake: one 'frame' per 30 bytes

DECODE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("byte_len", T.LongType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("head_hex", T.StringType()),
        T.StructField("status", T.StringType()),
    ]
)


def to_media_column(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Synthesize a media row: binary content + typed metadata struct."""
    content = F.encode(F.col(text_col), "UTF-8")
    meta = F.struct(
        F.length(content).cast("long").alias("byte_len"),
        F.lit("text/fake-media").alias("mime"),
    )
    return df.select(F.col(id_col), content.alias("content"), meta.alias("media_meta"))


def decode_real(content: bytes) -> dict:
    """Production decode path — requires codecs not present in this image."""
    raise NotImplementedError(
        "media codecs (PIL/ffmpeg/librosa) are not available in this environment; "
        "use decode_fake for tests"
    )


def decode_fake(content: bytes) -> dict:
    """Deterministic stand-in: metadata derived purely from the bytes, so the
    DuckDB oracle can recompute it from the source text."""
    return {
        "byte_len": len(content),
        "n_frames": max(1, math.ceil(len(content) / FRAME_BYTES)),
        "head_hex": content[:4].hex(),
        "status": "decoded",
    }


def decode_map(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas decode: one metadata row per media row; errors quarantined
    into `status` instead of failing the stage. Columnar kernel over the
    Arrow batch (decode_fake's fields, vectorized); per-row fallback only if
    a batch-level op raises, so a poison row degrades alone."""
    for pdf in batches:
        try:
            contents = pdf["content"]
            byte_len = contents.map(len).to_numpy(dtype=np.int64, na_value=0)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].to_numpy(),
                    "byte_len": byte_len,
                    "n_frames": np.maximum(1, -(-byte_len // FRAME_BYTES)),
                    "head_hex": contents.map(lambda c: c[:4].hex()),
                    "status": np.full(len(pdf), "decoded", dtype=object),
                }
            )
        except Exception:
            rows = []
            for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                try:
                    d = decode_fake(content)
                    rows.append(
                        (doc_id, d["byte_len"], d["n_frames"], d["head_hex"], d["status"])
                    )
                except Exception as exc:
                    rows.append((doc_id, None, None, None, f"error: {exc}"))
            yield pd.DataFrame(
                rows, columns=["doc_id", "byte_len", "n_frames", "head_hex", "status"]
            )


def frame_sample(df: DataFrame, every_n: int, id_col: str = "doc_id") -> DataFrame:
    """Frame sampling: explode fake frame indices, keep every n-th. Pure
    column expressions — the explode/filter shape matches a real video
    frame-sampler; only the decode inside mapInPandas would differ."""
    n_frames = F.greatest(
        F.lit(1), F.ceil(F.length("content") / F.lit(FRAME_BYTES))
    ).cast("int")
    frames = F.sequence(F.lit(0), n_frames - 1)
    return (
        df.select(F.col(id_col), F.explode(frames).alias("frame_id"))
        .filter(F.col("frame_id") % every_n == 0)
    )
