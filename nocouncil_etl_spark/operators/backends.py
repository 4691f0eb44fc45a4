"""Production model backends behind the deterministic-test seam (E1/E6/E9).

The reference runs real models: MiniLM-384 sentence embeddings
(vectorize.py:114-118, article_vectorize.py:342-346 — ``normalize_embeddings=
True``), Whisper speech-to-text (transcribe_council.py:86-90,110-111 — one
process-global model), and an ollama LLM summarizer (summarize.py:160-163).
This engine's operators run the same Spark plans with a deterministic backend
by default (oracle-checkable); this module supplies the production twins and
the switch.

Selection is by name, resolved from session conf so a deployment flips
backends without code changes:

    spark.conf.set("spark.nocouncil_etl_spark.embedBackend", "sentence_transformers")
    eng.embed(docs, "text")          # now MiniLM-384, same plan shape

Executor-side model loading follows the reference's process-global pattern:
a lazy per-process singleton, created on first batch, reused for the rest of
the executor's life (the Spark analogue of transcribe_council.py:110-111).
The model packages are NOT in this image, so the production paths are
import-guarded: constructing the UDF (and therefore the plan) always works;
executing it without the package raises a clear RuntimeError naming the
missing dependency. Plan identity between backends is asserted in
tests/test_backends.py; real-path execution tests skip when the package is
absent.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from typing import Any

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from nocouncil_etl_spark.operators.models import hash_projection_embed

CONF_PREFIX = "spark.nocouncil_etl_spark."

EMBED_HASH = "hash"
EMBED_ST = "sentence_transformers"
ST_MODEL = "sentence-transformers/all-MiniLM-L6-v2"  # 384-d, vectorize.py:114
ST_DIM = 384

TRANSCRIBE_FAKE = "fake"
TRANSCRIBE_WHISPER = "whisper"
WHISPER_MODEL = "base"  # transcribe_council.py:110-111


def resolve_backend(spark: SparkSession, kind: str, default: str) -> str:
    """Read the backend name for `kind` ('embedBackend'/'transcribeBackend')
    from session conf; runtime-settable, driver-owned session safe."""
    return spark.conf.get(CONF_PREFIX + kind, default)


# --- per-executor lazy singletons --------------------------------------------

_SINGLETONS: dict[str, Any] = {}


def _load_sentence_transformer():
    model = _SINGLETONS.get("st")
    if model is None:
        try:
            from sentence_transformers import SentenceTransformer
        except ImportError as exc:
            raise RuntimeError(
                "embed backend 'sentence_transformers' requires the "
                "sentence-transformers package on every executor "
                "(pip install sentence-transformers); falling back is explicit: "
                "set spark.nocouncil_etl_spark.embedBackend=hash"
            ) from exc
        model = SentenceTransformer(ST_MODEL)
        _SINGLETONS["st"] = model
    return model


def _load_whisper():
    model = _SINGLETONS.get("whisper")
    if model is None:
        try:
            import whisper
        except ImportError as exc:
            raise RuntimeError(
                "transcribe backend 'whisper' requires openai-whisper on every "
                "executor; set spark.nocouncil_etl_spark.transcribeBackend=fake "
                "for the deterministic path"
            ) from exc
        model = whisper.load_model(WHISPER_MODEL)
        _SINGLETONS["whisper"] = model
    return model


# --- embedding ---------------------------------------------------------------


def make_embed_udf(backend: str = EMBED_HASH):
    """Arrow pandas_udf for the chosen embedding backend. Identical Spark
    plan either way (one ArrowEvalPython over the text column →
    array<double>); only the executor-side kernel differs."""
    if backend == EMBED_HASH:

        @F.pandas_udf(T.ArrayType(T.DoubleType()))
        def embed_hash(texts: pd.Series) -> pd.Series:
            return texts.map(lambda t: hash_projection_embed(t or ""))

        return embed_hash

    if backend == EMBED_ST:

        @F.pandas_udf(T.ArrayType(T.DoubleType()))
        def embed_st(texts: pd.Series) -> pd.Series:
            model = _load_sentence_transformer()
            # normalize_embeddings=True mirrors vectorize.py:117
            mat = model.encode(
                texts.fillna("").tolist(), normalize_embeddings=True
            )
            return pd.Series([row.tolist() for row in mat])

        return embed_st

    raise ValueError(
        f"unknown embed backend {backend!r}; expected {EMBED_HASH!r} or {EMBED_ST!r}"
    )


def embed_dim(backend: str) -> int:
    """Output dimensionality per backend (hash stub = 8, MiniLM = 384)."""
    from nocouncil_etl_spark.operators.models import EMBED_DIM

    return {EMBED_HASH: EMBED_DIM, EMBED_ST: ST_DIM}[backend]


# --- transcription -----------------------------------------------------------


def make_transcribe_map(
    backend: str = TRANSCRIBE_FAKE,
) -> Callable[[Iterator[pd.DataFrame]], Iterator[pd.DataFrame]]:
    """mapInPandas kernel for the chosen transcription backend; same output
    schema (TRANSCRIBE_SCHEMA) and one-to-many fan-out shape either way."""
    if backend == TRANSCRIBE_FAKE:
        from nocouncil_etl_spark.operators.models import transcribe_map

        return transcribe_map

    if backend == TRANSCRIBE_WHISPER:

        def whisper_map(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            import os
            import tempfile

            model = _load_whisper()
            for pdf in batches:
                rows = []
                for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                    # whisper's API takes a file path; binary column → temp file
                    with tempfile.NamedTemporaryFile(
                        suffix=".mp4", delete=False
                    ) as fh:
                        fh.write(content)
                        path = fh.name
                    try:
                        result = model.transcribe(path)
                        for i, seg in enumerate(result["segments"]):
                            rows.append(
                                (
                                    doc_id,
                                    i,
                                    round(float(seg["start"]), 2),
                                    round(float(seg["end"]), 2),
                                    seg["text"],
                                )
                            )
                    finally:
                        os.unlink(path)
                yield pd.DataFrame(
                    rows, columns=["doc_id", "seg_id", "start", "end", "seg_text"]
                )

        return whisper_map

    raise ValueError(
        f"unknown transcribe backend {backend!r}; expected "
        f"{TRANSCRIBE_FAKE!r} or {TRANSCRIBE_WHISPER!r}"
    )
