"""Model-op framework (SURVEY.md §2.9 E1, E6-E10; §2.11 UDF surface).

The reference's model calls are its UDFs: MiniLM embedding
(vectorize.py:114-118, article_vectorize.py:342-346), dspy LLM summarize /
extract (summarize.py:27-97,131-133), Whisper transcription
(transcribe_council.py:86-90). The engine wraps each as an Arrow-batched
Pandas UDF / mapInPandas operator with:

- a pluggable backend (per-executor lazy singleton for real models — the
  Spark analogue of the reference's process-global model at
  transcribe_council.py:110-111);
- a DETERMINISTIC test backend whose kernel is also SQL-expressible, so the
  DuckDB oracle checks the full plumbing (SURVEY §5.2-2);
- typed output structs with an error column — failed rows are quarantined,
  never fail the stage (the reference's skip-and-log at summarize.py:185-186).

Batching: Arrow transfers whole partitions as pandas Series — the engine's
version of the reference's batch_size=500 sink chunking
(article_vectorize.py:253-268) falls out of partition sizing for free.
"""

from __future__ import annotations

import hashlib
import math
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

EMBED_DIM = 8  # test-backend dim; production backend would be 384 (MiniLM)


# --- deterministic embedding backend (E1 stub) -------------------------------

def _word_component(dim: int, word: str) -> float:
    """Hash-projection component: md5-derived value in [-1, 1)."""
    h = int(hashlib.md5(f"{dim}|{word}".encode()).hexdigest()[:8], 16)
    return (h % 2000 - 1000) / 1000.0


# Per-executor memo of word → component vector. Natural-language corpora are
# Zipfian, so the hit rate is high; this is the hash-stub analogue of the
# per-executor model singleton a real embedding backend uses.
_WORD_CACHE: dict[str, list[float]] = {}


def _word_vec(word: str, dim: int) -> list[float]:
    v = _WORD_CACHE.get(word)
    if v is None:
        v = [_word_component(d, word) for d in range(dim)]
        if len(_WORD_CACHE) < 1_000_000:  # bound executor memory
            _WORD_CACHE[word] = v
    return v


def hash_projection_embed(text: str, dim: int = EMBED_DIM) -> list[float]:
    """Deterministic 'embedding': per-dim sum of word hash components,
    L2-normalized (mirrors normalize_embeddings=True at vectorize.py:117).
    The same kernel is expressible in SQL → oracle-checkable.

    Summation runs dim-major over words in document order — identical fold
    order to the SQL oracle, so values match to the last bit before
    rounding."""
    ws = text.split(" ")
    word_vecs = [_word_vec(w, dim) for w in ws]
    vec = [sum(wv[d] for wv in word_vecs) for d in range(dim)]
    norm = math.sqrt(sum(x * x for x in vec))
    if norm == 0:
        return [0.0] * dim
    return [x / norm for x in vec]


@F.pandas_udf(T.ArrayType(T.DoubleType()))
def embed_text_udf(texts: pd.Series) -> pd.Series:
    """E1: Arrow-batched embedding UDF. Swap `hash_projection_embed` for a
    sentence-transformers call (per-executor singleton) in production; the
    Spark plan is identical."""
    return texts.map(lambda t: hash_projection_embed(t or ""))


# --- extractive summarizer (E6 stub) -----------------------------------------

SUMMARY_WORDS = 12
QUOTE_MIN_LEN = 6
MAX_QUOTES = 3

SUMMARIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("summary", T.StringType()),
        T.StructField("quotes", T.ArrayType(T.StringType())),
        T.StructField("n_words", T.IntegerType()),
        T.StructField("error", T.StringType()),
    ]
)


def summarize_extractive(text: str) -> tuple[str, list[str], int]:
    """Deterministic summary: first N words; 'quotes' = first 3 long words
    (stands in for ChainOfThought(Summary) at summarize.py:77-89)."""
    ws = (text or "").split(" ")
    summary = " ".join(ws[:SUMMARY_WORDS])
    quotes = [w for w in ws if len(w) >= QUOTE_MIN_LEN][:MAX_QUOTES]
    return summary, quotes, len(ws)


def _summarize_frame(pdf: pd.DataFrame) -> pd.DataFrame:
    """Columnar summarize kernel: pandas str ops over the whole Arrow batch —
    no per-row Python loop on the hot path."""
    words = pdf["text"].fillna("").str.split(" ")
    return pd.DataFrame(
        {
            "doc_id": pdf["doc_id"].to_numpy(),
            "summary": words.str[:SUMMARY_WORDS].str.join(" "),
            "quotes": words.map(
                lambda ws: [w for w in ws if len(w) >= QUOTE_MIN_LEN][:MAX_QUOTES]
            ),
            "n_words": words.str.len(),
            "error": np.full(len(pdf), None, dtype=object),
        }
    )


def summarize_map(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """E6 as mapInPandas: typed struct out, error column instead of raising
    (summarize.py:185-186 skip-and-log). The batch runs the columnar kernel;
    only when a batch-level op raises does it fall back to per-row execution
    so a poison row quarantines alone instead of failing the stage."""
    for pdf in batches:
        try:
            yield _summarize_frame(pdf)
        except Exception:
            out = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                try:
                    summary, quotes, n = summarize_extractive(text)
                    out.append((doc_id, summary, quotes, n, None))
                except Exception as exc:  # quarantine, never fail the stage
                    out.append((doc_id, None, None, None, str(exc)))
            yield pd.DataFrame(
                out, columns=["doc_id", "summary", "quotes", "n_words", "error"]
            )


# --- entity extraction stub (E7) ----------------------------------------------

EXTRACT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("dockets", T.StringType()),
        T.StructField("error", T.StringType()),
    ]
)

DOCKET_PATTERN = r"docket ([0-9]+)"


def extract_map(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """E7 stub as mapInPandas: the deterministic regex twin of the LLM
    signature extractors (summarize.py:27-55,122). Same schema and per-row
    quarantine contract as the production LLM backend
    (backends.make_extract_map), so the seam swaps kernels only."""
    for pdf in batches:
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].to_numpy(),
                "dockets": pdf["text"]
                .fillna("")
                .str.findall(DOCKET_PATTERN)
                .str.join(","),
                "error": np.full(len(pdf), None, dtype=object),
            }
        )


# --- transcription stub (E9) --------------------------------------------------

SEGMENT_BYTES = 64
SEGMENT_SECONDS = 2.5

TRANSCRIBE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("seg_id", T.IntegerType()),
        T.StructField("start", T.DoubleType()),
        T.StructField("end", T.DoubleType()),
        T.StructField("seg_text", T.StringType()),
    ]
)


def transcribe_map(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """E9: binary 'media' column → timed segment rows (one-to-many, the UDTF
    shape of Whisper at transcribe_council.py:86-90). Deterministic fake:
    fixed-size byte windows; a real backend would lazy-load Whisper once per
    executor and honor spark.task.resource.gpu.amount.

    Fan-out is computed columnar (numpy repeat/arange over the whole Arrow
    batch); only the byte slice+decode — inherently per-value — runs in a
    comprehension."""
    for pdf in batches:
        contents = pdf["content"]
        lens = contents.map(len).to_numpy(dtype=np.int64, na_value=0)
        n_seg = np.maximum(1, -(-lens // SEGMENT_BYTES))  # ceil-div, ≥1
        total = int(n_seg.sum())
        # local segment index = global arange minus each row's segment offset
        offsets = np.repeat(np.cumsum(n_seg) - n_seg, n_seg)
        seg_id = np.arange(total, dtype=np.int64) - offsets
        seg_text = [
            c[i * SEGMENT_BYTES : (i + 1) * SEGMENT_BYTES].decode(
                "utf-8", errors="ignore"
            )
            for c, n in zip(contents, n_seg)
            for i in range(n)
        ]
        yield pd.DataFrame(
            {
                "doc_id": np.repeat(pdf["doc_id"].to_numpy(), n_seg),
                "seg_id": seg_id,
                "start": np.round(seg_id * SEGMENT_SECONDS, 2),
                "end": np.round((seg_id + 1) * SEGMENT_SECONDS, 2),
                "seg_text": seg_text,
            }
        )
