"""Vector math as higher-order column expressions (SURVEY.md §2.9 E2).

The reference relies on ChromaDB's HNSW-cosine space over L2-normalized
MiniLM embeddings (vectorize.py:114-123, article_vectorize.py:342-356). Here
the kernel — dot product / norm / cosine — is a pure Spark expression built
from ``zip_with`` + ``aggregate``: JVM-evaluated, codegen-compatible, and
bit-reproducible against the DuckDB oracle because both engines left-fold the
sum in index order over doubles.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(vec: Column | str) -> Column:
    """Cast array<float> → array<double> so accumulation is in double."""
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column | str, b: Column | str) -> Column:
    """Dot product: left-fold over zipped elements, double accumulator."""
    prods = F.zip_with(as_double(a), as_double(b), lambda x, y: x * y)
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column | str) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; null-safe on zero vectors (returns null)."""
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom != 0, dot(a, b) / denom)


def scale(a: Column | str, s: Column) -> Column:
    return F.transform(as_double(a), lambda x: x * s)


def add(a: Column | str, b: Column | str) -> Column:
    return F.zip_with(as_double(a), as_double(b), lambda x, y: x + y)


def normalize(a: Column | str) -> Column:
    """L2-normalize (the reference's normalize_embeddings=True)."""
    n = l2_norm(a)
    return F.transform(as_double(a), lambda x: x / n)
