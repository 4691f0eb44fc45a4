"""JSONL + JSON-array readers/writers (S1/S2, K1/K2).

The reference's interchange format is line-delimited JSON read with inferred
schemas (transcribe_council.py:96,106; summarize.py:165; vectorize.py:72) and
a whole-file JSON array as mutable state (newscrawler.py:90-145). The engine
declares schemas (inference is a full extra pass at 100 TB and can drift) and
treats the JSON-array state file as a small overwrite-style catalog table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from nocouncil_etl_spark.session import tune


def read_jsonl(spark: SparkSession, path: str, ddl: str) -> DataFrame:
    """S1: JSONL scan with a DECLARED schema (never inferSchema in prod)."""
    tune(spark)
    return spark.read.schema(ddl).json(path)


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """K1: JSONL write. Partitioned output (one file per task) — the
    single-file pandas overwrite becomes a directory of part files; readers
    glob it transparently."""
    df.write.mode(mode).json(path)


def read_json_array(spark: SparkSession, path: str, ddl: str | None = None) -> DataFrame:
    """S2: whole-file JSON array (articles.json state at newscrawler.py:95-112).
    multiLine forces one-file-per-task parsing — fine for catalog-sized state,
    never for bulk data."""
    tune(spark)
    reader = spark.read.option("multiLine", True)
    if ddl:
        reader = reader.schema(ddl)
    return reader.json(path)


def write_json_array_state(df: DataFrame, path: str) -> None:
    """K2: overwrite the whole state file (newscrawler.py:129-145).
    coalesce(1) keeps the single-file contract of the reference; the engine's
    real state tables are parquet directories (see operators/incremental)."""
    df.coalesce(1).write.mode("overwrite").json(path)
