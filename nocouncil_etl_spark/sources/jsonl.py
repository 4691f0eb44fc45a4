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
    """K2: overwrite the whole state file as ONE pretty-printed JSON array —
    the exact interchange format of the reference's articles.json
    (newscrawler.py:129-145 json.dump of the full list), so its tooling can
    read the file unchanged.

    State files are catalog-sized by contract, so the array is assembled on
    the driver and written atomically (tmp + replace — a crashed writer never
    leaves a torn state file). Bulk data belongs in parquet directories
    (operators/incremental), never here."""
    import json
    import os

    rows = [json.loads(r) for r in df.toJSON().collect()]
    parent = os.path.dirname(path)
    if parent:
        os.makedirs(parent, exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(rows, fh, indent=2)
    os.replace(tmp, path)
