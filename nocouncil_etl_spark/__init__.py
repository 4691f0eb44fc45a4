"""nocouncil_etl_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of tapilab/nocouncil-etl, redesigned Spark-first.

The reference is a cron-orchestrated sequence of single-process pandas scripts
(see SURVEY.md). This engine re-expresses its implicit operator set — scans,
filters, projections, regex extraction, lookup joins, dedup, chunked
aggregation, hierarchical reduce, embedding, top-k similarity — as declarative
PySpark DataFrame plans that Catalyst optimizes, plus the large-scale
training-data operators (dedup families, ANN search, multimodal columns, text
analysis) the reference gestures at.

Package layout:
    session.py    SparkSession factory (AQE on, UTC, Arrow)
    io.py         declared-schema parquet readers for the synthetic tables
    functions/    scalar/vector expression helpers (pure column expressions)
    operators/    composite DataFrame operators (chunking, top-k, minhash, ...)
    sources/      edge readers (JSONL, markdown+frontmatter, binary)
    streaming/    event-time windowing / incremental idioms
    plans/        the query catalog: every SURVEY.md §2 inventory row as a
                  named (spark_fn, oracle_sql) pair consumed by
                  __spark_entry__.py
"""

from nocouncil_etl_spark.registry import REGISTRY, Query, query

__all__ = ["REGISTRY", "Query", "query"]
