"""Query catalog — importing this package registers every named query.

Each module covers a band of the SURVEY.md §2 operator inventory.
"""

from nocouncil_etl_spark.plans import (  # noqa: F401
    aggregates,
    breadth2,
    chunk_summarize_plans,
    dedup_plans,
    extract_plans,
    flagship,
    joins,
    misc_fns,
    model_plans,
    pipeline_plans,
    range_time_plans,
    relational,
    scalar_functions,
    source_plans,
    streaming_plans,
    text_plans,
    tpch_like,
    tpch_more,
    udaf_plans,
    vectors_plans,
    window_more,
    windows,
)

MODULES = [
    flagship,
    relational,
    scalar_functions,
    joins,
    aggregates,
    windows,
    vectors_plans,
    dedup_plans,
    text_plans,
    model_plans,
    streaming_plans,
    source_plans,
    tpch_like,
    extract_plans,
    pipeline_plans,
    udaf_plans,
    range_time_plans,
    tpch_more,
    window_more,
    misc_fns,
    chunk_summarize_plans,
    breadth2,
]
