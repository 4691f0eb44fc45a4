"""Query catalog — importing this package registers every named query.

Each module covers a band of the SURVEY.md §2 operator inventory.
"""

from nocouncil_etl_spark.plans import (  # noqa: F401
    aggregates,
    flagship,
    joins,
    relational,
    scalar_functions,
    windows,
)

MODULES = [flagship, relational, scalar_functions, joins, aggregates, windows]
