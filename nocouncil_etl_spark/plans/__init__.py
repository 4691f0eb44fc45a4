"""Query catalog — importing this package registers every named query.

Each module covers a band of the SURVEY.md §2 operator inventory.
"""

from nocouncil_etl_spark.plans import flagship  # noqa: F401

MODULES = [flagship]
