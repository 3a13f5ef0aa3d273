"""Declared query surface (SURVEY.md §2.10).

``QUERY_REGISTRY`` maps query name → callable(spark, sf_dir) →
DataFrame.  Every entry has a DuckDB oracle twin in
``astra_perseverance_spark.oracle`` unless listed in
``NO_ORACLE`` (non-SQL-expressible ops get a rows-only check).
"""

from astra_perseverance_spark.queries.registry import NO_ORACLE, QUERY_REGISTRY

__all__ = ["QUERY_REGISTRY", "NO_ORACLE"]
