"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query (Q1 workload_reads) at sf0.001.
``queries()`` — every implemented operator from SURVEY.md §2.10 +
extensions; callables take (spark, sf_dir) → DataFrame.
``oracle_sql()`` — DuckDB-runnable ANSI SQL twin per query (omitted
only for non-SQL-expressible ops, which get a rows-only check).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from astra_perseverance_spark.oracle import ORACLE_SQL  # noqa: E402
from astra_perseverance_spark.queries import QUERY_REGISTRY  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERY_REGISTRY["workload_reads"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERY_REGISTRY)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLE_SQL)
