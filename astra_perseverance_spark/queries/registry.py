"""Query registry: name → callable(spark, sf_dir) → DataFrame."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from astra_perseverance_spark.queries import workload

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERY_REGISTRY: dict[str, QueryFn] = {
    "workload_reads": workload.q_workload_reads,
    "workload_writes": workload.q_workload_writes,
    "workload_summary": workload.q_workload_summary,
    "data_size": workload.q_data_size,
    "workload_rw_outer": workload.q_workload_rw_outer,
    "summary_long": workload.q_summary_long,
}

# Queries with no SQL-expressible oracle (driver runs rows-only check).
NO_ORACLE: frozenset[str] = frozenset()
