"""Shared file-source stream construction for the stateful operators.

One definition of the reader boilerplate (schema, optional
``maxFilesPerTrigger``, parquet directory source) plus the NULL-ROW
QUARANTINE: the stateful update functions convert required columns
with ``int()`` inside Arrow batches, so a single row with a NULL
required field (pandas delivers the column as float64 with NaN) would
raise in the Python worker, fail the task, fail again on every retry
of the same file, and kill the streaming query PERMANENTLY.  Rows
missing a required field are contract-violating (the batch twins read
conformed sources where these fields are non-null), so they are
dropped JVM-side before the state shuffle — a cheap codegen filter,
never a Python-side crash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def event_file_stream(spark: SparkSession, source_dir: str, schema: str,
                      required: tuple[str, ...],
                      max_files_per_trigger: int | None = None) -> DataFrame:
    """Unstarted file-source stream over ``source_dir`` with rows
    missing any ``required`` column dropped (see module docstring)."""
    reader = spark.readStream.schema(schema)
    # `is not None`, not truthiness: a caller passing 0 must hit
    # Spark's own option validation loudly, not get an unthrottled
    # stream silently
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(source_dir)
    cond = F.lit(True)
    for c in required:
        cond = cond & F.col(c).isNotNull()
    return stream.filter(cond)
