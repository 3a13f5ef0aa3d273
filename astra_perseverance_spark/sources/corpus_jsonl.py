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


def _read_schema(strict: bool) -> StructType:
    if strict:
        return DOC_SCHEMA
    return StructType(
        list(DOC_SCHEMA.fields) + [StructField("_corrupt", StringType())]
    )


def _conform(df: DataFrame, strict: bool) -> DataFrame:
    """Shared batch/streaming projection from the raw JSON read to the
    conformed contract: corrupt + contract-violating lines are dropped
    in permissive mode and fail the read in strict mode; fill the
    documented defaults, recompute n_chars when absent."""
    if not strict:
        df = df.filter(F.col("_corrupt").isNull()).drop("_corrupt")
    ok = F.col("doc_id").isNotNull() & F.col("text").isNotNull()
    if strict:
        # FAILFAST only rejects malformed JSON; a valid-JSON document
        # missing doc_id/text must also FAIL the read in strict mode,
        # not silently vanish
        df = df.withColumn(
            "doc_id",
            F.when(ok, F.col("doc_id")).otherwise(F.raise_error(F.concat(
                F.lit("documents JSONL contract violation "
                      "(strict mode): "),
                F.to_json(F.struct("doc_id", "lang", "source",
                                   "n_chars"))))),
        )
    else:
        df = df.filter(ok)
    return df.select(
        "doc_id", "text",
        F.coalesce("lang", F.lit("und")).alias("lang"),
        F.coalesce("source", F.lit("jsonl")).alias("source"),
        F.coalesce("n_chars", F.length("text").cast("long"))
        .alias("n_chars"),
    )


# Scale-adaptive ingest write width (optimization r16, guide §2.2/§6).
# The three ingest writers used to repartition to
# ``defaultParallelism`` — a constant tuned for neither end of the
# scale: at 100 TB it under-partitions the converted corpus (one wave
# of enormous tasks and parquet files), at test scale it shatters a
# 100 KB dump into 32 near-empty files.  The width is derived from the
# SOURCE's listed byte size instead (driver-side filesystem metadata —
# no pre-scan of the data, unlike a row count, which on JSONL would be
# a full parse pass before the real one): floor a task at
# ``INGEST_MIN_BYTES`` of raw source, cap it at ``INGEST_TARGET_BYTES``
# (≈ the guide's 128 MB–1 GB output-file band after JSON→parquet
# shrink), use every core in between — the same
# ``extensions.corpus.cluster_width`` arms the parquet frames got in
# r15, with bytes as the unit because the source is unparsed text.
INGEST_MIN_BYTES_ENV = "SPARK_GRAFT_INGEST_MIN_BYTES"
INGEST_TARGET_BYTES_ENV = "SPARK_GRAFT_INGEST_TARGET_BYTES"
INGEST_MIN_BYTES = 16 << 20
INGEST_TARGET_BYTES = 256 << 20


def source_bytes(spark: SparkSession, path: str) -> int:
    """Total listed size of ``path`` (file, directory or glob) through
    the Hadoop filesystem API — works for any scheme Spark can read,
    costs one driver-side listing, never touches the data."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    total = 0
    statuses = fs.globStatus(jpath)
    for st in statuses or []:
        if st.isDirectory():
            it = fs.listFiles(st.getPath(), True)
            while it.hasNext():
                total += it.next().getLen()
        else:
            total += st.getLen()
    return total


def ingest_width(spark: SparkSession, src: str) -> int:
    """Partition count for an ingest write over source ``src`` —
    ``cluster_width`` on the source's listed bytes."""
    from astra_perseverance_spark.extensions.corpus import cluster_width

    return cluster_width(
        spark, source_bytes(spark, src),
        int(os.environ.get(INGEST_MIN_BYTES_ENV) or 0) or INGEST_MIN_BYTES,
        int(os.environ.get(INGEST_TARGET_BYTES_ENV) or 0)
        or INGEST_TARGET_BYTES)


def jsonl_reader(spark: SparkSession, schema, strict: bool,
                 streaming: bool = False):
    """The ONE JSONL reader assembly shared by the documents and
    events sources, batch and streaming: schema pinned (inference is
    a full extra pass over the dump at scale), FAILFAST when strict,
    PERMISSIVE + corrupt-record quarantine column otherwise.  A fix
    to the corrupt-line handling lands in all four read paths at
    once instead of drifting across copies."""
    reader = (
        (spark.readStream if streaming else spark.read)
        .schema(schema)
        .option("mode", "FAILFAST" if strict else "PERMISSIVE")
    )
    if not strict:
        reader = reader.option("columnNameOfCorruptRecord", "_corrupt")
    return reader


def drain_ingest_stream(sdf: DataFrame, dest: str,
                        checkpoint: str) -> None:
    """Shared exactly-once ingest sink: parquet append gated by the
    file-source offset log + sink commit log at ``checkpoint``,
    ``availableNow`` so the call blocks until the current backlog is
    drained — the contract both streaming ingests document."""
    q = (
        sdf.writeStream.format("parquet")
        .option("path", dest)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def read_documents_jsonl(spark: SparkSession, path: str,
                         strict: bool = True) -> DataFrame:
    """Read a JSONL document dump into the conformed ``documents``
    schema.  Returns (doc_id, text, lang, source, n_chars) with
    n_chars recomputed from the text when the dump omits it."""
    reader = jsonl_reader(spark, _read_schema(strict), strict)
    return _conform(reader.json(path), strict)


def ingest_jsonl_corpus(spark: SparkSession, src: str, out_dir: str,
                        strict: bool = True) -> str:
    """Convert a JSONL dump into an engine corpus directory: writes
    ``out_dir/documents.parquet`` in the conformed schema and returns
    ``out_dir`` — usable as the ``sf_dir`` of every corpus query.

    The write repartitions on doc_id so downstream first reads are
    already spread across tasks even when the dump was a single
    (unsplittable) gzip member — at a width derived from the source's
    listed bytes (``ingest_width``), not a core-count constant; for a
    durable clustered layout run ``sinks.warehouse.
    write_bucketed_corpus`` over the result."""
    docs = read_documents_jsonl(spark, src, strict=strict)
    dest = os.path.join(out_dir, "documents.parquet")
    (
        docs.repartition(ingest_width(spark, src), "doc_id")
        .write.mode("overwrite").parquet(dest)
    )
    return out_dir


def stream_documents_jsonl(spark: SparkSession, path: str,
                           strict: bool = False) -> DataFrame:
    """Unbounded counterpart of ``read_documents_jsonl``: a file-source
    stream over a directory JSONL files keep landing in, conformed by
    the SAME projection (shared ``_conform`` — the two modes cannot
    drift).  Returns the unstarted streaming frame; the caller picks
    sink/trigger, matching the other ``streaming/`` constructors.

    Default is permissive, not strict: an unbounded ingest should
    quarantine a bad line, not kill the query a week in."""
    reader = jsonl_reader(spark, _read_schema(strict), strict,
                          streaming=True)
    return _conform(reader.json(path), strict)


def stream_ingest_jsonl_corpus(spark: SparkSession, src: str, out_dir: str,
                               strict: bool = False):
    """Incremental, exactly-once JSONL → corpus ingest: each call
    processes only files not yet recorded in the checkpoint (file-source
    offset log + parquet-sink commit log) and APPENDS them to
    ``out_dir/documents.parquet`` — re-running after a crash or on a
    schedule never duplicates a document, the property the batch
    (overwrite-everything) ingest cannot give an append-only dump at
    100 TB.  Blocks until the available backlog is drained
    (``availableNow``) and returns ``out_dir``."""
    drain_ingest_stream(
        stream_documents_jsonl(spark, src, strict=strict),
        os.path.join(out_dir, "documents.parquet"),
        os.path.join(out_dir, "_checkpoint"),
    )
    return out_dir
