"""Streaming curation gate: quality-filter + PII-redact an unbounded
``documents`` stream.

The streaming side of the curation family (``extensions.curation``):
documents arrive continuously; each is scored with the SAME Gopher
signal expressions and PII patterns as the batch queries (imported,
not copied — the two modes cannot drift), failing documents are
dropped, and passing documents are emitted with their PII redacted
and the signal columns attached.

Scale design: the gate is STATELESS — per-row projections and a
filter, no watermark state, no shuffle — so it runs at source
parallelism on any executor count and composes in front of the
stateful stages (``doc_stream.stream_dedup_exact``) that do need
state.  Ordering curation before dedup keeps junk out of the dedup
operator's keyed state.

Batch equivalence is exact (stateless ⇒ no watermark caveats): the
pass-through set equals the batch filter on the same rows, which
``tests/test_streaming.py`` asserts via an availableNow replay.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from astra_perseverance_spark.extensions.curation import (
    pii_count_columns,
    pii_redacted,
    quality_signals_frame,
)
from astra_perseverance_spark.streaming.doc_stream import (
    DOC_SCHEMA,
    with_event_time,
)


def curation_gate(docs: DataFrame) -> DataFrame:
    """(ts, pii_total, redacted, doc_id, signals…) for documents
    passing the Gopher rules — one stateless projection chain (no
    join: a self-join of a streaming frame would be a stateful
    stream-stream join), so it works identically on a batch or
    streaming frame."""
    pii_total = pii_count_columns()[0]
    for c in pii_count_columns()[1:]:
        pii_total = pii_total + c
    enriched = with_event_time(docs).select(
        "ts",
        pii_total.cast("long").alias("pii_total"),
        pii_redacted().alias("redacted"),
        "doc_id", "text",
    )
    return (
        quality_signals_frame(enriched, keep=("ts", "pii_total", "redacted"))
        .filter(F.col("gopher_pass"))
    )


def stream_curation_gate(spark: SparkSession, source_dir: str) -> DataFrame:
    """The gate over a file-source stream; returns the unstarted
    streaming DataFrame (caller picks sink/trigger)."""
    from astra_perseverance_spark.streaming.source import event_file_stream

    stream = event_file_stream(spark, source_dir, DOC_SCHEMA,
                               required=("doc_id", "text"))
    return curation_gate(stream)


def curated_dedup(docs: DataFrame) -> DataFrame:
    """Gate → digest → watermark-bounded exact dedup, composed over
    one streaming frame: the stateless gate runs first so junk never
    enters the dedup operator's keyed state, and the surviving rows
    carry the REDACTED text's digest — a curated pipeline dedups what
    it would ship, not the raw input.  (``dropDuplicatesWithinWatermark``
    is streaming-only; the batch twin is gate + distinct digests.)"""
    from astra_perseverance_spark.extensions.dedup import normalized_text
    from astra_perseverance_spark.streaming.doc_stream import DEDUP_HORIZON

    return (
        curation_gate(docs)
        .withColumn("content_md5", F.md5(normalized_text("redacted")))
        .withWatermark("ts", DEDUP_HORIZON)
        .dropDuplicatesWithinWatermark(["content_md5"])
    )


def stream_curated_dedup(spark: SparkSession, source_dir: str) -> DataFrame:
    """The full streaming intake pipeline (gate + dedup) over a
    file-source stream; returns the unstarted streaming DataFrame."""
    from astra_perseverance_spark.streaming.source import event_file_stream

    stream = event_file_stream(spark, source_dir, DOC_SCHEMA,
                               required=("doc_id", "text"))
    return curated_dedup(stream)
