"""Streaming exact dedup over an unbounded ``documents`` stream.

The streaming side of the LLM-pipeline dedup family
(``extensions.dedup``): documents arrive continuously, and the first
occurrence of each normalized-content digest passes through; later
repeats are dropped.

Scale design: ``dropDuplicatesWithinWatermark`` keys state on the
content digest and *expires* each key once the watermark passes its
event time + horizon — state is bounded by the dedup horizon's
arrival volume, not corpus history, which is the only formulation
that survives an unbounded stream.  (Plain ``dropDuplicates`` on a
stream keeps every digest forever.)  The digest computation reuses
the batch twin's ``dedup.normalized_text`` expression, so the two
modes can never drift.

Equivalence contract, stated precisely: batch run ≡ streaming
pass-through set **when every row arrives before the watermark
passes its event time** (single-batch replay, or any source whose
lateness stays inside the horizon).  Beyond the horizon the operator
makes the standard two-sided trade: a repeat later than the horizon
passes again (state reclaimed), and a *first* occurrence arriving
later than the horizon is dropped as late.  Choose the horizon for
the source's real disorder bound.

The synthetic event time derives from ``doc_id`` (the fixture corpus
has no arrival column); a production source (Kafka/file drop) carries
its own event time and the pipeline is otherwise identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"

# Dedup horizon: repeats farther apart than this in event time may
# both pass (their state has been reclaimed) — the explicit
# correctness/state-size trade every streaming dedup makes.
DEDUP_HORIZON = "1 hour"


# Synthetic event-time base (2001-09-09).  Must sit strictly above
# the initial watermark (epoch 0): a row whose event time equals the
# watermark is already "late" and silently dropped by the dedup
# operator, so deriving ts directly from doc_id loses doc 0.
BASE_EPOCH = 1_000_000_000


def doc_digest_frame(docs: DataFrame) -> DataFrame:
    """(doc_id, lang, ts, content_md5) with the batch dedup's digest
    and the shared doc_id-derived event time (``with_event_time``)."""
    from astra_perseverance_spark.extensions.dedup import normalized_text

    return with_event_time(docs).select(
        "doc_id", "lang", "ts",
        F.md5(normalized_text()).alias("content_md5"),
    )


def stream_dedup_exact(spark: SparkSession, source_dir: str) -> DataFrame:
    """First-seen documents from a file-source stream, one per
    content digest within the watermark horizon.  Returns the
    unstarted streaming DataFrame; the caller picks sink/trigger."""
    from astra_perseverance_spark.streaming.source import event_file_stream

    stream = event_file_stream(spark, source_dir, DOC_SCHEMA,
                               required=("doc_id", "text"))
    return (
        doc_digest_frame(stream)
        .withWatermark("ts", DEDUP_HORIZON)
        .dropDuplicatesWithinWatermark(["content_md5"])
    )


# Ingestion-rate window width, and the throughput stream's OWN
# lateness bound — deliberately not DEDUP_HORIZON: how long the dedup
# operator retains digest state and how late a row may arrive for the
# monitoring windows are unrelated operational trade-offs, and tuning
# one must not silently move the other.
RATE_WINDOW = "1 minute"
RATE_LATENESS = "1 hour"  # value unchanged from the previously shared constant


def with_event_time(docs: DataFrame) -> DataFrame:
    """Attach the doc_id-derived event time as ``ts`` (the watermark
    column for streams; see ``doc_digest_frame`` for the derivation
    rationale)."""
    return docs.select(
        "*",
        F.timestamp_seconds(F.col("doc_id") + F.lit(BASE_EPOCH)).alias("ts"),
    )


def doc_minute_token_agg(docs_ts: DataFrame) -> DataFrame:
    """Per-minute ingestion throughput (docs, chars, whitespace
    tokens) — the monitoring aggregation a corpus-ingest pipeline
    watches.  Input must carry ``ts`` (use ``with_event_time``; a
    stream declares its watermark on that same column so windows are
    expirable).  Shared by the batch twin and the stream; exact
    integer sums, map-side partial aggregation."""
    return (
        docs_ts.select(
            "ts",
            F.col("n_chars").cast("long").alias("nc"),
            F.size(F.split(F.trim("text"), r"\s+")).cast("long").alias("nw"),
        )
        .groupBy(F.window("ts", RATE_WINDOW).alias("w"))
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("nc").cast("long").alias("total_chars"),
            F.sum("nw").cast("long").alias("total_ws_tokens"),
        )
        .select(F.col("w.start").alias("window_start"),
                "n_docs", "total_chars", "total_ws_tokens")
    )


def q_doc_minute_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the streaming throughput windows (oracle-checked;
    event time derives from doc_id as in ``doc_digest_frame``)."""
    from astra_perseverance_spark.extensions.corpus import docs_frame

    return doc_minute_token_agg(
        with_event_time(docs_frame(spark, sf_dir))
    ).orderBy("window_start")


def stream_doc_minute_tokens(spark: SparkSession, source_dir: str) -> DataFrame:
    """The same aggregation over a file-source stream with a
    watermark; returns the unstarted streaming DataFrame."""
    from astra_perseverance_spark.streaming.source import event_file_stream

    stream = event_file_stream(spark, source_dir, DOC_SCHEMA,
                               required=("doc_id", "text"))
    return doc_minute_token_agg(
        with_event_time(stream).withWatermark("ts", RATE_LATENESS))
