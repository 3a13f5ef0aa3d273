"""Streaming GC-pause analytics: tumbling windows + watermark over an
unbounded ``gc_event`` stream.

Shared-logic design: ``gc_minute_window_agg`` is a pure DataFrame →
DataFrame transformation applied identically to

- the *batch* fact (registered query ``gc_minute_windows`` — this is
  what the DuckDB oracle checks), and
- a ``readStream`` source (``stream_gc_minute_windows``), where the
  same windowed aggregation runs incrementally with a watermark for
  late data.

That equivalence — batch run ≡ final streaming state for the same
input — is asserted by ``tests/test_streaming.py``, which feeds the
fixture parquet through a file-source stream into a memory sink.

Scale: the streaming agg keys on (window, dc) — state size is bounded
by |DCs| × watermark horizon, independent of event rate; partial
aggregation happens per micro-batch before the state-store shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

WATERMARK = "10 minutes"


def gc_minute_window_agg(events: DataFrame) -> DataFrame:
    """Per (5-minute tumbling window, dc): pause count, max, mean-ish
    sum — the engine's streaming-safe statistics (all algebraic;
    exact percentiles stay a batch concern, functions.percentiles)."""
    return (
        events.groupBy(F.window("ts", "5 minutes").alias("w"), "dc")
        .agg(
            F.count("*").cast("long").alias("pauses"),
            F.max("pause_ms").cast("long").alias("max_pause_ms"),
            F.sum("pause_ms").cast("long").alias("sum_pause_ms"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "dc", "pauses", "max_pause_ms", "sum_pause_ms",
        )
    )


def q_gc_minute_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the streaming aggregation (oracle-checked)."""
    from astra_perseverance_spark.conformed import load_model

    return (
        gc_minute_window_agg(load_model(spark, sf_dir).gc_event)
        .orderBy("window_start", "dc")
    )


def stream_gc_minute_windows(spark: SparkSession, source_dir: str,
                             schema: str | None = None):
    """The same aggregation over a file-source stream.

    ``source_dir`` is a directory of parquet files with gc_event
    schema; files appearing later are picked up incrementally — the
    standard replayable-source shape (at scale: Kafka, with the same
    downstream code).  Returns the unstarted streaming DataFrame; the
    caller picks sink/trigger/output-mode."""
    sch = schema or "node string, dc string, ts timestamp, pause_ms int"
    stream = (
        spark.readStream.schema(sch).parquet(source_dir)
        .withWatermark("ts", WATERMARK)
    )
    return gc_minute_window_agg(stream)


def q_gc_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization of GC activity per node (batch form).

    A session closes after a ≥ 30-minute quiet gap.  Expressed with
    the standard lag + cumulative-sum window pattern — shuffle only on
    node, both windows share the same (node, ts) sort.  The streaming
    equivalent would be ``applyInPandasWithState`` with a session
    timeout; the batch form is the oracle-checkable semantics."""
    from pyspark.sql import Window

    from astra_perseverance_spark.conformed import load_model

    gc = load_model(spark, sf_dir).gc_event
    w = Window.partitionBy("node").orderBy("ts", "pause_ms")
    with_gap = gc.withColumn(
        "new_session",
        (F.col("ts").cast("long")
         - F.lag(F.col("ts").cast("long"), 1, 0).over(w) >= 1800).cast("int"),
    )
    sess = with_gap.withColumn(
        "session_no",
        F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        sess.groupBy("node", "session_no")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count("*").cast("long").alias("pauses"),
            F.max("pause_ms").cast("long").alias("max_pause_ms"),
        )
        .orderBy("node", "session_no")
    )
