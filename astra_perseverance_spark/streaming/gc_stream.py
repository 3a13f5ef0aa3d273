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

from astra_perseverance_spark.functions.ordering import report_sorted
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
        .transform(report_sorted("window_start", "dc"))
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


SESSION_GAP_SEC = 1800

_SESSION_OUT_SCHEMA = (
    "node string, session_start timestamp, session_end timestamp, "
    "pauses long, max_pause_ms long"
)
# open-session state: span extremes in epoch seconds + running stats
_SESSION_STATE_SCHEMA = "start long, end long, pauses long, max_pause long"


def _session_update(key, pdf_iter, state):
    """applyInPandasWithState update function for one node.

    State is the single open session (a gap-free span).  Each batch:
    merge the open span with the batch's events in ts order; every
    ≥ ``SESSION_GAP_SEC`` gap closes a session, which is emitted
    downstream (append mode).  The last span stays in state with an
    event-time timeout at end + gap, so a quiet node still closes its
    final session once the watermark passes the gap horizon.

    Runs once per (node, micro-batch) on already-shuffled Arrow
    batches — state size is one row per node, independent of rate."""
    import pandas as pd

    node = key[0]

    def _emit(spans):
        if not spans:
            return pd.DataFrame(columns=[
                "node", "session_start", "session_end", "pauses",
                "max_pause_ms",
            ])
        return pd.DataFrame({
            "node": node,
            "session_start": pd.to_datetime(
                [s[0] for s in spans], unit="s", utc=True
            ).tz_localize(None),
            "session_end": pd.to_datetime(
                [s[1] for s in spans], unit="s", utc=True
            ).tz_localize(None),
            "pauses": [s[2] for s in spans],
            "max_pause_ms": [s[3] for s in spans],
        })

    if state.hasTimedOut:
        # watermark passed end + gap: the open session is final.
        closed = [state.get] if state.exists else []
        state.remove()
        yield _emit(closed)
        return

    # (start, end, pauses, max_pause) spans: open state + batch events
    spans = [tuple(state.get)] if state.exists else []
    for pdf in pdf_iter:
        ep = (pdf["ts"].astype("int64") // 1_000_000_000).to_numpy()
        pm = pdf["pause_ms"].to_numpy()
        spans.extend((int(e), int(e), 1, int(p)) for e, p in zip(ep, pm))
    spans.sort()

    merged = [spans[0]]
    for s in spans[1:]:
        last = merged[-1]
        if s[0] - last[1] >= SESSION_GAP_SEC:
            merged.append(s)
        else:
            merged[-1] = (last[0], max(last[1], s[1]),
                          last[2] + s[2], max(last[3], s[3]))

    open_span = merged.pop()
    state.update(open_span)
    state.setTimeoutTimestamp((open_span[1] + SESSION_GAP_SEC) * 1000)
    yield _emit(merged)


def stream_gc_sessions(spark: SparkSession, source_dir: str,
                       schema: str | None = None):
    """Streaming sessionization: the ``q_gc_sessions`` gap rule as a
    custom stateful operator (``applyInPandasWithState``).

    Same semantics as the batch form, incrementally: closed sessions
    append as soon as a gap is observed (or the watermark times the
    open session out).  Returns the unstarted streaming DataFrame."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    sch = schema or "node string, dc string, ts timestamp, pause_ms int"
    stream = (
        spark.readStream.schema(sch).parquet(source_dir)
        .withWatermark("ts", WATERMARK)
    )
    return (
        stream.groupBy("node")
        .applyInPandasWithState(
            _session_update,
            outputStructType=_SESSION_OUT_SCHEMA,
            stateStructType=_SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def q_gc_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization of GC activity per node (batch form).

    A session closes after a ≥ 30-minute quiet gap.  Expressed with
    the standard lag + cumulative-sum window pattern — shuffle only on
    node, both windows share the same (node, ts) sort.  The streaming
    equivalent is ``stream_gc_sessions`` (applyInPandasWithState with
    an event-time timeout); the batch form is the oracle-checkable
    semantics, and ``tests/test_streaming.py`` asserts the two agree
    on the fixture stream."""
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
        .transform(report_sorted("node", "session_no"))
    )
