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
SESSION_GAP_US = SESSION_GAP_SEC * 1_000_000

_SESSION_OUT_SCHEMA = (
    "node string, session_start timestamp, session_end timestamp, "
    "pauses long, max_pause_ms long"
)
# open-session state: span extremes in epoch MICROS + running stats,
# the node's event-time high-water mark, and — when a lateness budget
# is configured — the reorder buffer of not-yet-finalized events.
_SESSION_STATE_SCHEMA = (
    "start long, end long, pauses long, max_pause long, "
    "max_ts long, pend_ts array<long>, pend_pm array<long>, "
    "em_end long"
)

# Bumped whenever _SESSION_STATE_SCHEMA or the MEANING of a state
# field changes; a checkpoint from another version needs a fresh
# start (replay the source or drain the old query first).  v2 =
# round 8: gained max_ts/pend_ts/pend_pm (resume from v1 fails on
# the schema mismatch — loud) AND switched start/end from epoch
# SECONDS to MICROS.  The unit change alone would have been SILENT
# on resume — seconds-valued state reinterpreted as micros — which
# is exactly why this version marker exists: any future
# same-shape/different-meaning change must bump it so deployments
# gate resume-vs-fresh on the constant, not on a crash.  v3 =
# round 11: gained em_end (the newest EMITTED session end) so an
# over-budget late event older than emitted history is DROPPED —
# the documented monotone degradation — instead of being emitted as
# a spurious session overlapping an already-appended row (resume
# from v2 fails on the schema mismatch — loud).
STATE_FORMAT_VERSION = 3

# Defensive bound on the per-node reorder buffer (the lateness budget
# already bounds it by budget × event rate): oldest buffered events
# finalize eagerly rather than growing state.
REORDER_BUFFER_CAP = 4096


def _merge_spans(spans):
    """Fold sorted (start, end, pauses, max_pause) epoch-MICROS spans
    with the ≥ SESSION_GAP_SEC gap rule — the batch semantics, shared
    by the update path and the timeout flush."""
    merged = [spans[0]]
    for s in spans[1:]:
        last = merged[-1]
        if s[0] - last[1] >= SESSION_GAP_US:
            merged.append(s)
        else:
            merged[-1] = (last[0], max(last[1], s[1]),
                          last[2] + s[2], max(last[3], s[3]))
    return merged


def _make_session_update(lateness_sec: int):
    def _session_update(key, pdf_iter, state):
        """applyInPandasWithState update function for one node.

        State is the single open session (a gap-free span built from
        FINALIZED events) plus, with ``lateness_sec > 0``, a reorder
        buffer: events newer than ``max_ts − lateness_sec`` are not
        folded yet, so a cross-batch late event landing inside the
        buffered region can still merge two provisional sessions into
        one (without the buffer the earlier session may already be
        emitted and the late bridge is silently lost — the declared
        r7 gap).  A late event older than the newest EMITTED session
        end (over-budget data) is DROPPED — the monotone degradation
        the module declares; emitting it would append a fragment
        overlapping a session this append-mode stream can never
        retract (state field ``em_end``, v3).  Each batch merges the
        open span with the finalized
        events in ts order; every ≥ ``SESSION_GAP_SEC`` gap closes a
        session, which is emitted downstream (append mode).  The last
        span stays in state with an event-time timeout past the
        newest buffered/open timestamp + gap, so a quiet node still
        flushes the buffer and closes its final session once the
        watermark passes the gap horizon.

        Runs once per (node, micro-batch) on already-shuffled Arrow
        batches — state is one row per node plus the lateness-bounded
        buffer, independent of total event rate."""
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
                    [s[0] for s in spans], unit="us", utc=True
                ).tz_localize(None),
                "session_end": pd.to_datetime(
                    [s[1] for s in spans], unit="us", utc=True
                ).tz_localize(None),
                "pauses": [s[2] for s in spans],
                "max_pause_ms": [s[3] for s in spans],
            })

        if state.hasTimedOut:
            # watermark passed the gap horizon: replay the buffer on
            # top of the open span — everything is final now.
            if state.exists:
                (start, end, pauses, maxp, _mt,
                 pend_ts, pend_pm, _ee) = tuple(state.get)
                spans = [(start, end, pauses, maxp)] if start is not None \
                    else []
                spans += [(int(t), int(t), 1, int(p))
                          for t, p in zip(pend_ts, pend_pm)]
                spans.sort()
                closed = _merge_spans(spans) if spans else []
            else:
                closed = []
            state.remove()
            yield _emit(closed)
            return

        if state.exists:
            (start, end, pauses, maxp, max_ts,
             pend_ts, pend_pm, em_end) = tuple(state.get)
            open_span = (start, end, pauses, maxp) if start is not None \
                else None
            pending = list(zip(pend_ts, pend_pm))
        else:
            open_span, max_ts, pending, em_end = None, None, [], None

        events = list(pending)
        for pdf in pdf_iter:
            # nanos -> exact epoch MICROS: flooring to whole seconds
            # here would truncate emitted session bounds and diverge
            # from the batch twin on sub-second timestamps.
            # TIMEZONE CONTRACT: Arrow hands the update function
            # SESSION-LOCAL naive timestamps; these are true epoch
            # micros only because the engine pins
            # spark.sql.session.timeZone=UTC (session.py).  A non-UTC
            # session would make this wall-clock arithmetic (and
            # break ordering across a DST fall-back) — keep the
            # session UTC, as every entry point here does.
            ep = (pdf["ts"].astype("int64") // 1_000).to_numpy()
            pm = pdf["pause_ms"].to_numpy()
            events.extend((int(e), int(p)) for e, p in zip(ep, pm))
        if events:
            batch_max = max(t for t, _p in events)
            max_ts = batch_max if max_ts is None else max(max_ts, batch_max)
        wm = (max_ts - lateness_sec * 1_000_000) \
            if max_ts is not None else None
        events.sort()
        fin = [e for e in events if e[0] <= wm] if events else []
        pend = [e for e in events if e[0] > wm] if events else []
        if len(pend) > REORDER_BUFFER_CAP:
            spill = len(pend) - REORDER_BUFFER_CAP
            fin += pend[:spill]  # oldest finalize eagerly (declared cap)
            pend = pend[spill:]
        if em_end is not None:
            # over-budget late data older than EMITTED history is
            # dropped (the declared monotone degradation): append
            # mode can never retract the session it belongs to, and
            # emitting it as its own fragment would produce a row
            # overlapping an already-appended session.  Buffered
            # (pend) events are always newer than em_end — a session
            # only closes behind the finalization watermark, which
            # never regresses — so only fresh finalized rows need the
            # gate.
            fin = [e for e in fin if e[0] > int(em_end)]

        spans = ([open_span] if open_span else []) \
            + [(t, t, 1, p) for t, p in fin]
        spans.sort()
        merged = _merge_spans(spans) if spans else []
        open_span = merged.pop() if merged else None
        if merged:
            em_end = max(int(em_end) if em_end is not None else -1,
                         max(s[1] for s in merged))

        state.update((
            open_span[0] if open_span else None,
            open_span[1] if open_span else None,
            open_span[2] if open_span else None,
            open_span[3] if open_span else None,
            max_ts,
            [t for t, _p in pend],
            [p for _t, p in pend],
            em_end,
        ))
        # max_ts already dominates every candidate: the open span's
        # end is <= wm <= max_ts and every buffered event is <= max_ts
        # by construction, so the timeout horizon is just max_ts + gap
        # (ceil micros -> ms so the horizon never lands early)
        state.setTimeoutTimestamp(
            -(-max_ts // 1000) + SESSION_GAP_SEC * 1000)
        yield _emit(merged)

    return _session_update


def stream_gc_sessions(spark: SparkSession, source_dir: str,
                       schema: str | None = None,
                       max_files_per_trigger: int | None = None,
                       lateness_sec: int = 0):
    """Streaming sessionization: the ``q_gc_sessions`` gap rule as a
    custom stateful operator (``applyInPandasWithState``).

    Same semantics as the batch form, incrementally: closed sessions
    append as soon as a gap is observed (or the watermark times the
    open session out).  ``lateness_sec`` enables the watermark-bounded
    reorder buffer (the same mechanism as ``funnel_stream`` /
    ``attribution_stream``): a cross-batch late event inside the
    budget can still MERGE two provisional sessions; 0 keeps the
    greedy walk, where such an event is declared-dropped into the
    monotone behavior.  Unlike those two operators this stream also
    declares ``withWatermark`` (the event-time timeout requires it),
    and Spark's own late-row filter drops inputs older than the
    stream watermark BEFORE they reach the state function — so the
    effective budget is ``min(lateness_sec, WATERMARK delay)``; a
    deployment wanting a larger budget raises both.  Returns the
    unstarted streaming DataFrame."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    from astra_perseverance_spark.streaming.source import (
        event_file_stream,
    )

    sch = schema or "node string, dc string, ts timestamp, pause_ms int"
    stream = event_file_stream(
        spark, source_dir, sch, required=("node", "ts", "pause_ms"),
        max_files_per_trigger=max_files_per_trigger,
    ).withWatermark("ts", WATERMARK)
    return (
        stream.groupBy("node")
        .applyInPandasWithState(
            _make_session_update(lateness_sec),
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
    # exact MICROSECOND gap arithmetic (unix_micros is exact BIGINT);
    # cast-to-long would truncate to whole seconds, so two events
    # 1799.6 s apart would start a new session on sub-second data —
    # the streaming twin and the DuckDB oracle (epoch_us) match this
    with_gap = gc.withColumn(
        "new_session",
        (F.unix_micros(F.col("ts"))
         - F.lag(F.unix_micros(F.col("ts")), 1, 0).over(w)
         >= SESSION_GAP_SEC * 1_000_000).cast("int"),
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
