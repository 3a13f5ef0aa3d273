"""Streaming as-of attribution: the ``events_asof`` semantics as a
custom stateful operator (``applyInPandasWithState``).

Per-user state is the newest FINALIZED click, the user's event-time
high-water mark, and — when a lateness budget is configured — a
reorder buffer of not-yet-finalized events, so state size stays
dimension-grain (one row per user; the buffer is bounded by the
lateness budget × per-user rate, defensively capped at
``REORDER_BUFFER_CAP``).

Within a micro-batch events are processed in (ns, clicks-first,
event_id) order — equal-timestamp clicks land before purchases,
matching the batch twin's inclusive tie semantics.  With
``lateness_ns=0`` (default) everything finalizes immediately:
purchases attribute against the newest click seen so far and append
at once, converging to the batch twin whenever batches arrive
event-time ordered.  With ``lateness_ns=L`` events newer than
``max_ns − L`` wait in the buffer; a purchase only emits once the
user's watermark passes it, by which point any click inside the
budget — even one arriving in a LATER batch with an earlier
timestamp — has been replayed ahead of it in event-time order, so
the emitted attribution matches the batch twin.  The trade-off
becomes explicit latency (one watermark advance) instead of a silent
dropped attribution; an arrival later than the budget degrades to
the monotone behavior (a too-late click still attributes future
purchases, never past ones) — a *declared* bound.

Buffered purchases additionally emit PROVISIONAL rows (their current
attribution against everything replayed before them in event-time
order), superseded on change or finalization — last row wins keyed
by event_id, mirroring ``funnel_stream``.  Without this, a bounded
replay (``availableNow``) or a user who goes quiet would silently
withhold every purchase inside the lateness budget of that user's
final watermark; with it the tail converges to the batch twin and
in-between rows are a documented change stream.  The state tracks
the last emitted (asof_ns, asof_event_id) per still-buffered
purchase so an unchanged provisional row is never re-emitted on
buffer replay, and a finalization that matches the already-emitted
provisional row is suppressed too.  Dormant-user state GC: pass
``inactivity_timeout_ms`` and the operator arms a per-user
``ProcessingTimeTimeout`` — a user with no traffic for that long has
their buffered purchases FINALIZED against everything already
replayed (the reorder buffer exists to wait for in-budget
stragglers; a user silent past the inactivity budget has, by
declaration, none coming) and their state row dropped, so state
stays bounded by the ACTIVE user set instead of growing with every
user ever seen.  A user who returns later starts fresh — their next
purchase attributes only against clicks from the new activity burst,
the same declared monotone degradation as an over-budget late
arrival.  The default (``None``) keeps NoTimeout so attribution
survives arbitrarily long user gaps on the bounded test corpus.

State-schema compatibility (STATE_FORMAT_VERSION): the state row
widened in round 8 (em_eid/em_ans/em_aeid — the emitted-provisional
ledger).  ``applyInPandasWithState`` persists state rows in the
checkpoint, so a streaming query RESUMED from a checkpoint written
by an earlier version fails on the schema mismatch; the supported
upgrade is a fresh checkpoint (replay the source, or drain the old
query to empty first).  Bump ``STATE_FORMAT_VERSION`` on any state
schema/semantics change so deployments can gate resume-vs-fresh.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

_OUT_SCHEMA = (
    "event_id long, user_id long, purchase_ns long, "
    "asof_ns long, asof_event_id long, gap_ns long"
)
_STATE_SCHEMA = (
    "ns long, event_id long, max_ns long, "
    "pend_ns array<long>, pend_eid array<long>, pend_click array<boolean>, "
    "em_eid array<long>, em_ans array<long>, em_aeid array<long>"
)

REORDER_BUFFER_CAP = 4096

# Bumped whenever _STATE_SCHEMA or the meaning of a state field
# changes; a checkpoint from another version needs a fresh start
# (see module docstring).  v2 = round-8 emitted-provisional ledger;
# v3 = inactivity-timeout GC (schema unchanged, timeout semantics
# added — the same class of change that bumped the funnel twin to 3:
# a v2 checkpoint resumed under a v3 binary parses, but pre-existing
# rows never armed a timer and are GC'd only after their next event
# arms one, so deployments enabling the timeout should start fresh).
STATE_FORMAT_VERSION = 3

# NULL attribution (purchase with no prior click) inside the emitted-
# provisional state arrays (event-time ns / event ids are non-negative).
_NULL_NS = -1


def _make_attr_update(lateness_ns: int, timeout_ms: int | None = None):
    def _attr_update(key, pdf_iter, state):
        import pandas as pd

        user = key[0]
        # inactivity GC: the group fires with no input once the user
        # has been quiet for timeout_ms — finalize the whole buffer
        # and drop the state row (module docstring, round-9)
        timed_out = timeout_ms is not None and bool(state.hasTimedOut)
        if state.exists:
            (ns0, eid0, max_ns, pend_ns, pend_eid, pend_click,
             em_eid, em_ans, em_aeid) = tuple(state.get)
            latest = (ns0, eid0) if ns0 is not None else None
            pending = list(zip(pend_ns, pend_eid, pend_click))
            dec = (lambda x: None if x is None or x == _NULL_NS
                   else int(x))
            # eid → (asof_ns, asof_eid) already emitted provisionally
            emitted = {int(e): (dec(a), dec(ae))
                       for e, a, ae in zip(em_eid, em_ans, em_aeid)}
        else:
            latest, max_ns, pending, emitted = None, None, [], {}
        events = [(int(ns), int(eid), et == "click")
                  for pdf in pdf_iter
                  for eid, et, ns in zip(pdf["event_id"],
                                         pdf["event_type"], pdf["ns"])
                  if et in ("click", "purchase")]
        events += [(int(ns), int(eid), bool(ic))
                   for ns, eid, ic in pending]
        if events:
            batch_max = max(ns for ns, _e, _c in events)
            max_ns = batch_max if max_ns is None else max(max_ns, batch_max)
        wm = (max_ns - lateness_ns) if max_ns is not None else None
        if timed_out and max_ns is not None:
            # no in-budget straggler is coming from a user this quiet:
            # the whole buffer finalizes (wm past every buffered ns)
            wm = max_ns
        # (ns, clicks-first, event_id): an equal-ns click attributes
        # the purchase regardless of event_id — the batch twin's
        # inclusive right.ts <= left.ts semantics (functions.asof)
        ordered = sorted(
            (ns, 0 if is_click else 1, eid) for ns, eid, is_click in events)
        fin = [e for e in ordered if e[0] <= wm] if events else []
        pend = [e for e in ordered if e[0] > wm] if events else []
        if len(pend) > REORDER_BUFFER_CAP:
            spill = len(pend) - REORDER_BUFFER_CAP
            fin += pend[:spill]
            pend = pend[spill:]
        out = {c: [] for c in ("event_id", "purchase_ns",
                               "asof_ns", "asof_event_id", "gap_ns")}

        def emit(eid, ns, hit):
            out["event_id"].append(eid)
            out["purchase_ns"].append(ns)
            out["asof_ns"].append(hit[0] if hit else None)
            out["asof_event_id"].append(hit[1] if hit else None)
            out["gap_ns"].append(ns - hit[0] if hit else None)

        for ns, kind, eid in fin:
            if kind == 0:
                cand = (ns, eid)
                if latest is None or cand > latest:
                    latest = cand
            else:
                hit = latest if latest is not None and latest[0] <= ns \
                    else None
                key_hit = (hit[0] if hit else None, hit[1] if hit else None)
                # a provisional row with the same attribution already
                # went out — finalization changes nothing downstream
                if emitted.pop(eid, None) != key_hit:
                    emit(eid, ns, hit)
        # provisional pass over the buffered tail: purchases emit
        # their CURRENT attribution (finalized latest + in-buffer
        # clicks replayed ahead of them), superseded on change —
        # last row wins keyed by event_id
        new_emitted = {}
        plat = latest
        for ns, kind, eid in pend:
            if kind == 0:
                cand = (ns, eid)
                if plat is None or cand > plat:
                    plat = cand
            else:
                hit = plat if plat is not None and plat[0] <= ns else None
                key_hit = (hit[0] if hit else None, hit[1] if hit else None)
                if emitted.get(eid, ()) != key_hit:
                    emit(eid, ns, hit)
                new_emitted[eid] = key_hit
        enc = (lambda x: _NULL_NS if x is None else int(x))
        if timed_out:
            state.remove()
        else:
            state.update((
                latest[0] if latest else None,
                latest[1] if latest else None,
                max_ns,
                [ns for ns, _k, _e in pend],
                [e for _ns, _k, e in pend],
                [k == 0 for _ns, k, _e in pend],
                [int(e) for e in new_emitted],
                [enc(a) for a, _ae in new_emitted.values()],
                [enc(ae) for _a, ae in new_emitted.values()],
            ))
            if timeout_ms is not None:
                state.setTimeoutDuration(timeout_ms)
        yield pd.DataFrame({
            "event_id": pd.Series(out["event_id"], dtype="Int64"),
            "user_id": pd.Series([user] * len(out["event_id"]),
                                 dtype="Int64"),
            "purchase_ns": pd.Series(out["purchase_ns"], dtype="Int64"),
            "asof_ns": pd.Series(out["asof_ns"], dtype="Int64"),
            "asof_event_id": pd.Series(out["asof_event_id"], dtype="Int64"),
            "gap_ns": pd.Series(out["gap_ns"], dtype="Int64"),
        })

    return _attr_update


def stream_events_asof(spark: SparkSession, source_dir: str,
                       schema: str | None = None,
                       max_files_per_trigger: int | None = None,
                       lateness_ns: int = 0,
                       inactivity_timeout_ms: int | None = None):
    """Streaming as-of attribution over a file-source event stream
    (rows: event_id, user_id, event_type, ns).  Returns the unstarted
    streaming DataFrame; the batch twin is
    ``extensions.timeseries.q_events_asof``.  ``lateness_ns`` enables
    the watermark-bounded reorder buffer (see module docstring); 0
    keeps immediate attribution.  ``inactivity_timeout_ms`` arms the
    dormant-user GC: a user quiet for that long has their buffered
    purchases finalized and their state row dropped (see module
    docstring) — at 100-TB scale this is what keeps the state store
    bounded by the active user set.  Caller note: with the timeout
    armed Spark runs a no-data micro-batch every trigger to evaluate
    timers, so ``processAllAvailable()`` never returns — synchronize
    on the sink's contents (or ``awaitTermination`` with
    ``availableNow``) instead."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    from astra_perseverance_spark.streaming.source import (
        event_file_stream,
    )

    sch = schema or "event_id long, user_id long, event_type string, ns long"
    stream = event_file_stream(
        spark, source_dir, sch,
        required=("event_id", "user_id", "event_type", "ns"),
        max_files_per_trigger=max_files_per_trigger)
    timeout = (GroupStateTimeout.NoTimeout
               if inactivity_timeout_ms is None
               else GroupStateTimeout.ProcessingTimeTimeout)
    return (
        stream.groupBy("user_id")
        .applyInPandasWithState(
            _make_attr_update(lateness_ns, inactivity_timeout_ms),
            outputStructType=_OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=timeout,
        )
    )
