"""Streaming conversion funnel: the ``events_funnel`` semantics as a
custom stateful operator (``applyInPandasWithState``).

Per-user state is the funnel progression (view_ns, click_ns,
purchase_ns — each field finalized at most once), the last emitted
row, the user's event-time high-water mark, and — when a lateness
budget is configured — a small reorder buffer of not-yet-finalized
events.  State size stays dimension-grain: the buffer holds only
events inside the lateness window (bounded by budget × per-user rate,
defensively capped at ``REORDER_BUFFER_CAP``).

With ``lateness_ns=0`` (the default) the operator is the original
greedy event-time walk: when batches replay in event-time order the
last emitted row per user equals the batch ``q_events_funnel`` row
(the equivalence test gates this).  With ``lateness_ns=L`` a
watermark-bounded reorder buffer closes the cross-batch gap: events
newer than ``max_ns − L`` stay buffered and are replayed ahead of
each walk, so a late click/view arriving within the budget can still
advance an earlier step (e.g. click@5 arriving after purchase@10 was
seen — the batch twin counts that purchase, and so does the buffered
walk).  Rows are emitted only when the user's funnel tuple CHANGES —
advancements and in-budget corrections form a change stream (last
row wins downstream); an arrival later than the budget degrades to
the monotone greedy walk (it can still advance an unset step but can
no longer correct an earlier one) — a *declared* bound instead of an
inherent gap.

The change-stream claim is enforced across batches: the state keeps
the provisional tuple sequence emitted for the still-buffered tail,
and each replay diffs its combined (finalized + provisional) walk
against that sequence — the longest common prefix was already
emitted, so a pure replay (new events outside the buffered region)
re-emits nothing, and a correction re-emits only from the first
tuple that actually changed.

Dormant-user state GC: pass ``inactivity_timeout_ms`` and the
operator arms a per-user ``ProcessingTimeTimeout`` — a user with no
traffic for that long has their buffered events FINALIZED (the
reorder buffer exists to wait for in-budget stragglers; a user
silent past the inactivity budget has, by declaration, none coming)
and their state row dropped, so state stays bounded by the ACTIVE
user set instead of one funnel row per user-ever-seen.  Because the
provisional replay already emitted the buffered walk's tuples, the
timeout finalization re-walks to the same tuples and the LCP diff
suppresses every duplicate — the timeout emits nothing new, it only
releases the state.  A user who returns later starts a FRESH funnel
(their earlier progression is forgotten with the state row) — the
same declared monotone degradation as an over-budget late arrival,
traded for bounded state.  The default (``None``) keeps NoTimeout so
funnels survive arbitrarily long user gaps on the bounded test
corpus.

State-schema compatibility (STATE_FORMAT_VERSION): the state row
widened in round 8 (em_v/em_c/em_p — the emitted-provisional
ledger).  A streaming query resumed from a checkpoint written by an
earlier version fails on the state-schema mismatch; the supported
upgrade is a fresh checkpoint (replay the source, or drain the old
query to empty first).  v3 (round 10) left the schema unchanged but
added the inactivity-timeout GC — resuming a v2 checkpoint under a
v3 binary parses, yet mixes timeout regimes (old rows never armed a
timer, so they are GC'd only after their NEXT event arms one);
deployments that enable the timeout should start fresh too.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

_OUT_SCHEMA = (
    "user_id long, view_ns long, click_ns long, purchase_ns long, "
    "reached int"
)
_STATE_SCHEMA = (
    "view_ns long, click_ns long, purchase_ns long, "
    "lv long, lc long, lp long, max_ns long, "
    "pend_ns array<long>, pend_eid array<long>, pend_step array<int>, "
    "em_v array<long>, em_c array<long>, em_p array<long>"
)

# Unreached funnel steps are None in the emitted tuples but state
# arrays carry them as this sentinel (event-time ns are non-negative).
_NULL_NS = -1

# Bumped whenever _STATE_SCHEMA or the meaning of a state field
# changes; a checkpoint from another version needs a fresh start
# (see module docstring).  v2 = round-8 emitted-provisional ledger;
# v3 = round-10 dormant-user inactivity GC (schema unchanged, timeout
# semantics added — see module docstring).
STATE_FORMAT_VERSION = 3

_STEP_PRIORITY = {"view": 0, "click": 1, "purchase": 2}
# Defensive bound on the per-user reorder buffer: the lateness budget
# already bounds it by (budget × event rate); a bot-grade user inside
# the window is additionally capped — oldest buffered events finalize
# eagerly (exactly the no-buffer behavior) rather than growing state.
REORDER_BUFFER_CAP = 4096


def _walk(v, c, p, events):
    """Greedy event-time funnel walk: fold ``events`` (sorted
    (ns, step, event_id) tuples) into the (v, c, p) progression,
    yielding the tuple after each advancement — EXACTLY the batch
    semantics (earliest view, then earliest click at-or-after it,
    then earliest purchase at-or-after that click)."""
    steps = []
    for ns, step, _eid in events:
        if step == 0 and v is None:
            v = ns
        elif step == 1 and c is None and v is not None and ns >= v:
            c = ns
        elif step == 2 and p is None and c is not None and ns >= c:
            p = ns
        else:
            continue
        steps.append((v, c, p))
    return v, c, p, steps


def _make_funnel_update(lateness_ns: int, timeout_ms: int | None = None):
    def _funnel_update(key, pdf_iter, state):
        import pandas as pd

        user = key[0]
        # inactivity GC: the group fires with no input once the user
        # has been quiet for timeout_ms — finalize the whole buffer
        # and drop the state row (module docstring, round-10)
        timed_out = timeout_ms is not None and bool(state.hasTimedOut)
        if state.exists:
            (v, c, p, lv, lc, lp, max_ns,
             pend_ns, pend_eid, pend_step,
             em_v, em_c, em_p) = tuple(state.get)
            pending = list(zip(pend_ns, pend_eid, pend_step))
            dec = (lambda x: None if x is None or x == _NULL_NS
                   else int(x))
            prev_prov = [(dec(a), dec(b), dec(cc))
                         for a, b, cc in zip(em_v, em_c, em_p)]
        else:
            v = c = p = lv = lc = lp = max_ns = None
            pending, prev_prov = [], []
        events = [(int(ns), int(eid), _STEP_PRIORITY.get(et, 3))
                  for pdf in pdf_iter
                  for eid, et, ns in zip(pdf["event_id"],
                                         pdf["event_type"], pdf["ns"])]
        events = ([e for e in events if e[2] != 3]
                  + [(ns, eid, st) for ns, eid, st in pending])
        if events:
            batch_max = max(ns for ns, _e, _s in events)
            max_ns = batch_max if max_ns is None else max(max_ns, batch_max)
        wm = (max_ns - lateness_ns) if max_ns is not None else None
        if timed_out and max_ns is not None:
            # no in-budget straggler is coming from a user this quiet:
            # the whole buffer finalizes (wm past every buffered ns)
            wm = max_ns
        # (ns, step-priority, event_id): view < click < purchase at
        # equal ns — the batch twin's inclusive >= tie semantics
        ordered = sorted((ns, st, eid) for ns, eid, st in events)
        fin = [e for e in ordered if e[0] <= wm] if events else []
        pend = [e for e in ordered if e[0] > wm] if events else []
        if len(pend) > REORDER_BUFFER_CAP:
            spill = len(pend) - REORDER_BUFFER_CAP
            fin += pend[:spill]  # oldest finalize eagerly (declared cap)
            pend = pend[spill:]
        rows = []
        v, c, p, steps = _walk(v, c, p, fin)
        # provisional: replay the buffered tail on top of the
        # finalized progression — corrections supersede downstream
        pv, pc, pp, psteps = _walk(v, c, p, pend)
        combined = steps + psteps
        # a replay reproduces last batch's provisional tuples verbatim
        # (finalizing events re-walk to the same tuples); the longest
        # common prefix against the previously emitted provisional
        # sequence was already emitted — skip it, emit only from the
        # first tuple that changed
        lcp = 0
        while (lcp < len(combined) and lcp < len(prev_prov)
               and combined[lcp] == prev_prov[lcp]):
            lcp += 1
        for tup in combined[lcp:]:
            if tup != (lv, lc, lp):
                rows.append(tup)
                lv, lc, lp = tup
        enc = (lambda x: _NULL_NS if x is None else int(x))
        if timed_out:
            state.remove()
        else:
            state.update((
                v, c, p, lv, lc, lp, max_ns,
                [ns for ns, _s, _e in pend],
                [e for _ns, _s, e in pend],
                [s for _ns, s, _e in pend],
                [enc(t[0]) for t in psteps],
                [enc(t[1]) for t in psteps],
                [enc(t[2]) for t in psteps],
            ))
            if timeout_ms is not None:
                state.setTimeoutDuration(timeout_ms)
        yield pd.DataFrame({
            "user_id": pd.Series([user] * len(rows), dtype="Int64"),
            "view_ns": pd.Series([t[0] for t in rows], dtype="Int64"),
            "click_ns": pd.Series([t[1] for t in rows], dtype="Int64"),
            "purchase_ns": pd.Series([t[2] for t in rows], dtype="Int64"),
            "reached": pd.Series(
                [1 + (t[1] is not None) + (t[2] is not None)
                 for t in rows], dtype="Int32"),
        })

    return _funnel_update


def stream_events_funnel(spark: SparkSession, source_dir: str,
                         schema: str | None = None,
                         max_files_per_trigger: int | None = None,
                         lateness_ns: int = 0,
                         inactivity_timeout_ms: int | None = None):
    """Streaming funnel over a file-source event stream (rows:
    event_id, user_id, event_type, ns).  Returns the unstarted
    streaming DataFrame; the batch twin is
    ``extensions.timeseries.q_events_funnel``.  ``lateness_ns``
    enables the watermark-bounded reorder buffer (see module
    docstring); 0 keeps the pure greedy walk.
    ``inactivity_timeout_ms`` arms the dormant-user GC: a user quiet
    for that long has their buffered events finalized and their state
    row dropped (see module docstring) — at 100-TB scale this is what
    keeps the state store bounded by the active user set instead of
    one row per user-ever-seen.  Caller note: with the timeout armed
    Spark runs a no-data micro-batch every trigger to evaluate
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
            _make_funnel_update(lateness_ns, inactivity_timeout_ms),
            outputStructType=_OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=timeout,
        )
    )
