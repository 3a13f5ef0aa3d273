"""Randomized convergence tests for the stateful stream update
functions, driven DIRECTLY with a fake GroupState.

The end-to-end streaming tests (``test_streaming.py``) cover the
Spark plumbing on a handful of hand-built scenarios; these tests
cover the update-function SEMANTICS on hundreds of random inputs —
random event sets, random batch splits, random arrival orders — in
milliseconds, asserting the documented convergence contracts:

1. with a lateness budget covering the whole event span, ANY arrival
   order converges: the last emitted row per key equals the batch
   twin's answer (the reorder buffer replays everything in event-time
   order, and provisional emission means the tail is never withheld);
2. with event-time-ordered arrival, the greedy walk (lateness 0)
   converges too — the original pre-buffer contract;
3. the change-stream claim: no consecutive duplicate tuple per user
   is ever emitted (funnel), and an unchanged provisional attribution
   row is never re-emitted (attribution).
"""

from __future__ import annotations

import random

import pandas as pd


class FakeState:
    """Just enough of pyspark's GroupState for the update functions."""

    def __init__(self):
        self._v = None
        self.hasTimedOut = False
        self.timeout_ms = None

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = tuple(v)

    def remove(self):
        self._v = None

    def setTimeoutTimestamp(self, ms):
        self.timeout_ms = ms

    def setTimeoutDuration(self, ms):
        self.timeout_ms = ms


def _chunks(rows, rng, k):
    """Split rows into k non-empty chunks (arrival batches)."""
    if k <= 1 or len(rows) <= 1:
        return [rows]
    cuts = sorted(rng.sample(range(1, len(rows)), min(k - 1, len(rows) - 1)))
    out, prev = [], 0
    for c in cuts + [len(rows)]:
        out.append(rows[prev:c])
        prev = c
    return out


def _events_pdf(chunk):
    return pd.DataFrame({
        "event_id": [e[0] for e in chunk],
        "event_type": [e[1] for e in chunk],
        "ns": [e[2] for e in chunk],
    })


def _random_events(rng, n=14):
    """(event_id, event_type, ns) with deliberate ns ties."""
    types = ["view", "click", "purchase", "error"]
    return [
        (eid, rng.choice(types), rng.randrange(0, 8) * 100)
        for eid in range(1, n + 1)
    ]


# --- references (pure-python batch semantics) -------------------------

_PRIO = {"view": 0, "click": 1, "purchase": 2}


def _funnel_ref(events):
    order = sorted(
        (ns, _PRIO[et], eid) for eid, et, ns in events if et in _PRIO)
    v = c = p = None
    for ns, st, _eid in order:
        if st == 0 and v is None:
            v = ns
        elif st == 1 and c is None and v is not None and ns >= v:
            c = ns
        elif st == 2 and p is None and c is not None and ns >= c:
            p = ns
    return (v, c, p)


def _attr_ref(events):
    order = sorted(
        (ns, 0 if et == "click" else 1, eid)
        for eid, et, ns in events if et in ("click", "purchase"))
    latest, out = None, {}
    for ns, k, eid in order:
        if k == 0:
            cand = (ns, eid)
            latest = cand if latest is None or cand > latest else latest
        else:
            out[eid] = latest if latest is not None and latest[0] <= ns \
                else None
    return out


def _drive(update_fn, batches):
    """Feed batches through the update function, return emitted frames."""
    state = FakeState()
    emitted = []
    for chunk in batches:
        for pdf in update_fn((7,), iter([_events_pdf(chunk)]), state):
            if len(pdf):
                emitted.append(pdf)
    return emitted


class TestFunnelStateConvergence:
    def test_any_arrival_order_converges_inside_budget(self):
        from astra_perseverance_spark.streaming.funnel_stream import (
            _make_funnel_update,
        )

        for seed in range(120):
            rng = random.Random(seed)
            events = _random_events(rng)
            rows = events[:]
            rng.shuffle(rows)
            batches = _chunks(rows, rng, rng.randrange(1, 5))
            emitted = _drive(_make_funnel_update(10**9), batches)
            want = _funnel_ref(events)
            if want[0] is None:
                assert not emitted, (seed, emitted)
                continue
            last = None
            prev = None
            for pdf in emitted:
                for t in zip(pdf["view_ns"], pdf["click_ns"],
                             pdf["purchase_ns"]):
                    t = tuple(None if pd.isna(x) else int(x) for x in t)
                    assert t != prev, f"seed {seed}: duplicate tuple {t}"
                    prev = t
                    last = t
            assert last == want, (seed, last, want)

    def test_ordered_arrival_converges_with_zero_budget(self):
        from astra_perseverance_spark.streaming.funnel_stream import (
            _make_funnel_update,
        )

        for seed in range(120):
            rng = random.Random(1000 + seed)
            events = _random_events(rng)
            rows = sorted(events, key=lambda e: (e[2], _PRIO.get(e[1], 3)))
            batches = _chunks(rows, rng, rng.randrange(1, 5))
            emitted = _drive(_make_funnel_update(0), batches)
            want = _funnel_ref(events)
            last = None
            for pdf in emitted:
                for t in zip(pdf["view_ns"], pdf["click_ns"],
                             pdf["purchase_ns"]):
                    last = tuple(None if pd.isna(x) else int(x) for x in t)
            if want[0] is None:
                assert last is None, (seed, last)
            else:
                assert last == want, (seed, last, want)


class TestAttributionStateConvergence:
    def test_any_arrival_order_converges_inside_budget(self):
        from astra_perseverance_spark.streaming.attribution_stream import (
            _make_attr_update,
        )

        for seed in range(120):
            rng = random.Random(seed)
            events = _random_events(rng)
            rows = events[:]
            rng.shuffle(rows)
            batches = _chunks(rows, rng, rng.randrange(1, 5))
            emitted = _drive(_make_attr_update(10**9), batches)
            want = _attr_ref(events)
            last: dict[int, tuple] = {}
            seen_rows = set()
            for pdf in emitted:
                for eid, ans, aeid in zip(pdf["event_id"], pdf["asof_ns"],
                                          pdf["asof_event_id"]):
                    key = (int(eid),
                           None if pd.isna(ans) else int(ans),
                           None if pd.isna(aeid) else int(aeid))
                    # an identical (eid, attribution) row must never be
                    # emitted twice while the purchase stays buffered
                    assert key not in seen_rows, f"seed {seed}: dup {key}"
                    seen_rows.add(key)
                    last[key[0]] = (key[1], key[2])
            want_map = {
                eid: (hit[0] if hit else None, hit[1] if hit else None)
                for eid, hit in want.items()
            }
            assert last == want_map, (seed, last, want_map)

    def test_ordered_arrival_converges_with_zero_budget(self):
        from astra_perseverance_spark.streaming.attribution_stream import (
            _make_attr_update,
        )

        for seed in range(120):
            rng = random.Random(1000 + seed)
            events = _random_events(rng)
            rows = sorted(
                events,
                key=lambda e: (e[2], 0 if e[1] == "click" else 1))
            batches = _chunks(rows, rng, rng.randrange(1, 5))
            emitted = _drive(_make_attr_update(0), batches)
            want = _attr_ref(events)
            got = {}
            for pdf in emitted:
                for eid, ans, aeid in zip(pdf["event_id"], pdf["asof_ns"],
                                          pdf["asof_event_id"]):
                    got[int(eid)] = (
                        None if pd.isna(ans) else int(ans),
                        None if pd.isna(aeid) else int(aeid))
            want_map = {
                eid: (hit[0] if hit else None, hit[1] if hit else None)
                for eid, hit in want.items()
            }
            assert got == want_map, (seed, got, want_map)


def _sessions_ref(ts_pm, gap):
    """(start, end, pauses, max_pause) sessions of (ts, pause) pairs."""
    if not ts_pm:
        return []
    spans = sorted((t, t, 1, p) for t, p in ts_pm)
    merged = [spans[0]]
    for s in spans[1:]:
        last = merged[-1]
        if s[0] - last[1] >= gap:
            merged.append(s)
        else:
            merged[-1] = (last[0], max(last[1], s[1]),
                          last[2] + s[2], max(last[3], s[3]))
    return merged


class TestGcSessionStateConvergence:
    def test_any_arrival_order_converges_inside_budget(self):
        from astra_perseverance_spark.streaming.gc_stream import (
            SESSION_GAP_SEC,
            _make_session_update,
        )

        for seed in range(120):
            rng = random.Random(seed)
            n = rng.randrange(3, 12)
            ts_pm = [(rng.randrange(0, 6) * 1500, rng.randrange(1, 99))
                     for _ in range(n)]
            rows = ts_pm[:]
            rng.shuffle(rows)
            state = FakeState()
            upd = _make_session_update(10**9)
            emitted = []
            for chunk in _chunks(rows, rng, rng.randrange(1, 4)):
                pdf = pd.DataFrame({
                    "ts": pd.to_datetime([t for t, _ in chunk], unit="s"),
                    "pause_ms": [p for _, p in chunk],
                })
                for out in upd(("n1",), iter([pdf]), state):
                    emitted.append(out)
            # watermark passes the horizon: flush everything
            state.hasTimedOut = True
            for out in upd(("n1",), iter([]), state):
                emitted.append(out)
            got = []
            for pdf in emitted:
                for s, e, c, m in zip(pdf["session_start"],
                                      pdf["session_end"],
                                      pdf["pauses"], pdf["max_pause_ms"]):
                    got.append((int(s.timestamp()), int(e.timestamp()),
                                int(c), int(m)))
            want = _sessions_ref(ts_pm, SESSION_GAP_SEC)
            assert sorted(got) == sorted(want), (seed, got, want)

    def test_ordered_arrival_converges_with_zero_budget(self):
        """The pre-buffer contract: event-time-ordered arrival with
        lateness 0 converges to the batch sessionizer (every event
        finalizes on arrival; the greedy walk IS the batch walk)."""
        from astra_perseverance_spark.streaming.gc_stream import (
            SESSION_GAP_SEC,
            _make_session_update,
        )

        for seed in range(120):
            rng = random.Random(2000 + seed)
            n = rng.randrange(3, 12)
            ts_pm = [(rng.randrange(0, 6) * 1500, rng.randrange(1, 99))
                     for _ in range(n)]
            rows = sorted(ts_pm)
            state = FakeState()
            upd = _make_session_update(0)
            emitted = []
            for chunk in _chunks(rows, rng, rng.randrange(1, 4)):
                pdf = pd.DataFrame({
                    "ts": pd.to_datetime([t for t, _ in chunk], unit="s"),
                    "pause_ms": [p for _, p in chunk],
                })
                for out in upd(("n1",), iter([pdf]), state):
                    emitted.append(out)
            state.hasTimedOut = True
            for out in upd(("n1",), iter([]), state):
                emitted.append(out)
            got = []
            for pdf in emitted:
                for s, e, c, m in zip(pdf["session_start"],
                                      pdf["session_end"],
                                      pdf["pauses"], pdf["max_pause_ms"]):
                    got.append((int(s.timestamp()), int(e.timestamp()),
                                int(c), int(m)))
            want = _sessions_ref(ts_pm, SESSION_GAP_SEC)
            # ordered arrival closes sessions in order — compare as-is
            assert got == want, (seed, got, want)

    def test_late_bridge_merges_two_provisional_sessions(self):
        """The r7 gap the reorder buffer exists to close: two events
        ≥ gap apart look like two sessions until a LATE event lands
        between them inside the budget — the final output must be ONE
        merged session, never the two provisional halves."""
        from astra_perseverance_spark.streaming.gc_stream import (
            _make_session_update,
        )

        state = FakeState()
        upd = _make_session_update(10**9)
        emitted = []
        # 0 s and 3000 s are ≥ 1800 s apart (two provisional
        # sessions); the late 1500 s event bridges both halves
        for batch_ts in ([0], [3000], [1500]):
            pdf = pd.DataFrame({
                "ts": pd.to_datetime(batch_ts, unit="s"),
                "pause_ms": [10] * len(batch_ts),
            })
            for out in upd(("n1",), iter([pdf]), state):
                if len(out):
                    emitted.append(out)
        state.hasTimedOut = True
        for out in upd(("n1",), iter([]), state):
            if len(out):
                emitted.append(out)
        got = [
            (int(s.timestamp()), int(e.timestamp()), int(c))
            for pdf in emitted
            for s, e, c in zip(pdf["session_start"], pdf["session_end"],
                               pdf["pauses"])
        ]
        assert got == [(0, 3000, 3)], got

    def test_bridge_outside_budget_degrades_monotone(self):
        """The declared degradation: a bridge OLDER than the lateness
        budget cannot reopen an already-closed session — the early
        half stays emitted as-is and the bridge merges forward only.
        This pins the documented semantics (append mode can never
        retract) so a refactor cannot silently change them."""
        from astra_perseverance_spark.streaming.gc_stream import (
            _make_session_update,
        )

        state = FakeState()
        upd = _make_session_update(1000)  # 1000 s budget
        emitted = []
        # batch 2 pushes the finalization watermark to 2100 s: the 0 s
        # and 2000 s events are both FINAL, their ≥ 1800 s gap closes
        # and emits [0,0].  The 1500 s bridge in batch 3 is already
        # older than the watermark (outside the budget), so it cannot
        # reopen the emitted session — it merges forward into the open
        # 2000 s span only
        for batch_ts in ([0], [2000, 3100], [1500]):
            pdf = pd.DataFrame({
                "ts": pd.to_datetime(batch_ts, unit="s"),
                "pause_ms": [10] * len(batch_ts),
            })
            for out in upd(("n1",), iter([pdf]), state):
                if len(out):
                    emitted.append(out)
        state.hasTimedOut = True
        for out in upd(("n1",), iter([]), state):
            if len(out):
                emitted.append(out)
        got = [
            (int(s.timestamp()), int(e.timestamp()), int(c))
            for pdf in emitted
            for s, e, c in zip(pdf["session_start"], pdf["session_end"],
                               pdf["pauses"])
        ]
        assert got == [(0, 0, 1), (1500, 3100, 3)], got

    def test_over_budget_late_event_behind_emitted_history_dropped(self):
        """Round-11 review finding (gc_stream v3): an over-budget late
        event OLDER than the newest emitted session end must be
        DROPPED — previously it was emitted as its own fragment
        overlapping a session append mode can never retract."""
        from astra_perseverance_spark.streaming.gc_stream import (
            _make_session_update,
        )

        state = FakeState()
        upd = _make_session_update(1000)  # 1000 s budget
        emitted = []
        # batch 2 pushes the finalization watermark to 3100 s: 0 s,
        # 600 s and 3000 s are all FINAL, the >=1800 s gap closes and
        # EMITS [0,600]; the late 300 s event is then BEHIND emitted
        # history and must be dropped, not emitted as a fragment
        # inside the already-appended [0,600] row
        for batch_ts in ([0, 600], [3000, 4100], [300]):
            pdf = pd.DataFrame({
                "ts": pd.to_datetime(batch_ts, unit="s"),
                "pause_ms": [10] * len(batch_ts),
            })
            for out in upd(("n1",), iter([pdf]), state):
                if len(out):
                    emitted.append(out)
        state.hasTimedOut = True
        for out in upd(("n1",), iter([]), state):
            if len(out):
                emitted.append(out)
        got = [
            (int(s.timestamp()), int(e.timestamp()), int(c))
            for pdf in emitted
            for s, e, c in zip(pdf["session_start"], pdf["session_end"],
                               pdf["pauses"])
        ]
        # the 300 s event contributes nothing; no emitted session
        # overlaps another
        assert got == [(0, 600, 2), (3000, 4100, 2)], got
        spans = sorted((s, e) for s, e, _ in got)
        for (s1, e1), (s2, e2) in zip(spans, spans[1:]):
            assert e1 < s2, f"overlapping sessions: {spans}"


class TestFunnelTimeoutGC:
    """Round-10 dormant-user GC (funnel_stream v3): the inactivity
    timeout must be pure state RELEASE — every tuple the finalization
    walk produces was already emitted provisionally, so a timeout call
    emits nothing, drops the state row, and a returning user is
    indistinguishable from a brand-new one."""

    def test_timeout_emits_nothing_drops_state_converged(self):
        from astra_perseverance_spark.streaming.funnel_stream import (
            _make_funnel_update,
        )

        for seed in range(120):
            rng = random.Random(3000 + seed)
            events = _random_events(rng)
            rows = events[:]
            rng.shuffle(rows)
            state = FakeState()
            upd = _make_funnel_update(10**9, timeout_ms=5000)
            emitted = []
            for chunk in _chunks(rows, rng, rng.randrange(1, 5)):
                for pdf in upd((7,), iter([_events_pdf(chunk)]), state):
                    if len(pdf):
                        emitted.append(pdf)
            assert state.timeout_ms == 5000  # timer armed every batch
            state.hasTimedOut = True
            for pdf in upd((7,), iter([]), state):
                assert not len(pdf), (
                    f"seed {seed}: timeout finalization re-emitted rows")
            assert not state.exists, f"seed {seed}: state row not dropped"
            # convergence survives the timeout: the last provisional
            # tuple (= the last emitted row overall) is the batch answer
            want = _funnel_ref(events)
            if want[0] is None:
                assert not emitted, (seed, emitted)
                continue
            last = None
            for pdf in emitted:
                for t in zip(pdf["view_ns"], pdf["click_ns"],
                             pdf["purchase_ns"]):
                    last = tuple(
                        None if pd.isna(x) else int(x) for x in t)
            assert last == want, (seed, last, want)

    def test_returning_user_matches_fresh_user(self):
        from astra_perseverance_spark.streaming.funnel_stream import (
            _make_funnel_update,
        )

        for seed in range(120):
            rng = random.Random(4000 + seed)
            before = _random_events(rng, n=8)
            # distinct ids / later times for the post-timeout burst
            after = [(eid + 100, et, ns + 10_000)
                     for eid, et, ns in _random_events(rng, n=8)]
            upd = _make_funnel_update(10**9, timeout_ms=5000)

            state = FakeState()
            for pdf in upd((7,), iter([_events_pdf(before)]), state):
                pass
            state.hasTimedOut = True
            for pdf in upd((7,), iter([]), state):
                pass
            state.hasTimedOut = False
            returned = [pdf for pdf in
                        upd((7,), iter([_events_pdf(after)]), state)
                        if len(pdf)]

            fresh_state = FakeState()
            fresh = [pdf for pdf in
                     upd((7,), iter([_events_pdf(after)]), fresh_state)
                     if len(pdf)]
            canon = [pdf.to_dict("records") for pdf in returned]
            canon_fresh = [pdf.to_dict("records") for pdf in fresh]
            assert canon == canon_fresh, (seed, canon, canon_fresh)


class TestAttributionTimeoutGC:
    """Same contract as TestFunnelTimeoutGC for the attribution
    stream's round-9 GC: a timeout call is pure state release (every
    buffered purchase already emitted its provisional attribution, and
    the finalization walk re-derives exactly that), and a returning
    user is indistinguishable from a brand-new one."""

    def test_timeout_emits_nothing_drops_state_converged(self):
        from astra_perseverance_spark.streaming.attribution_stream import (
            _make_attr_update,
        )

        for seed in range(120):
            rng = random.Random(5000 + seed)
            events = _random_events(rng)
            rows = events[:]
            rng.shuffle(rows)
            state = FakeState()
            upd = _make_attr_update(10**9, timeout_ms=5000)
            emitted = []
            for chunk in _chunks(rows, rng, rng.randrange(1, 5)):
                for pdf in upd((7,), iter([_events_pdf(chunk)]), state):
                    if len(pdf):
                        emitted.append(pdf)
            assert state.timeout_ms == 5000  # timer armed every batch
            state.hasTimedOut = True
            for pdf in upd((7,), iter([]), state):
                assert not len(pdf), (
                    f"seed {seed}: timeout finalization re-emitted rows")
            assert not state.exists, f"seed {seed}: state row not dropped"
            want = _attr_ref(events)
            last: dict[int, tuple] = {}
            for pdf in emitted:
                for eid, ans, aeid in zip(pdf["event_id"], pdf["asof_ns"],
                                          pdf["asof_event_id"]):
                    last[int(eid)] = (
                        None if pd.isna(ans) else int(ans),
                        None if pd.isna(aeid) else int(aeid))
            want_map = {
                eid: (hit[0] if hit else None, hit[1] if hit else None)
                for eid, hit in want.items()
            }
            assert last == want_map, (seed, last, want_map)

    def test_returning_user_matches_fresh_user(self):
        from astra_perseverance_spark.streaming.attribution_stream import (
            _make_attr_update,
        )

        for seed in range(120):
            rng = random.Random(6000 + seed)
            before = _random_events(rng, n=8)
            after = [(eid + 100, et, ns + 10_000)
                     for eid, et, ns in _random_events(rng, n=8)]
            upd = _make_attr_update(10**9, timeout_ms=5000)

            state = FakeState()
            for pdf in upd((7,), iter([_events_pdf(before)]), state):
                pass
            state.hasTimedOut = True
            for pdf in upd((7,), iter([]), state):
                pass
            state.hasTimedOut = False
            returned = [pdf.to_dict("records") for pdf in
                        upd((7,), iter([_events_pdf(after)]), state)
                        if len(pdf)]
            fresh = [pdf.to_dict("records") for pdf in
                     upd((7,), iter([_events_pdf(after)]), FakeState())
                     if len(pdf)]
            assert returned == fresh, (seed, returned, fresh)
