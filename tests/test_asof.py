"""As-of join invariants: a hand-built fixture with known answers
(including ties-at-timestamp inclusive semantics and no-match NULLs),
plus a full Python recompute over the events table."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMALL


class TestAsofBackward:
    def test_hand_fixture(self, spark):
        from astra_perseverance_spark.functions.asof import asof_backward

        left = spark.createDataFrame(
            [(1, 10, "a"), (1, 20, "b"), (2, 5, "c"), (3, 7, "d")],
            "k long, ts long, tag string")
        right = spark.createDataFrame(
            [(1, 10, 100), (1, 15, 101), (2, 6, 102), (9, 1, 103)],
            "k long, rts long, rid long")
        got = {
            (r["k"], r["ts"]): (r["asof_rts"], r["asof_rid"])
            for r in asof_backward(
                left, right, keys=["k"], left_ts="ts", right_ts="rts",
                payload=["rid"]).collect()
        }
        assert got == {
            (1, 10): (10, 100),   # inclusive: rts == ts matches
            (1, 20): (15, 101),   # latest preceding, not first
            (2, 5): (None, None),  # right row is LATER -> no match
            (3, 7): (None, None),  # key absent from right
        }

    def test_equal_ts_right_rows_pick_is_deterministic(self, spark):
        from astra_perseverance_spark.functions.asof import asof_backward

        left = spark.createDataFrame([(1, 10)], "k long, ts long")
        right = spark.createDataFrame(
            [(1, 10, 5), (1, 10, 9), (1, 10, 7)], "k long, rts long, rid long")
        rows = asof_backward(
            left, right, keys=["k"], left_ts="ts", right_ts="rts",
            payload=["rid"]).collect()
        # struct-ordered tiebreak: the greatest (rts, rid) wins
        assert rows[0]["asof_rid"] == 9

    def test_events_asof_python_recompute(self, spark):
        from astra_perseverance_spark.extensions.timeseries import (
            _events_ns,
            q_events_asof,
        )

        ev = _events_ns(spark, SF_SMALL).collect()
        clicks: dict[int, list] = {}
        for r in ev:
            if r["event_type"] == "click":
                clicks.setdefault(r["user_id"], []).append(
                    (r["ns"], r["event_id"]))
        for v in clicks.values():
            v.sort()
        expect = {}
        for r in ev:
            if r["event_type"] != "purchase":
                continue
            best = None
            for ns, eid in clicks.get(r["user_id"], []):
                if ns <= r["ns"]:
                    best = (ns, eid)
                else:
                    break
            expect[r["event_id"]] = (
                r["user_id"], r["ns"],
                best[0] if best else None, best[1] if best else None,
                r["ns"] - best[0] if best else None,
            )
        got = {
            r["event_id"]: (r["user_id"], r["purchase_ns"], r["asof_ns"],
                            r["asof_event_id"], r["gap_ns"])
            for r in q_events_asof(spark, SF_SMALL).collect()
        }
        assert got == expect
        assert any(v[2] is not None for v in got.values())
        assert any(v[2] is None for v in got.values())


class TestAsofTolerance:
    def test_backward_tolerance_hand_fixture(self, spark):
        from astra_perseverance_spark.functions.asof import asof_backward

        left = spark.createDataFrame(
            [(1, 10), (1, 20), (1, 100)], "k long, ts long")
        right = spark.createDataFrame(
            [(1, 8, 100), (1, 15, 101)], "k long, rts long, rid long")
        got = {
            r["ts"]: (r["asof_rts"], r["asof_rid"])
            for r in asof_backward(
                left, right, keys=["k"], left_ts="ts", right_ts="rts",
                payload=["rid"], tolerance=5).collect()
        }
        assert got == {
            10: (8, 100),        # gap 2 <= 5
            20: (15, 101),       # gap 5 <= 5 (inclusive bound)
            100: (None, None),   # latest match is 85 back -> nulled,
                                 # NOT replaced by an older in-window row
        }

    def test_forward_tolerance_hand_fixture(self, spark):
        from astra_perseverance_spark.functions.asof import asof_forward

        left = spark.createDataFrame(
            [(1, 10), (1, 90)], "k long, ts long")
        right = spark.createDataFrame(
            [(1, 12, 100), (1, 200, 101)], "k long, rts long, rid long")
        got = {
            r["ts"]: (r["asof_rts"], r["asof_rid"])
            for r in asof_forward(
                left, right, keys=["k"], left_ts="ts", right_ts="rts",
                payload=["rid"], tolerance=5).collect()
        }
        assert got == {
            10: (12, 100),      # wait 2 <= 5
            90: (None, None),   # earliest match waits 110 -> nulled
        }

    def test_events_asof_1h_python_recompute(self, spark):
        from astra_perseverance_spark.extensions.timeseries import (
            ATTR_WINDOW_NS,
            _events_ns,
            q_events_asof_1h,
        )

        ev = _events_ns(spark, SF_SMALL).collect()
        clicks: dict[int, list] = {}
        for r in ev:
            if r["event_type"] == "click":
                clicks.setdefault(r["user_id"], []).append(
                    (r["ns"], r["event_id"]))
        for v in clicks.values():
            v.sort()
        expect = {}
        for r in ev:
            if r["event_type"] != "purchase":
                continue
            best = None
            for ns, eid in clicks.get(r["user_id"], []):
                if ns <= r["ns"]:
                    best = (ns, eid)
                else:
                    break
            # match-then-null: the LATEST click, dropped if too old
            if best and r["ns"] - best[0] > ATTR_WINDOW_NS:
                best = None
            expect[r["event_id"]] = (
                best[0] if best else None, best[1] if best else None)
        got = {
            r["event_id"]: (r["asof_ns"], r["asof_event_id"])
            for r in q_events_asof_1h(spark, SF_SMALL).collect()
        }
        assert got == expect
        # the bound must actually bite on the fixture (some user has a
        # last click more than an hour before a purchase) AND leave
        # some in-window matches intact
        unbounded_hits = 0
        from astra_perseverance_spark.extensions.timeseries import (
            q_events_asof,
        )
        for r in q_events_asof(spark, SF_SMALL).collect():
            if r["asof_ns"] is not None:
                unbounded_hits += 1
        bounded_hits = sum(1 for v in got.values() if v[0] is not None)
        assert 0 < bounded_hits < unbounded_hits


class TestAsofNameCollisions:
    def test_reserved_internal_column_raises(self, spark):
        from astra_perseverance_spark.functions.asof import asof_backward

        left = spark.createDataFrame([(1, 10, 3)], "k long, ts long, _ats long")
        right = spark.createDataFrame([(1, 8, 1)], "k long, rts long, rid long")
        with pytest.raises(ValueError, match="_ats"):
            asof_backward(left, right, keys=["k"], left_ts="ts",
                          right_ts="rts", payload=["rid"])

    def test_prefixed_output_collision_raises(self, spark):
        from astra_perseverance_spark.functions.asof import asof_forward

        left = spark.createDataFrame(
            [(1, 10, 3)], "k long, ts long, asof_rid long")
        right = spark.createDataFrame([(1, 8, 1)], "k long, rts long, rid long")
        with pytest.raises(ValueError, match="asof_rid"):
            asof_forward(left, right, keys=["k"], left_ts="ts",
                         right_ts="rts", payload=["rid"])


class TestAsofNullTimestamps:
    def test_null_right_ts_never_matches(self, spark):
        """A right row with an unknown timestamp must not be carried
        into real left rows: unfiltered, it sorts to the front of the
        ascending walk and becomes a spurious match for everything."""
        from astra_perseverance_spark.functions.asof import asof_backward

        left = spark.createDataFrame([(1, 3)], "k long, ts long")
        right = spark.createDataFrame(
            [(1, None, 999), (1, 5, 100)], "k long, rts long, rid long")
        got = asof_backward(left, right, keys=["k"], left_ts="ts",
                            right_ts="rts", payload=["rid"]).collect()
        assert len(got) == 1
        assert got[0]["asof_rts"] is None and got[0]["asof_rid"] is None

    def test_null_left_ts_emits_null_match_both_directions(self, spark):
        """A left row with an unknown timestamp emits with a NULL
        match — in the FORWARD walk desc ordering would otherwise sort
        it after every right row and hand it the minimum right row."""
        from astra_perseverance_spark.functions.asof import (
            asof_backward,
            asof_forward,
        )

        left = spark.createDataFrame(
            [(1, None, 7)], "k long, ts long, tag long")
        right = spark.createDataFrame(
            [(1, 5, 100), (1, 9, 101)], "k long, rts long, rid long")
        for fn in (asof_backward, asof_forward):
            got = fn(left, right, keys=["k"], left_ts="ts",
                     right_ts="rts", payload=["rid"]).collect()
            assert len(got) == 1, fn.__name__
            assert got[0]["tag"] == 7
            assert got[0]["asof_rid"] is None, fn.__name__


class TestWindowAttr:
    def test_python_recompute(self, spark):
        from astra_perseverance_spark.extensions.timeseries import (
            ATTR_WINDOW_NS,
            _events_ns,
            q_events_window_attr,
        )

        ev = _events_ns(spark, SF_SMALL).collect()
        clicks: dict[int, list] = {}
        for r in ev:
            if r["event_type"] == "click":
                clicks.setdefault(r["user_id"], []).append(r["ns"])
        expect = {}
        for r in ev:
            if r["event_type"] != "purchase":
                continue
            hits = [ns for ns in clicks.get(r["user_id"], [])
                    if r["ns"] - ATTR_WINDOW_NS <= ns <= r["ns"]]
            expect[r["event_id"]] = (len(hits), max(hits) if hits else None)
        got = {
            r["event_id"]: (r["n_clicks_1h"], r["last_click_ns"])
            for r in q_events_window_attr(spark, SF_SMALL).collect()
        }
        assert got == expect

    def test_window_attr_consistent_with_asof(self, spark):
        """Coherence: whenever the 1-hour window found a click, the
        as-of match exists and last_click_ns == asof_ns (the as-of
        pick is the newest click overall, which is the newest in any
        window ending at the purchase)."""
        from astra_perseverance_spark.extensions.timeseries import (
            q_events_asof,
            q_events_window_attr,
        )

        asof = {r["event_id"]: r["asof_ns"]
                for r in q_events_asof(spark, SF_SMALL).collect()}
        for r in q_events_window_attr(spark, SF_SMALL).collect():
            if r["n_clicks_1h"] > 0:
                assert asof[r["event_id"]] == r["last_click_ns"]


class TestSessionize:
    def test_python_recompute(self, spark):
        from astra_perseverance_spark.extensions.timeseries import (
            SESSION_GAP_NS,
            _events_ns,
            q_events_sessionize,
        )

        ev = _events_ns(spark, SF_SMALL).collect()
        per_user: dict[int, list] = {}
        for r in ev:
            per_user.setdefault(r["user_id"], []).append(
                (r["ns"], r["event_id"]))
        expect = {}
        for uid, rows in per_user.items():
            rows.sort()
            idx, start, prev, count = -1, None, None, 0
            for ns, _eid in rows:
                if prev is None or ns - prev > SESSION_GAP_NS:
                    if idx >= 0:
                        expect[(uid, idx)] = (start, prev, count,
                                              prev - start)
                    idx += 1
                    start, count = ns, 0
                count += 1
                prev = ns
            expect[(uid, idx)] = (start, prev, count, prev - start)
        got = {
            (r["user_id"], r["session_idx"]):
            (r["start_ns"], r["end_ns"], r["n_events"], r["duration_ns"])
            for r in q_events_sessionize(spark, SF_SMALL).collect()
        }
        assert got == expect
        # the gap rule must actually split somebody on the fixture
        assert any(i > 0 for _, i in got)

    def test_hand_fixture_gap_boundary(self, spark):
        """Gap exactly == SESSION_GAP_NS stays in the SAME session
        (strict > starts a new one); one ns more splits."""
        from astra_perseverance_spark.extensions.timeseries import (
            SESSION_GAP_NS,
            q_events_sessionize,
        )
        import astra_perseverance_spark.extensions.timeseries as ts

        rows = [
            (1, 7, "click", 0),
            (2, 7, "click", SESSION_GAP_NS),          # == gap: same
            (3, 7, "click", 2 * SESSION_GAP_NS + 1),  # > gap: new
        ]
        sch = "event_id long, user_id long, event_type string, ns long"
        df = spark.createDataFrame(rows, sch)
        orig = ts._events_ns
        ts._events_ns = lambda s, d: df
        try:
            got = {
                (r["session_idx"]): (r["n_events"])
                for r in q_events_sessionize(spark, "ignored").collect()
            }
        finally:
            ts._events_ns = orig
        assert got == {0: 2, 1: 1}


class TestFunnel:
    def test_python_recompute(self, spark):
        from astra_perseverance_spark.extensions.timeseries import (
            _events_ns,
            q_events_funnel,
        )

        ev = _events_ns(spark, SF_SMALL).collect()
        per_user: dict[int, list] = {}
        for r in ev:
            per_user.setdefault(r["user_id"], []).append(
                (r["ns"], r["event_type"]))
        expect = {}
        for uid, rows in per_user.items():
            views = [ns for ns, t in rows if t == "view"]
            if not views:
                continue
            v = min(views)
            clicks = [ns for ns, t in rows if t == "click" and ns >= v]
            c = min(clicks) if clicks else None
            p = None
            if c is not None:
                buys = [ns for ns, t in rows
                        if t == "purchase" and ns >= c]
                p = min(buys) if buys else None
            expect[uid] = (v, c, p,
                           1 + (c is not None) + (p is not None))
        got = {
            r["user_id"]: (r["view_ns"], r["click_ns"],
                           r["purchase_ns"], r["reached"])
            for r in q_events_funnel(spark, SF_SMALL).collect()
        }
        assert got == expect and got
        # the dense fixture completes the funnel for everyone; the
        # hand fixture below covers broken chains and step ordering
        assert 3 in {v[3] for v in got.values()}

    def test_step_order_is_enforced(self, spark):
        """A purchase BEFORE the first qualifying click must not
        count: the funnel is ordered, not mere per-type minima."""
        from astra_perseverance_spark.extensions.timeseries import (
            q_events_funnel,
        )
        import astra_perseverance_spark.extensions.timeseries as ts

        rows = [
            (1, 1, "purchase", 50),   # before the click -> ignored
            (2, 1, "view", 10),
            (3, 1, "click", 100),
            (4, 1, "purchase", 200),  # the one that counts
            (5, 2, "click", 5),       # click before first view
            (6, 2, "view", 10),
            (7, 2, "click", 30),
        ]
        sch = "event_id long, user_id long, event_type string, ns long"
        df = spark.createDataFrame(rows, sch)
        orig = ts._events_ns
        ts._events_ns = lambda s, d: df
        try:
            got = {
                r["user_id"]: (r["view_ns"], r["click_ns"],
                               r["purchase_ns"], r["reached"])
                for r in q_events_funnel(spark, "ignored").collect()
            }
        finally:
            ts._events_ns = orig
        assert got == {
            1: (10, 100, 200, 3),
            2: (10, 30, None, 2),  # the ns=5 click predates the view
        }


class TestAsofForward:
    def test_hand_fixture(self, spark):
        from astra_perseverance_spark.functions.asof import asof_forward

        left = spark.createDataFrame(
            [(1, 10), (1, 16), (2, 5), (3, 7)], "k long, ts long")
        right = spark.createDataFrame(
            [(1, 10, 100), (1, 15, 101), (2, 3, 102)],
            "k long, rts long, rid long")
        got = {
            (r["k"], r["ts"]): (r["asof_rts"], r["asof_rid"])
            for r in asof_forward(
                left, right, keys=["k"], left_ts="ts", right_ts="rts",
                payload=["rid"]).collect()
        }
        assert got == {
            (1, 10): (10, 100),    # inclusive equal-ts match
            (1, 16): (None, None),  # nothing at-or-after
            (2, 5): (None, None),   # right row is EARLIER
            (3, 7): (None, None),   # key absent
        }

    def test_equal_ts_pick_is_minimal(self, spark):
        from astra_perseverance_spark.functions.asof import asof_forward

        left = spark.createDataFrame([(1, 10)], "k long, ts long")
        right = spark.createDataFrame(
            [(1, 10, 9), (1, 10, 5), (1, 10, 7)], "k long, rts long, rid long")
        rows = asof_forward(
            left, right, keys=["k"], left_ts="ts", right_ts="rts",
            payload=["rid"]).collect()
        assert rows[0]["asof_rid"] == 5

    def test_next_error_python_recompute(self, spark):
        from astra_perseverance_spark.extensions.timeseries import (
            _events_ns,
            q_events_next_error,
        )

        ev = _events_ns(spark, SF_SMALL).collect()
        errors: dict[int, list] = {}
        for r in ev:
            if r["event_type"] == "error":
                errors.setdefault(r["user_id"], []).append(
                    (r["ns"], r["event_id"]))
        for v in errors.values():
            v.sort()
        expect = {}
        for r in ev:
            if r["event_type"] != "purchase":
                continue
            nxt = next((e for e in errors.get(r["user_id"], [])
                        if e[0] >= r["ns"]), None)
            expect[r["event_id"]] = (
                r["user_id"], r["ns"],
                nxt[0] if nxt else None, nxt[1] if nxt else None,
                nxt[0] - r["ns"] if nxt else None,
            )
        got = {
            r["event_id"]: (r["user_id"], r["purchase_ns"], r["next_ns"],
                            r["next_event_id"], r["wait_ns"])
            for r in q_events_next_error(spark, SF_SMALL).collect()
        }
        assert got == expect


class TestUserSkewGuard:
    def test_cap_user_events_downsamples_whales_only(self, spark):
        """One planted whale over the cap is hash-downsampled to
        ~cap events; every other user passes through untouched; the
        selection is a pure row function, so a re-run keeps the
        identical subset."""
        from astra_perseverance_spark.extensions.timeseries import (
            cap_user_events,
        )

        rows = (
            [(i, 1, "view", 1000 + i) for i in range(1000)]  # whale
            + [(10_000 + i, 2, "view", 1000 + i) for i in range(50)]
        )
        sch = "event_id long, user_id long, event_type string, ns long"
        ev = spark.createDataFrame(rows, sch)
        capped = cap_user_events(ev, cap=100)
        got = capped.groupBy("user_id").count().collect()
        by_user = {r["user_id"]: r["count"] for r in got}
        assert by_user[2] == 50  # under-cap user untouched
        # stride = ceil(1000/100) = 10 -> ~1/10 of the whale survives
        assert 50 <= by_user[1] <= 200
        again = {
            tuple(r) for r in cap_user_events(ev, cap=100).collect()
        }
        assert again == {tuple(r) for r in capped.collect()}  # deterministic
        assert capped.columns == ev.columns

    def test_sessionize_capped_composes_guard_with_sessionize(self, spark):
        """The registered capped variant = cap_user_events ∘
        sessionize: an over-cap whale is hash-downsampled before the
        window family runs, while an under-cap user's sessions are
        byte-identical to the plain query's."""
        import astra_perseverance_spark.extensions.timeseries as ts

        rows = (
            [(i, 1, "view", i * 10**9) for i in range(200)]  # whale
            + [(1000 + i, 2, "view", i * 10**9) for i in range(10)]
        )
        sch = "event_id long, user_id long, event_type string, ns long"
        spark.createDataFrame(rows, sch).createOrReplaceTempView("_cap_ev")
        orig = ts._events_ns
        ts._events_ns = lambda s, d: s.table("_cap_ev")
        try:
            got = ts.q_events_sessionize_capped(spark, SF_SMALL).collect()
            plain = ts.q_events_sessionize(spark, SF_SMALL).collect()
        finally:
            ts._events_ns = orig
        by_user: dict[int, list] = {}
        for r in got:
            by_user.setdefault(r["user_id"], []).append(r)
        # under-cap user untouched
        assert [tuple(r) for r in by_user[2]] == [
            tuple(r) for r in plain if r["user_id"] == 2]
        # whale (200 > SESSION_CAP_DEMO=50, stride 4): a strict subset
        # of its events survives into the session aggregate
        n1 = sum(r["n_events"] for r in by_user[1])
        assert 0 < n1 < 200

    def test_user_skew_audit_flags_planted_whale(self, spark, tmp_path):
        """The audit's rank-1 row is the planted whale and the
        skew_ratio reflects max/p99 of the per-user distribution."""
        import astra_perseverance_spark.extensions.timeseries as ts

        # 199 small users so the p99 rank (ceil-ish of 0.99*200)
        # lands on a small user, not the whale
        rows = [(i, 999, "view", i) for i in range(500)]
        for u in range(199):
            rows += [(10_000 + 100 * u + j, u, "view", j)
                     for j in range(5)]
        sch = "event_id long, user_id long, event_type string, ns long"
        spark.createDataFrame(rows, sch).createOrReplaceTempView(
            "_skew_events")
        orig = ts._events_ns
        ts._events_ns = lambda s, d: s.table("_skew_events")
        try:
            out = ts.q_user_skew_audit(spark, SF_SMALL).collect()
        finally:
            ts._events_ns = orig
        assert out[0]["rank"] == 1 and out[0]["user_id"] == 999
        assert out[0]["n_events"] == 500 and out[0]["max_n"] == 500
        assert out[0]["p50_n"] == 5 and out[0]["p99_n"] == 5
        assert out[0]["skew_ratio"] == 100.0
        assert len(out) == 10 and [r["rank"] for r in out] == list(
            range(1, 11))
