"""Structured Streaming equivalence: the same windowed aggregation
over a file-source stream must converge to the batch twin's result
(shared-logic design, streaming/gc_stream.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def gc_source(spark, tmp_path_factory):
    """Materialize the conformed gc_event fact as a parquet directory
    the file-source stream can replay."""
    from astra_perseverance_spark.conformed import load_model

    out = str(tmp_path_factory.mktemp("gc_stream_src"))
    load_model(spark, SF_SMALL).gc_event.write.mode("overwrite").parquet(out)
    return out


def test_stream_matches_batch(spark, gc_source):
    from astra_perseverance_spark.streaming import (
        gc_minute_window_agg,
        stream_gc_minute_windows,
    )

    sdf = stream_gc_minute_windows(spark, gc_source)
    q = (
        sdf.writeStream.format("memory").queryName("gc_win_test")
        .outputMode("complete").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {
        (r["window_start"], r["dc"]): (r["pauses"], r["max_pause_ms"], r["sum_pause_ms"])
        for r in spark.sql("SELECT * FROM gc_win_test").collect()
    }
    want = {
        (r["window_start"], r["dc"]): (r["pauses"], r["max_pause_ms"], r["sum_pause_ms"])
        for r in gc_minute_window_agg(spark.read.parquet(gc_source)).collect()
    }
    assert got == want and len(got) > 0


def test_watermark_present_in_plan(spark, gc_source):
    from astra_perseverance_spark.streaming import stream_gc_minute_windows

    sdf = stream_gc_minute_windows(spark, gc_source)
    assert sdf.isStreaming
    assert "EventTimeWatermark" in sdf._jdf.queryExecution().logical().toString()


def test_stateful_sessions_match_batch(spark, gc_source, tmp_path):
    """applyInPandasWithState sessionization converges to the batch
    gap rule: with a far-future sentinel event per node (which opens a
    new session and thereby closes every real one), the appended
    closed sessions must equal the batch result exactly."""
    import shutil

    from astra_perseverance_spark.queries import QUERY_REGISTRY
    from astra_perseverance_spark.streaming import stream_gc_sessions

    src = str(tmp_path / "sess_src")
    shutil.copytree(gc_source, src)
    gc = spark.read.parquet(gc_source)
    sentinel = gc.groupBy("node").agg(
        F.first("dc").alias("dc"),
        (F.max("ts") + F.expr("INTERVAL 30 DAYS")).alias("ts"),
    ).select("node", "dc", "ts", F.lit(1).cast("int").alias("pause_ms"))
    sentinel.write.mode("append").parquet(src)

    q = (
        stream_gc_sessions(spark, src)
        .writeStream.format("memory").queryName("gc_sess_test")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(180)
    # sentinel-only sessions (start beyond the real data) may also be
    # emitted via event-time timeout — scaffolding, not under test
    max_real_ts = gc.agg(F.max("ts")).collect()[0][0]
    got = {
        (r["node"], r["session_start"], r["session_end"],
         r["pauses"], r["max_pause_ms"])
        for r in spark.sql("SELECT * FROM gc_sess_test").collect()
        if r["session_start"] <= max_real_ts
    }
    want = {
        (r["node"], r["session_start"], r["session_end"],
         r["pauses"], r["max_pause_ms"])
        for r in QUERY_REGISTRY["gc_sessions"](spark, SF_SMALL).collect()
    }
    assert got == want and len(got) > 0


def test_null_rows_quarantined_not_fatal(spark, tmp_path):
    """A single row with a NULL required field must not kill the
    stateful streams: pandas delivers the column as float64 with NaN,
    int() raises, the task fails, the retry re-reads the same file —
    a permanently dead query from one bad row.  The shared source
    (streaming/source.py) drops contract-violating rows JVM-side; the
    remaining rows still process."""
    import datetime as dt

    from astra_perseverance_spark.streaming import (
        stream_events_asof,
        stream_gc_sessions,
    )

    ev = str(tmp_path / "ev")
    spark.createDataFrame(
        [(1, 10, 100, "click"), (2, None, 100, "purchase"),
         (None, 30, 100, "purchase"), (3, 40, None, "purchase"),
         (4, 50, 100, "purchase")],
        "event_id long, ns long, user_id long, event_type string",
    ).coalesce(1).write.parquet(ev)
    q = (
        stream_events_asof(spark, ev)
        .writeStream.format("memory").queryName("nullq_asof")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {(r["event_id"], r["asof_event_id"])
           for r in spark.sql("SELECT * FROM nullq_asof").collect()}
    assert got == {(4, 1)}  # null rows dropped, the query survived

    gc = str(tmp_path / "gc")
    base = dt.datetime(2024, 1, 1)
    spark.createDataFrame(
        [("n1", "dc1", base, 5), ("n1", "dc1", None, 7),
         (None, "dc1", base, 9),
         ("n1", "dc1", base + dt.timedelta(days=30), 1)],
        "node string, dc string, ts timestamp, pause_ms int",
    ).coalesce(1).write.parquet(gc)
    q2 = (
        stream_gc_sessions(spark, gc)
        .writeStream.format("memory").queryName("nullq_sess")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q2.awaitTermination(120)
    rows = [r for r in spark.sql("SELECT * FROM nullq_sess").collect()
            if r["session_start"] == base]
    assert len(rows) == 1 and rows[0]["pauses"] == 1


def test_stateful_sessions_subsecond_precision(spark, tmp_path):
    """The stream works in exact epoch MICROS, matching the batch
    twin's unix_micros gap rule: a 1799.5 s gap keeps one session (a
    whole-second floor would call it 1800 and split), and the emitted
    session bounds preserve sub-second precision."""
    import datetime as dt

    from astra_perseverance_spark.streaming import stream_gc_sessions

    def ts(us):
        return dt.datetime(2024, 1, 1) + dt.timedelta(microseconds=us)

    rows = [
        ("n1", "dc1", ts(900_000), 10),             # t = 0.9 s
        ("n1", "dc1", ts(1_800_400_000), 20),       # gap 1799.5 s: same
        ("n1", "dc1", ts(3_601_000_000), 30),       # gap 1800.6 s: new
        ("n1", "dc1", ts(10**13), 1),               # sentinel flush
    ]
    src = str(tmp_path / "subsec_src")
    spark.createDataFrame(
        rows, "node string, dc string, ts timestamp, pause_ms int"
    ).coalesce(1).write.parquet(src)

    q = (
        stream_gc_sessions(spark, src)
        .writeStream.format("memory").queryName("gc_subsec_test")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(180)
    got = sorted(
        (r["session_start"], r["session_end"], r["pauses"],
         r["max_pause_ms"])
        for r in spark.sql("SELECT * FROM gc_subsec_test").collect()
        if r["session_start"] < ts(10**13)
    )
    assert got == [
        (ts(900_000), ts(1_800_400_000), 2, 20),
        (ts(3_601_000_000), ts(3_601_000_000), 1, 30),
    ]


def test_sessions_close_on_gap(spark):
    from astra_perseverance_spark.queries import QUERY_REGISTRY

    rows = QUERY_REGISTRY["gc_sessions"](spark, SF_SMALL).collect()
    assert rows, "no sessions"
    # session boundaries respect the 30-min gap: within a node,
    # consecutive sessions are separated by >= 1800s
    from collections import defaultdict

    by_node = defaultdict(list)
    for r in rows:
        by_node[r["node"]].append(r)
    for sess in by_node.values():
        sess.sort(key=lambda r: r["session_no"])
        for a, b in zip(sess, sess[1:]):
            gap = (b["session_start"] - a["session_end"]).total_seconds()
            assert gap >= 1800, (a, b)


@pytest.fixture(scope="module")
def doc_source(spark, tmp_path_factory):
    """Replay the fixture documents through a file-source stream."""
    out = str(tmp_path_factory.mktemp("doc_stream_src"))
    (
        spark.read.parquet(f"{SF_SMALL}/documents.parquet")
        .write.mode("overwrite").parquet(out)
    )
    return out


def test_stream_dedup_matches_batch_digest_set(spark, doc_source, tmp_path):
    """Streaming exact dedup passes exactly one doc per content
    digest, and every survivor carries its group's digest (which doc
    survives depends on arrival order — the digest set is the
    deterministic contract)."""
    from astra_perseverance_spark.streaming import stream_dedup_exact

    sdf = stream_dedup_exact(spark, doc_source)
    q = (
        sdf.writeStream.format("memory").queryName("doc_dedup_test")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM doc_dedup_test").collect()

    from astra_perseverance_spark.streaming.doc_stream import doc_digest_frame

    batch = doc_digest_frame(spark.read.parquet(doc_source))
    want_digests = {r["content_md5"] for r in batch.collect()}
    group_of = {r["doc_id"]: r["content_md5"] for r in batch.collect()}

    assert {r["content_md5"] for r in got} == want_digests
    assert len(got) == len(want_digests)  # exactly one survivor each
    for r in got:
        assert group_of[r["doc_id"]] == r["content_md5"]


def test_stream_dedup_state_is_watermark_bounded(spark, doc_source):
    """The plan must use dedup-within-watermark (expiring state), not
    the unbounded streaming dropDuplicates."""
    from astra_perseverance_spark.streaming import stream_dedup_exact

    plan = stream_dedup_exact(spark, doc_source)._jdf.queryExecution().analyzed().toString()
    assert "DeduplicateWithinWatermark" in plan


def test_stream_dedup_multibatch_within_horizon(spark, tmp_path):
    """Multi-batch replay (maxFilesPerTrigger=1): with arrivals whose
    lateness stays inside the horizon, the pass-through set still
    equals the batch digest set — the equivalence contract's stated
    precondition, exercised across watermark advances."""
    from astra_perseverance_spark.streaming import stream_dedup_exact
    from astra_perseverance_spark.streaming.doc_stream import (
        doc_digest_frame,
    )

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    src = str(tmp_path / "src")
    # two files with interleaved doc_ids — event times overlap, all
    # within one horizon of each other (ids span < 3600 s)
    docs.filter("doc_id % 2 = 0").coalesce(1).write.parquet(src)
    docs.filter("doc_id % 2 = 1").coalesce(1).write.mode("append").parquet(src)

    sdf = (
        spark.readStream.schema(
            "doc_id long, text string, lang string, source string, n_chars long"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    from astra_perseverance_spark.streaming.doc_stream import (
        DEDUP_HORIZON,
        doc_digest_frame as ddf,
    )

    dedup = (
        ddf(sdf).withWatermark("ts", DEDUP_HORIZON)
        .dropDuplicatesWithinWatermark(["content_md5"])
    )
    q = (
        dedup.writeStream.format("memory").queryName("doc_dedup_mb")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(180)
    got = spark.sql("SELECT content_md5 FROM doc_dedup_mb").collect()
    want = {r["content_md5"] for r in doc_digest_frame(docs).collect()}
    assert {r["content_md5"] for r in got} == want
    assert len(got) == len(want)


def test_stream_curation_gate_matches_batch(spark, doc_source, tmp_path):
    """The stateless curation gate's streaming pass-through set must
    equal the batch filter on the same rows — exactly (no watermark
    caveats for a stateless operator)."""
    from astra_perseverance_spark.streaming.curation_stream import (
        curation_gate,
        stream_curation_gate,
    )

    sdf = stream_curation_gate(spark, doc_source)
    q = (
        sdf.writeStream.format("memory").queryName("curation_gate_test")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_cur"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM curation_gate_test").collect()

    want = curation_gate(spark.read.parquet(doc_source)).collect()
    key = lambda r: r["doc_id"]  # noqa: E731
    assert sorted(map(key, got)) == sorted(map(key, want))
    gm = {r["doc_id"]: r for r in got}
    for w in want:
        g = gm[w["doc_id"]]
        assert g["pii_total"] == w["pii_total"]
        assert g["mean_word_len"] == w["mean_word_len"]
        assert g["gopher_pass"] and w["gopher_pass"]


def test_stream_curation_gate_is_stateless(spark, doc_source):
    """The gate must compile to a stateless streaming plan — no state
    store operators (a self-join regression would show up here)."""
    import contextlib
    import io

    from astra_perseverance_spark.streaming.curation_stream import (
        stream_curation_gate,
    )

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        stream_curation_gate(spark, doc_source).explain(True)
    plan = buf.getvalue()
    for marker in ("StateStore", "streamingSymmetricHashJoin",
                   "dropDuplicates"):
        assert marker not in plan, f"stateful operator in gate plan: {marker}"


def test_stream_gate_composes_with_dedup(spark, doc_source, tmp_path):
    """Gate → watermark-bounded dedup in ONE streaming pipeline: the
    survivors are exactly one per redacted-content digest among the
    gate's pass-through set, and every survivor passed the gate."""
    from astra_perseverance_spark.streaming.curation_stream import (
        curation_gate,
        stream_curated_dedup,
    )

    sdf = stream_curated_dedup(spark, doc_source)
    q = (
        sdf.writeStream.format("memory").queryName("curated_dedup_test")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_cd"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(180)
    got = spark.sql("SELECT * FROM curated_dedup_test").collect()

    # batch twin: gate + digest, distinct digests as the deterministic
    # contract (dropDuplicatesWithinWatermark is streaming-only; which
    # member survives is arrival-order dependent)
    from pyspark.sql import functions as F

    from astra_perseverance_spark.extensions.dedup import normalized_text

    batch = curation_gate(spark.read.parquet(doc_source)).withColumn(
        "content_md5", F.md5(normalized_text("redacted")))
    want_digests = {r["content_md5"] for r in
                    batch.select("content_md5").distinct().collect()}
    assert {r["content_md5"] for r in got} == want_digests
    assert len(got) == len(want_digests)
    for r in got:
        assert r["gopher_pass"]  # nothing bypassed the gate


def test_stream_doc_minute_tokens_matches_batch(spark, doc_source, tmp_path):
    """The throughput windows over an availableNow replay must equal
    the batch twin exactly (all rows arrive before the watermark
    closes any window)."""
    from astra_perseverance_spark.streaming.doc_stream import (
        doc_minute_token_agg,
        stream_doc_minute_tokens,
        with_event_time,
    )

    sdf = stream_doc_minute_tokens(spark, doc_source)
    # complete mode: append would hold back windows the watermark has
    # not closed (the replay spans minutes, the horizon is 1 hour)
    q = (
        sdf.writeStream.format("memory").queryName("doc_rate_test")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt_rate"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {
        (r["window_start"], r["n_docs"], r["total_chars"],
         r["total_ws_tokens"])
        for r in spark.sql("SELECT * FROM doc_rate_test").collect()
    }
    want = {
        (r["window_start"], r["n_docs"], r["total_chars"],
         r["total_ws_tokens"])
        for r in doc_minute_token_agg(
            with_event_time(spark.read.parquet(doc_source))).collect()
    }
    assert got == want and got


def test_stream_asof_matches_batch(spark, tmp_path):
    """Stateful streaming as-of attribution converges to the batch
    events_asof result when batches replay in event-time order —
    three time-ordered files through one query (maxFilesPerTrigger=1)
    so the newest-click state carries across micro-batches."""
    from astra_perseverance_spark.extensions.timeseries import (
        _events_ns,
        q_events_asof,
    )
    from astra_perseverance_spark.streaming import stream_events_asof

    ev = _events_ns(spark, SF_SMALL).orderBy("ns")
    rows = ev.collect()
    src_dir = str(tmp_path / "asof_src")
    third = len(rows) // 3
    for chunk in (rows[:third], rows[third:2 * third], rows[2 * third:]):
        spark.createDataFrame(chunk, ev.schema).coalesce(1).write.mode(
            "append").parquet(src_dir)

    sdf = stream_events_asof(spark, src_dir, max_files_per_trigger=1)
    q = (
        sdf.writeStream.format("memory").queryName("asof_stream_test")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(180)
    got = {
        (r["event_id"], r["user_id"], r["purchase_ns"], r["asof_ns"],
         r["asof_event_id"], r["gap_ns"])
        for r in spark.sql("SELECT * FROM asof_stream_test").collect()
    }
    want = {
        (r["event_id"], r["user_id"], r["purchase_ns"], r["asof_ns"],
         r["asof_event_id"], r["gap_ns"])
        for r in q_events_asof(spark, SF_SMALL).collect()
    }
    assert got == want and len(got) > 0


def test_stream_funnel_matches_batch(spark, tmp_path):
    """Stateful streaming funnel converges to the batch events_funnel
    result when batches replay in event-time order: the greedy
    in-order walk locks in exactly the batch minima (earliest view →
    earliest qualifying click → earliest qualifying purchase).  Three
    time-ordered files through one query so funnel state carries
    across micro-batches; the LAST emitted row per user is compared
    (earlier rows are the funnel's progress change-stream)."""
    from astra_perseverance_spark.extensions.timeseries import (
        _events_ns,
        q_events_funnel,
    )
    from astra_perseverance_spark.streaming import stream_events_funnel

    ev = _events_ns(spark, SF_SMALL).orderBy("ns")
    rows = ev.collect()
    src_dir = str(tmp_path / "funnel_src")
    third = len(rows) // 3
    for chunk in (rows[:third], rows[third:2 * third], rows[2 * third:]):
        spark.createDataFrame(chunk, ev.schema).coalesce(1).write.mode(
            "append").parquet(src_dir)

    sdf = stream_events_funnel(spark, src_dir, max_files_per_trigger=1)
    q = (
        sdf.writeStream.format("memory").queryName("funnel_stream_test")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_funnel"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(180)
    # last emitted row per user = the deepest funnel state reached
    emitted = spark.sql(
        "SELECT * FROM funnel_stream_test").collect()
    last: dict[int, tuple] = {}
    for r in emitted:
        cur = (r["view_ns"], r["click_ns"], r["purchase_ns"],
               r["reached"])
        prev = last.get(r["user_id"])
        if prev is None or cur[3] >= prev[3]:
            last[r["user_id"]] = cur
    want = {
        r["user_id"]: (r["view_ns"], r["click_ns"], r["purchase_ns"],
                       r["reached"])
        for r in q_events_funnel(spark, SF_SMALL).collect()
    }
    assert last == want and len(last) > 0


def test_stream_asof_same_ns_tie_matches_batch(spark, tmp_path):
    """Equal-timestamp tie INSIDE one micro-batch: a click with the
    same ns as a purchase but a LARGER event_id must still attribute
    it (clicks sort before purchases at equal ns), matching the batch
    twin's inclusive ``right.ts <= left.ts`` semantics.  Before the
    (ns, clicks-first, event_id) sort the plain (ns, event_id) order
    processed the purchase first and missed the click."""
    from astra_perseverance_spark.functions.asof import asof_backward
    from astra_perseverance_spark.streaming import stream_events_asof

    # user 1: purchase id=10 at ns=1000, click id=99 (LARGER id) at
    #         the SAME ns — the tie under test
    # user 2: ordinary earlier click as a control
    rows = [
        (10, 1, "purchase", 1000),
        (99, 1, "click", 1000),
        (20, 2, "purchase", 500),
        (21, 2, "click", 400),
    ]
    sch = "event_id long, user_id long, event_type string, ns long"
    ev = spark.createDataFrame(rows, sch)
    src_dir = str(tmp_path / "tie_src")
    ev.coalesce(1).write.parquet(src_dir)  # ONE file -> one micro-batch

    sdf = stream_events_asof(spark, src_dir)
    q = (
        sdf.writeStream.format("memory").queryName("asof_tie_test")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_tie"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {
        (r["event_id"], r["asof_ns"], r["asof_event_id"], r["gap_ns"])
        for r in spark.sql("SELECT * FROM asof_tie_test").collect()
    }
    purchases = ev.filter("event_type = 'purchase'").select(
        "event_id", "user_id", ev.ns.alias("purchase_ns"))
    clicks = ev.filter("event_type = 'click'").select(
        "user_id", "ns", "event_id")
    want = {
        (r["event_id"], r["asof_ns"], r["asof_event_id"],
         r["purchase_ns"] - r["asof_ns"] if r["asof_ns"] is not None
         else None)
        for r in asof_backward(
            purchases, clicks, keys=["user_id"], left_ts="purchase_ns",
            right_ts="ns", payload=["event_id"]).collect()
    }
    assert got == want
    assert (10, 1000, 99, 0) in got  # the same-ns click attributed


def test_stream_funnel_same_ns_tie_matches_batch(spark, tmp_path):
    """Equal-timestamp tie INSIDE one micro-batch: a click with a
    SMALLER event_id than its same-ns view (and a purchase with a
    smaller event_id than its same-ns click) must still advance the
    funnel — the batch twin's ``ns >= view_ns`` / ``ns >= click_ns``
    filters are inclusive.  Before the (ns, step-priority, event_id)
    sort the plain (ns, event_id) order processed the dependent step
    first and skipped it."""
    from astra_perseverance_spark.extensions.timeseries import (
        q_events_funnel,
    )
    from astra_perseverance_spark.streaming import stream_events_funnel

    # user 1: view id=50 and click id=10 (SMALLER id) at the SAME ns
    # user 2: earlier view, then click id=30 and purchase id=5
    #         (SMALLER id) tied at ns=1000
    rows = [
        (50, 1, "view", 1000),
        (10, 1, "click", 1000),
        (1, 2, "view", 500),
        (30, 2, "click", 1000),
        (5, 2, "purchase", 1000),
    ]
    sch = "event_id long, user_id long, event_type string, ns long"
    ev = spark.createDataFrame(rows, sch)
    src_dir = str(tmp_path / "funnel_tie_src")
    ev.coalesce(1).write.parquet(src_dir)  # ONE file -> one micro-batch

    sdf = stream_events_funnel(spark, src_dir)
    q = (
        sdf.writeStream.format("memory").queryName("funnel_tie_test")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_funnel_tie"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    emitted = spark.sql("SELECT * FROM funnel_tie_test").collect()
    last: dict[int, tuple] = {}
    for r in emitted:
        cur = (r["view_ns"], r["click_ns"], r["purchase_ns"],
               r["reached"])
        prev = last.get(r["user_id"])
        if prev is None or cur[3] >= prev[3]:
            last[r["user_id"]] = cur

    ev.createOrReplaceTempView("_funnel_tie_events")
    import astra_perseverance_spark.extensions.timeseries as ts
    orig = ts._events_ns
    ts._events_ns = lambda s, d: s.table("_funnel_tie_events")
    try:
        want = {
            r["user_id"]: (r["view_ns"], r["click_ns"],
                           r["purchase_ns"], r["reached"])
            for r in q_events_funnel(spark, SF_SMALL).collect()
        }
    finally:
        ts._events_ns = orig
    assert last == want
    assert last[1] == (1000, 1000, None, 2)  # same-ns click advanced
    assert last[2] == (500, 1000, 1000, 3)  # same-ns purchase advanced


def test_funnel_reorder_buffer_recovers_cross_batch_late_click(
        spark, tmp_path):
    """Watermark-bounded reorder buffer: purchase@100 arrives in batch
    1, the click@50 it depends on arrives in batch 2.  Without a
    lateness budget the purchase is gone by the time the click lands
    (the declared r6 trade-off); with lateness_ns covering the gap the
    buffered purchase replays after the late click and the funnel
    completes — matching the batch twin over the full event set."""
    from astra_perseverance_spark.streaming import stream_events_funnel

    sch = "event_id long, user_id long, event_type string, ns long"
    b1 = [(1, 7, "view", 10), (2, 7, "purchase", 100)]
    b2 = [(3, 7, "click", 50)]
    src_dir = str(tmp_path / "late_funnel_src")
    for chunk in (b1, b2):
        spark.createDataFrame(chunk, sch).coalesce(1).write.mode(
            "append").parquet(src_dir)

    sdf = stream_events_funnel(
        spark, src_dir, max_files_per_trigger=1, lateness_ns=1000)
    q = (
        sdf.writeStream.format("memory").queryName("late_funnel_test")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_late_funnel"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    emitted = [tuple(r) for r in spark.sql(
        "SELECT view_ns, click_ns, purchase_ns, reached "
        "FROM late_funnel_test ORDER BY reached").collect()]
    # change stream ends at the completed funnel = the batch answer
    assert emitted[-1] == (10, 50, 100, 3), emitted
    # and without the budget the purchase stays lost (regression pin)
    sdf0 = stream_events_funnel(spark, src_dir, max_files_per_trigger=1)
    q0 = (
        sdf0.writeStream.format("memory").queryName("late_funnel_test0")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_late_funnel0"))
        .trigger(availableNow=True).start()
    )
    q0.awaitTermination(120)
    emitted0 = [tuple(r) for r in spark.sql(
        "SELECT view_ns, click_ns, purchase_ns, reached "
        "FROM late_funnel_test0 ORDER BY reached").collect()]
    assert emitted0[-1] == (10, 50, None, 2), emitted0


def test_attribution_reorder_buffer_recovers_cross_batch_late_click(
        spark, tmp_path):
    """purchase@100 in batch 1, its click@50 in batch 2, and a
    watermark-advancing later click in batch 3: with a lateness
    budget the purchase holds in the reorder buffer until the
    watermark passes it, by which point the late click has been
    replayed ahead — the LAST emitted row per event_id (buffered
    purchases emit a provisional change stream, last row wins)
    equals the batch ``asof_backward`` answer instead of NULL."""
    from astra_perseverance_spark.streaming import stream_events_asof

    sch = "event_id long, user_id long, event_type string, ns long"
    b1 = [(1, 7, "purchase", 100)]
    b2 = [(2, 7, "click", 50)]
    b3 = [(3, 7, "click", 5000)]  # advances the user watermark past 100
    src_dir = str(tmp_path / "late_attr_src")
    for chunk in (b1, b2, b3):
        spark.createDataFrame(chunk, sch).coalesce(1).write.mode(
            "append").parquet(src_dir)

    sdf = stream_events_asof(
        spark, src_dir, max_files_per_trigger=1, lateness_ns=1000)
    q = (
        sdf.writeStream.format("memory").queryName("late_attr_test")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_late_attr"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = [tuple(r) for r in spark.sql(
        "SELECT event_id, purchase_ns, asof_ns, asof_event_id, gap_ns "
        "FROM late_attr_test").collect()]
    # change stream: provisional NULL (batch 1, purchase in buffer),
    # provisional corrected by the late click (batch 2); finalization
    # in batch 3 matches what was already emitted, so it adds no row
    assert got == [(1, 100, None, None, None), (1, 100, 50, 2, 50)], got
    # regression pin: without the budget the click arrives too late
    sdf0 = stream_events_asof(spark, src_dir, max_files_per_trigger=1)
    q0 = (
        sdf0.writeStream.format("memory").queryName("late_attr_test0")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_late_attr0"))
        .trigger(availableNow=True).start()
    )
    q0.awaitTermination(120)
    got0 = [tuple(r) for r in spark.sql(
        "SELECT event_id, purchase_ns, asof_ns, asof_event_id, gap_ns "
        "FROM late_attr_test0").collect()]
    assert got0 == [(1, 100, None, None, None)], got0


def test_attribution_tail_purchase_emits_provisionally(spark, tmp_path):
    """ADVICE r7: with lateness_ns > 0 and NO watermark-advancing
    later event, a bounded replay (availableNow) used to withhold
    every purchase inside the lateness budget of the user's final
    watermark.  Buffered purchases now emit provisional rows — the
    tail converges to the batch twin even when the user goes quiet."""
    from astra_perseverance_spark.streaming import stream_events_asof

    sch = "event_id long, user_id long, event_type string, ns long"
    b1 = [(1, 7, "purchase", 100)]
    b2 = [(2, 7, "click", 50)]  # in-budget late click, then silence
    src_dir = str(tmp_path / "tail_attr_src")
    for chunk in (b1, b2):
        spark.createDataFrame(chunk, sch).coalesce(1).write.mode(
            "append").parquet(src_dir)

    sdf = stream_events_asof(
        spark, src_dir, max_files_per_trigger=1, lateness_ns=1000)
    q = (
        sdf.writeStream.format("memory").queryName("tail_attr_test")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_tail_attr"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = [tuple(r) for r in spark.sql(
        "SELECT event_id, purchase_ns, asof_ns, asof_event_id, gap_ns "
        "FROM tail_attr_test").collect()]
    # last row per event_id = the batch answer, despite the purchase
    # never finalizing
    assert got == [(1, 100, None, None, None), (1, 100, 50, 2, 50)], got


def test_attribution_provisional_rows_not_reemitted_on_replay(
        spark, tmp_path):
    """An unchanged buffered purchase must not re-emit its provisional
    row every batch: a third batch whose events do not touch the
    buffered region adds no duplicate of the already-emitted
    provisional attribution."""
    from astra_perseverance_spark.streaming import stream_events_asof

    sch = "event_id long, user_id long, event_type string, ns long"
    b1 = [(1, 7, "click", 50), (2, 7, "purchase", 100)]
    # a later in-budget purchase keeps everything buffered (watermark
    # still below the whole region) and replays purchase 2 unchanged
    b2 = [(3, 7, "purchase", 120)]
    src_dir = str(tmp_path / "noreemit_attr_src")
    for chunk in (b1, b2):
        spark.createDataFrame(chunk, sch).coalesce(1).write.mode(
            "append").parquet(src_dir)

    sdf = stream_events_asof(
        spark, src_dir, max_files_per_trigger=1, lateness_ns=1000)
    q = (
        sdf.writeStream.format("memory").queryName("noreemit_attr_test")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_noreemit_attr"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = [tuple(r) for r in spark.sql(
        "SELECT event_id, purchase_ns, asof_ns, asof_event_id, gap_ns "
        "FROM noreemit_attr_test").collect()]
    # purchase 2's provisional row appears ONCE (batch 1) — batch 2's
    # replay reproduces the identical attribution and is suppressed;
    # purchase 3 emits its own provisional row
    assert got == [(2, 100, 50, 1, 50), (3, 120, 50, 1, 70)], got


def test_attribution_inactivity_timeout_finalizes_and_drops_state(
        spark, tmp_path):
    """r8 ADVICE: dormant-user state GC.  With inactivity_timeout_ms
    armed, a user quiet past the budget has their buffered purchases
    finalized via ProcessingTimeTimeout and their state row DROPPED —
    proven by (a) the finalization adding no duplicate of the
    already-correct provisional row, and (b) the user's NEXT purchase
    attributing NULL (the pre-timeout click is forgotten with the
    state, the declared monotone degradation)."""
    import time

    from astra_perseverance_spark.streaming import stream_events_asof

    sch = "event_id long, user_id long, event_type string, ns long"
    src_dir = str(tmp_path / "timeout_attr_src")

    def land(rows):
        spark.createDataFrame(rows, sch).coalesce(1).write.mode(
            "append").parquet(src_dir)

    def wait_rows(n, timeout=60):
        # NOTE: processAllAvailable() never returns under
        # ProcessingTimeTimeout — Spark runs a no-data batch every
        # trigger to evaluate timers, so "all available" never
        # settles; poll the sink instead
        deadline = time.time() + timeout
        rows = []
        while time.time() < deadline:
            rows = [tuple(r) for r in spark.sql(
                "SELECT event_id, purchase_ns, asof_ns, asof_event_id,"
                " gap_ns FROM timeout_attr_test").collect()]
            if len(rows) >= n:
                return rows
            time.sleep(0.5)
        raise AssertionError(f"sink never reached {n} rows: {rows}")

    land([(1, 7, "click", 50), (2, 7, "purchase", 100)])
    sdf = stream_events_asof(
        spark, src_dir, lateness_ns=1000, inactivity_timeout_ms=1000)
    q = (
        sdf.writeStream.format("memory").queryName("timeout_attr_test")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_timeout_attr"))
        .trigger(processingTime="250 milliseconds").start()
    )
    try:
        assert wait_rows(1) == [(2, 100, 50, 1, 50)]
        # user 7 goes quiet past the 1s inactivity budget; the timer
        # fires on one of the no-data batches during this sleep
        time.sleep(4)
        # a returning user-7 purchase sees FRESH state: click 1 was
        # finalized + dropped with the state row, so no attribution
        land([(3, 7, "purchase", 200)])
        got = wait_rows(2)
    finally:
        q.stop()
    # row 1: purchase 2's provisional attribution (already the batch
    # answer, so the timeout finalization is suppressed — no dup);
    # row 2: post-timeout purchase 3 starts from empty state
    assert got == [(2, 100, 50, 1, 50), (3, 200, None, None, None)], got


def test_funnel_provisional_replay_does_not_reemit(spark, tmp_path):
    """ADVICE r7: new events arriving while the reorder buffer is
    non-empty used to re-emit previously-superseded tuples (a
    reached=1 row after reached=3 was already emitted).  The replay
    now diffs against the previously emitted provisional sequence —
    a batch that advances nothing emits nothing."""
    from astra_perseverance_spark.streaming import stream_events_funnel

    sch = "event_id long, user_id long, event_type string, ns long"
    b1 = [(1, 7, "view", 10), (2, 7, "click", 20), (3, 7, "purchase", 30)]
    b2 = [(4, 7, "view", 40)]  # in-budget, advances no funnel step
    src_dir = str(tmp_path / "noreemit_funnel_src")
    for chunk in (b1, b2):
        spark.createDataFrame(chunk, sch).coalesce(1).write.mode(
            "append").parquet(src_dir)

    sdf = stream_events_funnel(
        spark, src_dir, max_files_per_trigger=1, lateness_ns=1000)
    q = (
        sdf.writeStream.format("memory").queryName("noreemit_funnel_test")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_noreemit_funnel"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = [tuple(r) for r in spark.sql(
        "SELECT view_ns, click_ns, purchase_ns, reached "
        "FROM noreemit_funnel_test").collect()]
    # exactly the three advancement tuples, strictly increasing —
    # batch 2's replay re-walks to the same sequence and emits nothing
    assert got == [(10, None, None, 1), (10, 20, None, 2),
                   (10, 20, 30, 3)], got


def test_funnel_inactivity_timeout_finalizes_and_drops_state(
        spark, tmp_path):
    """r9 verdict #5: dormant-user state GC for the funnel stream.
    With inactivity_timeout_ms armed, a user quiet past the budget has
    their buffered steps finalized via ProcessingTimeTimeout and their
    state row DROPPED — proven by (a) the finalization adding no
    duplicate of the already-emitted provisional walk, and (b) the
    returning user's view starting a FRESH funnel (a reached=1 row a
    retained v=10 state would have suppressed)."""
    import time

    from astra_perseverance_spark.streaming import stream_events_funnel

    sch = "event_id long, user_id long, event_type string, ns long"
    src_dir = str(tmp_path / "timeout_funnel_src")

    def land(rows):
        spark.createDataFrame(rows, sch).coalesce(1).write.mode(
            "append").parquet(src_dir)

    def wait_rows(n, timeout=60):
        # NOTE: processAllAvailable() never returns under
        # ProcessingTimeTimeout — Spark runs a no-data batch every
        # trigger to evaluate timers, so "all available" never
        # settles; poll the sink instead
        deadline = time.time() + timeout
        rows = []
        while time.time() < deadline:
            rows = [tuple(r) for r in spark.sql(
                "SELECT view_ns, click_ns, purchase_ns, reached "
                "FROM timeout_funnel_test").collect()]
            if len(rows) >= n:
                return rows
            time.sleep(0.5)
        raise AssertionError(f"sink never reached {n} rows: {rows}")

    # lateness budget keeps the whole walk buffered (provisional rows)
    land([(1, 7, "view", 10), (2, 7, "click", 20), (3, 7, "purchase", 30)])
    sdf = stream_events_funnel(
        spark, src_dir, lateness_ns=1000, inactivity_timeout_ms=1000)
    q = (
        sdf.writeStream.format("memory").queryName("timeout_funnel_test")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_timeout_funnel"))
        .trigger(processingTime="250 milliseconds").start()
    )
    try:
        assert wait_rows(3) == [(10, None, None, 1), (10, 20, None, 2),
                                (10, 20, 30, 3)]
        # user 7 goes quiet past the 1s inactivity budget; the timer
        # fires on a no-data batch, finalizes the buffer (re-walking
        # to the already-emitted tuples — nothing re-emits) and drops
        # the state row
        time.sleep(4)
        # returning user-7 view: with fresh state it opens a NEW
        # funnel and emits reached=1; retained state (v=10) would
        # have advanced nothing and emitted nothing
        land([(4, 7, "view", 500)])
        got = wait_rows(4)
    finally:
        q.stop()
    assert got == [(10, None, None, 1), (10, 20, None, 2),
                   (10, 20, 30, 3), (500, None, None, 1)], got


def test_gc_sessions_reorder_buffer_merges_late_bridge(spark, tmp_path):
    """r7 verdict #3: a cross-batch late event that should MERGE two
    sessions.  Batch 1 carries pauses at t=0 and t=2000 (gap ≥ 1800 —
    greedily two sessions, the first already closed and emitted);
    batch 2 delivers the late bridge at t=1600 (inside BOTH the
    reorder budget and the stream's 10-minute watermark delay — rows
    older than the stream watermark never reach the state function,
    see the stream_gc_sessions docstring).  With the budget the
    buffered events replay in event-time order and the emitted closed
    session is the single merged [0, 2000] span — the batch
    q_gc_sessions answer.  Without the budget the wrong early close
    stands (regression pin)."""
    from datetime import datetime, timezone

    from astra_perseverance_spark.streaming import stream_gc_sessions

    sch = "node string, dc string, ts timestamp, pause_ms int"
    BASE = 1_000_000  # clear of the epoch-0 initial-watermark boundary

    def mk(ts_list):
        return spark.createDataFrame(
            [("n1", "dc1",
              datetime.fromtimestamp(BASE + t, tz=timezone.utc)
              .replace(tzinfo=None), 10 + i)
             for i, t in enumerate(ts_list)], sch)

    import time

    src = str(tmp_path / "late_sess_src")
    # distinct mtimes keep the file-source batch order deterministic
    mk([0, 2000]).coalesce(1).write.mode("append").parquet(src)
    time.sleep(1.1)
    # the late bridge: 1600 > stream watermark (2000 - 600) so Spark's
    # late-row filter lets it through; 2000-1600 and 1600-0 both < gap
    mk([1600]).coalesce(1).write.mode("append").parquet(src)
    time.sleep(1.1)
    # watermark-advancing event finalizes the buffered region, then a
    # sentinel closes the merged span (the trick
    # test_stateful_sessions_match_batch uses)
    mk([100_000]).coalesce(1).write.mode("append").parquet(src)
    time.sleep(1.1)
    mk([300_000]).coalesce(1).write.mode("append").parquet(src)

    q = stream_gc_sessions(spark, src, max_files_per_trigger=1,
                           lateness_sec=2500)
    run = (
        q.writeStream.format("memory").queryName("late_sess_test")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_late_sess"))
        .trigger(availableNow=True).start()
    )
    run.awaitTermination(180)
    got = {
        (int(r["session_start"].timestamp()) - BASE,
         int(r["session_end"].timestamp()) - BASE, r["pauses"])
        for r in spark.sql("SELECT * FROM late_sess_test").collect()
        if r["session_start"].timestamp() - BASE <= 2000
    }
    assert (0, 2000, 3) in got, got
    assert (0, 0, 1) not in got, got

    # regression pin: greedy mode closes [0, 0] before the bridge lands
    q0 = stream_gc_sessions(spark, src, max_files_per_trigger=1)
    run0 = (
        q0.writeStream.format("memory").queryName("late_sess_test0")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_late_sess0"))
        .trigger(availableNow=True).start()
    )
    run0.awaitTermination(180)
    got0 = {
        (int(r["session_start"].timestamp()) - BASE,
         int(r["session_end"].timestamp()) - BASE, r["pauses"])
        for r in spark.sql("SELECT * FROM late_sess_test0").collect()
    }
    assert (0, 0, 1) in got0, got0


def test_stream_ingest_jsonl_is_incremental_exactly_once(spark, tmp_path):
    """Incremental JSONL ingest: a second run over the same checkpoint
    picks up only the newly landed files, never duplicating documents,
    and the resulting corpus answers the engine's own queries like the
    batch-read dump."""
    import json

    from astra_perseverance_spark.extensions.text_stats import q_text_stats
    from astra_perseverance_spark.sources.corpus_jsonl import (
        read_documents_jsonl,
        stream_ingest_jsonl_corpus,
    )

    dump = tmp_path / "dump"
    dump.mkdir()
    corpus = str(tmp_path / "corpus")

    def land(name, ids):
        (dump / name).write_text("\n".join(
            json.dumps({"doc_id": i, "text": f"body of document {i}",
                        "lang": "en", "source": "drop"})
            for i in ids))

    land("part-0.jsonl", range(0, 40))
    land("part-1.jsonl", range(40, 70))
    stream_ingest_jsonl_corpus(spark, str(dump), corpus)
    first = spark.read.parquet(f"{corpus}/documents.parquet")
    assert first.count() == 70

    # a new file lands; re-run with the same checkpoint → append only it
    land("part-2.jsonl", range(70, 100))
    stream_ingest_jsonl_corpus(spark, str(dump), corpus)
    docs = spark.read.parquet(f"{corpus}/documents.parquet")
    counts = {r["doc_id"]: r["n"] for r in
              docs.groupBy("doc_id").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == set(range(100))
    assert set(counts.values()) == {1}  # exactly once, across both runs

    # the ingested corpus answers queries like the batch read of the dump
    a = {tuple(r) for r in q_text_stats(spark, corpus).collect()}
    batch_dir = str(tmp_path / "batch_corpus")
    read_documents_jsonl(spark, str(dump)).write.parquet(
        f"{batch_dir}/documents.parquet")
    b = {tuple(r) for r in q_text_stats(spark, batch_dir).collect()}
    assert a == b and a
