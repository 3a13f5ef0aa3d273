"""Streaming as-of attribution: the ``events_asof`` semantics as a
custom stateful operator (``applyInPandasWithState``).

Per-user state is ONE row — the newest click seen so far — so state
size is |users| (the dimension grain), independent of event rate;
purchases attribute against it and append immediately.  Within a
micro-batch events are processed in (ns, clicks-first, event_id)
order — equal-timestamp clicks land before purchases, matching the
batch twin's inclusive tie semantics — so the operator converges to
the batch twin whenever batches arrive event-time ordered (the
test's replay shape); a click arriving
*after* a purchase it should have attributed is the inherent
streaming trade-off — batch ``events_asof`` is the retrospective
truth, this operator is the low-latency approximation.  A production
deployment would add an inactivity TTL (event-time timeout) to drop
dormant users' state; the operator keeps NoTimeout so attribution
survives arbitrarily long user gaps on the test corpus.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

_OUT_SCHEMA = (
    "event_id long, user_id long, purchase_ns long, "
    "asof_ns long, asof_event_id long, gap_ns long"
)
_STATE_SCHEMA = "ns long, event_id long"


def _attr_update(key, pdf_iter, state):
    """One (user, micro-batch): walk events in (ns, clicks-first,
    event_id) order — clicks sort BEFORE purchases at equal ``ns`` so
    an equal-timestamp click attributes the purchase, matching the
    batch twin's inclusive ``right.ts <= left.ts`` semantics
    (``functions.asof``) even when the click's event_id is larger.
    Clicks advance the newest-click state, purchases emit their
    attribution row against it."""
    import pandas as pd

    user = key[0]
    latest = tuple(state.get) if state.exists else None
    out = {c: [] for c in ("event_id", "purchase_ns",
                           "asof_ns", "asof_event_id", "gap_ns")}
    frames = [pdf for pdf in pdf_iter]
    df = pd.concat(frames)
    df = (
        df.assign(_p=(df["event_type"] != "click").astype("int8"))
        .sort_values(["ns", "_p", "event_id"])
    )
    for r in df.itertuples():
        if r.event_type == "click":
            cand = (int(r.ns), int(r.event_id))
            if latest is None or cand > latest:
                latest = cand
        elif r.event_type == "purchase":
            hit = latest if latest is not None and latest[0] <= r.ns else None
            out["event_id"].append(int(r.event_id))
            out["purchase_ns"].append(int(r.ns))
            out["asof_ns"].append(hit[0] if hit else None)
            out["asof_event_id"].append(hit[1] if hit else None)
            out["gap_ns"].append(int(r.ns) - hit[0] if hit else None)
    if latest is not None:
        state.update(latest)
    yield pd.DataFrame({
        "event_id": pd.Series(out["event_id"], dtype="Int64"),
        "user_id": pd.Series([user] * len(out["event_id"]), dtype="Int64"),
        "purchase_ns": pd.Series(out["purchase_ns"], dtype="Int64"),
        "asof_ns": pd.Series(out["asof_ns"], dtype="Int64"),
        "asof_event_id": pd.Series(out["asof_event_id"], dtype="Int64"),
        "gap_ns": pd.Series(out["gap_ns"], dtype="Int64"),
    })


def stream_events_asof(spark: SparkSession, source_dir: str,
                       schema: str | None = None,
                       max_files_per_trigger: int | None = None):
    """Streaming as-of attribution over a file-source event stream
    (rows: event_id, user_id, event_type, ns).  Returns the unstarted
    streaming DataFrame; the batch twin is
    ``extensions.timeseries.q_events_asof``."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    sch = schema or "event_id long, user_id long, event_type string, ns long"
    reader = spark.readStream.schema(sch)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(source_dir)
    return (
        stream.groupBy("user_id")
        .applyInPandasWithState(
            _attr_update,
            outputStructType=_OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
