"""Streaming conversion funnel: the ``events_funnel`` semantics as a
custom stateful operator (``applyInPandasWithState``).

Per-user state is ONE row — the funnel progression (view_ns,
click_ns, purchase_ns), each field set at most once — so state size
is |users| (the dimension grain), independent of event rate.  The
greedy in-order walk is EXACTLY the batch semantics: the batch query
takes the earliest view, then the earliest click at-or-after it,
then the earliest purchase at-or-after that click, and a greedy walk
over event-time-ordered events locks in precisely those minima.  So
when batches replay in event-time order the last emitted row per
user equals the batch ``q_events_funnel`` row (the test gates this);
an out-of-order arrival that should have advanced an earlier step is
the inherent streaming trade-off, as in ``attribution_stream``.

A row is emitted only when a user's funnel ADVANCES — downstream
consumers see funnel progress as a change stream, not a per-event
firehose.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

_OUT_SCHEMA = (
    "user_id long, view_ns long, click_ns long, purchase_ns long, "
    "reached int"
)
_STATE_SCHEMA = "view_ns long, click_ns long, purchase_ns long"


_STEP_PRIORITY = {"view": 0, "click": 1, "purchase": 2}


def _funnel_update(key, pdf_iter, state):
    """One (user, micro-batch): walk events in (ns, step-priority,
    event_id) order — view < click < purchase at equal ``ns`` so an
    equal-timestamp click (or purchase) lands AFTER the step it
    depends on regardless of event_id, matching the batch twin's
    inclusive ``ns >= view_ns`` / ``ns >= click_ns`` semantics (the
    same tie class as ``attribution_stream``'s clicks-first ``_p``
    column).  Advances the three funnel fields monotonically; emits
    one row per advancement."""
    import pandas as pd

    user = key[0]
    v, c, p = tuple(state.get) if state.exists else (None, None, None)
    out = {k: [] for k in ("view_ns", "click_ns", "purchase_ns",
                           "reached")}
    frames = [pdf for pdf in pdf_iter]
    df = pd.concat(frames)
    df = (
        df.assign(_p=df["event_type"].map(_STEP_PRIORITY)
                  .fillna(3).astype("int8"))  # non-funnel types: any slot
        .sort_values(["ns", "_p", "event_id"])
    )
    for r in df.itertuples():
        ns = int(r.ns)
        advanced = False
        if r.event_type == "view" and v is None:
            v, advanced = ns, True
        elif (r.event_type == "click" and c is None
                and v is not None and ns >= v):
            c, advanced = ns, True
        elif (r.event_type == "purchase" and p is None
                and c is not None and ns >= c):
            p, advanced = ns, True
        if advanced:
            out["view_ns"].append(v)
            out["click_ns"].append(c)
            out["purchase_ns"].append(p)
            out["reached"].append(
                1 + (c is not None) + (p is not None))
    if v is not None:
        state.update((v, c, p))
    yield pd.DataFrame({
        "user_id": pd.Series([user] * len(out["reached"]), dtype="Int64"),
        "view_ns": pd.Series(out["view_ns"], dtype="Int64"),
        "click_ns": pd.Series(out["click_ns"], dtype="Int64"),
        "purchase_ns": pd.Series(out["purchase_ns"], dtype="Int64"),
        "reached": pd.Series(out["reached"], dtype="Int32"),
    })


def stream_events_funnel(spark: SparkSession, source_dir: str,
                         schema: str | None = None,
                         max_files_per_trigger: int | None = None):
    """Streaming funnel over a file-source event stream (rows:
    event_id, user_id, event_type, ns).  Returns the unstarted
    streaming DataFrame; the batch twin is
    ``extensions.timeseries.q_events_funnel``."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    sch = schema or "event_id long, user_id long, event_type string, ns long"
    reader = spark.readStream.schema(sch)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(source_dir)
    return (
        stream.groupBy("user_id")
        .applyInPandasWithState(
            _funnel_update,
            outputStructType=_OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
