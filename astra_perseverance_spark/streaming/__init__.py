"""Structured Streaming variants of the event facts (SURVEY.md §7.5).

The reference is strictly batch (§2.9) — this package is the additive
scale path: the same windowed semantics over an unbounded gc_event
stream, sharing column logic with the batch queries so parity holds
between the two execution modes.
"""

from astra_perseverance_spark.streaming.attribution_stream import (
    stream_events_asof,
)
from astra_perseverance_spark.streaming.curation_stream import (
    curation_gate,
    stream_curated_dedup,
    stream_curation_gate,
)
from astra_perseverance_spark.streaming.doc_stream import stream_dedup_exact
from astra_perseverance_spark.streaming.funnel_stream import (
    stream_events_funnel,
)
from astra_perseverance_spark.streaming.gc_stream import (
    gc_minute_window_agg,
    stream_gc_minute_windows,
    stream_gc_sessions,
)

__all__ = [
    "curation_gate",
    "stream_events_asof",
    "stream_events_funnel",
    "gc_minute_window_agg",
    "stream_curated_dedup",
    "stream_curation_gate",
    "stream_dedup_exact",
    "stream_gc_minute_windows",
    "stream_gc_sessions",
]
