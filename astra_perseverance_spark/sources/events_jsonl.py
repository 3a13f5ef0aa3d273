"""JSONL event-log source: newline-delimited JSON events → the
engine's ``events`` contract.

Application event logs almost always land as JSON lines (one event
per line from a log shipper or queue sink); this source makes such a
drop directory a first-class input for the whole timeseries family
(as-of joins, attribution, sessionization, funnel, skew audit) and
the streaming operators that tail it.

Same design rules as ``corpus_jsonl``: explicit schema (inference is
a full extra pass at scale), strict/permissive corrupt-line modes,
and an incremental exactly-once streaming ingest.  Timestamps on the
wire are either epoch NANOS integers or ISO-8601 strings (the two
shapes event logs actually carry); both conform to epoch-nanos
BIGINT ``ts`` — the representation the engine's parquet reads
produce (``nanosAsLong``) and the type branch every consumer
(``timeseries._events_ns``, ``conformed.model.build_gc_event``)
already accepts.  ISO strings WITH an explicit UTC offset
(``...Z`` / ``±HH:MM`` / ``±HHMM`` — RFC 3339) are honored as
instants via the zone-aware cast; bare wall-time strings are treated
as UTC via the same microsecond-exact ntz expression ``_events_ns``
uses.  Session timezone never enters either branch.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

EVENT_SCHEMA = StructType([
    StructField("event_id", LongType()),
    StructField("ts", StringType()),  # epoch nanos OR ISO-8601
    StructField("user_id", LongType()),
    StructField("event_type", StringType()),
    StructField("value", DoubleType()),
    StructField("props", StringType()),
])

# An event without these is unusable by every consumer (joins key on
# user_id, windows order by ts, filters branch on event_type).
_REQUIRED = ("event_id", "ts", "user_id", "event_type")


def _read_schema(strict: bool) -> StructType:
    if strict:
        return EVENT_SCHEMA
    return StructType(
        list(EVENT_SCHEMA.fields) + [StructField("_corrupt", StringType())]
    )


# An explicit UTC offset (Z / ±HH:MM / ±HHMM) makes the string an
# INSTANT; those route through the zone-aware cast — timestamp_ntz
# would silently IGNORE the offset and shift every event by it.
_OFFSET_RE = "(?i)(z|[+-][0-9]{2}:[0-9]{2}|[+-][0-9]{4})$"


def _conform(df: DataFrame, strict: bool) -> DataFrame:
    if not strict:
        df = df.filter(F.col("_corrupt").isNull()).drop("_corrupt")
    # epoch-nanos integers pass through; offset-carrying ISO strings
    # convert as instants (unix_micros of the zone-aware cast —
    # session-timezone-independent because the offset is explicit);
    # bare wall-time strings use the exact ntz-to-nanos expression the
    # timeseries family uses (timeseries._events_ns).  An unparseable
    # ts nulls out and the row is contract-violating.
    ns = (
        F.when(F.col("ts").rlike("^-?[0-9]+$"), F.col("ts").cast("long"))
        .when(
            F.col("ts").rlike(_OFFSET_RE),
            F.expr("unix_micros(try_cast(ts as timestamp))").cast("long")
            * 1_000,
        )
        .otherwise(
            F.expr(
                "timestampdiff(MICROSECOND,"
                " to_timestamp_ntz('1970-01-01 00:00:00'),"
                " try_cast(ts as timestamp_ntz))"
            ).cast("long") * 1_000
        )
    )
    ok = ns.isNotNull()
    for c in _REQUIRED:
        if c != "ts":
            ok = ok & F.col(c).isNotNull()
    if strict:
        # FAILFAST only rejects malformed JSON; a valid-JSON event
        # missing a required field (or with an unparseable ts) must
        # also FAIL the read, not silently vanish
        msg = F.concat(
            F.lit("events JSONL contract violation (strict mode): "),
            F.to_json(F.struct("event_id", "ts", "user_id", "event_type")),
        )
        df = df.withColumn("ts", F.when(ok, ns).otherwise(F.raise_error(msg)))
    else:
        df = df.filter(ok).withColumn("ts", ns)
    return df.select(
        "event_id", "ts", "user_id", "event_type", "value", "props")


def read_events_jsonl(spark: SparkSession, path: str,
                      strict: bool = True) -> DataFrame:
    """Read a JSONL event dump into the ``events`` contract
    (event_id, ts-as-nanos, user_id, event_type, value, props);
    corrupt lines, events missing a required field, and unparseable
    timestamps are dropped in permissive mode and FAIL the read in
    strict mode (malformed JSON through FAILFAST; valid-JSON contract
    violations through a ``raise_error`` gate on the conformed ts —
    strict mode never silently loses an event)."""
    from astra_perseverance_spark.sources.corpus_jsonl import jsonl_reader

    reader = jsonl_reader(spark, _read_schema(strict), strict)
    return _conform(reader.json(path), strict)


def ingest_events_jsonl(spark: SparkSession, src: str, out_dir: str,
                        strict: bool = True) -> str:
    """JSONL event dump → ``out_dir/events.parquet``; returns
    ``out_dir``, usable as the ``sf_dir`` of every events query.  The
    write repartitions on user_id — the key the whole family windows
    and joins on — so first reads are already usefully spread, at a
    width derived from the source's listed bytes
    (``corpus_jsonl.ingest_width``), not a core-count constant (for a
    durable exchange-free layout run ``sinks.warehouse.
    write_bucketed_events`` over the result)."""
    from astra_perseverance_spark.sources.corpus_jsonl import ingest_width

    events = read_events_jsonl(spark, src, strict=strict)
    dest = os.path.join(out_dir, "events.parquet")
    (
        events.repartition(ingest_width(spark, src), "user_id")
        .write.mode("overwrite").parquet(dest)
    )
    return out_dir


def stream_events_jsonl(spark: SparkSession, path: str,
                        strict: bool = False) -> DataFrame:
    """Unbounded counterpart: a file-source stream over a directory
    event logs keep landing in, conformed by the shared projection.
    Returns the unstarted streaming frame (caller picks
    sink/trigger) — the realistic intake in front of the stateful
    streaming operators."""
    from astra_perseverance_spark.sources.corpus_jsonl import jsonl_reader

    reader = jsonl_reader(spark, _read_schema(strict), strict,
                          streaming=True)
    return _conform(reader.json(path), strict)


def stream_ingest_events_jsonl(spark: SparkSession, src: str, out_dir: str,
                               strict: bool = False):
    """Incremental exactly-once event ingest (the
    ``corpus_jsonl.stream_ingest_jsonl_corpus`` contract): each run
    appends only files the checkpoint has not committed, so a crash
    or a schedule never duplicates an event.  Blocks until the
    backlog drains; returns ``out_dir``."""
    from astra_perseverance_spark.sources.corpus_jsonl import (
        drain_ingest_stream,
    )

    drain_ingest_stream(
        stream_events_jsonl(spark, src, strict=strict),
        os.path.join(out_dir, "events.parquet"),
        os.path.join(out_dir, "_ev_checkpoint"),
    )
    return out_dir
