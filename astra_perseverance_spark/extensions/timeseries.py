"""Time-series extension: as-of attribution over the events stream.

The brief's canonical example of an operator Spark lacks natively:
the backward as-of join (``functions.asof``).  Registered here as a
concrete attribution query — each purchase event attributed to the
same user's latest click at-or-before it — with DuckDB's NATIVE
``ASOF JOIN`` as the oracle twin, so the union-and-carry Spark
formulation is checked against a genuinely independent engine
implementation of the same semantics.

Timestamps are carried as epoch-nanosecond BIGINTs end to end (the
``conformed.model`` convention: the testdata's TIMESTAMP(NANOS)
parquet reads as raw nanos via ``nanosAsLong``, and integer epochs
make both engines agree regardless of session timezone).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from astra_perseverance_spark.conformed.model import _read
from astra_perseverance_spark.functions.asof import asof_backward


def _events_ns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_id, user_id, event_type, ns): the events table with the
    timestamp as epoch nanos BIGINT — same type-branching as
    ``conformed.model.build_gc_event`` (nanos / instant / ntz)."""
    raw = _read(spark, sf_dir, "events")
    ts_type = dict(raw.dtypes).get("ts", "")
    if ts_type in ("bigint", "long"):
        ns = F.col("ts")
    elif ts_type == "timestamp":
        ns = F.expr("unix_micros(ts)") * 1000
    else:  # timestamp_ntz — keep full microsecond precision
        ns = F.expr(
            "timestampdiff(MICROSECOND,"
            " to_timestamp_ntz('1970-01-01 00:00:00'),"
            " cast(ts as timestamp_ntz))"
        ).cast("long") * 1_000
    return raw.select(
        F.col("event_id").cast("long").alias("event_id"),
        F.col("user_id").cast("long").alias("user_id"),
        "event_type",
        ns.cast("long").alias("ns"),
    )


def q_events_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Click-to-purchase attribution: each purchase event joined
    as-of to the same user's latest click at-or-before it.

    Uses the union-and-carry as-of join (``functions.asof`` — one
    shuffle on user_id, a partition-local running carry, no range-
    join row explosion), the shape that survives a 100 TB event
    stream; the oracle twin is DuckDB's native ASOF JOIN.

    Output: event_id, user_id, purchase_ns, asof_ns (click time,
    NULL if the user never clicked before), asof_event_id, gap_ns."""
    ev = _events_ns(spark, sf_dir)
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", F.col("ns").alias("purchase_ns"))
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ns", "event_id")
    joined = asof_backward(
        purchases, clicks,
        keys=["user_id"], left_ts="purchase_ns", right_ts="ns",
        payload=["event_id"],
    )
    return (
        joined.select(
            "event_id", "user_id", "purchase_ns",
            F.col("asof_ns"),
            F.col("asof_event_id"),
            (F.col("purchase_ns") - F.col("asof_ns")).alias("gap_ns"),
        )
        .orderBy("event_id")
    )
