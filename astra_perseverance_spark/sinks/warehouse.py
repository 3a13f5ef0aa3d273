"""Bucketed warehouse layout: co-located joins without a shuffle.

At 100 TB the dominant cost of every doc_id-keyed join (stats ⋈ docs,
digests ⋈ docs, labels ⋈ embeddings) is the exchange.  Writing the
corpus ONCE as bucketed+sorted tables moves that cost to ingest time:
two tables bucketed by the same key into the same bucket count join
with NO Exchange (and, with ``sortBy``, no per-task Sort) — Spark
plans a bucket-local sort-merge join where bucket i of A streams
against bucket i of B.

This is the persisted-table analog of the session-scoped
``repartition`` the memo frames use; a production deployment with a
metastore keeps the bucketing metadata across jobs, so every
downstream pipeline inherits shuffle-free joins.  (With Spark's
default in-memory catalog the metadata lives for the session — the
layout on disk is identical either way.)

Bucket count: fixed at write time; choose ≈ corpus_bytes /
(256 MB · compression) and re-bucket when the corpus outgrows it —
the same sizing rule as shuffle partitions, but durable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_BUCKETS = 16


def write_bucketed_corpus(spark: SparkSession, sf_dir: str, database: str,
                          location: str,
                          n_buckets: int = DEFAULT_BUCKETS) -> dict[str, str]:
    """Write ``documents`` (raw) and its per-doc digest/stats side
    tables bucketed+sorted by doc_id, plus ``embeddings`` bucketed by
    vec_id, under ``database`` (created at ``location``).  Returns
    table name → qualified name."""
    from astra_perseverance_spark.extensions.dedup import content_digest

    spark.sql(f"CREATE DATABASE IF NOT EXISTS {database} "
              f"LOCATION '{location}'")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    digests = docs.select(
        "doc_id", content_digest().alias("content_md5"),
        F.size(F.split(F.trim("text"), r"\s+")).cast("long")
        .alias("n_ws_tokens"),
    )
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out = {}
    for name, df, key in (("documents", docs, "doc_id"),
                          ("doc_digests", digests, "doc_id"),
                          ("embeddings", emb, "vec_id")):
        qualified = f"{database}.{name}"
        (
            df.write.mode("overwrite")
            .bucketBy(n_buckets, key).sortBy(key)
            .format("parquet")
            .saveAsTable(qualified)
        )
        out[name] = qualified
    return out


def colocated_doc_join(spark: SparkSession, database: str) -> DataFrame:
    """documents ⋈ doc_digests on doc_id — both sides bucketed on the
    key, so the physical plan has NO Exchange (assert it with
    ``.explain``; ``tests/test_warehouse.py`` gates exactly that)."""
    docs = spark.table(f"{database}.documents").select(
        "doc_id", "lang", "source")
    dig = spark.table(f"{database}.doc_digests")
    return docs.join(dig, "doc_id")


def write_bucketed_events(spark: SparkSession, sf_dir: str, database: str,
                          location: str,
                          n_buckets: int = DEFAULT_BUCKETS) -> str:
    """Write the events stream bucketed+sorted by user_id under
    ``database`` (created at ``location``), timestamps already
    converted to epoch-ns BIGINT (the ``_events_ns`` conversion runs
    ONCE, at ingest).  Returns the qualified table name.

    The whole timeseries family (sessionize, funnel, as-of carry,
    banded attribution) otherwise opens with an Exchange on user_id
    every run; a user_id-bucketed scan is already hash-clustered on
    the key, so ``Window.partitionBy("user_id")`` and the session
    aggregate plan with NO Exchange — only the final ORDER BY
    repartitions.  ``sortBy(user_id, ns, event_id)`` additionally
    matches the window sort order for single-file buckets.

    Ingest always reads the RAW parquet: ``_events_ns`` would
    otherwise resolve to the bucketed table itself when
    ``SPARK_GRAFT_BUCKETED_DB`` already points at ``database`` (a
    refresh run), and overwriting a table being read from is an
    AnalysisException — the env var is suppressed while the source
    plan is built (the branch binds at plan-build time), so
    re-ingest is idempotent."""
    import os

    from astra_perseverance_spark.extensions.corpus import BUCKETED_DB_ENV
    from astra_perseverance_spark.extensions.timeseries import _events_ns

    spark.sql(f"CREATE DATABASE IF NOT EXISTS {database} "
              f"LOCATION '{location}'")
    qualified = f"{database}.events"
    prior = os.environ.pop(BUCKETED_DB_ENV, None)
    try:
        src = _events_ns(spark, sf_dir)
    finally:
        if prior is not None:
            os.environ[BUCKETED_DB_ENV] = prior
    (
        src
        .write.mode("overwrite")
        .bucketBy(n_buckets, "user_id").sortBy("user_id", "ns", "event_id")
        .format("parquet")
        .saveAsTable(qualified)
    )
    return qualified
