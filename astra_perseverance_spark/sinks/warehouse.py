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

import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_BUCKETS = 16

# the `_NNNNN` bucket-id component saveAsTable writes into bucketed
# file names (part-<task>-<uuid>_00012.c000.snappy.parquet); the task
# prefix and uuid use '-' separators, so '_' + 5 digits + '.' is
# unambiguous
_BUCKET_ID_RE = re.compile(r"_(\d{5})\.")


def _max_bucket_id(path: str) -> int | None:
    """Largest bucket id any parquet file under ``path`` claims via
    its ``_NNNNN`` filename component, or None when no file carries
    one (a plain-parquet directory)."""
    best: int | None = None
    for root, _, files in os.walk(path):
        for f in files:
            if not f.endswith(".parquet"):
                continue
            m = _BUCKET_ID_RE.search(f)
            if m:
                b = int(m.group(1))
                if best is None or b > best:
                    best = b
    return best

# table -> (bucket key, sort keys) as written by the two writers below
_WAREHOUSE_LAYOUT: dict[str, tuple[str, tuple[str, ...]]] = {
    "documents": ("doc_id", ("doc_id",)),
    "doc_digests": ("doc_id", ("doc_id",)),
    "embeddings": ("vec_id", ("vec_id",)),
    "events": ("user_id", ("user_id", "ns", "event_id")),
}


def register_external_bucketed(spark: SparkSession, database: str,
                               name: str, path: str,
                               bucket_key: str | None,
                               sort_keys: tuple[str, ...],
                               n_buckets: int) -> None:
    """Re-attach one on-disk table to a FRESH application as an
    external table.  Spark's default in-memory catalog forgets table
    metadata at ``spark.stop()`` while the data files (with their
    ``_NNNNN`` bucket-id filename components) survive — an external
    CREATE TABLE with the same CLUSTERED/SORTED BY DDL restores the
    hash-clustered scan exactly.  ``bucket_key=None`` registers a
    plain (unbucketed) table.  ``n_buckets`` must match the write
    (catalog metadata, not derivable from the files — a real
    metastore would have remembered it); the schema is inferred from
    the parquet footers, never guessed.

    The bucket count is VALIDATED against the data files before the
    DDL runs: ``saveAsTable`` writes each row's bucket id into the
    ``_NNNNN`` filename component, so a file claiming bucket id ≥
    ``n_buckets`` proves the declared count is wrong.  Declaring a
    wrong count would not fail any query — Spark would hash rows
    into the wrong logical bucket and every "co-located" join or
    bucket-local aggregate would be silently WRONG — which is why
    this is a hard error, not a warning.  (A too-large multiple of
    the true count passes this check by construction and is equally
    wrong; the check catches the common operational mistake of
    registering with a different DEFAULT_BUCKETS than the writer's.)"""
    if spark.catalog.tableExists(f"{database}.{name}"):
        return
    if bucket_key is not None:
        seen = _max_bucket_id(path)
        if seen is not None and seen >= n_buckets:
            raise ValueError(
                f"{database}.{name}: data files at {path} carry bucket "
                f"id {seen} but the table is being registered with "
                f"n_buckets={n_buckets} — the declared bucket count "
                f"must match the write, or every bucketed join on "
                f"this table would be silently mis-clustered")
    sch = spark.read.parquet(path).schema
    cols = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in sch.fields)
    bucket_ddl = ""
    if bucket_key is not None:
        sort_ddl = ", ".join(sort_keys)
        bucket_ddl = (f"CLUSTERED BY ({bucket_key}) "
                      f"SORTED BY ({sort_ddl}) "
                      f"INTO {n_buckets} BUCKETS ")
    spark.sql(
        f"CREATE TABLE {database}.{name} ({cols}) USING PARQUET "
        f"{bucket_ddl}LOCATION '{path}'")


def register_warehouse(spark: SparkSession, database: str, location: str,
                       n_buckets: int = DEFAULT_BUCKETS) -> list[str]:
    """Re-attach an on-disk bucketed warehouse (written by
    ``write_bucketed_corpus`` / ``write_bucketed_events``) to a fresh
    application, so ``SPARK_GRAFT_BUCKETED_DB`` keeps its shuffle-free
    joins across Spark applications — the same cross-application story
    the index store has (``sinks.index_store.register_index_store``).
    Tables whose directory is absent are skipped (``events`` is
    written by a separate ingest).  Returns the registered names.

    The database is deliberately created WITHOUT ``LOCATION``: the
    tables are external and carry their own paths, and anchoring the
    catalog entry at the data directory would make a later
    ``DROP DATABASE`` (whose in-memory-catalog semantics DELETE the
    database directory) silently destroy the warehouse files."""
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {database}")
    out = []
    for name, (key, sort_keys) in _WAREHOUSE_LAYOUT.items():
        path = os.path.join(location, name)
        if not os.path.isdir(path):
            continue
        register_external_bucketed(
            spark, database, name, path, key, sort_keys, n_buckets)
        out.append(name)
    return out


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
