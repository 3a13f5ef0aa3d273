"""Corpus data-contract QA: validation and version diff.

An ingest path (JSONL dumps, WebDataset shards, connector loads)
needs a gate that says whether the landed corpus actually honors the
conformed ``documents`` contract before a 100 TB curation run spends
a cluster-day on it, and a diff that says what changed between two
corpus versions before one replaces the other.

Both are single-shuffle shapes:

- ``q_corpus_validate`` is one pass of aggregates over the corpus —
  each check is a SUM of a row predicate except the duplicate count,
  which rides the same doc_id clustering the corpus frames already
  carry; output is one row per check (constant-size, driver-safe).
- ``corpus_diff`` is a full-outer doc_id equi-join of the two
  versions' digest frames — uniform key, exchange-free when both
  sides read bucketed warehouses; output carries only the docs that
  differ, which is the review-sized set.

Not yet registered (the round-8 driver window is full); slated for a
round-9 registry slot with the DuckDB twin in ``oracle/ext_sqls.py``
— the pytest suite already runs the twin via a local DuckDB
connection so parity is proven ahead of registration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Check names, in output order (stable contract for the oracle twin).
VALIDATE_CHECKS = (
    "null_doc_id",
    "duplicate_doc_id",
    "null_text",
    "empty_text",
    "n_chars_mismatch",
    "lang_not_iso",
)

_LANG_RE = "^[a-z]{2,3}$"  # ISO 639-1/-2 shaped, plus the "und" default


def q_corpus_validate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(check, n_violations) — one row per contract rule, counting the
    documents that violate it.  An all-zero result is the green light;
    a nonzero ``duplicate_doc_id`` or ``n_chars_mismatch`` usually
    means a bad ingest (double-landed files / stale metadata).

    Shape: the scalar checks are SUMs in ONE aggregate pass; the
    duplicate count needs the doc_id grain first and joins in as a
    second single-row frame.  Output is 6 rows.

    Reads ``sf_dir/documents.parquet`` DIRECTLY — never through
    ``corpus.docs_frame`` — for two reasons: the gate's subject is
    the freshly-landed directory it was asked about (docs_frame
    silently redirects to the promoted bucketed warehouse when
    ``SPARK_GRAFT_BUCKETED_DB`` is set, which would validate the
    wrong data and green-light a corrupt ingest), and the raw read
    sees the landed bytes before any conforming projection could
    mask a violation."""
    d = spark.read.parquet(f"{sf_dir.rstrip('/')}/documents.parquet")

    def _n(col: F.Column) -> F.Column:
        # SUM over a zero-row corpus is NULL, not 0 — an empty landing
        # must read as six explicit zeros (and then fail whatever
        # emptiness check the caller adds), never as six NULLs a
        # `n_violations > 0` gate silently passes
        return F.coalesce(F.sum(col.cast("long")), F.lit(0).cast("long"))

    flags = d.agg(
        _n(F.col("doc_id").isNull()).alias("null_doc_id"),
        _n(F.col("text").isNull()).alias("null_text"),
        _n(F.col("text").isNotNull()
           & (F.length("text") == 0)).alias("empty_text"),
        _n(F.col("text").isNotNull()
           & (F.coalesce("n_chars", F.lit(-1)) != F.length("text")))
        .alias("n_chars_mismatch"),
        _n(~F.coalesce("lang", F.lit("")).rlike(_LANG_RE))
        .alias("lang_not_iso"),
    )
    dups = (
        d.filter(F.col("doc_id").isNotNull())
        .groupBy("doc_id").agg(F.count("*").alias("cnt"))
        .agg(F.coalesce(
            F.sum(F.when(F.col("cnt") > 1, F.col("cnt"))), F.lit(0)
        ).alias("duplicate_doc_id"))
    )
    wide = flags.crossJoin(dups)  # 1 row × 1 row
    return wide.select(
        F.explode(F.array(*[
            F.struct(F.lit(c).alias("check"),
                     F.col(c).cast("long").alias("n_violations"))
            for c in VALIDATE_CHECKS
        ])).alias("kv")
    ).select("kv.check", "kv.n_violations")


# DuckDB twin, pytest-proven now, registered with the query in round 9.
CORPUS_VALIDATE_SQL = """
WITH flags AS (
  SELECT
    COALESCE(SUM(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END), 0)
      AS null_doc_id,
    COALESCE(SUM(CASE WHEN text IS NULL THEN 1 ELSE 0 END), 0)
      AS null_text,
    COALESCE(SUM(CASE WHEN text IS NOT NULL AND length(text) = 0
        THEN 1 ELSE 0 END), 0) AS empty_text,
    COALESCE(SUM(CASE WHEN text IS NOT NULL
        AND COALESCE(n_chars, -1) != length(text)
        THEN 1 ELSE 0 END), 0) AS n_chars_mismatch,
    COALESCE(SUM(CASE WHEN NOT regexp_matches(
        COALESCE(lang, ''), '^[a-z]{2,3}$')
        THEN 1 ELSE 0 END), 0) AS lang_not_iso
  FROM documents
), dups AS (
  SELECT COALESCE(SUM(CASE WHEN cnt > 1 THEN cnt END), 0)
         AS duplicate_doc_id
  FROM (SELECT doc_id, COUNT(*) AS cnt FROM documents
        WHERE doc_id IS NOT NULL GROUP BY doc_id)
)
SELECT "check", n_violations FROM (
  SELECT 'null_doc_id' AS "check", null_doc_id AS n_violations,
         1 AS ord FROM flags
  UNION ALL SELECT 'duplicate_doc_id', duplicate_doc_id, 2 FROM dups
  UNION ALL SELECT 'null_text', null_text, 3 FROM flags
  UNION ALL SELECT 'empty_text', empty_text, 4 FROM flags
  UNION ALL SELECT 'n_chars_mismatch', n_chars_mismatch, 5 FROM flags
  UNION ALL SELECT 'lang_not_iso', lang_not_iso, 6 FROM flags
) ORDER BY ord
"""


def corpus_diff(spark: SparkSession, old_dir: str,
                new_dir: str) -> DataFrame:
    """(doc_id, status) for every document that differs between two
    corpus versions: ``added`` (only in new), ``removed`` (only in
    old), ``changed`` (same doc_id, different text digest).
    Unchanged documents — the overwhelming majority between adjacent
    versions — are filtered before anything leaves the join.

    One full-outer doc_id equi-join of two doc_id-GRAIN digest
    frames; at 100 TB both sides are doc_id-clustered reads, so the
    join is the single shuffle (or none, bucketed).

    Two contract edge cases are handled explicitly: a NULL text
    digests to a sentinel distinct from the empty string (the two are
    different violation states in ``q_corpus_validate``, so they must
    diff as 'changed'), and a doc_id duplicated within one version
    collapses to a single order-insensitive multiset digest before
    the join — otherwise the full-outer join would emit m·n rows
    with contradictory statuses for that id."""
    def digests(sf_dir: str, name: str) -> DataFrame:
        row_digest = F.coalesce(
            F.md5(F.encode(F.col("text"), "utf-8")),
            F.lit("<null-text>"),  # md5(NULL) is NULL; '' hashes real
        )
        return (
            spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select("doc_id", row_digest.alias("rd"))
            .groupBy("doc_id")
            .agg(F.md5(F.concat_ws(
                "|", F.sort_array(F.collect_list("rd")))).alias(name))
        )

    old = digests(old_dir, "old_md5")
    new = digests(new_dir, "new_md5")
    joined = old.join(new, "doc_id", "full_outer")
    return joined.select(
        "doc_id",
        F.when(F.col("old_md5").isNull(), "added")
        .when(F.col("new_md5").isNull(), "removed")
        .when(F.col("old_md5") != F.col("new_md5"), "changed")
        .alias("status"),
    ).filter(F.col("status").isNotNull())
