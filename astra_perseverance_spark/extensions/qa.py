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

``q_corpus_validate`` is registered (round 9) with its DuckDB twin
in ``oracle/ext_sqls.py`` (``EXT_ORACLE_SQL["corpus_validate"]``);
the pytest suite additionally runs the twin via a local DuckDB
connection on adversarial fixtures (``tests/test_qa.py``).
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

    Three contract edge cases are handled explicitly: a NULL text
    digests to a sentinel distinct from the empty string (the two are
    different violation states in ``q_corpus_validate``, so they must
    diff as 'changed'); a doc_id duplicated within one version
    collapses to a single order-insensitive multiset digest before
    the join — otherwise the full-outer join would emit m·n rows
    with contradictory statuses for that id; and the join key is
    NULL-SAFE (``eqNullSafe``) — a plain equi-join never matches NULL
    doc_ids, so two identical corpora each carrying NULL-id rows
    would report a spurious added+removed pair for an unchanged
    corpus."""
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
    new = digests(new_dir, "new_md5").withColumnRenamed(
        "doc_id", "new_doc_id")
    joined = old.join(
        new, old["doc_id"].eqNullSafe(new["new_doc_id"]), "full_outer")
    return joined.select(
        F.coalesce("doc_id", "new_doc_id").alias("doc_id"),
        F.when(F.col("old_md5").isNull(), "added")
        .when(F.col("new_md5").isNull(), "removed")
        .when(F.col("old_md5") != F.col("new_md5"), "changed")
        .alias("status"),
    ).filter(F.col("status").isNotNull())
