"""Corpus QA: contract validation (with its DuckDB twin, proven here
ahead of round-9 registration) and version diff."""

from __future__ import annotations

import duckdb
import pytest

ROWS = [
    # (doc_id, text, lang, source, n_chars)
    (1, "a clean document", "en", "web", 16),
    (2, "another clean one", "fr", "web", 17),
    (2, "another clean one", "fr", "web", 17),   # duplicate doc_id (2 docs)
    (3, "", "en", "web", 0),                     # empty text
    (4, "stale metadata", "en", "web", 99),      # n_chars mismatch
    (5, "bad lang tag", "English", "web", 12),   # lang_not_iso
    (6, None, "en", "web", None),                # null text
    (None, "orphan row", "en", "web", 10),       # null doc_id
    (7, "fine with und", "und", "web", 13),
]

SCHEMA = ("doc_id long, text string, lang string, source string, "
          "n_chars long")


@pytest.fixture(scope="module")
def qa_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("qa_corpus")
    spark.createDataFrame(ROWS, SCHEMA).coalesce(1).write.parquet(
        str(d / "documents.parquet"))
    return str(d)


class TestCorpusValidate:
    def test_planted_violations_counted(self, spark, qa_dir):
        from astra_perseverance_spark.extensions.qa import q_corpus_validate

        got = {r["check"]: r["n_violations"]
               for r in q_corpus_validate(spark, qa_dir).collect()}
        assert got == {
            "null_doc_id": 1,
            "duplicate_doc_id": 2,  # both copies of doc 2 count
            "null_text": 1,
            "empty_text": 1,
            "n_chars_mismatch": 1,
            "lang_not_iso": 1,
        }

    def test_duckdb_twin_parity(self, spark, qa_dir):
        from astra_perseverance_spark.extensions.qa import (
            q_corpus_validate,
        )
        from astra_perseverance_spark.oracle.ext_sqls import EXT_ORACLE_SQL

        con = duckdb.connect()
        con.sql(f"CREATE VIEW documents AS SELECT * FROM "
                f"'{qa_dir}/documents.parquet/*.parquet'")
        oracle = {r[0]: int(r[1])
                  for r in con.sql(
                      EXT_ORACLE_SQL["corpus_validate"]).fetchall()}
        got = {r["check"]: r["n_violations"]
               for r in q_corpus_validate(spark, qa_dir).collect()}
        assert got == oracle

    def test_clean_corpus_is_all_zero(self, spark, tmp_path):
        from astra_perseverance_spark.extensions.qa import q_corpus_validate

        clean = [(i, f"doc {i}", "en", "web", len(f"doc {i}"))
                 for i in range(10)]
        spark.createDataFrame(clean, SCHEMA).write.parquet(
            str(tmp_path / "documents.parquet"))
        got = q_corpus_validate(spark, str(tmp_path)).collect()
        assert len(got) == 6
        assert all(r["n_violations"] == 0 for r in got)

    def test_gates_the_asked_directory_even_in_bucketed_mode(
            self, spark, qa_dir, monkeypatch):
        """The gate's subject is the freshly-landed directory it was
        asked about: with SPARK_GRAFT_BUCKETED_DB set (which redirects
        docs_frame to the promoted warehouse) the validator must still
        read ``sf_dir`` directly — validating already-promoted data
        would green-light a corrupt ingest."""
        from astra_perseverance_spark.extensions.corpus import (
            BUCKETED_DB_ENV,
        )
        from astra_perseverance_spark.extensions.qa import q_corpus_validate

        monkeypatch.setenv(BUCKETED_DB_ENV, "no_such_promoted_db")
        got = {r["check"]: r["n_violations"]
               for r in q_corpus_validate(spark, qa_dir).collect()}
        assert got["null_doc_id"] == 1 and got["duplicate_doc_id"] == 2


class TestCorpusDiff:
    def test_added_removed_changed(self, spark, tmp_path):
        from astra_perseverance_spark.extensions.qa import corpus_diff

        old = [(1, "same"), (2, "will change"), (3, "will vanish")]
        new = [(1, "same"), (2, "has changed"), (4, "brand new")]
        for name, rows in (("old", old), ("new", new)):
            spark.createDataFrame(
                [(i, t, "en", "web", len(t)) for i, t in rows], SCHEMA
            ).write.parquet(str(tmp_path / name / "documents.parquet"))

        got = {(r["doc_id"], r["status"]) for r in corpus_diff(
            spark, str(tmp_path / "old"), str(tmp_path / "new")).collect()}
        assert got == {(2, "changed"), (3, "removed"), (4, "added")}


    def test_empty_corpus_reports_zeros_not_nulls(self, spark, tmp_path):
        """SUM over a zero-row corpus is NULL in both engines; the
        gate must report six explicit zeros so a `n_violations > 0`
        check cannot silently green-light an empty landing."""
        import duckdb

        from astra_perseverance_spark.extensions.qa import (
            q_corpus_validate,
        )
        from astra_perseverance_spark.oracle.ext_sqls import EXT_ORACLE_SQL

        spark.createDataFrame([], SCHEMA).write.parquet(
            str(tmp_path / "documents.parquet"))
        got = {r["check"]: r["n_violations"]
               for r in q_corpus_validate(spark, str(tmp_path)).collect()}
        assert len(got) == 6 and all(v == 0 for v in got.values())
        con = duckdb.connect()
        con.sql(f"CREATE VIEW documents AS SELECT * FROM "
                f"'{tmp_path}/documents.parquet/*.parquet'")
        oracle = {r[0]: r[1] for r in con.sql(
            EXT_ORACLE_SQL["corpus_validate"]).fetchall()}
        assert all(v == 0 for v in oracle.values())


class TestCorpusDiffEdges:
    def test_null_vs_empty_text_diffs_as_changed(self, spark, tmp_path):
        """NULL text and empty text are distinct violation states in
        the validator, so they must not digest identically."""
        from astra_perseverance_spark.extensions.qa import corpus_diff

        for name, text in (("old", None), ("new", "")):
            spark.createDataFrame(
                [(7, text, "en", "web", 0)], SCHEMA
            ).write.parquet(str(tmp_path / name / "documents.parquet"))
        got = [tuple(r) for r in corpus_diff(
            spark, str(tmp_path / "old"), str(tmp_path / "new")).collect()]
        assert got == [(7, "changed")]

    def test_duplicated_doc_id_yields_one_verdict(self, spark, tmp_path):
        """A doc_id landed twice in one version must produce ONE
        deterministic diff row, not an m*n join explosion with
        contradictory statuses."""
        from astra_perseverance_spark.extensions.qa import corpus_diff

        old = [(1, "t1"), (1, "t2"), (2, "same")]
        new = [(1, "t1"), (2, "same")]
        for name, rows in (("old", old), ("new", new)):
            spark.createDataFrame(
                [(i, t, "en", "web", len(t)) for i, t in rows], SCHEMA
            ).write.parquet(str(tmp_path / name / "documents.parquet"))
        got = [tuple(r) for r in corpus_diff(
            spark, str(tmp_path / "old"), str(tmp_path / "new")).collect()]
        assert got == [(1, "changed")]  # multiset {t1,t2} != {t1}
        # and the multiset digest is order-insensitive: same rows,
        # other landing order -> no diff at all
        spark.createDataFrame(
            [(1, "t2", "en", "web", 2), (1, "t1", "en", "web", 2),
             (2, "same", "en", "web", 4)], SCHEMA
        ).write.parquet(str(tmp_path / "old2" / "documents.parquet"))
        assert corpus_diff(spark, str(tmp_path / "old"),
                           str(tmp_path / "old2")).count() == 0

    def test_null_doc_id_matches_null_safely(self, spark, tmp_path):
        """Round-11 review finding: a plain equi-join never matches
        NULL keys, so two identical corpora each carrying a
        NULL-doc_id row reported a spurious added+removed pair; the
        join is NULL-SAFE now, and a genuinely changed NULL-id row
        still diffs as changed."""
        from astra_perseverance_spark.extensions.qa import corpus_diff

        rows = [(None, "anon"), (1, "kept")]
        for name in ("old", "new"):
            spark.createDataFrame(
                [(i, t, "en", "web", len(t)) for i, t in rows], SCHEMA
            ).write.parquet(str(tmp_path / name / "documents.parquet"))
        assert corpus_diff(spark, str(tmp_path / "old"),
                           str(tmp_path / "new")).count() == 0
        spark.createDataFrame(
            [(None, "anon EDITED", "en", "web", 11),
             (1, "kept", "en", "web", 4)], SCHEMA
        ).write.parquet(str(tmp_path / "new2" / "documents.parquet"))
        got = [tuple(r) for r in corpus_diff(
            spark, str(tmp_path / "old"),
            str(tmp_path / "new2")).collect()]
        assert got == [(None, "changed")]


class TestCorpusQaCli:
    def test_validate_gates_and_diff_counts(self, spark, qa_dir, tmp_path):
        import json
        import os
        import sys

        sys.path.insert(0, os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "tools"))
        import corpus_qa

        # dirty fixture corpus → nonzero exit (the ingest gate)
        assert corpus_qa.main(["validate", qa_dir]) == 1

        clean = [(i, f"doc {i}", "en", "web", len(f"doc {i}"))
                 for i in range(5)]
        cdir = str(tmp_path / "clean")
        spark.createDataFrame(clean, SCHEMA).write.parquet(
            f"{cdir}/documents.parquet")
        assert corpus_qa.main(["validate", cdir]) == 0

        out = str(tmp_path / "diffout")
        assert corpus_qa.main(["diff", cdir, cdir, "--out", out]) == 0
        assert spark.read.parquet(out).count() == 0  # identical versions
