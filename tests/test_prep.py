"""Training-prep operator invariants: chunk geometry + independent
md5 recompute, markup-extraction round trip, script-profile fraction
algebra, and curation-ledger consistency with its source queries."""

from __future__ import annotations

import hashlib
import math
import re

import pytest

from tests.conftest import SF_SMALL

from astra_perseverance_spark.extensions.prep import (
    CHUNK_LEN,
    CHUNK_STRIDE,
)


@pytest.fixture(scope="module")
def q(spark):
    from astra_perseverance_spark.queries import QUERY_REGISTRY

    def run(name):
        return QUERY_REGISTRY[name](spark, SF_SMALL)

    return run


class TestDocChunks:
    def test_chunk_geometry(self, q, spark):
        rows = q("doc_chunks").collect()
        docs = {
            r["doc_id"]: len(re.findall(r"[a-z0-9]+", r["text"].lower()))
            for r in spark.read.parquet(f"{SF_SMALL}/documents.parquet")
            .collect()
        }
        per_doc: dict[int, list] = {}
        for r in rows:
            per_doc.setdefault(r["doc_id"], []).append(r)
        for doc_id, chunks in per_doc.items():
            n = docs[doc_id]
            assert len(chunks) == -(-n // CHUNK_STRIDE)
            for c in sorted(chunks, key=lambda r: r["chunk_id"]):
                assert c["start_tok"] == c["chunk_id"] * CHUNK_STRIDE
                assert 1 <= c["n_tok"] <= CHUNK_LEN
                assert c["n_tok"] == min(CHUNK_LEN, n - c["start_tok"])

    def test_chunk_md5_recomputes_in_python(self, q, spark):
        """Independent recompute: the chunk digest must equal hashlib
        md5 over the same token window."""
        doc = spark.read.parquet(f"{SF_SMALL}/documents.parquet") \
            .orderBy("doc_id").limit(1).collect()[0]
        toks = re.findall(r"[a-z0-9]+", doc["text"].lower())
        got = [r for r in q("doc_chunks").collect()
               if r["doc_id"] == doc["doc_id"]]
        assert got
        for c in got:
            window = toks[c["start_tok"]:c["start_tok"] + CHUNK_LEN]
            want = hashlib.md5(" ".join(window).encode()).hexdigest()
            assert c["chunk_md5"] == want


class TestHtmlExtract:
    def test_roundtrip_holds_corpus_wide(self, q):
        rows = q("html_extract").collect()
        assert rows
        for r in rows:
            assert r["roundtrip_ok"], r["doc_id"]
            assert 0.0 < r["removed_frac"] < 1.0
            assert r["n_chars_clean"] < r["n_chars_html"]


class TestScriptProfile:
    def test_fractions_partition_unity(self, q):
        for r in q("script_profile").collect():
            total = (r["latin_frac"] + r["digit_frac"] + r["cjk_frac"]
                     + r["cyrillic_frac"] + r["space_frac"]
                     + r["other_frac"])
            assert math.isclose(total, 1.0, abs_tol=1e-9), r["doc_id"]
            assert r["dominant"] in (
                "latin", "digit", "cjk", "cyrillic", "space", "other")

    def test_cjk_counted(self, spark, monkeypatch):
        from astra_perseverance_spark.extensions import prep

        df = spark.createDataFrame(
            [(1, "你好 world 123", "zh", "s", 12)],
            "doc_id long, text string, lang string, source string, "
            "n_chars long")
        monkeypatch.setattr(prep, "_docs", lambda s, d: df)
        r = prep.q_script_profile(spark, "unused://").collect()[0]
        n = len("你好 world 123")
        assert r["cjk_frac"] == 2 / n
        assert r["latin_frac"] == 5 / n
        assert r["digit_frac"] == 3 / n
        assert r["dominant"] == "latin"


class TestRepeatedLines:
    def test_boilerplate_found_on_synthetic_corpus(self, spark, monkeypatch):
        from astra_perseverance_spark.extensions import prep

        footer = "copyright 2026 example corp"
        rows = [
            (1, f"unique alpha text\n{footer}", "en", "s", 40),
            (2, f"different beta body\n{footer}\n{footer}", "en", "s", 50),
            (3, "no shared lines here", "en", "s", 20),
        ]
        df = spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, "
                  "n_chars long")
        monkeypatch.setattr(prep, "_docs", lambda s, d: df)
        got = prep.q_repeated_lines(spark, "unused://").collect()
        assert len(got) == 1
        r = got[0]
        assert r["n_docs"] == 2      # distinct docs, not occurrences
        assert r["n_occ"] == 3       # doc 2 repeats it twice
        assert r["rep_doc"] == 1
        assert r["line_len"] == len(footer)

    def test_fixture_corpus_runs(self, q):
        # sf0.001 fixtures have no cross-doc repeated lines — empty
        # result, not an error (the sf0.1 bench corpus has 8)
        assert q("repeated_lines").count() >= 0


class TestTokenRarity:
    def test_rarity_stats_on_synthetic_corpus(self, spark, monkeypatch):
        from astra_perseverance_spark.extensions import prep

        rows = [
            (1, "common common rare1", "en", "s", 20),
            (2, "common rare2", "en", "s", 15),
        ]
        df = spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, "
                  "n_chars long")
        monkeypatch.setattr(prep, "_docs", lambda s, d: df)
        got = {r["doc_id"]: r
               for r in prep.q_token_rarity(spark, "unused://").collect()}
        # doc 1 distinct toks: common(df=2), rare1(df=1)
        assert got[1]["n_distinct"] == 2
        assert got[1]["mean_token_df"] == 1.5
        assert got[1]["min_token_df"] == 1
        assert got[1]["n_unique_tokens"] == 1


class TestCorpusCurate:
    def test_ledger_covers_corpus_and_flags_consistent(self, q, spark):
        ledger = {r["doc_id"]: r for r in q("corpus_curate").collect()}
        n_docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet").count()
        assert len(ledger) == n_docs
        for r in ledger.values():
            assert r["keep"] == (r["reasons"] == "")

        # quality reasons agree with the standalone quality filter
        qf = {r["doc_id"]: r["reasons"]
              for r in q("quality_filter").collect()}
        for doc_id, reasons in qf.items():
            for reason in reasons.split(";"):
                assert reason in ledger[doc_id]["reasons"], (doc_id, reason)

        # near_dup flags are exactly the larger-id sides of the
        # verified n-gram pairs
        pairs = q("ngram_jaccard").collect()
        want_near = {r["doc_b"] for r in pairs}
        got_near = {d for d, r in ledger.items()
                    if "near_dup" in r["reasons"]}
        assert got_near == want_near

        # contaminated flags are exactly the decontaminate doc set
        want_contam = {r["doc_id"] for r in q("decontaminate").collect()}
        got_contam = {d for d, r in ledger.items()
                      if "contaminated" in r["reasons"]}
        assert got_contam == want_contam
