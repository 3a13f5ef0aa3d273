"""Unit tests for the curation operators on crafted inputs.

The synthetic corpus is single-line word soup with no PII-shaped
tokens, so the oracle-parity checks there exercise the plumbing and
digest chains but not the line metrics or the PII patterns.  These
tests feed hand-built documents through the same column expressions.
"""

from __future__ import annotations

import pytest


def _run_on_docs(spark, fn, rows, monkeypatch):
    """Run a curation query fn against an in-memory documents frame."""
    from astra_perseverance_spark.extensions import curation

    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
              "n_chars long")
    monkeypatch.setattr(curation, "_docs", lambda s, d: df)
    return fn(spark, "unused://")


class TestQualitySignals:
    def test_line_metrics_on_multiline_doc(self, spark, monkeypatch):
        from astra_perseverance_spark.extensions.curation import (
            q_quality_signals,
        )

        text = "\n".join([
            "- first bullet",
            "- first bullet",          # duplicate line
            "* second bullet",
            "this line trails off...",
            "a normal closing line",
        ])
        [r] = _run_on_docs(
            spark, q_quality_signals,
            [(1, text, "en", "s", len(text))], monkeypatch,
        ).collect()
        assert r["bullet_line_frac"] == pytest.approx(3 / 5)
        assert r["ellipsis_line_frac"] == pytest.approx(1 / 5)
        assert r["dup_line_frac"] == pytest.approx(1 / 5)
        assert r["alpha_word_frac"] < 1.0  # '-' and '*' have no letter
        assert not r["gopher_pass"]  # too few words

    def test_gopher_pass_on_clean_doc(self, spark, monkeypatch):
        from astra_perseverance_spark.extensions.curation import (
            q_quality_signals,
        )

        text = " ".join(f"word{i}" for i in range(60))
        [r] = _run_on_docs(
            spark, q_quality_signals,
            [(1, text, "en", "s", len(text))], monkeypatch,
        ).collect()
        assert r["n_words"] == 60
        assert r["symbol_word_ratio"] == 0.0
        assert r["alpha_word_frac"] == 1.0
        assert r["gopher_pass"]

    def test_symbol_ratio_counts_hash_and_ellipsis(self, spark, monkeypatch):
        from astra_perseverance_spark.extensions.curation import (
            q_quality_signals,
        )

        [r] = _run_on_docs(
            spark, q_quality_signals,
            [(1, "a # b ... c #### d", "en", "s", 19)], monkeypatch,
        ).collect()
        # '#'x5 + one non-overlapping '...' over 7 ws words
        assert r["symbol_word_ratio"] == pytest.approx(6 / 7)


class TestRepetitionSignals:
    """The synthetic corpus has zero duplicate-n-gram mass (its
    oracle-parity row proves only that both engines agree on zeros),
    so the coverage-union arithmetic is pinned here on crafted
    repetitive documents."""

    def _run(self, spark, rows, monkeypatch):
        from astra_perseverance_spark.extensions import corpus
        from astra_perseverance_spark.extensions.curation import (
            q_repetition_signals,
        )

        df = spark.createDataFrame(
            rows, "doc_id long, text string, lang string, "
                  "source string, n_chars long")
        monkeypatch.setattr(corpus, "clustered_docs", lambda s, d: df)
        return {r["doc_id"]: r for r in
                q_repetition_signals(spark, "unused://").collect()}

    def test_exact_fractions_on_crafted_docs(self, spark, monkeypatch):
        # doc 1: 'a b c d e' twice — 10 tokens.  5-grams at starts
        # 0..5; start 0 == start 5 (cnt 2), so the coverage union is
        # positions 0-4 ∪ 5-9 = ALL 10 → dup5_frac 1.0.  The single
        # 10-gram is unique → dup10_frac 0.  Modal 2-gram 'a b'
        # occurs twice → top2 = 2·2/10.
        d1 = "a b c d e a b c d e"
        # doc 2: no repeated n-gram of any n — all fractions at their
        # n/n_tokens floor (60 tokens keeps every floor under its
        # threshold; a SHORT unique doc fails top3/top4 on the floor
        # alone, faithfully to the paper where min-words filters
        # first)
        d2 = " ".join(f"w{i}" for i in range(60))
        # doc 3: 'x y' ×3 — 6 tokens; overlapping modal 2-gram 'x y'
        # at starts 0,2,4 → top2 = 3·2/6 = 1.0; no 5-gram repeats
        # (only 2 distinct 5-grams, each once)
        d3 = "x y x y x y"
        got = self._run(
            spark,
            [(1, d1, "en", "s", len(d1)), (2, d2, "en", "s", len(d2)),
             (3, d3, "en", "s", len(d3))],
            monkeypatch)

        r1 = got[1]
        assert r1["n_tokens"] == 10
        assert r1["top2_frac"] == pytest.approx(0.4)
        assert r1["top3_frac"] == pytest.approx(0.6)
        assert r1["top4_frac"] == pytest.approx(0.8)
        assert r1["dup5_frac"] == pytest.approx(1.0)
        assert r1["dup10_frac"] == pytest.approx(0.0)
        assert not r1["repetition_pass"]

        r2 = got[2]
        # every 2-gram unique → modal count 1 → top2 = 2/60
        assert r2["top2_frac"] == pytest.approx(2 / 60)
        assert r2["dup5_frac"] == 0.0 and r2["dup10_frac"] == 0.0
        assert r2["repetition_pass"]

        r3 = got[3]
        assert r3["top2_frac"] == pytest.approx(1.0)
        assert r3["dup5_frac"] == 0.0
        assert not r3["repetition_pass"]

    def test_random_docs_match_brute_force(self, spark, monkeypatch):
        """Seeded-random documents over a tiny alphabet (repetition
        everywhere, every n in play) must match an independent
        pure-Python reference exactly — fractions are integer/integer
        IEEE divisions, so equality is bitwise, not approximate."""
        import random
        from collections import Counter

        rng = random.Random(0xC0FFEE)
        alphabet = ["aa", "bb", "cc", "dd"]
        docs = []
        for i in range(40):
            toks = [rng.choice(alphabet)
                    for _ in range(rng.randrange(0, 26))]
            docs.append((i, " ".join(toks), "en", "s", 0))

        def ref(toks):
            nt = len(toks)
            out = {"n_tokens": nt}
            for n in (2, 3, 4):
                grams = [tuple(toks[i:i + n])
                         for i in range(max(nt - n + 1, 0))]
                top = max(Counter(grams).values(), default=0)
                out[f"top{n}_frac"] = top * n / nt if nt else 0.0
            for n in (5, 10):
                grams = [tuple(toks[i:i + n])
                         for i in range(max(nt - n + 1, 0))]
                c = Counter(grams)
                covered = set()
                for i, g in enumerate(grams):
                    if c[g] >= 2:
                        covered.update(range(i, i + n))
                out[f"dup{n}_frac"] = len(covered) / nt if nt else 0.0
            return out

        got = self._run(spark, docs, monkeypatch)
        assert set(got) == set(range(40))
        for i, text, *_ in docs:
            exp = ref(text.split())
            r = got[i]
            for k, v in exp.items():
                assert r[k] == v, (i, k, text)

    def test_short_and_empty_docs(self, spark, monkeypatch):
        """Docs shorter than n produce no n-grams (fractions 0, not
        NULL/NaN); a tokenless doc divides by nothing."""
        got = self._run(
            spark,
            [(1, "solo", "en", "s", 4), (2, "!!! ???", "en", "s", 7)],
            monkeypatch)
        for i, ntok in ((1, 1), (2, 0)):
            r = got[i]
            assert r["n_tokens"] == ntok
            for c in ("top2_frac", "top3_frac", "top4_frac",
                      "dup5_frac", "dup10_frac"):
                assert r[c] == 0.0, (i, c)
            assert r["repetition_pass"]


class TestPiiScan:
    def test_patterns_and_redaction(self, spark, monkeypatch):
        from astra_perseverance_spark.extensions.curation import q_pii_scan
        from pyspark.sql import functions as F

        text = ("contact bob.smith+x@example.co.uk or call +14155552671 "
                "from 10.0.0.1 twice 10.0.0.2")
        out = _run_on_docs(
            spark, q_pii_scan, [(1, text, "en", "s", len(text))],
            monkeypatch)
        [r] = out.collect()
        assert (r["n_email"], r["n_ipv4"], r["n_phone"]) == (1, 2, 1)
        assert r["pii_total"] == 4

    def test_redaction_digest_strips_every_match(self, spark, monkeypatch):
        """Redacting then rescanning must find zero PII — proves the
        digest is computed over genuinely clean text."""
        from astra_perseverance_spark.extensions.curation import (
            PII_EMAIL, PII_IPV4, PII_PHONE,
        )
        import re

        text = "a@b.io and 1.2.3.4 and +123456789"
        red = re.sub(PII_PHONE, "<PHONE>",
                     re.sub(PII_IPV4, "<IP>",
                            re.sub(PII_EMAIL, "<EMAIL>", text)))
        assert red == "<EMAIL> and <IP> and <PHONE>"
        for pat in (PII_EMAIL, PII_IPV4, PII_PHONE):
            assert not re.search(pat, red)

    def test_clean_text_digest_matches_raw_md5(self, spark, monkeypatch):
        from astra_perseverance_spark.extensions.curation import q_pii_scan
        import hashlib

        [r] = _run_on_docs(
            spark, q_pii_scan, [(7, "no pii here", "en", "s", 11)],
            monkeypatch).collect()
        assert r["pii_total"] == 0
        assert r["redacted_md5"] == hashlib.md5(b"no pii here").hexdigest()


class TestSourceMixQuotas:
    def test_quota_arithmetic_is_integer_exact(self, spark, monkeypatch):
        """3 sources with 100/25/4 docs: w = 10/5/2, tot = 17,
        quotas = floor(200*w/17) = 117/58/23 capped by rank."""
        from astra_perseverance_spark.extensions.curation import q_source_mix

        rows = (
            [(i, f"t{i}", "en", "big", 5) for i in range(100)]
            + [(100 + i, f"t{i}", "en", "mid", 5) for i in range(25)]
            + [(200 + i, f"t{i}", "en", "tiny", 5) for i in range(4)]
        )
        out = _run_on_docs(spark, q_source_mix, rows, monkeypatch)
        got = {(r["source"], r["quota"]) for r in out.collect()}
        quotas = dict(got)
        assert quotas == {"big": 117, "mid": 58, "tiny": 23}
        by_src = out.groupBy("source").count().collect()
        picked = {r["source"]: r["count"] for r in by_src}
        # a quota larger than the stratum takes the whole stratum
        assert picked == {"big": 100, "mid": 25, "tiny": 4}


class TestSourceCrossDup:
    def test_pair_arithmetic_on_planted_duplicates(self, spark,
                                                   monkeypatch):
        """Planted corpus: an exact triple spanning srcA (×2) and
        srcB, a near-dup (5/7 shingle Jaccard ≈ 0.714) in srcC, one
        unrelated doc.  Exact pair counts must follow the digest
        composition arithmetic (C(2,2·)=1 within srcA, 2·1=2 across
        A/B) and near pairs must re-key the verified Jaccard pair
        set."""
        from astra_perseverance_spark.extensions import curation, dedup

        text = "alpha beta gamma delta epsilon zeta eta theta"
        near = "alpha beta gamma delta epsilon zeta eta iota"
        rows = [
            (1, text, "en", "srcA", 1),
            (2, text, "en", "srcA", 1),
            (3, text, "en", "srcB", 1),
            (4, near, "en", "srcC", 1),
            (5, "completely different words entirely unrelated "
                "content sits here now", "en", "srcB", 1),
        ]
        df = spark.createDataFrame(
            rows, "doc_id long, text string, lang string, "
                  "source string, n_chars long")
        monkeypatch.setattr(curation, "_docs", lambda s, d: df)
        monkeypatch.setattr(dedup, "_docs", lambda s, d: df)
        monkeypatch.setattr(dedup, "_cdocs", lambda s, d: df)
        got = {
            (r["source_a"], r["source_b"]):
                (r["exact_pairs"], r["near_pairs"])
            for r in curation.q_source_cross_dup(
                spark, "unused://crossdup").collect()
        }
        assert got == {
            ("srcA", "srcA"): (1, 1),
            ("srcA", "srcB"): (2, 2),
            ("srcA", "srcC"): (0, 2),
            ("srcB", "srcC"): (0, 1),
        }


class TestDecontaminate:
    def test_planted_contamination_is_found(self, spark, monkeypatch):
        """A doc sharing a benchmark doc's text (plus noise) must be
        flagged; unrelated docs must not."""
        from astra_perseverance_spark.extensions import curation
        from astra_perseverance_spark.extensions.curation import (
            q_decontaminate,
        )

        base = "alpha beta gamma delta epsilon zeta eta theta"
        rows = [
            (1, base, "en", "s", len(base)),
            (2, base + " extra trailing words here", "en", "s", 40),
            (3, "totally unrelated content with other words entirely",
             "en", "s", 50),
        ]
        # shrink the panel so doc 1 can be the benchmark side
        monkeypatch.setattr(curation, "DECON_PANEL_K", 1)
        # capped_shingle_rows reads through docs_frame + memo — patch
        # the docs source both in curation and in dedup's shingle path
        from astra_perseverance_spark.extensions import dedup as ddp

        df = spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, "
                  "n_chars long")
        monkeypatch.setattr(curation, "_docs", lambda s, d: df)
        monkeypatch.setattr(ddp, "_docs", lambda s, d: df)
        # the shingle path reads through the inline-clustered seam
        monkeypatch.setattr(ddp, "_cdocs", lambda s, d: df)
        # bypass the memoized shingle frame (keyed by sf_dir, which is
        # fake here) by clearing session memos first
        from astra_perseverance_spark.conformed.model import release_memos

        release_memos(spark)
        out = q_decontaminate(spark, "unused-decon://").collect()
        release_memos(spark)
        flagged = {(r["doc_id"], r["bench_doc"]) for r in out}
        docs_flagged = {d for d, _ in flagged}
        assert docs_flagged <= {2, 3}
        assert 2 in docs_flagged  # shares >= 3 shingles with a panel doc
        assert 3 not in docs_flagged


class TestEmptyCorpus:
    """Operators must degrade to empty results on an empty corpus, not
    crash (first batch of a new pipeline, a filter that drops
    everything)."""

    @pytest.fixture()
    def empty_docs(self, spark, monkeypatch):
        from astra_perseverance_spark.extensions import (
            curation,
            dedup,
            pipeline,
            text_stats,
        )

        df = spark.createDataFrame(
            [], "doc_id long, text string, lang string, source string, "
                "n_chars long")
        from astra_perseverance_spark.extensions import prep, training

        for mod in (curation, dedup, pipeline, text_stats, prep):
            monkeypatch.setattr(mod, "_docs", lambda s, d: df)
        for mod in (dedup, text_stats, training):
            monkeypatch.setattr(mod, "_cdocs", lambda s, d: df)
        monkeypatch.setattr(training, "n_docs", lambda s, d: 0)
        vdf = spark.createDataFrame(
            [], "vec_id long, label string, eq array<bigint>, n2 long")
        monkeypatch.setattr(training, "vectors_frame", lambda s, d: vdf)
        from astra_perseverance_spark.conformed.model import release_memos

        release_memos(spark)
        yield df
        release_memos(spark)

    @pytest.mark.parametrize("qname", [
        "dedup_exact", "dedup_tokenset", "quality_signals", "pii_scan",
        "source_mix", "quality_filter", "text_stats", "vocab_top_terms",
        "doc_chunks", "html_extract", "script_profile", "repeated_lines",
        "token_rarity", "corpus_curate",
        "dup_spans", "seq_pack", "embedding_quantize", "bpe_merges",
        "bpe_token_count", "dedup_span_trim", "source_cross_dup",
    ])
    def test_runs_empty(self, spark, empty_docs, qname):
        from astra_perseverance_spark.queries import QUERY_REGISTRY

        assert QUERY_REGISTRY[qname](spark, "empty-test://") \
            .collect() == []
