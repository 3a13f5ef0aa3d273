"""Cross-engine parity beyond the ASCII fixtures: the driver's corpus
is ASCII-heavy, so the Spark-vs-DuckDB hash gate never stresses the
codepoint-sensitive operators (ascii()/length()/char classes) with
real multibyte text.  This suite writes a small unicode corpus to
parquet and runs selected registered queries on BOTH engines over it.

Also property-checks the Mersenne-split digest recombination that
``doc_fingerprint`` uses to avoid BIGINT overflow (pure integer math,
no Spark needed).
"""

from __future__ import annotations

import math

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

UNI_ROWS = [
    (1, "你好世界 hello world 你好", "zh", "web", 20),
    (2, "Привет мир   привет снова и снова мир", "ru", "web", 37),
    (3, "mixed 你好 Привет hello 123 !!!", "en", "web", 29),
    (4, "naïve café résumé — em-dash ünïcödé", "fr", "web", 35),
    (5, "plain ascii words only here repeated words only here", "en",
     "books", 52),
    (6, "你好世界 hello world 你好", "zh", "books", 20),  # exact dup of 1
]


@pytest.fixture(scope="module")
def uni_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("uni_corpus")
    df = spark.createDataFrame(
        UNI_ROWS, "doc_id long, text string, lang string, source string, "
                  "n_chars long")
    df.coalesce(1).write.mode("overwrite").parquet(
        str(d / "documents.parquet"))
    return str(d)


def _oracle(sql: str, uni_dir: str):
    con = duckdb.connect()
    # Spark writes the table as a directory of part files
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"'{uni_dir}/documents.parquet/*.parquet'")
    return con.sql(sql).df()


def _canon(rows, cols):
    out = []
    for r in rows:
        vals = []
        for c in sorted(cols):
            v = r[c]
            if isinstance(v, float):
                vals.append(f"{v:.9f}")
            else:
                vals.append(str(v))
        out.append("|".join(vals))
    return sorted(out)


@pytest.mark.parametrize("qname", [
    "script_profile", "doc_fingerprint", "lang_id", "text_stats",
    "token_count", "dedup_exact", "html_extract", "doc_chunks",
    "repeated_lines",
])
def test_unicode_corpus_parity(spark, uni_dir, qname):
    from astra_perseverance_spark.conformed.model import release_memos
    from astra_perseverance_spark.oracle import ORACLE_SQL
    from astra_perseverance_spark.queries import QUERY_REGISTRY

    release_memos(spark)
    try:
        got = QUERY_REGISTRY[qname](spark, uni_dir).collect()
        want = _oracle(ORACLE_SQL[qname], uni_dir)
        cols = list(want.columns)
        # to_dict keeps per-column dtypes (iterrows would upcast a
        # mixed row to all-float)
        assert _canon(got, cols) == _canon(
            want.to_dict("records"), cols), qname
    finally:
        release_memos(spark)


def test_script_profile_sees_cjk_and_cyrillic(spark, uni_dir):
    from astra_perseverance_spark.conformed.model import release_memos
    from astra_perseverance_spark.queries import QUERY_REGISTRY

    release_memos(spark)
    rows = {r["doc_id"]: r
            for r in QUERY_REGISTRY["script_profile"](spark, uni_dir)
            .collect()}
    release_memos(spark)
    assert rows[1]["cjk_frac"] > 0.2
    assert rows[2]["cyrillic_frac"] > 0.5
    assert rows[2]["dominant"] == "cyrillic"
    assert rows[5]["dominant"] == "latin"


# --- Mersenne-split digest recombination (doc_fingerprint) ----------

M = (1 << 61) - 1


def _digest_via_split(values: list[int]) -> int:
    """The exact expression doc_fingerprint's aggregate computes:
    per-value hi/lo split sums, mod-reduced, recombined with the
    2^61 ≡ 1 identity."""
    sh = sum(v >> 31 for v in values) % M
    sl = sum(v & ((1 << 31) - 1) for v in values) % M
    hi_part = (sh >> 30) + ((sh & ((1 << 30) - 1)) << 31)
    return (hi_part + sl) % M


@given(st.lists(st.integers(min_value=0, max_value=M - 1),
                min_size=0, max_size=2000))
@settings(max_examples=300, deadline=None)
def test_mersenne_split_digest_equals_plain_sum_mod(values):
    assert _digest_via_split(values) == sum(values) % M
    # and every intermediate stays within signed 64-bit range for the
    # corpus sizes the aggregate can see (n < 2^32 values per doc)
    sh = sum(v >> 31 for v in values) % M
    hi_part = (sh >> 30) + ((sh & ((1 << 30) - 1)) << 31)
    assert hi_part + sum(v & ((1 << 31) - 1) for v in values) % M \
        < (1 << 63)
