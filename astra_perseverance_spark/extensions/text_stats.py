"""Text analysis over ``documents``: quality stats, language ID,
token counting, winnowing fingerprints.

All pure column expressions (JVM-side, whole-stage codegen) — one
narrow projection pass over the corpus, no shuffle except the final
``orderBy``.  Ratios divide exactly once after integer counting so the
DuckDB twins agree bitwise.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from astra_perseverance_spark.functions.texthash import (
    FP_BASE,
    FP_GRAM,
    FP_MOD,
    FP_WINDOW,
    tokens,
)

# Stopword profiles for the n-gram-free language-ID heuristic.  Scores
# are stopword *hits* (distinct-token intersections); the winner is
# argmax with deterministic tie-break by profile order below.
LANG_PROFILES: list[tuple[str, tuple[str, ...]]] = [
    ("en", ("the", "a", "of", "and", "to", "in", "is")),
    ("es", ("el", "la", "de", "que", "y", "en", "un")),
    ("fr", ("le", "la", "de", "et", "les", "des", "un")),
    ("de", ("der", "die", "das", "und", "ist", "von", "ein")),
    ("zh", ("de0", "shi4", "le0", "zai4", "he2", "you3", "wo3")),
]

STOPWORDS_EN = LANG_PROFILES[0][1]


from astra_perseverance_spark.extensions.corpus import docs_frame as _docs


def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality features + a composite quality score.

    Counts are exact integers; each ratio is one double division; the
    quality score is a fixed expression over those ratios (mirrored
    verbatim in SQL), so parity is bitwise."""
    return text_stats_frame(spark, sf_dir).orderBy("doc_id")


def text_stats_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unordered per-document quality-feature frame — shared by
    ``q_text_stats`` and the downstream quality-filter pipeline
    (``extensions.pipeline.q_quality_filter``)."""
    d = _docs(spark, sf_dir).select(
        "doc_id", "lang", "source", "n_chars", tokens("text").alias("toks"),
        F.length(F.regexp_replace("text", r"[A-Za-z0-9\s]", "")).alias("n_punct"),
    )
    n_tok = F.size("toks")
    n_stop = F.size(F.array_intersect(
        F.array_distinct("toks"), F.array(*[F.lit(s) for s in STOPWORDS_EN])
    ))
    d = d.select(
        "doc_id", "lang", "source",
        F.col("n_chars").cast("long").alias("n_chars"),
        n_tok.cast("long").alias("n_tokens"),
        F.size(F.array_distinct("toks")).cast("long").alias("n_distinct_tokens"),
        (F.aggregate("toks", F.lit(0).cast("long"), lambda a, t: a + F.length(t))
         .cast("double") / n_tok).alias("avg_token_len"),
        (n_stop.cast("double") / F.size(F.array_distinct("toks"))).alias("stopword_ratio"),
        (F.col("n_punct").cast("double") / F.col("n_chars")).alias("punct_ratio"),
        (F.size(F.array_distinct("toks")).cast("double") / n_tok).alias("ttr"),
    )
    quality = (
        F.least(F.col("n_tokens").cast("double") / 100.0, F.lit(1.0))
        * (1.0 - F.col("punct_ratio"))
        * F.col("ttr")
    )
    return d.withColumn("quality", quality)


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-profile language ID vs the labeled ``lang`` column.

    Deterministic argmax: strictly-greater comparison in profile list
    order (ties keep the earlier profile)."""
    d = _docs(spark, sf_dir).select(
        "doc_id", "lang", F.array_distinct(tokens("text")).alias("dt")
    )
    scores = [
        F.size(F.array_intersect("dt", F.array(*[F.lit(s) for s in prof])))
        .alias(f"s_{lang}")
        for lang, prof in LANG_PROFILES
    ]
    d = d.select("doc_id", "lang", *scores)

    pred: Column = F.lit(LANG_PROFILES[0][0])
    best: Column = F.col(f"s_{LANG_PROFILES[0][0]}")
    for lang, _ in LANG_PROFILES[1:]:
        cur = F.col(f"s_{lang}")
        pred = F.when(cur > best, F.lit(lang)).otherwise(pred)
        best = F.when(cur > best, cur).otherwise(best)
    return (
        d.select(
            "doc_id", "lang", pred.alias("pred_lang"), best.cast("long").alias("score"),
            (pred == F.col("lang")).cast("int").alias("is_match"),
        )
        .orderBy("doc_id")
    )


def q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace + BPE-ish token counting.

    ``n_bpe_units`` approximates a byte-pair-encoded length as
    Σ ceil(len(token)/4) — the standard ~4-chars-per-token heuristic —
    computed with integer arithmetic ((len+3) div 4)."""
    d = _docs(spark, sf_dir).select(
        "doc_id", "n_chars", tokens("text").alias("toks")
    )
    return d.select(
        "doc_id",
        F.size("toks").cast("long").alias("n_ws_tokens"),
        F.aggregate(
            "toks", F.lit(0).cast("long"),
            lambda a, t: a + F.floor((F.length(t) + 3) / 4).cast("long"),
        ).alias("n_bpe_units"),
        (F.col("n_chars").cast("double") / F.size("toks")).alias("chars_per_token"),
    ).orderBy("doc_id")


def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing document fingerprint (rolling char-gram hashes).

    Pipeline per doc: normalize → 5-char-gram polynomial rolling hash
    (base 257 mod 2^61-1, exact BIGINT) → per-window (w=8) minimum →
    distinct window-mins = the fingerprint set.  Emitted as the set
    size, the set minimum, and an order-independent set digest
    (sum mod 2^61-1) — all exact integers."""
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    d = _docs(spark, sf_dir).select("doc_id", norm.alias("nt"))
    n_grams = F.length("nt") - (FP_GRAM - 1)
    # gram hash at 0-based position p over a precomputed ASCII-code
    # array (one split pass instead of O(len·gram) substr calls):
    # Σ_k codes[p+k] * BASE^(GRAM-1-k) mod M
    powers = [FP_BASE ** (FP_GRAM - 1 - k) % FP_MOD for k in range(FP_GRAM)]
    gram_terms = " + ".join(
        f"cs[p + {k}] * {powers[k]}L" for k in range(FP_GRAM)
    )
    # Each stage is its own projection so the expensive HOF arrays
    # (cs → gh → fps) are evaluated ONCE per row — Catalyst keeps the
    # projections separate because the aliases are non-cheap and
    # multiply-referenced (inlining fps into all three outputs
    # measured 2× slower; HOF lambdas run interpreted, so there is no
    # codegen CSE to fall back on).
    d = (
        d.filter(n_grams >= FP_WINDOW)
        .select(
            "doc_id",
            # slice() drops the trailing empty token Java's split
            # emits with limit -1
            F.expr("transform(slice(split(nt, ''), 1, length(nt)), "
                   "c -> cast(ascii(c) as bigint))")
            .alias("cs"),
        )
        .select(
            "doc_id",
            F.expr(
                f"transform(sequence(0, size(cs) - {FP_GRAM}), "
                f"p -> ({gram_terms}) % {FP_MOD}L)"
            ).alias("gh"),
        )
        .select(
            "doc_id",
            F.expr(
                f"array_distinct(transform(sequence(1, size(gh) - {FP_WINDOW - 1}), "
                f"w -> array_min(slice(gh, w, {FP_WINDOW}))))"
            ).alias("fps"),
        )
    )
    return d.select(
        "doc_id",
        F.size("fps").cast("long").alias("n_fps"),
        F.array_min("fps").alias("min_fp"),
        F.expr(
            f"aggregate(fps, 0L, (a, x) -> (a + x) % {FP_MOD}L)"
        ).alias("fp_digest"),
    ).orderBy("doc_id")
