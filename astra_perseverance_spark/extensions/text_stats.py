"""Text analysis over ``documents``: quality stats, language ID,
token counting, winnowing fingerprints.

All pure column expressions (JVM-side, whole-stage codegen) — one
narrow projection pass over the corpus, no shuffle except the final
``orderBy``.  Ratios divide exactly once after integer counting so the
DuckDB twins agree bitwise.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
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


from astra_perseverance_spark.extensions.corpus import clustered_docs as _cdocs
from astra_perseverance_spark.extensions.corpus import docs_frame as _docs


def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality features + a composite quality score.

    Counts are exact integers; each ratio is one double division; the
    quality score is a fixed expression over those ratios (mirrored
    verbatim in SQL), so parity is bitwise."""
    return text_stats_frame(spark, sf_dir).orderBy("doc_id")


def _sdiv(num: Column, den: Column) -> Column:
    """Declared ratio semantics for degenerate documents: a ratio with
    a zero denominator (no extractable tokens / empty text) is 0.0 —
    NOT an error and NOT NULL.  Spark 4 runs ANSI mode, where a plain
    division throws DIVIDE_BY_ZERO; an all-non-Latin document has zero
    ``[a-z0-9]`` tokens, so without the guard ``text_stats`` crashes
    on real multilingual corpora (caught by
    ``tests/test_unicode_parity.py``).  Mirrored as CASE WHEN in every
    oracle twin, and it makes zero-token docs bottom out at
    quality = 0 — exactly what the downstream filter should see."""
    return F.when(den != 0, num / den).otherwise(F.lit(0.0))


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
        _sdiv(
            F.aggregate("toks", F.lit(0).cast("long"),
                        lambda a, t: a + F.length(t)).cast("double"),
            n_tok,
        ).alias("avg_token_len"),
        _sdiv(n_stop.cast("double"), F.size(F.array_distinct("toks")))
        .alias("stopword_ratio"),
        _sdiv(F.col("n_punct").cast("double"), F.col("n_chars"))
        .alias("punct_ratio"),
        _sdiv(F.size(F.array_distinct("toks")).cast("double"), n_tok)
        .alias("ttr"),
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
        _sdiv(F.col("n_chars").cast("double"), F.size("toks"))
        .alias("chars_per_token"),
    ).orderBy("doc_id")


def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing document fingerprint (rolling char-gram hashes).

    Pipeline per doc: normalize → 5-char-gram polynomial rolling hash
    (base 257 mod 2^61-1, exact BIGINT) → per-window (w=8) minimum →
    distinct window-mins = the fingerprint set.  Emitted as the set
    size, the set minimum, and an order-independent set digest
    (sum mod 2^61-1) — all exact integers.

    ROW pipeline, not HOF arrays (r4 scale fix): posexplode the chars,
    build the gram hash from ``lead`` columns, take the window minimum
    over a row frame, then aggregate the distinct minima — the same
    posexplode + window shape as ``dedup.k_gram_rows``, which measured
    ~4× faster than the interpreted HOF-lambda formulation (HOF lambdas
    never enter whole-stage codegen; the prior array build probed 9.9×
    wall at 8× corpus).  Every stage here is either codegen'd
    projection or JVM window exec, and all windows share the one
    (doc_id)-partitioned sort.

    Shuffle discipline: the repartition-by-doc_id happens on the DOC
    grain, BEFORE the per-char explode, in the same query plan — so
    the one exchange carries ~1× corpus bytes and every later stage
    (generate → sort → two windows → distinct → agg) is
    partition-local.  Going through the session-cached ``docs_frame``
    would instead re-exchange at the CHAR grain (~24× corpus bytes):
    the cache's AQE-planned relation hides its output partitioning, so
    the window must re-shuffle whatever grain it is handed.  With a
    doc_id-bucketed warehouse source the remaining exchange disappears
    entirely (see ``sinks/warehouse.py``).

    Digest arithmetic: the oracle computes ``sum(fps) % M`` in HUGEINT;
    a Spark SUM over raw 61-bit values would overflow BIGINT, so each
    value is split as x = hi·2^31 + lo (hi < 2^30, lo < 2^31), hi/lo
    summed separately (no overflow below 2^32 fingerprints per doc),
    and recombined mod M = 2^61−1 using the Mersenne identity
    2^61 ≡ 1 (mod M): a·2^31 ≡ (a >> 30) + ((a & (2^30−1)) << 31),
    every intermediate < 2^63.  Exactly equal to sum-then-mod."""
    from astra_perseverance_spark.extensions.dedup import normalized_text

    # the ONE normalization definition (dedup.normalized_text) — a
    # second inline copy could silently drift from the digest path
    norm = normalized_text()
    n_grams = F.length("nt") - (FP_GRAM - 1)
    # Deliberately NOT the cached docs_frame: repartition on the doc
    # grain inside this plan so the downstream windows inherit the
    # partitioning (see docstring).  The scan reads only (doc_id, text)
    # with the length filter pushed below the exchange.
    d = (
        _cdocs(spark, sf_dir)
        .select("doc_id", norm.alias("nt"))
        .filter(n_grams >= FP_WINDOW)
    )
    # One row per char: slice() drops the trailing empty token Java's
    # split emits with limit -1.
    chars = d.select(
        "doc_id",
        F.posexplode(F.expr("slice(split(nt, ''), 1, length(nt))"))
        .alias("p", "c"),
    ).select("doc_id", "p", F.ascii("c").cast("long").alias("code"))
    # Gram hash at position p: Σ_k code[p+k] * BASE^(GRAM-1-k) mod M.
    # codes < 2^21 (codepoints) × BASE^4 ≈ 2^32 → each term < 2^53,
    # 5-term sum < 2^56: exact BIGINT, one mod at the end (identical
    # arithmetic shape to the oracle's array formulation).
    w = Window.partitionBy("doc_id").orderBy("p")
    powers = [FP_BASE ** (FP_GRAM - 1 - k) % FP_MOD for k in range(FP_GRAM)]
    term0 = F.col("code") * F.lit(powers[0])
    terms = sum(
        (F.lead("code", k).over(w) * F.lit(powers[k]) for k in range(1, FP_GRAM)),
        start=term0,
    )
    # The last GRAM-1 positions have a null lead ⇒ null gh: drop them.
    grams = chars.select(
        "doc_id", "p", (terms % F.lit(FP_MOD)).alias("gh")
    ).filter(F.col("gh").isNotNull())
    # Window minimum over the FP_WINDOW following gram rows; a row is a
    # valid window start only if the full window exists (the
    # (W-1)-ahead gram is present).
    wmins = (
        grams.select(
            "doc_id",
            F.min("gh").over(w.rowsBetween(0, FP_WINDOW - 1)).alias("wmin"),
            F.lead("gh", FP_WINDOW - 1).over(w).alias("_tail"),
        )
        .filter(F.col("_tail").isNotNull())
        .select("doc_id", "wmin")
        .distinct()
    )
    lo_mask = (1 << 31) - 1
    agg = wmins.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_fps"),
        F.min("wmin").alias("min_fp"),
        (F.sum(F.shiftright("wmin", 31)) % F.lit(FP_MOD)).alias("sh"),
        (F.sum(F.col("wmin").bitwiseAND(F.lit(lo_mask))) % F.lit(FP_MOD))
        .alias("sl"),
    )
    # digest = (sh·2^31 + sl) mod M via the Mersenne split of sh.
    hi_part = F.shiftright("sh", 30) + F.shiftleft(
        F.col("sh").bitwiseAND(F.lit((1 << 30) - 1)), 31
    )
    return agg.select(
        "doc_id", "n_fps", "min_fp",
        ((hi_part + F.col("sl")) % F.lit(FP_MOD)).alias("fp_digest"),
    ).orderBy("doc_id")
