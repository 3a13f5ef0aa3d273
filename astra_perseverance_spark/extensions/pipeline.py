"""Corpus-pipeline operators: vocabulary heavy hitters, TF-IDF term
ranking, deterministic stratified sampling, and the end-of-pipeline
quality filter.

These are the steps a training-data pipeline runs *after* the
per-document analyses (``text_stats``) and dedup passes: build the
vocabulary, rank salient terms, carve reproducible samples, and emit
the reject list with reasons.

Scale shape (the 100 TB contract):

- Vocabulary/DF counting aggregates (term)-keyed with map-side
  partial aggregation — the shuffle carries (term, partial-count)
  rows, never documents.  Top-k per language runs on the *aggregated*
  vocabulary (orders of magnitude smaller than the corpus), so the
  per-language window is cheap; at extreme vocabulary sizes swap in a
  two-phase partial top-k without changing the query surface.
- TF-IDF joins the per-(doc, term) TF frame to the per-term DF frame
  keyed by term — a uniform-key shuffle join (term frequencies are
  Zipfian but the DF side is one row per term, so no skewed
  multiplicity).  The top-k window partitions by doc_id — uniform.
- Sampling is a pure narrow filter (hash of the key against a
  threshold) — no shuffle, reproducible across runs/engines,
  stratification implicit because the hash is uniform within every
  stratum.
- The quality filter is one narrow projection over the stats frame
  plus one digest-keyed equi-join for the exact-dup rule.

All arithmetic is exact-integer counting followed by single IEEE
double divisions, so the DuckDB twins (``oracle.ext_sqls``) match
bitwise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from astra_perseverance_spark.extensions.corpus import docs_frame as _docs
from astra_perseverance_spark.extensions.dedup import content_digest_frame
from astra_perseverance_spark.extensions.text_stats import text_stats_frame
from astra_perseverance_spark.functions.ordering import report_sorted, salted_topk
from astra_perseverance_spark.functions.texthash import h15, tokens

# Vocabulary: top terms per language by document frequency.
VOCAB_TOP_K = 20
# TF-IDF: top terms per document.
TFIDF_TOP_K = 5
# Stratified sample: keep doc when h15(doc_id) % SAMPLE_MOD == 0.
SAMPLE_MOD = 10
# Quality-filter thresholds.
QF_MIN_TOKENS = 10
QF_MIN_TTR = 0.30
QF_MAX_PUNCT = 0.20
# n-gram language-model counts: top bigrams per language.
NGRAM_TOP_K = 50
# Fixed-size stratified sample: docs kept per language.
SAMPLE_PER_STRATUM = 25
# Vocabulary growth curve: number of hash-random corpus increments.
GROWTH_BUCKETS = 16


def q_vocab_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language vocabulary heavy hitters: the ``VOCAB_TOP_K``
    terms with the highest document frequency (ties → term ASC).

    DF counts each document once per term (distinct tokens per doc),
    so a term repeated 1000× in one spammy doc scores 1.

    Top-k is the exact two-phase ``salted_topk`` — a plain
    per-language window is one reducer task per language, a skew wall
    when the vocabulary is large and languages are few."""
    dt = _docs(spark, sf_dir).select(
        "doc_id", "lang",
        F.explode(F.array_distinct(tokens("text"))).alias("term"),
    )
    df_counts = dt.groupBy("lang", "term").agg(
        F.count("*").cast("long").alias("df_docs")
    )
    return (
        salted_topk(df_counts, ["lang"], [F.desc("df_docs"), "term"],
                    VOCAB_TOP_K, salt_on="term")
        .select("lang", "rank", "term", "df_docs")
        .transform(report_sorted("lang", "rank"))
    )


def q_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary growth curve — the Heaps-law observable a tokenizer
    budget is sized from: partition the corpus into ``GROWTH_BUCKETS``
    deterministic hash-random increments and report, per increment,
    how many documents it adds and how many NEVER-SEEN-BEFORE terms it
    introduces, plus the running totals (cum_docs, vocab_size).  A
    vocab_size column still climbing steeply at the last bucket means
    the corpus has not saturated its vocabulary — sampling more data
    will keep growing the tokenizer's effective term space.

    Hash-random increments (``h15(doc_id) % B``), not doc_id ranges:
    growth curves assume exchangeable arrival order, and the hash
    rule is reproducible on both engines and at any scale without a
    global sort.

    Scale shape: the heavy stage is the one token explode into a
    term-grain MIN aggregation (map-side partial combine — a term
    repeated a billion times still ships one (term, min_bucket) row
    per map partition); everything after is bucket-grain (exactly
    ≤ ``GROWTH_BUCKETS`` rows), so the cumulative window's single
    task is bounded by construction, like the engine's other
    topology-bounded report sorts.

    Output: (bucket, n_docs, new_terms, cum_docs, vocab_size),
    ordered by bucket."""
    d = _docs(spark, sf_dir).select(
        F.pmod(h15(F.col("doc_id").cast("string")),
               F.lit(GROWTH_BUCKETS)).cast("int").alias("bucket"),
        tokens("text").alias("t"),
    )
    docs_per = d.groupBy("bucket").agg(
        F.count("*").cast("long").alias("n_docs"))
    first = (
        d.select("bucket", F.explode(F.array_distinct("t")).alias("term"))
        .groupBy("term")
        .agg(F.min("bucket").alias("bucket"))
    )
    new_terms = first.groupBy("bucket").agg(
        F.count("*").cast("long").alias("new_terms"))
    w = (
        Window.orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    from astra_perseverance_spark.functions.bounded import (
        bounded_global_frame,
    )

    return (
        bounded_global_frame(
            docs_per.join(new_terms, "bucket", "left"),
            GROWTH_BUCKETS,
            "vocab_growth bucket frame (≤ GROWTH_BUCKETS)",
        )
        .select(
            "bucket", "n_docs",
            F.coalesce("new_terms", F.lit(0).cast("long"))
            .alias("new_terms"),
        )
        .withColumn("cum_docs", F.sum("n_docs").over(w).cast("long"))
        .withColumn("vocab_size", F.sum("new_terms").over(w).cast("long"))
        .orderBy("bucket")
    )


def q_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-``TFIDF_TOP_K`` terms by a rational TF-IDF
    score: ``score = tf * n_docs / df`` (one double multiply + one
    divide over exact integers — bitwise-deterministic, unlike a
    log-based idf whose last ulp depends on the platform libm; the
    ranking it induces per document is identical to tf·(n/df) under
    any monotone transform).  Ties → term ASC."""
    toks = _docs(spark, sf_dir).select(
        "doc_id", F.explode(tokens("text")).alias("term")
    )
    tf = toks.groupBy("doc_id", "term").agg(
        F.count("*").cast("long").alias("tf")
    )
    df_counts = tf.groupBy("term").agg(
        F.count("*").cast("long").alias("df_docs")
    )
    n_docs = _docs(spark, sf_dir).agg(
        F.count("*").cast("long").alias("n_docs")
    )
    scored = (
        tf.join(df_counts, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id", "term", "tf", "df_docs",
            (F.col("tf").cast("double") * F.col("n_docs") / F.col("df_docs"))
            .alias("score"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), "term")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TFIDF_TOP_K)
        .select("doc_id", "rank", "term", "tf", "df_docs", "score")
        .orderBy("doc_id", "rank")
    )


def q_corpus_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~10% corpus sample: keep a doc when the md5-based
    ``h15`` of its id taken mod ``SAMPLE_MOD`` is 0.

    Hash-based (not ``rand()``-based) so the sample is reproducible
    across runs, engines, and cluster layouts, and composable —
    re-running at a different rate yields a superset/subset.  The
    hash is uniform within every language/source stratum, so the
    sample is stratified without a per-stratum pass.  Narrow filter:
    no shuffle except the output ordering."""
    return (
        _docs(spark, sf_dir)
        .filter(h15(F.col("doc_id").cast("string")) % SAMPLE_MOD == 0)
        .select("doc_id", "lang", "source", "n_chars")
        .orderBy("doc_id")
    )


def q_ngram_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language bigram language-model counts: the ``NGRAM_TOP_K``
    most frequent token bigrams per language with their corpus
    occurrence counts (every occurrence counts, unlike the
    document-frequency vocabulary).  Ties → bigram ASC.

    Gram rows come from the shared ``dedup.k_gram_rows`` pipeline
    (posexplode + ``lead`` window — codegen'd, ~4× the interpreted
    HOF-array formulation); the shuffle after the window is
    (lang, bigram)-keyed with map-side partial aggregation, so it
    carries (bigram, partial-count) rows, never token streams.  The
    top-k runs on the aggregated bigram table."""
    from astra_perseverance_spark.extensions.dedup import k_gram_rows

    grams = k_gram_rows(spark, sf_dir, 2).select(
        "lang", F.col("g").alias("bigram")
    )
    counts = grams.groupBy("lang", "bigram").agg(
        F.count("*").cast("long").alias("n")
    )
    return (
        salted_topk(counts, ["lang"], [F.desc("n"), "bigram"],
                    NGRAM_TOP_K, salt_on="bigram")
        .select("lang", "rank", "bigram", "n")
        .transform(report_sorted("lang", "rank"))
    )


def q_corpus_sample_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size stratified sample: exactly ``SAMPLE_PER_STRATUM``
    docs per language (fewer only if the stratum is smaller), chosen
    by hash order — the deterministic, distributed equivalent of
    per-stratum reservoir sampling.

    Ordering docs by ``(h15(doc_id), doc_id)`` within each stratum is
    a uniform random permutation fixed by the hash, so the first k
    are an unbiased sample, reproducible across runs/engines, and
    growing k only ever *extends* the sample.  Selection is the exact
    two-phase ``salted_topk`` — strata are few (languages), so a
    plain per-stratum window would sort each stratum's full corpus in
    one task."""
    picked = salted_topk(
        _docs(spark, sf_dir).select("doc_id", "lang"),
        ["lang"],
        [h15(F.col("doc_id").cast("string")), "doc_id"],
        SAMPLE_PER_STRATUM,
        salt_on="doc_id",
    )
    return (
        picked.withColumnRenamed("rank", "pick")
        .select("lang", "pick", "doc_id")
        .transform(report_sorted("lang", "pick"))
    )


def q_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-of-pipeline reject list: every document failing at least
    one keep rule, with the semicolon-joined reason list (fixed rule
    order: too_short; low_ttr; high_punct; exact_dup).

    exact_dup rejects every non-representative member of an
    exact-content group (the group's minimum doc_id is kept)."""
    stats = text_stats_frame(spark, sf_dir).select(
        "doc_id", "n_tokens", "ttr", "punct_ratio"
    )
    d = content_digest_frame(spark, sf_dir)
    rep = d.groupBy("content_md5").agg(F.min("doc_id").alias("rep_doc"))
    dup = d.join(rep, "content_md5").select(
        "doc_id", (F.col("doc_id") > F.col("rep_doc")).alias("is_dup")
    )
    flagged = stats.join(dup, "doc_id").select(
        "doc_id",
        F.concat_ws(
            ";",
            F.when(F.col("n_tokens") < QF_MIN_TOKENS, F.lit("too_short")),
            F.when(F.col("ttr") < QF_MIN_TTR, F.lit("low_ttr")),
            F.when(F.col("punct_ratio") > QF_MAX_PUNCT, F.lit("high_punct")),
            F.when(F.col("is_dup"), F.lit("exact_dup")),
        ).alias("reasons"),
    )
    return (
        flagged.filter(F.col("reasons") != "")
        .orderBy("doc_id")
    )


def q_doc_digest_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents ⋈ per-doc content digest on doc_id — the warehouse
    co-location showcase, and the access pattern every downstream
    curation join repeats (attach a persisted per-doc artifact back to
    the corpus by doc_id).

    Default mode computes the digest inline (one md5 pass over the
    memoized corpus).  With the bucketed warehouse opt-in
    (``corpus.BUCKETED_DB_ENV``) both sides read doc_id-bucketed
    tables and the join plans bucket-local: the ONLY Exchange in the
    whole plan is the final ORDER BY's range partitioning
    (``tests/test_warehouse.py`` gates exactly that).  At 100 TB this
    is the difference between re-shuffling the corpus per join and
    never shuffling it after ingest."""
    d = _docs(spark, sf_dir).select("doc_id", "lang", "source")
    dig = content_digest_frame(spark, sf_dir)
    return (
        d.join(dig, "doc_id")
        .select("doc_id", "lang", "source", "content_md5")
        .orderBy("doc_id")
    )


def q_corpus_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus composition rollup: document counts, character volume,
    and whitespace-token volume at every (lang × source) grouping
    level — the A9 GROUPING SETS shape (reference gc rollup) applied
    to the corpus, i.e. the table a mixing/reporting stage reads.

    ``cube(lang, source)`` gives the four levels in ONE fact scan
    with map-side partial aggregation.  The level tag comes from
    per-column ``GROUPING()`` bits (portable: both engines define
    GROUPING(col) = 1 iff the column is rolled up in that row) —
    NOT from NULL patterns, which would misclassify a genuinely NULL
    lang/source detail group as its subtotal.  Rolled-up keys render
    as 'ALL'; a real NULL detail value stays NULL, so the two can
    never collide.  Sums are exact integers."""
    d = _docs(spark, sf_dir).select(
        "lang", "source",
        F.col("n_chars").cast("long").alias("nc"),
        F.size(F.split(F.trim("text"), r"\s+")).cast("long").alias("nw"),
    )
    agg = d.cube("lang", "source").agg(
        F.grouping("lang").cast("int").alias("g_lang"),
        F.grouping("source").cast("int").alias("g_source"),
        F.count("*").cast("long").alias("n_docs"),
        F.sum("nc").cast("long").alias("total_chars"),
        F.sum("nw").cast("long").alias("total_ws_tokens"),
    )
    return (
        agg.select(
            (F.col("g_lang") * 2 + F.col("g_source")).cast("int")
            .alias("lvl"),
            F.when(F.col("g_lang") == 1, F.lit("ALL"))
            .otherwise(F.col("lang")).alias("lang"),
            F.when(F.col("g_source") == 1, F.lit("ALL"))
            .otherwise(F.col("source")).alias("source"),
            "n_docs", "total_chars", "total_ws_tokens",
        )
        .orderBy("lvl", "lang", "source")
    )
