"""Corpus-curation operators: published quality heuristics, PII
scanning/redaction, benchmark decontamination, and temperature-based
source mixing — the filtering/curation passes a training-data pipeline
runs between raw ingestion and the final mix.

Scale shape (the 100 TB contract):

- ``quality_signals`` and ``pii_scan`` are pure per-row projections
  (JVM regex + higher-order array functions; no UDFs, no shuffle
  beyond the report ordering) — embarrassingly parallel.
- ``decontaminate`` joins the corpus' capped shingle postings against
  a FIXED-SIZE benchmark panel's shingles.  The panel side is bounded
  (panel_k docs × capped shingles/doc), so it broadcasts: the corpus
  scan never shuffles, and per-(doc, bench) overlap counting
  aggregates map-side.  Work is O(|corpus postings|) regardless of
  corpus size — the published decontamination shape (exact n-gram
  collision against held-out eval sets).
- ``source_mix`` computes per-source quotas from an aggregate
  (source-grain, tiny, broadcast back) and picks documents by hash
  order via the exact two-phase salted top-k — no per-source
  single-reducer sort, reproducible across runs/engines.

Cross-engine determinism: counts are exact integers; each ratio is a
single IEEE division; source-mix weights use floor(sqrt(n)) —
correctly-rounded sqrt is engine-identical — and integer division for
quotas, so the DuckDB twins (``oracle.ext_sqls``) match bitwise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from astra_perseverance_spark.extensions.corpus import docs_frame as _docs
from astra_perseverance_spark.extensions.dedup import capped_shingle_rows
from astra_perseverance_spark.functions.ordering import salted_topk
from astra_perseverance_spark.functions.texthash import h15

# Gopher-style repetition/format bounds (Rae et al. 2021, table A1 —
# the public heuristics, not any proprietary variant).
GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_WORD_LEN = 3.0
GOPHER_MAX_MEAN_WORD_LEN = 10.0
GOPHER_MAX_SYMBOL_RATIO = 0.10     # '#' or '...' per word
GOPHER_MAX_BULLET_FRAC = 0.90      # lines starting with a bullet
GOPHER_MAX_ELLIPSIS_FRAC = 0.30    # lines ending with '...'
GOPHER_MIN_ALPHA_FRAC = 0.80       # words containing a letter
GOPHER_MAX_DUP_LINE_FRAC = 0.30    # 1 - distinct/total lines

# Gopher repetition bounds (Rae et al. 2021, table A1 second half) —
# top-n-gram mass for n=2..4 and duplicate-n-gram coverage at the
# family's endpoints n=5 and n=10 (the intermediate n repeat the same
# operator shape with interpolated thresholds; the endpoints bound the
# family).  Fractions here are over TOKENS (declared adaptation of the
# paper's character fractions — same signal, exact cross-engine
# arithmetic).
REP_NS_TOP = (2, 3, 4)
REP_NS_DUP = (5, 10)
REP_MAX_TOP_FRAC = {2: 0.20, 3: 0.18, 4: 0.16}
REP_MAX_DUP_FRAC = {5: 0.15, 10: 0.10}

# PII patterns — deliberately RE2-safe (no backrefs/lookarounds) so the
# identical literal runs in Java regex (Spark) and RE2 (DuckDB).
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_PHONE = r"\+\d{8,15}"

# Decontamination: benchmark panel size (hash-selected, FIXED — the
# audit must not grow with the corpus) and the minimum number of
# shared 3-word shingles that flags a training doc.
DECON_PANEL_K = 16
DECON_MIN_SHARED = 3

# Source mixing: total document budget distributed over sources by
# temperature weights w = floor(sqrt(n_source)) (alpha = 0.5 —
# up-weights small sources relative to proportional sampling, the
# standard multilingual-LM mixing temperature).
MIX_BUDGET = 200

_WS = r"\s+"
_BULLET_RE = "^[-*•]"
_ELLIPSIS_RE = r"\.\.\.$"


def quality_signals_frame(d: DataFrame, keep: tuple[str, ...] = ()) -> DataFrame:
    """Gopher-style quality signals over ANY frame with (doc_id, text)
    — the shared expression set for the batch query and the streaming
    gate (``streaming.curation_stream``), so the two modes can never
    drift.  ``keep`` carries extra columns (e.g. a stream's event
    time) through unchanged."""
    d = d.select(
        *keep, "doc_id",
        F.split(F.trim("text"), _WS).alias("words"),
        F.split("text", "\n").alias("lines"),
        F.size(F.regexp_extract_all("text", F.lit("#"), F.lit(0)))
        .cast("long").alias("n_hash"),
        F.size(F.regexp_extract_all("text", F.lit(r"\.\.\."), F.lit(0)))
        .cast("long").alias("n_ell"),
    )
    n_words = F.size("words").cast("long")
    n_lines = F.size("lines").cast("long")
    d = d.select(
        *keep, "doc_id",
        n_words.alias("n_words"),
        (F.aggregate("words", F.lit(0).cast("long"),
                     lambda a, w: a + F.length(w)).cast("double")
         / n_words).alias("mean_word_len"),
        ((F.col("n_hash") + F.col("n_ell")).cast("double")
         / n_words).alias("symbol_word_ratio"),
        (F.size(F.filter("words", lambda w: w.rlike("[A-Za-z]")))
         .cast("double") / n_words).alias("alpha_word_frac"),
        (F.size(F.filter("lines", lambda ln: F.ltrim(ln).rlike(_BULLET_RE)))
         .cast("double") / n_lines).alias("bullet_line_frac"),
        (F.size(F.filter("lines", lambda ln: F.rtrim(ln).rlike(_ELLIPSIS_RE)))
         .cast("double") / n_lines).alias("ellipsis_line_frac"),
        ((n_lines - F.size(F.array_distinct("lines"))).cast("double")
         / n_lines).alias("dup_line_frac"),
    )
    gopher_pass = (
        F.col("n_words").between(GOPHER_MIN_WORDS, GOPHER_MAX_WORDS)
        & F.col("mean_word_len").between(
            GOPHER_MIN_MEAN_WORD_LEN, GOPHER_MAX_MEAN_WORD_LEN)
        & (F.col("symbol_word_ratio") < GOPHER_MAX_SYMBOL_RATIO)
        & (F.col("bullet_line_frac") < GOPHER_MAX_BULLET_FRAC)
        & (F.col("ellipsis_line_frac") < GOPHER_MAX_ELLIPSIS_FRAC)
        & (F.col("alpha_word_frac") > GOPHER_MIN_ALPHA_FRAC)
        & (F.col("dup_line_frac") < GOPHER_MAX_DUP_LINE_FRAC)
    )
    return d.withColumn("gopher_pass", gopher_pass)


def q_quality_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document Gopher-style quality signals + the composite pass
    flag.  All counts are exact integers over whitespace words and
    newline-split lines; each ratio is one double division, mirrored
    verbatim in the DuckDB twin."""
    return quality_signals_frame(_docs(spark, sf_dir)).orderBy("doc_id")


def q_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-document n-gram repetition signals — the second half of
    the Gopher quality table (Rae et al. 2021, table A1), the family
    ``quality_signals``' line-level rules do not cover:

    - ``top{2,3,4}_frac``: the modal n-gram's token mass — count of
      the most frequent n-gram × n over the doc's token count (a doc
      looping one phrase scores high here long before any line
      duplicates exactly);
    - ``dup{5,10}_frac``: the fraction of token POSITIONS covered by
      at least one n-gram that occurs ≥ 2 times in the doc — the
      coverage union, so overlapping repeats are never double-counted
      (n = 5 and n = 10 are the published family's endpoints; the
      intermediate n add thresholds, not operator shape);
    - ``repetition_pass``: every fraction under its table-A1 bound.

    Fractions are over TOKENS (``texthash.tokens`` — the same
    tokenizer as the dedup family) rather than characters — a
    declared adaptation: the signal is the same, and token counts are
    exact integers on both engines, so every ratio is one IEEE
    division and the DuckDB twin matches bitwise.

    Plan shape: one token-grain lead window (the ``k_gram_rows``
    pipeline, doc-clustered input so the window is partition-local),
    a stack to (doc, n, gram, start) rows, ONE shuffle for the
    per-(doc, n, gram) occurrence counts, then ONE doc-grain
    conditional aggregation computes every signal at once: the modal
    counts as ``max(when(n = N, cnt))`` and each coverage union as
    array expressions over the collected duplicated-start sequences
    (bounded ≤ n positions per duplicated start — the same ×n the
    previous explode materialized as rows).  Linear in tokens × |ns|;
    no per-pair or per-window quadratic stage.  (r15: the previous
    tops/coverage BRANCHES forked the plan below the count window, so
    the whole token pipeline built twice — plans don't share common
    subtrees; the single aggregation builds it once and measured
    ~0.6× wall at sf0.1, digest-identical.)"""
    from astra_perseverance_spark.extensions.corpus import clustered_docs
    from astra_perseverance_spark.functions.texthash import tokens

    ns = (*REP_NS_TOP, *REP_NS_DUP)
    kmax = max(ns)
    docs = clustered_docs(spark, sf_dir)
    ntok = docs.select(
        "doc_id", F.size(tokens("text")).cast("long").alias("n_tokens"))

    w = Window.partitionBy("doc_id").orderBy("p")
    toks = docs.select(
        "doc_id", F.posexplode(tokens("text")).alias("p", "t0"))
    for i in range(1, kmax):
        toks = toks.withColumn(f"t{i}", F.lead("t0", i).over(w))

    def gram(n: int) -> F.Column:
        return F.when(
            F.col(f"t{n - 1}").isNotNull(),
            F.concat_ws(" ", *[f"t{i}" for i in range(n)]),
        )

    stack_args = ", ".join(f"{n}, g{n}" for n in ns)
    # counts key on the raw gram STRING: keying on h15(gram) to
    # shrink the shuffle width was measured 11% SLOWER at sf0.1 (the
    # per-row md5 exceeds the width saving); revisit only with a real
    # network shuffle where bytes-on-the-wire dominate
    long = (
        toks.select("doc_id", "p",
                    *[gram(n).alias(f"g{n}") for n in ns])
        .selectExpr("doc_id", "p",
                    f"stack({len(ns)}, {stack_args}) as (n, g)")
        .filter(F.col("g").isNotNull())
        .withColumn(
            "cnt",
            F.count("*").over(Window.partitionBy("doc_id", "n", "g")),
        )
    )
    # One doc-grain aggregation for every signal (see docstring): the
    # modal counts fold map-side to scalars, the coverage unions
    # collect only the DUPLICATED starts' position sequences (nulls —
    # unique grams — are skipped by collect_list), so the doc-grain
    # exchange carries per-(doc, map-partition) partials, never the
    # token stream.
    # Per-doc buffer bound (ADVICE r15): one doc's collected sequences
    # hold ≤ n_tok positions per (n, duplicated start) — worst case
    # n_tok·Σ|REP_NS_DUP| longs for a pathologically repetitive whale
    # doc, i.e. ~8·|ns| bytes per token, the SAME ×n volume the old
    # explode materialized as rows (just held in one task's
    # aggregation buffer rather than spread as rows).  A corpus whose
    # documents are individually bounded (this engine's contract:
    # doc_chunks exists to split whales upstream) keeps that buffer in
    # task memory; if unbounded docs ever enter, gate this path on a
    # token threshold and fall back to the explode+distinct
    # formulation for the outliers.
    perdoc = long.groupBy("doc_id").agg(
        *[F.max(F.when(F.col("n") == n, F.col("cnt")))
          .alias(f"top{n}_cnt") for n in REP_NS_TOP],
        *[F.size(F.array_distinct(F.flatten(F.collect_list(
            F.when((F.col("n") == n) & (F.col("cnt") >= 2),
                   F.sequence(F.col("p"), F.col("p") + F.lit(n - 1)))))))
          .cast("long").alias(f"dup{n}_tok") for n in REP_NS_DUP],
    )
    out = ntok.join(perdoc.hint("shuffle_hash"), "doc_id", "left")

    def frac(num: F.Column) -> F.Column:
        return F.when(
            F.col("n_tokens") > 0,
            F.coalesce(num, F.lit(0)).cast("double") / F.col("n_tokens"),
        ).otherwise(F.lit(0.0))

    for n in REP_NS_TOP:
        out = out.withColumn(f"top{n}_frac",
                             frac(F.col(f"top{n}_cnt") * n))
    for n in REP_NS_DUP:
        out = out.withColumn(f"dup{n}_frac", frac(F.col(f"dup{n}_tok")))
    rep_pass = F.lit(True)
    for n in REP_NS_TOP:
        rep_pass = rep_pass & (F.col(f"top{n}_frac")
                               < REP_MAX_TOP_FRAC[n])
    for n in REP_NS_DUP:
        rep_pass = rep_pass & (F.col(f"dup{n}_frac")
                               < REP_MAX_DUP_FRAC[n])
    return (
        out.select(
            "doc_id", "n_tokens",
            *[f"top{n}_frac" for n in REP_NS_TOP],
            *[f"dup{n}_frac" for n in REP_NS_DUP],
            rep_pass.alias("repetition_pass"),
        )
        .orderBy("doc_id")
    )


def pii_redacted() -> F.Column:
    """The ``text`` column with every PII match replaced by a typed
    placeholder — shared by the batch digest query and the streaming
    gate.  Replacement order is fixed (email, ipv4, phone) so
    overlapping matches resolve identically everywhere."""
    return F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace("text", PII_EMAIL, "<EMAIL>"),
            PII_IPV4, "<IP>"),
        PII_PHONE, "<PHONE>")


def pii_count_columns() -> list[F.Column]:
    """Match-count columns (n_email, n_ipv4, n_phone) over ``text``."""
    return [
        F.size(F.regexp_extract_all("text", F.lit(pat), F.lit(0)))
        .cast("long").alias(name)
        for name, pat in (("n_email", PII_EMAIL), ("n_ipv4", PII_IPV4),
                          ("n_phone", PII_PHONE))
    ]


def q_pii_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document PII inventory and redaction digest: pattern match
    counts (email / IPv4 / international-phone), the total, and the
    md5 of the text after replacing every match with a typed
    placeholder.  The digest proves the redaction chain end-to-end —
    it differs per document and flips if any replacement drifts.

    Redaction order is fixed (email, ipv4, phone) so overlapping
    matches resolve identically on both engines.

    Scale: single-pass character-class patterns (no nested
    quantifiers — no backtracking blow-up).  The probe's 8× ratio of
    ~2.2 is the fixed per-job floor (~0.17 s of scan setup + task
    scheduling + output sort, measured against a no-regex control)
    over a small linear term: the regex component itself is 0.11 s /
    0.22 s / 0.42 s at 1× / 8× / 16× — see docs/SCALE_PROBE.md
    footer."""
    return (
        _docs(spark, sf_dir)
        .select(
            "doc_id",
            *pii_count_columns(),
            F.md5(pii_redacted()).alias("redacted_md5"),
        )
        .withColumn(
            "pii_total",
            (F.col("n_email") + F.col("n_ipv4") + F.col("n_phone"))
            .cast("long"))
        .orderBy("doc_id")
    )


def decon_panel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The fixed benchmark panel: the ``DECON_PANEL_K`` documents with
    the smallest (h15(doc_id), doc_id) — a deterministic uniform
    sample whose size does NOT grow with the corpus (same rationale as
    the ANN recall panel).  Selected via the exact two-phase salted
    top-k; the (h15, doc_id) key is a total order, so the result is
    engine-identical."""
    return (
        salted_topk(
            _docs(spark, sf_dir).select("doc_id"),
            [],
            [h15(F.col("doc_id").cast("string")), "doc_id"],
            DECON_PANEL_K,
            salt_on="doc_id",
        )
        .select(F.col("doc_id").alias("bench_doc"))
    )


def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: training documents sharing ≥
    ``DECON_MIN_SHARED`` capped 3-word shingles with any panel
    document — the exact-n-gram-collision audit run before training to
    keep eval data out of the corpus.

    Plan: the panel's shingle postings are bounded (panel_k docs), so
    both the panel membership probe and the shingle join broadcast —
    the corpus posting scan is shuffle-free, and the per-(doc, bench)
    overlap count aggregates map-side.  Uses the stop-shingle-capped
    universe (``dedup.capped_shingle_rows``): boilerplate shingles are
    not contamination evidence, and the cap keeps posting lists
    bounded at any corpus size."""
    sh = capped_shingle_rows(spark, sf_dir).select("doc_id", "lang", "g")
    panel = decon_panel(spark, sf_dir)
    bench_sh = (
        sh.join(F.broadcast(panel),
                sh["doc_id"] == panel["bench_doc"])
        .select("bench_doc", "lang", "g")
    )
    train = sh.join(
        F.broadcast(panel), sh["doc_id"] == panel["bench_doc"], "left_anti")
    return (
        train.join(F.broadcast(bench_sh), ["lang", "g"])
        .groupBy("doc_id", "bench_doc")
        .agg(F.count("*").cast("long").alias("n_shared"))
        .filter(F.col("n_shared") >= DECON_MIN_SHARED)
        .orderBy("doc_id", "bench_doc")
    )


def q_source_cross_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-SOURCE duplication audit: for every unordered source
    pair, how many verified duplicate document pairs sit inside or
    straddle it — the curation question "which dumps duplicate each
    other" that decides source-level dedup order, crawl-snapshot
    pruning, and ``source_mix`` weights (a source whose mass is
    mostly another source's duplicates should not also get that
    mass's temperature share).

    Two measures per (source_a ≤ source_b) row, independent by
    construction: ``exact_pairs`` — pairs of identical normalized
    text (every pair within a content-digest group), and
    ``near_pairs`` — the verified 3-gram Jaccard ≥ τ pair set
    (``dedup.ngram_pairs``; an identical-text pair that shingles also
    passes Jaccard at 1.0, so the two columns overlap — they are
    separate measures, not a partition).

    Scale shape: the exact side NEVER materializes per-doc pairs — a
    digest group of k docs would contribute C(k, 2) rows, so the
    pair counts are computed arithmetically from each group's
    per-source composition counts (grain: distinct sources per
    digest, bounded by the source vocabulary, not group size).  r16:
    the within/cross branches used to fork the composition pipeline
    THREE ways (the within select plus both sides of a content_md5
    self-join — plans don't share common subtrees, so the digest ⋈
    doc-dim join and its aggregation built three times); one
    digest-grain ``collect_list`` + an array pair expansion now
    computes both measures from a SINGLE build (the per-digest source
    list is bounded by the source vocabulary, so the expansion is a
    tiny in-row transform).  The near side attaches the doc dim ONCE
    through a melted (pair, side) spine instead of two successive
    doc-keyed joins — the corpus-sized doc dim crosses one exchange,
    not two.  Output grain is source pairs — report-sized.
    ORDER BY source_a, source_b."""
    from astra_perseverance_spark.extensions.dedup import (
        content_digest_frame,
        ngram_pairs,
    )

    src = _docs(spark, sf_dir).select("doc_id", "source")
    # shuffle_hash throughout: every join here pairs two DERIVED
    # frames (digest dim × doc dim, melted pair spine × doc dim,
    # exact ⟗ near) whose size estimates exceed the broadcast
    # threshold, so without the hint they all plan SortMergeJoin —
    # double sorts the engine's plan gate forbids
    comp = (
        content_digest_frame(spark, sf_dir)
        .join(src.hint("shuffle_hash"), "doc_id")
        .groupBy("content_md5", "source")
        .agg(F.count("*").cast("long").alias("c"))
    )
    # per-digest source composition (sources distinct within a digest
    # group, sorted ascending), expanded in-row to the same arithmetic
    # the within/cross branches computed: (s_i, s_i, C(c_i, 2)) and,
    # for i < j, (s_i, s_j, c_i · c_j)
    grp = comp.groupBy("content_md5").agg(
        F.sort_array(F.collect_list(F.struct("source", "c"))).alias("cs"))
    exact = (
        grp.select(F.explode(F.expr(
            "flatten(transform(cs, (x, i) -> concat("
            " array(struct(x.source AS source_a, x.source AS source_b,"
            "  CAST(x.c * (x.c - 1) DIV 2 AS BIGINT) AS p)),"
            " transform(slice(cs, i + 2, size(cs)), y ->"
            "  struct(x.source AS source_a, y.source AS source_b,"
            "   CAST(x.c * y.c AS BIGINT) AS p)))))"
        )).alias("e"))
        .select("e.*")
        .groupBy("source_a", "source_b")
        .agg(F.sum("p").cast("long").alias("exact_pairs"))
        .filter(F.col("exact_pairs") > 0)
    )
    pairs = ngram_pairs(spark, sf_dir).select("doc_a", "doc_b")
    melted = pairs.select(
        "doc_a", "doc_b",
        F.explode(F.array("doc_a", "doc_b")).alias("doc_id"))
    near = (
        melted.join(src.hint("shuffle_hash"), "doc_id")
        .groupBy("doc_a", "doc_b")
        .agg(F.min("source").alias("source_a"),
             F.max("source").alias("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count("*").cast("long").alias("near_pairs"))
    )
    return (
        exact.join(near.hint("shuffle_hash"),
                   ["source_a", "source_b"], "full")
        .select(
            "source_a", "source_b",
            F.coalesce("exact_pairs", F.lit(0).cast("long"))
            .alias("exact_pairs"),
            F.coalesce("near_pairs", F.lit(0).cast("long"))
            .alias("near_pairs"),
        )
        .orderBy("source_a", "source_b")
    )


def q_source_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based source mixing: distribute a ``MIX_BUDGET``
    document budget over sources with weights w = floor(sqrt(n)) —
    alpha = 0.5 temperature sampling (up-weights small sources vs
    proportional) — then pick each source's quota deterministically by
    hash order.

    quota_s = (MIX_BUDGET · w_s) div Σw: floor(sqrt) over a BIGINT is
    engine-identical (IEEE sqrt is correctly rounded), the total is an
    integer sum, and the division is integer — no float accumulation
    anywhere, so the mix is bitwise-reproducible.  Picks use the exact
    two-phase salted top-k over the (h15(doc_id), doc_id) total
    order."""
    d = _docs(spark, sf_dir).select("doc_id", "source")
    counts = (
        d.groupBy("source")
        .agg(F.count("*").cast("long").alias("n_src"))
        .withColumn(
            "w",
            F.floor(F.sqrt(F.col("n_src").cast("double"))).cast("long"))
    )
    tot = counts.agg(F.sum("w").cast("long").alias("tot"))
    quota = (
        counts.crossJoin(F.broadcast(tot))
        .select(
            "source", "n_src",
            F.expr(f"CAST(({MIX_BUDGET} * w) DIV tot AS BIGINT)")
            .alias("quota"))
    )
    ranked = salted_topk(
        d, ["source"],
        [h15(F.col("doc_id").cast("string")), "doc_id"],
        MIX_BUDGET,  # upper bound; the real cut is the per-source quota
        salt_on="doc_id",
    ).withColumnRenamed("rank", "pick")
    return (
        ranked.join(F.broadcast(quota), "source")
        .filter(F.col("pick") <= F.col("quota"))
        .select("source", "pick", "doc_id", "quota")
        .orderBy("source", "pick")
    )


def q_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document novelty: the fraction of a doc's (stop-shingle-
    capped) 3-word shingles that appear in NO other document of its
    language (df = 1) — the complement of the dedup family: low
    novelty flags boilerplate/templated text even when no single pair
    crosses the near-dup threshold.

    Reuses the memoized capped posting universe
    (``dedup.capped_shingle_rows``): one pass, a doc-grain
    aggregation, exact-integer counts and a single division — so the
    DuckDB twin matches bitwise and at scale the cost is O(postings)
    with a doc-keyed map-side-combined shuffle."""

    sh = capped_shingle_rows(spark, sf_dir)
    return (
        sh.groupBy("doc_id", "lang")
        .agg(
            F.count("*").cast("long").alias("n_shingles"),
            F.sum(F.when(F.col("df") == 1, 1).otherwise(0))
            .cast("long").alias("n_unique"),
        )
        .select(
            "doc_id", "lang", "n_shingles", "n_unique",
            (F.col("n_unique").cast("double") / F.col("n_shingles"))
            .alias("novelty"),
        )
        .orderBy("doc_id")
    )


def q_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus quality dashboard: per (lang, source) document counts,
    Gopher pass counts/rate, and PII incidence — the one table a
    curation run reports to decide which slices need attention.

    ONE pass over the corpus scan — the signal expressions and the
    PII counters are projected together (``quality_signals_frame``'s
    ``keep`` carries lang/source/PII through), so there is no
    doc-grain self-join and the only exchange is the final
    (lang, source)-grain aggregation with map-side partial sums;
    output cardinality is |lang|×|source|, so the result broadcasts
    anywhere downstream."""
    sig = quality_signals_frame(
        _docs(spark, sf_dir).select(
            "doc_id", "text", "lang", "source", *pii_count_columns()),
        keep=("lang", "source", "n_email", "n_ipv4", "n_phone"),
    )
    joined = sig.select(
        "lang", "source", "gopher_pass",
        ((F.col("n_email") + F.col("n_ipv4") + F.col("n_phone")) > 0)
        .alias("has_pii"),
    )
    return (
        joined.groupBy("lang", "source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum(F.when(F.col("gopher_pass"), 1).otherwise(0))
            .cast("long").alias("n_pass"),
            F.sum(F.when(F.col("has_pii"), 1).otherwise(0))
            .cast("long").alias("n_pii"),
        )
        .select(
            "lang", "source", "n_docs", "n_pass", "n_pii",
            (F.col("n_pass").cast("double") / F.col("n_docs"))
            .alias("pass_rate"),
        )
        .orderBy("lang", "source")
    )


def curation_ledger(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, keep, reasons) UNORDERED — the curation ledger frame,
    memoized per session: the ledger is a pipeline artifact (the
    materialization step, the funnel, and the shard exporter all read
    the same decisions), so the five-join build runs once, not per
    consumer — the same artifact pattern as ``dedup.ngram_pairs`` /
    ``dedup.minhash_pairs``.  In bucketed-warehouse mode the memo is
    skipped: the durable tables are the cache, and consumers get the
    exchange-free bucketed plan (gated in ``tests/test_warehouse.py``).

    One keep/drop row per document with the semicolon-joined reason
    list (fixed rule order: too_short; low_ttr; high_punct;
    exact_dup; near_dup; contaminated) — combining the quality
    filter, both dedup families, and decontamination in one
    artifact.

    Declared drop rules beyond ``q_quality_filter``'s: ``near_dup`` —
    the document has a SMALLER-id verified n-gram-Jaccard partner
    (``dedup.ngram_pairs`` emits doc_a < doc_b, so doc_b is the
    non-representative side; a pairwise rule, deliberately not the
    transitive closure — the cluster view is ``dedup_keep_list``);
    ``contaminated`` — flagged by the benchmark-panel shingle audit
    (``q_decontaminate``).

    Plan: every input is a memoized artifact (stats frame, digest,
    ngram pairs) or a bounded broadcast probe (decon panel); this
    query adds only doc_id equi-joins on top — uniform keys.  The
    exact-dup flag uses a window min over content_md5 so the digest
    frame crosses one exchange, not two.  With the bucketed
    warehouse opt-in (``corpus.BUCKETED_DB_ENV``), stats and digest
    read doc_id-bucketed tables: the corpus PAYLOAD (text) never
    crosses an Exchange — every remaining shuffle carries doc-grain
    derived columns (digests, postings, pair keys), bytes-per-row
    independent of document size (gated by
    ``tests/test_warehouse.py``).  Each probe side
    carries a ``shuffle_hash`` hint: the memoized inputs expose no
    size statistics, so Spark would otherwise fall back to
    SortMergeJoin — on uniform already-aggregated keys the sort adds
    nothing, and the flag/reject sides are far smaller than the stats
    side, exactly the hash-build shape."""
    from astra_perseverance_spark.conformed.model import memo_frame
    from astra_perseverance_spark.extensions.corpus import bucketed_db
    from astra_perseverance_spark.extensions.dedup import (
        content_digest_frame,
        ngram_pairs,
    )
    from astra_perseverance_spark.extensions.pipeline import (
        QF_MAX_PUNCT,
        QF_MIN_TOKENS,
        QF_MIN_TTR,
    )
    from astra_perseverance_spark.extensions.text_stats import (
        text_stats_frame,
    )

    def build() -> DataFrame:
        stats = text_stats_frame(spark, sf_dir).select(
            "doc_id", "n_tokens", "ttr", "punct_ratio"
        )
        d = content_digest_frame(spark, sf_dir)
        # representative = group-min doc_id, via a window so the
        # digest frame crosses ONE exchange (groupBy+join-back would
        # shuffle it twice: once for the agg, once to join the reps)
        dup = d.select(
            "doc_id",
            (
                F.col("doc_id")
                > F.min("doc_id").over(Window.partitionBy("content_md5"))
            ).alias("is_dup"),
        )
        near = (
            ngram_pairs(spark, sf_dir)
            .select(F.col("doc_b").alias("doc_id"))
            .distinct()
            .withColumn("is_near", F.lit(True))
        )
        contam = (
            q_decontaminate(spark, sf_dir)
            .select("doc_id")
            .distinct()
            .withColumn("is_contam", F.lit(True))
        )
        flagged = (
            stats.join(dup.hint("shuffle_hash"), "doc_id")
            .join(near.hint("shuffle_hash"), "doc_id", "left")
            .join(contam.hint("shuffle_hash"), "doc_id", "left")
            .select(
                "doc_id",
                F.concat_ws(
                    ";",
                    F.when(F.col("n_tokens") < QF_MIN_TOKENS,
                           F.lit("too_short")),
                    F.when(F.col("ttr") < QF_MIN_TTR, F.lit("low_ttr")),
                    F.when(F.col("punct_ratio") > QF_MAX_PUNCT,
                           F.lit("high_punct")),
                    F.when(F.col("is_dup"), F.lit("exact_dup")),
                    F.when(F.col("is_near").isNotNull(),
                           F.lit("near_dup")),
                    F.when(F.col("is_contam").isNotNull(),
                           F.lit("contaminated")),
                ).alias("reasons"),
            )
        )
        return flagged.select(
            "doc_id", (F.col("reasons") == "").alias("keep"), "reasons"
        )

    if bucketed_db():
        return build()
    return memo_frame(spark, sf_dir, ("curation_ledger",), build)


def q_corpus_curate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curation capstone query: the memoized ledger
    (``curation_ledger``) with the report sort — see that builder's
    docstring for the rule semantics and the plan/scale notes.

    This ledger is DOC-grain keep/drop; sub-document duplication is
    handled by its sibling ``training.q_dedup_span_trim``, which cuts
    verified cross-document duplicate spans (``dup_spans``) out of
    the surviving documents' token streams — the span-level step
    between this ledger and sequence packing."""
    return curation_ledger(spark, sf_dir).orderBy("doc_id")
