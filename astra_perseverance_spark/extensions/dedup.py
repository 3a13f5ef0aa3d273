"""Document deduplication: exact, bag-of-words, MinHash-LSH, SimHash,
n-gram Jaccard, connected-components clustering, and snapshot-delta
incremental dedup.

Scale design (the point of these operators at 100 TB):

- Exact / bag-of-words dedup is one hash-partitioned ``groupBy`` on a
  digest — Spark's partial aggregation makes the shuffle carry only
  (digest, partial-group) rows, never document text.
- MinHash-LSH shuffles on (band, band-signature) — candidate
  generation is strictly bucket-local; no all-pairs product ever
  materializes.  A bucket-size cap (``MINHASH_BUCKET_CAP``) bounds the
  worst bucket so one degenerate signature cannot go quadratic: with
  8 bands a real near-dup pair still meets in its other bands.
- SimHash blocks on 12-bit signature chunks (4 blocks): a pair within
  Hamming distance 6 of a 48-bit signature must agree exactly on at
  least one chunk (pigeonhole), so blocking loses no true pair while
  keeping the join bucket-local.
- All verification joins re-attach shingle arrays by doc_id — an
  equi-join Spark plans as shuffle-hash — and only on the candidate
  set, which is orders of magnitude smaller than the corpus.

Everything is built from JVM-side expressions (higher-order array
functions, no Python UDFs); the arithmetic is exact-integer so the
DuckDB oracles in ``oracle.ext_sqls`` match bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from astra_perseverance_spark.conformed.model import memo_frame
from astra_perseverance_spark.functions.bounded import bounded_global_frame
from astra_perseverance_spark.functions.graph import connected_components
from astra_perseverance_spark.functions.texthash import (
    MINHASH_BUCKET_CAP,
    MINHASH_JACCARD_MIN,
    MINHASH_P,
    MINHASH_BANDS,
    MINHASH_ROWS,
    NGRAM_DF_CAP,
    SIMHASH_BLOCKS,
    SIMHASH_MAX_HAMMING,
    h15,
    minhash_coeffs,
    simhash_block_bits,
    tokens,
)


from astra_perseverance_spark.extensions.corpus import bucketed_db as _bucketed_db
from astra_perseverance_spark.extensions.corpus import index_artifact, index_db
from astra_perseverance_spark.extensions.corpus import clustered_docs as _cdocs
from astra_perseverance_spark.extensions.corpus import docs_frame as _docs
from astra_perseverance_spark.extensions.corpus import n_docs as _n_docs


def normalized_text(col: str = "text") -> F.Column:
    """Whitespace-collapsed, lower-cased, trimmed text."""
    return F.regexp_replace(F.lower(F.trim(F.col(col))), r"\s+", " ")


def content_digest(col: str = "text") -> F.Column:
    """The exact-dedup digest EXPRESSION (md5 over normalized text) —
    the single definition shared by the query side
    (``content_digest_frame``) and the warehouse sink
    (``sinks.warehouse.write_bucketed_corpus``'s persisted
    ``doc_digests`` table).  The bucketed read path trusts that the
    persisted digests used this exact expression; keeping one
    definition makes digest drift (and the silent wrong-dedup-groups
    it would cause) structurally impossible."""
    return F.md5(normalized_text(col))


def content_digest_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, content_md5) — the exact-dedup digest, memoized per
    session: ``q_dedup_exact``, the duplicate-graph edge build, and
    the quality filter's exact_dup rule all consume the same digest,
    so the md5-over-normalized-text pass runs once, and the
    representative rule (group min) can only ever change in one
    place.

    With the bucketed warehouse opt-in (``corpus.BUCKETED_DB_ENV``)
    the digest is not computed at all: ``doc_digests`` is a persisted
    ingest artifact bucket-co-located with ``documents``, so digest ⋈
    documents joins plan with no Exchange (same md5-over-normalized
    expression at write time, ``sinks/warehouse.py``).  The
    index-store opt-in (``corpus.INDEX_DB_ENV``) persists the same
    dim as ``digest_dim`` (md5-bucketed — the groupBy/join key of its
    hot consumers) so the incremental-dedup probe reads a durable
    artifact instead of re-digesting the corpus per application."""
    db = _bucketed_db()
    if db:
        return spark.table(f"{db}.doc_digests").select(
            "doc_id", "content_md5")
    art = index_artifact(spark, "digest_dim")
    if art is not None:
        return art
    return memo_frame(
        spark, sf_dir, ("content_digest",),
        lambda: _docs(spark, sf_dir).select(
            "doc_id", content_digest().alias("content_md5")
        ),
    )


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup on normalized text: one row per distinct content
    digest with the representative (minimum) doc_id and group size.

    Scale: single groupBy on the md5 digest; the shuffle key is the
    digest so the distribution is uniform by construction (no skew)."""
    return (
        content_digest_frame(spark, sf_dir)
        .groupBy("content_md5")
        .agg(
            F.min("doc_id").alias("rep_doc"),
            F.count("*").cast("long").alias("n_docs"),
        )
        .select("content_md5", "rep_doc", "n_docs")
        .orderBy("rep_doc")
    )


def q_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental (snapshot-delta) exact dedup: which *new* documents
    duplicate the *existing* corpus — the shape every continuously
    ingesting pipeline runs, where re-deduping the full corpus per
    batch would be quadratic over time.

    The fixture split is by doc_id parity (even = existing corpus,
    odd = new batch); in production the split is the ingestion
    boundary.  Two probes against persisted corpus artifacts:
    exact — a digest-keyed equi-join of the new batch against the
    existing digest dim (uniform md5 shuffle key); near — the
    cross-boundary restriction of the shingle-Jaccard pairs (the
    inverted index is the persisted artifact; only postings touching
    a new doc produce work, so a batch costs batch-sized work, not a
    corpus re-dedup).

    Output: one row per (new doc, matching existing doc):
    (doc_id, dup_of, kind ∈ exact|near).  A pair reported exact is
    anti-joined out of the near branch (an exact duplicate with ≥3
    tokens always also passes shingle Jaccard at 1.0 — without the
    anti-join the same pair would appear under both kinds).
    ORDER BY doc_id, dup_of."""
    d = content_digest_frame(spark, sf_dir)
    # EVERY existing member of the digest group is an exact match —
    # pairing only the group minimum would report the other identical
    # existing docs as kind='near' (they also pass shingle Jaccard at
    # 1.0), misclassifying true exact collisions
    old = (
        d.filter(F.col("doc_id") % 2 == 0)
        .select("content_md5", F.col("doc_id").alias("dup_of"))
    )
    exact = (
        d.filter(F.col("doc_id") % 2 == 1)
        .join(old, "content_md5")
        .select("doc_id", "dup_of", F.lit("exact").alias("kind"))
    )
    if index_db():
        # store mode: the probe consumes only CROSS-boundary pairs, so
        # candidate generation joins the persisted postings' existing
        # side against the batch side only — batch-sized, instead of
        # rebuilding the full corpus-quadratic pair frame per
        # application (see _build_cross_ngram_pairs; lossless,
        # invisible in the result).  Default mode keeps the shared
        # memoized full pair frame.
        pairs = memo_frame(
            spark, sf_dir, ("cross_ngram_pairs",),
            lambda: _build_cross_ngram_pairs(spark, sf_dir),
        ).select("doc_a", "doc_b")
    else:
        pairs = ngram_pairs(spark, sf_dir).select("doc_a", "doc_b")
    near = (
        pairs.filter((F.col("doc_a") % 2 == 0) & (F.col("doc_b") % 2 == 1))
        .select(F.col("doc_b").alias("doc_id"), F.col("doc_a").alias("dup_of"))
        .union(
            pairs.filter((F.col("doc_a") % 2 == 1) & (F.col("doc_b") % 2 == 0))
            .select(F.col("doc_a").alias("doc_id"), F.col("doc_b").alias("dup_of"))
        )
        .withColumn("kind", F.lit("near"))
        # shuffle_hash: the exact-pair frame is batch-sized but its size
        # ESTIMATE (projection of a join) exceeds the broadcast threshold,
        # so without the hint this anti-join plans SortMergeJoin — a
        # double sort the engine's plan gate forbids (r8 regression)
        .join(exact.select("doc_id", "dup_of").hint("shuffle_hash"),
              ["doc_id", "dup_of"], "left_anti")
    )
    return exact.unionByName(near).orderBy("doc_id", "dup_of")


def bag_digest_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, bag_md5) — the distinct-token-set digest, memoized per
    session like ``content_digest_frame``: the tokenize + sort + md5
    pass is the whole cost of the tokenset query, and memoizing it
    makes warm timings reflect the groupBy rather than whether some
    earlier query left the docs cache hot (the r4 bench regression was
    exactly that interference)."""
    return memo_frame(
        spark, sf_dir, ("bag_digest",),
        lambda: _docs(spark, sf_dir).select(
            "doc_id",
            F.md5(F.array_join(
                F.array_sort(F.array_distinct(tokens("text"))), " "
            )).alias("bag_md5"),
        ),
    )


def q_dedup_tokenset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-of-words dedup: documents with the same *distinct token
    set* are duplicates regardless of word order/repetition.  Emits
    only groups of ≥ 2 with a comma-joined sorted member list."""
    return (
        bag_digest_frame(spark, sf_dir)
        .groupBy("bag_md5")
        .agg(
            F.min("doc_id").alias("rep_doc"),
            F.count("*").cast("long").alias("n_docs"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("doc_id")),
                    lambda x: x.cast("string"),
                ),
                ",",
            ).alias("members"),
        )
        .filter(F.col("n_docs") >= 2)
        .select("bag_md5", "rep_doc", "n_docs", "members")
        .orderBy("rep_doc")
    )


def shingle_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, lang, n, g): one row per distinct 3-word shingle, with
    the per-doc distinct-shingle count ``n``.

    Row-based construction — posexplode + ``lead`` over (doc, pos) —
    instead of array higher-order functions: HOF lambdas run in the
    expression interpreter (no whole-stage codegen), which measured
    ~4× slower than this windowed row pipeline on the same corpus.
    Set semantics identical to the oracle's array formulation
    (``texthash.word_shingles_sql``); the shuffle is one
    hash partition by doc_id that the window, the distinct, and the
    count all reuse.

    Cached per session: the MinHash signature build, both sides of the
    exact-Jaccard verify, and the n-gram inverted-index self-join all
    start from this frame — without the cache the tokenize/window
    pipeline runs 4×.  Grain is distinct shingles (corpus-token
    bounded); ``cache()`` is MEMORY_AND_DISK, so at 100 TB it spills
    rather than OOMs and still beats recomputing the window pipeline."""
    return memo_frame(spark, sf_dir, ("shingle_rows",),
                      lambda: _build_shingle_rows(spark, sf_dir))


def k_gram_rows_of(docs: DataFrame, k: int) -> DataFrame:
    """``k_gram_rows`` over an explicit (doc_id, lang, text) frame —
    the same expression pipeline applied to a caller-supplied batch
    (``sinks.index_store.extend_postings`` shingles an ingestion batch
    with EXACTLY the corpus build's grams; factoring the frame out is
    what makes drift impossible).  The caller owns the frame's
    doc-grain clustering; the window exchanges on doc_id otherwise."""
    w = Window.partitionBy("doc_id").orderBy("p")
    grams = docs.select(
        "doc_id", "lang", F.posexplode(tokens("text")).alias("p", "t0")
    )
    for i in range(1, k):
        grams = grams.withColumn(f"t{i}", F.lead("t0", i).over(w))
    return (
        grams.filter(F.col(f"t{k - 1}").isNotNull())
        .select(
            "doc_id", "lang",
            F.concat_ws(" ", *[f"t{i}" for i in range(k)]).alias("g"),
        )
    )


def k_gram_rows(spark: SparkSession, sf_dir: str, k: int) -> DataFrame:
    """(doc_id, lang, g): one row per k-word-gram *occurrence* —
    the shared codegen'd row pipeline (posexplode + ``lead`` window,
    see ``shingle_rows`` for why this beats HOF arrays ~4×) behind
    both the 3-gram shingle set and the bigram LM counts.

    Reads via ``corpus.clustered_docs`` (inline repartition on the DOC
    grain, or the bucketed table) rather than the session-cached
    ``docs_frame``: the cache's AQE-planned relation hides its output
    partitioning, so the ``lead`` window above it would re-exchange at
    the TOKEN grain (~2× corpus bytes); planned inline, the one
    exchange carries the documents themselves and the explode + window
    run partition-local (same fix as
    ``text_stats.q_doc_fingerprint``)."""
    return k_gram_rows_of(_cdocs(spark, sf_dir), k)


def _build_shingle_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    grams = k_gram_rows(spark, sf_dir, 3).distinct()
    return grams.withColumn(
        "n", F.count("*").over(Window.partitionBy("doc_id"))
    )


def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate pairs via MinHash + banded LSH, verified with
    exact Jaccard (≥ 0.5) on the candidate set.

    Pipeline: shingle → 16 MinHashes (permutations of the 60-bit md5
    prefix hash, mod 1e9+7) → 8 bands × 2 rows → bucket join on
    (band, signature) → exact-Jaccard verify.  With corpus pairs at
    j ≥ 0.8 the miss probability per pair is (1-0.8²)^8 ≈ 3·10⁻⁴.

    Determinism: the permutation constants are literals on both
    engines, so the candidate set (not just the verified output) is
    identical — parity does not depend on LSH recall.

    Row-based throughout (see ``shingle_rows``): the md5-prefix hash
    runs codegen'd per shingle row, the 16 permutation minima are one
    ``groupBy(doc_id)`` with 16 MIN aggregates, and the exact-Jaccard
    verify computes intersections as join-group counts restricted to
    the candidate pairs — no per-pair array operations anywhere."""
    return minhash_pairs(spark, sf_dir).orderBy("doc_a", "doc_b")


def minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_a, doc_b, jaccard): the verified MinHash-LSH near-dup pair
    frame, UNORDERED and memoized per session — the LSH family's
    canonical artifact, same role as ``ngram_pairs`` for the exact
    scan.  Consumers: ``q_dedup_minhash_lsh`` (adds the report sort),
    the recall audit (``training.q_dedup_recall_audit`` — without the
    memo the audit re-ran the whole candidate+verify join per
    execution, which is what its 8× probe ratio measured), and the
    duplicate graph's edge build."""
    def build() -> DataFrame:
        sh = shingle_rows(spark, sf_dir)
        # (band, key, doc_id) postings — memoized: the candidate join
        # self-joins this frame, and without the cache the signature
        # pipeline (16 permutation minima over every shingle row)
        # executes once per join side.  Persisting signatures/postings
        # is the canonical artifact of a MinHash pipeline; grain is 8
        # rows per doc, MEMORY_AND_DISK.
        sized = memo_frame(spark, sf_dir, ("minhash_postings",),
                           lambda: _build_minhash_postings(sh))
        cand = (
            sized.alias("x")
            .join(sized.alias("y"), ["band", "key"])
            .filter(F.col("x.doc_id") < F.col("y.doc_id"))
            .select(
                F.col("x.doc_id").alias("doc_a"),
                F.col("y.doc_id").alias("doc_b"),
            )
            .distinct()
        )
        post = sh.select("doc_id", "n", "g")
        overlap = (
            cand
            .join(post.select(F.col("doc_id").alias("doc_a"),
                              F.col("n").alias("na"), F.col("g")), "doc_a")
            .join(post.select(F.col("doc_id").alias("doc_b"),
                              F.col("n").alias("nb"), F.col("g")),
                  ["doc_b", "g"])
            .groupBy("doc_a", "doc_b", "na", "nb")
            .agg(F.count("*").alias("o"))
        )
        return (
            overlap.select(
                "doc_a", "doc_b",
                (F.col("o").cast("double")
                 / (F.col("na") + F.col("nb") - F.col("o")))
                .alias("jaccard"),
            )
            .filter(F.col("jaccard") >= MINHASH_JACCARD_MIN)
        )

    return memo_frame(spark, sf_dir, ("minhash_pairs",), build)


def _build_minhash_postings(sh: DataFrame) -> DataFrame:
    hashed = sh.select("doc_id", "n", "g", (h15(F.col("g")) % MINHASH_P).alias("h"))
    sig = hashed.groupBy("doc_id").agg(
        *[
            F.min((F.lit(a) * F.col("h") + F.lit(b)) % MINHASH_P).alias(f"mh{j}")
            for j, (a, b) in enumerate(minhash_coeffs())
        ]
    )
    bands = sig.select(
        "doc_id",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band"),
                    F.concat_ws(
                        ":",
                        *[F.col(f"mh{b * MINHASH_ROWS + r}").cast("string")
                          for r in range(MINHASH_ROWS)],
                    ).alias("key"),
                )
                for b in range(MINHASH_BANDS)
            ])
        ).alias("bk"),
    ).select("doc_id", "bk.band", "bk.key")
    # Skew guard: drop degenerate buckets (documented semantics).
    return bands.withColumn(
        "bucket_n", F.count("*").over(Window.partitionBy("band", "key"))
    ).filter(F.col("bucket_n") <= MINHASH_BUCKET_CAP)


def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate pairs via SimHash with per-block candidate
    blocking and Hamming ≤ ``SIMHASH_MAX_HAMMING`` (= 3) verification.

    The signature width is CORPUS-SCALED: 4 blocks ×
    ``simhash_block_bits(n)`` bits (48 bits at the test scale factors,
    growing to 60 as n does) — a fixed block width makes candidate
    work Σ chunk-bucket² ≈ n²/2^b, the same quadratic cliff as fixed
    LSH planes; scaling b with log2(n) holds per-doc candidate work
    constant (see ``functions.texthash``).

    The per-bit contribution sums are conditional SUM aggregates
    inside ONE ``groupBy(doc_id)`` — never an exploded (doc × token ×
    bit) grain: partial aggregation reduces each map partition to one
    wide row per doc before the single uniform-key shuffle.  (The
    exploded formulation measured bits× the shuffled rows for the
    same answer.)  Pigeonhole: a pair within Hamming distance 3 of a
    signature split into 4 blocks leaves at least one block untouched
    (3 < 4), so per-block-chunk candidate blocking is lossless at the
    declared threshold regardless of the scaled width."""
    # (doc_id, simhash) — memoized for the same reason as the MinHash
    # postings: the block join self-joins the signature frame, and the
    # cache keeps the wide-aggregate signature pass to one execution.
    sim = memo_frame(spark, sf_dir, ("simhash_sig",),
                     lambda: _build_simhash_signatures(spark, sf_dir))
    bb = simhash_block_bits(_n_docs(spark, sf_dir))
    mask = (1 << bb) - 1
    blocks = sim.select(
        "doc_id", "simhash",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(c).alias("blk"),
                    F.expr(f"(simhash >> {c * bb}) & {mask}")
                    .alias("chunk"),
                )
                for c in range(SIMHASH_BLOCKS)
            ])
        ).alias("b"),
    ).select("doc_id", "simhash", "b.blk", "b.chunk")
    pairs = (
        blocks.alias("x")
        .join(blocks.alias("y"), ["blk", "chunk"])
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(
            F.col("x.doc_id").alias("doc_a"),
            F.col("y.doc_id").alias("doc_b"),
            F.bit_count(
                F.col("x.simhash").bitwiseXOR(F.col("y.simhash"))
            ).alias("hamming"),
        )
        .filter(F.col("hamming") <= SIMHASH_MAX_HAMMING)
        .distinct()
    )
    return pairs.orderBy("doc_a", "doc_b")


def _build_simhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    bits = SIMHASH_BLOCKS * simhash_block_bits(_n_docs(spark, sf_dir))
    toks = (
        _docs(spark, sf_dir)
        .select("doc_id", F.explode(tokens("text")).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").cast("long").alias("cnt"))
        .withColumn("th", h15(F.col("tok")))
    )
    bit_sums = toks.groupBy("doc_id").agg(*[
        F.sum(F.col("cnt") * (((F.shiftright("th", i) % 2) * 2) - 1)).alias(f"s{i}")
        for i in range(bits)
    ])
    return bit_sums.select(
        "doc_id",
        sum(
            (F.when(F.col(f"s{i}") >= 0, F.lit(1 << i)).otherwise(F.lit(0))
             for i in range(1, bits)),
            start=F.when(F.col("s0") >= 0, F.lit(1)).otherwise(F.lit(0)),
        ).cast("long").alias("simhash"),
    )


def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact within-language 3-gram Jaccard join (pairs with j ≥ 0.5)
    over the stop-shingle-capped universe, via prefix-filtered
    inverted-index candidates — the classic distributed set-similarity
    join (AllPairs/PPJoin shape):

    1. universe: (doc, shingle) postings with shingles of per-language
       document frequency > ``NGRAM_DF_CAP`` dropped (declared
       stop-shingle semantics, mirrored in the DuckDB twin — work is
       Σ df², so the cap bounds the worst posting list the way
       ``MINHASH_BUCKET_CAP`` bounds the worst LSH bucket);
    2. candidates: self-join on (lang, shingle) restricted to each
       doc's *prefix* — its |A| − ⌈τ·|A|⌉ + 1 rarest shingles in the
       global (df, shingle) order.  Lossless: j(A,B) ≥ τ ⇒
       |A∩B| ≥ ⌈τ·max(|A|,|B|)⌉, so the canonically-smallest common
       shingle sits within both prefixes.  Rarest-first means the
       candidate join runs over the *smallest* posting lists — the
       Σ df² term collapses to the rare tail;
    3. a lossless length filter (j ≥ τ ⇒ τ·|B| ≤ |A| ≤ |B|/τ)
       further prunes candidates;
    4. verify: intersection sizes as join-group counts over the full
       capped postings, restricted to the candidate set — the same
       shape as the MinHash verify, cost Σ_cand (|A| + |B|).

    The DuckDB oracle keeps the naive all-pairs array formulation
    (over the same capped universe) as an independent implementation —
    the prefix filter is a plan-level optimization, invisible in the
    result."""
    return ngram_pairs(spark, sf_dir).orderBy("doc_a", "doc_b")


def cap_postings(sh: DataFrame) -> DataFrame:
    """Apply the stop-shingle cap to a raw (doc_id, lang, g) postings
    frame: per-language document frequency ``df`` (window over
    (lang, g)), drop shingles with df > ``NGRAM_DF_CAP``, and ``n`` =
    each doc's SURVIVING distinct-shingle count (window over doc_id).
    The ONE definition of the capped universe — the session build and
    the index store's read path both apply it, so the cap semantics
    cannot drift between the memo and persisted representations."""
    return (
        sh.withColumn(
            "df", F.count("*").over(Window.partitionBy("lang", "g"))
        )
        .filter(F.col("df") <= NGRAM_DF_CAP)
        .withColumn("n", F.count("*").over(Window.partitionBy("doc_id")))
    )


def capped_shingle_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, lang, g, df, n): the stop-shingle-capped similarity
    universe — shingle postings with per-language document frequency
    ``df`` ≤ ``NGRAM_DF_CAP`` and ``n`` = the doc's *surviving*
    distinct-shingle count (Jaccard on this path is declared over the
    capped sets).  Memoized: candidate generation, verification, and
    every ``ngram_pairs`` consumer read it.

    With the index store (``corpus.INDEX_DB_ENV``) the source is the
    persisted ``shingle_inv`` table — the UNCAPPED postings in
    INVERTED orientation (bucketed by the gram), append-only so
    ingestion batches extend it with batch-sized work
    (``sinks.index_store.extend_postings``) — and ``cap_postings``
    recomputes df/n over it at read.  Recomputing is the deliberate
    trade: a persisted CAPPED table would freeze document frequencies
    at build time, so appended batches could push a shingle past the
    cap without evicting its stale postings — the r11-declared
    append-unsafety.  Here df/n always reflect the true current
    corpus, and the expensive part (tokenize + shingle the text)
    never reruns.  The gram bucketing is what makes the recompute
    cheap at scale (the r12 verdict's prescription): the df window's
    required (lang, g) distribution is already satisfied by the
    bucketed scan, so the read plans ONE exchange — the SURVIVING
    postings to doc grain for ``n`` — instead of re-shuffling the
    whole table twice per application (pytest-pinned plan shape +
    row identity vs the doc-bucketed twin, fresh and extended).

    Session staleness: this frame memoizes per session, so a session
    that probed the store and THEN called ``extend_postings`` keeps
    the pre-append universe until ``conformed.model.release_memos``
    (fresh applications — the normal store consumer — always see the
    appended state)."""
    art = index_artifact(spark, "shingle_inv")
    if art is not None:
        # memoized like the build below — consumers re-read this frame
        # many times per session (memo_frame keys on the store toggle,
        # so mode flips never serve the other mode's frame)
        return memo_frame(spark, sf_dir, ("ngram_universe",),
                          lambda: cap_postings(art))

    def build() -> DataFrame:
        sh = shingle_rows(spark, sf_dir).select("doc_id", "lang", "g")
        return cap_postings(sh)

    return memo_frame(spark, sf_dir, ("ngram_universe",), build)


def q_postings_health(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drift audit for the near-dup inverted index — the text-side
    twin of ``similarity.q_ann_index_health``: is the stop-shingle
    cap (``NGRAM_DF_CAP``) still doing the right amount of work as
    the corpus grows?

    The capped universe is the foundation of every near-dup operator
    (``ngram_jaccard``, ``dedup_clusters``, ``dedup_incremental``) and
    with the index store it is long-lived: ``extend_postings`` appends
    batches to the raw postings and the cap re-applies at read.  Two
    failure directions, both silent without this signal: a growing
    corpus pushes ever more legitimate shingles past the FIXED cap
    (capped_postings_rate climbs — recall loss), or boilerplate
    floods in below the cap (max_df/p99_df climb toward it — the
    Σ df² candidate-join bound erodes).  One (metric, value) row
    each for: postings/shingle/doc counts, max/p99 document
    frequency (exact nearest-rank over the per-shingle df multiset,
    computed on the df HISTOGRAM — the ranking window runs over
    distinct integer frequency values, a grain far below the shingle
    vocabulary and bounded by the corpus's frequency spectrum, not
    its size), the cap itself, the count/mass/rate of capped-out
    postings, and the surviving mean postings per shingled doc.

    With ``SPARK_GRAFT_INDEX_DB`` set the audit reads the REAL
    on-disk index, however many batches have been appended — the df
    aggregate from the gram-bucketed ``shingle_inv`` (exchange-free:
    the (lang, g) groupBy is satisfied by the bucketing) and the doc
    census from the doc-bucketed ``shingle_raw`` (ditto for the
    doc_id distinct); each orientation serves the grain it is
    clustered on.  ORDER BY metric."""
    art = index_artifact(spark, "shingle_inv")
    sh = (art if art is not None
          else shingle_rows(spark, sf_dir).select("doc_id", "lang", "g"))
    art_fwd = index_artifact(spark, "shingle_raw")
    sh_fwd = art_fwd if art_fwd is not None else sh
    dfs = sh.groupBy("lang", "g").agg(
        F.count("*").cast("long").alias("df"))
    # bounded by the frequency SPECTRUM, not the vocabulary: k
    # distinct integer dfs d1<…<dk satisfy Σdi ≥ k(k+1)/2 and
    # Σdi ≤ n_postings, so k ≤ √(2·n_postings) — declared via the
    # shared contract (functions.bounded), enforced under
    # SPARK_GRAFT_CHECK_BOUNDS
    hist = bounded_global_frame(
        dfs.groupBy("df").agg(F.count("*").cast("long").alias("cnt")),
        lambda: int((2 * sh.count()) ** 0.5) + 1,
        "postings_health df histogram (√(2·n_postings) spectrum)",
    )
    whole = Window.partitionBy()
    cum = hist.select(
        "df",
        F.sum("cnt").over(Window.orderBy("df")).alias("cum"),
        F.sum("cnt").over(whole).cast("long").alias("n_sh"),
    )
    p99 = (
        cum.filter(F.col("cum") >= F.ceil(F.lit(0.99) * F.col("n_sh")))
        .agg(F.min("df").cast("long").alias("p99_df"))
    )
    stats = dfs.agg(
        F.count("*").cast("long").alias("n_shingles"),
        F.max("df").alias("max_df"),
        F.sum("df").cast("long").alias("n_postings"),
        F.sum(F.when(F.col("df") > NGRAM_DF_CAP, 1).otherwise(0))
        .cast("long").alias("capped_shingles"),
        F.sum(F.when(F.col("df") > NGRAM_DF_CAP, F.col("df"))
              .otherwise(0)).cast("long").alias("capped_postings"),
    )
    docs = sh_fwd.agg(
        F.countDistinct("doc_id").cast("long").alias("shingled_docs"))
    return (
        stats.crossJoin(F.broadcast(p99)).crossJoin(F.broadcast(docs))
        .selectExpr(
            f"stack(10, "
            f"'capped_postings', CAST(capped_postings AS DOUBLE), "
            f"'capped_postings_rate', "
            f"CAST(capped_postings AS DOUBLE) / n_postings, "
            f"'capped_shingles', CAST(capped_shingles AS DOUBLE), "
            f"'df_cap', CAST({NGRAM_DF_CAP} AS DOUBLE), "
            f"'max_df', CAST(max_df AS DOUBLE), "
            f"'n_postings', CAST(n_postings AS DOUBLE), "
            f"'n_shingles', CAST(n_shingles AS DOUBLE), "
            f"'p99_df', CAST(p99_df AS DOUBLE), "
            f"'shingled_docs', CAST(shingled_docs AS DOUBLE), "
            f"'surviving_mean_per_doc', "
            f"CAST(n_postings - capped_postings AS DOUBLE) / shingled_docs"
            f") as (metric, value)"
        )
        .orderBy("metric")
    )


def ngram_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(lang, doc_a, doc_b, jaccard) near-dup pairs, unordered — the
    shared edge source for ``q_ngram_jaccard``, ``q_dedup_clusters``
    (via ``_dup_edges``) and ``q_dedup_incremental`` (see the first
    for the plan-shape and stop-shingle notes).  Memoized: the
    candidate join + verify is the dedup path's most expensive stage
    and three queries consume its output; the frame is true-pair
    grain (MEMORY_AND_DISK, spills rather than OOMs at scale)."""
    return memo_frame(spark, sf_dir, ("ngram_pairs",),
                      lambda: _build_ngram_pairs(spark, sf_dir))


def _prefix_postings(univ: DataFrame, tau: float) -> DataFrame:
    """Prefix postings: each doc's n − ⌈τ·n⌉ + 1 rarest shingles in
    the global (df, g) order.  τ = 0.5 is dyadic, so ceil(τ·n) over a
    double is exact for every integer n.  Lossless: j(A,B) ≥ τ ⇒ the
    canonically-smallest common shingle sits within BOTH prefixes —
    which also means a candidate join between any two SUBSETS of the
    corpus may restrict each side's prefix frame to its subset
    (``_build_cross_ngram_pairs``)."""
    return (
        univ.withColumn(
            "r",
            F.row_number().over(
                Window.partitionBy("doc_id").orderBy("df", "g")
            ),
        )
        .filter(F.col("r") <= F.col("n") - F.ceil(F.lit(tau) * F.col("n")) + 1)
        .select("lang", "g", "doc_id", "n")
    )


def _jaccard_verify(univ: DataFrame, cand: DataFrame,
                    tau: float) -> DataFrame:
    """Exact-Jaccard verify of a candidate pair frame: intersection
    sizes as join-group counts over the full capped postings,
    restricted to the candidates — cost Σ_cand (|A| + |B|)."""
    post = univ.select("doc_id", "n", "g")
    overlaps = (
        cand
        .join(
            post.select(F.col("doc_id").alias("doc_a"),
                        F.col("n").alias("na"), F.col("g")),
            "doc_a",
        )
        .join(
            post.select(F.col("doc_id").alias("doc_b"),
                        F.col("n").alias("nb"), F.col("g")),
            ["doc_b", "g"],
        )
        .groupBy("lang", "doc_a", "doc_b", "na", "nb")
        .agg(F.count("*").alias("o"))
    )
    return (
        overlaps.select(
            "lang", "doc_a", "doc_b",
            (F.col("o").cast("double") / (F.col("na") + F.col("nb") - F.col("o")))
            .alias("jaccard"),
        )
        .filter(F.col("jaccard") >= tau)
    )


def _build_ngram_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    univ = capped_shingle_rows(spark, sf_dir)
    tau = MINHASH_JACCARD_MIN
    pre = _prefix_postings(univ, tau)
    cand = (
        pre.alias("x")
        .join(pre.alias("y"), ["lang", "g"])
        .filter(
            (F.col("x.doc_id") < F.col("y.doc_id"))
            # lossless length filter for j >= tau
            & (F.col("x.n") >= tau * F.col("y.n"))
            & (F.col("y.n") >= tau * F.col("x.n"))
        )
        .select(
            "lang",
            F.col("x.doc_id").alias("doc_a"),
            F.col("y.doc_id").alias("doc_b"),
        )
        .distinct()
    )
    return _jaccard_verify(univ, cand, tau)


def _build_cross_ngram_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CROSS-boundary near-dup pairs only (existing even × new odd) —
    the store-mode plan for ``q_dedup_incremental``'s near branch.

    The full ``ngram_pairs`` self-join computes existing×existing and
    new×new pairs the incremental probe then throws away; since the
    probe consumes only cross pairs, candidate generation may join the
    EXISTING side's prefix postings against the NEW side's — work is
    Σ_g |pre_even_g|·|pre_odd_g|, batch-sized on one side, instead of
    the corpus-quadratic Σ_g |pre_g|².  Lossless per the prefix-filter
    subset argument (``_prefix_postings``) and invisible in the
    result: the amortization probe (docs/SCALE_PROBE.md) is where the
    saving is recorded.  Default (memo) mode keeps the shared full
    pair frame so the three full-corpus consumers build it once."""
    univ = capped_shingle_rows(spark, sf_dir)
    tau = MINHASH_JACCARD_MIN
    pre = _prefix_postings(univ, tau)
    old = pre.filter(F.col("doc_id") % 2 == 0)
    new = pre.filter(F.col("doc_id") % 2 == 1)
    cand = (
        old.alias("x")
        .join(new.alias("y"), ["lang", "g"])
        .filter(
            (F.col("x.n") >= tau * F.col("y.n"))
            & (F.col("y.n") >= tau * F.col("x.n"))
        )
        .select(
            "lang",
            F.least("x.doc_id", "y.doc_id").alias("doc_a"),
            F.greatest("x.doc_id", "y.doc_id").alias("doc_b"),
        )
        .distinct()
    )
    return _jaccard_verify(univ, cand, tau)


def _dup_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Undirected duplicate-graph edges ``(a, b)`` with ``a < b``:
    exact-content duplicates (star edges group-min → member, so a
    k-group contributes k−1 edges, never k²) unioned with the
    verified n-gram Jaccard near-dup pairs."""
    d = content_digest_frame(spark, sf_dir)
    groups = (
        d.groupBy("content_md5")
        .agg(F.min("doc_id").alias("m"), F.count("*").alias("c"))
        .filter(F.col("c") >= 2)
    )
    exact = (
        d.join(groups, "content_md5")
        .filter(F.col("doc_id") > F.col("m"))
        .select(F.col("m").alias("a"), F.col("doc_id").alias("b"))
    )
    near = ngram_pairs(spark, sf_dir).select(
        F.col("doc_a").alias("a"), F.col("doc_b").alias("b")
    )
    return exact.union(near).distinct()


def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster assignment: connected components of the
    duplicate graph (exact-dup edges ∪ near-dup Jaccard pairs), each
    doc labeled with the minimum doc_id of its component.

    Algorithm: ``functions.graph.connected_components`` — distributed
    min-label propagation with pointer jumping, O(log diameter)
    rounds, localCheckpoint-truncated lineage, no driver state (see
    that module for the scale notes).

    Output: (cluster_id, doc_id, cluster_size) for every doc in the
    duplicate graph — singleton docs have no edges and are omitted,
    so every cluster has size ≥ 2.

    The converged label frame is memoized per session: cluster
    assignment is a pipeline artifact (every downstream consumer —
    reject lists, representative picks, stats — reads the same
    labels), and the iterative loop is the one operator here whose
    cost is driver-round-trip-bound, so recomputing it per consumer
    would multiply a fixed O(log d)-round latency for no new data."""
    comp = memo_frame(
        spark, sf_dir, ("dup_components",),
        lambda: connected_components(_dup_edges(spark, sf_dir)),
    )
    return (
        comp.select(
            F.col("component").alias("cluster_id"),
            F.col("node").alias("doc_id"),
        )
        .withColumn(
            "cluster_size",
            F.count("*").over(Window.partitionBy("cluster_id")),
        )
        .orderBy("cluster_id", "doc_id")
    )


def q_dedup_keep_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup family's actionable artifact: for every document in
    the duplicate graph, keep-or-drop plus the representative kept in
    its place.  The representative is the cluster's minimum doc_id
    (the cluster label itself), so the decision is a pure projection
    over the memoized component frame — no extra joins or shuffles
    beyond ``q_dedup_clusters``.  Documents outside the graph
    (singletons) are implicitly kept and omitted, as in the cluster
    view."""
    return (
        q_dedup_clusters(spark, sf_dir)
        .select(
            "doc_id",
            (F.col("doc_id") == F.col("cluster_id")).alias("keep"),
            F.col("cluster_id").alias("rep_doc"),
            "cluster_size",
        )
        .orderBy("doc_id")
    )
