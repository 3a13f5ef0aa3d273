"""Training-prep operators: token-window chunking, markup extraction,
and script (writing-system) profiling.

These are the document-shaping steps between raw ingest and
tokenization in an LLM data pipeline: cut documents into
fixed-token-window chunks with overlap, strip markup down to clean
text, and profile the character classes so routing/filters can key on
writing system.

Scale shape:

- Chunking is per-doc local: an explode over the chunk-index sequence
  plus ``slice``/``array_join`` projections — no shuffle except the
  output sort.  Chunk count ≈ tokens/stride, so output volume tracks
  corpus volume; nothing is quadratic.
- Markup extraction is a fixed chain of ``regexp_replace`` — narrow,
  codegen'd, zero shuffle.  All patterns are RE2-safe (no lookaround)
  so the DuckDB twins run the identical expressions.
- Script profiling computes each class count as
  ``length(text) − length(remove-class)`` — one pass per class over
  the row, pure JVM.

The test corpus carries no real HTML, so ``html_extract`` builds a
deterministic wrapper (entity-escaped text inside tags + comment +
script block) and then extracts it back — the round-trip invariant
(clean text == whitespace-normalized original) is asserted per row and
hash-checked against the oracle, which exercises exactly the
strip/decode chain a real extractor runs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from astra_perseverance_spark.extensions.corpus import docs_frame as _docs
from astra_perseverance_spark.functions.texthash import tokens

# Chunking: CHUNK_LEN-token windows starting every CHUNK_STRIDE tokens
# (CHUNK_LEN − CHUNK_STRIDE tokens of overlap); the tail chunk may be
# shorter.  A chunk starts at every k·STRIDE < n_tokens.
CHUNK_LEN = 128
CHUNK_STRIDE = 96

# Script profiling char classes, in declared dominance order.  The
# \\x{...} escape is shared Java-regex / RE2 syntax, so the identical
# pattern string runs on both engines.
SCRIPT_CLASSES: list[tuple[str, str]] = [
    ("latin", "[A-Za-z]"),
    ("digit", "[0-9]"),
    ("cjk", "[\\x{4E00}-\\x{9FFF}]"),
    ("cyrillic", "[\\x{0400}-\\x{04FF}]"),
    ("space", "\\s"),
]


def q_doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-token-window chunking with overlap — the unit a training
    pipeline feeds the tokenizer.

    Emits one row per (doc, chunk): start offset, chunk token count,
    and the md5 of the space-joined chunk tokens (the chunk text
    itself stays out of the result — at 100 TB the ledger is what
    moves between stages, not another copy of the corpus).

    Per-doc local work: ``explode(sequence(0, n_chunks−1))`` then
    ``slice`` + ``array_join`` — O(chunks · CHUNK_LEN) per doc, no
    shuffle before the output sort."""
    d = _docs(spark, sf_dir).select(
        "doc_id", tokens("text").alias("toks")
    ).withColumn("n", F.size("toks").cast("long")).filter(F.col("n") > 0)
    n_chunks = F.floor((F.col("n") + CHUNK_STRIDE - 1) / CHUNK_STRIDE).cast("long")
    chunks = d.select(
        "doc_id", "toks", "n",
        F.explode(F.sequence(F.lit(0).cast("long"), n_chunks - 1)).alias("k"),
    )
    start = (F.col("k") * CHUNK_STRIDE).cast("long")
    return (
        chunks.select(
            "doc_id",
            F.col("k").cast("int").alias("chunk_id"),
            start.alias("start_tok"),
            F.least(F.lit(CHUNK_LEN).cast("long"), F.col("n") - start)
            .alias("n_tok"),
            F.md5(F.array_join(
                F.slice("toks", start + 1, CHUNK_LEN), " "
            )).alias("chunk_md5"),
        )
        .orderBy("doc_id", "chunk_id")
    )


# Entity escape (build side) and decode (extract side).  Decode order
# is the standard one: named/numeric entities first, ``&amp;`` LAST so
# escaped ampersands cannot double-decode.
_HTML_DECODE: list[tuple[str, str]] = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
]


def _escaped_text() -> Column:
    c = F.regexp_replace(F.col("text"), "&", "&amp;")
    c = F.regexp_replace(c, "<", "&lt;")
    return F.regexp_replace(c, ">", "&gt;")


def _wrap_html() -> Column:
    """Deterministic HTML wrapper: escaped body text inside a <p>,
    plus a comment, attributes, and a <script> block that must be
    dropped wholesale (mirrored verbatim in the oracle)."""
    did = F.col("doc_id").cast("string")
    return F.concat(
        F.lit('<html lang="en"><body data-doc="'), did, F.lit('">'),
        F.lit("<!-- id:"), did, F.lit(" -->"),
        F.lit('<p class="main">'), _escaped_text(), F.lit("</p>"),
        F.lit('<script type="text/javascript">if (1 &lt; 2) '
              '{ x = "&amp;"; }</script>'),
        F.lit("</body></html>"),
    )


def q_html_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markup → clean text: drop script blocks and comments wholesale,
    strip tags, decode entities, collapse whitespace — then assert the
    round trip (clean == whitespace-normalized original) per row.

    The strip chain is the real operator; the wrapper build exists
    because the fixtures carry no markup (see module docstring)."""
    d = _docs(spark, sf_dir).select(
        "doc_id", "text", _wrap_html().alias("html")
    )
    clean = F.regexp_replace(
        F.col("html"), r"(?s)<script[^>]*>.*?</script>", " ")
    clean = F.regexp_replace(clean, r"(?s)<!--.*?-->", " ")
    clean = F.regexp_replace(clean, r"<[^>]*>", " ")
    for ent, ch in _HTML_DECODE:
        clean = F.regexp_replace(clean, ent, ch)
    clean = F.trim(F.regexp_replace(clean, r"\s+", " "))
    norm_orig = F.trim(F.regexp_replace(F.col("text"), r"\s+", " "))
    return (
        d.select(
            "doc_id",
            F.length("html").cast("long").alias("n_chars_html"),
            F.length(clean).cast("long").alias("n_chars_clean"),
            F.md5(clean).alias("clean_md5"),
            (F.md5(clean) == F.md5(norm_orig)).alias("roundtrip_ok"),
            (F.lit(1.0) - F.length(clean).cast("double")
             / F.length("html")).alias("removed_frac"),
        )
        .orderBy("doc_id")
    )


def q_script_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document writing-system profile: character-class fractions
    (latin / digit / cjk / cyrillic / whitespace / other) plus the
    dominant class — the signal routing and language filters key on.

    Each count is ``length(text) − length(regexp_replace(text, class,
    ''))`` — exact integers, one double division per fraction;
    dominance is a strictly-greater argmax in declared class order
    (ties keep the earlier class), the ``lang_id`` pattern."""
    d = _docs(spark, sf_dir).select("doc_id", "text").withColumn(
        "n", F.length("text").cast("long")
    ).filter(F.col("n") > 0)
    counts = [
        (name,
         (F.col("n") - F.length(F.regexp_replace("text", pat, "")))
         .cast("long"))
        for name, pat in SCRIPT_CLASSES
    ]
    d = d.select(
        "doc_id", "n",
        *[c.alias(f"c_{name}") for name, c in counts],
    ).withColumn(
        "c_other",
        F.col("n") - sum(
            (F.col(f"c_{name}") for name, _ in SCRIPT_CLASSES[1:]),
            start=F.col(f"c_{SCRIPT_CLASSES[0][0]}"),
        ),
    )
    order = [name for name, _ in SCRIPT_CLASSES] + ["other"]
    dominant: Column = F.lit(order[0])
    best: Column = F.col(f"c_{order[0]}")
    for name in order[1:]:
        cur = F.col(f"c_{name}")
        dominant = F.when(cur > best, F.lit(name)).otherwise(dominant)
        best = F.when(cur > best, cur).otherwise(best)
    return (
        d.select(
            "doc_id", "n",
            *[(F.col(f"c_{name}").cast("double") / F.col("n"))
              .alias(f"{name}_frac") for name in order],
            dominant.alias("dominant"),
        )
        .orderBy("doc_id")
    )


# Boilerplate lines: a trimmed non-empty line appearing in at least
# this many distinct documents.
BOILERPLATE_MIN_DOCS = 2


def q_repeated_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document repeated lines — the boilerplate detector
    (headers, footers, nav text repeat across pages; in-document
    repetition is ``quality_signals.dup_line_frac``, this is the
    corpus-wide complement).

    One explode + one line-keyed groupBy with map-side partial
    aggregation: the shuffle carries (line_md5, partials), never
    documents.  Lines are reported as md5 + length so the ledger stays
    narrow at any scale; ``rep_doc``/``n_docs``/``n_occ`` drive the
    removal pass."""
    lines = (
        _docs(spark, sf_dir)
        .select("doc_id", F.explode(F.split("text", "\n")).alias("line"))
        .select("doc_id", F.trim("line").alias("line"))
        .filter(F.length("line") > 0)
        # digest BEFORE the shuffle: grouping on the raw line would
        # ship full boilerplate text (license headers, nav blobs) in
        # every map-side partial — the digest key keeps shuffle rows
        # fixed-width, which is the narrow-ledger property the
        # docstring promises
        .select(
            "doc_id",
            F.md5("line").alias("line_md5"),
            F.length("line").cast("long").alias("line_len"),
        )
    )
    return (
        lines.groupBy("line_md5", "line_len")
        .agg(
            F.countDistinct("doc_id").cast("long").alias("n_docs"),
            F.count("*").cast("long").alias("n_occ"),
            F.min("doc_id").alias("rep_doc"),
        )
        .filter(F.col("n_docs") >= BOILERPLATE_MIN_DOCS)
        .select("line_md5", "line_len", "n_docs", "n_occ", "rep_doc")
        .orderBy("rep_doc", "line_md5")
    )


def q_token_rarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token-rarity profile over the corpus vocabulary:
    for each doc's DISTINCT tokens, the mean and minimum corpus
    document frequency and the count of corpus-unique (df = 1)
    tokens — the exact-arithmetic stand-in for LM-perplexity quality
    scoring (no libm log, so the DuckDB twin is bitwise).

    Two shuffles, both on aggregated grains: token-keyed df counting
    (vocabulary grain), then doc-keyed stats (document grain) — the
    same shape as TF-IDF without the float idf."""
    toks = (
        _docs(spark, sf_dir)
        .select("doc_id", F.explode(F.array_distinct(tokens("text")))
                .alias("tok"))
    )
    df_tbl = toks.groupBy("tok").agg(
        F.count("*").cast("long").alias("df"))
    return (
        toks.join(df_tbl.hint("shuffle_hash"), "tok")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_distinct"),
            (F.sum("df").cast("double") / F.count("*"))
            .alias("mean_token_df"),
            F.min("df").alias("min_token_df"),
            F.sum(F.when(F.col("df") == 1, 1).otherwise(0)).cast("long")
            .alias("n_unique_tokens"),
        )
        .orderBy("doc_id")
    )
