"""Cross-engine deterministic text hashing.

Every hash here is defined so Spark and DuckDB compute the *identical*
64-bit integer from the same string — the extension queries' oracle
parity depends on it:

- ``h15``: the first 15 hex chars of md5 (60 bits, always positive)
  parsed as an integer.  Spark: ``conv(substr(md5(x),1,15),16,10)``;
  DuckDB lacks ``conv`` so the twin re-implements the hex parse with a
  shift/sum over the 15 nibbles (see ``h15_sql``).
- MinHash permutations: ``(a_j * (h15 % P) + b_j) % P`` with
  ``P = 1e9+7``; the reduction keeps every product < 2^61 so BIGINT
  arithmetic never overflows in either engine.
- Rolling char-gram hash: polynomial base 257 mod 2^61-1 over ASCII
  codes — pure integer arithmetic, no md5 per gram.

All constants are generated in Python and embedded as literals on both
sides, which makes parity trivially auditable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Modulus for MinHash permutations (prime, < 2^30 so a*h + b < 2^61).
MINHASH_P = 1_000_000_007

# Number of MinHash functions and the LSH banding (bands × rows = n).
MINHASH_N = 16
MINHASH_BANDS = 8
MINHASH_ROWS = 2  # per band

# Candidate buckets larger than this are dropped (skew guard: a
# degenerate shingle shared by everything would otherwise make one
# bucket quadratic; real pairs still meet in their other 7 bands).
MINHASH_BUCKET_CAP = 100

# Pairs below this exact-Jaccard threshold are filtered after LSH.
MINHASH_JACCARD_MIN = 0.5

# Stop-shingle cap for the exact-Jaccard path: shingles whose
# per-language document frequency exceeds this are boilerplate, not
# signal, and are excluded from the similarity universe (declared
# semantics, mirrored in the DuckDB twins).  This is the posting-list
# analog of MINHASH_BUCKET_CAP: the inverted-index join's work is
# Σ df(shingle)², so one shingle shared by 10⁶ docs would otherwise
# make a single 10¹²-pair bucket at corpus scale.  At the test scale
# factors no shingle reaches the cap (max df: 5 at sf0.01, 14 at
# sf0.1), so results there are unchanged.
NGRAM_DF_CAP = 50

# SimHash candidate blocking: 4 blocks, CORPUS-SCALED block width.
# Pigeonhole guarantee: a pair with Hamming distance d touches at most
# d blocks, so with d ≤ BLOCKS − 1 at least one block is identical and
# per-block-chunk candidate generation is LOSSLESS.  (d up to 6 would
# need ≥ 7 blocks of ≤ 7 bits each — 128 distinct block values, i.e.
# ~n²/128 candidate pairs: quadratic at scale.  d = 3 over 4 blocks is
# the standard Manku-et-al. operating point.)
#
# The block WIDTH grows with the corpus (the ``vectors.plane_count``
# pattern): with a fixed width b each block's candidate work is
# Σ chunk-bucket² ≈ n²/2^b — the round-3 fixed-LSH-planes bug in a new
# coat.  Scaling b ≈ log2(n / TARGET) holds expected docs-per-chunk
# (and so per-doc candidate work) constant as n grows.  Width is
# clamped to 15 so the 4-block signature stays ≤ 60 bits — far from
# the BIGINT sign on both engines.  At the test scale factors
# (≤ 5 000 docs) the clamp floor keeps the historical 12-bit blocks,
# so results there are unchanged.
SIMHASH_BLOCKS = 4
SIMHASH_MAX_HAMMING = SIMHASH_BLOCKS - 1
SIMHASH_BLOCK_TARGET = 4       # expected docs per chunk value
SIMHASH_BLOCK_BITS_MIN = 12
SIMHASH_BLOCK_BITS_MAX = 15    # 4 × 15 = 60-bit signature max


def simhash_block_bits(n_docs: int) -> int:
    """Smallest block width giving ≥ n/TARGET chunk values, clamped —
    integer-exact via bit_length (same rationale as
    ``vectors.plane_count``: a libm log2 could differ in the last ulp
    between engines; the DuckDB twin uses bin-string length)."""
    m = max(1, -(-n_docs // SIMHASH_BLOCK_TARGET))
    return min(SIMHASH_BLOCK_BITS_MAX,
               max(SIMHASH_BLOCK_BITS_MIN, (m - 1).bit_length()))


def simhash_block_bits_sql(count_expr: str) -> str:
    """DuckDB twin of :func:`simhash_block_bits`."""
    m = (f"greatest(({count_expr} + {SIMHASH_BLOCK_TARGET - 1}) "
         f"// {SIMHASH_BLOCK_TARGET}, 1)")
    return (f"least(greatest(length(bin({m} - 1)), "
            f"{SIMHASH_BLOCK_BITS_MIN}), {SIMHASH_BLOCK_BITS_MAX})")

# Rolling char-gram fingerprint (winnowing-lite).
FP_GRAM = 5                 # char n-gram width
FP_WINDOW = 8               # winnowing window (min-hash per window)
FP_BASE = 257
FP_MOD = (1 << 61) - 1      # Mersenne prime 2^61-1


def minhash_coeffs(n: int = MINHASH_N) -> list[tuple[int, int]]:
    """Deterministic (a_j, b_j) pairs for the j-th permutation."""
    return [
        ((2654435761 * (j + 1)) % MINHASH_P, (40503 * 65537 * (j + 1) + 17) % MINHASH_P)
        for j in range(n)
    ]


# --- Spark side -----------------------------------------------------------

def tokens(col: str | Column) -> Column:
    """Lower-cased word tokens (ASCII alnum runs)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(F.lower(c), F.lit("[a-z0-9]+"), 0)


def h15(col: Column) -> Column:
    """md5-prefix 60-bit positive hash of a string column."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def h15_sql(expr: str) -> str:
    """DuckDB twin of :func:`h15` (no conv(); parse 15 nibbles)."""
    return (
        "CAST(list_sum(list_transform(range(15), i -> "
        f"((strpos('0123456789abcdef', substr(md5({expr}), CAST(i+1 AS INT), 1)) - 1)::BIGINT"
        " << CAST(4*(14 - i) AS INT)))) AS BIGINT)"
    )


def word_shingles_sql(tok_expr: str, k: int = 3) -> str:
    """Distinct k-word shingles (DuckDB; 1-based list indexing).  The
    Spark side builds the same set row-wise — ``dedup.shingle_rows``
    (posexplode + lead window, codegen-friendly) — so there is no
    array-valued Spark twin of this helper."""
    joins = " || ' ' || ".join(f"({tok_expr})[CAST(i + {d + 1} AS INT)]" for d in range(k))
    return (
        f"list_distinct(list_transform(range(greatest(len({tok_expr}) - {k - 1}, 0)), "
        f"i -> {joins}))"
    )
