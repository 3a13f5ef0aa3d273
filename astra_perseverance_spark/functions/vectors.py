"""Cross-engine deterministic vector math.

Embeddings are float32; naive float summation order differs between
engines, so every reduction here happens in *exact integer* space:

1. Quantize each component to 1e-6 fixed point with
   ``floor(x * 1e6 + 0.5)`` (identical half-up-toward-+inf rounding in
   Spark and DuckDB — neither engine's ``round()`` is used because
   Spark rounds HALF_UP and DuckDB HALF_EVEN).
2. Dot products and squared norms are BIGINT sums of BIGINT products —
   associative, so partition order cannot change the result.
   Magnitudes: |x| ≤ ~1 ⇒ |q| ≤ ~1e6; 64-dim dot ≤ 64·1e12 ≪ 2^63.
3. The only float op is the final ``dot / (sqrt(n_a) * sqrt(n_b))`` —
   one fixed expression tree, bit-identical IEEE in both engines.

Random-hyperplane LSH uses integer hyperplanes generated from the
(plane, dim) index by modular arithmetic — again exact on both sides.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

QUANT = 1_000_000  # fixed-point scale

# Random-hyperplane LSH over 64 dims.  The plane count SCALES WITH THE
# CORPUS (``plane_count``): with a fixed plane count, Σ bucket² — the
# bucket-local join's work — grows quadratically in n; scaling planes
# ≈ log2(n / target) keeps the expected bucket size (and so the work
# per vector) constant as the corpus grows, the same way shuffle
# partitions scale with input volume.
ANN_BUCKET_TARGET = 4   # expected vectors per bucket
ANN_PLANES_MIN = 6
ANN_PLANES_MAX = 24
ANN_DIM = 64
ANN_TOPK = 10


def plane_count(n_vectors: int) -> int:
    """Smallest plane count giving ≥ n/ANN_BUCKET_TARGET buckets,
    clamped to [MIN, MAX] — integer-exact via bit_length (a libm
    ``log2`` could flip the count near powers of two where Java and C
    differ in the last ulp; the DuckDB twin ``plane_count_sql`` uses
    the binary-string length, which is the same integer)."""
    m = max(1, -(-n_vectors // ANN_BUCKET_TARGET))
    return min(ANN_PLANES_MAX, max(ANN_PLANES_MIN, (m - 1).bit_length()))


def plane_count_sql(count_expr: str) -> str:
    """DuckDB twin of :func:`plane_count` (bin-string length =
    bit_length for positive ints; bin(0) = '0' has length 1, but both
    engines clamp to ANN_PLANES_MIN there)."""
    m = f"greatest(({count_expr} + {ANN_BUCKET_TARGET - 1}) // {ANN_BUCKET_TARGET}, 1)"
    return (
        f"least(greatest(length(bin({m} - 1)), {ANN_PLANES_MIN}), "
        f"{ANN_PLANES_MAX})"
    )

# Hyperplane component v(j, d) ∈ [-999, 999], from deterministic
# modular arithmetic (mirrored literally in the DuckDB twin).
_HP_A = 1315423911
_HP_B = 2654435761
_HP_M = 1999


def quantize(col: Column) -> Column:
    """array<float> → array<bigint> fixed-point (1e-6)."""
    return F.transform(
        col, lambda x: F.floor(x.cast("double") * QUANT + F.lit(0.5)).cast("long")
    )


def quantize_sql(expr: str) -> str:
    return (
        f"list_transform({expr}, x -> "
        f"CAST(floor(CAST(x AS DOUBLE) * {QUANT} + 0.5) AS BIGINT))"
    )


def dot_q(a: Column, b: Column) -> Column:
    """Exact BIGINT dot product of two quantized vectors."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def dot_q_sql(a: str, b: str, dim: int = ANN_DIM) -> str:
    """DuckDB twin (1-based list index; HUGEINT sum cast back)."""
    return (
        f"CAST(list_sum(list_transform(range({dim}), i -> "
        f"({a})[CAST(i+1 AS INT)] * ({b})[CAST(i+1 AS INT)])) AS BIGINT)"
    )


def norm2_q(a: Column) -> Column:
    return dot_q(a, a)


def cosine(dot: Column, n2a: Column, n2b: Column) -> Column:
    """dot / (sqrt(n2a) * sqrt(n2b)) — the single float expression.

    ``try_divide``, not ``/``: a vector whose 64 components all
    quantize to zero has n2 = 0, and under Spark 4's default ANSI
    mode a plain division would raise DIVIDE_BY_ZERO and kill the
    whole query on one degenerate row.  try_divide yields NULL there
    — which is also what DuckDB's ``/`` returns, so the twins agree:
    a zero-norm vector has no defined cosine and simply never ranks."""
    return F.try_divide(
        dot.cast("double"),
        F.sqrt(n2a.cast("double")) * F.sqrt(n2b.cast("double")),
    )


def hyperplane_bucket(eq: Column, planes: int) -> Column:
    """LSH bucket id: sign bits of ``planes`` integer hyperplane
    projections (``planes`` from :func:`plane_count` at the corpus'
    cardinality — a driver-side scalar folded into the plan).

    Exact integer arithmetic throughout: bucket =
    Σ_j [Σ_d eq[d]·v(j,d) ≥ 0] << j with
    v(j,d) = ((A·(j+1) + B·(d+1)) mod 1999) − 999."""
    def proj(j: int) -> Column:
        return F.aggregate(
            F.zip_with(
                eq,
                F.sequence(F.lit(1), F.lit(ANN_DIM)),
                lambda x, d: x * ((F.lit(_HP_A * (j + 1)) + F.lit(_HP_B) * d) % _HP_M - 999),
            ),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )

    out = F.lit(0).cast("long")
    for j in range(planes):
        out = out + F.when(proj(j) >= 0, F.lit(1 << j).cast("long")).otherwise(F.lit(0))
    return out


def hyperplane_bucket_sql(eq: str, dim: int = ANN_DIM,
                          planes_col: str = "pl.p") -> str:
    """DuckDB twin: all ANN_PLANES_MAX projections unrolled, each
    masked by ``j < planes_col`` (the plane count is data-dependent in
    SQL, so the term count cannot be fixed at build time the way the
    Spark side's driver-scalar loop can)."""
    terms = []
    for j in range(ANN_PLANES_MAX):
        proj = (
            f"CAST(list_sum(list_transform(range({dim}), d -> "
            f"({eq})[CAST(d+1 AS INT)] * "
            f"(({_HP_A * (j + 1)} + {_HP_B}::BIGINT * (d+1)) % {_HP_M} - 999))) AS BIGINT)"
        )
        terms.append(
            f"(CASE WHEN {j} < {planes_col} AND {proj} >= 0 "
            f"THEN {1 << j} ELSE 0 END)"
        )
    return "(" + " + ".join(terms) + ")::BIGINT"
