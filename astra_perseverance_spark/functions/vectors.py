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

# Random-hyperplane LSH: 12 planes over 64 dims → 4096 buckets.
ANN_PLANES = 12
ANN_DIM = 64
ANN_TOPK = 10

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
    """dot / (sqrt(n2a) * sqrt(n2b)) — the single float expression."""
    return dot.cast("double") / (
        F.sqrt(n2a.cast("double")) * F.sqrt(n2b.cast("double"))
    )


def hyperplane_bucket(eq: Column) -> Column:
    """LSH bucket id: sign bits of 12 integer hyperplane projections.

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
    for j in range(ANN_PLANES):
        out = out + F.when(proj(j) >= 0, F.lit(1 << j).cast("long")).otherwise(F.lit(0))
    return out


def hyperplane_bucket_sql(eq: str, dim: int = ANN_DIM) -> str:
    terms = []
    for j in range(ANN_PLANES):
        proj = (
            f"CAST(list_sum(list_transform(range({dim}), d -> "
            f"({eq})[CAST(d+1 AS INT)] * "
            f"(({_HP_A * (j + 1)} + {_HP_B}::BIGINT * (d+1)) % {_HP_M} - 999))) AS BIGINT)"
        )
        terms.append(f"(CASE WHEN {proj} >= 0 THEN {1 << j} ELSE 0 END)")
    return "(" + " + ".join(terms) + ")::BIGINT"
