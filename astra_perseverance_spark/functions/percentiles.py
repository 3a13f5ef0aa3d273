"""Exact nearest-rank percentiles with Python banker's rounding.

The reference picks ``sorted[round(n·p) − 1]`` where ``round`` is
CPython round-half-to-even, and an index of −1 wraps to the last
element (explore.py:364-398).  Neither Spark's ``percentile`` (linear
interpolation) nor ``percentile_approx`` reproduces this, so the index
is computed explicitly — in pure *integer* arithmetic (p expressed in
percent), which both Spark and DuckDB evaluate identically:

    q   = n * pct            # pct ∈ {50, 75, 90, 95, 98, 99}
    r   = q div 100
    rem = q % 100
    idx = r − 1  (+1 if rem > 50)  (+1 if rem == 50 and r odd)
    idx = n − 1 if idx < 0

Scale design: rather than sorting raw events, percentiles are read off
a *value histogram* — pause_ms is a bounded small int, so
``groupBy(group, pause).count()`` collapses billions of events into at
most a few thousand rows per group; the rank pick is then a running
sum over that tiny histogram.  No collect_list, no single-node sort,
no skew: this survives a 100× scale-up where an array-based exact
percentile would OOM.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

GC_PCTS = (50, 75, 90, 95, 98, 99)


def nearest_rank_1based(n: Column, pct: int) -> Column:
    """1-based rank of the nearest-rank/half-even percentile pick."""
    q = n * pct
    r = (q - q % 100) / 100
    r = r.cast("long")
    rem = q % 100
    idx = (
        r - 1
        + F.when(rem > 50, 1).otherwise(0)
        + F.when((rem == 50) & (r % 2 == 1), 1).otherwise(0)
    )
    idx = F.when(idx < 0, n - 1).otherwise(idx)
    return (idx + 1).cast("long")


def nearest_rank_sql(n_expr: str, pct: int) -> str:
    """DuckDB SQL twin of :func:`nearest_rank_1based`."""
    return (
        f"(CASE WHEN (({n_expr}) * {pct}) // 100 - 1"
        f" + (CASE WHEN ({n_expr}) * {pct} % 100 > 50 THEN 1 ELSE 0 END)"
        f" + (CASE WHEN ({n_expr}) * {pct} % 100 = 50"
        f"         AND (({n_expr}) * {pct}) // 100 % 2 = 1 THEN 1 ELSE 0 END) < 0"
        f" THEN ({n_expr}) - 1"
        f" ELSE (({n_expr}) * {pct}) // 100 - 1"
        f" + (CASE WHEN ({n_expr}) * {pct} % 100 > 50 THEN 1 ELSE 0 END)"
        f" + (CASE WHEN ({n_expr}) * {pct} % 100 = 50"
        f"         AND (({n_expr}) * {pct}) // 100 % 2 = 1 THEN 1 ELSE 0 END)"
        f" END + 1)"
    )
