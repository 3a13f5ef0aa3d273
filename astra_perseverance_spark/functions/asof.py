"""Backward / forward as-of join — the time-series operator Spark's
join zoo lacks (DuckDB ships it as ``ASOF JOIN``; kdb+ calls it
``aj``).

For each left row, attach the latest right row of the same key whose
timestamp is at-or-before the left timestamp (backward), or the
earliest at-or-after (forward).  The naive relational form — a range
join ``r.ts <= l.ts`` + per-row max — explodes to O(|matches|)
intermediate rows and Spark plans it as a broadcast range join at
best; the scalable form used here is the classic union-and-carry:

1. tag right rows side=0 and left rows side=1,
2. union on the key+timestamp spine (ONE shuffle, on the join keys),
3. running ``last(right payload, ignorenulls)`` over the
   (key, ts, side, payload) window carries the newest right row
   forward to every later left row — partition-local after the one
   exchange, no row explosion, no range join.

At equal timestamps the right row sorts first (side 0 < 1), giving
the inclusive ``right.ts <= left.ts`` semantics DuckDB's ASOF uses;
among equal-timestamp right rows the payload struct is the final sort
key, making the pick total-order deterministic.

An optional ``tolerance`` bounds the lookback (backward) / lookahead
(forward): a carried match farther than ``tolerance`` timestamp units
away is nulled out, exactly as if no right row existed.  This is one
``when`` on the already-carried struct — zero extra plan cost — and
is how real attribution caps a click window without a range join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Internal spine columns; validated against both inputs up front so a
# caller's column can never be silently shadowed.
_RESERVED = ("_ats", "_r", "_side", "_m")


def _check_names(
    left: DataFrame,
    right: DataFrame,
    carried: list[str],
    prefix: str,
) -> None:
    clash = set(_RESERVED) & (set(left.columns) | set(right.columns))
    if clash:
        raise ValueError(
            f"asof join: column name(s) {sorted(clash)} collide with "
            f"internal spine columns {_RESERVED}; rename them first"
        )
    out_clash = {f"{prefix}{c}" for c in carried} & set(left.columns)
    if out_clash:
        raise ValueError(
            f"asof join: output column(s) {sorted(out_clash)} already "
            f"exist on the left frame; pass a different prefix"
        )


def _asof(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_ts: str,
    right_ts: str,
    payload: list[str],
    prefix: str,
    forward: bool,
    tolerance: int | None,
) -> DataFrame:
    carried = [right_ts] + payload
    _check_names(left, right, carried, prefix)
    # a right row with an unknown timestamp can never be a valid
    # match — unfiltered it would sort to one end of the carry walk
    # and be CARRIED into real left rows as a spurious match
    right = right.filter(F.col(right_ts).isNotNull())
    r = right.select(
        *keys,
        F.col(right_ts).alias("_ats"),
        F.struct(*[F.col(c) for c in carried]).alias("_r"),
        F.lit(0).alias("_side"),
    )
    ltypes = dict(left.dtypes)
    lextra = [c for c in left.columns if c not in keys]
    for c in lextra:
        r = r.withColumn(c, F.lit(None).cast(ltypes[c]))
    l = left.select(
        *keys,
        F.col(left_ts).alias("_ats"),
        F.lit(None).cast(dict(r.dtypes)["_r"]).alias("_r"),
        F.lit(1).alias("_side"),
        *lextra,
    )
    u = r.select(*l.columns).unionByName(l)
    # NULLS FIRST in BOTH walk directions: a left row with an unknown
    # timestamp must sort before every (non-null, filtered-above)
    # right row so its carry is empty and it emits a NULL match —
    # desc's default nulls-LAST would instead hand a null-ts left row
    # the walk's final carried right row as a spurious match
    if forward:
        order = [F.desc_nulls_first("_ats"), F.asc("_side"), F.desc("_r")]
    else:
        order = [F.asc_nulls_first("_ats"), F.asc("_side"), F.asc("_r")]
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched: Column = F.last(
        F.when(F.col("_side") == 0, F.col("_r")), ignorenulls=True
    ).over(w)
    out = u.withColumn("_m", matched).filter(F.col("_side") == 1)
    if tolerance is not None:
        if forward:
            gap = F.col(f"_m.{right_ts}") - F.col("_ats")
        else:
            gap = F.col("_ats") - F.col(f"_m.{right_ts}")
        out = out.withColumn(
            "_m", F.when(gap <= F.lit(tolerance), F.col("_m"))
        )
    return out.select(
        *left.columns,
        *[F.col(f"_m.{c}").alias(f"{prefix}{c}") for c in carried],
    )


def asof_backward(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_ts: str,
    right_ts: str,
    payload: list[str],
    prefix: str = "asof_",
    tolerance: int | None = None,
) -> DataFrame:
    """Left as-of join: every ``left`` row, plus ``payload`` columns
    (and ``right_ts``) from the latest ``right`` row with
    ``right[right_ts] <= left[left_ts]`` on the same ``keys`` —
    NULLs when no right row precedes, or (with ``tolerance``) when
    the latest one is more than ``tolerance`` timestamp units back.
    Output columns: all of ``left``'s, then ``{prefix}{right_ts}``
    and ``{prefix}{c}`` for each payload column."""
    return _asof(
        left, right, keys, left_ts, right_ts, payload, prefix,
        forward=False, tolerance=tolerance,
    )


def asof_forward(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_ts: str,
    right_ts: str,
    payload: list[str],
    prefix: str = "asof_",
    tolerance: int | None = None,
) -> DataFrame:
    """Forward as-of join: every ``left`` row plus the EARLIEST right
    row with ``right[right_ts] >= left[left_ts]`` on the same keys —
    the time-to-next-event direction; with ``tolerance``, matches
    farther than ``tolerance`` units ahead are nulled.  Same
    union-and-carry shape as :func:`asof_backward`, walked in
    descending timestamp order: at equal timestamps the right row
    still matches (inclusive), and among equal-timestamp right rows
    the minimal payload struct wins (the descending walk carries it
    last), keeping the pick total-order deterministic."""
    return _asof(
        left, right, keys, left_ts, right_ts, payload, prefix,
        forward=True, tolerance=tolerance,
    )
