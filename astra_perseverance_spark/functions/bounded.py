"""Declared-bounded global windows: one checked contract for the
engine's single-partition window inputs.

A handful of report-grain frames deliberately feed GLOBAL (no
``partitionBy``) windows — exact nearest-rank ranking over an IVF
index's ≤ ``IVF_MAX_LISTS`` list sizes, the ``vocab_growth``
cumulative over ≤ ``GROWTH_BUCKETS`` buckets, the ``postings_health``
percentile over the df HISTOGRAM.  Each is safe because its input
cardinality is bounded by construction, not by luck — but before this
module each site carried that argument as a docstring promise only
(r12 verdict, next-round #6).  ``bounded_global_frame`` turns the
promise into a declaration the test suite can enforce:

- by default it returns the frame UNCHANGED — the declaration is
  free, the consuming query's plan (and its recorded fingerprint in
  ``docs/PLAN_AUDIT.md``) stays bit-identical;
- with ``SPARK_GRAFT_CHECK_BOUNDS=1`` (set by
  ``tests/test_bounded_windows.py``) every declaration eagerly counts
  its frame and fails if the bound is exceeded, so a refactor that
  silently un-bounds one of these frames fails the suite instead of
  shipping a single-task corpus-sized sort.

``bound`` may be an int (topology constants like ``GROWTH_BUCKETS``)
or a zero-argument callable evaluated only under the check env — for
bounds derived from the data's structure, like the df histogram's
√(2·n_postings) spectrum bound, where computing the bound itself
costs an action.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame

CHECK_ENV = "SPARK_GRAFT_CHECK_BOUNDS"

# every declaration made in this process: (why, declared bound or -1
# for callables left unevaluated) — the contract test reads it to
# prove each known global-window site actually declares
DECLARED: list[tuple[str, int]] = []


def bounded_global_frame(df: DataFrame, bound: int | Callable[[], int],
                         why: str) -> DataFrame:
    """Declare that ``df`` (about to feed a global window) holds at
    most ``bound`` rows by construction.  Identity by default; an
    eager count-and-assert under ``SPARK_GRAFT_CHECK_BOUNDS=1``."""
    if os.environ.get(CHECK_ENV):
        b = bound() if callable(bound) else bound
        DECLARED.append((why, b))
        n = df.count()
        if n > b:
            raise AssertionError(
                f"bounded_global_frame violated — {why}: {n} rows "
                f"exceed the declared bound {b}")
    else:
        DECLARED.append((why, bound if isinstance(bound, int) else -1))
    return df
