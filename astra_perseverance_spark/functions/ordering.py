"""Total-order sorts for report-grain outputs.

Every reference output is an Excel-tab / JSON grain — per (dc, node)
or per (ks, tbl) rows, bounded by cluster topology and schema size,
independent of fact volume.  A plain ``orderBy`` plans a
range-partitioned global sort whose boundary-sampling job executes the
child plan once and the sort itself again — two extra passes over the
input for a result that fits in one reducer by construction.

``report_sort`` swaps that for one shuffle to a single partition plus
a local sort: one pass over the input, no sampling job.  Use it ONLY
for topology/schema-bounded grains (the reference's tab grain); corpus
grain outputs (per-document stats, dedup pairs) keep the
range-partitioned ``orderBy``, which is the correct distributed sort
when the result itself scales with the data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def report_sort(df: DataFrame, *cols) -> DataFrame:
    """Single-reducer total sort for bounded report grains."""
    return df.repartition(1).sortWithinPartitions(*cols)


def report_sorted(*cols):
    """Curried form for ``DataFrame.transform`` chains."""
    return lambda df: report_sort(df, *cols)
