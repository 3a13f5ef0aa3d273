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


# Salt fan-out for two-phase top-k.  Bounds the partial stage's
# per-task input at input/(|groups|·SALTS) while the merge stage sees
# only |groups|·SALTS·k rows.
TOPK_SALTS = 64


def salted_topk(df: DataFrame, group_cols: list[str], order_cols: list,
                k: int, salt_on: str) -> DataFrame:
    """Exact per-group top-k that survives low-cardinality groups.

    A single ``row_number().over(partitionBy(group))`` puts one
    *reducer task per group* — with a handful of groups (languages,
    tenants) that is a skew wall at scale: one task sorts the whole
    group.  This runs the classic exact two-phase shape instead:

    1. partial: top-k within (group, salt) where salt =
       ``hash(salt_on) % TOPK_SALTS`` — parallelism is
       |groups|·SALTS, input per task shrinks proportionally;
    2. merge: top-k over the surviving ≤ |groups|·SALTS·k rows.

    Exact because every global top-k row is also top-k within its own
    salt bucket (ranks only shrink when rows are removed).  The salt
    column must be a deterministic function of the row (``salt_on``),
    never ``rand()``, so re-runs and AQE retries see the same
    partitioning.

    PRECONDITION: ``order_cols`` must form a deterministic TOTAL order
    within each group (append a unique tie-breaker column if the sort
    keys can tie).  With ties, which tied rows survive the per-salt
    partial stage depends on how rows landed in salt buckets, so the
    k-th result row could differ nondeterministically from a
    single-window run.  Every caller in this repo passes a unique
    trailing key (term, doc_id, …) for exactly this reason.
    """
    from pyspark.sql import Window, functions as F

    # same loud-failure contract as asof._check_names: the spine
    # columns (and the produced rank) must not silently overwrite a
    # caller's data
    clash = {"_salt", "_pr", "rank"} & set(df.columns)
    if clash:
        raise ValueError(
            f"salted_topk: column name(s) {sorted(clash)} collide with "
            "internal spine/output columns; rename them first")

    salt = F.pmod(F.xxhash64(F.col(salt_on)), F.lit(TOPK_SALTS))
    w_partial = Window.partitionBy(*group_cols, "_salt").orderBy(*order_cols)
    w_final = Window.partitionBy(*group_cols).orderBy(*order_cols)
    return (
        df.withColumn("_salt", salt)
        .withColumn("_pr", F.row_number().over(w_partial))
        .filter(F.col("_pr") <= k)
        .withColumn("rank", F.row_number().over(w_final))
        .filter(F.col("rank") <= k)
        .drop("_salt", "_pr")
    )
