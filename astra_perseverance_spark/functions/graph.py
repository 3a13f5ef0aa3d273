"""Distributed connected components (min-label propagation with
pointer jumping).

The building block behind duplicate-cluster assignment
(``extensions.dedup.q_dedup_clusters``) and any other
transitive-grouping operator.  Spark has no built-in connected
components; this is the standard DataFrame formulation:

- every node starts labeled with itself;
- each round takes the minimum label over the node's neighborhood
  (one equi-join on the symmetric edge list, keyed by node id — a
  uniform-key shuffle), then pointer-jumps (``lbl ← lbl[lbl]``),
  which halves label-chain depth, giving O(log diameter) rounds
  instead of O(diameter);
- ``localCheckpoint`` truncates lineage each round so the plan stays
  O(1) deep regardless of round count (use ``checkpoint()`` to a
  reliable store on a production cluster for fault tolerance);
- the only driver-side state is the converged/changed counter —
  labels never leave the executors.

Reference semantics: the reference has no graph operator; this exists
for the LLM-pipeline dedup surface (near-dup groups are connected
components of the duplicate-pair graph).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Pointer jumping halves chain depth per round, so 2^MAX_ROUNDS
# bounds the largest traversable component diameter — 20 rounds
# covers any graph with < 2^20-deep label chains, far beyond any
# real duplicate cluster.
MAX_ROUNDS = 20


def connected_components(edges: DataFrame) -> DataFrame:
    """Label every node of an undirected graph with the minimum node
    id of its connected component.

    ``edges``: two numeric/comparable columns (first, second) — one
    row per undirected edge, self-loops and duplicates tolerated.
    Returns (node, component) — one row per distinct node appearing
    in any edge.
    """
    a, b = edges.columns[0], edges.columns[1]
    sym = (
        edges.select(F.col(a).alias("src"), F.col(b).alias("dst"))
        .union(edges.select(F.col(b).alias("src"), F.col(a).alias("dst")))
        .distinct()
        .localCheckpoint()
    )
    lbl = (
        sym.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("lbl", F.col("node"))
        .localCheckpoint()
    )
    converged = False
    for _ in range(MAX_ROUNDS):
        # (1) neighbor-min: min(label) over self ∪ neighbors.
        prop = sym.join(
            lbl.withColumnRenamed("node", "src"), "src"
        ).select(F.col("dst").alias("node"), "lbl")
        new = (
            lbl.unionByName(prop)
            .groupBy("node")
            .agg(F.min("lbl").alias("lbl"))
        )
        # (2) pointer jump: lbl ← lbl[lbl].  Labels are node ids of
        # the same component, so the parent row always exists and its
        # label is ≤ ours (labels are min-monotone).
        parent = new.select(
            F.col("node").alias("p_node"), F.col("lbl").alias("p_lbl")
        )
        new = (
            new.join(parent, new["lbl"] == parent["p_node"])
            .select("node", F.col("p_lbl").alias("lbl"))
            .localCheckpoint()
        )
        changed = (
            new.alias("n")
            .join(lbl.alias("o"), "node")
            .filter(F.col("n.lbl") != F.col("o.lbl"))
            .count()
        )
        lbl = new
        if changed == 0:
            converged = True
            break
    if not converged:
        # Partial labels would silently violate the component-min
        # invariant downstream — fail loudly instead.
        raise RuntimeError(
            f"connected_components did not converge in {MAX_ROUNDS} "
            "rounds; raise MAX_ROUNDS for this graph"
        )
    return lbl.select("node", F.col("lbl").alias("component"))
