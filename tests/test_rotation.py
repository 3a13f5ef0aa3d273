"""Registry-rotation honesty gate (round-5 verdict, next-round #9).

With 80+ registered queries and a 50-row driver correctness window,
ordering decides which queries get a hard driver-side oracle row each
round.  These tests make the rotation policy (queries/registry.py
docstring) machine-checked so the "never-driver-checked" class can't
silently reappear:

(a) every registry entry either has a driver CORRECTNESS row within
    the last K=3 recorded rounds, or sits inside the first-50 window
    now (i.e. is scheduled for a row in the upcoming round);
(b) the window leads with the 22 SURVEY §2.10 parity queries, in the
    declared order — the brief's primary bar is always checked.
"""

from __future__ import annotations

import glob
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WINDOW = 50  # driver checks the first 50 registry entries per round
K = 3  # freshness budget: a row within the last K recorded rounds

PARITY_TIER = [
    "workload_reads", "workload_writes", "workload_summary",
    "data_size", "workload_rw_outer", "summary_long",
    "gc_percentiles", "gc_p99_health",
    "proxyhistograms_ms", "node_data", "dropped_mutations",
    "large_partitions", "sstable_count", "num_tables",
    "read_latency", "write_latency", "tombstones",
    "guardrail_dependents", "column_count", "uda_udf_presence",
    "warnings", "summary_json",
]


def _correctness_rounds() -> list[dict]:
    """Checked-in driver rows, oldest→newest."""
    paths = sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")))
    return [json.load(open(p)) for p in paths]


def test_every_query_checked_within_budget():
    from astra_perseverance_spark.queries import QUERY_REGISTRY

    rounds = _correctness_rounds()
    assert rounds, "no CORRECTNESS_r*.json checked in"
    recent = rounds[-K:]
    names = list(QUERY_REGISTRY)
    stale = [
        n for i, n in enumerate(names)
        if i >= WINDOW and not any(n in r for r in recent)
    ]
    assert not stale, (
        f"registry entries past position {WINDOW} with no driver "
        f"CORRECTNESS row in the last {K} recorded rounds (move them "
        f"into the window this round): {stale}"
    )


def test_window_leads_with_parity_tier():
    from astra_perseverance_spark.queries import QUERY_REGISTRY

    names = list(QUERY_REGISTRY)
    assert names[: len(PARITY_TIER)] == PARITY_TIER, (
        "the first registry entries must be the SURVEY §2.10 parity "
        "queries in declared order"
    )


def test_window_is_at_least_half_the_registry():
    """If the registry ever outgrows 2× the window, a 2-round rotation
    can no longer cover everything inside the K=3 budget — fail early
    so the policy (or the window) gets revisited deliberately."""
    from astra_perseverance_spark.queries import QUERY_REGISTRY

    n = len(QUERY_REGISTRY)
    capacity = WINDOW + (WINDOW - len(PARITY_TIER)) * (K - 1)
    assert n <= capacity, (
        f"registry has {n} queries; with a {WINDOW}-row window, "
        f"{len(PARITY_TIER)} always-checked parity rows and a "
        f"K={K}-round freshness budget, at most "
        f"{WINDOW + (WINDOW - len(PARITY_TIER)) * (K - 1)} queries "
        f"can all stay fresh — shrink the registry or raise K"
    )
