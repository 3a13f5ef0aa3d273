"""Stable fingerprints of Catalyst optimized plans.

Round-7 verdict advisory: a bench delta on its own cannot distinguish
a plan regression from suite-order jitter — the timing changes either
way.  Recording a stable hash of each query's OPTIMIZED logical plan
next to its seconds makes the two auto-distinguishable: a slower
query with an UNCHANGED fingerprint is jitter by construction (same
plan, different machine weather); a CHANGED fingerprint demands a
``docs/PLAN_AUDIT.md`` refresh and a look at what the optimizer now
does differently.

The raw ``optimizedPlan().toString()`` is not directly hashable
across runs: expression ids (``name#123``), JVM object addresses and
plan ids are assigned per-session.  ``plan_fingerprint`` strips those
volatile tokens first, so the same code + same scale factor + same
memo state always hashes identically, while any structural change
(join order, pushed filter, extra exchange-inducing operator, changed
literal) changes the hash.

Shared by ``bench.py`` (records fingerprints into BENCH_DETAIL.json)
and ``tools/plan_audit.py`` (cross-checks the recorded fingerprints
against freshly built plans at the same scale factor).
"""

from __future__ import annotations

import hashlib
import re

from pyspark.sql import DataFrame

_VOLATILE = [
    (re.compile(r"#\d+"), "#"),                # expression ids
    (re.compile(r"@[0-9a-fA-F]{6,}"), "@"),    # JVM object addresses
    (re.compile(r"plan_id=\d+"), "plan_id="),  # per-session plan ids
    (re.compile(r"\bcft_[0-9a-f]+\b"), "cft_"),  # temp-view suffixes
    # higher-order-function variables draw from a session-global
    # counter (lambda x_70#L): normalize the ordinal away
    (re.compile(r"\blambda ([A-Za-z]+)_\d+"), r"lambda \1_"),
    # AQE runtime artifacts inside cached physical subtrees that the
    # depth walk in _strip_cached_subtrees does not always remove
    # (multi-branch ':' continuation columns defeat the indentation
    # heuristic): query-stage numbers and whole-stage-codegen ids are
    # assigned per SESSION, so two processes print different numbers
    # for the same plan — the round-8 cross-run fingerprint flips on
    # dedup_recall_audit / curation_funnel were exactly this
    (re.compile(r"\b(\w*QueryStage) \d+"), r"\1"),
    (re.compile(r"\*\(\d+\)"), "*"),
    (re.compile(r"isFinalPlan=(true|false)"), "isFinalPlan="),
]


def _strip_cached_subtrees(s: str) -> str:
    """Drop every InMemoryRelation's cached-plan subtree.

    A memoized frame prints its cached PHYSICAL plan under the
    ``InMemoryRelation`` node, and that text depends on execution
    history (AQE bakes ``isFinalPlan=true`` / QueryStage numbering in
    at materialization) — not on the query's own shape.  The
    ``InMemoryRelation`` line itself (output columns, storage level)
    stays: it IS part of the plan shape."""
    out = []
    skip_depth = None
    for line in s.splitlines():
        depth = len(line) - len(line.lstrip(" :+-"))
        if skip_depth is not None:
            if depth > skip_depth:
                continue
            skip_depth = None
        out.append(line)
        if "InMemoryRelation" in line:
            skip_depth = depth
    return "\n".join(out)


def normalized_plan(df: DataFrame) -> str:
    """The optimized logical plan string with per-session tokens and
    cached-plan subtrees normalized away."""
    s = _strip_cached_subtrees(
        df._jdf.queryExecution().optimizedPlan().toString())
    for pat, rep in _VOLATILE:
        s = pat.sub(rep, s)
    return s


def plan_fingerprint(df: DataFrame) -> str:
    """12-hex-char stable hash of the normalized optimized plan."""
    return hashlib.sha256(normalized_plan(df).encode()).hexdigest()[:12]
