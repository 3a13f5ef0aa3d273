"""Benchmark harness: time every registered query at one scale factor.

Prints exactly ONE machine-readable JSON line on stdout — kept COMPACT
so it survives tail-capture truncation at any registry size (round-5
postmortem: a 76-query-wide ``queries`` map overflowed the driver's
tail window and the round recorded no bench value):

    {"metric": "suite_seconds", "value": <total>, "unit": "sec",
     "sf": <sf>, "n_queries": <count>, "detail": "BENCH_DETAIL.json"}

The full per-query timing map is written to ``BENCH_DETAIL.json``
next to this script (checked into the repo each round) and echoed to
stderr.  Everything else (Spark chatter, progress) goes to stderr.
Each query
is forced end-to-end with a noop write (no driver collect, no result
materialization on the driver — the number measures the distributed
plan, not pandas conversion).

Each query is measured in isolation: shared memo frames are released
first, one untimed warm run rebuilds the query's own memos and pays
whole-stage-codegen compilation (a per-plan constant that vanishes at
real data scale), then best-of-BENCH_REPEAT timed runs report the
plan's execution cost.  Only the conformed-model cache stays warm
across queries, as it would in a real deployment.

Each query also records a PLAN FINGERPRINT (round-7 advisory): a
stable hash of its normalized optimized plan
(``functions.planfp``).  A bench delta with an unchanged fingerprint
is suite-order jitter by construction; a changed fingerprint demands
a ``docs/PLAN_AUDIT.md`` refresh.  The fingerprint is computed twice
from independent plan builds — a query whose optimizer output is
nondeterministic (e.g. distinct-aggregate Expand ordering) records
``"unstable"`` instead of a hash, so the cross-check
(``tools/plan_audit.py``) never false-alarms on it.

The run ends with a bucketed-warehouse section (disable with
``SPARK_GRAFT_BENCH_BUCKETED=0``): the corpus + events tables are
written once via ``sinks.warehouse`` (ingest time recorded
separately), the doc_id/user_id-keyed query families are re-timed
against the bucketed layout, and a Spark-side order-insensitive
result digest is recorded for BOTH modes per query —
``BENCH_DETAIL.json`` then carries a ``bucketed`` map proving the
exchange-free plans are faster AND hash-identical to raw-parquet
mode.  The suite total keeps summing the RAW timings only, so the
headline number stays comparable across rounds.  Caveat the map makes
visible rather than hiding: multi-pass corpus consumers
(``corpus_curate`` re-reads documents for each signal family) run
SLOWER bucketed at bench scale, because the bucketed branch trades
the session-scoped repartition+cache for durable clustering — the
bucketing win is specifically the per-join Exchange, i.e. the events
family and single-pass doc_id joins.

Env knobs: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
SPARK_GRAFT_CPUS (default 32), BENCH_REPEAT (default 2),
SPARK_GRAFT_BENCH_BUCKETED (default on; 0 disables).
"""

from __future__ import annotations

import getpass
import json
import os
import re
import socket
import sys
import time


def _username() -> str:
    """Best-effort user for run_context provenance: ``getpass`` raises
    in containers with no USER/LOGNAME env and no passwd entry, and
    this runs AFTER the whole timed suite — a provenance nicety must
    never lose the results."""
    try:
        return getpass.getuser()
    except (KeyError, OSError):
        return f"uid{os.getuid()}" if hasattr(os, "getuid") else "unknown"

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _force(df) -> None:
    """Execute the full plan without collecting to the driver."""
    df.write.format("noop").mode("overwrite").save()


def _result_digest(df) -> str:
    """Order-insensitive Spark-side digest of a result frame — three
    scalars cross to the driver, the rows never do.  bit_xor alone
    cancels rows with even multiplicity (a row appearing 2 vs 0 times
    digests identically), so the digest combines COUNT + wrapping SUM
    + XOR of the per-row xxhash64: a multiset difference now needs a
    simultaneous xor- AND sum-collision to go unseen.  The NULL
    sentinel is a \\x00-framed token no real cast-to-string value can
    produce (the old literal 'NULL' collided with a real string)."""
    from pyspark.sql import functions as F

    null_tok = "\x00N\x00"
    cols = [F.coalesce(F.col(c).cast("string"), F.lit(null_tok))
            for c in sorted(df.columns)]
    h = df.select(
        F.xxhash64(F.concat_ws("\x00|", *cols)).alias("h"))
    cnt, s_lo, s_hi, x = h.agg(
        F.count("h"),
        # wrapping 64-bit sum: Spark's SUM(bigint) overflow would fail
        # under ANSI mode, so sum each 32-bit half separately (both
        # fit a bigint sum at any realistic row count) and recombine
        # mod 2^64 driver-side
        F.sum(F.expr("h & 4294967295")),
        F.sum(F.expr("(h >> 32) & 4294967295")),
        F.expr("bit_xor(h)"),
    ).collect()[0]
    if not cnt:
        return "0:0:0"
    s = (int(s_lo) + (int(s_hi) << 32)) & ((1 << 64) - 1)
    return f"{int(cnt)}:{s}:{int(x)}"


# The query families the bucketed warehouse exists for: user_id-keyed
# events plans (exchange-free via write_bucketed_events) and
# doc_id-keyed corpus joins (write_bucketed_corpus).
BUCKETED_QUERIES = [
    "events_asof", "events_asof_1h", "events_window_attr",
    "events_next_error", "events_sessionize", "events_funnel",
    "events_sessionize_capped", "user_skew_audit",
    "doc_digest_join", "corpus_curate",
]


def _bench_bucketed(spark, sf_dir: str, repeat: int,
                    raw_timings: dict[str, float]) -> dict:
    """Time ``BUCKETED_QUERIES`` against a freshly written bucketed
    warehouse; record raw-vs-bucketed result digests so the speedup is
    provably same-answer.  Returns the ``bucketed`` detail map."""
    import tempfile

    from astra_perseverance_spark.conformed.model import release_memos
    from astra_perseverance_spark.extensions.corpus import BUCKETED_DB_ENV
    from astra_perseverance_spark.queries import QUERY_REGISTRY
    from astra_perseverance_spark.sinks.warehouse import (
        write_bucketed_corpus,
        write_bucketed_events,
    )

    # raw-mode digests first (env unset)
    digests_raw = {}
    for name in BUCKETED_QUERIES:
        release_memos(spark)
        digests_raw[name] = _result_digest(QUERY_REGISTRY[name](spark, sf_dir))

    loc = tempfile.mkdtemp(prefix="bench_bucketed_wh_")
    t0 = time.time()
    write_bucketed_corpus(spark, sf_dir, "benchwh", loc)
    write_bucketed_events(spark, sf_dir, "benchwh", loc)
    ingest = round(time.time() - t0, 4)
    print(f"bucketed ingest: {ingest:.2f}s", file=sys.stderr)

    out: dict = {"ingest_seconds": ingest, "queries": {}}
    os.environ[BUCKETED_DB_ENV] = "benchwh"
    try:
        for name in BUCKETED_QUERIES:
            fn = QUERY_REGISTRY[name]
            release_memos(spark)
            _force(fn(spark, sf_dir))  # warm
            best = None
            for _ in range(repeat):
                t0 = time.time()
                _force(fn(spark, sf_dir))
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
            same = _result_digest(fn(spark, sf_dir)) == digests_raw[name]
            out["queries"][name] = {
                "seconds": round(best, 4),
                "raw_seconds": raw_timings.get(name),
                "hash_match": same,
            }
            print(f"bucketed {name}: {best:.2f}s "
                  f"(raw {raw_timings.get(name)}s, "
                  f"hash_match={same})", file=sys.stderr)
    finally:
        del os.environ[BUCKETED_DB_ENV]
        release_memos(spark)
        for t in ("documents", "doc_digests", "embeddings", "events"):
            spark.sql(f"DROP TABLE IF EXISTS benchwh.{t}")
        spark.sql("DROP DATABASE IF EXISTS benchwh")
    return out


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    repeat = int(os.environ.get("BENCH_REPEAT", "2"))
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else 0.0
    # Run context (r8 postmortem: a concurrently-loaded machine
    # inflated the driver's recorded suite ~1.44× uniformly and cost a
    # round of adjudication).  loadavg before/after lets a reader
    # discount a hot-machine recording without re-running anything.
    load_before = os.getloadavg()

    from astra_perseverance_spark import get_spark
    from astra_perseverance_spark.extensions.corpus import BUCKETED_DB_ENV
    from astra_perseverance_spark.queries import QUERY_REGISTRY

    # An ambient bucketed-warehouse binding would silently turn the
    # whole "raw" suite into bucketed mode (and the bucketed section
    # would then overwrite the caller's warehouse) — neutralize it for
    # the duration of the bench.
    ambient = os.environ.pop(BUCKETED_DB_ENV, None)
    if ambient:
        print(f"ignoring ambient {BUCKETED_DB_ENV}={ambient} for the "
              f"bench run", file=sys.stderr)

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the JVM + materialize the conformed-model cache once; the
    # cache build is charged to warmup, not to any single query, so
    # per-query numbers measure the query plans themselves.
    t0 = time.time()
    from astra_perseverance_spark.conformed import load_model

    model = load_model(spark, sf_dir)
    _force(model.cfstats_metric)
    _force(model.gc_event)
    warm = time.time() - t0
    print(f"warmup (model cache build): {warm:.2f}s", file=sys.stderr)

    # Per-query isolation: drop every shared memo frame before each
    # query, then one untimed warm run (rebuilds the query's own memos
    # + JIT), then best-of-N timed runs.  This reproduces the
    # fresh-session re-timing protocol — without it, a query's number
    # silently includes cache pressure from the 48 queries before it
    # (round-3 postmortem: nine >=2x "regressions" that vanished in
    # isolation).  The conformed-model cache stays warm throughout, as
    # it would in any real deployment.
    from astra_perseverance_spark.conformed.model import release_memos
    from astra_perseverance_spark.functions.planfp import plan_fingerprint

    timings: dict[str, float] = {}
    plans: dict[str, str] = {}
    for name, fn in QUERY_REGISTRY.items():
        release_memos(spark)
        _force(fn(spark, sf_dir))  # warm: own memos + codegen, untimed
        fp1 = plan_fingerprint(fn(spark, sf_dir))
        fp2 = plan_fingerprint(fn(spark, sf_dir))
        plans[name] = fp1 if fp1 == fp2 else "unstable"
        best = None
        for _ in range(repeat):
            t0 = time.time()
            _force(fn(spark, sf_dir))
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 4)
        print(f"{name}: {best:.2f}s [{plans[name]}]", file=sys.stderr)
    release_memos(spark)

    bucketed = None
    if os.environ.get("SPARK_GRAFT_BENCH_BUCKETED", "1") != "0":
        bucketed = _bench_bucketed(spark, sf_dir, repeat, timings)

    total = round(sum(timings.values()), 4)

    # Full per-query map: a repo file (durable, any size) + stderr.
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"
    )
    detail = {
        "metric": "suite_seconds",
        "value": total,
        "unit": "sec",
        "sf": sf,
        "sf_dir": sf_dir,
        "queries": timings,
        "plans": plans,
        "run_context": {
            "bench_repeat": repeat,
            "loadavg_before": [round(x, 2) for x in load_before],
            "loadavg_after": [round(x, 2) for x in os.getloadavg()],
            "cpus": os.cpu_count(),
            # provenance: lets preflight's loaded-recording warning
            # name WHOSE run is in the working tree (builder clean-room
            # vs driver per-round) — override via env for CI identities
            "recorded_by": os.environ.get(
                "SPARK_GRAFT_BENCH_RECORDER",
                f"{_username()}@{socket.gethostname()}"),
        },
    }
    if bucketed is not None:
        detail["bucketed"] = bucketed
    with open(detail_path, "w") as f:
        json.dump(detail, f, indent=1, sort_keys=True)
    print(json.dumps(detail), file=sys.stderr)

    # The ONE stdout line stays compact and truncation-safe: suite
    # total + the 15 slowest queries only (bounded at ~700 bytes no
    # matter how wide the registry grows).
    slowest = dict(
        sorted(timings.items(), key=lambda kv: -kv[1])[:15]
    )
    print(json.dumps({
        "metric": "suite_seconds",
        "value": total,
        "unit": "sec",
        "sf": sf,
        "n_queries": len(timings),
        "queries": slowest,
        "detail": "BENCH_DETAIL.json",
    }))
    if ambient:
        os.environ[BUCKETED_DB_ENV] = ambient
    return 0


if __name__ == "__main__":
    sys.exit(main())
