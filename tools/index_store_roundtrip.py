"""Cross-application index-store roundtrip: build → stop → probe.

The incremental-serving queries claim "batch-sized work against
persisted artifacts".  This tool is the proof that the artifact
actually persists: it runs the four incremental queries against the
session-memo path in ONE Spark application, writes the index store,
STOPS that application, then — in a genuinely fresh application —
re-registers the on-disk tables, flips ``SPARK_GRAFT_INDEX_DB``, runs
the same four queries against the persisted tables and asserts the
outputs are row-identical.

Usage:
    python tools/index_store_roundtrip.py [sf_dir] [store_dir]

Exit 0 + "ROUNDTRIP OK" when every query matches; exit 1 with the
first mismatch otherwise.  ``tests/test_index_store.py`` runs this as
a subprocess so the stop/fresh-application cycle cannot disturb the
pytest-shared session.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DATABASE = "idxstore_rt"

QUERIES = (
    "ann_incremental",
    "ann_incremental_pq",
    "dedup_incremental",
    "split_assign_incremental",
)


def _rows(df) -> list[tuple]:
    return [tuple(r) for r in df.collect()]


def _run_queries(spark, sf_dir: str) -> dict[str, list[tuple]]:
    from astra_perseverance_spark.queries import QUERY_REGISTRY

    return {name: _rows(QUERY_REGISTRY[name](spark, sf_dir))
            for name in QUERIES}


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    store = sys.argv[2] if len(sys.argv) > 2 else None
    cleanup = store is None
    if store is None:
        store = tempfile.mkdtemp(prefix="idxstore_")
    os.environ.pop("SPARK_GRAFT_INDEX_DB", None)
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")

    from astra_perseverance_spark import get_spark
    from astra_perseverance_spark.sinks.index_store import (
        register_index_store,
        write_index_store,
    )

    try:
        spark = get_spark("idxstore-build", shuffle_partitions=8)
        spark.sparkContext.setLogLevel("ERROR")
        app1 = spark.sparkContext.applicationId
        expected = _run_queries(spark, sf_dir)
        write_index_store(spark, sf_dir, DATABASE, store)
        spark.stop()

        spark = get_spark("idxstore-probe", shuffle_partitions=8)
        spark.sparkContext.setLogLevel("ERROR")
        app2 = spark.sparkContext.applicationId
        assert app2 != app1, "second session is not a fresh application"
        register_index_store(spark, DATABASE, store)
        os.environ["SPARK_GRAFT_INDEX_DB"] = DATABASE
        try:
            actual = _run_queries(spark, sf_dir)
        finally:
            os.environ.pop("SPARK_GRAFT_INDEX_DB", None)

        for name in QUERIES:
            if expected[name] != actual[name]:
                exp, act = expected[name], actual[name]
                diff = next(
                    (i for i, (e, a) in enumerate(zip(exp, act)) if e != a),
                    min(len(exp), len(act)),
                )
                print(f"MISMATCH {name}: {len(exp)} vs {len(act)} rows; "
                      f"first diff at row {diff}: "
                      f"{exp[diff] if diff < len(exp) else '<none>'} vs "
                      f"{act[diff] if diff < len(act) else '<none>'}")
                return 1
            print(f"OK {name}: {len(expected[name])} rows identical "
                  f"across applications")
        spark.stop()
        print("ROUNDTRIP OK")
        return 0
    finally:
        if cleanup:
            shutil.rmtree(store, ignore_errors=True)


if __name__ == "__main__":
    sys.exit(main())
