"""Capture ``explain("formatted")`` for a set of registered queries.

Optimization-round evidence tool: writes one ``<query>_<tag>.txt`` per
query under an output directory (default ``plans/r15``), with memos
warmed the same way ``bench.py`` warms them, so the captured physical
plan is the one the timed bench runs execute.

Usage::

    python tools/capture_plans.py <tag> [query ...]

``tag`` is typically ``before`` or ``after``.  With no query list the
full registry is captured.  Env: SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1), SPARK_GRAFT_PLANS_DIR (default plans/r15).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    if len(sys.argv) < 2:
        print(__doc__, file=sys.stderr)
        return 2
    tag = sys.argv[1]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.environ.get(
        "SPARK_GRAFT_PLANS_DIR",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "plans", "r15"),
    )
    os.makedirs(out_dir, exist_ok=True)

    from astra_perseverance_spark import get_spark
    from astra_perseverance_spark.conformed import load_model
    from astra_perseverance_spark.conformed.model import release_memos
    from astra_perseverance_spark.queries import QUERY_REGISTRY

    names = sys.argv[2:] or list(QUERY_REGISTRY)
    spark = get_spark("capture_plans")
    spark.sparkContext.setLogLevel("ERROR")
    model = load_model(spark, sf_dir)
    model.cfstats_metric.write.format("noop").mode("overwrite").save()

    for name in names:
        fn = QUERY_REGISTRY[name]
        release_memos(spark)
        # warm run so memo frames exist and the captured plan is the
        # bench's timed-run plan (InMemoryTableScan over memo caches)
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        df = fn(spark, sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(f"wrote {path}", file=sys.stderr)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
