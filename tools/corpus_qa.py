"""Corpus QA: validate a corpus against the documents contract, or
diff two corpus versions.

    python tools/corpus_qa.py validate <sf_dir>
    python tools/corpus_qa.py diff <old_sf_dir> <new_sf_dir>

``validate`` prints one JSON object of per-check violation counts and
exits nonzero if any check fails — gate an ingest on it.  ``diff``
prints per-status counts and writes the differing doc_ids to
``--out`` as parquet when given (the full diff frame is data-sized;
only counts cross the driver).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    sub = ap.add_subparsers(dest="cmd", required=True)
    v = sub.add_parser("validate")
    v.add_argument("sf_dir")
    d = sub.add_parser("diff")
    d.add_argument("old_dir")
    d.add_argument("new_dir")
    d.add_argument("--out", help="write (doc_id, status) parquet here")
    args = ap.parse_args(argv)

    from pyspark.sql import functions as F

    from astra_perseverance_spark import get_spark
    from astra_perseverance_spark.extensions.qa import (
        corpus_diff,
        q_corpus_validate,
    )

    spark = get_spark("corpus-qa")
    spark.sparkContext.setLogLevel("ERROR")
    if args.cmd == "validate":
        counts = {r["check"]: r["n_violations"]
                  for r in q_corpus_validate(spark, args.sf_dir).collect()}
        print(json.dumps(counts, default=int))
        return 0 if not any(counts.values()) else 1
    diff = corpus_diff(spark, args.old_dir, args.new_dir)
    if args.out:
        diff.write.mode("overwrite").parquet(args.out)
        diff = spark.read.parquet(args.out)  # count what was written
    counts = {r["status"]: r["n"] for r in
              diff.groupBy("status").agg(F.count("*").alias("n")).collect()}
    print(json.dumps(counts, default=int))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
