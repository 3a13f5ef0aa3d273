"""Compact the small files of a parquet dataset or corpus directory.

    python tools/compact.py <path> [--target-mb 128] [--no-audit]

``<path>`` is either one parquet dataset directory or a corpus dir
containing ``*.parquet`` dataset subdirectories (the ingest tools'
output shape).  See ``sinks/compact.py`` for the mechanism; rows are
audited before the in-place swap unless ``--no-audit``.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("path", help="parquet dataset dir, or a corpus dir "
                    "holding *.parquet dataset dirs")
    ap.add_argument("--target-mb", type=int, default=128,
                    help="target data-file size in MiB (default 128)")
    ap.add_argument("--no-audit", action="store_true",
                    help="skip the row-count audit before the swap")
    ap.add_argument("--finalize-streaming-sink", action="store_true",
                    help="seal streaming-ingested datasets "
                    "(_spark_metadata dropped; the old stream must "
                    "not resume into the directory)")
    args = ap.parse_args(argv)

    from astra_perseverance_spark import get_spark
    from astra_perseverance_spark.sinks.compact import (
        compact_corpus,
        compact_parquet,
    )

    spark = get_spark("compact")
    spark.sparkContext.setLogLevel("ERROR")
    kw = {"target_bytes": args.target_mb * 1024 * 1024,
          "audit": not args.no_audit,
          "finalize_streaming_sink": args.finalize_streaming_sink}
    if args.path.rstrip("/").endswith(".parquet"):
        stats = compact_parquet(spark, args.path, **kw)
    else:
        stats = compact_corpus(spark, args.path, **kw)
    print(json.dumps(stats, default=int))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
