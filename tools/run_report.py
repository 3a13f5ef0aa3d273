"""S13 orchestration CLI: fetch → unpack → analyze → publish.

The engine-side analog of the reference's headless wrapper
(s3-diag.sh:46-78 — download, unzip/untar, run, upload artifacts,
delete input), re-expressed as one thin Python driver:

    python tools/run_report.py -p <input> [-o OUT_DIR] [--name NAME]
        [--set tp_KEY=VAL ...] [--incl-sys]

``<input>`` may be (repeatable, like the reference's ``-p``):
- a diagnostic tree directory (contains ``nodes/``),
- a synthetic sf parquet directory,
- a local ``.zip`` / ``.tar.gz`` archive of a diag tree (unpacked to a
  temp dir, mirroring s3-diag.sh:60-68),
- an ``s3a://.../archive.zip`` or ``s3a://`` directory — object-store
  access rides on Spark's Hadoop filesystem connectors, so no aws-cli
  choreography is needed; Spark reads ``s3a://`` paths exactly like
  local ones when the S3A jars + credentials are on the cluster.
  (Not exercisable in this container — no network — but the code path
  is identical: only the URI differs.)

Outputs per dataset: ``<name>_astra_chart.xlsx`` + ``summary.json``
(explore.py:1124, 1853).  The reference's Segment tracking call and
secrets cleanup (s3-diag.sh:17-41) are service-integration glue, not
analytics — intentionally out of scope.
"""

from __future__ import annotations

import argparse
import os
import sys
import tarfile
import tempfile
import zipfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _unpack(archive: str, workdir: str) -> str:
    """Unpack a local zip/tar.gz and return the diag root inside."""
    if archive.endswith(".zip"):
        with zipfile.ZipFile(archive) as zf:
            zf.extractall(workdir)
    elif archive.endswith((".tar.gz", ".tgz")):
        with tarfile.open(archive) as tf:
            tf.extractall(workdir)
    else:
        raise SystemExit(f"unsupported archive type: {archive}")
    # the tree root is wherever nodes/ landed
    for cur, dirs, _ in os.walk(workdir):
        if "nodes" in dirs:
            return cur
    raise SystemExit(f"no nodes/ directory found inside {archive}")


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("-p", "--path", action="append", required=True,
                    help="diag tree / sf dir / archive (repeatable)")
    ap.add_argument("-o", "--out", default=".", help="output directory")
    ap.add_argument("--name", default=None,
                    help="cluster name override (default: describecluster)")
    ap.add_argument("--set", action="append", default=[], metavar="KEY=VAL",
                    dest="overrides",
                    help="threshold override, e.g. --set tp_sstbl=10 "
                         "(clamped to the matching guardrail, like the "
                         "reference CLI — explore.py:150-169)")
    ap.add_argument("--incl-sys", action="store_true",
                    help="include system keyspaces (reference -incl_sys; "
                         "OpsCenter stays excluded)")
    ap.add_argument("--export", choices=("parquet", "csv"), default=None,
                    help="also write every registered view as "
                         "parquet/csv datasets under OUT/views/")
    ap.add_argument("--export-views", default=None, metavar="Q1,Q2",
                    help="restrict --export to a comma-separated "
                         "query list")
    args = ap.parse_args(argv)

    from astra_perseverance_spark import get_spark
    from astra_perseverance_spark.config import EngineConfig, Thresholds
    from astra_perseverance_spark.sinks import write_report

    # reference flag spellings (explore.py:140-169) → Thresholds fields
    aliases = {"tp_rl": "tp_rl_ms", "tp_wl": "tp_wl_ms",
               "tp_lpar": "tp_lpar_mb", "tp_gcp": "tp_gcp_ms"}
    overrides = {}
    for item in args.overrides:
        key, _, val = item.partition("=")
        if not val:
            raise SystemExit(f"--set expects KEY=VAL, got {item!r}")
        overrides[aliases.get(key, key)] = int(val)
    cfg = EngineConfig(
        thresholds=Thresholds().clamped(**overrides),
        include_system_keyspaces=args.incl_sys,
    )

    spark = get_spark("run-report")
    spark.sparkContext.setLogLevel("ERROR")

    for path in args.path:
        workdir = None
        data_dir = path
        if os.path.isfile(path):
            workdir = tempfile.mkdtemp(prefix="diag_unpack_")
            data_dir = _unpack(path, workdir)
        name = args.name
        if name is None:
            if os.path.isdir(os.path.join(data_dir, "nodes")):
                from astra_perseverance_spark.sources.diag import cluster_name

                name = cluster_name(spark, data_dir) or "cluster"
            else:
                name = os.path.basename(os.path.normpath(data_dir)) or "cluster"
        out = write_report(spark, data_dir, args.out, name, cfg)
        print(f"{path}: wrote {out['xlsx']} and {out['summary_json']}")
        if args.export:
            from astra_perseverance_spark.sinks.export import export_views

            wanted = (args.export_views.split(",")
                      if args.export_views else None)
            # per-cluster subdir: multiple -p paths must not overwrite
            # each other's exported views
            paths = export_views(
                spark, data_dir, os.path.join(args.out, "views", name),
                args.export, wanted, cfg)
            print(f"{path}: exported {len(paths)} views as {args.export}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
