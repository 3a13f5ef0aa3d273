"""S13 orchestration CLI units (tools/run_report.py)."""

from __future__ import annotations

import os
import sys
import zipfile

import pytest

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from tests.conftest import FIXTURE_DIAG

import run_report  # noqa: E402


@pytest.fixture()
def diag_zip(tmp_path):
    path = tmp_path / "diag1.zip"
    base = FIXTURE_DIAG
    with zipfile.ZipFile(path, "w") as zf:
        for cur, _, files in os.walk(base):
            for f in files:
                p = os.path.join(cur, f)
                zf.write(p, os.path.relpath(p, os.path.dirname(base)))
    return str(path)


def test_unpack_finds_nodes_root(diag_zip, tmp_path):
    root = run_report._unpack(diag_zip, str(tmp_path / "x"))
    assert os.path.isdir(os.path.join(root, "nodes"))
    assert os.path.basename(root) == "diag1"


def test_unpack_rejects_unknown_archive(tmp_path):
    bad = tmp_path / "input.rar"
    bad.write_bytes(b"xx")
    with pytest.raises(SystemExit):
        run_report._unpack(str(bad), str(tmp_path / "y"))


def test_cli_threshold_overrides_change_report(spark, tmp_path):
    """--set drops a tab's threshold (more rows) and is guardrail-
    clamped like the reference CLI; --incl-sys widens the keyspaces."""
    out_default = tmp_path / "d"
    out_loose = tmp_path / "l"
    assert run_report.main(
        ["-p", FIXTURE_DIAG, "-o", str(out_default), "--name", "c"]) == 0
    assert run_report.main(
        ["-p", FIXTURE_DIAG, "-o", str(out_loose), "--name", "c",
         "--set", "tp_sstbl=1", "--incl-sys"]) == 0
    # the looser sstable threshold can only grow the workbook
    assert (out_loose / "c_astra_chart.xlsx").stat().st_size >= \
        (out_default / "c_astra_chart.xlsx").stat().st_size

    from astra_perseverance_spark.config import Thresholds

    clamped = Thresholds().clamped(tp_lpar_mb=500)
    assert clamped.tp_lpar_mb == Thresholds().gr_lpar_mb  # 200 cap
    with pytest.raises(KeyError):
        Thresholds().clamped(nonsense=1)


def test_cli_export_views(spark, tmp_path):
    """--export writes the requested views as parquet datasets next to
    the report artifacts."""
    out = tmp_path / "exp"
    assert run_report.main(
        ["-p", FIXTURE_DIAG, "-o", str(out), "--name", "c",
         "--export", "parquet", "--export-views", "node_data,data_size"],
    ) == 0
    got = spark.read.parquet(str(out / "views" / "c" / "node_data"))
    assert got.count() > 0 and "uptime_sec" in got.columns
    assert (out / "views" / "c" / "data_size").exists()


def test_cli_export_defaults_skip_corpus_queries_on_diag_tree(spark, tmp_path):
    """--export with no --export-views on a diag bundle (no corpus
    parquet) must export the cluster views and skip the corpus family
    instead of crashing on a missing documents.parquet."""
    out = tmp_path / "expall"
    assert run_report.main(
        ["-p", FIXTURE_DIAG, "-o", str(out), "--name", "c",
         "--export", "parquet"],
    ) == 0
    assert (out / "views" / "c" / "workload_reads").exists()
    assert not (out / "views" / "c" / "dedup_exact").exists()
