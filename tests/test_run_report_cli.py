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
