from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FIXTURE_DIAG = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures", "diag1")
SF_SMALL = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from astra_perseverance_spark import get_spark

    s = get_spark("pytest", shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s
