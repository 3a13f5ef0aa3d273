"""SemDeDup staged round-9 candidate (extensions/similarity.py::
q_semdedup): DuckDB-twin parity proven ahead of registration (the
round-8 driver window is full — same staging pattern as
q_corpus_validate), plus a planted-duplicate semantic check and the
engine's plan-shape invariants."""

from __future__ import annotations

import contextlib
import io
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools"))

from tests.conftest import SF_SMALL

from check import canon  # noqa: E402  (tools/check.py)


class TestSemDeDup:
    def test_duckdb_twin_parity(self, spark):
        """Spark vs DuckDB on the real sf0.001 embeddings — the exact
        comparison the driver will apply once round 9 registers the
        query (row count, column names, order-insensitive hash)."""
        from astra_perseverance_spark.extensions.similarity import (
            q_semdedup,
        )
        from astra_perseverance_spark.oracle.ext_sqls import (
            EXT_ORACLE_SQL,
        )

        sdf = q_semdedup(spark, SF_SMALL).toPandas()
        con = duckdb.connect()
        con.sql(f"CREATE VIEW embeddings AS SELECT * FROM "
                f"'{SF_SMALL}/embeddings.parquet'")
        odf = con.sql(EXT_ORACLE_SQL["semdedup"]).df()
        assert len(sdf) == len(odf) > 0
        assert sorted(sdf.columns) == sorted(odf.columns)
        assert canon(sdf) == canon(odf)

    def test_planted_duplicate_pruned(self, spark, tmp_path):
        """Two identical vectors in an otherwise-orthogonal corpus:
        exactly the larger id is pruned, anchored to the smaller at
        cosine 1.0 — and nothing else is (orthogonal cluster mates sit
        at cosine 0, under the threshold)."""
        from astra_perseverance_spark.extensions.similarity import (
            q_semdedup,
        )
        from astra_perseverance_spark.functions.vectors import ANN_DIM

        def basis(i, scale=1.0):
            v = [0.0] * ANN_DIM
            v[i] = scale
            return v

        rows = [(i, "syn", basis(i % ANN_DIM)) for i in range(12)]
        rows[7] = (7, "syn", basis(3))  # exact duplicate of vec 3
        (spark.createDataFrame(
            rows, "vec_id long, label string, embedding array<double>")
         .coalesce(1).write.parquet(str(tmp_path / "embeddings.parquet")))

        got = [tuple(r) for r in q_semdedup(spark, str(tmp_path)).collect()]
        assert len(got) == 1
        vec_id, _cid, kept_by, cos = got[0]
        assert (vec_id, kept_by) == (7, 3)
        assert cos == pytest.approx(1.0)

    def test_plan_shape(self, spark):
        """Same invariants the registry-wide gate will enforce after
        registration: no SortMergeJoin, no CartesianProduct (the
        centroid fan-outs are bounded broadcasts), and a deterministic
        optimized-plan fingerprint."""
        from astra_perseverance_spark.extensions.similarity import (
            q_semdedup,
        )
        from astra_perseverance_spark.functions.planfp import (
            plan_fingerprint,
        )

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            q_semdedup(spark, SF_SMALL).explain("formatted")
        p = buf.getvalue()
        assert "SortMergeJoin" not in p
        assert "CartesianProduct" not in p
        fps = {plan_fingerprint(q_semdedup(spark, SF_SMALL))
               for _ in range(3)}
        assert len(fps) == 1
