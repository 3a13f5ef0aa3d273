"""Contract tests for the live-cluster source (sources/cassandra.py).

The Spark Cassandra connector jar is not in this container, so these
tests verify the module's contract without connecting: a fake
DataFrameReader records the format string and reader options each
call makes, and serves in-memory DataFrames with the real
``system_schema`` shapes — which lets every derivation (RF map
explode, obj_type vocabulary, column mapping) execute end-to-end and
be asserted against the conformed-dim contracts the parsed path
produces.
"""

from __future__ import annotations

import pytest


class _FakeReader:
    """Stands in for spark.read: records format/options, serves
    prepared DataFrames keyed by (keyspace, table)."""

    def __init__(self, tables: dict, calls: list):
        self._tables = tables
        self._calls = calls
        self._fmt = None
        self._opts = {}

    def format(self, fmt):
        self._fmt = fmt
        return self

    def options(self, **kw):
        self._opts.update(kw)
        return self

    def load(self):
        self._calls.append((self._fmt, dict(self._opts)))
        return self._tables[(self._opts["keyspace"], self._opts["table"])]


@pytest.fixture(scope="module")
def fake_cluster(spark):
    """In-memory system_schema.* with the connector's column shapes."""
    mk = spark.createDataFrame
    nts = "org.apache.cassandra.locator.NetworkTopologyStrategy"
    ss = "org.apache.cassandra.locator.SimpleStrategy"
    return {
        ("system_schema", "keyspaces"): mk(
            [("app", {"class": nts, "dc1": "3", "dc2": "2"}),
             ("legacy", {"class": ss, "replication_factor": "1"}),
             ("system_auth", {"class": ss, "replication_factor": "1"})],
            "keyspace_name string, replication map<string,string>"),
        ("system_schema", "indexes"): mk(
            [("app", "users", "users_email_idx", "COMPOSITES"),
             ("app", "users", "users_name_sai", "CUSTOM")],
            "keyspace_name string, table_name string, index_name string, "
            "kind string"),
        ("system_schema", "views"): mk(
            [("app", "users_by_city", "users")],
            "keyspace_name string, view_name string, base_table_name string"),
        ("system_schema", "functions"): mk(
            [("app", "avg_state")], "keyspace_name string, function_name string"),
        ("system_schema", "aggregates"): mk(
            [("app", "avg_agg")], "keyspace_name string, aggregate_name string"),
        ("system_schema", "columns"): mk(
            [("app", "users", "id", "uuid", "partition_key"),
             ("app", "users", "city", "text", "clustering"),
             ("app", "users", "email", "text", "regular")],
            "keyspace_name string, table_name string, column_name string, "
            "type string, kind string"),
    }


@pytest.fixture()
def live(spark, fake_cluster, monkeypatch):
    """Patch SparkSession.read for the test's duration; returns the
    recorded (format, options) call list."""
    from pyspark.sql import SparkSession

    calls: list = []
    monkeypatch.setattr(
        SparkSession, "read",
        property(lambda self: _FakeReader(fake_cluster, calls)))
    return calls


class TestCassandraSource:
    def test_reader_uses_connector_format_and_options(self, spark, live):
        from astra_perseverance_spark.sources import cassandra as c

        c.keyspace_rf_live(spark).collect()
        assert live, "reader never invoked"
        for fmt, opts in live:
            assert fmt == c.CASSANDRA_FORMAT
            assert opts["keyspace"] == "system_schema"
        assert {o["table"] for _, o in live} == {"keyspaces"}

    def test_keyspace_rf_parses_both_strategies(self, spark, live):
        from astra_perseverance_spark.sources import cassandra as c

        rows = {(r["dc"], r["ks"], r["rf"])
                for r in c.keyspace_rf_live(spark).collect()}
        # NTS → one row per DC; SimpleStrategy → dc="ALL"; system
        # keyspaces present at this layer (P3 filtering is the
        # consuming guardrail queries' job, same as the parsed path)
        assert rows == {("dc1", "app", 3), ("dc2", "app", 2),
                        ("ALL", "legacy", 1), ("ALL", "system_auth", 1)}

    def test_schema_object_vocabulary(self, spark, live):
        from astra_perseverance_spark.sources import cassandra as c

        rows = {(r["ks"], r["name"], r["obj_type"], r["src_tbl"])
                for r in c.schema_object_live(spark).collect()}
        assert rows == {
            ("app", "users_email_idx", "Secondary Indexes", "users"),
            ("app", "users_name_sai", "Storage-Attached Indexes", "users"),
            ("app", "users_by_city", "Materialized Views", "users"),
            ("app", "avg_state", "Functions", None),
            ("app", "avg_agg", "Aggregates", None),
        }
        tables = {o["table"] for _, o in live}
        assert tables == {"indexes", "views", "functions", "aggregates"}

    def test_schema_column_contract(self, spark, live):
        from astra_perseverance_spark.sources import cassandra as c

        df = c.schema_column_live(spark)
        assert df.columns == ["ks", "tbl", "col", "cql_type", "kind"]
        kinds = {r["kind"] for r in df.collect()}
        assert kinds == {"partition_key", "clustering", "regular"}

    def test_live_dims_satisfy_guardrail_queries(self, spark, live):
        """The point of the live path: Q15-Q17 consumers must accept
        these dims unchanged.  Exercise the P3 filter they apply."""
        from pyspark.sql import functions as F

        from astra_perseverance_spark.config import DEFAULT_CONFIG
        from astra_perseverance_spark.sources import cassandra as c

        rf = c.keyspace_rf_live(spark)
        kept = rf.filter(
            ~F.col("ks").isin(*DEFAULT_CONFIG.excluded_keyspaces))
        assert {r["ks"] for r in kept.collect()} == {"app", "legacy"}
