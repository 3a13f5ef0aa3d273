"""Live-cluster source: conformed schema dims via the Spark Cassandra
connector (the alternative ingestion path SURVEY.md §2.1 S9 names —
``system_schema.*`` instead of parsing a CQL DDL dump).

The diag-tree parsers (``sources.diag``) cover the reference's input
surface (an offline snapshot).  This module covers the online case:
point the engine at a running cluster and derive the same conformed
dims — ``keyspace_rf``, ``schema_object``, ``schema_column`` — so
every schema-guardrail query (Q15–Q17) runs unchanged against live
metadata.

Requires the Spark Cassandra connector on the classpath
(``com.datastax.spark:spark-cassandra-connector`` — NOT bundled in
this container, so these readers are construction-tested only; the
load path is exercised when the jar + a contact point exist).  The
format string and options below are the connector's public API:
``spark.read.format("org.apache.spark.sql.cassandra")
.options(keyspace=…, table=…)``.

Scale: ``system_schema`` tables are cluster-metadata-sized (thousands
of rows at most) — one partition-parallel read each, then the same
broadcast-dim role the parsed equivalents play.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CASSANDRA_FORMAT = "org.apache.spark.sql.cassandra"

# The metadata keyspace these readers scan.  NOTE: like the parsed
# snapshot dims (sources.diag), the live dims are deliberately
# UNFILTERED — system keyspaces included.  The config-driven
# anti-filter (P3) is applied downstream by the consuming guardrail
# queries (queries/schema_checks.py filters on cfg.excluded_keyspaces
# for BOTH ingestion paths), keeping live and parsed dims
# row-for-row symmetric at this layer.
_SCHEMA_KS = "system_schema"


def cassandra_table(spark: SparkSession, keyspace: str, table: str) -> DataFrame:
    """A connector-backed DataFrame for one Cassandra table."""
    return (
        spark.read.format(CASSANDRA_FORMAT)
        .options(keyspace=keyspace, table=table)
        .load()
    )


def keyspace_rf_live(spark: SparkSession) -> DataFrame:
    """keyspace_rf(dc, ks, rf) from ``system_schema.keyspaces``.

    ``replication`` is a map<text,text>: strategy class under key
    'class', then per-DC RFs for NetworkTopologyStrategy or a single
    'replication_factor' for SimpleStrategy (mirrors the DDL parse in
    ``sources.diag.build_keyspace_rf``; reference semantics
    explore.py:757-787)."""
    ks = cassandra_table(spark, _SCHEMA_KS, "keyspaces").select(
        F.col("keyspace_name").alias("ks"), "replication"
    )
    exploded = ks.select(
        "ks", F.explode(F.col("replication")).alias("k", "v")
    )
    per_dc = exploded.filter(
        ~F.col("k").isin("class", "replication_factor")
    ).select("ks", F.col("k").alias("dc"), F.col("v").cast("int").alias("rf"))
    simple = exploded.filter(F.col("k") == "replication_factor").select(
        "ks", F.lit("ALL").alias("dc"), F.col("v").cast("int").alias("rf")
    )
    return per_dc.unionByName(simple).select("dc", "ks", "rf")


def schema_object_live(spark: SparkSession) -> DataFrame:
    """schema_object(ks, name, obj_type, src_ks, src_tbl) from
    ``system_schema.{indexes,views,functions,aggregates}``.

    obj_type vocabulary matches the DDL parser: 'Secondary Indexes' /
    'Storage-Attached Indexes' (SAI custom class), 'Materialized
    Views', 'Functions', 'Aggregates' (explore.py:791-855)."""
    idx = cassandra_table(spark, _SCHEMA_KS, "indexes").select(
        F.col("keyspace_name").alias("ks"),
        F.col("index_name").alias("name"),
        F.when(
            F.col("kind") == "CUSTOM", F.lit("Storage-Attached Indexes")
        ).otherwise(F.lit("Secondary Indexes")).alias("obj_type"),
        F.col("keyspace_name").alias("src_ks"),
        F.col("table_name").alias("src_tbl"),
    )
    mv = cassandra_table(spark, _SCHEMA_KS, "views").select(
        F.col("keyspace_name").alias("ks"),
        F.col("view_name").alias("name"),
        F.lit("Materialized Views").alias("obj_type"),
        F.col("keyspace_name").alias("src_ks"),
        F.col("base_table_name").alias("src_tbl"),
    )
    fn = cassandra_table(spark, _SCHEMA_KS, "functions").select(
        F.col("keyspace_name").alias("ks"),
        F.col("function_name").alias("name"),
        F.lit("Functions").alias("obj_type"),
        F.lit(None).cast("string").alias("src_ks"),
        F.lit(None).cast("string").alias("src_tbl"),
    )
    agg = cassandra_table(spark, _SCHEMA_KS, "aggregates").select(
        F.col("keyspace_name").alias("ks"),
        F.col("aggregate_name").alias("name"),
        F.lit("Aggregates").alias("obj_type"),
        F.lit(None).cast("string").alias("src_ks"),
        F.lit(None).cast("string").alias("src_tbl"),
    )
    return idx.unionByName(mv).unionByName(fn).unionByName(agg)


def schema_column_live(spark: SparkSession) -> DataFrame:
    """schema_column(ks, tbl, col, cql_type, kind) from
    ``system_schema.columns`` (kind ∈ partition_key / clustering /
    regular / static — the parser's vocabulary)."""
    return cassandra_table(spark, _SCHEMA_KS, "columns").select(
        F.col("keyspace_name").alias("ks"),
        F.col("table_name").alias("tbl"),
        F.col("column_name").alias("col"),
        F.col("type").alias("cql_type"),
        F.col("kind"),
    )
