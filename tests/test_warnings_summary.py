"""Warnings framework + Q20 nested summary.json over the fixture
diag tree (exact reference message formats, explore.py:230-239,
1086-1119, 1453-1464) and canonical-JSON structure checks."""

from __future__ import annotations

import json

import pytest

from tests.conftest import FIXTURE_DIAG


@pytest.fixture(scope="module")
def findings(spark):
    from astra_perseverance_spark.queries import QUERY_REGISTRY

    return [
        (r["category"], r["check"], r["message"])
        for r in QUERY_REGISTRY["warnings"](spark, FIXTURE_DIAG).collect()
    ]


@pytest.fixture(scope="module")
def summary(spark):
    from astra_perseverance_spark.queries import QUERY_REGISTRY

    raw = QUERY_REGISTRY["summary_json"](spark, FIXTURE_DIAG).collect()[0][0]
    return raw, json.loads(raw)


class TestWarnings:
    def test_missing_node_anti_join(self, findings):
        assert ("Missing Data", "Missing Node Data", "10.9.9.9") in findings

    def test_large_partition_message_format(self, findings):
        assert ("Astra Guardrails", "Large Partitions",
                "Table dc1.shop.users partition size 120MB") in findings

    def test_uda_udf_messages(self, findings):
        assert ("Astra Guardrails", "User-Defined Aggregate",
                "UDA average in shop") in findings
        assert ("Astra Guardrails", "User-Defined Function",
                "UDF avg_state in shop") in findings

    def test_tombstone_message_comma_format(self, findings):
        assert ("Database Health", "Tombstones",
                "Tombstones greater than 1,000 in a single read request") in findings

    def test_unsupported_workload_and_graph(self, findings):
        assert ("Workload", "Not Supported", "Search") in findings
        assert ("Workload", "Not Supported", "Graph") in findings

    def test_sorted_and_deduped(self, findings):
        assert findings == sorted(set(findings))


class TestSummaryJson:
    def test_valid_json_with_canonical_top_keys(self, summary):
        _, doc = summary
        assert sorted(doc) == ["avg_uptime_u6", "dataset_size",
                               "missing_data", "warnings", "workload"]

    def test_missing_data_flag(self, summary):
        _, doc = summary
        assert doc["missing_data"] == 1

    def test_keys_sorted_at_every_level(self, summary):
        raw, doc = summary

        def check(node):
            if isinstance(node, dict):
                assert list(node) == sorted(node)
                for v in node.values():
                    check(v)
            elif isinstance(node, list):
                assert node == sorted(node)

        # json.loads preserves document order → dict order == emission order
        check(doc)

    def test_workload_table_sides(self, summary):
        _, doc = summary
        orders = doc["workload"]["shop"]["orders"]
        assert sorted(orders) == ["read", "write"]
        assert sorted(orders["read"]) == [
            "avg_tps_u6", "perc_read_u6", "perc_rw_u6", "read_req_u6"]
        assert orders["read"]["read_req_u6"] == 1250_000000  # 1250 µ-units

    def test_dataset_size_total_consistent(self, summary):
        _, doc = summary
        ds = doc["dataset_size"]
        total = ds["total_u6"]
        parts = sum(
            tbl["size_u6"]
            for ks, tables in ds.items() if ks != "total_u6"
            for tbl in tables.values()
        )
        # per-table u6 roundings can differ from the rounded total by
        # at most one µ-unit each
        n_tables = sum(len(t) for k, t in ds.items() if k != "total_u6")
        assert abs(total - parts) <= n_tables

    def test_warnings_section_matches_query(self, summary, findings):
        _, doc = summary
        flat = [
            (cat, check, msg)
            for cat, checks in doc["warnings"].items()
            for check, msgs in checks.items()
            for msg in msgs
        ]
        assert sorted(flat) == sorted(findings)
