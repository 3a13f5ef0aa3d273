"""Report sinks: the Excel workbook (S11) and summary.json (S12).

Tab registry mirrors the reference workbook (explore.py:1127-1139):
Astra Metrics, Workload, Data Size, Node Data, Proxihistogram, Dropped
Mutation, Number of Tables, Large Partitions, SSTable Count, Read
Latency, Write Latency, Tombstones, GC Pauses — each fed by the
registered query of the same grain, collected to the driver (all are
per-table/per-node grains — bounded by schema size, explore.py renders
the same rows) and rendered through ``sinks.xlsx``.

The reference's Excel *formula* cells (totals via ``=SUM(...)``,
explore.py:1724, 1758-1760, 1811-1826) are written as computed values:
the engine computes totals in Spark; formulas were presentation only
(SURVEY.md §7 'What's hard' (e)).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

from astra_perseverance_spark.sinks.xlsx import HEADER_STYLE, Workbook

# tab name → (query name, ordered [(header, column)] mapping)
TAB_REGISTRY: list[tuple[str, str, list[tuple[str, str]]]] = [
    ("Workload", "workload_rw_outer", [
        ("Keyspace", "ks"), ("Table", "tbl"),
        ("Read Requests", "read_requests"), ("Read TPS", "avg_read_tps"),
        ("Write Requests", "write_requests"), ("Write TPS", "avg_write_tps"),
    ]),
    ("Data Size", "data_size", [
        ("Keyspace", "ks"), ("Table", "tbl"), ("Size (bytes)", "size_bytes"),
    ]),
    ("Node Data", "node_data", [
        ("Datacenter", "dc"), ("Node", "node"), ("Load", "load_str"),
        ("Tokens", "tokens"), ("Rack", "rack"), ("Uptime (sec)", "uptime_sec"),
        ("Uptime", "uptime_sec", "uptime"),
        ("Workload", "workload"), ("Version", "version"),
    ]),
    ("Proxihistogram", "proxyhistograms_ms", [
        ("Datacenter", "dc"), ("Node", "node"),
        ("R Max", "read_max_ms"), ("R P99", "read_p99_ms"),
        ("R P98", "read_p98_ms"), ("R P95", "read_p95_ms"),
        ("R P75", "read_p75_ms"), ("R P50", "read_p50_ms"),
        ("R Min", "read_min_ms"),
        ("W Max", "write_max_ms"), ("W P99", "write_p99_ms"),
        ("W P98", "write_p98_ms"), ("W P95", "write_p95_ms"),
        ("W P75", "write_p75_ms"), ("W P50", "write_p50_ms"),
        ("W Min", "write_min_ms"),
    ]),
    ("Dropped Mutation", "dropped_mutations", [
        ("Node", "node"), ("DC", "dc"), ("Keyspace", "ks"), ("Table", "tbl"),
        ("Dropped Mutations", "value"),
    ]),
    ("Number of Tables", "num_tables", [
        ("Sample Node", "sample_node"), ("DC", "dc"),
        ("Total Number of Tables", "value"),
    ]),
    ("Large Partitions", "large_partitions", [
        ("Node", "node"), ("DC", "dc"), ("Keyspace", "ks"), ("Table", "tbl"),
        ("Partition Size(MB)", "size_mb"),
    ]),
    ("SSTable Count", "sstable_count", [
        ("Example Node", "example_node"), ("DC", "dc"), ("Keyspace", "ks"),
        ("Table", "tbl"), ("SSTable Count", "value"),
    ]),
    ("Read Latency", "read_latency", [
        ("Node", "node"), ("DC", "dc"), ("Keyspace", "ks"), ("Table", "tbl"),
        ("Read Latency (ms)", "ms"),
    ]),
    ("Write Latency", "write_latency", [
        ("Node", "node"), ("DC", "dc"), ("Keyspace", "ks"), ("Table", "tbl"),
        ("Write Latency (ms)", "ms"),
    ]),
    ("Tombstones", "tombstones", [
        ("DC", "dc"), ("Node", "node"), ("Keyspace", "ks"), ("Table", "tbl"),
        ("Live Rows", "live_rows"), ("Tombstones", "tombstones"),
    ]),
    ("GC Pauses", "gc_percentiles", [
        ("Level", "lvl"), ("DC", "dc"), ("Node", "node"), ("Pauses", "pauses"),
        ("Min", "min_ms"), ("P50", "p50"), ("P75", "p75"), ("P90", "p90"),
        ("P95", "p95"), ("P98", "p98"), ("P99", "p99"), ("Max", "max_ms"),
    ]),
]


def _metrics_sheet(wb: Workbook, spark: SparkSession, sf_dir: str,
                   cfg) -> None:
    """The 'Astra Metrics' tab: workload scalars + the warnings list
    (explore.py:1806-1846)."""
    from astra_perseverance_spark.queries import QUERY_REGISTRY

    sh = wb.add_sheet("Astra Metrics", freeze_rows=1, col_widths=[30, 60])
    sh.add_row(["Workload Summary", None], style=HEADER_STYLE)
    s = QUERY_REGISTRY["workload_summary"](spark, sf_dir, cfg).collect()[0]
    for label, key in (
        ("Read TPS", "total_read_tps"), ("Read TPMo", "read_tpmo"),
        ("Write TPS", "total_write_tps"), ("Write TPMo", "write_tpmo"),
        ("Data Size (GB)", "data_size_gb"), ("Average Uptime", "avg_uptime_sec"),
    ):
        sh.add_row([label, s[key]])
    warn = QUERY_REGISTRY["warnings"](spark, sf_dir, cfg).collect()
    if warn:
        cur = None
        for r in warn:
            head = (r["category"], r["check"])
            if head != cur:
                sh.add_row([f"{r['category']} — {r['check']}", None],
                           style=HEADER_STYLE)
                cur = head
            sh.add_row([None, r["message"]])
    else:
        sh.add_row(["No potential guardrail issues identified", None])

    # the reference renders this as a textbox (explore.py:173-205,
    # 1846); the dependency-free OOXML writer renders the same content
    # as cells — content parity, not drawing parity
    t = cfg.thresholds
    sh.add_row([None, None])
    sh.add_row(["Astra Guardrail Limits", None], style=HEADER_STYLE)
    for line in (
        f"{t.gr_mv} materialized views per table",
        f"{t.gr_si} secondary index per table",
        f"{t.gr_sai} storage-attached indexes per table",
        f"{t.gr_tblcnt} tables in a cluster",
        f"{t.gr_colcnt} columns in a table",
        f"{t.gr_lpar_mb} MB partition size",
        "This sheet is intended to be used as a guide; see the current "
        "Astra guardrails documentation for authoritative limits.",
    ):
        sh.add_row([None, line])


def _fmt_uptime(sec) -> str | None:
    """Seconds → 'D days hh:mm:ss' — the reference renders this as an
    Excel formula column (explore.py:1554); the engine formats the
    already-computed value instead (render concern, like B7)."""
    if sec is None:
        return None
    d, rem = divmod(int(sec), 86400)
    h, rem = divmod(rem, 3600)
    m, s = divmod(rem, 60)
    return f"{d} days {h:02d}:{m:02d}:{s:02d}"


_RENDERERS = {"uptime": _fmt_uptime}

# Per-tab comment textbox texts (explore.py:443-450 sheet comments,
# 1663 gc_comment), rendered as a trailing row by the OOXML writer.
TAB_COMMENTS = {
    "dropped_mutations": lambda t:
        f"Tables with more than {t.tp_drm:,} dropped mutations. (cfstats)",
    "large_partitions": lambda t:
        f"Tables with partiton sizes greater than {t.tp_lpar_mb}MB. (cfstats)",
    "sstable_count": lambda t:
        f"Tables with number of sstables greater than {t.tp_sstbl}.",
    "read_latency": lambda t:
        f"Tables with read latency greater than {t.tp_rl_ms}ms. (cfstats)",
    "write_latency": lambda t:
        f"Tables with write latency greater than {t.tp_wl_ms}ms. (cfstats)",
    "gc_percentiles": lambda t:
        "NOTE: The GC pauses on this sheet are based on GC pauses over "
        "200ms (default setting).  Pauses under 200ms are not recorded "
        "in the system logs.",
}


def _df_sheet(wb: Workbook, name: str, df: DataFrame,
              cols: list[tuple], comment: str | None = None) -> None:
    sh = wb.add_sheet(name, freeze_rows=1,
                      col_widths=[18] * len(cols))
    sh.add_row([spec[0] for spec in cols], style=HEADER_STYLE)
    for row in df.collect():
        sh.add_row([
            _RENDERERS[spec[2]](row[spec[1]]) if len(spec) > 2
            else row[spec[1]]
            for spec in cols
        ])
    if comment:
        sh.add_row([comment])


def write_workbook(spark: SparkSession, sf_dir: str, out_path: str,
                   cfg=None) -> str:
    """Render the full report workbook; returns the path written.

    ``cfg`` carries the reference's CLI-tunable parameters (threshold
    overrides after guardrail clamping, the -incl_sys toggle); every
    tab query accepts it positionally."""
    from astra_perseverance_spark.config import DEFAULT_CONFIG
    from astra_perseverance_spark.queries import QUERY_REGISTRY

    cfg = cfg or DEFAULT_CONFIG
    wb = Workbook()
    _metrics_sheet(wb, spark, sf_dir, cfg)
    for tab, qname, cols in TAB_REGISTRY:
        comment = TAB_COMMENTS.get(qname)
        _df_sheet(wb, tab, QUERY_REGISTRY[qname](spark, sf_dir, cfg), cols,
                  comment(cfg.thresholds) if comment else None)
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    wb.save(out_path)
    return out_path


def write_summary_json(spark: SparkSession, sf_dir: str, out_path: str,
                       cfg=None) -> str:
    """S12: the canonical nested summary.json (explore.py:1851-1854)."""
    from astra_perseverance_spark.config import DEFAULT_CONFIG
    from astra_perseverance_spark.queries import QUERY_REGISTRY

    cfg = cfg or DEFAULT_CONFIG
    doc = QUERY_REGISTRY["summary_json"](spark, sf_dir, cfg).collect()[0][0]
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    with open(out_path, "w") as fh:
        fh.write(doc)
    json.loads(doc)  # sanity: the sink only ever writes valid JSON
    return out_path


def write_report(spark: SparkSession, sf_dir: str, out_dir: str,
                 cluster_name: str = "cluster", cfg=None) -> dict[str, str]:
    """The reference's two artifacts (explore.py:1124, 1853):
    <name>_astra_chart.xlsx + summary.json."""
    os.makedirs(out_dir, exist_ok=True)
    return {
        "xlsx": write_workbook(
            spark, sf_dir,
            os.path.join(out_dir, f"{cluster_name}_astra_chart.xlsx"), cfg),
        "summary_json": write_summary_json(
            spark, sf_dir, os.path.join(out_dir, "summary.json"), cfg),
    }
