"""DuckDB oracle SQL per declared query.

Each entry is self-contained ANSI SQL (DuckDB dialect) over the
driver-registered parquet views; the conformed-model prelude is
prepended so both engines compute from identical derived tables.
Column aliases match the Spark DataFrame output exactly (the driver's
compare sorts columns by name before hashing).
"""

from __future__ import annotations

from astra_perseverance_spark.config import SYSTEM_KEYSPACES, Thresholds
from astra_perseverance_spark.functions.percentiles import GC_PCTS, nearest_rank_sql
from astra_perseverance_spark.oracle.prelude import CONFORMED_PRELUDE

_SYS_LIST = ", ".join(f"'{k}'" for k in SYSTEM_KEYSPACES)
_T = Thresholds()

# Shared workload CTEs (twin of queries/workload.py bases).
_WORKLOAD_CTES = f""",
total_rf AS (
  SELECT ks, CAST(SUM(rf) AS BIGINT) AS total_rf FROM keyspace_rf GROUP BY ks
),
reads_b AS (
  SELECT c.ks, c.tbl, c.value / COALESCE(r.rf, 1) AS rn, n.uptime_sec
  FROM cfstats_metric c
  JOIN node_info n ON c.node = n.node
  LEFT JOIN keyspace_rf r ON c.dc = r.dc AND c.ks = r.ks
  WHERE c.metric = 'local_read_count' AND c.tbl <> ''
    AND c.ks NOT IN ({_SYS_LIST})
),
writes_b AS (
  SELECT c.ks, c.tbl, c.value / COALESCE(t.total_rf, 1) AS rn, n.uptime_sec
  FROM cfstats_metric c
  JOIN node_info n ON c.node = n.node
  LEFT JOIN total_rf t ON c.ks = t.ks
  WHERE c.metric = 'local_write_count' AND c.tbl <> ''
    AND c.ks NOT IN ({_SYS_LIST})
),
sizes_b AS (
  SELECT c.ks, c.tbl, c.value / COALESCE(t.total_rf, 1) AS rn
  FROM cfstats_metric c
  LEFT JOIN total_rf t ON c.ks = t.ks
  WHERE c.metric = 'space_used_live' AND c.tbl <> ''
    AND c.ks NOT IN ({_SYS_LIST})
),
totals AS (
  SELECT (SELECT COALESCE(SUM(rn), 0) FROM reads_b) AS total_reads,
         (SELECT COALESCE(SUM(rn), 0) FROM writes_b) AS total_writes
)
"""

ORACLE_SQL: dict[str, str] = {}

ORACLE_SQL["workload_reads"] = CONFORMED_PRELUDE + _WORKLOAD_CTES + """
SELECT a.ks, a.tbl,
       CAST(a.read_requests AS DOUBLE) AS read_requests,
       CAST(a.avg_read_tps AS DOUBLE) AS avg_read_tps,
       CAST(a.read_requests / t.total_reads AS DOUBLE) AS pct_reads,
       CAST(a.read_requests / (t.total_reads + t.total_writes) AS DOUBLE) AS r_pct_rw
FROM (
  SELECT ks, tbl, SUM(rn) AS read_requests,
         SUM(rn / uptime_sec) AS avg_read_tps
  FROM reads_b GROUP BY ks, tbl
) a CROSS JOIN totals t
ORDER BY read_requests DESC, ks, tbl
"""

ORACLE_SQL["workload_writes"] = CONFORMED_PRELUDE + _WORKLOAD_CTES + """
SELECT a.ks, a.tbl,
       CAST(a.write_requests AS DOUBLE) AS write_requests,
       CAST(a.avg_write_tps AS DOUBLE) AS avg_write_tps,
       CAST(a.write_requests / t.total_writes AS DOUBLE) AS pct_writes,
       CAST(a.write_requests / (t.total_reads + t.total_writes) AS DOUBLE) AS w_pct_rw
FROM (
  SELECT ks, tbl, SUM(rn) AS write_requests,
         SUM(rn / uptime_sec) AS avg_write_tps
  FROM writes_b GROUP BY ks, tbl
) a CROSS JOIN totals t
ORDER BY write_requests DESC, ks, tbl
"""

ORACLE_SQL["data_size"] = CONFORMED_PRELUDE + _WORKLOAD_CTES + """
SELECT ks, tbl, CAST(size_bytes AS DOUBLE) AS size_bytes FROM (
  SELECT ks, tbl, SUM(rn) AS size_bytes FROM sizes_b GROUP BY ks, tbl
  UNION ALL
  SELECT '' AS ks, '' AS tbl, COALESCE(SUM(rn), 0) AS size_bytes FROM sizes_b
)
ORDER BY size_bytes DESC, ks, tbl
"""

ORACLE_SQL["workload_summary"] = CONFORMED_PRELUDE + _WORKLOAD_CTES + """
SELECT CAST(r.total_reads AS DOUBLE) AS total_reads,
       CAST(w.total_writes AS DOUBLE) AS total_writes,
       CAST(r.total_read_tps AS DOUBLE) AS total_read_tps,
       CAST(w.total_write_tps AS DOUBLE) AS total_write_tps,
       CAST(r.total_read_tps * 2629800 AS DOUBLE) AS read_tpmo,
       CAST(w.total_write_tps * 2629800 AS DOUBLE) AS write_tpmo,
       CAST(r.total_reads / (r.total_reads + w.total_writes) AS DOUBLE) AS total_r_pct_rw,
       CAST(w.total_writes / (r.total_reads + w.total_writes) AS DOUBLE) AS total_w_pct_rw,
       CAST(s.total_size_bytes / 1000000000.0 AS DOUBLE) AS data_size_gb,
       CAST(u.avg_uptime_sec AS DOUBLE) AS avg_uptime_sec
FROM (SELECT COALESCE(SUM(rn), 0) AS total_reads,
             COALESCE(SUM(rn / uptime_sec), 0) AS total_read_tps FROM reads_b) r
CROSS JOIN (SELECT COALESCE(SUM(rn), 0) AS total_writes,
                   COALESCE(SUM(rn / uptime_sec), 0) AS total_write_tps FROM writes_b) w
CROSS JOIN (SELECT COALESCE(SUM(rn), 0) AS total_size_bytes FROM sizes_b) s
CROSS JOIN (SELECT AVG(uptime_sec) AS avg_uptime_sec FROM node_info) u
"""

ORACLE_SQL["workload_rw_outer"] = CONFORMED_PRELUDE + _WORKLOAD_CTES + """
SELECT COALESCE(r.ks, w.ks) AS ks, COALESCE(r.tbl, w.tbl) AS tbl,
       CAST(r.read_requests AS DOUBLE) AS read_requests,
       CAST(r.avg_read_tps AS DOUBLE) AS avg_read_tps,
       CAST(w.write_requests AS DOUBLE) AS write_requests,
       CAST(w.avg_write_tps AS DOUBLE) AS avg_write_tps
FROM (
  SELECT ks, tbl, SUM(rn) AS read_requests, SUM(rn / uptime_sec) AS avg_read_tps
  FROM reads_b GROUP BY ks, tbl
) r FULL OUTER JOIN (
  SELECT ks, tbl, SUM(rn) AS write_requests, SUM(rn / uptime_sec) AS avg_write_tps
  FROM writes_b GROUP BY ks, tbl
) w ON r.ks = w.ks AND r.tbl = w.tbl
ORDER BY ks, tbl
"""

ORACLE_SQL["summary_long"] = CONFORMED_PRELUDE + _WORKLOAD_CTES + """
SELECT section, ks, tbl, metric, CAST(value AS DOUBLE) AS value FROM (
  SELECT 'workload_read' AS section, ks, tbl, 'requests' AS metric,
         SUM(rn) AS value FROM reads_b GROUP BY ks, tbl
  UNION ALL
  SELECT 'workload_read', ks, tbl, 'tps', SUM(rn / uptime_sec)
  FROM reads_b GROUP BY ks, tbl
  UNION ALL
  SELECT 'workload_write', ks, tbl, 'requests', SUM(rn)
  FROM writes_b GROUP BY ks, tbl
  UNION ALL
  SELECT 'workload_write', ks, tbl, 'tps', SUM(rn / uptime_sec)
  FROM writes_b GROUP BY ks, tbl
  UNION ALL
  SELECT 'data_size', ks, tbl, 'bytes', SUM(rn) FROM sizes_b GROUP BY ks, tbl
  UNION ALL
  SELECT 'totals', '', '', 'total_reads',
         (SELECT total_reads FROM totals)
  UNION ALL
  SELECT 'totals', '', '', 'total_writes',
         (SELECT total_writes FROM totals)
  UNION ALL
  SELECT 'totals', '', '', 'total_read_tps',
         (SELECT COALESCE(SUM(rn / uptime_sec), 0) FROM reads_b)
  UNION ALL
  SELECT 'totals', '', '', 'total_write_tps',
         (SELECT COALESCE(SUM(rn / uptime_sec), 0) FROM writes_b)
  UNION ALL
  SELECT 'totals', '', '', 'data_size_gb',
         (SELECT COALESCE(SUM(rn), 0) / 1000000000.0 FROM sizes_b)
  UNION ALL
  SELECT 'totals', '', '', 'avg_uptime_sec',
         (SELECT AVG(uptime_sec) FROM node_info)
)
ORDER BY section, ks, tbl, metric
"""

# ---------------------------------------------------------------------------
# Q5 / Q19 — GC percentile rollup (twin of queries/gc.py).
# Same histogram construction: collapse gc_event to (group, pause_ms)
# counts, then read count/min/max/nearest-rank picks/argmax-ts off the
# histogram at each of the three grouping levels.
# ---------------------------------------------------------------------------

_PACK = 10_000_000_000


def _gc_level_ctes(grp: list[str], lvl: int) -> str:
    """CTE block (h/s/c/p + final select) for one grouping level."""
    gcols = ", ".join(grp)
    gsel = (gcols + ", ") if grp else ""
    gby = f"GROUP BY {gcols}" if grp else ""
    part = f"PARTITION BY {gcols} " if grp else ""
    on = " AND ".join(f"c.{g} = s.{g}" for g in grp) or "TRUE"
    on_sp = " AND ".join(f"s.{g} = p.{g}" for g in grp) or "TRUE"
    picks = ",\n         ".join(
        f"CAST(MIN(CASE WHEN c.cum >= {nearest_rank_sql('s.n', p)}"
        f" THEN c.pause_ms END) AS BIGINT) AS p{p}"
        for p in GC_PCTS
    )
    c_gsel = ("".join(f"c.{g}, " for g in grp))
    p_gby = f"GROUP BY {', '.join('c.' + g for g in grp)}" if grp else ""
    dc = "s.dc" if "dc" in grp else "'ALL'"
    node = "s.node" if "node" in grp else "'ALL'"
    return f"""
h{lvl} AS (
  SELECT {gsel}pause_ms, CAST(SUM(cnt) AS BIGINT) AS cnt,
         MIN(min_ep) AS min_ep, MAX(max_ep) AS max_ep
  FROM gc_hist GROUP BY {gsel}pause_ms
),
s{lvl} AS (
  SELECT {gsel}CAST(SUM(cnt) AS BIGINT) AS n,
         CAST(MIN(pause_ms) AS BIGINT) AS min_ms,
         CAST(MAX(pause_ms) AS BIGINT) AS max_ms,
         CAST(MIN(min_ep) AS BIGINT) AS from_ts,
         CAST(MAX(max_ep) AS BIGINT) AS to_ts,
         CAST(MAX(CAST(pause_ms AS BIGINT) * {_PACK} + max_ep) % {_PACK} AS BIGINT) AS max_ts
  FROM h{lvl} {gby}
),
c{lvl} AS (
  SELECT {gsel}pause_ms, SUM(cnt) OVER ({part}ORDER BY pause_ms) AS cum
  FROM h{lvl}
),
p{lvl} AS (
  SELECT {c_gsel}{picks}
  FROM c{lvl} c JOIN s{lvl} s ON {on}
  {p_gby}
),
lvl{lvl} AS (
  SELECT CAST({lvl} AS BIGINT) AS lvl, {dc} AS dc, {node} AS node,
         s.n AS pauses, s.min_ms,
         {", ".join(f"p.p{p}" for p in GC_PCTS)},
         s.max_ms, s.from_ts, s.to_ts, s.max_ts
  FROM s{lvl} s JOIN p{lvl} p ON {on_sp}
)"""


_GC_CTES = (
    """,
gc_hist AS (
  SELECT dc, node, pause_ms, COUNT(*) AS cnt,
         MIN(CAST(epoch_ns(ts) // 1000000000 AS BIGINT)) AS min_ep,
         MAX(CAST(epoch_ns(ts) // 1000000000 AS BIGINT)) AS max_ep
  FROM gc_event GROUP BY dc, node, pause_ms
),"""
    + ",".join(
        _gc_level_ctes(g, i)
        for i, g in enumerate(([], ["dc"], ["dc", "node"]))
    )
)

_GC_UNION = "SELECT * FROM lvl0 UNION ALL SELECT * FROM lvl1 UNION ALL SELECT * FROM lvl2"

ORACLE_SQL["gc_percentiles"] = CONFORMED_PRELUDE + _GC_CTES + "\n" + _GC_UNION

ORACLE_SQL["gc_p99_health"] = (
    CONFORMED_PRELUDE + _GC_CTES + f"""
SELECT lvl, dc, node, p99, CAST({_T.tp_gcp_ms} AS BIGINT) AS threshold_ms
FROM ({_GC_UNION}) WHERE p99 > {_T.tp_gcp_ms}
"""
)

# ---------------------------------------------------------------------------
# Q6-Q14 — health / threshold family (twin of queries/health.py).
# ---------------------------------------------------------------------------

_PH_COLS = [("max", "Max"), ("p99", "99%"), ("p98", "98%"), ("p95", "95%"),
            ("p75", "75%"), ("p50", "50%"), ("min", "Min")]

ORACLE_SQL["proxyhistograms_ms"] = CONFORMED_PRELUDE + """
SELECT dc, node,
""" + ",\n".join(
    f"  CAST(COALESCE(SUM(CASE WHEN pct = '{lbl}' THEN {side}_us END), 0)"
    f" / 1000.0 AS DOUBLE) AS {side}_{col}_ms"
    for col, lbl in _PH_COLS for side in ("read", "write")
) + """
FROM proxyhistogram GROUP BY dc, node
ORDER BY dc, node
"""

ORACLE_SQL["node_data"] = CONFORMED_PRELUDE + """
SELECT dc, node, load_str, tokens, rack, uptime_sec, workload, version
FROM node_info ORDER BY dc, node
"""

ORACLE_SQL["dropped_mutations"] = CONFORMED_PRELUDE + f"""
SELECT node, dc, ks, tbl, value
FROM cfstats_metric
WHERE metric = 'dropped_mutations' AND value >= {_T.tp_drm}
  AND ks NOT IN ({_SYS_LIST})
ORDER BY dc, node, ks, tbl
"""

ORACLE_SQL["large_partitions"] = CONFORMED_PRELUDE + f"""
SELECT node, dc, ks, tbl,
       CAST(value / 1000000.0 AS DOUBLE) AS size_mb,
       CAST(CASE WHEN value >= {_T.gr_lpar_mb} * 1000000 THEN 1 ELSE 0 END AS BIGINT)
         AS guardrail_flag
FROM cfstats_metric
WHERE metric = 'compacted_partition_max_bytes'
  AND value >= {_T.tp_lpar_mb} * 1000000
  AND ks NOT IN ({_SYS_LIST})
ORDER BY size_mb DESC, dc, node, ks, tbl
"""

ORACLE_SQL["sstable_count"] = CONFORMED_PRELUDE + f"""
SELECT node AS example_node, dc, ks, tbl, value FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY ks, tbl
                               ORDER BY value DESC, node ASC) AS rn
  FROM cfstats_metric
  WHERE metric = 'sstable_count' AND value >= {_T.tp_sstbl}
    AND ks NOT IN ({_SYS_LIST})
) WHERE rn = 1
ORDER BY value DESC, ks, tbl
"""

ORACLE_SQL["num_tables"] = CONFORMED_PRELUDE + f"""
SELECT node AS sample_node, dc, value FROM (
  SELECT *, ROW_NUMBER() OVER (ORDER BY value DESC, node ASC) AS rn
  FROM cfstats_metric
  WHERE metric = 'total_number_of_tables' AND value >= {_T.tp_tblcnt}
) WHERE rn = 1
"""

ORACLE_SQL["read_latency"] = CONFORMED_PRELUDE + f"""
SELECT node, dc, ks, tbl, value AS ms
FROM cfstats_metric
WHERE metric = 'local_read_latency_ms' AND value >= {_T.tp_rl_ms}
  AND ks NOT IN ({_SYS_LIST})
ORDER BY ms DESC, node, ks, tbl
"""

ORACLE_SQL["write_latency"] = CONFORMED_PRELUDE + f"""
SELECT node, dc, ks, tbl, value AS ms
FROM cfstats_metric
WHERE metric = 'local_write_latency_ms' AND value >= {_T.tp_wl_ms}
  AND ks NOT IN ({_SYS_LIST})
ORDER BY ms DESC, node, ks, tbl
"""

ORACLE_SQL["tombstones"] = CONFORMED_PRELUDE + f"""
SELECT dc, node, ks, tbl, live_rows, tombstones FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY ks, tbl
                               ORDER BY tombstones DESC, node ASC, live_rows DESC) AS rn
  FROM tombstone_event
  WHERE tombstones >= {_T.tp_ts} AND ks NOT IN ({_SYS_LIST})
) WHERE rn = 1
ORDER BY tombstones DESC, ks, tbl
"""

# ---------------------------------------------------------------------------
# Q15-Q17 — schema guardrails (twin of queries/schema_checks.py).
# ---------------------------------------------------------------------------

_DEP_CASE = ("CASE obj_type WHEN 'Index' THEN 'Secondary Indexes'"
             " WHEN 'Storage-Attached Index' THEN 'Storage-Attached Indexes'"
             " ELSE 'Materialized Views' END")
_TP_CASE = (f"CASE obj_type WHEN 'Secondary Indexes' THEN {_T.tp_si}"
            f" WHEN 'Storage-Attached Indexes' THEN {_T.tp_sai}"
            f" ELSE {_T.tp_mv} END")
_GR_CASE = (f"CASE obj_type WHEN 'Secondary Indexes' THEN {_T.gr_si}"
            f" WHEN 'Storage-Attached Indexes' THEN {_T.gr_sai}"
            f" ELSE {_T.gr_mv} END")

ORACLE_SQL["guardrail_dependents"] = CONFORMED_PRELUDE + f"""
SELECT obj_type, src_ks, src_tbl, n,
       CAST(CASE WHEN n > {_GR_CASE} THEN 1 ELSE 0 END AS BIGINT) AS guardrail_flag
FROM (
  SELECT {_DEP_CASE} AS obj_type, src_ks, src_tbl,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM schema_object
  WHERE obj_type IN ('Index', 'Storage-Attached Index', 'Materialized Views')
    AND src_ks NOT IN ({_SYS_LIST})
  GROUP BY 1, src_ks, src_tbl
)
WHERE n > {_TP_CASE}
ORDER BY obj_type, src_ks, src_tbl
"""

ORACLE_SQL["column_count"] = CONFORMED_PRELUDE + f"""
SELECT ks, tbl, n,
       CAST(CASE WHEN n > {_T.gr_colcnt} THEN 1 ELSE 0 END AS BIGINT) AS guardrail_flag
FROM (
  SELECT ks, tbl, CAST(COUNT(*) AS BIGINT) AS n
  FROM schema_column WHERE ks NOT IN ({_SYS_LIST})
  GROUP BY ks, tbl
)
WHERE n > {_T.tp_colcnt}
ORDER BY n DESC, ks, tbl
"""

ORACLE_SQL["uda_udf_presence"] = CONFORMED_PRELUDE + f"""
SELECT ks, name, obj_type AS kind
FROM schema_object
WHERE obj_type IN ('UDF', 'UDA') AND ks NOT IN ({_SYS_LIST})
ORDER BY kind, ks, name
"""
