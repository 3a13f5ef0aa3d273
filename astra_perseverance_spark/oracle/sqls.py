"""DuckDB oracle SQL per declared query.

Each entry is self-contained ANSI SQL (DuckDB dialect) over the
driver-registered parquet views; the conformed-model prelude is
prepended so both engines compute from identical derived tables.
Column aliases match the Spark DataFrame output exactly (the driver's
compare sorts columns by name before hashing).
"""

from __future__ import annotations

from astra_perseverance_spark.config import SYSTEM_KEYSPACES
from astra_perseverance_spark.oracle.prelude import CONFORMED_PRELUDE

_SYS_LIST = ", ".join(f"'{k}'" for k in SYSTEM_KEYSPACES)

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
