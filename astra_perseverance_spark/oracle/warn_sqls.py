"""DuckDB oracle twins for the warnings framework and Q20's nested
``summary.json`` (queries/warnings.py, queries/summary.py).

Message strings and the canonical-JSON assembly mirror the Spark
expressions verbatim; all floats are micro-unit integers (``u6``) —
``floor(x·10⁶ + 0.5)`` — so no engine-side decimal formatting is
involved (see queries/summary.py canonicalization notes).
"""

from __future__ import annotations

from astra_perseverance_spark.config import SYSTEM_KEYSPACES, Thresholds
from astra_perseverance_spark.functions.percentiles import nearest_rank_sql
from astra_perseverance_spark.oracle.prelude import CONFORMED_PRELUDE
from astra_perseverance_spark.oracle.sqls import _WORKLOAD_CTES

_SYS = ", ".join(f"'{k}'" for k in SYSTEM_KEYSPACES)
_T = Thresholds()


def _u6(x: str) -> str:
    return f"CAST(CAST(floor(({x}) * 1000000.0 + 0.5) AS BIGINT) AS VARCHAR)"


_WARN_CTES = f""",
dep AS (
  SELECT CASE obj_type WHEN 'Index' THEN 'Secondary Indexes'
                       WHEN 'Storage-Attached Index' THEN 'Storage-Attached Indexes'
                       ELSE 'Materialized Views' END AS lbl,
         src_ks, src_tbl, COUNT(*) AS n
  FROM schema_object
  WHERE obj_type IN ('Index', 'Storage-Attached Index', 'Materialized Views')
    AND src_ks NOT IN ({_SYS})
  GROUP BY 1, 2, 3
),
gcn AS (SELECT COUNT(*) AS n FROM gc_event),
gc_p99_db AS (
  SELECT pause_ms FROM (
    SELECT pause_ms, ROW_NUMBER() OVER (ORDER BY pause_ms) AS rn FROM gc_event
  ) CROSS JOIN gcn WHERE rn = {nearest_rank_sql('n', 99)}
),
warn AS (
  SELECT 'Astra Guardrails' AS category, lbl AS chk,
         CAST(n AS VARCHAR) || ' ' || lbl || ' of ' || src_ks || '.' || src_tbl ||
         CASE WHEN n > (CASE lbl WHEN 'Secondary Indexes' THEN {_T.gr_si}
                                 WHEN 'Storage-Attached Indexes' THEN {_T.gr_sai}
                                 ELSE {_T.gr_mv} END)
              THEN '***' ELSE '' END AS message
  FROM dep
  WHERE n > (CASE lbl WHEN 'Secondary Indexes' THEN {_T.tp_si}
                      WHEN 'Storage-Attached Indexes' THEN {_T.tp_sai}
                      ELSE {_T.tp_mv} END)
  UNION ALL
  SELECT 'Astra Guardrails', 'Number of Tables',
         CAST(v AS VARCHAR) || ' tables in database' ||
         CASE WHEN v >= {_T.gr_tblcnt} THEN '***' ELSE '' END
  FROM (SELECT CAST(MAX(value) AS BIGINT) AS v FROM cfstats_metric
        WHERE metric = 'total_number_of_tables')
  WHERE v >= {_T.tp_tblcnt}
  UNION ALL
  SELECT 'Astra Guardrails', 'Large Partitions',
         'Table ' || dc || '.' || ks || '.' || tbl || ' partition size ' ||
         CAST(CAST(floor(v / 1000000) AS BIGINT) AS VARCHAR) || 'MB' ||
         CASE WHEN v >= {_T.gr_lpar_mb}e6 THEN '***' ELSE '' END
  FROM (SELECT dc, ks, tbl, MAX(value) AS v FROM cfstats_metric
        WHERE metric = 'compacted_partition_max_bytes'
          AND value >= {_T.tp_lpar_mb}e6 AND ks NOT IN ({_SYS})
        GROUP BY dc, ks, tbl)
  UNION ALL
  SELECT 'Astra Guardrails', 'Number of Columns',
         CAST(n AS VARCHAR) || ' columns in ' || ks || '.' || tbl ||
         CASE WHEN n > {_T.gr_colcnt} THEN '***' ELSE '' END
  FROM (SELECT ks, tbl, COUNT(*) AS n FROM schema_column
        WHERE ks NOT IN ({_SYS}) GROUP BY ks, tbl)
  WHERE n > {_T.tp_colcnt}
  UNION ALL
  SELECT 'Astra Guardrails',
         CASE obj_type WHEN 'UDF' THEN 'User-Defined Function'
                       ELSE 'User-Defined Aggregate' END,
         obj_type || ' ' || name || ' in ' || ks
  FROM schema_object
  WHERE obj_type IN ('UDF', 'UDA') AND ks NOT IN ({_SYS})
  UNION ALL
  SELECT 'Database Health', 'GC Pauses',
         'P99 GC pause greater than {_T.tp_gcp_ms}'
  FROM gc_p99_db WHERE pause_ms > {_T.tp_gcp_ms}
  UNION ALL
  SELECT 'Database Health', 'Tombstones',
         'Tombstones greater than {_T.tp_ts:,} in a single read request'
  WHERE EXISTS (SELECT 1 FROM tombstone_event WHERE tombstones >= {_T.tp_ts})
  UNION ALL
  SELECT 'Database Health', 'Dropped Mutation',
         'Dropped Mutation greater than {_T.tp_drm}'
  WHERE EXISTS (SELECT 1 FROM cfstats_metric
                WHERE metric = 'dropped_mutations' AND value >= {_T.tp_drm}
                  AND ks NOT IN ({_SYS}))
  UNION ALL
  SELECT 'Database Health', 'Read Latency',
         'Read Latency greater than {_T.tp_rl_ms}'
  WHERE EXISTS (SELECT 1 FROM cfstats_metric
                WHERE metric = 'local_read_latency_ms' AND value >= {_T.tp_rl_ms}
                  AND ks NOT IN ({_SYS}))
  UNION ALL
  SELECT 'Database Health', 'Write Latency',
         'Write Latency greater than {_T.tp_wl_ms}'
  WHERE EXISTS (SELECT 1 FROM cfstats_metric
                WHERE metric = 'local_write_latency_ms' AND value >= {_T.tp_wl_ms}
                  AND ks NOT IN ({_SYS}))
  UNION ALL
  SELECT 'Workload', 'Not Supported', base
  FROM (SELECT DISTINCT regexp_replace(workload, ' \\+ Graph$', '') AS base
        FROM node_info)
  WHERE base NOT IN ('Cassandra', 'OSS Cassandra', 'DSE Core')
  UNION ALL
  SELECT 'Workload', 'Not Supported', 'Graph'
  FROM (SELECT 1 FROM node_info WHERE workload LIKE '% + Graph' LIMIT 1)
),
warn_distinct AS (SELECT DISTINCT category, chk, message FROM warn)
"""

WARN_ORACLE_SQL: dict[str, str] = {}

WARN_ORACLE_SQL["gc_minute_windows"] = CONFORMED_PRELUDE + """
SELECT make_timestamp((epoch(ts)::BIGINT // 300) * 300 * 1000000) AS window_start,
       dc, CAST(COUNT(*) AS BIGINT) AS pauses,
       CAST(MAX(pause_ms) AS BIGINT) AS max_pause_ms,
       CAST(SUM(pause_ms) AS BIGINT) AS sum_pause_ms
FROM gc_event
GROUP BY 1, 2 ORDER BY window_start, dc
"""

WARN_ORACLE_SQL["gc_sessions"] = CONFORMED_PRELUDE + """
, gaps AS (
  SELECT node, ts, pause_ms,
         CASE WHEN epoch_us(ts)
                   - LAG(epoch_us(ts), 1, 0) OVER
                     (PARTITION BY node ORDER BY ts, pause_ms)
                   >= 1800000000
              THEN 1 ELSE 0 END AS new_session
  FROM gc_event
),
sess AS (
  SELECT node, ts, pause_ms,
         SUM(new_session) OVER (PARTITION BY node ORDER BY ts, pause_ms
                                ROWS UNBOUNDED PRECEDING) AS session_no
  FROM gaps
)
SELECT node, CAST(session_no AS BIGINT) AS session_no,
       MIN(ts) AS session_start, MAX(ts) AS session_end,
       CAST(COUNT(*) AS BIGINT) AS pauses,
       CAST(MAX(pause_ms) AS BIGINT) AS max_pause_ms
FROM sess GROUP BY node, session_no ORDER BY node, session_no
"""

WARN_ORACLE_SQL["warnings"] = CONFORMED_PRELUDE + _WARN_CTES + """
SELECT category, chk AS "check", message
FROM warn_distinct ORDER BY category, chk, message
"""

# ---------------------------------------------------------------------------
# Q20 nested summary.json
# ---------------------------------------------------------------------------

_READ_OBJ = (
    "'{\"avg_tps_u6\":' || " + _u6("r_tps")
    + " || ',\"perc_read_u6\":' || " + _u6("read_req / total_reads")
    + " || ',\"perc_rw_u6\":' || " + _u6("read_req / (total_reads + total_writes)")
    + " || ',\"read_req_u6\":' || " + _u6("read_req") + " || '}'"
)
_WRITE_OBJ = (
    "'{\"avg_tps_u6\":' || " + _u6("w_tps")
    + " || ',\"perc_rw_u6\":' || " + _u6("write_req / (total_reads + total_writes)")
    + " || ',\"perc_write_u6\":' || " + _u6("write_req / total_writes")
    + " || ',\"write_req_u6\":' || " + _u6("write_req") + " || '}'"
)

_SUMMARY_CTES = f""",
rt AS (SELECT ks, tbl, SUM(rn) AS read_req, SUM(rn / uptime_sec) AS r_tps
       FROM reads_b GROUP BY ks, tbl),
wt AS (SELECT ks, tbl, SUM(rn) AS write_req, SUM(rn / uptime_sec) AS w_tps
       FROM writes_b GROUP BY ks, tbl),
rw AS (
  SELECT COALESCE(r.ks, w.ks) AS ks, COALESCE(r.tbl, w.tbl) AS tbl,
         r.read_req, r.r_tps, w.write_req, w.w_tps, t.total_reads, t.total_writes
  FROM rt r FULL OUTER JOIN wt w ON r.ks = w.ks AND r.tbl = w.tbl
  CROSS JOIN totals t
),
tbl_entries AS (
  SELECT ks,
         '"' || tbl || '":{{' ||
         array_to_string(list_sort(list_filter([
           CASE WHEN read_req IS NOT NULL THEN '"read":' || {_READ_OBJ} END,
           CASE WHEN write_req IS NOT NULL THEN '"write":' || {_WRITE_OBJ} END
         ], x -> x IS NOT NULL)), ',') || '}}' AS e
  FROM rw
),
ks_entries AS (
  SELECT '"' || ks || '":{{' || string_agg(e, ',' ORDER BY e) || '}}' AS e
  FROM tbl_entries GROUP BY ks
),
wl_total_entries AS (
  SELECT '"total_read_per_u6":' || {_u6('total_reads / (total_reads + total_writes)')} AS e
  FROM totals
  UNION ALL
  SELECT '"total_read_tps_u6":' || {_u6('(SELECT COALESCE(SUM(r_tps), 0) FROM rt)')}
  UNION ALL
  SELECT '"total_write_per_u6":' || {_u6('total_writes / (total_reads + total_writes)')}
  FROM totals
  UNION ALL
  SELECT '"total_write_tps_u6":' || {_u6('(SELECT COALESCE(SUM(w_tps), 0) FROM wt)')}
),
workload_json AS (
  SELECT '{{' || string_agg(e, ',' ORDER BY e) || '}}' AS j
  FROM (SELECT e FROM ks_entries UNION ALL SELECT e FROM wl_total_entries)
),
sz AS (SELECT ks, tbl, SUM(rn) AS size FROM sizes_b GROUP BY ks, tbl),
ds_entries AS (
  SELECT '"' || ks || '":{{' ||
         string_agg('"' || tbl || '":{{"size_u6":' || {_u6('size')} || '}}',
                    ',' ORDER BY tbl) || '}}' AS e
  FROM sz GROUP BY ks
  UNION ALL
  SELECT '"total_u6":' || {_u6('(SELECT COALESCE(SUM(size), 0) FROM sz)')}
),
dataset_json AS (
  SELECT '{{' || string_agg(e, ',' ORDER BY e) || '}}' AS j FROM ds_entries
),
warn_checks AS (
  SELECT category, chk,
         '"' || chk || '":[' ||
         string_agg('"' || message || '"', ',' ORDER BY message) || ']' AS e
  FROM warn_distinct GROUP BY category, chk
),
warn_cats AS (
  SELECT '"' || category || '":{{' || string_agg(e, ',' ORDER BY e) || '}}' AS e
  FROM warn_checks GROUP BY category
),
warnings_json AS (
  SELECT '{{' || COALESCE(string_agg(e, ',' ORDER BY e), '') || '}}' AS j FROM warn_cats
),
scalars AS (
  SELECT '"avg_uptime_u6":' || {_u6('(SELECT AVG(uptime_sec) FROM node_info)')} AS up,
         '"missing_data":0' AS miss
)
"""

WARN_ORACLE_SQL["summary_json"] = (
    CONFORMED_PRELUDE + _WORKLOAD_CTES + _WARN_CTES + _SUMMARY_CTES + """
SELECT '{' || array_to_string(list_sort([
         s.up,
         '"dataset_size":' || d.j,
         s.miss,
         '"warnings":' || w.j,
         '"workload":' || wl.j
       ]), ',') || '}' AS summary_json
FROM workload_json wl CROSS JOIN dataset_json d
CROSS JOIN warnings_json w CROSS JOIN scalars s
"""
)
