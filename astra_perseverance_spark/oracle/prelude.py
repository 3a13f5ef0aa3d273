"""DuckDB-dialect WITH-clause prelude mirroring conformed/model.py.

Every CTE here is the line-for-line SQL twin of a builder in
``conformed.model``; the determinism rules are documented there.  The
driver registers the parquet tables as views named
``region nation customer supplier part orders lineitem events
documents embeddings`` before running these.
"""

from __future__ import annotations

# NOTE: DuckDB '%' on BIGINT matches Spark '%' for non-negative args;
# floor() is applied before every double→int conversion; '//' is
# integer division.  String concat uses ||; CAST(... AS VARCHAR) of a
# BIGINT renders without sign/zero padding, same as Spark's cast to
# string.

CONFORMED_PRELUDE = r"""
WITH
ks_dim AS (
  SELECT CAST(n_nationkey AS BIGINT) AS nk,
         CASE WHEN n_nationkey = 0 THEN 'system'
              WHEN n_nationkey = 1 THEN 'system_schema'
              ELSE lower(n_name) END AS ks
  FROM nation
),
node_count AS (SELECT COUNT(*) AS ns FROM supplier),
node_info AS (
  SELECT 'n' || CAST(k AS VARCHAR) AS node,
         'dc' || CAST(1 + k % 2 AS VARCHAR) AS dc,
         'rack' || CAST(1 + k % 3 AS VARCHAR) AS rack,
         CAST(k % 900 AS VARCHAR) || ' GiB' AS load_str,
         CAST(8 + 8 * (k % 4) AS INT) AS tokens,
         CAST(65536 * CAST(power(2.0, CAST(k % 5 AS DOUBLE)) AS BIGINT) AS BIGINT) AS uptime_sec,
         CASE WHEN k % 4 = 2 THEN 'Search'
              WHEN k % 4 = 3 THEN 'Analytics'
              ELSE 'Cassandra' END AS workload,
         CASE WHEN k % 5 = 0 THEN '3.11.11' ELSE '4.0.7' END AS version
  FROM (SELECT CAST(s_suppkey AS BIGINT) AS k FROM supplier)
),
keyspace_rf AS (
  SELECT 'dc' || CAST(dc_i AS VARCHAR) AS dc, ks,
         CAST(CASE WHEN nk % 3 = 0 THEN 1 WHEN nk % 3 = 1 THEN 2 ELSE 4 END AS INT) AS rf
  FROM ks_dim CROSS JOIN (SELECT UNNEST([1, 2]) AS dc_i)
  WHERE nk <> 24
),
cfstats_rows AS (
  SELECT l.node, l.dc, k.ks, l.tbl, l.metric, l.value
  FROM (
    SELECT 'n' || CAST(sk AS VARCHAR) AS node,
           'dc' || CAST(1 + sk % 2 AS VARCHAR) AS dc,
           pk % 25 AS nk,
           't' || CAST(pk % 8 AS VARCHAR) AS tbl,
           CASE ln WHEN 1 THEN 'space_used_live'
                   WHEN 2 THEN 'local_read_count'
                   WHEN 3 THEN 'local_write_count'
                   WHEN 4 THEN 'local_read_latency_ms'
                   WHEN 5 THEN 'local_write_latency_ms'
                   WHEN 6 THEN 'sstable_count'
                   ELSE 'dropped_mutations' END AS metric,
           CASE ln WHEN 1 THEN ep * 1024
                   WHEN 2 THEN ep
                   WHEN 3 THEN ep
                   WHEN 4 THEN ep % 200
                   WHEN 5 THEN ep % 150
                   WHEN 6 THEN ep % 40
                   ELSE (ep * 100) % 200000 END AS value
    FROM (
      SELECT CAST(l_suppkey AS BIGINT) AS sk, CAST(l_partkey AS BIGINT) AS pk,
             CAST(l_linenumber AS BIGINT) AS ln,
             CAST(floor(l_extendedprice) AS BIGINT) AS ep
      FROM lineitem
    )
  ) l JOIN ks_dim k ON l.nk = k.nk
  WHERE NOT (l.metric = 'local_write_count' AND l.tbl = 't7')
    AND NOT (l.metric = 'local_read_count' AND l.tbl = 't6')
  UNION ALL
  SELECT o.node, o.dc, COALESCE(k.ks, '') AS ks, o.tbl, o.metric, o.value
  FROM (
    SELECT 'n' || CAST(ok % ns AS VARCHAR) AS node,
           'dc' || CAST(1 + (ok % ns) % 2 AS VARCHAR) AS dc,
           CASE WHEN ok % 2 = 0 THEN ck % 25 ELSE NULL END AS nk,
           CASE WHEN ok % 2 = 0 THEN 't' || CAST(ck % 8 AS VARCHAR) ELSE '' END AS tbl,
           CASE WHEN ok % 2 = 0 THEN 'compacted_partition_max_bytes'
                ELSE 'total_number_of_tables' END AS metric,
           CASE WHEN ok % 2 = 0 THEN (tp * 977) % 400000000
                ELSE 100 + ok % 120 END AS value
    FROM (
      SELECT CAST(o_orderkey AS BIGINT) AS ok, CAST(o_custkey AS BIGINT) AS ck,
             CAST(floor(o_totalprice) AS BIGINT) AS tp
      FROM orders
    ) CROSS JOIN node_count
  ) o LEFT JOIN ks_dim k ON o.nk = k.nk
),
cfstats_metric AS (
  SELECT node, dc, ks, tbl, metric,
         CAST(CASE WHEN metric IN ('space_used_live','local_read_count',
                                   'local_write_count','dropped_mutations')
                   THEN SUM(value) ELSE MAX(value) END AS DOUBLE) AS value
  FROM cfstats_rows
  GROUP BY node, dc, ks, tbl, metric
),
gc_event AS (
  -- ts is minute-truncated naive wall time built from the raw
  -- nanos-since-epoch integer (same integer Spark reads via
  -- nanosAsLong), so both engines agree regardless of timezone.
  SELECT 'n' || CAST(uid % ns AS VARCHAR) AS node,
         'dc' || CAST(1 + (uid % ns) % 2 AS VARCHAR) AS dc,
         make_timestamp((epoch_ns(ts) // 60000000000) * 60 * 1000000) AS ts,
         CAST(201 + (CAST(floor(value * 100) AS BIGINT) % 1300 + 1300) % 1300 AS INT) AS pause_ms
  FROM (SELECT CAST(user_id AS BIGINT) AS uid, ts, value FROM events)
  CROSS JOIN node_count
),
tombstone_event AS (
  SELECT o.node, o.dc, k.ks, o.tbl, o.live_rows, o.tombstones
  FROM (
    SELECT 'n' || CAST(ok % ns AS VARCHAR) AS node,
           'dc' || CAST(1 + (ok % ns) % 2 AS VARCHAR) AS dc,
           (ck + 7) % 25 AS nk,
           't' || CAST((ok + 3) % 8 AS VARCHAR) AS tbl,
           CAST(tp AS BIGINT) AS live_rows,
           CAST((ok * 13) % 3000 AS BIGINT) AS tombstones
    FROM (
      SELECT CAST(o_orderkey AS BIGINT) AS ok, CAST(o_custkey AS BIGINT) AS ck,
             CAST(floor(o_totalprice) AS BIGINT) AS tp
      FROM orders
    ) CROSS JOIN node_count
  ) o JOIN ks_dim k ON o.nk = k.nk
),
proxyhistogram AS (
  SELECT 'n' || CAST(k AS VARCHAR) AS node,
         'dc' || CAST(1 + k % 2 AS VARCHAR) AS dc,
         pct,
         CAST((k % 50) * 100 + i * i * 700 AS DOUBLE) AS read_us,
         CAST((k % 37) * 80 + i * i * 500 AS DOUBLE) AS write_us
  FROM (SELECT CAST(s_suppkey AS BIGINT) AS k FROM supplier)
  CROSS JOIN (SELECT UNNEST(['Min','50%','75%','95%','98%','99%','Max']) AS pct,
                     UNNEST([0, 1, 2, 3, 4, 5, 6]) AS i)
  WHERE k % 17 <> 3 AND NOT (k % 23 = 5 AND i = 4)
),
schema_column AS (
  SELECT k.ks, p.tbl, p.col, p.cql_type, p.kind
  FROM (
    SELECT pk % 25 AS nk,
           't' || CAST(pk % (1 + (pk % 25) % 10) AS VARCHAR) AS tbl,
           'c' || CAST(pk AS VARCHAR) AS col,
           CASE pk % 4 WHEN 0 THEN 'text' WHEN 1 THEN 'bigint'
                       WHEN 2 THEN 'uuid' ELSE 'timestamp' END AS cql_type,
           CASE pk % 19 WHEN 0 THEN 'partition_key' WHEN 1 THEN 'clustering'
                        ELSE 'regular' END AS kind
    FROM (SELECT CAST(p_partkey AS BIGINT) AS pk FROM part)
  ) p JOIN ks_dim k ON p.nk = k.nk
),
schema_object AS (
  SELECT ks, tbl AS name, 'Table' AS obj_type,
         CAST(NULL AS VARCHAR) AS src_ks, CAST(NULL AS VARCHAR) AS src_tbl
  FROM (SELECT DISTINCT ks, tbl FROM schema_column)
  UNION ALL
  SELECT k.ks, d.prefix || CAST(d.pk AS VARCHAR) AS name, d.obj_type,
         k.ks AS src_ks, d.src_tbl
  FROM (
    SELECT pk,
           CASE (pk // 5) % 3 WHEN 0 THEN 'Index'
                              WHEN 1 THEN 'Storage-Attached Index'
                              ELSE 'Materialized Views' END AS obj_type,
           CASE (pk // 5) % 3 WHEN 0 THEN 'idx_' WHEN 1 THEN 'sai_'
                              ELSE 'mv_' END AS prefix,
           2 + pk % 5 AS nk,
           't' || CAST(pk % 2 AS VARCHAR) AS src_tbl
    FROM (SELECT CAST(p_partkey AS BIGINT) AS pk FROM part)
    WHERE pk % 5 = 0
  ) d JOIN ks_dim k ON d.nk = k.nk
  UNION ALL
  SELECT k.ks, 'fn_' || CAST(f.pk AS VARCHAR) AS name, f.obj_type,
         CAST(NULL AS VARCHAR) AS src_ks, CAST(NULL AS VARCHAR) AS src_tbl
  FROM (
    SELECT pk,
           CASE (pk // 97) % 2 WHEN 0 THEN 'UDF' ELSE 'UDA' END AS obj_type,
           pk % 25 AS nk
    FROM (SELECT CAST(p_partkey AS BIGINT) AS pk FROM part)
    WHERE pk % 97 = 0
  ) f JOIN ks_dim k ON f.nk = k.nk
)
"""
