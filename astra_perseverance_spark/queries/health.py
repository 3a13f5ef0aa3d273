"""Health/threshold views: Q6 proxyhistograms, Q7 node data,
Q8–Q13 cfstats threshold tabs, Q14 tombstones.

Q8–Q13 all share one parameterized generator, mirroring the
reference's table-driven ``sheets_data`` loop (explore.py:443-450,
1424-1473).  Dedup-top-1 views implement the *intended* max-per-group
semantics (the reference's hasattr bug B1 keeps the last row instead —
SURVEY.md §8).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from astra_perseverance_spark.config import DEFAULT_CONFIG, EngineConfig
from astra_perseverance_spark.conformed import load_model
from astra_perseverance_spark.functions.ordering import report_sorted

_PCT_COLS = [("max", "Max"), ("p99", "99%"), ("p98", "98%"), ("p95", "95%"),
             ("p75", "75%"), ("p50", "50%"), ("min", "Min")]


def q_proxyhistograms_ms(spark: SparkSession, sf_dir: str,
                         cfg: EngineConfig = DEFAULT_CONFIG) -> DataFrame:
    """Q6 — coordinator read/write latency per node, µs → ms
    (explore.py:1494-1542).  Missing percentile rows → 0.0; nodes with
    no proxyhistograms file are absent entirely."""
    ph = load_model(spark, sf_dir).proxyhistogram
    aggs = []
    for col, lbl in _PCT_COLS:
        for side in ("read", "write"):
            aggs.append(
                (F.coalesce(F.sum(F.when(F.col("pct") == lbl, F.col(f"{side}_us"))),
                            F.lit(0.0)) / 1000.0)
                .cast("double").alias(f"{side}_{col}_ms")
            )
    return ph.groupBy("dc", "node").agg(*aggs).transform(report_sorted("dc", "node"))


def q_node_data(spark: SparkSession, sf_dir: str,
                cfg: EngineConfig = DEFAULT_CONFIG) -> DataFrame:
    """Q7 — node dimension view (explore.py:1544-1560, 674-712)."""
    ni = load_model(spark, sf_dir).node_info
    return ni.select("dc", "node", "load_str", "tokens", "rack",
                     "uptime_sec", "workload", "version").transform(report_sorted("dc", "node"))


def _threshold_rows(spark: SparkSession, sf_dir: str, cfg: EngineConfig,
                    metric: str, threshold: float) -> DataFrame:
    """Shared cfstats threshold filter (explore.py:1440-1464):
    rows of one metric with value >= threshold, system ks excluded."""
    cf = load_model(spark, sf_dir).cfstats_metric
    return cf.filter(
        (F.col("metric") == metric)
        & (F.col("value") >= threshold)
        & ~F.col("ks").isin(*cfg.excluded_keyspaces)
    )


def q_dropped_mutations(spark: SparkSession, sf_dir: str,
                        cfg: EngineConfig = DEFAULT_CONFIG) -> DataFrame:
    """Q8 — dropped mutations ≥ tp_drm (explore.py:445)."""
    return (
        _threshold_rows(spark, sf_dir, cfg, "dropped_mutations",
                        cfg.thresholds.tp_drm)
        .select("node", "dc", "ks", "tbl", "value")
        .transform(report_sorted("dc", "node", "ks", "tbl"))
    )


def q_large_partitions(spark: SparkSession, sf_dir: str,
                       cfg: EngineConfig = DEFAULT_CONFIG) -> DataFrame:
    """Q9 — compacted partition max ≥ tp_lpar MB; guardrail flag at
    gr_lpar MB (explore.py:447, 1453-1462; README guardrail)."""
    tp = cfg.thresholds.tp_lpar_mb * 1_000_000
    gr = cfg.thresholds.gr_lpar_mb * 1_000_000
    return (
        _threshold_rows(spark, sf_dir, cfg, "compacted_partition_max_bytes", tp)
        .select(
            "node", "dc", "ks", "tbl",
            (F.col("value") / 1_000_000.0).cast("double").alias("size_mb"),
            F.when(F.col("value") >= gr, 1).otherwise(0).cast("long")
            .alias("guardrail_flag"),
        )
        .transform(report_sorted(F.desc("size_mb"), "dc", "node", "ks", "tbl"))
    )


def q_sstable_count(spark: SparkSession, sf_dir: str,
                    cfg: EngineConfig = DEFAULT_CONFIG) -> DataFrame:
    """Q10 — sstable count ≥ tp_sstbl, deduped to the max row per
    (ks, tbl) with node ASC tie-break — the intended semantics of the
    reference's 'extra' sheets (explore.py:1477-1492, bug B1)."""
    base = _threshold_rows(spark, sf_dir, cfg, "sstable_count",
                           cfg.thresholds.tp_sstbl)
    w = Window.partitionBy("ks", "tbl").orderBy(F.desc("value"), F.asc("node"))
    return (
        base.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(F.col("node").alias("example_node"), "dc", "ks", "tbl", "value")
        .transform(report_sorted(F.desc("value"), "ks", "tbl"))
    )


def q_num_tables(spark: SparkSession, sf_dir: str,
                 cfg: EngineConfig = DEFAULT_CONFIG) -> DataFrame:
    """Q11 — total table count ≥ tp_tblcnt; one row (max value, node
    ASC tie-break) per cluster (explore.py:446, 1448-1452)."""
    cf = load_model(spark, sf_dir).cfstats_metric
    base = cf.filter(
        (F.col("metric") == "total_number_of_tables")
        & (F.col("value") >= cfg.thresholds.tp_tblcnt)
    )
    w = Window.partitionBy().orderBy(F.desc("value"), F.asc("node"))
    return (
        base.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(F.col("node").alias("sample_node"), "dc", "value")
    )


def q_read_latency(spark: SparkSession, sf_dir: str,
                   cfg: EngineConfig = DEFAULT_CONFIG) -> DataFrame:
    """Q12 — local read latency ≥ tp_rl ms (explore.py:449)."""
    return (
        _threshold_rows(spark, sf_dir, cfg, "local_read_latency_ms",
                        cfg.thresholds.tp_rl_ms)
        .select("node", "dc", "ks", "tbl", F.col("value").alias("ms"))
        .transform(report_sorted(F.desc("ms"), "node", "ks", "tbl"))
    )


def q_write_latency(spark: SparkSession, sf_dir: str,
                    cfg: EngineConfig = DEFAULT_CONFIG) -> DataFrame:
    """Q13 — local write latency ≥ tp_wl ms (explore.py:450)."""
    return (
        _threshold_rows(spark, sf_dir, cfg, "local_write_latency_ms",
                        cfg.thresholds.tp_wl_ms)
        .select("node", "dc", "ks", "tbl", F.col("value").alias("ms"))
        .transform(report_sorted(F.desc("ms"), "node", "ks", "tbl"))
    )


def q_tombstones(spark: SparkSession, sf_dir: str,
                 cfg: EngineConfig = DEFAULT_CONFIG) -> DataFrame:
    """Q14 — tombstone warnings ≥ tp_ts, deduped to the worst row per
    (ks, tbl), node ASC tie-break (explore.py:342-357, 1574-1602)."""
    ts = load_model(spark, sf_dir).tombstone_event
    base = ts.filter(
        (F.col("tombstones") >= cfg.thresholds.tp_ts)
        & ~F.col("ks").isin(*cfg.excluded_keyspaces)
    )
    # live_rows DESC completes the total order: several warnings can
    # share (ks, tbl, tombstones, node) — without it the surviving
    # row's live_rows would be nondeterministic.
    w = Window.partitionBy("ks", "tbl").orderBy(
        F.desc("tombstones"), F.asc("node"), F.desc("live_rows")
    )
    return (
        base.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("dc", "node", "ks", "tbl", "live_rows", "tombstones")
        .transform(report_sorted(F.desc("tombstones"), "ks", "tbl"))
    )
