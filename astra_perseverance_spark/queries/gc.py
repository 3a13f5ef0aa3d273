"""Q5 GC-pause percentile rollup + Q19 P99 health finding.

Reference: get_gc_data (explore.py:364-398) computes the same
percentile block at Database, DC, and Node level (explore.py:332-334,
1072-1077) — i.e. GROUPING SETS ((), (dc), (dc,node)).

Implementation is histogram-based (see functions.percentiles): the
fact is first collapsed to (group, pause_ms) counts — bounded
cardinality — then every statistic (count, min/max, nearest-rank
percentiles, argmax-with-latest-ts tie-break) is read off the
histogram.  The three grouping levels re-aggregate the *node-level
histogram*, not the raw fact, so the event data is scanned exactly
once regardless of scale.

The argmax tie-break (max_ts = timestamp of the max pause, ties →
latest ts, explore.py:335-341) uses an integer pack:
``pause·10^10 + epoch_sec`` — exact in int64, portable to any engine.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from astra_perseverance_spark.config import DEFAULT_CONFIG, EngineConfig
from astra_perseverance_spark.conformed import load_model
from astra_perseverance_spark.functions.percentiles import GC_PCTS, nearest_rank_1based

_PACK = 10_000_000_000  # pause_ms ≤ 10^6 ≪ pack base; epoch_sec < 10^10


def _node_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(dc, node, pause_ms) histogram with per-bucket ts extremes."""
    gc = load_model(spark, sf_dir).gc_event
    return gc.select(
        "dc", "node", "pause_ms", F.col("ts").cast("long").alias("ep")
    ).groupBy("dc", "node", "pause_ms").agg(
        F.count("*").alias("cnt"),
        F.min("ep").alias("min_ep"),
        F.max("ep").alias("max_ep"),
    )


def _pct_block(hist: DataFrame, group_cols: list[str], lvl: int) -> DataFrame:
    """Percentile block for one grouping level over a value histogram."""
    grp = group_cols if group_cols else []
    # re-aggregate histogram to this level
    h = hist.groupBy(*grp, "pause_ms").agg(
        F.sum("cnt").alias("cnt"),
        F.min("min_ep").alias("min_ep"),
        F.max("max_ep").alias("max_ep"),
    )
    stats = h.groupBy(*grp).agg(
        F.sum("cnt").cast("long").alias("n"),
        F.min("pause_ms").cast("long").alias("min_ms"),
        F.max("pause_ms").cast("long").alias("max_ms"),
        F.min("min_ep").alias("from_ts"),
        F.max("max_ep").alias("to_ts"),
        (F.max(F.col("pause_ms").cast("long") * _PACK + F.col("max_ep")) % _PACK)
        .alias("max_ts"),
    )
    for p in GC_PCTS:
        stats = stats.withColumn(f"rank{p}", nearest_rank_1based(F.col("n"), p))
    w = Window.partitionBy(*(grp or [F.lit(1)])).orderBy("pause_ms") \
        .rowsBetween(Window.unboundedPreceding, 0)
    cum = h.withColumn("cum", F.sum("cnt").over(w))
    joined = cum.join(F.broadcast(stats), grp) if grp else cum.crossJoin(F.broadcast(stats))
    picks = joined.groupBy(*grp).agg(
        *[
            F.min(F.when(F.col("cum") >= F.col(f"rank{p}"), F.col("pause_ms")))
            .cast("long").alias(f"p{p}")
            for p in GC_PCTS
        ]
    )
    out = stats.join(picks, grp) if grp else stats.crossJoin(picks)
    return out.select(
        F.lit(lvl).cast("long").alias("lvl"),
        (F.col("dc") if "dc" in grp else F.lit("ALL")).alias("dc"),
        (F.col("node") if "node" in grp else F.lit("ALL")).alias("node"),
        F.col("n").alias("pauses"),
        "min_ms", *[f"p{p}" for p in GC_PCTS], "max_ms",
        "from_ts", "to_ts", "max_ts",
    )


def q_gc_percentiles(spark: SparkSession, sf_dir: str,
                     cfg: EngineConfig = DEFAULT_CONFIG) -> DataFrame:
    """Q5 — GROUPING SETS ((), (dc), (dc,node)) percentile blocks."""
    hist = _node_hist(spark, sf_dir)
    db = _pct_block(hist, [], 0)
    dc = _pct_block(hist, ["dc"], 1)
    node = _pct_block(hist, ["dc", "node"], 2)
    return db.unionByName(dc).unionByName(node).orderBy("lvl", "dc", "node")


def q_gc_p99_health(spark: SparkSession, sf_dir: str,
                    cfg: EngineConfig = DEFAULT_CONFIG) -> DataFrame:
    """Q19 — groups whose P99 GC pause exceeds tp_gcp (800 ms),
    explore.py:388-389."""
    tp = cfg.thresholds.tp_gcp_ms
    return (
        q_gc_percentiles(spark, sf_dir, cfg)
        .filter(F.col("p99") > tp)
        .select("lvl", "dc", "node", "p99",
                F.lit(tp).cast("long").alias("threshold_ms"))
        .orderBy("lvl", "dc", "node")
    )
