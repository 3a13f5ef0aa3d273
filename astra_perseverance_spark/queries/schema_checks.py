"""Schema guardrail views: Q15 dependent counts, Q16 column counts,
Q17 UDF/UDA inventory.

Reference: add_tp_tbl bridge (explore.py:216-227), guardrail loop
(explore.py:1086-1119), UDF/UDA capture (explore.py:809-838).  Q16/Q17
implement the *intended* semantics — the reference's ``.append =``
bugs (B2/B3, SURVEY.md §8) drop all but the last row and report the
threshold instead of the actual count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from astra_perseverance_spark.config import DEFAULT_CONFIG, EngineConfig
from astra_perseverance_spark.conformed import load_model
from astra_perseverance_spark.functions.ordering import report_sorted

# obj_type in schema_object → reference guardrail label + (tp, gr) keys
_DEP_LABELS = {
    "Index": "Secondary Indexes",
    "Storage-Attached Index": "Storage-Attached Indexes",
    "Materialized Views": "Materialized Views",
}


def dependent_counts(m, cfg: EngineConfig = DEFAULT_CONFIG) -> DataFrame:
    """(obj_type-label, src_ks, src_tbl, n) dependent counts — the
    shared grain under Q15 and the warnings framework."""
    so = m.schema_object
    label = F.create_map(
        *[x for k, v in _DEP_LABELS.items() for x in (F.lit(k), F.lit(v))]
    )[F.col("obj_type")]
    return (
        so.filter(F.col("obj_type").isin(*_DEP_LABELS)
                  & ~F.col("src_ks").isin(*cfg.excluded_keyspaces))
        .select(label.alias("obj_type"), "src_ks", "src_tbl")
        .groupBy("obj_type", "src_ks", "src_tbl")
        .agg(F.count("*").cast("long").alias("n"))
    )


def q_guardrail_dependents(spark: SparkSession, sf_dir: str,
                           cfg: EngineConfig = DEFAULT_CONFIG) -> DataFrame:
    """Q15 — per (dependent type, source table): count of MV/2i/SAI;
    emit rows over tp, flag rows over gr (explore.py:454-466,
    1086-1099)."""
    t = cfg.thresholds
    tp = {"Secondary Indexes": t.tp_si, "Storage-Attached Indexes": t.tp_sai,
          "Materialized Views": t.tp_mv}
    gr = {"Secondary Indexes": t.gr_si, "Storage-Attached Indexes": t.gr_sai,
          "Materialized Views": t.gr_mv}
    tp_col = F.create_map(*[x for k, v in tp.items() for x in (F.lit(k), F.lit(v))])
    gr_col = F.create_map(*[x for k, v in gr.items() for x in (F.lit(k), F.lit(v))])
    agg = dependent_counts(load_model(spark, sf_dir), cfg)
    return (
        agg.filter(F.col("n") > tp_col[F.col("obj_type")])
        .select(
            "obj_type", "src_ks", "src_tbl", "n",
            F.when(F.col("n") > gr_col[F.col("obj_type")], 1).otherwise(0)
            .cast("long").alias("guardrail_flag"),
        )
        .transform(report_sorted("obj_type", "src_ks", "src_tbl"))
    )


def q_column_count(spark: SparkSession, sf_dir: str,
                   cfg: EngineConfig = DEFAULT_CONFIG) -> DataFrame:
    """Q16 — tables with more than tp_colcnt columns; guardrail flag
    over gr_colcnt (explore.py:459-466, 1102-1119; intended actual
    count per bug B3)."""
    t = cfg.thresholds
    sc = load_model(spark, sf_dir).schema_column
    return (
        sc.filter(~F.col("ks").isin(*cfg.excluded_keyspaces))
        .groupBy("ks", "tbl")
        .agg(F.count("*").cast("long").alias("n"))
        .filter(F.col("n") > t.tp_colcnt)
        .select("ks", "tbl", "n",
                F.when(F.col("n") > t.gr_colcnt, 1).otherwise(0)
                .cast("long").alias("guardrail_flag"))
        .transform(report_sorted(F.desc("n"), "ks", "tbl"))
    )


def q_uda_udf_presence(spark: SparkSession, sf_dir: str,
                       cfg: EngineConfig = DEFAULT_CONFIG) -> DataFrame:
    """Q17 — every UDF/UDA object (explore.py:809-838; intended
    collect-all per bug B2)."""
    so = load_model(spark, sf_dir).schema_object
    return (
        so.filter(F.col("obj_type").isin("UDF", "UDA")
                  & ~F.col("ks").isin(*cfg.excluded_keyspaces))
        .select("ks", "name", F.col("obj_type").alias("kind"))
        .transform(report_sorted("kind", "ks", "name"))
    )
