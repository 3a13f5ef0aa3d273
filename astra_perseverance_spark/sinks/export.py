"""Columnar view export: every registered query as parquet/CSV.

The Excel workbook is a presentation layer over report-grain results;
this sink is the engine's *native* output path — each registered query
written by the executors (``df.write``), no driver collect, so it
scales to fact-grain results: at 100 TB a view lands as a partitioned
parquet dataset sized by the cluster's task count, not a single file.

CSV cannot carry arrays/structs/maps, so non-atomic columns are
serialized with ``to_json`` (documented, lossless for re-parsing);
parquet keeps the native types.
"""

from __future__ import annotations

import inspect
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, MapType, StructType


def _call(fn, spark: SparkSession, sf_dir: str, cfg):
    """Registry callables are (spark, sf_dir) or (spark, sf_dir, cfg)."""
    if cfg is not None and len(inspect.signature(fn).parameters) >= 3:
        return fn(spark, sf_dir, cfg)
    return fn(spark, sf_dir)


def _csv_safe(df: DataFrame) -> DataFrame:
    cols = [
        F.to_json(f.name).alias(f.name)
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
        else F.col(f.name)
        for f in df.schema.fields
    ]
    return df.select(*cols)


def export_views(spark: SparkSession, sf_dir: str, out_dir: str,
                 fmt: str = "parquet", names: list[str] | None = None,
                 cfg=None) -> dict[str, str]:
    """Write each named query (default: all registered) under
    ``out_dir/<query>/`` in ``fmt``; returns query → output path."""
    if fmt not in ("parquet", "csv"):
        raise ValueError(f"unsupported export format: {fmt!r}")
    from astra_perseverance_spark.queries import QUERY_REGISTRY

    if names is None:
        # default = everything runnable on this input: corpus-family
        # queries need documents/embeddings parquet, which a diag tree
        # does not carry — skip them there (explicitly requested names
        # still fail loudly)
        has_corpus = os.path.exists(
            os.path.join(sf_dir, "documents.parquet"))
        names = [
            n for n, fn in QUERY_REGISTRY.items()
            if has_corpus or not fn.__module__.startswith(
                ("astra_perseverance_spark.extensions",
                 "astra_perseverance_spark.streaming.doc_stream"))
        ]
    unknown = [n for n in names if n not in QUERY_REGISTRY]
    if unknown:
        raise KeyError(f"unknown queries: {unknown}")
    out: dict[str, str] = {}
    for name in names:
        df = _call(QUERY_REGISTRY[name], spark, sf_dir, cfg)
        path = os.path.join(out_dir, name)
        if fmt == "csv":
            _csv_safe(df).write.mode("overwrite").option(
                "header", "true").csv(path)
        else:
            df.write.mode("overwrite").parquet(path)
        out[name] = path
    return out
