"""Sinks: Excel workbook (S11), summary.json (S12), and the native
columnar view export (parquet/CSV per registered query)."""

from astra_perseverance_spark.sinks.compact import (
    compact_corpus,
    compact_parquet,
)
from astra_perseverance_spark.sinks.export import (
    export_curated_corpus,
    export_training_shards,
    export_views,
    export_webdataset,
)
from astra_perseverance_spark.sinks.warehouse import (
    colocated_doc_join,
    write_bucketed_corpus,
)
from astra_perseverance_spark.sinks.report import (
    write_report,
    write_summary_json,
    write_workbook,
)

__all__ = ["colocated_doc_join", "compact_corpus", "compact_parquet",
           "export_curated_corpus", "export_training_shards",
           "export_views", "export_webdataset", "write_bucketed_corpus",
           "write_report", "write_summary_json", "write_workbook"]
