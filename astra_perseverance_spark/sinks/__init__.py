"""Sinks: Excel workbook (S11), summary.json (S12), and the native
columnar view export (parquet/CSV per registered query)."""

from astra_perseverance_spark.sinks.export import export_views
from astra_perseverance_spark.sinks.report import (
    write_report,
    write_summary_json,
    write_workbook,
)

__all__ = ["export_views", "write_report", "write_summary_json",
           "write_workbook"]
