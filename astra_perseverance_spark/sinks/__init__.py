"""Presentation sinks: Excel workbook (S11) + summary.json (S12)."""

from astra_perseverance_spark.sinks.report import (
    write_report,
    write_summary_json,
    write_workbook,
)

__all__ = ["write_report", "write_summary_json", "write_workbook"]
