"""Ingestion layer: parsers from raw diagnostic artifacts to the
conformed star schema (SURVEY.md §2.1 S1–S10)."""

from astra_perseverance_spark.sources.diag import load_model_from_diag

__all__ = ["load_model_from_diag"]
