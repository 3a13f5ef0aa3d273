"""astra_perseverance_spark — a PySpark-native analytics engine with the
query/data-processing capabilities of ssdatastax/astra-perseverance.

The reference (/root/reference/explore.py) is a single-threaded Python
batch analyzer of Cassandra diagnostic snapshots.  This package
re-expresses its entire dataflow surface (SURVEY.md §2) as declarative
Spark DataFrame pipelines over a conformed star schema, plus the
large-scale training-data operators (dedup, similarity search, text
analysis, multimodal plumbing) a 100 TB pipeline needs.

Layout:
- ``conformed``  — the engine-internal star schema (facts + dims) and
  its deterministic derivation from the driver's synthetic tables.
- ``queries``    — the declared query surface Q1–Q20 (SURVEY.md §2.10).
- ``oracle``     — ANSI-SQL equivalents (DuckDB-runnable) per query.
- ``sources``    — ingestion: Cassandra diag-tree parsers (read.text +
  carry-forward windows), parquet loaders.
- ``functions``  — reusable column expressions (exact percentiles,
  vector math, text hashing).
- ``extensions`` — dedup / similarity / text-analysis / multimodal ops.
- ``sinks``      — Excel workbook + summary.json renderers.
- ``streaming``  — Structured Streaming variants of the event facts.
"""

from astra_perseverance_spark.config import DEFAULT_CONFIG, EngineConfig, Thresholds
from astra_perseverance_spark.session import get_spark

__all__ = ["DEFAULT_CONFIG", "EngineConfig", "Thresholds", "get_spark"]
__version__ = "0.1.0"
