"""Ingestion layer: parsers from raw diagnostic artifacts to the
conformed star schema (SURVEY.md §2.1 S1–S10)."""

from astra_perseverance_spark.sources.corpus_jsonl import (
    ingest_jsonl_corpus,
    read_documents_jsonl,
    stream_documents_jsonl,
    stream_ingest_jsonl_corpus,
)
from astra_perseverance_spark.sources.diag import load_model_from_diag
from astra_perseverance_spark.sources.events_jsonl import (
    ingest_events_jsonl,
    read_events_jsonl,
    stream_events_jsonl,
    stream_ingest_events_jsonl,
)
from astra_perseverance_spark.sources.webdataset import (
    ingest_webdataset_corpus,
    read_webdataset,
    stream_documents_webdataset,
    stream_ingest_webdataset_corpus,
)
from astra_perseverance_spark.sources.webdataset_source import (
    WebDatasetDataSource,
    register_webdataset,
)

__all__ = ["WebDatasetDataSource", "ingest_events_jsonl",
           "ingest_jsonl_corpus", "ingest_webdataset_corpus",
           "load_model_from_diag", "read_documents_jsonl",
           "read_events_jsonl", "read_webdataset",
           "register_webdataset", "stream_documents_jsonl",
           "stream_documents_webdataset", "stream_events_jsonl",
           "stream_ingest_events_jsonl", "stream_ingest_jsonl_corpus",
           "stream_ingest_webdataset_corpus"]
