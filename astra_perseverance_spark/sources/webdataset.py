"""WebDataset corpus source: sample-per-member tar shards → the
engine's conformed ``documents`` contract.

The inverse of ``sinks.export.export_webdataset``: trainer-facing tar
shards (each sample a ``{key}.txt`` payload plus ``{key}.json``
metadata member) become a queryable corpus again — so the engine can
audit, dedup or re-curate a corpus that only exists in its serving
format, without a side channel back to the original parquet.

Scale shape: tar is not splittable, but WebDataset shards are
*bounded by construction* (``shard_docs`` samples each), so the unit
of parallelism is the shard file — ``binaryFile`` yields one row per
shard and an Arrow-batched ``mapInPandas`` parses each tar entirely
in memory.  A 100 TB corpus at the default 512 docs/shard is millions
of shard files, far more than any executor count; no task ever holds
more than one shard's bytes.  The parse is the engine's sanctioned
Python surface (opaque binary payloads, same tier as the multimodal
decoders) — there is no JVM tar reader to stay inside codegen with.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Tar members the exporter writes per sample; anything else in a
# shard (e.g. extra modalities) is ignored rather than an error so
# third-party WebDataset shards with more member types still read.
_TEXT_SUFFIX = ".txt"
_META_SUFFIX = ".json"


def read_webdataset(spark: SparkSession, shards_path: str,
                    extra_members: tuple[str, ...] = ()) -> DataFrame:
    """Read a directory of ``shard-*.tar`` WebDataset shards into the
    conformed ``documents`` schema (doc_id, text, lang, source,
    n_chars).

    Samples are keyed by member basename prefix (the WebDataset rule:
    everything before the first dot groups members of one sample);
    ``doc_id`` comes from the metadata member when present, else from
    the numeric key.  n_chars is recomputed from the text — the shard
    is the source of truth, not whatever the metadata claims.

    ``extra_members`` surfaces additional member suffixes as binary
    columns named after the suffix (``(".bin",)`` → a ``bin`` column,
    null where a sample lacks that member) — how a multimodal shard
    set (``export_webdataset(media=True)``) reads back with its
    payloads attached."""
    from collections.abc import Iterator

    import pandas as pd

    shards = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.tar")
        .load(shards_path)
        .select("path", "content")
    )

    def parse_shards(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io
        import json
        import tarfile

        columns = ["doc_id", "text", "lang", "source",
                   *(s.lstrip(".") for s in extra_members)]
        for pdf in batches:
            # one yield PER SHARD, not per Arrow batch: binaryFile can
            # pack many shards into one partition, and accumulating
            # every shard's decoded rows next to every shard's raw
            # bytes would hold ~2x the partition in Python memory —
            # the module contract is one shard's bytes per task step
            for path, content in zip(pdf["path"], pdf["content"]):
                rows = []
                samples: dict[str, dict[str, bytes]] = {}
                with tarfile.open(fileobj=io.BytesIO(bytes(content))) as tf:
                    for m in tf:
                        if not m.isfile():
                            continue
                        dirname = os.path.dirname(m.name)
                        base = os.path.basename(m.name)
                        stem, dot, suffix = base.partition(".")
                        if not dot:
                            continue
                        # the WebDataset key is the member path up to
                        # the first dot of the basename — DIRECTORY
                        # INCLUDED, so a/0001.txt and b/0001.txt are
                        # two samples, not a silent overwrite
                        key = f"{dirname}/{stem}" if dirname else stem
                        samples.setdefault(key, {})["." + suffix] = (
                            tf.extractfile(m).read())
                for key, parts in samples.items():
                    if _TEXT_SUFFIX not in parts:
                        continue
                    text = parts[_TEXT_SUFFIX].decode("utf-8")
                    meta = (
                        json.loads(parts[_META_SUFFIX])
                        if _META_SUFFIX in parts else {}
                    )
                    doc_id = meta.get("doc_id")
                    if doc_id is None:
                        if not key.isdigit():
                            raise ValueError(
                                f"sample {key!r} in {path} has neither a "
                                f"doc_id metadata field nor a numeric key")
                        doc_id = int(key)
                    # explicit JSON null gets the same default as an
                    # absent key (str(None) would be the literal
                    # string 'None' — garbage that trips the
                    # corpus_validate lang check)
                    lang = meta.get("lang")
                    source = meta.get("source")
                    rows.append((
                        int(doc_id), text,
                        "und" if lang is None else str(lang),
                        "webdataset" if source is None else str(source),
                        *(parts.get(s) for s in extra_members),
                    ))
                if rows:
                    yield pd.DataFrame(rows, columns=columns)

    schema = "doc_id long, text string, lang string, source string"
    for s in extra_members:
        schema += f", {s.lstrip('.')} binary"
    return shards.mapInPandas(parse_shards, schema).select(
        "doc_id", "text", "lang", "source",
        F.length("text").cast("long").alias("n_chars"),
        *(s.lstrip(".") for s in extra_members),
    )


def ingest_webdataset_corpus(spark: SparkSession, shards_path: str,
                             out_dir: str) -> str:
    """Convert WebDataset shards into an engine corpus directory
    (``out_dir/documents.parquet`` in the conformed schema) and return
    ``out_dir`` — usable as the ``sf_dir`` of every corpus query.

    Same ingest contract as ``corpus_jsonl.ingest_jsonl_corpus``: pay
    the container parse once, columnar afterwards — none of the
    engine's pushdown/pruning/bucketing machinery works on tar."""
    docs = read_webdataset(spark, shards_path)
    dest = os.path.join(out_dir, "documents.parquet")
    (
        docs.repartition(spark.sparkContext.defaultParallelism, "doc_id")
        .write.mode("overwrite").parquet(dest)
    )
    return out_dir
