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

import io
import json
import os
import tarfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Tar members the exporter writes per sample; anything else in a
# shard (e.g. extra modalities) is ignored rather than an error so
# third-party WebDataset shards with more member types still read.
_TEXT_SUFFIX = ".txt"
_META_SUFFIX = ".json"


# ---------------------------------------------------------------------------
# Format core — the single definition of how a sample maps to/from tar
# members.  Shared by this module's binaryFile reader, the first-class
# data source (sources/webdataset_source.py: read AND write sides) and
# the export sink (sinks/export.py), so the three surfaces cannot
# drift: a shard any of them writes is readable by all of them.
# ---------------------------------------------------------------------------

def samples_in_tar(tf: tarfile.TarFile,
                   keep: frozenset[str] | None = None
                   ) -> dict[str, dict[str, bytes]]:
    """Group one tar's file members into WebDataset samples:
    key → {suffix → payload bytes}.

    The WebDataset key is the member path up to the first dot of the
    basename — DIRECTORY INCLUDED, so ``a/0001.txt`` and ``b/0001.txt``
    are two samples, not a silent overwrite.  Extension-less members
    are skipped (no suffix means no member role).

    ``keep`` restricts which member suffixes are DECODED: members
    outside the set are never ``extractfile``-read, so a multimodal
    shard's multi-MB ``.bin`` payloads cost nothing when the caller
    only wants text+metadata (pass ``None`` to keep everything)."""
    samples: dict[str, dict[str, bytes]] = {}
    for m in tf:
        if not m.isfile():
            continue
        dirname = os.path.dirname(m.name)
        base = os.path.basename(m.name)
        stem, dot, suffix = base.partition(".")
        if not dot:
            continue
        if keep is not None and "." + suffix not in keep:
            continue
        key = f"{dirname}/{stem}" if dirname else stem
        samples.setdefault(key, {})["." + suffix] = tf.extractfile(m).read()
    return samples


def sample_row(key: str, parts: dict[str, bytes],
               shard_desc: str) -> tuple[int, str, str, str] | None:
    """Decode one sample into ``(doc_id, text, lang, source)``, or
    ``None`` when it has no text member (a modality-only sample a
    third-party shard may carry).

    ``doc_id`` comes from the metadata member when present, else from
    the numeric key; an explicit JSON ``null`` lang/source gets the
    same default as an absent key (``str(None)`` would be the literal
    string ``'None'`` — garbage that trips the corpus_validate lang
    check)."""
    if _TEXT_SUFFIX not in parts:
        return None
    text = parts[_TEXT_SUFFIX].decode("utf-8")
    meta = (
        json.loads(parts[_META_SUFFIX])
        if _META_SUFFIX in parts else {}
    )
    doc_id = meta.get("doc_id")
    if doc_id is None:
        if not key.isdigit():
            raise ValueError(
                f"sample {key!r} in {shard_desc} has neither a "
                f"doc_id metadata field nor a numeric key")
        doc_id = int(key)
    # validate the metadata value like the key path does: a bad shard
    # must name its location, and a non-integral float must fail, not
    # silently truncate to a different document's id.  Acceptance is
    # delegated to int() itself (str.isdigit() would admit characters
    # like '²' that int() rejects, recreating the context-free crash)
    elif not isinstance(doc_id, int) or isinstance(doc_id, bool):
        converted = None
        if isinstance(doc_id, float) and doc_id.is_integer():
            converted = int(doc_id)
        elif isinstance(doc_id, str):
            try:
                converted = int(doc_id)
            except ValueError:
                pass
        if converted is None:
            raise ValueError(
                f"sample {key!r} in {shard_desc} has a non-integer "
                f"doc_id metadata value: {doc_id!r}")
        doc_id = converted
    lang = meta.get("lang")
    source = meta.get("source")
    return (
        int(doc_id), text,
        "und" if lang is None else str(lang),
        "webdataset" if source is None else str(source),
    )


def add_sample(tar: tarfile.TarFile, doc_id: int,
               members: list[tuple[str, bytes]]) -> None:
    """Append one sample's members (``{doc_id:012d}{suffix}``) with
    reproducible attributes — zeroed mtime/uid/gid, empty user/group —
    so shard bytes are a pure function of the sample data (the
    byte-determinism contract the export sink documents)."""
    for suffix, payload in members:
        info = tarfile.TarInfo(f"{int(doc_id):012d}{suffix}")
        info.size = len(payload)
        info.mtime = 0
        info.uid = info.gid = 0
        info.uname = info.gname = ""
        tar.addfile(info, io.BytesIO(payload))


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
    shards = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.tar")
        .load(shards_path)
        .select("path", "content")
    )
    return _parsed_docs(shards, extra_members)


def _parsed_docs(shards: DataFrame,
                 extra_members: tuple[str, ...] = ()) -> DataFrame:
    """(path, content) shard frame → conformed documents via the
    shared format core.  Works identically on a batch or streaming
    frame (the parse is stateless), which is how the streaming ingest
    reuses the batch reader's exact semantics."""
    from collections.abc import Iterator

    import pandas as pd

    def parse_shards(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io
        import tarfile

        columns = ["doc_id", "text", "lang", "source",
                   *(s.lstrip(".") for s in extra_members)]
        for pdf in batches:
            # one yield PER SHARD, not per Arrow batch: binaryFile can
            # pack many shards into one partition, and accumulating
            # every shard's decoded rows next to every shard's raw
            # bytes would hold ~2x the partition in Python memory —
            # the module contract is one shard's bytes per task step
            keep = frozenset(
                {_TEXT_SUFFIX, _META_SUFFIX, *extra_members})
            for path, content in zip(pdf["path"], pdf["content"]):
                rows = []
                with tarfile.open(fileobj=io.BytesIO(bytes(content))) as tf:
                    samples = samples_in_tar(tf, keep=keep)
                for key, parts in samples.items():
                    row = sample_row(key, parts, str(path))
                    if row is None:
                        continue
                    rows.append((*row, *(parts.get(s) for s in extra_members)))
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
    engine's pushdown/pruning/bucketing machinery works on tar.  The
    write width is derived from the shards' listed bytes
    (``corpus_jsonl.ingest_width``), not a core-count constant."""
    from astra_perseverance_spark.sources.corpus_jsonl import ingest_width

    docs = read_webdataset(spark, shards_path)
    dest = os.path.join(out_dir, "documents.parquet")
    (
        docs.repartition(ingest_width(spark, shards_path), "doc_id")
        .write.mode("overwrite").parquet(dest)
    )
    return out_dir


def stream_documents_webdataset(spark: SparkSession, shards_path: str,
                                extra_members: tuple[str, ...] = ()
                                ) -> DataFrame:
    """Unbounded counterpart of ``read_webdataset``: a file-source
    stream over a directory tar shards keep landing in, parsed by the
    SAME ``_parsed_docs`` projection (the two modes cannot drift).
    Returns the unstarted streaming frame; the caller picks
    sink/trigger, matching the other streaming constructors.

    The file source tracks shards it has processed in the checkpoint's
    offset log, so each trigger parses only newly landed tar files —
    the unit of incremental work is the shard, exactly the batch
    reader's unit of parallelism."""
    shards = (
        spark.readStream.format("binaryFile")
        # file-source streams need an explicit schema; binaryFile's is
        # fixed, so spelling it out here changes nothing but is required
        .schema("path string, modificationTime timestamp, "
                "length long, content binary")
        .option("pathGlobFilter", "*.tar")
        .load(shards_path)
        .select("path", "content")
    )
    return _parsed_docs(shards, extra_members)


def stream_ingest_webdataset_corpus(spark: SparkSession, shards_path: str,
                                    out_dir: str) -> str:
    """Incremental, exactly-once WebDataset → corpus ingest: each call
    processes only tar shards not yet recorded in the checkpoint
    (file-source offset log + parquet-sink commit log) and APPENDS
    their documents to ``out_dir/documents.parquet`` — the tar twin of
    ``corpus_jsonl.stream_ingest_jsonl_corpus``, for a serving-format
    corpus that keeps growing shard by shard.  Re-running after a
    crash or on a schedule never duplicates a document.  Blocks until
    the available backlog is drained (``availableNow``) and returns
    ``out_dir``."""
    from astra_perseverance_spark.sources.corpus_jsonl import (
        drain_ingest_stream,
    )

    drain_ingest_stream(
        stream_documents_webdataset(spark, shards_path),
        os.path.join(out_dir, "documents.parquet"),
        os.path.join(out_dir, "_checkpoint"),
    )
    return out_dir
