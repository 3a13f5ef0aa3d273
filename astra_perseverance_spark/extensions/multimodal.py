"""Multimodal column plumbing: opaque binary payloads + typed metadata,
decoded/feature-extracted through Arrow-batched ``mapInPandas``.

The Spark-side architecture is real and tested end to end:

- payloads are a ``binary`` column (here synthesized from the document
  text — utf-8 bytes prefixed with a 4-byte magic — because no real
  media ships with the test data);
- metadata travels as a typed struct (media_type, width, height,
  n_frames) next to the payload, never inside it, so partition
  pruning/column projection work on metadata without touching bytes;
- feature extraction runs in ``mapInPandas`` over Arrow record
  batches — the production shape for image decode: the Python worker
  sees a ``pandas.DataFrame`` per batch, returns one conforming to an
  explicit output schema.

The actual image/audio/video decode is STUBBED (``decode_media`` below
raises ``NotImplementedError`` — Pillow/ffmpeg are not in this
container); ``_extract_features`` is the deterministic fake used by
the registered query, chosen so a DuckDB oracle can mirror it
(md5-prefix content hash + byte length), keeping the Arrow plumbing
under the driver's hash-match gate.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MAGIC = b"APSE"  # payload header magic

FEATURE_SCHEMA = (
    "doc_id long, media_type string, width int, height int, n_frames int, "
    "byte_len long, content_h15 long"
)


def decode_media(payload: bytes, media_type: str) -> object:
    """Decode an image/audio/video payload into pixel/sample arrays.

    STUB: real decoding needs Pillow / soundfile / PyAV, none of which
    are available in this container.  The Spark-side contract (binary
    in, array features out via ``mapInPandas``) is exercised by
    ``_extract_features`` instead."""
    raise NotImplementedError(
        "media decode requires Pillow/soundfile/PyAV; wire your decoder "
        "into _extract_features — the Spark plumbing is already batch-shaped"
    )


def build_media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → (doc_id, meta struct, payload binary).

    Metadata is arithmetic on doc_id (deterministic, SQL-mirrorable);
    the payload is magic + utf-8 text bytes."""
    from astra_perseverance_spark.extensions.corpus import docs_frame
    d = docs_frame(spark, sf_dir)  # cached, pre-partitioned for batch work
    did = F.col("doc_id")
    media_type = (
        F.when(did % 3 == 0, "image").when(did % 3 == 1, "audio").otherwise("video")
    )
    return d.select(
        "doc_id",
        F.struct(
            media_type.alias("media_type"),
            (64 + did % 960).cast("int").alias("width"),
            (64 + (did * 7) % 540).cast("int").alias("height"),
            (1 + did % 8).cast("int").alias("n_frames"),
        ).alias("meta"),
        F.concat(F.lit(MAGIC), F.encode("text", "utf-8")).alias("payload"),
    )


def _extract_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched feature extraction (the decode stand-in).

    Per row: strip the 4-byte magic, hash the content (md5 prefix →
    60-bit int — the same ``h15`` the SQL twin computes), report byte
    length.  Batch-shaped exactly like a real decoder would be."""
    for pdf in batches:
        # one columnar unpack of the struct instead of 4 per-row maps
        meta = pd.DataFrame(pdf["meta"].tolist(), index=pdf.index)
        content = pdf["payload"].str[len(MAGIC):]
        yield pd.DataFrame({
            "doc_id": pdf["doc_id"],
            "media_type": meta["media_type"],
            "width": meta["width"],
            "height": meta["height"],
            "n_frames": meta["n_frames"],
            "byte_len": content.str.len(),
            "content_h15": content.map(
                lambda c: int(hashlib.md5(c).hexdigest()[:15], 16)
            ),
        })


def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered query: build the media table, run the Arrow-batched
    extractor, emit typed features ordered by doc_id.

    Scale: ``mapInPandas`` is partition-parallel with Arrow transfer —
    the only Python in the repo's hot paths, and it is batch-
    vectorized, never row-at-a-time."""
    media = build_media_table(spark, sf_dir)
    feats = media.mapInPandas(_extract_features, schema=FEATURE_SCHEMA)
    return feats.orderBy("doc_id")


def q_multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling plan for video payloads: explode each video's
    frame index space at a stride of 2 (sample every other frame),
    carrying (frame_no, est_bytes) — pure column ops, no Python.

    est_bytes models an even split of the payload across frames:
    byte_len div n_frames (integer division, exact)."""
    media = build_media_table(spark, sf_dir).filter(
        F.col("meta.media_type") == "video"
    )
    d = media.select(
        "doc_id",
        F.col("meta.n_frames").alias("n_frames"),
        (F.octet_length("payload") - F.lit(len(MAGIC))).cast("long").alias("byte_len"),
    )
    return (
        d.select(
            "doc_id", "n_frames", "byte_len",
            F.explode(
                F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(2))
            ).alias("frame_no"),
        )
        .select(
            "doc_id", "frame_no", "n_frames",
            F.expr("byte_len div n_frames").alias("est_bytes"),
        )
        .orderBy("doc_id", "frame_no")
    )
