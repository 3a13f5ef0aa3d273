"""Focused pins for the round-16 optimizations.

The ingest writers' partition width is now derived from the SOURCE's
listed bytes (``corpus_jsonl.ingest_width``) instead of the
``defaultParallelism`` constant — the same scale-adaptive arms the
parquet frames got in r15 (floor at small sources, linear growth at
100 TB), with bytes as the unit because a row count over JSONL/tar
would itself be a full parse pass.  These tests pin:

- ``source_bytes`` lists files, directories and globs without reading
  data;
- ``ingest_width`` hits the floor arm on tiny sources, the linear arm
  on huge ones, and honors the env overrides;
- the ingest writers actually produce the derived width;
- ``timeseries._serving_bucketed_events`` is THE shared predicate for
  the events bucketed-mode branch (ADVICE r15).
"""

from __future__ import annotations

import math
import os


def test_source_bytes_listing(spark, tmp_path):
    from astra_perseverance_spark.sources.corpus_jsonl import source_bytes

    d = tmp_path / "dump"
    d.mkdir()
    (d / "a.jsonl").write_bytes(b"x" * 1000)
    (d / "b.jsonl").write_bytes(b"y" * 2345)
    sub = d / "sub"
    sub.mkdir()
    (sub / "c.jsonl").write_bytes(b"z" * 55)
    # single file
    assert source_bytes(spark, str(d / "a.jsonl")) == 1000
    # directory: recursive total
    assert source_bytes(spark, str(d)) == 1000 + 2345 + 55
    # glob: only matching files
    assert source_bytes(spark, str(d / "*.jsonl")) == 1000 + 2345


def test_ingest_width_arms(spark, tmp_path, monkeypatch):
    from astra_perseverance_spark.sources import corpus_jsonl as cj

    par = spark.sparkContext.defaultParallelism
    f = tmp_path / "tiny.jsonl"
    f.write_bytes(b"{}\n" * 100)

    monkeypatch.delenv(cj.INGEST_MIN_BYTES_ENV, raising=False)
    monkeypatch.delenv(cj.INGEST_TARGET_BYTES_ENV, raising=False)
    # tiny source: floor arm — one task
    assert cj.ingest_width(spark, str(f)) == 1
    # env floor of 1 byte: min(cores, n_bytes) — the pre-r16
    # defaultParallelism behavior is reproducible for deploys
    monkeypatch.setenv(cj.INGEST_MIN_BYTES_ENV, "1")
    assert cj.ingest_width(spark, str(f)) == min(par, f.stat().st_size)
    monkeypatch.delenv(cj.INGEST_MIN_BYTES_ENV)
    # linear arm: width = ceil(bytes / target), independent of cores
    monkeypatch.setenv(cj.INGEST_TARGET_BYTES_ENV, "50")
    n = f.stat().st_size
    assert cj.ingest_width(spark, str(f)) == math.ceil(n / 50)


def test_ingest_writers_use_derived_width(spark, tmp_path, monkeypatch):
    """The three converted outputs carry exactly ``ingest_width``
    parquet part-files (upper-bounds the write parallelism the old
    constant hard-coded)."""
    import glob as _glob
    import json

    from astra_perseverance_spark.sources import corpus_jsonl as cj
    from astra_perseverance_spark.sources.events_jsonl import (
        ingest_events_jsonl,
    )

    monkeypatch.delenv(cj.INGEST_MIN_BYTES_ENV, raising=False)
    monkeypatch.delenv(cj.INGEST_TARGET_BYTES_ENV, raising=False)

    docs = tmp_path / "docs.jsonl"
    docs.write_text("\n".join(
        json.dumps({"doc_id": i, "text": f"doc {i} text",
                    "lang": "en", "source": "t"}) for i in range(20)))
    out = tmp_path / "corpus"
    cj.ingest_jsonl_corpus(spark, str(docs), str(out))
    parts = _glob.glob(str(out / "documents.parquet" / "part-*"))
    assert len(parts) == cj.ingest_width(spark, str(docs)) == 1

    ev = tmp_path / "events.jsonl"
    ev.write_text("\n".join(
        json.dumps({"event_id": i, "ts": "2031-03-01T00:00:%02d" % (i % 60),
                    "user_id": i % 3, "event_type": "click",
                    "value": 1.0, "props": None}) for i in range(30)))
    out2 = tmp_path / "evdir"
    ingest_events_jsonl(spark, str(ev), str(out2))
    parts2 = _glob.glob(str(out2 / "events.parquet" / "part-*"))
    assert len(parts2) == cj.ingest_width(spark, str(ev)) == 1

    # round-trip sanity: the converted corpus serves reads unchanged
    got = spark.read.parquet(str(out / "documents.parquet"))
    assert got.count() == 20


def test_serving_bucketed_events_predicate(spark, monkeypatch):
    from astra_perseverance_spark.extensions import corpus, timeseries

    monkeypatch.delenv(corpus.BUCKETED_DB_ENV, raising=False)
    assert timeseries._serving_bucketed_events(spark) is False
    # db set but no events table -> still False (corpus-only warehouse)
    monkeypatch.setenv(corpus.BUCKETED_DB_ENV, "no_such_db_r16")
    assert timeseries._serving_bucketed_events(spark) is False
