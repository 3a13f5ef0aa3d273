"""Columnar view export: every registered query as parquet/CSV.

The Excel workbook is a presentation layer over report-grain results;
this sink is the engine's *native* output path — each registered query
written by the executors (``df.write``), no driver collect, so it
scales to fact-grain results: at 100 TB a view lands as a partitioned
parquet dataset sized by the cluster's task count, not a single file.

CSV cannot carry arrays/structs/maps, so non-atomic columns are
serialized with ``to_json`` (documented, lossless for re-parsing);
parquet keeps the native types.
"""

from __future__ import annotations

import inspect
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, MapType, StructType


def _call(fn, spark: SparkSession, sf_dir: str, cfg):
    """Registry callables are (spark, sf_dir) or (spark, sf_dir, cfg)."""
    if cfg is not None and len(inspect.signature(fn).parameters) >= 3:
        return fn(spark, sf_dir, cfg)
    return fn(spark, sf_dir)


def _csv_safe(df: DataFrame) -> DataFrame:
    cols = [
        F.to_json(f.name).alias(f.name)
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
        else F.col(f.name)
        for f in df.schema.fields
    ]
    return df.select(*cols)


def export_views(spark: SparkSession, sf_dir: str, out_dir: str,
                 fmt: str = "parquet", names: list[str] | None = None,
                 cfg=None) -> dict[str, str]:
    """Write each named query (default: all registered) under
    ``out_dir/<query>/`` in ``fmt``; returns query → output path."""
    if fmt not in ("parquet", "csv"):
        raise ValueError(f"unsupported export format: {fmt!r}")
    from astra_perseverance_spark.queries import QUERY_REGISTRY

    if names is None:
        # default = everything runnable on this input: corpus-family
        # queries need documents/embeddings parquet, which a diag tree
        # does not carry — skip them there (explicitly requested names
        # still fail loudly)
        # Hadoop FS exists, not os.path.exists — the latter is
        # always False for object-store URIs (s3a://...), which would
        # silently drop every corpus-family view from the export
        jvm = spark._jvm
        jp = jvm.org.apache.hadoop.fs.Path(
            sf_dir.rstrip("/") + "/documents.parquet")
        has_corpus = jp.getFileSystem(
            spark._jsc.hadoopConfiguration()).exists(jp)
        names = [
            n for n, fn in QUERY_REGISTRY.items()
            if has_corpus or not fn.__module__.startswith(
                ("astra_perseverance_spark.extensions",
                 "astra_perseverance_spark.streaming.doc_stream"))
        ]
    unknown = [n for n in names if n not in QUERY_REGISTRY]
    if unknown:
        raise KeyError(f"unknown queries: {unknown}")
    out: dict[str, str] = {}
    for name in names:
        df = _call(QUERY_REGISTRY[name], spark, sf_dir, cfg)
        path = os.path.join(out_dir, name)
        if fmt == "csv":
            _csv_safe(df).write.mode("overwrite").option(
                "header", "true").csv(path)
        else:
            df.write.mode("overwrite").parquet(path)
        out[name] = path
    return out


def export_curated_corpus(spark: SparkSession, sf_dir: str, out_dir: str,
                          fmt: str = "parquet",
                          trim_spans: bool = False) -> dict[str, object]:
    """Materialize the training-ready corpus: documents that survive
    the full curation ledger (``curation.curation_ledger`` — quality
    rules + exact/near dedup + decontamination), written sharded by
    the executors, plus the rejects ledger as an audit side output.

    ``fmt``: ``parquet`` (native types) or ``jsonl`` (``df.write.json``
    — one JSON object per line, the interchange format most training
    stacks ingest).  The join is a doc_id semi-join against the
    ledger's keep rows — uniform key, exchange-free when reading the
    doc_id-bucketed warehouse — and nothing is collected to the
    driver; at 100 TB the output is a partitioned dataset sized by the
    cluster, not a file.

    ``trim_spans``: additionally excise verified cross-document
    duplicate spans from the KEPT documents' text
    (``training.span_trim_frame`` — the sub-document step the
    doc-grain ledger cannot express: licence headers and quoted
    boilerplate survive whole-doc dedup, and the RefinedWeb/Gopher
    preprocessing shape cuts the span, not the document).  The trim
    universe is the KEPT set, not the raw corpus: the
    first-occurrence representative that keeps each duplicated span
    alive is the earliest SURVIVING document, so a span whose
    earliest raw-corpus home was ledger-rejected still survives in
    exactly one exported document, and a span duplicated only
    against rejected documents is not trimmed at all (unique
    post-curation).  The registered ``dedup_span_trim`` query keeps
    its full-corpus universe — this is the composed-path semantics,
    not a new operator.  The exported ``text`` becomes the lowercase
    token stream with non-first-occurrence duplicate spans removed,
    and each kept row carries its ``removed_tokens`` count; the
    returned dict gains ``n_trimmed_tokens`` (total removed across
    kept docs, summed from the WRITTEN output — the trim pipeline
    executes once, for the write)."""
    if fmt not in ("parquet", "jsonl"):
        raise ValueError(f"unsupported corpus format: {fmt!r}")
    from astra_perseverance_spark.extensions.corpus import docs_frame
    from astra_perseverance_spark.extensions.curation import curation_ledger

    ledger = curation_ledger(spark, sf_dir)  # unordered memoized frame
    docs = docs_frame(spark, sf_dir)
    kept = docs.join(
        ledger.filter(F.col("keep")).select("doc_id").hint("shuffle_hash"),
        "doc_id", "semi")
    if trim_spans:
        from astra_perseverance_spark.extensions.training import (
            span_trim_frame,
        )

        # the trim universe is the kept frame itself (docs=kept):
        # gram duplication and the first-occurrence representative
        # are computed over curation survivors only — see
        # span_trim_frame's docstring for the two composed-path
        # behaviors this fixes vs the full-corpus universe
        trim = span_trim_frame(spark, sf_dir, docs=kept).select(
            "doc_id",
            F.col("trimmed_text").alias("__trimmed"),
            "removed_tokens",
        )
        # inner join on the uniform doc key: the trim frame covers
        # every kept document, so this only rewrites text — the
        # kept set is unchanged.  n_chars is recomputed alongside
        # (the conformed schema carries it, and a consumer
        # re-ingesting the kept corpus keeps a present n_chars
        # as-is — a stale original-length value would disagree with
        # every trimmed row's text)
        kept = (
            kept.join(trim.hint("shuffle_hash"), "doc_id")
            .withColumn("text", F.col("__trimmed"))
            .drop("__trimmed")
        )
        if "n_chars" in kept.columns:
            kept = kept.withColumn(
                "n_chars", F.length("text").cast("long"))
    rejects = ledger.filter(~F.col("keep")).select("doc_id", "reasons")

    kept_path = os.path.join(out_dir, "corpus_kept")
    rejects_path = os.path.join(out_dir, "corpus_rejects")
    if fmt == "jsonl":
        kept.write.mode("overwrite").json(kept_path)
        rejects.write.mode("overwrite").json(rejects_path)
    else:
        kept.write.mode("overwrite").parquet(kept_path)
        rejects.write.mode("overwrite").parquet(rejects_path)
    # ledger-grain counts (one tiny agg job, no driver-side rows);
    # coalesce: SUM over an empty ledger is NULL, not 0, and a
    # None count breaks every caller gate (the qa._n pitfall)
    counts = ledger.agg(
        F.count("*").alias("n"),
        F.coalesce(F.sum(F.col("keep").cast("long")), F.lit(0))
        .alias("k"),
    ).collect()[0]
    out = {
        "kept_path": kept_path,
        "rejects_path": rejects_path,
        "n_docs": counts["n"],
        "n_kept": counts["k"],
    }
    if trim_spans:
        # derive the total from the WRITTEN output instead of a
        # second agg over the trim frame — the full span-trim
        # pipeline (positioned grams, gram window, coverage explode,
        # anti-join, per-doc reassembly) is the export's most
        # expensive stage and must execute exactly once, for the
        # write (measured at sf0.1: 4.5 s vs 5.3 s for the
        # pre-write-agg shape — 1.18x end-to-end, and the gap IS the
        # extra trim execution, which only widens with corpus size
        # while the read-back is manifest-cheap).  Guard the
        # empty-kept case: a zero-row jsonl write leaves nothing to
        # infer a schema from.
        if counts["k"]:
            # explicit one-column schema on the jsonl read: inference
            # would be a second full parse of the written corpus (the
            # cost sources/corpus_jsonl.py forbids); parquet prunes to
            # the one column from the footer for free
            written = (
                spark.read.schema("removed_tokens long").json(kept_path)
                if fmt == "jsonl" else spark.read.parquet(kept_path))
            out["n_trimmed_tokens"] = int(written.agg(
                F.coalesce(F.sum("removed_tokens"), F.lit(0))
            ).collect()[0][0])
        else:
            out["n_trimmed_tokens"] = 0
    return out


def export_training_shards(spark: SparkSession, sf_dir: str,
                           out_dir: str,
                           docs: DataFrame | None = None
                           ) -> dict[str, object]:
    """Materialize the ``training.q_seq_pack`` layout: the corpus
    written as shard-partitioned parquet in pack order, plus a
    shard-grain manifest — the artifact a trainer's data loader mounts.

    Each shard directory holds its documents with the packing
    coordinates (pack_pos, tok_offset, n_tok, seq_first/seq_last), so
    a loader can stream any shard independently and cut sequences at
    exact token offsets without re-tokenizing the neighbours.  The
    join back to the text is a doc_id equi-join (uniform key); the
    write is ``partitionBy(shard_id)`` with pack order restored inside
    each shard — executors write everything, nothing is collected.

    The manifest (one row per shard) carries n_docs, n_tokens and
    n_seqs = ceil(n_tokens / SEQ_BUDGET) — at 100 TB it is the only
    part small enough to read on a driver, and it is all a scheduler
    needs to deal shards to trainer ranks.

    ``docs`` overrides the corpus frame (same contract columns —
    the ``export_webdataset`` pattern): the layout, shard sizing,
    and text join all run over it instead of ``sf_dir``'s raw
    corpus.  This is how the CLI packs the CURATED (and, under
    ``--trim-spans``, span-trimmed) corpus — without it a
    ledger-rejected document would still land in the trainer-facing
    shard layout, silently defeating the curation funnel at the one
    sink a trainer actually mounts.  The registered ``q_seq_pack`` /
    ``q_shard_manifest`` semantics stay corpus-over-sf_dir.

    Returns {shards_path, manifest_path, n_shards, n_docs, n_seqs}."""
    from astra_perseverance_spark.extensions.corpus import docs_frame
    from astra_perseverance_spark.extensions.training import (
        SEQ_BUDGET,
        _idiv,
        q_seq_pack,
        seq_pack_layout,
        seq_shard_count,
        shard_manifest_agg,
    )

    if docs is None:
        layout = q_seq_pack(spark, sf_dir)
        docs = docs_frame(spark, sf_dir).select("doc_id", "text")
    else:
        docs = docs.select("doc_id", "text")
        # shard sizing needs the frame's own count (the corpus-scaled
        # rule q_seq_pack applies to sf_dir) — one count job over the
        # provided frame, the same price export_webdataset pays
        layout = seq_pack_layout(docs, seq_shard_count(docs.count()))
    packed = (
        layout.join(docs.hint("shuffle_hash"), "doc_id")
        .select("shard_id", "pack_pos", "doc_id", "tok_offset",
                "n_tok", "seq_first", "seq_last", "text")
    )
    shards_path = os.path.join(out_dir, "shards")
    (
        packed.repartition("shard_id")
        .sortWithinPartitions("shard_id", "pack_pos")
        .write.mode("overwrite")
        .partitionBy("shard_id")
        .parquet(shards_path)
    )
    # the SAME aggregate the oracle-checked q_shard_manifest runs —
    # one shared definition, so the cross-check cannot drift
    manifest = shard_manifest_agg(layout)
    manifest_path = os.path.join(out_dir, "manifest")
    manifest.write.mode("overwrite").parquet(manifest_path)
    # coalesce every SUM: over an empty manifest they are NULL, which
    # would return n_docs=None AND make the `bad` consistency gate
    # below pass vacuously instead of by inspection
    totals = spark.read.parquet(manifest_path).agg(
        F.count("*").alias("s"),
        F.coalesce(F.sum("n_docs"), F.lit(0)).alias("d"),
        F.coalesce(F.sum("n_seqs"), F.lit(0)).alias("q"),
        # consistency: each shard's n_seqs (derived from max seq_last)
        # must equal ceil(n_tokens / SEQ_BUDGET) recomputed from the
        # written manifest — integer arithmetic, no double rounding
        F.coalesce(
            F.sum(
                F.when(
                    F.col("n_seqs")
                    != _idiv(F.col("n_tokens") + F.lit(SEQ_BUDGET - 1),
                             F.lit(SEQ_BUDGET)),
                    1,
                ).otherwise(0)
            ),
            F.lit(0),
        ).alias("bad"),
    ).collect()[0]
    if totals["bad"]:
        raise AssertionError(
            f"manifest inconsistent: {totals['bad']} shard(s) whose "
            f"n_seqs != ceil(n_tokens / {SEQ_BUDGET})"
        )
    return {
        "shards_path": shards_path,
        "manifest_path": manifest_path,
        "n_shards": totals["s"],
        "n_docs": totals["d"],
        "n_seqs": totals["q"],
    }


def export_webdataset(spark: SparkSession, sf_dir: str, out_dir: str,
                      shard_docs: int = 512,
                      docs: DataFrame | None = None,
                      media: bool = False) -> dict[str, object]:
    """Materialize the corpus as WebDataset-style tar shards — the
    sample-per-member layout streaming trainer loaders mount directly
    (each sample is ``{doc_id:012d}.txt`` + ``.json`` metadata members
    inside ``shard-NNNNN.tar``).

    Distribution shape: shard assignment is the engine's standard
    deterministic hash shard (``h15(doc_id) % n_shards`` — the
    ``seq_pack`` pattern, so shard count scales with the corpus and a
    re-run reproduces identical shards); the frame is repartitioned BY
    shard and each executor task writes its own tar(s) via
    ``mapInPandas`` — nothing is collected to the driver, and the
    function's output frame IS the shard manifest.  Tar members are
    written with zeroed mtime/uid/gid so shard bytes are reproducible.

    ``out_dir`` must be a POSIX path on a filesystem visible to BOTH
    the driver and every executor (local mode: any local path; a
    cluster: a shared mount such as NFS).  Object-store URIs are
    rejected up front: shard-dir creation/cleanup runs driver-local
    ``os`` calls and executors write tars via ``tarfile``/
    ``os.replace``, so an ``s3a://`` path would silently create a
    literal local ``s3a:`` directory — export to a mount, or copy the
    finished shard dir to the object store afterwards (tar shards are
    immutable once written, so a post-hoc copy is safe).  A direct
    object-store port through the Hadoop FS API (the way
    ``sinks/compact.py`` renames) is a declared WONTFIX: the tar
    bytes are produced inside the Python worker process, which has
    no py4j gateway — the Hadoop ``FileSystem`` object is reachable
    only from the driver, so an FS-API port would have to collect
    shard bytes to the driver (unacceptable at corpus scale) or
    bundle a Python-native object-store client (a new dependency
    this environment forbids).  Mount-then-copy keeps the write
    distributed and the shards immutable.  ``docs``
    overrides the corpus frame (same contract columns) — how the CLI
    shards the CURATED corpus instead of the raw one.

    ``media=True`` makes the shards multimodal (the layout image/text
    trainer loaders actually consume): each sample additionally
    carries its binary payload as a ``.bin`` member and the media
    metadata (media_type/width/height/n_frames) folded into the
    ``.json`` member, joined from the multimodal family's media table
    (doc_id equi-join between two frames clustered on doc_id — no
    extra exchange).  Requires a real ``sf_dir``.

    Returns {shards_path, manifest_path, n_shards, n_docs}."""
    import itertools as _it
    import json as _json
    import math
    import tarfile
    from collections.abc import Iterator

    import pandas as _pd

    from astra_perseverance_spark.extensions.corpus import docs_frame
    from astra_perseverance_spark.functions.texthash import h15
    from astra_perseverance_spark.sources.webdataset import add_sample

    if "://" in out_dir:
        raise ValueError(
            f"export_webdataset writes via driver/executor-local "
            f"POSIX I/O; out_dir must be a shared-filesystem path, "
            f"not a URI: {out_dir!r}"
        )
    shards_path = os.path.join(out_dir, "shards")
    os.makedirs(shards_path, exist_ok=True)
    # stale shards from a previous export of a larger corpus would
    # survive a re-run (tar open("w") only overwrites same-named
    # files) and feed dead documents to any loader that mounts the
    # directory by glob rather than by manifest
    import glob as _glob

    for stale in _glob.glob(os.path.join(shards_path, "shard-*.tar")) + \
            _glob.glob(os.path.join(shards_path, ".shard-*.inprogress")):
        os.remove(stale)
    if docs is None:
        docs = docs_frame(spark, sf_dir)
    # count the SAME frame being exported — counting a different
    # source (the raw parquet) can diverge from docs_frame under the
    # bucketed-warehouse redirect and fail late with a misleading
    # totals assertion
    n = docs.count()
    n_shards = max(1, math.ceil(n / shard_docs))
    cols = ["doc_id", "text", "lang", "source"]
    if media:
        from astra_perseverance_spark.extensions.multimodal import (
            build_media_table,
        )

        docs = docs.join(build_media_table(spark, sf_dir), "doc_id")
        cols += ["meta", "payload"]
    docs = docs.select(
        *cols,
        F.pmod(h15(F.col("doc_id").cast("string")), F.lit(n_shards))
        .cast("int").alias("shard_id"),
    )

    def write_shards(batches: Iterator[_pd.DataFrame]
                     ) -> Iterator[_pd.DataFrame]:
        # task-commit protocol: write to an attempt-unique hidden temp
        # and rename into place on close — a speculative or retried
        # task attempt then can NEVER interleave writes into the same
        # tar (each attempt owns its temp; last complete rename wins),
        # mirroring what Spark's file committers do for parquet
        from uuid import uuid4

        open_tar = {"sid": None, "tar": None, "n": 0, "tmp": None}
        rows = []

        def close():
            if open_tar["tar"] is not None:
                open_tar["tar"].close()
                path = os.path.join(
                    shards_path, f"shard-{open_tar['sid']:05d}.tar")
                os.replace(open_tar["tmp"], path)
                rows.append((open_tar["sid"], open_tar["n"],
                             os.path.getsize(path), path))
                open_tar.update(sid=None, tar=None, n=0, tmp=None)

        for pdf in batches:
            metas = pdf["meta"] if media else _it.repeat(None)
            payloads = pdf["payload"] if media else _it.repeat(None)
            for doc_id, text, lang, source, sid, m, p in zip(
                    pdf["doc_id"], pdf["text"], pdf["lang"],
                    pdf["source"], pdf["shard_id"], metas, payloads):
                # contract gate, loud and early: a NULL doc_id would
                # otherwise surface as int(NaN) deep in the task, and
                # NULL text/lang/source would str() into the literal
                # 'None' — the exact garbage the READER documents as
                # tripping corpus_validate.  Absent lang/source are
                # legal (the reader defaults them); absent keys are
                # how the meta member says so.
                if _pd.isna(doc_id):
                    raise ValueError(
                        "webdataset export: NULL doc_id in the corpus "
                        "— run corpus_validate before exporting")
                if text is None or _pd.isna(text):
                    raise ValueError(
                        f"webdataset export: NULL text for doc_id "
                        f"{int(doc_id)} — run corpus_validate before "
                        f"exporting")
                sid = int(sid)
                if open_tar["sid"] != sid:
                    close()
                    tmp = os.path.join(
                        shards_path,
                        f".shard-{sid:05d}.{uuid4().hex}.inprogress")
                    open_tar.update(
                        sid=sid, tar=tarfile.open(tmp, "w"), n=0, tmp=tmp)
                meta = {"doc_id": int(doc_id)}
                if lang is not None and not _pd.isna(lang):
                    meta["lang"] = str(lang)
                if source is not None and not _pd.isna(source):
                    meta["source"] = str(source)
                members = [
                    (".txt", str(text).encode("utf-8")),
                ]
                if media:
                    # Arrow hands the struct over as a dict of numpy
                    # scalars; re-type for JSON
                    meta.update({
                        "media_type": str(m["media_type"]),
                        "width": int(m["width"]),
                        "height": int(m["height"]),
                        "n_frames": int(m["n_frames"]),
                    })
                    members.append((".bin", bytes(p)))
                members.append((".json", _json.dumps(
                    meta, sort_keys=True).encode("utf-8")))
                # shared format core (sources/webdataset.py): the
                # sink, the data source and the readers agree on
                # member naming + reproducible attributes by
                # construction
                add_sample(open_tar["tar"], int(doc_id), members)
                open_tar["n"] += 1
        close()
        yield _pd.DataFrame(
            rows, columns=["shard_id", "n_docs", "n_bytes", "path"])

    manifest = (
        docs.repartition(n_shards, "shard_id")
        .sortWithinPartitions("shard_id", "doc_id")
        .mapInPandas(
            write_shards,
            "shard_id int, n_docs long, n_bytes long, path string")
    )
    manifest_path = os.path.join(out_dir, "manifest")
    manifest.write.mode("overwrite").parquet(manifest_path)
    totals = spark.read.parquet(manifest_path).agg(
        F.countDistinct("shard_id").alias("s"),
        F.sum("n_docs").alias("d"),
    ).collect()[0]
    if (totals["d"] or 0) != n:  # sum over an empty manifest is NULL
        raise AssertionError(
            f"webdataset export wrote {totals['d'] or 0} docs, "
            f"corpus has {n}")
    return {
        "shards_path": shards_path,
        "manifest_path": manifest_path,
        "n_shards": totals["s"],
        "n_docs": totals["d"] or 0,
    }
