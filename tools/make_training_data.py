"""Training-data pipeline CLI: curate → materialize → shard.

One command from a raw corpus directory to the artifacts a training
run mounts:

    python tools/make_training_data.py <sf_dir> -o OUT_DIR
        [--from jsonl|webdataset [--incremental]] [--fmt parquet|jsonl]
        [--webdataset] [--skip-shards] [--skip-corpus]

Stages (each is the engine's registered operator family, nothing
CLI-specific):

0. ``--from jsonl|webdataset`` — the input is a raw JSONL dump or a
   directory of WebDataset tar shards instead of a corpus dir: it is
   ingested once into ``OUT/ingested`` (columnar, conformed) and the
   rest of the pipeline runs on that.  ``--incremental`` switches the
   ingest to the exactly-once streaming path: a scheduled re-run over
   an append-only dump drains ONLY newly landed files (file-source
   offset log + sink commit log checkpointed inside ``OUT/ingested``)
   and the downstream stages re-curate the grown corpus.
1. ``export_curated_corpus`` — documents surviving the full curation
   ledger (quality rules + exact/near dedup + decontamination) plus
   the rejects audit ledger.  ``--trim-spans`` additionally excises
   verified cross-document duplicate spans from the kept documents'
   text (``dedup_span_trim`` semantics — the sub-document dedup step
   between the doc-grain ledger and sequence packing).
2. ``export_training_shards`` — the seq_pack concat-and-cut layout as
   shard-partitioned parquet with a shard-grain manifest, over the
   run's corpus: the CURATED (and, under ``--trim-spans``,
   span-trimmed) documents when stage 1 ran, the raw corpus only
   under ``--skip-corpus`` — a ledger-rejected document never lands
   in the trainer-facing shard layout.
3. ``--webdataset`` — additionally materialize the run's corpus (the
   same curated-when-available rule) as WebDataset tar shards under
   ``OUT/wds``.
4. ``--index-store`` — persist the incremental-serving index
   artifacts (IVF centroids/lists, int8 codes + frozen bounds, digest
   dim, raw shingle postings, split anchors) as tables under
   ``OUT/index_store``; later applications set
   ``SPARK_GRAFT_INDEX_DB`` and probe new batches against them with
   batch-sized work instead of rebuilding the index per run.
   Combined with ``--incremental`` and an existing store, the run
   EXTENDS instead of rebuilding: the ingested batch's shingles and
   digests fold into the persisted text artifacts
   (``extend_postings`` — new docs identified against the digest
   dim), closing the production loop tar shards → corpus → index
   without a corpus-sized rebuild per batch.  Every --index-store
   run ends with a printed ``index_store_health`` report (recorded
   in run.json), and ``--max-list-over-target`` /
   ``--max-rail-rate`` turn the measured retrain trigger into a
   GATE: on the incremental path the health check runs BEFORE the
   extend, so a store drifted past the thresholds makes the run
   exit 2 with the retrain message without folding the batch into
   the degraded index (recommended thresholds:
   ``RECOMMENDED_MAX_LIST_OVER_TARGET`` / ``RECOMMENDED_MAX_RAIL_RATE``
   — the measured drift trajectory's build level x margin, see
   docs/SCALE_PROBE.md).
5. ``run.json`` — one driver-readable summary of counts and paths.

Everything data-sized is written by executors; the only driver-side
values are the manifest/ledger count scalars in ``run.json``.  At a
real deployment the same command runs against an object-store URI —
Spark's Hadoop connectors make ``s3a://`` paths read/write exactly
like local ones.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Recommended health-gate thresholds, derived from the MEASURED
# post-extend drift trajectory (docs/SCALE_PROBE.md, "Post-extend
# health trajectory probe"): over three no-retrain corpus-sized
# appends, max_over_target climbs 1.39 (build) → 2.26 → 2.88 → 3.39
# and sq_at_rail_rate 0.0021 → 0.0041 → 0.0063 → 0.0093.  Both
# recommendations are ≈ the build-time level × 2: a fresh build
# passes with margin, and the gate refuses by the third drift batch
# — tests/test_scale_docs.py pins these constants against the
# recorded curve so a re-probe that moves the build level forces
# this recommendation to be revisited.
RECOMMENDED_MAX_LIST_OVER_TARGET = 3.0
RECOMMENDED_MAX_RAIL_RATE = 0.008


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("sf_dir", help="corpus directory (documents.parquet), "
                    "or with --from, a JSONL dump / WebDataset shard dir")
    ap.add_argument("-o", "--out", required=True, help="output directory")
    ap.add_argument("--from", dest="src_fmt",
                    choices=("jsonl", "webdataset"),
                    help="ingest this input format into OUT/ingested first")
    ap.add_argument("--fmt", choices=("parquet", "jsonl"),
                    default="parquet", help="curated-corpus format")
    ap.add_argument("--webdataset", action="store_true",
                    help="also export the run's corpus as WebDataset "
                    "tar shards under OUT/wds")
    ap.add_argument("--trim-spans", action="store_true",
                    help="excise verified cross-document duplicate "
                    "spans from the kept documents' text (the "
                    "sub-document dedup step; exported text becomes "
                    "the trimmed lowercase token stream with a "
                    "per-doc removed_tokens column)")
    ap.add_argument("--skip-corpus", action="store_true",
                    help="skip the curated-corpus materialization")
    ap.add_argument("--skip-shards", action="store_true",
                    help="skip the training-shard layout")
    ap.add_argument("--index-store", action="store_true",
                    help="persist the incremental-serving index "
                    "artifacts under OUT/index_store (probe them later "
                    "via SPARK_GRAFT_INDEX_DB)")
    ap.add_argument("--max-list-over-target", type=float, default=None,
                    help="with --index-store: refuse (exit 2) BEFORE "
                    "extending when the store's max_over_target "
                    "drifts above this — the measured retrain trigger "
                    "(ann_index_health / index_store_health) gating "
                    "the pipeline it was built for.  Recommended: "
                    f"{RECOMMENDED_MAX_LIST_OVER_TARGET} (build-time "
                    "level ~1.39 x 2 per the drift trajectory in "
                    "docs/SCALE_PROBE.md — passes a fresh build, "
                    "refuses by the third no-retrain corpus-sized "
                    "append); default None = gate off")
    ap.add_argument("--max-rail-rate", type=float, default=None,
                    help="with --index-store: refuse (exit 2) BEFORE "
                    "extending when the store's sq_at_rail_rate "
                    "exceeds this — the store-readable proxy for "
                    "frozen-bounds clamping (exact per-batch clamp "
                    "counts are extend_index_store's return; a vector "
                    "batch that clamps leaves its codes at the rails, "
                    "which is what this rate reads back).  "
                    f"Recommended: {RECOMMENDED_MAX_RAIL_RATE} "
                    "(build-time level ~0.0021 x ~4 per "
                    "docs/SCALE_PROBE.md's trajectory — refuses by "
                    "drift batch 3); default None = gate off")
    ap.add_argument("--incremental", action="store_true",
                    help="with --from: exactly-once STREAMING ingest — "
                    "a re-run drains only files landed since the last "
                    "run (checkpoint inside OUT/ingested) and APPENDS "
                    "them, instead of re-reading the whole dump; use "
                    "the same mode for every run over one OUT dir")
    args = ap.parse_args(argv)
    if args.incremental and not args.src_fmt:
        ap.error("--incremental requires --from jsonl|webdataset")
    if args.trim_spans and args.skip_corpus:
        ap.error("--trim-spans rewrites the curated corpus text; it "
                 "cannot be combined with --skip-corpus")
    if (args.max_list_over_target is not None
            or args.max_rail_rate is not None) and not args.index_store:
        ap.error("--max-list-over-target/--max-rail-rate gate the "
                 "index store; they require --index-store")
    if args.src_fmt:
        # refuse a mode mix over one OUT dir LOUDLY: a batch overwrite
        # deletes the parquet (incl. its streaming commit log) but not
        # the checkpoint, so a later incremental run would consult the
        # surviving offsets and leave a _spark_metadata listing ONLY
        # the newest files — every downstream read would then silently
        # see a corpus of just those documents
        ingest_dir = os.path.join(args.out, "ingested")
        cp = os.path.join(ingest_dir, "_checkpoint")
        docs_dir = os.path.join(ingest_dir, "documents.parquet")
        meta = os.path.join(docs_dir, "_spark_metadata")
        if not args.incremental and os.path.isdir(cp):
            ap.error(
                f"{ingest_dir} was written by --incremental runs "
                f"(streaming checkpoint present); re-run with "
                f"--incremental, or delete {ingest_dir} to start over "
                f"in batch mode")
        if args.incremental and os.path.isdir(docs_dir) \
                and not os.path.isdir(meta):
            ap.error(
                f"{ingest_dir} was written by a batch run (no "
                f"streaming commit log); re-run without --incremental, "
                f"or delete {ingest_dir} to start over incrementally")

    from astra_perseverance_spark import get_spark
    from astra_perseverance_spark.sinks import (
        export_curated_corpus,
        export_training_shards,
    )
    from astra_perseverance_spark.sinks.export import export_webdataset

    spark = get_spark("make-training-data")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(args.out, exist_ok=True)

    run: dict[str, object] = {"sf_dir": args.sf_dir, "out": args.out}
    sf_dir = args.sf_dir
    if args.src_fmt == "jsonl":
        from astra_perseverance_spark.sources.corpus_jsonl import (
            ingest_jsonl_corpus,
            stream_ingest_jsonl_corpus,
        )

        if args.incremental:
            # strict=True: the CLI's data-integrity contract must not
            # depend on the ingest mode — the batch path FAILFASTs on a
            # malformed/contract-violating line, so the incremental
            # path does too (the permissive stream default is for
            # unattended long-running ingests, not this CLI)
            sf_dir = stream_ingest_jsonl_corpus(
                spark, args.sf_dir, os.path.join(args.out, "ingested"),
                strict=True)
        else:
            sf_dir = ingest_jsonl_corpus(
                spark, args.sf_dir, os.path.join(args.out, "ingested"))
        run["ingested"] = sf_dir
    elif args.src_fmt == "webdataset":
        from astra_perseverance_spark.sources.webdataset import (
            ingest_webdataset_corpus,
            stream_ingest_webdataset_corpus,
        )

        ingest = (stream_ingest_webdataset_corpus if args.incremental
                  else ingest_webdataset_corpus)
        sf_dir = ingest(
            spark, args.sf_dir, os.path.join(args.out, "ingested"))
        run["ingested"] = sf_dir
    docs = None  # the curated corpus this run wrote, loaded once
    if not args.skip_corpus:
        run["corpus"] = export_curated_corpus(
            spark, sf_dir, args.out, fmt=args.fmt,
            trim_spans=args.trim_spans)
        kept_path = run["corpus"]["kept_path"]
        if args.fmt == "jsonl":
            from astra_perseverance_spark.sources.corpus_jsonl import (
                read_documents_jsonl,
            )

            docs = read_documents_jsonl(spark, kept_path)
        else:
            docs = spark.read.parquet(kept_path)
    if not args.skip_shards:
        # shard the CURATED (and, with --trim-spans, span-trimmed)
        # corpus when stage 1 ran: the trainer-facing layout must not
        # contain ledger-rejected documents or excised spans —
        # --skip-corpus is the explicit opt-out that packs sf_dir raw
        run["shards"] = export_training_shards(
            spark, sf_dir, args.out, docs=docs)
    if args.webdataset:
        run["webdataset"] = export_webdataset(
            spark, sf_dir, os.path.join(args.out, "wds"), docs=docs)

    if args.index_store:
        from astra_perseverance_spark.sinks.index_store import (
            extend_postings,
            index_store_health,
            register_index_store,
            write_index_store,
        )

        loc = os.path.abspath(os.path.join(args.out, "index_store"))
        db = "training_index"

        def read_health() -> dict[str, float]:
            # the measured retrain trigger: the same occupancy/rail
            # signals as the registered ann_index_health audit, read
            # from THIS store
            return {r["metric"]: r["value"]
                    for r in index_store_health(spark, db).collect()}

        def drift_check(health: dict[str, float]) -> list[str]:
            drifted = []
            if (args.max_list_over_target is not None
                    and health["max_over_target"]
                    > args.max_list_over_target):
                drifted.append(
                    f"max_over_target {health['max_over_target']:.4f} "
                    f"> --max-list-over-target "
                    f"{args.max_list_over_target}")
            if (args.max_rail_rate is not None
                    and health["sq_at_rail_rate"] > args.max_rail_rate):
                drifted.append(
                    f"sq_at_rail_rate {health['sq_at_rail_rate']:.4f} "
                    f"> --max-rail-rate {args.max_rail_rate}")
            return drifted

        if args.incremental and os.path.isdir(
                os.path.join(loc, "shingle_raw")):
            # a store already exists and this run's ingest appended a
            # batch: fold the batch's text artifacts in (batch-sized
            # work) instead of rebuilding.  New docs = those the
            # persisted digest dim has never seen.  Vector artifacts
            # (IVF lists / SQ codes) extend via extend_index_store
            # when an embedding batch exists; this CLI ingests
            # documents only.
            register_index_store(spark, db, loc)
            # gate BEFORE extending: the flags' contract is to refuse
            # to touch a degraded index, not to fold one more batch in
            # and then refuse — checking up front is safe because
            # extend_postings is append-only and idempotent, so a
            # passing store is extended exactly as before
            health = read_health()
            run["index_store"] = {"location": loc, "database": db,
                                  "health": health}
            drifted = drift_check(health)
            if not drifted:
                docs = spark.read.parquet(
                    os.path.join(sf_dir, "documents.parquet"))
                known = spark.table(f"{db}.digest_dim").select("doc_id")
                batch = docs.join(known, "doc_id", "left_anti")
                res = extend_postings(spark, db, batch)
                run["index_store"]["extended"] = res
        else:
            tables = write_index_store(spark, sf_dir, db, loc)
            health = read_health()
            run["index_store"] = {"location": loc, "database": db,
                                  "tables": tables, "health": health}
            drifted = drift_check(health)

        print("index store health:")
        for m in sorted(health):
            print(f"  {m:>18} = {health[m]:.4f}")
        if drifted:
            run["index_store"]["refused"] = drifted
            run_path = os.path.join(args.out, "run.json")
            with open(run_path, "w") as fh:
                json.dump(run, fh, indent=2, default=int)
            print(f"wrote {run_path}")
            print("INDEX STORE DRIFTED — RETRAIN REQUIRED: "
                  + "; ".join(drifted), file=sys.stderr)
            print("rebuild the store (write_index_store / a "
                  "non-incremental --index-store run) before extending "
                  "further", file=sys.stderr)
            return 2

    run_path = os.path.join(args.out, "run.json")
    with open(run_path, "w") as fh:
        json.dump(run, fh, indent=2, default=int)
    print(f"wrote {run_path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
