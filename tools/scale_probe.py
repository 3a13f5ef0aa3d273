"""Empirical scale probe: do the extension operators scale linearly?

Replicates the sf0.1 ``documents``/``embeddings`` corpus REP× (default
8×, ~400k docs / 16k vectors) and times every extension operator at 1×
and REP×.  Replicas are id-offset and lightly perturbed (a per-replica
prefix token / one nudged vector component), which keeps *exact*-dedup
groups replica-local but deliberately leaves every document with
REP − 1 cross-replica NEAR-duplicates — the replicated corpus is an
adversarially dup-dense input where the near-dup operators must find
~REP× more true pairs per document than at 1×.  Staying ~linear in
runtime there is the strong form of the claim.

Each operator row reports the measured ratio t(REP×)/t(1×) against its
expected complexity, and the result is written to docs/SCALE_PROBE.md.

Expected shapes (the honest part):

- map-parallel ops (text stats, lang id, token count, fingerprint,
  exact/tokenset dedup, minhash signatures): O(n) — ratio ≈ REP, and
  well under REP while per-task constants still dominate.
- LSH-blocked joins (simhash, minhash buckets): work is Σ bucket² over
  a FIXED key space (4096 12-bit chunks), so density grows REP× and
  candidate pairs grow up to REP²×.  That is the textbook LSH
  trade-off the pigeonhole bound forces for simhash; the HYPERPLANE
  buckets no longer share it — the plane count scales with the corpus
  (``vectors.plane_count``), holding expected bucket size constant.
- exact-Jaccard: stop-shingle df cap (``NGRAM_DF_CAP``) bounds every
  posting list, and candidate generation runs over each doc's rarest
  prefix shingles only (AllPairs prefix filter, lossless), so the
  remaining cost is the per-candidate verify — proportional to the
  true-pair density of the corpus, which the REP-replicated probe
  corpus deliberately makes ~REP× per doc.
- brute-force topk: O(|corpus|·K) with the fixed query panel — linear
  in the corpus now, REP× in the probe.

Usage: python tools/scale_probe.py [REP] [sf_dir] [op ...]
With an op subset, results print to stderr only (docs/SCALE_PROBE.md
is regenerated only by full runs, so a spot-probe can't truncate it).
Exceptions: the ``funnel_gc``, ``index_amortization`` and
``health_trajectory`` subset keys patch their own self-contained doc
sections (state-row counts, a back-to-back ratio, and a per-batch
drift-metric curve respectively — load-robust measurements that don't
invalidate the timing rows around them).
Scratch parquet goes under .scratch/ (gitignored).
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT_MD = os.path.join(REPO, "docs", "SCALE_PROBE.md")

OPS = [
    # (name, expected shape)
    ("dedup_exact", "O(n)"),
    ("dedup_tokenset", "O(n)"),
    ("dedup_minhash_lsh", "memoized pair artifact (build: bucket-local pairs)"),
    ("dedup_simhash", "O(n) sigs + Σ chunk-bucket² (corpus-scaled width)"),
    ("ngram_jaccard", "df-capped prefix postings + per-candidate verify"),
    ("text_stats", "O(n)"),
    ("lang_id", "O(n)"),
    ("token_count", "O(n)"),
    ("doc_fingerprint", "O(n)"),
    ("embedding_topk", "O(n·K) — fixed-size query panel"),
    ("ann_lsh_bucket", "Σ bucket·q_bucket (planes scale with n)"),
    ("ann_ivf", "O(n·k) assign + O(K·n/lists·nprobe) probe"),
    ("ann_ivf_kmeans", "ann_ivf + ITERS·O(n·k) integer Lloyd rounds"),
    ("embedding_label_probe", "O(n·|labels|) broadcast classify"),
    ("embedding_cosine_dups", "Σ bucket² (planes scale with n)"),
    ("dedup_clusters", "O(E) per round × O(log d) rounds"),
    ("dedup_keep_list", "projection over memoized components"),
    ("corpus_rollup", "O(n) + 4-level cube agg"),
    ("doc_minute_tokens", "O(n) + window-keyed agg"),
    ("vocab_top_terms", "O(n) tokens + vocab-grain agg"),
    ("vocab_growth", "O(tokens) term-grain MIN + 16-bucket window"),
    ("cluster_purity", "label join vs memoized kmeans lists + "
                       "cluster-grain aggs"),
    ("tfidf_top_terms", "O(n) tokens + term-keyed join"),
    ("corpus_sample", "O(n) narrow filter"),
    ("quality_filter", "O(n) + digest-keyed join"),
    ("quality_signals", "O(n) per-row projections"),
    ("pii_scan", "O(n) per-row regex"),
    ("decontaminate", "O(postings) vs fixed broadcast panel"),
    ("source_mix", "O(n) + source-grain agg"),
    ("ngram_novelty", "O(postings) doc-grain agg"),
    ("quality_report", "O(n) + slice-grain agg"),
    ("doc_digest_join", "O(n) doc_id equi-join (bucketed: no exchange)"),
    ("doc_chunks", "O(tokens) per-doc local explode + slice"),
    ("html_extract", "O(n) fixed regexp_replace chain"),
    ("script_profile", "O(n) per-class counting"),
    ("corpus_curate", "doc_id joins over memoized artifacts"),
    ("ann_incremental", "O(batch·(√n + nprobe·n/lists)) index probe"),
    ("repeated_lines", "O(lines) line-keyed agg"),
    ("token_rarity", "O(tokens) vocab df + doc-grain agg"),
    ("dup_spans", "O(postings) mark + per-doc islands merge"),
    ("dedup_span_trim",
     "O(tokens): min-over-gram window + W-bounded coverage + "
     "token-grain anti-join"),
    ("source_cross_dup",
     "digest-composition arithmetic + pair-frame re-key "
     "(verify-bound like ngram_jaccard)"),
    ("seq_pack", "O(n) per-shard running-total window"),
    ("embedding_quantize", "O(n·dim) map + 64-group dim stats"),
    ("bpe_merges", "O(corpus) word count + capped-table rounds"),
    ("ann_quantized_recall", "O(n·K) ADC brute force, fixed panel"),
    ("bpe_token_count", "O(tokens) join vs broadcast vocab table"),
    ("shard_manifest", "shard-grain agg over seq_pack"),
    ("dedup_recall_audit", "pair-grain tagged-union membership"),
    ("curation_funnel", "reason-grain agg over the ledger"),
    ("events_asof", "O(n) union + per-key running carry"),
    ("events_asof_1h", "events_asof + one tolerance gate on the carry"),
    ("events_window_attr", "O(n) banded two-bucket range probe"),
    ("events_next_error", "O(n) union + per-key descending carry"),
    ("events_sessionize", "O(n) one shuffle + 3 local window passes"),
    ("events_sessionize_capped",
     "cap guard (map-side count + broadcast whales) + sessionize"),
    ("events_funnel", "O(n) one shuffle + 3 sequential window aggs"),
    ("split_assign", "O(n) left join vs component frame + hash map"),
    ("split_assign_incremental",
     "batch-sized probes vs persisted even-graph components"),
    ("user_skew_audit", "O(n) map-side count + histogram rank pick"),
    ("ann_ivf_pq", "IVF probe + O(candidates·dim) ADC scoring"),
    ("ann_recall_ivf_pq", "ann_ivf_pq + fixed-panel membership agg"),
    ("ann_incremental_pq",
     "O(batch·(√n + nprobe·n/lists)) probe, ADC vs int8 even store"),
    ("semdedup",
     "cid-local pairs over the memoized trained-kmeans lists (√n lists)"),
    ("corpus_validate", "O(n) one aggregate pass + doc_id-grain dup count"),
]


def _resolve(name):
    """Registry lookup (every probed op is registered as of round 9;
    the import fallback used while an op was staged is gone)."""
    from astra_perseverance_spark.queries import QUERY_REGISTRY

    return QUERY_REGISTRY[name]


# Events-family operators re-probed under a planted whale (one user
# owning ~20% of all events): their Window.partitionBy(user_id) must
# sort that user inside ONE task, so this measures the straggler the
# skew ledger documents (SCALE_DESIGN.md) — and what cap_user_events
# buys back.
WHALE_OPS = [
    "events_sessionize", "events_funnel", "events_asof",
    "user_skew_audit", "events_sessionize_capped",
]


def replicate(spark, sf_dir: str, rep: int, out_dir: str) -> None:
    """Write REP content-perturbed, id-offset copies of the corpus."""
    from pyspark.sql import functions as F

    os.makedirs(out_dir, exist_ok=True)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_doc = docs.count()
    r = F.explode(F.sequence(F.lit(0), F.lit(rep - 1))).alias("r")
    (
        docs.select("*", r)
        .select(
            (F.col("doc_id") + F.col("r") * n_doc).alias("doc_id"),
            # distinct leading token per replica: exact/bag dedup
            # groups stay replica-local; cross-replica NEAR-dup pairs
            # remain (intentional — see module docstring)
            F.concat(F.lit("rep"), F.col("r"), F.lit(" "), F.col("text"))
            .alias("text"),
            "lang", "source", "n_chars",
        )
        .write.mode("overwrite").parquet(f"{out_dir}/documents.parquet")
    )
    from astra_perseverance_spark.conformed.model import _read

    events = _read(spark, sf_dir, "events")
    n_ev = events.count()
    n_users = events.agg(F.max("user_id")).collect()[0][0] + 1
    (
        events.select("*", r)
        .select(
            (F.col("event_id") + F.col("r") * n_ev).alias("event_id"),
            "ts",
            # replica-local user streams: per-user event rates stay
            # constant, user count grows REP x (the dimension grain)
            (F.col("user_id") + F.col("r") * n_users).alias("user_id"),
            "event_type", "value", "props",
        )
        .write.mode("overwrite").parquet(f"{out_dir}/events.parquet")
    )
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n_vec = emb.count()
    (
        emb.select("*", r)
        .select(
            (F.col("vec_id") + F.col("r") * n_vec).alias("vec_id"),
            "label",
            # nudge dim 0 by replica index so replicas are not exact
            # duplicates (keeps near-orthogonal structure intact)
            F.transform(
                "embedding",
                lambda x, i: F.when(
                    i == 0, x + F.col("r").cast("float") * F.lit(0.001)
                ).otherwise(x),
            ).alias("embedding"),
        )
        .write.mode("overwrite").parquet(f"{out_dir}/embeddings.parquet")
    )


def time_op(fn, spark, sf_dir: str, runs: int = 1) -> float:
    """Best-of-``runs`` wall time for a noop write of the query.

    Best-of-2 for the measured (warm) number: the scaling claim is
    about steady-state throughput, and on this host a single run mixes
    in JIT compilation of the query's generated code (identical runs
    measured 8 s → 0.9 s across four executions) plus iowait noise."""
    best = float("inf")
    for _ in range(runs):
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = min(best, time.time() - t0)
    return best


def main() -> int:
    if len(sys.argv) > 1 and sys.argv[1] == "index_amo_child":
        return _index_amo_child(*sys.argv[2:6])
    rep = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    only = set(sys.argv[3:])
    ops = [(n, s) for n, s in OPS if not only or n in only]

    from astra_perseverance_spark import get_spark
    from astra_perseverance_spark.queries import QUERY_REGISTRY

    spark = get_spark("scale-probe")
    spark.sparkContext.setLogLevel("ERROR")

    scratch = os.path.join(REPO, ".scratch", f"probe_rep{rep}")
    if ops or not only or "whale" in only:
        print(f"replicating {sf_dir} x{rep} -> {scratch}", file=sys.stderr)
        replicate(spark, sf_dir, rep, scratch)

    from astra_perseverance_spark.conformed.model import release_memos

    rows = []
    for name, shape in ops:
        fn = _resolve(name)
        # Isolate each op at each scale: drop every shared memo frame,
        # one untimed warm run (rebuilds the op's own memos + codegen),
        # then measure.  Without this, an op's 8x number silently
        # includes cache pressure from every op before it (round-3:
        # doc_fingerprint "went quadratic" purely from pool pressure).
        release_memos(spark)
        b1 = time_op(fn, spark, sf_dir)   # build: own memos + codegen
        t1 = time_op(fn, spark, sf_dir, runs=2)  # warm steady-state
        r1 = fn(spark, sf_dir).count()
        release_memos(spark)
        bn = time_op(fn, spark, scratch)
        tn = time_op(fn, spark, scratch, runs=2)
        rn = fn(spark, scratch).count()
        release_memos(spark)
        ratio = tn / t1 if t1 > 0 else float("inf")
        bratio = bn / b1 if b1 > 0 else float("inf")
        rows.append((name, shape, t1, tn, ratio, r1, rn, bratio))
        print(f"{name}: 1x={t1:.2f}s {rep}x={tn:.2f}s ratio={ratio:.1f} "
              f"build-ratio={bratio:.1f} rows {r1}->{rn}", file=sys.stderr)

    lines = [
        "# Scale probe — extension operators at 1× vs "
        f"{rep}× corpus ({sf_dir})",
        "",
        "Generated by `tools/scale_probe.py`.  Replicas are id-offset and",
        "lightly perturbed: exact-dedup groups stay replica-local, while",
        "every document keeps REP−1 cross-replica near-duplicates — so the",
        "near-dup operators face a dup-dense corpus that must yield ~REP×",
        "more true pairs per document.  See the module docstring for the",
        "expected complexity of each family.",
        "",
        f"| operator | expected shape | t(1×) s | t({rep}×) s | ratio "
        f"(ideal ≤ {rep}) | build ratio | rows 1×→{rep}× |",
        "|---|---|---|---|---|---|---|",
    ]
    for name, shape, t1, tn, ratio, r1, rn, bratio in rows:
        lines.append(
            f"| {name} | {shape} | {t1:.2f} | {tn:.2f} | {ratio:.1f} "
            f"| {bratio:.1f} | {r1}→{rn} |"
        )
    lines += [
        "",
        "Each op is measured in isolation (shared memo frames released,",
        "own warm 'build' run first — timed separately as the build",
        "ratio, since for memoized operators (ngram pairs, minhash",
        "pairs, IVF lists, components) the warm number reads a cached",
        "artifact and the build number is where the join/train cost",
        "lives).  Ratios at or under the",
        "replication factor mean the operator is partition-parallel with",
        "no hidden quadratic stage.  For the near-dup ops, compare the",
        "time ratio against the OUTPUT row growth: the probe corpus",
        "plants REP−1 near-duplicates per document, so a verify-bound",
        "operator's work is proportional to true pairs found, which grow",
        "~C(REP,2)× per original document here — time growing with",
        "output is linear-in-work, not a scaling cliff.  (The simhash",
        "block width now scales with the corpus — texthash.",
        "simhash_block_bits — so its former fixed-key-space density",
        "residual is gone: the probe's 8× corpus blocks on 14-bit",
        "chunks where the 1× corpus uses 12.)",
        "",
        "pii_scan's ratio (carried as an open question from rounds 4–5) is",
        "measured floor, not regex pathology: isolating the regex work",
        "against a no-regex control with the identical scan + final sort",
        "shows t = c + k·n with c ≈ 0.17 s (job floor: parquet scan setup,",
        "32-task scheduling, the output sort) and the regex component",
        "scaling LINEARLY in bytes — 0.11 s at 1×, 0.22 s at 8×, 0.42 s at",
        "16× (per-byte cost constant-to-falling as 32 cores absorb the",
        "work; end-to-end 16×-replication ratio 3.0 vs ideal ≤ 16).  The",
        "patterns are single-pass character classes with no nested",
        "quantifiers, so no backtracking blow-up exists; at real corpus",
        "scale c vanishes into the first task wave.",
    ]
    # ---- whale variant: the events family under a planted hot user --
    if not only or "whale" in only:
        from pyspark.sql import functions as F

        whale_dir = os.path.join(REPO, ".scratch", f"probe_whale{rep}")
        os.makedirs(whale_dir, exist_ok=True)
        ev = spark.read.parquet(f"{scratch}/events.parquet")
        # ~20% of all events re-keyed onto one user (deterministic)
        (
            ev.withColumn(
                "user_id",
                F.when(F.col("event_id") % 5 == 0, F.lit(0).cast("long"))
                .otherwise(F.col("user_id")),
            )
            .write.mode("overwrite").parquet(f"{whale_dir}/events.parquet")
        )
        wrows = []
        for name in WHALE_OPS:
            fn = _resolve(name)
            release_memos(spark)
            time_op(fn, spark, scratch)
            te = time_op(fn, spark, scratch, runs=2)   # even users
            release_memos(spark)
            time_op(fn, spark, whale_dir)
            tw = time_op(fn, spark, whale_dir, runs=2)  # whale corpus
            wratio = tw / te if te > 0 else float("inf")
            wrows.append((name, te, tw, wratio))
            print(f"whale {name}: even={te:.2f}s whale={tw:.2f}s "
                  f"ratio={wratio:.1f}", file=sys.stderr)
        shutil.rmtree(whale_dir, ignore_errors=True)
        lines += [
            "",
            f"## Whale skew probe ({rep}× corpus, one user owning ~20% "
            "of events)",
            "",
            "Same event volume, two key distributions: `even` is the",
            "replicated corpus above (per-user rates unchanged), `whale`",
            "re-keys every 5th event onto user 0.  The whole-user window",
            "families must sort the whale inside one task — this measures",
            "that straggler directly (the cliff named in",
            "`SCALE_DESIGN.md`'s skew table; `cap_user_events` is the",
            "documented upstream guard).  `user_skew_audit` is the",
            "detector — its map-side combine keeps it flat on the same",
            "input.  `events_sessionize_capped` is the GUARDED path:",
            "the cap downsamples the whale before the window family",
            "runs, so its whale/even ratio should stay ~1.0 where the",
            "uncapped family shows the straggler.",
            "",
            "| operator | t(even) s | t(whale) s | whale/even |",
            "|---|---|---|---|",
        ]
        for name, te, tw, wratio in wrows:
            lines.append(f"| {name} | {te:.2f} | {tw:.2f} | {wratio:.1f} |")

    # ---- funnel dormant-user GC: state rows, not wall time ----------
    gc_lines = None
    if not only or "funnel_gc" in only:
        gc_lines = probe_funnel_gc(spark)
        lines += gc_lines

    # ---- index-store amortization: fresh-application subprocesses ---
    amo_lines = None
    if not only or "index_amortization" in only:
        amo_lines = probe_index_amortization(sf_dir)
        lines += amo_lines

    # ---- retrain-trigger drift curve over appended batches ----------
    health_lines = None
    if not only or "health_trajectory" in only:
        health_lines = probe_health_trajectory(spark, sf_dir)
        lines += health_lines

    if only:
        patched = False
        for header, sect in ((GC_SECTION_HEADER, gc_lines),
                             (AMO_SECTION_HEADER, amo_lines),
                             (HEALTH_SECTION_HEADER, health_lines)):
            if sect is not None:
                _patch_section(OUT_MD, sect, header)
                patched = True
                print(f"patched '{header}' section of {OUT_MD} "
                      "(timing rows above untouched)", file=sys.stderr)
        if not patched:
            print("(subset run: docs/SCALE_PROBE.md not rewritten)",
                  file=sys.stderr)
    else:
        with open(OUT_MD, "w") as f:
            f.write("\n".join(lines) + "\n")
        print(f"wrote {OUT_MD}", file=sys.stderr)
    shutil.rmtree(scratch, ignore_errors=True)
    return 0


GC_SECTION_HEADER = "## Funnel dormant-user GC probe"
AMO_SECTION_HEADER = "## Index-store amortization probe (cross-application)"
HEALTH_SECTION_HEADER = "## Post-extend health trajectory probe"


def probe_health_trajectory(spark, sf_dir: str,
                            n_batches: int = 3) -> list[str]:
    """The retrain-trigger drift CURVE (r12 verdict, next-round #5):
    build the store at 1×, append ``n_batches`` synthetic batches, and
    record the health metrics after each — the numbers that tell an
    operator what "well past build-time level"
    (``similarity.q_ann_index_health``) means for THIS corpus.

    Batches are deterministic corpus transforms chosen to force the
    drifts the triggers watch for: each document batch is the corpus
    re-keyed to fresh doc_ids with a batch-tag prefix token (so every
    original shingle's df grows +1 per batch and marches toward
    ``NGRAM_DF_CAP`` — capped_postings_rate must climb), and each
    vector batch is the corpus re-keyed and value-scaled +10% per
    batch past the FROZEN quantization bounds (so codes saturate —
    clamped_codes / sq_at_rail_rate must climb).  List occupancy
    drifts because appends never retrain the centroid set while
    target_list_size √n grows."""
    from pyspark.sql import functions as F

    from astra_perseverance_spark.conformed.model import release_memos
    from astra_perseverance_spark.extensions.corpus import (
        INDEX_DB_ENV,
        vectors_frame,
    )
    from astra_perseverance_spark.queries import QUERY_REGISTRY
    from astra_perseverance_spark.sinks.index_store import (
        extend_index_store,
        extend_postings,
        index_store_health,
        write_index_store,
    )

    loc = os.path.join(REPO, ".scratch", "health_traj_store")
    db = "health_traj"
    shutil.rmtree(loc, ignore_errors=True)
    prior = os.environ.pop(INDEX_DB_ENV, None)
    spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")
    rows: list[tuple[str, dict, dict, int]] = []
    try:
        write_index_store(spark, sf_dir, db, loc)
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
            .select("doc_id", "lang", "text")
        vecs = vectors_frame(spark, sf_dir).select("vec_id", "eq", "n2")
        max_doc = docs.agg(F.max("doc_id")).collect()[0][0]
        max_vec = vecs.agg(F.max("vec_id")).collect()[0][0]

        def snapshot(tag: str, clamped: int) -> None:
            os.environ[INDEX_DB_ENV] = db
            release_memos(spark)
            try:
                health = {r["metric"]: r["value"]
                          for r in index_store_health(spark, db)
                          .collect()}
                post = {r["metric"]: r["value"]
                        for r in QUERY_REGISTRY["postings_health"](
                            spark, sf_dir).collect()}
            finally:
                del os.environ[INDEX_DB_ENV]
                release_memos(spark)
            rows.append((tag, health, post, clamped))
            print(f"health_trajectory {tag}: "
                  f"max_over_target={health['max_over_target']:.2f} "
                  f"rail={health['sq_at_rail_rate']:.4f} "
                  f"clamped={clamped} "
                  f"capped_rate={post['capped_postings_rate']:.4f}",
                  file=sys.stderr)

        snapshot("build", 0)
        for i in range(1, n_batches + 1):
            dbatch = docs.select(
                (F.col("doc_id") + (max_doc + 1) * i).alias("doc_id"),
                "lang",
                F.concat(F.lit(f"batchtag{i} "), F.col("text"))
                .alias("text"),
            )
            extend_postings(spark, db, dbatch)
            k = 10 + i
            vbatch = vecs.select(
                (F.col("vec_id") + (max_vec + 1) * i).alias("vec_id"),
                F.transform(
                    "eq", lambda x: ((x * k) / 10).cast("long")
                ).alias("eq"),
            ).withColumn(
                "n2",
                F.aggregate("eq", F.lit(0).cast("long"),
                            lambda acc, x: acc + x * x),
            )
            res = extend_index_store(spark, db, vbatch)
            snapshot(f"+batch {i}", res["clamped_codes"])
    finally:
        if prior is not None:
            os.environ[INDEX_DB_ENV] = prior
        spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")
        shutil.rmtree(loc, ignore_errors=True)

    lines = [
        "",
        HEALTH_SECTION_HEADER,
        "",
        "Generated by `tools/scale_probe.py health_trajectory` over",
        f"`{sf_dir}`.  The store is built once, then {n_batches}",
        "deterministic corpus-sized batches append WITHOUT retraining",
        "(fresh doc_ids with a batch-tag prefix; vectors value-scaled",
        "+10% per batch past the frozen bounds), and every health",
        "signal is recorded after each — the drift curve that gives",
        "the retrain thresholds (`make_training_data",
        "--max-list-over-target/--max-rail-rate`) their numeric",
        "meaning: pick the build row's level plus operating margin,",
        "and the curve shows how many batches of headroom that buys.",
        "",
        "| state | n_vectors | max_over_target | p99_over_target | "
        "sq_at_rail_rate | clamped_codes (batch) | "
        "capped_postings_rate | surviving_mean_per_doc |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for tag, health, post, clamped in rows:
        lines.append(
            f"| {tag} | {int(health['n_vectors'])} "
            f"| {health['max_over_target']:.2f} "
            f"| {health['p99_over_target']:.2f} "
            f"| {health['sq_at_rail_rate']:.4f} "
            f"| {clamped} "
            f"| {post['capped_postings_rate']:.4f} "
            f"| {post['surviving_mean_per_doc']:.1f} |"
        )
    # the recommendation prose is emitted HERE (not hand-written into
    # the doc) so a subset re-patch of this section keeps it, and the
    # interpolated constants can never disagree with the CLI's
    from make_training_data import (
        RECOMMENDED_MAX_LIST_OVER_TARGET,
        RECOMMENDED_MAX_RAIL_RATE,
    )

    lines += [
        "",
        "Reading the curve: `max_over_target` degrades as appends pile",
        "into the frozen lists while the √n target grows;",
        "`clamped_codes` is the EXACT per-batch saturation count the",
        "frozen bounds caused (`sq_at_rail_rate` is its cumulative",
        "store-readable proxy); `capped_postings_rate` climbs as",
        "repeated text pushes shingles past `NGRAM_DF_CAP` — recall",
        "eroding by eviction, the text-side retrain signal.  A real",
        "deployment re-runs `write_index_store` when the curve leaves",
        "the band the build row establishes.",
        "",
        "Recommended operating thresholds (round-14, derived from this",
        f"table): `--max-list-over-target "
        f"{RECOMMENDED_MAX_LIST_OVER_TARGET}` and `--max-rail-rate",
        f"{RECOMMENDED_MAX_RAIL_RATE}` — each ≈ the build row's level",
        "× 2, so a fresh build",
        "passes with margin and the gate refuses by the third",
        "no-retrain corpus-sized append.  The constants live in",
        "`tools/make_training_data.py`",
        "(`RECOMMENDED_MAX_LIST_OVER_TARGET` /",
        "`RECOMMENDED_MAX_RAIL_RATE`) and are interpolated into the",
        "flags' `--help`; `tests/test_scale_docs.py` pins them against",
        "this table, so re-recording the trajectory forces the",
        "recommendation to be re-derived rather than silently drifting",
        "from the curve.  Since round 14 the gate is evaluated BEFORE",
        "`extend_postings` on the incremental path — a refusing run",
        "leaves the store untouched.",
    ]
    return lines


def _patch_section(path: str, section_lines: list[str],
                   header: str = GC_SECTION_HEADER) -> None:
    """Replace (or append) one named section in the probe doc —
    for probes whose measurement stands alone (state-store row
    counts; the cross-application store-vs-rebuild comparison, which
    is internally consistent because both arms run back-to-back), so
    a subset run may legitimately refresh it without invalidating the
    timing rows around it."""
    with open(path) as f:
        text = f.read()
    body = "\n".join(section_lines).strip("\n") + "\n"
    start = text.find(header)
    if start == -1:
        text = text.rstrip("\n") + "\n\n" + body
    else:
        nxt = text.find("\n## ", start + len(header))
        end = len(text) if nxt == -1 else nxt + 1
        text = text[:start].rstrip("\n") + "\n\n" + body + text[end:]
    with open(path, "w") as f:
        f.write(text)


AMO_QUERIES = ("dedup_incremental", "ann_incremental",
               "ann_incremental_pq", "split_assign_incremental",
               "ann_index_health",
               # trained-IVF serving family: the memo path re-runs the
               # Lloyd training per application; the store path reads
               # the persisted quantizer + lists
               "ann_ivf_kmeans", "ann_ivf_pq")


def _index_amo_child(mode: str, sf_dir: str, loc: str, db: str) -> int:
    """Child-process arm of the amortization probe: ONE fresh Spark
    application per invocation (that is the point — the memo pool
    starts empty, exactly like a scheduled production run).  Prints
    one JSON line of per-query cold seconds."""
    import json
    import time as _time

    from astra_perseverance_spark import get_spark
    from astra_perseverance_spark.queries import QUERY_REGISTRY

    spark = get_spark(f"idx-amo-{mode}")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict[str, float] = {}
    if mode == "capread":
        # the r13 read-path comparison, same persisted data: the
        # capped-universe recompute over a doc-bucketed forward table
        # (the pre-r13 store layout — the df window re-shuffles the
        # whole table) vs the gram-bucketed inverted table (df window
        # exchange-free; only survivors shuffle).  The postings pair
        # is built 8× the probe corpus so the shuffle delta is not
        # drowned by the ~0.5 s job floor (at sf0.1's ~9 MB table the
        # two arms measure within noise of each other); one warm-up +
        # 3 timed runs per arm.
        from functools import reduce

        from pyspark.sql import functions as F

        from astra_perseverance_spark.extensions.dedup import (
            cap_postings,
            k_gram_rows_of,
        )

        rep = 8
        cap_db, cap_loc = f"{db}_capread", f"{loc}_capread"
        shutil.rmtree(cap_loc, ignore_errors=True)
        spark.sql(f"CREATE DATABASE IF NOT EXISTS {cap_db} "
                  f"LOCATION '{cap_loc}'")
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
            .select("doc_id", "lang", "text")
        n = docs.count()
        big = reduce(
            lambda a, b: a.unionByName(b),
            [docs.select(
                (F.col("doc_id") + (n + 1) * i).alias("doc_id"),
                "lang",
                F.concat(F.lit(f"rep{i} "), "text").alias("text"))
             for i in range(rep)],
        ).repartition(spark.sparkContext.defaultParallelism, "doc_id")
        grams = k_gram_rows_of(big, 3).distinct().cache()
        try:
            for table, key in (("shingle_raw", "doc_id"),
                               ("shingle_inv", "g")):
                (grams.write.mode("overwrite").format("parquet")
                 .bucketBy(16, key).sortBy(key)
                 .saveAsTable(f"{cap_db}.{table}"))
        finally:
            grams.unpersist()
        for key, table in (("capread_fwd", "shingle_raw"),
                           ("capread_inv", "shingle_inv")):
            def read():
                cap_postings(spark.table(f"{cap_db}.{table}")).write \
                    .format("noop").mode("overwrite").save()
            read()
            t0 = _time.time()
            for _ in range(3):
                read()
            out[key] = round((_time.time() - t0) / 3, 4)
        spark.sql(f"DROP DATABASE IF EXISTS {cap_db} CASCADE")
        shutil.rmtree(cap_loc, ignore_errors=True)
        print("AMO_RESULT " + json.dumps(out))
        return 0
    if mode == "build":
        from astra_perseverance_spark.sinks.index_store import (
            write_index_store,
        )

        t0 = _time.time()
        write_index_store(spark, sf_dir, db, loc)
        out["build_seconds"] = round(_time.time() - t0, 4)
    else:
        if mode == "store":
            from astra_perseverance_spark.sinks.index_store import (
                register_index_store,
            )

            register_index_store(spark, db, loc)
            os.environ["SPARK_GRAFT_INDEX_DB"] = db
        for name in AMO_QUERIES:
            t0 = _time.time()
            QUERY_REGISTRY[name](spark, sf_dir).write.format(
                "noop").mode("overwrite").save()
            out[name] = round(_time.time() - t0, 4)
    print("AMO_RESULT " + json.dumps(out))
    return 0


def probe_index_amortization(sf_dir: str) -> list[str]:
    """Measure the index store's whole value claim: probe cost
    WITHOUT rebuild across applications.  Three fresh-application
    subprocesses — build the store once (timed), then run the
    incremental queries cold from a new application on the memo path
    (rebuilds every artifact from the corpus) and on the store path
    (``SPARK_GRAFT_INDEX_DB`` — reads the persisted tables).  Both
    query arms run back-to-back on the same machine, so the RATIO is
    meaningful even if absolute load shifts between probe runs."""
    import json
    import subprocess

    loc = os.path.join(REPO, ".scratch", "idx_amo_store")
    db = "amo_index"
    shutil.rmtree(loc, ignore_errors=True)

    def child(mode: str) -> dict:
        env = {**os.environ}
        env.pop("SPARK_GRAFT_INDEX_DB", None)
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__),
             "index_amo_child", mode, sf_dir, loc, db],
            capture_output=True, text=True, timeout=1200, env=env,
            cwd=REPO)
        assert proc.returncode == 0, proc.stdout[-2000:] + \
            proc.stderr[-2000:]
        line = [ln for ln in proc.stdout.splitlines()
                if ln.startswith("AMO_RESULT ")][-1]
        return json.loads(line[len("AMO_RESULT "):])

    build = child("build")
    size_b = sum(
        os.path.getsize(os.path.join(r, f))
        for r, _, fs in os.walk(loc) for f in fs)
    memo = child("memo")
    store = child("store")
    capread = child("capread")
    shutil.rmtree(loc, ignore_errors=True)
    for mode, res in (("build", build), ("memo", memo),
                      ("store", store), ("capread", capread)):
        print(f"index_amortization {mode}: {res}", file=sys.stderr)

    lines = [
        "",
        AMO_SECTION_HEADER,
        "",
        f"Generated by `tools/scale_probe.py index_amortization` over",
        f"`{sf_dir}`.  Three FRESH Spark applications (subprocesses):",
        "one builds + persists the store, then each query runs COLD in",
        "a new application on the memo path (every artifact rebuilt",
        "from the corpus — what every scheduled run pays without the",
        "store) and on the store path (`SPARK_GRAFT_INDEX_DB` — probes",
        "the persisted tables).  Build cost is paid once; the",
        "per-application saving is memo − store.  Both query arms run",
        "back-to-back, so the ratio is load-robust.",
        "",
        f"Store build: {build['build_seconds']:.1f} s once; on-disk",
        f"size {size_b / 1e6:.1f} MB.",
        "",
        "| query (cold, fresh app) | memo rebuild s | store probe s | "
        "store/memo |",
        "|---|---|---|---|",
    ]
    for name in AMO_QUERIES:
        m, s = memo[name], store[name]
        lines.append(f"| {name} | {m:.2f} | {s:.2f} | "
                     f"{(s / m if m else float('inf')):.2f} |")
    tm, ts = sum(memo.values()), sum(store.values())
    lines.append(f"| **total** | {tm:.2f} | {ts:.2f} | "
                 f"{(ts / tm if tm else float('inf')):.2f} |")
    cf, ci = capread["capread_fwd"], capread["capread_inv"]
    lines += [
        "",
        "Read-path isolation (identical postings rows persisted in",
        "both orientations at 8× the probe corpus, one fresh app,",
        "3-run mean after warm-up): the capped-universe recompute",
        f"costs **{cf:.2f} s over the doc-bucketed forward table**",
        "(the pre-r13 store layout — the df window re-shuffles the",
        f"whole table) vs **{ci:.2f} s over the gram-bucketed",
        f"`shingle_inv`** ({(ci / cf if cf else float('inf')):.2f}×) —",
        "the inverted orientation's df window plans NO exchange and",
        "only the surviving postings shuffle to doc grain, so the",
        "gap IS the full-table shuffle and keeps widening with",
        "postings volume.  (The dedup_incremental row above cannot",
        "show this at probe scale: its store arm is dominated by the",
        "candidate join + verify, not the universe read.)",
    ]
    lines += [
        "",
        "What the store removes is artifact CONSTRUCTION from the",
        "corpus: tokenize+shingle the text, digest it, TRAIN the",
        "coarse quantizer (the Lloyd iterations behind",
        "`ann_ivf_kmeans` — the single largest per-application",
        "saving), assign/encode the vectors, walk the duplicate",
        "graph.  Queries run in the order listed and share the",
        "session memo pool within each arm, so a family's rebuild",
        "cost lands on its FIRST member (`ann_ivf_pq` reads the",
        "lists `ann_ivf_kmeans` just memoized — its own row is",
        "probe-work both ways).  What still runs per",
        "application is the probe work itself — for",
        "`dedup_incremental` that is the candidate join + Jaccard",
        "verify over the (persisted) postings, which dominates its",
        "row and caps the ratio here.  (Round 13: the store read now",
        "serves the capped universe from the GRAM-bucketed",
        "`shingle_inv` orientation — the df recompute plans no",
        "exchange and only the surviving postings shuffle to doc",
        "grain, which is what moved this row from its r12 0.63.)",
        "The saved fraction grows with",
        "text volume: shingling is O(corpus bytes) while the verify",
        "is bounded by candidate density (df-capped prefix postings),",
        "so at production scale the construction side the store",
        "eliminates is the dominant term.  `ann_index_health` reads",
        "the persisted lists instead of re-deriving assignment —",
        "about a wash at this scale, the point is it audits the real",
        "on-disk index.",
    ]
    return lines


def probe_funnel_gc(spark, n_users: int = 4000, n_active: int = 100,
                    timeout_ms: int = 3000) -> list[str]:
    """Measure the state-store row count of the streaming funnel with
    and without the dormant-user inactivity GC (round-10 landing,
    round-11 verdict #6: the GC shipped with property tests but no
    measured entry).

    Scenario: ``n_users`` users each open a funnel in batch 1; only
    ``n_active`` of them stay active.  After the inactivity budget
    passes, batch 2 delivers the active users' next step.  Without the
    timeout the state store holds one row per user-ever-seen; with it
    the dormant majority's rows are finalized and DROPPED, so the
    count converges to the active set.  The number reported is
    ``numRowsTotal`` from the state operator's own progress metrics —
    a row count, not a timing, so machine load cannot skew it."""
    import json
    import tempfile
    import time as _time

    from astra_perseverance_spark.streaming import stream_events_funnel

    def run(timeout):
        root = tempfile.mkdtemp(prefix="funnel_gc_probe_")
        src = os.path.join(root, "src")
        os.makedirs(src)
        spark.range(n_users).selectExpr(
            "id AS event_id", "id AS user_id",
            "'view' AS event_type", "CAST(1000 AS LONG) AS ns",
        ).coalesce(1).write.mode("append").parquet(src)
        sdf = stream_events_funnel(spark, src,
                                   inactivity_timeout_ms=timeout)
        qname = f"funnel_gc_probe_{'on' if timeout else 'off'}"
        q = (sdf.writeStream.format("memory").queryName(qname)
             .outputMode("append")
             .option("checkpointLocation", os.path.join(root, "ckpt"))
             .trigger(processingTime="1 second")
             .start())
        try:
            deadline = _time.time() + 120
            # batch 1 fully absorbed: every user emitted its view row
            while (spark.sql(f"SELECT count(*) c FROM {qname}")
                   .collect()[0][0] < n_users):
                if _time.time() > deadline:
                    raise TimeoutError("batch 1 never drained")
                _time.sleep(0.5)
            # let the inactivity budget expire in processing time
            _time.sleep((timeout or timeout_ms) / 1000 + 1.5)
            # view+click pair: emits ≥ n_active rows in BOTH modes —
            # with the GC on the active users were dropped too (they
            # were just as quiet), so a returning user restarts a
            # fresh funnel (the documented v3 semantics) and the view
            # is what re-opens it
            spark.range(n_active).selectExpr(
                "id + 1000000 AS event_id", "id AS user_id",
                "'view' AS event_type", "CAST(2000 AS LONG) AS ns",
            ).union(spark.range(n_active).selectExpr(
                "id + 2000000 AS event_id", "id AS user_id",
                "'click' AS event_type", "CAST(2001 AS LONG) AS ns",
            )).coalesce(1).write.mode("append").parquet(src)
            while (spark.sql(f"SELECT count(*) c FROM {qname}")
                   .collect()[0][0] < n_users + n_active):
                if _time.time() > deadline:
                    raise TimeoutError("batch 2 never drained")
                _time.sleep(0.5)
            if timeout:
                # timers fire on subsequent (possibly no-data) micro-
                # batches; poll the state operator's row count down
                rows = None
                while _time.time() < deadline:
                    ops = (q.lastProgress or {}).get(
                        "stateOperators") or []
                    if ops:
                        rows = ops[0].get("numRowsTotal")
                        if rows is not None and rows <= n_active:
                            break
                    _time.sleep(0.5)
                if rows is None or rows > n_active:
                    # never publish a stale count as the "bounded"
                    # row — the doc row's whole point is the bound
                    raise TimeoutError(
                        f"state rows never converged to the active "
                        f"set before the deadline (last={rows})")
            else:
                rows = None
                while rows is None and _time.time() < deadline:
                    ops = (q.lastProgress or {}).get(
                        "stateOperators") or []
                    if ops:
                        rows = ops[0].get("numRowsTotal")
                    _time.sleep(0.5)
            print(f"funnel_gc timeout={timeout}: state rows={rows} "
                  f"(users={n_users}, active={n_active})",
                  file=sys.stderr)
            assert rows is not None, json.dumps(q.lastProgress)
            return int(rows)
        finally:
            q.stop()
            shutil.rmtree(root, ignore_errors=True)

    rows_off = run(None)
    rows_on = run(timeout_ms)
    return [
        "",
        GC_SECTION_HEADER,
        "",
        f"Generated by `tools/scale_probe.py funnel_gc` — {n_users}",
        f"users open a funnel; only {n_active} stay active; the second",
        "batch arrives after the inactivity budget.  The metric is the",
        "state operator's own `numRowsTotal` (a row count — machine",
        "load cannot skew it), so a subset run may refresh this",
        "section without re-recording the timing rows.",
        "",
        "| inactivity_timeout_ms | state rows after batch 2 | bound |",
        "|---|---|---|",
        f"| None | {rows_off} | one row per user-ever-seen "
        f"({n_users}) |",
        f"| {timeout_ms} | {rows_on} | ACTIVE user set "
        f"({n_active}) |",
    ]


if __name__ == "__main__":
    sys.exit(main())
