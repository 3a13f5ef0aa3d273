"""Durable index store for the incremental-serving queries.

``ann_incremental``, ``ann_incremental_pq``, ``dedup_incremental`` and
``split_assign_incremental`` all probe "persisted corpus artifacts" —
but without this sink those artifacts are session-scoped ``memo_frame``
caches, rebuilt from the corpus by every new Spark application.  That
is correct (the rebuild is deterministic) but it is not the cost model
the queries claim: a continuously ingesting pipeline amortizes index
construction across MANY applications, and a probe batch must cost
batch-sized work against tables that already exist on disk.

``write_index_store`` materializes the artifacts once, as tables in a
dedicated database (the ``sinks.warehouse`` pattern — with a metastore
the bucketing metadata outlives the session; with Spark's default
in-memory catalog the on-disk layout is identical and a fresh session
re-registers it by calling this module's ``register_index_store``):

======================  =============================================
table                   contents (producer — the SAME builder the
                        memo path uses, so arithmetic cannot drift)
======================  =============================================
``ann_centroids``       (cid, c_eq, c_n2) IVF coarse centroids of the
                        indexed (even vec_id) corpus
                        (``similarity._incremental_centroids``)
``ann_ivf_lists``       (cid, vec_id, eq, n2) every indexed vector in
                        its nearest-centroid list, BUCKETED by cid —
                        the probe equi-join's store side scans
                        hash-clustered
                        (``similarity._build_incremental_index``)
``ann_sq_bounds``       (d, lo, hi) per-dimension quantization bounds
                        FROZEN over the indexed corpus
                        (``similarity._even_dim_stats``)
``ann_sq_store``        (vec_id, codes array<smallint>) the int8
                        codes (``training.sq_code`` with the frozen
                        bounds), BUCKETED by vec_id — 4x smaller than
                        the fixed-point vectors; the load path decodes
                        with ``training.sq_decode`` (bit-identical to
                        the fused ``sq_recon`` map)
``kmeans_centroids``    (cid, c_eq, c_n2) the TRAINED coarse
                        quantizer — ``KMEANS_ITERS`` integer-exact
                        Lloyd iterations, the build's most expensive
                        stage, run once here
                        (``similarity._kmeans_centroids``)
``kmeans_lists``        (vec_id, eq, n2, cid, crank) every corpus
                        vector's IVF_NPROBE nearest trained
                        centroids, BUCKETED by cid — the serving
                        index of the whole trained-IVF query family
                        (``similarity._build_ivf_kmeans_lists``)
``digest_dim``          (doc_id, content_md5) exact-dedup digest dim,
                        BUCKETED by content_md5 (the groupBy/join key)
                        (``dedup.content_digest_frame``)
``shingle_raw``         (doc_id, lang, g) the UNCAPPED postings in
                        FORWARD orientation, BUCKETED by doc_id —
                        append-only (``extend_postings``); the
                        doc-grain copy serves per-doc work: the
                        append idempotence anti-join and the
                        ``postings_health`` doc census run
                        bucket-local on it (``dedup.shingle_rows``)
``shingle_inv``         the SAME rows in INVERTED orientation,
                        BUCKETED by the gram ``g`` — the read-path
                        serving index: ``dedup.cap_postings``'s df
                        window runs over the bucketed scan with NO
                        exchange (hash-clustered by g already), so a
                        fresh application's capped-universe read
                        shuffles only the SURVIVING postings to doc
                        grain instead of re-shuffling the whole
                        table twice (the r12 verdict's last
                        O(corpus)-per-application store-mode stage);
                        df is recomputed at read, so an appended
                        batch that pushes a shingle past the cap
                        still evicts it immediately
``even_components``     (node, component) connected components of the
                        existing-corpus duplicate subgraph — the
                        split-anchor frame
                        (``training.even_components_frame``)
======================  =============================================

Setting ``SPARK_GRAFT_INDEX_DB`` to the database name routes the four
incremental queries' artifact reads — and the whole TRAINED-IVF
serving family's (``ann_ivf_kmeans`` / recall audits / ``ann_ivf_pq``
/ ``semdedup`` / ``cluster_purity``), whose Lloyd-trained quantizer
is the most expensive artifact to rebuild per application — through
these tables (``corpus.index_artifact``); with it unset every
consuming query's plan is bit-identical to the memo-only code (the
branch binds at plan build, like the bucketed-warehouse toggle).  The cross-application
pytest (``tests/test_index_store.py``) builds the store under one
application, stops it, probes from a fresh application and asserts
hash-identical output.

Write-side idempotence: the env toggle is suppressed while the source
plans are built, exactly like ``warehouse.write_bucketed_events`` — a
refresh run must rebuild from the corpus, not read the tables it is
about to overwrite.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from astra_perseverance_spark.extensions.corpus import INDEX_DB_ENV

# table name -> bucket key (None = plain parquet table; tiny frames)
_LAYOUT: dict[str, str | None] = {
    "ann_centroids": None,
    "ann_ivf_lists": "cid",
    "ann_sq_bounds": None,
    "ann_sq_store": "vec_id",
    "kmeans_centroids": None,
    "kmeans_lists": "cid",
    "digest_dim": "content_md5",
    "shingle_raw": "doc_id",
    "shingle_inv": "g",
    "even_components": None,
}

DEFAULT_BUCKETS = 16


def write_index_store(spark: SparkSession, sf_dir: str, database: str,
                      location: str,
                      n_buckets: int = DEFAULT_BUCKETS) -> dict[str, str]:
    """Build every incremental-serving artifact from the corpus at
    ``sf_dir`` and persist it under ``database`` (created at
    ``location``).  Returns table name → qualified name."""
    from astra_perseverance_spark.extensions import similarity
    from astra_perseverance_spark.extensions.dedup import (
        content_digest_frame,
        shingle_rows,
    )
    from astra_perseverance_spark.extensions.training import (
        even_components_frame,
        sq_code,
    )
    from astra_perseverance_spark.functions.vectors import ANN_DIM

    spark.sql(f"CREATE DATABASE IF NOT EXISTS {database} "
              f"LOCATION '{location}'")
    prior = os.environ.pop(INDEX_DB_ENV, None)
    try:
        lo, hi = similarity._even_dim_stats(spark, sf_dir)
        bounds = spark.createDataFrame(
            [(d, int(lo[d]), int(hi[d])) for d in range(ANN_DIM)],
            "d INT, lo BIGINT, hi BIGINT",
        )
        code = sq_code(*similarity._even_dim_bounds(spark, sf_dir))
        store = (
            similarity._vectors(spark, sf_dir)
            .filter(F.col("vec_id") % 2 == 0)
            .select(
                "vec_id",
                F.transform(
                    "eq", lambda x, i: code(x, i).cast("smallint")
                ).alias("codes"),
            )
        )
        out: dict[str, str] = {}

        def save(name: str, df) -> None:
            qualified = f"{database}.{name}"
            writer = df.write.mode("overwrite").format("parquet")
            key = _LAYOUT[name]
            if key is not None:
                writer = writer.bucketBy(n_buckets, key).sortBy(key)
            writer.saveAsTable(qualified)
            out[name] = qualified

        # centroids first: the list assignment reads the PERSISTED
        # centroid table rather than re-deriving the centroids a
        # second time (same deterministic rows; half the build cost,
        # and the two artifacts can never disagree)
        save("ann_centroids",
             similarity._incremental_centroids(spark, sf_dir))
        save("ann_ivf_lists", similarity._build_incremental_index(
            spark, sf_dir, cent=spark.table(out["ann_centroids"])))
        save("ann_sq_bounds", bounds)
        save("ann_sq_store", store)
        # trained serving index: Lloyd training runs ONCE here (the
        # build's most expensive stage — the amortization probe's
        # headline saving); the list assignment reads the persisted
        # centroid table, same no-drift pattern as the pair above
        save("kmeans_centroids", similarity._kmeans_centroids(
            spark, sf_dir))
        save("kmeans_lists", similarity._build_ivf_kmeans_lists(
            spark, sf_dir, cent=spark.table(out["kmeans_centroids"])))
        save("digest_dim", content_digest_frame(spark, sf_dir))
        # forward + inverted orientations of the same postings rows
        # (shingle_rows is session-cached, so the second save re-reads
        # the cache, not the text pipeline); writers, not readers, pay
        # for the two layouts — the standard inverted-index trade
        save("shingle_raw",
             shingle_rows(spark, sf_dir).select("doc_id", "lang", "g"))
        save("shingle_inv",
             shingle_rows(spark, sf_dir).select("doc_id", "lang", "g"))
        save("even_components", even_components_frame(spark, sf_dir))
        return out
    finally:
        if prior is not None:
            os.environ[INDEX_DB_ENV] = prior


def extend_index_store(spark: SparkSession, database: str,
                       batch: DataFrame,
                       n_buckets: int = DEFAULT_BUCKETS) -> dict[str, int]:
    """Fold a NEW ingestion batch into the persisted ANN index — the
    standard IVF append (no retraining): each new vector is routed to
    its nearest PERSISTED centroid (the exact affinity rule the probe
    path uses: cosine DESC, cid ASC) and appended to ``ann_ivf_lists``;
    its int8 codes — encoded with the FROZEN persisted bounds,
    saturating to [0, SQ_LEVELS] where a new value falls outside the
    index-build range (the standard SQ overflow behavior; the bounds
    are deliberately never widened, see ``similarity._even_dim_stats``)
    — append to ``ann_sq_store``.  ``batch``: (vec_id, eq, n2).

    After the append, probe batches see the new vectors as index
    members with NO rebuild — batch-sized write, batch-sized probe.
    The centroid set and quantization bounds stay fixed (production
    systems retrain/re-bound on a slow cadence, not per batch); list
    sizes therefore drift as the corpus grows.  The retrain trigger
    is measurable, not prose: the registered ``ann_index_health``
    query audits list-size drift vs the √n sizing and the clamp rate
    on the fixture split, ``index_store_health`` below reads the same
    signals from THIS persisted store, and the returned
    ``clamped_codes`` count reports how many of this batch's codes
    the frozen bounds saturated.

    The TEXT artifacts (digest dim + shingle postings) extend through
    ``extend_postings`` — a separate call because its input is a
    document batch, not a vector batch.  ``even_components`` alone
    stays build-time-frozen: it IS the definition of the existing
    corpus's split anchors (``split_assign_incremental`` routes new
    docs relative to it), so extending it would change what "existing"
    means mid-stream.

    Returns {"ivf_rows": n, "sq_rows": n, "clamped_codes": c} — ``c``
    is how many of this batch's raw codes fell outside [0, SQ_LEVELS]
    and were saturated (the per-batch health signal; a rising clamp
    count across batches says the frozen bounds no longer cover the
    distribution — time for a ``write_index_store`` rebuild)."""
    from astra_perseverance_spark.extensions.similarity import (
        _nearest_centroid,
    )
    from astra_perseverance_spark.extensions.training import (
        SQ_LEVELS,
        bounds_accessors,
        sq_code,
    )
    from astra_perseverance_spark.functions.vectors import ANN_DIM

    cent = spark.table(f"{database}.ann_centroids")
    # the SAME crank-1 affinity rule the index build and the
    # ann_index_health audit use — one definition, no drift
    assigned = _nearest_centroid(batch, cent)
    n = assigned.count()
    (
        assigned.write.mode("append").format("parquet")
        .bucketBy(n_buckets, "cid").sortBy("cid")
        .saveAsTable(f"{database}.ann_ivf_lists")
    )

    brows = spark.table(f"{database}.ann_sq_bounds").collect()
    lo = [0] * ANN_DIM
    hi = [0] * ANN_DIM
    for r in brows:
        lo[r["d"]] = r["lo"]
        hi[r["d"]] = r["hi"]
    code = sq_code(*bounds_accessors(lo, hi))
    coded = batch.select(
        "vec_id",
        F.transform(
            "eq",
            lambda x, i: F.greatest(
                F.lit(0), F.least(F.lit(SQ_LEVELS), code(x, i))
            ).cast("smallint"),
        ).alias("codes"),
        F.aggregate(
            F.transform(
                "eq",
                lambda x, i: F.when(
                    (code(x, i) < 0) | (code(x, i) > SQ_LEVELS),
                    F.lit(1).cast("long"),
                ).otherwise(F.lit(0).cast("long")),
            ),
            F.lit(0).cast("long"),
            lambda acc, y: acc + y,
        ).alias("n_clamped"),
    )
    # cache: the clamp aggregate and the table write both consume the
    # coded frame — without this the 64-dim encode transform runs
    # twice over the batch
    coded = coded.cache()
    try:
        clamped = int(
            coded.agg(F.coalesce(F.sum("n_clamped"), F.lit(0)))
            .collect()[0][0]
        )
        (
            coded.select("vec_id", "codes")
            .write.mode("append").format("parquet")
            .bucketBy(n_buckets, "vec_id").sortBy("vec_id")
            .saveAsTable(f"{database}.ann_sq_store")
        )
    finally:
        coded.unpersist()
    return {"ivf_rows": n, "sq_rows": n, "clamped_codes": clamped}


def extend_postings(spark: SparkSession, database: str,
                    batch_docs: DataFrame,
                    n_buckets: int = DEFAULT_BUCKETS) -> dict[str, int]:
    """Fold a NEW document batch into the persisted text artifacts —
    batch-sized work, exactly correct by construction:

    - ``shingle_raw`` (doc-bucketed, forward) and ``shingle_inv``
      (gram-bucketed, inverted) both get the batch's distinct 3-word
      shingles (``dedup.k_gram_rows_of`` — the SAME expression
      pipeline the corpus build uses).  The tables are UNCAPPED
      postings, so append is the whole maintenance story: the
      stop-shingle cap and the surviving per-doc counts are recomputed
      over the full table at read (``dedup.cap_postings``), which
      means a batch that pushes a shingle's document frequency past
      ``NGRAM_DF_CAP`` evicts it from the capped universe immediately
      — no stale-df window, the failure mode that made the r11 capped
      representation append-unsafe by design.
    - ``digest_dim`` gets one (doc_id, content_md5) row per batch doc
      (``dedup.content_digest`` — the shared digest expression), so
      the NEXT batch's exact-dedup probe sees this batch as existing
      corpus.

    ``batch_docs``: (doc_id, lang, text, ...) in the conformed
    documents schema with NEW doc_ids.  The call is RETRY-SAFE per
    doc: each append first anti-joins the batch against its own
    target table's doc_ids, so a crash between the table writes
    (they are not atomic together) converges on re-run instead of
    duplicating postings — duplicated (doc, shingle) rows would
    silently double df in ``cap_postings`` and falsely evict
    legitimate shingles past the cap, which is why idempotence lives
    HERE and not in the caller's batch discovery.  The batch gram and
    digest frames are cached around their count+write pairs, so the
    tokenize+shingle pipeline runs once per table and the returned
    counts are the rows the write actually appended (not a separate
    job that a concurrent writer could race).

    SAME-SESSION consumers beware: ``dedup.capped_shingle_rows`` (and
    the pair frames above it) memoize per session, so a session that
    probed the store BEFORE this append keeps serving the pre-append
    universe until ``conformed.model.release_memos`` is called — a
    fresh application (the normal store consumer) always sees the
    appended state.  Returns {"shingle_rows", "shingle_inv_rows",
    "digest_rows"} actually appended PER TABLE (all 0 on a pure
    replay).  The two orientation counts are equal on a clean append;
    they differ exactly on a crash-recovery replay where one
    orientation's write survived and the other's didn't — reporting
    both makes the partial repair visible to the caller/run.json
    instead of a misleading 0."""
    from astra_perseverance_spark.extensions.dedup import (
        content_digest,
        k_gram_rows_of,
    )

    # ONE shingle pipeline for the batch, cached: both orientations'
    # pending anti-joins, counts, and writes re-read the cache instead
    # of re-tokenizing the batch per table
    grams = (
        k_gram_rows_of(batch_docs.select("doc_id", "lang", "text"), 3)
        .distinct().cache()
    )
    counts: dict[str, int] = {}
    try:
        for table, key in (("shingle_raw", "doc_id"),
                           ("shingle_inv", "g")):
            seen = spark.table(f"{database}.{table}") \
                .select("doc_id").distinct()
            pending = grams.join(seen, "doc_id", "left_anti").cache()
            try:
                counts[table] = pending.count()
                (
                    pending.write.mode("append").format("parquet")
                    .bucketBy(n_buckets, key).sortBy(key)
                    .saveAsTable(f"{database}.{table}")
                )
            finally:
                pending.unpersist()
    finally:
        grams.unpersist()

    dim = spark.table(f"{database}.digest_dim")
    digests = (
        batch_docs.join(dim.select("doc_id"), "doc_id", "left_anti")
        .select("doc_id", content_digest().alias("content_md5"))
        .cache()
    )
    try:
        n_dig = digests.count()
        (
            digests.write.mode("append").format("parquet")
            .bucketBy(n_buckets, "content_md5").sortBy("content_md5")
            .saveAsTable(f"{database}.digest_dim")
        )
    finally:
        digests.unpersist()
    return {"shingle_rows": counts["shingle_raw"],
            "shingle_inv_rows": counts["shingle_inv"],
            "digest_rows": n_dig}


def index_store_health(spark: SparkSession, database: str) -> DataFrame:
    """(metric, value) health signals read from THIS persisted store —
    the operational twin of the registered ``ann_index_health`` query
    (which audits the fixture split from the corpus; this reads the
    actual on-disk index, however many batches have been appended).

    Signals: ``n_lists`` / ``n_vectors``, list occupancy
    (``list_size_max`` / ``list_size_p99`` / ``list_size_mean``),
    the √n sizing rule (``target_list_size`` = √n_vectors,
    ``max_over_target`` / ``p99_over_target``), and
    ``sq_at_rail_rate`` — the fraction of persisted codes sitting at
    0 or SQ_LEVELS.  At-rail is a proxy, not the exact clamp count
    (a value exactly AT a frozen bound legitimately codes to the
    rail); the exact per-batch count is ``extend_index_store``'s
    ``clamped_codes`` return.  Retrain (``write_index_store``) when
    ``max_over_target`` or the rail rate drifts well above its
    build-time level.

    Cost: one count-per-cid over the cid-bucketed lists (no shuffle —
    the scan is hash-clustered), a ≤4096-row ranking window, and one
    narrow scan of the code table."""
    from astra_perseverance_spark.extensions.similarity import (
        occupancy_stats,
    )
    from astra_perseverance_spark.extensions.training import SQ_LEVELS

    lists = spark.table(f"{database}.ann_ivf_lists")
    cent = spark.table(f"{database}.ann_centroids")
    # the SAME occupancy arithmetic as the registered audit — one
    # definition, the two cannot drift
    stats = occupancy_stats(cent, lists.select("cid"))
    rails = spark.table(f"{database}.ann_sq_store").select(
        F.aggregate(
            F.transform(
                "codes",
                lambda c: F.when(
                    (c == 0) | (c == SQ_LEVELS), F.lit(1).cast("long")
                ).otherwise(F.lit(0).cast("long")),
            ),
            F.lit(0).cast("long"),
            lambda acc, y: acc + y,
        ).alias("nr"),
        F.size("codes").cast("long").alias("nd"),
    ).agg(
        # coalesce: an empty code table (a store built before any
        # vectors were coded) must report rate 0.0, not a NULL row
        F.coalesce(F.sum("nr"), F.lit(0)).cast("long").alias("at_rail"),
        F.coalesce(F.sum("nd"), F.lit(0)).cast("long").alias("n_codes"),
    )
    return (
        stats.crossJoin(F.broadcast(rails))
        .selectExpr(
            "stack(9, "
            "'list_size_max', CAST(mx AS DOUBLE), "
            "'list_size_mean', CAST(n_total AS DOUBLE) / n_lists, "
            "'list_size_p99', CAST(p99 AS DOUBLE), "
            "'max_over_target', mx / SQRT(CAST(n_total AS DOUBLE)), "
            "'n_lists', CAST(n_lists AS DOUBLE), "
            "'n_vectors', CAST(n_total AS DOUBLE), "
            "'p99_over_target', p99 / SQRT(CAST(n_total AS DOUBLE)), "
            "'sq_at_rail_rate', CASE WHEN n_codes > 0 "
            "THEN CAST(at_rail AS DOUBLE) / n_codes ELSE 0.0D END, "
            "'target_list_size', SQRT(CAST(n_total AS DOUBLE))"
            ") as (metric, value)"
        )
        .orderBy("metric")
    )


def register_index_store(spark: SparkSession, database: str,
                         location: str,
                         n_buckets: int = DEFAULT_BUCKETS) -> None:
    """Re-attach an on-disk index store to a FRESH application.

    With a real metastore this is unnecessary — the tables never left
    the catalog.  Spark's default in-memory catalog forgets table
    metadata at ``spark.stop()``, so a new application re-registers
    each table as an external table over the written files, declaring
    the same bucketing (``CLUSTERED BY ... INTO n BUCKETS``) so the
    scan stays hash-clustered: Spark resolves a file's bucket id from
    its ``_NNNNN`` filename component, which ``saveAsTable`` wrote, so
    re-registered buckets prune and co-locate exactly like the
    originals.  ``n_buckets`` must match the write (it is catalog
    metadata, not derivable from the files — a metastore would have
    remembered it).  Schemas are inferred from the parquet footers,
    never guessed (``warehouse.register_external_bucketed``, shared
    with the bucketed-corpus re-registration).

    The database is created WITHOUT ``LOCATION`` — the tables are
    external over the store's own paths, and an in-memory-catalog
    ``DROP DATABASE`` deletes the database directory, so anchoring it
    at ``location`` would let a drop destroy the persisted index.

    MIGRATION: a store written before ``shingle_inv`` existed (the
    inverted orientation landed after ``shingle_raw``) has every
    table except it — that is an upgrade condition, not corruption,
    so instead of failing, the missing orientation is BACKFILLED
    here: one gram-bucketed rewrite of ``shingle_raw``'s rows into
    ``location/shingle_inv`` (the same rows, the read-path layout),
    after which the store is indistinguishable from a fresh build
    and later registrations take the normal path.  Only
    ``shingle_inv`` gets this treatment — any other missing table
    means an interrupted ``write_index_store`` and still fails."""
    from astra_perseverance_spark.sinks.warehouse import (
        register_external_bucketed,
    )

    import shutil

    spark.sql(f"CREATE DATABASE IF NOT EXISTS {database}")
    for name, key in _LAYOUT.items():
        path = os.path.join(location, name)
        if not os.path.isdir(path):
            raw = os.path.join(location, "shingle_raw")
            if name == "shingle_inv" and os.path.isdir(raw):
                # pre-upgrade store: derive the inverted orientation
                # from the forward one.  INTERRUPTION-SAFE: the
                # bucketed write lands in a hidden sibling temp dir
                # (bucketBy requires saveAsTable, so a throwaway
                # catalog entry carries the write; external — the
                # drop keeps the files) and a same-filesystem rename
                # publishes it — a crash mid-backfill leaves only the
                # temp, so the next registration re-derives instead
                # of silently registering a partial table under the
                # final name
                tmp = os.path.join(location, ".shingle_inv.backfill")
                shutil.rmtree(tmp, ignore_errors=True)
                tmp_table = f"{database}.shingle_inv__backfill"
                spark.sql(f"DROP TABLE IF EXISTS {tmp_table}")
                (
                    spark.read.parquet(raw)
                    .select("doc_id", "lang", "g")
                    .write.format("parquet")
                    .bucketBy(n_buckets, key).sortBy(key)
                    .option("path", tmp)
                    .saveAsTable(tmp_table)
                )
                spark.sql(f"DROP TABLE {tmp_table}")
                os.rename(tmp, path)
                # fall through to the normal registration below
            else:
                raise ValueError(
                    f"index store at {location} has no {name} table — "
                    f"was write_index_store interrupted?")
        register_external_bucketed(
            spark, database, name, path, key,
            (key,) if key else (), n_buckets)
