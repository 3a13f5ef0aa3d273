"""Durable index-store gates (round-11): the incremental-serving
artifacts must be literally persistent — built once, written as
tables, and probed by the four incremental queries with output
hash-identical to the session-memo path.

The heavyweight stop-the-application proof lives in
``tools/index_store_roundtrip.py`` (run here as a subprocess so the
pytest-shared session survives); the in-process tests cover value
identity per query, the sq code/decode lockstep contract, and that the
load path actually engages (a silent fallback to the memo build would
pass every value test while persisting nothing).
"""

from __future__ import annotations

import contextlib
import io
import os
import subprocess
import sys

import pytest

from tests.conftest import SF_SMALL

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DATABASE = "idxstore_t"

INCREMENTAL_QUERIES = (
    "ann_incremental",
    "ann_incremental_pq",
    "dedup_incremental",
    "split_assign_incremental",
    # the drift audits read the persisted lists / raw postings under
    # the toggle; their default paths compute the same frames from
    # the corpus — the two must agree row-for-row
    "ann_index_health",
    "postings_health",
    # the TRAINED-IVF serving family reads the persisted Lloyd
    # quantizer + lists instead of re-training per application
    "ann_ivf_kmeans",
    "ann_recall_ivf_kmeans",
    "ann_ivf_pq",
    "ann_recall_ivf_pq",
    "semdedup",
    "cluster_purity",
)


@pytest.fixture(scope="module")
def index_store(spark, tmp_path_factory):
    from astra_perseverance_spark.sinks.index_store import write_index_store

    loc = tmp_path_factory.mktemp("idxstore")
    tables = write_index_store(spark, SF_SMALL, DATABASE, str(loc))
    yield tables
    for t in tables.values():
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    spark.sql(f"DROP DATABASE IF EXISTS {DATABASE}")


@pytest.fixture()
def store_env(index_store, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_INDEX_DB", DATABASE)


def _rows(df) -> list[tuple]:
    return [tuple(r) for r in df.collect()]


@pytest.mark.parametrize("name", INCREMENTAL_QUERIES)
def test_store_path_output_identical(spark, index_store, monkeypatch, name):
    """Each incremental query's output over the persisted tables is
    row-identical (values AND order) to the session-memo build."""
    from astra_perseverance_spark.queries import QUERY_REGISTRY

    monkeypatch.delenv("SPARK_GRAFT_INDEX_DB", raising=False)
    expected = _rows(QUERY_REGISTRY[name](spark, SF_SMALL))
    monkeypatch.setenv("SPARK_GRAFT_INDEX_DB", DATABASE)
    actual = _rows(QUERY_REGISTRY[name](spark, SF_SMALL))
    assert actual == expected
    assert expected, f"{name} returned no rows — vacuous comparison"


def test_load_path_engages(spark, store_env):
    """With the toggle set the query plan must SCAN the persisted
    tables — a silent fallback to the memo build would pass the value
    tests while persisting nothing."""
    from astra_perseverance_spark.extensions.similarity import (
        q_ann_incremental_pq,
    )

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        q_ann_incremental_pq(spark, SF_SMALL).explain("formatted")
    plan = buf.getvalue()
    assert "ann_ivf_lists" in plan, plan
    assert "ann_sq_store" in plan, plan

    from astra_perseverance_spark.extensions.similarity import (
        q_ann_ivf_kmeans,
    )

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        q_ann_ivf_kmeans(spark, SF_SMALL).explain("formatted")
    plan = buf.getvalue()
    assert "kmeans_lists" in plan, plan


def test_store_capped_read_single_exchange(spark, index_store, monkeypatch):
    """The r13 read-path contract: the capped-universe recompute over
    the persisted postings runs over the INVERTED (gram-bucketed)
    orientation, so the df window's (lang, g) distribution is already
    satisfied by the scan and the whole read plans exactly ONE
    exchange — the surviving postings to doc grain for ``n`` —
    instead of re-shuffling the full table twice per application."""
    from astra_perseverance_spark.extensions.dedup import (
        cap_postings,
        capped_shingle_rows,
    )

    from pyspark.sql import functions as F

    monkeypatch.setenv("SPARK_GRAFT_INDEX_DB", DATABASE)
    # the no-op filter keeps the plan canonically distinct from the
    # session-memoized universe frame, so the CacheManager cannot
    # substitute an InMemoryTableScan and hide the exchange structure
    plan = (
        cap_postings(spark.table(f"{DATABASE}.shingle_inv")
                     .filter(F.col("doc_id") != -1))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange") == 1, plan
    assert "Bucketed: true" in plan, plan
    # and the store-mode universe frame actually reads that table
    logical = (
        capped_shingle_rows(spark, SF_SMALL)
        ._jdf.queryExecution().analyzed().toString()
    )
    assert "shingle_inv" in logical, logical


def test_sq_code_decode_matches_fused_recon(spark, index_store, monkeypatch):
    """decode∘code over the persisted int8 codes reproduces the fused
    ``sq_recon`` store bit-for-bit — the lockstep contract that lets
    ``sq_code``/``sq_decode`` exist as separate halves."""
    from astra_perseverance_spark.extensions.similarity import (
        _recon_even_store,
    )

    monkeypatch.delenv("SPARK_GRAFT_INDEX_DB", raising=False)
    fused = _rows(_recon_even_store(spark, SF_SMALL).orderBy("vec_id"))
    monkeypatch.setenv("SPARK_GRAFT_INDEX_DB", DATABASE)
    split = _rows(_recon_even_store(spark, SF_SMALL).orderBy("vec_id"))
    assert split == fused
    assert fused


def test_sq_decode_wide_span_is_bigint_safe(spark):
    """Regression (round-11 review, CONFIRMED overflow): the decode
    half multiplies the SMALLINT code by the span, and with INT
    bounds literals a span > ⌊2³¹/255⌋ made that multiply 32-bit —
    ANSI mode crashes, non-ANSI silently diverges from sq_recon.
    The cast keeps it BIGINT; decode∘code must equal the fused recon
    on a deliberately wide dimension."""
    from pyspark.sql import functions as F

    from astra_perseverance_spark.extensions.training import (
        bounds_accessors,
        sq_code,
        sq_decode,
        sq_recon,
    )

    la, ha = bounds_accessors([-10_000_000], [10_000_000])  # span 2e7
    df = spark.createDataFrame(
        [([9_999_999],)], "eq array<bigint>")
    code = sq_code(la, ha)
    enc = df.select(F.transform(
        "eq", lambda x, i: code(x, i).cast("smallint")).alias("codes"))
    got = enc.select(
        F.transform("codes", sq_decode(la, ha)).alias("rq")
    ).collect()[0][0]
    want = df.select(
        F.transform("eq", sq_recon(la, ha)).alias("rq")
    ).collect()[0][0]
    assert got == want


def test_store_codes_are_int8_sized(spark, index_store):
    """The persisted store holds SMALLINT codes in [0, 255] — the 4x
    compression is real, not BIGINT vectors under another name."""
    from pyspark.sql import functions as F

    store = spark.table(f"{DATABASE}.ann_sq_store")
    assert dict(store.dtypes)["codes"] == "array<smallint>"
    bad = store.filter(
        F.exists("codes", lambda c: (c < 0) | (c > 255))
    ).count()
    assert bad == 0


def test_default_path_untouched_by_module(spark, index_store, monkeypatch):
    """With the env unset the incremental queries must not reference
    the store tables anywhere in their plans (the branch binds at plan
    build; default plans stay bit-identical to the memo-only code)."""
    from astra_perseverance_spark.extensions.similarity import (
        q_ann_incremental,
    )

    monkeypatch.delenv("SPARK_GRAFT_INDEX_DB", raising=False)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        q_ann_incremental(spark, SF_SMALL).explain("formatted")
    assert "ann_ivf_lists" not in buf.getvalue()


def test_extend_index_store_appends_batch(spark, tmp_path_factory,
                                          monkeypatch):
    """IVF append: a new batch folds into the persisted index with
    batch-sized work — every batch vector lands in exactly one list
    under the probe path's own affinity rule, the int8 codes append
    with the FROZEN bounds (saturating, never widening), and the
    bucketed tables stay append-readable."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from astra_perseverance_spark.extensions.corpus import vectors_frame
    from astra_perseverance_spark.functions.vectors import cosine, dot_q
    from astra_perseverance_spark.sinks.index_store import (
        extend_index_store,
        write_index_store,
    )

    monkeypatch.delenv("SPARK_GRAFT_INDEX_DB", raising=False)
    db = "idxstore_ext"
    loc = tmp_path_factory.mktemp("idxstore_ext")
    tables = write_index_store(spark, SF_SMALL, db, str(loc))
    try:
        batch = (vectors_frame(spark, SF_SMALL).drop("bucket")
                 .filter(F.col("vec_id") % 2 == 1))
        n_old = spark.table(f"{db}.ann_ivf_lists").count()
        n_batch = batch.count()
        res = extend_index_store(spark, db, batch)
        assert res["ivf_rows"] == n_batch and res["sq_rows"] == n_batch
        # the per-batch clamp count must agree with the registered
        # audit's clamped_codes (same batch: the odd half under the
        # frozen even bounds — one definition of "clamped")
        from astra_perseverance_spark.extensions.similarity import (
            q_ann_index_health,
        )

        audit = {r["metric"]: r["value"]
                 for r in q_ann_index_health(spark, SF_SMALL).collect()}
        assert res["clamped_codes"] == int(audit["clamped_codes"])

        lists = spark.table(f"{db}.ann_ivf_lists")
        assert lists.count() == n_old + n_batch
        appended = lists.filter(F.col("vec_id") % 2 == 1)
        assert appended.count() == n_batch
        assert appended.select("vec_id").distinct().count() == n_batch

        # the store-facing health reader must agree with the
        # registered audit on every occupancy metric: after the
        # append the store's state IS the audit's fixture state
        # (even = indexed, odd = appended), and the assignment rule
        # is shared code
        from astra_perseverance_spark.sinks.index_store import (
            index_store_health,
        )

        health = {r["metric"]: r["value"]
                  for r in index_store_health(spark, db).collect()}
        for m in ("list_size_max", "list_size_p99", "list_size_mean",
                  "max_over_target", "p99_over_target", "n_lists",
                  "target_list_size"):
            assert health[m] == audit[m], m
        assert health["n_vectors"] == audit["n_indexed"] + audit["n_appended"]
        assert 0.0 <= health["sq_at_rail_rate"] <= 1.0
        # every saturated (clamped) code sits AT a rail, and each of
        # the even corpus's 64 per-dimension min/max pairs coded to a
        # rail too — at-rail strictly dominates the clamp count
        assert round(health["sq_at_rail_rate"]
                     * health["n_vectors"] * 64) >= audit["clamped_codes"]

        # the registered audit run AGAINST the extended store must
        # report the same post-append state as the default-path
        # audit — the anti-join guard means an already-appended odd
        # half is never double-counted
        monkeypatch.setenv("SPARK_GRAFT_INDEX_DB", db)
        store_audit = {r["metric"]: r["value"]
                       for r in q_ann_index_health(spark, SF_SMALL)
                       .collect()}
        assert store_audit == audit
        monkeypatch.delenv("SPARK_GRAFT_INDEX_DB", raising=False)

        # assignment optimality, recomputed independently: the stored
        # cid must be each vector's (cosine DESC, cid ASC) argmax over
        # the persisted centroid set
        cent = spark.table(f"{db}.ann_centroids")
        aff = batch.join(F.broadcast(cent)).select(
            "vec_id", "cid",
            cosine(dot_q(F.col("eq"), F.col("c_eq")), F.col("n2"),
                   F.col("c_n2")).alias("ccos"),
        )
        w = Window.partitionBy("vec_id").orderBy(F.desc("ccos"), "cid")
        want = dict(
            aff.withColumn("r", F.row_number().over(w))
            .filter(F.col("r") == 1).select("vec_id", "cid").collect())
        got = dict(appended.select("vec_id", "cid").collect())
        assert got == want

        # frozen-bounds codes: smallint, saturated to [0, 255]
        store = spark.table(f"{db}.ann_sq_store")
        assert store.count() == n_old + n_batch
        assert dict(store.dtypes)["codes"] == "array<smallint>"
        bad = store.filter(
            F.exists("codes", lambda c: (c < 0) | (c > 255))).count()
        assert bad == 0
    finally:
        for t in tables.values():
            spark.sql(f"DROP TABLE IF EXISTS {t}")
        spark.sql(f"DROP DATABASE IF EXISTS {db}")


def test_register_backfills_missing_shingle_inv(spark, index_store,
                                                tmp_path_factory,
                                                monkeypatch):
    """A store written before the inverted orientation existed (no
    shingle_inv directory — the pre-upgrade layout) is an UPGRADE
    condition, not corruption: register_index_store backfills
    shingle_inv from shingle_raw's rows (one gram-bucketed rewrite)
    and the store then serves the read path exactly like a fresh
    build.  Any OTHER missing table still means an interrupted
    write_index_store and fails."""
    import shutil

    from astra_perseverance_spark.queries import QUERY_REGISTRY
    from astra_perseverance_spark.sinks.index_store import (
        register_index_store,
    )

    monkeypatch.delenv("SPARK_GRAFT_INDEX_DB", raising=False)
    # the module store's on-disk location, via the catalog
    loc_rows = [r for r in spark.sql(
        f"DESCRIBE FORMATTED {DATABASE}.shingle_raw").collect()
        if r["col_name"] == "Location"]
    src = os.path.dirname(
        loc_rows[0]["data_type"].removeprefix("file:"))
    store = str(tmp_path_factory.mktemp("pre_upgrade") / "store")
    shutil.copytree(src, store)
    shutil.rmtree(os.path.join(store, "shingle_inv"))

    # a crashed earlier backfill left a partial hidden temp dir — the
    # interruption-safe path must discard it and re-derive, never
    # registering partial files under the final name
    stale = os.path.join(store, ".shingle_inv.backfill")
    os.makedirs(stale)
    open(os.path.join(stale, "garbage"), "w").write("x")

    db = "idxstore_upgrade"
    try:
        register_index_store(spark, db, store)
        assert os.path.isdir(os.path.join(store, "shingle_inv"))
        assert not os.path.isdir(stale), "backfill temp not cleaned up"
        assert not spark.catalog.tableExists(
            f"{db}.shingle_inv__backfill"), "throwaway table leaked"
        raw = _rows(spark.table(f"{db}.shingle_raw")
                    .select("doc_id", "lang", "g"))
        inv = _rows(spark.table(f"{db}.shingle_inv")
                    .select("doc_id", "lang", "g"))
        assert sorted(inv) == sorted(raw) and raw
        # the backfilled store serves the capped read path with
        # output identical to the memo build — the whole point of
        # the inverted orientation
        expected = _rows(QUERY_REGISTRY["dedup_incremental"](
            spark, SF_SMALL))
        monkeypatch.setenv("SPARK_GRAFT_INDEX_DB", db)
        assert _rows(QUERY_REGISTRY["dedup_incremental"](
            spark, SF_SMALL)) == expected
        monkeypatch.delenv("SPARK_GRAFT_INDEX_DB")
        # a later fresh registration takes the normal path over the
        # backfilled files (saveAsTable wrote an EXTERNAL table, so
        # dropping the catalog entry keeps the files)
        for name in (f"{db}.shingle_inv", f"{db}.shingle_raw"):
            spark.sql(f"DROP TABLE {name}")
        register_index_store(spark, db, store)
        assert sorted(_rows(spark.table(f"{db}.shingle_inv")
                            .select("doc_id", "lang", "g"))) \
            == sorted(raw)
        # any other missing table is still an interrupted write
        shutil.rmtree(os.path.join(store, "digest_dim"))
        with pytest.raises(ValueError, match="digest_dim"):
            register_index_store(spark, "idxstore_upgrade2", store)
    finally:
        monkeypatch.delenv("SPARK_GRAFT_INDEX_DB", raising=False)
        for d in (db, "idxstore_upgrade2"):
            spark.sql(f"DROP DATABASE IF EXISTS {d} CASCADE")


def test_extend_postings_matches_full_rebuild(spark, tmp_path_factory,
                                              monkeypatch):
    """Text-artifact append: folding a document batch into the
    persisted raw postings must leave the CAPPED universe (the frame
    every near-dup consumer reads) identical to a from-scratch build
    over corpus ∪ batch — including the eviction property the r11
    capped representation could not provide: a batch that pushes a
    shingle's df past the cap evicts it for EVERY doc, old and new,
    with no stale-df window.  The digest dim must likewise see the
    batch as existing corpus."""
    from pyspark.sql import functions as F

    from astra_perseverance_spark.extensions.corpus import docs_frame
    from astra_perseverance_spark.extensions.dedup import (
        NGRAM_DF_CAP,
        cap_postings,
        k_gram_rows_of,
    )
    from astra_perseverance_spark.sinks.index_store import (
        extend_postings,
        write_index_store,
    )

    monkeypatch.delenv("SPARK_GRAFT_INDEX_DB", raising=False)
    db = "idxstore_post"
    loc = tmp_path_factory.mktemp("idxstore_post")
    tables = write_index_store(spark, SF_SMALL, db, str(loc))
    try:
        docs = docs_frame(spark, SF_SMALL).select("doc_id", "lang", "text")
        # batch: one genuinely new doc, plus NGRAM_DF_CAP+1 new copies
        # of an existing doc's text — enough on their own to push every
        # shingle of that text past the cap
        donor = docs.orderBy("doc_id").limit(1).collect()[0]
        base = 10_000_000
        copies = [(base + i, donor["lang"], donor["text"])
                  for i in range(NGRAM_DF_CAP + 1)]
        fresh = [(base - 1, "en",
                  "wholly new text that appears nowhere else in the "
                  "corpus and is long enough to shingle")]
        batch = spark.createDataFrame(
            copies + fresh, "doc_id long, lang string, text string")

        res = extend_postings(spark, db, batch)
        assert res["digest_rows"] == NGRAM_DF_CAP + 2
        assert res["shingle_rows"] > 0
        # both orientations report their own appended count (equal on
        # a clean append; they diverge only on a partial-crash replay)
        assert res["shingle_inv_rows"] == res["shingle_rows"]

        # the two postings orientations must hold the SAME row set
        # after the append — shingle_inv (gram-bucketed, the read
        # path) and shingle_raw (doc-bucketed, the append/audit path)
        # are two layouts of one logical table
        raw_rows = set(_rows(spark.table(f"{db}.shingle_raw")))
        inv_rows = set(_rows(spark.table(f"{db}.shingle_inv")))
        assert inv_rows == raw_rows

        # retry safety: the table appends are not atomic together,
        # so a replay of the same batch (the crash-recovery path) must
        # append NOTHING — duplicated postings would double df and
        # falsely evict legitimate shingles
        n_raw = spark.table(f"{db}.shingle_raw").count()
        n_dim = spark.table(f"{db}.digest_dim").count()
        replay = extend_postings(spark, db, batch)
        assert replay == {"shingle_rows": 0, "shingle_inv_rows": 0,
                          "digest_rows": 0}
        assert spark.table(f"{db}.shingle_raw").count() == n_raw
        assert spark.table(f"{db}.shingle_inv").count() == n_raw
        assert spark.table(f"{db}.digest_dim").count() == n_dim

        # expected: the one shared cap definition applied to a
        # from-scratch gram build over corpus ∪ batch
        expected = cap_postings(
            k_gram_rows_of(docs.unionByName(batch), 3).distinct())
        monkeypatch.setenv("SPARK_GRAFT_INDEX_DB", db)
        from astra_perseverance_spark.extensions.dedup import (
            capped_shingle_rows,
        )

        got = capped_shingle_rows(spark, SF_SMALL)
        assert set(_rows(got)) == set(_rows(expected))

        # eviction: the donor text's shingles are now over-cap, so
        # they are gone for the ORIGINAL doc too
        donor_shingles = set(
            r["g"] for r in k_gram_rows_of(
                spark.createDataFrame(
                    [(donor["doc_id"], donor["lang"], donor["text"])],
                    "doc_id long, lang string, text string"), 3)
            .distinct().collect())
        if donor_shingles:
            survivors = got.filter(
                (F.col("doc_id") == donor["doc_id"])
                & F.col("g").isin(list(donor_shingles)))
            assert survivors.count() == 0

        # digest dim: the batch is existing corpus for the NEXT probe
        dig = spark.table(f"{db}.digest_dim")
        assert dig.filter(F.col("doc_id") >= base - 1).count() \
            == NGRAM_DF_CAP + 2
    finally:
        monkeypatch.delenv("SPARK_GRAFT_INDEX_DB", raising=False)
        for t in tables.values():
            spark.sql(f"DROP TABLE IF EXISTS {t}")
        spark.sql(f"DROP DATABASE IF EXISTS {db}")


def test_e2e_shards_to_incremental_splits(spark, tmp_path_factory,
                                          monkeypatch):
    """The full production loop, composed end to end: wave-1 tar
    shards → exactly-once streaming ingest → index-store build;
    wave-2 shards (new odd doc_ids: exact copies of existing docs +
    novel text) → the SAME streaming ingest appends them →
    ``extend_postings`` folds their text artifacts into the store.
    Then ``split_assign_incremental`` (anchor routing through the
    persisted ``even_components``) and ``dedup_incremental`` over the
    grown corpus must be row-identical on the store path and the
    memo path — the three round-11/12 features (ingest, store,
    append) are only tested pairwise without this."""
    import json as _json
    import shutil
    import tarfile

    from pyspark.sql import functions as F

    from astra_perseverance_spark.sinks.index_store import (
        extend_postings,
        write_index_store,
    )
    from astra_perseverance_spark.sources.webdataset import (
        add_sample,
        stream_ingest_webdataset_corpus,
    )

    monkeypatch.delenv("SPARK_GRAFT_INDEX_DB", raising=False)
    root = tmp_path_factory.mktemp("e2e_loop")
    landing = root / "landing"
    landing.mkdir()
    corpus = str(root / "corpus")

    def land(name, rows):
        with tarfile.open(landing / name, "w") as tf:
            for doc_id, text, lang, source in rows:
                add_sample(tf, doc_id, [
                    (".txt", text.encode()),
                    (".json", _json.dumps(
                        {"doc_id": doc_id, "lang": lang,
                         "source": source}).encode()),
                ])

    # wave 1: the sf0.001 corpus as tar shards (mixed parity — its
    # even half becomes the store's anchor corpus)
    base_docs = spark.read.parquet(
        f"{SF_SMALL}/documents.parquet").select(
        "doc_id", "text", "lang", "source").collect()
    land("shard-000000.tar",
         [(r["doc_id"], r["text"], r["lang"], r["source"])
          for r in base_docs])
    assert stream_ingest_webdataset_corpus(
        spark, str(landing), corpus) == corpus
    # the ANN artifacts need the embeddings table next to the docs
    shutil.copy(f"{SF_SMALL}/embeddings.parquet",
                os.path.join(corpus, "embeddings.parquet"))

    db = "idxstore_e2e"
    loc = root / "store"
    tables = write_index_store(spark, corpus, db, str(loc))
    try:
        # wave 2: new odd doc_ids — two exact copies of existing EVEN
        # docs (must inherit their anchors' split) and one novel doc
        donors = [r for r in base_docs if r["doc_id"] % 2 == 0][:2]
        nxt = max(r["doc_id"] for r in base_docs) + 1
        wave2 = []
        for i, d in enumerate(donors):
            oid = nxt + 2 * i + (1 - nxt % 2)  # force odd
            wave2.append((oid, d["text"], d["lang"], d["source"]))
        wave2.append((wave2[-1][0] + 2,
                      "a wholly novel document that matches nothing "
                      "in the existing corpus at all", "en", "crawl"))
        assert all(i % 2 == 1 for i, *_ in wave2)
        land("shard-000001.tar", wave2)
        assert stream_ingest_webdataset_corpus(
            spark, str(landing), corpus) == corpus
        got_ids = set(
            r["doc_id"] for r in spark.read.parquet(
                os.path.join(corpus, "documents.parquet"))
            .select("doc_id").collect())
        assert got_ids == set(r["doc_id"] for r in base_docs) | set(
            i for i, *_ in wave2), "exactly-once append failed"

        # fold the batch in, the way the CLI does: new docs = those
        # the persisted digest dim has never seen
        docs = spark.read.parquet(os.path.join(corpus,
                                               "documents.parquet"))
        known = spark.table(f"{db}.digest_dim").select("doc_id")
        batch = docs.join(known, "doc_id", "left_anti")
        res = extend_postings(spark, db, batch)
        assert res["digest_rows"] == len(wave2)

        # the session memos captured the WAVE-1 corpus (the memo model
        # binds a session to one corpus state); drop them so both
        # paths below see the grown corpus, as a fresh application
        # would
        from astra_perseverance_spark.conformed.model import (
            release_memos,
        )

        release_memos(spark)

        from astra_perseverance_spark.queries import QUERY_REGISTRY

        for name in ("dedup_incremental", "split_assign_incremental"):
            monkeypatch.delenv("SPARK_GRAFT_INDEX_DB", raising=False)
            expected = _rows(QUERY_REGISTRY[name](spark, corpus))
            monkeypatch.setenv("SPARK_GRAFT_INDEX_DB", db)
            actual = _rows(QUERY_REGISTRY[name](spark, corpus))
            assert actual == expected, name
            assert expected, f"{name} vacuous"

        # non-vacuous anchor routing: the exact-copy wave-2 docs got
        # a non-null anchor and inherited its split
        monkeypatch.setenv("SPARK_GRAFT_INDEX_DB", db)
        splits = QUERY_REGISTRY["split_assign_incremental"](
            spark, corpus)
        copies = [i for i, *_ in wave2[:-1]]
        anchored = splits.filter(
            F.col("doc_id").isin(copies)
            & F.col("anchor_doc").isNotNull())
        assert anchored.count() == len(copies)
    finally:
        monkeypatch.delenv("SPARK_GRAFT_INDEX_DB", raising=False)
        for t in tables.values():
            spark.sql(f"DROP TABLE IF EXISTS {t}")
        spark.sql(f"DROP DATABASE IF EXISTS {db}")


def test_cross_application_roundtrip():
    """The verdict's done-criterion: build the store in one Spark
    application, STOP it, probe from a fresh application, get
    hash-identical output.  Subprocess so the stop cannot disturb the
    shared pytest session."""
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools",
                                      "index_store_roundtrip.py"),
         SF_SMALL],
        capture_output=True, text=True, timeout=600, cwd=REPO,
        env={**os.environ, "SPARK_GRAFT_CPUS": "8"},
    )
    assert proc.returncode == 0, proc.stdout[-3000:] + proc.stderr[-3000:]
    assert "ROUNDTRIP OK" in proc.stdout
