"""The first-class ``webdataset`` data source (Python Data Source
API): read planning, writer commit protocol, cross-compatibility with
the binaryFile reader and the export sink, and the streaming tar
ingest.

The compatibility tests are the drift gate for the shared format core
(``sources/webdataset.py``): every pairing of {data-source writer,
export sink} × {data-source reader, binaryFile reader} must read the
same corpus back.
"""

from __future__ import annotations

import glob
import os
import tarfile

import pytest

ROWS = [
    (1, "alpha doc", "en", "web"),
    (2, "beta\ndoc — multiline", "de", "books"),
    (3, "", "und", "web"),          # empty text is a legal document
    (42, "gamma", "fr", "code"),
    (10**10, "delta big id", "en", "web"),
]


def _docs_df(spark, rows=ROWS):
    return spark.createDataFrame(
        [(i, t, lg, src, len(t)) for i, t, lg, src in rows],
        "doc_id long, text string, lang string, source string, "
        "n_chars long")


def _rows(df):
    return {tuple(r) for r in
            df.select("doc_id", "text", "lang", "source", "n_chars")
            .collect()}


@pytest.fixture()
def wds(spark):
    from astra_perseverance_spark.sources.webdataset_source import (
        register_webdataset,
    )

    register_webdataset(spark)
    return spark


class TestRead:
    def test_reads_export_sink_shards(self, wds, tmp_path):
        from astra_perseverance_spark.sinks.export import export_webdataset

        docs = _docs_df(wds)
        out = export_webdataset(wds, sf_dir="<unused>",
                                out_dir=str(tmp_path), shard_docs=2,
                                docs=docs)
        got = wds.read.format("webdataset").load(out["shards_path"])
        assert _rows(got) == _rows(docs)

    def test_one_partition_per_shard(self, wds, tmp_path):
        from astra_perseverance_spark.sinks.export import export_webdataset

        out = export_webdataset(wds, sf_dir="<unused>",
                                out_dir=str(tmp_path), shard_docs=1,
                                docs=_docs_df(wds))
        n_shards = len(glob.glob(
            os.path.join(out["shards_path"], "*.tar")))
        df = wds.read.format("webdataset").load(out["shards_path"])
        # hash sharding may leave some of the ceil(n/shard_docs) slots
        # empty; the planning contract is one partition per tar FILE
        assert n_shards > 1
        assert df.rdd.getNumPartitions() == n_shards

    def test_matches_binaryfile_reader(self, wds, tmp_path):
        from astra_perseverance_spark.sinks.export import export_webdataset
        from astra_perseverance_spark.sources.webdataset import (
            read_webdataset,
        )

        out = export_webdataset(wds, sf_dir="<unused>",
                                out_dir=str(tmp_path), shard_docs=2,
                                docs=_docs_df(wds))
        a = wds.read.format("webdataset").load(out["shards_path"])
        b = read_webdataset(wds, out["shards_path"])
        assert _rows(a) == _rows(b)

    def test_empty_dir_raises(self, wds, tmp_path):
        with pytest.raises(Exception, match="no .*shards"):
            wds.read.format("webdataset").load(str(tmp_path)).collect()

    def test_uri_path_rejected(self, wds):
        with pytest.raises(Exception, match="POSIX"):
            wds.read.format("webdataset").load("s3a://bucket/x").collect()


class TestWrite:
    def test_roundtrip(self, wds, tmp_path):
        docs = _docs_df(wds)
        dest = str(tmp_path / "shards")
        (docs.write.format("webdataset").mode("overwrite")
             .option("shard_docs", "2").save(dest))
        assert _rows(wds.read.format("webdataset").load(dest)) == _rows(docs)
        # published names are the canonical layout; no temps left
        names = sorted(os.path.basename(p)
                       for p in glob.glob(os.path.join(dest, "*")))
        assert all(n.startswith("shard-") and n.endswith(".tar")
                   for n in names)
        assert not glob.glob(os.path.join(dest, ".part-*"))

    def test_read_back_by_binaryfile_reader(self, wds, tmp_path):
        from astra_perseverance_spark.sources.webdataset import (
            read_webdataset,
        )

        docs = _docs_df(wds)
        dest = str(tmp_path / "shards")
        docs.write.format("webdataset").mode("append").save(dest)
        assert _rows(read_webdataset(wds, dest)) == _rows(docs)

    def test_rolling_shard_docs(self, wds, tmp_path):
        dest = str(tmp_path / "shards")
        (_docs_df(wds).repartition(1).write.format("webdataset").mode("append")
            .option("shard_docs", "2").save(dest))
        # 5 docs in one task at 2 docs/shard -> 3 tars
        assert len(glob.glob(os.path.join(dest, "*.tar"))) == 3

    def test_append_numbers_after_existing(self, wds, tmp_path):
        dest = str(tmp_path / "shards")
        first = _docs_df(wds, ROWS[:3])
        second = _docs_df(wds, ROWS[3:])
        first.repartition(1).write.format("webdataset").mode("append").save(dest)
        n_first = len(glob.glob(os.path.join(dest, "*.tar")))
        (second.repartition(1).write.format("webdataset")
            .mode("append").save(dest))
        assert len(glob.glob(os.path.join(dest, "*.tar"))) > n_first
        assert _rows(wds.read.format("webdataset").load(dest)) == (
            _rows(first) | _rows(second))

    def test_overwrite_clears_stale_shards(self, wds, tmp_path):
        dest = str(tmp_path / "shards")
        (_docs_df(wds).repartition(4).write.format("webdataset").mode("append")
            .option("shard_docs", "1").save(dest))
        small = _docs_df(wds, ROWS[:1])
        (small.repartition(1).write.format("webdataset")
            .mode("overwrite").save(dest))
        assert _rows(wds.read.format("webdataset").load(dest)) == _rows(small)

    def test_null_text_rejected_and_nothing_published(self, wds, tmp_path):
        dest = str(tmp_path / "shards")
        bad = wds.createDataFrame(
            [(1, None, "en", "web", 0)],
            "doc_id long, text string, lang string, source string, "
            "n_chars long")
        with pytest.raises(Exception, match="NULL text"):
            bad.write.format("webdataset").mode("append").save(dest)
        # abort discarded the staged temp; no shard was published
        assert not glob.glob(os.path.join(dest, "*.tar"))
        assert not glob.glob(os.path.join(dest, ".part-*"))

    def test_uri_target_rejected(self, wds):
        with pytest.raises(Exception, match="POSIX|WONTFIX"):
            _docs_df(wds).write.format("webdataset").mode("append").save("s3a://b/x")

    def test_non_binary_extra_column_rejected(self, wds, tmp_path):
        docs = _docs_df(wds)
        bad = docs.withColumn("score", docs["doc_id"] * 2)
        with pytest.raises(Exception, match="must be binary"):
            bad.write.format("webdataset").mode("append").save(str(tmp_path / "s"))

    def test_glob_metachar_dir_appends_safely(self, wds, tmp_path):
        """A directory legitimately named like a character class must
        not be reinterpreted as a glob: append twice and read back the
        union (a mis-glob would renumber from 0 and clobber)."""
        dest = str(tmp_path / "run[1]" / "shards")
        first = _docs_df(wds, ROWS[:3])
        second = _docs_df(wds, ROWS[3:])
        first.repartition(1).write.format("webdataset").mode(
            "append").save(dest)
        second.repartition(1).write.format("webdataset").mode(
            "append").save(dest)
        got = wds.read.format("webdataset").load(dest)
        assert _rows(got) == _rows(first) | _rows(second)

    def test_wrong_doc_id_type_rejected(self, wds, tmp_path):
        bad = wds.createDataFrame(
            [(1.5, "a", "en", "web")],
            "doc_id double, text string, lang string, source string")
        with pytest.raises(Exception, match="doc_id.*double"):
            bad.write.format("webdataset").mode("append").save(
                str(tmp_path / "s"))

    def test_duplicate_doc_id_in_shard_rejected(self, wds, tmp_path):
        dup = wds.createDataFrame(
            [(7, "a", "en", "web"), (7, "b", "en", "web")],
            "doc_id long, text string, lang string, source string")
        with pytest.raises(Exception, match="duplicate doc_id"):
            (dup.repartition(1).write.format("webdataset")
                .mode("append").save(str(tmp_path / "s")))

    def test_concurrent_job_temps_survive(self, wds, tmp_path):
        """commit/abort clean only THIS job's staged temps — a
        concurrent writer's .inprogress files are untouched."""
        dest = tmp_path / "shards"
        dest.mkdir()
        foreign = dest / ".part-otherjob-00000-x-0000.inprogress"
        foreign.write_bytes(b"not ours")
        (_docs_df(wds).write.format("webdataset").mode("append")
            .save(str(dest)))
        assert foreign.exists()
        foreign.unlink()

    def test_deterministic_shard_bytes(self, wds, tmp_path):
        """Same sorted input -> byte-identical shards across runs (the
        export sink's reproducibility contract, kept by the writer)."""
        docs = _docs_df(wds).repartition(1).sortWithinPartitions("doc_id")
        a, b = str(tmp_path / "a"), str(tmp_path / "b")
        docs.write.format("webdataset").mode("append").save(a)
        docs.write.format("webdataset").mode("append").save(b)
        for pa_, pb_ in zip(sorted(glob.glob(os.path.join(a, "*.tar"))),
                            sorted(glob.glob(os.path.join(b, "*.tar")))):
            with open(pa_, "rb") as fa, open(pb_, "rb") as fb:
                assert fa.read() == fb.read()


class TestFilterPushdown:
    def _shards(self, wds, tmp_path):
        docs = wds.createDataFrame(
            [(1, "aa", "en", "web", 2), (2, "bb", "de", "web", 2),
             (3, "cc", "en", "books", 2), (4, "dd", "fr", "code", 2),
             (5, "ee", "en", "web", 2)],
            "doc_id long, text string, lang string, source string, "
            "n_chars long")
        dest = str(tmp_path / "shards")
        (docs.write.format("webdataset").mode("overwrite")
             .option("shard_docs", "2").save(dest))
        return docs, dest

    def test_pushed_filters_match_jvm_filtering(self, wds, tmp_path):
        from pyspark.sql import functions as F

        docs, dest = self._shards(wds, tmp_path)
        ds = wds.read.format("webdataset").load(dest)
        for cond in [
            F.col("lang") == "en",
            F.col("doc_id") > 2,
            (F.col("doc_id") >= 2) & (F.col("doc_id") < 5),
            F.col("source").isin("web", "code"),
            (F.col("lang") == "en") & (F.col("source") == "web"),
            F.col("text") > "bb",          # NOT pushed: Spark's job
            (F.col("lang") == "en") & (F.col("text") != "aa"),  # mixed
        ]:
            assert _rows(ds.filter(cond)) == _rows(docs.filter(cond)), (
                str(cond))

    def test_reader_consumes_supported_filters_only(self, tmp_path, wds):
        from pyspark.sql.datasource import EqualTo, In, IsNotNull
        from astra_perseverance_spark.sources.webdataset_source import (
            WebDatasetPushdownReader,
        )

        _, dest = self._shards(wds, tmp_path)
        r = WebDatasetPushdownReader({"path": dest})
        text_f = EqualTo(("text",), "aa")
        leftover = list(r.pushFilters([
            EqualTo(("lang",), "en"),
            In(("source",), ("web",)),
            IsNotNull(("doc_id",)),
            text_f,
        ]))
        # text predicate comes back; the rest are consumed
        assert leftover == [text_f]
        assert {(c, o) for c, o, _ in r._pushed} == {
            ("lang", "EqualTo"), ("source", "In")}
        got = [tuple(row)[:4]
               for part in r.partitions()
               for b in r.read(part)
               for row in zip(*[col.to_pylist() for col in b.columns])]
        assert {g[0] for g in got} == {1, 5}  # en AND web

    def test_register_without_pushdown_works_with_conf_off(
            self, wds, tmp_path):
        """pushdown=False registers the base reader and leaves the
        session conf alone — reads (with Spark-side filtering) must
        work in a session that keeps python filter pushdown off."""
        from astra_perseverance_spark.sources.webdataset_source import (
            register_webdataset,
        )

        docs, dest = self._shards(wds, tmp_path)
        conf = "spark.sql.python.filterPushdown.enabled"
        wds.conf.set(conf, "false")
        try:
            register_webdataset(wds, pushdown=False)
            got = wds.read.format("webdataset").load(dest).filter(
                "lang = 'en'")
            assert _rows(got) == _rows(docs.filter("lang = 'en'"))
            assert wds.conf.get(conf) == "false"  # untouched
        finally:
            # restore the default variant; set the conf first so the
            # re-register is not the warned explicit-false->true flip
            wds.conf.set(conf, "true")
            register_webdataset(wds)


class TestExtraMembers:
    def test_binary_columns_roundtrip(self, wds, tmp_path):
        docs = wds.createDataFrame(
            [(1, "a", "en", "web", b"\x00\x01"), (2, "b", "de", "web", None)],
            "doc_id long, text string, lang string, source string, "
            "payload binary")
        dest = str(tmp_path / "shards")
        docs.write.format("webdataset").mode("append").save(dest)
        got = (wds.read.format("webdataset")
               .option("extra_members", ".payload").load(dest))
        by_id = {r["doc_id"]: r for r in got.collect()}
        assert bytes(by_id[1]["payload"]) == b"\x00\x01"
        assert by_id[2]["payload"] is None
        # the legacy reader sees the same member
        from astra_perseverance_spark.sources.webdataset import (
            read_webdataset,
        )
        legacy = {r["doc_id"]: r for r in read_webdataset(
            wds, dest, extra_members=(".payload",)).collect()}
        assert bytes(legacy[1]["payload"]) == b"\x00\x01"


class TestStreamSink:
    """writeStream.format('webdataset'): per-batch atomic publish,
    exactly-once across drains and restarts."""

    def _drain(self, wds, landing, dest, cp):
        from astra_perseverance_spark.sources.corpus_jsonl import (
            stream_documents_jsonl,
        )

        q = (
            stream_documents_jsonl(wds, landing)
            .writeStream.format("webdataset")
            .option("path", dest)
            .option("checkpointLocation", cp)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    def test_batches_publish_exactly_once(self, wds, tmp_path):
        import json

        landing = tmp_path / "landing"
        landing.mkdir()
        dest, cp = str(tmp_path / "shards"), str(tmp_path / "cp")

        def land(name, rows):
            with open(landing / name, "w") as fh:
                for i, t, lg, src in rows:
                    fh.write(json.dumps(
                        {"doc_id": i, "text": t, "lang": lg,
                         "source": src}) + "\n")

        land("a.jsonl", ROWS[:2])
        self._drain(wds, str(landing), dest, cp)
        first = _rows(wds.read.format("webdataset").load(dest))
        assert first == _rows(_docs_df(wds, ROWS[:2]))

        # second landing -> only the new docs appear, batch-named
        land("b.jsonl", ROWS[2:])
        self._drain(wds, str(landing), dest, cp)
        got = _rows(wds.read.format("webdataset").load(dest))
        assert got == _rows(_docs_df(wds))
        names = sorted(os.path.basename(p)
                       for p in glob.glob(os.path.join(dest, "*.tar")))
        assert all(n.startswith("shard-b") for n in names)
        assert len({n.split("-")[1] for n in names}) == 2  # two batches

        # re-drain with nothing new: no-op (no temps, same shard set)
        self._drain(wds, str(landing), dest, cp)
        assert _rows(wds.read.format("webdataset").load(dest)) == got
        assert not glob.glob(os.path.join(dest, ".part-*"))

    def test_batch_replay_replaces_not_duplicates(self, wds, tmp_path):
        """A crashed-between-renames batch attempt leaves partial
        shards; the replay's commit must replace them, not add."""
        import json

        landing = tmp_path / "landing"
        landing.mkdir()
        dest, cp = str(tmp_path / "shards"), str(tmp_path / "cp")
        with open(landing / "a.jsonl", "w") as fh:
            fh.write(json.dumps(
                {"doc_id": 1, "text": "x", "lang": "en",
                 "source": "web"}) + "\n")
        # fake a partial publish of batch 0 from a previous attempt
        os.makedirs(dest, exist_ok=True)
        import tarfile as _tar
        with _tar.open(os.path.join(dest, "shard-b00000000-00007.tar"),
                       "w"):
            pass
        self._drain(wds, str(landing), dest, cp)
        names = sorted(os.path.basename(p)
                       for p in glob.glob(os.path.join(dest, "*.tar")))
        assert names == ["shard-b00000000-00000.tar"]
        assert _rows(wds.read.format("webdataset").load(dest)) == {
            (1, "x", "en", "web", 1)}

    def test_commit_side_instance_cleans_executor_temps(self, tmp_path):
        """Spark constructs a FRESH streamWriter for every commit/abort
        (separate from the executor-side instance that staged the
        temps), so the streaming job id must be deterministic: a
        second instance with the same options must see — and clean —
        the first instance's temps."""
        from astra_perseverance_spark.sources.webdataset_source import (
            WebDatasetStreamWriter,
        )
        from pyspark.sql.types import StructType

        schema = StructType.fromDDL("doc_id long, text string")
        opts = {"path": str(tmp_path / "s")}
        a = WebDatasetStreamWriter(opts, schema, overwrite=False)
        b = WebDatasetStreamWriter(opts, schema, overwrite=False)
        assert a._job == b._job
        staged = (tmp_path / "s"
                  / f".part-{a._job}-00000-attempt-0000.inprogress")
        staged.write_bytes(b"stale from a failed attempt")
        b.abort([], batchId=3)
        assert not staged.exists()

    def test_job_id_distinct_per_checkpoint(self, wds, tmp_path):
        """Two streaming queries aimed at the same directory have
        distinct checkpointLocations (Spark locks them) — their sink
        job ids must differ, so one query's temp sweep can never
        delete the other's staged files.  Same options (including the
        checkpoint) must still agree across instances — that is the
        commit-runner contract the test above pins."""
        from astra_perseverance_spark.sources.webdataset_source import (
            WebDatasetStreamWriter,
        )
        from pyspark.sql.types import StructType

        schema = StructType.fromDDL("doc_id long, text string")
        path = str(tmp_path / "s")
        a = WebDatasetStreamWriter(
            {"path": path, "checkpointlocation": str(tmp_path / "cp_a")},
            schema, overwrite=False)
        b = WebDatasetStreamWriter(
            {"path": path, "checkpointlocation": str(tmp_path / "cp_b")},
            schema, overwrite=False)
        a2 = WebDatasetStreamWriter(
            {"path": path, "checkpointlocation": str(tmp_path / "cp_a")},
            schema, overwrite=False)
        assert a._job != b._job
        assert a._job == a2._job
        staged = (tmp_path / "s"
                  / f".part-{a._job}-00000-attempt-0000.inprogress")
        staged.parent.mkdir(parents=True, exist_ok=True)
        staged.write_bytes(b"query a's live temp")
        b.abort([], batchId=0)  # b's sweep must not touch a's temp
        assert staged.exists()

    def test_register_warns_only_on_explicit_false_conf(self, wds):
        import warnings as _warnings

        from astra_perseverance_spark.sources.webdataset_source import (
            register_webdataset,
        )

        conf = "spark.sql.python.filterPushdown.enabled"
        prior = wds.conf.get(conf, None)
        try:
            wds.conf.set(conf, "false")
            with pytest.warns(UserWarning, match="session-global"):
                register_webdataset(wds)
            assert wds.conf.get(conf) == "true"
            # already true: silent
            with _warnings.catch_warnings():
                _warnings.simplefilter("error")
                register_webdataset(wds)
        finally:
            if prior is None:
                wds.conf.unset(conf)
            else:
                wds.conf.set(conf, prior)
            register_webdataset(wds)  # leave the fixture's default

    def test_streaming_rejects_non_append(self, wds, tmp_path):
        from astra_perseverance_spark.sources.webdataset_source import (
            WebDatasetStreamWriter,
        )
        from pyspark.sql.types import StructType

        schema = StructType.fromDDL(
            "doc_id long, text string")
        with pytest.raises(ValueError, match="append output mode"):
            WebDatasetStreamWriter(
                {"path": str(tmp_path / "s")}, schema, overwrite=True)


class TestStreamIngest:
    def test_exactly_once_across_landings(self, spark, tmp_path):
        """Shards land in two waves; each drain ingests only the new
        wave (file-source offset log), appending without duplicates."""
        from astra_perseverance_spark.sources.webdataset import (
            stream_ingest_webdataset_corpus,
        )

        landing = tmp_path / "landing"
        landing.mkdir()
        out = str(tmp_path / "corpus")

        def land(shard_name, rows):
            with tarfile.open(landing / shard_name, "w") as tf:
                from astra_perseverance_spark.sources.webdataset import (
                    add_sample,
                )
                import json
                for i, t, lg, src in rows:
                    add_sample(tf, i, [
                        (".txt", t.encode()),
                        (".json", json.dumps(
                            {"doc_id": i, "lang": lg, "source": src}
                        ).encode()),
                    ])

        land("shard-00000.tar", ROWS[:2])
        stream_ingest_webdataset_corpus(spark, str(landing), out)
        dest = os.path.join(out, "documents.parquet")
        assert spark.read.parquet(dest).count() == 2

        land("shard-00001.tar", ROWS[2:])
        stream_ingest_webdataset_corpus(spark, str(landing), out)
        got = spark.read.parquet(dest)
        assert got.count() == len(ROWS)
        assert _rows(got) == _rows(_docs_df(spark))

        # a third drain with nothing new is a no-op
        stream_ingest_webdataset_corpus(spark, str(landing), out)
        assert spark.read.parquet(dest).count() == len(ROWS)
