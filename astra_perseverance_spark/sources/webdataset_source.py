"""First-class ``webdataset`` Spark data source (Python Data Source
API, Spark 4.x): ``spark.read.format("webdataset")`` and
``df.write.format("webdataset")`` over sample-per-member tar shards.

Register once per session, then the format name works everywhere a
built-in format does (including ``spark.sql`` ``CREATE TABLE ...
USING webdataset`` and the streaming writer's ``foreachBatch``)::

    from astra_perseverance_spark.sources.webdataset_source import (
        register_webdataset)

    register_webdataset(spark)
    docs = spark.read.format("webdataset").load(shards_dir)
    (docs.write.format("webdataset").mode("overwrite")
         .option("shard_docs", "512").save(out_dir))

The tar format itself — member naming, sample grouping, metadata
defaults, reproducible attributes — is the shared core in
``sources/webdataset.py`` (``samples_in_tar`` / ``sample_row`` /
``add_sample``), so shards are interchangeable between this data
source, the ``binaryFile``-based reader and the ``export_webdataset``
sink by construction.

What the data source adds over the existing paths:

* **Read — explicit per-shard planning.** ``partitions()`` returns one
  ``InputPartition`` per tar shard, so the scheduler sees the true
  unit of work (WebDataset shards are bounded by construction —
  ``shard_docs`` samples each); the executor opens the shard FILE with
  ``tarfile`` and decodes members straight from disk, never holding
  the raw shard bytes as a row the way ``binaryFile`` must.  Rows
  reach the JVM as Arrow record batches.
* **Streaming write — per-batch atomicity.** The same staged-temp
  protocol behind ``df.writeStream.format("webdataset")``: each
  microbatch publishes ``shard-b{batchId}-*.tar`` in one idempotent
  driver-side commit, so a curated document stream lands directly as
  trainer-ready shards with exactly-once output
  (``WebDatasetStreamWriter``).
* **Write — job-level atomicity.** ``export_webdataset`` renames each
  task's tars into place as tasks finish, so a job that dies halfway
  leaves a partial shard set in the target directory.  This writer
  stages per-task temps and renames them ONLY in the driver-side
  ``commit()`` after every task has succeeded (``abort()`` discards) —
  the all-or-nothing contract Spark's file committers give parquet,
  now for tar shards.  ``mode("overwrite")`` clears prior shards
  inside the same commit; ``mode("append")`` numbers new shards after
  the existing ones.

Path contract (same as the export sink): shard directories are
driver+executor-visible POSIX paths (local mode: any local path; a
cluster: a shared mount).  Object-store URIs are rejected up front —
see ``export_webdataset``'s WONTFIX rationale; the data source does
not change it (the Python workers still have no object-store client
in this environment), it changes WHO renames (driver commit) and WHEN
(after job success).

Scale shape: a 100 TB corpus at 512 docs/shard is millions of shard
files — far more read partitions than any executor count, so
scheduling is even and elastic.  On the write side each task holds one
open tar (one sample's members in memory at a time beyond the Arrow
batch), and the driver-side commit is O(#tars) renames of
driver-local metadata, not data movement.
"""

from __future__ import annotations

import glob
import os
import tarfile
from dataclasses import dataclass, field
from typing import TYPE_CHECKING, Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceReader,
    DataSourceStreamArrowWriter,
    InputPartition,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

from astra_perseverance_spark.sources.webdataset import (
    add_sample,
    sample_row,
    samples_in_tar,
)

if TYPE_CHECKING:  # pragma: no cover - typing only
    import pyarrow as pa
    from pyspark.sql import SparkSession

# The one definition of the conformed base columns — the schema
# string, the Arrow batch names and the pushFilters column sets are
# all derived from it.
_BASE_FIELDS = (("doc_id", "long"), ("text", "string"),
                ("lang", "string"), ("source", "string"),
                ("n_chars", "long"))
_BASE_COLS = tuple(n for n, _ in _BASE_FIELDS)
_BASE_SCHEMA = ", ".join(f"{n} {t}" for n, t in _BASE_FIELDS)
_SHARD_GLOB = "*.tar"
_TMP_SUFFIX = ".inprogress"
# Arrow batch rows per yield on the read side — bounds driver/JVM
# transfer granularity; a shard with more samples yields several
# batches rather than one giant one.
_READ_BATCH_ROWS = 1024


def _extra_members(options) -> tuple[str, ...]:
    """``extra_members`` option → normalized ('.bin', ...) tuple."""
    raw = options.get("extra_members") or options.get("extramembers")
    if not raw:
        return ()
    out = []
    for part in str(raw).split(","):
        part = part.strip()
        if not part:
            continue
        out.append(part if part.startswith(".") else "." + part)
    return tuple(out)


def _shard_paths(path: str) -> list[str]:
    """Resolve the load path (a shard directory, one tar file, or an
    explicit glob) to a sorted shard list — sorted so partition
    numbering and final shard numbering are deterministic.

    An EXISTING directory or tar file is taken literally
    (``glob.escape``\\d), so a directory legitimately named
    ``run[1]`` is never reinterpreted as a character class — only a
    path that exists as neither is treated as a user-written glob."""
    if os.path.isdir(path):
        pattern = os.path.join(glob.escape(path), _SHARD_GLOB)
    elif os.path.isfile(path):
        return [path]
    else:
        pattern = path
    return sorted(glob.glob(pattern))


class _Shard(InputPartition):
    def __init__(self, path: str):
        self.path = path


# Comparison filters the reader evaluates itself (pushFilters):
# op name → predicate over (row value, filter value).
_PUSH_OPS = {
    "EqualTo": lambda x, v: x == v,
    "In": lambda x, v: x in v,
    "GreaterThan": lambda x, v: x > v,
    "GreaterThanOrEqual": lambda x, v: x >= v,
    "LessThan": lambda x, v: x < v,
    "LessThanOrEqual": lambda x, v: x <= v,
}
# Columns the reader can filter on: metadata-derived scalars whose
# post-default values it computes exactly (sample_row's semantics).
_PUSH_COLS = frozenset({"doc_id", "lang", "source"})


class WebDatasetReader(DataSourceReader):
    """One input partition per tar shard; members decoded straight
    from the shard file (no whole-shard binary row).

    This base reader performs no filter pushdown (for sessions that
    keep ``spark.sql.python.filterPushdown.enabled`` off — Spark
    refuses to plan a reader that overrides ``pushFilters`` while the
    conf is disabled); ``WebDatasetPushdownReader`` adds it."""

    def __init__(self, options):
        path = options.get("path")
        if not path:
            raise ValueError(
                "webdataset read requires a path: "
                "spark.read.format('webdataset').load(<shards dir>)")
        if "://" in path:
            raise ValueError(
                f"webdataset reads driver/executor-local POSIX paths, "
                f"not URIs: {path!r}")
        self._path = path
        self._extra = _extra_members(options)
        # (column, op-name, value) conjuncts consumed from pushFilters;
        # plain tuples so the reader stays picklable
        self._pushed: list[tuple] = []

    def partitions(self) -> list[InputPartition]:
        shards = _shard_paths(self._path)
        if not shards:
            raise ValueError(
                f"no {_SHARD_GLOB} shards match {self._path!r}")
        return [_Shard(p) for p in shards]

    def read(self, partition: _Shard) -> Iterator["pa.RecordBatch"]:
        import pyarrow as pa

        from astra_perseverance_spark.sources.webdataset import (
            _META_SUFFIX,
            _TEXT_SUFFIX,
        )

        rows: list[tuple] = []

        def batch(chunk: list[tuple]) -> "pa.RecordBatch":
            cols = list(zip(*chunk))
            arrays = [
                pa.array(cols[0], type=pa.int64()),      # doc_id
                pa.array(cols[1], type=pa.string()),     # text
                pa.array(cols[2], type=pa.string()),     # lang
                pa.array(cols[3], type=pa.string()),     # source
                pa.array([len(t) for t in cols[1]], type=pa.int64()),
            ]
            names = list(_BASE_COLS)
            for i, s in enumerate(self._extra):
                arrays.append(pa.array(cols[4 + i], type=pa.binary()))
                names.append(s.lstrip("."))
            return pa.RecordBatch.from_arrays(arrays, names=names)

        # decode only the member suffixes this read needs — a
        # multimodal shard's .bin payloads are never extracted unless
        # extra_members asked for them (the raw tar bytes are never
        # held either; what sits in memory is one shard's REQUESTED
        # decoded members)
        keep = frozenset({_TEXT_SUFFIX, _META_SUFFIX, *self._extra})
        with tarfile.open(partition.path) as tf:
            samples = samples_in_tar(tf, keep=keep)
        # precompile the pushed conjuncts once per partition: direct
        # tuple-index + op-fn per row, no per-sample dict building in
        # the hot decode loop (empty for the no-pushdown base reader)
        col_idx = {"doc_id": 0, "lang": 2, "source": 3}
        checks = [(col_idx[c], _PUSH_OPS[op], v)
                  for c, op, v in self._pushed]
        for key, parts in samples.items():
            row = sample_row(key, parts, partition.path)
            if row is None:
                continue
            if checks and not all(fn(row[i], v) for i, fn, v in checks):
                continue  # pushed filter: row never reaches Arrow/JVM
            rows.append((*row, *(parts.get(s) for s in self._extra)))
            if len(rows) >= _READ_BATCH_ROWS:
                yield batch(rows)
                rows = []
        if rows:
            yield batch(rows)


class WebDatasetPushdownReader(WebDatasetReader):
    """The default reader: ``WebDatasetReader`` plus filter pushdown.

    Comparison/IN filters on the metadata scalars
    ``doc_id``/``lang``/``source`` are consumed here and applied per
    sample BEFORE the row is materialized into an Arrow batch — a
    ``lang = 'en'`` scan over a multilingual shard set ships only the
    English rows to the JVM instead of filtering there.  ``IsNotNull``
    on any base column is absorbed for free (the reader never produces
    null base columns).  Everything else (text predicates, Not-wrapped
    composites, n_chars, extras) is returned to Spark unevaluated.

    Kept as a subclass because Spark hard-errors on ANY reader that
    overrides ``pushFilters`` while
    ``spark.sql.python.filterPushdown.enabled`` is off —
    ``register_webdataset(spark, pushdown=False)`` registers the base
    reader instead for sessions that must keep that conf disabled."""

    def pushFilters(self, filters):
        for f in filters:
            op = type(f).__name__
            # Not/StringContains/etc. may lack or nest `attribute` —
            # anything unrecognized falls through to Spark untouched
            attr = getattr(f, "attribute", None)
            col = (attr[0] if isinstance(attr, tuple) and len(attr) == 1
                   else None)
            if op == "IsNotNull" and col in _BASE_COLS:
                continue  # absorbed: base columns are never null
            if op in _PUSH_OPS and col in _PUSH_COLS:
                self._pushed.append((col, op, f.value))
                continue
            yield f  # not ours — Spark evaluates it post-scan


@dataclass
class _TarCommit(WriterCommitMessage):
    """One task's staged tars: (sequence-within-task, temp basename,
    docs written); ``partition`` orders tasks for final numbering."""
    partition: int = 0
    temps: list = field(default_factory=list)


class WebDatasetWriter(DataSourceArrowWriter):
    """Stage-then-commit tar writer.

    Input contract: ``doc_id`` (integral) and ``text`` (string)
    required; ``lang``/``source`` (string) become metadata fields when
    present; ``n_chars`` is accepted and ignored (readers recompute
    it); every OTHER column must be binary and becomes a
    ``.{column}`` member (null → member omitted for that sample) —
    the multimodal layout ``read_webdataset(extra_members=...)`` and
    the reader's ``extra_members`` option read back.  Column TYPES are
    gated up front: a double doc_id would silently truncate into
    colliding member names and a binary text would persist as its
    Python repr, so both are rejected at plan time.

    Staging is JOB-UNIQUE (a per-writer id in every temp name):
    commit/abort touch only this job's temps, so a concurrent writer
    to the same directory can never have its staged output deleted
    from under it.  What is NOT coordinated — same as Spark's file
    sinks — is two concurrent APPEND jobs computing final shard
    numbers from the same directory listing: they can publish
    colliding ``shard-NNNNN.tar`` names, last rename wins.  Serialize
    appends to one directory (the streaming ingest's checkpoint does
    exactly this for the read side)."""

    def __init__(self, options, schema: StructType, overwrite: bool):
        from uuid import uuid4
        path = options.get("path")
        if not path:
            raise ValueError(
                "webdataset write requires a path: "
                "df.write.format('webdataset').save(<shards dir>)")
        if "://" in path:
            raise ValueError(
                f"webdataset writes via driver/executor-local POSIX "
                f"I/O; the target must be a shared-filesystem path, "
                f"not a URI: {path!r} (see export_webdataset's "
                f"object-store WONTFIX)")
        self._path = path
        self._overwrite = overwrite
        self._shard_docs = int(options.get("shard_docs", "512"))
        if self._shard_docs < 1:
            raise ValueError(f"shard_docs must be >= 1, got "
                             f"{self._shard_docs}")
        names = [f.name for f in schema.fields]
        for required in ("doc_id", "text"):
            if required not in names:
                raise ValueError(
                    f"webdataset write requires a {required!r} column; "
                    f"input has {names}")
        integral = {"byte", "short", "integer", "long"}
        expected = {"doc_id": integral, "text": {"string"},
                    "lang": {"string"}, "source": {"string"},
                    "n_chars": integral}
        self._extra = []
        for f in schema.fields:
            want = expected.get(f.name)
            if want is not None:
                if f.dataType.typeName() not in want:
                    raise ValueError(
                        f"webdataset write: column {f.name!r} is "
                        f"{f.dataType.simpleString()}, expected "
                        f"{'/'.join(sorted(want))} — cast it before "
                        f"writing (a truncated doc_id or repr'd text "
                        f"would corrupt the corpus silently)")
                continue
            if f.dataType.typeName() != "binary":
                raise ValueError(
                    f"webdataset write: column {f.name!r} is "
                    f"{f.dataType.simpleString()}; extra columns must "
                    f"be binary (they become .{f.name} tar members)")
            self._extra.append(f.name)
        self._has = {n: (n in names) for n in ("lang", "source")}
        # job-unique staging id: every temp this job writes carries it,
        # and _clean_temps matches on it — a concurrent job's staged
        # temps are invisible to this job's commit/abort
        self._job = uuid4().hex
        # driver-side (the writer is constructed on the driver, then
        # pickled to tasks): make the target exist before any task
        # stages into it
        os.makedirs(path, exist_ok=True)

    # -- executor side ----------------------------------------------------
    def write(self, iterator: Iterator["pa.RecordBatch"]
              ) -> WriterCommitMessage:
        import json
        from uuid import uuid4

        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx is not None else 0
        attempt = uuid4().hex
        temps: list[tuple[int, str, int]] = []
        # doc_ids already written to the OPEN tar: two rows with one
        # doc_id in the same tar would be two same-named member pairs
        # that silently collapse to one sample on read — refuse loudly
        # instead (duplicates in different shards are legal and read
        # back as two rows, like any corpus with duplicate doc_ids;
        # corpus_validate flags them).  Bounded by shard_docs entries.
        state = {"tar": None, "tmp": None, "n": 0, "seen": set()}

        def roll():
            if state["tar"] is not None:
                state["tar"].close()
                temps.append((len(temps), os.path.basename(state["tmp"]),
                              state["n"]))
                state.update(tar=None, tmp=None, n=0, seen=set())

        def ensure_open():
            if state["tar"] is None:
                tmp = os.path.join(
                    self._path,
                    f".part-{self._job}-{pid:05d}-{attempt}-"
                    f"{len(temps):04d}{_TMP_SUFFIX}")
                state.update(tar=tarfile.open(tmp, "w"), tmp=tmp, n=0,
                             seen=set())

        for rb in iterator:
            data = rb.to_pydict()
            for i in range(rb.num_rows):
                doc_id = data["doc_id"][i]
                text = data["text"][i]
                if doc_id is None:
                    raise ValueError(
                        "webdataset write: NULL doc_id — run "
                        "corpus_validate before exporting")
                if text is None:
                    raise ValueError(
                        f"webdataset write: NULL text for doc_id "
                        f"{doc_id} — run corpus_validate before "
                        f"exporting")
                meta = {"doc_id": int(doc_id)}
                for k in ("lang", "source"):
                    if self._has[k] and data[k][i] is not None:
                        meta[k] = str(data[k][i])
                members = [(".txt", str(text).encode("utf-8"))]
                for name in self._extra:
                    payload = data[name][i]
                    if payload is not None:
                        members.append(("." + name, bytes(payload)))
                members.append((".json", json.dumps(
                    meta, sort_keys=True).encode("utf-8")))
                ensure_open()
                if int(doc_id) in state["seen"]:
                    raise ValueError(
                        f"webdataset write: duplicate doc_id "
                        f"{int(doc_id)} within one shard — its member "
                        f"names would collide and collapse to one "
                        f"sample on read; dedup (or re-shard) before "
                        f"exporting")
                state["seen"].add(int(doc_id))
                add_sample(state["tar"], int(doc_id), members)
                state["n"] += 1
                if state["n"] >= self._shard_docs:
                    roll()
        roll()
        return _TarCommit(partition=pid, temps=temps)

    # -- driver side -------------------------------------------------------
    def commit(self, messages) -> None:
        """All tasks succeeded: publish.  Deterministic final
        numbering — temps ordered by (task partition, within-task
        sequence) become ``shard-{i:05d}.tar``; append mode starts
        after the highest existing index."""
        start = 0
        if self._overwrite:
            for stale in _shard_paths(self._path):
                os.remove(stale)
        else:
            taken = [
                int(os.path.basename(p)[len("shard-"):-len(".tar")])
                for p in _shard_paths(self._path)
                if os.path.basename(p).startswith("shard-")
                and os.path.basename(p)[len("shard-"):-len(".tar")].isdigit()
            ]
            start = max(taken) + 1 if taken else 0
        self._publish(messages, lambda i: f"shard-{start + i:05d}.tar")
        # any OTHER temp carrying THIS job's id belongs to a
        # failed/retried task attempt of this job — discard (a
        # concurrent job's temps carry a different id and are never
        # touched)
        self._clean_temps()

    def _publish(self, messages, final_name) -> None:
        """Rename every staged temp into its published name, in
        deterministic (task partition, within-task sequence) order —
        the one publish protocol both commit flavors share."""
        staged = sorted(
            (m.partition, seq, tmp)
            for m in messages if m is not None
            for seq, tmp, _n in m.temps
        )
        for i, (_pid, _seq, tmp) in enumerate(staged):
            os.replace(os.path.join(self._path, tmp),
                       os.path.join(self._path, final_name(i)))

    def abort(self, messages) -> None:
        """A task failed: discard every temp THIS job staged (including
        the failed attempt's, which never reported a message)."""
        self._clean_temps()

    def _clean_temps(self) -> None:
        for tmp in glob.glob(os.path.join(
                glob.escape(self._path),
                f".part-{self._job}-*{_TMP_SUFFIX}")):
            try:
                os.remove(tmp)
            except OSError:  # another cleaner won the race — fine
                pass


class WebDatasetStreamWriter(WebDatasetWriter, DataSourceStreamArrowWriter):
    """Streaming tar sink: ``df.writeStream.format("webdataset")`` —
    each microbatch's shards publish atomically on the driver-side
    per-batch commit, named ``shard-b{batchId:08d}-{i:05d}.tar``.

    Exactly-once output: the batch id is in every published name and
    ``commit`` is IDEMPOTENT per batch — it first removes any
    ``shard-b{batchId}-*`` files (a replay of a batch whose previous
    attempt crashed between renames), then renames this attempt's
    staged temps.  Re-running a drained query publishes nothing;
    replaying an uncommitted batch replaces, never duplicates.  The
    per-task staging protocol (job-unique temps, NULL/type/duplicate
    gates, rolling ``shard_docs`` splits) is inherited from the batch
    writer — one ``write()`` implementation, two commit protocols.

    Append output mode only (a tar, once published, is immutable —
    there is nothing a streaming update/complete mode could rewrite):
    Spark itself fails an ``outputMode("update")`` query against this
    sink ("webdataset does not support Update mode" — verified
    empirically), and ``complete`` arrives as ``overwrite=True``,
    rejected below.
    One streaming query per target directory: batch ids are unique
    within a query, not across queries.  Stale ``.inprogress`` temps
    left by a crashed run are inert (new runs use fresh job ids) and
    safe to delete."""

    def __init__(self, options, schema: StructType, overwrite: bool):
        import hashlib

        if overwrite:
            raise ValueError(
                "webdataset streaming sink supports append output "
                "mode only (published tar shards are immutable)")
        super().__init__(options, schema, overwrite=False)
        # Spark's commit runner constructs a FRESH streamWriter
        # instance for every commit/abort (pyspark worker
        # python_streaming_sink_runner.py), separate from the
        # executor-side instance whose write() staged the temps — a
        # random job id would therefore never match and cleanup would
        # be a silent no-op.  Derive it deterministically from options
        # instead: every instance serving this sink agrees.  The digest
        # folds in the query's checkpointLocation (distinct per live
        # streaming query — Spark locks it) so two queries aimed at the
        # same directory cannot share a job id: one run's
        # ``_clean_temps`` can then never sweep the other's staged
        # temps.  Published names still collide across queries (both
        # would write ``shard-b0-*``) — that remains the documented
        # one-streaming-query-per-directory contract; the digest fix
        # turns its failure mode from silent temp/shard loss into
        # at worst a same-name overwrite at publish.  Concurrent BATCH
        # writers keep their random ids, which never collide with this
        # digest-shaped id.
        ckpt = options.get("checkpointlocation") or ""
        self._job = hashlib.md5(
            f"wds-stream:{self._path}:{ckpt}".encode()).hexdigest()[:16]

    # -- driver side, once per microbatch -----------------------------------
    def commit(self, messages, batchId: int) -> None:
        prefix = f"shard-b{batchId:08d}-"
        # replay of a batch whose previous attempt crashed between
        # renames: sweep ONLY this batch's prefix (O(matches), not a
        # listing of the whole multi-million-shard directory)
        for stale in glob.glob(os.path.join(
                glob.escape(self._path), prefix + "*.tar")):
            os.remove(stale)
        self._publish(messages, lambda i: f"{prefix}{i:05d}.tar")
        self._clean_temps()

    def abort(self, messages, batchId: int) -> None:
        self._clean_temps()


class WebDatasetDataSource(DataSource):
    """``format("webdataset")``: see module docstring."""

    @classmethod
    def name(cls) -> str:
        return "webdataset"

    def schema(self) -> str:
        schema = _BASE_SCHEMA
        for s in _extra_members(self.options):
            schema += f", {s.lstrip('.')} binary"
        return schema

    def reader(self, schema: StructType) -> DataSourceReader:
        return WebDatasetPushdownReader(self.options)

    def writer(self, schema: StructType,
               overwrite: bool) -> DataSourceArrowWriter:
        return WebDatasetWriter(self.options, schema, overwrite)

    def streamWriter(self, schema: StructType,
                     overwrite: bool) -> DataSourceStreamArrowWriter:
        return WebDatasetStreamWriter(self.options, schema, overwrite)


class _WebDatasetDataSourceNoPushdown(WebDatasetDataSource):
    """Same format, base reader: for sessions that must keep
    ``spark.sql.python.filterPushdown.enabled`` off (Spark refuses to
    plan any ``pushFilters`` reader while it is disabled)."""

    def reader(self, schema: StructType) -> DataSourceReader:
        return WebDatasetReader(self.options)


def register_webdataset(spark: "SparkSession",
                        pushdown: bool = True) -> None:
    """Idempotently register the data source on a session (re-register
    is a same-name replace, safe to call per entry point).

    ``pushdown=True`` (default) also enables
    ``spark.sql.python.filterPushdown.enabled`` — a SESSION-global SQL
    conf (default false in 4.1) without which Spark refuses to plan
    any reader that implements ``pushFilters``, failing every read.
    The conf affects every registered Python data source in the
    session; if another source's pushdown must stay disabled, call
    with ``pushdown=False`` — the format then registers the
    no-pushdown reader and the conf is left untouched (filters are
    simply evaluated by Spark post-scan).  When the call actually
    OVERRIDES an explicit ``false`` (someone set the conf off on
    purpose — the only case where flipping it can surprise another
    pushdown-sensitive source), a one-line warning names the change
    so call sites that never read this docstring notice the
    session-global effect; setting it from the unset default stays
    silent."""
    if pushdown:
        conf = "spark.sql.python.filterPushdown.enabled"
        explicit = spark.conf.get(conf, None)
        if explicit is not None and explicit.lower() == "false":
            import warnings as _warnings

            _warnings.warn(
                f"register_webdataset is flipping the session-global "
                f"conf {conf} from an explicit false to true (required "
                f"to plan a pushFilters reader) — this affects every "
                f"registered Python data source in the session; pass "
                f"pushdown=False to leave it off",
                stacklevel=2)
        spark.conf.set(conf, "true")
        spark.dataSource.register(WebDatasetDataSource)
    else:
        spark.dataSource.register(_WebDatasetDataSourceNoPushdown)
