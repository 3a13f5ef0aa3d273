"""Small-file compaction for parquet datasets.

The operational complement of the incremental ingest paths: a
file-source streaming ingest (``sources.corpus_jsonl.
stream_ingest_jsonl_corpus``) appends a file per trigger per
partition, and at 100 TB a long-running drop-directory ingest turns a
corpus into millions of kilobyte files — every later scan then pays a
task per file, the scheduler pays a task-launch per file, and the
namenode/object-store listing pays per object.  Compaction rewrites
the dataset to a target file size without changing a single row.
The pairing's contract: compaction SEALS a streaming-ingested
dataset (``finalize_streaming_sink=True`` — the ``_spark_metadata``
commit log is dropped and the old stream must not resume into the
directory; compacting a LIVE streaming sink in place is refused,
because readers resolve it through a log the rewrite cannot rewrite).

Shape: the rewrite is a ``coalesce`` — NOT ``repartition`` — so no
shuffle is planned; each output task concatenates a run of input
files, which is the whole job (row order within the dataset is not
part of any query contract; every registered query's result is
set-semantics + explicit sorts).  The swap is write-to-temp +
filesystem rename through the Hadoop FS API, so it works on any
scheme Spark can write (``file://``, ``hdfs://``, ``s3a://`` —
object stores make the rename a copy, the standard caveat).

The row-count audit (on by default) re-reads both sides before the
swap; a compaction that loses rows raises instead of replacing data.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

DEFAULT_TARGET_BYTES = 128 * 1024 * 1024  # one comfortable HDFS/scan block


def _fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    return jpath.getFileSystem(spark._jsc.hadoopConfiguration()), jpath, jvm


def _is_bookkeeping(root: str, file_path: str) -> bool:
    """True when any path component below the dataset root is _- or
    .-prefixed — covers bookkeeping FILES (_SUCCESS) and everything
    inside bookkeeping DIRECTORIES (_spark_metadata/0, whose entries
    are named like data files)."""
    rel = file_path[len(root):].lstrip("/")
    return any(part.startswith(("_", ".")) for part in rel.split("/"))


def _data_files(fs, jpath):
    """(n_files, total_bytes) over the dataset's data files (hidden /
    _-prefixed bookkeeping excluded component-wise, recursively).
    Root is FS-qualified so a caller-relative path still aligns with
    the qualified paths ``listFiles`` returns."""
    root = fs.makeQualified(jpath).toUri().getPath().rstrip("/")
    n = 0
    total = 0
    it = fs.listFiles(jpath, True)
    while it.hasNext():
        st = it.next()
        if _is_bookkeeping(root, st.getPath().toUri().getPath()):
            continue
        n += 1
        total += st.getLen()
    return n, total


def compact_parquet(spark: SparkSession, path: str,
                    target_bytes: int = DEFAULT_TARGET_BYTES,
                    audit: bool = True,
                    finalize_streaming_sink: bool = False,
                    _between_snapshot_and_swap=None) -> dict[str, int]:
    """Rewrite the parquet dataset at ``path`` in place so its data
    files approach ``target_bytes`` each.  Returns
    {files_before, files_after, bytes, rows}; ``rows`` is -1 when
    nothing was rewritten (the no-op path never scans — a scheduled
    run over an already-compact 100 TB dataset costs a listing, not a
    read) or when ``audit=False``.  ``rows`` is the SNAPSHOT count —
    the rows the rewrite consumed and audited; rows rescued from a
    concurrent writer after the snapshot (below) are in the dataset
    but not in the count (re-count the directory if an exact
    post-swap total matters).

    No-op (nothing rewritten) when the dataset already has no more
    files than the target implies — safe to run on a schedule.

    STREAMING-SINK datasets (a ``_spark_metadata`` commit log from a
    ``writeStream`` parquet sink) REFUSE to compact unless
    ``finalize_streaming_sink=True``: readers resolve such a dataset
    through the log, and an in-place rewrite cannot rewrite Spark's
    internal log format — if the old stream later resumed into the
    directory it would recreate the log containing only new batches,
    silently hiding every compacted row from every reader.  With the
    flag, compaction SEALS the dataset: the log is dropped with the
    old tree, the result is a plain batch dataset, and resuming the
    old stream into it is unsupported (point new ingest at a fresh
    directory, or re-ingest with a fresh checkpoint).

    Files committed into the dataset by a CONCURRENT writer between
    the read snapshot and the directory swap are rescued: anything in
    the old tree that was not a snapshot input is moved into the
    compacted tree before the old tree is deleted, so a racing batch
    append loses nothing (in-progress hidden temp files are the
    writer's to retry).

    A hive-partitioned dataset (``key=value`` subdirectories, e.g.
    the training-shard layout) is compacted ONE PARTITION AT A TIME —
    each leaf directory is itself a valid parquet dataset, so the
    rewrite preserves the partition columns and the pruning they buy;
    a whole-dataset rewrite would flatten them into file contents and
    silently cost every downstream scan its partition pruning."""
    import os

    if target_bytes <= 0:
        raise ValueError(f"target_bytes must be positive: {target_bytes}")
    fs, jpath, jvm = _fs(spark, path)
    jmeta = jvm.org.apache.hadoop.fs.Path(
        path.rstrip("/") + "/_spark_metadata")
    if fs.exists(jmeta) and not finalize_streaming_sink:
        raise ValueError(
            f"{path} is a streaming-sink dataset (_spark_metadata "
            "commit log): in-place compaction cannot rewrite the log, "
            "and a resumed stream would recreate it hiding every "
            "compacted row from readers.  Pass "
            "finalize_streaming_sink=True to seal the dataset into a "
            "plain batch dataset (the old stream must not resume "
            "into it).")
    part_dirs = [
        st.getPath() for st in fs.listStatus(jpath)
        if st.isDirectory() and "=" in st.getPath().getName()
        and not st.getPath().getName().startswith(("_", "."))
    ]
    if part_dirs:
        agg = {"files_before": 0, "files_after": 0, "bytes": 0, "rows": 0}
        noop = False
        for pd in sorted(part_dirs, key=lambda p: p.getName()):
            sub = compact_parquet(
                spark, pd.toString(), target_bytes=target_bytes,
                audit=audit,
                finalize_streaming_sink=finalize_streaming_sink)
            noop = noop or sub["rows"] < 0
            for k in agg:
                agg[k] += sub[k]
        if not audit or noop:
            # a partition that took the no-op path reports the -1
            # sentinel; a sum containing it would be silently wrong
            agg["rows"] = -1
        return agg
    files_before, total = _data_files(fs, jpath)
    n_out = max(1, -(-total // target_bytes))
    if files_before <= n_out:
        return {"files_before": files_before, "files_after": files_before,
                "bytes": total, "rows": -1}

    tmp = path.rstrip("/") + ".__compact_tmp__"
    old = path.rstrip("/") + ".__compact_old__"
    df = spark.read.parquet(path)
    # the files the rewrite actually consumed — anything that lands
    # after this snapshot is rescued across the swap below.  Keyed by
    # path RELATIVE to the dataset root, not basename: a late file in
    # a nested subdir whose basename collides with any snapshot file
    # (non-Spark writers use generic names) must still be rescued.
    # The root must be FS-QUALIFIED before relpath: inputFiles()
    # returns fully-qualified URIs, while a caller-relative ``path``
    # leaves jpath relative (HDFS would prepend /user/<name>), and a
    # misaligned root would turn every snapshot key into ../ garbage
    # — the rescue below would then "rescue" every consumed old file
    # back in, silently duplicating the dataset
    data_root = fs.makeQualified(jpath).toUri().getPath().rstrip("/")
    # decode through Hadoop Path on BOTH sides: inputFiles() strings
    # ARE Path.toString() output, so Path(f).toUri().getPath() inverts
    # exactly the encoding the listFiles-side keys below use — a
    # Python-side unquote() would instead mis-key a file whose name
    # contains a literal percent-escape-looking sequence that Spark
    # never encoded (part-a%41.parquet), wrongly "rescuing" that
    # consumed file back after the swap and duplicating its rows
    snapshot = {
        os.path.relpath(
            jvm.org.apache.hadoop.fs.Path(f).toUri().getPath(), data_root)
        for f in df.inputFiles()
    }
    df.coalesce(int(n_out)).write.mode("overwrite").parquet(tmp)
    rows = -1
    if audit:
        rows = spark.read.parquet(tmp).count()
        before_rows = df.count()
        if rows != before_rows:
            fs.delete(jvm.org.apache.hadoop.fs.Path(tmp), True)
            raise AssertionError(
                f"compaction of {path} would change the row count "
                f"({before_rows} -> {rows}); original left untouched")
    if _between_snapshot_and_swap is not None:
        # test-only seam: deterministically exercises the
        # concurrent-commit window the rescue below closes
        _between_snapshot_and_swap()
    jold = jvm.org.apache.hadoop.fs.Path(old)
    jtmp = jvm.org.apache.hadoop.fs.Path(tmp)
    if not fs.rename(jpath, jold):
        raise IOError(f"could not move {path} aside to {old}")
    if not fs.rename(jtmp, jpath):
        # restore the original before failing
        fs.rename(jold, jpath)
        raise IOError(f"could not move compacted data into {path}; "
                      f"original restored")
    # late-file rescue: a concurrent writer may have committed data
    # files after the snapshot; move them into the compacted tree
    # (bookkeeping — including a sealed _spark_metadata — stays
    # behind and is dropped with the old tree)
    old_root = fs.makeQualified(jold).toUri().getPath().rstrip("/")
    it = fs.listFiles(jold, True)
    while it.hasNext():
        st = it.next()
        p = st.getPath()
        if _is_bookkeeping(old_root, p.toUri().getPath()):
            continue
        # preserve the file's path RELATIVE to the dataset root —
        # a concurrent writer may have committed into a nested
        # (e.g. hive-partition) subdirectory, and flattening to
        # the basename would detach the row group from its
        # partition key
        rel = os.path.relpath(p.toUri().getPath(), old_root)
        if rel not in snapshot:
            dest = jvm.org.apache.hadoop.fs.Path(
                path.rstrip("/") + "/" + rel)
            fs.mkdirs(dest.getParent())
            fs.rename(p, dest)
    fs.delete(jold, True)
    files_after, _ = _data_files(fs, jpath)
    return {"files_before": files_before, "files_after": files_after,
            "bytes": total, "rows": rows}


def compact_corpus(spark: SparkSession, sf_dir: str,
                   target_bytes: int = DEFAULT_TARGET_BYTES,
                   audit: bool = True,
                   finalize_streaming_sink: bool = False,
                   ) -> dict[str, dict[str, int]]:
    """Compact every ``*.parquet`` dataset directory in a corpus dir
    (the shape the ingest tools produce).  Returns per-dataset stats.
    ``finalize_streaming_sink`` seals streaming-ingested datasets
    (see ``compact_parquet``) — pass it when the drop directory is
    being promoted and its ingest streams will not resume."""
    fs, jpath, jvm = _fs(spark, sf_dir)
    out: dict[str, dict[str, int]] = {}
    for st in fs.listStatus(jpath):
        name = st.getPath().getName()
        if st.isDirectory() and name.endswith(".parquet"):
            out[name] = compact_parquet(
                spark, st.getPath().toString(),
                target_bytes=target_bytes, audit=audit,
                finalize_streaming_sink=finalize_streaming_sink)
    return out
