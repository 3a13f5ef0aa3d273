"""Small-file compaction for parquet datasets.

The operational complement of the incremental ingest paths: a
file-source streaming ingest (``sources.corpus_jsonl.
stream_ingest_jsonl_corpus``) appends a file per trigger per
partition, and at 100 TB a long-running drop-directory ingest turns a
corpus into millions of kilobyte files — every later scan then pays a
task per file, the scheduler pays a task-launch per file, and the
namenode/object-store listing pays per object.  Compaction rewrites
the dataset to a target file size without changing a single row.

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


def _data_files(fs, jpath):
    """(n_files, total_bytes) over the dataset's data files (hidden
    and _-prefixed bookkeeping files excluded, recursively)."""
    n = 0
    total = 0
    it = fs.listFiles(jpath, True)
    while it.hasNext():
        st = it.next()
        name = st.getPath().getName()
        if name.startswith(("_", ".")):
            continue
        n += 1
        total += st.getLen()
    return n, total


def compact_parquet(spark: SparkSession, path: str,
                    target_bytes: int = DEFAULT_TARGET_BYTES,
                    audit: bool = True) -> dict[str, int]:
    """Rewrite the parquet dataset at ``path`` in place so its data
    files approach ``target_bytes`` each.  Returns
    {files_before, files_after, bytes, rows}.

    No-op (nothing rewritten) when the dataset already has no more
    files than the target implies — safe to run on a schedule.

    A hive-partitioned dataset (``key=value`` subdirectories, e.g.
    the training-shard layout) is compacted ONE PARTITION AT A TIME —
    each leaf directory is itself a valid parquet dataset, so the
    rewrite preserves the partition columns and the pruning they buy;
    a whole-dataset rewrite would flatten them into file contents and
    silently cost every downstream scan its partition pruning."""
    if target_bytes <= 0:
        raise ValueError(f"target_bytes must be positive: {target_bytes}")
    fs, jpath, jvm = _fs(spark, path)
    part_dirs = [
        st.getPath() for st in fs.listStatus(jpath)
        if st.isDirectory() and "=" in st.getPath().getName()
        and not st.getPath().getName().startswith(("_", "."))
    ]
    if part_dirs:
        agg = {"files_before": 0, "files_after": 0, "bytes": 0, "rows": 0}
        for pd in sorted(part_dirs, key=lambda p: p.getName()):
            sub = compact_parquet(spark, pd.toString(),
                                  target_bytes=target_bytes, audit=audit)
            for k in agg:
                agg[k] += sub[k]
        if not audit:
            agg["rows"] = -1
        return agg
    files_before, total = _data_files(fs, jpath)
    n_out = max(1, -(-total // target_bytes))
    if files_before <= n_out:
        rows = spark.read.parquet(path).count() if audit else -1
        return {"files_before": files_before, "files_after": files_before,
                "bytes": total, "rows": rows}

    tmp = path.rstrip("/") + ".__compact_tmp__"
    old = path.rstrip("/") + ".__compact_old__"
    df = spark.read.parquet(path)
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
    jold = jvm.org.apache.hadoop.fs.Path(old)
    jtmp = jvm.org.apache.hadoop.fs.Path(tmp)
    if not fs.rename(jpath, jold):
        raise IOError(f"could not move {path} aside to {old}")
    if not fs.rename(jtmp, jpath):
        # restore the original before failing
        fs.rename(jold, jpath)
        raise IOError(f"could not move compacted data into {path}; "
                      f"original restored")
    fs.delete(jold, True)
    files_after, _ = _data_files(fs, jpath)
    return {"files_before": files_before, "files_after": files_after,
            "bytes": total, "rows": rows}


def compact_corpus(spark: SparkSession, sf_dir: str,
                   target_bytes: int = DEFAULT_TARGET_BYTES,
                   audit: bool = True) -> dict[str, dict[str, int]]:
    """Compact every ``*.parquet`` dataset directory in a corpus dir
    (the shape the ingest tools produce).  Returns per-dataset stats."""
    fs, jpath, jvm = _fs(spark, sf_dir)
    out: dict[str, dict[str, int]] = {}
    for st in fs.listStatus(jpath):
        name = st.getPath().getName()
        if st.isDirectory() and name.endswith(".parquet"):
            out[name] = compact_parquet(
                spark, st.getPath().toString(),
                target_bytes=target_bytes, audit=audit)
    return out
