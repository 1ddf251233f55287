"""Storage-agnostic filesystem helpers for index maintenance.

The on-disk IVF index (operators/ivf.py) is a ``cluster_id=N``
partitioned parquet layout that upsert/compact/rebalance maintain by
*directory surgery*: list a partition's part-files, delete a drained
cell's directory. Through round 6 those ops used ``os``/``shutil``/
``glob`` — correct locally, but a 100 TB index lives on object storage
(s3a://, abfs://, hdfs://) where POSIX calls can't reach. This module
routes every listing/delete through the Hadoop ``FileSystem`` API via
the JVM gateway, so the SAME code path serves ``file:`` in tests and
``s3a:``/``hdfs:`` on a cluster — the filesystem is resolved from the
path's scheme by Hadoop itself (``Path.getFileSystem(conf)``), exactly
how Spark's own committers find theirs.

Scale notes: every call here is driver-side *metadata* traffic —
listings are partition-count- or file-count-sized, never data-sized;
deletes are O(1) RPCs on HDFS and bounded batched-delete calls on
object stores. That matches the maintenance ops' contract (touched
cells only): the metadata cost scales with the batch's cell footprint,
not the index.

No reference counterpart (the reference is an in-memory library); this
is the operational layer a persistent Spark index needs.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql import SparkSession


def _fs_path(spark: "SparkSession", path: str):
    """Resolve (FileSystem, Path) for ``path`` via its URI scheme.

    A schemeless path resolves against ``fs.defaultFS`` — local FS in
    tests, the cluster default (HDFS/object store) in production, which
    is what makes the callers portable without code changes.
    """
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    conf = spark._jsc.hadoopConfiguration()
    return jpath.getFileSystem(conf), jpath


def exists(spark: "SparkSession", path: str) -> bool:
    fs, p = _fs_path(spark, path)
    return bool(fs.exists(p))


def delete(spark: "SparkSession", path: str, recursive: bool = True) -> bool:
    """Delete a file or directory tree; False if it wasn't there."""
    fs, p = _fs_path(spark, path)
    if not fs.exists(p):
        return False
    return bool(fs.delete(p, recursive))


def list_subdirs(spark: "SparkSession", path: str) -> list[str]:
    """Names (not full paths) of the immediate subdirectories.

    One ``listStatus`` RPC; for a partitioned index this is the
    partition directory listing (``cluster_id=0``, ``cluster_id=7``,
    ...), partition-count-sized.
    """
    fs, p = _fs_path(spark, path)
    if not fs.exists(p):
        return []
    return sorted(
        st.getPath().getName()
        for st in fs.listStatus(p)
        if st.isDirectory()
    )


def count_files(spark: "SparkSession", path: str, prefix: str = "") -> int:
    """Number of regular files under ``path`` whose name starts with
    ``prefix`` (non-recursive) — the compaction trigger's per-cell
    part-file count, one listing RPC per cell."""
    fs, p = _fs_path(spark, path)
    if not fs.exists(p):
        return 0
    return sum(
        1
        for st in fs.listStatus(p)
        if st.isFile() and st.getPath().getName().startswith(prefix)
    )
