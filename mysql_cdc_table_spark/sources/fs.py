"""Hadoop FileSystem ops for store maintenance.

Object-store-safe replacements for ``os.listdir`` / ``os.rename`` /
``shutil.rmtree``: the durable stores built by ``streaming.cdc_stream``
live wherever Spark writes them — local disk under ``local[*]``, but
HDFS / S3 / GCS on a real cluster, where driver-side local-FS calls
silently see an empty directory. Every helper here goes through the
JVM's ``org.apache.hadoop.fs.FileSystem`` via the session's py4j
gateway, so paths resolve exactly as Spark's own readers and writers
resolve them (scheme-aware, ``fs.defaultFS`` applied, S3A/GCS
connectors honored).

The reference never faces this problem — it is a single-node MySQL
storage engine reading local binlog files (binlog_table_reader.cc:
75-96); a distributed store is part of what this engine adds.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def _fs_and_path(spark: SparkSession, path: str):
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, jpath, jvm


def exists(spark: SparkSession, path: str) -> bool:
    fs, jpath, _ = _fs_and_path(spark, path)
    return bool(fs.exists(jpath))


def list_names(spark: SparkSession, path: str) -> list[str]:
    """Child entry names of a directory ([] if the path is absent)."""
    fs, jpath, _ = _fs_and_path(spark, path)
    if not fs.exists(jpath):
        return []
    return [st.getPath().getName() for st in fs.listStatus(jpath)]


def rename(spark: SparkSession, src: str, dst: str) -> None:
    """Atomic-on-HDFS rename (best-effort on S3, same as Spark's own
    commit protocols); raises if the filesystem refuses."""
    fs, jsrc, jvm = _fs_and_path(spark, src)
    if not fs.rename(jsrc, jvm.org.apache.hadoop.fs.Path(dst)):
        raise OSError(f"rename {src} -> {dst} failed")


def delete(spark: SparkSession, path: str) -> None:
    """Recursive delete, no-op when absent (shutil.rmtree
    ignore_errors=True shape)."""
    fs, jpath, _ = _fs_and_path(spark, path)
    if fs.exists(jpath):
        fs.delete(jpath, True)


def bucket_ids(spark: SparkSession, store_path: str, prefix: str = "__bucket=") -> set[int]:
    """Partition values present in a ``partitionBy("__bucket")`` store."""
    return {
        int(n.split("=", 1)[1])
        for n in list_names(spark, store_path)
        if n.startswith(prefix)
    }
