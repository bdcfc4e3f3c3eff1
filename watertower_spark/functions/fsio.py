"""Filesystem helpers that work on object stores, not just POSIX.

A 100 TB index lives on S3/HDFS/GCS, where ``os.rename`` and
``shutil.rmtree`` silently operate on the LOCAL filesystem and do
nothing to the real table directories.  Every metadata/table-directory
operation in the engine goes through these helpers instead:

- paths WITHOUT a scheme (local test/dev indexes) use plain ``os`` IO —
  no JVM round trips on the hot local path;
- paths WITH a scheme (``s3a://…``, ``hdfs://…``) are routed through the
  active SparkSession's Hadoop ``FileSystem`` (the same connector stack
  Spark's own writers use, so anything Spark can write to, these can
  manage).

Table REPLACEMENT never relies on rename at all — maintenance publishes
a new versioned directory and flips a manifest pointer
(operators/maintenance.py `_publish_table`), because rename is not
atomic (it is copy+delete) on object stores.
"""

from __future__ import annotations

import json
import os
import shutil


def _hadoop(path: str):
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    if spark is None:
        raise RuntimeError(
            f"no active SparkSession to resolve scheme'd path {path!r}"
        )
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return jvm, fs, jpath


def _is_remote(path: str) -> bool:
    # any scheme'd URI (s3a://, hdfs://, file://, …) goes through the
    # Hadoop FileSystem; bare paths take the local fast path
    return "://" in path


def read_text(path: str) -> str:
    if not _is_remote(path):
        with open(path, encoding="utf-8") as f:
            return f.read()
    jvm, fs, jpath = _hadoop(path)
    if not fs.exists(jpath):
        raise FileNotFoundError(path)
    stream = fs.open(jpath)
    try:
        return jvm.org.apache.commons.io.IOUtils.toString(stream, "UTF-8")
    finally:
        stream.close()


def write_text(path: str, content: str) -> None:
    if not _is_remote(path):
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = path + ".tmp"
        with open(tmp, "w", encoding="utf-8") as f:
            f.write(content)
        os.replace(tmp, path)
        return
    jvm, fs, jpath = _hadoop(path)
    stream = fs.create(jpath, True)
    try:
        stream.write(bytearray(content.encode("utf-8")))
    finally:
        stream.close()


def append_line(path: str, line: str) -> None:
    """Append one line; object stores don't append, so remote paths
    read-modify-write (snapshot logs are small — one line per commit)."""
    if not _is_remote(path):
        with open(path, "a", encoding="utf-8") as f:
            f.write(line + "\n")
        return
    try:
        prev = read_text(path)
    except FileNotFoundError:
        prev = ""
    write_text(path, prev + line + "\n")


def delete_dir(path: str) -> None:
    """Recursive delete, ignore-missing (replaces shutil.rmtree)."""
    if not _is_remote(path):
        shutil.rmtree(path, ignore_errors=True)
        return
    _, fs, jpath = _hadoop(path)
    if fs.exists(jpath):
        fs.delete(jpath, True)


def delete_file(path: str) -> None:
    """Delete a single file, ignore-missing."""
    if not _is_remote(path):
        try:
            os.remove(path)
        except FileNotFoundError:
            pass
        return
    _, fs, jpath = _hadoop(path)
    if fs.exists(jpath):
        fs.delete(jpath, False)


def exists(path: str) -> bool:
    if not _is_remote(path):
        return os.path.exists(path)
    _, fs, jpath = _hadoop(path)
    return bool(fs.exists(jpath))


def list_dir(path: str) -> list:
    """Immediate child entry names of a directory ([] if missing)."""
    if not _is_remote(path):
        try:
            return sorted(os.listdir(path))
        except FileNotFoundError:
            return []
    _, fs, jpath = _hadoop(path)
    if not fs.exists(jpath):
        return []
    return sorted(s.getPath().getName() for s in fs.listStatus(jpath))


def list_shard_dirs(table_dir: str) -> list:
    """Shard ids whose `shard=N` partition directory holds data files."""
    out = []
    if not _is_remote(table_dir):
        if not os.path.isdir(table_dir):
            return out
        for d in os.listdir(table_dir):
            full = os.path.join(table_dir, d)
            if d.startswith("shard=") and os.path.isdir(full) and any(
                f.endswith(".parquet") for f in os.listdir(full)
            ):
                out.append(int(d.split("=")[1]))
        return out
    _, fs, jpath = _hadoop(table_dir)
    if not fs.exists(jpath):
        return out
    for status in fs.listStatus(jpath):
        name = status.getPath().getName()
        if status.isDirectory() and name.startswith("shard="):
            if any(
                f.getPath().getName().endswith(".parquet")
                for f in fs.listStatus(status.getPath())
            ):
                out.append(int(name.split("=")[1]))
    return out


def list_partition_values(table_dir: str, key: str) -> list:
    """Partition values whose ``key=V`` directory holds data files
    (generalizes list_shard_dirs to any partition column, e.g. the
    term_stats ``tb`` buckets)."""
    out = []
    prefix = f"{key}="
    if not _is_remote(table_dir):
        if not os.path.isdir(table_dir):
            return out
        for d in os.listdir(table_dir):
            full = os.path.join(table_dir, d)
            if d.startswith(prefix) and os.path.isdir(full) and any(
                f.endswith(".parquet") for f in os.listdir(full)
            ):
                out.append(int(d.split("=")[1]))
        return out
    _, fs, jpath = _hadoop(table_dir)
    if not fs.exists(jpath):
        return out
    for status in fs.listStatus(jpath):
        name = status.getPath().getName()
        if status.isDirectory() and name.startswith(prefix):
            if any(
                f.getPath().getName().endswith(".parquet")
                for f in fs.listStatus(status.getPath())
            ):
                out.append(int(name.split("=")[1]))
    return out


def create_exclusive(path: str, content: str) -> bool:
    """Atomically create ``path`` with ``content``; False if it already
    exists.  Local paths use O_CREAT|O_EXCL; scheme'd paths use Hadoop
    ``create(overwrite=False)`` (atomic on HDFS; on S3 the create is
    check-then-write, which is best-effort — acceptable for an advisory
    mutation lease, see maintenance module docstring)."""
    if not _is_remote(path):
        os.makedirs(os.path.dirname(path), exist_ok=True)
        try:
            fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            return False
        with os.fdopen(fd, "w", encoding="utf-8") as f:
            f.write(content)
        return True
    jvm, fs, jpath = _hadoop(path)
    try:
        stream = fs.create(jpath, False)
    except Exception:
        return False
    try:
        stream.write(bytearray(content.encode("utf-8")))
    finally:
        stream.close()
    return True


def read_json(path: str) -> dict:
    return json.loads(read_text(path))


def write_json(path: str, obj: dict) -> None:
    write_text(path, json.dumps(obj, indent=1))


def dir_size(path: str) -> int:
    """Total bytes under ``path`` (0 when missing).

    Local bare paths walk the tree; scheme'd URIs use one Hadoop
    ContentSummary call (object-store safe — a single LIST per table,
    never a per-file round trip)."""
    if not _is_remote(path):
        if not os.path.exists(path):
            return 0
        total = 0
        for root, _dirs, files in os.walk(path):
            for name in files:
                try:
                    total += os.path.getsize(os.path.join(root, name))
                except OSError:
                    pass  # file vanished mid-walk (concurrent compaction)
        return total
    _jvm, fs, jpath = _hadoop(path)
    if not fs.exists(jpath):
        return 0
    return int(fs.getContentSummary(jpath).getLength())
