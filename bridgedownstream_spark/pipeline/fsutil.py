"""Thin wrappers over the Hadoop FileSystem API.

Path existence / listing / deletion must go through Hadoop's FS layer (not
``os``) so the same code works on file://, s3a://, and hdfs:// — one RPC per
call, never a recursive local walk. This is the pattern
``workflow.discover_datasets`` established; these helpers make it reusable
for the upsert sink's empty-partition cleanup and the rollup's
existence check (a blanket ``except`` around ``spark.read`` treats
transient failures as "table absent", which is how aggregates get silently
doubled — check existence explicitly instead).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

__all__ = [
    "path_exists",
    "list_dirs",
    "list_data_files",
    "delete_path",
    "has_data_files",
]


def _fs_and_path(spark: SparkSession, path: str):
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    return p.getFileSystem(conf), p


def path_exists(spark: SparkSession, path: str) -> bool:
    fs, p = _fs_and_path(spark, path)
    return bool(fs.exists(p))


def list_dirs(spark: SparkSession, path: str) -> list[str]:
    """Names of the immediate subdirectories of ``path`` ([] if absent)."""
    fs, p = _fs_and_path(spark, path)
    if not fs.exists(p):
        return []
    return sorted(
        s.getPath().getName() for s in fs.listStatus(p) if s.isDirectory()
    )


def list_data_files(spark: SparkSession, path: str) -> list[str]:
    """Fully-qualified URIs of every VISIBLE file under ``path``,
    recursively, applying Spark's hidden-path rule (any component starting
    with ``_`` or ``.`` hides its whole subtree) — i.e. exactly the files a
    ``spark.read`` over the directory would scan. File-count-scale driver
    metadata, one FS traversal: this is what lets the ledger prune work at
    the LISTING instead of anti-joining parsed rows (a no-op incremental
    run then touches zero data bytes, like a Glue bookmark)."""
    fs, p = _fs_and_path(spark, path)
    if not fs.exists(p):
        return []
    out: list[str] = []
    stack = [p]
    while stack:
        for st in fs.listStatus(stack.pop()):
            name = st.getPath().getName()
            if name.startswith(("_", ".")):
                continue  # hidden file OR hidden subtree
            if st.isDirectory():
                stack.append(st.getPath())
            else:
                out.append(st.getPath().toString())
    return sorted(out)


def delete_path(spark: SparkSession, path: str) -> bool:
    """Recursively delete ``path``; True if something was removed."""
    fs, p = _fs_and_path(spark, path)
    return bool(fs.delete(p, True))


def has_data_files(spark: SparkSession, path: str, suffix: str = ".parquet") -> bool:
    """True iff ``path`` contains at least one VISIBLE data file,
    recursively, applying the same hidden-path rule Spark's readers do:
    any path component starting with ``_`` or ``.`` hides the whole
    subtree. (A flat ``listFiles`` sweep would count parquet files inside
    ``_temporary``/``.staging`` left by a crashed write — files
    ``spark.read.parquet`` ignores — and report a readable table where the
    reader sees none.)

    A directory can EXIST yet hold no data — e.g. a table whose every
    partition was removed by a delete-only merge leaves only ``_SUCCESS``
    markers, and ``spark.read.parquet`` on it raises (no footer to infer a
    schema from). Existence alone is therefore the wrong "is there a
    table?" probe; this one stops at the first real data file.
    """
    fs, p = _fs_and_path(spark, path)
    if not fs.exists(p):
        return False
    stack = [p]
    while stack:
        for st in fs.listStatus(stack.pop()):
            name = st.getPath().getName()
            if name.startswith(("_", ".")):
                continue  # hidden file OR hidden subtree
            if st.isDirectory():
                stack.append(st.getPath())
            elif name.endswith(suffix):
                return True
    return False
