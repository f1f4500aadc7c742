"""Parquet lakehouse sinks.

The reference's MySQL sink patterns (``src/batch_train.py:154-176``,
``src/import_xml_history.py:205-211``) re-expressed for a parquet
lakehouse:

* OP-SNK-APPEND   → ``append_parquet``
* OP-SNK-REPLACE + OP-SNK-BACKUP → ``overwrite_with_backup``: snapshot
  the current table to a timestamped directory, then atomically swap in
  the new data (write to staging + rename) — the crash-safe equivalent
  of the reference's single-transaction backup→TRUNCATE→append
  (SURVEY.md §7.3.8: partial failure must never destroy data).
* OP-SNK-ARCHIVE  → ``archive_files``: move fully-ingested source files
  to a processed/ dir as the commit marker; failed files stay put for
  retry (``src/import_xml_history.py:211-214``).

All filesystem operations go through the Hadoop FileSystem API (via the
JVM gateway) so they work identically on local paths, HDFS and
object-store connectors.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import DataFrame, SparkSession


def _fs(spark: SparkSession, path: str):
    jvm = spark.sparkContext._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    return hpath.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration()), hpath, jvm


def append_parquet(df: DataFrame, path: str) -> None:
    df.write.mode("append").parquet(path)


def overwrite_with_backup(
    df: DataFrame,
    path: str,
    backup_root: str | None = None,
    timestamp: str | None = None,
) -> str | None:
    """Replace the table at ``path`` with ``df``, keeping a timestamped
    backup of the previous contents.

    Sequence (each step atomic at the FS level):
      1. write ``df`` to ``<path>__staging`` (job-level atomic output)
      2. if ``path`` exists: rename it to
         ``<backup_root>/<name>_backup_<yyyyMMdd_HHmmss>``
      3. rename staging to ``path``

    A crash between 2 and 3 leaves the staging dir complete on disk and
    the old data safe in the backup — nothing is ever truncated before
    its replacement exists. Returns the backup location (or None).
    """
    spark = df.sparkSession
    fs, target, jvm = _fs(spark, path)
    staging = jvm.org.apache.hadoop.fs.Path(path + "__staging")
    if fs.exists(staging):
        fs.delete(staging, True)
    df.write.mode("overwrite").parquet(str(staging))

    backup_path = None
    if fs.exists(target):
        ts = timestamp or datetime.now().strftime("%Y%m%d_%H%M%S")
        name = path.rstrip("/").rsplit("/", 1)[-1]
        root = (backup_root or path.rstrip("/").rsplit("/", 1)[0]).rstrip("/")
        backup_path = f"{root}/{name}_backup_{ts}"
        bdir = jvm.org.apache.hadoop.fs.Path(backup_path)
        fs.mkdirs(bdir.getParent())
        if not fs.rename(target, bdir):
            raise IOError(f"backup rename failed: {path} -> {backup_path}")
    if not fs.rename(staging, target):
        raise IOError(f"staging swap failed: {staging} -> {path}")
    return backup_path


def archive_files(spark: SparkSession, files: list[str], archive_dir: str) -> list[str]:
    """Move processed source files to ``archive_dir`` (commit marker).
    Returns the files successfully archived; failures are left in place
    for retry, mirroring the reference's semantics."""
    fs, adir, jvm = _fs(spark, archive_dir)
    fs.mkdirs(adir)
    moved = []
    for f in files:
        src = jvm.org.apache.hadoop.fs.Path(f)
        dst = jvm.org.apache.hadoop.fs.Path(archive_dir + "/" + src.getName())
        if fs.exists(src) and fs.rename(src, dst):
            moved.append(f)
    return moved
