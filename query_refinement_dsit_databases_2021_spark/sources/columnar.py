"""Columnar lake layout: ORC read/write, hive-partitioned parquet
writes, and small-file compaction.

The reference reads CSV and writes pickles (reference:src/client.py,
src/server.py:249-286); a lake deployment of this engine stores every
table as splittable columnar files. Three layout tools the 100 TB
path needs beyond plain ``spark.read.parquet``:

- **ORC**: the second first-class columnar format (some warehouses are
  ORC-native). Same predicate-pushdown/column-pruning story as parquet;
  both directions are one-liners kept here so format choice is a
  config, not a code change.
- **Partitioned writes**: ``partitionBy`` columns become directory
  keys; a filter on them prunes entire directories at plan time
  (PartitionFilters — cheaper than row-group stats, it never opens the
  file). The partition column should be low-cardinality (date, source,
  lang): one directory per value per write task is the small-files
  trap below.
- **Compaction**: streaming/incremental ingest leaves thousands of
  KB-sized files; each costs a task + a footer read, so scan startup
  dominates. Compaction rewrites a directory into ``ceil(bytes /
  target_file_bytes)`` files. Uses a REAL byte measurement of the
  input (file sizes via the JVM filesystem API, not a row-count
  guess), so output files land near the target regardless of schema
  width.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession

DEFAULT_TARGET_FILE_BYTES = 128 * 1024 * 1024


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """Hive-layout write: one ``col=value`` directory level per
    partition column. Filters on those columns become plan-time
    directory pruning for every later reader."""
    df.write.mode(mode).partitionBy(*partition_cols).format(fmt).save(path)


def dir_bytes(spark: SparkSession, path: str) -> int:
    """Total data-file bytes under ``path`` via the Hadoop FileSystem
    API — works on any supported filesystem (local, HDFS, object
    stores), no driver-side Python directory walk."""
    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(hconf)
    return int(fs.getContentSummary(p).getLength())


def compact_small_files(
    spark: SparkSession,
    src: str,
    dest: str,
    fmt: str = "parquet",
    target_file_bytes: int = DEFAULT_TARGET_FILE_BYTES,
) -> int:
    """Rewrite the (possibly thousands-of-tiny-files) dataset at
    ``src`` into ``ceil(bytes/target)`` files at ``dest``; returns the
    output file count. ``coalesce`` (not ``repartition``): compaction
    must not pay a shuffle — tasks just concatenate input splits.

    ``dest`` must differ from ``src``: readers of ``src`` stay
    consistent and the swap is the caller's atomic-rename/metastore
    step (in-place overwrite of a path being read is how jobs lose
    data).

    When the target implies MORE files than the scan's read splits
    (splitting oversized files, not merging small ones), ``coalesce``
    cannot raise the partition count, so this falls back to
    ``repartition`` — that path pays one shuffle, which is the real
    cost of re-cutting large files.
    """
    if src.rstrip("/") == dest.rstrip("/"):
        raise ValueError("compact into a NEW path, then swap — not in place")
    n_files = max(1, math.ceil(dir_bytes(spark, src) / target_file_bytes))
    df = spark.read.format(fmt).load(src)
    n_read = df.rdd.getNumPartitions()
    sized = df.coalesce(n_files) if n_files <= n_read else df.repartition(n_files)
    sized.write.mode("overwrite").format(fmt).save(dest)
    return n_files
