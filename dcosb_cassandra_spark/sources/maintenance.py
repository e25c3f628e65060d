"""Storage maintenance jobs — the Spark analogue of Cassandra's background
LSM machinery (SURVEY.md §4.1: compaction strategies → file compaction;
token-aware layout → bucketing).

- ``compact_small_files``: rewrite a directory of many small parquet files
  into few right-sized ones (size-tiered compaction's goal, done at rest).
  Small files are the #1 silent killer of 100 TB scans: each file costs a
  task + footer read + seek.
- ``write_bucketed``: persist a table bucketed+sorted by its join key. Two
  tables bucketed the same way join with ZERO exchanges (verified by plan
  test) — the batch equivalent of Cassandra routing both datasets by the
  same partition token.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import DataFrame, SparkSession


def parquet_files(path: str) -> list[str]:
    return sorted(glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True))


def compact_small_files(spark: SparkSession, path: str, target_files: int) -> tuple[int, int]:
    """Rewrite ``path`` in place to ``target_files`` parquet files.
    Returns (files_before, files_after)."""
    before = len(parquet_files(path))
    df = spark.read.parquet(path)
    tmp = path.rstrip("/") + ".compacting"
    df.repartition(target_files).write.mode("overwrite").parquet(tmp)
    # atomic-ish swap (single-FS rename, same as a compaction commit)
    import shutil

    shutil.rmtree(path)
    os.rename(tmp, path)
    return before, len(parquet_files(path))


def write_bucketed(
    df: DataFrame, name: str, bucket_col: str, n_buckets: int = 8
) -> None:
    """Persist as a bucketed+sorted managed table (requires a warehouse
    dir on the session). Joins between tables bucketed identically on the
    join key need no shuffle on either side."""
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .saveAsTable(name)
    )
