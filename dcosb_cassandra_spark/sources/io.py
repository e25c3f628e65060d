"""Sources & sinks (SURVEY.md §2 scope: the reference's integration posture
is bulk read/write — BASELINE.json `spark_approach`). The engine's native
format is parquet (the bulk-loaded Cassandra snapshot); CSV and JSON(L) are
supported as interchange formats, plus the streaming sinks in
streaming/streams.py (memory, foreachBatch; parquet via the same writer).

Scale notes: writers repartition to a target file count (small-files
control — the compaction maintenance Cassandra does in the LSM, done here
at write time); readers take explicit schemas (schema inference is a full
extra pass at 100 TB and is disabled on the hot path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_parquet(df: DataFrame, path: str, n_files: int = 1, partition_by: list[str] | None = None) -> None:
    w = df.repartition(n_files).write.mode("overwrite")
    if partition_by:
        w = df.repartition(n_files, *partition_by).write.mode("overwrite").partitionBy(*partition_by)
    w.parquet(path)


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def write_csv(df: DataFrame, path: str, n_files: int = 1) -> None:
    (
        df.repartition(n_files)
        .write.mode("overwrite")
        .option("header", True)
        .option("timestampFormat", "yyyy-MM-dd HH:mm:ss.SSSSSS")
        .option("timestampNTZFormat", "yyyy-MM-dd HH:mm:ss.SSSSSS")
        .csv(path)
    )


def read_csv(spark: SparkSession, path: str, schema: str) -> DataFrame:
    return (
        spark.read.schema(schema)
        .option("header", True)
        .option("timestampFormat", "yyyy-MM-dd HH:mm:ss.SSSSSS")
        .option("timestampNTZFormat", "yyyy-MM-dd HH:mm:ss.SSSSSS")
        .csv(path)
    )


def write_jsonl(df: DataFrame, path: str, n_files: int = 1) -> None:
    (
        df.repartition(n_files)
        .write.mode("overwrite")
        .option("timestampFormat", "yyyy-MM-dd HH:mm:ss.SSSSSS")
        .option("timestampNTZFormat", "yyyy-MM-dd HH:mm:ss.SSSSSS")
        .json(path)
    )


def read_jsonl(spark: SparkSession, path: str, schema: str) -> DataFrame:
    return (
        spark.read.schema(schema)
        .option("timestampFormat", "yyyy-MM-dd HH:mm:ss.SSSSSS")
        .option("timestampNTZFormat", "yyyy-MM-dd HH:mm:ss.SSSSSS")
        .json(path)
    )


def write_orc(df: DataFrame, path: str, n_files: int = 1) -> None:
    """ORC sink (Spark-native columnar alternative; zlib by default) —
    same small-files-controlled writer shape as parquet."""
    df.repartition(n_files).write.mode("overwrite").orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)
