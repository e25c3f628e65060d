"""SparkSession factory.

Scale posture (SURVEY.md §2 "100 TB design rules"): AQE on (runtime
join-strategy switch, skew-join splitting, partition coalescing), shuffle
partitions sized for the local harness via env, UTC session timezone so
timestamp semantics match the tz-naive parquet + DuckDB oracle.
On a real cluster the same code runs unchanged — only master/memory/shuffle
partitions change, and those are all injected here.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "dcosb-cassandra-spark", cpus: str | None = None) -> SparkSession:
    cpus = cpus or os.environ.get("SPARK_GRAFT_CPUS") or "*"
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", os.environ.get("SPARK_SHUFFLE_PARTITIONS", "32"))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
    )
    return builder.getOrCreate()


def ensure_engine_conf(spark: SparkSession) -> SparkSession:
    """Pin the runtime-settable confs this engine's semantics depend on.

    Called by the catalog loader so queries behave identically even when the
    harness hands us a SparkSession we did not build (the driver does).
    UTC matters: parquet timestamps are tz-naive and the DuckDB oracle
    truncates/compares them naively (FIXTURES.md "Oracle-parity gotchas").
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    # Streaming micro-batches don't get AQE partition coalescing, so a
    # driver-built session's default 200 shuffle partitions means 200
    # state-store tasks per tiny micro-batch — pin to the engine default.
    spark.conf.set(
        "spark.sql.shuffle.partitions", os.environ.get("SPARK_SHUFFLE_PARTITIONS", "32")
    )
    # events.ts is parquet TIMESTAMP(NANOS); Spark 4 only reads it via this
    # legacy flag (as a nanos long) — the catalog converts it to micros.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark
