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


def spread_width(spark: SparkSession) -> int:
    """Partition count for pre-join round-robin spreads (the d2b/d2h
    pattern: the probe side arrives as one input split, so it is
    repartitioned BEFORE a pair-enumerating join to parallelize the pair
    stream). These stages are COMPUTE-bound (each probe row fans out into
    its bucket's pair stream), so the width must track cores, not the
    byte-sized ``spark.sql.shuffle.partitions`` — benchmarked on d2b at
    sf0.1: width 8 = 27 s, width 2×cores = 9.7 s on local[32]. The 2×
    oversubscription evens out per-bucket skew between tasks."""
    return max(
        2 * spark.sparkContext.defaultParallelism,
        int(spark.conf.get("spark.sql.shuffle.partitions", "32") or 32),
    )


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
