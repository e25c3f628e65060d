"""Mutation-log builders (SURVEY.md §7 Phase 3 model).

The parquet snapshot has no real write traffic, so the `events` stream
stands in as a deterministic mutation log: each event is an upsert to a
wide-column table keyed by Cassandra-style (partition key, clustering key) =
(user_id, event_type), carrying writetime = microseconds of `ts` (Cassandra
writetime is epoch-micros [PK `cql3/selection/Selectable.java`]). 'error'
events double as tombstones for the row-delete fixtures. Every builder is a
pure projection, so the DuckDB oracle can rebuild the identical log in SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table


def upsert_log(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every event as an upsert: keys (user_id, event_type), payload value,
    writetime µs, mutation id for deterministic tie-break."""
    e = table(spark, sf_dir, "events")
    return e.select(
        "user_id",
        "event_type",
        F.col("value").alias("payload"),
        F.unix_micros("ts").alias("writetime"),
        F.col("event_id").alias("mutation_id"),
        F.lit(False).alias("tombstone"),
    )


def row_mutation_log(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-key table (user_id): upserts from every event; 'error' events
    are row tombstones (DELETE FROM user_state WHERE user_id = ?)."""
    e = table(spark, sf_dir, "events")
    return e.select(
        "user_id",
        F.col("event_type").alias("payload_type"),
        F.col("value").alias("payload"),
        F.unix_micros("ts").alias("writetime"),
        F.col("event_id").alias("mutation_id"),
        (F.col("event_type") == "error").alias("tombstone"),
    )
