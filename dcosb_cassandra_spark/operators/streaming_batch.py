"""Batch twins of the streaming operators (SURVEY.md §2.C). Strategy per
SURVEY: each streaming op is implemented batch-first (oracle-checkable on
the parquet `events` table), with the actual Structured Streaming form in
``streaming/streams.py`` behind the same semantics — the DuckDB oracle can
only check batch results.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import table
from ..registry import query

# C1 tumbling window = headline tumbling_window_events


@query(
    "c2_sliding_window",
    oracle="""
        SELECT make_timestamp(((epoch_us(ts) // 900000000) - k.k) * 900000000) AS w_start,
               count(*) AS n, round(sum(value), 4) AS total
        FROM events CROSS JOIN (VALUES (0), (1), (2), (3)) AS k(k)
        GROUP BY 1
    """,
    tags=("C2", "P1"),
)
def c2_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window 1h/15m via F.window — each event lands in exactly 4
    overlapping windows (duration/slide). The oracle twin materializes the
    same 4 windows arithmetically. Streaming form: identical groupBy over
    readStream + watermark."""
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("total"))
        .select(F.col("w.start").alias("w_start"), "n", "total")
    )


@query(
    "c3_session_window",
    oracle="""
        WITH flagged AS (
            SELECT user_id, ts,
                   CASE WHEN lag(ts) OVER w IS NULL
                             OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
                        THEN 1 ELSE 0 END AS new_session
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        ), numbered AS (
            SELECT user_id, ts,
                   sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                          ROWS UNBOUNDED PRECEDING) AS session_id
            FROM flagged
        )
        SELECT user_id, min(ts) AS session_start, max(ts) AS session_last, count(*) AS n_events
        FROM numbered GROUP BY user_id, session_id
    """,
    tags=("C3", "P1"),
)
def c3_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (30 min gap) via F.session_window; the oracle twin is
    the gaps-and-islands composition — cross-validating Spark's native
    session assignment against first principles. Gap semantics: a new
    session starts when ts >= prev + gap (Spark merges only ts < prev+gap).

    Scale: session_window is one shuffle on user_id + per-key merge; the
    gaps-and-islands twin is the same shuffle + two window passes."""
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy(F.session_window("ts", "30 minutes").alias("w"), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n_events"), F.max("ts").alias("session_last"))
        .select("user_id", F.col("w.start").alias("session_start"), "session_last", "n_events")
    )


@query(
    "c4_watermark_filter",
    oracle="""
        SELECT event_type, count(*) AS n
        FROM events
        WHERE ts >= (SELECT max(ts) FROM events) - INTERVAL 10 MINUTE
        GROUP BY event_type
    """,
    tags=("C4", "P1"),
)
def c4_watermark_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark semantics, batch form: keep only rows within the lateness
    bound of max event time. The 1-row max aggregate is broadcast — the
    scalable way to apply a global bound (no global sort, no collect)."""
    e = table(spark, sf_dir, "events")
    mx = e.agg(F.max("ts").alias("mx"))
    return (
        e.crossJoin(F.broadcast(mx))
        .filter(F.col("ts") >= F.col("mx") - F.expr("INTERVAL 10 MINUTE"))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "c6_stateful_running_counts",
    oracle="""
        SELECT user_id, ts, event_id,
               count(*) OVER w AS n_events,
               CAST(round(sum(CAST(value AS DECIMAL(18,4))) OVER w, 4) AS DOUBLE)
                   AS total_value
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING)
    """,
    tags=("C6", "P1"),
)
def c6_stateful_running_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the C6 custom stateful operator
    (streams.c6_stateful_running_counts, applyInPandasWithState): the
    per-key running (n_events, total_value) the state store holds after
    each event, as a cumulative window. Summing in DECIMAL(18,4) makes the
    running total order-independent (a float running sum is not: DuckDB's
    segment-tree windowed sum and Spark's sequential frame accumulate in
    different orders), then casts back to double for the driver schema.

    Scale: one shuffle on user_id; state per key is O(1) in the streaming
    form, and the batch window partitions on the high-cardinality user key."""
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return e.select(
        "user_id",
        "ts",
        "event_id",
        F.count(F.lit(1)).over(w).alias("n_events"),
        F.round(F.sum(F.col("value").cast("decimal(18,4)")).over(w), 4)
        .cast("double")
        .alias("total_value"),
    )


@query(
    "c7_stream_static_join",
    oracle="""
        SELECT e.event_id, e.user_id, e.event_type, c.c_mktsegment
        FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
    """,
    tags=("C7", "P1"),
)
def c7_stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the C7 stream-static dimension join
    (streams.c7_stream_static_join): events enriched with the customer
    segment. No broadcast hint here — customer scales with SF, so the
    hint decision is left to AQE (the streaming form may hint because a
    static dim snapshot is operator-bounded at plan time)."""
    e = table(spark, sf_dir, "events")
    c = table(spark, sf_dir, "customer")
    return e.join(
        c.select(F.col("c_custkey").alias("user_id"), "c_mktsegment"),
        "user_id",
        "left",
    ).select("event_id", "user_id", "event_type", "c_mktsegment")


@query(
    "c5_stream_dedup",
    oracle="""
        SELECT user_id, event_type, ts AS first_ts, event_id AS first_event_id FROM (
            SELECT user_id, event_type, ts, event_id,
                   row_number() OVER (PARTITION BY user_id, event_type
                                      ORDER BY ts, event_id) AS rn
            FROM events
        ) WHERE rn = 1
    """,
    tags=("C5", "P1"),
)
def c5_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming dedup (dropDuplicates on key, keep-first) in batch form:
    keep the earliest event per (user_id, event_type). The streaming twin is
    dropDuplicatesWithinWatermark in streaming/streams.py; row_number makes
    the batch form deterministic where dropDuplicates is arrival-order."""
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        e.select("user_id", "event_type", "ts", "event_id", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_type", F.col("ts").alias("first_ts"), F.col("event_id").alias("first_event_id"))
    )
