"""Window-function operators (SURVEY.md §2 B13–B15). One shuffle on the
window partition key each; deterministic ORDER BY (unique tiebreakers) for
any row_number/ntile-based ranking, while rank/dense_rank/percent_rank keep
real ties (tie-stable by definition).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import table
from ..registry import query


@query(
    "b13_ranking_suite",
    oracle="""
        SELECT o_orderkey, o_orderstatus,
               rank()         OVER w AS rk,
               dense_rank()   OVER w AS drk,
               round(percent_rank() OVER w, 6) AS prk,
               ntile(4) OVER (PARTITION BY o_orderstatus
                              ORDER BY o_totalprice DESC, o_orderkey) AS quartile
        FROM orders
        WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC)
    """,
    tags=("B13", "P0"),
)
def b13_ranking_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank/dense_rank/percent_rank over a tied ordering (tie-stable) +
    ntile over a unique ordering (tiebreaker required for determinism)."""
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy(F.desc("o_totalprice"))
    wt = Window.partitionBy("o_orderstatus").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return o.select(
        "o_orderkey",
        "o_orderstatus",
        F.rank().over(w).cast("long").alias("rk"),
        F.dense_rank().over(w).cast("long").alias("drk"),
        F.round(F.percent_rank().over(w), 6).alias("prk"),
        F.ntile(4).over(wt).cast("long").alias("quartile"),
    )


@query(
    "b14_lag_lead",
    oracle="""
        SELECT event_id, user_id,
               round(value, 4)                                  AS v,
               round(lag(value)  OVER w, 4)                     AS prev_v,
               round(lead(value) OVER w, 4)                     AS next_v,
               round(first_value(value) OVER w, 4)              AS first_v,
               lag(ts) OVER w                                   AS prev_ts
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    tags=("B14", "P0"),
)
def b14_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead/first_value per user over event time — the building block of
    sessionization (C3) and as-of joins (B6)."""
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "event_id",
        "user_id",
        F.round("value", 4).alias("v"),
        F.round(F.lag("value").over(w), 4).alias("prev_v"),
        F.round(F.lead("value").over(w), 4).alias("next_v"),
        F.round(F.first("value").over(w), 4).alias("first_v"),
        F.lag("ts").over(w).alias("prev_ts"),
    )


@query(
    "b15_frame_windows",
    oracle="""
        SELECT event_id, user_id,
               round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING), 4)           AS running_sum,
               round(avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                      ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 6) AS moving_avg,
               count(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)       AS frame_n
        FROM events
    """,
    tags=("B15", "P1"),
)
def b15_frame_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-spec windows: running sum + 4-row moving average. Accumulation
    order is the explicit ORDER BY on both engines, so double sums are
    bit-stable (rounded anyway)."""
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    frame = w.rowsBetween(-3, Window.currentRow)
    return e.select(
        "event_id",
        "user_id",
        F.round(F.sum("value").over(running), 4).alias("running_sum"),
        F.round(F.avg("value").over(frame), 6).alias("moving_avg"),
        F.count(F.lit(1)).over(frame).alias("frame_n"),
    )
