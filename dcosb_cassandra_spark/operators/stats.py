"""Statistical aggregates + time-series utilities (SURVEY.md §2 B9/B11
breadth): exact percentiles, moments (stddev/corr/covar), arg-extremes
(max_by/min_by), ordered string aggregation, and tumbling windows with
calendar gap fill — the last mile of a real analytics surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import query


@query(
    "b_percentiles",
    oracle="""
        SELECT o_orderstatus,
               round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
               round(quantile_cont(o_totalprice, 0.9), 4) AS p90,
               round(quantile_cont(o_totalprice, 0.99), 4) AS p99
        FROM orders GROUP BY o_orderstatus
    """,
    tags=("B9", "P1"),
)
def b_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (Spark `percentile` ≡ DuckDB
    `quantile_cont`). Scale note: exact percentiles sort per group — at
    100 TB switch to `approx_percentile` (t-digest sketch, mergeable,
    no per-group sort); kept exact here for the oracle."""
    o = table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.round(F.expr("percentile(o_totalprice, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(o_totalprice, 0.9)"), 4).alias("p90"),
        F.round(F.expr("percentile(o_totalprice, 0.99)"), 4).alias("p99"),
    )


@query(
    "b_approx_percentiles",
    oracle="""
        SELECT o_orderstatus,
               round(quantile_cont(o_totalprice, 0.5), 2) AS exact_p50,
               true AS p50_within_2pct,
               true AS p99_within_2pct
        FROM orders GROUP BY o_orderstatus
    """,
    tags=("B11", "P1"),
)
def b_approx_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based percentiles — the 100 TB path (mergeable, single
    pass). The sketch outputs are engine-specific, so the oracle checks
    the error contract: approx p50/p99 (accuracy 1000) within 2% of the
    exact percentile_cont computed on BOTH engines, plus the exact median
    value itself."""
    o = table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.percentile("o_totalprice", F.lit(0.5)).alias("exact_p50_raw"),
            F.percentile("o_totalprice", F.lit(0.99)).alias("exact_p99_raw"),
            F.approx_percentile("o_totalprice", F.lit(0.5), F.lit(1000)).alias("a50"),
            F.approx_percentile("o_totalprice", F.lit(0.99), F.lit(1000)).alias("a99"),
        )
        .select(
            "o_orderstatus",
            F.round("exact_p50_raw", 2).alias("exact_p50"),
            (F.abs(F.col("a50") - F.col("exact_p50_raw")) <= 0.02 * F.col("exact_p50_raw"))
            .alias("p50_within_2pct"),
            (F.abs(F.col("a99") - F.col("exact_p99_raw")) <= 0.02 * F.col("exact_p99_raw"))
            .alias("p99_within_2pct"),
        )
    )


@query(
    "b_moments",
    oracle="""
        SELECT l_returnflag,
               round(stddev_samp(l_quantity), 6)                 AS sd_qty,
               round(var_samp(l_discount), 6)                    AS var_disc,
               round(corr(l_quantity, l_extendedprice), 6)       AS corr_qty_price,
               round(covar_samp(l_quantity, l_extendedprice), 4) AS covar_qty_price
        FROM lineitem GROUP BY l_returnflag
    """,
    tags=("B9", "P1"),
)
def b_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second moments + correlation. All single-pass mergeable aggregates
    (Welford-style partials) — safe at any scale. (skewness is excluded
    from the oracle pair: Spark computes population g1, DuckDB the
    bias-corrected sample G1 — a definition difference, not a bug.)"""
    l = table(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_quantity"), 6).alias("sd_qty"),
        F.round(F.var_samp("l_discount"), 6).alias("var_disc"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias("covar_qty_price"),
    )


@query(
    "b_arg_extremes",
    oracle="""
        WITH ranked AS (
            SELECT user_id, event_id, value,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY value DESC, event_id DESC) AS rmax,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY value ASC, event_id ASC) AS rmin
            FROM events
        )
        SELECT user_id,
               max(CASE WHEN rmax = 1 THEN event_id END) AS max_value_event,
               max(CASE WHEN rmin = 1 THEN event_id END) AS min_value_event,
               round(max(value), 4)                      AS max_value
        FROM ranked GROUP BY user_id
    """,
    tags=("B9", "P1"),
)
def b_arg_extremes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """max_by/min_by (argmax/argmin) — the 'which row had the extreme'
    aggregate, one pass, no self-join back. `value` HAS exact ties in this
    corpus, so the sort key is the compound (value, event_id) — lexicographic
    struct/list comparison on both engines makes the arg deterministic."""
    e = table(spark, sf_dir, "events")
    key = F.struct(F.col("value"), F.col("event_id"))
    return e.groupBy("user_id").agg(
        F.max_by("event_id", key).alias("max_value_event"),
        F.min_by("event_id", key).alias("min_value_event"),
        F.round(F.max("value"), 4).alias("max_value"),
    )


@query(
    "b_string_agg",
    oracle="""
        SELECT n_regionkey,
               string_agg(n_name, ',' ORDER BY n_name) AS nations
        FROM nation GROUP BY n_regionkey
    """,
    tags=("B9", "A23", "P1"),
)
def b_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (listagg): collect → sort → join keeps
    the result deterministic regardless of partial-agg merge order."""
    n = table(spark, sf_dir, "nation")
    return n.groupBy("n_regionkey").agg(
        F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias("nations")
    )


@query(
    "c1b_gap_filled_hours",
    oracle="""
        WITH hours AS (
            SELECT unnest(generate_series(
                       (SELECT date_trunc('hour', min(ts)) FROM events),
                       (SELECT date_trunc('hour', max(ts)) FROM events),
                       INTERVAL 1 HOUR)) AS h
        ),
        agg AS (
            SELECT date_trunc('hour', ts) AS h, count(*) AS n, round(sum(value), 4) AS total
            FROM events GROUP BY 1
        )
        SELECT hours.h, coalesce(agg.n, 0) AS n, coalesce(agg.total, 0.0) AS total
        FROM hours LEFT JOIN agg ON agg.h = hours.h
    """,
    tags=("C1", "B26", "P1"),
)
def c1b_gap_filled_hours(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling hourly aggregate with calendar gap fill: generate the full
    hour spine with `sequence()` (one row → exploded — never a driver-side
    date loop), left-join the aggregates, zero-fill misses. The spine side
    is tiny and broadcast; the agg side carries the data."""
    e = table(spark, sf_dir, "events")
    bounds = e.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"), F.date_trunc("hour", F.max("ts")).alias("hi")
    )
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias("h")
    )
    agg = e.groupBy(F.date_trunc("hour", "ts").alias("h")).agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("total")
    )
    return (
        spine.join(agg, "h", "left")
        .select(
            "h",
            F.coalesce("n", F.lit(0)).alias("n"),
            F.coalesce("total", F.lit(0.0)).alias("total"),
        )
    )


@query(
    "c1c_ohlc_downsample",
    oracle="""
        WITH ranked AS (
            SELECT date_trunc('hour', ts) AS h, event_type, value, ts, event_id,
                   row_number() OVER (PARTITION BY date_trunc('hour', ts), event_type
                                      ORDER BY ts ASC, event_id ASC)  AS r_open,
                   row_number() OVER (PARTITION BY date_trunc('hour', ts), event_type
                                      ORDER BY ts DESC, event_id DESC) AS r_close
            FROM events
        )
        SELECT h, event_type,
               round(max(CASE WHEN r_open = 1 THEN value END), 4)  AS open,
               round(max(value), 4)                                AS high,
               round(min(value), 4)                                AS low,
               round(max(CASE WHEN r_close = 1 THEN value END), 4) AS close,
               count(*)                                            AS n
        FROM ranked GROUP BY h, event_type
    """,
    tags=("C1", "B14", "P1"),
)
def c1c_ohlc_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC downsampling (open/high/low/close per hour per type) — the
    canonical time-series rollup, via min_by/max_by on the (ts, event_id)
    compound key: one aggregation pass, no window shuffle, fully
    partial-aggregatable (the arg-extreme carries its sort key in the
    partial state)."""
    e = table(spark, sf_dir, "events")
    h = F.date_trunc("hour", "ts")
    key = F.struct(F.col("ts"), F.col("event_id"))
    return e.groupBy(h.alias("h"), F.col("event_type")).agg(
        F.round(F.min_by("value", key), 4).alias("open"),
        F.round(F.max("value"), 4).alias("high"),
        F.round(F.min("value"), 4).alias("low"),
        F.round(F.max_by("value", key), 4).alias("close"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "b_column_profile",
    oracle="""
        SELECT 'l_orderkey' AS col_name, count(*) AS n_rows,
               count(*) - count(l_orderkey) AS n_nulls,
               count(DISTINCT l_orderkey) AS n_distinct,
               CAST(min(l_orderkey) AS VARCHAR) AS min_s,
               CAST(max(l_orderkey) AS VARCHAR) AS max_s
        FROM lineitem
        UNION ALL
        SELECT 'l_quantity', count(*), count(*) - count(l_quantity),
               count(DISTINCT l_quantity),
               CAST(CAST(min(l_quantity) AS BIGINT) AS VARCHAR),
               CAST(CAST(max(l_quantity) AS BIGINT) AS VARCHAR)
        FROM lineitem
        UNION ALL
        SELECT 'l_returnflag', count(*), count(*) - count(l_returnflag),
               count(DISTINCT l_returnflag), min(l_returnflag), max(l_returnflag)
        FROM lineitem
        UNION ALL
        SELECT 'l_shipdate', count(*), count(*) - count(l_shipdate),
               count(DISTINCT l_shipdate),
               strftime(min(l_shipdate), '%Y-%m-%d %H:%M:%S'),
               strftime(max(l_shipdate), '%Y-%m-%d %H:%M:%S')
        FROM lineitem
    """,
    tags=("B9", "A15", "P2"),
)
def b_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-style column profiler (the `nodetool tablestats` / ANSI
    ANALYZE analogue): per-column row/null/distinct counts and min/max,
    computed for a mixed-type column set (bigint, double, string,
    timestamp) in ONE scan — all 16 aggregates run in a single
    partial+final pass, then the 1-row result unpivots to one row per
    column via stack() (driver-side fan-out of an O(columns) row, not a
    shuffle). min/max serialize to strings so heterogeneous column types
    share one output schema; doubles go through a BIGINT cast (quantities
    are integral) and timestamps through an explicit shared format, so
    both engines render identical text."""
    l = table(spark, sf_dir, "lineitem")
    one = l.agg(
        F.count(F.lit(1)).alias("n"),
        *[F.count(c).alias(f"cnt_{c}") for c in ("l_orderkey", "l_quantity", "l_returnflag", "l_shipdate")],
        *[F.count_distinct(F.col(c)).alias(f"nd_{c}") for c in ("l_orderkey", "l_quantity", "l_returnflag", "l_shipdate")],
        F.min("l_orderkey").cast("string").alias("min_l_orderkey"),
        F.max("l_orderkey").cast("string").alias("max_l_orderkey"),
        F.min("l_quantity").cast("bigint").cast("string").alias("min_l_quantity"),
        F.max("l_quantity").cast("bigint").cast("string").alias("max_l_quantity"),
        F.min("l_returnflag").alias("min_l_returnflag"),
        F.max("l_returnflag").alias("max_l_returnflag"),
        F.date_format(F.min("l_shipdate"), "yyyy-MM-dd HH:mm:ss").alias("min_l_shipdate"),
        F.date_format(F.max("l_shipdate"), "yyyy-MM-dd HH:mm:ss").alias("max_l_shipdate"),
    )
    stack_args = ", ".join(
        f"'{c}', n - cnt_{c}, nd_{c}, min_{c}, max_{c}"
        for c in ("l_orderkey", "l_quantity", "l_returnflag", "l_shipdate")
    )
    return one.select(
        F.expr(
            f"stack(4, {stack_args}) AS (col_name, n_nulls, n_distinct, min_s, max_s)"
        ),
        F.col("n").alias("n_rows"),
    ).select("col_name", "n_rows", "n_nulls", "n_distinct", "min_s", "max_s")
