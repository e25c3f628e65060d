"""Headline queries — the 12 benchmark queries from BASELINE.md, used by
``bench.py`` and doubling as P0 coverage for SURVEY.md §2 rows
A15/B1/B2/B4/B9/B10/B12/B13/B31/C1/D1/D3.

Determinism vs the DuckDB oracle (SURVEY.md §5.2): every double aggregate is
rounded at the declared projection on BOTH sides; every ORDER BY feeding a
LIMIT carries a unique tiebreaker column.

Scale notes inline per query: broadcast intent declared for dims, shuffles
keyed on high-cardinality join/group keys, no collect() on unbounded data
(the one exception, the 64-float query vector in knn, is a point lookup).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..plans.shapes import bounded_sort
from ..registry import query


def _disc_price() -> F.Column:
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


@query(
    "q1_pricing_summary",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2)                                   AS sum_qty,
               round(sum(l_extendedprice), 2)                              AS sum_base_price,
               round(sum(l_extendedprice*(1-l_discount)), 2)               AS sum_disc_price,
               round(sum(l_extendedprice*(1-l_discount)*(1+l_tax)), 2)     AS sum_charge,
               round(avg(l_quantity), 6)                                   AS avg_qty,
               round(avg(l_extendedprice), 6)                              AS avg_price,
               round(avg(l_discount), 6)                                   AS avg_disc,
               count(*)                                                    AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '2024-09-01'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
    tags=("A15", "B9", "B26", "P0", "flagship"),
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan→filter→hash-agg→sort. Catalyst plans partial+final
    agg (map-side combine) automatically; 6 output groups so the final
    exchange is trivial at any scale. Filter pushes to the parquet scan."""
    l = table(spark, sf_dir, "lineitem")
    return (
        l.filter(F.col("l_shipdate") <= F.lit("2024-09-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(_disc_price()), 2).alias("sum_disc_price"),
            F.round(F.sum(_disc_price() * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .transform(bounded_sort, "l_returnflag", "l_linestatus")
    )


@query(
    "q3_shipping_priority",
    oracle="""
        SELECT o.o_orderkey,
               round(sum(l.l_extendedprice*(1-l.l_discount)), 2) AS revenue,
               o.o_orderdate
        FROM customer c
        JOIN orders o   ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE c.c_mktsegment = 'BUILDING'
        GROUP BY o.o_orderkey, o.o_orderdate
        ORDER BY revenue DESC, o.o_orderdate, o.o_orderkey
        LIMIT 10
    """,
    tags=("B2", "B9", "B17", "P0"),
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape. customer scales linearly with SF (one mktsegment is
    still ~20% of all customers), so NO explicit broadcast hint — an
    explicit hint cannot be demoted by AQE and would OOM executors at
    100×; AQE promotes the filtered side to broadcast at runtime whenever
    it actually fits. orders⋈lineitem is pinned SHUFFLE_HASH on orderkey:
    both sides key on it (one exchange each, co-partitioned, no sort), and
    at 100 TB orders can never broadcast — without the hint the static
    planner broadcast-COLLECTS all of orders to the driver on every run at
    bench SFs, which is both the wrong scale shape and a ~25 MB
    build-side job per execution. Top-10 plans as TakeOrderedAndProject
    (no global sort materialization)."""
    c = table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = table(spark, sf_dir, "orders", cluster_key="o_orderkey")
    l = table(spark, sf_dir, "lineitem")
    return (
        l.join(o.hint("shuffle_hash"), l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(F.round(F.sum(_disc_price()), 2).alias("revenue"))
        .select("o_orderkey", "revenue", "o_orderdate")
        .orderBy(F.desc("revenue"), "o_orderdate", "o_orderkey")
        .limit(10)
    )


@query(
    "q5_local_supplier",
    oracle="""
        SELECT n.n_name, round(sum(l.l_extendedprice*(1-l.l_discount)), 2) AS revenue
        FROM customer c
        JOIN orders o   ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
        JOIN nation n   ON s.s_nationkey = n.n_nationkey
        JOIN region r   ON n.n_regionkey = r.r_regionkey
        GROUP BY n.n_name
        ORDER BY revenue DESC
    """,
    tags=("B1", "B2", "B9", "P0"),
)
def q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape, 6-way join. orders⋈lineitem is pinned SHUFFLE_HASH
    on orderkey (same rationale as q3: both cached sides arrive
    hashpartitioned(orderkey, N) with the SAME byte-scaled N — the shared
    WARM_CACHE_PARTITIONS/_scaled_partitions count — so the join is
    exchange-free AND sort-free, and at 100 TB orders can never broadcast
    — without the
    hint the static planner broadcast-collects all of orders to the
    driver on every run at bench SFs). customer/supplier scale linearly
    with SF — no hint (an explicit hint cannot be demoted by AQE; AQE
    promotes them to broadcast at runtime when they fit).

    nation/region are FIXED-size dims (25/5 rows at every SF by the TPC-H
    spec), and both have unique join keys — so their inner joins are
    FOLDED at plan build into an `isin` filter (nations whose region
    exists) plus a literal nationkey→name map: d3's folded-literal rule
    applied to dim joins. Exactly equivalent to the broadcast joins
    (unique-keyed inner join ≡ key-membership filter + map lookup) but
    drops two broadcast-build jobs and two exchanges from EVERY run —
    identical at 100 TB because the dims do not scale. The name map is
    applied AFTER the aggregation (25 group rows), not to the ~600 k
    pre-agg stream — groupBy(s_nationkey) and groupBy(n_name) induce the
    same groups because the map is injective on the filtered key set.
    25 output groups."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders", cluster_key="o_orderkey")
    l = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    valid_nk, name_map = _folded_nation_dim(spark, sf_dir)
    return (
        l.join(o.hint("shuffle_hash"), l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, (l.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
        .filter(F.col("s_nationkey").isin(valid_nk) if valid_nk else F.lit(False))
        .groupBy("s_nationkey")
        .agg(F.round(F.sum(_disc_price()), 2).alias("revenue"))
        .select(name_map[F.col("s_nationkey")].alias("n_name"), "revenue")
        .transform(bounded_sort, F.desc("revenue"))
    )


#: (nation path, region path, mtimes) → (valid nationkeys, key→name map col)
_NATION_FOLD_CACHE: dict[tuple, tuple] = {}


def _folded_nation_dim(spark: SparkSession, sf_dir: str):
    """nation⋈region folded to plan-build literals (both dims are spec-fixed
    at 25/5 rows and unique-keyed, so collecting them is bounded at every
    SF). Memoized per (paths, mtimes)."""
    import itertools
    import os

    np_, rp = (os.path.join(sf_dir, f"{t}.parquet") for t in ("nation", "region"))
    key = (np_, rp, os.stat(np_).st_mtime_ns, os.stat(rp).st_mtime_ns)
    if key not in _NATION_FOLD_CACHE:
        nrows = table(spark, sf_dir, "nation").collect()
        rkeys = {r.r_regionkey for r in table(spark, sf_dir, "region").collect()}
        valid = [r.n_nationkey for r in nrows if r.n_regionkey in rkeys]
        if nrows:
            name_map = F.create_map(
                *itertools.chain.from_iterable(
                    (F.lit(r.n_nationkey), F.lit(r.n_name)) for r in nrows
                )
            )
        else:  # empty dim (fresh tenant / empty corpus): typed empty map
            name_map = F.map_from_arrays(
                F.array().cast("array<int>"), F.array().cast("array<string>")
            )
        _NATION_FOLD_CACHE[key] = (valid, name_map)
    return _NATION_FOLD_CACHE[key]


@query(
    "window_top2_per_cust",
    oracle="""
        SELECT * FROM (
            SELECT o_custkey, o_orderkey, o_totalprice,
                   row_number() OVER (PARTITION BY o_custkey
                                      ORDER BY o_totalprice DESC, o_orderkey) AS rn
            FROM orders
        ) WHERE rn <= 2
    """,
    tags=("A7", "B13", "B18", "P0"),
)
def window_top2_per_cust(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group (also CQL `PER PARTITION LIMIT`, SURVEY A7). One
    shuffle on the window partition key; o_orderkey tiebreaker makes
    row_number deterministic. At scale: window key = customer key is the
    natural Cassandra partition key, so skew mirrors data ownership skew —
    AQE skew handling applies to the sort-exchange."""
    from pyspark.sql.window import Window

    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.select("o_custkey", "o_orderkey", "o_totalprice", F.row_number().over(w).cast("long").alias("rn"))
        .filter(F.col("rn") <= 2)
    )


@query(
    "distinct_users_per_type",
    oracle="""
        SELECT event_type, count(DISTINCT user_id) AS u, round(avg(value), 6) AS av
        FROM events GROUP BY event_type ORDER BY event_type
    """,
    tags=("B10", "A15", "P0"),
)
def distinct_users_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct + avg in one agg. Catalyst expands this to a two-stage
    partial-distinct plan (expand + two aggs) — no driver-side distinct."""
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("u"),
            F.round(F.avg("value"), 6).alias("av"),
        )
        .transform(bounded_sort, "event_type")
    )


@query(
    "tumbling_window_events",
    oracle="""
        SELECT date_trunc('hour', ts) AS h, event_type,
               count(*) AS c, round(sum(value), 4) AS s
        FROM events GROUP BY 1, 2 ORDER BY 1, 2
    """,
    tags=("C1", "B26", "P0"),
)
def tumbling_window_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the streaming tumbling-window agg (SURVEY C1; streaming
    form in streaming/streams.py). date_trunc stays in whole-stage codegen.
    The final order is `bounded_sort`: hourly-rollup cardinality is
    O(time span × event types) — ~9k rows/type/year, INDEPENDENT of corpus
    row count — so the single-task total order stays trivial at 100 TB
    while dropping the rangepartitioning exchange + its per-action
    range-bound sampling job (r2's note marked this NOT bounded; revisited:
    the bound is the calendar, not the data)."""
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy(F.date_trunc("hour", "ts").alias("h"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("c"), F.round(F.sum("value"), 4).alias("s"))
        .transform(bounded_sort, "h", "event_type")
    )


@query(
    "json_extract_props",
    oracle="""
        SELECT event_type,
               round(avg(CAST(json_extract_string(props, '$.k') AS INT)), 6) AS avg_k
        FROM events GROUP BY event_type ORDER BY event_type
    """,
    tags=("A28", "B31", "P0"),
)
def json_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CQL fromJson / JSON column path (events.props = '{"k": int}').
    get_json_object is JVM-side codegen — no Python in the hot path."""
    e = table(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("int")
    return (
        e.groupBy("event_type")
        .agg(F.round(F.avg(k), 6).alias("avg_k"))
        .transform(bounded_sort, "event_type")
    )


@query(
    "antijoin_custs_no_orders",
    oracle="""
        SELECT count(*) AS c FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    tags=("B4", "P0"),
)
def antijoin_custs_no_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS as left_anti join, pinned SHUFFLE_HASH: both sides key on
    custkey (column pruning cuts the orders payload to 8 bytes/row before
    its exchange), and orders can never broadcast at 100 TB — without the
    hint the static planner broadcast-COLLECTS every orders custkey to the
    driver on each run, the wrong shape at every scale. When the serving
    cache is already partitioned by custkey the anti-join runs with zero
    exchanges."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").select("o_custkey")
    return (
        c.join(o.hint("shuffle_hash"), c.c_custkey == o.o_custkey, "left_anti")
        .agg(F.count(F.lit(1)).alias("c"))
    )


@query(
    "cube_rollup",
    oracle="""
        SELECT l_returnflag, l_linestatus, round(sum(l_quantity), 2) AS sq
        FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
    """,
    tags=("B12", "P1"),
)
def cube_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP via df.rollup — Catalyst Expand + single hash agg, still
    partial/final so the fact table is aggregated map-side ×3 grouping sets."""
    l = table(spark, sf_dir, "lineitem")
    return l.rollup("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sq")
    )


@query(
    "text_token_counts",
    oracle="""
        SELECT lang, count(*) AS docs, CAST(sum(n_chars) AS BIGINT) AS chars,
               CAST(sum(length(text) - length(replace(text, ' ', '')) + 1) AS BIGINT) AS approx_tokens
        FROM documents GROUP BY lang ORDER BY lang
    """,
    tags=("B25", "D5", "P0"),
)
def text_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace token counting via pure string expressions (no UDF,
    no explode — O(1) memory per row). r14: the space removal is the
    LITERAL `replace` built-in, not `regexp_replace` — same bytes removed
    (the pattern was a literal), no regex engine per row; noop-sink A/B
    at sf0.1: 0.118 -> 0.099 s median-of-7."""
    d = table(spark, sf_dir, "documents")
    approx_tokens = (
        F.length("text") - F.length(F.replace(F.col("text"), F.lit(" "))) + F.lit(1)
    )
    return (
        d.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("docs"),
            F.sum("n_chars").alias("chars"),
            F.sum(approx_tokens).alias("approx_tokens"),
        )
        .transform(bounded_sort, "lang")
    )


@query(
    "knn_top10_vs_query",
    oracle="""
        WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
        SELECT e.vec_id,
               round(list_cosine_similarity(e.embedding::DOUBLE[], q.qe::DOUBLE[]), 6) AS sim
        FROM embeddings e, q
        WHERE e.vec_id <> 0
        ORDER BY sim DESC, e.vec_id
        LIMIT 10
    """,
    tags=("D3", "B29", "P0"),
)
def knn_top10_vs_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k vs one query vector (SURVEY D3). The query
    vector is a point lookup (collect of 1 row) embedded as a literal array →
    the corpus scan needs NO join, stays embarrassingly parallel, and top-10
    plans as TakeOrderedAndProject. Scale path for many queries / all-pairs
    is the LSH-bucketed variant in llm_similarity.py."""
    from ..functions.vectors import cosine_sim_to_literal

    e = table(spark, sf_dir, "embeddings")
    qrow = e.filter(F.col("vec_id") == 0).select("embedding").head()
    if qrow is None:  # empty corpus: keep the schema, return no rows
        return e.select("vec_id", F.lit(0.0).alias("sim")).filter(F.lit(False))
    sim = cosine_sim_to_literal(F.col("embedding"), [float(x) for x in qrow[0]])
    return (
        e.filter(F.col("vec_id") != 0)
        .select("vec_id", F.round(sim, 6).alias("sim"))
        .orderBy(F.desc("sim"), "vec_id")
        .limit(10)
    )


@query(
    "exact_dedup_docs",
    oracle="SELECT count(DISTINCT text) AS n_unique FROM documents",
    tags=("D1", "B10", "P0"),
)
def exact_dedup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup cardinality (keep-one-per-text). The full dedup operator
    (which rows survive) is llm_dedup.exact_dedup_keep_min; this headline
    entry is the count shape from BASELINE.md.

    Distinct runs on sha2-256 digests, not raw text (same collision-free
    contract as D1's digest groupBy): the map-side partial distinct then
    shuffles 64-byte digests instead of document bodies — at 100 TB the
    exchange carries ~0.1% of the corpus bytes, and locally it drops the
    text-payload exchange that made this the worst headline ratio (r6:
    20.8× baseline)."""
    d = table(spark, sf_dir, "documents")
    return d.agg(F.countDistinct(F.sha2(F.col("text"), 256)).alias("n_unique"))
