"""Coverage completers (SURVEY.md §2 stragglers): explicit GROUPING SETS,
multiset INTERSECT/EXCEPT ALL, posexplode, Spark-4 Variant JSON, timeuuid
ordering (the §7 'hard part'), map CONTAINS KEY, and embedding-cosine
near-duplicate pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import register_views, table
from ..functions.vectors import as_double, cosine, sign_bits
from ..registry import query


@query(
    "b12c_grouping_sets",
    oracle="""
        SELECT l_returnflag, l_linestatus, count(*) AS n,
               CAST(grouping(l_returnflag) AS BIGINT) AS g_rf,
               CAST(grouping(l_linestatus) AS BIGINT) AS g_ls
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
    tags=("B12", "P1"),
)
def b12c_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS with grouping() markers (disambiguates real
    NULLs from subtotal rows — the part rollup/cube can't express)."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus, count(*) AS n,
               CAST(grouping(l_returnflag) AS BIGINT) AS g_rf,
               CAST(grouping(l_linestatus) AS BIGINT) AS g_ls
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


@query(
    "b20b_multiset_ops",
    oracle="""
        WITH s AS (SELECT s_nationkey AS nk FROM supplier),
             c AS (SELECT c_nationkey AS nk FROM customer)
        SELECT 'intersect_all' AS op, nk, count(*) AS n FROM (
            SELECT nk FROM s INTERSECT ALL SELECT nk FROM c
        ) GROUP BY nk
        UNION ALL
        SELECT 'except_all' AS op, nk, count(*) AS n FROM (
            SELECT nk FROM c EXCEPT ALL SELECT nk FROM s
        ) GROUP BY nk
    """,
    tags=("B20", "P1"),
)
def b20b_multiset_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL / EXCEPT ALL — bag semantics (occurrence-count aware),
    vs the set forms in b20_intersect_except."""
    s = table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nk"))
    c = table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nk"))
    ia = (
        s.intersectAll(c)
        .groupBy("nk")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("intersect_all").alias("op"), "nk", "n")
    )
    ea = (
        c.exceptAll(s)
        .groupBy("nk")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("except_all").alias("op"), "nk", "n")
    )
    return ia.unionByName(ea)


@query(
    "b22b_posexplode",
    oracle="""
        SELECT doc_id, CAST(i - 1 AS INTEGER) AS pos, token
        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token,
                     unnest(range(1, len(string_split(text, ' ')) + 1)) AS i
              FROM documents WHERE doc_id < 10)
    """,
    tags=("B22", "P1"),
)
def b22b_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode: position-preserving UDTF shape (token position features
    for text pipelines)."""
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 10)
    return d.select("doc_id", F.posexplode(F.split("text", " ")).alias("pos", "token"))


@query(
    "a28b_variant_json",
    oracle="""
        SELECT event_id,
               CAST(json_extract_string(props, '$.k') AS INT) AS k_typed,
               json_extract_string(props, '$.missing')        AS missing_path
        FROM events WHERE event_id <= 60
    """,
    tags=("A28", "P1"),
)
def a28b_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VariantType path: parse_json → variant_get with late typing —
    the semi-structured column model (Cassandra JSON text ≈ open schema).
    Variant binary never leaves the plan; outputs are typed extracts."""
    e = table(spark, sf_dir, "events")
    v = F.parse_json(F.col("props"))
    return e.filter(F.col("event_id") <= 60).select(
        "event_id",
        F.try_variant_get(v, "$.k", "int").alias("k_typed"),
        F.try_variant_get(v, "$.missing", "string").alias("missing_path"),
    )


@query(
    "a29b_timeuuid_ordering",
    oracle="""
        WITH u AS (
            SELECT event_id,
                   printf('%08x-%04x-1%03x-8000-000000000000',
                          (epoch_us(ts) & 4294967295),
                          ((epoch_us(ts) >> 32) & 65535),
                          ((epoch_us(ts) >> 48) & 4095)) AS timeuuid,
                   epoch_us(ts) AS t_micros
            FROM events WHERE event_id <= 100
        )
        SELECT event_id, timeuuid,
               rank() OVER (ORDER BY t_micros) AS time_order,
               rank() OVER (ORDER BY timeuuid) AS lexical_order
        FROM u
    """,
    tags=("A29", "P2"),
)
def a29b_timeuuid_ordering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """timeuuid ordering (SURVEY §7 hard part): v1 UUIDs order by embedded
    timestamp, NOT lexically — the time_low field comes first in the string
    so lexical order scrambles time order. The operator materializes both
    ranks; consumers must sort by the extracted timestamp."""
    e = table(spark, sf_dir, "events").filter(F.col("event_id") <= 100)
    t = F.unix_micros("ts")
    timeuuid = F.format_string(
        "%08x-%04x-1%03x-8000-000000000000",
        t.bitwiseAND(F.lit(4294967295)),
        F.shiftright(t, 32).bitwiseAND(F.lit(65535)),
        F.shiftright(t, 48).bitwiseAND(F.lit(4095)),
    )
    from pyspark.sql.window import Window

    u = e.select("event_id", timeuuid.alias("timeuuid"), t.alias("t_micros"))
    return u.select(
        "event_id",
        "timeuuid",
        F.rank().over(Window.orderBy("t_micros")).cast("long").alias("time_order"),
        F.rank().over(Window.orderBy("timeuuid")).cast("long").alias("lexical_order"),
    )


@query(
    "a11b_map_contains_key",
    oracle="""
        SELECT count(*) FILTER (WHERE json_extract_string(props, '$.k') IS NOT NULL) AS has_k,
               count(*) FILTER (WHERE json_extract_string(props, '$.z') IS NOT NULL) AS has_z
        FROM events
    """,
    tags=("A11", "B30", "P1"),
)
def a11b_map_contains_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CONTAINS KEY over a map column (props parsed as map<string,int>)."""
    e = table(spark, sf_dir, "events")
    m = F.from_json(F.col("props"), "map<string,int>")
    return e.agg(
        F.count(F.when(F.map_contains_key(m, "k"), 1)).alias("has_k"),
        F.count(F.when(F.map_contains_key(m, "z"), 1)).alias("has_z"),
    )


@query(
    "d2e_embedding_near_dup",
    oracle="""
        WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e,
                          (CASE WHEN embedding[1] >= 0 THEN '1' ELSE '0' END)
                          || (CASE WHEN embedding[2] >= 0 THEN '1' ELSE '0' END)
                          || (CASE WHEN embedding[3] >= 0 THEN '1' ELSE '0' END)
                          || (CASE WHEN embedding[4] >= 0 THEN '1' ELSE '0' END) AS bucket
                   FROM embeddings)
        SELECT count(*) AS n_bucket_pairs,
               count(*) FILTER (WHERE sim >= 0.5) AS n_near_dup
        FROM (
            SELECT list_sum(list_transform(range(1, 65), i -> a.e[i] * b.e[i]))
                   / (sqrt(list_sum(list_transform(a.e, x -> x * x)))
                      * sqrt(list_sum(list_transform(b.e, x -> x * x)))) AS sim
            FROM v a JOIN v b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
        )
    """,
    tags=("D2", "D4", "P1"),
)
def d2e_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup detection: LSH-bucketed candidate pairs
    scored by cosine, thresholded. (0.5 on random synthetic vectors; real
    corpora use ~0.95.) Same no-cross-join discipline as d2b/d4."""
    v = table(spark, sf_dir, "embeddings").select(
        "vec_id", as_double(F.col("embedding")).alias("e"), sign_bits(F.col("embedding"), 4).alias("bucket")
    )
    a, b = v.alias("a"), v.alias("b")
    sim = cosine(F.col("a.e"), F.col("b.e"))
    pairs = a.join(
        b, (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.vec_id") < F.col("b.vec_id"))
    ).select(sim.alias("sim"))
    return pairs.agg(
        F.count(F.lit(1)).alias("n_bucket_pairs"),
        F.count(F.when(F.col("sim") >= 0.5, 1)).alias("n_near_dup"),
    )


@query(
    "a_static_column",
    oracle="""
        WITH static AS (
            SELECT user_id, min(ts) AS first_seen FROM events GROUP BY user_id
        )
        SELECT event_id, user_id, first_seen, n_rows_sharing FROM (
            SELECT e.event_id, e.user_id, s.first_seen,
                   count(*) OVER (PARTITION BY e.user_id) AS n_rows_sharing
            FROM events e JOIN static s ON s.user_id = e.user_id
        ) WHERE event_id <= 80
    """,
    tags=("A-static", "P1"),
)
def a_static_column(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cassandra static column (one value per partition, shared by all
    clustering rows — SURVEY §1.2): the per-key static table is derived
    once and joined back onto every row of the partition. No broadcast
    hint — the static table has one row per user (linear in SF); the join
    and the window share the user_id hash partitioning, so the static join
    adds no extra exchange, and AQE still broadcasts it while it fits."""
    from pyspark.sql.window import Window

    e = table(spark, sf_dir, "events")
    static = e.groupBy("user_id").agg(F.min("ts").alias("first_seen"))
    w = Window.partitionBy("user_id")
    return (
        e.join(static, "user_id")
        .withColumn("n_rows_sharing", F.count(F.lit(1)).over(w))
        .filter(F.col("event_id") <= 80)
        .select("event_id", "user_id", "first_seen", "n_rows_sharing")
    )


@query(
    "b21b_scalar_subquery",
    oracle="""
        SELECT o_orderstatus, count(*) AS n_above_avg
        FROM orders
        WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)
        GROUP BY o_orderstatus
    """,
    tags=("B21", "P1"),
)
def b21b_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery (global-average filter) — planned as a
    broadcast of the 1-row subquery result, reused across all partitions."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderstatus, count(*) AS n_above_avg
        FROM orders
        WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)
        GROUP BY o_orderstatus
        """
    )
