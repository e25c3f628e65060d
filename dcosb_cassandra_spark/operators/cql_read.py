"""CQL-surface read operators (SURVEY.md §2.A, rows A1–A17).

These re-express Apache Cassandra's SELECT surface [PK anchors per SURVEY:
`cql3/statements/SelectStatement.java`, `db/*ReadCommand.java`,
`db/filter/*`] as Spark plans. The Cassandra partition key maps to a
hash-partitionable column, clustering columns to within-partition sort keys
(SURVEY.md §1.2): point reads and slices become pushed-down parquet filters
(Catalyst → PushedFilters, row-group min/max skipping), `PER PARTITION
LIMIT` becomes a ranked window, `token()` becomes `xxhash64`.

Scale notes: every filter here reaches the scan (verify via plans/audit);
none of these operators shuffle except the window/distinct ones, which
shuffle exactly once on the partition key — the same data routing Cassandra
does by token.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import table
from ..registry import query


@query(
    "a01_full_table_scan",
    oracle="SELECT n_nationkey, n_name, n_regionkey FROM nation",
    tags=("A1", "P0"),
)
def a01_full_table_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-range scan over all partitions → plain parquet scan. [PK
    `db/PartitionRangeReadCommand.java`]"""
    return table(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")


@query(
    "a02_point_read_pk",
    oracle="""
        SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
        FROM customer WHERE c_custkey = 42
    """,
    tags=("A2", "P0"),
)
def a02_point_read_pk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-partition lookup: equality on the partition key pushes to the
    scan (min/max + dictionary skipping ≈ Cassandra's bloom-filter/key-cache
    path). [PK `db/SinglePartitionReadCommand.java`]"""
    c = table(spark, sf_dir, "customer")
    return c.filter(F.col("c_custkey") == 42).select(
        "c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"
    )


@query(
    "a03_clustering_slice",
    oracle="""
        SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        FROM lineitem
        WHERE l_orderkey = 7 AND l_linenumber BETWEEN 2 AND 4
    """,
    tags=("A3", "P0"),
)
def a03_clustering_slice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clustering-column range slice within one partition. [PK
    `db/filter/ClusteringIndexSliceFilter.java`]"""
    l = table(spark, sf_dir, "lineitem")
    return l.filter(
        (F.col("l_orderkey") == 7) & F.col("l_linenumber").between(2, 4)
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")


@query(
    "a04_in_partition_keys",
    oracle="""
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
        FROM orders WHERE o_orderkey IN (1, 2, 3, 5, 8, 13, 21, 34, 55, 89)
    """,
    tags=("A4", "P0"),
)
def a04_in_partition_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-partition IN fetch → pushed-down In filter (one scan, not N
    point queries — the right plan at scale). [PK `cql3/restrictions/`]"""
    o = table(spark, sf_dir, "orders")
    return o.filter(F.col("o_orderkey").isin([1, 2, 3, 5, 8, 13, 21, 34, 55, 89])).select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )


@query(
    "a05_token_range_scan",
    oracle="""
        SELECT count(*) AS rows_in_bucket,
               min(md5(CAST(o_orderkey AS VARCHAR))) AS min_token,
               max(md5(CAST(o_orderkey AS VARCHAR))) AS max_token
        FROM orders
        WHERE substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 1) = '0'
    """,
    tags=("A5", "P2"),
)
def a05_token_range_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """token() range scan — the split mechanism of the Spark-Cassandra
    connector. The token is md5(key) here (bit-identical in Spark and
    DuckDB, so the oracle is exact) standing in for Murmur3: same
    semantics — a uniform hash partitions the keyspace into disjoint
    ranges, and one of 16 buckets (first hex nibble) is scanned — exactly
    how a connector splits a 100 TB keyspace scan into independent tasks.
    [PK `cql3/functions/TokenFct.java`, `dht/Murmur3Partitioner.java`]"""
    o = table(spark, sf_dir, "orders")
    tok = F.md5(F.col("o_orderkey").cast("string"))
    return (
        o.select(tok.alias("tok"))
        .filter(F.substring("tok", 1, 1) == "0")
        .agg(
            F.count(F.lit(1)).alias("rows_in_bucket"),
            F.min("tok").alias("min_token"),
            F.max("tok").alias("max_token"),
        )
    )


@query(
    "a06_limit_paging",
    oracle="""
        SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        ORDER BY o_orderkey LIMIT 20
    """,
    tags=("A6", "P0"),
)
def a06_limit_paging(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIMIT/paging: deterministic page = order by key + limit; plans as
    TakeOrderedAndProject (per-partition top-k then merge — no global sort).
    [PK `service/pager/`, `db/filter/DataLimits.java`]"""
    o = table(spark, sf_dir, "orders")
    return o.select("o_orderkey", "o_custkey", "o_totalprice").orderBy("o_orderkey").limit(20)


@query(
    "a07_per_partition_limit",
    oracle="""
        SELECT l_orderkey, l_linenumber, l_quantity FROM (
            SELECT l_orderkey, l_linenumber, l_quantity,
                   row_number() OVER (PARTITION BY l_orderkey
                                      ORDER BY l_linenumber, l_partkey, l_suppkey) AS rn
            FROM lineitem
        ) WHERE rn <= 2
    """,
    tags=("A7", "P0"),
)
def a07_per_partition_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PER PARTITION LIMIT k: first k clustering rows per partition — ranked
    window over (pk → clustering order). One shuffle on the partition key.
    l_linenumber is not unique within an order in this synthetic data, so
    (l_partkey, l_suppkey) break ties deterministically on both engines.
    [PK `db/filter/DataLimits.java`]"""
    l = table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_orderkey").orderBy("l_linenumber", "l_partkey", "l_suppkey")
    return (
        l.select("l_orderkey", "l_linenumber", "l_quantity", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 2)
        .drop("rn")
    )


@query(
    "a08_select_distinct_pk",
    oracle="SELECT DISTINCT user_id FROM events",
    tags=("A8", "P0"),
)
def a08_select_distinct_pk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SELECT DISTINCT partition keys. Partial-distinct map-side, then one
    shuffle on the key. [PK `cql3/statements/SelectStatement.java`]"""
    return table(spark, sf_dir, "events").select("user_id").distinct()


@query(
    "a09_projection_alias",
    oracle="""
        SELECT s_suppkey AS supplier_id, s_name AS supplier_name,
               round(s_acctbal * 1.1, 4) AS projected_balance
        FROM supplier
    """,
    tags=("A9", "P0"),
)
def a09_projection_alias(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection + AS aliases + computed column; column pruning means the
    scan reads exactly 3 columns. [PK `cql3/selection/Selection.java`]"""
    s = table(spark, sf_dir, "supplier")
    return s.select(
        F.col("s_suppkey").alias("supplier_id"),
        F.col("s_name").alias("supplier_name"),
        F.round(F.col("s_acctbal") * 1.1, 4).alias("projected_balance"),
    )


@query(
    "a10_cast_types",
    oracle="""
        SELECT l_orderkey,
               CAST(l_quantity AS INTEGER)  AS qty_int,
               CAST(l_orderkey AS VARCHAR)  AS key_str,
               CAST(l_shipdate AS DATE)     AS ship_day,
               CAST(CAST(l_discount AS DECIMAL(10, 2)) AS VARCHAR) AS disc_dec_str,
               round(l_discount, 2)         AS disc_rnd
        FROM lineitem WHERE l_orderkey <= 10
    """,
    tags=("A10", "P0"),
)
def a10_cast_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CAST across the CQL primitive-type lattice (SURVEY §1.2 type map).
    The decimal cast is exercised but re-cast to string in the output
    projection: a raw DecimalType column hashes differently under the
    driver's pandas canonicalizer (DuckDB decimal -> float64, Spark
    toPandas -> object Decimal) even when values are identical.
    [PK `cql3/functions/CastFcts.java`]"""
    l = table(spark, sf_dir, "lineitem")
    return l.filter(F.col("l_orderkey") <= 10).select(
        "l_orderkey",
        F.col("l_quantity").cast("int").alias("qty_int"),
        F.col("l_orderkey").cast("string").alias("key_str"),
        F.col("l_shipdate").cast("date").alias("ship_day"),
        F.col("l_discount").cast("decimal(10,2)").cast("string").alias("disc_dec_str"),
        F.round("l_discount", 2).alias("disc_rnd"),
    )


@query(
    "a11_filter_contains",
    oracle="""
        SELECT doc_id, lang FROM documents
        WHERE list_contains(string_split(text, ' '), 'database') AND lang = 'en'
    """,
    tags=("A11", "P0"),
)
def a11_filter_contains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AND-only predicates incl. CONTAINS on a collection column (CQL has no
    OR). The collection here is the tokenized text — same shape as a
    Cassandra `list<text>` column. [PK `cql3/restrictions/StatementRestrictions.java`]"""
    d = table(spark, sf_dir, "documents")
    return d.filter(
        F.array_contains(F.split(F.col("text"), " "), "database") & (F.col("lang") == "en")
    ).select("doc_id", "lang")


@query(
    "a12_like_patterns",
    oracle="""
        SELECT count(*) FILTER (WHERE p_name LIKE 'a%')   AS prefix_a,
               count(*) FILTER (WHERE p_name LIKE '%e')   AS suffix_e,
               count(*) FILTER (WHERE p_name LIKE '%ro%') AS contains_ro
        FROM part
    """,
    tags=("A12", "P0"),
)
def a12_like_patterns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIKE prefix/suffix/contains (Cassandra: SASI index). Spark evaluates
    StartsWith/EndsWith/Contains natively in codegen; prefix LIKE also
    pushes to parquet. [PK `index/sasi/`]"""
    p = table(spark, sf_dir, "part")
    return p.agg(
        F.count(F.when(F.col("p_name").like("a%"), 1)).alias("prefix_a"),
        F.count(F.when(F.col("p_name").like("%e"), 1)).alias("suffix_e"),
        F.count(F.when(F.col("p_name").like("%ro%"), 1)).alias("contains_ro"),
    )


@query(
    "a13_allow_filtering",
    oracle="""
        SELECT event_id, user_id, value FROM events
        WHERE event_type = 'click' AND value > 90
    """,
    tags=("A13", "A14", "P0"),
)
def a13_allow_filtering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ALLOW FILTERING: full-scan predicate on non-key columns — Spark's
    default mode; predicates still push to the scan, which is what makes it
    tractable at 100 TB (Cassandra warns instead). [PK `cql3/restrictions/`]"""
    e = table(spark, sf_dir, "events")
    return e.filter((F.col("event_type") == "click") & (F.col("value") > 90)).select(
        "event_id", "user_id", "value"
    )


@query(
    "a14_secondary_index_eq",
    oracle="""
        SELECT c_mktsegment, count(*) AS n, round(sum(c_acctbal), 2) AS bal
        FROM customer WHERE c_mktsegment = 'MACHINERY' GROUP BY c_mktsegment
    """,
    tags=("A14", "P0"),
)
def a14_secondary_index_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equality on a low-cardinality non-key column (Cassandra 2i). Parquet
    dictionary filtering gives the index-like skip. [PK
    `index/internal/CassandraIndex.java`]"""
    c = table(spark, sf_dir, "customer")
    return (
        c.filter(F.col("c_mktsegment") == "MACHINERY")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("c_acctbal"), 2).alias("bal"))
    )


@query(
    "a15_global_aggregates",
    oracle="""
        SELECT count(*) AS n, min(l_quantity) AS min_q, max(l_quantity) AS max_q,
               round(sum(l_quantity), 2) AS sum_q, round(avg(l_quantity), 6) AS avg_q,
               count(DISTINCT l_suppkey) AS n_supp
        FROM lineitem
    """,
    tags=("A15", "B10", "P0"),
)
def a15_global_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ungrouped CQL native aggregates (count/min/max/sum/avg, C* 2.2+).
    [PK `cql3/functions/AggregateFcts.java`]"""
    l = table(spark, sf_dir, "lineitem")
    return l.agg(
        F.count(F.lit(1)).alias("n"),
        F.min("l_quantity").alias("min_q"),
        F.max("l_quantity").alias("max_q"),
        F.round(F.sum("l_quantity"), 2).alias("sum_q"),
        F.round(F.avg("l_quantity"), 6).alias("avg_q"),
        F.countDistinct("l_suppkey").alias("n_supp"),
    )


@query(
    "a16_group_by_key_prefix",
    oracle="""
        SELECT l_orderkey, count(*) AS n_lines, round(sum(l_extendedprice), 2) AS order_total
        FROM lineitem GROUP BY l_orderkey
    """,
    tags=("A16", "B9", "P0"),
)
def a16_group_by_key_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY the partition key (C* 4.0 key-prefix grouping). High
    cardinality group key → partial agg map-side, single shuffle keyed on
    the same column Cassandra hashes on. [PK `SelectStatement.java`]"""
    l = table(spark, sf_dir, "lineitem")
    return l.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.round(F.sum("l_extendedprice"), 2).alias("order_total"),
    )


@query(
    "a16b_group_by_floor",
    oracle="""
        SELECT user_id,
               CAST(to_timestamp((epoch(ts)::BIGINT // 21600) * 21600) AS TIMESTAMP)
                   AS bucket,
               count(*) AS n_events,
               max(value) AS max_value
        FROM events WHERE user_id IN (1, 2, 3) GROUP BY 1, 2
    """,
    tags=("A16", "A29", "C1", "P1"),
)
def a16b_group_by_floor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CQL `GROUP BY floor(ts, 6h)` time-bucket grouping [PK
    CASSANDRA-11871, `cql3/functions/TimeFcts.java` FloorTimestampFunction]
    executed through the CQL front-end: key-prefix grouping plus a
    constant-width bucket on the clustering timestamp. Compiles to a
    codegen'd epoch-micros floor + one hash aggregate keyed on
    (user_id, bucket) — the IN-restricted partition keys reach the scan as
    pushed-down filters."""
    from ..cql import cql

    return cql(
        spark,
        sf_dir,
        "SELECT user_id, floor(ts, 6h) AS bucket, count(*) AS n_events, "
        "max(value) AS max_value FROM events "
        "WHERE user_id IN (1, 2, 3) GROUP BY user_id, floor(ts, 6h)",
    )


@query(
    "a17_order_by_clustering",
    oracle="""
        SELECT l_orderkey, l_linenumber, l_shipdate FROM lineitem
        WHERE l_orderkey IN (3, 4, 5)
        ORDER BY l_orderkey ASC, l_linenumber DESC
    """,
    tags=("A17", "B16", "P0"),
)
def a17_order_by_clustering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER BY clustering columns DESC under a key-restricted query — the
    exact CQL contract (order only valid with restricted partition keys).
    [PK `SelectStatement.java`]"""
    l = table(spark, sf_dir, "lineitem")
    return (
        l.filter(F.col("l_orderkey").isin([3, 4, 5]))
        .select("l_orderkey", "l_linenumber", "l_shipdate")
        .orderBy(F.asc("l_orderkey"), F.desc("l_linenumber"))
    )
