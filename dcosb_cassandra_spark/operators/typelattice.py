"""Type-lattice edge coverage (SURVEY §1.2): the CQL primitive types whose
Spark mappings are non-obvious and which round 1 left without dedicated
oracle-checked queries — duration/interval arithmetic, varint (arbitrary
precision integer), inet, and frozen UDT/tuple (struct) navigation.

Output-projection rule (round-2 driver lesson): only scalar columns reach
the final projection — big integers serialize as strings (the driver's
pandas canonicalizer treats Decimal as an opaque object), structs are
navigated down to their scalar fields before emission.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import query


@query(
    "t01_duration_arithmetic",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               l_shipdate + INTERVAL 5 DAY                          AS ship_plus5,
               l_shipdate + INTERVAL 36 HOUR + INTERVAL 30 MINUTE   AS ship_plus_36h30m,
               date_diff('day', DATE '1992-01-01', CAST(l_shipdate AS DATE))
                                                                    AS days_since_epoch92
        FROM lineitem WHERE l_orderkey <= 50
    """,
    tags=("A10", "A29", "B26", "P1"),
)
def t01_duration_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CQL `duration` ≈ DayTimeIntervalType: timestamp + day duration,
    timestamp + mixed hour/minute duration, and timestamp subtraction
    yielding a day count. Pure JVM expressions — interval arithmetic stays
    inside whole-stage codegen, filter pushed to the scan.
    [PK `cql3/Duration.java`]"""
    l = table(spark, sf_dir, "lineitem")
    return l.filter(F.col("l_orderkey") <= 50).select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_shipdate") + F.expr("INTERVAL 5 DAY")).alias("ship_plus5"),
        (F.col("l_shipdate") + F.expr("INTERVAL '36:30' HOUR TO MINUTE"))
        .alias("ship_plus_36h30m"),
        F.datediff(F.col("l_shipdate").cast("date"), F.lit("1992-01-01").cast("date"))
        .cast("long")
        .alias("days_since_epoch92"),
    )


@query(
    "t02_varint_decimal",
    oracle="""
        SELECT o_orderstatus,
               CAST(max(CAST(o_orderkey AS HUGEINT) * o_orderkey * 1000000000) AS VARCHAR)
                   AS max_big,
               CAST(sum(CAST(o_orderkey AS HUGEINT) * o_orderkey * 1000000000) AS VARCHAR)
                   AS sum_big,
               count(*) AS n
        FROM orders GROUP BY o_orderstatus
    """,
    tags=("A10", "A32", "P1"),
)
def t02_varint_decimal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CQL `varint` ≈ DecimalType(38,0): exact integer arithmetic past the
    int64 range (key² × 1e9 ≈ 10²² at sf1). Spark decimals and DuckDB
    HUGEINT are both exact, so max/sum agree digit-for-digit; serialized
    as strings in the projection (no raw DecimalType output — the
    driver's pandas canonicalizer keeps Spark Decimals opaque).
    [PK `cql3/CQL3Type.java` varint row]"""
    o = table(spark, sf_dir, "orders")
    big = F.col("o_orderkey").cast("decimal(19,0)")
    prod = big * big * F.lit(1000000000)
    return (
        o.select("o_orderstatus", prod.alias("big"))
        .groupBy("o_orderstatus")
        .agg(
            F.max("big").cast("string").alias("max_big"),
            F.sum("big").cast("decimal(38,0)").cast("string").alias("sum_big"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@query(
    "t03_inet_functions",
    oracle="""
        SELECT c_custkey,
               concat(CAST(10 AS VARCHAR), '.',
                      CAST((c_custkey // 65536) % 256 AS VARCHAR), '.',
                      CAST((c_custkey // 256) % 256 AS VARCHAR), '.',
                      CAST(c_custkey % 256 AS VARCHAR))                    AS ip,
               ((c_custkey // 65536) % 256) * 65536
                 + ((c_custkey // 256) % 256) * 256 + c_custkey % 256      AS host_num,
               concat(CAST(10 AS VARCHAR), '.',
                      CAST((c_custkey // 65536) % 256 AS VARCHAR), '.',
                      CAST((c_custkey // 256) % 256 AS VARCHAR), '.0/24')  AS subnet24
        FROM customer WHERE c_custkey <= 300
    """,
    tags=("A10", "A31", "P1"),
)
def t03_inet_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CQL `inet` ≈ canonical string + numeric form: synthesize an IPv4
    from the key (octet decomposition), round-trip it back to its host
    number, and derive the /24 subnet — the three ops an inet-typed column
    actually sees (storage, comparison, prefix grouping). All integer/
    string expressions, JVM-side. [PK `serializers/InetAddressSerializer.java`]"""
    c = table(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    o2 = (F.floor(k / 65536) % 256).cast("long")
    o3 = (F.floor(k / 256) % 256).cast("long")
    o4 = (k % 256).cast("long")
    return c.filter(k <= 300).select(
        "c_custkey",
        F.concat_ws(".", F.lit("10"), o2.cast("string"), o3.cast("string"), o4.cast("string"))
        .alias("ip"),
        (o2 * 65536 + o3 * 256 + o4).alias("host_num"),
        F.concat(
            F.lit("10."), o2.cast("string"), F.lit("."), o3.cast("string"), F.lit(".0/24")
        ).alias("subnet24"),
    )


@query(
    "t04_udt_struct_navigation",
    oracle="""
        SELECT c_custkey,
               (struct_pack(addr := struct_pack(seg := c_mktsegment,
                                                bal := round(c_acctbal, 2)),
                            k := c_custkey)).addr.seg  AS seg,
               (struct_pack(addr := struct_pack(seg := c_mktsegment,
                                                bal := round(c_acctbal, 2)),
                            k := c_custkey)).addr.bal  AS bal,
               (struct_pack(addr := struct_pack(seg := c_mktsegment,
                                                bal := round(c_acctbal, 2)),
                            k := c_custkey)).k         AS k
        FROM customer WHERE c_custkey <= 100
    """,
    tags=("A10", "A28", "P1"),
)
def t04_udt_struct_navigation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frozen UDT / tuple ≈ StructType: build a nested UDT value (address
    inside profile), then navigate `profile.addr.seg` — field access is a
    zero-cost projection in Catalyst (no shuffle, no UDF). Only the
    navigated scalar fields reach the output projection (struct columns
    are banned there). [PK `cql3/CQL3Type.java` UDT/tuple rows]"""
    c = table(spark, sf_dir, "customer")
    profile = F.struct(
        F.struct(
            F.col("c_mktsegment").alias("seg"),
            F.round("c_acctbal", 2).alias("bal"),
        ).alias("addr"),
        F.col("c_custkey").alias("k"),
    )
    return (
        c.filter(F.col("c_custkey") <= 100)
        .select("c_custkey", profile.alias("profile"))
        .select(
            "c_custkey",
            F.col("profile.addr.seg").alias("seg"),
            F.col("profile.addr.bal").alias("bal"),
            F.col("profile.k").alias("k"),
        )
    )
