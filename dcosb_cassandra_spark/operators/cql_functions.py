"""CQL scalar functions + Spark function buckets (SURVEY.md §2 rows
A27–A32 and B25–B31). All JVM-side built-ins — whole-stage codegen, zero
Python in any expression. [PK anchors: `cql3/functions/*Fcts.java`]

Determinism: time functions use fixed literals instead of now() so the
DuckDB oracle can replay them (SURVEY §5.2); transcendental math is rounded
at the projection (libm vs JVM last-ulp differences).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import query


@query(
    "a27_select_json",
    oracle="""
        SELECT n_nationkey,
               to_json(struct_pack(n_nationkey := n_nationkey, n_name := n_name))::VARCHAR AS row_json
        FROM nation
    """,
    tags=("A27", "P1"),
)
def a27_select_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SELECT JSON / toJson(): typed row → JSON text. [PK
    `cql3/functions/ToJsonFct.java`]"""
    n = table(spark, sf_dir, "nation")
    return n.select(
        "n_nationkey",
        F.to_json(F.struct("n_nationkey", "n_name")).alias("row_json"),
    )


@query(
    "a28_from_json_typed",
    oracle="""
        SELECT event_id, CAST(json_extract_string(props, '$.k') AS INT) AS k
        FROM events WHERE event_id <= 100
    """,
    tags=("A28", "B31", "P0"),
)
def a28_from_json_typed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INSERT JSON / fromJson(): JSON text → typed columns via from_json with
    a declared schema (the Cassandra-style fixed schema, SURVEY §1.1).
    [PK `cql3/functions/FromJsonFct.java`]"""
    e = table(spark, sf_dir, "events")
    parsed = F.from_json(F.col("props"), "k INT")
    return e.filter(F.col("event_id") <= 100).select(
        "event_id", parsed.getField("k").alias("k")
    )


@query(
    "a29_time_functions",
    oracle="""
        SELECT event_id,
               CAST(ts AS DATE)                 AS d,
               year(ts)                         AS y,
               month(ts)                        AS mo,
               hour(ts)                         AS h,
               dayofweek(ts) + 1                AS dow,
               epoch_us(ts) // 1000000          AS unix_s,
               date_trunc('minute', ts)         AS minute_ts
        FROM events WHERE event_id <= 50
    """,
    tags=("A29", "B26", "P0"),
)
def a29_time_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time scalar functions (toDate/toTimestamp/toUnixTimestamp family).
    DuckDB dayofweek is 0-based Sunday, Spark 1-based — offset applied on
    the oracle side. [PK `cql3/functions/TimeFcts.java`]"""
    e = table(spark, sf_dir, "events")
    return e.filter(F.col("event_id") <= 50).select(
        "event_id",
        F.to_date("ts").alias("d"),
        F.year("ts").cast("long").alias("y"),
        F.month("ts").cast("long").alias("mo"),
        F.hour("ts").cast("long").alias("h"),
        F.dayofweek("ts").cast("long").alias("dow"),
        F.unix_timestamp("ts").alias("unix_s"),
        F.date_trunc("minute", "ts").alias("minute_ts"),
    )


@query(
    "a30_uuid_generation",
    oracle="""
        SELECT count(*) AS n_rows,
               true     AS all_wellformed,
               true     AS all_distinct
        FROM nation
    """,
    tags=("A30", "P2"),
)
def a30_uuid_generation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """uuid(): nondeterministic values, so the oracle checks the checkable
    invariants instead of raw uuids — one uuid per source row, every one a
    well-formed RFC-4122 v4 (regexp), all distinct. [PK
    `cql3/functions/UuidFcts.java`]"""
    n = table(spark, sf_dir, "nation")
    rx = "^[0-9a-f]{8}-[0-9a-f]{4}-4[0-9a-f]{3}-[89ab][0-9a-f]{3}-[0-9a-f]{12}$"
    return n.select(F.expr("uuid()").alias("u")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        (F.count(F.when(F.col("u").rlike(rx), 1)) == F.count(F.lit(1))).alias("all_wellformed"),
        (F.countDistinct("u") == F.count(F.lit(1))).alias("all_distinct"),
    )


@query(
    "a31_blob_conversions",
    oracle="""
        SELECT c_custkey,
               md5(c_name)                        AS name_md5,
               hex(c_name::BLOB)                  AS name_hex,
               to_base64(c_name::BLOB)            AS name_b64,
               octet_length(c_name::BLOB)         AS n_bytes
        FROM customer WHERE c_custkey <= 20
    """,
    tags=("A31", "P2"),
)
def a31_blob_conversions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blob conversion functions (textAsBlob/blobAsText, hex). BinaryType is
    also the carrier for multimodal payloads (SURVEY D7). [PK
    `cql3/functions/BytesConversionFcts.java`]"""
    c = table(spark, sf_dir, "customer")
    blob = F.encode(F.col("c_name"), "utf-8")
    return c.filter(F.col("c_custkey") <= 20).select(
        "c_custkey",
        F.md5(blob).alias("name_md5"),
        F.hex(blob).alias("name_hex"),
        F.base64(blob).alias("name_b64"),
        F.octet_length(blob).cast("long").alias("n_bytes"),
    )


@query(
    "a32_arithmetic_ops",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               round(l_extendedprice * (1 - l_discount) * (1 + l_tax), 4) AS charged,
               round(l_extendedprice - l_quantity, 4)  AS diff,
               round(l_extendedprice / l_quantity, 6)  AS unit_price,
               l_linenumber % 3                        AS ln_mod,
               l_shipdate + INTERVAL 30 DAY            AS ship_plus_30
        FROM lineitem WHERE l_orderkey <= 8
    """,
    tags=("A32", "P0"),
)
def a32_arithmetic_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C* 4.0 arithmetic on numerics and timestamps (+ - * / % and
    timestamp+duration). [PK `cql3/functions/OperationFcts.java`]"""
    l = table(spark, sf_dir, "lineitem")
    return l.filter(F.col("l_orderkey") <= 8).select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax")), 4).alias("charged"),
        F.round(F.col("l_extendedprice") - F.col("l_quantity"), 4).alias("diff"),
        F.round(F.col("l_extendedprice") / F.col("l_quantity"), 6).alias("unit_price"),
        (F.col("l_linenumber") % 3).alias("ln_mod"),
        (F.col("l_shipdate") + F.expr("INTERVAL 30 DAY")).alias("ship_plus_30"),
    )


@query(
    "b25_string_functions",
    oracle="""
        SELECT c_custkey,
               upper(c_name)                         AS up,
               lower(c_mktsegment)                   AS lo,
               substr(c_name, 1, 8)                  AS pre,
               concat(c_name, ':', c_mktsegment)     AS joined,
               length(c_name)                        AS len,
               replace(c_name, '#', '-')             AS repl,
               trim(c_name)                          AS trimmed,
               regexp_extract(c_name, '([0-9]+)', 1) AS digits,
               levenshtein(c_mktsegment, 'MACHINERY') AS lev
        FROM customer WHERE c_custkey <= 25
    """,
    tags=("B25", "P0"),
)
def b25_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String function bucket — concat/substr/case/trim/replace/regexp/
    levenshtein, all codegen'd."""
    c = table(spark, sf_dir, "customer")
    return c.filter(F.col("c_custkey") <= 25).select(
        "c_custkey",
        F.upper("c_name").alias("up"),
        F.lower("c_mktsegment").alias("lo"),
        F.substring("c_name", 1, 8).alias("pre"),
        F.concat_ws("", F.col("c_name"), F.lit(":"), F.col("c_mktsegment")).alias("joined"),
        F.length("c_name").cast("long").alias("len"),
        F.regexp_replace("c_name", "#", "-").alias("repl"),
        F.trim(F.col("c_name")).alias("trimmed"),
        F.regexp_extract("c_name", "([0-9]+)", 1).alias("digits"),
        F.levenshtein(F.col("c_mktsegment"), F.lit("MACHINERY")).cast("long").alias("lev"),
    )


@query(
    "b26_date_functions",
    oracle="""
        SELECT o_orderkey,
               CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS order_month,
               year(o_orderdate)                                   AS y,
               quarter(o_orderdate)                                AS q,
               date_diff('day', o_orderdate, TIMESTAMP '2002-01-01') AS days_to_2002,
               o_orderdate + INTERVAL 90 DAY                       AS due,
               last_day(CAST(o_orderdate AS DATE))                 AS month_end
        FROM orders WHERE o_orderkey <= 40
    """,
    tags=("B26", "P0"),
)
def b26_date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time function bucket (trunc/extract/diff/add/last_day)."""
    o = table(spark, sf_dir, "orders")
    return o.filter(F.col("o_orderkey") <= 40).select(
        "o_orderkey",
        F.date_trunc("month", "o_orderdate").alias("order_month"),
        F.year("o_orderdate").cast("long").alias("y"),
        F.quarter("o_orderdate").cast("long").alias("q"),
        F.datediff(F.lit("2002-01-01").cast("date"), F.col("o_orderdate")).cast("long").alias("days_to_2002"),
        (F.col("o_orderdate") + F.expr("INTERVAL 90 DAY")).alias("due"),
        F.last_day("o_orderdate").alias("month_end"),
    )


@query(
    "b27_math_functions",
    oracle="""
        SELECT o_orderkey,
               round(o_totalprice, 1)                    AS r1,
               CAST(floor(o_totalprice) AS BIGINT)       AS fl,
               CAST(ceil(o_totalprice) AS BIGINT)        AS ce,
               abs(o_totalprice - 100000)                AS ab,
               round(sqrt(o_totalprice), 6)              AS sq,
               round(ln(o_totalprice), 6)                AS lg,
               round(pow(o_totalprice, 0.5), 6)          AS pw,
               greatest(o_totalprice, 50000.0)           AS gr,
               least(o_totalprice, 50000.0)              AS le
        FROM orders WHERE o_orderkey <= 40
    """,
    tags=("B27", "P0"),
)
def b27_math_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math function bucket; transcendentals rounded at 6 dp (JVM StrictMath
    vs libm can differ in the last ulp)."""
    o = table(spark, sf_dir, "orders")
    return o.filter(F.col("o_orderkey") <= 40).select(
        "o_orderkey",
        F.round("o_totalprice", 1).alias("r1"),
        F.floor("o_totalprice").alias("fl"),
        F.ceil("o_totalprice").alias("ce"),
        F.abs(F.col("o_totalprice") - 100000).alias("ab"),
        F.round(F.sqrt("o_totalprice"), 6).alias("sq"),
        F.round(F.log("o_totalprice"), 6).alias("lg"),
        F.round(F.pow("o_totalprice", F.lit(0.5)), 6).alias("pw"),
        F.greatest(F.col("o_totalprice"), F.lit(50000.0)).alias("gr"),
        F.least(F.col("o_totalprice"), F.lit(50000.0)).alias("le"),
    )


@query(
    "b28_conditional_functions",
    oracle="""
        SELECT o_orderstatus,
               count(*) AS n,
               count(CASE WHEN o_totalprice > 150000 THEN 1 END)        AS big,
               round(sum(CASE WHEN o_orderpriority LIKE '1%' THEN o_totalprice
                              ELSE 0 END), 2)                            AS urgent_total,
               coalesce(nullif(o_orderstatus, 'P'), 'pending-mapped')    AS status_mapped
        FROM orders GROUP BY o_orderstatus
    """,
    tags=("B28", "P0"),
)
def b28_conditional_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN / coalesce / nullif bucket."""
    o = table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.count(F.when(F.col("o_totalprice") > 150000, 1)).alias("big"),
        F.round(
            F.sum(F.when(F.col("o_orderpriority").like("1%"), F.col("o_totalprice")).otherwise(0.0)), 2
        ).alias("urgent_total"),
        F.coalesce(F.nullif(F.first("o_orderstatus"), F.lit("P")), F.lit("pending-mapped")).alias("status_mapped"),
    )


@query(
    "b29_array_functions",
    oracle="""
        SELECT doc_id,
               len(string_split(text, ' '))                          AS n_tokens,
               len(list_distinct(string_split(text, ' ')))           AS n_unique,
               list_sort(list_distinct(string_split(text, ' ')))[1]  AS first_token,
               list_contains(string_split(text, ' '), 'index')       AS has_index,
               array_to_string(list_sort(list_transform(list_distinct(string_split(text, ' ')), t -> upper(t))), '|') AS tokens_upper
        FROM documents WHERE doc_id <= 20
    """,
    tags=("B29", "A23", "P1"),
)
def b29_array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array/higher-order bucket (CQL list/set analogues): size, distinct,
    sort, contains, transform. Arrays are sorted AND serialized with
    array_join before emission: raw array columns crash the driver's
    pandas canonicalizer (unhashable list in sort_values), so only
    scalars reach the output projection."""
    d = table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    return d.filter(F.col("doc_id") <= 20).select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_unique"),
        F.array_sort(F.array_distinct(toks)).getItem(0).alias("first_token"),
        F.array_contains(toks, "index").alias("has_index"),
        F.array_join(
            F.array_sort(F.transform(F.array_distinct(toks), lambda t: F.upper(t))), "|"
        ).alias("tokens_upper"),
    )


@query(
    "b30_map_functions",
    oracle="""
        SELECT event_id,
               event_type                       AS k_type,
               round(value, 4)                  AS v_value,
               2                                AS n_keys
        FROM events WHERE event_id <= 30
    """,
    tags=("B30", "A23", "P1"),
)
def b30_map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map bucket (CQL map<K,V> analogue): build a map column, then read it
    back via element_at/map_keys. The oracle checks the extracted scalars
    (DuckDB's map extraction returns lists — semantics, not syntax, is the
    contract)."""
    e = table(spark, sf_dir, "events")
    m = F.create_map(
        F.lit("type"), F.col("event_type").cast("string"),
        F.lit("value"), F.round("value", 4).cast("string"),
    )
    return e.filter(F.col("event_id") <= 30).select(
        "event_id",
        F.element_at(m, "type").alias("k_type"),
        F.element_at(m, "value").cast("double").alias("v_value"),
        F.size(m).cast("long").alias("n_keys"),
    )
