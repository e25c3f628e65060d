"""Second coverage sweep: unpivot/melt, extended string & bitwise function
buckets, boolean/conditional aggregates, and a sessionized conversion
funnel (the composition query a real events pipeline runs daily).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import table
from ..registry import query


@query(
    "b23b_unpivot",
    oracle="""
        SELECT l_orderkey, l_linenumber, metric, round(val, 4) AS val
        FROM (
            SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_discount
            FROM lineitem WHERE l_orderkey <= 5
        ) UNPIVOT (val FOR metric IN (l_quantity, l_extendedprice, l_discount))
    """,
    tags=("B23", "P2"),
)
def b23b_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot/melt (wide→long) — the inverse of pivot; no shuffle, pure
    row expansion (Catalyst Expand)."""
    l = table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 5)
    return (
        l.select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_discount")
        .unpivot(
            ["l_orderkey", "l_linenumber"],
            ["l_quantity", "l_extendedprice", "l_discount"],
            "metric",
            "val",
        )
        .select("l_orderkey", "l_linenumber", "metric", F.round("val", 4).alias("val"))
    )


@query(
    "b25b_string_functions_2",
    oracle="""
        SELECT c_custkey,
               lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS padded,
               reverse(c_mktsegment)                    AS rev,
               repeat('ab', 3)                          AS rep,
               split_part(c_name, '#', 1)               AS name_head,
               left(c_name, 4)                          AS l4,
               right(c_name, 3)                         AS r3,
               contains(c_name, '1')                    AS has_one,
               starts_with(c_mktsegment, 'MACH')        AS is_mach
        FROM customer WHERE c_custkey <= 30
    """,
    tags=("B25", "P1"),
)
def b25b_string_functions_2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String bucket 2: pad/reverse/repeat/split_part/left/right/contains/
    starts_with."""
    c = table(spark, sf_dir, "customer")
    return c.filter(F.col("c_custkey") <= 30).select(
        "c_custkey",
        F.lpad(F.col("c_custkey").cast("string"), 8, "0").alias("padded"),
        F.reverse("c_mktsegment").alias("rev"),
        F.repeat(F.lit("ab"), 3).alias("rep"),
        F.split_part(F.col("c_name"), F.lit("#"), F.lit(1)).alias("name_head"),
        F.substring("c_name", 1, 4).alias("l4"),
        F.col("c_name").substr(F.length("c_name") - 2, F.lit(3)).alias("r3"),
        F.contains(F.col("c_name"), F.lit("1")).alias("has_one"),
        F.startswith(F.col("c_mktsegment"), F.lit("MACH")).alias("is_mach"),
    )


@query(
    "b27b_bitwise_ops",
    oracle="""
        SELECT o_orderkey,
               o_orderkey & 255        AS low_byte,
               o_orderkey | 4096       AS with_flag,
               xor(o_orderkey, 21845)  AS xored,
               o_orderkey << 2         AS shl,
               o_orderkey >> 3         AS shr
        FROM orders WHERE o_orderkey <= 60
    """,
    tags=("B27", "A5", "P2"),
)
def b27b_bitwise_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise bucket (& | xor << >>) — the primitives behind token-range
    bucketing and simhash bit math."""
    o = table(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    return o.filter(k <= 60).select(
        "o_orderkey",
        k.bitwiseAND(F.lit(255)).alias("low_byte"),
        k.bitwiseOR(F.lit(4096)).alias("with_flag"),
        k.bitwiseXOR(F.lit(21845)).alias("xored"),
        F.shiftleft(k, 2).alias("shl"),
        F.shiftright(k, 3).alias("shr"),
    )


@query(
    "b28b_bool_aggregates",
    oracle="""
        SELECT user_id,
               bool_or(event_type = 'purchase')  AS ever_purchased,
               bool_and(value >= 0)              AS all_nonneg,
               CAST(count_if(event_type = 'error') AS BIGINT) AS n_errors,
               CAST(count_if(value > 95) AS BIGINT)           AS n_high
        FROM events GROUP BY user_id
    """,
    tags=("B28", "B9", "P1"),
)
def b28b_bool_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean/conditional aggregates: bool_or/bool_and/count_if — the
    cohort-flag aggregation idiom (one pass, partial-aggregatable)."""
    e = table(spark, sf_dir, "events")
    return e.groupBy("user_id").agg(
        F.bool_or(F.col("event_type") == "purchase").alias("ever_purchased"),
        F.bool_and(F.col("value") >= 0).alias("all_nonneg"),
        F.count_if(F.col("event_type") == "error").alias("n_errors"),
        F.count_if(F.col("value") > 95).alias("n_high"),
    )


@query(
    "c3b_session_funnel",
    oracle="""
        WITH flagged AS (
            SELECT user_id, ts, event_type, event_id,
                   CASE WHEN lag(ts) OVER w IS NULL
                             OR epoch_us(ts) - lag(epoch_us(ts)) OVER w >= 1800000000
                        THEN 1 ELSE 0 END AS new_session
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        sessions AS (
            SELECT user_id, event_type,
                   sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                          ROWS UNBOUNDED PRECEDING) AS session_id
            FROM flagged
        ),
        per_session AS (
            SELECT user_id, session_id,
                   bool_or(event_type = 'view')     AS saw,
                   bool_or(event_type = 'click')    AS clicked,
                   bool_or(event_type = 'purchase') AS purchased
            FROM sessions GROUP BY user_id, session_id
        )
        SELECT count(*)                                        AS n_sessions,
               CAST(count_if(saw) AS BIGINT)                   AS with_view,
               CAST(count_if(saw AND clicked) AS BIGINT)       AS view_click,
               CAST(count_if(saw AND clicked AND purchased)
                    AS BIGINT)                                 AS full_funnel,
               round(count_if(saw AND clicked AND purchased) * 1.0
                     / count(*), 6)                            AS conversion
        FROM per_session
    """,
    tags=("C3", "D5", "P1"),
)
def c3b_session_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionized conversion funnel (view→click→purchase within a 30-min
    session): gaps-and-islands sessionization composed with boolean
    aggregates — the canonical events-pipeline KPI query. Two window passes
    + two aggregations, all keyed on user_id (one shuffle)."""
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)
    new_session = F.when(gap.isNull() | (gap >= 1_800_000_000), 1).otherwise(0)
    running = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    sessions = e.withColumn("new_session", new_session).withColumn(
        "session_id", F.sum("new_session").over(running)
    )
    per_session = sessions.groupBy("user_id", "session_id").agg(
        F.bool_or(F.col("event_type") == "view").alias("saw"),
        F.bool_or(F.col("event_type") == "click").alias("clicked"),
        F.bool_or(F.col("event_type") == "purchase").alias("purchased"),
    )
    return per_session.agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.count_if(F.col("saw")).alias("with_view"),
        F.count_if(F.col("saw") & F.col("clicked")).alias("view_click"),
        F.count_if(F.col("saw") & F.col("clicked") & F.col("purchased")).alias("full_funnel"),
        F.round(
            F.count_if(F.col("saw") & F.col("clicked") & F.col("purchased"))
            / F.count(F.lit(1)),
            6,
        ).alias("conversion"),
    )


@query(
    "a06b_page_state_scan",
    oracle="""
        SELECT l_orderkey, l_linenumber, l_partkey, round(l_quantity, 2) AS qty
        FROM lineitem
        WHERE l_orderkey >= 3
          AND (l_orderkey > 3 OR (l_orderkey = 3 AND l_linenumber > 2)
               OR (l_orderkey = 3 AND l_linenumber = 2 AND l_partkey > 0))
        ORDER BY l_orderkey, l_linenumber, l_partkey LIMIT 25
    """,
    tags=("A6", "P1"),
)
def a06b_page_state_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resume-after-page-state scan [PK `service/pager/`]: the page state
    (3, 2, 0) is the composite key of the last row served (l_partkey joins
    the key because l_linenumber alone is not unique within an order); the
    next page is a lexicographic key comparison + ORDER BY key + LIMIT
    fetch_size. The redundant l_orderkey >= 3 conjunct reaches the parquet
    scan (the OR-chain alone would not), so each page prunes row groups
    below the resume key — constant work per page at 100 TB, not
    rescan-and-skip."""
    from ..functions.paging import fetch_page

    l = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_partkey", F.round("l_quantity", 2).alias("qty")
    )
    return fetch_page(l, ["l_orderkey", "l_linenumber", "l_partkey"], 25, state=(3, 2, 0))


#: Pinned probe keys and their Murmur3Partitioner tokens, precomputed with
#: functions/murmur3.py (itself pinned to Cassandra's own test vectors in
#: tests/test_murmur3.py). DuckDB has no murmur3_x64_128, so the oracle is
#: this literal VALUES table — the d17 unrolled-oracle trick: the twin
#: carries the expected outputs, and the hash check proves Spark's
#: Arrow-batched UDF reproduces the real ring tokens.
_A05B_TOKENS = (
    (1, 6292367497774912474),
    (2, -8218881827949364593),
    (3, -8048510690352527683),
    (4, 1830508272351686621),
    (5, 4464361019114304900),
    (6, 6268297055439790106),
    (7, -5038316157564330072),
    (32, 2661885290202953826),
    (33, 4891967783720036163),
    (34, -2040201830123832056),
    (64, -1243006452765186581),
    (100, 2728449614470305923),
    (101, 3747151654617000541),
    (102, -8040523167306530846),
    (103, 6272339467100117813),
)
_A05B_KEYS = tuple(k for k, _ in _A05B_TOKENS)
_A05B_VALUES = ", ".join(f"({k}, {t})" for k, t in _A05B_TOKENS)


@query(
    "a05b_token_murmur3_scan",
    oracle=f"""
        SELECT o.o_orderkey, t.tok, round(o.o_totalprice, 2) AS price
        FROM orders o
        JOIN (VALUES {_A05B_VALUES}) AS t(k, tok) ON o.o_orderkey = t.k
        WHERE t.tok < 0
        ORDER BY t.tok
    """,
    tags=("A5", "P2"),
)
def a05b_token_murmur3_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """token() range scan with REAL Murmur3Partitioner semantics
    [PK `dht/Murmur3Partitioner.java`]: tokens match an actual Cassandra
    ring (incl. the signed-tail-byte quirk of Cassandra's Java Murmur3
    port), so `token(pk) < 0` here is a genuine ring-range predicate —
    the negative half of the ring, the split a connector uses to read a
    100 TB keyspace as independent tasks. Spark computes tokens live via
    the Arrow-batched pandas UDF over a pinned probe-key set; the oracle
    is the precomputed-literal VALUES twin (see _A05B_TOKENS), upgrading
    this from rows-only to hash-checked. The md5-token variant a05 covers
    the full-table-scan form with an engine-independent token."""
    from ..functions.murmur3 import token_murmur3

    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey").isin(*_A05B_KEYS))
    tok = token_murmur3(F.col("o_orderkey"))
    return (
        o.select("o_orderkey", tok.alias("tok"), F.round("o_totalprice", 2).alias("price"))
        .filter(F.col("tok") < 0)
        .orderBy("tok")
    )


@query(
    "a_partition_stats",
    oracle="""
        WITH per_part AS (
            SELECT user_id, count(*) AS n_rows,
                   count(*) * 3 AS n_cells  -- 3 payload columns per row
            FROM events GROUP BY user_id
        )
        SELECT count(*)                                   AS n_partitions,
               CAST(max(n_rows) AS BIGINT)                AS max_rows,
               round(avg(n_rows), 4)                      AS avg_rows,
               round(quantile_cont(n_rows, 0.99), 4)      AS p99_rows,
               CAST(max(n_cells) AS BIGINT)               AS max_cells,
               count(*) FILTER (WHERE n_rows > 1000)      AS n_wide
        FROM per_part
    """,
    tags=("A1", "A16", "P1", "ops"),
)
def a_partition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide-partition detection — the nodetool-tablehistograms health
    check every Cassandra operator runs [PK `metrics/TableMetrics.java`
    partition-size histograms]: rows/cells per partition key, p99 and max,
    and the count of partitions over a width threshold. One partial-
    aggregatable groupBy on the partition key then a tiny global
    aggregate; at 100 TB the same two-stage plan finds the hot partitions
    that break token-range balance."""
    e = table(spark, sf_dir, "events")
    per_part = e.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_rows"),
        (F.count(F.lit(1)) * 3).alias("n_cells"),
    )
    return per_part.agg(
        F.count(F.lit(1)).alias("n_partitions"),
        F.max("n_rows").alias("max_rows"),
        F.round(F.avg("n_rows"), 4).alias("avg_rows"),
        F.round(F.percentile("n_rows", F.lit(0.99)), 4).alias("p99_rows"),
        F.max("n_cells").alias("max_cells"),
        F.count(F.when(F.col("n_rows") > 1000, 1)).alias("n_wide"),
    )


@query(
    "a_repair_merkle_ranges",
    oracle="""
        -- anti-entropy repair: per token-range digest comparison between
        -- a full replica (A) and one missing ~1/16 of writes (B)
        WITH m AS (
            SELECT user_id, event_type, ts, event_id,
                   substr(md5(CAST(event_id AS VARCHAR)), 1, 1) <> '0' AS surv
            FROM events
        ),
        wa AS (
            SELECT user_id, event_type, event_id FROM (
                SELECT *, row_number() OVER (PARTITION BY user_id, event_type
                                             ORDER BY ts DESC, event_id DESC) AS rn
                FROM m
            ) WHERE rn = 1
        ),
        wb AS (
            SELECT user_id, event_type, event_id FROM (
                SELECT *, row_number() OVER (PARTITION BY user_id, event_type
                                             ORDER BY ts DESC, event_id DESC) AS rn
                FROM m WHERE surv
            ) WHERE rn = 1
        ),
        ba AS (
            SELECT substr(md5(CAST(user_id AS VARCHAR)), 1, 1) AS bucket,
                   count(*) AS n_a, bit_xor(event_id) AS digest_a
            FROM wa GROUP BY 1
        ),
        bb AS (
            SELECT substr(md5(CAST(user_id AS VARCHAR)), 1, 1) AS bucket,
                   count(*) AS n_b, bit_xor(event_id) AS digest_b
            FROM wb GROUP BY 1
        )
        SELECT ba.bucket, n_a, coalesce(n_b, 0) AS n_b,
               digest_a, coalesce(digest_b, 0) AS digest_b,
               (n_a = coalesce(n_b, 0) AND digest_a = coalesce(digest_b, 0))
                   AS in_sync
        FROM ba LEFT JOIN bb ON bb.bucket = ba.bucket
    """,
    tags=("A35", "A18", "ops", "P1"),
)
def a_repair_merkle_ranges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-entropy repair digests [PK `repair/`, `MerkleTree.java`]: what
    `nodetool repair` computes — per token-range digests of each replica's
    COMPACTED state, compared to find the ranges that must stream. Replica
    A sees the full mutation log; replica B deterministically lost ~1/16
    of writes (md5(event_id) prefix '0' — the dropped-hint model). Rows
    whose range digests disagree are exactly the ranges repair streams.

    One-pass plan (the c12 CDC trick): BOTH replicas' LWW winners come
    from a single conditional struct-max aggregate over one log scan —
    partial-aggregated map-side, one shuffle on the partition key, never
    a self-join of the log. The range rollup then groups 16 md5-prefix
    buckets (the token-range analog) with count + bit_xor(winner id)
    digests — O(ranges) output, the Merkle-leaf comparison at its
    coarsest level. At 100 TB: log scanned once, shuffled once on
    user_id, and the per-range digest table is tiny enough to diff
    anywhere."""
    e = table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        "ts",
        "event_id",
        (F.substring(F.md5(F.col("event_id").cast("string")), 1, 1) != "0").alias("surv"),
    )
    win = e.groupBy("user_id", "event_type").agg(
        F.max(F.struct("ts", "event_id")).alias("wa"),
        F.max(F.when(F.col("surv"), F.struct("ts", "event_id"))).alias("wb"),
    )
    bucket = F.substring(F.md5(F.col("user_id").cast("string")), 1, 1)
    rep = win.groupBy(bucket.alias("bucket")).agg(
        F.count(F.lit(1)).alias("n_a"),
        F.count("wb").alias("n_b"),
        F.bit_xor(F.col("wa.event_id")).alias("digest_a"),
        F.coalesce(F.bit_xor(F.col("wb.event_id")), F.lit(0)).alias("digest_b"),
    )
    return rep.select(
        "bucket",
        "n_a",
        "n_b",
        "digest_a",
        "digest_b",
        ((F.col("n_a") == F.col("n_b")) & (F.col("digest_a") == F.col("digest_b"))).alias(
            "in_sync"
        ),
    )


@query(
    "a_tombstone_gc_report",
    oracle="""
        -- gc_grace report: which tombstones are safely droppable at
        -- compaction time (deletion older than gc_grace AND not shadowing
        -- any even-older live write that a late replica could resurrect)
        WITH log AS (
            SELECT user_id, ts, event_id,
                   (event_type = 'error') AS tombstone
            FROM events
        ),
        per_key AS (
            SELECT user_id,
                   count(*) FILTER (WHERE tombstone) AS n_tombs,
                   max(ts)  FILTER (WHERE tombstone) AS last_tomb_ts,
                   max(ts)  FILTER (WHERE NOT tombstone) AS last_live_ts
            FROM log GROUP BY user_id
        )
        SELECT count(*)                                    AS n_keys,
               CAST(sum(n_tombs) AS BIGINT)                AS n_tombstones,
               count(*) FILTER (WHERE n_tombs > 0)         AS n_keys_with_tombs,
               count(*) FILTER (
                   WHERE n_tombs > 0
                     AND last_tomb_ts + INTERVAL 10 DAY
                         <= TIMESTAMP '2024-01-20 00:00:00'
                     AND (last_live_ts IS NULL OR last_live_ts < last_tomb_ts)
               )                                           AS n_droppable,
               count(*) FILTER (
                   WHERE n_tombs > 0 AND last_live_ts > last_tomb_ts
               )                                           AS n_resurrected
        FROM per_key
    """,
    tags=("A19", "A35", "ops", "P1"),
)
def a_tombstone_gc_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tombstone GC report [PK `db/compaction/`, gc_grace_seconds]: the
    numbers `nodetool garbagecollect` / compaction act on. A tombstone is
    DROPPABLE only when (a) it has aged past gc_grace (10 days here, vs
    the pinned TTL_NOW clock) — dropping younger ones lets a
    not-yet-repaired replica resurrect the deleted row — and (b) no newer
    live write has already superseded it (then it shadows nothing and
    the row was resurrected by an upsert). One partial-aggregatable pass
    over the mutation log builds per-key tombstone/live high-water marks,
    then a single global rollup — no window, no self-join; the per-key
    frame never leaves its shuffle partition. At 100 TB this is the
    compaction planner's admission metric, computed in one scan."""
    from .cql_write import TTL_NOW

    e = table(spark, sf_dir, "events")
    tomb = F.col("event_type") == "error"
    per_key = e.groupBy("user_id").agg(
        F.count(F.when(tomb, 1)).alias("n_tombs"),
        F.max(F.when(tomb, F.col("ts"))).alias("last_tomb_ts"),
        F.max(F.when(~tomb, F.col("ts"))).alias("last_live_ts"),
    )
    aged = F.col("last_tomb_ts") + F.expr("INTERVAL 10 DAYS") <= F.lit(TTL_NOW).cast(
        "timestamp"
    )
    return per_key.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("n_tombs").alias("n_tombstones"),
        F.count(F.when(F.col("n_tombs") > 0, 1)).alias("n_keys_with_tombs"),
        F.count(
            F.when(
                (F.col("n_tombs") > 0)
                & aged
                & (F.col("last_live_ts").isNull()
                   | (F.col("last_live_ts") < F.col("last_tomb_ts"))),
                1,
            )
        ).alias("n_droppable"),
        F.count(
            F.when(
                (F.col("n_tombs") > 0) & (F.col("last_live_ts") > F.col("last_tomb_ts")),
                1,
            )
        ).alias("n_resurrected"),
    )


@query(
    "a_snapshot_as_of",
    oracle="""
        -- point-in-time LWW state: the table as a reader at T would have
        -- seen it (time travel / backup-restore verification)
        WITH live AS (
            SELECT user_id, event_type, value, ts FROM (
                SELECT user_id, event_type, value, ts,
                       row_number() OVER (PARTITION BY user_id, event_type
                                          ORDER BY ts DESC, event_id DESC) AS rn
                FROM events WHERE ts <= TIMESTAMP '2024-01-10 00:00:00'
            ) WHERE rn = 1
        )
        SELECT event_type, count(*) AS n_keys,
               round(sum(value), 4) AS total_value,
               max(ts) AS newest_cell
        FROM live GROUP BY event_type
    """,
    tags=("A18", "A21", "ops", "P1"),
)
def a_snapshot_as_of(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF snapshot: the LWW-compacted state a reader at time T saw —
    mutations with writetime > T ignored, latest-≤T wins per key. This is
    the time-travel primitive behind backup verification and
    restore-to-point-in-time (and the two endpoint states c12's CDC diff
    compares). One conditional struct-max aggregate per key over a single
    log scan — the filter on writetime pushes to the parquet scan, so at
    100 TB an as-of query reads only the commit-log segments below T."""
    e = table(spark, sf_dir, "events").filter(
        F.col("ts") <= F.lit("2024-01-10 00:00:00").cast("timestamp")
    )
    win = (
        e.groupBy("user_id", "event_type")
        .agg(F.max(F.struct("ts", "event_id", "value")).alias("w"))
        .select("user_id", "event_type", F.col("w.value").alias("value"), F.col("w.ts").alias("ts"))
    )
    return win.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.round(F.sum("value"), 4).alias("total_value"),
        F.max("ts").alias("newest_cell"),
    )
