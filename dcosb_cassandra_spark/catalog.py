"""Table catalog: loaders over the driver-generated parquet (TESTDATA.md).

Cassandra mapping (SURVEY.md §1.2): a keyspace.table becomes a named
DataFrame; the parquet snapshot stands in for the bulk-loaded Cassandra
snapshot (the reference's stated Spark integration posture is bulk
read/write via connector, BASELINE.json "spark_approach").

Scale note: loaders are plain ``spark.read.parquet`` so Catalyst keeps full
pushdown/pruning freedom — filters and projections written downstream reach
the scan (verify with ``plans/audit.py``). At 100 TB the same call reads a
partitioned parquet/iceberg layout; nothing here collects or materializes.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .session import ensure_engine_conf

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: tables small enough to broadcast at ANY scale factor (dimension tables in
#: the star schema; region/nation are constant-size, supplier/customer/part
#: grow but stay << fact tables). Used by operators to declare broadcast
#: intent explicitly (SURVEY.md §2 "100 TB design rules").
BROADCAST_DIMS = frozenset({"region", "nation", "supplier"})

#: schema for the JSON `events.props` payload (FIXTURES.md: shape {"k": int})
EVENTS_PROPS_SCHEMA = "k INT"



#: DataFrame memo — ``spark.read.parquet`` costs ~100-160 ms per call in
#: file listing + footer schema read (measured); reusing the immutable
#: DataFrame removes that from every query. Keyed per session so the
#: driver's own SparkSession gets its own entries.
_table_memo: dict[tuple[str, str, str], DataFrame] = {}
_conf_pinned: set[str] = set()


def table(
    spark: SparkSession, sf_dir: str, name: str, cluster_key: str | None = None
) -> DataFrame:
    """Load one table. The unit of the catalog — all operators go through
    here so scan behavior (and the UTC conf pin) is uniform.

    ``cluster_key`` declares which join/group key the caller will cluster
    on. Cold path: it is a pure annotation (the same base DataFrame comes
    back — Catalyst plans the exchange as usual). Warm path: if
    ``warm_cache`` materialized a projection of this table hash-partitioned
    by that key (SERVING_MVS — the in-memory analogue of a Cassandra
    materialized view keyed per query shape, or bucketed storage at 100
    TB), the caller gets it and Spark's subset rule elides the caller's
    exchange entirely.

    ``events.ts`` has shipped as both parquet TIMESTAMP(NANOS) and
    TIMESTAMP(MICROS) across driver testdata generations, so the loader
    branches on what it actually reads: a NANOS column arrives as a nanos
    long (via the legacy flag) and is integer-divided to micros —
    bit-identical to DuckDB's ns→µs truncation on read — while a MICROS
    column is already the timestamp DuckDB sees and passes through."""
    if cluster_key is not None:
        app_id = spark.sparkContext.applicationId
        mv = _table_memo.get((app_id, sf_dir, f"{name}@{cluster_key}"))
        if mv is not None:
            return mv
    app_id = spark.sparkContext.applicationId
    if app_id not in _conf_pinned:
        ensure_engine_conf(spark)
        _conf_pinned.add(app_id)
    key = (app_id, sf_dir, name)
    df = _table_memo.get(key)
    if df is None:
        df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
        if name == "events":
            if dict(df.dtypes)["ts"] == "bigint":  # TIMESTAMP(NANOS) generation
                df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
            else:  # TIMESTAMP(MICROS) generation, read as NTZ — cast so
                # watermarks/unix_micros work; UTC session tz keeps wall values
                df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        _table_memo[key] = df
    return df


#: cache-partition targets for the warm path: (num_partitions, hot key).
#: A cached snapshot read from one parquet file is ONE in-memory partition,
#: so every later scan of it runs single-threaded no matter how many cores
#: exist; spreading the big tables before caching is the local-mode form of
#: the sized-by-bytes rule a cluster applies. Counts ≈ rows/40k, capped at
#: cores/2 (swept at sf0.1 — see git history for the {16,8,8,4} sweep).
#:
#: The HOT KEY hash-partitions the cached snapshot by the column the
#: workload joins/windows/groups on — the serving-cache form of Cassandra
#: token routing, and the in-memory analogue of `write_bucketed`
#: (sources/maintenance.py). HashPartitioning(key) satisfies every
#: downstream ClusteredDistribution whose clustering contains the key
#: (Spark's subset rule), so the custkey window, the custkey anti-join and
#: the orderkey fact-fact join run with their input exchange REMOVED
#: (swept at sf0.1: sequential headline suite 2.41 s → ~1.95 s). At 100 TB
#: the same intent is expressed as bucketed storage, and a scan of it
#: carries the same partitioning guarantee.
#: partitions-sized-by-bytes, applied to the CACHED snapshots (r8): at the
#: bench SF the whole working set is ~100 MB, so 4-8 partitions keeps each
#: cached partition near the 16-64 MB sweet spot. The r7 values (16/8) were
#: sized for single-query parallelism; under CONCURRENT serving (the
#: realistic 32-slot shape) the extra tasks were pure scheduler/GIL
#: contention — measured all-4 cut the 12-query concurrent wall ~35% vs
#: all-16/8 while costing ~5% sequential. lineitem keeps 8 (largest table,
#: q1/q3/q5 scan parallelism). At 100 TB the same bytes rule yields
#: thousands of partitions — the CONSTANT is bench-scale, the rule is not.
WARM_CACHE_PARTITIONS: dict[str, tuple[int, str | None]] = {
    "lineitem": (8, "l_orderkey"),
    "orders": (4, "o_custkey"),
    "events": (4, "user_id"),
    "customer": (4, "c_custkey"),
    # the pipeline suite's hot tables: minhash signatures / embedding math
    # re-spread from the cached snapshot by session.spread_width, so the
    # cached partition count is not their parallelism bound
    "documents": (4, None),
    "embeddings": (4, None),
}

#: serving materialized views: (table, cluster key, partitions). A SECOND
#: cached projection of a hot table, hash-partitioned by a DIFFERENT key
#: than its primary snapshot — the in-memory analogue of a Cassandra
#: materialized view (one table per query key, A26) or a second bucketed
#: copy at 100 TB. orders is hot in two key spaces: o_custkey (the
#: custkey anti-join / per-customer window) and o_orderkey (the
#: orders⋈lineitem fact-fact edge in q3/q5) — keeping both projections
#: removes the only data-carrying exchange from each consumer. Storage
#: cost is one extra copy of orders, exactly what the Cassandra data
#: model pays for the same read path.
#: (table, cluster key, base partitions, size-partner table). The
#: partition count MATCHES the partner's cached partitioning: both sides
#: of the orderkey fact-fact edge arrive hashpartitioned(orderkey, n) for
#: the SAME n, so the q3/q5 join needs no exchange at all (r8 —
#: mismatched partition counts forced a re-exchange of orders on every
#: run). The partner (lineitem) drives the byte-scaled count so the match
#: survives the upward scaling rule too — the same "bucket both fact
#: tables into the SAME bucket count" discipline as bucketed storage.
SERVING_MVS: tuple[tuple[str, str, int, str], ...] = (
    ("orders", "o_orderkey", 8, "lineitem"),
)


#: bytes-per-cached-partition target for the upward scaling rule below
_CACHE_PARTITION_BYTES = 48 << 20


def _scaled_partitions(sf_dir: str, name: str, base_n: int) -> int:
    """Apply the partitions-sized-by-bytes rule UPWARD: the
    WARM_CACHE_PARTITIONS constants are right for the bench SF (~100 MB
    working set); for a larger corpus the cached partition count grows so
    each stays near the 16-64 MB sweet spot. At 100 TB this yields
    thousands of partitions from the same rule."""
    import glob as _glob
    import math

    path = os.path.join(sf_dir, f"{name}.parquet")
    files = _glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True) or [path]
    nbytes = sum(os.path.getsize(f) for f in files if os.path.isfile(f))
    return max(base_n, math.ceil(nbytes / _CACHE_PARTITION_BYTES))


def warm_cache(spark: SparkSession, sf_dir: str) -> None:
    """Cache every table for repeated-query serving (bench / interactive),
    repartitioned per WARM_CACHE_PARTITIONS (scaled up by bytes past the
    bench SF), and install the cached frames in the loader memo so every
    operator's ``table()`` call hits them."""
    app_id = spark.sparkContext.applicationId
    for name in TABLES:
        df = table(spark, sf_dir, name)
        spec = WARM_CACHE_PARTITIONS.get(name)
        if spec:
            n, hot_key = spec
            n = _scaled_partitions(sf_dir, name, n)
            df = df.repartition(n, F.col(hot_key)) if hot_key else df.repartition(n)
        df = df.cache()
        df.count()
        _table_memo[(app_id, sf_dir, name)] = df
    for name, cluster_key, n, partner in SERVING_MVS:
        n = _scaled_partitions(sf_dir, partner, n)
        mv = table(spark, sf_dir, name).repartition(n, F.col(cluster_key)).cache()
        mv.count()
        _table_memo[(app_id, sf_dir, f"{name}@{cluster_key}")] = mv


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for ``spark.sql`` queries
    (subquery-shaped operators, SURVEY.md §3.4 entry point 3)."""
    for name in TABLES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
