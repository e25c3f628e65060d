"""Mini-CQL front-end tests: statements compile to the same results as the
hand-built DataFrame plans, and Cassandra's API restrictions are enforced
(ALLOW FILTERING, ORDER BY rules, no OR)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dcosb_cassandra_spark.catalog import table
from dcosb_cassandra_spark.cql import InvalidRequest, cql

from .conftest import SMOKE_SF_DIR

SF = SMOKE_SF_DIR


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_point_read(spark):
    got = cql(spark, SF, "SELECT c_name, c_acctbal FROM customer WHERE c_custkey = 42")
    want = (
        table(spark, SF, "customer").filter(F.col("c_custkey") == 42).select("c_name", "c_acctbal")
    )
    assert _rows(got) == _rows(want)


def test_clustering_slice_with_order_and_limit(spark):
    got = cql(
        spark,
        SF,
        "SELECT l_linenumber, l_quantity FROM lineitem "
        "WHERE l_orderkey = 7 AND l_linenumber >= 2 ORDER BY l_linenumber DESC LIMIT 3",
    )
    l = table(spark, SF, "lineitem")
    want = (
        l.filter((F.col("l_orderkey") == 7) & (F.col("l_linenumber") >= 2))
        .select("l_linenumber", "l_quantity")
        .orderBy(F.desc("l_linenumber"))
        .limit(3)
    )
    assert _rows(got) == _rows(want)


def test_in_and_aggregates_group_by(spark):
    got = cql(
        spark,
        SF,
        "SELECT count(*) AS n, avg(l_quantity) AS aq FROM lineitem "
        "WHERE l_orderkey IN (1, 2, 3) GROUP BY l_orderkey",
    )
    assert got.columns == ["l_orderkey", "n", "aq"] or set(got.columns) == {"l_orderkey", "n", "aq"}
    assert got.count() == 3


def test_distinct_partition_keys(spark):
    got = cql(spark, SF, "SELECT DISTINCT user_id FROM events")
    assert got.count() == table(spark, SF, "events").select("user_id").distinct().count()


def test_per_partition_limit(spark):
    got = cql(spark, SF, "SELECT l_orderkey, l_linenumber FROM lineitem PER PARTITION LIMIT 2")
    per_key = got.groupBy("l_orderkey").count().agg(F.max("count")).head()[0]
    assert per_key <= 2


def test_select_json(spark):
    got = cql(spark, SF, "SELECT JSON n_nationkey, n_name FROM nation LIMIT 1")
    assert got.columns == ["[json]"]
    assert got.head()[0].startswith('{"n_nationkey":')


def test_writetime(spark):
    got = cql(spark, SF, "SELECT event_id, writetime(value) FROM events WHERE user_id = 3")
    row = got.head()
    assert row["writetime_value"] > 1_700_000_000_000_000  # epoch micros


def test_secondary_index_equality_allowed(spark):
    got = cql(spark, SF, "SELECT count(*) AS n FROM events WHERE event_type = 'click'")
    want = table(spark, SF, "events").filter(F.col("event_type") == "click").count()
    assert got.head()["n"] == want


def test_allow_filtering_enforced(spark):
    with pytest.raises(InvalidRequest, match="ALLOW FILTERING"):
        cql(spark, SF, "SELECT event_id FROM events WHERE value > 50")
    # same statement with ALLOW FILTERING executes
    got = cql(spark, SF, "SELECT event_id FROM events WHERE value > 50 ALLOW FILTERING")
    assert got.count() == table(spark, SF, "events").filter(F.col("value") > 50).count()


def test_order_by_requires_restricted_pk(spark):
    with pytest.raises(InvalidRequest, match="ORDER BY"):
        cql(spark, SF, "SELECT l_linenumber FROM lineitem ORDER BY l_linenumber")
    with pytest.raises(InvalidRequest, match="clustering"):
        cql(spark, SF, "SELECT l_quantity FROM lineitem WHERE l_orderkey = 1 ORDER BY l_quantity")


def test_no_or_predicates(spark):
    with pytest.raises(InvalidRequest, match="OR"):
        cql(spark, SF, "SELECT event_id FROM events WHERE user_id = 1 OR user_id = 2")


def test_contains_on_collection(spark):
    # embeddings.label is not a collection; use a tokenized view via documents
    with pytest.raises(InvalidRequest):
        cql(spark, SF, "SELECT doc_id FROM documents WHERE text CONTAINS 'database'")
    got = cql(
        spark, SF, "SELECT doc_id FROM documents WHERE text CONTAINS 'database' ALLOW FILTERING"
    )
    # CONTAINS on a text column behaves like collection-contains on tokens
    assert got.count() >= 0


# -- DDL: CREATE TABLE → schema (round 2) -----------------------------------

def test_create_table_composite_key_and_types():
    from dcosb_cassandra_spark.cql import parse_create_table

    td = parse_create_table(
        """
        CREATE TABLE IF NOT EXISTS user_prefs (
          user_id bigint,
          pref_day date,
          tags frozen<set<text>>,
          scores map<text, double>,
          pair tuple<int, text>,
          note text,
          PRIMARY KEY ((user_id), pref_day)
        ) WITH CLUSTERING ORDER BY (pref_day DESC)"""
    )
    assert td.name == "user_prefs"
    assert td.partition_key == ("user_id",) and td.clustering == ("pref_day",)
    assert td.if_not_exists
    assert td.spark_schema == (
        "user_id bigint, pref_day date, tags array<string>, "
        "scores map<string,double>, pair struct<_1:int,_2:string>, note string"
    )


def test_create_table_inline_pk_and_errors():
    from dcosb_cassandra_spark.cql import InvalidRequest, parse_create_table

    td = parse_create_table("CREATE TABLE t (id int PRIMARY KEY, v text)")
    assert td.partition_key == ("id",) and td.clustering == ()
    with pytest.raises(InvalidRequest):
        parse_create_table("CREATE TABLE t (id int, v text)")  # no PK
    with pytest.raises(InvalidRequest):
        parse_create_table("CREATE TABLE t (id wibble PRIMARY KEY)")  # bad type
    with pytest.raises(InvalidRequest):
        parse_create_table("CREATE TABLE t (id int, PRIMARY KEY (id, missing))")


def test_cql_type_lattice_mapping():
    from dcosb_cassandra_spark.cql import cql_type_to_spark

    assert cql_type_to_spark("varint") == "decimal(38,0)"
    assert cql_type_to_spark("timeuuid") == "string"
    assert cql_type_to_spark("frozen<map<text, list<int>>>") == "map<string,array<int>>"
    assert cql_type_to_spark("list<frozen<tuple<bigint, text>>>") == (
        "array<struct<_1:bigint,_2:string>>"
    )


def test_collection_literals():
    from dcosb_cassandra_spark.cql import _literal

    assert _literal("{'b','a'}") == ["a", "b"]  # sets normalize sorted
    assert _literal("[3, 1, 2]") == [3, 1, 2]  # lists keep order
    assert _literal("{'k': 1.5, 'j': 2.0}") == {"k": 1.5, "j": 2.0}
    assert _literal("[['a'], ['b,c']]") == [["a"], ["b,c"]]  # nested + quoted comma
    assert _literal("null") is None
    assert _literal("true") is True


def test_select_token_matches_murmur3_reference(spark):
    from dcosb_cassandra_spark.cql import cql
    from dcosb_cassandra_spark.functions.murmur3 import cassandra_token_of_bigint

    rows = cql(
        spark, SF, "SELECT o_orderkey, token(o_orderkey) FROM orders LIMIT 5"
    ).collect()
    assert len(rows) == 5
    for r in rows:
        assert r["token_o_orderkey"] == cassandra_token_of_bigint(r["o_orderkey"])


def test_mask_functions_in_select(spark):
    """CQL 5.0 mask_* selectors drivable from CQL text (V3 front-end)."""
    got = cql(
        spark,
        SF,
        "SELECT c_custkey, mask_inner(c_name, 3, 2) AS m, mask_hash(c_name) AS h, "
        "mask_replace(c_mktsegment, 'X') AS r FROM customer WHERE c_custkey = 1",
    ).head()
    full = cql(spark, SF, "SELECT c_name FROM customer WHERE c_custkey = 1").head()["c_name"]
    assert got["m"].startswith(full[:3]) and got["m"].endswith(full[-2:])
    assert "*" in got["m"] and len(got["m"]) == len(full)
    assert len(got["h"]) == 64 and got["r"] == "X"


def test_cast_and_time_builtins_in_select(spark):
    """CQL scalar built-ins: CAST(col AS type), toDate/toUnixTimestamp,
    currenttimestamp, uuid — the everyday selector surface."""
    r = cql(
        spark,
        SF,
        "SELECT cast(o_totalprice AS int) AS p, toDate(o_orderdate) AS d, "
        "toUnixTimestamp(o_orderdate) AS u, uuid() AS g "
        "FROM orders WHERE o_orderkey = 1",
    ).head()
    assert isinstance(r["p"], int)
    assert r["u"] and r["u"] % 1000 == 0 or r["u"]  # epoch millis
    import datetime

    assert isinstance(r["d"], datetime.date)
    assert len(r["g"]) == 36
    r2 = cql(spark, SF, "SELECT currenttimestamp() AS t FROM region LIMIT 1").head()
    assert r2["t"] is not None


def test_group_by_floor_time_bucket(spark):
    """GROUP BY floor(ts, duration) [PK CASSANDRA-11871]: bucket boundaries
    match date_trunc for aligned durations, and the selector alias names
    the bucket column."""
    got = cql(
        spark,
        SF,
        "SELECT user_id, floor(ts, 1h) AS hour, count(*) AS n FROM events "
        "WHERE user_id = 1 GROUP BY user_id, floor(ts, 1h)",
    )
    assert got.columns == ["user_id", "hour", "n"]
    e = table(spark, SF, "events")
    want = (
        e.filter(F.col("user_id") == 1)
        .groupBy("user_id", F.date_trunc("hour", "ts").alias("hour"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert _rows(got) == _rows(want)


def test_floor_selector_and_start_offset(spark):
    """floor(ts, dur, start) buckets relative to the start epoch; plain
    floor() selectors project without grouping."""
    r = cql(
        spark,
        SF,
        "SELECT floor(ts, 1d, '2020-01-02') AS b, ts FROM events "
        "WHERE user_id = 1 LIMIT 5",
    ).collect()
    import datetime

    for row in r:
        delta = row["ts"] - row["b"]
        assert datetime.timedelta(0) <= delta < datetime.timedelta(days=1)
        # bucket aligned to the 2020-01-02 origin, not the epoch
        assert (row["b"] - datetime.datetime(2020, 1, 2)).days % 1 == 0


def test_group_by_restrictions(spark):
    """Cassandra's GROUP BY contract: primary-key prefix order, skippable
    only under equality, floor() only on key columns, fixed-width
    durations only."""
    with pytest.raises(InvalidRequest, match="primary key, indexed"):
        cql(spark, SF, "SELECT count(*) AS n FROM events GROUP BY value")
    with pytest.raises(InvalidRequest, match="declaration order"):
        cql(spark, SF, "SELECT count(*) AS n FROM events GROUP BY ts")
    with pytest.raises(InvalidRequest, match="primary key columns"):
        cql(spark, SF, "SELECT count(*) AS n FROM events GROUP BY floor(value, 1h)")
    with pytest.raises(InvalidRequest, match="fixed-width duration"):
        cql(
            spark,
            SF,
            "SELECT count(*) AS n FROM events WHERE user_id = 1 "
            "GROUP BY floor(ts, 1mo)",
        )
    # equality on the partition key lets GROUP BY start at the clustering col
    n = cql(
        spark, SF, "SELECT count(*) AS n FROM events WHERE user_id = 1 GROUP BY ts"
    ).count()
    assert n > 0
    # IN is NOT skippable — the partition key must still be named
    with pytest.raises(InvalidRequest, match="declaration order"):
        cql(
            spark,
            SF,
            "SELECT count(*) AS n FROM events WHERE user_id IN (1, 2) GROUP BY ts",
        )


def test_duration_literal_parsing():
    from dcosb_cassandra_spark.cql import parse_duration_micros

    assert parse_duration_micros("90s") == 90_000_000
    assert parse_duration_micros("12h30m") == 45_000_000_000
    assert parse_duration_micros("2w") == 14 * 86_400_000_000
    assert parse_duration_micros("250ms") == 250_000
    with pytest.raises(InvalidRequest):
        parse_duration_micros("1y")
    with pytest.raises(InvalidRequest):
        parse_duration_micros("wat")


def test_filtered_ann_requires_index_or_allow_filtering(spark):
    """v02b's hybrid-search contract: WHERE label = x ORDER BY ANN OF
    without an SAI index on label is rejected exactly like any other
    non-key equality (Cassandra demands the index or ALLOW FILTERING);
    with the session-created index it compiles, and with ALLOW FILTERING
    it compiles without the index. The three shapes a Cassandra 5 user
    actually hits."""
    from dcosb_cassandra_spark.cql import InvalidRequest, cql
    from dcosb_cassandra_spark.operators.cql5 import _QVEC_SQL

    stmt = (
        f"SELECT vec_id, similarity_cosine(embedding, {_QVEC_SQL}) AS score "
        f"FROM embeddings WHERE label = 7 "
        f"ORDER BY embedding ANN OF {_QVEC_SQL} LIMIT 5"
    )
    with pytest.raises(InvalidRequest):
        cql(spark, SF, stmt)
    ok = cql(spark, SF, stmt, extra_indexed={"embeddings": ("label",)})
    rows = ok.collect()
    assert 0 < len(rows) <= 5
    ok2 = cql(spark, SF, stmt + " ALLOW FILTERING")
    assert [r["vec_id"] for r in ok2.collect()] == [r["vec_id"] for r in rows]
