"""Hypothesis fuzz for the CQL front-end: any generated statement either
parses into a plan or raises InvalidRequest — never an unhandled error —
and valid statements round-trip through parse() losslessly enough to
execute."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from dcosb_cassandra_spark.cql import InvalidRequest, parse

TABLES = st.sampled_from(["customer", "orders", "lineitem", "events", "nation"])
COLS = st.sampled_from(
    ["c_custkey", "o_orderkey", "l_orderkey", "user_id", "event_type", "value", "n_name"]
)
LITS = st.one_of(
    st.integers(-1000, 1000).map(str),
    st.sampled_from(["'click'", "'BUILDING'", "3.5", "'a b'"]),
)
OPS = st.sampled_from(["=", "<", "<=", ">", ">=", "!="])


@st.composite
def statements(draw):
    tbl = draw(TABLES)
    sel = draw(
        st.sampled_from(["*", "count(*)", "user_id", "c_custkey, c_name", "min(value) AS m"])
    )
    s = f"SELECT {sel} FROM {tbl}"
    if draw(st.booleans()):
        conds = draw(
            st.lists(
                st.tuples(COLS, OPS, LITS).map(lambda t: f"{t[0]} {t[1]} {t[2]}"),
                min_size=1,
                max_size=3,
            )
        )
        s += " WHERE " + " AND ".join(conds)
    if draw(st.booleans()):
        s += f" LIMIT {draw(st.integers(1, 100))}"
    if draw(st.booleans()):
        s += " ALLOW FILTERING"
    return s


@settings(max_examples=200, deadline=None)
@given(statements())
def test_parse_never_crashes(stmt):
    try:
        q = parse(stmt)
        assert q.table
        assert q.selectors
    except InvalidRequest:
        pass  # rejection is a valid outcome; crashes are not


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=80))
def test_garbage_rejected_cleanly(garbage):
    try:
        parse(garbage)
    except InvalidRequest:
        pass


# -- DDL fuzz: the session's statement handlers must never leak an
# unhandled exception — every generated statement either executes or
# raises InvalidRequest (Cassandra's contract). DDL execution is pure
# driver-side bookkeeping, so this runs without Spark actions.

IDENTS = st.sampled_from(["t1", "t2", "mv1", "ty1", "fn1", "ks1", "colx", "coly"])
CQL_TYPES = st.sampled_from(
    ["int", "bigint", "text", "double", "boolean", "list<int>", "map<text, int>",
     "frozen<tuple<int, text>>", "set<text>", "uuid", "nosuchtype", "vector<float, 8>"]
)


@st.composite
def ddl_statements(draw):
    kind = draw(st.sampled_from(["table", "type", "function", "aggregate", "mv",
                                 "keyspace", "drop", "alter", "auth", "system"]))
    a, b = draw(IDENTS), draw(IDENTS)
    t1, t2 = draw(CQL_TYPES), draw(CQL_TYPES)
    if kind == "auth":
        perm = draw(st.sampled_from(["SELECT", "MODIFY", "ALL PERMISSIONS", "DROP"]))
        return draw(st.sampled_from([
            f"CREATE ROLE {a}",
            f"CREATE ROLE {a} WITH LOGIN = true AND PASSWORD = 'p'",
            f"CREATE USER {a} WITH PASSWORD 'p' SUPERUSER",
            f"ALTER ROLE {a} WITH SUPERUSER = false",
            f"DROP ROLE {a}",
            f"DROP ROLE IF EXISTS {a}",
            f"GRANT {perm} ON TABLE {b} TO {a}",
            f"REVOKE {perm} ON KEYSPACE {b} FROM {a}",
            f"GRANT {a} TO {b}",
            "LIST ROLES",
            f"LIST ROLES OF {a}",
            "LIST ALL PERMISSIONS",
            f"LIST SELECT PERMISSIONS OF {a}",
            f"ALTER KEYSPACE {a} WITH durable_writes = false",
        ]))
    if kind == "system":
        vt = draw(st.sampled_from(["keyspaces", "tables", "columns", "views",
                                   "types", "functions", "aggregates", "bogus"]))
        return draw(st.sampled_from([
            f"SELECT * FROM system_schema.{vt}",
            f"SELECT * FROM system_schema.{vt} WHERE keyspace_name = 'dcosb'",
            "SELECT * FROM system.local",
            "SELECT * FROM system.peers",
            f"SELECT * FROM system.{vt}",
        ]))
    if kind == "table":
        return f"CREATE TABLE {a} ({b} {t1} PRIMARY KEY, v {t2})"
    if kind == "type":
        return f"CREATE TYPE {a} ({b} {t1})"
    if kind == "function":
        body = draw(st.sampled_from(["'return x + 1;'", "'x * 2'", "'int y = 1; return y;'"]))
        lang = draw(st.sampled_from(["java", "sql", "python"]))
        return (f"CREATE FUNCTION {a} (x {t1}) CALLED ON NULL INPUT "
                f"RETURNS {t2} LANGUAGE {lang} AS {body}")
    if kind == "aggregate":
        return f"CREATE AGGREGATE {a} ({t1}) SFUNC {b} STYPE {t2} INITCOND 0"
    if kind == "mv":
        return (f"CREATE MATERIALIZED VIEW {a} AS SELECT * FROM {b} "
                f"WHERE {b} IS NOT NULL PRIMARY KEY ({b})")
    if kind == "keyspace":
        return draw(st.sampled_from([f"CREATE KEYSPACE {a}", f"USE {a}", f"DROP KEYSPACE {a}"]))
    if kind == "drop":
        return draw(st.sampled_from(
            [f"DROP TABLE {a}", f"DROP TYPE {a}", f"DROP FUNCTION {a}",
             f"DROP AGGREGATE {a}", f"DROP MATERIALIZED VIEW {a}"]))
    return draw(st.sampled_from(
        [f"ALTER TABLE {a} ADD {b} {t1}", f"ALTER TABLE {a} DROP {b}",
         f"ALTER TABLE {a} RENAME {b} TO znew"]))


@settings(max_examples=150, deadline=None)
@given(st.lists(ddl_statements(), min_size=1, max_size=6))
def test_session_ddl_never_crashes(spark, stmts):
    from dcosb_cassandra_spark.cql_session import CqlSession

    from .conftest import SMOKE_SF_DIR

    sess = CqlSession(spark, SMOKE_SF_DIR)
    for stmt in stmts:
        try:
            sess.execute(stmt)
        except InvalidRequest:
            pass  # the contract: reject cleanly, never crash
