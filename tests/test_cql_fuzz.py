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
