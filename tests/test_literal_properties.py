"""Property-based tests for the CQL literal grammar: whatever
_render_literal emits, _literal must parse back to the same value (the
prepared-statement bind path round-trips arbitrary user data), and the
paging key filter must agree with Python's tuple ordering."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from dcosb_cassandra_spark.cql import _literal
from dcosb_cassandra_spark.cql_session import _render_literal

scalars = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(min_value=-(2**62), max_value=2**62),
    st.text(
        alphabet=st.characters(blacklist_categories=("Cs",), blacklist_characters="\x00"),
        max_size=40,
    ),
)
values = st.one_of(
    scalars,
    st.lists(scalars, max_size=5),
    st.dictionaries(st.text(min_size=1, max_size=10), scalars, max_size=4),
)


@settings(max_examples=300, deadline=None)
@given(values)
def test_literal_round_trip(v):
    """parse(render(v)) == v for scalars, lists, and maps — including
    strings full of quotes, commas, brackets, and ' IF ' fragments."""
    rendered = _render_literal(v)
    parsed = _literal(rendered)
    if v == [] or v == {}:
        # CQL's documented ambiguity: '{}' / '[]' are typed by the target
        # column, so an empty collection parses to the neutral empty form
        assert parsed == []
    else:
        assert parsed == v, f"{v!r} -> {rendered!r} -> {parsed!r}"


@settings(max_examples=30, deadline=None)
@given(
    st.lists(st.tuples(st.integers(0, 50), st.integers(0, 50)), min_size=1, max_size=60),
    st.tuples(st.integers(0, 50), st.integers(0, 50)),
)
def test_after_key_agrees_with_tuple_order(spark, rows, state):
    """The lexicographic resume predicate must select exactly the rows
    whose key tuple sorts strictly after the page state."""
    from dcosb_cassandra_spark.functions.paging import after_key

    df = spark.createDataFrame(rows, "a LONG, b LONG")
    got = sorted(
        (r["a"], r["b"]) for r in df.filter(after_key(["a", "b"], state)).collect()
    )
    want = sorted((a, b) for a, b in rows if (a, b) > state)
    assert got == want
