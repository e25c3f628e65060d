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


def test_zorder_interleave_bijective_and_monotone(spark):
    """b32's Morton key: (1) round-trips — deinterleaving the even/odd
    bits recovers (ck, dk) exactly; (2) dominance-monotone — growing both
    coordinates never decreases the key. Checked against a pure-Python
    mirror on a deterministic grid including the 16-bit edges."""
    from pyspark.sql import functions as F

    def py_interleave(x: int, y: int) -> int:
        z = 0
        for i in range(16):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return z

    grid = [(x, y) for x in (0, 1, 2, 3, 255, 256, 32767, 65535)
            for y in (0, 1, 7, 255, 4095, 65535)]
    df = spark.createDataFrame(grid, "x LONG, y LONG")
    from functools import reduce

    terms = []
    for i in range(16):
        terms.append(F.shiftleft(F.shiftright("x", i).bitwiseAND(F.lit(1)), 2 * i))
        terms.append(F.shiftleft(F.shiftright("y", i).bitwiseAND(F.lit(1)), 2 * i + 1))
    z = reduce(lambda a, b: a.bitwiseOR(b), terms)
    rows = df.select("x", "y", z.alias("z")).collect()
    for r in rows:
        assert r.z == py_interleave(r.x, r.y), (r.x, r.y)
        # deinterleave round-trip
        x_back = sum(((r.z >> (2 * i)) & 1) << i for i in range(16))
        y_back = sum(((r.z >> (2 * i + 1)) & 1) << i for i in range(16))
        assert (x_back, y_back) == (r.x, r.y)
    # dominance monotonicity on the python mirror (property of the code)
    for x, y in grid:
        if x < 65535 and y < 65535:
            assert py_interleave(x + 1, y + 1) > py_interleave(x, y)
