"""Paging / fetch-size semantics (SURVEY §2 A6, [PK `service/pager/`,
`db/filter/DataLimits.java`]).

Cassandra pages a query by handing the client an opaque *page state* — the
position of the last row returned — and resuming strictly after it. The
Spark-first translation: the page state IS the last row's key tuple, and
"resume after" is a lexicographic key comparison compiled to a pushdown-
friendly filter:

    (k1 > s1) OR (k1 = s1 AND k2 > s2) OR ...   -- exact resume point
    AND k1 >= s1                                 -- redundant conjunct

The redundant ``k1 >= s1`` conjunct matters at 100 TB: the OR-chain alone
defeats parquet predicate pushdown, but the conjunct is a plain range
predicate the scan CAN push, so each page prunes row groups below the
resume key instead of rescanning the table. ORDER BY key + LIMIT n then
plans as TakeOrderedAndProject — per-partition top-n and a driver merge of
n×partitions rows, never a global sort.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: an opaque-to-callers page state: values of the ordering key columns of
#: the last row served, in key order
PageState = tuple


def after_key(key_cols: list[str], state: PageState) -> Column:
    """Lexicographic (key_cols) > state, with the pushdown conjunct."""
    if len(state) != len(key_cols):
        raise ValueError(f"page state arity {len(state)} != key arity {len(key_cols)}")
    clauses = []
    for i, col in enumerate(key_cols):
        eqs = [F.col(key_cols[j]) == F.lit(state[j]) for j in range(i)]
        gt = F.col(col) > F.lit(state[i])
        clause = gt
        for e in eqs:
            clause = e & clause
        clauses.append(clause)
    exact = clauses[0]
    for c in clauses[1:]:
        exact = exact | c
    return exact & (F.col(key_cols[0]) >= F.lit(state[0]))


def fetch_page(
    df: DataFrame, key_cols: list[str], fetch_size: int, state: PageState | None = None
) -> DataFrame:
    """One page of ``df`` ordered by ``key_cols``, resuming after ``state``
    (None = first page). Returns a DataFrame of ≤ fetch_size rows; pass the
    last row through :func:`page_state_of` to get the next state."""
    if state is not None:
        df = df.filter(after_key(key_cols, state))
    return df.orderBy(*key_cols).limit(fetch_size)


def page_state_of(row, key_cols: list[str]) -> PageState:
    """Page state from the LAST collected row of a page."""
    return tuple(row[c] for c in key_cols)


def iterate_pages(df: DataFrame, key_cols: list[str], fetch_size: int):
    """Generator over all pages (driver-side loop, one bounded action per
    page — exactly the Cassandra driver's fetch-more loop; each action
    reads only rows after the resume key thanks to the pushdown conjunct)."""
    state: PageState | None = None
    while True:
        rows = fetch_page(df, key_cols, fetch_size, state).collect()
        if not rows:
            return
        yield rows
        if len(rows) < fetch_size:
            return
        state = page_state_of(rows[-1], key_cols)
