"""Paging/fetch-size semantics (SURVEY §2 A6): the page-state model must
walk the whole table exactly once in key order, resume correctly across
pages, and keep the resume predicate pushdown-friendly."""

from __future__ import annotations

from pyspark.sql import functions as F

from dcosb_cassandra_spark.catalog import table
from dcosb_cassandra_spark.functions.paging import fetch_page, iterate_pages, page_state_of
from dcosb_cassandra_spark.plans.audit import plan_string

from .conftest import SF_DIR


def test_pages_partition_the_table_in_key_order(spark):
    o = table(spark, SF_DIR, "orders").select("o_orderkey", "o_custkey")
    seen = []
    for page in iterate_pages(o, ["o_orderkey"], 700):
        assert len(page) <= 700
        seen.extend(r["o_orderkey"] for r in page)
    assert seen == sorted(seen), "pages must be globally key-ordered"
    assert len(seen) == o.count(), "every row exactly once"
    assert len(set(seen)) == len(seen)


def test_composite_key_resume_is_exact(spark):
    # the page key must be UNIQUE: l_linenumber alone is not unique within
    # an order, so l_partkey/l_suppkey complete the tuple
    key = ["l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"]
    l = table(spark, SF_DIR, "lineitem").select(*key)
    first = fetch_page(l, key, 10).collect()
    state = page_state_of(first[-1], key)
    second = fetch_page(l, key, 10, state).collect()
    joined = [tuple(r) for r in first + second]
    expected = [tuple(r) for r in l.orderBy(*key).limit(20).collect()]
    assert joined == expected, "page 1 + page 2 == first 20 rows, no gap/overlap"


def test_resume_predicate_pushes_down_and_takeordered(spark):
    l = table(spark, SF_DIR, "lineitem").select("l_orderkey", "l_linenumber")
    page = fetch_page(l, ["l_orderkey", "l_linenumber"], 25, state=(3, 2))
    plan = plan_string(page)
    assert "TakeOrderedAndProject" in plan, "a page must not global-sort"
    assert "PushedFilters: [" in plan and "GreaterThanOrEqual(l_orderkey,3)" in plan, (
        "the redundant first-key conjunct must reach the parquet scan:\n" + plan
    )


def test_paged_scan_within_token_range(spark):
    """The Cassandra connector's bulk-read pattern composed from our
    primitives: split the keyspace by murmur3 token range, then page
    through one split in key order — every row of the split exactly once,
    none from outside it."""
    from dcosb_cassandra_spark.functions.murmur3 import token_murmur3

    o = table(spark, SF_DIR, "orders").select("o_orderkey")
    tok = token_murmur3(F.col("o_orderkey"))
    split = o.filter(tok >= 0)  # upper half of the ring
    expected = {r["o_orderkey"] for r in split.collect()}

    seen = []
    for page in iterate_pages(split, ["o_orderkey"], 500):
        seen.extend(r["o_orderkey"] for r in page)
    assert set(seen) == expected and len(seen) == len(expected)
    assert seen == sorted(seen)
