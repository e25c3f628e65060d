"""Driver-contract smoke tests for __spark_entry__.py."""

from __future__ import annotations

import importlib.util
import os

spec = importlib.util.spec_from_file_location(
    "spark_entry", os.path.join(os.path.dirname(__file__), "..", "__spark_entry__.py")
)
spark_entry = importlib.util.module_from_spec(spec)
spec.loader.exec_module(spark_entry)


def test_entry_smoke(spark):
    df = spark_entry.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "sum_qty" in df.columns


def test_queries_and_oracles_aligned(spark):
    qs = spark_entry.queries()
    oracles = spark_entry.oracle_sql()
    assert qs, "no queries registered"
    assert set(oracles) <= set(qs)
