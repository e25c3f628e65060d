"""The core gate: every registered query must match its DuckDB oracle twin
at sf0.01 (row count + sorted column names + order-insensitive values) —
the same comparison shape the driver applies (SURVEY.md §5.2).
"""

from __future__ import annotations

import pytest

from dcosb_cassandra_spark.compare import compare_query
from dcosb_cassandra_spark.registry import REGISTRY, load_all

from .conftest import SF_DIR

load_all()


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(spark, name):
    res = compare_query(spark, name, SF_DIR)
    assert res["ok"], res
