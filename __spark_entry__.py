"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over ``dcosb_cassandra_spark.registry`` — every operator from
SURVEY.md §2 registers its Spark implementation and DuckDB oracle twin in
one place, and this module just re-exposes them in the driver's shape.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from dcosb_cassandra_spark.registry import REGISTRY, load_all  # noqa: E402

load_all()

_SMOKE_SF_DIR = "/root/testdata/sf0.001"
_FLAGSHIP = "q1_pricing_summary"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 shape) on sf0.001; driver checks rows>0."""
    return REGISTRY[_FLAGSHIP].fn(spark, _SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB twins; omitted entries (oracle=None) get rows-only checks."""
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None}
