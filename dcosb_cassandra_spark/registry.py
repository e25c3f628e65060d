"""Query registry — the single source of truth consumed by
``__spark_entry__.py`` (driver contract) and the self-verification tests.

Each operator from SURVEY.md §2 registers here with BOTH its Spark
implementation and (when SQL-expressible) its DuckDB oracle twin, so the
pair can never drift apart. Column aliases are shared by construction:
the driver sorts columns by name before hashing, so every computed column
is aliased identically on both sides (SURVEY.md §5.2).
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

#: modules that register queries on import (order = SURVEY.md §7 phases)
_OPERATOR_MODULES = (
    "dcosb_cassandra_spark.operators.headline",
    "dcosb_cassandra_spark.operators.cql_read",
    "dcosb_cassandra_spark.operators.cql_write",
    "dcosb_cassandra_spark.operators.cql_functions",
    "dcosb_cassandra_spark.operators.relational",
    "dcosb_cassandra_spark.operators.windows",
    "dcosb_cassandra_spark.operators.streaming_batch",
    "dcosb_cassandra_spark.operators.llm_dedup",
    "dcosb_cassandra_spark.operators.llm_similarity",
    "dcosb_cassandra_spark.operators.llm_text",
    "dcosb_cassandra_spark.operators.llm_multimodal",
    "dcosb_cassandra_spark.operators.extras",
    "dcosb_cassandra_spark.operators.stats",
    "dcosb_cassandra_spark.operators.extras2",
    "dcosb_cassandra_spark.operators.mllib_variants",
)


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB-1.0.0 SQL twin; None → driver rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)  # SURVEY §2 row ids
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Decorator: register ``fn(spark, sf_dir) -> DataFrame`` under ``name``."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(name, fn, oracle, tuple(tags), (fn.__doc__ or "").strip())
        return fn

    return deco


_loaded = False


def load_all() -> dict[str, QuerySpec]:
    global _loaded
    if not _loaded:
        for mod in _OPERATOR_MODULES:
            importlib.import_module(mod)
        _loaded = True
    return REGISTRY
