"""Empty-corpus robustness: every registered operator must handle
zero-row inputs without raising.

At 100 TB this is not a corner case — per-partition predicates, fresh
tenants, date-bounded reruns, and dev environments all produce empty
scans, and an engine that throws on them fails pipelines at 3 a.m.
Failure modes this catches: driver-side point lookups that assume a row
exists (``head()[0]``), MLlib fits on empty frames, pandas UDFs that
index into empty batches, and divide-by-zero in share/ratio projections.
"""

from __future__ import annotations

import pytest

from dcosb_cassandra_spark.catalog import TABLES
from dcosb_cassandra_spark.registry import REGISTRY, load_all

load_all()


@pytest.fixture(scope="session")
def empty_sf_dir(tmp_path_factory) -> str:
    """All ten tables with their real schemas and zero rows."""
    import pyarrow.parquet as pq

    src = "/root/testdata/sf0.001"
    dst = tmp_path_factory.mktemp("sf_empty")
    for t in TABLES:
        schema = pq.read_schema(f"{src}/{t}.parquet")
        pq.write_table(schema.empty_table(), str(dst / f"{t}.parquet"))
    return str(dst)


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_runs_on_empty_corpus(spark, empty_sf_dir, name):
    n = REGISTRY[name].fn(spark, empty_sf_dir).count()
    assert n >= 0
