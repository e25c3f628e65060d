"""Source/sink round-trips: parquet, ORC, CSV, JSONL writers and schema-explicit
readers must preserve values exactly (including microsecond timestamps)."""

from __future__ import annotations

import os

import pytest

from dcosb_cassandra_spark.catalog import table
from dcosb_cassandra_spark.sources import io as sio

from .conftest import SMOKE_SF_DIR

TMP = os.path.join(os.path.dirname(__file__), "..", ".tmp", "io")

ORDERS_SCHEMA = (
    "o_orderkey LONG, o_custkey LONG, o_orderstatus STRING, o_totalprice DOUBLE, "
    "o_orderdate TIMESTAMP_NTZ, o_orderpriority STRING"
)
EVENTS_SCHEMA = (
    "event_id LONG, ts TIMESTAMP_NTZ, user_id LONG, event_type STRING, value DOUBLE, props STRING"
)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize("fmt", ["parquet", "csv", "jsonl", "orc"])
def test_orders_roundtrip(spark, fmt):
    src = table(spark, SMOKE_SF_DIR, "orders")
    path = os.path.join(TMP, f"orders_{fmt}")
    if fmt == "parquet":
        sio.write_parquet(src, path)
        back = sio.read_parquet(spark, path)
    elif fmt == "csv":
        sio.write_csv(src, path)
        back = sio.read_csv(spark, path, ORDERS_SCHEMA)
    elif fmt == "jsonl":
        sio.write_jsonl(src, path)
        back = sio.read_jsonl(spark, path, ORDERS_SCHEMA)
    else:
        sio.write_orc(src, path)
        back = sio.read_orc(spark, path)
    assert _rows(back.select(*src.columns)) == _rows(src)


def test_events_microsecond_timestamps_roundtrip(spark):
    src = table(spark, SMOKE_SF_DIR, "events")
    path = os.path.join(TMP, "events_csv")
    sio.write_csv(src, path)
    back = sio.read_csv(spark, path, EVENTS_SCHEMA)
    assert _rows(back.select(*src.columns)) == _rows(src)


def test_partitioned_parquet_sink_prunes(spark):
    """partitionBy layout + partition pruning: the 100 TB layout story —
    a filter on the partition column must read only that directory."""
    src = table(spark, SMOKE_SF_DIR, "events")
    path = os.path.join(TMP, "events_parted")
    sio.write_parquet(src, path, n_files=1, partition_by=["event_type"])
    back = sio.read_parquet(spark, path)
    clicks = back.filter(back.event_type == "click")
    assert clicks.count() == src.filter(src.event_type == "click").count()
    from dcosb_cassandra_spark.plans.audit import plan_string

    plan = plan_string(clicks)
    assert "PartitionFilters: [" in plan and "event_type" in plan.split("PartitionFilters:")[1][:120]
