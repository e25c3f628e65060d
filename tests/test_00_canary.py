"""Round-start testdata canary — runs FIRST (filename sorts before every
other test module).

The driver regenerates /root/testdata between rounds, and physical parquet
encodings have silently changed across generations (events.ts shipped as
TIMESTAMP(NANOS) in r1-r3 and TIMESTAMP(MICROS) in r4 — breaking every
events query until the catalog grew a dtype branch). This canary asserts,
in milliseconds and without a SparkSession, that every table still has the
exact column names and a type in the family the engine supports — so a
regeneration lands as one obvious failure here instead of dozens of
mysterious ones downstream.

Timestamp columns accept any unit (s/ms/us/ns): the catalog handles nanos
via the legacy long read path and everything else natively, so the canary
pins the FAMILY, not the unit.
"""

import os

import pyarrow.parquet as pq
import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_CANARY_SF", "/root/testdata/sf0.01")

#: column -> type family; "ts" matches any timestamp unit, "list<float>"
#: matches a list of float32/float64
EXPECTED = {
    "region": {"r_regionkey": "int32", "r_name": "string"},
    "nation": {"n_nationkey": "int32", "n_name": "string", "n_regionkey": "int32"},
    "customer": {
        "c_custkey": "int64",
        "c_name": "string",
        "c_nationkey": "int32",
        "c_acctbal": "double",
        "c_mktsegment": "string",
    },
    "supplier": {
        "s_suppkey": "int64",
        "s_name": "string",
        "s_nationkey": "int32",
        "s_acctbal": "double",
    },
    "part": {
        "p_partkey": "int64",
        "p_name": "string",
        "p_brand": "string",
        "p_type": "string",
        "p_size": "int32",
        "p_retailprice": "double",
    },
    "orders": {
        "o_orderkey": "int64",
        "o_custkey": "int64",
        "o_orderstatus": "string",
        "o_totalprice": "double",
        "o_orderdate": "ts",
        "o_orderpriority": "string",
    },
    "lineitem": {
        "l_orderkey": "int64",
        "l_partkey": "int64",
        "l_suppkey": "int64",
        "l_linenumber": "int32",
        "l_quantity": "double",
        "l_extendedprice": "double",
        "l_discount": "double",
        "l_tax": "double",
        "l_returnflag": "string",
        "l_linestatus": "string",
        "l_shipdate": "ts",
    },
    "events": {
        "event_id": "int64",
        "ts": "ts",
        "user_id": "int64",
        "event_type": "string",
        "value": "double",
        "props": "string",
    },
    "documents": {
        "doc_id": "int64",
        "text": "string",
        "lang": "string",
        "source": "string",
        "n_chars": "int64",
    },
    "embeddings": {
        "vec_id": "int64",
        "embedding": "list<float>",
        "label": "int32",
    },
}


def _family(t) -> str:
    import pyarrow as pa

    if pa.types.is_timestamp(t):
        return "ts"
    if pa.types.is_list(t) and pa.types.is_floating(t.value_type):
        return "list<float>"
    return str(t)


@pytest.mark.parametrize("tbl", sorted(EXPECTED))
def test_testdata_schema_canary(tbl):
    path = os.path.join(SF_DIR, f"{tbl}.parquet")
    assert os.path.exists(path), f"testdata table missing: {path}"
    schema = pq.read_schema(path)
    got = {f.name: _family(f.type) for f in schema}
    want = EXPECTED[tbl]
    missing = {c: t for c, t in want.items() if got.get(c) != t}
    assert not missing, (
        f"{tbl}: testdata regeneration changed the schema — expected "
        f"{missing}, parquet has { {c: got.get(c) for c in missing} }. "
        "Check catalog.table's dtype branches before touching oracles."
    )
    extra = set(got) - set(want)
    assert not extra, f"{tbl}: new columns appeared in testdata: {sorted(extra)}"
