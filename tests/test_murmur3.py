"""Murmur3Partitioner token compatibility: the vectorized UDF must agree
with the scalar reference implementation bit-for-bit, partition the ring,
and keep Cassandra's documented normalization + signed-tail quirk."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from dcosb_cassandra_spark.catalog import table
from dcosb_cassandra_spark.functions.murmur3 import (
    cassandra_token_of_bigint,
    murmur3_token_int64,
    murmur3_x64_128,
    token_murmur3,
)

from .conftest import SF_DIR


def test_empty_input_hashes_to_zero():
    # the one universally-known x64_128 vector: seed 0, empty input -> (0, 0)
    assert murmur3_x64_128(b"") == (0, 0)


def test_vectorized_matches_scalar_reference():
    keys = np.array(
        [0, 1, -1, 42, -42, 2**62, -(2**62), 2**63 - 1, -(2**63), 123456789],
        dtype=np.int64,
    )
    vec = murmur3_token_int64(keys)
    ref = np.array([cassandra_token_of_bigint(int(k)) for k in keys], dtype=np.int64)
    assert (vec == ref).all()
    rng = np.random.default_rng(7)
    sweep = rng.integers(-(2**63), 2**63 - 1, size=2000, dtype=np.int64)
    assert (murmur3_token_int64(sweep) == np.array(
        [cassandra_token_of_bigint(int(k)) for k in sweep], dtype=np.int64
    )).all()


def test_min_value_normalizes_to_max():
    # Murmur3Partitioner: LongType token can never be Long.MIN_VALUE
    keys = np.arange(0, 50000, dtype=np.int64)
    toks = murmur3_token_int64(keys)
    assert (toks != np.iinfo(np.int64).min).all()


def test_udf_partitions_the_ring(spark):
    o = table(spark, SF_DIR, "orders")
    tok = token_murmur3(F.col("o_orderkey"))
    bucket = (F.shiftrightunsigned(tok, 60) + 8) % 16
    counts = {r["b"]: r["count"] for r in o.select(bucket.alias("b")).groupBy("b").count().collect()}
    assert sum(counts.values()) == o.count(), "buckets must partition the table"
    assert len(counts) == 16, "a uniform hash must hit all 16 ranges"
    # spot-check three tokens against the scalar reference through Spark
    rows = o.select("o_orderkey", tok.alias("tok")).limit(3).collect()
    for r in rows:
        assert r["tok"] == cassandra_token_of_bigint(r["o_orderkey"])


def test_composite_token_serialization_reference():
    """CompositeType framing [PK CompositeType.java]: 2-byte length +
    bytes + 0x00 per component; composite of one component differs from
    the raw single-key hash (Cassandra only composites multi-column keys)."""
    from dcosb_cassandra_spark.functions.murmur3 import (
        _composite_key_bytes,
        cassandra_token_of_bigint,
        cassandra_token_of_composite,
    )

    assert _composite_key_bytes((1,)) == b"\x00\x08" + (1).to_bytes(8, "big") + b"\x00"
    assert _composite_key_bytes(("ab",)) == b"\x00\x02ab\x00"
    # framing matters: composite-of-one != raw single-key token
    assert cassandra_token_of_composite(1) != cassandra_token_of_bigint(1)
    # order matters
    assert cassandra_token_of_composite(1, "x") != cassandra_token_of_composite("x", 1)
    # deterministic
    assert cassandra_token_of_composite(5, "u") == cassandra_token_of_composite(5, "u")
