"""Murmur3Partitioner-compatible token() [PK `dht/Murmur3Partitioner.java`,
`utils/MurmurHash.java` — MurmurHash3 x64_128 is public domain (Austin
Appleby); constants and structure below follow the published algorithm].

Cassandra's token for a partition key is the FIRST 64-bit half of
MurmurHash3_x64_128(serialized key bytes, seed=0), with Long.MIN_VALUE
normalized to Long.MAX_VALUE. A bigint key serializes as 8 big-endian
bytes (`LongType`).

Compatibility note, deliberately replicated: Cassandra's Java port
sign-extends TAIL bytes (``(long) key[i] << shift`` on a signed byte),
which diverges from the canonical C++ x64_128 for tail bytes ≥ 0x80.
Cassandra keeps the quirk forever (changing it would re-shuffle every
ring), so a compatible token MUST keep it too — an 8-byte key is ALL
tail (no 16-byte block), making the quirk load-bearing here.

Two implementations, cross-checked in tests:
- ``murmur3_x64_128`` — scalar pure-Python reference over arbitrary bytes;
- ``murmur3_token_int64`` — numpy-vectorized over int64 key arrays
  (uint64 wraparound arithmetic), wrapped as an Arrow-batched pandas UDF
  ``token_udf`` for the hot path. No row-at-a-time Python.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

_C1 = 0x87C37B91114253D5
_C2 = 0x4CF5AD432745937F
_MASK = 0xFFFFFFFFFFFFFFFF


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _MASK


def _fmix(k: int) -> int:
    k ^= k >> 33
    k = (k * 0xFF51AFD7ED558CCD) & _MASK
    k ^= k >> 33
    k = (k * 0xC4CEB9FE1A85EC53) & _MASK
    k ^= k >> 33
    return k


def murmur3_x64_128(data: bytes, seed: int = 0) -> tuple[int, int]:
    """Scalar reference, Cassandra variant (signed tail bytes). Returns
    (h1, h2) as unsigned 64-bit ints."""
    length = len(data)
    h1 = h2 = seed & _MASK
    n_blocks = length // 16
    for b in range(n_blocks):
        k1 = int.from_bytes(data[b * 16 : b * 16 + 8], "little")
        k2 = int.from_bytes(data[b * 16 + 8 : b * 16 + 16], "little")
        k1 = (k1 * _C1) & _MASK
        k1 = _rotl(k1, 31)
        k1 = (k1 * _C2) & _MASK
        h1 ^= k1
        h1 = _rotl(h1, 27)
        h1 = (h1 + h2) & _MASK
        h1 = (h1 * 5 + 0x52DCE729) & _MASK
        k2 = (k2 * _C2) & _MASK
        k2 = _rotl(k2, 33)
        k2 = (k2 * _C1) & _MASK
        h2 ^= k2
        h2 = _rotl(h2, 31)
        h2 = (h2 + h1) & _MASK
        h2 = (h2 * 5 + 0x38495AB5) & _MASK

    tail = data[n_blocks * 16 :]
    k1 = k2 = 0
    for i in range(len(tail) - 1, -1, -1):
        # Cassandra quirk: sign-extended byte, XOR-accumulated
        sb = tail[i] - 256 if tail[i] >= 128 else tail[i]
        if i < 8:
            k1 ^= (sb << (8 * i)) & _MASK
        else:
            k2 ^= (sb << (8 * (i - 8))) & _MASK
    if len(tail) > 8:
        k2 = (k2 * _C2) & _MASK
        k2 = _rotl(k2, 33)
        k2 = (k2 * _C1) & _MASK
        h2 ^= k2
    if tail:
        k1 = (k1 * _C1) & _MASK
        k1 = _rotl(k1, 31)
        k1 = (k1 * _C2) & _MASK
        h1 ^= k1

    h1 ^= length
    h2 ^= length
    h1 = (h1 + h2) & _MASK
    h2 = (h2 + h1) & _MASK
    h1 = _fmix(h1)
    h2 = _fmix(h2)
    h1 = (h1 + h2) & _MASK
    h2 = (h2 + h1) & _MASK
    return h1, h2


def cassandra_token_of_bigint(key: int) -> int:
    """Scalar reference: Murmur3Partitioner token of a bigint key (signed
    64-bit result; MIN_VALUE normalizes to MAX_VALUE)."""
    h1, _ = murmur3_x64_128(int(key).to_bytes(8, "big", signed=True))
    tok = h1 - (1 << 64) if h1 >= (1 << 63) else h1
    return (1 << 63) - 1 if tok == -(1 << 63) else tok


def _np_rotl(x: np.ndarray, r: int) -> np.ndarray:
    return (x << np.uint64(r)) | (x >> np.uint64(64 - r))


def _np_fmix(k: np.ndarray) -> np.ndarray:
    k = k ^ (k >> np.uint64(33))
    k = k * np.uint64(0xFF51AFD7ED558CCD)
    k = k ^ (k >> np.uint64(33))
    k = k * np.uint64(0xC4CEB9FE1A85EC53)
    return k ^ (k >> np.uint64(33))


def murmur3_token_int64(keys: np.ndarray) -> np.ndarray:
    """Vectorized Murmur3Partitioner token over an int64 key array: the
    8 big-endian key bytes are all tail, sign-extended per the Cassandra
    quirk, XOR-folded into k1 — which for an 8-byte big-endian long
    reduces to plain byte-reversal into little-endian with the sign
    carried on the LAST (most-significant-in-key) byte."""
    with np.errstate(over="ignore"):
        k = keys.astype(np.int64).view(np.uint64)
        k1 = np.zeros_like(k)
        for i in range(8):
            # byte i of the big-endian serialization ends up at tail index
            # i, i.e. shifted left 8*i; byte 0 (MSB of the key) is signed
            be_byte = (k >> np.uint64(8 * (7 - i))) & np.uint64(0xFF)
            sb = be_byte.astype(np.int64)
            sb = np.where(sb >= 128, sb - 256, sb)  # sign-extend (the quirk)
            k1 ^= sb.view(np.uint64) << np.uint64(8 * i)
        h1 = np.zeros_like(k)
        h2 = np.zeros_like(k)
        k1 = k1 * np.uint64(_C1)
        k1 = _np_rotl(k1, 31)
        k1 = k1 * np.uint64(_C2)
        h1 = h1 ^ k1
        h1 = h1 ^ np.uint64(8)
        h2 = h2 ^ np.uint64(8)
        h1 = h1 + h2
        h2 = h2 + h1
        h1 = _np_fmix(h1)
        h2 = _np_fmix(h2)
        h1 = h1 + h2
        tok = h1.view(np.int64)
        return np.where(tok == np.iinfo(np.int64).min, np.iinfo(np.int64).max, tok)


def _token_udf():
    # built lazily: @pandas_udf needs an active SparkSession, and this
    # module must stay importable without one (scalar reference use)
    @pandas_udf("long")
    def token_udf(keys: pd.Series) -> pd.Series:
        """Arrow-batched Murmur3Partitioner token of a bigint partition key."""
        return pd.Series(murmur3_token_int64(keys.to_numpy(dtype=np.int64)))

    return token_udf


def token_murmur3(col: Column | str) -> Column:
    """token(key) with real Murmur3Partitioner semantics — use when the
    ring positions must match an actual Cassandra cluster (e.g. splitting
    a 100 TB keyspace scan along the cluster's own token ranges). For
    oracle-checkable bucketing where cross-engine determinism is what
    matters, the md5-based token (a05) is the twin."""
    c = F.col(col) if isinstance(col, str) else col
    return _token_udf()(c.cast("long"))


def _composite_key_bytes(vals: tuple) -> bytes:
    """CompositeType serialization of a multi-column partition key
    [PK `db/marshal/CompositeType.java` build()]: per component a 2-byte
    big-endian length, the component's type-serialized bytes, and a zero
    end-of-component byte. Used by Murmur3Partitioner whenever the
    partition key has MORE than one column (single-column keys hash their
    raw serialized bytes — `token_murmur3`)."""
    out = bytearray()
    for v in vals:
        if isinstance(v, (int, np.integer)):
            b = int(v).to_bytes(8, "big", signed=True)
        elif isinstance(v, str):
            b = v.encode("utf-8")
        elif isinstance(v, bytes):
            b = v
        else:
            raise TypeError(f"unsupported composite key component type {type(v)}")
        out += len(b).to_bytes(2, "big")
        out += b
        out.append(0)
    return bytes(out)


def cassandra_token_of_composite(*vals) -> int:
    """Scalar reference: Murmur3Partitioner token of a composite key."""
    h1, _ = murmur3_x64_128(_composite_key_bytes(vals))
    tok = h1 - (1 << 64) if h1 >= (1 << 63) else h1
    return (1 << 63) - 1 if tok == -(1 << 63) else tok


def token_murmur3_composite(*cols: Column | str) -> Column:
    """token(pk1, pk2, ...) for composite partition keys. Arrow-batched:
    the batch arrives as pandas Series per component; serialization is
    per-row (CompositeType framing is variable-length so the int64
    byte-trick of `murmur3_token_int64` does not apply)."""
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]

    @pandas_udf("long")
    def composite_token_udf(*parts: pd.Series) -> pd.Series:
        rows = zip(*(p.tolist() for p in parts))
        return pd.Series([cassandra_token_of_composite(*r) for r in rows], dtype="int64")

    return composite_token_udf(*cs)
