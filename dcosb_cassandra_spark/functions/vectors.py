"""Vector/embedding column expressions (SURVEY.md §2 D3/D4/D8).

All pure higher-order built-in functions (`transform`/`zip_with`/
`aggregate`) — JVM-side, no Python UDF in any hot path. Inputs are
``array<float>``; every function casts to double FIRST so results match the
DuckDB oracle which computes list math in double (FIXTURES.md gotchas).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Elementwise product folded left-to-right (deterministic order — same
    association as DuckDB's list functions, so results are bit-stable)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(vec: Column) -> Column:
    return F.sqrt(dot(vec, vec))


def l2_normalize(vec: Column) -> Column:
    n = l2_norm(vec)
    return F.transform(vec, lambda x: x / n)


def cosine(a: Column, b: Column) -> Column:
    a, b = as_double(a), as_double(b)
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def literal_vector(values: list[float]) -> Column:
    return F.array(*[F.lit(float(v)) for v in values])


def squared_l2_distance(a: Column, b: Column) -> Column:
    a, b = as_double(a), as_double(b)
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def similarity_cosine(a: Column, b: Column) -> Column:
    """CQL 5.0 ``similarity_cosine`` [PK Cassandra 5.0 vector-search CQL
    functions; Lucene ``VectorSimilarityFunction.COSINE``]: the raw cosine
    mapped into [0, 1] as (1 + cos) / 2 — the score a SAI vector index
    reports."""
    return (F.lit(1.0) + cosine(a, b)) / F.lit(2.0)


def similarity_dot_product(a: Column, b: Column) -> Column:
    """CQL 5.0 ``similarity_dot_product`` [PK Lucene DOT_PRODUCT scaling]:
    (1 + a·b) / 2. Like Cassandra, assumes unit-normalized inputs for the
    [0, 1] range guarantee — not clamped otherwise."""
    return (F.lit(1.0) + dot(as_double(a), as_double(b))) / F.lit(2.0)


def similarity_euclidean(a: Column, b: Column) -> Column:
    """CQL 5.0 ``similarity_euclidean`` [PK Lucene EUCLIDEAN scaling]:
    1 / (1 + squared L2 distance)."""
    return F.lit(1.0) / (F.lit(1.0) + squared_l2_distance(a, b))


def cosine_sim_to_literal(vec: Column, qvec: list[float]) -> Column:
    """Cosine similarity of a vector column against a constant query vector.
    The constant folds into codegen — no join, no broadcast needed."""
    return cosine(vec, literal_vector(qvec))


def sign_bits(vec: Column, n_bits: int) -> Column:
    """Coordinate-hyperplane LSH signature: sign of the first ``n_bits``
    components as a bitstring column. Deterministic, oracle-expressible
    (DuckDB twin uses the same componentwise CASE). Used to bucket
    similarity search so candidate generation is a hash-partition join,
    not a cross join (SURVEY.md §2 scale rule for D4)."""
    bits = [
        F.when(F.element_at(vec, i + 1) >= 0, F.lit("1")).otherwise(F.lit("0"))
        for i in range(n_bits)
    ]
    return F.concat(*bits)


def sign_bits_range(vec: Column, start: int, n_bits: int) -> Column:
    """`sign_bits` over components ``start .. start + n_bits - 1``
    (1-indexed) — an LSH signature INDEPENDENT of the prefix signature,
    used to subdivide coarse-quantizer buckets in the graph build so the
    per-block candidate join stays bounded as the corpus grows
    (llm_similarity.adaptive_bucket_split_bits). ``n_bits = 0`` yields the
    empty string: every row shares one block (the demo-corpus posture)."""
    if n_bits <= 0:
        return F.lit("")
    bits = [
        F.when(F.element_at(vec, start + i) >= 0, F.lit("1")).otherwise(F.lit("0"))
        for i in range(n_bits)
    ]
    return F.concat(*bits)
