"""MLlib-backed variants of the similarity/dedup operators (SURVEY.md D2/D4
lists `MinHashLSH` / `BucketedRandomProjectionLSH` as the library path; the
hand-rolled md5 forms are the oracle-checkable primaries). These are
rows-only entries — MLlib's hash families are seeded differently from any
SQL oracle — but their RESULTS are cross-validated against the hand-rolled
operators in tests/test_mllib_variants.py.

Scale: both LSH models broadcast their (tiny) hash coefficients;
approxSimilarityJoin is the same bucket-equi-join shape as the hand-rolled
banding — no cross join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import query


#: cap on the MLlib cross-validation corpora: these queries exist to prove
#: our hand-rolled MinHash/sign-LSH agree with MLlib's (the hand-rolled
#: forms are the 100 TB path), so they run on a key-bounded slice — the
#: uncapped approxSimilarityJoin OOMs a default-heap driver at sf0.1+,
#: which is noise, not signal, for a parity demo
_MLLIB_DEMO_DOCS = 2000


def _token_features(spark: SparkSession, sf_dir: str, n_features: int = 1 << 14) -> DataFrame:
    from pyspark.ml.feature import HashingTF

    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < _MLLIB_DEMO_DOCS)
    toks = d.select("doc_id", F.array_distinct(F.split("text", " ")).alias("tokens"))
    tf = HashingTF(inputCol="tokens", outputCol="features", numFeatures=n_features, binary=True)
    return tf.transform(toks)


@query("d2g_mllib_minhash_pairs", oracle=None, tags=("D2", "P2", "rows-only"))
def d2g_mllib_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHashLSH near-dup candidates (Jaccard distance ≤ 0.5) via
    approxSimilarityJoin — the MLlib twin of d2b."""
    from pyspark.ml.feature import MinHashLSH

    feats = _token_features(spark, sf_dir)
    model = MinHashLSH(inputCol="features", outputCol="hashes", numHashTables=4, seed=42).fit(feats)
    pairs = model.approxSimilarityJoin(feats, feats, 0.5, distCol="jaccard_dist")
    return (
        pairs.filter(F.col("datasetA.doc_id") < F.col("datasetB.doc_id"))
        .select(
            F.col("datasetA.doc_id").alias("id_a"),
            F.col("datasetB.doc_id").alias("id_b"),
            F.round("jaccard_dist", 6).alias("jaccard_dist"),
        )
    )


@query("d4c_mllib_random_projection_knn", oracle=None, tags=("D4", "P2", "rows-only"))
def d4c_mllib_random_projection_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BucketedRandomProjectionLSH approximate nearest neighbors for one
    query vector — the MLlib twin of the sign-bit LSH path (d4)."""
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    e = table(spark, sf_dir, "embeddings").select(
        "vec_id", array_to_vector(F.col("embedding").cast("array<double>")).alias("features")
    )
    if e.isEmpty():  # LSH.fit raises on an empty corpus; keep the schema
        return e.select("vec_id", F.lit(0.0).alias("dist")).filter(F.lit(False))
    model = BucketedRandomProjectionLSH(
        inputCol="features", outputCol="hashes", bucketLength=2.0, numHashTables=3, seed=42
    ).fit(e)
    qvec = e.filter(F.col("vec_id") == 0).head()["features"]
    nn = model.approxNearestNeighbors(e.filter(F.col("vec_id") != 0), qvec, 10, distCol="dist")
    return nn.select("vec_id", F.round("dist", 6).alias("dist"))
