"""d15b/c15 shard-manifest properties: the commutative merge law (any
batching of the corpus re-aggregates to the identical manifest) and the
d14e multi-epoch plan's exactness invariants."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from dcosb_cassandra_spark.catalog import table
from dcosb_cassandra_spark.operators.llm_packing import (
    _EPOCH_BUDGET_X,
    MIX_WEIGHTS,
    merge_manifests,
    shard_manifest,
)
from dcosb_cassandra_spark.registry import REGISTRY, load_all

SF_DIR = "/root/testdata/sf0.001"


def _rows(df):
    return {r["shard_id"]: tuple(r)[1:] for r in df.collect()}


@pytest.mark.parametrize("n_splits", [2, 5])
def test_manifest_merge_equals_one_shot(spark, n_splits):
    """Split the corpus into arbitrary disjoint batches (round-robin on
    doc_id — deliberately NOT the shard key), build per-batch partial
    manifests, merge: must equal the one-shot manifest field for field.
    This is the law c15's streamed upkeep and any backfill+increment mix
    rely on."""
    docs = table(spark, SF_DIR, "documents")
    one_shot = _rows(shard_manifest(docs))
    parts = [
        shard_manifest(docs.filter(F.col("doc_id") % n_splits == i))
        for i in range(n_splits)
    ]
    merged = parts[0]
    for p in parts[1:]:
        merged = merged.unionByName(p)
    assert _rows(merge_manifests(merged)) == one_shot and one_shot


def test_manifest_covers_corpus_exactly(spark):
    """Shards partition the corpus: doc counts and doc_id checksums sum
    to the whole table's."""
    docs = table(spark, SF_DIR, "documents")
    m = shard_manifest(docs).agg(
        F.sum("n_docs").alias("nd"), F.sum("sum_doc_id").alias("sd")
    ).collect()[0]
    t = docs.agg(
        F.count(F.lit(1)).alias("nd"), F.sum("doc_id").alias("sd")
    ).collect()[0]
    assert (m["nd"], m["sd"]) == (t["nd"], t["sd"])


def test_d14e_plan_is_exact_in_tokens(spark):
    """Per domain: epochs*epoch_tokens + remainder_tokens never exceeds
    the target, undershoots by less than the largest document (the
    prefix-cut granularity), and epochs matches integer division."""
    load_all()
    out = {r["source"]: r for r in
           REGISTRY["d14e_multi_epoch_plan"].fn(spark, SF_DIR).collect()}
    docs = table(spark, SF_DIR, "documents")
    max_tok = {
        r["source"]: r["mt"]
        for r in docs.groupBy("source")
        .agg(F.max(F.size(F.split(F.col("text"), " "))).alias("mt"))
        .collect()
    }
    assert set(out) == set(MIX_WEIGHTS)
    for s, r in out.items():
        assert r["epochs"] == r["target_tokens"] // r["epoch_tokens"]
        assert r["effective_tokens"] <= r["target_tokens"]
        assert r["target_tokens"] - r["effective_tokens"] <= max_tok[s]
        assert r["epochs"] >= 1  # budget 3x corpus: every domain repeats
    tot = sum(r["epoch_tokens"] for r in out.values())
    assert sum(r["target_tokens"] for r in out.values()) <= _EPOCH_BUDGET_X * tot
