"""Property tests for lww_compact — the real Cassandra invariants
(SURVEY.md §5.2 item 5): compaction must be insensitive to mutation
arrival order, batch partitioning, and recompaction (idempotence),
and a winning tombstone must shadow everything older.
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from dcosb_cassandra_spark.functions.lww import lww_compact

SCHEMA = "k INT, payload INT, writetime LONG, mutation_id LONG, tombstone BOOLEAN"


def _random_log(rng: random.Random, n: int) -> list[tuple]:
    return [
        (rng.randrange(4), rng.randrange(100), rng.randrange(6), i, rng.random() < 0.25)
        for i in range(n)
    ]


def _compact_rows(spark, rows):
    df = spark.createDataFrame(rows, SCHEMA)
    out = lww_compact(df, ["k"], tiebreak_col="mutation_id")
    return sorted(tuple(r) for r in out.collect())


def test_lww_order_insensitive_and_batch_commutative(spark):
    rng = random.Random(42)
    for trial in range(5):
        rows = _random_log(rng, 30)
        base = _compact_rows(spark, rows)
        shuffled = rows[:]
        rng.shuffle(shuffled)
        assert _compact_rows(spark, shuffled) == base, f"arrival-order sensitivity (trial {trial})"
        # batch split: any partition of the log unions to the same state
        cut = rng.randrange(1, len(rows))
        assert _compact_rows(spark, rows[cut:] + rows[:cut]) == base


def test_lww_idempotent_recompaction(spark):
    rng = random.Random(7)
    rows = _random_log(rng, 40)
    df = spark.createDataFrame(rows, SCHEMA)
    once = lww_compact(df, ["k"], tiebreak_col="mutation_id")
    # re-feed the compacted state (as fresh upserts) unioned with the
    # original log: must not change the outcome (Cassandra re-compaction)
    resurrect = once.withColumn("tombstone", F.lit(False))
    twice = lww_compact(
        df.unionByName(resurrect), ["k"], tiebreak_col="mutation_id"
    )
    assert sorted(tuple(r) for r in twice.collect()) == sorted(tuple(r) for r in once.collect())


def test_tombstone_shadows_older_but_not_newer(spark):
    rows = [
        # k=1: upsert(wt=1), tombstone(wt=3), upsert(wt=2) → deleted
        (1, 10, 1, 0, False),
        (1, 0, 3, 1, True),
        (1, 20, 2, 2, False),
        # k=2: tombstone(wt=1), upsert(wt=2) → resurrected with payload 30
        (2, 0, 1, 3, True),
        (2, 30, 2, 4, False),
    ]
    out = _compact_rows(spark, rows)
    assert out == [(2, 30, 2, 4)]
