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


def test_gc_grace_purge_and_zombie_hazard(spark):
    """Tombstone GC semantics: within grace the tombstone persists and keeps
    shadowing late writes; after purge, a late OLDER write resurrects the
    row — the documented Cassandra zombie hazard compact_with_grace
    reproduces faithfully."""
    from dcosb_cassandra_spark.functions.lww import compact_with_grace, lww_compact

    log = spark.createDataFrame(
        [
            (1, 10, 5, 0, False),
            (1, 0, 8, 1, True),   # tombstone at wt=8
            (2, 20, 5, 2, False),
        ],
        SCHEMA,
    )
    # tombstone still within grace (grace bound 7 < wt 8): retained, flagged
    within = compact_with_grace(log, ["k"], gc_grace_writetime=7, tiebreak_col="mutation_id")
    rows = {r["k"]: (r["payload"], r["tombstone"]) for r in within.collect()}
    assert rows[1][1] is True, "in-grace tombstone must be retained"
    assert rows[2] == (20, False)

    # late write OLDER than the retained tombstone arrives -> still shadowed
    late = spark.createDataFrame([(1, 99, 6, 3, False)], SCHEMA)
    merged = lww_compact(within.unionByName(late), ["k"], tiebreak_col="mutation_id")
    assert {r["k"] for r in merged.collect()} == {2}, "retained tombstone shadows the late write"

    # tombstone past grace (bound 9 >= wt 8): purged entirely
    purged = compact_with_grace(log, ["k"], gc_grace_writetime=9, tiebreak_col="mutation_id")
    assert {r["k"]: r["tombstone"] for r in purged.collect()} == {2: False}

    # the SAME late write now resurrects k=1 — the zombie
    zombie = lww_compact(purged.unionByName(late), ["k"], tiebreak_col="mutation_id")
    assert {r["k"]: r["payload"] for r in zombie.collect()} == {1: 99, 2: 20}


def test_cdc_feed_replays_t1_state_to_t2_state(spark):
    """CDC invariants (c12_cdc_change_feed): op images are consistent
    (INSERT has no before-image, DELETE no after-image, UPDATE changes the
    cell), and applying the feed's key deltas to the live set at t1
    reproduces the live set at t2."""
    from dcosb_cassandra_spark.operators.cql_write import (
        _CDC_T1,
        _CDC_T2,
        c12_cdc_change_feed,
    )
    from dcosb_cassandra_spark.sources.mutations import row_mutation_log

    from .conftest import SMOKE_SF_DIR

    feed = c12_cdc_change_feed(spark, SMOKE_SF_DIR).collect()
    for r in feed:
        if r["op"] == "INSERT":
            assert r["old_type"] is None and r["old_payload"] is None
            assert r["new_type"] is not None
        elif r["op"] == "DELETE":
            assert r["new_type"] is None and r["new_payload"] is None
            assert r["old_type"] is not None
        else:
            assert r["op"] == "UPDATE"
            assert (r["old_type"], r["old_payload"]) != (r["new_type"], r["new_payload"])

    log = row_mutation_log(spark, SMOKE_SF_DIR)

    def live_keys(bound: str) -> set:
        cut = F.unix_micros(F.lit(bound).cast("timestamp"))
        live = lww_compact(log.filter(F.col("writetime") <= cut), ["user_id"],
                           tiebreak_col="mutation_id")
        return {r["user_id"] for r in live.select("user_id").collect()}

    t1, t2 = live_keys(_CDC_T1), live_keys(_CDC_T2)
    inserts = {r["user_id"] for r in feed if r["op"] == "INSERT"}
    deletes = {r["user_id"] for r in feed if r["op"] == "DELETE"}
    assert (t1 - deletes) | inserts == t2
    assert inserts.isdisjoint(t1) and deletes <= t1
