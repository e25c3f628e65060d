"""Accuracy gate for sketch-based (rows-only) operators: no SQL oracle can
replay Spark's DataSketches binaries, so correctness is bounded against
the exact twin instead."""

from __future__ import annotations

from dcosb_cassandra_spark.registry import REGISTRY, load_all

load_all()

SF_DIR = "/root/testdata/sf0.01"


def test_hll_rolling_dau_tracks_exact(spark):
    """b36b's HLL estimates must cover the same windows as exact b36 and
    sit within 5% (the default lgConfigK=12 sketch has ±1.6% standard
    error; 5% is > 3 sigma)."""
    exact = {r[0]: r[1] for r in REGISTRY["b36_rolling_dau"].fn(spark, SF_DIR).collect()}
    approx = {
        r[0]: r[1] for r in REGISTRY["b36b_rolling_dau_hll"].fn(spark, SF_DIR).collect()
    }
    assert set(exact) == set(approx), "window alignment must match the exact twin"
    for k, n in exact.items():
        assert abs(approx[k] - n) / n <= 0.05, f"window {k}: {approx[k]} vs exact {n}"


def test_streamed_sketches_equal_batch(spark):
    """c13's availableNow replay must reproduce b36b exactly: HLL register
    state is max-merged (commutative/associative), so micro-batch
    boundaries cannot change the merged estimate."""
    batch = {
        r[0]: r[1] for r in REGISTRY["b36b_rolling_dau_hll"].fn(spark, SF_DIR).collect()
    }
    streamed = {
        r[0]: r[1]
        for r in REGISTRY["c13_rolling_dau_sketch_replay"].fn(spark, SF_DIR).collect()
    }
    assert streamed == batch
