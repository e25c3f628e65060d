"""Property check for the two-phase ranking rewrite (SCALE.md "two-phase
rank"): on randomized data — heavy ties, skewed partitions, n<k groups —
the bucketed form must be row-identical to the plain single-window form
for rank, dense_rank, percent_rank, and ntile."""

from __future__ import annotations

import random

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from dcosb_cassandra_spark.operators.windows import two_phase_ranking


def _plain(df, part, val, idc, k):
    w = Window.partitionBy(part).orderBy(F.desc(val))
    wt = Window.partitionBy(part).orderBy(F.desc(val), F.asc(idc))
    return df.select(
        idc,
        part,
        F.rank().over(w).cast("long").alias("rk"),
        F.dense_rank().over(w).cast("long").alias("drk"),
        F.percent_rank().over(w).alias("prk_raw"),
        F.ntile(k).over(wt).cast("long").alias("ntile"),
    )


def test_two_phase_ranking_matches_plain_window(spark):
    rng = random.Random(7)
    for trial in range(3):
        n = rng.choice([5, 37, 400])
        rows = [
            (
                i,
                rng.choice(["a", "b", "c"]),
                # coarse values force cross-bucket tie groups
                float(rng.randrange(0, 40) * 500),
            )
            for i in range(n)
        ]
        df = spark.createDataFrame(rows, "id long, grp string, v double")
        got = two_phase_ranking(
            df,
            part_col="grp",
            val_col="v",
            id_col="id",
            bucket=F.floor(F.col("v") / 4096.0),
            ntile_k=4,
        ).select("id", "grp", "rk", "drk", F.round("prk_raw", 9).alias("p"), "ntile")
        want = _plain(df, "grp", "v", "id", 4).select(
            "id", "grp", "rk", "drk", F.round("prk_raw", 9).alias("p"), "ntile"
        )
        g = sorted(map(tuple, got.collect()))
        w = sorted(map(tuple, want.collect()))
        assert g == w, f"trial {trial}: two-phase diverged from plain window"


def test_two_phase_ranking_single_row_partitions(spark):
    """n=1 partitions: percent_rank divides by n-1=0 — Spark defines the
    plain-window result as 0.0; the two-phase form must agree, not NaN."""
    df = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0)], "id long, grp string, v double"
    )
    got = {
        r["id"]: (r["rk"], r["drk"], r["prk_raw"], r["ntile"])
        for r in two_phase_ranking(
            df, "grp", "v", "id", F.floor(F.col("v") / 7.0), 4
        ).collect()
    }
    want = {
        r["id"]: (r["rk"], r["drk"], r["prk_raw"], r["ntile"])
        for r in _plain(df, "grp", "v", "id", 4).collect()
    }
    assert got == want
