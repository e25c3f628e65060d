#!/usr/bin/env python3
"""BPE rounds-vs-time probe (judge r9 task #5): runs the d5w training
loop at a realistic merge count (default 128) with and without
chained-rewrite lineage truncation and prints the per-round wall times,
so SCALE.md can document the measured Catalyst knee instead of asserting
one. Mirrors ``_train_bpe``'s loop exactly (same helpers, same per-round
action); the production loop applies the same truncation via
``_BPE_CHAIN_BATCH``.

    python tools/bpe_scale_probe.py [rounds] [sf_dir]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pyspark.sql import functions as F  # noqa: E402

from dcosb_cassandra_spark.catalog import table  # noqa: E402
from dcosb_cassandra_spark.operators.llm_text import (  # noqa: E402
    _bpe_char_seq,
    _bpe_merge_expr,
)
from dcosb_cassandra_spark.session import get_spark  # noqa: E402

PAIRS_EXPR = (
    "filter(transform(slice(seq, 1, greatest(size(seq) - 1, 0)), "
    "(x, i) -> struct(x AS l, element_at(seq, i + 2) AS r2)), "
    "p -> p.l <> p.r2 AND p.l <> ' ' AND p.r2 <> ' ')"
)


def run(spark, sf_dir: str, rounds: int, chain_batch: int) -> list[float]:
    df = _bpe_char_seq(table(spark, sf_dir, "documents"))
    times = []
    for r in range(1, rounds + 1):
        t0 = time.perf_counter()
        top = (
            df.select(F.explode(F.expr(PAIRS_EXPR)).alias("p"))
            .groupBy(F.col("p.l").alias("l"), F.col("p.r2").alias("r2"))
            .count()
            .orderBy(F.desc("count"), F.asc("l"), F.asc("r2"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        df = df.withColumn("seq", F.expr(_bpe_merge_expr(top[0]["l"], top[0]["r2"])))
        if chain_batch and r % chain_batch == 0:
            df = df.localCheckpoint(eager=True)
        times.append(time.perf_counter() - t0)
    return times


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    spark = get_spark("bpe-scale-probe", cpus="8")
    for label, batch in (("truncated(batch=16)", 16), ("untruncated", 0)):
        times = run(spark, sf_dir, rounds, batch)
        buckets = {}
        for i, t in enumerate(times):
            buckets.setdefault(i // 16, []).append(t)
        print(f"\n{label}: total {sum(times):.1f}s over {len(times)} rounds")
        for b in sorted(buckets):
            ts = buckets[b]
            print(
                f"  rounds {b * 16 + 1:3d}-{b * 16 + len(ts):3d}: "
                f"mean {sum(ts) / len(ts):.3f}s  max {max(ts):.3f}s"
            )
    spark.stop()


if __name__ == "__main__":
    main()
