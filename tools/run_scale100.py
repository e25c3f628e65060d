#!/usr/bin/env python3
"""Drive the r9 100× serve-path measurements (SCALE.md "100× probe"):

- d8g IVF-PQ serve on the PLAIN N× replica (identical vectors are fine —
  the probe prunes buckets and scores candidates; memory contract holds);
- d2o incremental-dedup probe on the PERTURBED N× replica (constant dup
  rate — the corpus-linear regime a real crawl replays);
- the 2-wide concurrent serve wall over both.

Usage: python tools/run_scale100.py <plain_dir> <perturbed_dir> [runs]
"""

from __future__ import annotations

import os
import statistics
import sys
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dcosb_cassandra_spark.registry import REGISTRY, load_all
from dcosb_cassandra_spark.session import get_spark


def timed(fn, runs: int) -> float:
    fn()  # warm-up
    ts = []
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return round(statistics.median(ts), 3)


def main() -> None:
    plain = sys.argv[1]
    perturbed = sys.argv[2]
    runs = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    spark = get_spark("scale100", cpus=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    load_all()

    from dcosb_cassandra_spark.operators.llm_dedup import incremental_dedup_probe
    from dcosb_cassandra_spark.sources.maintenance import build_band_index

    tag = os.path.basename(os.path.normpath(plain))
    t0 = time.perf_counter()
    band_dir = build_band_index(spark, perturbed, f".tmp/band_index_p_{tag}")
    print(f"band index build ({perturbed}): {time.perf_counter()-t0:.1f}s", flush=True)

    d8g = lambda: REGISTRY["d8g_ivfpq_search"].fn(spark, plain).toPandas()  # noqa: E731
    d2o = lambda: incremental_dedup_probe(spark, perturbed, band_dir).toPandas()  # noqa: E731

    print(f"d8g_ivfpq serve ({plain}): {timed(d8g, runs)}s", flush=True)
    print(f"d2o probe serve ({perturbed}): {timed(d2o, runs)}s", flush=True)

    def conc() -> None:
        with ThreadPoolExecutor(max_workers=2) as pool:
            list(pool.map(lambda f: f(), [d8g, d2o]))

    print(f"concurrent serve wall: {timed(conc, runs)}s", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
