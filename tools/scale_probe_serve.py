#!/usr/bin/env python3
"""100× serve-path scale probe (judge r8 task #7): measure the two
build/serve capstones — d2o incremental dedup (band-index probe) and
d8g IVF-PQ search (materialized-index probe) — at an N× replica of
sf0.1, with their index BUILD times reported separately, confirming the
linear-per-byte regime past the 30× knee (SCALE.md "Measured scaling").

Methodology matches bench.py: warm-up run untimed, then median-of-3
warm runs per op (build+exec together — the serve path's full cost);
a 2-wide concurrent wall overlaps the two serve probes the way a
serving tier would. Build times are one-shot (they run at ingest).

Usage: python tools/scale_probe_serve.py [SCALED_SF_DIR] [BASE_SF_DIR]
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


RUNS = int(os.environ.get("SCALE_PROBE_RUNS", "3"))
ONLY = os.environ.get("SCALE_PROBE_ONLY", "")  # "scaled" skips the 1x side


def timed(fn, runs: int = RUNS) -> float:
    fn()  # warm-up
    ts = []
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return round(statistics.median(ts), 3)


def main() -> None:
    scaled = sys.argv[1] if len(sys.argv) > 1 else ".tmp/sf10"
    base = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    spark = get_spark("scale-probe-serve", cpus=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    load_all()

    from dcosb_cassandra_spark.operators.llm_dedup import incremental_dedup_probe
    from dcosb_cassandra_spark.operators.llm_similarity import ivf_index_dir
    from dcosb_cassandra_spark.sources.maintenance import build_band_index

    targets = [(base, "1x"), (scaled, os.path.basename(scaled))]
    if ONLY == "scaled":
        targets = targets[1:]
    for sf_dir, tag in targets:
        print(f"== {tag}: {sf_dir}", flush=True)
        # -- index builds (ingest-time, one-shot; testdata is read-only,
        # so indexes land under .tmp) --
        t0 = time.perf_counter()
        band_dir = build_band_index(spark, sf_dir, f".tmp/band_index_{tag}")
        t_band = time.perf_counter() - t0
        t0 = time.perf_counter()
        ivf_dir = ivf_index_dir(spark, sf_dir)
        t_ivf = time.perf_counter() - t0
        print(f"build: band_index {t_band:.2f}s  ivf_index {t_ivf:.2f}s", flush=True)

        # -- serve probes (median-of-3 warm) --
        d2o = timed(lambda: incremental_dedup_probe(spark, sf_dir, band_dir).toPandas())
        d8g = timed(lambda: REGISTRY["d8g_ivfpq_search"].fn(spark, sf_dir).toPandas())
        print(f"serve: d2o_probe {d2o}s  d8g_ivfpq {d8g}s", flush=True)

        # -- 2-wide concurrent serve wall --
        def conc() -> None:
            with ThreadPoolExecutor(max_workers=2) as pool:
                list(
                    pool.map(
                        lambda f: f(),
                        [
                            lambda: incremental_dedup_probe(
                                spark, sf_dir, band_dir
                            ).toPandas(),
                            lambda: REGISTRY["d8g_ivfpq_search"]
                            .fn(spark, sf_dir)
                            .toPandas(),
                        ],
                    )
                )

        print(f"concurrent serve wall: {timed(conc)}s", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
