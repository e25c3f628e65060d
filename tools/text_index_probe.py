#!/usr/bin/env python3
"""Text-index build/serve scale probe (r14, pairs with the d18/c18
family): at 1×/10×/100× of the sf0.1 document corpus, measure

  - inline    — d18's full pipeline (corpus explode at query time),
  - build     — write_text_index one-shot materialization,
  - serve     — serve_bm25_topk from the materialized postings,

to show the build/serve split doing its job: serve avoids the explode
and text bytes entirely (pre-grouped postings + query-term semi-join),
so repeated queries pay the pruned posting scan instead of the corpus
pipeline, while inline pays the full explode every time. Uses the
perturbed documents replicas (.tmp/sf1p, .tmp/sf10p — token-suffixed per
copy, so vocabulary and posting-list shapes scale realistically rather
than multiplying duplicate terms).

Usage: python tools/text_index_probe.py [REPLICA_DIR ...]
Defaults: /root/testdata/sf0.1 .tmp/sf1p .tmp/sf10p
Prints one JSON line per corpus. Run on a QUIET host (no co-tenant
Spark jobs) per the bench protocol.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    dirs = sys.argv[1:] or ["/root/testdata/sf0.1", ".tmp/sf1p", ".tmp/sf10p"]

    from dcosb_cassandra_spark.registry import REGISTRY, load_all
    from dcosb_cassandra_spark.operators.llm_retrieval import (
        serve_bm25_topk,
        write_text_index,
    )
    from dcosb_cassandra_spark.session import get_spark

    spark = get_spark()
    load_all()
    for sf_dir in dirs:
        n_docs = (
            spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
            .count()
        )

        t0 = time.monotonic()
        inline_rows = REGISTRY["d18_bm25_topk"].fn(spark, sf_dir).collect()
        t_inline = time.monotonic() - t0

        idx = f".tmp/text_index_probe_{os.path.basename(sf_dir.rstrip('/'))}"
        shutil.rmtree(idx, ignore_errors=True)
        t0 = time.monotonic()
        write_text_index(spark, sf_dir, idx)
        t_build = time.monotonic() - t0

        qdocs = (
            spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
            .filter("doc_id < 5")
            .selectExpr("doc_id AS qid", "text")
        )
        t0 = time.monotonic()
        served_rows = serve_bm25_topk(spark, idx, queries_df=qdocs).collect()
        t_serve = time.monotonic() - t0
        # second serve: steady-state repeated-query cost (JVM warm,
        # postings cached by the OS page cache like a hot segment)
        t0 = time.monotonic()
        serve_bm25_topk(spark, idx, queries_df=qdocs).collect()
        t_serve2 = time.monotonic() - t0

        assert sorted(map(tuple, served_rows)) == sorted(
            map(tuple, inline_rows)
        ), f"serve != inline at {sf_dir}"
        print(
            json.dumps(
                {
                    "sf_dir": sf_dir,
                    "n_docs": n_docs,
                    "inline_sec": round(t_inline, 2),
                    "build_sec": round(t_build, 2),
                    "serve_sec": round(t_serve, 2),
                    "serve2_sec": round(t_serve2, 2),
                    "rows": len(served_rows),
                }
            ),
            flush=True,
        )
        shutil.rmtree(idx, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
