#!/usr/bin/env python3
"""Per-batch streaming graph-upkeep cost probe (judge r11 task #4): on
the 10× embeddings replica, stream one bulk batch (the initial store)
followed by many SMALL fixed-size batches through `stream_knn_graph`,
then read the store's ``upkeep_stats.jsonl`` to show per-batch REWRITE
bytes tracking the batch's neighborhood while the store stays ~40×
larger — the node-partitioned selective rewrite at work (the r11 code
rewrote the WHOLE adjacency every micro-batch, O(graph) per batch).

Usage: python tools/graph_upkeep_probe.py [N_SMALL] [SMALL_SIZE]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb


def main() -> None:
    n_small = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    small = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    src_parquet = ".tmp/emb10p/embeddings.parquet/*.parquet"
    stage = ".tmp/graph_upkeep_stage"
    out = ".tmp/graph_upkeep_store"
    import shutil

    for d in (stage, out):
        shutil.rmtree(d, ignore_errors=True)
    os.makedirs(stage)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW e AS SELECT vec_id, embedding, label FROM "
        f"read_parquet('{src_parquet}') WHERE vec_id >= 5 ORDER BY vec_id"
    )
    total = con.execute("SELECT count(*) FROM e").fetchone()[0]
    bulk = total - n_small * small
    con.execute(
        f"""COPY (SELECT * FROM e ORDER BY vec_id LIMIT {bulk})
            TO '{stage}/chunk_000.parquet' (FORMAT PARQUET)"""
    )
    for i in range(n_small):
        con.execute(
            f"""COPY (SELECT * FROM e ORDER BY vec_id
                      LIMIT {small} OFFSET {bulk + i * small})
                TO '{stage}/chunk_{i + 1:03d}.parquet' (FORMAT PARQUET)"""
        )
    con.close()

    from dcosb_cassandra_spark.session import get_spark
    from dcosb_cassandra_spark.sources.maintenance import stream_knn_graph

    spark = get_spark(
        "graph-upkeep-probe", cpus=os.environ.get("SPARK_GRAFT_CPUS", "32")
    )
    stream_knn_graph(
        spark, stage, out, ".tmp/emb10p",
        "vec_id LONG, embedding ARRAY<FLOAT>, label INT",
        timeout_sec=600,
    )
    spark.stop()
    print(f"corpus={total} bulk_batch={bulk} small_batches={n_small}x{small}")
    with open(os.path.join(out, "upkeep_stats.jsonl")) as fh:
        for line in fh:
            r = json.loads(line)
            pct = 100.0 * r["rewritten_bytes"] / max(1, r["store_bytes"])
            print(
                f"batch={r['batch_id']:>3} touched={r['touched_buckets']:>4}"
                f"/{r['total_buckets']} rewritten={r['rewritten_bytes']:>9}B"
                f" store={r['store_bytes']:>10}B ({pct:.1f}%)"
            )


if __name__ == "__main__":
    main()
