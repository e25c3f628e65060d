#!/usr/bin/env python3
"""Regenerate COVERAGE.md (SURVEY.md §2 row → queries() entry map) from the
query registry. Run from the repo root: ``python tools/gen_coverage.py``."""

from __future__ import annotations

import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dcosb_cassandra_spark.registry import REGISTRY, load_all  # noqa: E402

ROWS = [
    ("A1", "Full-table scan"), ("A2", "Point read by pk"), ("A3", "Clustering slice"),
    ("A4", "IN on keys"), ("A5", "token() range scan"), ("A6", "LIMIT/paging"),
    ("A7", "PER PARTITION LIMIT"), ("A8", "SELECT DISTINCT pk"), ("A9", "Projection+alias"),
    ("A10", "CAST"), ("A11", "Filter predicates/CONTAINS [KEY]"), ("A12", "LIKE"),
    ("A13", "ALLOW FILTERING"), ("A14", "Secondary-index lookup"), ("A15", "Aggregates"),
    ("A16", "GROUP BY key prefix"), ("A17", "ORDER BY clustering"), ("A18", "Upsert/LWW"),
    ("A19", "DELETE tombstones (row+range)"), ("A20", "TTL"), ("A21", "WRITETIME"),
    ("A22", "Counters"), ("A23", "Collection ops"), ("A24", "BATCH"), ("A25", "LWT"),
    ("A26", "Materialized view"), ("A27", "SELECT JSON/toJson"),
    ("A28", "INSERT JSON/fromJson/Variant"), ("A29", "Time functions + timeuuid"),
    ("A30", "uuid()"), ("A31", "Blob conversions"), ("A32", "Arithmetic"), ("A33", "UDF"),
    ("A34", "UDA"),
    ("A35", "Consistency/replication — live coordination N/A by design; analytic repair-digest half covered (SURVEY A35)"),
    ("A-static", "Static columns"),
    ("B1", "Broadcast join"), ("B2", "Shuffle join"), ("B3", "Outer joins"),
    ("B4", "Semi/anti join"), ("B5", "Theta/range join"), ("B6", "As-of join"),
    ("B7", "Cross join"), ("B8", "Self-join"), ("B9", "Hash aggregate / stats"),
    ("B10", "count(DISTINCT)"), ("B11", "approx_count_distinct / approx percentiles"),
    ("B12", "ROLLUP/CUBE/GROUPING SETS"), ("B13", "Ranking windows"),
    ("B14", "Analytic windows"), ("B15", "Frame windows"),
    ("B16", "Multi-col sort / null ordering"), ("B17", "Top-k"), ("B18", "Top-k per group"),
    ("B19", "UNION"), ("B20", "INTERSECT/EXCEPT (+ALL)"), ("B21", "Subqueries"),
    ("B22", "explode/posexplode"), ("B23", "Pivot"), ("B24", "Sampling"),
    ("B25", "String fns"), ("B26", "Date fns"), ("B27", "Math fns"),
    ("B28", "Conditional fns"), ("B29", "Array fns"), ("B30", "Map fns"), ("B31", "JSON fns"),
    ("C1", "Tumbling window"), ("C2", "Sliding window"), ("C3", "Session window"),
    ("C4", "Watermark/late data"), ("C5", "Streaming dedup"), ("C6", "Stateful per-key"),
    ("C7", "Stream-static join"), ("C8", "Output modes/sinks"),
    ("C9", "foreachBatch MV maintenance"),
    ("D1", "Exact dedup"), ("D2", "Near-dup (MinHash-LSH/SimHash/Jaccard/embedding)"),
    ("D3", "Similarity top-k"), ("D4", "All-pairs/batch kNN + LSH/IVF"),
    ("D5", "Text analysis (quality/langid/tokens/tf-idf/fingerprint)"),
    ("D6", "Sentiment scoring"), ("D7", "Multimodal columns"), ("D8", "Embedding arithmetic"),
    ("D9", "PII redaction (added r2)"),
    ("D10", "Benchmark decontamination (added r2)"),
    ("D11", "IVF probe kNN full path (added r2)"),
    ("D12", "Streaming training ingest (added r2)"),
    ("D13", "Sequence packing (added r2)"),
    ("D14", "Domain mixing / upsampling (added r2)"),
    ("D15", "Length-bucketed batching (added r2)"),
    ("D16", "Exact-substring dedup (added r2)"),
    ("D17", "k-means Lloyd / codebook training (added r2)"),
    ("D18", "Incremental dedup vs digest index (added r4)"),
    ("D19", "Perplexity-proxy quality filter (added r4)"),
    ("D20", "BPE merge step / vocab induction (added r4)"),
    ("D21", "Sub-sharded sequence packing (added r4)"),
    ("D22", "Stratified train/val/test split (added r4)"),
    ("B32", "Z-order data-layout evaluation (added r5)"),
    ("B33", "Cohort-retention matrix (added r5)"),
    ("B34", "Rolling z-score anomaly detection (added r5)"),
    ("B35", "First/last-touch attribution (added r5)"),
    ("B36", "Rolling 7-day distinct actives — exact + HLL sketch (added r5)"),
    ("B37", "Ordered funnel with step deadlines (added r5)"),
    ("B38", "User-journey transition matrix (added r5)"),
    ("B39", "Join-skew assessment (added r5)"),
    ("B40", "Cohort retention decay fit (added r5)"),
    ("B41", "Funnel latency percentiles (added r5)"),
    ("B42", "Rolling series correlation (added r5)"),
    ("B43", "Session bounce rate (added r5)"),
    ("C10", "Stream-stream interval join (added r5)"),
    ("C12", "CDC change feed (added r5)"),
    ("C13", "Streaming sketch distinct / live DAU (added r5)"),
    ("D23", "Temperature-scaled domain resampling (added r5)"),
    ("D24", "Corpus unigram-distribution profile (added r5)"),
    ("D25", "ANN recall evaluation (added r5)"),
    ("D26", "Quality-weighted importance sampling (added r5)"),
    ("D27", "Context-window chunking with overlap (added r5)"),
    ("D28", "Deterministic text normalization (added r5)"),
    ("D29", "OOV/UNK-rate estimation (added r5)"),
    ("D30", "Domain-affinity matrix (added r5)"),
    ("D31", "LSH dedup-config evaluation (added r5)"),
    ("D32", "Boundary-respecting next-fit packing (added r5)"),
    ("D33", "Near-dup graph degree profile (added r5)"),
    ("D34", "Zipf-slope estimate (added r5)"),
    ("D35", "Audio frame-energy extraction (added r5)"),
    ("D36", "Matryoshka truncation eval (added r5)"),
    ("D37", "Dup-graph triangle count (added r5)"),
    ("D38", "Product-quantization encoding (added r5)"),
    ("D39", "PQ asymmetric-distance fidelity (added r5)"),
    ("D40", "Token-budget domain mixing (added r5)"),
    ("D41", "Dataset card (added r5)"),
    ("D42", "Semantic benchmark decontamination (added r5)"),
    ("D43", "Split leakage audit (added r5)"),
    ("D44", "Cluster quality-keeper selection (added r5)"),
    ("D45", "Cross-source duplication matrix (added r5)"),
    ("D46", "Lexical divergence matrix (added r5)"),
    ("D47", "Dedup threshold-sensitivity curve (added r5)"),
    ("D48", "Split leakage repair (added r5)"),
    ("D49", "Embedding drift monitor (added r5)"),
    ("D50", "Quality drift monitor (added r5)"),
    ("D2b", "Incremental near-dup dedup — daily-ingest posture (added r8)"),
    ("D2c", "Chunk-level boilerplate detection (added r9)"),
    ("D20b", "BPE tokenizer training loop (added r8)"),
    ("D20c", "Tokenizer encode pass — vocab build/serve split (added r9)"),
    ("D38b", "IVF-PQ serving capstone (added r8)"),
    ("D5z", "LEARNED quality classifier — fixed-point GD (added r10)"),
    ("D7r", "Interleaved multimodal record assembly — MMC4 shape (added r10)"),
    ("C14", "Streaming index maintenance — foreachBatch band-index upkeep (added r10)"),
    ("D51", "Deterministic global shuffle + shard manifest (added r10)"),
    ("D52", "Multi-epoch data-constrained mixing plan (added r10)"),
    ("D53", "Format-blind exact image dedup — decoded-content hash (added r10)"),
    ("C15", "Streaming shard-manifest maintenance — commutative merge (added r10)"),
    ("C16", "Streaming model serving — quality gate at ingest (added r10)"),
    ("D54", "Graph-based ANN — HNSW/JVector-family beam search (added r11)"),
    ("V1", "similarity_{cosine,euclidean,dot_product} (C* 5.0)"),
    ("V2", "ORDER BY ... ANN OF (C* 5.0 vector search)"),
    ("V3", "Dynamic data masking (C* 5.0)"),
]

STREAMING_EXTRA = {
    "C1": "streaming/streams.py:c1_tumbling_stream (test_streaming)",
    "C2": "streaming/streams.py:c2_sliding_stream",
    "C3": "streaming/streams.py:c3_session_stream (test_streaming)",
    "C4": "tests/test_streaming.py:test_c4_watermark_bounds_state",
    "C5": "streaming/streams.py:c5_dedup_stream (test_streaming)",
    "C6": "streaming/streams.py:c6_stateful_running_counts (test_streaming)",
    "C7": "streaming/streams.py:c7_stream_static_join (test_streaming)",
    "C8": "streaming/streams.py:c8_write_stream + sources/io.py sinks",
    "C9": "streaming/streams.py:c9_foreach_batch_view_maintenance (test_streaming)",
    "D12": "streaming/streams.py:c11_training_ingest_stream (test_streaming batch-compared)",
    "C6": "streaming/streams.py:c6_stateful_running_counts + "
    "c6b_stateful_running_counts_tws (transformWithState; test_streaming)",
}


def main() -> None:
    load_all()
    by_tag = defaultdict(list)
    for name, spec in REGISTRY.items():
        for t in spec.tags:
            by_tag[t].append(name + ("" if spec.oracle else " (rows-only)"))

    lines = [
        "# COVERAGE — SURVEY.md §2 inventory → implementation map",
        "",
        "Generated from the query registry (regenerate: `python tools/gen_coverage.py`).",
        "Every non-annotated entry is oracle-checked against DuckDB at sf0.01;",
        "`(rows-only)` entries have no SQL-expressible oracle (driver records the",
        "weaker check). Streaming rows also list their Structured Streaming twin.",
        "",
        "| §2 row | Operator | queries() entries / evidence |",
        "|---|---|---|",
    ]
    missing = []
    for tag, desc in ROWS:
        entries = sorted(by_tag.get(tag, []))
        cell = ", ".join(f"`{e}`" for e in entries) if entries else ""
        extra = STREAMING_EXTRA.get(tag)
        if extra:
            cell = (cell + "; " if cell else "") + extra
        if tag == "A35" and not entries:
            cell = "out of scope — documented"
        if not cell:
            missing.append(tag)
        lines.append(f"| {tag} | {desc} | {cell} |")
    lines += [
        "",
        "Plus: `cql.py` mini-CQL front-end (tests/test_cql.py) covering the CQL",
        "statement surface end-to-end; `functions/lww.py` property tests;",
        "`sources/io.py` parquet/CSV/JSONL sinks with partition-pruned reads;",
        "`plans/audit.py` plan-shape gates (tests/test_plans.py).",
    ]
    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "COVERAGE.md"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print("rows with no coverage:", missing or "none")
    print("queries:", len(REGISTRY), "oracle-checked:", sum(1 for s in REGISTRY.values() if s.oracle))


if __name__ == "__main__":
    main()
