"""The SIXTH build/serve split (r14): BM25 text index — batch build,
streamed upkeep, serving parity. Mirrors tests/test_incremental_index.py's
strategy for the other durable artifacts: the streamed store must equal
the one-shot build row-for-row, the served ranking must equal the inline
d18 computation bit-for-bit, and replay must be a no-op."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from .conftest import SF_DIR


def _stage_doc_chunks(tmp_path_factory, n_chunks=4):
    import duckdb

    src = str(tmp_path_factory.mktemp("textidx_stream_src"))
    con = duckdb.connect()
    for i in range(n_chunks):
        con.execute(
            f"""COPY (
                  SELECT doc_id, text, lang, source, n_chars
                  FROM (SELECT *, ntile({n_chunks}) OVER (ORDER BY doc_id) AS nt
                        FROM read_parquet('{SF_DIR}/documents.parquet'))
                  WHERE nt = {i + 1} ORDER BY doc_id
                ) TO '{src}/chunk_{i}.parquet' (FORMAT PARQUET)"""
        )
    con.close()
    return src


def _rows(spark, path, drop=("ingest",)):
    df = spark.read.parquet(path).drop(*drop)
    return sorted(tuple(r) for r in df.collect())


def test_streamed_text_index_matches_batch_build(spark, tmp_path_factory):
    """stream_text_index: the corpus replayed as 4 micro-batches must
    produce exactly the one-shot build's posting row set, and the summed
    per-ingest stats must equal the one-shot corpus stats — per-doc
    derivation commutes, per-batch stats are partial sums."""
    from dcosb_cassandra_spark.operators.llm_retrieval import write_text_index
    from dcosb_cassandra_spark.operators.streaming_batch import (
        _DOCS_SCHEMA_FULL,
    )
    from dcosb_cassandra_spark.sources.maintenance import stream_text_index

    batch_dir = str(tmp_path_factory.mktemp("textidx_batch"))
    write_text_index(spark, SF_DIR, batch_dir)
    stream_dir = str(tmp_path_factory.mktemp("textidx_stream"))
    stream_text_index(
        spark,
        _stage_doc_chunks(tmp_path_factory),
        stream_dir,
        _DOCS_SCHEMA_FULL,
    )

    bp = _rows(spark, os.path.join(batch_dir, "postings"))
    sp = _rows(spark, os.path.join(stream_dir, "postings"))
    assert sp == bp and len(sp) > 0

    def stats(d):
        r = (
            spark.read.parquet(os.path.join(d, "stats"))
            .agg(F.sum("n_docs"), F.sum("sum_dl"))
            .head()
        )
        return (r[0], r[1])

    assert stats(stream_dir) == stats(batch_dir)


def test_serve_bm25_matches_inline_d18(spark, tmp_path_factory):
    """serve_bm25_topk over the materialized index must return the inline
    d18 ranking bit-for-bit (same postings, same df aggregation, same
    exact-bigint-sum avgdl arithmetic — parity by construction, asserted
    here)."""
    from dcosb_cassandra_spark.operators.llm_retrieval import (
        serve_bm25_topk,
        write_text_index,
    )
    from dcosb_cassandra_spark.registry import REGISTRY, load_all

    load_all()
    idx = str(tmp_path_factory.mktemp("textidx_serve"))
    write_text_index(spark, SF_DIR, idx)
    inline = sorted(
        tuple(r) for r in REGISTRY["d18_bm25_topk"].fn(spark, SF_DIR).collect()
    )
    served = sorted(tuple(r) for r in serve_bm25_topk(spark, idx).collect())
    assert served == inline and len(served) == 50


def test_streamed_text_index_replay_is_noop(spark, tmp_path_factory):
    """Crash-replay: re-running the stream while the source holds exactly
    the processed files re-executes every batch against its own
    ingest=<id> subdir — same bytes, same row set, no duplicates (the
    zero-high-water-mark idempotence the docstring claims)."""
    from dcosb_cassandra_spark.operators.streaming_batch import (
        _DOCS_SCHEMA_FULL,
    )
    from dcosb_cassandra_spark.sources.maintenance import stream_text_index

    src = _stage_doc_chunks(tmp_path_factory, n_chunks=2)
    gdir = str(tmp_path_factory.mktemp("textidx_replay"))
    stream_text_index(spark, src, gdir, _DOCS_SCHEMA_FULL)
    first = _rows(spark, os.path.join(gdir, "postings"))
    stream_text_index(spark, src, gdir, _DOCS_SCHEMA_FULL)
    again = _rows(spark, os.path.join(gdir, "postings"))
    assert again == first and len(first) > 0
