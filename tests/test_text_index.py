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


def test_serve_with_query_text_prunes_and_matches(spark, tmp_path_factory):
    """The production serve contract: query TEXT arrives with the query
    (queries_df), the posting scan partition-prunes to the query terms'
    tb= hash buckets, and the ranking is still bit-identical to inline
    d18. Pruning is asserted on the plan's input files, not assumed."""
    from dcosb_cassandra_spark.operators.llm_retrieval import (
        TEXT_INDEX_TERM_BUCKETS,
        serve_bm25_topk,
        write_text_index,
    )
    from dcosb_cassandra_spark.registry import REGISTRY, load_all

    load_all()
    idx = str(tmp_path_factory.mktemp("textidx_prune"))
    write_text_index(spark, SF_DIR, idx)
    qdocs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .filter("doc_id < 5")
        .selectExpr("doc_id AS qid", "text")
    )
    served = serve_bm25_topk(spark, idx, queries_df=qdocs)
    inline = sorted(
        tuple(r) for r in REGISTRY["d18_bm25_topk"].fn(spark, SF_DIR).collect()
    )
    assert sorted(tuple(r) for r in served.collect()) == inline

    # the query vocabulary cannot cover every hash bucket in this
    # fixture; a single query doc must prune the scan to fewer files.
    # Asserted on the REAL code path (_pruned_posting_scan) at the file
    # level: input_file_name() reflects what the pruned scan actually
    # reads (inputFiles() ignores partition filters, and the serve's
    # localCheckpoint severs lineage past the scan).
    from dcosb_cassandra_spark.operators.llm_retrieval import (
        _pruned_posting_scan,
    )

    one = qdocs.filter("qid = 0")
    qterms = one.selectExpr("qid", "explode(split(text, ' ')) AS term").distinct()
    buckets = {
        r["tb"]
        for r in qterms.selectExpr(
            f"pmod(hash(term), {TEXT_INDEX_TERM_BUCKETS}) AS tb"
        )
        .distinct()
        .collect()
    }
    assert len(buckets) < TEXT_INDEX_TERM_BUCKETS, "fixture too broad"
    import glob as _glob

    total = len(_glob.glob(f"{idx}/postings/ingest=*/tb=*/*.parquet"))
    p = spark.read.parquet(f"{idx}/postings").select(
        "doc_id", "term", "dl", "tf", "tb"
    )
    read_files = {
        r["f"]
        for r in _pruned_posting_scan(p, qterms)
        .select(F.input_file_name().alias("f"))
        .distinct()
        .collect()
    }
    assert 0 < len(read_files) < total
    assert all(any(f"/tb={b}/" in f for b in buckets) for f in read_files)


def test_forget_text_docs_equals_fresh_build(spark, tmp_path_factory):
    """GDPR erasure for the sixth artifact: after forget_text_docs the
    index must be CONTENT-EQUIVALENT to one built without the documents
    — postings row set, per-ingest stats, and the SERVED ranking all
    equal a fresh build on the filtered corpus (the deleted text stops
    influencing df/avgdl/N, not just the posting rows)."""
    from dcosb_cassandra_spark.operators.llm_retrieval import (
        _write_text_index_batch,
        serve_bm25_topk,
    )
    from dcosb_cassandra_spark.operators.streaming_batch import (
        _DOCS_SCHEMA_FULL,
    )
    from dcosb_cassandra_spark.sources.maintenance import (
        forget_text_docs,
        stream_text_index,
    )

    src = _stage_doc_chunks(tmp_path_factory, n_chunks=2)
    gdir = str(tmp_path_factory.mktemp("textidx_forget"))
    stream_text_index(spark, src, gdir, _DOCS_SCHEMA_FULL)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    # forget some non-query docs from BOTH halves of the id range
    victims = [
        r["doc_id"]
        for r in docs.filter("doc_id >= 5")
        .orderBy("doc_id")
        .limit(3)
        .collect()
    ] + [
        r["doc_id"]
        for r in docs.orderBy(F.desc("doc_id")).limit(2).collect()
    ]
    forget_text_docs(spark, gdir, victims)

    ref = str(tmp_path_factory.mktemp("textidx_forget_ref"))
    _write_text_index_batch(
        docs.filter(~F.col("doc_id").isin(victims)).select(
            "doc_id", "text", "lang", "source", "n_chars"
        ),
        ref,
        0,
    )
    fp = _rows(spark, os.path.join(gdir, "postings"))
    rp = _rows(spark, os.path.join(ref, "postings"))
    assert fp == rp and len(fp) > 0

    def stat_sums(d):
        r = (
            spark.read.parquet(os.path.join(d, "stats"))
            .agg(F.sum("n_docs"), F.sum("sum_dl"))
            .head()
        )
        return (r[0], r[1])

    assert stat_sums(gdir) == stat_sums(ref)
    got = sorted(tuple(r) for r in serve_bm25_topk(spark, gdir).collect())
    want = sorted(tuple(r) for r in serve_bm25_topk(spark, ref).collect())
    assert got == want and len(got) == 50
