"""The tokenizer build/serve split (r9): `write_bpe_vocab` materializes
the trained BPE merge table at ingest; `bpe_encode_with_vocab` encodes
the corpus from that artifact with ZERO training collects and must be
BIT-IDENTICAL to the inline d5x query (which trains via the memo). Also
asserts the artifact layout and that d5w/d5x agree on the merge list —
the training/encode consistency a production tokenizer ships on."""

from __future__ import annotations

import pytest

from dcosb_cassandra_spark.operators.llm_text import (
    _BPE_ROUNDS,
    bpe_encode_with_vocab,
)
from dcosb_cassandra_spark.registry import REGISTRY, load_all
from dcosb_cassandra_spark.sources.maintenance import build_bpe_vocab

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def vocab_dir(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("bpe_vocab"))
    return build_bpe_vocab(spark, SF_DIR, out)


def test_encode_with_vocab_matches_inline_d5x(spark, vocab_dir):
    load_all()
    inline = sorted(
        tuple(r) for r in REGISTRY["d5x_bpe_encode_corpus"].fn(spark, SF_DIR).collect()
    )
    served = sorted(
        tuple(r) for r in bpe_encode_with_vocab(spark, SF_DIR, vocab_dir).collect()
    )
    assert served == inline
    assert len(served) > 0


def test_vocab_artifact_is_the_d5w_table(spark, vocab_dir):
    load_all()
    vocab = sorted(tuple(r) for r in spark.read.parquet(vocab_dir).collect())
    trained = sorted(
        tuple(r) for r in REGISTRY["d5w_bpe_merge_rounds"].fn(spark, SF_DIR).collect()
    )
    assert vocab == trained
    assert len(vocab) == _BPE_ROUNDS


def test_encode_compression_is_real(spark, vocab_dir):
    """Merges must actually shorten the corpus: every language's token
    count is below its char count, and compression_ppm reflects the
    floor-divided ratio."""
    rows = bpe_encode_with_vocab(spark, SF_DIR, vocab_dir).collect()
    for r in rows:
        assert 0 < r["n_tokens"] < r["n_chars"]
        assert r["compression_ppm"] == 1_000_000 * r["n_tokens"] // r["n_chars"]
        assert r["compression_ppm"] < 1_000_000


def _greedy_merge(seq: list[str], left: str, right: str) -> list[str]:
    """Reference sequential greedy scan: walk left-to-right, merging each
    (left, right) adjacency as soon as it is seen."""
    out: list[str] = []
    i = 0
    while i < len(seq):
        if i + 1 < len(seq) and seq[i] == left and seq[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(seq[i])
            i += 1
    return out


def test_simultaneous_rewrite_equals_greedy_scan(spark):
    """The load-bearing d5w/d5x claim: because merges join DISTINCT
    symbols and never cross the space boundary, occurrences are provably
    non-overlapping and the engine's simultaneous array rewrite equals
    the sequential greedy scan. Property-checked over random lowercase
    strings and adversarial repeats for every (distinct-pair) merge."""
    import random

    from pyspark.sql import functions as F

    from dcosb_cassandra_spark.operators.llm_text import _bpe_merge_expr

    rng = random.Random(11)
    cases = ["ababab", "aabab", "abab ab", "babab", "ab", "ba", "b", ""]
    cases += [
        "".join(rng.choice("ab c") for _ in range(rng.randrange(1, 30)))
        for _ in range(40)
    ]
    rows = [(i, list(t)) for i, t in enumerate(cases)]
    df = spark.createDataFrame(rows, "id int, seq array<string>")
    got = {
        r["id"]: r["out"]
        for r in df.withColumn("out", F.expr(_bpe_merge_expr("a", "b")))
        .select("id", "out")
        .collect()
    }
    for i, t in enumerate(cases):
        assert got[i] == _greedy_merge(list(t), "a", "b"), repr(t)


def test_encode_merge_chain_matches_python_reference(spark):
    """Chained merges: apply the corpus-trained merge list with the JVM
    rewrite chain and with the Python greedy reference, per document —
    bit parity on a sample (the d5x correctness core, independent of the
    SQL oracle)."""
    from pyspark.sql import functions as F

    from dcosb_cassandra_spark.catalog import table
    from dcosb_cassandra_spark.operators.llm_text import (
        _bpe_apply_merges,
        _bpe_char_seq,
        _train_bpe,
    )

    merges = [(l, r) for (_, l, r, _, _) in _train_bpe(spark, SF_DIR)]
    assert merges, "training produced no merges?"
    docs = _bpe_char_seq(table(spark, SF_DIR, "documents")).filter(
        F.col("doc_id") < 40
    )
    base = {r["doc_id"]: r["seq"] for r in docs.collect()}
    enc = {
        r["doc_id"]: r["seq"]
        for r in _bpe_apply_merges(docs, merges).collect()
    }
    for doc_id, seq in base.items():
        ref = seq
        for left, right in merges:
            ref = _greedy_merge(ref, left, right)
        assert enc[doc_id] == ref, doc_id
