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
