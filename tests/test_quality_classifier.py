"""d5z learned quality classifier: GD convergence property + bit-parity of
the distributed training loop against an independent pure-Python reference
(hashlib md5, exact ints — no Spark, no DuckDB)."""

from __future__ import annotations

import hashlib

import duckdb

from dcosb_cassandra_spark.operators.llm_quality import (
    _QC_B,
    _QC_LR_DIV,
    _QC_NF,
    _QC_ROUNDS,
    _QC_THRESH,
    _QC_TRAIN_MAX_ID,
    _tdiv,
    _train_quality_classifier,
)

from .conftest import SF_DIR

_S = 1_000_000


def _py_features(text: str) -> list[int]:
    ngs = [text[i : i + 3] for i in range(len(text) - 2)]
    cnt = [0] * _QC_B
    for g in ngs:
        cnt[int(hashlib.md5(g.encode()).hexdigest()[:2], 16) % _QC_B] += 1
    nng = len(ngs)
    x = [_S * c // nng for c in cnt]
    toks = text.split(" ")
    x.append(_S * len(set(ngs)) // nng)
    x.append(_S * len(text) // len(toks) // 10)
    x.append(_S)
    return x


def _py_train(sf_dir: str) -> tuple[list[int], list[int]]:
    rows = duckdb.sql(
        f"SELECT doc_id, text FROM read_parquet('{sf_dir}/documents.parquet')"
        f" WHERE doc_id < {_QC_TRAIN_MAX_ID} AND length(text) >= 3"
    ).fetchall()
    train = []
    for _, text in rows:
        toks = text.split(" ")
        y = 1 if _S * len(set(toks)) // len(toks) >= _QC_THRESH else 0
        train.append((_py_features(text), y))
    n = len(train)
    w = [0] * _QC_NF
    losses = []
    for _ in range(_QC_ROUNDS):
        gs = [0] * _QC_NF
        loss = 0
        for x, y in train:
            z = _tdiv(sum(wi * xi for wi, xi in zip(w, x)), _S)
            err = 500_000 + _tdiv(z * 500_000, _S + abs(z)) - _S * y
            loss += err * err
            for j in range(_QC_NF):
                gs[j] += err * x[j]
        losses.append(loss)
        w = [wi - _tdiv(g, n * _QC_LR_DIV) for wi, g in zip(w, gs)]
    return w, losses


def test_training_loss_monotone_non_increasing(spark):
    """The convex-surrogate GD at the pinned rate must not diverge: the
    measured per-round loss (collected alongside the gradients) is
    monotone non-increasing across all _QC_ROUNDS rounds."""
    _, losses = _train_quality_classifier(spark, SF_DIR)
    assert len(losses) == _QC_ROUNDS
    for a, b in zip(losses, losses[1:]):
        assert b <= a, f"loss increased: {losses}"


def test_training_bit_parity_vs_python_reference(spark):
    """The distributed training loop (JVM feature expressions + aggregate
    gradient collects) must produce WEIGHTS AND LOSSES bit-identical to an
    independent pure-Python reference — any drift in hashing, fixed-point
    rounding, or division semantics flips an exact integer."""
    sw, sl = _train_quality_classifier(spark, SF_DIR)
    pw, pl = _py_train(SF_DIR)
    assert sw == pw
    assert list(sl) == pl


def test_learned_weights_beat_zero_init_loss(spark):
    """Training must actually LEARN: the final-round loss sits strictly
    below the round-0 (all-zero weights) loss."""
    _, losses = _train_quality_classifier(spark, SF_DIR)
    assert losses[-1] < losses[0]


def test_model_build_serve_bit_parity(spark, tmp_path):
    """The materialized-model serve path (maintenance.build_quality_model
    -> score_with_model) must score every document BIT-identically to the
    inline train-and-score path — the build/serve contract the other
    three artifacts (band index, BPE vocab, IVF index) already honor."""
    from dcosb_cassandra_spark.operators.llm_quality import (
        _qc_scored_df,
        score_with_model,
    )
    from dcosb_cassandra_spark.sources.maintenance import build_quality_model

    sf_dir = "/root/testdata/sf0.001"
    model_dir = str(tmp_path / "qc_model")
    build_quality_model(spark, sf_dir, model_dir)
    inline = {r["doc_id"]: (r["source"], r["y"], r["p"], r["hb"])
              for r in _qc_scored_df(spark, sf_dir).collect()}
    served = {r["doc_id"]: (r["source"], r["y"], r["p"], r["hb"])
              for r in score_with_model(spark, sf_dir, model_dir).collect()}
    assert served == inline and len(served) > 0


def test_model_refresh_retrains_on_extended_subset(spark):
    """c16b's refresh contract: the doubled labeled subset yields a
    genuinely DIFFERENT model (otherwise the epoch switch grades
    nothing), and both trainings are independently memoized."""
    from dcosb_cassandra_spark.operators.llm_quality import (
        _QC_TRAIN_MAX_ID,
        _train_quality_classifier,
    )

    w_a, _ = _train_quality_classifier(spark, SF_DIR)
    w_b, _ = _train_quality_classifier(
        spark, SF_DIR, train_max=2 * _QC_TRAIN_MAX_ID
    )
    assert w_a != w_b
    # memo keys include train_max: re-asking returns the same objects
    assert _train_quality_classifier(spark, SF_DIR)[0] == w_a
    assert (
        _train_quality_classifier(spark, SF_DIR, train_max=2 * _QC_TRAIN_MAX_ID)[0]
        == w_b
    )


def test_c16b_epoch_scores_match_per_model_batch_scoring(spark):
    """The streamed refresh replay must score each epoch BIT-identically
    to batch scoring under that epoch's model: epoch-1 rollup == model-A
    batch rollup over the first half (by doc_id quartiles 1-2), epoch-2
    == model-B over the second half."""
    import pyspark.sql.functions as F

    from dcosb_cassandra_spark.operators.llm_quality import (
        _QC_TRAIN_MAX_ID,
        _qc_scored_df,
        _train_quality_classifier,
    )
    from dcosb_cassandra_spark.registry import load_all

    sf_dir = "/root/testdata/sf0.001"
    reg = load_all()
    streamed = {
        (r["epoch"], r["source"]): (
            r["n_docs"], r["n_pos"], r["n_kept"], r["n_correct"],
            r["mean_score_ppm"],
        )
        for r in reg["c16b_model_refresh_replay"].fn(spark, sf_dir).collect()
    }
    assert streamed

    import duckdb

    mid = duckdb.sql(
        f"""SELECT max(doc_id) FROM (
              SELECT doc_id, ntile(4) OVER (ORDER BY doc_id) AS nt
              FROM read_parquet('{sf_dir}/documents.parquet')) WHERE nt <= 2"""
    ).fetchone()[0]
    w_b, _ = _train_quality_classifier(spark, sf_dir, train_max=2 * _QC_TRAIN_MAX_ID)
    for epoch, w, keep in (
        (1, None, F.col("doc_id") <= mid),
        (2, w_b, F.col("doc_id") > mid),
    ):
        batch = {
            (epoch, r["source"]): (
                r["n_docs"], r["n_pos"], r["n_kept"], r["n_correct"],
                r["mean_score_ppm"],
            )
            for r in _qc_scored_df(spark, sf_dir, w=w)
            .filter(keep)
            .groupBy("source")
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.sum("y").alias("n_pos"),
                F.count(
                    F.when(F.col("hb") < F.expr("(256 * p) div 1000000"), 1)
                ).alias("n_kept"),
                F.count(F.when(F.expr("(p >= 500000) = (y = 1)"), 1)).alias(
                    "n_correct"
                ),
                F.expr("sum(p) div count(1)").alias("mean_score_ppm"),
            )
            .collect()
        }
        assert {k: v for k, v in streamed.items() if k[0] == epoch} == batch
