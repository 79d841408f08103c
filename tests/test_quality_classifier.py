"""Gates for q_quality_classifier (llm_clean.py): trainer correctness on
separable data, end-to-end separation on a crafted corpus, and rerun
determinism (sample collect + driver fit + literal fold-back must be a
pure function of the input)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from bifrost_spark import registry
from bifrost_spark.queries.llm_clean import _qc_train


def test_trainer_recovers_separable_boundary():
    rng = np.random.default_rng(5)
    n, d = 400, 64
    X = np.zeros((n, d))
    y = np.zeros(n)
    # class 1 mass on buckets 0-7, class 0 on buckets 8-15, small noise
    for i in range(n):
        lab = i % 2
        y[i] = lab
        hot = rng.integers(0, 8, size=6) + (0 if lab else 8)
        for b in hot:
            X[i, b] += 1 / 6
        X[i, rng.integers(16, 64)] += 0.05
    w, b = _qc_train(X, y)
    p = 1 / (1 + np.exp(-(X @ w + b)))
    acc = ((p > 0.5) == (y == 1)).mean()
    assert acc >= 0.99, f"trainer accuracy {acc:.3f}"


def _crafted_corpus(tmp_path, n_docs=240, seed=11):
    """Target sources draw words from vocab A, others from vocab B."""
    rng = np.random.default_rng(seed)
    va = [f"alpha{i}" for i in range(40)]
    vb = [f"beta{i}" for i in range(40)]
    rows = []
    for i in range(n_docs):
        target = i % 3 == 0
        src = ["src1", "src2", "src3"][i % 3] if target else f"other{i % 4}"
        vocab = va if target else vb
        words = rng.choice(vocab, size=60)
        rows.append((i, " ".join(words), "en", src, 0))
    pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    ).to_parquet(tmp_path / "documents.parquet", index=False)


def test_classifier_separates_crafted_corpus(spark, tmp_path):
    _crafted_corpus(tmp_path)
    out = registry.queries()["q_quality_classifier"](spark, str(tmp_path))
    rows = {r["doc_id"]: r for r in out.collect()}
    t_scores = [rows[i]["score"] for i in rows if i % 3 == 0]
    o_scores = [rows[i]["score"] for i in rows if i % 3 != 0]
    assert min(t_scores) > max(o_scores), "classes must separate cleanly"
    acc = (
        sum(1 for i in rows if rows[i]["predicted"] == (1 if i % 3 == 0 else 0))
        / len(rows)
    )
    assert acc >= 0.95, f"accuracy {acc:.3f}"


def test_classifier_rerun_deterministic(spark, sf_dir):
    q = registry.queries()["q_quality_classifier"]
    a = sorted(map(tuple, q(spark, sf_dir).collect()))
    b = sorted(map(tuple, q(spark, sf_dir).collect()))
    assert a == b


def test_classifier_partition_layout_invariant(spark, tmp_path):
    """Scores must be identical whatever the physical layout of the input
    (file count / row order): the training sample is content-selected
    (xxhash64-ordered) and sorted by doc_id before the driver fit, so the
    fitted weights — and every 9-dp score — are a pure function of the
    corpus, not of how it happens to be partitioned."""
    a_dir, b_dir = tmp_path / "a", tmp_path / "b"
    a_dir.mkdir(), b_dir.mkdir()
    _crafted_corpus(a_dir)
    # layout B: same rows, reversed order, split across 4 files
    pdf = pd.read_parquet(a_dir / "documents.parquet").iloc[::-1].reset_index(drop=True)
    (b_dir / "documents.parquet").mkdir()
    for i in range(4):
        pdf.iloc[i::4].to_parquet(
            b_dir / "documents.parquet" / f"part-{i}.parquet", index=False
        )
    q = registry.queries()["q_quality_classifier"]
    a = sorted(map(tuple, q(spark, str(a_dir)).collect()))
    b = sorted(map(tuple, q(spark, str(b_dir)).collect()))
    assert a == b
