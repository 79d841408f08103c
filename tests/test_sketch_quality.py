"""Quality gates for the randomized sketches that have no DuckDB oracle.

The exact operators (q_dedup_ngram_jaccard, q_sim_topk) are oracle-checked;
here the approximate operators are measured AGAINST those exact twins:

* MinHash+LSH must recover nearly all true Jaccard>=0.5 pairs (its banding
  parameters make a false negative vanishingly unlikely at j>=0.5);
* SimHash blocking must keep every true near-dup pair (recall gate only —
  hamming<=8 on short docs is deliberately loose, precision is not gated);
* SRP-LSH ANN must keep >=0.8 of the exact top-k neighbor set at the
  4-bit x 8-table x 1-bit-multiprobe settings (measured: 1.0).

Runs at sf0.01 (BIFROST_QUALITY_SF_DIR to override): large enough for
real near-dup structure, small enough for CI.
"""

from __future__ import annotations

import os

import pytest

from bifrost_spark import registry

# r12: adversarial fuzz / audit suite — excluded from the default
# (driver-window) run via pytest.ini; run with -m "" or -m slow.
pytestmark = pytest.mark.slow

SF_DIR = os.environ.get("BIFROST_QUALITY_SF_DIR", "/root/testdata/sf0.01")


def _pairs(df, a="id_a", b="id_b"):
    return {(r[a], r[b]) for r in df.select(a, b).collect()}


@pytest.fixture(scope="module")
def exact_jaccard(spark):
    return _pairs(registry.queries()["q_dedup_ngram_jaccard"](spark, SF_DIR))


def test_minhash_recall_and_precision(spark, exact_jaccard):
    got = _pairs(registry.queries()["q_dedup_minhash"](spark, SF_DIR))
    assert exact_jaccard, "fixture has no true near-dup pairs — test is vacuous"
    recall = len(got & exact_jaccard) / len(exact_jaccard)
    precision = len(got & exact_jaccard) / max(len(got), 1)
    assert recall >= 0.9, f"minhash recall {recall:.2f} < 0.9"
    assert precision >= 0.8, f"minhash precision {precision:.2f} < 0.8"


def test_incremental_minhash_recall_and_precision(spark, exact_jaccard):
    """The asymmetric probe (new batch vs standing index) must find the
    same CROSS-BATCH near-dup pairs the exact n-gram Jaccard baseline
    does — the pair set restricted to (new, existing) pairs, i.e. exactly
    one side with doc_id % 4 == 0.  Same bars as the symmetric sketch."""
    truth = {
        (a, b)
        for a, b in exact_jaccard
        if (a % 4 == 0) != (b % 4 == 0)
    }
    assert truth, "fixture has no cross-batch near-dup pairs — test is vacuous"
    out = registry.queries()["q_dedup_incremental_minhash"](spark, SF_DIR)
    # canonicalize to the exact baseline's (min, max) orientation
    got = {
        (min(r["doc_id"], r["dup_of"]), max(r["doc_id"], r["dup_of"]))
        for r in out.collect()
    }
    recall = len(got & truth) / len(truth)
    precision = len(got & truth) / max(len(got), 1)
    assert recall >= 0.9, f"incremental minhash recall {recall:.2f} < 0.9"
    assert precision >= 0.8, f"incremental minhash precision {precision:.2f} < 0.8"


def test_content_free_docs_get_no_signature_and_no_pairs(spark):
    """NULL-, empty-, and whitespace-only-text docs must not receive a
    MinHash signature: before the fix they all hashed the same degenerate
    constant gram, shared one signature, and the LSH join flagged every
    pair of them as est_jaccard = 1.0 near-dups (review finding — the
    round-5 xxhash64(NULL) phantom-pair class re-surfacing in the
    incremental admission flows)."""
    import pandas as pd

    from bifrost_spark.operators.dedup import (
        lsh_candidate_pairs,
        lsh_probe_pairs,
        minhash_signatures,
    )

    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [0, 1, 2, 3, 4],
                "text": [None, "", "   ", "real content words here", None],
            }
        )
    )
    # both modes: whitespace-only is content-free (word mode via the
    # empty-token filter, char mode via the trimmed-length filter — an
    # all-space doc of length >= k would collapse to one constant k-space
    # gram and phantom-pair with every other all-space doc, ADVICE r6)
    expected = {"word": {3}, "char": {3}}
    for mode in ("word", "char"):
        sig = minhash_signatures(df, "text", "doc_id", shingle=mode)
        ids = {r["doc_id"] for r in sig.collect()}
        assert ids == expected[mode], (mode, ids)
        assert lsh_candidate_pairs(sig, "doc_id").count() == 0
        # probing a corpus against itself: only true self-matches remain
        assert lsh_probe_pairs(sig, sig, "doc_id").count() == len(ids)


def test_simhash_recall(spark, exact_jaccard):
    got = _pairs(registry.queries()["q_dedup_simhash"](spark, SF_DIR))
    recall = len(got & exact_jaccard) / len(exact_jaccard)
    assert recall >= 0.9, f"simhash recall {recall:.2f} < 0.9"


def test_embedding_dedup_matches_bruteforce(spark):
    """The numpy prefilter + decimal rescore must equal the pure decimal path
    (the prefilter margin may not drop true pairs)."""
    from pyspark.sql import functions as F

    from bifrost_spark.operators.vectors import cosine
    from bifrost_spark.queries.llm_dedup import COSINE_DUP_THRESHOLD
    from bifrost_spark.tables import load_table

    e = load_table(spark, SF_DIR, "embeddings")
    a = e.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("emb_a"))
    b = e.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("emb_b"))
    truth = _pairs(
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", cosine(F.col("emb_a"), F.col("emb_b")).alias("c"))
        .filter(F.col("c") >= COSINE_DUP_THRESHOLD)
    )
    got = _pairs(registry.queries()["q_dedup_embedding"](spark, SF_DIR))
    assert got == truth


def test_approx_quantile_close_to_exact(spark):
    """approx_percentile at accuracy=10000 must land within one rank-error
    bucket of the exact percentile on every group."""
    from pyspark.sql import functions as F

    from bifrost_spark.tables import load_table

    got = {
        (r.l_returnflag, r.percentile): r.value
        for r in registry.queries()["q_agg_approx_quantile"](spark, SF_DIR).collect()
    }
    li = load_table(spark, SF_DIR, "lineitem")
    exact = {
        r.l_returnflag: r.ex
        for r in li.groupBy("l_returnflag")
        .agg(F.expr("percentile(l_quantity, array(0.5, 0.9, 0.99))").alias("ex"))
        .collect()
    }
    assert len(got) == 3 * len(exact)  # one row per (group, percentile)
    for (flag, pct), a in got.items():
        e = dict(zip((0.5, 0.9, 0.99), exact[flag]))[pct]
        assert abs(a - e) <= max(1.0, 0.02 * e), (flag, pct, a, e)


def test_ann_lsh_recall(spark):
    qs = registry.queries()
    top = {
        (r.query_id, r.neighbor_id)
        for r in qs["q_sim_topk"](spark, SF_DIR).collect()
    }
    ann = {
        (r.query_id, r.neighbor_id)
        for r in qs["q_sim_ann_lsh"](spark, SF_DIR).collect()
    }
    recall = len(top & ann) / len(top)
    assert recall >= 0.8, f"ann recall {recall:.2f} < 0.8"


def test_ann_ivf_recall(spark):
    qs = registry.queries()
    top = {
        (r.query_id, r.neighbor_id)
        for r in qs["q_sim_topk"](spark, SF_DIR).collect()
    }
    ivf = {
        (r.query_id, r.neighbor_id)
        for r in qs["q_sim_ann_ivf"](spark, SF_DIR).collect()
    }
    recall = len(top & ivf) / len(top)
    assert recall >= 0.8, f"ivf recall {recall:.2f} < 0.8"


def test_approx_distinct_partition_invariant(spark, sf_dir):
    """HLL++ register-max merge is commutative/associative, so
    approx_count_distinct must return the SAME estimate regardless of how
    the input is partitioned — the property that makes the sketch safe on
    a cluster whose partitioning the user doesn't control."""
    from pyspark.sql import functions as F

    from bifrost_spark.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    est = {
        n: ev.repartition(n)
        .agg(F.approx_count_distinct("user_id").alias("u"))
        .collect()[0].u
        for n in (1, 4, 32)
    }
    assert len(set(est.values())) == 1, f"partition-dependent estimates: {est}"


def test_simhash_blocking_guard():
    """8-chunk blocking guarantees recall only to hamming 7 — a larger
    radius must be refused, not silently under-recalled."""
    from bifrost_spark.operators.dedup import simhash_near_pairs

    with pytest.raises(ValueError, match="guaranteed-recall bound"):
        simhash_near_pairs(None, "doc_id", max_hamming=8)


def test_hll_rollup_close_to_exact(spark):
    """Merged per-month HLL estimates must land within DataSketches' ~2%
    relative error of exact COUNT(DISTINCT user) per month."""
    from pyspark.sql import functions as F

    from bifrost_spark.tables import load_table

    got = {
        r.month: r.approx_users
        for r in registry.queries()["q_hll_rollup"](spark, SF_DIR).collect()
    }
    ev = load_table(spark, SF_DIR, "events")
    exact = {
        r.month: r.ex
        for r in ev.groupBy(
            F.date_trunc("month", F.to_date("ts")).cast("date").alias("month")
        )
        .agg(F.countDistinct("user_id").alias("ex"))
        .collect()
    }
    assert set(got) == set(exact)
    for month, est in got.items():
        assert abs(est - exact[month]) <= max(2, 0.03 * exact[month]), (
            month, est, exact[month],
        )


def test_hll_rollup_partition_invariant(spark):
    """The union-merged rollup must not depend on partition layout
    (register-max merging is commutative/idempotent)."""
    from pyspark.sql import functions as F

    from bifrost_spark.tables import load_table

    ev = load_table(spark, SF_DIR, "events")

    def rollup(nparts):
        daily = (
            ev.repartition(nparts)
            .groupBy(F.to_date("ts").alias("day"))
            .agg(F.hll_sketch_agg("user_id").alias("sk"))
        )
        return {
            r.month: r.approx
            for r in daily.groupBy(
                F.date_trunc("month", "day").cast("date").alias("month")
            )
            .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx"))
            .collect()
        }

    assert rollup(4) == rollup(32)


def test_fuzzy_decontaminate_recall(spark, exact_jaccard):
    """Every corpus doc that is exact-Jaccard-contaminated by a benchmark
    doc (doc_id ≡ 7 mod 10) must be flagged by the MinHash-based fuzzy
    decontamination."""
    truth = set()
    for a, b in exact_jaccard:
        a_bench, b_bench = a % 10 == 7, b % 10 == 7
        if a_bench != b_bench:
            truth.add(b if a_bench else a)
    got = {
        r.doc_id
        for r in registry.queries()["q_decontaminate_fuzzy"](spark, SF_DIR).collect()
    }
    assert truth, "fixture has no cross-set contamination — test is vacuous"
    missed = truth - got
    assert not missed, f"contaminated docs missed: {sorted(missed)[:10]}"


def test_ann_ivfpq_recall(spark):
    """IVF-PQ (coarse cells + product-quantized residual ADC + exact
    refine) must keep >=0.8 of the exact top-k set, like the other ANN
    paths."""
    qs = registry.queries()
    top = {
        (r.query_id, r.neighbor_id)
        for r in qs["q_sim_topk"](spark, SF_DIR).collect()
    }
    pq = {
        (r.query_id, r.neighbor_id)
        for r in qs["q_sim_ann_ivfpq"](spark, SF_DIR).collect()
    }
    recall = len(top & pq) / len(top)
    assert recall >= 0.8, f"ivfpq recall {recall:.2f} < 0.8"


def test_theta_overlap_close_to_exact(spark):
    """Theta-sketch |A∩B| / |A∪B| / |A\\B| estimates per segment pair must
    land within ~5% of the exact distinct counts."""
    from pyspark.sql import functions as F

    from bifrost_spark.tables import load_table

    got = {
        (r.seg_a, r.seg_b): (r.n_both, r.n_either, r.n_only_a)
        for r in registry.queries()["q_theta_overlap"](spark, SF_DIR).collect()
    }
    ev = load_table(spark, SF_DIR, "events")
    users = {
        r.event_type: set(r.us)
        for r in ev.groupBy("event_type")
        .agg(F.collect_set("user_id").alias("us"))
        .collect()
    }
    assert got, "no segment pairs"
    for (a, b), (n_both, n_either, n_only_a) in got.items():
        ua, ub = users[a], users[b]
        for est, exact in (
            (n_both, len(ua & ub)),
            (n_either, len(ua | ub)),
            (n_only_a, len(ua - ub)),
        ):
            assert abs(est - exact) <= max(2, 0.05 * exact), (a, b, est, exact)


def test_heavy_hitters_exact_on_fixture(spark):
    """With maxItemsTracked far above the fixture vocabulary, approx_top_k
    counts are exact and its item set must equal the true top-10 (modulo
    boundary-count ties, which the fixture's count distribution decides)."""
    from pyspark.sql import functions as F

    from bifrost_spark.tables import load_table

    got = {
        r.item: r.n
        for r in registry.queries()["q_heavy_hitters"](spark, SF_DIR).collect()
    }
    toks = F.filter(F.split(F.col("text"), " ", -1), lambda t: t != "")
    exact = {
        r.tok: r.n
        for r in load_table(spark, SF_DIR, "documents")
        .select(F.explode(toks).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert len(got) == 10
    for item, n in got.items():
        assert exact[item] == n, (item, n, exact.get(item))
    # every reported item's count is >= the 10th-largest true count
    floor = sorted(exact.values(), reverse=True)[9]
    assert all(n >= floor for n in got.values())


def test_ann_ivfpq_recall_on_clustered_corpus(spark, tmp_path):
    """The fixture embeddings are near-uniform — PQ's worst case, hence the
    wide refine shortlist and the 0.8 gate above.  On a CLUSTERED corpus
    (the realistic regime IVF-PQ is built for: 16 true clusters, small
    in-cluster noise) the same operator must clear a strictly higher bar.
    """
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(42)
    n, dim, k_true = 500, 64, 16
    centers = rng.normal(size=(k_true, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    assign = rng.integers(0, k_true, size=n)
    vecs = centers[assign] + 0.15 * rng.normal(size=(n, dim))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)

    pd.DataFrame(
        {
            "vec_id": np.arange(n, dtype=np.int64),
            "embedding": [v.astype(np.float32) for v in vecs],
            "label": assign.astype(np.int32),
        }
    ).to_parquet(tmp_path / "embeddings.parquet", index=False)

    # exact ground truth (numpy, float64): top-5 cosine per query vec_id<10
    f32 = vecs.astype(np.float32).astype(np.float64)
    f32 /= np.linalg.norm(f32, axis=1, keepdims=True)
    sims = f32[:10] @ f32.T
    truth = set()
    for q in range(10):
        order = [j for j in np.argsort(-sims[q]) if j != q][:5]
        truth.update((q, int(j)) for j in order)

    got = {
        (r.query_id, r.neighbor_id)
        for r in registry.queries()["q_sim_ann_ivfpq"](
            spark, str(tmp_path)
        ).collect()
    }
    recall = len(truth & got) / len(truth)
    assert recall >= 0.9, f"clustered ivfpq recall {recall:.2f} < 0.9"


def test_semdedup_precision_on_fixture(spark):
    """Every pair SemDeDup emits must be a true near-dup (candidate
    generation is approximate, the cosine itself is genuine).  Recall on
    the near-uniform fixture is LOW by design (borderline pairs straddle
    clusters) — the clustered-corpus test below gates recall in the
    operator's design regime."""
    sem = {
        (r.keeper_id, r.drop_id)
        for r in registry.queries()["q_dedup_semantic"](spark, SF_DIR).collect()
    }
    exact = {
        (r.id_a, r.id_b)
        for r in registry.queries()["q_dedup_embedding"](spark, SF_DIR).collect()
    }
    assert sem, "no semantic near-dups found at all"
    assert sem <= exact, f"false positives: {sorted(sem - exact)[:5]}"


def test_semdedup_recall_on_clustered_corpus(spark, tmp_path):
    """On a clustered corpus near-dups co-cluster, so SemDeDup must find
    nearly all of them: recall ≥ 0.95 over pairs safely above threshold
    (cos ≥ 0.5), precision 1.0 against a 1e-9-margin exact set."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(99)
    # k_true matches semdedup_k(400) = 16: SemDeDup's contract is that the
    # cluster count tracks the corpus's natural granularity (over-clustering
    # splits true near-dup groups — measured: k=16 over 8 true clusters
    # halves recall, exactly the failure mode the paper tunes k against);
    # the derived-k rule (n / target-cell-size) is pinned in test_cells.py
    n, dim, k_true = 400, 64, 16
    centers = rng.normal(size=(k_true, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    assign = rng.integers(0, k_true, size=n)
    # noise norm ≈ σ·√dim = 0.64 → in-cluster cosine ≈ 1/(1+0.41) ≈ 0.7,
    # cross-cluster ≈ 0: every within-cluster pair is a strong near-dup
    vecs = centers[assign] + 0.08 * rng.normal(size=(n, dim))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    pd.DataFrame(
        {
            "vec_id": np.arange(n, dtype=np.int64),
            "embedding": [v.astype(np.float32) for v in vecs],
            "label": assign.astype(np.int32),
        }
    ).to_parquet(tmp_path / "embeddings.parquet", index=False)

    u = vecs.astype(np.float32).astype(np.float64)
    u /= np.linalg.norm(u, axis=1, keepdims=True)
    sims = u @ u.T
    iu = np.triu_indices(n, k=1)
    strong = {
        (int(a), int(b))
        for a, b in zip(iu[0][sims[iu] >= 0.5], iu[1][sims[iu] >= 0.5])
    }
    loose = {
        (int(a), int(b))
        for a, b in zip(
            iu[0][sims[iu] >= 0.45 - 1e-9], iu[1][sims[iu] >= 0.45 - 1e-9]
        )
    }
    got = {
        (r.keeper_id, r.drop_id)
        for r in registry.queries()["q_dedup_semantic"](
            spark, str(tmp_path)
        ).collect()
    }
    assert got <= loose, f"false positives: {sorted(got - loose)[:5]}"
    recall = len(got & strong) / len(strong)
    assert recall >= 0.95, f"clustered semdedup recall {recall:.2f} < 0.95"


@pytest.mark.parametrize(
    "sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01",
               "/root/testdata/sf0.1"]
)
def test_semdedup_precision_holds_with_derived_k(spark, sf_dir):
    """VERDICT r2 item 4 gate: with k derived from corpus size the
    precision-1.0 contract must hold at every SF (sf0.1's derived k=200
    also exercises the pandas assignment path above LITERAL_K_MAX)."""
    from pyspark.sql import functions as F

    from bifrost_spark.operators.vectors import norm2_fast
    from bifrost_spark.tables import load_table

    sem = [
        (r.keeper_id, r.drop_id, r.cos_sim)
        for r in registry.queries()["q_dedup_semantic"](spark, sf_dir).collect()
    ]
    assert sem, f"no semantic near-dups found at {sf_dir}"
    # precision: every emitted cosine is a genuine >=threshold near-dup —
    # recompute each emitted pair's cosine exactly in numpy
    import numpy as np

    e = load_table(spark, sf_dir, "embeddings")
    ids = {i for a, b, _ in sem for i in (a, b)}
    vecs = {
        r.vec_id: np.asarray(r.embedding, dtype=np.float64)
        for r in e.filter(F.col("vec_id").isin(list(ids))).collect()
    }
    from bifrost_spark.queries.llm_dedup import COSINE_DUP_THRESHOLD

    for a, b, cos_sim in sem:
        u, v = vecs[a], vecs[b]
        true_cos = float(u @ v / (np.linalg.norm(u) * np.linalg.norm(v)))
        assert true_cos >= COSINE_DUP_THRESHOLD - 1e-9, (a, b, true_cos)
        assert abs(true_cos - cos_sim) < 1e-5


def test_pca_matches_numpy(spark):
    """q_embedding_pca is PCA with no SQL oracle; numpy is the local
    oracle: same mean-centering, covariance eigenvectors, sign
    canonicalization, and 6-dp rounding, compared per coordinate.
    |projection| must match to 1e-4 (breeze and LAPACK agree far below
    that for a 64x64 well-separated spectrum)."""
    import numpy as np

    fn = registry.queries()["q_embedding_pca"]
    rows = fn(spark, SF_DIR).collect()
    got: dict = {}
    for r in rows:  # flat (vec_id, component, loading) rows → per-vec arrays
        got.setdefault(r["vec_id"], {})[r["component"]] = r["loading"]
    got = {
        v: np.array([comps[j] for j in sorted(comps)]) for v, comps in got.items()
    }

    import duckdb

    X = np.array(
        duckdb.connect()
        .execute(
            f"SELECT embedding FROM '{SF_DIR}/embeddings.parquet' ORDER BY vec_id"
        )
        .fetchdf()["embedding"]
        .tolist(),
        dtype=np.float64,
    )
    ids = [
        r[0]
        for r in duckdb.connect()
        .execute(f"SELECT vec_id FROM '{SF_DIR}/embeddings.parquet' ORDER BY vec_id")
        .fetchall()
    ]
    Xc = X - X.mean(axis=0)
    # sample covariance with the same normalization MLlib uses (n-1)
    cov = Xc.T @ Xc / (X.shape[0] - 1)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:8]
    W = evecs[:, order]
    for j in range(W.shape[1]):
        col = W[:, j]
        if col[np.abs(col).argmax()] < 0:
            W[:, j] = -col
    expect = Xc @ W

    assert len(got) == len(ids)
    err = max(
        float(np.max(np.abs(got[v] - expect[i]))) for i, v in enumerate(ids)
    )
    assert err < 1e-4, f"max |spark - numpy| projection gap {err}"


def test_pca_moment_totals_bounded_regardless_of_batch_count(spark):
    """The PCA moments pass must deliver O(d²) rows to the driver no matter
    how many Arrow batches the corpus splits into (VERDICT r5: the old
    per-batch collect was O(batches·d²) driver memory — ~33 GB at 10^10
    vectors).  Force tiny Arrow batches so the corpus splits into hundreds
    of partials, and assert the reduced frame is exactly 1+d+d² rows and
    that the totals still equal numpy's single-pass moments."""
    import numpy as np
    from pyspark.sql import functions as F

    from bifrost_spark.queries.llm_similarity import pca_moment_totals
    from bifrost_spark.tables import load_table

    prev = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", None)
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "7")
    try:
        e = load_table(spark, SF_DIR, "embeddings")
        dbl = e.select(
            "vec_id", F.col("embedding").cast("array<double>").alias("emb")
        ).filter(F.col("emb").isNotNull())
        d = len(dbl.select("emb").first()["emb"])
        rows = pca_moment_totals(dbl).collect()
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")
        else:
            spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", prev)

    assert len(rows) == 1 + d + d * d, len(rows)
    tot = np.zeros(1 + d + d * d)
    for r in rows:
        tot[r["pos"]] = r["s"]
    X = np.stack([r["emb"] for r in dbl.select("emb").collect()]).astype(np.float64)
    assert tot[0] == X.shape[0]
    np.testing.assert_allclose(tot[1 : 1 + d], X.sum(axis=0), rtol=1e-9)
    np.testing.assert_allclose(
        tot[1 + d :].reshape(d, d), X.T @ X, rtol=1e-9
    )


def test_pca_components_explain_variance_in_order(spark):
    """Projected coordinate variance must be (weakly) decreasing across
    components — the defining PCA property, and a cheap end-to-end sanity
    check on the centering + projection plumbing."""
    import numpy as np

    import pandas as pd

    fn = registry.queries()["q_embedding_pca"]
    flat = pd.DataFrame(
        [r.asDict() for r in fn(spark, SF_DIR).collect()]
    )
    P = flat.pivot(index="vec_id", columns="component", values="loading").to_numpy()
    var = P.var(axis=0)
    assert all(var[i] >= var[i + 1] - 1e-9 for i in range(len(var) - 1)), var


def test_ann_opq_recall_on_clustered_corpus(spark, tmp_path):
    """OPQ+IVF-PQ must clear the same clustered-corpus bar as plain
    IVF-PQ (the rotation may not hurt the design regime; its MSE win on
    anisotropic data is gated separately in test_cells.py)."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(42)
    n, dim, k_true = 500, 64, 16
    centers = rng.normal(size=(k_true, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    assign = rng.integers(0, k_true, size=n)
    vecs = centers[assign] + 0.15 * rng.normal(size=(n, dim))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)

    pd.DataFrame(
        {
            "vec_id": np.arange(n, dtype=np.int64),
            "embedding": [v.astype(np.float32) for v in vecs],
            "label": assign.astype(np.int32),
        }
    ).to_parquet(tmp_path / "embeddings.parquet", index=False)

    f32 = vecs.astype(np.float32).astype(np.float64)
    f32 /= np.linalg.norm(f32, axis=1, keepdims=True)
    sims = f32[:10] @ f32.T
    truth = set()
    for q in range(10):
        order = [j for j in np.argsort(-sims[q]) if j != q][:5]
        truth.update((q, int(j)) for j in order)

    got = {
        (r.query_id, r.neighbor_id)
        for r in registry.queries()["q_sim_ann_opq"](
            spark, str(tmp_path)
        ).collect()
    }
    recall = len(truth & got) / len(truth)
    assert recall >= 0.9, f"clustered opq recall {recall:.2f} < 0.9"


def test_quantile_sketch_rank_error_bound(spark):
    """q_quantile_sketch_rollup's weekly estimates must sit within the
    equi-depth rank-error bound of the EXACT weekly quantiles: each daily
    point's true rank is known within its bucket (n_day/K rows), so the
    merged estimate's realized CDF position may deviate from the target
    quantile by at most ~1/K plus one selection step — gated at 2.5/K."""
    from pyspark.sql import functions as F

    from bifrost_spark.queries.scale_ops import _QSK_K
    from bifrost_spark.tables import load_table

    est = {
        (r["week"], r["q_pct"]): r["est_value"]
        for r in registry.queries()["q_quantile_sketch_rollup"](
            spark, SF_DIR
        ).collect()
    }
    ev = (
        load_table(spark, SF_DIR, "events")
        .filter(F.col("value").isNotNull())
        .select(F.date_trunc("week", "ts").cast("date").alias("week"), "value")
    )
    by_week = {}
    for r in ev.collect():
        by_week.setdefault(r["week"], []).append(r["value"])
    assert est and by_week
    tol = 2.5 / _QSK_K
    for (week, q_pct), v in est.items():
        vals = sorted(by_week[week])
        cdf = sum(1 for x in vals if x <= v) / len(vals)
        assert abs(cdf - q_pct / 100.0) <= tol, (week, q_pct, cdf, tol)


def test_quantile_sketch_mergeability(spark):
    """The weekly rollup must be computable from the DAILY sketch points
    alone: recomputing the merge from the per-day (value, weight) summary
    in plain Python reproduces the engine's weekly estimates exactly —
    the property that lets 100 TB dashboards store K points per day and
    never rescan raw events."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from bifrost_spark.queries.scale_ops import _QSK_K, _QSK_PCTS
    from bifrost_spark.tables import load_table

    ev = load_table(spark, SF_DIR, "events").filter(F.col("value").isNotNull())
    wday = Window.partitionBy("day")
    base = ev.select(
        F.date_trunc("day", "ts").alias("day"),
        F.date_trunc("week", "ts").cast("date").alias("week"),
        "value",
        "event_id",
    ).select(
        "day",
        "week",
        "value",
        F.row_number().over(wday.orderBy("value", "event_id")).alias("rn"),
        F.count(F.lit(1)).over(wday).alias("n"),
    )
    daily = (
        base.withColumn("bucket", F.expr(f"((rn - 1) * {_QSK_K}) DIV n"))
        .groupBy("day", "bucket")
        .agg(
            F.min("week").alias("week"),
            F.max_by("value", "rn").alias("pv"),
            F.count(F.lit(1)).alias("w"),
        )
        .collect()
    )
    by_week = {}
    for r in daily:
        by_week.setdefault(r["week"], []).append((r["pv"], r["day"], r["bucket"], r["w"]))
    want = {
        (r["week"], r["q_pct"]): r["est_value"]
        for r in registry.queries()["q_quantile_sketch_rollup"](
            spark, SF_DIR
        ).collect()
    }
    got = {}
    for week, pts in by_week.items():
        pts.sort(key=lambda t: (t[0], t[1], t[2]))
        total = sum(w for *_ignored, w in pts)
        for pct in _QSK_PCTS:
            cum = 0
            for pv, _d, _b, w in pts:
                cum += w
                if 100 * cum >= pct * total:
                    got[(week, pct)] = pv
                    break
    assert got == want
