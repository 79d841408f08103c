"""Triple-entry verification, tranche 16: the round-10 operator families.

Same rationale as tests/test_round9_models.py: DuckDB-oracle parity
proves both engines compute the same expression, not that the expression
is the statistic.  Every round-10 statistical operator is recomputed a
THIRD way from its textbook definition in plain Python/numpy — explicit
product-limit loops for Kaplan-Meier, hypergeometric moment sums for the
log-rank test, a literal dict-of-lists BPE trainer for q_bpe_train — and
the engine must agree within its own 9-dp rounding.
"""

from __future__ import annotations

import hashlib
import math
from collections import Counter

import numpy as np
import pandas as pd
import pytest

from bifrost_spark import registry
from conftest import SF_DIR

TOL = 1e-6


@pytest.fixture(scope="module")
def events() -> pd.DataFrame:
    return pd.read_parquet(f"{SF_DIR}/events.parquet")


@pytest.fixture(scope="module")
def docs() -> pd.DataFrame:
    return pd.read_parquet(f"{SF_DIR}/documents.parquet")


def _md5_bucket(key: str) -> int:
    return ord(hashlib.md5(key.encode()).hexdigest()[0]) % 2


# ---------------------------------------------------------------------------
# survival family — time-to-first-purchase lifetimes
# ---------------------------------------------------------------------------


def _lifetimes(events: pd.DataFrame) -> pd.DataFrame:
    e = events[events.user_id.notna() & events.ts.notna()].copy()
    e["day"] = e.ts.dt.floor("D")
    rows = []
    for uid, g in e.groupby("user_id"):
        first = g.day.min()
        last = g.day.max()
        conv = g.loc[g.event_type == "purchase", "day"].min()
        if pd.notna(conv):
            t, ev = (conv - first).days, 1
        else:
            t, ev = (last - first).days, 0
        rows.append(
            {
                "t": t,
                "ev": ev,
                "grp": "A" if _md5_bucket(str(int(uid))) == 0 else "B",
            }
        )
    return pd.DataFrame(rows)


def _km_model(lt: pd.DataFrame):
    """Textbook product-limit loop: [(t, n_risk, d, S, se), ...]."""
    out = []
    s = 1.0
    gw = 0.0
    dead = False
    for t in sorted(lt.loc[lt.ev == 1, "t"].unique()):
        n = int((lt.t >= t).sum())
        d = int(((lt.t == t) & (lt.ev == 1)).sum())
        if d == n:
            dead = True
        if not dead:
            s *= (n - d) / n
            gw += d / (n * (n - d))
            out.append((t, n, d, s, s * math.sqrt(gw)))
        else:
            out.append((t, n, d, 0.0, None))
    return out


def test_kaplan_meier_matches_product_limit_model(spark, events):
    lt = _lifetimes(events)
    model = _km_model(lt)
    rows = sorted(
        registry.queries()["q_kaplan_meier"](spark, SF_DIR).collect(),
        key=lambda r: r["t"],
    )
    assert [(r["t"], r["n_risk"], r["d"]) for r in rows] == [
        (t, n, d) for t, n, d, _, _ in model
    ]
    assert len(rows) > 0  # non-vacuous on the fixture
    for r, (_, _, _, s, se) in zip(rows, model):
        assert abs(r["s_km"] - s) < TOL
        if se is None:
            assert r["se_greenwood"] is None
        else:
            assert abs(r["se_greenwood"] - se) < TOL


def test_nelson_aalen_matches_cumulative_hazard_model(spark, events):
    lt = _lifetimes(events)
    rows = sorted(
        registry.queries()["q_nelson_aalen"](spark, SF_DIR).collect(),
        key=lambda r: r["t"],
    )
    h = v = 0.0
    model = []
    for t in sorted(lt.loc[lt.ev == 1, "t"].unique()):
        n = int((lt.t >= t).sum())
        d = int(((lt.t == t) & (lt.ev == 1)).sum())
        h += d / n
        v += d / (n * n)
        model.append((t, n, d, h, math.sqrt(v)))
    assert len(rows) == len(model) > 0
    for r, (t, n, d, hh, se) in zip(rows, model):
        assert (r["t"], r["n_risk"], r["d"]) == (t, n, d)
        assert abs(r["h_na"] - hh) < TOL
        assert abs(r["se_na"] - se) < TOL


def test_logrank_matches_hypergeometric_model(spark, events):
    lt = _lifetimes(events)
    o1 = e1 = v1 = 0.0
    n_times = 0
    for t in sorted(lt.loc[lt.ev == 1, "t"].unique()):
        at_risk = lt[lt.t >= t]
        n = len(at_risk)
        n1 = int((at_risk.grp == "A").sum())
        dd = int(((lt.t == t) & (lt.ev == 1)).sum())
        d1 = int(((lt.t == t) & (lt.ev == 1) & (lt.grp == "A")).sum())
        n_times += 1
        o1 += d1
        e1 += dd * n1 / n
        if n > 1:
            v1 += dd * n1 * (n - n1) * (n - dd) / (n * n * (n - 1))
    [r] = registry.queries()["q_logrank_test"](spark, SF_DIR).collect()
    assert r["n_times"] == n_times > 0
    assert r["o_a"] == o1
    assert abs(r["e_a"] - e1) < TOL
    assert abs(r["e_b"] - (r["o_a"] + r["o_b"] - e1)) < TOL
    if v1 > 0:
        assert abs(r["chi2_logrank"] - (o1 - e1) ** 2 / v1) < TOL
    else:
        assert r["chi2_logrank"] is None


# ---------------------------------------------------------------------------
# q_bpe_train — literal dict-of-tuples BPE trainer
# ---------------------------------------------------------------------------


def _py_bpe_train(texts, k=5):
    vocab = Counter()
    for t in texts:
        if t is None:
            continue
        for w in t.lower().split(" "):
            if w and "\x01" not in w and "\x02" not in w:
                vocab[w] += 1
    seqs = {w: tuple(w) + ("</w>",) for w in vocab}
    merges = []
    for step in range(1, k + 1):
        pairs = Counter()
        for w, syms in seqs.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += vocab[w]
        if not pairs:
            break
        # max by (freq DESC, p1 asc, p2 asc) — the engines' total order
        (p1, p2), f = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((step, p1, p2, f))
        new_seqs = {}
        for w, syms in seqs.items():
            out = []
            for s in syms:  # greedy left-to-right fold, same as the engine
                if out and out[-1] == p1 and s == p2:
                    out[-1] = p1 + p2
                else:
                    out.append(s)
            new_seqs[w] = tuple(out)
        seqs = new_seqs
    return merges


def test_bpe_train_matches_python_trainer(spark, docs):
    model = _py_bpe_train(docs.text.tolist(), k=5)
    rows = sorted(
        registry.queries()["q_bpe_train"](spark, SF_DIR).collect(),
        key=lambda r: r["step"],
    )
    assert [(r["step"], r["p1"], r["p2"], r["pair_freq"]) for r in rows] == model
    assert len(rows) == 5  # non-vacuous on the fixture


def test_bpe_train_greedy_overlap_rule():
    # "aaaa" + merge(a,a) must yield [aa, aa], never [aa, a, a]: the
    # greedy non-overlapping application both engines implement
    merges = _py_bpe_train(["aaaa aaaa"], k=2)
    assert merges[0] == (1, "a", "a", 6)
    # after merge 1 the word is (aa, aa, </w>): the step-2 candidates are
    # (aa, aa) and (aa, </w>) both at freq 2, and '<' sorts before 'a' so
    # the tie resolves to (aa, </w>).  A WRONG overlap rule ([aa, a, a])
    # would surface p1='a' candidates and pick (a, </w>) instead.
    assert merges[1] == (2, "aa", "</w>", 2)


# ---------------------------------------------------------------------------
# q_heaps_fit — numpy log-log OLS over the recomputed growth curve
# ---------------------------------------------------------------------------


def test_heaps_fit_matches_numpy_ols(spark, docs):
    m = int(docs.doc_id.max()) + 1
    tok_cum = Counter()
    first_seen = {}
    for _, row in docs.iterrows():
        dec = int(row.doc_id * 10.0 // m)
        toks = [t for t in (row.text or "").lower().split(" ") if t]
        tok_cum[dec] += len(toks)
        for t in toks:
            d0 = first_seen.get(t)
            if d0 is None or dec < d0:
                first_seen[t] = dec
    voc_cum = Counter(first_seen.values())
    xs, ys = [], []
    tc = vc = 0
    for dec in sorted(tok_cum):
        tc += tok_cum[dec]
        vc += voc_cum.get(dec, 0)
        if tc > 0 and vc > 0:
            xs.append(math.log(tc))
            ys.append(math.log(vc))
    x, y = np.array(xs), np.array(ys)
    n = len(x)
    beta = (n * (x * y).sum() - x.sum() * y.sum()) / (
        n * (x * x).sum() - x.sum() ** 2
    )
    ln_k = (y.sum() - beta * x.sum()) / n
    [r] = registry.queries()["q_heaps_fit"](spark, SF_DIR).collect()
    assert r["n_points"] == n > 1
    assert abs(r["beta"] - beta) < TOL
    assert abs(r["ln_k"] - ln_k) < TOL
    # the sf0.001 synthetic corpus draws from a FIXED word pool, so its
    # vocabulary saturates in decile 0 and beta is exactly 0 — the
    # saturated end of the Heaps range; natural corpora sit in (0, 1)
    assert 0.0 <= r["beta"] < 1.0


# ---------------------------------------------------------------------------
# q_dup_span_exact — independent 1-gram diagonal-run recomputation
# ---------------------------------------------------------------------------


def _exact_spans_model(docs: pd.DataFrame) -> dict:
    """Exact max cross-doc common token substring per doc, computed
    DIRECTLY from unigram position matches (no 8-gram anchor identity,
    no small-gram ladder — a genuinely different decomposition than the
    engine's)."""
    from collections import defaultdict

    toks = {
        int(r.doc_id): [t for t in r.text.split(" ") if t]
        for _, r in docs[docs.text.notna()].iterrows()
    }
    pos = defaultdict(list)
    for d, ws in toks.items():
        for i, w in enumerate(ws):
            pos[w].append((d, i))
    match = defaultdict(set)
    for w, plist in pos.items():
        for d1, i1 in plist:
            for d2, i2 in plist:
                if d1 < d2:
                    match[(d1, d2)].add((i1 - i2, i1))
    best = defaultdict(int)
    for (d1, d2), s in match.items():
        by_diag = defaultdict(list)
        for diag, pa in s:
            by_diag[diag].append(pa)
        m = 0
        for pas in by_diag.values():
            pas.sort()
            run = 1
            m = max(m, 1)
            for prev, cur in zip(pas, pas[1:]):
                run = run + 1 if cur == prev + 1 else 1
                m = max(m, run)
        best[d1] = max(best[d1], m)
        best[d2] = max(best[d2], m)
    return {d: best.get(d, 0) for d in toks}


def test_dup_span_exact_matches_unigram_run_model(spark, docs):
    model = _exact_spans_model(docs)
    rows = registry.queries()["q_dup_span_exact"](spark, SF_DIR).collect()
    got = {int(r["doc_id"]): int(r["max_dup_span"]) for r in rows}
    assert got == model
    assert max(model.values()) >= 8  # the 8-anchor path is exercised
    assert 0 < min(model.values()) < 8  # ...and the small-gram ladder too


def test_dup_span_anchor_pairs_are_structurally_distinct(spark, docs):
    """The r11 optimization dropped the .distinct() on the anchor-join
    candidate frame, arguing (da, db, diag, pa) rows are unique because
    each (doc, pos) carries exactly one anchor hash.  Pin that invariant:
    rebuild the candidate frame exactly as the query does and assert no
    duplicates exist on the fixture."""
    from pyspark.sql import functions as F

    from bifrost_spark.operators.dedup import token_gram_hashes, word_array

    d = spark.createDataFrame(docs[docs.text.notna()][["doc_id", "text"]])
    base = d.select("doc_id", word_array().alias("ws"))
    anchors = base.select(
        "doc_id", F.explode(token_gram_hashes("ws", 8)).alias("g")
    ).select("doc_id", F.col("g.pos").alias("pos"), F.col("g.gh").alias("gh"))
    a = anchors.select(F.col("doc_id").alias("da"), F.col("pos").alias("pa"), "gh")
    b = anchors.select(F.col("doc_id").alias("db"), F.col("pos").alias("pb"), "gh")
    pr = (
        a.join(b, "gh")
        .filter(F.col("da") < F.col("db"))
        .select("da", "db", (F.col("pa") - F.col("pb")).alias("diag"), "pa")
    )
    total = pr.count()
    assert total > 0  # the fixture exercises the anchor path
    assert total == pr.distinct().count()


def test_dup_span_model_agrees_with_quadratic_dp():
    # tiny crafted corpus: the unigram-run model itself is checked a
    # THIRD way against the O(n*m) common-substring DP
    texts = [
        "a b c d e f g h i j",
        "x y c d e f g h i q",  # shares 'c..i' (7 tokens)
        "a b z", "q q q", "p a b c d e f g h i j p",  # full 10-token span
    ]
    docs = pd.DataFrame(
        {"doc_id": range(len(texts)), "text": texts}
    )

    def dp(a, b):
        best = 0
        prev = [0] * (len(b) + 1)
        for i in range(1, len(a) + 1):
            cur = [0] * (len(b) + 1)
            for j in range(1, len(b) + 1):
                if a[i - 1] == b[j - 1]:
                    cur[j] = prev[j - 1] + 1
                    best = max(best, cur[j])
            prev = cur
        return best

    toks = [t.split(" ") for t in texts]
    expect = {}
    for i in range(len(texts)):
        expect[i] = max(
            (dp(toks[i], toks[j]) for j in range(len(texts)) if j != i),
            default=0,
        )
    assert _exact_spans_model(docs) == expect
    assert expect[0] == 10 and expect[1] == 7 and expect[4] == 10


# ---------------------------------------------------------------------------
# q_tukey_hsd / q_poisson_rate — numpy recomputation
# ---------------------------------------------------------------------------


def test_tukey_hsd_matches_numpy_model(spark, events):
    e = events[events.value.notna()]
    groups = {g: v.value.to_numpy(dtype=float) for g, v in e.groupby("event_type")}
    nn = sum(len(v) for v in groups.values())
    k = len(groups)
    ssw = sum(((v - v.mean()) ** 2).sum() for v in groups.values())
    msw = ssw / (nn - k)
    rows = registry.queries()["q_tukey_hsd"](spark, SF_DIR).collect()
    assert len(rows) == k * (k - 1) // 2 > 0
    for r in rows:
        va, vb = groups[r["group_a"]], groups[r["group_b"]]
        assert (r["n_a"], r["n_b"]) == (len(va), len(vb))
        diff = va.mean() - vb.mean()
        q = abs(diff) / math.sqrt(msw / 2 * (1 / len(va) + 1 / len(vb)))
        assert abs(r["mean_diff"] - diff) < TOL
        assert abs(r["q_stat"] - q) < 1e-5  # MSW via a different identity
        assert r["group_a"] < r["group_b"]


def test_poisson_rate_matches_pandas_model(spark, events):
    e = events[events.user_id.notna() & events.ts.notna()].copy()
    e["day"] = e.ts.dt.floor("D")
    e["variant"] = e.user_id.map(
        lambda u: "A" if _md5_bucket(str(int(u))) == 0 else "B"
    )
    stats = {}
    for v, g in e.groupby("variant"):
        stats[v] = (
            len(g[["user_id", "day"]].drop_duplicates()),
            int((g.event_type == "purchase").sum()),
        )
    (ea, ca), (eb, cb) = stats["A"], stats["B"]
    [r] = registry.queries()["q_poisson_rate"](spark, SF_DIR).collect()
    assert (r["events_a"], r["exposure_a"]) == (ca, ea)
    assert (r["events_b"], r["exposure_b"]) == (cb, eb)
    rr = (ca / ea) / (cb / eb)
    z = math.log(rr) / math.sqrt(1 / ca + 1 / cb)
    assert abs(r["rate_ratio"] - rr) < TOL
    assert abs(r["z"] - z) < TOL


# ---------------------------------------------------------------------------
# q_brier_decomp / q_lift_gains — numpy recomputation over raw scores
# ---------------------------------------------------------------------------


def _scored(docs: pd.DataFrame):
    rows = []
    for _, r in docs[docs.text.notna()].iterrows():
        toks = [t for t in r.text.lower().split(" ") if t]
        if not toks:
            continue
        score = len(set(toks)) / len(toks)
        rows.append((min(int(score * 10), 9), score, int(r.lang == "en")))
    return rows


def test_brier_decomp_matches_numpy_model(spark, docs):
    rows = _scored(docs)
    n = len(rows)
    ob = sum(y for _, _, y in rows) / n
    brier = sum((s - y) ** 2 for _, s, y in rows) / n
    rel = res = 0.0
    for b in set(b for b, _, _ in rows):
        grp = [(s, y) for bb, s, y in rows if bb == b]
        fb = sum(s for s, _ in grp) / len(grp)
        obb = sum(y for _, y in grp) / len(grp)
        rel += len(grp) * (fb - obb) ** 2 / n
        res += len(grp) * (obb - ob) ** 2 / n
    [r] = registry.queries()["q_brier_decomp"](spark, SF_DIR).collect()
    assert r["n"] == n > 0
    assert abs(r["brier"] - brier) < TOL
    assert abs(r["reliability"] - rel) < TOL
    assert abs(r["resolution"] - res) < TOL
    assert abs(r["uncertainty"] - ob * (1 - ob)) < TOL
    # Murphy identity: Brier = REL - RES + UNC + mean within-bin forecast
    # variance; the residual must therefore be the (nonnegative) variance
    assert r["brier"] - (r["reliability"] - r["resolution"] + r["uncertainty"]) > -TOL


def test_lift_gains_matches_numpy_model(spark, docs):
    rows = _scored(docs)
    n = len(rows)
    pos = sum(y for _, _, y in rows)
    per_bin = {}
    for b, _, y in rows:
        nb, pb = per_bin.get(b, (0, 0))
        per_bin[b] = (nb + 1, pb + y)
    out = sorted(
        registry.queries()["q_lift_gains"](spark, SF_DIR).collect(),
        key=lambda r: -r["bin"],
    )
    assert len(out) == len(per_bin) > 1
    cum_n = cum_pos = 0
    for r, b in zip(out, sorted(per_bin, reverse=True)):
        nb, pb = per_bin[b]
        cum_n += nb
        cum_pos += pb
        assert (r["bin"], r["n_b"], r["pos_b"]) == (b, nb, pb)
        assert (r["cum_n"], r["cum_pos"]) == (cum_n, cum_pos)
        assert abs(r["cum_gain"] - cum_pos / pos) < TOL
        assert abs(r["lift"] - (cum_pos / cum_n) / (pos / n)) < TOL
    # the curve must end at gain 1 and lift 1 (the whole corpus)
    assert abs(out[-1]["cum_gain"] - 1.0) < TOL
    assert abs(out[-1]["lift"] - 1.0) < TOL


# ---------------------------------------------------------------------------
# q_rendezvous_shard — hashlib recomputation + minimal-movement property
# ---------------------------------------------------------------------------


def _rdv_shard(doc_id: int, n_shards: int) -> int:
    return max(
        range(n_shards),
        key=lambda s: hashlib.md5(f"{doc_id}:{s}".encode()).hexdigest(),
    )


def test_rendezvous_shard_matches_hashlib_model(spark, docs):
    counts = Counter()
    chars = Counter()
    for _, r in docs.iterrows():
        sh = _rdv_shard(int(r.doc_id), 8)
        counts[sh] += 1
        chars[sh] += len(r.text or "")
    rows = registry.queries()["q_rendezvous_shard"](spark, SF_DIR).collect()
    got = {int(r["shard"]): (r["n_docs"], r["n_chars"]) for r in rows}
    assert got == {s: (counts[s], chars[s]) for s in counts}
    n = sum(counts.values())
    for r in rows:
        assert abs(r["doc_share"] - counts[int(r["shard"])] / n) < TOL


def test_rendezvous_resize_moves_one_over_s_plus_one():
    # THE rendezvous property: growing 8 -> 9 shards must only move docs
    # whose NEW shard wins — ~1/9 of them — never a wholesale reshuffle
    ids = range(2000)
    moved = sum(1 for i in ids if _rdv_shard(i, 8) != _rdv_shard(i, 9))
    assert 0 < moved / 2000 < 0.2  # expected ~0.111
    # and every moved doc moved TO the new shard 8, nowhere else
    for i in ids:
        a, b = _rdv_shard(i, 8), _rdv_shard(i, 9)
        if a != b:
            assert b == 8


# ---------------------------------------------------------------------------
# q_breslow_day — numpy homogeneity model on a crafted stratified corpus
# ---------------------------------------------------------------------------


def _bd_model(cells):
    """cells: list of (a, b, c, d).  Returns (n_strata, psi, T) or None."""
    sum_r = sum(a * d / (a + b + c + d) for a, b, c, d in cells if a + b + c + d > 1)
    sum_s = sum(b * c / (a + b + c + d) for a, b, c, d in cells if a + b + c + d > 1)
    if sum_r <= 0 or sum_s <= 0:
        return None
    psi = sum_r / sum_s
    n_used = 0
    t = 0.0
    for a, b, c, d in cells:
        if min(a + b, c + d, a + c, b + d) <= 0:
            continue
        r1, c1, n = float(a + b), float(a + c), float(a + b + c + d)
        if psi == 1.0:
            e = r1 * c1 / n
        else:
            bq = (n - r1 - c1) + psi * (r1 + c1)
            disc = max(bq * bq + 4 * (1 - psi) * psi * r1 * c1, 0.0)
            roots = [
                (-bq + math.sqrt(disc)) / (2 * (1 - psi)),
                (-bq - math.sqrt(disc)) / (2 * (1 - psi)),
            ]
            lo, hi = max(0.0, r1 + c1 - n), min(r1, c1)
            e = next((x for x in roots if lo < x < hi), None)
            if e is None:
                continue
        inv_v = 1 / e + 1 / (r1 - e) + 1 / (c1 - e) + 1 / (n - r1 - c1 + e)
        t += (a - e) ** 2 * inv_v
        n_used += 1
    return n_used, psi, t


def _bd_crafted_events():
    # 40 users, entry days staggered, every third user converted: a
    # corpus whose 4 strata all carry nonzero margins (asserted below)
    events = []
    for u in range(40):
        base_s = (u % 10) * 86400
        events.append((u, "view", base_s, 100))
        if u % 3 == 0:
            events.append((u, "purchase", base_s + 3600, 200))
        else:
            events.append((u, "view", base_s + 3600, 50))
    return events


def test_breslow_day_matches_numpy_model(spark, tmp_path_factory):
    import sys

    sys.path.insert(0, "tests")
    from test_fuzz_oracle import _write_fixture_dir

    events = _bd_crafted_events()
    tmpdir = _write_fixture_dir(
        str(tmp_path_factory.mktemp("bdfix")), events
    )
    # recompute the strata from scratch (variant via md5, conversion via
    # the purchase-share rule)
    from collections import defaultdict

    users = defaultdict(lambda: [0, 0])  # user -> [purchases, n]
    for u, t, _, _ in events:
        users[u][1] += 1
        users[u][0] += t == "purchase"
    cells = defaultdict(lambda: [0, 0, 0, 0])
    for u, (p, n) in users.items():
        conv = int(p * 4 > n)
        va = _md5_bucket(str(u)) == 0
        idx = (0 if conv else 1) if va else (2 if conv else 3)
        cells[u % 4][idx] += 1
    model = _bd_model([tuple(v) for v in cells.values()])
    assert model is not None
    n_used, psi, t = model
    [r] = registry.queries()["q_breslow_day"](spark, tmpdir).collect()
    assert r["n_strata"] == n_used == 4
    assert abs(r["or_mh"] - psi) < TOL
    assert abs(r["bd_chi2"] - t) < TOL


def test_breslow_day_fixture_outcome(spark):
    # sf0.001's strata never populate both off-diagonal cells, so psi is
    # undefined and the test correctly reports nothing (same exact
    # condition as q_mantel_haenszel's NULL or_mh there)
    assert registry.queries()["q_breslow_day"](spark, SF_DIR).collect() == []


# ---------------------------------------------------------------------------
# q_rmst — explicit step-integral recomputation
# ---------------------------------------------------------------------------


def test_rmst_matches_step_integral_model(spark, events):
    lt = _lifetimes(events)
    tau = 14.0
    km = _km_model(lt)  # [(t, n, d, S_after, se), ...]
    rmst = 0.0
    prev_t, prev_s = 0.0, 1.0
    for t, n, d, s, _ in km:
        rmst += prev_s * (min(t, tau) - min(prev_t, tau))
        prev_t, prev_s = t, s
    rmst += prev_s * (tau - min(prev_t, tau))
    var = 0.0
    for j, (t, n, d, s, _) in enumerate(km):
        if d >= n or t >= tau:
            continue
        a, pt, ps = 0.0, t, s  # remaining area after t_j
        for t2, _, _, s2, _ in km[j + 1 :]:
            a += ps * (min(t2, tau) - min(pt, tau))
            pt, ps = t2, s2
        a += ps * (tau - min(pt, tau))
        var += a * a * d / (n * (n - d))
    [r] = registry.queries()["q_rmst"](spark, SF_DIR).collect()
    assert r["tau"] == 14 and r["n_users"] == len(lt)
    assert r["n_times"] == len(km) > 0
    assert abs(r["rmst"] - rmst) < TOL
    assert abs(r["se_rmst"] - math.sqrt(var)) < TOL
    assert 0.0 < r["rmst"] < tau  # non-vacuous on the fixture
    assert r["se_rmst"] > 0.0


# ---------------------------------------------------------------------------
# q_cochran_armitage — explicit score-moment recomputation
# ---------------------------------------------------------------------------


def test_cochran_armitage_matches_score_model(spark, events):
    e = events[events.user_id.notna()]
    agg = e.groupby("user_id").agg(
        purchases=("event_type", lambda s: (s == "purchase").sum()),
        n=("event_type", "size"),
    )
    agg["converted"] = (agg.purchases * 4 > agg.n).astype(int)
    agg["w"] = [int(u) % 4 for u in agg.index]
    n_users, n_conv = len(agg), int(agg.converted.sum())
    t = v = 0.0
    pbar = n_conv / n_users
    sxn = sum(w * len(g) for w, g in agg.groupby("w"))
    sxxn = sum(w * w * len(g) for w, g in agg.groupby("w"))
    sxr = sum(w * int(g.converted.sum()) for w, g in agg.groupby("w"))
    t = sxr - n_conv * sxn / n_users
    v = pbar * (1 - pbar) * (sxxn - sxn * sxn / n_users)
    [r] = registry.queries()["q_cochran_armitage"](spark, SF_DIR).collect()
    assert (r["n_cohorts"], r["n_users"], r["n_converted"]) == (
        agg.w.nunique(),
        n_users,
        n_conv,
    )
    assert v > 0  # non-vacuous on the fixture
    assert abs(r["z_trend"] - t / math.sqrt(v)) < TOL
