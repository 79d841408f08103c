"""Triple-entry verification, tranche 2: analytics/pipeline statistics.

Same rationale as tests/test_eval_stats_models.py (where this class of
test caught q_cramers_v's zero-cell chi-square bug): the DuckDB oracle
proves both engines compute the same expression, not that the expression
is the statistic.  Each test here recomputes an earlier-round statistic
from its textbook definition in plain Python/numpy/pandas — hashlib md5
for the A/B assignment, pandas resampling for the daily series, Counter
entropies, numpy ddof=1 variance, brute-force CDF gaps — and requires
the engine to agree within its own 9-dp rounding."""

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


@pytest.fixture(scope="module")
def lineitem() -> pd.DataFrame:
    return pd.read_parquet(f"{SF_DIR}/lineitem.parquet")


@pytest.fixture(scope="module")
def orders() -> pd.DataFrame:
    return pd.read_parquet(f"{SF_DIR}/orders.parquet")


def test_ab_test_matches_hashlib_assignment(spark, events):
    conv = {}
    for uid, grp in events.groupby("user_id"):
        conv[uid] = int((grp.event_type == "purchase").sum() * 4 > len(grp))
    n = {"A": 0, "B": 0}
    c = {"A": 0, "B": 0}
    for uid, converted in conv.items():
        first_hex = hashlib.md5(str(int(uid)).encode()).hexdigest()[0]
        v = "A" if ord(first_hex) % 2 == 0 else "B"
        n[v] += 1
        c[v] += converted
    p = (c["A"] + c["B"]) / (n["A"] + n["B"])
    z = (c["A"] / n["A"] - c["B"] / n["B"]) / math.sqrt(
        p * (1 - p) * (1 / n["A"] + 1 / n["B"])
    )
    [r] = registry.queries()["q_ab_test"](spark, SF_DIR).collect()
    assert (r["n_a"], r["conv_a"], r["n_b"], r["conv_b"]) == (
        n["A"], c["A"], n["B"], c["B"],
    )
    assert abs(r["z_stat"] - z) < TOL


def test_autocorr_matches_pandas_lag1(spark, events):
    e = events.copy()
    e["d"] = e.ts.dt.floor("D")
    # daily totals in exact cents, matching the engine's decimal fold
    daily = (
        (e.value * 100).round().astype("int64").groupby([e.event_type, e.d]).sum()
    )
    rows = registry.queries()["q_autocorr"](spark, SF_DIR).collect()
    for r in rows:
        series = daily[r["event_type"]].sort_index().to_numpy(dtype=float)
        x, y = series[:-1], series[1:]
        assert r["n_pairs"] == len(x)
        want = float(np.corrcoef(x, y)[0, 1])
        assert abs(r["lag1_autocorr"] - want) < TOL


def test_benford_matches_direct_digits(spark, orders):
    o = orders[orders.o_totalprice >= 1]
    digits = o.o_totalprice.map(lambda v: int(str(int(math.floor(v)))[0]))
    counts = Counter(digits)
    total = sum(counts.values())
    rows = registry.queries()["q_benford"](spark, SF_DIR).collect()
    assert {r["d"]: r["n"] for r in rows} == dict(counts)
    for r in rows:
        assert abs(r["observed_p"] - counts[r["d"]] / total) < TOL
        assert abs(r["benford_p"] - math.log10(1 + 1 / r["d"])) < TOL


def test_behavior_entropy_matches_counter_model(spark, events):
    rows = registry.queries()["q_behavior_entropy"](spark, SF_DIR).collect()
    want = {}
    for uid, grp in events.groupby("user_id"):
        cnt = Counter(grp.event_type)
        nt = sum(cnt.values())
        h = -sum((v / nt) * math.log2(v / nt) for v in cnt.values())
        want[uid] = (len(cnt), nt, h)
    assert len(rows) == len(want)
    for r in rows:
        n_types, n_events, h = want[r["user_id"]]
        assert (r["n_types"], r["n_events"]) == (n_types, n_events)
        assert abs(r["type_entropy"] - h) < TOL


def test_agg_stats_variance_matches_numpy_ddof1(spark, lineitem):
    rows = registry.queries()["q_agg_stats"](spark, SF_DIR).collect()
    for r in rows:
        q = lineitem[lineitem.l_returnflag == r["l_returnflag"]].l_quantity
        assert r["n"] == len(q)
        assert float(r["min_qty"]) == float(q.min())
        assert float(r["max_qty"]) == float(q.max())
        want = float(np.var(q.to_numpy(dtype=float), ddof=1))
        assert abs(r["var_qty"] - want) < 1e-9 * max(1.0, want)


def test_outlier_iqr_matches_numpy_percentiles(spark, lineitem):
    rows = registry.queries()["q_outlier_iqr"](spark, SF_DIR).collect()
    # (l_orderkey, l_linenumber) is NOT unique in the synthetic fixture —
    # compare as multisets of full output rows
    want: Counter = Counter()
    for flag, grp in lineitem.groupby("l_returnflag"):
        x = grp.l_quantity.to_numpy(dtype=float)
        q1, q3 = np.percentile(x, [25, 75])  # linear interp = percentile_cont
        lo, hi = q1 - 1.5 * (q3 - q1), q3 + 1.5 * (q3 - q1)
        for _, row in grp.iterrows():
            want[
                (row.l_orderkey, row.l_linenumber, flag,
                 int(row.l_quantity > hi or row.l_quantity < lo))
            ] += 1
    got = Counter(
        (r["l_orderkey"], r["l_linenumber"], r["l_returnflag"], r["is_outlier"])
        for r in rows
    )
    assert got == want


def test_ks_drift_matches_bruteforce_cdf_gap(spark, events):
    split = pd.Timestamp("2024-01-16 00:00:00")
    e = events[events.value.notna()]
    a = np.sort(e[e.ts < split].value.to_numpy(dtype=float))
    b = np.sort(e[e.ts >= split].value.to_numpy(dtype=float))
    grid = np.unique(np.concatenate([a, b]))
    fa = np.searchsorted(a, grid, side="right") / len(a)
    fb = np.searchsorted(b, grid, side="right") / len(b)
    gaps = np.abs(fa - fb)
    d_want = float(gaps.max())
    at_want = float(grid[np.argmax(gaps == gaps.max())])
    [r] = registry.queries()["q_ks_drift"](spark, SF_DIR).collect()
    assert (r["n_a"], r["n_b"]) == (len(a), len(b))
    assert abs(r["ks_d"] - d_want) < TOL
    assert float(r["at_value"]) == at_want


def test_psi_drift_matches_direct_binning(spark, events):
    split = pd.Timestamp("2024-01-16 00:00:00")
    e = events[events.value.notna()]
    bins_a: Counter = Counter()
    bins_b: Counter = Counter()
    for ts, v in zip(e.ts, e.value):
        b = min(int(math.floor(v / 50.0)), 9)
        if 0 <= b <= 9:  # negative bins fall off the 0..9 spine
            (bins_a if ts < split else bins_b)[b] += 1
    na, nb = sum(bins_a.values()), sum(bins_b.values())
    psi = 0.0
    for b in range(10):
        pa = (2 * bins_a[b] + 1) / (2 * na + 10)
        pb = (2 * bins_b[b] + 1) / (2 * nb + 10)
        psi += (pa - pb) * math.log(pa / pb)
    [r] = registry.queries()["q_psi_drift"](spark, SF_DIR).collect()
    assert r["n_bins"] == 10
    assert abs(r["psi"] - psi) < TOL


def test_char_entropy_matches_counter_model(spark, docs):
    rows = registry.queries()["q_entropy"](spark, SF_DIR).collect()
    want = {}
    for doc_id, text in zip(docs.doc_id, docs.text):
        if text is None or len(text) == 0:
            continue
        cnt = Counter(text.lower())
        n = len(text)  # the engine's n: length of the ORIGINAL text
        h = -sum((c / n) * math.log2(c / n) for c in cnt.values())
        want[doc_id] = (len(cnt), h + 0.0)
    assert len(rows) == len(want)
    for r in rows:
        n_chars, h = want[r["doc_id"]]
        assert r["n_distinct_chars"] == n_chars
        assert abs(r["char_entropy"] - h) < TOL


# ---------------------------------------------------------------------------
# tranche 3: retrieval scores, windowed and skew statistics
# ---------------------------------------------------------------------------


def _toks(text) -> list[str]:
    if text is None:
        return []
    return [t for t in text.lower().split(" ") if t != ""]


def test_bm25_matches_python_okapi(spark, docs):
    K1, B, TERMS = 1.2, 0.75, ("vector", "hash", "scan")
    toks = {d: _toks(t) for d, t in zip(docs.doc_id, docs.text)}
    n = len(toks)
    avgdl = sum(len(w) for w in toks.values()) / n
    df = {t: sum(1 for w in toks.values() if t in w) for t in TERMS}
    scored = []
    for d, w in toks.items():
        tf = {t: w.count(t) for t in TERMS}
        if sum(tf.values()) == 0:
            continue
        score = sum(
            round(
                math.log(1 + (n - df[t] + 0.5) / (df[t] + 0.5))
                * (tf[t] * (K1 + 1))
                / (tf[t] + K1 * (1 - B + B * len(w) / avgdl)),
                12,
            )
            for t in TERMS
        )
        scored.append((d, sum(1 for t in TERMS if tf[t] > 0), score))
    scored.sort(key=lambda r: (-r[2], r[0]))
    want = [(d, m, i + 1) for i, (d, m, _) in enumerate(scored[:20])]
    rows = sorted(
        registry.queries()["q_bm25"](spark, SF_DIR).collect(),
        key=lambda r: r["rnk"],
    )
    assert [(r["doc_id"], r["n_terms_matched"], r["rnk"]) for r in rows] == want


def test_tfidf_matches_python_model(spark, docs):
    toks = {d: _toks(t) for d, t in zip(docs.doc_id, docs.text)}
    n = len(docs)  # N counts ALL docs, incl. NULL text (oracle spelling)
    df: Counter = Counter()
    for w in toks.values():
        df.update(set(w))
    want = set()
    for d, w in toks.items():
        if not w:
            continue
        tf = Counter(w)
        ranked = sorted(
            tf.items(), key=lambda kv: (-kv[1] * math.log(n / df[kv[0]]), kv[0])
        )
        for i, (term, _) in enumerate(ranked[:3]):
            want.add((d, term, i + 1))
    rows = registry.queries()["q_tfidf"](spark, SF_DIR).collect()
    assert {(r["doc_id"], r["term"], r["rnk"]) for r in rows} == want


def test_time_weighted_avg_matches_pandas_intervals(spark, events):
    want = {}
    for uid, grp in events.groupby("user_id"):
        g = grp.sort_values(["ts", "event_id"])
        # the engine differs WHOLE epoch seconds (cast timestamp→long
        # truncates sub-second parts before the subtraction); don't use
        # .astype("int64") — its unit follows the datetime64 resolution
        secs = g.ts.map(lambda t: int(t.timestamp()))
        durs = (secs.shift(-1) - secs)[:-1]
        vals = g.value[:-1]
        if len(durs) == 0 or durs.sum() <= 0:
            continue
        num = sum(
            round(v * d, 6) for v, d in zip(vals, durs) if not pd.isna(v)
        )
        want[uid] = (len(durs), num / durs.sum())
    rows = registry.queries()["q_time_weighted_avg"](spark, SF_DIR).collect()
    assert len(rows) == len(want)
    for r in rows:
        n_iv, twa = want[r["user_id"]]
        assert r["n_intervals"] == n_iv
        assert abs(r["twa"] - twa) < TOL


def test_vocab_growth_matches_first_seen_model(spark, docs):
    m = int(docs.doc_id.max()) + 1
    tok_dec: Counter = Counter()
    first_seen: dict = {}
    for d, t in zip(docs.doc_id, docs.text):
        w = _toks(t)
        tok_dec[int(d * 10.0 / m)] += len(w)
        for tkn in w:
            if tkn not in first_seen or d < first_seen[tkn]:
                first_seen[tkn] = d
    voc_dec: Counter = Counter(int(d * 10.0 / m) for d in first_seen.values())
    rows = sorted(
        registry.queries()["q_vocab_growth"](spark, SF_DIR).collect(),
        key=lambda r: r["decile"],
    )
    assert [r["decile"] for r in rows] == sorted(tok_dec)
    tcum = vcum = 0
    for r in rows:
        tcum += tok_dec[r["decile"]]
        vcum += voc_dec[r["decile"]]
        assert (r["tokens_cum"], r["vocab_cum"]) == (tcum, vcum)


def test_skew_report_matches_sorted_counts(spark, orders):
    counts = orders.groupby("o_custkey").size().sort_index()
    pairs = sorted(zip(counts.to_numpy(), counts.index))
    x = np.array([n for n, _ in pairs], dtype=float)
    k, tot = len(x), float(x.sum())
    i = np.arange(1, k + 1, dtype=float)
    gini = float(((2 * i - k - 1) * x).sum()) / (k * tot)
    median = x[int(math.floor((k + 1) / 2.0)) - 1]  # lower-middle, 1-indexed
    [r] = registry.queries()["q_skew_report"](spark, SF_DIR).collect()
    assert (r["n_keys"], r["n_rows"], r["max_n"]) == (k, int(tot), int(x.max()))
    assert r["median_n"] == int(median)
    assert abs(r["skew_ratio"] - x.max() / median) < TOL
    assert abs(r["gini"] - gini) < TOL


# ---------------------------------------------------------------------------
# tranche 4: the retrieval-pipeline chain (QLM → RRF → nDCG)
# ---------------------------------------------------------------------------

_TERMS = ("vector", "hash", "scan")


def _bm25_top20(docs) -> list[tuple]:
    """(doc_id, n_terms_matched, rnk) for the Okapi top-20 — model copy."""
    K1, B = 1.2, 0.75
    toks = {d: _toks(t) for d, t in zip(docs.doc_id, docs.text)}
    n = len(toks)
    avgdl = sum(len(w) for w in toks.values()) / n
    df = {t: sum(1 for w in toks.values() if t in w) for t in _TERMS}
    scored = []
    for d, w in toks.items():
        tf = {t: w.count(t) for t in _TERMS}
        if sum(tf.values()) == 0:
            continue
        score = sum(
            round(
                math.log(1 + (n - df[t] + 0.5) / (df[t] + 0.5))
                * (tf[t] * (K1 + 1))
                / (tf[t] + K1 * (1 - B + B * len(w) / avgdl)),
                12,
            )
            for t in _TERMS
        )
        scored.append((d, sum(1 for t in _TERMS if tf[t] > 0), score))
    scored.sort(key=lambda r: (-r[2], r[0]))
    return [(d, m, i + 1) for i, (d, m, _) in enumerate(scored[:20])]


def _qlm_top20(docs) -> list[tuple]:
    """(doc_id, n_terms_matched, rnk) for Dirichlet-smoothed QLM top-20."""
    MU = 100.0
    toks = {d: _toks(t) for d, t in zip(docs.doc_id, docs.text)}
    total = sum(len(w) for w in toks.values())
    cf = {t: sum(w.count(t) for w in toks.values()) for t in _TERMS}
    scored = []
    for d, w in toks.items():
        score = sum(
            round(
                math.log((w.count(t) + MU * (cf[t] / total)) / (len(w) + MU)),
                12,
            )
            for t in _TERMS
            if cf[t] > 0
        )
        scored.append((d, sum(1 for t in _TERMS if t in w), score))
    scored.sort(key=lambda r: (-r[2], r[0]))
    return [(d, m, i + 1) for i, (d, m, _) in enumerate(scored[:20])]


def test_qlm_matches_python_dirichlet(spark, docs):
    want = _qlm_top20(docs)
    rows = sorted(
        registry.queries()["q_qlm"](spark, SF_DIR).collect(),
        key=lambda r: r["rnk"],
    )
    assert [(r["doc_id"], r["n_terms_matched"], r["rnk"]) for r in rows] == want


def test_rrf_fusion_matches_python_combiner(spark, docs):
    K = 60
    bm = {d: r for d, _, r in _bm25_top20(docs)}
    qm = {d: r for d, _, r in _qlm_top20(docs)}
    fused = []
    for d in set(bm) | set(qm):
        rrf = (1.0 / (K + bm[d]) if d in bm else 0.0) + (
            1.0 / (K + qm[d]) if d in qm else 0.0
        )
        fused.append((d, bm.get(d), qm.get(d), rrf))
    fused.sort(key=lambda r: (-r[3], r[0]))
    want = [
        (d, b, q, i + 1) for i, (d, b, q, _) in enumerate(fused)
    ]
    rows = sorted(
        registry.queries()["q_rrf_fusion"](spark, SF_DIR).collect(),
        key=lambda r: r["fused_rnk"],
    )
    assert [
        (r["doc_id"], r["bm25_rnk"], r["qlm_rnk"], r["fused_rnk"]) for r in rows
    ] == want


def test_ndcg_matches_python_dcg(spark, docs):
    gains = {}
    for d, t in zip(docs.doc_id, docs.text):
        w = _toks(t)
        cov = sum(1 for term in _TERMS if term in w)
        gains[d] = {0: 0, 1: 1, 2: 3, 3: 7}[cov]
    dcg = sum(
        round(gains[d] / math.log2(rnk + 1), 12)
        for d, _, rnk in _bm25_top20(docs)
        if rnk <= 10
    )
    ideal = sorted(gains.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    idcg = sum(
        round(g / math.log2(pos + 2), 12) for pos, (_, g) in enumerate(ideal)
    )
    [r] = registry.queries()["q_ndcg_eval"](spark, SF_DIR).collect()
    cols = r.asDict()
    ndcg = [v for k, v in cols.items() if "ndcg" in k.lower()][0]
    assert abs(ndcg - dcg / idcg) < TOL


# ---------------------------------------------------------------------------
# tranche 5: LM surprisal, Markov transitions, Gopher rules
# ---------------------------------------------------------------------------


def test_lm_bigram_matches_counter_model(spark, docs):
    toks = {d: _toks(t) for d, t in zip(docs.doc_id, docs.text)}
    bg: Counter = Counter()
    for w in toks.values():
        bg.update(zip(w, w[1:]))
    uni: Counter = Counter()
    for (w1, _), c in bg.items():
        uni[w1] += c
    vocab = {w for pair in bg for w in pair}
    v = len(vocab)
    want = {}
    for d, w in toks.items():
        pairs = list(zip(w, w[1:]))
        if not pairs:
            continue
        # surprisal = log2(context + V) - log2(count + 1), add-one smoothed
        s = sum(
            round(math.log2(uni[p[0]] + v), 12) - round(math.log2(bg[p] + 1), 12)
            for p in pairs
        )
        want[d] = (len(pairs), s / len(pairs))
    rows = registry.queries()["q_lm_bigram"](spark, SF_DIR).collect()
    assert len(rows) == len(want)
    for r in rows:
        n_bg, avg = want[r["doc_id"]]
        assert r["n_bigrams"] == n_bg
        assert abs(r["avg_neg_log2_p"] - avg) < TOL


def test_markov_transitions_match_counter_model(spark, events):
    pairs: Counter = Counter()
    for _, grp in events.groupby("user_id"):
        seq = grp.sort_values(["ts", "event_id"]).event_type.tolist()
        pairs.update(zip(seq, seq[1:]))
    n_from: Counter = Counter()
    for (f, _), c in pairs.items():
        n_from[f] += c
    rows = registry.queries()["q_markov_transitions"](spark, SF_DIR).collect()
    assert len(rows) == len(pairs)
    for r in rows:
        key = (r["from_type"], r["to_type"])
        assert r["n"] == pairs[key]
        assert abs(r["p_next"] - pairs[key] / n_from[r["from_type"]]) < TOL
    # each from-row must be a probability distribution
    sums: Counter = Counter()
    for r in rows:
        sums[r["from_type"]] += r["p_next"]
    for s in sums.values():
        assert abs(s - 1.0) < 1e-6


def test_gopher_rules_match_python_ruleset(spark, docs):
    STOP = ("the", "a", "of", "and", "to", "in", "is")
    rows = registry.queries()["q_gopher_rules"](spark, SF_DIR).collect()
    assert len(rows) == len(docs)
    by_id = {r["doc_id"]: r for r in rows}
    for d, t in zip(docs.doc_id, docs.text):
        # gopher tokenizes WITHOUT case folding (mean word length and
        # stopword kinds are case-sensitive by design)
        w = [x for x in (t.split(" ") if t is not None else []) if x != ""]
        r = by_id[d]
        assert r["n_words"] == len(w)
        if len(w) == 0:
            assert r["mean_word_len"] is None and r["keep"] == 0
            continue
        mwl = sum(len(x) for x in w) / len(w)
        kinds = len({x for x in w if x in STOP})
        assert abs(r["mean_word_len"] - mwl) < TOL
        assert r["n_stopword_kinds"] == kinds
        keep = int(20 <= len(w) <= 100_000 and 2.0 <= mwl <= 10.0 and kinds >= 2)
        assert r["keep"] == keep


# ---------------------------------------------------------------------------
# tranche 6: hashed-feature DSIR, CCNet buckets, z-score
# ---------------------------------------------------------------------------


def test_dsir_weights_match_hashlib_model(spark, docs):
    B, TARGET = 64, {"src1", "src2", "src3"}

    def bucket(tok: str) -> int:
        return int(hashlib.md5(tok.encode()).hexdigest()[:2], 16) % B

    cr: Counter = Counter()
    ct: Counter = Counter()
    per_doc: dict = {}
    for d, t, src in zip(docs.doc_id, docs.text, docs.source):
        toks = [bucket(x) for x in _toks(t)]
        per_doc[d] = toks
        cr.update(toks)
        if src in TARGET:
            ct.update(toks)
    nr, nt = sum(cr.values()), sum(ct.values())
    rows = registry.queries()["q_dsir_weights"](spark, SF_DIR).collect()
    want_ids = {d for d, toks in per_doc.items() if toks}
    assert {r["doc_id"] for r in rows} == want_ids
    for r in rows:
        toks = per_doc[r["doc_id"]]
        assert r["n_tokens"] == len(toks)
        s = sum(
            round(math.log2(ct[b] + 1), 12) - round(math.log2(cr[b] + 1), 12)
            for b in toks
        )
        want = s / len(toks) + math.log2(nr + B) - math.log2(nt + B)
        assert abs(r["avg_log2_ratio"] - want) < TOL


def test_ccnet_bucket_matches_ntile_model(spark, docs):
    # CASE-SENSITIVE tokens by design (string_split(text), no lower)
    toks = {
        d: [x for x in (t.split(" ") if t is not None else []) if x != ""]
        for d, t in zip(docs.doc_id, docs.text)
    }
    freq: Counter = Counter()
    for w in toks.values():
        freq.update(w)
    total = sum(freq.values())
    score = {}
    for d, w in toks.items():
        if not w:
            continue
        s = sum(round(math.log2(freq[x]), 12) for x in w)
        score[d] = round(math.log2(total) - s / len(w), 9)
    langs = dict(zip(docs.doc_id, docs.lang))
    want = {}
    by_lang: dict = {}
    for d in score:
        by_lang.setdefault(langs[d], []).append(d)
    for lang, ids in by_lang.items():
        ids.sort(key=lambda d: (score[d], d))
        n = len(ids)
        sizes = [n // 3 + (1 if i < n % 3 else 0) for i in range(3)]
        pos = 0
        for tile, sz in zip(("head", "middle", "tail"), sizes):
            for d in ids[pos : pos + sz]:
                want[d] = tile
            pos += sz
    rows = registry.queries()["q_ccnet_bucket"](spark, SF_DIR).collect()
    assert len(rows) == len(want)
    for r in rows:
        assert abs(r["score"] - score[r["doc_id"]]) < TOL
        assert r["bucket"] == want[r["doc_id"]]


def test_zscore_matches_numpy_standardization(spark, lineitem):
    rows = registry.queries()["q_zscore"](spark, SF_DIR).collect()
    stats = {}
    for flag, grp in lineitem.groupby("l_returnflag"):
        x = grp.l_quantity.to_numpy(dtype=float)
        stats[flag] = (x.mean(), float(np.std(x, ddof=1)))
    want: Counter = Counter()
    for _, row in lineitem.iterrows():
        mu, sd = stats[row.l_returnflag]
        want[
            (row.l_orderkey, row.l_linenumber, row.l_returnflag,
             round((row.l_quantity - mu) / sd, 6))
        ] += 1
    got = Counter(
        (r["l_orderkey"], r["l_linenumber"], r["l_returnflag"],
         round(r["qty_z"], 6))
        for r in rows
    )
    assert got == want


# ---------------------------------------------------------------------------
# tranche 7: the deterministic Poisson bootstrap, replicated end to end
# ---------------------------------------------------------------------------

_POIS_CDF = (
    0.36787944117144233, 0.7357588823428847, 0.9196986029286058,
    0.9810118431238463, 0.9963401531726563, 0.9994058151824183,
)


def test_bootstrap_ci_matches_hashlib_poisson(spark, events):
    """Replicates the ENTIRE Chamandy pipeline independently: md5-derived
    uniforms (8 per digest), CDF-threshold Poisson weights, weighted
    replicate means, and the trim-aware percentile rule — so the
    engine's resample-by-weight algebra is checked against a literal
    per-replicate resimulation."""
    e = events[events.value.notna()]
    reps: dict = {}
    for et, eid, v in zip(e.event_type, e.event_id, e.value):
        for r in range(32):
            h = hashlib.md5(f"{int(eid)}:{r // 8}".encode()).hexdigest()
            slot = r % 8
            u = int(h[slot * 4 : slot * 4 + 4], 16) / 65536.0
            w = 6
            for k, c in enumerate(_POIS_CDF):
                if u < c:
                    w = k
                    break
            num, den = reps.setdefault((et, r), [0.0, 0])
            reps[(et, r)] = [num + w * v, den + w]
    means: dict = {}
    for (et, r), (num, den) in reps.items():
        if den > 0:
            means.setdefault(et, []).append(num / den)
    rows = registry.queries()["q_bootstrap_ci"](spark, SF_DIR).collect()
    for r in rows:
        arr = sorted(means[r["event_type"]])
        n = len(arr)
        assert r["n_replicates"] == n
        lo, hi = (arr[1], arr[n - 2]) if n >= 4 else (arr[0], arr[n - 1])
        grp = e[e.event_type == r["event_type"]].value
        assert r["n_rows"] == len(grp)
        assert abs(r["mean"] - grp.mean()) < TOL
        assert abs(r["ci_lo"] - lo) < TOL
        assert abs(r["ci_hi"] - hi) < TOL
        assert r["ci_lo"] <= r["ci_hi"] + 1e-12  # interval ordering invariant


# ---------------------------------------------------------------------------
# tranche 7b: split-balance chi-square (the zero-cell class, second find)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def embeddings() -> pd.DataFrame:
    return pd.read_parquet(f"{SF_DIR}/embeddings.parquet")


def _split_side(vec_id) -> str:
    return (
        "a"
        if int(hashlib.md5(str(int(vec_id)).encode()).hexdigest()[0], 16) % 2 == 0
        else "b"
    )


def _split_balance_model(pairs) -> tuple:
    """(dof, n, chi2) over the FULL labels x sides grid from (label, side)."""
    cells: Counter = Counter(pairs)
    labels = {l for l, _ in cells}
    sides = {s for _, s in cells}
    n = sum(cells.values())
    row = Counter()
    col = Counter()
    for (l, s), o in cells.items():
        row[l] += o
        col[s] += o
    chi2 = 0.0
    for l in labels:
        for s in sides:
            e = row[l] * col[s] / n
            chi2 += round((cells[(l, s)] - e) ** 2 / e, 12)
    # dof counts label GROUPS — a NULL label forms a real group whose
    # cells the spine folds (ADVICE r7): len(labels) includes None
    return len(labels) - 1, n, chi2


def test_split_balance_matches_numpy_contingency(spark, embeddings):
    pairs = [
        (lab, _split_side(vid))
        for vid, lab in zip(embeddings.vec_id, embeddings.label)
    ]
    dof, n, chi2 = _split_balance_model(pairs)
    [r] = registry.queries()["q_split_balance"](spark, SF_DIR).collect()
    assert (r["dof"], r["n_rows"]) == (dof, n)
    assert abs(r["chi2"] - chi2) < TOL


def test_split_balance_counts_null_label_group_in_dof(spark, tmp_path):
    """Regression for ADVICE r7 item 3: the spine deliberately folds the
    NULL-label row's cells into chi2 (eqNullSafe / IS NOT DISTINCT FROM),
    so dof must count that group too — COUNT(DISTINCT label) silently
    dropped it, understating dof by 1 whenever NULL labels exist."""
    import os
    import pyarrow as pa
    import pyarrow.parquet as pq

    for f in os.listdir(SF_DIR):
        os.symlink(os.path.join(SF_DIR, f), os.path.join(tmp_path, f))
    os.unlink(os.path.join(tmp_path, "embeddings.parquet"))
    vec_ids = list(range(24))
    labels = [0] * 10 + [1] * 8 + [None] * 6
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(vec_ids, pa.int64()),
                "embedding": pa.array(
                    [[1.0, 0.0, 0.0, 0.0]] * len(vec_ids),
                    pa.list_(pa.float32()),
                ),
                "label": pa.array(labels, pa.int32()),
            }
        ),
        os.path.join(tmp_path, "embeddings.parquet"),
    )
    pairs = [(l, _split_side(v)) for v, l in zip(vec_ids, labels)]
    dof, n, chi2 = _split_balance_model(pairs)
    assert dof == 2  # three label groups {0, 1, NULL} minus one
    [r] = registry.queries()["q_split_balance"](spark, str(tmp_path)).collect()
    assert (r["dof"], r["n_rows"]) == (dof, n)
    assert abs(r["chi2"] - chi2) < TOL


def test_split_balance_includes_one_sided_labels(spark, tmp_path):
    """Regression for the zero-cell class (found via q_cramers_v's
    triple-entry test, then audited here): a label whose vectors ALL land
    on one split side must still contribute its zero cell's
    (0-e)^2/e = e term.  The crafted corpus pins label 9 entirely to side
    'a' (vec_ids chosen by md5 parity)."""
    import os
    import pyarrow as pa
    import pyarrow.parquet as pq

    for f in os.listdir(SF_DIR):
        os.symlink(os.path.join(SF_DIR, f), os.path.join(tmp_path, f))
    os.unlink(os.path.join(tmp_path, "embeddings.parquet"))
    a_ids = [i for i in range(200) if _split_side(i) == "a"]
    b_ids = [i for i in range(200) if _split_side(i) == "b"]
    # label 0: balanced across sides; label 9: side 'a' ONLY
    vec_ids = a_ids[:8] + b_ids[:8] + a_ids[8:14]
    labels = [0] * 16 + [9] * 6
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(vec_ids, pa.int64()),
                "embedding": pa.array(
                    [[1.0, 0.0, 0.0, 0.0]] * len(vec_ids),
                    pa.list_(pa.float32()),
                ),
                "label": pa.array(labels, pa.int32()),
            }
        ),
        os.path.join(tmp_path, "embeddings.parquet"),
    )
    pairs = [(l, _split_side(v)) for v, l in zip(vec_ids, labels)]
    dof, n, chi2 = _split_balance_model(pairs)
    assert any(
        (l, "b") not in Counter(pairs) for l in {9}
    )  # the crafted corpus really is one-sided
    [r] = registry.queries()["q_split_balance"](spark, str(tmp_path)).collect()
    assert (r["dof"], r["n_rows"]) == (dof, n)
    assert abs(r["chi2"] - chi2) < TOL


# ---------------------------------------------------------------------------
# tranche 8: PMI collocations, rolling median, seasonal profile, anomalies
# ---------------------------------------------------------------------------


def test_collocations_match_counter_pmi(spark, docs):
    uni: Counter = Counter()
    big: Counter = Counter()
    for _, t in zip(docs.doc_id, docs.text):
        w = _toks(t)
        uni.update(w)
        big.update(zip(w, w[1:]))
    n, b = sum(uni.values()), sum(big.values())
    scored = []
    for (w1, w2), c in big.items():
        if c < 5:
            continue
        pmi = round(
            round(math.log2(c), 12)
            - round(math.log2(b), 12)
            - round(math.log2(uni[w1]), 12)
            - round(math.log2(uni[w2]), 12)
            + 2 * round(math.log2(n), 12),
            9,
        )
        scored.append((w1, w2, c, pmi))
    scored.sort(key=lambda r: (-r[3], r[0], r[1]))
    want = scored[:20]
    rows = registry.queries()["q_collocations"](spark, SF_DIR).collect()
    assert len(rows) == len(want)
    got = sorted(
        [(r["w1"], r["w2"], r["n_pair"], r["pmi"]) for r in rows],
        key=lambda r: (-r[3], r[0], r[1]),
    )
    for g, w in zip(got, want):
        assert g[:3] == w[:3]
        assert abs(g[3] - w[3]) < TOL


def test_rolling_median_matches_python_frames(spark, events):
    rows = {r["event_id"]: r for r in
            registry.queries()["q_rolling_median"](spark, SF_DIR).collect()}
    assert len(rows) == len(events)
    for _, grp in events.groupby("user_id"):
        g = grp.sort_values(["ts", "event_id"]).reset_index()
        for i in range(len(g)):
            frame = [
                v for v in g.value[max(0, i - 4) : i + 1] if not pd.isna(v)
            ]
            frame.sort()
            n = len(frame)
            if n == 0:
                want = None
            elif n % 2 == 1:
                want = frame[n // 2]
            else:
                want = (frame[n // 2 - 1] + frame[n // 2]) / 2.0
            got = rows[g.event_id[i]]["med5"]
            if want is None:
                assert got is None
            else:
                assert abs(got - want) < TOL


def test_seasonal_baseline_matches_profile_join(spark, events):
    prof: dict = {}
    for (et, hr), grp in events.groupby([events.event_type, events.ts.dt.hour]):
        prof[(et, hr)] = grp.value.sum() / len(grp)  # SUM skips NULL, n counts all
    rows = registry.queries()["q_seasonal_baseline"](spark, SF_DIR).collect()
    assert len(rows) == len(events)
    vals = dict(zip(events.event_id, events.value))
    for r in rows:
        want = prof[(r["event_type"], r["hr"])]
        assert abs(r["expected"] - want) < TOL
        v = vals[r["event_id"]]
        if pd.isna(v):
            assert r["residual"] is None
        else:
            assert abs(r["residual"] - (v - want)) < 1e-5


def test_top_anomalies_match_population_zscores(spark, events):
    stats: dict = {}
    for (et, hr), grp in events.groupby([events.event_type, events.ts.dt.hour]):
        n = float(len(grp))  # counts NULL-value rows too (COUNT(*))
        sx = float(grp.value.sum())
        sxx = float((grp.value**2).sum())
        if n >= 2 and n * sxx > sx * sx:
            mu = sx / n
            sd = math.sqrt((n * sxx - sx * sx) / (n * n))
            stats[(et, hr)] = (mu, sd)
    scored = []
    for eid, et, ts, v in zip(
        events.event_id, events.event_type, events.ts, events.value
    ):
        key = (et, ts.hour)
        if key in stats and not pd.isna(v):
            mu, sd = stats[key]
            scored.append((eid, round((v - mu) / sd, 9)))
    scored.sort(key=lambda r: (-abs(r[1]), r[0]))
    want = {eid: (z, i + 1) for i, (eid, z) in enumerate(scored[:20])}
    rows = registry.queries()["q_top_anomalies"](spark, SF_DIR).collect()
    assert len(rows) == len(want)
    for r in rows:
        z, rnk = want[r["event_id"]]
        assert r["rnk"] == rnk
        assert abs(r["z"] - z) < TOL


# ---------------------------------------------------------------------------
# tranche 9 (round 8, VERDICT r7 item 2): Pearson corr, PageRank, trimmed
# mean, EWMA recursion, interpolated percentiles
# ---------------------------------------------------------------------------


def test_corr_matches_numpy_pearson(spark, lineitem):
    rows = registry.queries()["q_corr"](spark, SF_DIR).collect()
    got = {r["l_returnflag"]: r["qty_price_corr"] for r in rows}
    for flag, grp in lineitem.groupby("l_returnflag"):
        x = grp.l_quantity.to_numpy(dtype=float)
        y = grp.l_extendedprice.to_numpy(dtype=float) / 1000.0
        want = np.corrcoef(x, y)[0, 1]
        assert abs(got[flag] - want) < TOL


def test_pagerank_matches_python_power_iteration(spark, events):
    e = events.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
    edges: Counter = Counter()
    for _, grp in e.groupby("user_id", sort=False):
        ets = list(grp.event_type)
        for a, b in zip(ets, ets[1:]):
            edges[(a, b)] += 1
    outs: Counter = Counter()
    for (a, _), c in edges.items():
        outs[a] += c
    nodes = sorted(set(events.event_type))
    rank = {n: 0.2 for n in nodes}
    for _ in range(5):
        incoming = {n: 0.0 for n in nodes}
        for (a, b), c in edges.items():
            incoming[b] += rank[a] * (c / outs[a])
        rank = {n: 0.03 + 0.85 * incoming[n] for n in nodes}
    rows = registry.queries()["q_pagerank"](spark, SF_DIR).collect()
    assert len(rows) == len(nodes)
    for r in rows:
        assert abs(r["pagerank"] - rank[r["node"]]) < 1e-5


def test_trimmed_mean_matches_numpy_sorted_trim(spark, events):
    rows = registry.queries()["q_trimmed_mean"](spark, SF_DIR).collect()
    got = {r["event_type"]: (r["n_kept"], r["trimmed_mean"]) for r in rows}
    ev = events[events.value.notna()]
    for et, grp in ev.groupby("event_type"):
        # trimming drops n//10 ranks off each end; tied values make the
        # event_id tiebreak irrelevant to the kept-value MULTISET
        v = np.sort(grp.value.to_numpy(dtype=float))
        k = len(v) // 10
        kept = v[k : len(v) - k]
        n_kept, tm = got[et]
        assert n_kept == len(kept)
        assert abs(tm - kept.mean()) < TOL


def test_ewma_matches_explicit_recursion(spark, events):
    """Plain-Python EWMA_t = 0.2*x_t + 0.8*EWMA_{t-1} walk, NULLs skipped
    (they emit the carried state, NULL while unseeded) — independent of
    both the pandas-ewm kernel and the DuckDB recursive CTE."""
    rows = registry.queries()["q_ewma"](spark, SF_DIR).collect()
    got = {(r["user_id"], r["event_id"]): r["ewma"] for r in rows}
    e = events.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
    n_checked = 0
    for uid, grp in e.groupby("user_id", sort=False):
        state = None
        for eid, v in zip(grp.event_id, grp.value):
            if not pd.isna(v):
                state = v if state is None else 0.2 * v + 0.8 * state
            want = None if state is None else round(state, 9)
            have = got[(uid, eid)]
            if want is None:
                assert have is None
            else:
                assert abs(have - want) < TOL
            n_checked += 1
    assert n_checked == len(rows)


def test_percentile_cont_matches_numpy(spark, lineitem):
    rows = registry.queries()["q_percentile_cont"](spark, SF_DIR).collect()
    got = {r["l_returnflag"]: (r["q1"], r["q2"], r["q3"]) for r in rows}
    for flag, grp in lineitem.groupby("l_returnflag"):
        x = grp.l_quantity.to_numpy(dtype=float)
        want = np.percentile(x, [25, 50, 75])  # linear interpolation
        for g, w in zip(got[flag], want):
            assert abs(g - w) < TOL


# ---------------------------------------------------------------------------
# tranche 11 (round 8): text-statistics family — lang-ID heuristic, quality
# ratios, repetition, fertility, hapax, frequency spectrum, unigram surprisal
# ---------------------------------------------------------------------------

_SW = {"the", "a", "and", "of", "to", "in", "is", "on", "for", "with"}


def test_lang_id_matches_python_stopword_rule(spark, docs):
    rows = registry.queries()["q_lang_id"](spark, SF_DIR).collect()
    got = {r["doc_id"]: (r["lang_label"], r["lang_pred"]) for r in rows}
    assert len(got) == len(docs)
    for did, lang, text in zip(docs.doc_id, docs.lang, docs.text):
        if text is None:
            want = "unk"
        else:
            hits = sum(1 for t in text.lower().split(" ") if t in _SW)
            want = "en" if hits * 20 >= len(text.split(" ")) else "unk"
        assert got[did] == (lang, want)


def test_quality_score_matches_python_ratios(spark, docs):
    import re

    rows = registry.queries()["q_quality_score"](spark, SF_DIR).collect()
    got = {
        r["doc_id"]: (r["alpha_ratio"], r["stopword_ratio"], r["mean_token_len"])
        for r in rows
    }
    d = docs[docs.text.notna() & (docs.text.str.len() > 0)]
    assert len(got) == len(d)
    for did, text in zip(d.doc_id, d.text):
        alpha = len(re.sub("[^A-Za-z]", "", text)) / len(text)
        toks = text.split(" ")
        sw = sum(1 for t in text.lower().split(" ") if t in _SW) / len(toks)
        mtl = len(text) / len(toks)
        a, s, m = got[did]
        assert abs(a - alpha) < TOL and abs(s - sw) < TOL and abs(m - mtl) < TOL


def test_repetition_matches_python_bigram_counts(spark, docs):
    rows = registry.queries()["q_repetition"](spark, SF_DIR).collect()
    got = {r["doc_id"]: (r["n_bigrams"], r["dup_bigram_frac"]) for r in rows}
    n_checked = 0
    for did, text in zip(docs.doc_id, docs.text):
        if text is None:
            continue
        toks = [t for t in text.lower().split(" ") if t != ""]
        if len(toks) < 2:
            continue
        bigrams = [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        nb, frac = got[did]
        assert nb == len(bigrams)
        assert abs(frac - (1.0 - len(set(bigrams)) / len(bigrams))) < TOL
        n_checked += 1
    assert n_checked == len(got)


def test_tokenizer_fertility_matches_python_totals(spark, docs):
    rows = registry.queries()["q_tokenizer_fertility"](spark, SF_DIR).collect()
    got = {r["lang"]: r for r in rows}
    for lang, grp in docs.groupby("lang", dropna=False):
        key = None if pd.isna(lang) else lang
        toks = sum(
            len([t for t in txt.split(" ") if t != ""])
            for txt in grp.text if txt is not None
        )
        chars = int(sum(len(t) for t in grp.text if t is not None))
        r = got[key]
        assert (r["n_docs"], r["n_tokens"], r["n_chars"]) == (len(grp), toks, chars)
        if toks:
            assert abs(r["chars_per_token"] - chars / toks) < TOL


def test_hapax_report_matches_counter_model(spark, docs):
    rows = registry.queries()["q_hapax_report"](spark, SF_DIR).collect()
    got = {r["doc_id"]: (r["n_tokens"], r["n_hapax"], r["hapax_frac"]) for r in rows}
    n_checked = 0
    for did, text in zip(docs.doc_id, docs.text):
        if text is None:
            continue
        cnt = Counter(t for t in text.lower().split(" ") if t != "")
        if not cnt:
            continue
        n = sum(cnt.values())
        hap = sum(1 for c in cnt.values() if c == 1)
        nt, nh, frac = got[did]
        assert (nt, nh) == (n, hap)
        assert abs(frac - hap / n) < TOL
        n_checked += 1
    assert n_checked == len(got)


def test_freq_spectrum_matches_counter_of_counts(spark, docs):
    corpus: Counter = Counter()
    for text in docs.text:
        if text is not None:
            corpus.update(t for t in text.lower().split(" ") if t != "")
    spectrum = Counter(corpus.values())
    rows = registry.queries()["q_freq_spectrum"](spark, SF_DIR).collect()
    assert {r["freq"]: r["n_types"] for r in rows} == dict(spectrum)


def test_lm_score_matches_python_surprisal(spark, docs):
    corpus: Counter = Counter()
    per_doc: dict = {}
    for did, text in zip(docs.doc_id, docs.text):
        if text is None:
            continue
        toks = [t for t in text.split(" ") if t != ""]
        if toks:
            per_doc[did] = toks
            corpus.update(toks)
    total = sum(corpus.values())
    rows = registry.queries()["q_lm_score"](spark, SF_DIR).collect()
    assert len(rows) == len(per_doc)
    for r in rows:
        toks = per_doc[r["doc_id"]]
        want = math.log2(total) - sum(
            round(math.log2(corpus[t]), 12) for t in toks
        ) / len(toks)
        assert r["n_tokens"] == len(toks)
        assert abs(r["avg_neg_log2_p"] - want) < TOL
