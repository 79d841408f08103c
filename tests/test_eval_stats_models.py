"""Triple-entry verification for the eval_stats statistics.

The DuckDB oracles prove the Spark plan and the SQL compute the SAME
expression — but an identically-misspelled formula passes that check on
both engines (exactly how the rank-biserial factor-2 bug slipped to the
sf0.001 parity stage before being caught).  These tests recompute each
statistic a THIRD way, from textbook definitions in plain Python/numpy
over the pandas-loaded fixture — brute-force pairwise counts for U,
pandas average ranks for rho, an actual sort for Gini, Counter-based
distributions for JSD — and require the engine to agree within the 9-dp
rounding the engine applies.  A formula error now needs the same mistake
in three independent spellings."""

from __future__ import annotations

import math
from collections import Counter

import numpy as np
import pandas as pd
import pytest

from bifrost_spark import registry
from bifrost_spark.queries.llm_text import STOPWORDS
from conftest import SF_DIR

TOL = 1e-6  # engine rounds compared doubles at 9 dp; reference fp error ≪


@pytest.fixture(scope="module")
def docs() -> pd.DataFrame:
    return pd.read_parquet(f"{SF_DIR}/documents.parquet")


@pytest.fixture(scope="module")
def events() -> pd.DataFrame:
    return pd.read_parquet(f"{SF_DIR}/events.parquet")


def _row(spark, name) -> dict:
    [r] = registry.queries()[name](spark, SF_DIR).collect()
    return r.asDict()


def _toks(text: str) -> list[str]:
    return [t for t in text.lower().split(" ") if t != ""]


def _is_en(lang) -> bool:
    return lang == "en"  # NULL → other (null-safe equality in the engine)


# ---------------------------------------------------------------------------
# classifiers shared by mcnemar / cochran_q (replicated from the engine spec)
# ---------------------------------------------------------------------------


def _pred_stopword(text: str) -> bool:
    toks_lower = text.lower().split(" ")  # unfiltered, matching F.split
    sw = sum(t in STOPWORDS for t in toks_lower)
    return sw * 20 >= len(text.split(" "))


def _pred_the(text: str) -> bool:
    return "the" in text.lower()


def test_mann_whitney_matches_bruteforce_pairs(spark, docs):
    d = docs[docs.text.notna() & docs.n_chars.notna()]
    a = d[d.lang.map(_is_en)].n_chars.to_numpy()
    b = d[~d.lang.map(_is_en)].n_chars.to_numpy()
    # brute-force U: pairwise greater-than counts, halves for ties —
    # the DEFINITION, no rank arithmetic anywhere
    u1 = float(
        (a[:, None] > b[None, :]).sum() + 0.5 * (a[:, None] == b[None, :]).sum()
    )
    n1, n2 = len(a), len(b)
    # group-1 convention (ADVICE r7): positive when group 1 ranks HIGHER
    r_rb = 2.0 * u1 / (n1 * n2) - 1.0
    # z via pandas average ranks (independent of the engine's 2x-rank fold)
    pooled = pd.Series(np.concatenate([a, b]))
    ranks = pooled.rank(method="average")
    r1 = float(ranks[: n1].sum())
    assert abs((r1 - n1 * (n1 + 1) / 2.0) - u1) < 1e-9  # definitions agree
    n = n1 + n2
    tie_counts = pooled.value_counts().to_numpy()
    tie_term = float((tie_counts**3 - tie_counts).sum())
    sig2 = (n1 * n2 / 12.0) * ((n + 1) - tie_term / (n * (n - 1)))
    z = (u1 - n1 * n2 / 2.0) / math.sqrt(sig2)

    got = _row(spark, "q_mann_whitney")
    assert got["n1"] == n1 and got["n2"] == n2
    assert abs(got["u1"] - u1) < TOL
    assert abs(got["z"] - z) < TOL
    assert abs(got["r_rb"] - r_rb) < TOL


def test_spearman_matches_pandas_ranks(spark, docs):
    d = docs[docs.text.notna() & docs.n_chars.notna()]
    x = d.n_chars.astype(float)
    y = d.text.map(lambda t: float(len(_toks(t))))
    rho = float(np.corrcoef(x.rank(method="average"), y.rank(method="average"))[0, 1])
    got = _row(spark, "q_spearman_corr")
    assert got["n"] == len(d)
    assert abs(got["rho"] - rho) < TOL


def test_gini_matches_actual_sort(spark, events):
    e = events[events.user_id.notna() & events.value.notna()]
    s = (
        (e.value * 100).round().astype("int64").groupby(e.user_id).sum().sort_values()
    )
    x = s.to_numpy(dtype=float)
    n, total = len(x), float(x.sum())
    i = np.arange(1, n + 1, dtype=float)
    gini = (2.0 * float((i * x).sum()) - (n + 1) * total) / (n * total)
    got = _row(spark, "q_gini_users")
    assert got["n"] == n and got["total_cents"] == int(total)
    assert abs(got["gini"] - gini) < TOL


def test_mcnemar_matches_direct_counts(spark, docs):
    d = docs[docs.text.notna()]
    truth = d.lang.map(_is_en)
    pa = d.text.map(_pred_stopword)
    pb = d.text.map(_pred_the)
    b_disc = int(((pa == truth) & (pb != truth)).sum())
    c_disc = int(((pa != truth) & (pb == truth)).sum())
    corr = max(abs(b_disc - c_disc) - 1, 0)
    chi2 = corr * corr / (b_disc + c_disc)
    got = _row(spark, "q_mcnemar")
    assert got["b_disc"] == b_disc and got["c_disc"] == c_disc
    assert abs(got["chi2_cc"] - chi2) < TOL


def test_cochran_q_matches_textbook_form(spark, docs):
    d = docs[docs.text.notna()]
    m = np.column_stack(
        [
            d.lang.map(_is_en).to_numpy(int),
            d.text.map(_pred_stopword).to_numpy(int),
            d.text.map(_pred_the).to_numpy(int),
        ]
    )
    k = 3
    col = m.sum(axis=0).astype(float)
    row = m.sum(axis=1).astype(float)
    t = col.sum()
    # the textbook spelling with the explicit grand-mean deviation —
    # algebraically equal to the engine's integer form, spelled unlike it
    q = (k * (k - 1) * ((col - t / k) ** 2).sum()) / (k * t - (row**2).sum())
    got = _row(spark, "q_cochran_q")
    assert [got["c1"], got["c2"], got["c3"]] == [int(c) for c in col]
    assert abs(got["q_stat"] - q) < TOL


def test_js_divergence_matches_counter_model(spark, docs):
    d = docs[docs.text.notna()]
    ca: Counter = Counter()
    cb: Counter = Counter()
    for text, lang in zip(d.text, d.lang):
        (ca if _is_en(lang) else cb).update(_toks(text))
    na, nb = sum(ca.values()), sum(cb.values())
    jsd = 0.0
    for tkn in set(ca) | set(cb):
        p, q = ca[tkn] / na, cb[tkn] / nb
        mm = (p + q) / 2.0
        if p > 0:
            jsd += 0.5 * p * math.log2(p / mm)
        if q > 0:
            jsd += 0.5 * q * math.log2(q / mm)
    got = _row(spark, "q_js_divergence")
    assert got["n_tokens_en"] == na and got["n_tokens_other"] == nb
    assert got["n_types"] == len(set(ca) | set(cb))
    assert abs(got["jsd"] - jsd) < TOL
    assert 0.0 <= got["jsd"] <= 1.0  # JSD in bits is bounded by 1


def test_chi2_keywords_matches_python_model(spark, docs):
    d = docs[docs.text.notna()]
    en = d.lang.map(_is_en).to_numpy()
    ne, no = int(en.sum()), int((~en).sum())
    dfa: Counter = Counter()
    dfb: Counter = Counter()
    for text, e in zip(d.text, en):
        (dfa if e else dfb).update(set(_toks(text)))
    scored = []
    for tkn in set(dfa) | set(dfb):
        a, b = dfa[tkn], dfb[tkn]
        if a + b < 5:
            continue
        c, dd = ne - a, no - b
        if c + dd == 0:
            continue
        n = a + b + c + dd
        delta = a * dd - b * c
        chi2 = round(n * delta * delta / ((a + b) * (c + dd) * ne * no), 9)
        scored.append((tkn, a, b, chi2))
    scored.sort(key=lambda r: (-r[3], r[0]))
    want = scored[:30]
    rows = sorted(
        registry.queries()["q_chi2_keywords"](spark, SF_DIR).collect(),
        key=lambda r: r["rnk"],
    )
    assert len(rows) == len(want)
    for r, (tkn, a, b, chi2) in zip(rows, want):
        assert (r["token"], r["df_en"], r["df_other"]) == (tkn, a, b)
        assert abs(r["chi2"] - chi2) < TOL


def test_bh_fdr_matches_numpy_stepup(spark, events):
    rows = registry.queries()["q_bh_fdr"](spark, SF_DIR).collect()
    # independent recomputation of the chi-square from pandas counts
    e = events[events.user_id.notna()]
    arms = (e.user_id % 16).astype(int)
    cat = e.event_type.map(
        lambda t: 2 if t == "purchase" else (1 if t == "click" else 0)
    )
    tab = pd.crosstab(arms, cat).astype(float)
    totals = tab.sum(axis=0)
    grand = float(totals.sum())
    for r in rows:
        obs = tab.loc[r["variant"]]
        nv = float(obs.sum())
        chi2 = sum(
            (obs[j] - nv * totals[j] / grand) ** 2 / (nv * totals[j] / grand)
            for j in tab.columns
            if totals[j] > 0
        )
        assert r["n_trials"] == int(nv)
        assert abs(r["chi2"] - chi2) < TOL
        assert abs(r["p_raw"] - math.exp(-round(chi2, 9) / 2.0)) < TOL
    # BH step-up recomputed from the raw p-values with numpy cummin
    rows.sort(key=lambda r: (r["p_raw"], r["variant"]))
    m = len(rows)
    p = np.array([r["p_raw"] for r in rows])
    adj = np.minimum(
        np.minimum.accumulate((p * m / np.arange(1, m + 1))[::-1])[::-1], 1.0
    )
    for r, want in zip(rows, adj):
        assert abs(r["p_adj"] - want) < TOL
    # and monotonicity, the defining step-up property
    assert all(x <= y + 1e-12 for x, y in zip(adj, adj[1:]))


def test_cramers_v_matches_numpy_contingency(spark, docs):
    d = docs[docs.source.notna() & docs.lang.notna()]
    tab = pd.crosstab(d.source, d.lang).to_numpy(dtype=float)
    n = tab.sum()
    exp = np.outer(tab.sum(axis=1), tab.sum(axis=0)) / n
    chi2 = float(((tab - exp) ** 2 / exp)[exp > 0].sum())
    v = math.sqrt(chi2 / (n * (min(tab.shape) - 1)))
    got = _row(spark, "q_cramers_v")
    assert got["n"] == int(n)
    assert (got["n_sources"], got["n_langs"]) == tab.shape
    assert abs(got["chi2"] - chi2) < 1e-5  # 12-dp term rounding accumulates
    assert abs(got["v"] - v) < TOL
    assert 0.0 <= got["v"] <= 1.0


# ---------------------------------------------------------------------------
# round-6 statistics family: the same triple-entry treatment
# ---------------------------------------------------------------------------


def test_ctr_wilson_matches_textbook_interval(spark, events):
    e = events[events.user_id.notna()]
    arms = (e.user_id % 16).astype(int)
    z = 1.96
    rows = registry.queries()["q_ctr_wilson"](spark, SF_DIR).collect()
    want = {}
    for variant, grp in e.groupby(arms):
        n = len(grp)
        p = float((grp.event_type == "purchase").sum()) / n
        # the center ± margin spelling (vs the engine's single-tree form)
        center = (p + z * z / (2 * n)) / (1 + z * z / n)
        margin = (z / (1 + z * z / n)) * math.sqrt(
            p * (1 - p) / n + z * z / (4 * n * n)
        )
        want[variant] = center - margin
    assert len(rows) == len(want)
    for r in rows:
        assert abs(r["wilson_lb"] - want[r["variant"]]) < TOL
    # rank must order the bounds descending (ties broken by variant)
    by_rank = sorted(rows, key=lambda r: r["rnk"])
    keys = [(-r["wilson_lb"], r["variant"]) for r in by_rank]
    assert keys == sorted(keys)


def test_cohen_kappa_matches_confusion_matrix(spark, docs):
    d = docs[docs.text.notna()]
    a = d.lang.map(_is_en).to_numpy(bool)
    b = d.text.map(_pred_stopword).to_numpy(bool)
    n = len(d)
    po = float((a == b).sum()) / n
    pe = (a.mean() * b.mean()) + ((1 - a.mean()) * (1 - b.mean()))
    kappa = (po - pe) / (1 - pe)
    got = _row(spark, "q_kappa_agreement")
    assert got["n"] == n and got["n_agree"] == int((a == b).sum())
    assert abs(got["po"] - po) < TOL
    assert abs(got["pe"] - pe) < TOL
    assert abs(got["kappa"] - kappa) < TOL


def test_fleiss_kappa_matches_per_item_form(spark, docs):
    d = docs[docs.text.notna()]
    votes = (
        d.lang.map(_is_en).to_numpy(int)
        + d.text.map(_pred_stopword).to_numpy(int)
        + d.text.map(_pred_the).to_numpy(int)
    )
    k, n = 3, len(votes)
    # the textbook per-item agreement P_i, averaged — no integer folding
    p_i = (votes**2 + (k - votes) ** 2 - k) / (k * (k - 1))
    pbar = float(p_i.mean())
    p1 = float(votes.sum()) / (k * n)
    pe = p1 * p1 + (1 - p1) * (1 - p1)
    kappa = (pbar - pe) / (1 - pe)
    got = _row(spark, "q_fleiss_kappa")
    assert got["n"] == n and got["t1"] == int(votes.sum())
    assert abs(got["pbar"] - pbar) < TOL
    assert abs(got["pe"] - pe) < TOL
    assert abs(got["kappa"] - kappa) < TOL


def test_calibration_bins_match_python_binning(spark, docs):
    d = docs[docs.text.notna()]
    want: Counter = Counter()
    pos: Counter = Counter()
    for text, lang in zip(d.text, d.lang):
        toks = _toks(text)
        if not toks:
            continue
        score = len(set(toks)) / len(toks)
        b = min(int(score * 10), 9)
        want[b] += 1
        pos[b] += int(_is_en(lang))
    rows = registry.queries()["q_calibration_bins"](spark, SF_DIR).collect()
    assert {r["bin"]: r["n"] for r in rows} == dict(want)
    assert {r["bin"]: r["n_pos"] for r in rows} == {b: pos[b] for b in want}
