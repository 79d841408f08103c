"""Triple-entry verification, tranche 15: the round-9 operator families.

Same rationale as tests/test_eval_stats_models.py (this layer caught the
zero-cell chi-square class twice, and this round's fuzzer caught the same
class AGAIN in q_mood_median's oracle FILTER-sum): DuckDB-oracle parity
proves both engines compute the same expression, not that the expression
is the statistic.  Every round-9 operator is recomputed here a THIRD way
from its textbook definition in plain Python/numpy/pandas — ECDF arrays
for the CvM/AD statistics, brute-force pair enumeration for
Mann-Kendall, explicit md5 relabeling for the permutation test, literal
Counter algebra for the corpus statistics — and the engine must agree
within its own 9-dp rounding.
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


def _tokens(text: str) -> list[str]:
    # the engine's split-on-single-space spelling, NOT str.split() (which
    # collapses whitespace runs)
    return [t for t in text.split(" ") if t]


def _md5_bucket(key: str) -> int:
    return ord(hashlib.md5(key.encode()).hexdigest()[0]) % 2


def _daily_means(events: pd.DataFrame) -> pd.Series:
    e = events[events.value.notna()]
    return e.groupby(e.ts.dt.floor("D")).value.mean().sort_index()


def _lower_median(values: np.ndarray) -> float:
    # MIN v with 2*cum >= N — the engine's integer-threshold spelling
    s = np.sort(values)
    return float(s[(len(s) + 1) // 2 - 1])


# ---------------------------------------------------------------------------
# q_cramer_von_mises / q_anderson_darling — ECDF arrays
# ---------------------------------------------------------------------------


def _two_samples(events):
    e = events[events.value.notna()]
    x = e[e.event_type == "purchase"].value.to_numpy(dtype=float)
    y = e[e.event_type != "purchase"].value.to_numpy(dtype=float)
    return x, y


def test_cramer_von_mises_matches_ecdf_model(spark, events):
    x, y = _two_samples(events)
    n, m = len(x), len(y)
    big_n = n + m
    zs = np.concatenate([x, y])
    fn = np.searchsorted(np.sort(x), zs, side="right") / n
    gm = np.searchsorted(np.sort(y), zs, side="right") / m
    t_model = n * m / big_n**2 * ((fn - gm) ** 2).sum()
    [r] = registry.queries()["q_cramer_von_mises"](spark, SF_DIR).collect()
    assert (r["n_a"], r["n_b"]) == (n, m)
    assert abs(r["cvm_t"] - t_model) < TOL


def test_anderson_darling_matches_scholz_stephens_model(spark, events):
    x, y = _two_samples(events)
    big_n = len(x) + len(y)
    pooled = np.concatenate([x, y])
    zj = np.unique(pooled)
    hj = np.array([(pooled == z).sum() for z in zj], dtype=float)
    bj = np.cumsum(hj)
    a2 = 0.0
    for sample in (x, y):
        ni = len(sample)
        mij = np.searchsorted(np.sort(sample), zj, side="right").astype(float)
        hij = np.array([(sample == z).sum() for z in zj], dtype=float)
        maij = mij - hij / 2
        baj = bj - hj / 2
        denom = baj * (big_n - baj) - big_n * hj / 4
        inner = (hj / big_n) * (big_n * maij - ni * baj) ** 2 / denom
        a2 += inner.sum() / ni
    a2 *= (big_n - 1) / big_n
    [r] = registry.queries()["q_anderson_darling"](spark, SF_DIR).collect()
    assert r["n_cells"] == len(zj)
    assert abs(r["a2akn"] - a2) < TOL


# ---------------------------------------------------------------------------
# q_mood_median — full-spine chi-square at the grand lower median
# ---------------------------------------------------------------------------


def test_mood_median_matches_contingency_model(spark, events):
    e = events[events.value.notna()]
    med = _lower_median(e.value.to_numpy(dtype=float))
    groups = e.groupby("event_type").value
    above = {k: (v > med).sum() for k, v in groups}
    le = {k: (v <= med).sum() for k, v in groups}
    k = len(above)
    n = sum(above.values()) + sum(le.values())
    r_above, r_le = sum(above.values()), sum(le.values())
    chi2 = 0.0
    for g in above:  # the FULL 2xk spine, zero cells included
        col = above[g] + le[g]
        for o, row in ((above[g], r_above), (le[g], r_le)):
            chi2 += (o * n - row * col) ** 2 / (n * row * col)
    [r] = registry.queries()["q_mood_median"](spark, SF_DIR).collect()
    assert r["grand_median"] == med
    assert (r["n"], r["k"], r["dof"]) == (n, k, k - 1)
    assert abs(r["chi2"] - chi2) < TOL


# ---------------------------------------------------------------------------
# q_runs_test — explicit run counting on the daily-mean sign sequence
# ---------------------------------------------------------------------------


def test_runs_test_matches_explicit_runs(spark, events):
    md = _daily_means(events)
    med = _lower_median(md.to_numpy(dtype=float))
    signs = [1 if m > med else 0 for m in md if m != med]
    n1, n2 = sum(signs), len(signs) - sum(signs)
    runs = 1 + sum(1 for a, b in zip(signs, signs[1:]) if a != b)
    nn = n1 + n2
    mu = 2 * n1 * n2 / nn + 1
    var = 2 * n1 * n2 * (2 * n1 * n2 - nn) / (nn**2 * (nn - 1))
    z = (runs - mu) / math.sqrt(var)
    [r] = registry.queries()["q_runs_test"](spark, SF_DIR).collect()
    assert (r["n1"], r["n2"], r["n_runs"]) == (n1, n2, runs)
    assert abs(r["z"] - z) < TOL


# ---------------------------------------------------------------------------
# q_mann_kendall — brute-force pair enumeration + tie-corrected variance
# ---------------------------------------------------------------------------


def test_mann_kendall_matches_brute_force_pairs(spark, events):
    md = _daily_means(events)
    days = list(md.index)
    ms = md.to_numpy(dtype=float)
    n = len(ms)
    s = 0
    slopes = []
    for i in range(n):
        for j in range(i + 1, n):
            s += int(np.sign(ms[j] - ms[i]))
            slopes.append((ms[j] - ms[i]) / (days[j] - days[i]).days)
    ties = Counter(ms)
    tie_term = sum(t * (t - 1) * (2 * t + 5) for t in ties.values() if t > 1)
    var_s = (n * (n - 1) * (2 * n + 5) - tie_term) / 18
    z = (s - 1) / math.sqrt(var_s) if s > 0 else (
        (s + 1) / math.sqrt(var_s) if s < 0 else 0.0
    )
    sen = float(np.median(slopes))
    [r] = registry.queries()["q_mann_kendall"](spark, SF_DIR).collect()
    assert (r["n_days"], r["s_stat"]) == (n, s)
    assert abs(r["var_s"] - var_s) < TOL
    assert abs(r["z"] - z) < TOL
    assert abs(r["sen_slope"] - sen) < TOL


# ---------------------------------------------------------------------------
# q_group_sequential / q_mantel_haenszel / q_permutation_test — explicit
# per-user experiment algebra
# ---------------------------------------------------------------------------


def _user_frame(events: pd.DataFrame) -> pd.DataFrame:
    e = events[events.user_id.notna()]
    agg = e.groupby("user_id").agg(
        first_day=("ts", lambda t: t.min().floor("D")),
        purchases=("event_type", lambda s: (s == "purchase").sum()),
        n=("event_type", "size"),
    )
    agg["converted"] = (agg.purchases * 4 > agg.n).astype(int)
    agg["variant"] = [
        "A" if _md5_bucket(str(int(u))) == 0 else "B" for u in agg.index
    ]
    return agg


def _pooled_z(n_a, c_a, n_b, c_b):
    if n_a == 0 or n_b == 0 or c_a + c_b == 0 or c_a + c_b == n_a + n_b:
        return None
    p = (c_a + c_b) / (n_a + n_b)
    return (c_a / n_a - c_b / n_b) / math.sqrt(
        p * (1 - p) * (1 / n_a + 1 / n_b)
    )


def test_group_sequential_matches_per_look_model(spark, events):
    users = _user_frame(events)
    d0 = users.first_day.min()
    users["look"] = np.minimum(
        5, 1 + ((users.first_day - d0).dt.days // 6)
    )
    rows = {
        r["look"]: r
        for r in registry.queries()["q_group_sequential"](spark, SF_DIR).collect()
    }
    assert set(rows) == {1, 2, 3, 4, 5}
    for k in range(1, 6):
        sub = users[users.look <= k]
        n_a = int((sub.variant == "A").sum())
        c_a = int(sub[sub.variant == "A"].converted.sum())
        n_b = int((sub.variant == "B").sum())
        c_b = int(sub[sub.variant == "B"].converted.sum())
        r = rows[k]
        assert (r["n_a"], r["conv_a"], r["n_b"], r["conv_b"]) == (
            n_a,
            c_a,
            n_b,
            c_b,
        )
        z = _pooled_z(n_a, c_a, n_b, c_b)
        obf = 2.04 * math.sqrt(5 / k)
        assert abs(r["obf_bound"] - obf) < TOL
        if z is None:
            assert r["z"] is None
        else:
            assert abs(r["z"] - z) < TOL
            assert r["reject_obf"] == int(abs(round(z, 9)) >= obf)
            assert r["reject_pocock"] == int(abs(round(z, 9)) >= 2.413)


def test_mantel_haenszel_matches_stratified_model(spark, events):
    users = _user_frame(events)
    users["stratum"] = [int(u) % 4 for u in users.index]
    sum_a = sum_e = sum_v = sum_r = sum_s = 0.0
    n_strata = 0
    for _, g in users.groupby("stratum"):
        a = int(((g.variant == "A") & (g.converted == 1)).sum())
        b = int(((g.variant == "A") & (g.converted == 0)).sum())
        c = int(((g.variant == "B") & (g.converted == 1)).sum())
        d = int(((g.variant == "B") & (g.converted == 0)).sum())
        nt = a + b + c + d
        if nt <= 1:
            continue
        n_strata += 1
        sum_a += a
        sum_e += (a + b) * (a + c) / nt
        sum_v += (a + b) * (c + d) * (a + c) * (b + d) / (nt**2 * (nt - 1))
        sum_r += a * d / nt
        sum_s += b * c / nt
    [r] = registry.queries()["q_mantel_haenszel"](spark, SF_DIR).collect()
    assert (r["n_strata"], r["sum_a"]) == (n_strata, sum_a)
    assert abs(r["e_a"] - sum_e) < TOL
    if sum_v > 0:
        chi2 = max(0.0, abs(sum_a - sum_e) - 0.5) ** 2 / sum_v
        assert abs(r["chi2_mh"] - chi2) < TOL
    else:
        assert r["chi2_mh"] is None
    if sum_s > 0:
        assert abs(r["or_mh"] - sum_r / sum_s) < TOL
    else:
        # sf0.001's 15 users leave every stratum without one of the
        # off-diagonal cells — the engine's exact Σ(b·c/N) > 0 guard
        # must report NULL, not a crash or an infinity
        assert r["or_mh"] is None


def test_permutation_test_matches_explicit_relabeling(spark, events):
    e = events[events.user_id.notna() & events.value.notna()]
    um = e.groupby("user_id").value.mean()

    def delta(assign):
        a = um[assign == 0]
        b = um[assign == 1]
        if len(a) == 0 or len(b) == 0:
            return None
        return a.mean() - b.mean()

    obs = delta(
        pd.Series(
            [_md5_bucket(str(int(u))) for u in um.index], index=um.index
        )
    )
    n_extreme = 0
    for perm in range(1, 33):
        d = delta(
            pd.Series(
                [_md5_bucket(f"{int(u)}:{perm}") for u in um.index],
                index=um.index,
            )
        )
        if d is not None and abs(d) >= abs(obs):
            n_extreme += 1
    [r] = registry.queries()["q_permutation_test"](spark, SF_DIR).collect()
    assert abs(r["delta_obs"] - obs) < TOL
    assert r["n_perms"] == 32
    assert r["n_extreme"] == n_extreme
    assert abs(r["p_value"] - (1 + n_extreme) / 33) < TOL


# ---------------------------------------------------------------------------
# q_page_hinkley — explicit running-mean walk
# ---------------------------------------------------------------------------


def test_page_hinkley_matches_explicit_walk(spark, events):
    md = _daily_means(events)
    rows = {
        r["day"]: r
        for r in registry.queries()["q_page_hinkley"](spark, SF_DIR).collect()
    }
    assert len(rows) == len(md)
    m_t, cum, model = 0.0, 0.0, {}
    mins = math.inf
    for t, (day, x) in enumerate(md.items(), start=1):
        cum += x
        m_t += x - cum / t - 0.5
        mins = min(mins, m_t)
        model[day] = (m_t, m_t - mins, m_t - mins > 5.0)
    for day, (ph, deficit, alarm) in model.items():
        r = rows[day.to_pydatetime()]
        assert abs(r["ph_m"] - ph) < TOL
        assert abs(r["deficit"] - deficit) < TOL
        assert r["alarm"] == int(alarm)


# ---------------------------------------------------------------------------
# corpus statistics — literal Counter algebra
# ---------------------------------------------------------------------------


def _token_counter(docs: pd.DataFrame) -> Counter:
    c = Counter()
    for text in docs.text:
        c.update(_tokens(text.lower()))
    return c


def test_bpe_merges_matches_counter_model(spark, docs):
    words = _token_counter(docs)
    pairs = Counter()
    for w, wc in words.items():
        symbols = list(w) + ["</w>"]
        for a, b in zip(symbols, symbols[1:]):
            pairs[(a, b)] += wc
    top = sorted(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    got = [
        ((r["p1"], r["p2"]), r["pair_freq"])
        for r in registry.queries()["q_bpe_merges"](spark, SF_DIR)
        .orderBy("p1", "p2")
        .collect()
    ]
    assert sorted(got, key=lambda kv: (-kv[1], kv[0])) == top


def test_ngram_novelty_matches_set_algebra(spark, docs):
    grams = {}
    for r in docs.itertuples():
        ws = _tokens(r.text)
        grams[r.doc_id] = {
            tuple(ws[i : i + 8]) for i in range(len(ws) - 7)
        }
    ref = set()
    for did, g in grams.items():
        if did % 7 != 3:
            ref |= g
    model = {
        did: (len(g), len(g - ref))
        for did, g in grams.items()
        if did % 7 == 3 and g
    }
    got = {
        r["doc_id"]: (r["n_grams"], r["n_novel"])
        for r in registry.queries()["q_ngram_novelty"](spark, SF_DIR).collect()
    }
    assert got == model


def test_zipf_fit_matches_numpy_ols(spark, docs):
    counts = _token_counter(docs)
    head = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:1000]
    x = np.log2(np.arange(1, len(head) + 1, dtype=float))
    y = np.log2(np.array([c for _, c in head], dtype=float))
    n = len(head)
    slope = (n * (x * y).sum() - x.sum() * y.sum()) / (
        n * (x * x).sum() - x.sum() ** 2
    )
    intercept = (y.sum() - slope * x.sum()) / n
    r_num = n * (x * y).sum() - x.sum() * y.sum()
    r2 = r_num**2 / (
        (n * (x * x).sum() - x.sum() ** 2) * (n * (y * y).sum() - y.sum() ** 2)
    )
    [r] = registry.queries()["q_zipf_fit"](spark, SF_DIR).collect()
    assert r["n_ranks"] == n
    assert abs(r["slope"] - slope) < 1e-5
    assert abs(r["intercept_log2"] - intercept) < 1e-5
    assert abs(r["r2"] - r2) < 1e-5


def test_chao1_matches_counter_model(spark, docs):
    counts = _token_counter(docs)
    v = len(counts)
    n = sum(counts.values())
    f1 = sum(1 for c in counts.values() if c == 1)
    f2 = sum(1 for c in counts.values() if c == 2)
    chao1 = v + f1 * (f1 - 1) / (2 * (f2 + 1))
    coverage = 1 - f1 / n
    [r] = registry.queries()["q_chao1_vocab"](spark, SF_DIR).collect()
    assert (r["v_obs"], r["n_tokens"], r["f1"], r["f2"]) == (v, n, f1, f2)
    assert abs(r["chao1"] - chao1) < TOL
    assert abs(r["gt_coverage"] - coverage) < TOL


def test_good_turing_matches_count_of_counts(spark, docs):
    counts = _token_counter(docs)
    coc = Counter(counts.values())
    n = sum(counts.values())
    rows = {
        r["r"]: r
        for r in registry.queries()["q_good_turing"](spark, SF_DIR).collect()
    }
    assert set(rows) == set(range(1, 11))
    for rr in range(1, 11):
        row = rows[rr]
        assert row["n_r"] == coc.get(rr, 0)
        if coc.get(rr, 0) > 0 and coc.get(rr + 1, 0) > 0:
            rstar = (rr + 1) * coc[rr + 1] / coc[rr]
            assert abs(row["r_star"] - rstar) < TOL
            assert abs(row["p_gt"] - rstar / n) < TOL
        else:
            assert row["r_star"] is None
            assert row["p_gt"] is None
