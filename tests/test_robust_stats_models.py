"""Triple-entry verification, tranche 10: the round-8 operator families.

Same rationale as tests/test_eval_stats_models.py (where this layer
caught the zero-cell chi-square class twice): DuckDB-oracle parity
proves both engines compute the same expression, not that the expression
is the statistic.  Every round-8 operator is recomputed here a THIRD way
from its textbook definition in plain Python/numpy/pandas — brute-force
pair counting for Kendall, pandas average ranks for the rank tests, an
explicit CUSUM/SPRT walk, direct set algebra for the gram operators —
and the engine must agree within its own 9-dp rounding.
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


# ---------------------------------------------------------------------------
# q_anova_f / q_brown_forsythe — sums-of-squares from numpy group arrays
# ---------------------------------------------------------------------------


def _anova_f(groups):
    k = len(groups)
    n = sum(len(g) for g in groups)
    grand = np.concatenate(groups).mean()
    ssb = sum(len(g) * (g.mean() - grand) ** 2 for g in groups)
    ssw = sum(((g - g.mean()) ** 2).sum() for g in groups)
    f = (ssb / (k - 1)) / (ssw / (n - k))
    return k, n, f, ssb / (ssb + ssw)


def test_anova_f_matches_numpy_group_means(spark, events):
    e = events[events.value.notna()]
    groups = [
        grp.value.to_numpy(dtype=float) for _, grp in e.groupby("event_type")
    ]
    k, n, f, eta2 = _anova_f(groups)
    [r] = registry.queries()["q_anova_f"](spark, SF_DIR).collect()
    assert (r["k"], r["n"], r["dof1"], r["dof2"]) == (k, n, k - 1, n - k)
    assert abs(r["f_stat"] - f) < TOL * max(1.0, f)
    assert abs(r["eta2"] - eta2) < TOL


def test_brown_forsythe_matches_numpy_median_deviations(spark, events):
    e = events[events.value.notna()]
    groups = [
        np.abs(grp.value.to_numpy(dtype=float) - np.median(grp.value))
        for _, grp in e.groupby("event_type")
    ]
    k, n, f, _ = _anova_f(groups)
    [r] = registry.queries()["q_brown_forsythe"](spark, SF_DIR).collect()
    assert (r["k"], r["n"]) == (k, n)
    assert abs(r["f_bf"] - f) < TOL * max(1.0, f)


# ---------------------------------------------------------------------------
# q_cohens_d — direct numpy moments
# ---------------------------------------------------------------------------


def test_cohens_d_matches_numpy_pooled_sd(spark, docs):
    d = docs[docs.text.notna() & docs.n_chars.notna()]
    en = d[d.lang == "en"].n_chars.to_numpy(dtype=float)
    ot = d[d.lang != "en"].n_chars.to_numpy(dtype=float)
    n1, n2 = len(en), len(ot)
    sp2 = ((n1 - 1) * en.var(ddof=1) + (n2 - 1) * ot.var(ddof=1)) / (n1 + n2 - 2)
    dd = (en.mean() - ot.mean()) / math.sqrt(sp2)
    j = 1.0 - 3.0 / (4.0 * (n1 + n2) - 9.0)
    se = math.sqrt((n1 + n2) / (n1 * n2) + dd * dd / (2.0 * (n1 + n2)))
    [r] = registry.queries()["q_cohens_d"](spark, SF_DIR).collect()
    assert (r["n_en"], r["n_other"]) == (n1, n2)
    assert abs(r["mean_en"] - en.mean()) < TOL
    assert abs(r["cohens_d"] - dd) < TOL
    assert abs(r["hedges_g"] - j * dd) < TOL
    assert abs(r["ci_lo"] - (j * dd - 1.959963984540054 * se)) < TOL
    assert abs(r["ci_hi"] - (j * dd + 1.959963984540054 * se)) < TOL


# ---------------------------------------------------------------------------
# q_kruskal_wallis — pandas average ranks over the pooled sample
# ---------------------------------------------------------------------------


def test_kruskal_wallis_matches_pandas_ranks(spark, docs):
    d = docs[docs.text.notna() & docs.n_chars.notna()]
    pooled = d.n_chars.rank(method="average")
    n = len(d)
    h = 12.0 / (n * (n + 1)) * sum(
        rj.sum() ** 2 / len(rj) for _, rj in pooled.groupby(d.source)
    ) - 3.0 * (n + 1)
    ties = sum(c**3 - c for c in Counter(d.n_chars).values())
    h_c = h / (1.0 - ties / (n**3 - n))
    [r] = registry.queries()["q_kruskal_wallis"](spark, SF_DIR).collect()
    assert (r["n"], r["k"], r["dof"]) == (n, d.source.nunique(), d.source.nunique() - 1)
    assert abs(r["h"] - h) < TOL * max(1.0, abs(h))
    assert abs(r["h_corrected"] - h_c) < TOL * max(1.0, abs(h_c))


# ---------------------------------------------------------------------------
# q_wilcoxon_signed_rank — pandas ranks on the explicit paired differences
# ---------------------------------------------------------------------------


def test_wilcoxon_matches_pandas_signed_ranks(spark, events):
    e = events[events.user_id.notna()]
    diffs = []
    for _, grp in e.groupby("user_id"):
        h1 = int((grp.ts.dt.day <= 15).sum())
        h2 = len(grp) - h1
        if h2 != h1:
            diffs.append(h2 - h1)
    d = pd.Series(diffs)
    ranks = d.abs().rank(method="average")
    n = len(d)
    w_plus = float(ranks[d > 0].sum())
    ties = sum(c**3 - c for c in Counter(d.abs()).values())
    var = n * (n + 1) * (2 * n + 1) / 24.0 - ties / 48.0
    z = (w_plus - n * (n + 1) / 4.0) / math.sqrt(var)
    [r] = registry.queries()["q_wilcoxon_signed_rank"](spark, SF_DIR).collect()
    assert (r["n"], r["n_pos"], r["n_neg"]) == (
        n, int((d > 0).sum()), int((d < 0).sum()),
    )
    assert abs(r["w_plus"] - w_plus) < TOL
    assert abs(r["z"] - z) < TOL


# ---------------------------------------------------------------------------
# q_kendall_tau — BRUTE-FORCE pair enumeration over the binned rows
# ---------------------------------------------------------------------------


def test_kendall_tau_matches_bruteforce_pairs(spark, docs):
    d = docs[docs.text.notna() & docs.n_chars.notna()]
    xb = np.minimum(d.n_chars.to_numpy() // 64, 9)
    yb = np.minimum(
        d.text.map(lambda t: len([w for w in t.split(" ") if w != ""])).to_numpy()
        // 10,
        9,
    )
    n = len(d)
    conc = disc = 0
    for i in range(n):
        dx = xb[i + 1 :] - xb[i]
        dy = yb[i + 1 :] - yb[i]
        s = dx * dy
        conc += int((s > 0).sum())
        disc += int((s < 0).sum())
    n0 = n * (n - 1) / 2
    n1 = sum(c * (c - 1) / 2 for c in Counter(xb).values())
    n2 = sum(c * (c - 1) / 2 for c in Counter(yb).values())
    tau = (conc - disc) / math.sqrt((n0 - n1) * (n0 - n2))
    [r] = registry.queries()["q_kendall_tau"](spark, SF_DIR).collect()
    assert (r["n"], r["concordant"], r["discordant"]) == (n, conc, disc)
    assert abs(r["tau_b"] - tau) < TOL


# ---------------------------------------------------------------------------
# q_friedman_test — pandas within-block ranks, textbook tie-corrected form
# ---------------------------------------------------------------------------


def test_friedman_matches_pandas_block_ranks(spark, events):
    k = events.event_type.nunique()
    e = events[events.user_id.notna() & events.value.notna()]
    cell = e.groupby(["user_id", "event_type"]).value.mean().reset_index()
    counts = cell.groupby("user_id").size()
    complete = cell[cell.user_id.isin(counts[counts == k].index)]
    r_sums: Counter = Counter()
    a = 0.0
    n_blocks = complete.user_id.nunique()
    for _, grp in complete.groupby("user_id"):
        ranks = grp.value.rank(method="average")
        for et, rk in zip(grp.event_type, ranks):
            r_sums[et] += rk
            a += rk * rk
    num = sum(v**2 for v in r_sums.values()) - n_blocks**2 * k * (k + 1) ** 2 / 4.0
    den = a - n_blocks * k * (k + 1) ** 2 / 4.0
    chi2 = (k - 1) * num / den
    [r] = registry.queries()["q_friedman_test"](spark, SF_DIR).collect()
    assert (r["n"], r["k"], r["dof"]) == (n_blocks, k, k - 1)
    assert abs(r["chi2"] - chi2) < TOL * max(1.0, chi2)


# ---------------------------------------------------------------------------
# q_mad_outliers — numpy medians, explicit score-and-sort
# ---------------------------------------------------------------------------


def test_mad_outliers_match_numpy_modified_z(spark, events):
    e = events[events.value.notna()]
    scored = []
    for et, grp in e.groupby("event_type"):
        med = float(np.median(grp.value))
        mad = float(np.median(np.abs(grp.value - med)))
        if mad > 0:
            for eid, v in zip(grp.event_id, grp.value):
                scored.append((eid, round(0.6745 * (v - med) / mad, 9)))
    scored.sort(key=lambda t: (-abs(t[1]), t[0]))
    want = {eid: (z, i + 1) for i, (eid, z) in enumerate(scored[:20])}
    rows = registry.queries()["q_mad_outliers"](spark, SF_DIR).collect()
    assert len(rows) == len(want)
    for r in rows:
        z, rnk = want[r["event_id"]]
        assert r["rnk"] == rnk
        assert abs(r["robust_z"] - z) < TOL


# ---------------------------------------------------------------------------
# q_sprt_monitor — explicit Wald walk with math.log increments
# ---------------------------------------------------------------------------


def test_sprt_matches_explicit_wald_walk(spark, events):
    e = events[events.user_id.notna()]
    entries = []
    for uid, grp in e.groupby("user_id"):
        first_hex = hashlib.md5(str(int(uid)).encode()).hexdigest()[0]
        if ord(first_hex) % 2 == 0:
            continue  # arm A
        converted = int((grp.event_type == "purchase").sum() * 4 > len(grp))
        entries.append((grp.ts.dt.floor("D").min(), converted))
    daily: Counter = Counter()
    conv: Counter = Counter()
    for day, c in entries:
        daily[day] += 1
        conv[day] += c
    l1, l0 = math.log(0.16 / 0.08), math.log(0.84 / 0.92)
    a, b = math.log(19), -math.log(19)
    rows = registry.queries()["q_sprt_monitor"](spark, SF_DIR).collect()
    assert len(rows) == len(daily)
    got = {pd.Timestamp(r["day"]): r for r in rows}
    n = c = 0
    for day in sorted(daily):
        n += daily[day]
        c += conv[day]
        llr = c * l1 + (n - c) * l0
        want = "accept_h1" if llr >= a else "accept_h0" if llr <= b else "continue"
        r = got[day]
        assert (r["n_cum"], r["conv_cum"]) == (n, c)
        assert abs(r["llr"] - llr) < TOL
        assert r["decision"] == want


# ---------------------------------------------------------------------------
# q_cusum_drift — explicit Page recursion over daily means
# ---------------------------------------------------------------------------


def test_cusum_matches_explicit_page_recursion(spark, events):
    e = events[events.value.notna()]
    daily = e.groupby(e.ts.dt.floor("D")).value.mean().sort_index()
    xs = [round(v, 12) for v in daily]
    base = xs[:7]
    mu0 = sum(base) / 7.0
    s0 = math.sqrt(sum((x - mu0) ** 2 for x in base) / 6.0)
    k, h = 0.5 * s0, 4.0 * s0
    rows = registry.queries()["q_cusum_drift"](spark, SF_DIR).collect()
    got = {pd.Timestamp(r["day"]): r for r in rows}
    assert len(rows) == len(xs) - 7
    sp = sn = 0.0
    for day, x in zip(daily.index[7:], xs[7:]):
        sp = max(0.0, sp + x - mu0 - k)
        sn = max(0.0, sn + mu0 - x - k)
        r = got[day]
        assert abs(r["day_mean"] - x) < TOL
        assert abs(r["s_pos"] - sp) < TOL
        assert abs(r["s_neg"] - sn) < TOL
        assert r["alarm_pos"] == int(sp > h)
        assert r["alarm_neg"] == int(sn > h)


# ---------------------------------------------------------------------------
# q_jackknife_variance — explicit delete-one-bucket recomputation
# ---------------------------------------------------------------------------


def test_jackknife_matches_explicit_leave_one_out(spark, events):
    e = events[events.user_id.notna() & events.value.notna()]
    s_i = e.groupby(e.user_id % 32).value.sum()
    n_i = e.groupby(e.user_id % 32).value.count()
    s, n, d = float(s_i.sum()), int(n_i.sum()), len(s_i)
    thetas = [(s - si) / (n - ni) for si, ni in zip(s_i, n_i) if n > ni]
    th_dot = sum(thetas) / len(thetas)
    var = (len(thetas) - 1) / len(thetas) * sum((t - th_dot) ** 2 for t in thetas)
    se = math.sqrt(var)
    [r] = registry.queries()["q_jackknife_variance"](spark, SF_DIR).collect()
    assert (r["n"], r["d_buckets"]) == (n, d)
    assert abs(r["theta"] - s / n) < TOL
    assert abs(r["se_jack"] - se) < TOL
    assert abs(r["ci_lo"] - (s / n - 1.959963984540054 * se)) < TOL


# ---------------------------------------------------------------------------
# q_woe_iv — Counter-based smoothed shares
# ---------------------------------------------------------------------------


def test_woe_iv_matches_counter_model(spark, events):
    e = events[events.value.notna() & (events.value >= 0)]
    g: Counter = Counter()
    b: Counter = Counter()
    for v, et in zip(e.value, e.event_type):
        bin_ = min(int(v // 50), 9)
        (g if et == "purchase" else b)[bin_] += 1
    gt, bt = sum(g.values()), sum(b.values())
    rows = registry.queries()["q_woe_iv"](spark, SF_DIR).collect()
    assert len(rows) == len(set(g) | set(b))
    for r in rows:
        pg = (2 * g[r["bin"]] + 1) / (2 * gt + 10)
        pb = (2 * b[r["bin"]] + 1) / (2 * bt + 10)
        woe = math.log(pg / pb)
        assert (r["n_good"], r["n_bad"]) == (g[r["bin"]], b[r["bin"]])
        assert abs(r["woe"] - woe) < TOL
        assert abs(r["iv_contrib"] - (pg - pb) * woe) < TOL


# ---------------------------------------------------------------------------
# q_contamination_drift — direct set algebra over 10-char grams
# ---------------------------------------------------------------------------


def _grams(t: str) -> set:
    t = t.lower()
    return {t[i : i + 10] for i in range(max(len(t) - 9, 1))}


def test_contamination_drift_matches_set_model(spark, docs):
    bench: set = set()
    for t in docs[docs.doc_id < 20].text:
        if t is not None:
            bench |= _grams(t)
    train = docs[docs.doc_id >= 20]
    stats: dict = {}
    for _, row in train.iterrows():
        hit = row.text is not None and bool(_grams(row.text) & bench)
        cur = row.doc_id % 4 == 0
        key = row.source
        n_r, c_r, n_c, c_c = stats.get(key, (0, 0, 0, 0))
        if cur:
            n_c, c_c = n_c + 1, c_c + int(hit)
        else:
            n_r, c_r = n_r + 1, c_r + int(hit)
        stats[key] = (n_r, c_r, n_c, c_c)
    rows = registry.queries()["q_contamination_drift"](spark, SF_DIR).collect()
    assert len(rows) == len(stats)
    for r in rows:
        n_r, c_r, n_c, c_c = stats[r["source"]]
        assert (r["n_ref"], r["contaminated_ref"]) == (n_r, c_r)
        assert (r["n_cur"], r["contaminated_cur"]) == (n_c, c_c)
        if n_r and n_c:
            assert abs(r["rate_drift"] - (c_c / n_c - c_r / n_r)) < TOL
        else:
            assert r["rate_drift"] is None


# ---------------------------------------------------------------------------
# q_dup_span_ladder — direct string-gram set intersection per level
# ---------------------------------------------------------------------------


def test_dup_span_ladder_matches_set_model(spark, docs):
    d = docs[docs.text.notna()]
    words = {
        r.doc_id: [w for w in r.text.split(" ") if w != ""]
        for r in d.itertuples()
    }
    want: dict = {i: (0, 0) for i in words}
    for lvl in (8, 16, 32, 64):
        owners: dict = {}
        for did, w in words.items():
            for i in range(len(w) - lvl + 1):
                gm = " ".join(w[i : i + lvl])
                s = owners.setdefault(gm, set())
                s.add(did)
        dup_docs: set = set()
        for s in owners.values():
            if len(s) > 1:
                dup_docs |= s
        for did in dup_docs:
            mx, cnt = want[did]
            want[did] = (lvl, cnt + 1)
    rows = registry.queries()["q_dup_span_ladder"](spark, SF_DIR).collect()
    assert len(rows) == len(want)
    for r in rows:
        assert (r["max_dup_len"], r["n_levels_hit"]) == want[r["doc_id"]]


# ---------------------------------------------------------------------------
# q_sketch_drift — explicit sketch construction + KS grid walk
# ---------------------------------------------------------------------------


def test_sketch_drift_matches_explicit_sketch_model(spark, events):
    e = events[events.value.notna()].copy()
    e["day"] = e.ts.dt.floor("D")
    e["week"] = e.day - pd.to_timedelta(e.day.dt.dayofweek, unit="D")
    sketches: dict = {}
    for day, grp in e.groupby("day"):
        grp = grp.sort_values(["value", "event_id"], kind="mergesort")
        n = len(grp)
        pts: Counter = Counter()
        vals = {}
        for rn, v in enumerate(grp.value, start=1):
            b = (rn - 1) * 64 // n
            pts[b] += 1
            vals[b] = v  # last (max rn) value in bucket
        sketches[day] = [(vals[b], pts[b]) for b in sorted(pts)]
    min_week = e.week.min()
    base: Counter = Counter()
    for day, grp in e[e.week == min_week].groupby("day"):
        for v, w in sketches[day]:
            base[v] += w
    tb = sum(base.values())
    rows = registry.queries()["q_sketch_drift"](spark, SF_DIR).collect()
    got = {pd.Timestamp(r["day"]): r for r in rows}
    scoring_days = sorted(e[e.week > min_week].day.unique())
    assert len(rows) == len(scoring_days)
    for day in scoring_days:
        dc: Counter = Counter()
        for v, w in sketches[pd.Timestamp(day)]:
            dc[v] += w
        td = sum(dc.values())
        grid = sorted(set(base) | set(dc))
        cum_d = cum_b = 0
        maxgap = 0
        for v in grid:
            cum_d += dc[v]
            cum_b += base[v]
            maxgap = max(maxgap, abs(cum_d * tb - cum_b * td))
        r = got[pd.Timestamp(day)]
        assert (r["n_day"], r["n_base"]) == (td, tb)
        assert abs(r["ks_d"] - maxgap / (td * tb)) < TOL
        assert r["alarm"] == int(5 * maxgap > td * tb)


# ---------------------------------------------------------------------------
# crafted degenerate regressions
# ---------------------------------------------------------------------------


def _doc_fixture(tmp_path, texts, n_chars=None, langs=None, sources=None):
    import os
    import pyarrow as pa
    import pyarrow.parquet as pq

    for f in os.listdir(SF_DIR):
        os.symlink(os.path.join(SF_DIR, f), os.path.join(tmp_path, f))
    os.unlink(os.path.join(tmp_path, "documents.parquet"))
    n = len(texts)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(n), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(langs or ["en"] * n, pa.string()),
                "source": pa.array(sources or ["s0"] * n, pa.string()),
                "n_chars": pa.array(
                    n_chars or [len(t) if t else 0 for t in texts], pa.int64()
                ),
            }
        ),
        os.path.join(tmp_path, "documents.parquet"),
    )
    return str(tmp_path)


def test_kendall_tau_null_on_degenerate_axis(spark, tmp_path):
    """All documents in ONE length band → n0 = n1 (every x-pair tied) →
    tau-b's denominator factor is zero → NULL, never a 0/0."""
    texts = [f"w{i} " * (i + 3) for i in range(6)]
    sf = _doc_fixture(tmp_path, texts, n_chars=[50] * 6)
    [r] = registry.queries()["q_kendall_tau"](spark, sf).collect()
    assert r["n"] == 6
    assert r["tau_b"] is None


def test_mad_outliers_excludes_zero_mad_groups(spark, tmp_path):
    """A group with over half its values identical has MAD = 0 — its rows
    must be EXCLUDED (not scored infinite) while other groups still rank."""
    import os
    import pyarrow as pa
    import pyarrow.parquet as pq

    for f in os.listdir(SF_DIR):
        os.symlink(os.path.join(SF_DIR, f), os.path.join(tmp_path, f))
    os.unlink(os.path.join(tmp_path, "events.parquet"))
    n = 12
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(range(n), pa.int64()),
                "ts": pa.array(
                    [pd.Timestamp("2024-01-01 00:00:00")] * n,
                    pa.timestamp("us"),
                ),
                "user_id": pa.array([1] * n, pa.int64()),
                "event_type": pa.array(
                    ["flat"] * 6 + ["vary"] * 6, pa.string()
                ),
                # "flat": all identical -> MAD 0 -> excluded entirely
                "value": pa.array(
                    [5.0] * 6 + [1.0, 2.0, 3.0, 4.0, 5.0, 100.0], pa.float64()
                ),
                "props": pa.array([None] * n, pa.string()),
            }
        ),
        os.path.join(tmp_path, "events.parquet"),
    )
    rows = registry.queries()["q_mad_outliers"](spark, str(tmp_path)).collect()
    assert rows and all(r["event_type"] == "vary" for r in rows)
    assert rows[0]["event_id"] == 11  # the 100.0 spike ranks first
