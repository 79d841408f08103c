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
