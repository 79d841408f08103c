"""Round-10 survival / retention analysis family.

Time-to-event readouts over user activity — the censoring-aware lens a
retention or reliability pipeline needs where naive "days active"
averages are biased by users still unconverted when observation ends:

* **q_kaplan_meier** — the Kaplan-Meier product-limit survival curve
  (Kaplan & Meier 1958) with Greenwood (1926) standard errors: the
  standard nonparametric S(t) under right censoring;
* **q_nelson_aalen** — the Nelson-Aalen cumulative-hazard estimator
  (Nelson 1972; Aalen 1978) with its variance: the additive-hazard
  companion (H(t) = Σ d_j/n_j) that stays defined where the KM product
  hits zero;
* **q_logrank_test** — the two-group log-rank test (Mantel 1966): do
  the A/B assignment arms (the q_ab_test md5 device) have the same
  survival distribution? — the hypergeometric observed-vs-expected fold
  over event times, the survival twin of q_mantel_haenszel;
* **q_rmst** — the restricted mean survival time to τ = 14 days: the
  area under the KM curve with its large-sample variance — the
  censoring-correct "average conversion-free days" summary recommended
  over hazard ratios when proportionality is doubtful.

Lifetime derivation (shared frame): TIME-TO-CONVERSION.  A user ENTERS
at their first event day; the event of interest is their FIRST purchase
(ev = 1, t = first-purchase day − entry day).  A user who never
purchases is right-CENSORED at their last observed activity (ev = 0,
t = last day − entry day) — the standard "does arm A convert FASTER,
not just more often?" framing that a conversion-rate z-test cannot
answer.  At-risk sets follow the standard convention: users censored
exactly at t are still at risk at t.

Determinism discipline (house rules): lifetimes and at-risk/death
counts are exact integers (datediff of day-truncated timestamps); the
KM product is exp(Σ round(ln((n−d)/n), 12)) with the 12-dp terms summed
order-free in DECIMAL(28,12) (the q_bh_fdr runtime-exp precedent) and a
cumulative d=n zero-flag short-circuiting S(t)=0 before any ln(0);
Greenwood/hazard/variance addends are integer-ratio doubles rounded at
12 dp into DECIMAL(28,12); final outputs round at 9 dp with +0.0.
Degenerate inputs (no users, no deaths, n=1 at a death time) yield no
row or NULL via integer-exact conditions.  All outputs are scalar
columns (driver canonicalization).

Scale shape (all three): one per-user aggregate (shuffle on user_id),
then everything folds on the DISTINCT-LIFETIME frame — bounded by the
observation calendar (≤ max observed tenure in days), not the user
count;
the cumulative windows run on that bounded frame (the q_ks_drift
distinct-value-frame device).  At 100 TB of events this is one
map-side-combined aggregate plus constant-size window work.

Reference basis: no reference analog (bifrost archives topics; it has
no user-lifetime surface) — Spark-first additive design.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bifrost_spark.registry import query
from bifrost_spark.tables import load_table

_D2812 = "decimal(28,12)"

# Shared oracle fragment: per-user (t, ev, grp) time-to-first-purchase
# lifetimes (see module docstring); grp is the q_ab_test md5 assignment.
_SURV_USERS_SQL = """
        lifetimes AS (
          SELECT user_id,
                 CASE WHEN conv_day IS NOT NULL
                      THEN date_diff('day', first_day, conv_day)
                      ELSE date_diff('day', first_day, last_day) END AS t,
                 CASE WHEN conv_day IS NOT NULL THEN 1 ELSE 0 END AS ev,
                 CASE WHEN (ascii(substr(md5(CAST(user_id AS VARCHAR)), 1, 1))
                            % 2) = 0 THEN 'A' ELSE 'B' END AS grp
          FROM (
            SELECT user_id,
                   CAST(MIN(date_trunc('day', ts)) AS DATE) AS first_day,
                   CAST(MAX(date_trunc('day', ts)) AS DATE) AS last_day,
                   CAST(MIN(CASE WHEN event_type = 'purchase'
                                 THEN date_trunc('day', ts) END) AS DATE)
                     AS conv_day
            FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
            GROUP BY user_id
          )
        )
"""


def _surv_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(user_id, t, ev, grp) — the shared time-to-conversion lifetime
    frame (see module docstring): ONE per-user aggregate carrying entry
    day, last-activity day, and first-purchase day."""
    e = load_table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull() & F.col("ts").isNotNull()
    )
    users = e.groupBy("user_id").agg(
        F.min(F.date_trunc("day", "ts")).cast("date").alias("first_day"),
        F.max(F.date_trunc("day", "ts")).cast("date").alias("last_day"),
        F.min(
            F.when(F.col("event_type") == "purchase", F.date_trunc("day", "ts"))
        )
        .cast("date")
        .alias("conv_day"),
    )
    first_hex = F.ascii(F.substring(F.md5(F.col("user_id").cast("string")), 1, 1))
    converted = F.col("conv_day").isNotNull()
    return users.select(
        "user_id",
        F.when(converted, F.datediff("conv_day", "first_day"))
        .otherwise(F.datediff("last_day", "first_day"))
        .cast("bigint")
        .alias("t"),
        F.when(converted, 1).otherwise(0).alias("ev"),
        F.when(first_hex % 2 == 0, "A").otherwise("B").alias("grp"),
    )


def _risk_frame(users: DataFrame) -> DataFrame:
    """(t, n_risk, d) over the distinct-lifetime frame: n_risk via the
    DESCENDING cumulative count (users with lifetime ≥ t are exactly the
    suffix sum — no per-user join), deaths d as the per-t event sum."""
    per_t = users.groupBy("t").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_t"),
        F.sum("ev").cast("bigint").alias("d"),
    )
    wdesc = Window.orderBy(F.desc("t")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    return per_t.select(
        "t", F.sum("n_t").over(wdesc).cast("bigint").alias("n_risk"), "d"
    )


_RISK_SQL = """
        per_t AS (
          SELECT t, CAST(COUNT(*) AS BIGINT) AS n_t,
                 CAST(SUM(ev) AS BIGINT) AS d
          FROM lifetimes GROUP BY t
        ),
        risk AS (
          SELECT t, CAST(SUM(n_t) OVER (ORDER BY t DESC) AS BIGINT) AS n_risk, d
          FROM per_t
        )
"""


# ---------------------------------------------------------------------------
# q_kaplan_meier — product-limit survival curve + Greenwood SE
# ---------------------------------------------------------------------------


@query(
    "q_kaplan_meier",
    oracle=f"""
        WITH {_SURV_USERS_SQL},
        {_RISK_SQL},
        steps AS (
          SELECT t, n_risk, d,
                 CASE WHEN d < n_risk
                      THEN round(ln(CAST(n_risk - d AS DOUBLE) / n_risk), 12)
                 END AS lnf,
                 CASE WHEN d < n_risk
                      THEN round(CAST(d AS DOUBLE)
                                 / (CAST(n_risk AS DOUBLE) * (n_risk - d)), 12)
                 END AS gw,
                 CASE WHEN d = n_risk THEN 1 ELSE 0 END AS z
          FROM risk WHERE d > 0
        ),
        curve AS (
          SELECT t, n_risk, d,
                 MAX(z) OVER (ORDER BY t) AS dead,
                 CAST(SUM(CAST(lnf AS DECIMAL(28,12))) OVER (ORDER BY t)
                      AS DOUBLE) AS lnsum,
                 CAST(SUM(CAST(gw AS DECIMAL(28,12))) OVER (ORDER BY t)
                      AS DOUBLE) AS gwsum
          FROM steps
        )
        SELECT t, n_risk, d,
               CASE WHEN dead = 1 THEN 0.0
                    ELSE round(exp(lnsum), 9) + 0.0 END AS s_km,
               CASE WHEN dead = 1 THEN NULL
                    ELSE round((round(exp(lnsum), 9) + 0.0)
                               * sqrt(gwsum), 9) + 0.0 END AS se_greenwood
        FROM curve
    """,
)
def q_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier product-limit survival estimate over user lifetimes:
    S(t) = Π_(t_j ≤ t) (1 − d_j/n_j) across distinct death times, with
    the Greenwood standard error S(t)·sqrt(Σ d_j/(n_j(n_j−d_j))) — the
    censoring-correct conversion curve ("what fraction of users remain
    unconverted past day t of their tenure?") that a naive
    mean-time-to-convert readout gets wrong whenever anyone has not
    converted by their last observed activity.

    The product is computed as exp of the DECIMAL(28,12) running sum of
    12-dp-rounded ln((n−d)/n) factors (order-free, engine-identical; the
    q_bh_fdr runtime-exp precedent); once any death time exhausts its
    risk set (d = n) a cumulative flag pins S(t) = 0 for every later t
    on both engines — no ln(0) is ever evaluated.  The Greenwood SE
    multiplies the ROUNDED 9-dp S (one shared spelling) by sqrt of the
    decimal-accumulated variance sum, and is NULL past the zero point
    (the classic estimator is undefined there).

    Scale shape: see module docstring — one user aggregate, then
    cumulative windows over the calendar-bounded distinct-lifetime
    frame."""
    users = _surv_users(spark, sf_dir)
    steps = (
        _risk_frame(users)
        .filter(F.col("d") > 0)
        .select(
            "t",
            "n_risk",
            "d",
            F.when(
                F.col("d") < F.col("n_risk"),
                F.round(
                    F.log(
                        (F.col("n_risk") - F.col("d")).cast("double")
                        / F.col("n_risk")
                    ),
                    12,
                ),
            ).alias("lnf"),
            F.when(
                F.col("d") < F.col("n_risk"),
                F.round(
                    F.col("d").cast("double")
                    / (
                        F.col("n_risk").cast("double")
                        * (F.col("n_risk") - F.col("d"))
                    ),
                    12,
                ),
            ).alias("gw"),
            F.when(F.col("d") == F.col("n_risk"), 1).otherwise(0).alias("z"),
        )
    )
    wasc = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    curve = steps.select(
        "t",
        "n_risk",
        "d",
        F.max("z").over(wasc).alias("dead"),
        F.sum(F.col("lnf").cast(_D2812)).over(wasc).cast("double").alias("lnsum"),
        F.sum(F.col("gw").cast(_D2812)).over(wasc).cast("double").alias("gwsum"),
    )
    s_km = F.round(F.exp(F.col("lnsum")), 9) + F.lit(0.0)
    return curve.select(
        "t",
        "n_risk",
        "d",
        F.when(F.col("dead") == 1, F.lit(0.0)).otherwise(s_km).alias("s_km"),
        F.when(
            F.col("dead") == 1, F.lit(None).cast("double")
        )
        .otherwise(F.round(s_km * F.sqrt(F.col("gwsum")), 9) + F.lit(0.0))
        .alias("se_greenwood"),
    )


# ---------------------------------------------------------------------------
# q_nelson_aalen — cumulative hazard + variance
# ---------------------------------------------------------------------------


@query(
    "q_nelson_aalen",
    oracle=f"""
        WITH {_SURV_USERS_SQL},
        {_RISK_SQL},
        steps AS (
          SELECT t, n_risk, d,
                 round(CAST(d AS DOUBLE) / n_risk, 12) AS hinc,
                 round(CAST(d AS DOUBLE)
                       / (CAST(n_risk AS DOUBLE) * n_risk), 12) AS vinc
          FROM risk WHERE d > 0
        )
        SELECT t, n_risk, d,
               round(CAST(SUM(CAST(hinc AS DECIMAL(28,12)))
                          OVER (ORDER BY t) AS DOUBLE), 9) + 0.0 AS h_na,
               round(sqrt(CAST(SUM(CAST(vinc AS DECIMAL(28,12)))
                               OVER (ORDER BY t) AS DOUBLE)), 9) + 0.0
                 AS se_na
        FROM steps
    """,
)
def q_nelson_aalen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nelson-Aalen cumulative hazard over user lifetimes:
    H(t) = Σ_(t_j ≤ t) d_j/n_j with variance Σ d_j/n_j² — the additive
    companion to q_kaplan_meier (H stays finite and defined where the KM
    product hits zero, and −ln S ≈ H is the standard cross-check between
    the two estimators).

    Determinism: each hazard/variance increment is one integer-ratio
    double rounded at 12 dp; the cumulative sums run in DECIMAL(28,12)
    (order-free) over the bounded distinct-death-time frame; outputs
    round at 9 dp with +0.0.  No zero-denominator exists (every death
    time has n_risk ≥ d ≥ 1)."""
    users = _surv_users(spark, sf_dir)
    steps = (
        _risk_frame(users)
        .filter(F.col("d") > 0)
        .select(
            "t",
            "n_risk",
            "d",
            F.round(F.col("d").cast("double") / F.col("n_risk"), 12).alias(
                "hinc"
            ),
            F.round(
                F.col("d").cast("double")
                / (F.col("n_risk").cast("double") * F.col("n_risk")),
                12,
            ).alias("vinc"),
        )
    )
    wasc = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    return steps.select(
        "t",
        "n_risk",
        "d",
        (
            F.round(
                F.sum(F.col("hinc").cast(_D2812)).over(wasc).cast("double"), 9
            )
            + F.lit(0.0)
        ).alias("h_na"),
        (
            F.round(
                F.sqrt(
                    F.sum(F.col("vinc").cast(_D2812)).over(wasc).cast("double")
                ),
                9,
            )
            + F.lit(0.0)
        ).alias("se_na"),
    )


# ---------------------------------------------------------------------------
# q_logrank_test — two-group log-rank over the A/B assignment
# ---------------------------------------------------------------------------


@query(
    "q_logrank_test",
    oracle=f"""
        WITH {_SURV_USERS_SQL},
        per_tg AS (
          SELECT t, grp, CAST(COUNT(*) AS BIGINT) AS n_t,
                 CAST(SUM(ev) AS BIGINT) AS d
          FROM lifetimes GROUP BY t, grp
        ),
        spine AS (
          SELECT ts.t, g.grp,
                 COALESCE(p.n_t, 0) AS n_t, COALESCE(p.d, 0) AS d
          FROM (SELECT DISTINCT t FROM lifetimes) ts
          CROSS JOIN (SELECT 'A' AS grp UNION ALL SELECT 'B') g
          LEFT JOIN per_tg p ON p.t = ts.t AND p.grp = g.grp
        ),
        riskg AS (
          SELECT t, grp,
                 CAST(SUM(n_t) OVER (PARTITION BY grp ORDER BY t DESC)
                      AS BIGINT) AS n_risk,
                 d
          FROM spine
        ),
        times AS (
          SELECT t,
                 CAST(SUM(n_risk) AS BIGINT) AS n,
                 CAST(SUM(d) AS BIGINT) AS dd,
                 CAST(SUM(CASE WHEN grp = 'A' THEN n_risk END) AS BIGINT)
                   AS n1,
                 CAST(SUM(CASE WHEN grp = 'A' THEN d END) AS BIGINT) AS d1
          FROM riskg GROUP BY t HAVING SUM(d) > 0
        ),
        terms AS (
          SELECT dd, d1,
                 round(CAST(dd AS DOUBLE) * n1 / n, 12) AS e1,
                 CASE WHEN n > 1 THEN
                   round((CAST(dd AS DOUBLE) * n1 * (n - n1) * (n - dd))
                         / (CAST(n AS DOUBLE) * n * (n - 1)), 12)
                 ELSE 0.0 END AS v1
          FROM times
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_times,
               CAST(SUM(d1) AS BIGINT) AS o_a,
               round(CAST(SUM(CAST(e1 AS DECIMAL(28,12))) AS DOUBLE), 9)
                 + 0.0 AS e_a,
               CAST(SUM(dd - d1) AS BIGINT) AS o_b,
               round(CAST(SUM(dd) - SUM(CAST(e1 AS DECIMAL(28,12)))
                          AS DOUBLE), 9) + 0.0 AS e_b,
               CASE WHEN SUM(CAST(v1 AS DECIMAL(28,12))) > 0 THEN
                 round((SUM(d1) - CAST(SUM(CAST(e1 AS DECIMAL(28,12)))
                                       AS DOUBLE))
                       * (SUM(d1) - CAST(SUM(CAST(e1 AS DECIMAL(28,12)))
                                         AS DOUBLE))
                       / CAST(SUM(CAST(v1 AS DECIMAL(28,12))) AS DOUBLE),
                       9) + 0.0
               END AS chi2_logrank
        FROM terms HAVING COUNT(*) > 0
    """,
)
def q_logrank_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-group log-rank test (Mantel 1966) between the A/B assignment
    arms: at every distinct death time the hypergeometric expectation
    E[d_A] = d·n_A/n and variance d·n_A(n−n_A)(n−d)/(n²(n−1)) accumulate
    into χ² = (O_A − E_A)²/ΣV — "do arm-A users convert at the same
    SPEED as arm B?", the survival-analysis twin of q_mantel_haenszel
    (each conversion time is its own 2×2 stratum).

    Determinism: at-risk and death counts are exact integers from one
    per-lifetime conditional aggregate (a group absent at a time
    contributes exact zeros via the conditional count/sum, identical to
    the old explicit spine's coalesced zeros — suffix sums commute with
    the group split); per-time E and V are integer-ratio doubles rounded at 12 dp,
    summed order-free in DECIMAL(28,12); the final χ² is one identical
    IEEE tree rounded at 9 dp.  V's integer products are formed in
    DOUBLE (never BIGINT — the q_anderson_darling overflow lesson);
    times with n = 1 contribute zero variance by exact condition; a
    corpus with no deaths yields no row (HAVING over the death-time
    frame on both engines)."""
    users = _surv_users(spark, sf_dir)
    # Fused spine (r11 opt, guide §2.4): the old spelling materialized a
    # (t × {A,B}) spine (distinct ⋈ 2-row literal ⋈ per-(t,grp) counts),
    # ran a per-group suffix-sum window, then re-aggregated per t — four
    # extra operators whose only effect was zero-filling absent groups.
    # The per-t conditional aggregate below produces the identical exact
    # integers directly: n_a(t) = |A users with lifetime t| is 0 when no A
    # row exists (what the spine's coalesce manufactured), and the suffix
    # sums over the distinct-lifetime frame commute with the group split
    # (Σ_g suffix = suffix of Σ_g).  One aggregate + one bounded
    # single-partition window (the audited q_kaplan_meier shape) replace
    # aggregate + distinct + crossJoin + join + 2-partition window +
    # re-aggregate.
    per_t = users.groupBy("t").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_all"),
        F.sum("ev").cast("bigint").alias("d_all"),
        F.count(F.when(F.col("grp") == "A", F.lit(1)))
        .cast("bigint")
        .alias("n_a"),
        F.coalesce(F.sum(F.when(F.col("grp") == "A", F.col("ev"))), F.lit(0))
        .cast("bigint")
        .alias("d_a"),
    )
    wdesc = Window.orderBy(F.desc("t")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    times = (
        per_t.select(
            "t",
            F.sum("n_all").over(wdesc).cast("bigint").alias("n"),
            F.col("d_all").alias("dd"),
            F.sum("n_a").over(wdesc).cast("bigint").alias("n1"),
            F.col("d_a").alias("d1"),
        )
        .filter(F.col("dd") > 0)
    )
    terms = times.select(
        "dd",
        "d1",
        F.round(F.col("dd").cast("double") * F.col("n1") / F.col("n"), 12).alias(
            "e1"
        ),
        F.when(
            F.col("n") > 1,
            F.round(
                (
                    F.col("dd").cast("double")
                    * F.col("n1")
                    * (F.col("n") - F.col("n1"))
                    * (F.col("n") - F.col("dd"))
                )
                / (F.col("n").cast("double") * F.col("n") * (F.col("n") - 1)),
                12,
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("v1"),
    )
    agg = terms.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_times"),
        F.sum("d1").cast("bigint").alias("o_a"),
        F.sum(F.col("e1").cast(_D2812)).alias("e1_dec"),
        F.sum(F.col("dd") - F.col("d1")).cast("bigint").alias("o_b"),
        F.sum("dd").alias("dd_sum"),
        F.sum(F.col("v1").cast(_D2812)).alias("v_dec"),
    ).filter(F.col("n_times") > 0)
    e_a = F.col("e1_dec").cast("double")
    dev = F.col("o_a") - e_a
    return agg.select(
        "n_times",
        "o_a",
        (F.round(e_a, 9) + F.lit(0.0)).alias("e_a"),
        "o_b",
        (
            F.round((F.col("dd_sum") - F.col("e1_dec")).cast("double"), 9)
            + F.lit(0.0)
        ).alias("e_b"),
        F.when(
            F.col("v_dec") > 0,
            F.round(dev * dev / F.col("v_dec").cast("double"), 9) + F.lit(0.0),
        ).alias("chi2_logrank"),
    )


# ---------------------------------------------------------------------------
# q_rmst — restricted mean survival (conversion-free) time
# ---------------------------------------------------------------------------

_RMST_TAU = 14  # days: the restriction horizon (a plan literal)


@query(
    "q_rmst",
    oracle=f"""
        WITH {_SURV_USERS_SQL},
        {_RISK_SQL},
        steps AS (
          SELECT t, n_risk, d,
                 CASE WHEN d < n_risk
                      THEN round(ln(CAST(n_risk - d AS DOUBLE) / n_risk), 12)
                 END AS lnf,
                 CASE WHEN d = n_risk THEN 1 ELSE 0 END AS z
          FROM risk WHERE d > 0
        ),
        curve0 AS (
          SELECT t, n_risk, d,
                 MAX(z) OVER (ORDER BY t) AS dead,
                 CASE WHEN MAX(z) OVER (ORDER BY t) = 1 THEN 0.0
                      ELSE round(exp(CAST(SUM(CAST(lnf AS DECIMAL(28,12)))
                                          OVER (ORDER BY t) AS DOUBLE)), 9)
                           + 0.0 END AS s
          FROM steps
        ),
        curve AS (
          SELECT t, n_risk, d, dead, s,
                 COALESCE(LAG(s) OVER (ORDER BY t), 1.0) AS s_prev,
                 COALESCE(LAG(t) OVER (ORDER BY t), 0) AS t_prev
          FROM curve0
        ),
        segs AS (
          SELECT t, n_risk, d, dead, s,
                 CAST(round(s_prev * (LEAST(CAST(t AS DOUBLE), {_RMST_TAU}.0)
                            - LEAST(CAST(t_prev AS DOUBLE), {_RMST_TAU}.0)),
                            12) AS DECIMAL(28,12)) AS seg
          FROM curve
        ),
        folded AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n_times,
                 CAST(SUM(seg) AS DECIMAL(28,12)) AS area_in,
                 CAST(round(MAX_BY(s, t)
                            * ({_RMST_TAU}.0
                               - LEAST(CAST(MAX(t) AS DOUBLE), {_RMST_TAU}.0)),
                            12) AS DECIMAL(28,12)) AS tail
          FROM segs
        ),
        vterms AS (
          SELECT g.t,
                 round(CAST(f.area_in + f.tail
                            - SUM(g.seg) OVER (ORDER BY g.t) AS DOUBLE)
                       * CAST(f.area_in + f.tail
                              - SUM(g.seg) OVER (ORDER BY g.t) AS DOUBLE)
                       * g.d / (CAST(g.n_risk AS DOUBLE)
                                * (g.n_risk - g.d)), 12) AS vt
          FROM segs g, folded f
          WHERE g.d < g.n_risk AND g.t < {_RMST_TAU}
        ),
        users_n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM lifetimes)
        SELECT CAST({_RMST_TAU} AS BIGINT) AS tau,
               u.n AS n_users,
               COALESCE(f.n_times, 0) AS n_times,
               CASE WHEN f.n_times IS NULL OR f.n_times = 0
                    THEN {_RMST_TAU}.0 + 0.0
                    ELSE round(CAST(f.area_in + f.tail AS DOUBLE), 9) + 0.0
               END AS rmst,
               CASE WHEN f.n_times IS NULL OR f.n_times = 0 THEN 0.0
                    ELSE round(sqrt(COALESCE(
                           (SELECT CAST(SUM(CAST(vt AS DECIMAL(28,12)))
                                        AS DOUBLE) FROM vterms), 0.0)), 9)
                         + 0.0
               END AS se_rmst
        FROM users_n u LEFT JOIN folded f ON TRUE
        WHERE u.n > 0
    """,
)
def q_rmst(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Restricted mean survival time (RMST) to τ = 14 days: the area
    under the Kaplan-Meier curve on [0, τ] — "how many conversion-free
    days does an average user spend in their first τ days?", the
    censoring-correct summary the clinical literature recommends over
    hazard ratios when proportionality is doubtful (Royston & Parmar
    2013), with the standard large-sample variance
    Σ_j A_j²·d_j/(n_j(n_j−d_j)) where A_j is the REMAINING area after
    death time t_j (Klein & Moeschberger §4.5).

    The step integral folds on the same distinct-lifetime KM frame:
    each death time contributes s_(j−1)·(min(t_j,τ) − min(t_(j−1),τ))
    (lag windows with (0, 1) defaults), plus the s_k tail to τ; A_j is
    the exact DECIMAL difference between the total area and the
    ascending segment prefix.  Corner cases by exact condition on both
    engines: no users → no row; users but no deaths → rmst = τ, se = 0;
    a death time exhausting its risk set inside τ → the KM zero flag
    pins S = 0 (the area stays exact) and that time's variance term is
    its A_j → 0 limit, i.e. ZERO — the d < n filter realizes the limit,
    so se stays defined (unlike pointwise Greenwood, the AREA after the
    zero point is exactly 0 and contributes no uncertainty).

    Determinism: s is the ROUNDED 9-dp KM value (one spelling with
    q_kaplan_meier); segments and variance terms round at 12 dp into
    DECIMAL(28,12) (order-free); finals round at 9 dp with +0.0."""
    users = _surv_users(spark, sf_dir)
    users = users.localCheckpoint(eager=True)  # risk frame + user count
    tau = F.lit(float(_RMST_TAU))
    steps = (
        _risk_frame(users)
        .filter(F.col("d") > 0)
        .select(
            "t",
            "n_risk",
            "d",
            F.when(
                F.col("d") < F.col("n_risk"),
                F.round(
                    F.log(
                        (F.col("n_risk") - F.col("d")).cast("double")
                        / F.col("n_risk")
                    ),
                    12,
                ),
            ).alias("lnf"),
            F.when(F.col("d") == F.col("n_risk"), 1).otherwise(0).alias("z"),
        )
    )
    wasc = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    wlag = Window.orderBy("t")
    s_col = F.when(F.max("z").over(wasc) == 1, F.lit(0.0)).otherwise(
        F.round(
            F.exp(F.sum(F.col("lnf").cast(_D2812)).over(wasc).cast("double")),
            9,
        )
        + F.lit(0.0)
    )
    curve = steps.select(
        "t",
        "n_risk",
        "d",
        F.max("z").over(wasc).alias("dead"),
        s_col.alias("s"),
        F.coalesce(F.lag(s_col).over(wlag), F.lit(1.0)).alias("s_prev"),
        F.coalesce(F.lag("t").over(wlag), F.lit(0)).alias("t_prev"),
    )
    segs = curve.select(
        "t",
        "n_risk",
        "d",
        "dead",
        "s",
        F.round(
            F.col("s_prev")
            * (
                F.least(F.col("t").cast("double"), tau)
                - F.least(F.col("t_prev").cast("double"), tau)
            ),
            12,
        )
        .cast(_D2812)
        .alias("seg"),
    ).localCheckpoint(eager=True)  # totals fold + variance walk
    folded = segs.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_times"),
        F.sum("seg").cast(_D2812).alias("area_in"),
        F.round(
            F.max_by("s", "t")
            * (tau - F.least(F.max("t").cast("double"), tau)),
            12,
        )
        .cast(_D2812)
        .alias("tail"),
    )
    total_area = F.col("area_in") + F.col("tail")
    vterms = (
        segs.crossJoin(F.broadcast(folded))
        .filter((F.col("d") < F.col("n_risk")) & (F.col("t") < _RMST_TAU))
        .select(
            F.round(
                (total_area - F.sum("seg").over(wasc)).cast("double")
                * (total_area - F.sum("seg").over(wasc)).cast("double")
                * F.col("d")
                / (
                    F.col("n_risk").cast("double")
                    * (F.col("n_risk") - F.col("d"))
                ),
                12,
            ).alias("vt")
        )
    )
    vsum = vterms.agg(
        F.coalesce(F.sum(F.col("vt").cast(_D2812)).cast("double"), F.lit(0.0))
        .alias("v")
    )
    users_n = users.agg(F.count(F.lit(1)).cast("bigint").alias("n")).filter(
        F.col("n") > 0
    )
    out = (
        users_n.crossJoin(F.broadcast(folded))
        .crossJoin(F.broadcast(vsum))
    )
    empty_curve = F.col("n_times").isNull() | (F.col("n_times") == 0)
    return out.select(
        F.lit(_RMST_TAU).cast("bigint").alias("tau"),
        F.col("n").alias("n_users"),
        F.coalesce("n_times", F.lit(0)).cast("bigint").alias("n_times"),
        F.when(empty_curve, F.lit(float(_RMST_TAU)) + F.lit(0.0))
        .otherwise(F.round(total_area.cast("double"), 9) + F.lit(0.0))
        .alias("rmst"),
        F.when(empty_curve, F.lit(0.0))
        .otherwise(F.round(F.sqrt(F.col("v")), 9) + F.lit(0.0))
        .alias("se_rmst"),
    )
