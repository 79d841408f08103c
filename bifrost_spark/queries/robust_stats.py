"""Round-8 robust / nonparametric statistics family.

The k-group, paired, and robust counterparts to round 7's two-sample
eval_stats operators — the tests an experimentation or data-quality team
reaches for when cohorts number more than two, measurements are paired,
or outliers would poison a moment-based answer.  Every operator reduces
to the engine's established exact shapes (distinct-value frames with
2x-rank integers, DECIMAL(38,0) rank algebra, decimal-accumulated
moments, bounded windows):

* **k-group rank test** (``q_kruskal_wallis``) — Kruskal & Wallis (1952)
  H with tie correction: "do document lengths differ across SOURCES?",
  the k-sample generalization of q_mann_whitney, folded over the same
  distinct-value frame (|distinct lengths|, never |docs|);
* **paired rank test** (``q_wilcoxon_signed_rank``) — Wilcoxon (1945)
  signed-rank z on per-user activity shift between the two halves of the
  month; integer differences keep the |d| frame bounded by the activity
  range, not the user count;
* **ordinal association** (``q_kendall_tau``) — Kendall (1945) tau-b
  with tie correction over the bounded 10x10 (length-bin, token-bin)
  contingency grid: concordant/discordant mass via the cell-pair
  self-join (at most 100x100 cell pairs at ANY corpus size);
* **k-group mean test** (``q_anova_f``) — one-way ANOVA F (Fisher) from
  exact decimal moments via the sum-of-squares identities, plus the
  eta-squared effect size;
* **robust spread test** (``q_brown_forsythe``) — Brown & Forsythe
  (1974): ANOVA F on absolute deviations from group MEDIANS — the
  variance-homogeneity check that survives heavy tails (the Levene
  family's recommended center);
* **repeated-measures rank test** (``q_friedman_test``) — Friedman
  (1937) chi-square with tie correction over complete user x event-type
  blocks (each user ranks the k event types by mean metric);
* **standardized effect size** (``q_cohens_d``) — Cohen's d with the
  Hedges & Olkin (1985) small-sample correction g and its normal CI:
  the "how big, in pooled-SD units" companion every significance test
  needs;
* **robust outlier shortlist** (``q_mad_outliers``) — the modified
  z-score of Iglewicz & Hoaglin (1993), 0.6745·(x−median)/MAD, ranked
  — the median/MAD twin of q_top_anomalies' mean/sigma scoring.

Determinism discipline (house rules): rank sums and tie terms fold over
distinct-value frames as 2x-rank INTEGERS accumulated in DECIMAL(38,0)
(exact, order-free — no per-row global sort exists anywhere); moment
sums accumulate in DECIMAL (the dsum contract); deep-fraction addends
round at 12 dp into DECIMAL(28,12) before summing; compared doubles are
identically-spelled IEEE trees rounded at 9 dp with +0.0 canonicalizing
-0.0; medians interpolate dyadic probes over 2-dp values (one add + one
halve — the q_percentile_cont exactness argument); degenerate inputs
(zero variance, all-tied ranks, zero MAD) yield NULL or no row via
integer-exact conditions on both engines.  All outputs are scalar
columns (driver canonicalization).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bifrost_spark.registry import query
from bifrost_spark.tables import load_table

_D38 = "decimal(38,0)"
_D2812 = "decimal(28,12)"

# ---------------------------------------------------------------------------
# q_anova_f — one-way ANOVA over event types
# ---------------------------------------------------------------------------


@query(
    "q_anova_f",
    oracle="""
        WITH g AS (
          SELECT event_type,
                 CAST(COUNT(*) AS BIGINT) AS n,
                 SUM(CAST(value AS DECIMAL(28,6))) AS s,
                 SUM(CAST(value * value AS DECIMAL(28,6))) AS ss
          FROM events WHERE value IS NOT NULL
          GROUP BY event_type
        ),
        f AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS k,
                 CAST(SUM(n) AS BIGINT) AS n,
                 CAST(SUM(s) AS DOUBLE) AS s_all,
                 CAST(SUM(ss) AS DOUBLE) AS ss_all,
                 CAST(SUM(CAST(round(CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                                     / n, 12) AS DECIMAL(28,12)))
                      AS DOUBLE) AS between_raw
          FROM g
        )
        SELECT k, n,
               CAST(k - 1 AS BIGINT) AS dof1,
               CAST(n - k AS BIGINT) AS dof2,
               CASE WHEN n > k AND k > 1
                         AND (ss_all - between_raw) > 0
                    THEN round(((between_raw - s_all * s_all / n) / (k - 1))
                               / ((ss_all - between_raw) / (n - k)), 9) + 0.0
               END AS f_stat,
               CASE WHEN (ss_all - s_all * s_all / n) > 0
                    THEN round((between_raw - s_all * s_all / n)
                               / (ss_all - s_all * s_all / n), 9) + 0.0
               END AS eta2
        FROM f
    """,
)
def q_anova_f(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA: does the mean metric differ across the k event
    types?  F = (SSB/(k−1))/(SSW/(N−k)) via the sum-of-squares
    identities SSB = Σ s_j²/n_j − S²/N and SSW = Σ ss_j − Σ s_j²/n_j,
    so the whole test is ONE map-side-combined hash aggregate to k group
    rows plus a scalar fold — no second pass for deviations.  Also
    reports eta² = SSB/SST, the variance-explained effect size.

    Determinism: per-group s/ss are exact decimal sums (2-dp metric →
    4-dp squares, the dsum contract); each s_j²/n_j addend rounds at
    12 dp into DECIMAL(28,12) (order-free across the k rows); F and
    eta² are identically-spelled IEEE trees rounded at 9 dp.  Zero
    within-variance or k<2 yields NULL by exact conditions.

    Scale shape: the aggregate ships ≤ k partials per task; the fold
    runs on k rows.  Nothing scales past the scan at 100 TB."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    g = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("value").cast("decimal(28,6)")).alias("s"),
        F.sum((F.col("value") * F.col("value")).cast("decimal(28,6)")).alias("ss"),
    )
    sd = F.col("s").cast("double")
    f = g.agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum("n").cast("bigint").alias("n"),
        F.sum("s").cast("double").alias("s_all"),
        F.sum("ss").cast("double").alias("ss_all"),
        F.sum(F.round(sd * sd / F.col("n"), 12).cast(_D2812))
        .cast("double")
        .alias("between_raw"),
    )
    ssb = F.col("between_raw") - F.col("s_all") * F.col("s_all") / F.col("n")
    ssw = F.col("ss_all") - F.col("between_raw")
    sst = F.col("ss_all") - F.col("s_all") * F.col("s_all") / F.col("n")
    return f.select(
        "k",
        "n",
        (F.col("k") - 1).cast("bigint").alias("dof1"),
        (F.col("n") - F.col("k")).cast("bigint").alias("dof2"),
        F.when(
            (F.col("n") > F.col("k")) & (F.col("k") > 1) & (ssw > 0),
            F.round((ssb / (F.col("k") - 1)) / (ssw / (F.col("n") - F.col("k"))), 9)
            + F.lit(0.0),
        ).alias("f_stat"),
        F.when(sst > 0, F.round(ssb / sst, 9) + F.lit(0.0)).alias("eta2"),
    )


# ---------------------------------------------------------------------------
# q_cohens_d — standardized mean difference with Hedges correction
# ---------------------------------------------------------------------------

_Z975 = 1.959963984540054  # Phi^-1(0.975), fixed literal on both engines


@query(
    "q_cohens_d",
    oracle=f"""
        WITH g AS (
          SELECT (lang IS NOT DISTINCT FROM 'en') AS en,
                 CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(CAST(n_chars AS DECIMAL(38,0))) AS DOUBLE) AS s,
                 CAST(SUM(CAST(n_chars * n_chars AS DECIMAL(38,0)))
                      AS DOUBLE) AS ss
          FROM documents
          WHERE text IS NOT NULL AND n_chars IS NOT NULL
          GROUP BY 1
        ),
        p AS (
          SELECT MAX(CASE WHEN en THEN n END) AS n1,
                 MAX(CASE WHEN en THEN s END) AS s1,
                 MAX(CASE WHEN en THEN ss END) AS ss1,
                 MAX(CASE WHEN NOT en THEN n END) AS n2,
                 MAX(CASE WHEN NOT en THEN s END) AS s2,
                 MAX(CASE WHEN NOT en THEN ss END) AS ss2
          FROM g
        ),
        c AS (
          SELECT n1, n2, s1 / n1 AS m1, s2 / n2 AS m2,
                 ((ss1 - s1 * s1 / n1) + (ss2 - s2 * s2 / n2))
                   / (n1 + n2 - 2) AS sp2
          FROM p WHERE n1 >= 2 AND n2 >= 2
        )
        SELECT CAST(n1 AS BIGINT) AS n_en,
               CAST(n2 AS BIGINT) AS n_other,
               round(m1, 9) + 0.0 AS mean_en,
               round(m2, 9) + 0.0 AS mean_other,
               CASE WHEN sp2 > 0 THEN
                 round((m1 - m2) / sqrt(sp2), 9) + 0.0 END AS cohens_d,
               CASE WHEN sp2 > 0 THEN
                 round((1.0 - 3.0 / (4.0 * (n1 + n2) - 9.0))
                       * ((m1 - m2) / sqrt(sp2)), 9) + 0.0 END AS hedges_g,
               CASE WHEN sp2 > 0 THEN
                 round((1.0 - 3.0 / (4.0 * (n1 + n2) - 9.0))
                       * ((m1 - m2) / sqrt(sp2))
                       - {_Z975} * sqrt((n1 + n2) / (n1 * n2)
                            + ((m1 - m2) / sqrt(sp2))
                              * ((m1 - m2) / sqrt(sp2))
                              / (2.0 * (n1 + n2))), 9) + 0.0 END AS ci_lo,
               CASE WHEN sp2 > 0 THEN
                 round((1.0 - 3.0 / (4.0 * (n1 + n2) - 9.0))
                       * ((m1 - m2) / sqrt(sp2))
                       + {_Z975} * sqrt((n1 + n2) / (n1 * n2)
                            + ((m1 - m2) / sqrt(sp2))
                              * ((m1 - m2) / sqrt(sp2))
                              / (2.0 * (n1 + n2))), 9) + 0.0 END AS ci_hi
        FROM c
    """,
)
def q_cohens_d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Standardized effect size of the English-vs-rest length gap:
    Cohen's d = (m1−m2)/s_pooled, the Hedges & Olkin small-sample
    correction g = J·d with J = 1 − 3/(4(n1+n2)−9), and the normal
    95% CI on g with SE² = (n1+n2)/(n1·n2) + d²/(2(n1+n2)) — the
    magnitude report that makes q_mann_whitney's "significant?" answer
    actionable ("how big?").

    Determinism: n_chars is an integer column, so every moment is an
    exact DECIMAL(38,0) sum; means, pooled variance, d, g, and the CI
    are identically-spelled IEEE trees over those exact images, rounded
    at 9 dp with +0.0.  Either cohort under 2 rows → no row; zero
    pooled variance → NULL effect columns — both integer-exact
    conditions.

    Scale shape: one map-side-combined aggregate to 2 cohort rows, then
    scalar algebra.  Nothing but the scan grows with the corpus."""
    d = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull() & F.col("n_chars").isNotNull()
    )
    en = F.col("lang").eqNullSafe("en")
    g = d.groupBy(en.alias("en")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("n_chars").cast(_D38)).cast("double").alias("s"),
        F.sum((F.col("n_chars") * F.col("n_chars")).cast(_D38))
        .cast("double")
        .alias("ss"),
    )
    p = g.agg(
        F.max(F.when(F.col("en"), F.col("n"))).alias("n1"),
        F.max(F.when(F.col("en"), F.col("s"))).alias("s1"),
        F.max(F.when(F.col("en"), F.col("ss"))).alias("ss1"),
        F.max(F.when(~F.col("en"), F.col("n"))).alias("n2"),
        F.max(F.when(~F.col("en"), F.col("s"))).alias("s2"),
        F.max(F.when(~F.col("en"), F.col("ss"))).alias("ss2"),
    ).filter((F.col("n1") >= 2) & (F.col("n2") >= 2))
    n1, n2 = F.col("n1"), F.col("n2")
    m1 = F.col("s1") / n1
    m2 = F.col("s2") / n2
    sp2 = (
        (F.col("ss1") - F.col("s1") * F.col("s1") / n1)
        + (F.col("ss2") - F.col("s2") * F.col("s2") / n2)
    ) / (n1 + n2 - 2)
    c = p.select(
        n1.cast("bigint").alias("n_en"),
        n2.cast("bigint").alias("n_other"),
        (F.round(m1, 9) + F.lit(0.0)).alias("mean_en"),
        (F.round(m2, 9) + F.lit(0.0)).alias("mean_other"),
        m1.alias("_m1"),
        m2.alias("_m2"),
        sp2.alias("_sp2"),
        n1.alias("_n1"),
        n2.alias("_n2"),
    )
    dd = (F.col("_m1") - F.col("_m2")) / F.sqrt(F.col("_sp2"))
    j = F.lit(1.0) - F.lit(3.0) / (F.lit(4.0) * (F.col("_n1") + F.col("_n2")) - 9.0)
    se = F.sqrt(
        (F.col("_n1") + F.col("_n2")) / (F.col("_n1") * F.col("_n2"))
        + dd * dd / (F.lit(2.0) * (F.col("_n1") + F.col("_n2")))
    )
    pos = F.col("_sp2") > 0
    return c.select(
        "n_en",
        "n_other",
        "mean_en",
        "mean_other",
        F.when(pos, F.round(dd, 9) + F.lit(0.0)).alias("cohens_d"),
        F.when(pos, F.round(j * dd, 9) + F.lit(0.0)).alias("hedges_g"),
        F.when(pos, F.round(j * dd - F.lit(_Z975) * se, 9) + F.lit(0.0)).alias(
            "ci_lo"
        ),
        F.when(pos, F.round(j * dd + F.lit(_Z975) * se, 9) + F.lit(0.0)).alias(
            "ci_hi"
        ),
    )


# ---------------------------------------------------------------------------
# q_kruskal_wallis — k-group rank test over the distinct-value frame
# ---------------------------------------------------------------------------


@query(
    "q_kruskal_wallis",
    oracle="""
        WITH pts AS (
          SELECT n_chars AS v, source,
                 CAST(COUNT(*) AS BIGINT) AS c_vs
          FROM documents
          WHERE text IS NOT NULL AND n_chars IS NOT NULL
          GROUP BY 1, 2
        ),
        vf AS (
          SELECT v, SUM(c_vs) AS c_v FROM pts GROUP BY v
        ),
        cum AS (
          SELECT v, c_v,
                 SUM(c_v) OVER (ORDER BY v) - c_v AS cumb
          FROM vf
        ),
        grp AS (
          SELECT p.source,
                 CAST(SUM(p.c_vs) AS BIGINT) AS n_j,
                 SUM(CAST(p.c_vs AS DECIMAL(38,0))
                     * (2 * c.cumb + c.c_v + 1)) AS r2_j
          FROM pts p JOIN cum c ON c.v = p.v
          GROUP BY p.source
        ),
        ties AS (
          SELECT SUM(CAST(c_v AS DECIMAL(38,0)) * c_v * c_v - c_v) AS t
          FROM vf
        ),
        fold AS (
          SELECT CAST(SUM(n_j) AS BIGINT) AS n,
                 CAST(COUNT(*) AS BIGINT) AS k,
                 CAST(SUM(CAST(round(CAST(r2_j AS DOUBLE)
                                     * CAST(r2_j AS DOUBLE)
                                     / (4.0 * n_j), 6)
                               AS DECIMAL(38,6))) AS DOUBLE) AS rterm
          FROM grp
        )
        SELECT n, k, CAST(k - 1 AS BIGINT) AS dof,
               CASE WHEN n > 1 AND k > 1 THEN
                 round(12.0 * rterm / (CAST(n AS DOUBLE) * (n + 1.0))
                       - 3.0 * (n + 1.0), 9) + 0.0 END AS h,
               CASE WHEN n > 1 AND k > 1
                         AND CAST(t AS DOUBLE) <
                             CAST(n AS DOUBLE) * n * n - n THEN
                 round((12.0 * rterm / (CAST(n AS DOUBLE) * (n + 1.0))
                        - 3.0 * (n + 1.0))
                       / (1.0 - CAST(t AS DOUBLE)
                                / (CAST(n AS DOUBLE) * n * n - n)), 9) + 0.0
               END AS h_corrected
        FROM fold, ties
    """,
)
def q_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal-Wallis H (1952): do document lengths differ across the k
    sources, asked RANK-wise — the k-sample generalization of
    q_mann_whitney and the nonparametric stand-in for q_anova_f when the
    metric is skewed.  Reports H and the tie-corrected H/C with
    C = 1 − Σ(t³−t)/(N³−N).

    Scale shape: ONE map-side-combined aggregate to the DISTINCT
    (length, source) frame, the per-length totals and cumulative counts
    over the |distinct lengths| frame (the q_ks_drift device — bounded
    by the value domain, never the corpus), a bounded join back, and a
    k-row fold.  No per-document rank is ever materialized.

    Determinism: average ranks are half-integers, so group rank sums
    fold 2x-rank INTEGERS (2·cumb + c_v + 1) into DECIMAL(38,0) —
    exact and order-free; each R2_j²/(4·n_j) addend is a double on
    exact integer images (R2_j < 2^53 by the fixture contract), rounded
    at 6 dp into DECIMAL(38,6) for an order-free k-row sum; H and the
    correction are identically-spelled IEEE trees rounded at 9 dp.
    All-values-tied (T = N³−N) yields NULL h_corrected exactly."""
    d = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull() & F.col("n_chars").isNotNull()
    )
    pts = d.groupBy(F.col("n_chars").alias("v"), "source").agg(
        F.count(F.lit(1)).cast("bigint").alias("c_vs")
    ).localCheckpoint(eager=True)  # bounded frame; feeds vf + rank join
    vf = pts.groupBy("v").agg(F.sum("c_vs").alias("c_v")).localCheckpoint(
        eager=True
    )  # feeds cum + ties
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    cum = vf.select(
        "v", "c_v", (F.sum("c_v").over(w) - F.col("c_v")).alias("cumb")
    )
    r2 = F.lit(2) * F.col("cumb") + F.col("c_v") + 1
    grp = (
        pts.join(cum, "v")
        .groupBy("source")
        .agg(
            F.sum("c_vs").cast("bigint").alias("n_j"),
            F.sum(F.col("c_vs").cast(_D38) * r2).alias("r2_j"),
        )
    )
    ties = vf.agg(
        F.sum(F.col("c_v").cast(_D38) * F.col("c_v") * F.col("c_v") - F.col("c_v"))
        .alias("t")
    )
    r2d = F.col("r2_j").cast("double")
    fold = grp.agg(
        F.sum("n_j").cast("bigint").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum(
            F.round(r2d * r2d / (F.lit(4.0) * F.col("n_j")), 6).cast(
                "decimal(38,6)"
            )
        )
        .cast("double")
        .alias("rterm"),
    )
    nd = F.col("n").cast("double")
    h = F.lit(12.0) * F.col("rterm") / (nd * (nd + 1.0)) - F.lit(3.0) * (nd + 1.0)
    td = F.col("t").cast("double")
    n3n = nd * nd * nd - nd
    ok = (F.col("n") > 1) & (F.col("k") > 1)
    return fold.crossJoin(F.broadcast(ties)).select(
        "n",
        "k",
        (F.col("k") - 1).cast("bigint").alias("dof"),
        F.when(ok, F.round(h, 9) + F.lit(0.0)).alias("h"),
        F.when(ok & (td < n3n), F.round(h / (F.lit(1.0) - td / n3n), 9) + F.lit(0.0))
        .alias("h_corrected"),
    )


# ---------------------------------------------------------------------------
# q_wilcoxon_signed_rank — paired activity shift between month halves
# ---------------------------------------------------------------------------


@query(
    "q_wilcoxon_signed_rank",
    oracle="""
        WITH per_user AS (
          SELECT user_id,
                 SUM(CASE WHEN day(ts) <= 15 THEN 1 ELSE 0 END) AS h1,
                 SUM(CASE WHEN day(ts) > 15 THEN 1 ELSE 0 END) AS h2
          FROM events WHERE user_id IS NOT NULL
          GROUP BY user_id
        ),
        diffs AS (
          SELECT CAST(h2 - h1 AS BIGINT) AS d FROM per_user WHERE h2 <> h1
        ),
        vf AS (
          SELECT abs(d) AS a,
                 CAST(COUNT(*) AS BIGINT) AS c,
                 CAST(SUM(CASE WHEN d > 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS pos
          FROM diffs GROUP BY abs(d)
        ),
        cum AS (
          SELECT a, c, pos, SUM(c) OVER (ORDER BY a) - c AS cumb FROM vf
        ),
        s AS (
          SELECT CAST(SUM(c) AS BIGINT) AS n,
                 CAST(SUM(pos) AS BIGINT) AS n_pos,
                 SUM(CAST(pos AS DECIMAL(38,0)) * (2 * cumb + c + 1)) AS w2p,
                 SUM(CAST(c AS DECIMAL(38,0)) * c * c - c) AS t
          FROM cum
        )
        SELECT n, n_pos, CAST(n - n_pos AS BIGINT) AS n_neg,
               CAST(w2p AS DOUBLE) / 2.0 AS w_plus,
               CASE WHEN (2.0 * CAST(n AS DOUBLE) * (n + 1.0) * (2.0 * n + 1.0)
                          - CAST(t AS DOUBLE)) > 0 THEN
                 round((CAST(2 * w2p - CAST(n AS DECIMAL(38,0)) * (n + 1)
                             AS DOUBLE) / 4.0)
                       / sqrt((2.0 * CAST(n AS DOUBLE) * (n + 1.0)
                               * (2.0 * n + 1.0)
                               - CAST(t AS DOUBLE)) / 48.0), 9) + 0.0
               END AS z
        FROM s WHERE n > 0
    """,
)
def q_wilcoxon_signed_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilcoxon signed-rank test (1945): did per-user event activity
    SHIFT between the first and second half of the month?  Each user is
    a pair (events in days 1-15, events in days 16+); zero differences
    drop (the standard treatment), |d| gets average ranks, and
    W+ = Σ ranks of positive d with the tie-corrected normal z =
    (W+ − n(n+1)/4) / sqrt(n(n+1)(2n+1)/24 − Σ(t³−t)/48).

    Scale shape: one (user) count aggregate, then everything folds over
    the DISTINCT |d| frame — bounded by the activity-difference RANGE
    (integer counts), never the user count; the cumulative window runs
    on that bounded frame.

    Determinism: d is an integer difference of counts; 2x-rank integers
    (2·cumb + c + 1) weighted by the positive-side counts accumulate in
    DECIMAL(38,0); the z numerator 2·W2+ − n(n+1) is exact integer
    algebra and the variance is exact-integer-imaged doubles — one
    division + sqrt, rounded at 9 dp.  Zero variance (every |d| tied in
    one bin) yields NULL z; no nonzero pairs yields no row."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    per_user = ev.groupBy("user_id").agg(
        F.sum(F.when(F.dayofmonth("ts") <= 15, 1).otherwise(0)).alias("h1"),
        F.sum(F.when(F.dayofmonth("ts") > 15, 1).otherwise(0)).alias("h2"),
    )
    diffs = per_user.filter(F.col("h2") != F.col("h1")).select(
        (F.col("h2") - F.col("h1")).cast("bigint").alias("d")
    )
    vf = diffs.groupBy(F.abs("d").alias("a")).agg(
        F.count(F.lit(1)).cast("bigint").alias("c"),
        F.sum(F.when(F.col("d") > 0, 1).otherwise(0)).cast("bigint").alias("pos"),
    )
    w = Window.orderBy("a").rowsBetween(Window.unboundedPreceding, 0)
    cum = vf.select(
        "a", "c", "pos", (F.sum("c").over(w) - F.col("c")).alias("cumb")
    )
    r2 = F.lit(2) * F.col("cumb") + F.col("c") + 1
    s = cum.agg(
        F.sum("c").cast("bigint").alias("n"),
        F.sum("pos").cast("bigint").alias("n_pos"),
        F.sum(F.col("pos").cast(_D38) * r2).alias("w2p"),
        F.sum(F.col("c").cast(_D38) * F.col("c") * F.col("c") - F.col("c")).alias(
            "t"
        ),
    ).filter(F.col("n") > 0)
    nd = F.col("n").cast("double")
    var48 = (
        F.lit(2.0) * nd * (nd + 1.0) * (F.lit(2.0) * nd + 1.0)
        - F.col("t").cast("double")
    )
    num4 = (
        F.lit(2) * F.col("w2p") - F.col("n").cast(_D38) * (F.col("n") + 1)
    ).cast("double") / F.lit(4.0)
    return s.select(
        "n",
        "n_pos",
        (F.col("n") - F.col("n_pos")).cast("bigint").alias("n_neg"),
        (F.col("w2p").cast("double") / F.lit(2.0)).alias("w_plus"),
        F.when(var48 > 0, F.round(num4 / F.sqrt(var48 / F.lit(48.0)), 9) + F.lit(0.0))
        .alias("z"),
    )


# ---------------------------------------------------------------------------
# q_kendall_tau — tau-b over the bounded ordinal grid
# ---------------------------------------------------------------------------

_KT_XDIV = 64  # n_chars bin width (fixture range 47..558 → bins 0..8)
_KT_YDIV = 10  # token-count bin width
_KT_CAP = 9  # both axes capped to 10 ordinal levels


@query(
    "q_kendall_tau",
    oracle=f"""
        WITH binned AS (
          SELECT LEAST(n_chars // {_KT_XDIV}, {_KT_CAP}) AS xb,
                 LEAST(len(list_filter(string_split(text, ' '),
                                       t -> t <> '')) // {_KT_YDIV},
                       {_KT_CAP}) AS yb
          FROM documents
          WHERE text IS NOT NULL AND n_chars IS NOT NULL
        ),
        cells AS (
          SELECT xb, yb, CAST(COUNT(*) AS BIGINT) AS c
          FROM binned GROUP BY xb, yb
        ),
        pairs AS (
          SELECT SUM(CASE WHEN a.xb < b.xb AND a.yb < b.yb
                          THEN CAST(a.c AS DECIMAL(38,0)) * b.c
                          ELSE CAST(0 AS DECIMAL(38,0)) END) AS conc,
                 SUM(CASE WHEN a.xb < b.xb AND a.yb > b.yb
                          THEN CAST(a.c AS DECIMAL(38,0)) * b.c
                          ELSE CAST(0 AS DECIMAL(38,0)) END) AS disc
          FROM cells a, cells b
        ),
        m AS (
          SELECT CAST(SUM(c) AS DECIMAL(38,0)) AS n,
                 (SELECT SUM(CAST(tx AS DECIMAL(38,0)) * (tx - 1))
                  FROM (SELECT SUM(c) AS tx FROM cells GROUP BY xb)) AS n1x2,
                 (SELECT SUM(CAST(ty AS DECIMAL(38,0)) * (ty - 1))
                  FROM (SELECT SUM(c) AS ty FROM cells GROUP BY yb)) AS n2x2
          FROM cells
        )
        SELECT CAST(n AS BIGINT) AS n,
               CAST(conc AS BIGINT) AS concordant,
               CAST(disc AS BIGINT) AS discordant,
               CASE WHEN CAST(n * (n - 1) - n1x2 AS DOUBLE) > 0
                     AND CAST(n * (n - 1) - n2x2 AS DOUBLE) > 0 THEN
                 round(CAST(conc - disc AS DOUBLE)
                       / (sqrt(CAST(n * (n - 1) - n1x2 AS DOUBLE) / 2.0)
                          * sqrt(CAST(n * (n - 1) - n2x2 AS DOUBLE) / 2.0)),
                       9) + 0.0
               END AS tau_b
        FROM pairs, m
    """,
)
def q_kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall's tau-b (1945) between binned document length and binned
    token count — monotone association on an ORDINAL grid with the full
    tie correction tau_b = (C−D)/sqrt((n0−n1)(n0−n2)), the standard
    association number for banded/graded data (and the bounded-domain
    spelling that makes exact tau computable at any corpus size: C and D
    are cell-mass products over the ≤10x10 contingency grid, so the
    pair enumeration is 100x100 CELL pairs, never row pairs).

    Scale shape: one (xb, yb) count aggregate (map-side combined, ≤100
    cells per task partial), then a broadcast self-join of the 100-cell
    frame and a scalar fold.  Only the scan touches the corpus.

    Determinism: bins are integer floors; C, D, and the tie terms are
    exact DECIMAL(38,0) integer algebra; n0−n1 and n0−n2 are exact
    integers below 2^53 (fixture contract), so each sqrt factor is an
    exact-input IEEE op and tau_b rounds at 9 dp after one division.
    A degenerate axis (all mass in one band) → NULL tau_b exactly."""
    d = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull() & F.col("n_chars").isNotNull()
    )
    toks = F.filter(F.split(F.col("text"), " ", -1), lambda t: t != "")
    cells = (
        d.select(
            F.least(F.expr(f"n_chars DIV {_KT_XDIV}"), F.lit(_KT_CAP)).alias("xb"),
            F.least(
                (F.size(toks) / F.lit(_KT_YDIV)).cast("long"), F.lit(_KT_CAP)
            ).alias("yb"),
        )
        .groupBy("xb", "yb")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .localCheckpoint(eager=True)  # feeds pairs + both margins + n
    )
    a = cells.select(
        F.col("xb").alias("ax"), F.col("yb").alias("ay"), F.col("c").alias("ac")
    )
    b = cells.select(
        F.col("xb").alias("bx"), F.col("yb").alias("by"), F.col("c").alias("bc")
    )
    zero = F.lit(0).cast(_D38)
    prod = F.col("ac").cast(_D38) * F.col("bc")
    pairs = (
        a.crossJoin(F.broadcast(b))
        .agg(
            F.sum(
                F.when((F.col("ax") < F.col("bx")) & (F.col("ay") < F.col("by")), prod)
                .otherwise(zero)
            ).alias("conc"),
            F.sum(
                F.when((F.col("ax") < F.col("bx")) & (F.col("ay") > F.col("by")), prod)
                .otherwise(zero)
            ).alias("disc"),
        )
    )
    n = cells.agg(F.sum("c").cast(_D38).alias("n"))
    tx = (
        cells.groupBy("xb")
        .agg(F.sum("c").alias("tx"))
        .agg(F.sum(F.col("tx").cast(_D38) * (F.col("tx") - 1)).alias("n1x2"))
    )
    ty = (
        cells.groupBy("yb")
        .agg(F.sum("c").alias("ty"))
        .agg(F.sum(F.col("ty").cast(_D38) * (F.col("ty") - 1)).alias("n2x2"))
    )
    m = (
        pairs.crossJoin(F.broadcast(n))
        .crossJoin(F.broadcast(tx))
        .crossJoin(F.broadcast(ty))
    )
    n0x2 = F.col("n") * (F.col("n") - 1)
    fx = (n0x2 - F.col("n1x2")).cast("double") / F.lit(2.0)
    fy = (n0x2 - F.col("n2x2")).cast("double") / F.lit(2.0)
    return m.select(
        F.col("n").cast("bigint").alias("n"),
        F.col("conc").cast("bigint").alias("concordant"),
        F.col("disc").cast("bigint").alias("discordant"),
        F.when(
            (fx > 0) & (fy > 0),
            F.round(
                (F.col("conc") - F.col("disc")).cast("double")
                / (F.sqrt(fx) * F.sqrt(fy)),
                9,
            )
            + F.lit(0.0),
        ).alias("tau_b"),
    )


# ---------------------------------------------------------------------------
# q_brown_forsythe — robust variance-homogeneity test
# ---------------------------------------------------------------------------


@query(
    "q_brown_forsythe",
    oracle="""
        WITH med AS (
          SELECT event_type, quantile_cont(value, 0.5) AS med
          FROM events WHERE value IS NOT NULL GROUP BY event_type
        ),
        z AS (
          SELECT e.event_type,
                 round(abs(e.value - m.med), 12) AS z
          FROM events e JOIN med m ON m.event_type = e.event_type
          WHERE e.value IS NOT NULL
        ),
        g AS (
          SELECT event_type,
                 CAST(COUNT(*) AS BIGINT) AS n,
                 SUM(CAST(z AS DECIMAL(28,12))) AS s,
                 SUM(CAST(round(z * z, 12) AS DECIMAL(28,12))) AS ss
          FROM z GROUP BY event_type
        ),
        f AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS k,
                 CAST(SUM(n) AS BIGINT) AS n,
                 CAST(SUM(s) AS DOUBLE) AS s_all,
                 CAST(SUM(ss) AS DOUBLE) AS ss_all,
                 CAST(SUM(CAST(round(CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                                     / n, 12) AS DECIMAL(28,12)))
                      AS DOUBLE) AS between_raw
          FROM g
        )
        SELECT k, n,
               CAST(k - 1 AS BIGINT) AS dof1,
               CAST(n - k AS BIGINT) AS dof2,
               CASE WHEN n > k AND k > 1
                         AND (ss_all - between_raw) > 0
                    THEN round(((between_raw - s_all * s_all / n) / (k - 1))
                               / ((ss_all - between_raw) / (n - k)), 9) + 0.0
               END AS f_bf
        FROM f
    """,
)
def q_brown_forsythe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown-Forsythe test (1974): is the metric's SPREAD homogeneous
    across event types?  One-way ANOVA F computed on z = |x − median_j|
    — the Levene family with the median center, the spelling robust to
    heavy tails (and the assumption check behind q_anova_f: ANOVA's F is
    only calibrated when variances are comparable).

    Scale shape: one per-group median pass (percentile sorts within
    group — the q_percentile_cont machinery), the 5-row median table
    broadcast back onto the scan, then the same one-aggregate + k-row
    fold as q_anova_f.  Two scans total, no extra shuffle.

    Determinism: medians of 2-dp values at the dyadic 0.5 probe are one
    add + one halve (exact IEEE, both engines); z rounds at 12 dp and
    accumulates in DECIMAL(28,12) (order-free), z² likewise; the F fold
    is the q_anova_f identity tree rounded at 9 dp.  Zero within-group
    deviation spread → NULL by exact condition."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    med = ev.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.5)).alias("med")
    )
    z = (
        ev.join(F.broadcast(med), "event_type")
        .select(
            "event_type",
            F.round(F.abs(F.col("value") - F.col("med")), 12).alias("z"),
        )
    )
    g = z.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("z").cast(_D2812)).alias("s"),
        F.sum(F.round(F.col("z") * F.col("z"), 12).cast(_D2812)).alias("ss"),
    )
    sd = F.col("s").cast("double")
    f = g.agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum("n").cast("bigint").alias("n"),
        F.sum("s").cast("double").alias("s_all"),
        F.sum("ss").cast("double").alias("ss_all"),
        F.sum(F.round(sd * sd / F.col("n"), 12).cast(_D2812))
        .cast("double")
        .alias("between_raw"),
    )
    ssb = F.col("between_raw") - F.col("s_all") * F.col("s_all") / F.col("n")
    ssw = F.col("ss_all") - F.col("between_raw")
    return f.select(
        "k",
        "n",
        (F.col("k") - 1).cast("bigint").alias("dof1"),
        (F.col("n") - F.col("k")).cast("bigint").alias("dof2"),
        F.when(
            (F.col("n") > F.col("k")) & (F.col("k") > 1) & (ssw > 0),
            F.round((ssb / (F.col("k") - 1)) / (ssw / (F.col("n") - F.col("k"))), 9)
            + F.lit(0.0),
        ).alias("f_bf"),
    )


# ---------------------------------------------------------------------------
# q_friedman_test — repeated-measures ranks over complete blocks
# ---------------------------------------------------------------------------


@query(
    "q_friedman_test",
    oracle="""
        WITH kk AS (
          SELECT CAST(COUNT(DISTINCT event_type) AS BIGINT) AS k FROM events
        ),
        cell AS (
          SELECT user_id, event_type,
                 CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE)
                   / COUNT(value) AS m
          FROM events
          WHERE user_id IS NOT NULL AND value IS NOT NULL
          GROUP BY user_id, event_type
        ),
        complete AS (
          SELECT c.* FROM cell c
          JOIN (SELECT user_id FROM cell GROUP BY user_id
                HAVING COUNT(*) = (SELECT k FROM kk)) u
            ON u.user_id = c.user_id
        ),
        ranked AS (
          SELECT user_id, event_type,
                 2 * RANK() OVER (PARTITION BY user_id ORDER BY m)
                   + COUNT(*) OVER (PARTITION BY user_id, m) - 1 AS r2
          FROM complete
        ),
        byt AS (
          SELECT event_type,
                 SUM(CAST(r2 AS DECIMAL(38,0))) AS r2_j
          FROM ranked GROUP BY event_type
        ),
        tot AS (
          SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n,
                 SUM(CAST(r2 AS DECIMAL(38,0)) * r2) AS a4
          FROM ranked
        )
        SELECT n, k, CAST(k - 1 AS BIGINT) AS dof,
               CASE WHEN CAST(a4 - CAST(n AS DECIMAL(38,0)) * k * (k + 1)
                                   * (k + 1) AS DOUBLE) > 0 THEN
                 round((k - 1.0)
                       * CAST((SELECT SUM(r2_j * r2_j) FROM byt)
                              - CAST(n AS DECIMAL(38,0)) * n * k
                                * (k + 1) * (k + 1) AS DOUBLE)
                       / CAST(a4 - CAST(n AS DECIMAL(38,0)) * k * (k + 1)
                                   * (k + 1) AS DOUBLE), 9) + 0.0
               END AS chi2
        FROM tot, kk
        WHERE n > 0
    """,
)
def q_friedman_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Friedman test (1937): do the k event types rank consistently
    within users?  Each COMPLETE block (a user with activity in all k
    types) ranks the types by mean metric; the tie-corrected chi-square
    is (k−1)·(ΣR_j² − n²k(k+1)²/4)/(Σr² − nk(k+1)²/4) — the
    repeated-measures counterpart of q_kruskal_wallis (blocks remove the
    between-user variance a plain rank test would mistake for signal).

    Scale shape: one (user, type) mean aggregate, a HAVING filter to
    complete blocks, per-user rank windows over k-row frames (bounded by
    the type domain — thousands of parallel tiny windows, never a global
    sort), then two k-row/1-row folds.

    Determinism: cell means divide exact decimal sums (deterministic
    doubles; ties rank-average via the 2x-rank integer 2·RANK + ties−1);
    R2_j and Σr2² accumulate in DECIMAL(38,0) (exact, order-free); the
    quadrupled-numerator identity chi² = (k−1)(ΣR2_j² − n²k(k+1)²)
    / (A4 − nk(k+1)²) stays in exact integers until one IEEE division,
    rounded at 9 dp.  All-tied blocks (A4 = nk(k+1)²) yield NULL by an
    exact integer condition; no complete blocks yields no row."""
    ev = load_table(spark, sf_dir, "events")
    k_row = ev.agg(F.count_distinct("event_type").cast("bigint").alias("k"))
    cell = (
        ev.filter(F.col("user_id").isNotNull() & F.col("value").isNotNull())
        .groupBy("user_id", "event_type")
        .agg(
            (
                F.sum(F.col("value").cast("decimal(28,6)")).cast("double")
                / F.count("value")
            ).alias("m")
        )
        .localCheckpoint(eager=True)  # users x k frame; feeds counts + join
    )
    counts = cell.groupBy("user_id").agg(F.count(F.lit(1)).alias("ct"))
    complete = (
        cell.join(counts, "user_id")
        .crossJoin(F.broadcast(k_row))
        .filter(F.col("ct") == F.col("k"))
        .select("user_id", "event_type", "m")
    )
    wu = Window.partitionBy("user_id").orderBy("m")
    wt = Window.partitionBy("user_id", "m")
    ranked = complete.select(
        "user_id",
        "event_type",
        (
            F.lit(2) * F.rank().over(wu) + F.count(F.lit(1)).over(wt) - 1
        ).alias("r2"),
    ).localCheckpoint(eager=True)  # feeds byt + tot folds
    byt = ranked.groupBy("event_type").agg(
        F.sum(F.col("r2").cast(_D38)).alias("r2_j")
    )
    tot = ranked.agg(
        F.count_distinct("user_id").cast("bigint").alias("n"),
        F.sum(F.col("r2").cast(_D38) * F.col("r2")).alias("a4"),
    ).filter(F.col("n") > 0)
    sumsq = byt.agg(F.sum(F.col("r2_j") * F.col("r2_j")).alias("rjsq"))
    m = tot.crossJoin(F.broadcast(sumsq)).crossJoin(F.broadcast(k_row))
    nk1sq = F.col("n").cast(_D38) * F.col("k") * (F.col("k") + 1) * (F.col("k") + 1)
    num = (F.col("rjsq") - F.col("n").cast(_D38) * nk1sq).cast("double")
    den = (F.col("a4") - nk1sq).cast("double")
    return m.select(
        "n",
        "k",
        (F.col("k") - 1).cast("bigint").alias("dof"),
        F.when(
            den > 0,
            F.round((F.col("k") - 1).cast("double") * num / den, 9) + F.lit(0.0),
        ).alias("chi2"),
    )


# ---------------------------------------------------------------------------
# q_mad_outliers — modified z-score shortlist (median/MAD)
# ---------------------------------------------------------------------------

_MAD_K = 20
_MAD_C = 0.6745  # Phi^-1(0.75): modified z = 0.6745 (x - med) / MAD


@query(
    "q_mad_outliers",
    oracle=f"""
        WITH med AS (
          SELECT event_type, quantile_cont(value, 0.5) AS med
          FROM events WHERE value IS NOT NULL GROUP BY event_type
        ),
        mad AS (
          SELECT e.event_type,
                 quantile_cont(abs(e.value - m.med), 0.5) AS mad
          FROM events e JOIN med m ON m.event_type = e.event_type
          WHERE e.value IS NOT NULL
          GROUP BY e.event_type
        ),
        scored AS (
          SELECT e.event_id, e.event_type, e.value,
                 round({_MAD_C} * (e.value - m.med) / d.mad, 9) + 0.0 AS rz
          FROM events e
          JOIN med m ON m.event_type = e.event_type
          JOIN mad d ON d.event_type = e.event_type
          WHERE e.value IS NOT NULL AND d.mad > 0
        )
        SELECT event_id, event_type, value, rz AS robust_z,
               CAST(rnk AS BIGINT) AS rnk
        FROM (
          SELECT *, ROW_NUMBER() OVER (ORDER BY abs(rz) DESC, event_id)
                      AS rnk
          FROM scored
        ) WHERE rnk <= {_MAD_K}
    """,
)
def q_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier shortlist via the modified z-score of Iglewicz &
    Hoaglin (1993): 0.6745·(x − median)/MAD per event type, globally
    ranked — the median/MAD twin of q_top_anomalies (whose mean/sigma
    scoring a single extreme value can hide by inflating sigma;
    median/MAD has a 50% breakdown point).  Groups whose MAD is zero
    (over half the values identical) are excluded by an exact
    condition, the q_corr zero-variance discipline.

    Scale shape: two bounded percentile passes (per-group median, then
    median absolute deviation — MAD depends on the median, so a second
    scan is inherent), each reducing to a k-row table broadcast back;
    scoring is scan-local and the global top-20 is TakeOrdered — never
    a full sort.

    Determinism: medians interpolate the dyadic 0.5 probe ((a+b)/2 —
    exact IEEE both engines, the q_percentile_cont argument); MAD is
    the same device over |x−med| images; the score is one identical
    IEEE tree rounded at 9 dp with +0.0, ranked by rounded |z| with
    event_id tiebreak."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    med = (
        ev.groupBy("event_type")
        .agg(F.percentile("value", F.lit(0.5)).alias("med"))
        .localCheckpoint(eager=True)  # feeds the MAD pass AND scoring
    )
    mad = (
        ev.join(F.broadcast(med), "event_type")
        .groupBy("event_type")
        .agg(
            F.percentile(F.abs(F.col("value") - F.col("med")), F.lit(0.5)).alias(
                "mad"
            )
        )
        .filter(F.col("mad") > 0)
    )
    rz = (
        F.round(
            F.lit(_MAD_C) * (F.col("value") - F.col("med")) / F.col("mad"), 9
        )
        + F.lit(0.0)
    )
    scored = (
        ev.join(F.broadcast(med), "event_type")
        .join(F.broadcast(mad), "event_type")
        .select("event_id", "event_type", "value", rz.alias("robust_z"))
    )
    w = Window.orderBy(F.abs("robust_z").desc(), "event_id")
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= _MAD_K)
    )


# ---------------------------------------------------------------------------
# q_tukey_hsd — post-hoc pairwise comparisons after q_anova_f
# ---------------------------------------------------------------------------


@query(
    "q_tukey_hsd",
    oracle="""
        WITH g AS (
          SELECT event_type,
                 CAST(COUNT(*) AS BIGINT) AS n,
                 SUM(CAST(value AS DECIMAL(28,6))) AS s,
                 SUM(CAST(value * value AS DECIMAL(28,6))) AS ss
          FROM events WHERE value IS NOT NULL
          GROUP BY event_type
        ),
        msw AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS k,
                 CAST(SUM(n) AS BIGINT) AS nn,
                 CAST(SUM(ss) AS DOUBLE) AS ss_all,
                 CAST(SUM(CAST(round(CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                                     / n, 12) AS DECIMAL(28,12)))
                      AS DOUBLE) AS between_raw
          FROM g
        ),
        means AS (
          SELECT event_type, n,
                 round(CAST(s AS DOUBLE) / n, 12) AS m
          FROM g
        )
        SELECT a.event_type AS group_a, b.event_type AS group_b,
               a.n AS n_a, b.n AS n_b,
               round(a.m - b.m, 9) + 0.0 AS mean_diff,
               CASE WHEN w.nn > w.k AND (w.ss_all - w.between_raw) > 0 THEN
                 round(abs(a.m - b.m)
                       / sqrt((w.ss_all - w.between_raw) / (w.nn - w.k)
                              / 2.0 * (1.0 / a.n + 1.0 / b.n)), 9) + 0.0
               END AS q_stat
        FROM means a JOIN means b ON a.event_type < b.event_type, msw w
    """,
)
def q_tukey_hsd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey HSD post-hoc table (Tukey 1949): after q_anova_f says "the
    k event types differ", WHICH pairs differ?  For every group pair the
    studentized-range statistic q = |m_i − m_j| / sqrt(MSW/2·(1/n_i +
    1/n_j)) using the pooled within-group mean square from the SAME
    sum-of-squares identities as q_anova_f — the honest follow-up that
    controls the family-wise error a fan of pairwise t-tests would
    inflate (q is compared against the studentized-range quantile
    q_{k,N−k,α}, a table lookup the caller applies; the statistic and
    its inputs are the engine's job).

    Determinism: per-group s/ss are exact decimal sums (the q_anova_f
    contract); group means and the s²/n addends round at 12 dp; MSW and
    q are identically-spelled IEEE trees rounded at 9 dp.  Zero within-
    variance or N ≤ k yields NULL q by exact conditions; the pair frame
    orders by (group_a < group_b), a total key.

    Scale shape: ONE map-side-combined hash aggregate to k group rows;
    the pair self-join and the MSW fold run on ≤ k and 1 rows — nothing
    past the scan grows with the corpus."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    g = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("value").cast("decimal(28,6)")).alias("s"),
        F.sum((F.col("value") * F.col("value")).cast("decimal(28,6)")).alias("ss"),
    )
    g = g.localCheckpoint(eager=True)  # msw fold + both pair sides
    sd = F.col("s").cast("double")
    msw = g.agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum("n").cast("bigint").alias("nn"),
        F.sum("ss").cast("double").alias("ss_all"),
        F.sum(F.round(sd * sd / F.col("n"), 12).cast(_D2812))
        .cast("double")
        .alias("between_raw"),
    )
    means = g.select(
        "event_type", "n", F.round(sd / F.col("n"), 12).alias("m")
    )
    a = means.select(
        F.col("event_type").alias("group_a"),
        F.col("n").alias("n_a"),
        F.col("m").alias("m_a"),
    )
    b = means.select(
        F.col("event_type").alias("group_b"),
        F.col("n").alias("n_b"),
        F.col("m").alias("m_b"),
    )
    pairs = a.join(b, F.col("group_a") < F.col("group_b")).crossJoin(
        F.broadcast(msw)
    )
    mswv = (F.col("ss_all") - F.col("between_raw")) / (F.col("nn") - F.col("k"))
    return pairs.select(
        "group_a",
        "group_b",
        "n_a",
        "n_b",
        (F.round(F.col("m_a") - F.col("m_b"), 9) + F.lit(0.0)).alias(
            "mean_diff"
        ),
        F.when(
            (F.col("nn") > F.col("k"))
            & ((F.col("ss_all") - F.col("between_raw")) > 0),
            F.round(
                F.abs(F.col("m_a") - F.col("m_b"))
                / F.sqrt(
                    mswv / F.lit(2.0)
                    * (F.lit(1.0) / F.col("n_a") + F.lit(1.0) / F.col("n_b"))
                ),
                9,
            )
            + F.lit(0.0),
        ).alias("q_stat"),
    )
