"""Round-8 sequential-monitoring / drift / uncertainty operator family.

The always-on counterparts to the one-shot tests: operators a pipeline
runs EVERY day against accumulating data, plus the uncertainty and
screening tools that make those readouts trustworthy:

* **sequential experiment monitoring** (``q_sprt_monitor``) — Wald's
  Sequential Probability Ratio Test (1945) walked over daily cumulative
  conversion counts: the always-valid "stop early or keep collecting"
  decision that a fixed-horizon z-test (q_ab_test) cannot legally make
  mid-experiment;
* **change-point monitoring** (``q_cusum_drift``) — Page's CUSUM (1954)
  over the daily mean metric against a first-week baseline: the
  classic drift alarm that accumulates small persistent shifts a
  per-day threshold test never sees;
* **ratio-metric uncertainty** (``q_jackknife_variance``) — the
  delete-one-bucket jackknife (Quenouille/Tukey; the streaming-bucket
  form in Chamandy et al. 2012): the standard deterministic standard
  error for ratio metrics where the bootstrap would need RNG;
* **feature screening** (``q_woe_iv``) — Weight of Evidence / Information
  Value per feature bin (the credit-scoring screen, Siddiqi 2006): how
  much does a binned metric separate purchase events from the rest;
* **contamination drift** (``q_contamination_drift``) — per-source
  benchmark-contamination rate compared between the standing corpus and
  the current drop (the q_contamination_report twin over two snapshots,
  q_centroid_drift's snapshot device): "did the NEW crawl get dirtier?".

Determinism discipline (house rules): counts are exact integers; log
constants are PRECOMPUTED Python literals shared by both engines (no
engine-side ln of a runtime value feeds a compared column unless rounded
at 12 dp first); deep-fraction addends round at 12 dp into
DECIMAL(28,12) before order-free summation; sequential recursions fold
arrays sorted by day (engine) against an identically-spelled recursive
CTE (oracle) — the q_ewma device; compared doubles round at 9 dp with
+0.0.  Degenerate inputs (no qualifying days, empty arms, zero totals)
yield no row or NULL via integer-exact conditions.  All outputs are
scalar columns (driver canonicalization).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bifrost_spark.operators.dedup import contamination_hits, contamination_hits_sql
from bifrost_spark.queries.llm_text import BENCH_DOC_MAX
from bifrost_spark.registry import query
from bifrost_spark.tables import load_table

_D2812 = "decimal(28,12)"

# ---------------------------------------------------------------------------
# q_sprt_monitor — Wald SPRT over daily cumulative conversions
# ---------------------------------------------------------------------------

# H0: conversion rate p0, H1: p1 (detect a doubling), alpha = beta = 0.05.
# The per-observation log-likelihood increments and the decision
# boundaries are PRECOMPUTED literals so both engines multiply integers
# by the identical double constants — no runtime ln() feeds the compare.
_SPRT_P0 = 0.08
_SPRT_P1 = 0.16
_SPRT_L1 = 0.6931471805599453  # ln(p1/p0) = ln(2)
_SPRT_L0 = -0.09097177820572676  # ln((1-p1)/(1-p0)) = ln(0.84/0.92)
_SPRT_A = 2.9444389791664403  # ln((1-beta)/alpha) = ln(19)
_SPRT_B = -2.9444389791664403  # ln(beta/(1-alpha))


def arm_b_daily_enrollments(ev: DataFrame) -> DataFrame:
    """(day, n_day, c_day): arm-B users bucketed by FIRST event day with
    their converted flag — the shared enrollment frame behind
    q_sprt_monitor and the streaming monitor (streaming/sprt_monitor.py),
    factored so both walks consume identical daily increments."""
    first_hex = F.ascii(F.substring(F.md5(F.col("user_id").cast("string")), 1, 1))
    assign = ev.filter(F.col("user_id").isNotNull()).groupBy("user_id").agg(
        F.min(F.date_trunc("day", "ts")).alias("first_day"),
        F.when(
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)) * 4
            > F.count(F.lit(1)),
            1,
        )
        .otherwise(0)
        .alias("converted"),
        F.first(F.when(first_hex % 2 == 0, "A").otherwise("B")).alias("variant"),
    )
    return (
        assign.filter(F.col("variant") == "B")
        .groupBy(F.col("first_day").alias("day"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_day"),
            F.sum("converted").cast("bigint").alias("c_day"),
        )
    )


def sprt_walk(daily: DataFrame, n_offset: int = 0, c_offset: int = 0) -> DataFrame:
    """The Wald walk over a (day, n_day, c_day) frame: cumulative counts
    (optionally continuing from prior totals) → llr → decision.  Shared
    by the batch query and the streaming monitor so the recursion has ONE
    spelling."""
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    walk = daily.select(
        "day",
        "n_day",
        "c_day",
        (F.sum("n_day").over(w) + F.lit(n_offset)).cast("bigint").alias("n_cum"),
        (F.sum("c_day").over(w) + F.lit(c_offset)).cast("bigint").alias("c_cum"),
    )
    llr = F.col("c_cum") * F.lit(_SPRT_L1) + (
        F.col("n_cum") - F.col("c_cum")
    ) * F.lit(_SPRT_L0)
    return walk.select(
        "day",
        "n_day",
        "c_day",
        "n_cum",
        F.col("c_cum").alias("conv_cum"),
        (F.round(llr, 9) + F.lit(0.0)).alias("llr"),
        F.when(llr >= _SPRT_A, "accept_h1")
        .when(llr <= _SPRT_B, "accept_h0")
        .otherwise("continue")
        .alias("decision"),
    )



@query(
    "q_sprt_monitor",
    oracle=f"""
        WITH assign AS (
          SELECT user_id,
                 MIN(date_trunc('day', ts)) AS first_day,
                 CASE WHEN (ascii(substr(md5(CAST(user_id AS VARCHAR)), 1, 1))
                            % 2) = 0 THEN 'A' ELSE 'B' END AS variant,
                 CASE WHEN SUM(CASE WHEN event_type = 'purchase'
                                    THEN 1 ELSE 0 END) * 4 > COUNT(*)
                      THEN 1 ELSE 0 END AS converted
          FROM events WHERE user_id IS NOT NULL
          GROUP BY user_id
        ),
        daily AS (
          SELECT first_day AS day,
                 CAST(COUNT(*) AS BIGINT) AS n_day,
                 CAST(SUM(converted) AS BIGINT) AS c_day
          FROM assign WHERE variant = 'B'
          GROUP BY first_day
        ),
        walk AS (
          SELECT day,
                 SUM(n_day) OVER (ORDER BY day) AS n_cum,
                 SUM(c_day) OVER (ORDER BY day) AS c_cum
          FROM daily
        )
        SELECT day,
               CAST(n_cum AS BIGINT) AS n_cum,
               CAST(c_cum AS BIGINT) AS conv_cum,
               round(c_cum * {_SPRT_L1!r}
                     + (n_cum - c_cum) * {_SPRT_L0!r}, 9) + 0.0 AS llr,
               CASE
                 WHEN c_cum * {_SPRT_L1!r}
                      + (n_cum - c_cum) * {_SPRT_L0!r} >= {_SPRT_A!r}
                   THEN 'accept_h1'
                 WHEN c_cum * {_SPRT_L1!r}
                      + (n_cum - c_cum) * {_SPRT_L0!r} <= {_SPRT_B!r}
                   THEN 'accept_h0'
                 ELSE 'continue'
               END AS decision
        FROM walk
    """,
)
def q_sprt_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald's SPRT (1945) monitoring the treatment arm's conversion rate
    day by day: users enter the experiment on their first event day
    (arm B of the q_ab_test md5 assignment, outcome = heavy purchaser),
    and each day's cumulative (n, conversions) updates the log-likelihood
    ratio llr = c·ln(p1/p0) + (n−c)·ln((1−p1)/(1−p0)) for H0: p=0.08
    vs H1: p=0.16.  Crossing ln((1−β)/α) accepts H1, ln(β/(1−α))
    accepts H0 — the always-valid sequential decision a fixed-horizon
    z-test cannot make mid-experiment (peeking inflates its false-positive
    rate; the SPRT's error control is BUILT of the walk).

    Scale shape: one per-user aggregate (shuffle on user_id), one tiny
    daily rollup, and a cumulative window over ≤|days| rows (bounded
    single-partition frame).  Experiment readouts cost two aggregates
    regardless of event volume.

    Determinism: n/c are exact integers; the log increments and
    boundaries are PRECOMPUTED double literals identical in both
    engines, so llr is integer·literal products + one add — bit-stable
    — rounded at 9 dp; decisions compare the same unrounded double to
    the same literals."""
    ev = load_table(spark, sf_dir, "events")
    return sprt_walk(arm_b_daily_enrollments(ev)).drop("n_day", "c_day")


# ---------------------------------------------------------------------------
# q_cusum_drift — Page's CUSUM over daily means vs first-week baseline
# ---------------------------------------------------------------------------

_CUSUM_BASE_DAYS = 7
_CUSUM_K_SD = 0.5  # slack: half a baseline SD
_CUSUM_H_SD = 4.0  # alarm: four baseline SDs


def cusum_daily_frame(ev: DataFrame) -> DataFrame:
    """(day, m, rn): the 12-dp decimal-exact daily mean metric with its
    day rank — the shared input frame of q_cusum_drift and the streaming
    monitor (streaming/cusum_monitor.py), factored so both walks consume
    identically-spelled daily means."""
    daily = (
        ev.filter(F.col("value").isNotNull())
        .groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(
            F.round(
                F.sum(F.col("value").cast("decimal(28,6)")).cast("double")
                / F.count("value"),
                12,
            ).alias("m")
        )
    )
    wd = Window.orderBy("day")
    return daily.select(
        "day", "m", F.row_number().over(wd).alias("rn")
    ).localCheckpoint(eager=True)  # <= |days| rows; feeds base, sd, tail


def cusum_baseline_frames(daily: DataFrame) -> tuple[DataFrame, DataFrame]:
    """1-row (mu0) and (s0) frames from the first _CUSUM_BASE_DAYS days
    of a (day, m, rn) frame — one baseline spelling for the batch query
    and the streaming monitor's fit."""
    base7 = daily.filter(F.col("rn") <= _CUSUM_BASE_DAYS)
    base = base7.agg(
        (
            F.sum(F.col("m").cast(_D2812)).cast("double") / F.lit(_CUSUM_BASE_DAYS)
        ).alias("mu0")
    )
    sd = (
        base7.crossJoin(F.broadcast(base))  # 7x1 scalar fold
        .agg(
            F.sqrt(
                F.sum(
                    F.round(
                        (F.col("m") - F.col("mu0")) * (F.col("m") - F.col("mu0")),
                        12,
                    ).cast(_D2812)
                ).cast("double")
                / F.lit(_CUSUM_BASE_DAYS - 1)
            ).alias("s0")
        )
    )
    return base, sd


def cusum_walk(
    tail: DataFrame,
    base: DataFrame,
    sd: DataFrame,
    sp0: float = 0.0,
    sn0: float = 0.0,
) -> DataFrame:
    """(day, m, sp, sn, s0) RAW rows: the CUSUM recursion folded
    engine-side over the day-sorted (day, m) frame against the 1-row
    baseline frames, continuing from (sp0, sn0) — the ONE spelling of
    the recursion shared by q_cusum_drift (offsets 0) and the streaming
    monitor (offsets recovered from its own output)."""
    packed = (
        tail.agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("day"), F.col("m")))
            ).alias("arr")
        )
        .crossJoin(F.broadcast(base))
        .crossJoin(F.broadcast(sd))
    )
    walk = F.aggregate(
        F.col("arr"),
        F.struct(
            F.expr(
                "CAST(array() AS ARRAY<STRUCT<day: TIMESTAMP, m: DOUBLE,"
                " sp: DOUBLE, sn: DOUBLE>>)"
            ).alias("out"),
            F.lit(float(sp0)).alias("sp"),
            F.lit(float(sn0)).alias("sn"),
        ),
        lambda acc, x: F.struct(
            F.concat(
                acc["out"],
                F.array(
                    F.struct(
                        x["day"].alias("day"),
                        x["m"].alias("m"),
                        F.greatest(
                            F.lit(0.0),
                            acc["sp"]
                            + x["m"]
                            - F.col("mu0")
                            - F.lit(_CUSUM_K_SD) * F.col("s0"),
                        ).alias("sp"),
                        F.greatest(
                            F.lit(0.0),
                            acc["sn"]
                            + F.col("mu0")
                            - x["m"]
                            - F.lit(_CUSUM_K_SD) * F.col("s0"),
                        ).alias("sn"),
                    )
                ),
            ).alias("out"),
            F.greatest(
                F.lit(0.0),
                acc["sp"] + x["m"] - F.col("mu0") - F.lit(_CUSUM_K_SD) * F.col("s0"),
            ).alias("sp"),
            F.greatest(
                F.lit(0.0),
                acc["sn"] + F.col("mu0") - x["m"] - F.lit(_CUSUM_K_SD) * F.col("s0"),
            ).alias("sn"),
        ),
    )["out"]
    return packed.select(F.explode(walk).alias("r"), F.col("s0")).select(
        F.col("r.day").alias("day"),
        F.col("r.m").alias("m"),
        F.col("r.sp").alias("sp"),
        F.col("r.sn").alias("sn"),
        "s0",
    )


def cusum_decisions(rows: DataFrame) -> DataFrame:
    """The shared output contract over raw (day, m, sp, sn, s0) walk
    rows: 9-dp rounded readouts, alarms compared on the unrounded
    doubles."""
    return rows.select(
        "day",
        (F.round(F.col("m"), 9) + F.lit(0.0)).alias("day_mean"),
        (F.round(F.col("sp"), 9) + F.lit(0.0)).alias("s_pos"),
        (F.round(F.col("sn"), 9) + F.lit(0.0)).alias("s_neg"),
        F.when(F.col("sp") > F.lit(_CUSUM_H_SD) * F.col("s0"), 1)
        .otherwise(0)
        .cast("bigint")
        .alias("alarm_pos"),
        F.when(F.col("sn") > F.lit(_CUSUM_H_SD) * F.col("s0"), 1)
        .otherwise(0)
        .cast("bigint")
        .alias("alarm_neg"),
    )


@query(
    "q_cusum_drift",
    oracle=f"""
        WITH RECURSIVE daily AS (
          SELECT date_trunc('day', ts) AS day,
                 round(CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE)
                       / COUNT(value), 12) AS m,
                 ROW_NUMBER() OVER (ORDER BY date_trunc('day', ts)) AS rn
          FROM events WHERE value IS NOT NULL
          GROUP BY 1
        ),
        base AS (
          SELECT CAST(SUM(CAST(m AS DECIMAL(28,12))) AS DOUBLE)
                   / {_CUSUM_BASE_DAYS} AS mu0
          FROM daily WHERE rn <= {_CUSUM_BASE_DAYS}
        ),
        sd AS (
          SELECT sqrt(CAST(SUM(CAST(round((m - mu0) * (m - mu0), 12)
                                    AS DECIMAL(28,12))) AS DOUBLE)
                      / ({_CUSUM_BASE_DAYS} - 1)) AS s0
          FROM daily, base WHERE rn <= {_CUSUM_BASE_DAYS}
        ),
        walk AS (
          SELECT d.day, d.rn, d.m,
                 GREATEST(0.0, d.m - b.mu0 - {_CUSUM_K_SD} * s.s0) AS sp,
                 GREATEST(0.0, b.mu0 - d.m - {_CUSUM_K_SD} * s.s0) AS sn
          FROM daily d, base b, sd s
          WHERE d.rn = {_CUSUM_BASE_DAYS} + 1
          UNION ALL
          SELECT d.day, d.rn, d.m,
                 GREATEST(0.0, w.sp + d.m - b.mu0 - {_CUSUM_K_SD} * s.s0),
                 GREATEST(0.0, w.sn + b.mu0 - d.m - {_CUSUM_K_SD} * s.s0)
          FROM daily d, base b, sd s, walk w
          WHERE d.rn = w.rn + 1
        )
        SELECT w.day,
               round(w.m, 9) + 0.0 AS day_mean,
               round(w.sp, 9) + 0.0 AS s_pos,
               round(w.sn, 9) + 0.0 AS s_neg,
               CAST(CASE WHEN w.sp > {_CUSUM_H_SD} * s.s0
                         THEN 1 ELSE 0 END AS BIGINT) AS alarm_pos,
               CAST(CASE WHEN w.sn > {_CUSUM_H_SD} * s.s0
                         THEN 1 ELSE 0 END AS BIGINT) AS alarm_neg
        FROM walk w, sd s
    """,
)
def q_cusum_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page's CUSUM (1954) change-point monitor on the daily mean metric:
    the first 7 days fix a baseline (mu0, s0); every later day updates
    S+ = max(0, S+ + x − mu0 − 0.5·s0) and S− symmetrically, alarming
    past 4·s0 — the control-chart recursion that detects a persistent
    small shift in O(shift/slack) days where a per-day rule needs the
    shift to exceed its threshold on a single day.

    Scale shape: one (day) aggregate (map-side combined), then the whole
    monitor runs on the ≤|days| daily-mean frame: the recursion is ONE
    single-row higher-order F.aggregate fold over the day-sorted array
    (the q_rerank_mmr device — engine-side, no driver loop), exploded
    back to per-day scalars.

    Determinism: daily means are decimal-sum/count doubles rounded at
    12 dp; mu0 and the variance fold accumulate 12-dp addends in
    DECIMAL(28,12) (order-free); the recursion is the identical IEEE
    add/max chain in both engines (Spark aggregate fold vs DuckDB
    recursive CTE — the q_ewma equivalence), outputs rounded at 9 dp;
    alarms compare the same unrounded doubles.

    Shared spelling: the daily frame, baseline, recursion, and output
    contract are the cusum_* helpers above — ONE spelling with the
    streaming monitor (streaming/cusum_monitor.py), the q_sketch_drift
    shared-helper discipline."""
    ev = load_table(spark, sf_dir, "events")
    daily = cusum_daily_frame(ev)
    base, sd = cusum_baseline_frames(daily)
    tail = daily.filter(F.col("rn") > _CUSUM_BASE_DAYS)
    return cusum_decisions(cusum_walk(tail, base, sd))


# ---------------------------------------------------------------------------
# q_jackknife_variance — delete-one-bucket SE for a ratio metric
# ---------------------------------------------------------------------------

_JK_BUCKETS = 32
_JK_Z = 1.959963984540054


@query(
    "q_jackknife_variance",
    oracle=f"""
        WITH b AS (
          SELECT user_id % {_JK_BUCKETS} AS bucket,
                 CAST(COUNT(value) AS BIGINT) AS n_i,
                 SUM(CAST(value AS DECIMAL(28,6))) AS s_i
          FROM events
          WHERE user_id IS NOT NULL AND value IS NOT NULL
          GROUP BY 1
        ),
        tot AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS d,
                 CAST(SUM(n_i) AS BIGINT) AS n,
                 CAST(SUM(s_i) AS DOUBLE) AS s
          FROM b
        ),
        theta AS (
          SELECT b.bucket,
                 round((t.s - CAST(b.s_i AS DOUBLE)) / (t.n - b.n_i), 12)
                   AS th_i
          FROM b, tot t WHERE t.n > b.n_i
        ),
        dot AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS d_eff,
                 CAST(SUM(CAST(th_i AS DECIMAL(28,12))) AS DOUBLE)
                   / COUNT(*) AS th_dot
          FROM theta
        )
        SELECT CAST(t.n AS BIGINT) AS n,
               t.d AS d_buckets,
               round(t.s / t.n, 9) + 0.0 AS theta,
               round(sqrt((CAST(dd.d_eff AS DOUBLE) - 1.0) / dd.d_eff
                          * CAST((SELECT SUM(CAST(round(
                                (th_i - dd.th_dot) * (th_i - dd.th_dot), 12)
                                AS DECIMAL(28,12))) FROM theta)
                              AS DOUBLE)), 9) + 0.0 AS se_jack,
               round(t.s / t.n
                     - {_JK_Z} * sqrt((CAST(dd.d_eff AS DOUBLE) - 1.0)
                          / dd.d_eff
                          * CAST((SELECT SUM(CAST(round(
                                (th_i - dd.th_dot) * (th_i - dd.th_dot), 12)
                                AS DECIMAL(28,12))) FROM theta)
                              AS DOUBLE)), 9) + 0.0 AS ci_lo,
               round(t.s / t.n
                     + {_JK_Z} * sqrt((CAST(dd.d_eff AS DOUBLE) - 1.0)
                          / dd.d_eff
                          * CAST((SELECT SUM(CAST(round(
                                (th_i - dd.th_dot) * (th_i - dd.th_dot), 12)
                                AS DECIMAL(28,12))) FROM theta)
                              AS DOUBLE)), 9) + 0.0 AS ci_hi
        FROM tot t, dot dd
        WHERE dd.d_eff >= 2
    """,
)
def q_jackknife_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delete-one-bucket jackknife standard error for the mean-value
    ratio metric (Σvalue/Σcount): users hash into 32 buckets, each
    leave-one-bucket-out estimate θ_(−i) = (S−s_i)/(N−n_i) perturbs the
    ratio, and Var_jack = (D−1)/D · Σ(θ_(−i) − θ̄)² — the deterministic
    uncertainty device for ratio metrics (per-row variance formulas are
    WRONG for ratios; the bucket jackknife is the standard production
    answer, cf. Chamandy et al. 2012, and needs no RNG, unlike
    q_bootstrap_ci whose md5-Poisson replicates answer the same question
    33x more expensively).

    Scale shape: one (bucket) aggregate — 32 partials per task — then
    scalar folds over the 32-row frame.  The entire uncertainty readout
    is O(1) past the scan.

    Determinism: s_i/n_i are exact decimal/integer sums; each θ_(−i) is
    one division rounded at 12 dp; the mean and squared-deviation folds
    accumulate 12-dp addends in DECIMAL(28,12) (order-free); se and CI
    are identical IEEE trees rounded at 9 dp.  Fewer than 2 populated
    buckets yields no row (variance undefined)."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull() & F.col("value").isNotNull()
    )
    b = ev.groupBy((F.col("user_id") % _JK_BUCKETS).alias("bucket")).agg(
        F.count("value").cast("bigint").alias("n_i"),
        F.sum(F.col("value").cast("decimal(28,6)")).alias("s_i"),
    )
    b = b.localCheckpoint(eager=True)  # feeds totals + theta frame
    tot = b.agg(
        F.count(F.lit(1)).cast("bigint").alias("d"),
        F.sum("n_i").cast("bigint").alias("n"),
        F.sum("s_i").cast("double").alias("s"),
    )
    theta = (
        b.crossJoin(F.broadcast(tot))
        .filter(F.col("n") > F.col("n_i"))
        .select(
            F.round(
                (F.col("s") - F.col("s_i").cast("double"))
                / (F.col("n") - F.col("n_i")),
                12,
            ).alias("th_i")
        )
    )
    dot = theta.agg(
        F.count(F.lit(1)).cast("bigint").alias("d_eff"),
        (F.sum(F.col("th_i").cast(_D2812)).cast("double") / F.count(F.lit(1))).alias(
            "th_dot"
        ),
    )
    dev = theta.crossJoin(F.broadcast(dot)).agg(
        F.sum(
            F.round(
                (F.col("th_i") - F.col("th_dot"))
                * (F.col("th_i") - F.col("th_dot")),
                12,
            ).cast(_D2812)
        )
        .cast("double")
        .alias("ssd")
    )
    m = (
        tot.crossJoin(F.broadcast(dot))
        .crossJoin(F.broadcast(dev))
        .filter(F.col("d_eff") >= 2)
    )
    se = F.sqrt(
        (F.col("d_eff").cast("double") - 1.0) / F.col("d_eff") * F.col("ssd")
    )
    th = F.col("s") / F.col("n")
    return m.select(
        F.col("n").cast("bigint").alias("n"),
        F.col("d").alias("d_buckets"),
        (F.round(th, 9) + F.lit(0.0)).alias("theta"),
        (F.round(se, 9) + F.lit(0.0)).alias("se_jack"),
        (F.round(th - F.lit(_JK_Z) * se, 9) + F.lit(0.0)).alias("ci_lo"),
        (F.round(th + F.lit(_JK_Z) * se, 9) + F.lit(0.0)).alias("ci_hi"),
    )


# ---------------------------------------------------------------------------
# q_woe_iv — Weight of Evidence / Information Value per metric bin
# ---------------------------------------------------------------------------

_WOE_BIN = 50.0
_WOE_NBINS = 10


@query(
    "q_woe_iv",
    oracle=f"""
        WITH binned AS (
          SELECT LEAST(CAST(floor(value / {_WOE_BIN}) AS BIGINT),
                       {_WOE_NBINS - 1}) AS bin,
                 CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS good
          FROM events WHERE value IS NOT NULL AND value >= 0
        ),
        cells AS (
          SELECT bin,
                 CAST(SUM(good) AS BIGINT) AS g,
                 CAST(COUNT(*) - SUM(good) AS BIGINT) AS b
          FROM binned GROUP BY bin
        ),
        tot AS (SELECT SUM(g) AS gt, SUM(b) AS bt FROM cells)
        SELECT bin, g AS n_good, b AS n_bad,
               round(ln((CAST(2 * g + 1 AS DOUBLE)
                         / (2 * gt + {_WOE_NBINS}))
                        / (CAST(2 * b + 1 AS DOUBLE)
                           / (2 * bt + {_WOE_NBINS}))), 9) + 0.0 AS woe,
               round(CAST(CAST(round(
                   (CAST(2 * g + 1 AS DOUBLE) / (2 * gt + {_WOE_NBINS})
                    - CAST(2 * b + 1 AS DOUBLE) / (2 * bt + {_WOE_NBINS}))
                   * round(ln((CAST(2 * g + 1 AS DOUBLE)
                               / (2 * gt + {_WOE_NBINS}))
                              / (CAST(2 * b + 1 AS DOUBLE)
                                 / (2 * bt + {_WOE_NBINS}))), 12),
                   12) AS DECIMAL(28,12)) AS DOUBLE), 9) + 0.0
                 AS iv_contrib
        FROM cells, tot
    """,
)
def q_woe_iv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight of Evidence / Information Value screening (the
    credit-scoring feature screen, Siddiqi 2006): bin the event metric
    into 10 fixed-width bands, label purchases "good", and report each
    bin's WOE = ln(p_good/p_bad) with the add-half Laplace smoothing of
    q_psi_drift (p = (2c+1)/(2C+nbins)) plus its IV contribution
    (p_g − p_b)·WOE.  Σ iv_contrib is the feature's screening score
    (<0.02 useless, >0.3 strong — the standard rule-of-thumb table).

    Scale shape: one (bin) count aggregate — ≤10 partials per task —
    then scalar folds over the 10-row frame; the whole screen is O(1)
    past the scan.

    Determinism: bins are integer floors; counts exact; smoothed shares
    are integer-imaged divisions; WOE's single ln rounds at 9 dp for
    output (and at 12 dp inside the IV product, whose addends fold via
    DECIMAL(28,12) — the q_js_divergence log discipline)."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull() & (F.col("value") >= 0)
    )
    cells = (
        ev.select(
            F.least(
                F.floor(F.col("value") / _WOE_BIN).cast("bigint"),
                F.lit(_WOE_NBINS - 1),
            ).alias("bin"),
            F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("good"),
        )
        .groupBy("bin")
        .agg(
            F.sum("good").cast("bigint").alias("g"),
            (F.count(F.lit(1)) - F.sum("good")).cast("bigint").alias("b"),
        )
        .localCheckpoint(eager=True)  # <= 10 rows; feeds totals + output
    )
    tot = cells.agg(F.sum("g").alias("gt"), F.sum("b").alias("bt"))
    m = cells.crossJoin(F.broadcast(tot))
    pg = (F.lit(2) * F.col("g") + 1).cast("double") / (
        F.lit(2) * F.col("gt") + _WOE_NBINS
    )
    pb = (F.lit(2) * F.col("b") + 1).cast("double") / (
        F.lit(2) * F.col("bt") + _WOE_NBINS
    )
    woe = F.log(pg / pb)
    return m.select(
        "bin",
        F.col("g").alias("n_good"),
        F.col("b").alias("n_bad"),
        (F.round(woe, 9) + F.lit(0.0)).alias("woe"),
        (
            F.round(
                F.round((pg - pb) * F.round(woe, 12), 12)
                .cast(_D2812)
                .cast("double"),
                9,
            )
            + F.lit(0.0)
        ).alias("iv_contrib"),
    )


# ---------------------------------------------------------------------------
# q_contamination_drift — per-source contamination between snapshots
# ---------------------------------------------------------------------------


@query(
    "q_contamination_drift",
    oracle=f"""
        WITH {contamination_hits_sql(BENCH_DOC_MAX)},
        rolled AS (
          SELECT d.source,
                 (d.doc_id % 4 = 0) AS cur,
                 CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(COUNT(h.doc_id) AS BIGINT) AS c
          FROM documents d LEFT JOIN hits h ON h.doc_id = d.doc_id
          WHERE d.doc_id >= {BENCH_DOC_MAX}
          GROUP BY d.source, (d.doc_id % 4 = 0)
        )
        SELECT source,
               COALESCE(MAX(CASE WHEN NOT cur THEN n END), 0) AS n_ref,
               COALESCE(MAX(CASE WHEN NOT cur THEN c END), 0)
                 AS contaminated_ref,
               COALESCE(MAX(CASE WHEN cur THEN n END), 0) AS n_cur,
               COALESCE(MAX(CASE WHEN cur THEN c END), 0)
                 AS contaminated_cur,
               CASE WHEN MAX(CASE WHEN NOT cur THEN n END) > 0
                     AND MAX(CASE WHEN cur THEN n END) > 0 THEN
                 CAST(MAX(CASE WHEN cur THEN c END) AS DOUBLE)
                   / MAX(CASE WHEN cur THEN n END)
                 - CAST(MAX(CASE WHEN NOT cur THEN c END) AS DOUBLE)
                   / MAX(CASE WHEN NOT cur THEN n END)
               END AS rate_drift
        FROM rolled GROUP BY source
    """,
)
def q_contamination_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source contamination DRIFT between corpus snapshots: the
    q_contamination_report audit computed separately for the standing
    corpus (doc_id % 4 != 0) and the current drop (doc_id % 4 == 0 —
    q_centroid_drift's snapshot device), reporting each source's rate
    delta — "did the new crawl of this source get dirtier against the
    benchmark?", the incremental question a vendor answers per delivery
    (VERDICT r7 item 4b).

    Scale shape: the gram build, the broadcast bench-gram semi join, and
    the distinct hit set are computed ONCE (shared across snapshots —
    the snapshot split is a modulus on the already-tiny per-doc flag
    frame, not a second gram pass); the rollup ships one (source, flag,
    snapshot) triple per doc.  NULL source stays a reported group.

    Determinism: counts exact; rates are int/int IEEE divisions and the
    drift one subtraction — bit-stable; snapshots with an empty side
    yield NULL drift by exact condition."""
    d = load_table(spark, sf_dir, "documents")
    hits = contamination_hits(d, BENCH_DOC_MAX)
    rolled = (
        d.filter(F.col("doc_id") >= BENCH_DOC_MAX)
        .select("doc_id", "source", (F.col("doc_id") % 4 == 0).alias("cur"))
        .join(hits, "doc_id", "left")
        .groupBy("source", "cur")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.count("hit").cast("bigint").alias("c"),
        )
    )
    n_ref = F.max(F.when(~F.col("cur"), F.col("n")))
    c_ref = F.max(F.when(~F.col("cur"), F.col("c")))
    n_cur = F.max(F.when(F.col("cur"), F.col("n")))
    c_cur = F.max(F.when(F.col("cur"), F.col("c")))
    return rolled.groupBy("source").agg(
        F.coalesce(n_ref, F.lit(0)).alias("n_ref"),
        F.coalesce(c_ref, F.lit(0)).alias("contaminated_ref"),
        F.coalesce(n_cur, F.lit(0)).alias("n_cur"),
        F.coalesce(c_cur, F.lit(0)).alias("contaminated_cur"),
        F.when(
            (n_ref > 0) & (n_cur > 0),
            c_cur.cast("double") / n_cur - c_ref.cast("double") / n_ref,
        ).alias("rate_drift"),
    )
