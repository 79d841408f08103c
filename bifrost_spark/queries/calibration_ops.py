"""Round-10 classifier-calibration / targeting-curve family.

The readouts that turn q_calibration_bins' raw reliability table into
decision numbers — how WRONG are the scores (Brier and its Murphy
decomposition) and how USEFUL are they for targeting (cumulative
gains/lift by score bin):

* **q_brier_decomp** — the Brier score with Murphy's (1973)
  reliability / resolution / uncertainty decomposition over the 10
  equal-width score bins of q_calibration_bins: REL = Σ n_b(f̄_b−ō_b)²/N
  (how far each bin's mean forecast sits from its hit rate), RES =
  Σ n_b(ō_b−ō)²/N (how much the bins separate outcomes), UNC = ō(1−ō);
* **q_lift_gains** — the binned cumulative-gains and lift table: walk
  the same 10 score bins from the TOP score down and report what share
  of all positives each cumulative slice captures (gain) and its rate
  multiple over the base rate (lift) — the campaign-targeting curve.

Score and label are the q_calibration_bins fixture stand-ins (score:
per-document type-token ratio; label: lang == 'en'); a real model score
and gold label drop into the same two expressions.  Zero-token
documents carry no score and are excluded on both engines.

Determinism discipline (house rules): scores are exact int/int IEEE
divisions; bins are explicit FLOOR with a LEAST clamp (both engines);
per-row and per-bin addends round at 12 dp into DECIMAL(28,12)
order-free sums; final readouts round at 9 dp with +0.0.  Empty
corpora yield no row; an all-one-class corpus yields the exact-zero /
NULL readouts the conditions spell.  All outputs are scalar columns.

Scale shape (both): scan-local score/label expressions → ONE hash
aggregate to ≤10 bin rows → cumulative window / scalar fold on that
bounded frame.  No global per-row sort exists (the binned gains curve
replaces the rank-based one exactly so 10^11 predictions stay one
aggregation pass — the q_ks_drift distinct-frame posture).

Reference basis: no reference analog — Spark-first additive surface
beside the quality-classifier operators (SURVEY.md §2 Part A′).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bifrost_spark.registry import query
from bifrost_spark.tables import load_table

_D2812 = "decimal(28,12)"

# Shared oracle fragment: (score, y, bin) per scored document — the
# q_calibration_bins spelling.
_SCORED_SQL = """
        scored AS (
          SELECT CAST(len(list_distinct(list_filter(
                        string_split(lower(text), ' '), t -> t <> '')))
                      AS DOUBLE)
                   / len(list_filter(string_split(lower(text), ' '),
                                     t -> t <> '')) AS score,
                 CASE WHEN lang IS NOT DISTINCT FROM 'en' THEN 1 ELSE 0 END
                   AS y
          FROM documents
          WHERE text IS NOT NULL
            AND len(list_filter(string_split(lower(text), ' '),
                                t -> t <> '')) > 0
        ),
        binned AS (
          SELECT LEAST(CAST(floor(score * 10) AS BIGINT), 9) AS bin,
                 score, y
          FROM scored
        )
"""


def _binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(bin, score, y) per scored document — one scan-local projection."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    toks = F.filter(F.split(F.lower("text"), " ", -1), lambda t: t != "")
    s = d.select(
        (F.size(F.array_distinct(toks)).cast("double") / F.size(toks)).alias(
            "score"
        ),
        F.col("lang").eqNullSafe("en").cast("int").alias("y"),
    ).filter(F.size(toks) > 0)
    return s.select(
        F.least(F.floor(F.col("score") * 10), F.lit(9).cast("bigint"))
        .cast("bigint")
        .alias("bin"),
        "score",
        "y",
    )


# ---------------------------------------------------------------------------
# q_brier_decomp — Brier score + Murphy decomposition
# ---------------------------------------------------------------------------


@query(
    "q_brier_decomp",
    oracle=f"""
        WITH {_SCORED_SQL},
        bins AS (
          SELECT bin,
                 CAST(COUNT(*) AS BIGINT) AS n_b,
                 CAST(SUM(y) AS BIGINT) AS pos_b,
                 CAST(SUM(CAST(round(score, 12) AS DECIMAL(28,12)))
                      AS DOUBLE) AS ssum,
                 CAST(SUM(CAST(round((score - y) * (score - y), 12)
                               AS DECIMAL(28,12))) AS DOUBLE) AS sqerr
          FROM binned GROUP BY bin
        ),
        tot AS (
          SELECT CAST(SUM(n_b) AS BIGINT) AS n,
                 CAST(SUM(pos_b) AS BIGINT) AS pos,
                 CAST(SUM(CAST(round(sqerr, 12) AS DECIMAL(28,12)))
                      AS DOUBLE) AS sqerr_all
          FROM bins
        )
        SELECT t.n,
               round(t.sqerr_all / t.n, 9) + 0.0 AS brier,
               round(CAST(SUM(CAST(round(
                       b.n_b * (b.ssum / b.n_b
                                - CAST(b.pos_b AS DOUBLE) / b.n_b)
                              * (b.ssum / b.n_b
                                 - CAST(b.pos_b AS DOUBLE) / b.n_b), 12)
                       AS DECIMAL(28,12))) AS DOUBLE) / t.n, 9) + 0.0
                 AS reliability,
               round(CAST(SUM(CAST(round(
                       b.n_b * (CAST(b.pos_b AS DOUBLE) / b.n_b
                                - CAST(t.pos AS DOUBLE) / t.n)
                              * (CAST(b.pos_b AS DOUBLE) / b.n_b
                                 - CAST(t.pos AS DOUBLE) / t.n), 12)
                       AS DECIMAL(28,12))) AS DOUBLE) / t.n, 9) + 0.0
                 AS resolution,
               round(CAST(t.pos AS DOUBLE) / t.n
                     * (1 - CAST(t.pos AS DOUBLE) / t.n), 9) + 0.0
                 AS uncertainty
        FROM bins b, tot t
        WHERE t.n > 0
        GROUP BY t.n, t.pos, t.sqerr_all
    """,
)
def q_brier_decomp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brier score with Murphy's (1973) decomposition over the 10
    calibration bins: Brier = mean (score − y)², reliability =
    Σ n_b(f̄_b − ō_b)²/N (calibration error — 0 is perfectly calibrated),
    resolution = Σ n_b(ō_b − ō)²/N (discrimination — higher is better),
    uncertainty = ō(1 − ō) (the no-skill floor).  The identity
    Brier ≈ REL − RES + UNC holds up to within-bin forecast variance —
    the exact per-row Brier is reported alongside so the residual is
    visible, the standard forecast-verification readout.

    Determinism: score and rates are exact int/int doubles; per-row
    squared errors and per-bin addends round at 12 dp into
    DECIMAL(28,12) (order-free); finals round at 9 dp with +0.0.  Empty
    corpus → no row; a single-class corpus reports resolution 0 and
    uncertainty 0 exactly.

    Scale shape: one hash aggregate to ≤10 bins, one scalar fold."""
    binned = _binned(spark, sf_dir)
    bins = binned.groupBy("bin").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_b"),
        F.sum("y").cast("bigint").alias("pos_b"),
        F.sum(F.round(F.col("score"), 12).cast(_D2812))
        .cast("double")
        .alias("ssum"),
        F.sum(
            F.round(
                (F.col("score") - F.col("y")) * (F.col("score") - F.col("y")),
                12,
            ).cast(_D2812)
        )
        .cast("double")
        .alias("sqerr"),
    )
    bins = bins.localCheckpoint(eager=True)  # totals fold + bin addends
    tot = bins.agg(
        F.sum("n_b").cast("bigint").alias("n"),
        F.sum("pos_b").cast("bigint").alias("pos"),
        F.sum(F.round(F.col("sqerr"), 12).cast(_D2812))
        .cast("double")
        .alias("sqerr_all"),
    ).filter(F.col("n") > 0)
    joined = bins.crossJoin(F.broadcast(tot))
    fb = F.col("ssum") / F.col("n_b")
    ob = F.col("pos_b").cast("double") / F.col("n_b")
    obar = F.col("pos").cast("double") / F.col("n")
    return (
        joined.groupBy("n", "pos", "sqerr_all")
        .agg(
            F.sum(
                F.round(F.col("n_b") * (fb - ob) * (fb - ob), 12).cast(_D2812)
            )
            .cast("double")
            .alias("rel_raw"),
            F.sum(
                F.round(F.col("n_b") * (ob - obar) * (ob - obar), 12).cast(
                    _D2812
                )
            )
            .cast("double")
            .alias("res_raw"),
        )
        .select(
            "n",
            (F.round(F.col("sqerr_all") / F.col("n"), 9) + F.lit(0.0)).alias(
                "brier"
            ),
            (F.round(F.col("rel_raw") / F.col("n"), 9) + F.lit(0.0)).alias(
                "reliability"
            ),
            (F.round(F.col("res_raw") / F.col("n"), 9) + F.lit(0.0)).alias(
                "resolution"
            ),
            (
                F.round(
                    F.col("pos").cast("double")
                    / F.col("n")
                    * (F.lit(1) - F.col("pos").cast("double") / F.col("n")),
                    9,
                )
                + F.lit(0.0)
            ).alias("uncertainty"),
        )
    )


# ---------------------------------------------------------------------------
# q_lift_gains — binned cumulative gains / lift curve
# ---------------------------------------------------------------------------


@query(
    "q_lift_gains",
    oracle=f"""
        WITH {_SCORED_SQL},
        bins AS (
          SELECT bin,
                 CAST(COUNT(*) AS BIGINT) AS n_b,
                 CAST(SUM(y) AS BIGINT) AS pos_b
          FROM binned GROUP BY bin
        ),
        cum AS (
          SELECT bin, n_b, pos_b,
                 CAST(SUM(n_b) OVER (ORDER BY bin DESC) AS BIGINT) AS cum_n,
                 CAST(SUM(pos_b) OVER (ORDER BY bin DESC) AS BIGINT)
                   AS cum_pos,
                 (SELECT CAST(SUM(n_b) AS BIGINT) FROM bins) AS n,
                 (SELECT CAST(SUM(pos_b) AS BIGINT) FROM bins) AS pos
          FROM bins
        )
        SELECT bin, n_b, pos_b, cum_n, cum_pos,
               CASE WHEN pos > 0 THEN
                 round(CAST(cum_pos AS DOUBLE) / pos, 9) + 0.0
               END AS cum_gain,
               CASE WHEN pos > 0 THEN
                 round((CAST(cum_pos AS DOUBLE) / cum_n)
                       / (CAST(pos AS DOUBLE) / n), 9) + 0.0
               END AS lift
        FROM cum
    """,
)
def q_lift_gains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binned cumulative-gains/lift table: walking the 10 score bins
    from the TOP down, each row reports how many documents and positives
    the cumulative slice holds, the share of ALL positives captured
    (cum_gain — the gains chart), and the slice's positive rate as a
    multiple of the base rate (lift).  "Target the top-k score bins" is
    THE campaign/filter planning readout; the binned curve equals the
    rank-based one at bin granularity while needing NO global per-row
    sort — one hash aggregate to ≤10 bins and a cumulative window on
    that bounded frame (the q_ks_drift posture; 10^11 predictions stay
    one aggregation pass).

    Determinism: counts exact; gains/lift are int/int IEEE trees rounded
    at 9 dp with +0.0; a corpus with zero positives yields NULL curves
    by exact condition; empty corpus → no rows."""
    binned = _binned(spark, sf_dir)
    bins = binned.groupBy("bin").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_b"),
        F.sum("y").cast("bigint").alias("pos_b"),
    )
    bins = bins.localCheckpoint(eager=True)  # totals + cumulative walk
    tot = bins.agg(
        F.sum("n_b").cast("bigint").alias("n"),
        F.sum("pos_b").cast("bigint").alias("pos"),
    )
    wdesc = Window.orderBy(F.desc("bin")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = bins.select(
        "bin",
        "n_b",
        "pos_b",
        F.sum("n_b").over(wdesc).cast("bigint").alias("cum_n"),
        F.sum("pos_b").over(wdesc).cast("bigint").alias("cum_pos"),
    ).crossJoin(F.broadcast(tot))
    return cum.select(
        "bin",
        "n_b",
        "pos_b",
        "cum_n",
        "cum_pos",
        F.when(
            F.col("pos") > 0,
            F.round(F.col("cum_pos").cast("double") / F.col("pos"), 9)
            + F.lit(0.0),
        ).alias("cum_gain"),
        F.when(
            F.col("pos") > 0,
            F.round(
                (F.col("cum_pos").cast("double") / F.col("cum_n"))
                / (F.col("pos").cast("double") / F.col("n")),
                9,
            )
            + F.lit(0.0),
        ).alias("lift"),
    )
