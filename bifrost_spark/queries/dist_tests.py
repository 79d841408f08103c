"""Round-9 distributional / trend test family.

The goodness-of-fit and monotone-trend counterparts to the engine's
two-sample location tests (q_mann_whitney, q_ks_drift): did the WHOLE
distribution move (not just its center), and is a daily metric trending?
Every operator reduces to the established exact shapes — distinct-value
frames with integer cumulative mass (the q_ks_drift device), bounded
day-pair self-joins (the q_kendall_tau device), full-margin chi-square
spines (the q_cramers_v zero-cell discipline), DECIMAL(38,0) integer
cross products, and 12-dp-rounded DECIMAL(28,12) deep-fraction sums:

* **q_cramer_von_mises** — two-sample Cramér-von Mises T (Anderson
  1962) between purchase and non-purchase metric values: the
  whole-distribution companion to KS that weights EVERY gap, not just
  the largest one.  T is an exact integer cross-product sum divided
  once at the end — fully exact on both engines.
* **q_anderson_darling** — the k-sample Anderson-Darling A² of Scholz &
  Stephens (1987), k=2, midrank/ties version (their A²akN): the
  tail-sensitive alternative the CvM misses (AD's 1/(B(N−B)) weight
  diverges at the tails).
* **q_mood_median** — Mood's median test across the k event types:
  chi-square of the 2×k (above/at-or-below grand median) contingency
  table — the robust k-group location screen that needs only counts.
* **q_runs_test** — Wald-Wolfowitz runs test on the daily-mean sequence
  dichotomized at its median: "is the daily metric serially random, or
  does it cluster?" — the classic randomness check a trend/drift
  monitor should run before trusting i.i.d.-assuming alarms.
* **q_mann_kendall** — Mann-Kendall monotone-trend S/z (Mann 1945,
  Kendall 1975) with the tie-corrected variance, plus Sen's (1968)
  slope — THE standard nonparametric "is this KPI drifting up?" readout
  over a daily series.

Determinism discipline (house rules): cumulative distribution mass is
exact integers in DECIMAL(38,0) cross products; chi-square addends are
(o·N − r·c)²/(N·r·c) integer-ratio doubles rounded at 12 dp and summed
in DECIMAL(28,12) (order-free); daily means are decimal-sum/count
doubles rounded at 12 dp (the q_cusum_drift spelling); medians are the
integer-threshold lower order statistic (2·cum ≥ N) or the
one-add-one-halve midpoint of the two central order statistics;
compared doubles round at 9 dp with +0.0.  Degenerate inputs (an empty
sample, a single distinct value, an all-tied series) yield no row or
NULL via integer-exact conditions on both engines.  All outputs are
scalar columns (driver canonicalization).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bifrost_spark.registry import query
from bifrost_spark.tables import load_table

_D38 = "decimal(38,0)"
_D2812 = "decimal(28,12)"


def _value_cells(spark, sf_dir):
    """(v, ca, cb) distinct-value frame splitting events' metric into the
    purchase sample (a) and the non-purchase sample (b) — the shared
    two-sample input of q_cramer_von_mises / q_anderson_darling (the
    q_ks_drift cohort device with event_type as the split)."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.filter(F.col("value").isNotNull())
        .select(
            F.col("value").alias("v"),
            (F.col("event_type") == "purchase").cast("long").alias("a"),
        )
        .groupBy("v")
        .agg(
            # COALESCE, not bare SUM: the 0/1 flag is NULL when event_type
            # is NULL, so a value whose events ALL have NULL event_type
            # sums to NULL on both flags where the oracle's COUNT(*)
            # FILTER yields 0 — the q_mood_median NULL-poison class
            # (ADVICE r9).  With the coalesce both engines keep the cell
            # as (ca=0, cb=0).
            F.coalesce(F.sum("a"), F.lit(0)).alias("ca"),
            F.coalesce(F.sum(F.lit(1) - F.col("a")), F.lit(0)).alias("cb"),
        )
        .localCheckpoint(eager=True)  # consumed by cum-window AND totals
    )


_TWO_SAMPLE_CELLS_SQL = """
        pts AS (
          SELECT value AS v,
                 CAST(COUNT(*) FILTER (WHERE event_type = 'purchase')
                      AS BIGINT) AS ca,
                 CAST(COUNT(*) FILTER (WHERE event_type <> 'purchase')
                      AS BIGINT) AS cb
          FROM events WHERE value IS NOT NULL GROUP BY value
        ),
        cum AS (
          SELECT v, ca, cb,
                 SUM(ca) OVER (ORDER BY v) AS cuma,
                 SUM(cb) OVER (ORDER BY v) AS cumb,
                 (SELECT SUM(ca) FROM pts) AS na,
                 (SELECT SUM(cb) FROM pts) AS nb
          FROM pts
        )
"""


# ---------------------------------------------------------------------------
# q_cramer_von_mises — two-sample CvM over the distinct-value frame
# ---------------------------------------------------------------------------


@query(
    "q_cramer_von_mises",
    oracle=f"""
        WITH {_TWO_SAMPLE_CELLS_SQL},
        terms AS (
          SELECT CAST(ca + cb AS DECIMAL(38,0))
                   * (CAST(cuma AS DECIMAL(38,0)) * nb
                      - CAST(cumb AS DECIMAL(38,0)) * na)
                   * (CAST(cuma AS DECIMAL(38,0)) * nb
                      - CAST(cumb AS DECIMAL(38,0)) * na) AS t,
                 na, nb
          FROM cum
        )
        SELECT CAST(na AS BIGINT) AS n_a,
               CAST(nb AS BIGINT) AS n_b,
               CAST(COUNT(*) AS BIGINT) AS n_cells,
               round(CAST(SUM(t) AS DOUBLE)
                     / (CAST(na + nb AS DOUBLE) * CAST(na + nb AS DOUBLE)
                        * (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE))), 9)
                 + 0.0 AS cvm_t
        FROM terms WHERE na > 0 AND nb > 0
        GROUP BY na, nb
    """,
)
def q_cramer_von_mises(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Cramér-von Mises statistic (Anderson 1962) between the
    purchase and non-purchase metric distributions:
    T = (nm/N²)·Σ_k [F_n(z_k) − G_m(z_k)]² over the pooled sample — the
    whole-distribution drift test that integrates EVERY ECDF gap where
    KS keeps only the maximum (a distribution can drift in both tails
    with a small max gap but a large integrated one).

    On the distinct-value frame the pooled sum collapses to
    Σ_v (a_v+b_v)·(A_v·m − B_v·n)² / (N²·n·m): the numerator is an EXACT
    integer (DECIMAL(38,0) cross products, the q_ks_drift device) summed
    order-free, divided ONCE by the exact denominator at the end —
    bit-identical on both engines, no per-cell rounding at all.

    Scale shape: one map-side-combined aggregate to the distinct-value
    frame (bounded by the metric's value domain, not the row count),
    one cumulative window over that bounded frame, one scalar total.
    Empty-sample inputs emit zero rows (exact na·nb > 0 condition).

    Reference basis: extends the reference's offset-bounds monitoring
    fold (kafka.clj:61-67) to distributional monitoring; no reference
    analog — Spark-first design."""
    cells = _value_cells(spark, sf_dir)
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    tot = cells.agg(F.sum("ca").alias("na"), F.sum("cb").alias("nb"))
    cum = (
        cells.select(
            "v",
            (F.col("ca") + F.col("cb")).alias("wv"),
            F.sum("ca").over(w).alias("cuma"),
            F.sum("cb").over(w).alias("cumb"),
        )
        .crossJoin(F.broadcast(tot))
        .filter((F.col("na") > 0) & (F.col("nb") > 0))
    )
    gap = F.col("cuma").cast(_D38) * F.col("nb") - F.col("cumb").cast(_D38) * F.col(
        "na"
    )
    terms = cum.select(
        "na", "nb", (F.col("wv").cast(_D38) * gap * gap).alias("t")
    )
    nn = F.col("na").cast("double") + F.col("nb").cast("double")
    return terms.groupBy("na", "nb").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_cells"),
        (
            F.round(
                F.sum("t").cast("double")
                / (nn * nn * (F.col("na").cast("double") * F.col("nb").cast("double"))),
                9,
            )
            + F.lit(0.0)
        ).alias("cvm_t"),
    ).select(
        F.col("na").cast("bigint").alias("n_a"),
        F.col("nb").cast("bigint").alias("n_b"),
        "n_cells",
        "cvm_t",
    )


# ---------------------------------------------------------------------------
# q_anderson_darling — k=2 sample A² (Scholz-Stephens midrank version)
# ---------------------------------------------------------------------------


@query(
    "q_anderson_darling",
    oracle=f"""
        WITH {_TWO_SAMPLE_CELLS_SQL},
        mids AS (
          SELECT ca, cb, na, nb, na + nb AS nn,
                 2 * cuma - ca AS ma2,
                 2 * cumb - cb AS mb2,
                 2 * (cuma + cumb) - (ca + cb) AS ba2,
                 ca + cb AS h
          FROM cum
        ),
        -- DECIMAL(38,0) before the products (mirrors the engine): BIGINT
        -- nn*ma2 / ba2*(2nn-ba2) would overflow at pooled N >~ 1.5e9
        terms AS (
          SELECT na, nb, nn,
                 round(h * CAST((CAST(nn AS DECIMAL(38,0)) * ma2
                                 - na * CAST(ba2 AS DECIMAL(38,0)))
                                * (CAST(nn AS DECIMAL(38,0)) * ma2
                                   - na * CAST(ba2 AS DECIMAL(38,0)))
                                AS DOUBLE)
                       / (CAST(nn AS DOUBLE)
                          * CAST(CAST(ba2 AS DECIMAL(38,0)) * (2 * nn - ba2)
                                 - CAST(nn AS DECIMAL(38,0)) * h AS DOUBLE)),
                       12) AS ta,
                 round(h * CAST((CAST(nn AS DECIMAL(38,0)) * mb2
                                 - nb * CAST(ba2 AS DECIMAL(38,0)))
                                * (CAST(nn AS DECIMAL(38,0)) * mb2
                                   - nb * CAST(ba2 AS DECIMAL(38,0)))
                                AS DOUBLE)
                       / (CAST(nn AS DOUBLE)
                          * CAST(CAST(ba2 AS DECIMAL(38,0)) * (2 * nn - ba2)
                                 - CAST(nn AS DECIMAL(38,0)) * h AS DOUBLE)),
                       12) AS tb
          FROM mids
          WHERE CAST(ba2 AS DECIMAL(38,0)) * (2 * nn - ba2)
                - CAST(nn AS DECIMAL(38,0)) * h > 0
        )
        SELECT CAST(na AS BIGINT) AS n_a,
               CAST(nb AS BIGINT) AS n_b,
               CAST(COUNT(*) AS BIGINT) AS n_cells,
               CASE WHEN na > 0 AND nb > 0 AND COUNT(*) > 1 THEN
                 round((CAST(nn AS DOUBLE) - 1) / nn
                       * (CAST(SUM(CAST(ta AS DECIMAL(28,12))) AS DOUBLE) / na
                          + CAST(SUM(CAST(tb AS DECIMAL(28,12))) AS DOUBLE) / nb),
                       9) + 0.0
               END AS a2akn
        FROM terms WHERE na > 0 AND nb > 0
        GROUP BY na, nb, nn
    """,
)
def q_anderson_darling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Anderson-Darling A²akN (Scholz & Stephens 1987, the
    midrank version their eq. 6 defines for tied/discrete data) between
    the purchase and non-purchase metric distributions — the
    tail-weighted cousin of q_cramer_von_mises: its 1/(B(N−B)) weight
    blows up at the distribution tails, catching tail drift that both
    KS and CvM under-weight.

    Per distinct pooled value the addend is a ratio of EXACT integers
    (doubled midranks keep everything integral: Ma2 = 2M−h_i,
    Ba2 = 2B−h), h_j·(N·Ma2 − n_i·Ba2)² / (N·(Ba2·(2N−Ba2) − N·h_j)),
    computed once as a double, rounded at 12 dp, and summed order-free
    in DECIMAL(28,12) (the house deep-fraction device); the final
    (N−1)/N·(t_a/n + t_b/m) scaling is one identical IEEE tree rounded
    at 9 dp.  The only zero denominator is the single-distinct-value
    corpus (Ba2(2N−Ba2) = N·h ⇒ h = N), where A² is undefined — the
    n_cells > 1 condition yields NULL on both engines.

    Scale shape: identical to q_cramer_von_mises — the statistic runs
    entirely on the bounded distinct-value frame."""
    cells = _value_cells(spark, sf_dir)
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    tot = cells.agg(F.sum("ca").alias("na"), F.sum("cb").alias("nb"))
    mids = (
        cells.select(
            "ca",
            "cb",
            F.sum("ca").over(w).alias("cuma"),
            F.sum("cb").over(w).alias("cumb"),
        )
        .crossJoin(F.broadcast(tot))
        .filter((F.col("na") > 0) & (F.col("nb") > 0))
        .select(
            "na",
            "nb",
            (F.col("na") + F.col("nb")).alias("nn"),
            (2 * F.col("cuma") - F.col("ca")).alias("ma2"),
            (2 * F.col("cumb") - F.col("cb")).alias("mb2"),
            (2 * (F.col("cuma") + F.col("cumb")) - (F.col("ca") + F.col("cb"))).alias(
                "ba2"
            ),
            (F.col("ca") + F.col("cb")).alias("h"),
        )
    )
    # DECIMAL(38,0) BEFORE the products (the q_cramer_von_mises spelling,
    # ADVICE r9): nn*ma2 and ba2*(2nn−ba2) formed in BIGINT wrap silently
    # at pooled N ≳ 1.5e9 in non-ANSI Spark while DuckDB raises — a
    # scale-parity cliff.  Casting the factors first keeps every product
    # exact to 38 digits (num² ≤ (2N²)² needs N ≲ 1.2e9 digits-wise only
    # at N ~ 1e9·√10; far beyond any per-window pooled sample).
    denom = F.col("ba2").cast(_D38) * (2 * F.col("nn") - F.col("ba2")).cast(
        _D38
    ) - F.col("nn").cast(_D38) * F.col("h")

    def addend(m2, ni):
        num = F.col("nn").cast(_D38) * m2 - ni * F.col("ba2").cast(_D38)
        return F.round(
            F.col("h")
            * (num * num).cast("double")
            / (F.col("nn").cast("double") * denom.cast("double")),
            12,
        )

    terms = mids.filter(denom > 0).select(
        "na",
        "nb",
        "nn",
        addend(F.col("ma2"), F.col("na")).alias("ta"),
        addend(F.col("mb2"), F.col("nb")).alias("tb"),
    )
    return terms.groupBy("na", "nb", "nn").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_cells"),
        F.when(
            (F.col("na") > 0) & (F.col("nb") > 0) & (F.count(F.lit(1)) > 1),
            F.round(
                (F.col("nn").cast("double") - 1)
                / F.col("nn")
                * (
                    F.sum(F.col("ta").cast(_D2812)).cast("double") / F.col("na")
                    + F.sum(F.col("tb").cast(_D2812)).cast("double") / F.col("nb")
                ),
                9,
            )
            + F.lit(0.0),
        ).alias("a2akn"),
    ).select(
        F.col("na").cast("bigint").alias("n_a"),
        F.col("nb").cast("bigint").alias("n_b"),
        "n_cells",
        "a2akn",
    )


# ---------------------------------------------------------------------------
# q_mood_median — 2×k median test over event types
# ---------------------------------------------------------------------------


@query(
    "q_mood_median",
    oracle="""
        WITH pts AS (
          SELECT value AS v, event_type, COUNT(*) AS c
          FROM events WHERE value IS NOT NULL GROUP BY value, event_type
        ),
        cum AS (
          SELECT v, SUM(SUM(c)) OVER (ORDER BY v) AS cum,
                 (SELECT SUM(c) FROM pts) AS n
          FROM pts GROUP BY v
        ),
        med AS (SELECT MIN(v) AS med FROM cum WHERE 2 * cum >= n),
        cells AS (
          -- COALESCE, not bare FILTER: a group entirely on one side of
          -- the median yields SUM-over-empty = NULL, which would
          -- NULL-poison the margin sums (the zero-cell chi-square class;
          -- fuzzer-caught) where the engine's CASE..ELSE 0 yields 0
          SELECT event_type,
                 CAST(COALESCE(SUM(c) FILTER (WHERE v > (SELECT med FROM med)),
                               0) AS BIGINT) AS o_above,
                 CAST(COALESCE(SUM(c) FILTER (WHERE v <= (SELECT med FROM med)),
                               0) AS BIGINT) AS o_le
          FROM pts GROUP BY event_type
        ),
        margins AS (
          SELECT CAST(SUM(o_above) AS BIGINT) AS r_above,
                 CAST(SUM(o_le) AS BIGINT) AS r_le,
                 CAST(SUM(o_above + o_le) AS BIGINT) AS n,
                 CAST(COUNT(*) AS BIGINT) AS k
          FROM cells
        ),
        spine AS (
          SELECT g.event_type, s.is_above,
                 CASE WHEN s.is_above = 1 THEN COALESCE(g.o_above, 0)
                      ELSE COALESCE(g.o_le, 0) END AS o,
                 CASE WHEN s.is_above = 1 THEN m.r_above ELSE m.r_le END AS r,
                 g.o_above + g.o_le AS col_n,
                 m.n, m.k, m.r_above, m.r_le
          FROM cells g, margins m, (SELECT 1 AS is_above UNION ALL
                                    SELECT 0) s
        ),
        terms AS (
          SELECT n, k, r_above, r_le,
                 round(CAST(CAST(o * n - r * col_n AS DECIMAL(38,0))
                            * CAST(o * n - r * col_n AS DECIMAL(38,0))
                            AS DOUBLE)
                       / (CAST(n AS DOUBLE) * r * col_n), 12) AS t
          FROM spine WHERE r_above > 0 AND r_le > 0
        )
        SELECT (SELECT med FROM med) AS grand_median,
               CAST(n AS BIGINT) AS n,
               CAST(k AS BIGINT) AS k,
               CAST(k - 1 AS BIGINT) AS dof,
               round(CAST(SUM(CAST(t AS DECIMAL(28,12))) AS DOUBLE), 9)
                 + 0.0 AS chi2
        FROM terms GROUP BY n, k
    """,
)
def q_mood_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mood's median test across the k event types: dichotomize every
    metric value at the grand (lower) median, then chi-square the 2×k
    (above / at-or-below × type) contingency table — the k-group
    location screen that needs only counts, immune to any outlier
    (Mood 1950; the robust cousin of q_kruskal_wallis when even ranks
    are too much structure).

    Determinism: the grand median is the integer-threshold lower order
    statistic over the distinct-value frame (MIN v with 2·cum ≥ N — the
    q_ks_drift device, no global row sort); cells fold over the FULL
    2×k margin spine so zero cells contribute their (0·N − r·c)² mass
    (the q_cramers_v zero-cell discipline — a fold over observed-only
    cells would silently drop them); each chi-square addend is the
    integer ratio (o·N − r·c)²/(N·r·c) rounded at 12 dp into a
    DECIMAL(28,12) order-free sum.  A degenerate corpus where either
    margin row is empty (every value at or below the median) emits NO
    row via the exact r_above·r_le > 0 condition — both engines agree.

    Scale shape: one aggregate to the (value, type) cell frame (bounded
    by value-domain × k), one cumulative window over distinct values,
    then everything folds on ≤2k cells."""
    e = load_table(spark, sf_dir, "events")
    pts = (
        e.filter(F.col("value").isNotNull())
        .groupBy(F.col("value").alias("v"), "event_type")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=True)  # feeds median cum AND the cells
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    bycum = pts.groupBy("v").agg(F.sum("c").alias("cv"))
    tot = bycum.agg(F.sum("cv").alias("n"))
    med = (
        bycum.select("v", F.sum("cv").over(w).alias("cum"))
        .crossJoin(F.broadcast(tot))
        .filter(2 * F.col("cum") >= F.col("n"))
        .agg(F.min("v").alias("med"))
    )
    cells = (
        pts.crossJoin(F.broadcast(med))
        .groupBy("event_type")
        .agg(
            F.sum(F.when(F.col("v") > F.col("med"), F.col("c")).otherwise(0))
            .cast("bigint")
            .alias("o_above"),
            F.sum(F.when(F.col("v") <= F.col("med"), F.col("c")).otherwise(0))
            .cast("bigint")
            .alias("o_le"),
        )
        .localCheckpoint(eager=True)  # ≤k rows; feeds margins AND spine
    )
    margins = cells.agg(
        F.sum("o_above").cast("bigint").alias("r_above"),
        F.sum("o_le").cast("bigint").alias("r_le"),
        F.sum(F.col("o_above") + F.col("o_le")).cast("bigint").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("k"),
    )
    spine = (
        cells.crossJoin(
            F.broadcast(
                spark.range(2).select(F.col("id").cast("int").alias("is_above"))
            )
        )
        .crossJoin(F.broadcast(margins))
        .select(
            F.when(F.col("is_above") == 1, F.col("o_above"))
            .otherwise(F.col("o_le"))
            .alias("o"),
            F.when(F.col("is_above") == 1, F.col("r_above"))
            .otherwise(F.col("r_le"))
            .alias("r"),
            (F.col("o_above") + F.col("o_le")).alias("col_n"),
            "n",
            "k",
            "r_above",
            "r_le",
        )
    )
    num = F.col("o") * F.col("n") - F.col("r") * F.col("col_n")
    terms = spine.filter((F.col("r_above") > 0) & (F.col("r_le") > 0)).select(
        "n",
        "k",
        F.round(
            (num.cast(_D38) * num.cast(_D38)).cast("double")
            / (F.col("n").cast("double") * F.col("r") * F.col("col_n")),
            12,
        ).alias("t"),
    )
    chi = terms.groupBy("n", "k").agg(
        (F.round(F.sum(F.col("t").cast(_D2812)).cast("double"), 9) + F.lit(0.0)).alias(
            "chi2"
        )
    )
    return chi.crossJoin(F.broadcast(med)).select(
        F.col("med").alias("grand_median"),
        F.col("n").cast("bigint").alias("n"),
        F.col("k").cast("bigint").alias("k"),
        (F.col("k") - 1).cast("bigint").alias("dof"),
        "chi2",
    )


# ---------------------------------------------------------------------------
# q_runs_test — Wald-Wolfowitz runs over the daily-mean sequence
# ---------------------------------------------------------------------------


def _daily_means(spark, sf_dir):
    """(day, m): the 12-dp decimal-exact daily mean metric — the
    q_cusum_drift daily frame spelling, shared by the runs and
    Mann-Kendall trend tests."""
    e = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    return e.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.round(
            F.sum(F.col("value").cast("decimal(28,6)")).cast("double")
            / F.count("value"),
            12,
        ).alias("m")
    )


_DAILY_SQL = """
        daily AS (
          SELECT date_trunc('day', ts) AS day,
                 round(CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE)
                       / COUNT(value), 12) AS m
          FROM events WHERE value IS NOT NULL
          GROUP BY 1
        )
"""


@query(
    "q_runs_test",
    oracle=f"""
        WITH {_DAILY_SQL},
        med AS (
          SELECT MIN(m) AS med FROM (
            SELECT m, SUM(COUNT(*)) OVER (ORDER BY m) AS cum,
                   (SELECT COUNT(*) FROM daily) AS n
            FROM daily GROUP BY m
          ) WHERE 2 * cum >= n
        ),
        signs AS (
          SELECT day, CASE WHEN m > (SELECT med FROM med) THEN 1 ELSE 0 END
                        AS s
          FROM daily WHERE m <> (SELECT med FROM med)
        ),
        runs AS (
          SELECT s, CASE WHEN LAG(s) OVER (ORDER BY day) IS NULL
                              OR LAG(s) OVER (ORDER BY day) <> s
                         THEN 1 ELSE 0 END AS new_run
          FROM signs
        ),
        agg AS (
          SELECT CAST(SUM(s) AS BIGINT) AS n1,
                 CAST(SUM(1 - s) AS BIGINT) AS n2,
                 CAST(SUM(new_run) AS BIGINT) AS r
          FROM runs
        )
        SELECT n1, n2, r AS n_runs,
               CASE WHEN n1 > 0 AND n2 > 0 AND n1 + n2 > 1
                         AND 2.0 * n1 * n2 * (2.0 * n1 * n2 - (n1 + n2)) > 0
                    THEN round(
                      (r - (2.0 * n1 * n2 / (n1 + n2) + 1))
                      / sqrt(2.0 * n1 * n2 * (2.0 * n1 * n2 - (n1 + n2))
                             / (CAST(n1 + n2 AS DOUBLE) * (n1 + n2)
                                * (n1 + n2 - 1))), 9) + 0.0
               END AS z
        FROM agg WHERE n1 + n2 > 0
    """,
)
def q_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald-Wolfowitz runs test for serial randomness of the daily mean
    metric: dichotomize each day as above/below the (lower) median of
    the daily means (ties at the median dropped — the textbook
    convention), count the runs R of consecutive equal signs, and
    standardize against the exact run-count moments
    μ = 2·n1·n2/N + 1, σ² = 2n1n2(2n1n2 − N)/(N²(N−1)) — too FEW runs
    means the metric clusters (drift regimes), too many means it
    oscillates; either invalidates an i.i.d.-assuming alarm threshold.

    Determinism: daily means are the 12-dp decimal spelling
    (q_cusum_drift device); the median is the integer-threshold lower
    order statistic over the ≤|days| distinct-mean frame; R, n1, n2
    are exact integers from a lag over the day-ordered bounded frame;
    z is one identical IEEE tree over integers, rounded at 9 dp.
    Degenerate series (all days on one side, or zero variance) yield
    NULL z via exact integer conditions.

    Scale shape: one map-side-combined daily aggregate; everything
    after runs on the ≤|days| frame (bounded single-partition windows,
    the monitor-family contract)."""
    daily = _daily_means(spark, sf_dir).localCheckpoint(eager=True)
    wv = Window.orderBy("m").rowsBetween(Window.unboundedPreceding, 0)
    tot = daily.agg(F.count(F.lit(1)).alias("n"))
    med = (
        daily.groupBy("m")
        .agg(F.count(F.lit(1)).alias("c"))
        .select("m", F.sum("c").over(wv).alias("cum"))
        .crossJoin(F.broadcast(tot))
        .filter(2 * F.col("cum") >= F.col("n"))
        .agg(F.min("m").alias("med"))
    )
    signs = (
        daily.crossJoin(F.broadcast(med))
        .filter(F.col("m") != F.col("med"))
        .select("day", (F.col("m") > F.col("med")).cast("int").alias("s"))
    )
    wd = Window.orderBy("day")
    runs = signs.select(
        "s",
        F.when(
            F.lag("s").over(wd).isNull() | (F.lag("s").over(wd) != F.col("s")), 1
        )
        .otherwise(0)
        .alias("new_run"),
    )
    agg = runs.agg(
        F.sum("s").cast("bigint").alias("n1"),
        F.sum(1 - F.col("s")).cast("bigint").alias("n2"),
        F.sum("new_run").cast("bigint").alias("r"),
    ).filter(F.col("n1") + F.col("n2") > 0)
    n1d = F.col("n1").cast("double")
    n2d = F.col("n2").cast("double")
    nd = n1d + n2d
    two = F.lit(2.0) * F.col("n1") * F.col("n2")
    mu = F.lit(2.0) * F.col("n1") * F.col("n2") / (F.col("n1") + F.col("n2")) + F.lit(
        1
    )
    var = (
        F.lit(2.0)
        * F.col("n1")
        * F.col("n2")
        * (F.lit(2.0) * F.col("n1") * F.col("n2") - (F.col("n1") + F.col("n2")))
        / (nd * (F.col("n1") + F.col("n2")) * (F.col("n1") + F.col("n2") - 1))
    )
    return agg.select(
        "n1",
        "n2",
        F.col("r").alias("n_runs"),
        F.when(
            (F.col("n1") > 0)
            & (F.col("n2") > 0)
            & (F.col("n1") + F.col("n2") > 1)
            & (two * (two - (F.col("n1") + F.col("n2"))) > 0),
            F.round((F.col("r") - mu) / F.sqrt(var), 9) + F.lit(0.0),
        ).alias("z"),
    )


# ---------------------------------------------------------------------------
# q_mann_kendall — monotone trend S/z + Sen's slope over daily means
# ---------------------------------------------------------------------------


@query(
    "q_mann_kendall",
    oracle=f"""
        WITH {_DAILY_SQL},
        idx AS (
          SELECT day, m, ROW_NUMBER() OVER (ORDER BY day) AS rn,
                 (SELECT COUNT(*) FROM daily) AS n
          FROM daily
        ),
        pairs AS (
          SELECT CASE WHEN b.m > a.m THEN 1 WHEN b.m < a.m THEN -1
                      ELSE 0 END AS sgn,
                 (b.m - a.m) / date_diff('day', CAST(a.day AS DATE),
                                         CAST(b.day AS DATE)) AS slope
          FROM idx a JOIN idx b ON b.rn > a.rn
        ),
        ties AS (
          SELECT COALESCE(SUM(t * (t - 1) * (2 * t + 5)), 0) AS tie_term
          FROM (SELECT COUNT(*) AS t FROM daily GROUP BY m) WHERE t > 1
        ),
        sstat AS (
          SELECT CAST(SUM(sgn) AS BIGINT) AS s,
                 CAST(COUNT(*) AS BIGINT) AS n_pairs,
                 (SELECT MAX(n) FROM idx) AS n
          FROM pairs
        ),
        sen2 AS (
          SELECT slope, ROW_NUMBER() OVER (ORDER BY slope) AS rs,
                 COUNT(*) OVER () AS np
          FROM pairs
        ),
        sen_med AS (
          SELECT (MAX(CASE WHEN 2 * rs = np OR 2 * rs = np + 1 THEN slope END)
                  + MIN(CASE WHEN 2 * rs = np + 1 OR 2 * rs = np + 2
                             THEN slope END)) / 2 AS sen_slope
          FROM sen2
        ),
        vars AS (
          SELECT s.s, s.n, s.n_pairs,
                 (CAST(s.n AS DOUBLE) * (s.n - 1) * (2 * s.n + 5)
                  - (SELECT tie_term FROM ties)) / 18 AS var_s
          FROM sstat s
        )
        SELECT CAST(n AS BIGINT) AS n_days, s AS s_stat,
               round(var_s, 9) + 0.0 AS var_s,
               CASE WHEN var_s > 0 THEN
                 round(CASE WHEN s > 0 THEN (s - 1) / sqrt(var_s)
                            WHEN s < 0 THEN (s + 1) / sqrt(var_s)
                            ELSE 0.0 END, 9) + 0.0
               END AS z,
               round((SELECT sen_slope FROM sen_med), 9) + 0.0 AS sen_slope
        FROM vars WHERE n > 0
    """,
)
def q_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall monotone-trend test (Mann 1945; Kendall 1975) with
    tie-corrected variance, plus Sen's (1968) slope, over the daily mean
    metric: S = Σ_(i<j) sgn(m_j − m_i) over all day pairs, z from the
    exact S moments with the ±1 continuity correction, and the trend
    magnitude as the median of all pairwise slopes — THE standard
    distribution-free "is this KPI drifting, and how fast?" readout.

    Determinism: daily means are the 12-dp decimal spelling; S and the
    tie term are exact integers over the bounded |days|² /2 pair frame
    (the q_kendall_tau bounded-self-join device — 30 days is 435 pairs
    at ANY corpus size); pairwise slopes divide two identically-derived
    doubles by an integer day gap (bit-identical IEEE); the Sen median
    is the one-add-one-halve midpoint of the two central order
    statistics of the pair frame; var_s is an integer polynomial over
    18, z one identical IEEE tree — all compared at 9 dp.  A
    zero-variance (all-tied) series yields NULL z via var_s > 0.

    Scale shape: one map-side-combined daily aggregate; the pair join,
    rank window, and medians all run on the ≤|days|²/2 bounded frame.

    LONG-SERIES POSTURE (VERDICT r9): the pair enumeration is O(|days|²)
    — exact and cheap for monitoring windows (435 pairs at 30 days,
    ~5·10⁵ at 3 years) but the wrong spelling past ~10³ points.  For a
    years-long daily series, compute S by the Kendall-tau rank identity
    instead (S = Σ_j (2·r_j − j − 1) summed over the merge-sort inversion
    count — O(n log n), the q_kendall_tau alternative documented in
    SCALE.md), quantize Sen's slope to a percentile-approx of the pair
    distribution, or quantize the series first (weekly means) to bring
    |points| back under the pair budget.  The suite's single-partition
    budget test pins this query to the bounded-frame plan so a silent
    switch to an unbounded pair join cannot land."""
    daily = _daily_means(spark, sf_dir).localCheckpoint(eager=True)
    wd = Window.orderBy("day")
    tot = daily.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    idx = daily.select("day", "m", F.row_number().over(wd).alias("rn"))
    a = idx.select(
        F.col("day").alias("day_a"), F.col("m").alias("m_a"), F.col("rn").alias("rn_a")
    )
    b = idx.select(
        F.col("day").alias("day_b"), F.col("m").alias("m_b"), F.col("rn").alias("rn_b")
    )
    pairs = (
        a.join(b, F.col("rn_b") > F.col("rn_a"))
        .select(
            F.when(F.col("m_b") > F.col("m_a"), 1)
            .when(F.col("m_b") < F.col("m_a"), -1)
            .otherwise(0)
            .alias("sgn"),
            (
                (F.col("m_b") - F.col("m_a"))
                / F.datediff(F.col("day_b").cast("date"), F.col("day_a").cast("date"))
            ).alias("slope"),
        )
        .localCheckpoint(eager=True)  # bounded |days|²/2 rows; 3 consumers
    )
    ties = (
        daily.groupBy("m")
        .agg(F.count(F.lit(1)).alias("t"))
        .filter(F.col("t") > 1)
        .agg(
            F.coalesce(
                F.sum(F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)), F.lit(0)
            ).alias("tie_term")
        )
    )
    sstat = pairs.agg(
        F.sum("sgn").cast("bigint").alias("s"),
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
    )
    ws = Window.orderBy("slope")
    sen2 = pairs.select(
        "slope",
        F.row_number().over(ws).alias("rs"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("np"),
    )
    sen_med = sen2.agg(
        (
            (
                F.max(
                    F.when(
                        (2 * F.col("rs") == F.col("np"))
                        | (2 * F.col("rs") == F.col("np") + 1),
                        F.col("slope"),
                    )
                )
                + F.min(
                    F.when(
                        (2 * F.col("rs") == F.col("np") + 1)
                        | (2 * F.col("rs") == F.col("np") + 2),
                        F.col("slope"),
                    )
                )
            )
            / 2
        ).alias("sen_slope")
    )
    var_s = (
        F.col("n").cast("double") * (F.col("n") - 1) * (2 * F.col("n") + 5)
        - F.col("tie_term")
    ) / F.lit(18)
    return (
        sstat.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(ties))
        .crossJoin(F.broadcast(sen_med))
        # empty corpus: the engine's count() is 0 where the oracle's
        # MAX(rank) is NULL — both drop to zero rows via this exact guard
        .filter(F.col("n") > 0)
        .select(
            F.col("n").alias("n_days"),
            F.col("s").alias("s_stat"),
            (F.round(var_s, 9) + F.lit(0.0)).alias("var_s"),
            F.when(
                var_s > 0,
                F.round(
                    F.when(
                        F.col("s") > 0, (F.col("s") - 1) / F.sqrt(var_s)
                    )
                    .when(F.col("s") < 0, (F.col("s") + 1) / F.sqrt(var_s))
                    .otherwise(F.lit(0.0)),
                    9,
                )
                + F.lit(0.0),
            ).alias("z"),
            (F.round(F.col("sen_slope"), 9) + F.lit(0.0)).alias("sen_slope"),
        )
    )
