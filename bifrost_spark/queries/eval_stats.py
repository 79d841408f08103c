"""Round-7 evaluation-statistics operator family (second batch).

The nonparametric / multiple-testing / concentration statistics an
LLM-data team runs on top of the curation stack — each one the standard
published test for its question, each reduced to the engine's established
exact shapes (integer folds, distinct-value frames, bounded windows):

* **paired classifier comparison** (``q_mcnemar``) — McNemar's test
  (1947) on the discordant pairs of two quality classifiers scored
  against shared ground truth; the right test when both classifiers ran
  on the SAME documents (a two-proportion z-test would ignore pairing);
* **distribution shift without normality** (``q_mann_whitney``) — the
  Mann-Whitney/Wilcoxon rank-sum U (1947), tie-corrected normal
  approximation + the rank-biserial effect size (Cureton 1956): "are
  English documents longer?" asked rank-wise, immune to outliers;
* **corpus divergence** (``q_js_divergence``) — Jensen-Shannon
  divergence (Lin 1991) between two cohorts' unigram distributions, the
  symmetric/bounded cousin of KL that mixture tuning and drift reports
  use (0 = identical corpora, 1 bit = disjoint);
* **keyword-label association** (``q_chi2_keywords``) — per-token
  chi-squared feature selection over document frequencies (Yang &
  Pedersen 1997), the classic "which tokens give the label away"
  screen for leakage/domain-signature audits;
* **monotone association** (``q_spearman_corr``) — Spearman's rho
  (1904) as Pearson over average ranks (exact tie handling), computed
  on 2x-rank INTEGERS so every sum is exact;
* **multiple-testing control** (``q_bh_fdr``) — Benjamini-Hochberg
  (1995) step-up FDR over per-arm chi-square homogeneity tests; the
  df=2 survival function is the CLOSED FORM exp(-x/2), so p-values
  need no erf/gamma special function on either engine;
* **contribution concentration** (``q_gini_users``) — the Gini
  coefficient of per-user metric totals via the rank identity
  G = (2*sum(i*x_i) - (n+1)*sum(x)) / (n*sum(x)), folded over the
  DISTINCT-VALUE frame so no per-row global sort exists;
* **k-classifier marginal homogeneity** (``q_cochran_q``) — Cochran's Q
  (1950) over the q_fleiss_kappa rater panel, the k=3 generalization of
  McNemar, reduced to four exact integer sums;
* **categorical association strength** (``q_cramers_v``) — Cramer's V
  (1946) of the source x language contingency table, the corpus-
  composition coupling number, folded over the bounded cell frame.

Determinism discipline (house rules): compared doubles are either single
IEEE operations on exact integers/decimals or identically-spelled trees
rounded at 9 dp with +0.0 canonicalizing -0.0; log/exp terms round at
12 dp and accumulate in DECIMAL (order-free); ranks tie-break on ids;
NULL inputs are excluded explicitly on both engines; degenerate inputs
(empty cohorts, zero variance, zero totals) emit no row or NULL by an
integer-exact condition, never a cross-engine x/0 disagreement.  All
outputs are scalar columns only (driver canonicalization).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bifrost_spark.queries.llm_text import _SW_SQL, STOPWORDS
from bifrost_spark.registry import query
from bifrost_spark.tables import load_table

# Shared group split for the document-cohort statistics: English vs rest.
# NULL lang counts as "other" via null-safe equality (both engines).
_EN_SQL = "(lang IS NOT DISTINCT FROM 'en')"

# Shared tokenizer spelling (the q_hapax_report device).
_TOKS_SQL = "list_filter(string_split(lower(text), ' '), t -> t <> '')"


def _toks_col():
    return F.filter(F.split(F.lower("text"), " ", -1), lambda t: t != "")


def _en_col():
    return F.col("lang").eqNullSafe("en")


# ---------------------------------------------------------------------------
# q_mcnemar — paired comparison of two quality classifiers
# ---------------------------------------------------------------------------


@query(
    "q_mcnemar",
    oracle=f"""
        WITH scored AS (
          SELECT {_EN_SQL} AS truth,
                 (len(list_filter(string_split(lower(text), ' '),
                                  t -> t IN {_SW_SQL})) * 20
                    >= len(string_split(text, ' '))) AS pred_a,
                 contains(lower(text), 'the') AS pred_b
          FROM documents WHERE text IS NOT NULL
        ),
        c AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(COUNT(*) FILTER (WHERE pred_a = truth
                                         AND pred_b <> truth)
                      AS BIGINT) AS b_disc,
                 CAST(COUNT(*) FILTER (WHERE pred_a <> truth
                                         AND pred_b = truth)
                      AS BIGINT) AS c_disc
          FROM scored
        )
        SELECT n, b_disc, c_disc,
               CASE WHEN b_disc + c_disc = 0 THEN NULL
                    ELSE round(CAST(GREATEST(abs(b_disc - c_disc) - 1, 0)
                                    AS DOUBLE)
                               * GREATEST(abs(b_disc - c_disc) - 1, 0)
                               / (b_disc + c_disc), 9)
               END AS chi2_cc
        FROM c
    """,
)
def q_mcnemar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """McNemar's test (1947, continuity-corrected) comparing TWO is-English
    classifiers on the SAME documents: the stopword-ratio heuristic
    (q_lang_id's classifier) vs the lexical 'the'-substring heuristic,
    scored against the lang metadata as ground truth.  Because both
    classifiers saw identical examples, only the DISCORDANT pairs carry
    information (b = A right/B wrong, c = A wrong/B right); the unpaired
    two-proportion z-test (q_ab_test's shape) would be wrong here — this
    is the test a model-eval pipeline runs for "did classifier v2 beat
    v1 on the shared eval set?".  Docs with NULL text can't be scored
    and are excluded on both engines.

    Scale shape: three scan-local boolean expressions, ONE map-side-
    combined scalar aggregate carrying three exact integer counts — a
    single summary row regardless of corpus size (the q_kappa_agreement
    shape).

    Determinism: b and c are exact integers; the continuity-corrected
    statistic (|b-c|-1)^2/(b+c) (clamped at 0 when b=c, the standard
    Edwards 1948 correction) is integer arithmetic up to one IEEE
    division, rounded at 9 dp; b+c=0 (perfectly concordant classifiers)
    yields NULL by an integer condition on both engines."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    toks_lower = F.split(F.lower("text"), " ", -1)
    sw_hits = F.size(F.filter(toks_lower, lambda t: t.isin(*STOPWORDS)))
    n_toks = F.size(F.split("text", " ", -1))
    truth = _en_col()
    pred_a = sw_hits * 20 >= n_toks
    pred_b = F.lower("text").contains("the")
    c = d.select(
        truth.alias("truth"), pred_a.alias("pa"), pred_b.alias("pb")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.count(
            F.when((F.col("pa") == F.col("truth"))
                   & (F.col("pb") != F.col("truth")), F.lit(1))
        ).cast("bigint").alias("b_disc"),
        F.count(
            F.when((F.col("pa") != F.col("truth"))
                   & (F.col("pb") == F.col("truth")), F.lit(1))
        ).cast("bigint").alias("c_disc"),
    )
    corr = F.greatest(
        F.abs(F.col("b_disc") - F.col("c_disc")) - 1, F.lit(0)
    )
    return c.select(
        "n",
        "b_disc",
        "c_disc",
        F.when(F.col("b_disc") + F.col("c_disc") == 0, F.lit(None).cast("double"))
        .otherwise(
            F.round(
                corr.cast("double") * corr / (F.col("b_disc") + F.col("c_disc")),
                9,
            )
        )
        .alias("chi2_cc"),
    )


# ---------------------------------------------------------------------------
# q_mann_whitney — tie-corrected rank-sum test over the distinct-value frame
# ---------------------------------------------------------------------------


@query(
    "q_mann_whitney",
    oracle=f"""
        WITH pts AS (
          SELECT n_chars AS v,
                 CAST(COUNT(*) FILTER (WHERE {_EN_SQL}) AS BIGINT) AS c1,
                 CAST(COUNT(*) FILTER (WHERE NOT {_EN_SQL}) AS BIGINT) AS c2
          FROM documents
          WHERE text IS NOT NULL AND n_chars IS NOT NULL
          GROUP BY n_chars
        ),
        cum AS (
          SELECT c1, c2, c1 + c2 AS c,
                 SUM(c1 + c2) OVER (ORDER BY v
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND CURRENT ROW) - (c1 + c2) AS cumb
          FROM pts
        ),
        s AS (
          SELECT CAST(SUM(c1) AS BIGINT) AS n1,
                 CAST(SUM(c2) AS BIGINT) AS n2,
                 SUM(CAST(c1 AS DECIMAL(38,0)) * (2 * cumb + c + 1)) AS r2x1,
                 SUM(CAST(c AS DECIMAL(38,0)) * c * c - c) AS ties
          FROM cum
        )
        SELECT n1, n2,
               (CAST(r2x1 AS DOUBLE)
                  - CAST(n1 AS DOUBLE) * (CAST(n1 AS DOUBLE) + 1.0)) / 2.0
                 AS u1,
               CASE WHEN n1 + n2 < 2
                         OR (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 12.0)
                            * ((CAST(n1 + n2 AS DOUBLE) + 1.0)
                               - CAST(ties AS DOUBLE)
                                 / (CAST(n1 + n2 AS DOUBLE)
                                    * (CAST(n1 + n2 AS DOUBLE) - 1.0))) <= 0.0
                    THEN NULL
                    ELSE round(((CAST(r2x1 AS DOUBLE)
                                   - CAST(n1 AS DOUBLE)
                                     * (CAST(n1 AS DOUBLE) + 1.0)) / 2.0
                                - CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 2.0)
                               / sqrt((CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
                                       / 12.0)
                                      * ((CAST(n1 + n2 AS DOUBLE) + 1.0)
                                         - CAST(ties AS DOUBLE)
                                           / (CAST(n1 + n2 AS DOUBLE)
                                              * (CAST(n1 + n2 AS DOUBLE)
                                                 - 1.0)))), 9) + 0.0
               END AS z,
               round((CAST(r2x1 AS DOUBLE)
                        - CAST(n1 AS DOUBLE) * (CAST(n1 AS DOUBLE) + 1.0))
                       / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)) - 1.0, 9)
                 + 0.0 AS r_rb
        FROM s WHERE n1 > 0 AND n2 > 0
    """,
)
def q_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U rank-sum test (1947): are English documents longer
    (n_chars) than non-English ones, asked RANK-wise — the standard
    nonparametric alternative to the t-test when the metric is skewed
    (document lengths always are).  Reports U for the English side, the
    tie-corrected normal z (the large-sample approximation every stats
    package uses), and the rank-biserial effect size r = 2U/(n1*n2) - 1
    (Cureton 1956; the group-1 convention — POSITIVE when English
    documents tend to rank longer).  Docs with NULL text or NULL n_chars are excluded on
    both engines; either cohort empty → no row (U is undefined).

    Scale shape: ONE map-side-combined aggregate to the DISTINCT-VALUE
    frame (the q_ks_drift device — |distinct lengths|, not |docs|), a
    cumulative window over that bounded frame, then one scalar fold.  No
    per-document rank is ever materialized, so no fact-table-sized sort
    exists at any size.

    Determinism: average ranks are half-integers, so the fold carries
    2x-rank INTEGERS — rank-sum and tie term accumulate in DECIMAL(38,0)
    (exact, order-free; at 10^13 rows 2*sum(c1*rank) needs ~87 bits).
    u1/z/r_rb derive from those exact integers through identically-
    spelled IEEE trees; z and r_rb round at 9 dp with +0.0 canonicalizing
    -0.0; zero variance (every value tied) yields NULL z by an exact
    condition, never a 0/0."""
    d = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull() & F.col("n_chars").isNotNull()
    )
    en = _en_col().cast("long")
    pts = (
        d.select(F.col("n_chars").alias("v"), en.alias("e"))
        .groupBy("v")
        .agg(
            F.sum("e").cast("bigint").alias("c1"),
            F.sum(F.lit(1) - F.col("e")).cast("bigint").alias("c2"),
        )
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    c = F.col("c1") + F.col("c2")
    cum = pts.select(
        "c1",
        "c2",
        c.alias("c"),
        (F.sum(c).over(w) - c).alias("cumb"),
    )
    s = cum.agg(
        F.sum("c1").cast("bigint").alias("n1"),
        F.sum("c2").cast("bigint").alias("n2"),
        F.sum(
            F.col("c1").cast("decimal(38,0)")
            * (2 * F.col("cumb") + F.col("c") + 1)
        ).alias("r2x1"),
        F.sum(
            F.col("c").cast("decimal(38,0)") * F.col("c") * F.col("c")
            - F.col("c")
        ).alias("ties"),
    )
    n1d = F.col("n1").cast("double")
    n2d = F.col("n2").cast("double")
    nd = (F.col("n1") + F.col("n2")).cast("double")
    u1 = (F.col("r2x1").cast("double") - n1d * (n1d + F.lit(1.0))) / F.lit(2.0)
    sig2 = (n1d * n2d / F.lit(12.0)) * (
        (nd + F.lit(1.0))
        - F.col("ties").cast("double") / (nd * (nd - F.lit(1.0)))
    )
    return s.filter((F.col("n1") > 0) & (F.col("n2") > 0)).select(
        "n1",
        "n2",
        u1.alias("u1"),
        F.when(
            (F.col("n1") + F.col("n2") < 2) | (sig2 <= F.lit(0.0)),
            F.lit(None).cast("double"),
        )
        .otherwise(
            F.round((u1 - n1d * n2d / F.lit(2.0)) / F.sqrt(sig2), 9)
            + F.lit(0.0)
        )
        .alias("z"),
        (
            F.round(F.lit(2.0) * u1 / (n1d * n2d) - F.lit(1.0), 9) + F.lit(0.0)
        ).alias("r_rb"),
    )


# ---------------------------------------------------------------------------
# q_js_divergence — Jensen-Shannon divergence between cohort unigram dists
# ---------------------------------------------------------------------------


@query(
    "q_js_divergence",
    oracle=f"""
        WITH tok AS (
          SELECT {_EN_SQL} AS en,
                 unnest({_TOKS_SQL}) AS t
          FROM documents WHERE text IS NOT NULL
        ),
        tf AS (
          SELECT t,
                 CAST(COUNT(*) FILTER (WHERE en) AS BIGINT) AS ca,
                 CAST(COUNT(*) FILTER (WHERE NOT en) AS BIGINT) AS cb
          FROM tok GROUP BY t
        ),
        tot AS (SELECT SUM(ca) AS na, SUM(cb) AS nb FROM tf),
        terms AS (
          SELECT na, nb,
                 CASE WHEN ca = 0 THEN 0.0
                      ELSE 0.5 * (CAST(ca AS DOUBLE) / na)
                           * log2((CAST(ca AS DOUBLE) / na)
                                  / (((CAST(ca AS DOUBLE) / na)
                                      + (CAST(cb AS DOUBLE) / nb)) / 2.0))
                 END
                 + CASE WHEN cb = 0 THEN 0.0
                        ELSE 0.5 * (CAST(cb AS DOUBLE) / nb)
                             * log2((CAST(cb AS DOUBLE) / nb)
                                    / (((CAST(ca AS DOUBLE) / na)
                                        + (CAST(cb AS DOUBLE) / nb)) / 2.0))
                   END AS term
          FROM tf CROSS JOIN tot
          WHERE na > 0 AND nb > 0
        )
        SELECT CAST(na AS BIGINT) AS n_tokens_en,
               CAST(nb AS BIGINT) AS n_tokens_other,
               CAST(COUNT(*) AS BIGINT) AS n_types,
               round(CAST(SUM(CAST(round(term, 12) AS DECIMAL(28,12)))
                          AS DOUBLE), 9) + 0.0 AS jsd
        FROM terms GROUP BY na, nb
    """,
)
def q_js_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jensen-Shannon divergence (Lin 1991, in bits) between the unigram
    token distributions of the English and non-English document cohorts —
    the symmetric, bounded-[0,1] corpus-divergence number mixture tuning
    and ingest-drift reports quote (0 = identical language, 1 = disjoint
    vocabularies).  The per-token fold is
    0.5*p*log2(p/m) + 0.5*q*log2(q/m) with m=(p+q)/2; zero-count sides
    contribute exactly 0 by an integer condition (the 0*log0 limit).
    Docs with NULL text are excluded; either cohort empty → no row.

    Scale shape: explode → ONE (token) hash aggregate carrying both
    cohort counts (map-side combined, |vocab| rows out of the shuffle),
    a 1-row totals fold over that frame broadcast back, then one scalar
    sum — text never moves past the scan, nothing scales past |vocab|.

    Determinism: p and q are single divisions of exact integers; log2 may
    differ by 1 ulp between libm builds AND the term sum is order-
    sensitive, so each term rounds at 12 dp and accumulates in
    DECIMAL(28,12) (order-free — the q_psi_drift device), with the final
    scalar rounded at 9 dp and +0.0 canonicalizing -0.0."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    tok = d.select(_en_col().cast("long").alias("e"), F.explode(_toks_col()).alias("t"))
    tf = (
        tok.groupBy("t")
        .agg(
            F.sum("e").cast("bigint").alias("ca"),
            F.sum(F.lit(1) - F.col("e")).cast("bigint").alias("cb"),
        )
        .localCheckpoint(eager=True)  # consumed by totals AND the term fold
    )
    tot = tf.agg(
        F.sum("ca").cast("bigint").alias("na"),
        F.sum("cb").cast("bigint").alias("nb"),
    )
    pa = F.col("ca").cast("double") / F.col("na")
    pb = F.col("cb").cast("double") / F.col("nb")
    m = (pa + pb) / F.lit(2.0)
    term = F.when(F.col("ca") == 0, F.lit(0.0)).otherwise(
        F.lit(0.5) * pa * F.log2(pa / m)
    ) + F.when(F.col("cb") == 0, F.lit(0.0)).otherwise(
        F.lit(0.5) * pb * F.log2(pb / m)
    )
    return (
        tf.crossJoin(F.broadcast(tot))
        .filter((F.col("na") > 0) & (F.col("nb") > 0))
        .groupBy("na", "nb")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_types"),
            (
                F.round(
                    F.sum(F.round(term, 12).cast("decimal(28,12)")).cast(
                        "double"
                    ),
                    9,
                )
                + F.lit(0.0)
            ).alias("jsd"),
        )
        .select(
            F.col("na").alias("n_tokens_en"),
            F.col("nb").alias("n_tokens_other"),
            "n_types",
            "jsd",
        )
    )


# ---------------------------------------------------------------------------
# q_chi2_keywords — chi-squared token-label association (feature selection)
# ---------------------------------------------------------------------------

_CHI2_TOPK = 30
_CHI2_MIN_DF = 5


@query(
    "q_chi2_keywords",
    oracle=f"""
        WITH base AS (
          SELECT doc_id, {_EN_SQL} AS en,
                 list_distinct({_TOKS_SQL}) AS ts
          FROM documents WHERE text IS NOT NULL
        ),
        tot AS (
          SELECT CAST(COUNT(*) FILTER (WHERE en) AS BIGINT) AS ne,
                 CAST(COUNT(*) FILTER (WHERE NOT en) AS BIGINT) AS no
          FROM base
        ),
        df AS (
          SELECT t,
                 CAST(COUNT(*) FILTER (WHERE en) AS BIGINT) AS a,
                 CAST(COUNT(*) FILTER (WHERE NOT en) AS BIGINT) AS b
          FROM (SELECT doc_id, en, unnest(ts) AS t FROM base)
          GROUP BY t
        ),
        scored AS (
          SELECT t AS token, a AS df_en, b AS df_other,
                 round((CAST(a + b + ((SELECT ne FROM tot) - a)
                               + ((SELECT no FROM tot) - b) AS DOUBLE)
                        * (CAST(a AS DOUBLE)
                             * ((SELECT no FROM tot) - b)
                           - CAST(b AS DOUBLE)
                             * ((SELECT ne FROM tot) - a))
                        * (CAST(a AS DOUBLE)
                             * ((SELECT no FROM tot) - b)
                           - CAST(b AS DOUBLE)
                             * ((SELECT ne FROM tot) - a)))
                       / (CAST(a + b AS DOUBLE)
                          * (((SELECT ne FROM tot) - a)
                             + ((SELECT no FROM tot) - b))
                          * (SELECT ne FROM tot)
                          * (SELECT no FROM tot)), 9) + 0.0 AS chi2
          FROM df
          WHERE a + b >= {_CHI2_MIN_DF}
            AND ((SELECT ne FROM tot) - a) + ((SELECT no FROM tot) - b) > 0
            AND (SELECT ne FROM tot) > 0 AND (SELECT no FROM tot) > 0
        )
        SELECT token, df_en, df_other, chi2,
               CAST(ROW_NUMBER() OVER (ORDER BY chi2 DESC, token) AS BIGINT)
                 AS rnk
        FROM scored
        ORDER BY chi2 DESC, token LIMIT {_CHI2_TOPK}
    """,
)
def q_chi2_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-squared keyword-label association (Yang & Pedersen 1997): for
    every token, the 2x2 chi-square between "document contains the token"
    and "document is English", reported as the top-30 give-away
    tokens — the classic feature-selection / label-leakage screen a
    curation team runs before training a quality classifier.  Document
    frequency (distinct per doc), not term frequency; tokens under
    5 total df are noise and excluded, as are degenerate
    margins (a token in EVERY document, or an empty cohort).

    Scale shape: per-doc distinct tokens are scan-local (array_distinct),
    ONE (token) hash aggregate carries both cohort dfs (|vocab| rows),
    the 2-scalar doc totals broadcast back, and the top-k is
    TakeOrdered — never a global sort; the only single-partition window
    ranks the 30 surviving rows.  The shared base frame is
    checkpointed so totals and dfs don't rescan the corpus.

    Determinism: a, b and the margins are exact integers; chi2 =
    N*(ad-bc)^2 / ((a+b)(c+d)(a+c)(b+d)) is spelled identically as one
    double tree (products up to ~1e19 round identically under IEEE on
    both engines), rounded at 9 dp with +0.0; ordering uses the rounded
    value with the token as tiebreaker."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    base = d.select(
        _en_col().cast("long").alias("e"),
        F.array_distinct(_toks_col()).alias("ts"),
    ).localCheckpoint(eager=True)  # consumed by totals AND the df aggregate
    tot = base.agg(
        F.sum("e").cast("bigint").alias("ne"),
        F.sum(F.lit(1) - F.col("e")).cast("bigint").alias("no"),
    )
    df = (
        base.select("e", F.explode("ts").alias("t"))
        .groupBy("t")
        .agg(
            F.sum("e").cast("bigint").alias("a"),
            F.sum(F.lit(1) - F.col("e")).cast("bigint").alias("b"),
        )
    )
    ad, bd = F.col("a").cast("double"), F.col("b").cast("double")
    cd = (F.col("ne") - F.col("a")).cast("double")
    dd = (F.col("no") - F.col("b")).cast("double")
    nd = (F.col("a") + F.col("b")).cast("double") + cd + dd
    delta = ad * dd - bd * cd
    chi2 = (
        F.round(
            nd * delta * delta
            / (
                (F.col("a") + F.col("b")).cast("double")
                * (cd + dd)
                * F.col("ne").cast("double")
                * F.col("no").cast("double")
            ),
            9,
        )
        + F.lit(0.0)
    )
    scored = (
        df.crossJoin(F.broadcast(tot))
        .filter(
            (F.col("a") + F.col("b") >= _CHI2_MIN_DF)
            & ((F.col("ne") - F.col("a")) + (F.col("no") - F.col("b")) > 0)
            & (F.col("ne") > 0)
            & (F.col("no") > 0)
        )
        .select(
            F.col("t").alias("token"),
            F.col("a").alias("df_en"),
            F.col("b").alias("df_other"),
            chi2.alias("chi2"),
        )
        .orderBy(F.desc("chi2"), F.asc("token"))
        .limit(_CHI2_TOPK)
    )
    w = Window.orderBy(F.desc("chi2"), F.asc("token"))
    return scored.select(
        "token",
        "df_en",
        "df_other",
        "chi2",
        F.row_number().over(w).cast("bigint").alias("rnk"),
    )


# ---------------------------------------------------------------------------
# q_spearman_corr — Spearman's rho on exact 2x average ranks
# ---------------------------------------------------------------------------


@query(
    "q_spearman_corr",
    oracle=f"""
        WITH base AS (
          SELECT doc_id, n_chars AS x,
                 CAST(len({_TOKS_SQL}) AS BIGINT) AS y
          FROM documents WHERE text IS NOT NULL AND n_chars IS NOT NULL
        ),
        xr AS (
          SELECT x, 2 * (SUM(c) OVER (ORDER BY x
                                      ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND CURRENT ROW) - c) + c + 1 AS rx2
          FROM (SELECT x, CAST(COUNT(*) AS BIGINT) AS c FROM base GROUP BY x)
        ),
        yr AS (
          SELECT y, 2 * (SUM(c) OVER (ORDER BY y
                                      ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND CURRENT ROW) - c) + c + 1 AS ry2
          FROM (SELECT y, CAST(COUNT(*) AS BIGINT) AS c FROM base GROUP BY y)
        ),
        s AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 SUM(CAST(rx2 AS DECIMAL(38,0))) AS sx,
                 SUM(CAST(ry2 AS DECIMAL(38,0))) AS sy,
                 SUM(CAST(rx2 AS DECIMAL(38,0)) * ry2) AS sxy,
                 SUM(CAST(rx2 AS DECIMAL(38,0)) * rx2) AS sxx,
                 SUM(CAST(ry2 AS DECIMAL(38,0)) * ry2) AS syy
          FROM base JOIN xr USING (x) JOIN yr USING (y)
        )
        SELECT n,
               CASE WHEN CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                           - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) <= 0.0
                         OR CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                           - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) <= 0.0
                    THEN NULL
                    ELSE round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                                - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                               / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                                       - CAST(sx AS DOUBLE)
                                         * CAST(sx AS DOUBLE))
                                      * (CAST(n AS DOUBLE)
                                         * CAST(syy AS DOUBLE)
                                         - CAST(sy AS DOUBLE)
                                           * CAST(sy AS DOUBLE))), 9) + 0.0
               END AS rho
        FROM s WHERE n > 0
    """,
)
def q_spearman_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation (1904) between document length in chars
    and in tokens — the monotone-association number (robust to outliers
    and nonlinearity) a data-quality report quotes where Pearson would be
    distorted by the length tail.  Ties get average ranks (the exact
    Spearman, not the d^2 shortcut, which is biased under ties); rho is
    Pearson over those ranks.  Docs with NULL text or NULL n_chars are
    excluded; zero variance on either side (all docs the same length)
    yields NULL by an exact integer condition.

    Scale shape: rank maps are built over each variable's DISTINCT-VALUE
    frame (the q_ks_drift device — cumulative window over |distinct
    values|, never a per-row global sort), equi-joined back to the doc
    frame, then ONE map-side-combined scalar fold.  The base projection
    is checkpointed once; the corpus is scanned exactly once.

    Determinism: average ranks are half-integers, so the engine carries
    2x-rank INTEGERS end-to-end; all five sums accumulate in
    DECIMAL(38,0) (exact, order-free; sum(rx2*ry2) needs ~3*log2(n) bits
    — 90 at 10^9 docs); rho is one identically-spelled double tree over
    those exact sums, rounded at 9 dp with +0.0.  Rho is invariant to
    the linear 2x+1 rank rescaling, so the integer spelling equals the
    textbook definition exactly."""
    d = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull() & F.col("n_chars").isNotNull()
    )
    base = d.select(
        F.col("n_chars").alias("x"),
        F.size(_toks_col()).cast("bigint").alias("y"),
    ).localCheckpoint(eager=True)  # rank maps + the join probe reuse it

    def rank2(col: str, out: str) -> DataFrame:
        pts = base.groupBy(col).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        w = Window.orderBy(col).rowsBetween(Window.unboundedPreceding, 0)
        return pts.select(
            col,
            (
                2 * (F.sum("c").over(w) - F.col("c")) + F.col("c") + 1
            ).alias(out),
        )

    joined = base.join(rank2("x", "rx2"), "x").join(rank2("y", "ry2"), "y")
    s = joined.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("rx2").cast("decimal(38,0)")).alias("sx"),
        F.sum(F.col("ry2").cast("decimal(38,0)")).alias("sy"),
        F.sum(F.col("rx2").cast("decimal(38,0)") * F.col("ry2")).alias("sxy"),
        F.sum(F.col("rx2").cast("decimal(38,0)") * F.col("rx2")).alias("sxx"),
        F.sum(F.col("ry2").cast("decimal(38,0)") * F.col("ry2")).alias("syy"),
    )
    ndd = F.col("n").cast("double")
    sxd, syd = F.col("sx").cast("double"), F.col("sy").cast("double")
    vx = ndd * F.col("sxx").cast("double") - sxd * sxd
    vy = ndd * F.col("syy").cast("double") - syd * syd
    return s.filter(F.col("n") > 0).select(
        "n",
        F.when((vx <= F.lit(0.0)) | (vy <= F.lit(0.0)), F.lit(None).cast("double"))
        .otherwise(
            F.round(
                (ndd * F.col("sxy").cast("double") - sxd * syd)
                / F.sqrt(vx * vy),
                9,
            )
            + F.lit(0.0)
        )
        .alias("rho"),
    )


# ---------------------------------------------------------------------------
# q_bh_fdr — Benjamini-Hochberg FDR over per-arm chi-square tests
# ---------------------------------------------------------------------------

_BH_ARMS = 16  # deterministic arm assignment: user_id % 16 (q_ctr_wilson)
_BH_ALPHA = 0.05


@query(
    "q_bh_fdr",
    oracle=f"""
        WITH v AS (
          SELECT user_id % {_BH_ARMS} AS variant,
                 CAST(COUNT(*) AS BIGINT) AS n_trials,
                 CAST(COUNT(*) FILTER (WHERE event_type = 'purchase')
                      AS BIGINT) AS o2,
                 CAST(COUNT(*) FILTER (WHERE event_type = 'click')
                      AS BIGINT) AS o1,
                 CAST(COUNT(*) FILTER (WHERE event_type NOT IN
                                       ('purchase', 'click'))
                      AS BIGINT) AS o0
          FROM events WHERE user_id IS NOT NULL
          GROUP BY user_id % {_BH_ARMS}
        ),
        tot AS (
          SELECT SUM(n_trials) AS nt, SUM(o0) AS t0,
                 SUM(o1) AS t1, SUM(o2) AS t2
          FROM v
        ),
        chi AS (
          SELECT variant, n_trials,
                 round(
                   (CASE WHEN (SELECT t0 FROM tot) = 0 THEN 0.0
                         ELSE (CAST(o0 AS DOUBLE)
                               - CAST(n_trials AS DOUBLE)
                                 * (SELECT t0 FROM tot) / (SELECT nt FROM tot))
                              * (CAST(o0 AS DOUBLE)
                                 - CAST(n_trials AS DOUBLE)
                                   * (SELECT t0 FROM tot)
                                   / (SELECT nt FROM tot))
                              / (CAST(n_trials AS DOUBLE)
                                 * (SELECT t0 FROM tot) / (SELECT nt FROM tot))
                    END)
                   + (CASE WHEN (SELECT t1 FROM tot) = 0 THEN 0.0
                           ELSE (CAST(o1 AS DOUBLE)
                                 - CAST(n_trials AS DOUBLE)
                                   * (SELECT t1 FROM tot)
                                   / (SELECT nt FROM tot))
                                * (CAST(o1 AS DOUBLE)
                                   - CAST(n_trials AS DOUBLE)
                                     * (SELECT t1 FROM tot)
                                     / (SELECT nt FROM tot))
                                / (CAST(n_trials AS DOUBLE)
                                   * (SELECT t1 FROM tot)
                                   / (SELECT nt FROM tot))
                      END)
                   + (CASE WHEN (SELECT t2 FROM tot) = 0 THEN 0.0
                           ELSE (CAST(o2 AS DOUBLE)
                                 - CAST(n_trials AS DOUBLE)
                                   * (SELECT t2 FROM tot)
                                   / (SELECT nt FROM tot))
                                * (CAST(o2 AS DOUBLE)
                                   - CAST(n_trials AS DOUBLE)
                                     * (SELECT t2 FROM tot)
                                     / (SELECT nt FROM tot))
                                / (CAST(n_trials AS DOUBLE)
                                   * (SELECT t2 FROM tot)
                                   / (SELECT nt FROM tot))
                      END), 9) + 0.0 AS chi2
          FROM v
        ),
        p AS (
          SELECT variant, n_trials, chi2,
                 round(exp(-chi2 / 2.0), 12) + 0.0 AS p_raw,
                 CAST(ROW_NUMBER() OVER (
                   ORDER BY round(exp(-chi2 / 2.0), 12) + 0.0, variant
                 ) AS BIGINT) AS i,
                 CAST(COUNT(*) OVER () AS BIGINT) AS m
          FROM chi
        ),
        adj AS (
          SELECT variant, n_trials, chi2, p_raw, i,
                 LEAST(MIN(round(p_raw * m / i, 12))
                         OVER (ORDER BY i DESC
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW), 1.0) AS p_adj
          FROM p
        )
        SELECT variant, n_trials, chi2, p_raw, p_adj,
               CAST(p_adj <= {_BH_ALPHA} AS INT) AS rejected
        FROM adj
    """,
)
def q_bh_fdr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini-Hochberg step-up FDR control (1995) over 16
    simultaneous per-arm tests — the multiple-comparisons discipline an
    experimentation platform applies before declaring any arm "different"
    (at m=16 arms, alpha=0.05 per test yields ~0.56 familywise false-
    positive odds; BH caps the FALSE DISCOVERY RATE instead).  Each arm
    (user_id % 16) gets a 3-category chi-square homogeneity test
    of its event-outcome mix (purchase / click / other) against the
    pooled mix — df = 2, whose survival function is the CLOSED FORM
    exp(-x/2): exact p-values with no erf/gamma special function on
    either engine.  Events without a user can't be assigned an arm and
    are excluded on both engines.

    Scale shape: one hash aggregate (map-side combined) to 16 arm
    rows; totals, scoring, ranking, and the step-up running minimum all
    run over that bounded arm table — every single-partition stage is
    bounded by the modulus, never the event volume (the q_ctr_wilson
    proof).

    Determinism: observed/expected derive from exact integers through an
    identically-spelled double tree; chi2 rounds at 9 dp BEFORE exp (so
    both engines exponentiate the same double), p at 12 dp; BH orders by
    (rounded p, variant) and takes the running minimum of 12-dp-rounded
    step terms — every compared value is rounded, every tie broken on
    the arm id."""
    e = load_table(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    v = e.groupBy((F.col("user_id") % _BH_ARMS).alias("variant")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_trials"),
        F.count(F.when(F.col("event_type") == "purchase", 1))
        .cast("bigint")
        .alias("o2"),
        F.count(F.when(F.col("event_type") == "click", 1))
        .cast("bigint")
        .alias("o1"),
        F.count(
            F.when(~F.col("event_type").isin("purchase", "click"), 1)
        )
        .cast("bigint")
        .alias("o0"),
    ).localCheckpoint(eager=True)  # totals AND per-arm scoring reuse it
    tot = v.agg(
        F.sum("n_trials").alias("nt"),
        F.sum("o0").alias("t0"),
        F.sum("o1").alias("t1"),
        F.sum("o2").alias("t2"),
    )

    def cat_term(o: str, t: str):
        exp_ = (
            F.col("n_trials").cast("double")
            * F.col(t)
            / F.col("nt")
        )
        dev = F.col(o).cast("double") - exp_
        return F.when(F.col(t) == 0, F.lit(0.0)).otherwise(dev * dev / exp_)

    chi2 = (
        F.round(
            cat_term("o0", "t0") + cat_term("o1", "t1") + cat_term("o2", "t2"),
            9,
        )
        + F.lit(0.0)
    )
    chi = v.crossJoin(F.broadcast(tot)).select(
        "variant", "n_trials", chi2.alias("chi2")
    )
    p_raw = F.round(F.exp(-F.col("chi2") / F.lit(2.0)), 12) + F.lit(0.0)
    wi = Window.orderBy(F.asc("p_raw"), F.asc("variant"))
    p = chi.select("variant", "n_trials", "chi2", p_raw.alias("p_raw")).select(
        "*",
        F.row_number().over(wi).cast("bigint").alias("i"),
        F.count(F.lit(1)).over(
            Window.rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).cast("bigint").alias("m"),
    )
    wmin = Window.orderBy(F.desc("i")).rowsBetween(Window.unboundedPreceding, 0)
    adj = p.select(
        "variant",
        "n_trials",
        "chi2",
        "p_raw",
        F.least(
            F.min(F.round(F.col("p_raw") * F.col("m") / F.col("i"), 12)).over(
                wmin
            ),
            F.lit(1.0),
        ).alias("p_adj"),
    )
    return adj.select(
        "variant",
        "n_trials",
        "chi2",
        "p_raw",
        "p_adj",
        (F.col("p_adj") <= _BH_ALPHA).cast("int").alias("rejected"),
    )


# ---------------------------------------------------------------------------
# q_gini_users — contribution-concentration Gini over the value frame
# ---------------------------------------------------------------------------


@query(
    "q_gini_users",
    oracle="""
        WITH per_user AS (
          SELECT user_id,
                 CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                   AS s
          FROM events
          WHERE user_id IS NOT NULL AND value IS NOT NULL
          GROUP BY user_id
        ),
        runs AS (
          SELECT s, CAST(COUNT(*) AS BIGINT) AS c FROM per_user GROUP BY s
        ),
        cum AS (
          SELECT s, c,
                 SUM(c) OVER (ORDER BY s
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) - c AS cumb
          FROM runs
        ),
        agg AS (
          SELECT CAST(SUM(c) AS BIGINT) AS n,
                 SUM(CAST(s AS DECIMAL(38,0)) * c) AS total,
                 SUM(CAST(s AS DECIMAL(38,0))
                     * (2 * c * cumb + c * (c + 1))) AS a2
          FROM cum
        )
        SELECT n, CAST(total AS BIGINT) AS total_cents,
               round((CAST(a2 AS DOUBLE)
                      - (CAST(n AS DOUBLE) + 1.0) * CAST(total AS DOUBLE))
                     / (CAST(n AS DOUBLE) * CAST(total AS DOUBLE)), 9) + 0.0
                 AS gini
        FROM agg WHERE n > 0 AND total > 0
    """,
)
def q_gini_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of per-user metric contribution — the
    concentration number behind "1% of users generate 60% of the data",
    which a curation pipeline watches because heavy-contributor skew is
    both a dedup hazard and a privacy/cap-enforcement trigger (the
    q_domain_cap companion diagnostic).  Uses the rank identity
    G = (2*sum(i*x_(i)) - (n+1)*sum(x)) / (n*sum(x)); within a run of
    tied values the position sum is invariant to tie order, so the fold
    is exact.  Events without a user or value are excluded; a zero or
    negative grand total leaves G undefined → no row (integer condition,
    never a cross-engine x/0).

    Scale shape: one hash aggregate to per-user totals, ONE aggregate to
    the DISTINCT-VALUE frame (runs of equal spend), a cumulative window
    over that bounded frame, then a scalar fold — the per-user global
    sort the textbook formula implies never exists (the q_ks_drift
    device: sum(i*x) over a tied run folds to s*(2*c*cumb + c*(c+1))/2
    in closed form).

    Determinism: per-user totals are exact integer CENTS
    (round(value*100) — fixture metrics carry <=2 fractional digits, so
    the cast is a quantization with no tie to break); rank algebra
    accumulates in DECIMAL(38,0) (s*n*rank needs ~100 bits at 10^9
    users); gini is one identically-spelled double tree over exact
    integers, rounded at 9 dp with +0.0."""
    e = load_table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull() & F.col("value").isNotNull()
    )
    per_user = e.groupBy("user_id").agg(
        F.sum(F.round(F.col("value") * 100, 0).cast("bigint"))
        .cast("bigint")
        .alias("s")
    )
    runs = per_user.groupBy("s").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    w = Window.orderBy("s").rowsBetween(Window.unboundedPreceding, 0)
    cum = runs.select(
        "s", "c", (F.sum("c").over(w) - F.col("c")).alias("cumb")
    )
    agg = cum.agg(
        F.sum("c").cast("bigint").alias("n"),
        F.sum(F.col("s").cast("decimal(38,0)") * F.col("c")).alias("total"),
        F.sum(
            F.col("s").cast("decimal(38,0)")
            * (2 * F.col("c") * F.col("cumb") + F.col("c") * (F.col("c") + 1))
        ).alias("a2"),
    )
    ndd = F.col("n").cast("double")
    td = F.col("total").cast("double")
    return agg.filter((F.col("n") > 0) & (F.col("total") > 0)).select(
        "n",
        F.col("total").cast("bigint").alias("total_cents"),
        (
            F.round(
                (F.col("a2").cast("double") - (ndd + F.lit(1.0)) * td)
                / (ndd * td),
                9,
            )
            + F.lit(0.0)
        ).alias("gini"),
    )


# ---------------------------------------------------------------------------
# q_cochran_q — k-classifier marginal-homogeneity test (McNemar for k=3)
# ---------------------------------------------------------------------------


@query(
    "q_cochran_q",
    oracle=f"""
        WITH scored AS (
          SELECT CASE WHEN {_EN_SQL} THEN 1 ELSE 0 END AS x1,
                 CASE WHEN len(list_filter(string_split(lower(text), ' '),
                                           t -> t IN {_SW_SQL})) * 20
                           >= len(string_split(text, ' '))
                      THEN 1 ELSE 0 END AS x2,
                 CASE WHEN contains(lower(text), 'the') THEN 1 ELSE 0 END
                   AS x3
          FROM documents WHERE text IS NOT NULL
        ),
        c AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(COALESCE(SUM(x1), 0) AS BIGINT) AS c1,
                 CAST(COALESCE(SUM(x2), 0) AS BIGINT) AS c2,
                 CAST(COALESCE(SUM(x3), 0) AS BIGINT) AS c3,
                 CAST(COALESCE(SUM((x1 + x2 + x3) * (x1 + x2 + x3)), 0)
                      AS BIGINT) AS sr2
          FROM scored
        )
        SELECT n, c1, c2, c3,
               CASE WHEN 3 * (c1 + c2 + c3) - sr2 = 0 THEN NULL
                    ELSE round(2.0 * (3.0 * (CAST(c1 AS DOUBLE) * c1
                                             + CAST(c2 AS DOUBLE) * c2
                                             + CAST(c3 AS DOUBLE) * c3)
                                      - CAST(c1 + c2 + c3 AS DOUBLE)
                                        * (c1 + c2 + c3))
                               / (3 * (c1 + c2 + c3) - sr2), 9)
               END AS q_stat
        FROM c
    """,
)
def q_cochran_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran's Q test (1950): do THREE is-English classifiers (the
    q_fleiss_kappa rater panel — lang metadata, stopword-ratio heuristic,
    'the'-substring heuristic) mark the same FRACTION of documents
    positive?  The k-classifier generalization of q_mcnemar (Q reduces to
    McNemar's uncorrected statistic at k=2) and the complement of
    q_fleiss_kappa: kappa asks "do the raters agree per item", Q asks
    "are their marginal rates even comparable" — a panel can be
    marginally homogeneous yet disagree on every item, and vice versa.
    Docs with NULL text can't be scored and are excluded on both engines.

    Scale shape: three scan-local 0/1 expressions, ONE map-side-combined
    scalar aggregate carrying four exact integer sums (three column
    totals and the squared row-total sum) — a single summary row
    regardless of corpus size (the q_fleiss_kappa shape; column-sum
    identity T = c1+c2+c3 folds the cross term away).

    Determinism: Q = (k-1)(k*sum(C_j^2) - T^2) / (k*T - sum(R_i^2)) is
    integer algebra up to one IEEE division, rounded at 9 dp; the
    degenerate denominator (every doc unanimous — all R_i in {0, k})
    is an exact integer condition and yields NULL on both engines."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    toks_lower = F.split(F.lower("text"), " ", -1)
    sw_hits = F.size(F.filter(toks_lower, lambda t: t.isin(*STOPWORDS)))
    n_toks = F.size(F.split("text", " ", -1))
    x1 = _en_col().cast("int")
    x2 = (sw_hits * 20 >= n_toks).cast("int")
    x3 = F.lower("text").contains("the").cast("int")
    r = x1 + x2 + x3
    c = d.select(
        x1.alias("x1"), x2.alias("x2"), x3.alias("x3"), r.alias("r")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.coalesce(F.sum("x1"), F.lit(0)).cast("bigint").alias("c1"),
        F.coalesce(F.sum("x2"), F.lit(0)).cast("bigint").alias("c2"),
        F.coalesce(F.sum("x3"), F.lit(0)).cast("bigint").alias("c3"),
        F.coalesce(F.sum(F.col("r") * F.col("r")), F.lit(0))
        .cast("bigint")
        .alias("sr2"),
    )
    t = F.col("c1") + F.col("c2") + F.col("c3")
    denom = 3 * t - F.col("sr2")
    num = F.lit(2.0) * (
        F.lit(3.0)
        * (
            F.col("c1").cast("double") * F.col("c1")
            + F.col("c2").cast("double") * F.col("c2")
            + F.col("c3").cast("double") * F.col("c3")
        )
        - t.cast("double") * t
    )
    return c.select(
        "n",
        "c1",
        "c2",
        "c3",
        F.when(denom == 0, F.lit(None).cast("double"))
        .otherwise(F.round(num / denom, 9))
        .alias("q_stat"),
    )


# ---------------------------------------------------------------------------
# q_cramers_v — source × lang association strength over the bounded
# contingency frame
# ---------------------------------------------------------------------------


@query(
    "q_cramers_v",
    oracle="""
        WITH cells AS (
          SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS o
          FROM documents
          WHERE source IS NOT NULL AND lang IS NOT NULL
          GROUP BY source, lang
        ),
        rowt AS (SELECT source, SUM(o) AS rt FROM cells GROUP BY source),
        colt AS (SELECT lang, SUM(o) AS ct FROM cells GROUP BY lang),
        tot AS (
          SELECT SUM(o) AS nt,
                 CAST(COUNT(DISTINCT source) AS BIGINT) AS nr,
                 CAST(COUNT(DISTINCT lang) AS BIGINT) AS nc
          FROM cells
        ),
        spine AS (
          -- the FULL r x c grid: a zero cell still contributes
          -- (0-e)^2/e = e to chi-square; folding only observed cells
          -- understates the statistic (caught by the triple-entry
          -- reference-model test, tests/test_eval_stats_models.py)
          SELECT r.source, c.lang, r.rt, c.ct, COALESCE(cells.o, 0) AS o
          FROM rowt r CROSS JOIN colt c
          LEFT JOIN cells USING (source, lang)
        ),
        terms AS (
          SELECT nt, nr, nc,
                 round((CAST(o AS DOUBLE)
                        - CAST(rt AS DOUBLE) * ct / nt)
                       * (CAST(o AS DOUBLE)
                          - CAST(rt AS DOUBLE) * ct / nt)
                       / (CAST(rt AS DOUBLE) * ct / nt), 12) AS term
          FROM spine
          CROSS JOIN tot
          WHERE nt > 0 AND nr >= 2 AND nc >= 2
        )
        SELECT CAST(nt AS BIGINT) AS n, nr AS n_sources, nc AS n_langs,
               round(CAST(SUM(CAST(term AS DECIMAL(28,12))) AS DOUBLE), 9)
                 + 0.0 AS chi2,
               round(sqrt(CAST(SUM(CAST(term AS DECIMAL(28,12))) AS DOUBLE)
                          / (CAST(nt AS DOUBLE)
                             * (LEAST(nr, nc) - 1))), 9) + 0.0 AS v
        FROM terms GROUP BY nt, nr, nc
    """,
)
def q_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramer's V (1946): the [0,1]-normalized strength of the
    source x language association — the one-number answer to "do sources
    specialize by language?", which decides whether per-source and
    per-language curation quotas can be tuned independently or must be
    joint (the q_split_balance companion for corpus composition).  Docs
    missing either label can't be cross-classified and are excluded on
    both engines; a degenerate table (one row or one column, or empty)
    leaves V undefined → no output row, by integer conditions.

    Scale shape: ONE map-side-combined hash aggregate to the
    |sources| x |langs| contingency frame (bounded by label domains,
    never corpus size); margins, totals, and the chi-square fold all run
    over that bounded frame (the cells frame is checkpointed so margin
    passes don't rescan the corpus).  The fold runs over the FULL r x c
    margin-spine grid, not just observed cells — a zero cell still
    contributes (0-e)^2/e = e, and skipping it understates chi-square
    (a bug the triple-entry reference-model test caught on the first
    spelling; the spine is margin-bounded, so the grid join is free).

    Determinism: expected counts rt*ct/nt are single IEEE trees over
    exact integers, but the per-cell chi-square terms sum in engine-
    dependent order — each term rounds at 12 dp and accumulates in
    DECIMAL(28,12) (the q_psi_drift device); chi2 and V round at 9 dp
    with +0.0 canonicalizing -0.0."""
    d = load_table(spark, sf_dir, "documents").filter(
        F.col("source").isNotNull() & F.col("lang").isNotNull()
    )
    cells = (
        d.groupBy("source", "lang")
        .agg(F.count(F.lit(1)).cast("bigint").alias("o"))
        .localCheckpoint(eager=True)  # margins + totals + terms reuse it
    )
    rowt = cells.groupBy("source").agg(F.sum("o").alias("rt"))
    colt = cells.groupBy("lang").agg(F.sum("o").alias("ct"))
    tot = cells.agg(
        F.sum("o").alias("nt"),
        F.countDistinct("source").cast("bigint").alias("nr"),
        F.countDistinct("lang").cast("bigint").alias("nc"),
    )
    exp_ = F.col("rt").cast("double") * F.col("ct") / F.col("nt")
    dev = F.col("o").cast("double") - exp_
    term = F.round(dev * dev / exp_, 12)
    chi2sum = F.sum(term.cast("decimal(28,12)")).cast("double")
    spine = (
        rowt.crossJoin(F.broadcast(colt))
        .join(cells, ["source", "lang"], "left")
        .select(
            "source", "lang", "rt", "ct",
            F.coalesce(F.col("o"), F.lit(0)).alias("o"),
        )
    )
    return (
        spine.crossJoin(F.broadcast(tot))
        .filter((F.col("nt") > 0) & (F.col("nr") >= 2) & (F.col("nc") >= 2))
        .groupBy("nt", "nr", "nc")
        .agg(
            (F.round(chi2sum, 9) + F.lit(0.0)).alias("chi2"),
            (
                F.round(
                    F.sqrt(
                        chi2sum
                        / (
                            F.col("nt").cast("double")
                            * (F.least(F.col("nr"), F.col("nc")) - 1)
                        )
                    ),
                    9,
                )
                + F.lit(0.0)
            ).alias("v"),
        )
        .select(
            F.col("nt").cast("bigint").alias("n"),
            F.col("nr").alias("n_sources"),
            F.col("nc").alias("n_langs"),
            "chi2",
            "v",
        )
    )
