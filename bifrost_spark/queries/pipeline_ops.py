"""Pipeline-operations family: the monitoring and housekeeping operators a
production 100 TB training-data pipeline runs AROUND the transform queries —
distribution-drift detection between ingest cohorts (the alarm that a crawl
snapshot or an upstream schema change shifted the data), revenue/event
attribution (the analytics consumer of the event stream), exact mode
summaries, small-file compaction planning (the storage-health chore that
keeps a parquet lake scannable), multi-objective Pareto shortlisting,
behavioral Markov transition modelling, and a Benford first-digit audit.

All eight are pure JVM DataFrame plans with full DuckDB oracles.  The drift
statistics follow the engine's determinism discipline: every cross-engine
comparison reduces to integer arithmetic, a single IEEE division of exact
values, or 12-dp-rounded log addends accumulated in DECIMAL (the
q_dsir_weights device) — never a raw float aggregation.

Scale notes per operator are in the docstrings; the common theme is that
the "global" windows here run over BOUNDED frames (distinct metric values,
per-bin aggregates, file MANIFEST rows — never raw fact rows), which is
what makes a driver-side-looking statistic safe at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from bifrost_spark.queries._util import hash_bucket, sql_hash_bucket
from bifrost_spark.registry import query
from bifrost_spark.tables import load_table

# Cohort split for the drift ops: first half of January vs second half —
# the "yesterday's crawl vs today's" monitoring shape.
_SPLIT = "2024-01-16 00:00:00"


@query(
    "q_ks_drift",
    oracle=f"""
        WITH pts AS (
          SELECT value AS v,
                 CAST(COUNT(*) FILTER (WHERE ts <  TIMESTAMP '{_SPLIT}')
                      AS BIGINT) AS ca,
                 CAST(COUNT(*) FILTER (WHERE ts >= TIMESTAMP '{_SPLIT}')
                      AS BIGINT) AS cb
          FROM events WHERE value IS NOT NULL GROUP BY value
        ),
        cum AS (
          SELECT v,
                 SUM(ca) OVER (ORDER BY v) AS cuma,
                 SUM(cb) OVER (ORDER BY v) AS cumb,
                 (SELECT SUM(ca) FROM pts) AS na,
                 (SELECT SUM(cb) FROM pts) AS nb
          FROM pts
        ),
        diffs AS (
          SELECT v, na, nb,
                 abs(CAST(cuma AS DECIMAL(38,0)) * nb
                     - CAST(cumb AS DECIMAL(38,0)) * na) AS d
          FROM cum
        )
        SELECT CAST(na AS BIGINT) AS n_a,
               CAST(nb AS BIGINT) AS n_b,
               round(CAST(MAX(d) AS DOUBLE)
                     / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)), 9) AS ks_d,
               MIN(v) FILTER (WHERE d = (SELECT MAX(d) FROM diffs))
                 AS at_value
        FROM diffs WHERE na > 0 AND nb > 0 GROUP BY na, nb
    """,
)
def q_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov drift statistic between two ingest
    cohorts (events before/after {split}): D = max over the metric domain
    of |F_a(v) - F_b(v)|, reported with the location where the gap peaks —
    the standard "did this week's data shift?" monitor.

    Determinism: D is computed ENTIRELY in integers — the gap at v is
    |cum_a(v)·n_b - cum_b(v)·n_a| (DECIMAL(38,0): at 10^13 rows per
    cohort the product needs ~87 bits, past int64), maxed exactly, and
    divided ONCE by n_a·n_b at the end (single IEEE division of exact
    operands → identical on both engines).  Ties at the max resolve to
    the smallest metric value.

    Scale shape: one shuffle to the per-VALUE aggregate (map-side
    combined; the frame is the distinct-value domain — for a 2-dp money
    metric that is ≤100·max values, NOT the row count; KS over a truly
    continuous metric should quantize first, same discipline as the
    histogram family), then the cumulative window over that bounded
    frame, checkpointed so the totals pass does not rescan the fact
    table.

    NULL contract: NULL metric values are excluded EXPLICITLY on both
    sides (a CDF over NULL is undefined; and unfiltered, Spark's window
    ORDER BY sorts NULLS FIRST where DuckDB defaults NULLS LAST, so the
    cumulative sums would silently diverge cross-engine — the filter
    makes the parity independent of the fixture's non-null luck).

    Degenerate cohorts: KS is undefined when either cohort is empty, and
    the engines disagree on what x/0 does (Spark ANSI throws
    DIVIDE_BY_ZERO; DuckDB floats to inf) — found by the adversarial
    oracle fuzzer, not the fixture.  Both sides emit ZERO rows when
    n_a·n_b = 0, so an empty week upstream yields "no statistic", not a
    crashed monitoring job."""
    e = load_table(spark, sf_dir, "events")
    split = F.lit(_SPLIT).cast("timestamp")
    pts = (
        e.filter(F.col("value").isNotNull())
        .select(
            F.col("value").alias("v"),
            (F.col("ts") < split).cast("long").alias("a"),
        )
        .groupBy("v")
        .agg(
            F.sum("a").alias("ca"),
            F.sum(F.lit(1) - F.col("a")).alias("cb"),
        )
        .localCheckpoint(eager=True)  # consumed by cum-window AND totals
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    tot = pts.agg(
        F.sum("ca").alias("na"), F.sum("cb").alias("nb")
    )
    diffs = (
        pts.select(
            "v",
            F.sum("ca").over(w).alias("cuma"),
            F.sum("cb").over(w).alias("cumb"),
        )
        .crossJoin(F.broadcast(tot))
        # degenerate-cohort guard (see docstring): no rows, no statistic
        .filter((F.col("na") > 0) & (F.col("nb") > 0))
        .select(
            "v",
            "na",
            "nb",
            F.abs(
                F.col("cuma").cast("decimal(38,0)") * F.col("nb")
                - F.col("cumb").cast("decimal(38,0)") * F.col("na")
            ).alias("d"),
        )
    )
    mx = diffs.groupBy("na", "nb").agg(F.max("d").alias("dmax"))
    return (
        diffs.join(F.broadcast(mx), ["na", "nb"])
        .filter(F.col("d") == F.col("dmax"))
        .groupBy("na", "nb", "dmax")
        .agg(F.min("v").alias("at_value"))
        .select(
            F.col("na").cast("bigint").alias("n_a"),
            F.col("nb").cast("bigint").alias("n_b"),
            F.round(
                F.col("dmax").cast("double")
                / (F.col("na").cast("double") * F.col("nb").cast("double")),
                9,
            ).alias("ks_d"),
            "at_value",
        )
    )


_PSI_BIN_W = 50.0  # fixed-width value bins
_PSI_NBINS = 10  # values ≥ (nbins-1)·W clamp into the last bin


@query(
    "q_psi_drift",
    oracle=f"""
        WITH binned AS (
          SELECT LEAST(CAST(floor(value / {_PSI_BIN_W}) AS BIGINT),
                       {_PSI_NBINS - 1}) AS bin,
                 CAST(COUNT(*) FILTER (WHERE ts <  TIMESTAMP '{_SPLIT}')
                      AS BIGINT) AS ca,
                 CAST(COUNT(*) FILTER (WHERE ts >= TIMESTAMP '{_SPLIT}')
                      AS BIGINT) AS cb
          FROM events GROUP BY 1
        ),
        spine AS (
          SELECT CAST(range AS BIGINT) AS bin FROM range({_PSI_NBINS})
        ),
        full_bins AS (
          SELECT s.bin, COALESCE(b.ca, 0) AS ca, COALESCE(b.cb, 0) AS cb
          FROM spine s LEFT JOIN binned b USING (bin)
        ),
        tot AS (SELECT SUM(ca) AS na, SUM(cb) AS nb FROM full_bins),
        probs AS (
          SELECT bin,
                 (2.0 * ca + 1) / (2.0 * (SELECT na FROM tot) + {_PSI_NBINS})
                   AS pa,
                 (2.0 * cb + 1) / (2.0 * (SELECT nb FROM tot) + {_PSI_NBINS})
                   AS pb
          FROM full_bins
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_bins,
               round(CAST(SUM(CAST(round((pa - pb) * ln(pa / pb), 12)
                                   AS DECIMAL(28,12))) AS DOUBLE), 9) AS psi
        FROM probs
    """,
)
def q_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index between the same two cohorts as
    q_ks_drift, over fixed-width value bins with add-half smoothing —
    the credit-risk-style drift score (PSI < 0.1 stable, > 0.25 shifted)
    that, unlike KS, weights the whole distribution rather than the
    worst point.

    The sum runs over the FULL declared bin spine, not just observed bins
    (empty bins still carry the smoothing-floor addend — PSI's textbook
    definition, and what makes this query the exact batch oracle for the
    streaming monitor in streaming/drift_monitor.py).

    Determinism: bin populations are integers; the smoothed probabilities
    are SINGLE divisions of integer-valued doubles (pa = (2·ca+1)/(2·na+B),
    exact operands → identical quotients on both engines); each bin's
    addend (pa-pb)·ln(pa/pb) is rounded to 12 dp and summed in
    DECIMAL(28,12) (order-free; the q_dsir_weights device — a 1-ulp libm
    divergence cannot move the 9-dp output).

    Scale shape: ONE map-side-combined shuffle to ≤{nbins} rows; totals
    and the PSI fold are arithmetic over that bounded frame.  Fixed-width
    bins (not quantiles) keep the statistic engine-exact and
    partition-invariant."""
    e = load_table(spark, sf_dir, "events")
    split = F.lit(_SPLIT).cast("timestamp")
    binned = (
        e.select(
            F.least(
                F.floor(F.col("value") / _PSI_BIN_W).cast("bigint"),
                F.lit(_PSI_NBINS - 1),
            ).alias("bin"),
            (F.col("ts") < split).cast("long").alias("a"),
        )
        .groupBy("bin")
        .agg(
            F.sum("a").alias("ca"),
            F.sum(F.lit(1) - F.col("a")).alias("cb"),
        )
        .localCheckpoint(eager=True)  # consumed by totals AND the fold
    )
    spine = spark.range(_PSI_NBINS).select(F.col("id").alias("bin"))
    full_bins = spine.join(F.broadcast(binned), "bin", "left").select(
        "bin",
        F.coalesce("ca", F.lit(0)).alias("ca"),
        F.coalesce("cb", F.lit(0)).alias("cb"),
    )
    tot = full_bins.agg(F.sum("ca").alias("na"), F.sum("cb").alias("nb"))
    probs = full_bins.crossJoin(F.broadcast(tot)).select(
        "bin",
        (
            (2.0 * F.col("ca") + 1)
            / (2.0 * F.col("na") + F.lit(float(_PSI_NBINS)))
        ).alias("pa"),
        (
            (2.0 * F.col("cb") + 1)
            / (2.0 * F.col("nb") + F.lit(float(_PSI_NBINS)))
        ).alias("pb"),
    )
    addend = F.round(
        (F.col("pa") - F.col("pb")) * F.log(F.col("pa") / F.col("pb")), 12
    ).cast("decimal(28,12)")
    return probs.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_bins"),
        F.round(F.sum(addend).cast("double"), 9).alias("psi"),
    )


@query(
    "q_attribution",
    oracle="""
        WITH ev AS (
          SELECT event_id, user_id, event_type, ts, value
          FROM events WHERE event_type IN ('click', 'purchase')
        ),
        tagged AS (
          SELECT *,
                 LAST_VALUE(CASE WHEN event_type = 'click' THEN event_id END
                            IGNORE NULLS)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS click_id
          FROM ev
        )
        SELECT event_id AS purchase_id, user_id,
               click_id AS attributed_click_id, value
        FROM tagged WHERE event_type = 'purchase'
    """,
)
def q_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: each purchase is credited to the user's most
    recent STRICTLY-preceding click (NULL if the purchase was organic) —
    the classic marketing-analytics consumer of an event stream, and the
    same "most recent prior event of another type" shape as sessionized
    as-of enrichment.

    Spelled as ONE window over the type-filtered union — last_value with
    ignoreNulls over (unbounded, -1) — instead of a purchases×clicks
    as-of join: a single shuffle on user_id, no join at all, and the
    row frame guarantees strictness (a click at the purchase's exact
    timestamp orders before it only via the unique event_id tiebreak,
    identically on both engines)."""
    e = load_table(spark, sf_dir, "events")
    ev = e.filter(F.col("event_type").isin("click", "purchase")).select(
        "event_id", "user_id", "event_type", "ts", "value"
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    click_id = F.last(
        F.when(F.col("event_type") == "click", F.col("event_id")),
        ignorenulls=True,
    ).over(w)
    return (
        ev.withColumn("click_id", click_id)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("click_id").alias("attributed_click_id"),
            "value",
        )
    )


@query(
    "q_mode_per_group",
    oracle="""
        SELECT o_orderstatus, o_orderpriority AS mode_priority, n
        FROM (
          SELECT o_orderstatus, o_orderpriority,
                 CAST(COUNT(*) AS BIGINT) AS n,
                 ROW_NUMBER() OVER (PARTITION BY o_orderstatus
                                    ORDER BY COUNT(*) DESC, o_orderpriority)
                   AS rn
          FROM orders GROUP BY o_orderstatus, o_orderpriority
        ) WHERE rn = 1
    """,
)
def q_mode_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-group mode (most frequent o_orderpriority per status) with
    a DECLARED tie order (count desc, value asc).  Spark's built-in
    ``F.mode`` picks an arbitrary winner on ties — useless for an
    engine-reproducibility contract — so this is the canonical two-level
    spelling: map-side-combined count aggregate, then a rank-1 window
    over the (groups × distinct values) frame, which is bounded by value
    cardinality, not row count."""
    o = load_table(spark, sf_dir, "orders")
    counts = o.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.desc("n"), F.asc("o_orderpriority")
    )
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_orderstatus",
            F.col("o_orderpriority").alias("mode_priority"),
            "n",
        )
    )


_COMPACT_TARGET = 4096  # bytes per output bin (fixture-sized; prod ~512 MB)


@query(
    "q_compaction_plan",
    oracle=f"""
        WITH manifest AS (
          SELECT doc_id AS file_id, n_chars AS bytes FROM documents
        ),
        planned AS (
          SELECT file_id, bytes,
                 COALESCE(SUM(bytes) OVER (
                   ORDER BY bytes DESC, file_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                 ), 0) AS cum_before
          FROM manifest
        )
        SELECT file_id, bytes,
               CAST(floor(cum_before / {_COMPACT_TARGET}) AS BIGINT) AS bin
        FROM planned
    """,
)
def q_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction planner: assign every file in a manifest
    (stand-in: one row per document, n_chars as bytes) to a rewrite bin of
    ~{target} bytes by next-fit-decreasing over the cumulative size — the
    housekeeping pass that keeps a streamed-into parquet lake scannable
    (thousands of 1 MB files → 512 MB row-group-aligned files).

    Deterministic by construction: the packing order (bytes desc,
    file_id) is total, so bin assignment is a pure function of the
    manifest — a retried planning job emits the identical plan, which the
    downstream rewrite relies on for idempotence.

    Scale: the window is global BUT runs over the manifest (one row per
    FILE — 100 TB / 128 MB ≈ 800k rows, a single in-memory task), never
    over data rows; the rewrite itself would then be one
    repartitionByRange('bin') pass over the lake (the
    write_training_shards device).  Greedy-by-cumsum packs within one
    file of optimal for size-sorted input and, unlike bin-sorted
    first-fit, needs no iteration."""
    d = load_table(spark, sf_dir, "documents")
    manifest = d.select(
        F.col("doc_id").alias("file_id"), F.col("n_chars").alias("bytes")
    )
    w = (
        Window.orderBy(F.desc("bytes"), F.asc("file_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return manifest.select(
        "file_id",
        "bytes",
        F.floor(
            F.coalesce(F.sum("bytes").over(w), F.lit(0)) / _COMPACT_TARGET
        )
        .cast("bigint")
        .alias("bin"),
    )


@query(
    "q_pareto_frontier",
    oracle="""
        WITH pts AS (
          SELECT p_partkey, p_size,
                 CAST(p_retailprice AS DOUBLE) AS price
          FROM part
        ),
        ranked AS (
          SELECT p_partkey, p_size, price,
                 MIN(price) OVER (
                   ORDER BY p_size DESC, price ASC, p_partkey ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                 ) AS best_price_at_geq_size
          FROM pts
        )
        SELECT p_partkey, p_size, price
        FROM ranked
        WHERE best_price_at_geq_size IS NULL
           OR price < best_price_at_geq_size
    """,
)
def q_pareto_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D Pareto frontier (skyline): parts not dominated on
    (maximize p_size, minimize p_retailprice) — the multi-objective
    shortlist op (biggest part for the money; for documents:
    highest-quality at lowest duplication).

    The naive spelling is a quadratic NOT EXISTS self-join; the frontier
    is instead ONE window: scanning in (size desc, price asc) order, a
    point survives iff its price beats the running minimum over every
    strictly-prior point — prior points have ≥ size by the sort, so
    "beats the running min" IS non-domination.  The tie order
    (price asc, key asc within a size) makes equal-(size,price)
    duplicates resolve identically on both engines: the first keeps, the
    rest see an equal running min and drop (dominance is strict-on-one,
    weak-on-other).  O(n log n) sort vs O(n²) probes — the difference
    between feasible and not at 100 TB.

    Scale: the global window's order is a single-partition sort, so it
    must never see the raw table.  Stage 1 applies the SAME running-min
    window per deterministic hash bucket (pmod(xxhash64(key), 64)): a
    bucket-local skyline keeps every global-frontier point that hashes
    into it (a locally-dropped point is dominated by a bucket-prior point
    that is also globally prior — identical sort keys), so the union of
    local survivors is a superset of the global frontier sized ~64 local
    skylines, not |part|.  Stage 2 re-runs the window globally over that
    union for the exact answer.  The one-task stage therefore sorts
    O(64·|frontier|) rows however large the input grows — the associative
    skyline reduce Catalyst can't infer, spelled explicitly
    (tests/test_plans.py pins the pre-prune between the two windows)."""
    p = load_table(spark, sf_dir, "part")
    pts = p.select(
        "p_partkey", "p_size", F.col("p_retailprice").cast("double").alias("price")
    )
    _order = (F.desc("p_size"), F.asc("price"), F.asc("p_partkey"))
    # Stage 1 — bucket-local frontiers (deterministic bucket, so retries
    # replay the identical prune).
    wl = Window.partitionBy("pid").orderBy(*_order).rowsBetween(
        Window.unboundedPreceding, -1
    )
    local = (
        pts.withColumn("pid", F.pmod(F.xxhash64("p_partkey"), F.lit(64)))
        .withColumn("lbest", F.min("price").over(wl))
        .filter(F.col("lbest").isNull() | (F.col("price") < F.col("lbest")))
        .drop("pid", "lbest")
    )
    # Stage 2 — exact global skyline over the pruned union.
    w = Window.orderBy(*_order).rowsBetween(Window.unboundedPreceding, -1)
    return (
        local.withColumn("best", F.min("price").over(w))
        .filter(F.col("best").isNull() | (F.col("price") < F.col("best")))
        .drop("best")
    )


@query(
    "q_markov_transitions",
    oracle="""
        WITH seq AS (
          SELECT user_id, event_type, ts, event_id,
                 LEAD(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                 ) AS next_type
          FROM events
        ),
        pairs AS (
          SELECT event_type AS from_type, next_type AS to_type,
                 CAST(COUNT(*) AS BIGINT) AS n
          FROM seq WHERE next_type IS NOT NULL
          GROUP BY 1, 2
        ),
        tot AS (
          SELECT from_type, SUM(n) AS n_from FROM pairs GROUP BY from_type
        )
        SELECT p.from_type, p.to_type, p.n,
               round(CAST(p.n AS DOUBLE) / t.n_from, 9) AS p_next
        FROM pairs p JOIN tot t USING (from_type)
    """,
)
def q_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event sequences:
    P(next event type | current type) — the behavioral model behind
    session simulation, anomaly scoring ("this sequence was improbable"),
    and next-action features.

    ONE shuffle total: the lead() window partitions by user_id; the pair
    count aggregate and the per-from_type margin both group tiny
    (|types|²-bounded) frames, map-side combined; the pair frame is
    checkpointed so the margin + join branches don't re-derive the
    window (Catalyst does not dedup shared subtrees).  Probabilities are
    integer-count divisions rounded at 9 dp — engine-exact.  Ties in ts
    order by event_id, so simultaneous events give identical successor
    chains on both engines."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    ).filter(F.col("next_type").isNotNull())
    pairs = (
        seq.groupBy(
            F.col("event_type").alias("from_type"),
            F.col("next_type").alias("to_type"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .localCheckpoint(eager=True)  # |types|² rows; margin + join reuse it
    )
    tot = pairs.groupBy("from_type").agg(F.sum("n").alias("n_from"))
    return pairs.join(F.broadcast(tot), "from_type").select(
        "from_type",
        "to_type",
        "n",
        F.round(F.col("n").cast("double") / F.col("n_from"), 9).alias("p_next"),
    )


@query(
    "q_benford",
    oracle="""
        WITH digits AS (
          SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT)
                             AS VARCHAR), 1, 1) AS BIGINT) AS d
          FROM orders WHERE o_totalprice >= 1
        ),
        obs AS (
          SELECT d, CAST(COUNT(*) AS BIGINT) AS n FROM digits GROUP BY d
        ),
        tot AS (SELECT SUM(n) AS total FROM obs)
        SELECT d, n,
               round(CAST(n AS DOUBLE) / (SELECT total FROM tot), 9)
                 AS observed_p,
               round(log10(1.0 + 1.0 / d), 9) AS benford_p
        FROM obs
    """,
)
def q_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit of a money column — the
    data-quality screen for fabricated or truncated numeric feeds
    (natural multi-magnitude data follows P(d)=log10(1+1/d); a synthetic
    or clipped feed does not, and this is the op that notices before the
    model does).

    First digit via integer floor → string head (no float log/pow chain,
    which could round differently across engines at magnitude
    boundaries); observed share is an integer division; the Benford
    expectation log10(1+1/d) is a deterministic function of the digit
    literal.  One map-side-combined aggregate to ≤9 rows."""
    o = load_table(spark, sf_dir, "orders")
    d = (
        o.filter(F.col("o_totalprice") >= 1)
        .select(
            F.substring(
                F.floor("o_totalprice").cast("bigint").cast("string"), 1, 1
            )
            .cast("bigint")
            .alias("d")
        )
        .groupBy("d")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .localCheckpoint(eager=True)  # consumed by totals AND the output
    )
    tot = d.agg(F.sum("n").alias("total"))
    return d.crossJoin(F.broadcast(tot)).select(
        "d",
        "n",
        F.round(F.col("n").cast("double") / F.col("total"), 9).alias(
            "observed_p"
        ),
        F.round(F.log10(1.0 + 1.0 / F.col("d")), 9).alias("benford_p"),
    )


@query(
    "q_seasonal_baseline",
    oracle="""
        WITH prof AS (
          SELECT event_type, CAST(hour(ts) AS BIGINT) AS hr,
                 CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE)
                   / COUNT(*) AS expected
          FROM events GROUP BY 1, 2
        )
        SELECT e.event_id, e.event_type, CAST(hour(e.ts) AS BIGINT) AS hr,
               e.value,
               round(p.expected, 9) AS expected,
               round(e.value - p.expected, 9) AS residual
        FROM events e
        JOIN prof p ON p.event_type = e.event_type
                   AND p.hr = hour(e.ts)
    """,
)
def q_seasonal_baseline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal baseline + residual: each event's value against its
    (event_type, hour-of-day) mean — the first-order seasonality model
    behind ops anomaly detection ("is 3 am error volume unusual FOR
    3 am?"); the residual column is what a threshold/zscore alarm
    consumes, and subtracting the profile is the classic de-seasonalizing
    pre-step before drift stats like q_ks_drift.

    The profile is a (types × 24)-row aggregate — decimal-exact mean
    (dsum/count single division) — broadcast back onto the events scan:
    one map-side-combined shuffle for the profile, zero shuffle for the
    scoring join.  residual = one IEEE subtraction of deterministic
    operands, rounded 9 dp."""
    e = load_table(spark, sf_dir, "events")
    hr = F.hour("ts").cast("bigint")
    prof = (
        e.groupBy(F.col("event_type"), hr.alias("hr"))
        .agg(
            (
                F.sum(F.col("value").cast("decimal(28,6)")).cast("double")
                / F.count(F.lit(1))
            ).alias("expected")
        )
        .localCheckpoint(eager=True)  # tiny; scoring join must not rescan
    )
    return (
        e.select("event_id", "event_type", hr.alias("hr"), "value")
        .join(F.broadcast(prof), ["event_type", "hr"])
        .select(
            "event_id",
            "event_type",
            "hr",
            "value",
            F.round("expected", 9).alias("expected"),
            F.round(F.col("value") - F.col("expected"), 9).alias("residual"),
        )
    )


@query(
    "q_behavior_entropy",
    oracle="""
        WITH c AS (
          SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS n
          FROM events GROUP BY 1, 2
        ),
        tot AS (
          SELECT user_id, SUM(n) AS nt, CAST(COUNT(*) AS BIGINT) AS n_types
          FROM c GROUP BY user_id
        )
        SELECT c.user_id, t.n_types,
               CAST(t.nt AS BIGINT) AS n_events,
               round(CAST(SUM(CAST(round(
                   -(c.n * 1.0 / t.nt) * log2(c.n * 1.0 / t.nt), 12)
                   AS DECIMAL(28,12))) AS DOUBLE), 9) AS type_entropy
        FROM c JOIN tot t USING (user_id)
        GROUP BY c.user_id, t.n_types, t.nt
    """,
)
def q_behavior_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user behavioral entropy: Shannon entropy of each user's
    event-type distribution — the diversity feature separating one-note
    bots (entropy ≈ 0) from organic users, and a standard input to
    engagement scoring and bot filtering.

    Determinism (the engine's entropy discipline, cf. q_entropy): type
    shares are single divisions of exact integers, each −p·log₂p addend
    rounds at 12 dp into DECIMAL(28,12) (order-free sum), output at
    9 dp.  Shape: two exchanges — the (user, type) map-side-combined
    count shuffle and the user-keyed margin window; the final aggregate
    reuses the window's partitioning (plan-verified: 2 Exchanges, 1
    scan).  All frames bounded by users × types."""
    e = load_table(spark, sf_dir, "events")
    c = e.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    w = Window.partitionBy("user_id")
    withtot = c.select(
        "user_id",
        "n",
        F.sum("n").over(w).alias("nt"),
        F.count(F.lit(1)).over(w).cast("bigint").alias("n_types"),
    )
    p = F.col("n") * 1.0 / F.col("nt")
    addend = F.round(-p * F.log2(p), 12).cast("decimal(28,12)")
    return withtot.groupBy("user_id", "n_types", "nt").agg(
        F.round(F.sum(addend).cast("double"), 9).alias("type_entropy")
    ).select(
        "user_id",
        "n_types",
        F.col("nt").cast("bigint").alias("n_events"),
        "type_entropy",
    )


@query(
    "q_split_balance",
    oracle=f"""
        WITH tagged AS (
          SELECT label,
                 CASE WHEN {sql_hash_bucket("CAST(vec_id AS VARCHAR)", 2)} = 0
                      THEN 'a' ELSE 'b' END AS side
          FROM embeddings
        ),
        cells AS (
          SELECT label, side, CAST(COUNT(*) AS BIGINT) AS o
          FROM tagged GROUP BY 1, 2
        ),
        spine AS (
          -- full labels x sides grid: a label with ALL its vectors on
          -- one side still owes its zero cell's (0-e)^2/e = e term
          -- (the q_cramers_v zero-cell class, fixed the same round)
          SELECT l.label, s.side, COALESCE(c.o, 0) AS o
          FROM (SELECT DISTINCT label FROM cells) l
          CROSS JOIN (SELECT DISTINCT side FROM cells) s
          LEFT JOIN cells c
            ON c.label IS NOT DISTINCT FROM l.label AND c.side = s.side
        ),
        margins AS (
          SELECT c.label, c.side, c.o,
                 SUM(c.o) OVER (PARTITION BY c.label) AS row_tot,
                 SUM(c.o) OVER (PARTITION BY c.side) AS col_tot,
                 SUM(c.o) OVER () AS n
          FROM spine c
        )
        -- dof counts label GROUPS (NULL label included — the spine
        -- folds its cells, so the statistic's df must count it too):
        -- margins has exactly |label groups| x |sides| rows.  An EMPTY
        -- corpus has no sides at all — dof is undefined (NULL), and the
        -- guard keeps the division off the 0/0 path (fuzzer finding)
        SELECT CAST(CASE WHEN COUNT(DISTINCT side) > 0
                         THEN COUNT(*) / COUNT(DISTINCT side) - 1
                    END AS BIGINT) AS dof,
               CAST(MIN(n) AS BIGINT) AS n_rows,
               round(CAST(SUM(CAST(round(
                   (o - row_tot * col_tot * 1.0 / n)
                   * (o - row_tot * col_tot * 1.0 / n)
                   / (row_tot * col_tot * 1.0 / n), 12) AS DECIMAL(28,12)))
                   AS DOUBLE), 9) AS chi2
        FROM margins
    """,
)
def q_split_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-balance audit: chi-square homogeneity of the LABEL
    distribution between the two halves of an md5-hash split of the
    embedding corpus — the check that a "random" split didn't skew the
    classes (the companion audit to q_dataset_split /
    q_dataset_split_grouped; a skewed split silently biases every
    downstream eval).  Low chi² vs dof ⇒ balanced.

    Determinism: cell counts and margins are exact integers; each
    expected value e = row·col/n is a short chain of exact-operand IEEE
    ops, each (o−e)²/e addend rounds at 12 dp into DECIMAL(28,12)
    (order-free), output at 9 dp.  The split side comes from
    _util.hash_bucket (md5, engine-portable) — the same split is
    recomputed identically by any engine, retry, or cluster size.

    Shape: one (label, side) count shuffle to a (labels × 2)-cell frame;
    margins are windows over that bounded frame."""
    e = load_table(spark, sf_dir, "embeddings")
    side = F.when(
        hash_bucket(F.col("vec_id").cast("string"), 2) == 0, "a"
    ).otherwise("b")
    cells = (
        e.select("label", side.alias("side"))
        .groupBy("label", "side")
        .agg(F.count(F.lit(1)).cast("bigint").alias("o"))
        .localCheckpoint(eager=True)  # label/side spines + probe reuse it
    )
    # full labels x sides grid — a zero cell still owes its (o-e)^2/e = e
    # term (the q_cramers_v zero-cell class, fixed the same round); the
    # grid is bounded by the label domain x 2 sides, so the join is free
    labels = cells.select(F.col("label").alias("sl")).distinct()
    sides = cells.select(F.col("side").alias("ss")).distinct()
    spine = (
        labels.crossJoin(F.broadcast(sides))
        .join(
            cells,
            F.col("sl").eqNullSafe(F.col("label"))
            & (F.col("ss") == F.col("side")),
            "left",
        )
        .select(
            F.col("sl").alias("label"),
            F.col("ss").alias("side"),
            F.coalesce(F.col("o"), F.lit(0)).alias("o"),
        )
    )
    margins = spine.select(
        "label",
        "side",
        "o",
        F.sum("o").over(Window.partitionBy("label")).alias("row_tot"),
        F.sum("o").over(Window.partitionBy("side")).alias("col_tot"),
        F.sum("o").over(Window.partitionBy()).alias("n"),
    )
    exp = F.col("row_tot") * F.col("col_tot") * 1.0 / F.col("n")
    addend = F.round((F.col("o") - exp) * (F.col("o") - exp) / exp, 12).cast(
        "decimal(28,12)"
    )
    return margins.agg(
        # label GROUPS incl. NULL (ADVICE r7): the spine folds the
        # NULL-label row's cells, so dof must count that group — rows in
        # the margins grid are exactly |label groups| x |sides|.  An
        # empty corpus has zero sides: dof is NULL, never 0/0 (ANSI
        # would throw; fuzzer finding)
        F.when(
            F.count_distinct("side") > 0,
            F.count(F.lit(1)) / F.count_distinct("side") - 1,
        )
        .cast("bigint")
        .alias("dof"),
        F.min("n").cast("bigint").alias("n_rows"),
        F.round(F.sum(addend).cast("double"), 9).alias("chi2"),
    )


_ANOM_K = 20


@query(
    "q_top_anomalies",
    oracle=f"""
        WITH prof AS (
          SELECT event_type, CAST(hour(ts) AS BIGINT) AS hr,
                 CAST(COUNT(*) AS DOUBLE) AS n,
                 CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS sx,
                 CAST(SUM(CAST(value * value AS DECIMAL(28,6))) AS DOUBLE)
                   AS sxx
          FROM events GROUP BY 1, 2
        ),
        scored AS (
          SELECT e.event_id, e.event_type, CAST(hour(e.ts) AS BIGINT) AS hr,
                 e.value,
                 round((e.value - p.sx / p.n)
                       / sqrt((p.n * p.sxx - p.sx * p.sx) / (p.n * p.n)),
                       9) AS z
          FROM events e
          JOIN prof p ON p.event_type = e.event_type
                     AND p.hr = hour(e.ts)
          WHERE p.n >= 2 AND p.n * p.sxx > p.sx * p.sx
        )
        SELECT event_id, event_type, hr, value, z,
               CAST(rnk AS BIGINT) AS rnk
        FROM (
          SELECT *, ROW_NUMBER() OVER (ORDER BY abs(z) DESC, event_id) AS rnk
          FROM scored
        ) WHERE rnk <= {_ANOM_K}
    """,
)
def q_top_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{k} seasonal anomalies: the events most deviant from their
    (event_type, hour-of-day) cohort in population z-score terms — the
    ranked alarm feed on top of q_seasonal_baseline's profile (a fixed
    3σ gate is vacuous on bounded-support fixture data; ranking is the
    threshold-free spelling that always surfaces the worst offenders).

    Determinism: the per-cohort moments are decimal-exact (value and
    value² are ≤4-dp money products — inside the dsum contract); mean
    and σ are short chains of exact-operand IEEE ops; z rounds at 9 dp
    and the top-{k} order ties on event_id.  Degenerate cohorts (n<2 or
    zero variance) are excluded on both engines by the same integer-side
    guard.

    Shape: one (type, hour) moment shuffle to a tiny checkpointed
    profile, broadcast back onto the scan (zero-shuffle scoring), then
    TakeOrderedAndProject for the global top-{k} — never a full sort."""
    e = load_table(spark, sf_dir, "events")
    hr = F.hour("ts").cast("bigint")
    prof = (
        e.groupBy(F.col("event_type"), hr.alias("hr"))
        .agg(
            F.count(F.lit(1)).cast("double").alias("n"),
            F.sum(F.col("value").cast("decimal(28,6)")).cast("double").alias("sx"),
            F.sum((F.col("value") * F.col("value")).cast("decimal(28,6)"))
            .cast("double")
            .alias("sxx"),
        )
        .filter(
            (F.col("n") >= 2) & (F.col("n") * F.col("sxx") > F.col("sx") * F.col("sx"))
        )
        .localCheckpoint(eager=True)  # tiny; scoring join must not rescan
    )
    z = F.round(
        (F.col("value") - F.col("sx") / F.col("n"))
        / F.sqrt(
            (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
            / (F.col("n") * F.col("n"))
        ),
        9,
    )
    scored = (
        e.select("event_id", "event_type", hr.alias("hr"), "value")
        .join(F.broadcast(prof), ["event_type", "hr"])
        .select("event_id", "event_type", "hr", "value", z.alias("z"))
    )
    top = scored.orderBy(F.abs("z").desc(), F.asc("event_id")).limit(_ANOM_K)
    w = Window.orderBy(F.abs(F.col("z")).desc(), F.asc("event_id"))
    return top.select(
        "event_id",
        "event_type",
        "hr",
        "value",
        "z",
        F.row_number().over(w).cast("bigint").alias("rnk"),
    )
