"""Relational operator surface (SURVEY.md §2 Part B, q_scan_events … q_array_ops).

Every operator here is a pure Catalyst built-in — scans get predicate
pushdown + column pruning, joins get broadcast/SMJ selection + AQE, and all
expressions stay inside whole-stage codegen (no Python UDFs anywhere in this
module).  The reference (uswitch/bifrost) has NONE of these operators
(SURVEY.md §2 Part A′); they are the engine's batch-relational mandate.

Determinism discipline for the DuckDB oracle hash:
  * every computed column is aliased identically in Spark and SQL;
  * double SUM/AVG accumulate in DECIMAL (see _util.py);
  * LIMIT queries order by a unique key chain;
  * integer-typed outputs are cast to BIGINT on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from bifrost_spark.queries._util import davg, dsum, sql_davg, sql_dsum
from bifrost_spark.registry import query
from bifrost_spark.tables import load_table


# ---------------------------------------------------------------------------
# Scan / filter / project
# ---------------------------------------------------------------------------

@query(
    "q_scan_events",
    oracle="SELECT event_id, event_type, value FROM events",
)
def q_scan_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source scan + projection.  Column pruning reaches the parquet footer
    (ReadSchema shows only 3 of 6 columns).  Parity: the raw Kafka-message
    scan, reference kafka.clj:143-175."""
    return load_table(spark, sf_dir, "events").select("event_id", "event_type", "value")


@query(
    "q_filter_pushdown",
    oracle="""
        SELECT event_id, user_id, value
        FROM events
        WHERE value > 100 AND props IS NOT NULL AND event_type <> 'click'
    """,
)
def q_filter_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive null-safe predicate; all three conjuncts appear in the scan's
    PushedFilters (GreaterThan, IsNotNull, Not(EqualTo))."""
    ev = load_table(spark, sf_dir, "events")
    return ev.filter(
        (F.col("value") > 100) & F.col("props").isNotNull() & (F.col("event_type") != "click")
    ).select("event_id", "user_id", "value")


@query(
    "q_project_expr",
    oracle="""
        SELECT
          l_orderkey,
          l_linenumber,
          l_extendedprice * (1 - l_discount) AS revenue,
          CAST(l_quantity * 100 AS BIGINT) AS qty_centi,
          UPPER(l_returnflag) AS flag_upper,
          SUBSTR(l_linestatus, 1, 1) AS status_c
        FROM lineitem
    """,
)
def q_project_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expression projection (arithmetic + string).  Row-level double math is
    IEEE-deterministic, so raw doubles are hash-safe here."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
        (F.col("l_quantity") * 100).cast("bigint").alias("qty_centi"),
        F.upper("l_returnflag").alias("flag_upper"),
        F.substring("l_linestatus", 1, 1).alias("status_c"),
    )


# ---------------------------------------------------------------------------
# Joins
# ---------------------------------------------------------------------------

@query(
    "q_join_inner",
    oracle="""
        SELECT l.l_orderkey, l.l_linenumber, o.o_orderstatus,
               l.l_extendedprice * (1 - l.l_discount) AS revenue
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE o.o_totalprice > 50000
    """,
)
def q_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi inner join (fact-to-fact).  At 100 TB both sides are large →
    sort-merge on the shuffled key; AQE converts to broadcast when the
    filtered orders side fits under the threshold."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 50000)
    return li.join(o, li.l_orderkey == o.o_orderkey).select(
        "l_orderkey",
        "l_linenumber",
        "o_orderstatus",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
    )


@query(
    "q_join_left",
    oracle="""
        SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice
        FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    """,
)
def q_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join; unmatched customers keep NULL order columns."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left").select(
        "c_custkey", "c_name", "o_orderkey", "o_totalprice"
    )


@query(
    "q_join_full",
    oracle="""
        SELECT c.c_custkey, c.c_name, s.s_suppkey, s.s_name
        FROM (SELECT * FROM customer WHERE c_acctbal > 9000) c
        FULL OUTER JOIN (SELECT * FROM supplier WHERE s_acctbal > 9000) s
          ON c.c_nationkey = s.s_nationkey
    """,
)
def q_join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join — the one flavor that can never broadcast (both sides
    must surface unmatched rows), so it exercises the shuffled sort-merge
    path even when a side is tiny.  High-balance customers × suppliers per
    nation, keeping nations present on only one side."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 9000)
    s = load_table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") > 9000)
    return c.join(s, c.c_nationkey == s.s_nationkey, "full").select(
        "c_custkey", "c_name", "s_suppkey", "s_name"
    )


@query(
    "q_join_semi",
    oracle="""
        SELECT c_custkey, c_name, c_acctbal
        FROM customer c
        WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 100000)
    """,
)
def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (EXISTS/IN).  Only the probe side's columns survive —
    Catalyst never materializes the build side's payload."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 100000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name", "c_acctbal"
    )


@query(
    "q_join_anti",
    oracle="""
        SELECT c_custkey, c_name
        FROM customer c
        WHERE NOT EXISTS (
          SELECT 1 FROM orders o
          WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
        )
    """,
)
def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (NOT EXISTS): customers with no URGENT order.

    Every fixture customer has ≥1 order, so the bare "no orders" anti join
    was vacuously green (r1 driver row: 0 = 0 rows).  Filtering the anti
    side to '1-URGENT' keeps the identical anti-hash-join plan, pushes a
    selective predicate into the build side, and yields 18 / 203 / 1986
    rows at sf0.001 / 0.01 / 0.1 so the join logic is actually exercised."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@query(
    "q_join_multiway",
    oracle=f"""
        SELECT r.r_name AS region_name,
               n.n_name AS nation_name,
               CAST(COUNT(*) AS BIGINT) AS order_cnt,
               {sql_dsum('o.o_totalprice', 'total_revenue')}
        FROM region r
        JOIN nation n ON n.n_regionkey = r.r_regionkey
        JOIN customer c ON c.c_nationkey = n.n_nationkey
        JOIN orders o ON o.o_custkey = c.c_custkey
        GROUP BY r.r_name, n.n_name
    """,
)
def q_join_multiway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4-way star join region→nation→customer→orders.

    Scale posture: region/nation are bounded dimensions → explicit
    ``broadcast()`` so the only shuffle is orders⋈customer on custkey; the
    final groupBy is on low-cardinality keys → partial aggregation collapses
    it map-side."""
    r = F.broadcast(load_table(spark, sf_dir, "region"))
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region_name"), F.col("n_name").alias("nation_name"))
        .agg(
            F.count("*").alias("order_cnt"),
            dsum("o_totalprice", "total_revenue"),
        )
    )


# ---------------------------------------------------------------------------
# Aggregation
# ---------------------------------------------------------------------------

@query(
    "q_agg_hash",
    oracle=f"""
        SELECT
          l_returnflag,
          l_linestatus,
          {sql_dsum('l_quantity', 'sum_qty')},
          {sql_dsum('l_extendedprice', 'sum_base_price')},
          {sql_dsum('l_extendedprice * (1 - l_discount)', 'sum_disc_price')},
          {sql_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 'sum_charge')},
          {sql_davg('l_quantity', 'avg_qty')},
          {sql_davg('l_extendedprice', 'avg_price')},
          {sql_davg('l_discount', 'avg_disc')},
          CAST(COUNT(*) AS BIGINT) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
    """,
)
def q_agg_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: the flagship hash aggregate (scan → pushed filter →
    project → partial+final hash agg).  Partial aggregation (map-side
    combine) reduces the shuffle to |groups|×partitions rows — the plan that
    survives 100 TB.

    Cost audit (sf0.1, local[32], warm): scan+count 0.22 s; the full
    7-decimal-aggregate query 0.78 s — the delta is the per-row
    double→DECIMAL(28,6) accumulation that buys bit-stable sums.  A
    scaled-long rewrite (round(x·100) → long/decimal sums) measures
    0.55 s, but the final unscale would cast >2^53 integer sums to double
    where Spark and DuckDB round differently (see _util) — rejected:
    ~0.2 s at sf0.1 for a latent cross-engine divergence class is a bad
    trade, and at cluster scale this stage is scan/shuffle-bound anyway."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            dsum(disc_price, "sum_disc_price"),
            dsum(charge, "sum_charge"),
            davg("l_quantity", "avg_qty"),
            davg("l_extendedprice", "avg_price"),
            davg("l_discount", "avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@query(
    "q_agg_distinct",
    oracle="""
        SELECT event_type,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS distinct_users,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM events
        GROUP BY event_type
    """,
)
def q_agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct aggregate.  Catalyst expands to a two-phase plan (dedup on
    (event_type,user_id) then count) — no driver-side set collection."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("distinct_users"),
        F.count("*").alias("n_events"),
    )


@query("q_agg_approx", oracle=None)  # randomized sketch → rows-only check
def q_agg_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ approximate count-distinct (rsd 1%).  The scale answer to
    COUNT(DISTINCT) at 100 TB: fixed-size sketch, single shuffle of sketches,
    no exact-dedup shuffle.  Accuracy asserted vs exact in tests (ε≤5%)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.01).alias("approx_users")
    )


@query(
    "q_rollup",
    oracle=f"""
        SELECT o_orderstatus, o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               {sql_dsum('o_totalprice', 'revenue')}
        FROM orders
        GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
        -- empty-relation semantics differ by engine: the SQL standard (and
        -- DuckDB) emit the () grand-total row with n = 0 even over an empty
        -- table; Spark's rollup/cube emit no rows.  The filter pins the
        -- oracle to Spark's semantics — it can only remove that one
        -- degenerate row, since every real group has n >= 1
        HAVING COUNT(*) > 0
    """,
)
def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets (hierarchical subtotals + grand total)."""
    o = load_table(spark, sf_dir, "orders")
    return o.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n_orders"), dsum("o_totalprice", "revenue")
    )


@query(
    "q_cube",
    oracle=f"""
        SELECT o_orderstatus, o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               {sql_dsum('o_totalprice', 'revenue')}
        FROM orders
        GROUP BY CUBE (o_orderstatus, o_orderpriority)
        HAVING COUNT(*) > 0  -- empty-relation alignment, see q_rollup
    """,
)
def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets (all subtotal combinations)."""
    o = load_table(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n_orders"), dsum("o_totalprice", "revenue")
    )


# ---------------------------------------------------------------------------
# Window functions
# ---------------------------------------------------------------------------

@query(
    "q_window_rank",
    oracle="""
        SELECT c_custkey, c_mktsegment, c_acctbal, rnk FROM (
          SELECT c_custkey, c_mktsegment, c_acctbal,
                 CAST(ROW_NUMBER() OVER (
                   PARTITION BY c_mktsegment
                   ORDER BY c_acctbal DESC, c_custkey
                 ) AS BIGINT) AS rnk
          FROM customer
        ) WHERE rnk <= 5
    """,
)
def q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking window: top-5 customers by balance per market segment.
    ORDER BY chain ends in the unique c_custkey so row_number is total.
    This is the scale-correct top-k-per-group: one shuffle on the partition
    key, no global sort."""
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return (
        c.select(
            "c_custkey",
            "c_mktsegment",
            "c_acctbal",
            F.row_number().over(w).cast("bigint").alias("rnk"),
        )
        .filter(F.col("rnk") <= 5)
    )


@query(
    "q_window_running",
    oracle="""
        SELECT event_id, user_id,
               CAST(SUM(CAST(value AS DECIMAL(28,6))) OVER (
                 PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS DOUBLE) AS running_value,
               CAST(ROW_NUMBER() OVER (
                 PARTITION BY user_id ORDER BY ts, event_id
               ) AS BIGINT) AS seq
        FROM events
    """,
)
def q_window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic window with an explicit ROWS frame: per-user running total in
    event-time order (tie-broken by unique event_id).  Decimal accumulation
    makes every prefix sum engine- and partition-order-independent."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    frame = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return ev.select(
        "event_id",
        "user_id",
        F.sum(F.col("value").cast("decimal(28,6)")).over(frame).cast("double").alias("running_value"),
        F.row_number().over(w).cast("bigint").alias("seq"),
    )


# ---------------------------------------------------------------------------
# Sort / limit / set ops
# ---------------------------------------------------------------------------

@query(
    "q_sort_limit",
    oracle="""
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 10
    """,
)
def q_sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Total sort + LIMIT.  Spark plans TakeOrderedAndProject — per-partition
    top-k then a k-row merge on the driver; never a full global sort.  Unique
    o_orderkey tie-break makes the k-set deterministic."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
    )


@query(
    "q_set_ops",
    oracle="""
        SELECT 'union' AS op, k FROM (
          SELECT c_nationkey AS k FROM customer UNION SELECT s_nationkey AS k FROM supplier)
        UNION ALL
        SELECT 'intersect' AS op, k FROM (
          SELECT c_nationkey AS k FROM customer INTERSECT SELECT s_nationkey AS k FROM supplier)
        UNION ALL
        SELECT 'except' AS op, k FROM (
          SELECT c_nationkey AS k FROM customer EXCEPT SELECT s_nationkey AS k FROM supplier)
    """,
)
def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION / INTERSECT / EXCEPT (distinct semantics) over the nation-key
    domains of customer vs supplier, tagged per branch."""
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("k"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("k"))
    tagged = [
        c.union(s).distinct().select(F.lit("union").alias("op"), "k"),
        c.intersect(s).select(F.lit("intersect").alias("op"), "k"),
        c.subtract(s).select(F.lit("except").alias("op"), "k"),  # EXCEPT (distinct)
    ]
    out = tagged[0]
    for t in tagged[1:]:
        out = out.unionByName(t)
    return out


# ---------------------------------------------------------------------------
# Scalar function library / JSON / arrays
# ---------------------------------------------------------------------------

@query(
    "q_scalar_funcs",
    oracle="""
        SELECT
          o_orderkey,
          DATE_TRUNC('month', o_orderdate) AS order_month,
          CAST(YEAR(o_orderdate) AS BIGINT) AS order_year,
          CAST(DATEDIFF('day', TIMESTAMP '1994-01-01', o_orderdate) AS BIGINT) AS days_since_1994,
          CONCAT_WS('-', o_orderstatus, o_orderpriority) AS status_prio,
          CAST(FLOOR(o_totalprice) AS BIGINT) AS price_floor,
          ABS(o_totalprice - 100000.0) AS price_dist,
          REGEXP_EXTRACT(o_orderpriority, '([0-9]+)', 1) AS prio_num
        FROM orders
    """,
)
def q_scalar_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar function library: date (trunc/extract/diff), string
    (concat_ws/regexp_extract), math (floor/abs).  All JVM built-ins inside
    whole-stage codegen.  Transcendentals and double-rounding are avoided on
    purpose — they are the only scalar fns whose bit patterns differ across
    engines."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.date_trunc("month", "o_orderdate").alias("order_month"),
        F.year("o_orderdate").cast("bigint").alias("order_year"),
        F.datediff(F.col("o_orderdate"), F.lit("1994-01-01").cast("timestamp"))
        .cast("bigint")
        .alias("days_since_1994"),
        F.concat_ws("-", "o_orderstatus", "o_orderpriority").alias("status_prio"),
        F.floor("o_totalprice").cast("bigint").alias("price_floor"),
        F.abs(F.col("o_totalprice") - 100000.0).alias("price_dist"),
        F.regexp_extract("o_orderpriority", "([0-9]+)", 1).alias("prio_num"),
    )


@query(
    "q_json_extract",
    oracle="""
        SELECT event_id,
               TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value
        FROM events
        WHERE props IS NOT NULL AND json_valid(props)
          AND TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) IS NOT NULL
    """,
)
def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON scalar extraction over the opaque payload column (the reference
    never parses payloads — kafka.clj:58; this is the engine's upgrade).

    Junk tolerance (fuzzer finding): telemetry props are crash-prone —
    malformed JSON, non-numeric k, empty strings.  Spark's
    get_json_object already NULLs malformed input; the CAST becomes
    try_cast so a string-valued k degrades to NULL instead of an ANSI
    abort.  The oracle mirrors with json_valid + TRY_CAST (DuckDB's JSON
    functions RAISE on malformed input, and integral-string casts differ
    cross-engine on floats — the contract is integer-literal k)."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").try_cast("bigint")
    return ev.select("event_id", k.alias("k_value")).filter(F.col("k_value").isNotNull())


@query(
    "q_array_ops",
    oracle="""
        SELECT vec_id,
               CAST(len(embedding) AS BIGINT) AS dim,
               CAST(embedding[1] AS DOUBLE) AS first_component,
               CAST(embedding[len(embedding)] AS DOUBLE) AS last_component,
               label
        FROM embeddings
    """,
)
def q_array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array ops over array<float>: size + element access (float→double is
    exact, so values hash identically).  FP folds over arrays live in the
    similarity queries with decimal accumulators."""
    e = load_table(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        F.size("embedding").cast("bigint").alias("dim"),
        F.element_at("embedding", 1).cast("double").alias("first_component"),
        F.element_at("embedding", F.size("embedding")).cast("double").alias("last_component"),
        "label",
    )
