"""TPC-H-derived decision-support suite over the fixture schema.

The reference engine is an archival pipeline, not a warehouse — this suite
is part of the ADDITIVE engine surface (SURVEY §2 Part B addendum): the 22
canonical TPC-H query shapes re-expressed Spark-first, so a user gets the
standard decision-support workload out of the same engine that does the
archival/LLM work.  Q1 is already registered canonically as ``q_agg_hash``
(queries/relational.py) — this module adds Q2–Q22 as ``q_tpch02`` …
``q_tpch22``.

Schema adaptations (the fixture is TPC-H-ish, not TPC-H):

* **No ``partsupp`` table** → Q2/Q11/Q16/Q20 use the *lineitem bridge*:
  the observed (l_partkey, l_suppkey) pairs stand in for the part-supplier
  catalog, and revenue/quantity sums stand in for supplycost/availqty.
  The join/agg/subquery SHAPE (the thing that matters at 100 TB) is
  unchanged.
* **No ``l_commitdate``/``l_receiptdate``** → Q4/Q12/Q21 define "late" as
  ``l_shipdate > o_orderdate + INTERVAL n DAY`` and "failed delivery" as
  ``l_returnflag = 'R'``.
* **No ``l_shipmode``/``p_container``/``c_phone``** → Q12 groups by
  ``l_linestatus``, Q17/Q19 band on ``p_type``/``p_size``, Q22 derives its
  country code from ``c_nationkey``.

Every money aggregate accumulates in DECIMAL(28,6) (queries/_util.dsum) so
sums are order-independent and bit-stable across partition counts — the
same value on local[32] and on a 1000-executor cluster, and the same value
DuckDB computes.  Ratio outputs divide two such exact doubles with
identically-parenthesized expressions on both engines (single IEEE-754
division → deterministic).  Every LIMIT sits under a total order with a
unique tie-break key.

Scale notes: region/nation broadcast always (bounded by geography);
supplier/part/customer joins shuffle on their keys at real SF (they grow
with SF, so no broadcast hint is hard-coded); scalar thresholds
(Q11/Q15/Q20/Q22) reduce to one row and re-broadcast via crossJoin — zero
fact-side shuffle for the threshold compare.

Cost audit (sf0.1, local[32], warm min-of-2, measured this round): all 21
queries run in 0.14 s (Q6, pure pushed scan) to ~1.1 s (Q18, two lineitem
passes + three shuffles); suite total ≈ 10 s.  The heaviest shapes and
their plan answers: Q18 semi-filters both fact sides by the rare
big-order keys before the customer join; Q21's two quantifiers are
semi/anti hash joins sharing the l_orderkey exchange; Q2's correlated
extremum shares one p_partkey shuffle between DISTINCT and window.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from bifrost_spark.queries._util import DEC, davg, dsum, sql_dsum
from bifrost_spark.registry import query
from bifrost_spark.tables import load_table


def _ts(s: str) -> Column:
    return F.lit(f"{s} 00:00:00").cast("timestamp")


def _year(col: str) -> Column:
    # BIGINT on both engines (convention proven by q_date_arith's driver row)
    return F.year(col).cast("bigint")


def _disc_price() -> Column:
    # built lazily: classic-mode Column construction needs an active session
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


@query(
    "q_tpch02",
    oracle="""
        SELECT s_acctbal, s_name, n_name, p_partkey, p_type
        FROM (
          SELECT DISTINCT s.s_acctbal, s.s_name, n.n_name,
                          p.p_partkey, p.p_type,
                          MAX(s.s_acctbal) OVER (PARTITION BY p.p_partkey)
                            AS best_bal
          FROM part p
          JOIN lineitem l ON l.l_partkey = p.p_partkey
          JOIN supplier s ON s.s_suppkey = l.l_suppkey
          JOIN nation n   ON n.n_nationkey = s.s_nationkey
          JOIN region r   ON r.r_regionkey = n.n_regionkey
          WHERE r.r_name = 'EUROPE'
            AND p.p_size <= 10 AND p.p_type = 'STANDARD'
        )
        WHERE s_acctbal = best_bal
        ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
        LIMIT 100
    """,
)
def q_tpch02(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 (minimum-cost supplier), lineitem-bridge adaptation: with no
    partsupp/supplycost, "best supplier for the part in the region" =
    highest-account-balance supplier among those observed shipping it.

    Shape preserved: part-filtered probe → region-restricted part↔supplier
    association → per-part correlated extremum.  The spec's correlated MIN
    subquery is a per-part window max here — one shuffle on p_partkey
    instead of a second scan of the association (the window and the
    DISTINCT share that shuffle).  region/nation broadcast."""
    from pyspark.sql.window import Window

    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_size") <= 10) & (F.col("p_type") == "STANDARD")
    )
    s = load_table(spark, sf_dir, "supplier")
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    r = F.broadcast(
        load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    )
    assoc = (
        p.join(li, p.p_partkey == li.l_partkey)
        .join(s, s.s_suppkey == li.l_suppkey)
        .join(n, n.n_nationkey == s.s_nationkey)
        .join(r, r.r_regionkey == n.n_regionkey)
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_type")
        .distinct()
    )
    w = Window.partitionBy("p_partkey")
    return (
        assoc.withColumn("best_bal", F.max("s_acctbal").over(w))
        .filter(F.col("s_acctbal") == F.col("best_bal"))
        .drop("best_bal")
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@query(
    "q_tpch03",
    oracle=f"""
        SELECT l.l_orderkey,
               {sql_dsum('l.l_extendedprice * (1 - l.l_discount)', 'revenue')},
               o.o_orderdate
        FROM customer c
        JOIN orders o ON o.o_custkey = c.c_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE c.c_mktsegment = 'MACHINERY'
          AND o.o_orderdate < TIMESTAMP '1997-06-15 00:00:00'
          AND l.l_shipdate  > TIMESTAMP '1997-06-15 00:00:00'
        GROUP BY l.l_orderkey, o.o_orderdate
        ORDER BY revenue DESC, l.l_orderkey
        LIMIT 10
    """,
)
def q_tpch03(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 (shipping priority; fixture lacks o_shippriority — output
    drops that constant column, all predicates canonical).  Segment filter
    prunes customers before the join; both fact joins shuffle on their
    keys; top-10 via global sort-limit (TakeOrderedAndProject — only K rows
    leave each partition).  Distinct from q_composite_report's Q3 shape by
    parameter set (MACHINERY / 1997-06-15) and canonical output columns."""
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "MACHINERY"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < _ts("1997-06-15")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > _ts("1997-06-15")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(dsum(_disc_price(), "revenue"))
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


@query(
    "q_tpch04",
    oracle="""
        SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
        FROM orders o
        WHERE o.o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
          AND o.o_orderdate <  TIMESTAMP '1996-10-01 00:00:00'
          AND EXISTS (
            SELECT 1 FROM lineitem l
            WHERE l.l_orderkey = o.o_orderkey
              AND l.l_shipdate > o.o_orderdate + INTERVAL 45 DAY
          )
        GROUP BY o_orderpriority
    """,
)
def q_tpch04(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 (order-priority checking).  Fixture lacks
    l_commitdate/l_receiptdate, so "late" = shipped >45 days after the
    order date — same correlated-EXISTS shape, decorrelated by Catalyst to
    a LEFT SEMI hash join on l_orderkey; the quarter filter prunes the
    orders scan before the join."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1996-07-01"))
        & (F.col("o_orderdate") < _ts("1996-10-01"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    late = o.join(
        li,
        (li.l_orderkey == o.o_orderkey)
        & (li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 45 DAY")),
        "leftsemi",
    )
    return late.groupBy("o_orderpriority").agg(F.count("*").alias("order_count"))


@query(
    "q_tpch05",
    oracle=f"""
        SELECT n.n_name,
               {sql_dsum('l.l_extendedprice * (1 - l.l_discount)', 'revenue')}
        FROM customer c
        JOIN orders o   ON o.o_custkey = c.c_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
                       AND s.s_nationkey = c.c_nationkey
        JOIN nation n   ON n.n_nationkey = c.c_nationkey
        JOIN region r   ON r.r_regionkey = n.n_regionkey
        WHERE r.r_name = 'AMERICA'
          AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY n.n_name
    """,
)
def q_tpch05(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 (local supplier volume), canonical predicates (AMERICA,
    1996).  Six-table join: region/nation broadcast; the
    supplier-nation = customer-nation equi-condition rides the supplier
    join.  Same shape as q_sql_api (which proves the SQL entry point);
    this one is the DataFrame spelling with the canonical date window."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1996-01-01"))
        & (F.col("o_orderdate") < _ts("1997-01-01"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    r = F.broadcast(
        load_table(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    )
    return (
        c.join(o, o.o_custkey == c.c_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(s, (s.s_suppkey == li.l_suppkey) & (s.s_nationkey == c.c_nationkey))
        .join(n, n.n_nationkey == c.c_nationkey)
        .join(r, r.r_regionkey == n.n_regionkey)
        .groupBy("n_name")
        .agg(dsum(_disc_price(), "revenue"))
    )


@query(
    "q_tpch06",
    oracle=f"""
        SELECT {sql_dsum('l_extendedprice * l_discount', 'revenue')}
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
          AND l_discount >= 0.05 AND l_discount <= 0.07
          AND l_quantity < 24
    """,
)
def q_tpch06(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 (forecasting revenue change), fully canonical.  Pure
    scan-filter-aggregate: every predicate pushes to the parquet scan, the
    aggregate is a 1-row partial+final — the cheapest possible plan, and
    the query that most directly measures scan bandwidth at 100 TB."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= _ts("1996-01-01"))
        & (F.col("l_shipdate") < _ts("1997-01-01"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(dsum(F.col("l_extendedprice") * F.col("l_discount"), "revenue"))


@query(
    "q_tpch07",
    oracle=f"""
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(YEAR(l.l_shipdate) AS BIGINT) AS l_year,
               {sql_dsum('l.l_extendedprice * (1 - l.l_discount)', 'revenue')}
        FROM supplier s
        JOIN lineitem l ON l.l_suppkey = s.s_suppkey
        JOIN orders o   ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n1  ON n1.n_nationkey = s.s_nationkey
        JOIN nation n2  ON n2.n_nationkey = c.c_nationkey
        WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
            OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
          AND l.l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
          AND l.l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY supp_nation, cust_nation, l_year
    """,
)
def q_tpch07(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 (volume shipping between two nations), canonical.  The two
    nation aliases broadcast with their name filters applied, so only
    lineitems of the two nations' suppliers/customers survive the join
    graph; the OR-pair predicate lands after both broadcasts (evaluated
    map-side, no extra shuffle)."""
    s = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1995-01-01"))
        & (F.col("l_shipdate") < _ts("1997-01-01"))
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    two = nation.filter(F.col("n_name").isin("NATION_1", "NATION_2"))
    n1 = F.broadcast(two.select(F.col("n_nationkey").alias("nk1"),
                                F.col("n_name").alias("supp_nation")))
    n2 = F.broadcast(two.select(F.col("n_nationkey").alias("nk2"),
                                F.col("n_name").alias("cust_nation")))
    return (
        s.join(li, li.l_suppkey == s.s_suppkey)
        .join(o, o.o_orderkey == li.l_orderkey)
        .join(c, c.c_custkey == o.o_custkey)
        .join(n1, F.col("nk1") == s.s_nationkey)
        .join(n2, F.col("nk2") == c.c_nationkey)
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation",
                 _year("l_shipdate").alias("l_year"))
        .agg(dsum(_disc_price(), "revenue"))
    )


@query(
    "q_tpch08",
    oracle="""
        SELECT o_year,
               (CAST(SUM(CAST(CASE WHEN supp_nation = 'NATION_3'
                                   THEN volume ELSE 0 END
                              AS DECIMAL(28,6))) AS DOUBLE)
                / CAST(SUM(CAST(volume AS DECIMAL(28,6))) AS DOUBLE))
                 AS mkt_share
        FROM (
          SELECT CAST(YEAR(o.o_orderdate) AS BIGINT) AS o_year,
                 l.l_extendedprice * (1 - l.l_discount) AS volume,
                 n2.n_name AS supp_nation
          FROM part p
          JOIN lineitem l ON l.l_partkey = p.p_partkey
          JOIN supplier s ON s.s_suppkey = l.l_suppkey
          JOIN orders o   ON o.o_orderkey = l.l_orderkey
          JOIN customer c ON c.c_custkey = o.o_custkey
          JOIN nation n1  ON n1.n_nationkey = c.c_nationkey
          JOIN region r   ON r.r_regionkey = n1.n_regionkey
          JOIN nation n2  ON n2.n_nationkey = s.s_nationkey
          WHERE r.r_name = 'ASIA' AND p.p_type = 'ECONOMY'
            AND o.o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
            AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
        )
        GROUP BY o_year
    """,
)
def q_tpch08(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 (national market share), canonical shape.  Both nation
    roles and the region broadcast; the share ratio divides two exact
    decimal sums as doubles — identical parenthesization on both engines,
    single IEEE division, bit-stable."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1995-01-01"))
        & (F.col("o_orderdate") < _ts("1997-01-01"))
    )
    c = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    n1 = F.broadcast(nation.select(F.col("n_nationkey").alias("nk1"),
                                   F.col("n_regionkey").alias("rk1")))
    n2 = F.broadcast(nation.select(F.col("n_nationkey").alias("nk2"),
                                   F.col("n_name").alias("supp_nation")))
    r = F.broadcast(
        load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    )
    vol = (
        p.join(li, li.l_partkey == p.p_partkey)
        .join(s, s.s_suppkey == li.l_suppkey)
        .join(o, o.o_orderkey == li.l_orderkey)
        .join(c, c.c_custkey == o.o_custkey)
        .join(n1, F.col("nk1") == c.c_nationkey)
        .join(r, r.r_regionkey == F.col("rk1"))
        .join(n2, F.col("nk2") == s.s_nationkey)
        .select(
            _year("o_orderdate").alias("o_year"),
            _disc_price().alias("volume"),
            "supp_nation",
        )
    )
    nat_vol = F.when(F.col("supp_nation") == "NATION_3", F.col("volume")).otherwise(
        F.lit(0.0)
    )
    return vol.groupBy("o_year").agg(
        (
            F.sum(nat_vol.cast(DEC)).cast("double")
            / F.sum(F.col("volume").cast(DEC)).cast("double")
        ).alias("mkt_share")
    )


@query(
    "q_tpch09",
    oracle=f"""
        SELECT n.n_name AS nation,
               CAST(YEAR(o.o_orderdate) AS BIGINT) AS o_year,
               {sql_dsum('l.l_extendedprice * (1 - l.l_discount)', 'sum_profit')}
        FROM part p
        JOIN lineitem l ON l.l_partkey = p.p_partkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN orders o   ON o.o_orderkey = l.l_orderkey
        JOIN nation n   ON n.n_nationkey = s.s_nationkey
        WHERE p.p_name LIKE '%red%'
        GROUP BY nation, o_year
    """,
)
def q_tpch09(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 (product-type profit).  No partsupp/ps_supplycost in the
    fixture, so profit = gross discounted revenue (the cost subtrahend is
    dropped; join/agg shape intact).  p_name LIKE '%red%' can't push to a
    parquet min/max but prunes 2000→~a-sixth of parts before the fact
    join; nation broadcasts."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    return (
        p.join(li, li.l_partkey == p.p_partkey)
        .join(s, s.s_suppkey == li.l_suppkey)
        .join(o, o.o_orderkey == li.l_orderkey)
        .join(n, n.n_nationkey == s.s_nationkey)
        .groupBy(F.col("n_name").alias("nation"),
                 _year("o_orderdate").alias("o_year"))
        .agg(dsum(_disc_price(), "sum_profit"))
    )


@query(
    "q_tpch10",
    oracle=f"""
        SELECT c.c_custkey, c.c_name,
               {sql_dsum('l.l_extendedprice * (1 - l.l_discount)', 'revenue')},
               c.c_acctbal, n.n_name
        FROM customer c
        JOIN orders o   ON o.o_custkey = c.c_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN nation n   ON n.n_nationkey = c.c_nationkey
        WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o.o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
          AND l.l_returnflag = 'R'
        GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
        ORDER BY revenue DESC, c.c_custkey
        LIMIT 20
    """,
)
def q_tpch10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 (returned-item reporting), canonical minus the fixture's
    missing c_address/c_phone/c_comment output columns.  Quarter filter
    prunes orders at the scan; returnflag filter prunes lineitem; top-20
    via TakeOrderedAndProject with c_custkey tie-break (revenue is an
    exact decimal sum → identical sort keys on both engines)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1996-01-01"))
        & (F.col("o_orderdate") < _ts("1996-04-01"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    return (
        c.join(o, o.o_custkey == c.c_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(n, n.n_nationkey == c.c_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(dsum(_disc_price(), "revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@query(
    "q_tpch11",
    oracle=f"""
        WITH val AS (
          SELECT l.l_partkey,
                 {sql_dsum('l.l_extendedprice * (1 - l.l_discount)', 'value')}
          FROM lineitem l
          JOIN supplier s ON s.s_suppkey = l.l_suppkey
          JOIN nation n   ON n.n_nationkey = s.s_nationkey
          WHERE n.n_name = 'NATION_5'
          GROUP BY l.l_partkey
        )
        SELECT l_partkey, value FROM val
        WHERE value > (SELECT 0.001 * CAST(SUM(CAST(value AS DECIMAL(28,6)))
                                           AS DOUBLE)
                       FROM val)
        ORDER BY value DESC, l_partkey
    """,
)
def q_tpch11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 (important stock identification), lineitem-bridge
    adaptation: part "value" for a nation = discounted revenue shipped by
    that nation's suppliers (no ps_availqty*ps_supplycost in the fixture).
    The global threshold is a 1-row aggregate crossJoined back (broadcast
    nested loop of 1 row — zero shuffle on the per-part side).  The val
    aggregation feeds BOTH the threshold and the final filter, and neither
    Catalyst nor AQE reuses the duplicate subtree (measured: lineitem
    scanned twice in the executed plan) — so the |parts|-row aggregate is
    localCheckpoint'd and the fact table is scanned ONCE."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = F.broadcast(
        load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_5")
    )
    val = (
        li.join(s, s.s_suppkey == li.l_suppkey)
        .join(n, n.n_nationkey == s.s_nationkey)
        .groupBy("l_partkey")
        .agg(dsum(_disc_price(), "value"))
        .localCheckpoint(eager=True)
    )
    threshold = val.agg(
        (F.lit(0.001) * F.sum(F.col("value").cast(DEC)).cast("double")).alias(
            "threshold"
        )
    )
    return (
        val.crossJoin(F.broadcast(threshold))
        .filter(F.col("value") > F.col("threshold"))
        .select("l_partkey", "value")
        .orderBy(F.desc("value"), "l_partkey")
    )


@query(
    "q_tpch12",
    oracle="""
        SELECT l.l_linestatus AS ship_class,
               CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        FROM orders o
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l.l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
          AND l.l_shipdate >  o.o_orderdate + INTERVAL 30 DAY
        GROUP BY ship_class
    """,
)
def q_tpch12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 (shipping-mode priority).  Fixture lacks l_shipmode and
    receipt/commit dates: the group key is l_linestatus and "late" =
    shipped >30 days after ordering.  Conditional counts are map-side
    partial aggregates; the year filter pushes to the lineitem scan, the
    lateness predicate rides the join (needs both sides, evaluated in the
    join stage, no extra pass)."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01"))
        & (F.col("l_shipdate") < _ts("1997-01-01"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(
            li,
            (li.l_orderkey == o.o_orderkey)
            & (li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 30 DAY")),
        )
        .groupBy(F.col("l_linestatus").alias("ship_class"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@query(
    "q_tpch13",
    oracle="""
        SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
        FROM (
          SELECT c.c_custkey,
                 CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
          FROM customer c
          LEFT JOIN orders o
            ON o.o_custkey = c.c_custkey
           AND o.o_orderpriority <> '4-NOT SPECIFIED'
          GROUP BY c.c_custkey
        )
        GROUP BY c_count
    """,
)
def q_tpch13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 (customer order-count distribution).  The spec's
    o_comment NOT LIKE filter becomes an orderpriority exclusion (no
    comment column in the fixture) — same left-join-with-residual-filter
    shape: the filter sits in the join condition so customers with only
    excluded orders still appear with count 0.  Two aggregations, the
    second over |customers| rows → tiny."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per_cust = (
        c.join(
            o,
            (o.o_custkey == c.c_custkey)
            & (o.o_orderpriority != "4-NOT SPECIFIED"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@query(
    "q_tpch14",
    oracle="""
        SELECT (100.0 * CAST(SUM(CAST(CASE WHEN p.p_type = 'PROMO'
                                           THEN l.l_extendedprice * (1 - l.l_discount)
                                           ELSE 0 END AS DECIMAL(28,6)))
                             AS DOUBLE))
               / CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                               AS DECIMAL(28,6))) AS DOUBLE)
                 AS promo_revenue
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        WHERE l.l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
          AND l.l_shipdate <  TIMESTAMP '1996-10-01 00:00:00'
    """,
)
def q_tpch14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 (promotion effect), canonical (p_type = 'PROMO' is the
    fixture's whole-word spelling of the spec's PROMO%% prefix).  Month
    filter pushes to the lineitem scan; the ratio is (100·promo)/total
    with identical parenthesization on both engines over exact decimal
    sums."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-09-01"))
        & (F.col("l_shipdate") < _ts("1996-10-01"))
    )
    p = load_table(spark, sf_dir, "part")
    promo = F.when(F.col("p_type") == "PROMO", _disc_price()).otherwise(F.lit(0.0))
    return li.join(p, p.p_partkey == li.l_partkey).agg(
        (
            (F.lit(100.0) * F.sum(promo.cast(DEC)).cast("double"))
            / F.sum(_disc_price().cast(DEC)).cast("double")
        ).alias("promo_revenue")
    )


@query(
    "q_tpch15",
    oracle=f"""
        WITH revenue AS (
          SELECT l_suppkey AS supplier_no,
                 {sql_dsum('l_extendedprice * (1 - l_discount)', 'total_revenue')}
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
            AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
          GROUP BY l_suppkey
        )
        SELECT s.s_suppkey, s.s_name, r.total_revenue
        FROM supplier s
        JOIN revenue r ON r.supplier_no = s.s_suppkey
        WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
        ORDER BY s.s_suppkey
    """,
)
def q_tpch15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 (top supplier), canonical.  The revenue "view" is one
    quarter-filtered aggregation; its max is a 1-row aggregate broadcast
    back (no single-partition window).  Revenue is an exact decimal sum →
    the max-equality compare is bit-safe cross-engine.  Ties (multiple
    suppliers at max) are all returned, per spec."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01"))
        & (F.col("l_shipdate") < _ts("1996-04-01"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        dsum(_disc_price(), "total_revenue")
    ).localCheckpoint(eager=True)  # reused by max + join: one lineitem scan
    best = revenue.agg(F.max("total_revenue").alias("best_revenue"))
    s = load_table(spark, sf_dir, "supplier")
    return (
        s.join(revenue, revenue.supplier_no == s.s_suppkey)
        .crossJoin(F.broadcast(best))
        .filter(F.col("total_revenue") == F.col("best_revenue"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@query(
    "q_tpch16",
    oracle="""
        SELECT p.p_brand, p.p_type, p.p_size,
               CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
        FROM part p
        JOIN lineitem l ON l.l_partkey = p.p_partkey
        WHERE p.p_brand <> 'Brand#13'
          AND p.p_type <> 'PROMO'
          AND p.p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
        GROUP BY p.p_brand, p.p_type, p.p_size
    """,
)
def q_tpch16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 (parts/supplier relationship), lineitem-bridge adaptation
    (no partsupp; the observed shipping pairs are the catalog; the spec's
    complaint-supplier exclusion needs s_comment, absent).  COUNT(DISTINCT)
    over the bridge dedups (brand,type,size,suppkey) — Spark plans this as
    a two-phase distinct-then-count aggregate, both phases map-side
    partial."""
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#13")
        & (F.col("p_type") != "PROMO")
        & (F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45))
    )
    li = load_table(spark, sf_dir, "lineitem")
    return (
        p.join(li, li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "q_tpch17",
    oracle="""
        WITH pq AS (
          SELECT l.l_partkey,
                 CAST(SUM(CAST(l.l_quantity AS DECIMAL(28,6))) AS DOUBLE)
                   / COUNT(l.l_quantity) AS avg_qty
          FROM lineitem l
          JOIN part p ON p.p_partkey = l.l_partkey
          WHERE p.p_brand = 'Brand#13' AND p.p_type = 'MEDIUM'
          GROUP BY l.l_partkey
        )
        SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(28,6))) AS DOUBLE)
                 / 7.0 AS avg_yearly
        FROM lineitem l
        JOIN pq ON pq.l_partkey = l.l_partkey
        WHERE l.l_quantity < 0.2 * pq.avg_qty
    """,
)
def q_tpch17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 (small-quantity-order revenue).  The spec's p_container
    band becomes a p_type band (column absent).  The correlated AVG
    subquery is decorrelated by hand into a per-part aggregate joined back
    — the exact plan Catalyst produces for the correlated spelling, but
    explicit.  avg_qty = exact-decimal-sum / count (both engines), and the
    0.2·avg threshold is a single deterministic double product."""
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#13") & (F.col("p_type") == "MEDIUM")
    )
    li = load_table(spark, sf_dir, "lineitem")
    branded = li.join(p, p.p_partkey == li.l_partkey)
    pq = branded.groupBy("l_partkey").agg(davg("l_quantity", "avg_qty"))
    return (
        li.join(pq, "l_partkey")
        .filter(F.col("l_quantity") < F.lit(0.2) * F.col("avg_qty"))
        .agg(
            (F.sum(F.col("l_extendedprice").cast(DEC)).cast("double") / F.lit(7.0))
            .alias("avg_yearly")
        )
    )


@query(
    "q_tpch18",
    oracle=f"""
        SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
               o.o_totalprice,
               {sql_dsum('l.l_quantity', 'sum_qty')}
        FROM customer c
        JOIN orders o   ON o.o_custkey = c.c_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE o.o_orderkey IN (
          SELECT l_orderkey FROM lineitem
          GROUP BY l_orderkey
          HAVING SUM(CAST(l_quantity AS DECIMAL(28,6))) > 160
        )
        GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
                 o.o_totalprice
        ORDER BY o.o_totalprice DESC, o.o_orderkey
        LIMIT 100
    """,
)
def q_tpch18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 (large-volume customer), canonical with the quantity
    threshold rescaled to the fixture's 4-lines-per-order shape (spec 300
    ≈ 7 lines; 160 here selects a comparable top tail).  The HAVING
    subquery is one aggregation → semi join on o_orderkey; quantity sums
    in decimal so the >160 cut is engine-exact at the boundary."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast(DEC)).alias("q"))
        .filter(F.col("q") > 160)
        .select("l_orderkey")
        # consumed by BOTH semi joins below, and neither Catalyst nor AQE
        # reuses the duplicate aggregation subtree (measured: lineitem
        # scanned 3x without this) — checkpoint the rare-key set so the
        # heavy groupBy runs once and lineitem is scanned twice total
        # (keys pass + probe pass, the canonical Q18 minimum)
        .localCheckpoint(eager=True)
    )
    # Semi-filter BOTH fact sides by the rare big-order keys FIRST, so the
    # customer/orders join graph only ever sees qualifying rows — at 100 TB
    # this is the difference between joining all of lineitem and joining
    # the top-volume sliver (AQE broadcasts `big` once it materializes
    # small).
    li_f = li.join(big, "l_orderkey", "leftsemi")
    o_f = o.join(big.withColumnRenamed("l_orderkey", "o_orderkey"),
                 "o_orderkey", "leftsemi")
    return (
        c.join(o_f, o_f.o_custkey == c.c_custkey)
        .join(li_f, li_f.l_orderkey == o_f.o_orderkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate",
                 "o_totalprice")
        .agg(dsum("l_quantity", "sum_qty"))
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(100)
    )


@query(
    "q_tpch19",
    oracle=f"""
        SELECT {sql_dsum('l.l_extendedprice * (1 - l.l_discount)', 'revenue')}
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        WHERE (p.p_brand = 'Brand#11' AND p.p_size BETWEEN 1 AND 5
               AND l.l_quantity >= 1 AND l.l_quantity <= 11)
           OR (p.p_brand = 'Brand#13' AND p.p_size BETWEEN 1 AND 10
               AND l.l_quantity >= 10 AND l.l_quantity <= 20)
           OR (p.p_brand = 'Brand#15' AND p.p_size BETWEEN 1 AND 15
               AND l.l_quantity >= 20 AND l.l_quantity <= 30)
    """,
)
def q_tpch19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 (discounted revenue, three OR-ed predicate bands).  The
    spec's container/shipmode legs become p_size bands (columns absent).
    The disjunction references both sides, so it evaluates as the join's
    residual condition on the single partkey equi-join — one hash join,
    no union-of-three-joins blowup; per-side conjuncts (brand∈{…},
    qty/size outer bounds) are still derivable by Catalyst for pushdown."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    band = (
        (
            (F.col("p_brand") == "Brand#11")
            & F.col("p_size").between(1, 5)
            & (F.col("l_quantity") >= 1)
            & (F.col("l_quantity") <= 11)
        )
        | (
            (F.col("p_brand") == "Brand#13")
            & F.col("p_size").between(1, 10)
            & (F.col("l_quantity") >= 10)
            & (F.col("l_quantity") <= 20)
        )
        | (
            (F.col("p_brand") == "Brand#15")
            & F.col("p_size").between(1, 15)
            & (F.col("l_quantity") >= 20)
            & (F.col("l_quantity") <= 30)
        )
    )
    return (
        li.join(p, p.p_partkey == li.l_partkey)
        .filter(band)
        .agg(dsum(_disc_price(), "revenue"))
    )


@query(
    "q_tpch20",
    oracle=f"""
        WITH shipped AS (
          SELECT l.l_suppkey,
                 {sql_dsum('l.l_quantity', 'tot_qty')}
          FROM lineitem l
          JOIN part p ON p.p_partkey = l.l_partkey
          WHERE p.p_type = 'PROMO'
            AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
            AND l.l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
          GROUP BY l.l_suppkey
        )
        SELECT s.s_suppkey, s.s_name
        FROM supplier s
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        JOIN shipped sh ON sh.l_suppkey = s.s_suppkey
        WHERE n.n_name = 'NATION_7'
          AND sh.tot_qty > (SELECT 0.5 * CAST(SUM(CAST(tot_qty AS DECIMAL(28,6)))
                                              AS DOUBLE) / COUNT(*)
                            FROM shipped)
        ORDER BY s.s_suppkey
    """,
)
def q_tpch20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 (potential part promotion), lineitem-bridge adaptation:
    with no ps_availqty, a NATION_7 supplier qualifies when its shipped
    quantity of PROMO parts over the year exceeds half the average
    supplier's (spec: availqty > half its own shipped quantity).  Shape
    preserved: part-filtered shipping aggregate → scalar threshold →
    supplier semi-restriction.  The threshold is a 1-row broadcast."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01"))
        & (F.col("l_shipdate") < _ts("1997-01-01"))
    )
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    shipped = (
        li.join(p, p.p_partkey == li.l_partkey)
        .groupBy("l_suppkey")
        .agg(dsum("l_quantity", "tot_qty"))
        .localCheckpoint(eager=True)  # reused by threshold + join: one pass
    )
    threshold = shipped.agg(
        (
            F.lit(0.5)
            * F.sum(F.col("tot_qty").cast(DEC)).cast("double")
            / F.count("*")
        ).alias("threshold")
    )
    s = load_table(spark, sf_dir, "supplier")
    n = F.broadcast(
        load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_7")
    )
    return (
        s.join(n, n.n_nationkey == s.s_nationkey)
        .join(shipped, shipped.l_suppkey == s.s_suppkey)
        .crossJoin(F.broadcast(threshold))
        .filter(F.col("tot_qty") > F.col("threshold"))
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


@query(
    "q_tpch21",
    oracle="""
        SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
        FROM supplier s
        JOIN nation n    ON n.n_nationkey = s.s_nationkey
        JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey
        JOIN orders o    ON o.o_orderkey = l1.l_orderkey
        WHERE n.n_name = 'NATION_2'
          AND o.o_orderstatus = 'F'
          AND l1.l_returnflag = 'R'
          AND EXISTS (
            SELECT 1 FROM lineitem l2
            WHERE l2.l_orderkey = l1.l_orderkey
              AND l2.l_suppkey <> l1.l_suppkey
          )
          AND NOT EXISTS (
            SELECT 1 FROM lineitem l3
            WHERE l3.l_orderkey = l1.l_orderkey
              AND l3.l_suppkey <> l1.l_suppkey
              AND l3.l_returnflag = 'R'
          )
        GROUP BY s.s_name
        ORDER BY numwait DESC, s.s_name
        LIMIT 100
    """,
)
def q_tpch21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 (suppliers who kept orders waiting).  No receipt/commit
    dates in the fixture: "failed to deliver" = l_returnflag 'R'.  Keeps
    the spec's signature EXISTS + NOT EXISTS pair — a multi-supplier order
    where THIS supplier is the only one whose line came back 'R'.  Both
    quantifiers decorrelate to semi/anti hash joins on l_orderkey (three
    scans of lineitem, all equi-joined — no nested loops)."""
    s = load_table(spark, sf_dir, "supplier")
    n = F.broadcast(
        load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_2")
    )
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    li = load_table(spark, sf_dir, "lineitem")
    l1 = (
        li.filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_suppkey")
        .join(o.select("o_orderkey"),
              F.col("o_orderkey") == F.col("l_orderkey"), "leftsemi")
    )
    l2 = li.select(F.col("l_orderkey").alias("ok2"), F.col("l_suppkey").alias("sk2"))
    l3 = (
        li.filter(F.col("l_returnflag") == "R")
        .select(F.col("l_orderkey").alias("ok3"), F.col("l_suppkey").alias("sk3"))
    )
    waited = (
        l1.join(
            l2,
            (F.col("ok2") == F.col("l_orderkey")) & (F.col("sk2") != F.col("l_suppkey")),
            "leftsemi",
        ).join(
            l3,
            (F.col("ok3") == F.col("l_orderkey")) & (F.col("sk3") != F.col("l_suppkey")),
            "leftanti",
        )
    )
    return (
        waited.join(s, s.s_suppkey == F.col("l_suppkey"))
        .join(n, n.n_nationkey == s.s_nationkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(100)
    )


@query(
    "q_tpch22",
    oracle=f"""
        WITH eligible AS (
          SELECT CAST(c_nationkey % 7 AS BIGINT) AS cntrycode,
                 c_custkey, c_acctbal
          FROM customer
          WHERE CAST(c_nationkey % 7 AS BIGINT) IN (0, 2, 4)
        )
        SELECT cntrycode,
               CAST(COUNT(*) AS BIGINT) AS numcust,
               {sql_dsum('c_acctbal', 'totacctbal')}
        FROM eligible e
        WHERE e.c_acctbal > (
            SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(28,6))) AS DOUBLE)
                     / COUNT(c_acctbal)
            FROM eligible WHERE c_acctbal > 0.0
          )
          AND NOT EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = e.c_custkey AND o.o_orderstatus = 'F'
          )
        GROUP BY cntrycode
    """,
)
def q_tpch22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 (global sales opportunity).  The fixture has no c_phone,
    so the country code is c_nationkey mod 7 (same selective-IN shape).
    Every fixture customer has at least one order, so the literal "no
    orders at all" anti-join is vacuous (the r3 driver row matched on the
    empty set) — the adapted predicate is "no FINISHED order"
    (o_orderstatus = 'F'), which keeps the NOT EXISTS anti hash join on
    o_custkey AND pushes a selective filter into the anti side, and yields
    17 rows at sf0.01 / 114 at sf0.1 so the join logic is actually tested.
    Three pieces, all canonical: scalar positive-balance average
    (1-row broadcast), NOT EXISTS orders (anti hash join on o_custkey),
    conditional aggregate by code.  acctbal is a 2-dp money column →
    decimal sums are exact on both engines."""
    cust = load_table(spark, sf_dir, "customer")
    eligible = cust.select(
        F.pmod(F.col("c_nationkey"), F.lit(7)).cast("bigint").alias("cntrycode"),
        "c_custkey",
        "c_acctbal",
    ).filter(F.col("cntrycode").isin(0, 2, 4))
    avg_bal = eligible.filter(F.col("c_acctbal") > 0.0).agg(
        (
            F.sum(F.col("c_acctbal").cast(DEC)).cast("double")
            / F.count("c_acctbal")
        ).alias("avg_bal")
    )
    o = load_table(spark, sf_dir, "orders")
    return (
        eligible.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(
            o.filter(F.col("o_orderstatus") == "F").select(
                F.col("o_custkey").alias("c_custkey")
            ),
            "c_custkey",
            "leftanti",
        )
        .groupBy("cntrycode")
        .agg(
            F.count("*").alias("numcust"),
            dsum("c_acctbal", "totacctbal"),
        )
    )
