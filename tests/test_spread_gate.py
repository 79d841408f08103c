"""The r12 partition-count gate on the keyed spread (VERDICT r11 item 2).

At fixture scale a table is ONE input split, so ``spread`` must still add
its pinned keyed Exchange (the r11 single-split fix).  But on an input that
already carries >= defaultParallelism partitions — the 100 TB posture,
where the scan alone yields ~800k splits — the spread must be a NO-OP:
an unconditional repartition there would shuffle the full payload once for
nothing and cap the stage at defaultParallelism partitions.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from bifrost_spark.operators.partitioning import spread


def _n_exchanges(df) -> int:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.count("Exchange")


def test_spread_fires_on_single_split(spark, sf_dir):
    from bifrost_spark.tables import load_table

    d = load_table(spark, sf_dir, "documents")
    assert d.rdd.getNumPartitions() < spark.sparkContext.defaultParallelism
    s = spread(d, "doc_id")
    assert s.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
    # (AQE's plan string mentions the exchange once per wrapping node, so
    # compare against the ungated frame, not an absolute count)
    assert _n_exchanges(s) > _n_exchanges(d)


def test_spread_noop_on_prepartitioned_frame(spark):
    n = spark.sparkContext.defaultParallelism
    wide = spark.range(0, 10_000, 1, n + 4).select(
        F.col("id").alias("doc_id"), F.lit("x").alias("text")
    )
    assert wide.rdd.getNumPartitions() >= n
    s = spread(wide, "doc_id")
    # identical plan — no Exchange added, partitioning untouched
    assert s is wide
    assert _n_exchanges(s) == _n_exchanges(wide)


def test_spread_result_rows_unchanged(spark):
    df = spark.range(0, 100, 1, 1).select(F.col("id").alias("k"))
    out = spread(df, "k")
    assert sorted(r.k for r in out.collect()) == list(range(100))
