"""Runtime Bloom-filter join pruning — Catalyst's ``InjectRuntimeFilter``.

The 100 TB pattern: a fact⋈dim join where the dim side carries a selective
filter but is too large to broadcast.  Without help, every fact row is
shuffled and only then discarded by the join.  Spark's runtime filtering
(`spark.sql.optimizer.runtime.bloomFilter.enabled`, default on) builds a
Bloom filter over the dim side's join keys at runtime and injects
``might_contain(bloom, xxhash64(key))`` into the fact-side SCAN, so
non-joining fact rows die before the shuffle — the declarative,
Catalyst-native version of a hand-built semi-join prefilter.

Spark gates the rule on size thresholds tuned for clusters (application
side ≥ 10 GB scan, creation side ≤ 10 MB) — correct defaults at 100 TB,
never met by local fixtures.  ``compile_with_confs`` compiles a
DataFrame's physical plan inside a temporary conf window (Spark caches the
compiled plan on the DataFrame, so later actions execute it) and restores
the session confs, keeping the demonstration from leaking conf changes
into other queries.  On a real cluster you set the confs globally — or
just rely on the defaults, which fire exactly in the regime where the
filter pays.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

# The regime runtime bloom filtering targets, expressed as confs:
#  * application side of any size (threshold 0 — locally the fixture scan
#    is far below the 10 GB production default);
#  * creation side up to 100 MB of selective dim keys;
#  * dim side NOT broadcastable (at 100 TB a multi-GB dim side exceeds any
#    sane broadcast threshold; locally we must say so explicitly).
BLOOM_DEMO_CONFS = {
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
    "spark.sql.autoBroadcastJoinThreshold": "-1",
}


def compile_with_confs(df: DataFrame, confs: dict[str, str]) -> DataFrame:
    """Force-compile ``df``'s physical plan with ``confs`` active, then
    restore the previous session confs.

    Spark's ``QueryExecution`` caches the compiled plan on the DataFrame,
    so actions run later (after the confs are restored) still execute the
    plan compiled here.  Returns the SAME DataFrame object.
    """
    spark = df.sparkSession
    saved = {k: spark.conf.get(k) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        df._jdf.queryExecution().executedPlan()  # compile + cache the plan
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)
    return df


def has_bloom_filter(df: DataFrame) -> bool:
    """True if the compiled physical plan contains an injected runtime
    Bloom filter (`might_contain`) — the evidence hook for plan tests."""
    return "might_contain" in df._jdf.queryExecution().executedPlan().toString()
