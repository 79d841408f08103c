"""Salted joins must be result-identical to plain joins (operators/skew.py),
and the salt must actually spread a hot key across salt values.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from bifrost_spark.operators.skew import salted_join, salted_join_hot_keys
from bifrost_spark.tables import load_table


def _key_counts(df, key):
    return {
        tuple(r)
        for r in df.groupBy(key).count().collect()
    }


def test_salted_join_equals_plain(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"
    )
    plain = li.join(o, "l_orderkey")
    salted = salted_join(li, o, "l_orderkey", num_salts=4)
    assert _key_counts(plain, "l_orderkey") == _key_counts(salted, "l_orderkey")
    assert plain.count() == salted.count()


def test_salted_join_hot_keys_equals_plain(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"
    )
    hot = [r[0] for r in li.groupBy("l_orderkey").count().orderBy(F.desc("count")).limit(5).collect()]
    plain = li.join(o, "l_orderkey")
    hybrid = salted_join_hot_keys(li, o, "l_orderkey", hot_keys=hot, num_salts=4)
    assert plain.count() == hybrid.count()
    assert _key_counts(plain, "l_orderkey") == _key_counts(hybrid, "l_orderkey")


def test_salt_spreads_hot_key(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity", "l_linenumber")
    salted = li.withColumn(
        "__salt", F.pmod(F.xxhash64("l_orderkey", "l_quantity", "l_linenumber"), F.lit(4)).cast("int")
    )
    # the busiest key must land on >1 salt value (it has >=4 line items)
    top = li.groupBy("l_orderkey").count().orderBy(F.desc("count")).first()
    n_salts = (
        salted.filter(F.col("l_orderkey") == top["l_orderkey"])
        .select("__salt")
        .distinct()
        .count()
    )
    assert n_salts > 1


def test_salted_join_rejects_outer_flavors(spark, sf_dir):
    """Outer salted joins would emit each unmatched small-side row once per
    salt replica; the operator refuses rather than mis-multiplying."""
    import pytest

    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    with pytest.raises(ValueError, match="inner.*left"):
        salted_join(li, o, "l_orderkey", how="full")
