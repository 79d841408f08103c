"""Unit gates for the shared token-gram builder (operators/dedup.py:
word_array + token_gram_hashes) — the one spelling behind q_dup_spans,
q_dup_span_ladder, and q_ngram_novelty (VERDICT r8 item 4)."""

from __future__ import annotations

from pyspark.sql import functions as F

from bifrost_spark.operators.dedup import token_gram_hashes, word_array


def _grams(spark, text, k):
    df = spark.createDataFrame([(text,)], "text string").select(
        word_array().alias("ws")
    )
    return df.select(F.explode(token_gram_hashes("ws", k)).alias("g")).select(
        "g.pos", "g.gh"
    ).collect()


def test_positions_are_one_based_and_dense(spark):
    rows = _grams(spark, "a b c d e", 3)
    assert [r["pos"] for r in rows] == [1, 2, 3]


def test_equal_grams_hash_equal_and_distinct_differ(spark):
    rows = _grams(spark, "x y z q x y z", 3)
    by_pos = {r["pos"]: r["gh"] for r in rows}
    # positions 1 and 5 both cover the gram (x, y, z)
    assert by_pos[1] == by_pos[5]
    others = {g for p, g in by_pos.items() if p not in (1, 5)}
    assert by_pos[1] not in others


def test_no_separator_ambiguity(spark):
    # ("ab","c") and ("a","bc") concatenate identically; tuple hashing
    # must keep them distinct
    g1 = _grams(spark, "ab c", 2)[0]["gh"]
    g2 = _grams(spark, "a bc", 2)[0]["gh"]
    assert g1 != g2


def test_short_documents_yield_empty(spark):
    assert _grams(spark, "only two", 3) == []
    assert _grams(spark, "", 1) == []


def test_word_array_filters_empty_tokens(spark):
    df = spark.createDataFrame([("  a   b  ",)], "text string")
    assert df.select(word_array().alias("ws")).collect()[0]["ws"] == ["a", "b"]
