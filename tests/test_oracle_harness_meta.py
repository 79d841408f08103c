"""Negative controls for the oracle-comparison harness itself: compare()
is the property every correctness claim in this repo reduces to, so prove
it FAILS on each class of wrong answer (a silently-vacuous comparator
would green-light everything).  Each mutation below models a real defect
class the engine has actually had to guard against."""

from __future__ import annotations

import pandas as pd

from oracle_harness import compare


def _spark(spark, pdf: pd.DataFrame):
    return spark.createDataFrame(pdf)


BASE = pd.DataFrame(
    {
        "k": [1, 2, 3],
        "name": ["a", "b", "c"],
        "x": [1.5, -2.25, 0.0],
    }
)


def test_identical_frames_pass(spark):
    assert compare(_spark(spark, BASE), BASE.copy()) == []


def test_row_order_is_insensitive(spark):
    shuffled = BASE.iloc[[2, 0, 1]].reset_index(drop=True)
    assert compare(_spark(spark, BASE), shuffled) == []


def test_column_order_is_insensitive(spark):
    assert compare(_spark(spark, BASE), BASE[["x", "k", "name"]]) == []


def test_dropped_row_fails(spark):
    assert compare(_spark(spark, BASE), BASE.iloc[:2])


def test_changed_int_fails(spark):
    mut = BASE.copy()
    mut.loc[1, "k"] = 99
    assert compare(_spark(spark, BASE), mut)


def test_changed_float_last_place_fails(spark):
    mut = BASE.copy()
    mut.loc[0, "x"] = 1.5 + 1e-15  # repr-level difference must be caught
    assert compare(_spark(spark, BASE), mut)


def test_negative_zero_fails(spark):
    # the q_entropy class: -0.0 and +0.0 are DIFFERENT answers here —
    # queries must canonicalize, the comparator must not paper over it
    mut = BASE.copy()
    mut.loc[2, "x"] = -0.0
    assert compare(_spark(spark, BASE), mut)


def test_null_vs_value_fails(spark):
    mut = BASE.copy()
    mut.loc[1, "name"] = None
    assert compare(_spark(spark, BASE), mut)


def test_cross_row_value_swap_fails(spark):
    # per-column multisets unchanged, row association broken — the subtle
    # wrong-join class an order-insensitive compare could miss if it
    # sorted columns independently
    mut = BASE.copy()
    mut.loc[0, "x"], mut.loc[1, "x"] = (
        BASE.loc[1, "x"],
        BASE.loc[0, "x"],
    )
    assert compare(_spark(spark, BASE), mut)


def test_renamed_column_fails(spark):
    assert compare(_spark(spark, BASE), BASE.rename(columns={"x": "y"}))


def test_extra_duplicate_row_fails(spark):
    mut = pd.concat([BASE, BASE.iloc[[0]]]).reset_index(drop=True)
    assert compare(_spark(spark, BASE), mut)
