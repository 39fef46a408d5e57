"""Unit tests for operators.linkage (blocking + fuzzy match) and
operators.relational.scd2_history (SCD Type 2 versioning)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from blockchain_data_engineering_spark.operators import linkage as L
from blockchain_data_engineering_spark.operators.relational import scd2_history


def _first_tok(df):
    return F.element_at(F.split(F.col("name"), " "), 1)


def _last_tok(df):
    return F.element_at(F.split(F.col("name"), " "), -1)


def test_fuzzy_pairs_matches_brute_force(spark):
    # Names corrupted in either the first or the last token — each is
    # still caught by the OTHER blocking pass.
    names = [
        "acme steel works",
        "acme steel workz",       # last-token typo, blocks on "acme"
        "acmee steel works",      # first-token typo, blocks on "works"
        "globex corp",
        "globex corps",
        "initech llc",
        "completely different",
    ]
    df = spark.createDataFrame([(n,) for n in names], ["name"])
    got = {
        (r.name_a, r.name_b, r.edit_dist)
        for r in L.fuzzy_pairs(
            df, "name", [_first_tok, _last_tok], max_distance=2
        ).collect()
    }

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(
                    dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb)
                )
        return dp[len(b)]

    # Brute-force ground truth restricted to pairs sharing a blocking
    # key (blocking is the candidate-generation contract, not recall=1).
    expect = set()
    for a in names:
        for b in names:
            if a >= b:
                continue
            ka, kb = a.split(" "), b.split(" ")
            if ka[0] != kb[0] and ka[-1] != kb[-1]:
                continue
            d = lev(a, b)
            if d <= 2:
                expect.add((a, b, d))
    assert got == expect
    assert ("acme steel works", "acme steel workz", 1) in got
    assert ("acme steel works", "acmee steel works", 1) in got


def test_blocked_candidates_max_block_size_guard(spark):
    # 5 rows share key "x" (block of 5 > cap 3 → dropped); 2 share "y".
    rows = [(i, "x") for i in range(5)] + [(10, "y"), (11, "y")]
    df = spark.createDataFrame(rows, ["id", "name"])
    key = lambda d: F.col("name")  # noqa: E731
    capped = L.blocked_candidates(df, "id", [key], max_block_size=3).collect()
    assert {(r.id_a, r.id_b) for r in capped} == {(10, 11)}
    uncapped = L.blocked_candidates(df, "id", [key]).count()
    assert uncapped == 10 + 1  # C(5,2) + C(2,2)


def test_blocked_candidates_null_key_never_blocks(spark):
    df = spark.createDataFrame([(1, None), (2, None), (3, "k")], ["id", "k"])
    out = L.blocked_candidates(df, "id", [lambda d: F.col("k")]).collect()
    assert out == []


def test_best_match_argmin_deterministic(spark):
    pairs = spark.createDataFrame(
        [
            ("a", "b", 2),
            ("a", "c", 1),
            ("a", "d", 1),  # tie with c → c wins (lexicographic)
            ("x", "y", 3),
        ],
        ["name_a", "name_b", "edit_dist"],
    )
    got = {
        (r.name_a, r.name_b) for r in L.best_match(pairs).collect()
    }
    assert got == {("a", "c"), ("x", "y")}


def test_scd2_collapses_runs_and_chains_intervals(spark):
    rows = [
        # key, attr, ts, tiebreak
        (1, "LOW", 10, 1),
        (1, "LOW", 20, 2),    # re-statement → NOT a new version
        (1, "HIGH", 30, 3),
        (1, "LOW", 40, 4),    # back to LOW → new version (run, not set)
        (2, "MED", 5, 5),
    ]
    df = spark.createDataFrame(rows, ["k", "attr", "ts", "ok"])
    out = {
        (r.k, r.attr, r.valid_from, r.valid_to, r.is_current)
        for r in scd2_history(
            df, ["k"], ["attr"], "ts", tiebreak_cols=["ok"]
        ).collect()
    }
    assert out == {
        (1, "LOW", 10, 30, False),
        (1, "HIGH", 30, 40, False),
        (1, "LOW", 40, None, True),
        (2, "MED", 5, None, True),
    }


def test_scd2_null_attr_transitions(spark):
    rows = [
        (1, None, 10),
        (1, None, 20),   # NULL → NULL: not a change
        (1, "A", 30),    # NULL → 'A': a change
        (1, None, 40),   # 'A' → NULL: a change
    ]
    df = spark.createDataFrame(rows, ["k", "attr", "ts"])
    out = sorted(
        (r.valid_from, r.attr, r.valid_to)
        for r in scd2_history(df, ["k"], ["attr"], "ts").collect()
    )
    assert out == [(10, None, 30), (30, "A", 40), (40, None, None)]


def test_scd2_timestamp_tie_broken_by_tiebreak_col(spark):
    # Same ts, different tiebreak: deterministic version order.
    rows = [(1, "B", 10, 2), (1, "A", 10, 1)]
    df = spark.createDataFrame(rows, ["k", "attr", "ts", "ok"])
    out = scd2_history(df, ["k"], ["attr"], "ts", tiebreak_cols=["ok"]).collect()
    by_attr = {r.attr: r for r in out}
    assert by_attr["A"].valid_to == 10 and not by_attr["A"].is_current
    assert by_attr["B"].is_current


def test_scd2_single_exchange_plan(spark):
    """Both window passes share the key partitioning — the physical
    plan must contain exactly ONE shuffle (Exchange) for the history."""
    df = spark.createDataFrame([(1, "A", 10)], ["k", "attr", "ts"])
    plan = scd2_history(df, ["k"], ["attr"], "ts")._jdf.queryExecution().executedPlan().toString()
    n_exchange = plan.count("Exchange hashpartitioning")
    assert n_exchange == 1, plan


def test_fuzzy_pairs_plan_has_no_cartesian(spark):
    df = spark.createDataFrame([("a b",), ("a c",)], ["name"])
    plan = (
        L.fuzzy_pairs(df, "name", [_first_tok], max_distance=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
