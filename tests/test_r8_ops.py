"""Round-8 eval operators: average precision (PR-curve scalar) and
NDCG@k (graded ranking) — hand-computed known values, the quantization
algebra, and edge conventions. Heavy hitters live in
test_heavy_hitters.py; DuckDB parity in test_oracle_parity."""

from __future__ import annotations

from pyspark.sql import functions as F

from blockchain_data_engineering_spark.operators.ml_eval import (
    _AP_SCALE,
    _NDCG_RATIO_SCALE,
    average_precision,
    ndcg_at_k,
    ndcg_discounts,
)


def test_average_precision_known_values(spark):
    """sklearn's step-wise AP on labels (+,−,+,+) at scores (4,3,2,1):
    AP = (1 + 2/3 + 3/4)/3 = 29/36; the quantized numerator is
    S + ⌊2S/3⌋ + ⌊3S/4⌋ with S = 10^9, and the float is within the
    documented ⌊⌋ error of 29/36."""
    rows = [(4, True), (3, False), (2, True), (1, True)]
    df = spark.createDataFrame(rows, "s long, y boolean")
    [r] = average_precision(df, F.col("y"), F.col("s")).collect()
    s = _AP_SCALE
    assert r["n_pos"] == 3 and r["n_thresholds"] == 4
    assert int(r["ap_num"]) == s + (2 * s) // 3 + (3 * s) // 4
    assert r["ap"] == int(r["ap_num"]) / (3 * s)
    assert abs(r["ap"] - 29 / 36) < 4 / s


def test_average_precision_groups_and_edges(spark):
    """Per-key groups are independent; a group with no positives gets
    ap NULL (0-numerator, never NaN); NULL label/score rows are
    excluded (module convention); perfect ranking gives ap == 1.0
    exactly (every term hits its floor exactly)."""
    rows = [
        # g: positives ranked first → perfect AP
        ("g", 9, True), ("g", 8, True), ("g", 2, False),
        # h: no positives
        ("h", 5, False), ("h", 4, False),
        # excluded rows
        ("g", None, True), ("g", 1, None),
    ]
    df = spark.createDataFrame(rows, "k string, s long, y boolean")
    got = {
        r["k"]: r
        for r in average_precision(
            df, F.col("y"), F.col("s"), keys=["k"]
        ).collect()
    }
    assert got["g"]["ap"] == 1.0
    assert got["g"]["n_thresholds"] == 3  # NULLs contributed nothing
    assert got["h"]["n_pos"] == 0 and got["h"]["ap"] is None
    assert int(got["h"]["ap_num"]) == 0


def test_ndcg_known_values(spark):
    """Hand-computed 3-query corpus at k=3 with graded truth:
    q1 ranks the rel-2 item above the rel-3 one (imperfect), q2 is
    perfect (ratio exactly 10^9), q3 misses its only relevant item
    (ratio 0). The corpus numerator must equal the same integer
    algebra computed in Python from the literal discount table."""
    k = 3
    d = ndcg_discounts(k)
    results = spark.createDataFrame(
        [
            ("q1", "b", 1), ("q1", "a", 2), ("q1", "x", 3),
            ("q2", "d", 1),
            ("q3", "m", 1), ("q3", "n", 2),
        ],
        "qid string, item string, rank long",
    )
    truth = spark.createDataFrame(
        [
            ("q1", "a", 3), ("q1", "b", 2), ("q1", "c", 1),
            ("q2", "d", 1),
            ("q3", "e", 2),
        ],
        "qid string, item string, rel long",
    )
    [r] = ndcg_at_k(results, truth, k=k).collect()
    s = _NDCG_RATIO_SCALE
    q1 = (2 * d[0] + 3 * d[1]) * s // (3 * d[0] + 2 * d[1] + 1 * d[2])
    expected_num = q1 + s + 0
    assert r["n_queries"] == 3
    assert int(r["ndcg_num"]) == expected_num
    assert r["ndcg"] == expected_num / (3 * s)
    assert 0.0 < r["ndcg"] < 1.0


def test_ndcg_edges(spark):
    """Empty truth → n_queries 0 and NULL ndcg (never NaN); items in
    truth but absent from results only lower DCG (no error); rel ≤ 0
    or NULL truth rows are excluded; k must validate."""
    import pytest

    results = spark.createDataFrame(
        [("q1", "a", 1)], "qid string, item string, rank long"
    )
    truth = spark.createDataFrame(
        [("q1", "a", 1), ("q1", "b", 0), ("q1", "c", None)],
        "qid string, item string, rel long",
    )
    [r] = ndcg_at_k(results, truth, k=3).collect()
    # only the rel=1 row graded → perfect ranking
    assert r["n_queries"] == 1 and r["ndcg"] == 1.0

    [e] = ndcg_at_k(results, truth.where(F.lit(False)), k=3).collect()
    assert e["n_queries"] == 0 and int(e["ndcg_num"]) == 0
    assert e["ndcg"] is None

    with pytest.raises(ValueError):
        ndcg_at_k(results, truth, k=0)


def test_ndcg_ideal_beats_every_permutation(spark):
    """dcg ≤ idcg for any placement of graded items (the ratio's ≤ 1
    contract that keeps the quantized quotient inside 10^9): permute a
    4-item graded set through several orderings and check ndcg ≤ 1."""
    import itertools

    truth = spark.createDataFrame(
        [("q", "a", 4), ("q", "b", 3), ("q", "c", 2), ("q", "d", 1)],
        "qid string, item string, rel long",
    )
    for perm in itertools.permutations("abcd"):
        results = spark.createDataFrame(
            [("q", it, i + 1) for i, it in enumerate(perm)],
            "qid string, item string, rank long",
        )
        [r] = ndcg_at_k(results, truth, k=4).collect()
        assert 0.0 < r["ndcg"] <= 1.0, perm
