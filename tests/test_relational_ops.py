"""Operator-level tests: skew salting equivalence, net-flow edge cases,
as-of join semantics at the boundaries."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from blockchain_data_engineering_spark.operators import relational as R


def test_salted_join_equals_plain_join(spark):
    """The skew recipe — salt the fact side, explode the dim side across
    all salt buckets, join on (key, salt) — must produce exactly the
    plain join's rows."""
    buckets = 8
    fact = spark.range(0, 2000).select(
        (F.col("id") % 3).alias("k"), F.col("id").alias("v")
    )  # key 0/1/2, deliberately skewed small key space
    dim = spark.createDataFrame(
        [(0, "a"), (1, "b"), (2, "c")], "k LONG, label STRING"
    )

    plain = fact.join(dim, "k").select("k", "v", "label")

    salted_fact = R.salted(fact, "k", buckets)
    dim_exploded = dim.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(buckets)]))
    )
    via_salt = salted_fact.join(dim_exploded, ["k", "__salt"]).select(
        "k", "v", "label"
    )

    assert sorted(plain.collect()) == sorted(via_salt.collect())
    # and the salt really spreads the hot keys
    n_partitions_used = (
        salted_fact.groupBy("k", "__salt").count().count()
    )
    assert n_partitions_used > 3  # more granular than the raw key space


def test_net_flow_drops_zero_and_handles_one_sided(spark):
    inflow = spark.createDataFrame(
        [("a", 10), ("b", 5)], "k STRING, in_v LONG"
    )
    outflow = spark.createDataFrame(
        [("a", 10), ("c", 7)], "k STRING, out_v LONG"
    )
    out = R.net_flow(
        inflow, outflow, ["k"], in_value="in_v", out_value="out_v", diff_col="d"
    )
    got = {r.k: (r.in_v, r.out_v, r.d) for r in out.collect()}
    # a: 10 in, 10 out → diff 0 → dropped (the change-output case)
    assert got == {"b": (5, 0, -5), "c": (0, 7, 7)}


def test_asof_join_boundary_semantics(spark):
    """Backward as-of: matches the greatest right_ts <= left_ts
    (inclusive); left rows before any right row get null."""
    left = spark.createDataFrame(
        [(1, "u", 100), (2, "u", 200), (3, "u", 50)],
        "event_id LONG, k STRING, t LONG",
    )
    right = spark.createDataFrame(
        [("u", 100, 1.0), ("u", 150, 2.0)], "k STRING, t LONG, p DOUBLE"
    )
    out = R.asof_join_backward(left, right, ["k"], "t", "t", ["p"])
    got = {r.event_id: r.p_asof for r in out.collect()}
    assert got == {1: 1.0, 2: 2.0, 3: None}  # inclusive @100; none before 50
