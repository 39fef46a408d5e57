"""Weighted priority sampling (operators/sampling.py): exhaustive
exactness, the DLT subset-sum estimator, determinism, and plan shape.
Engine-vs-DuckDB parity is covered by test_oracle_parity
(sample_weighted_priority)."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from pyspark.sql import functions as F

from blockchain_data_engineering_spark.operators.sampling import (
    weighted_priority_sample,
)


def _pop(spark, n, groups=1):
    # deterministic skewed weights: a few heavy rows, many light ones
    return spark.range(0, n).select(
        (F.col("id") % groups).alias("g"),
        F.col("id").alias("rid"),
        F.when(F.col("id") % 17 == 0, F.col("id") % 900 + 500)
        .otherwise(F.col("id") % 9 + 1)
        .alias("w"),
    )


def test_exhaustive_when_population_fits(spark):
    """n ≤ k: every row is sampled and est_weight == w exactly (τ is
    NULL — the sample IS the population, zero estimation error)."""
    pop = _pop(spark, 40)
    out = weighted_priority_sample(pop, "w", ["rid"], k=64).collect()
    assert len(out) == 40
    assert all(r["est_weight"] == float(r["w"]) for r in out)


def test_subset_sum_estimator(spark):
    """The DLT contract on a real draw: Σ est_weight over the sample
    estimates the population's Σ w. The md5 draw is deterministic, so
    this pins the REALIZED error of this data/k — well inside the
    ~1/√(k−1) envelope (k=256 → ~6%); also every est_weight ≥ its w
    (est = max(w, τ)) and rows with w > τ carry exactly w."""
    pop = _pop(spark, 20_000)
    k = 256
    out = weighted_priority_sample(pop, "w", ["rid"], k=k).collect()
    assert len(out) == k
    total_true = pop.agg(F.sum("w")).collect()[0][0]
    total_est = sum(r["est_weight"] for r in out)
    assert abs(total_est - total_true) / total_true < 0.15, (
        total_est,
        total_true,
    )
    taus = {r["est_weight"] for r in out if r["est_weight"] != float(r["w"])}
    assert len(taus) <= 1  # every non-exact estimate IS τ
    assert all(r["est_weight"] >= float(r["w"]) for r in out)


def test_keyed_groups_and_determinism(spark):
    """Per-group samples are independent (each group gets ≤ k rows and
    its own τ), and a repartitioned input yields the identical sample
    — the no-RNG contract."""
    pop = _pop(spark, 6_000, groups=3)
    k = 32
    rows = lambda df: sorted(  # noqa: E731
        (r["g"], r["rid"], r["w"], r["est_weight"]) for r in df.collect()
    )
    a = rows(weighted_priority_sample(pop, "w", ["rid"], k, keys=["g"]))
    b = rows(
        weighted_priority_sample(
            pop.repartition(13, "rid"), "w", ["rid"], k, keys=["g"]
        )
    )
    assert a == b
    per_g = {}
    for g, *_ in a:
        per_g[g] = per_g.get(g, 0) + 1
    assert per_g == {0: k, 1: k, 2: k}


def test_nonpositive_and_null_weights_excluded(spark):
    pop = spark.createDataFrame(
        [(1, 5), (2, 0), (3, -4), (4, None), (5, 2)],
        "rid long, w long",
    )
    out = weighted_priority_sample(pop, "w", ["rid"], k=10).collect()
    assert sorted(r["rid"] for r in out) == [1, 5]


def test_state_merge_is_exact(spark):
    """merge(state(A), state(B)) ≡ state(A ∪ B) bit-identically (the
    priorities are per-row deterministic doubles), and estimating from
    the merged state equals the single-pass sample over the union —
    the rollup path for per-shard / per-day samples."""
    from blockchain_data_engineering_spark.operators.sampling import (
        weighted_priority_estimate,
        weighted_priority_merge,
        weighted_priority_state,
    )

    pop = _pop(spark, 8_000, groups=2)
    a = pop.where(F.col("rid") % 2 == 0)
    b = pop.where(F.col("rid") % 2 == 1)
    k, keys, pcols = 48, ["g"], ["rid"]
    merged = weighted_priority_merge(
        weighted_priority_state(a, "w", pcols, k, keys),
        weighted_priority_state(b, "w", pcols, k, keys),
        k,
        keys,
        pcols,
    )
    direct = weighted_priority_state(pop, "w", pcols, k, keys)
    unpack = lambda d: sorted(map(tuple, d.collect()))  # noqa: E731
    assert unpack(merged) == unpack(direct)

    est_m = weighted_priority_estimate(merged, "w", k, keys, pcols)
    est_d = weighted_priority_sample(pop, "w", pcols, k, keys=keys)
    assert unpack(est_m) == unpack(est_d)


def test_keyed_plan_window_group_limit(spark):
    """The keyed top-(k+1) must push a partial WindowGroupLimit below
    the exchange, and the τ table joins back as a broadcast."""
    pop = _pop(spark, 1000, groups=2)
    df = weighted_priority_sample(pop, "w", ["rid"], 64, keys=["g"])
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert plan.count("WindowGroupLimit") >= 2, plan
    assert "BroadcastHashJoin" in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
