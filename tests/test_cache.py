"""Cache-lifetime contract (docs/SCALE.md §cache-lifetime): finalize's
checkpoint-then-release default, and the deferred_finalize opt-out for
composed pipelines (r4 verdict ask #5) — one materialization at the
outer boundary instead of one per stage, with the cache-empty
invariant intact even on early exit.
"""

from __future__ import annotations

import pyspark.sql.classic.dataframe as _cdf
import pytest

from blockchain_data_engineering_spark.cache import (
    deferred_finalize,
    finalize,
)
from blockchain_data_engineering_spark.operators import graph as G


def _cache_empty(spark) -> bool:
    return spark._jsparkSession.sharedState().cacheManager().isEmpty()


@pytest.fixture()
def edges(spark):
    # two components: a triangle {1,2,3} and an edge {10,11}
    return spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (10, 11)], ["src", "dst"]
    )


@pytest.fixture()
def ckpt_counter(monkeypatch):
    """Counts DataFrame.localCheckpoint calls (the per-stage
    materializations deferred_finalize exists to elide)."""
    orig = _cdf.DataFrame.localCheckpoint
    calls = {"n": 0}

    def counting(self, *a, **k):
        calls["n"] += 1
        return orig(self, *a, **k)

    monkeypatch.setattr(_cdf.DataFrame, "localCheckpoint", counting)
    return calls


def test_finalize_default_checkpoints_per_call(spark, edges, ckpt_counter):
    cc = G.connected_components(edges, iterations=3)
    pr = G.pagerank(edges, iterations=2)
    assert ckpt_counter["n"] == 2  # one materialization per operator
    assert _cache_empty(spark)
    assert cc.count() > 0 and pr.count() > 0


def test_deferred_finalize_single_materialization(spark, edges, ckpt_counter):
    """Inside the context the stage operators stay LAZY (no per-stage
    checkpoint; their caches stay live for the outer stages); settling
    at the boundary pays exactly ONE materialization and releases
    every deferred cache."""
    with deferred_finalize() as d:
        cc = G.connected_components(edges, iterations=3)
        pr = G.pagerank(edges, iterations=2)
        assert ckpt_counter["n"] == 0  # both stages deferred
        assert not _cache_empty(spark)  # stage caches intentionally live
        out = d.finalize(cc.join(pr, "node"))
    assert ckpt_counter["n"] == 1  # the single boundary checkpoint
    assert _cache_empty(spark)  # sweep-green at the outer call
    got = {r["node"]: r["label"] for r in out.collect()}
    assert got[1] == got[2] == got[3] and got[10] == got[11]
    assert got[1] != got[10]


def test_deferred_finalize_releases_on_unsettled_exit(spark, edges):
    """Early exit without settling must still release every deferred
    cache — the invariant survives; unsettled lazy results recompute
    (safe direction), never leak."""
    with deferred_finalize():
        cc = G.connected_components(edges, iterations=2)
        assert not _cache_empty(spark)
    assert _cache_empty(spark)
    assert cc.count() > 0  # recomputes against uncached inputs


def test_deferred_finalize_matches_default_results(spark, edges):
    """The opt-out changes execution shape only, never values."""
    with deferred_finalize() as d:
        lazy = d.finalize(G.connected_components(edges, iterations=3))
    eager = G.connected_components(edges, iterations=3)
    assert sorted(map(tuple, lazy.collect())) == sorted(
        map(tuple, eager.collect())
    )
    assert _cache_empty(spark)


def test_deferred_finalize_nests(spark, edges, ckpt_counter):
    """The innermost active context collects; settling the inner one
    doesn't disturb the outer deferral."""
    with deferred_finalize() as outer:
        a = G.connected_components(edges, iterations=2)
        with deferred_finalize() as inner:
            b = G.pagerank(edges, iterations=2)
            b = inner.finalize(b)  # settles ONLY the inner caches
        assert ckpt_counter["n"] == 1
        out = outer.finalize(a.join(b, "node"))
    assert ckpt_counter["n"] == 2
    assert _cache_empty(spark)
    assert out.count() > 0


def test_finalize_outside_context_still_eager(spark, edges):
    df = spark.range(5).toDF("node").persist()
    out = finalize(df.selectExpr("node * 2 AS x"), df)
    assert _cache_empty(spark)
    assert out.count() == 5
