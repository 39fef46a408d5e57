"""Cache-lifetime contract helpers.

The engine-wide rule (docs/SCALE.md): a query/operator may persist
intermediates its plan reads more than once, but NO cache may outlive
the call — callers must never inherit pinned tables they didn't create.
The portable way to honor both needs at once is to eagerly materialize
the final result with ``localCheckpoint`` (severing its lineage from
every internal cache — plain ``persist()+count()`` does NOT survive an
input ``unpersist()``, which invalidates dependent cache entries) and
then release the caches before returning.

``finalize`` packages that sequence. ``lazy_plans`` is the
plan-inspection escape hatch: inside the context, ``finalize`` returns
the result untouched (no materialization, caches left registered) so
``.explain`` shows the real computational shape; the inspecting test
clears the session cache afterwards.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import DataFrame

_LAZY_PLANS = False
_DEFER_STACK: list["DeferredFinalize"] = []


class DeferredFinalize:
    """Collector for :func:`deferred_finalize` — holds the caches
    inner :func:`finalize` calls would otherwise have released, so the
    composed pipeline pays ONE materialization at the outer boundary
    instead of one per stage."""

    def __init__(self) -> None:
        self._caches: list[DataFrame] = []
        self._closed = False

    def finalize(self, result: DataFrame) -> DataFrame:
        """The outer boundary: checkpoint ``result`` once (while every
        deferred stage cache is still live), release them all, and
        mark the deferral settled."""
        out = result.localCheckpoint(eager=True)
        self._release()
        return out

    def _release(self) -> None:
        for c in self._caches:
            c.unpersist()
        self._caches.clear()
        self._closed = True


@contextmanager
def deferred_finalize():
    """Caller-owned cache mode for COMPOSED pipelines (docs/SCALE.md
    §cache-lifetime): inside the context, every :func:`finalize` call
    becomes a deferral — the result passes through lazy (no per-stage
    ``localCheckpoint``) and its caches accumulate on the yielded
    collector instead of being released. The caller settles the
    composition with ``d.finalize(outer_result)``: one materialization,
    all stage caches released together.

    The cache-empty invariant survives either way: if the caller never
    settles (early return, exception), the context exit releases every
    deferred cache — downstream actions on unsettled lazy results then
    recompute against uncached inputs, which is the safe direction
    (correct, slower), never a leak.

    Nesting composes: the innermost active context collects.
    """
    d = DeferredFinalize()
    _DEFER_STACK.append(d)
    try:
        yield d
    finally:
        _DEFER_STACK.pop()
        if not d._closed:
            d._release()


@contextmanager
def lazy_plans():
    """Within this context, :func:`finalize` is a no-op passthrough —
    for plan-shape tests that need the un-truncated lazy plan. The
    caller owns cache cleanup (``spark.catalog.clearCache()``)."""
    global _LAZY_PLANS
    _LAZY_PLANS = True
    try:
        yield
    finally:
        _LAZY_PLANS = False


def round_checkpoint(df: DataFrame) -> DataFrame:
    """Materialize one round of an iterative loop (r11).

    Default: an eager ``localCheckpoint`` — the round is computed
    exactly once (as the old ``persist()+count()`` idiom did), but the
    next round plans against a FLAT scan that preserves the round's
    output partitioning, instead of an InMemoryRelation tree that
    nests one level per round and that Catalyst re-canonicalizes on
    every later round's planning (measured on the k-core loop at
    sf0.1: per-round cost grew 0.5 s → 2.7 s by round 3 and the final
    aggregate paid 2.2 s of pure planning; flat rounds stay ~0.4 s).
    Checkpoint blocks are RDD-level storage that is GC-cleaned when
    the round's DataFrame drops — nothing registers in the catalog
    CacheManager, so no cache outlives the call.

    Fault-tolerance trade (ADVICE r11): ``localCheckpoint`` severs
    lineage onto NON-REPLICATED executor-local blocks — on a cluster,
    losing an executor mid-query makes every downstream round of that
    query irrecoverable (a ``persist()`` round could recompute). That
    is the standard trade iterative Spark programs make; a distributed
    deployment that cannot accept it should use reliable
    ``checkpoint()`` against a checkpoint dir every few rounds instead
    (the operators' docstrings already prescribe periodic checkpoints
    at scale). The local-mode bench this repo drives has a single
    "executor", so the distinction is moot there.

    Under :func:`lazy_plans` the legacy ``persist()+count()`` shape is
    kept: plan-inspection tests read the per-round join tree out of
    the displayed InMemoryRelation, which a checkpoint's LogicalRDD
    would hide. In that mode the persisted rounds are the INSPECTING
    TEST's to release (``spark.catalog.clearCache()`` after) — loop
    operators do not track them, so don't drive full executions of
    materialize-mode loops under lazy_plans."""
    if _LAZY_PLANS:
        out = df.persist()
        out.count()
        return out
    return df.localCheckpoint(eager=True)


def finalize(result: DataFrame, *caches: DataFrame) -> DataFrame:
    """Eagerly ``localCheckpoint`` ``result`` (while every cache in
    ``caches`` is still live), then unpersist the caches. Returns the
    checkpointed DataFrame — checkpoint storage is RDD-level, invisible
    to the Spark catalog CacheManager, and dies with the DataFrame.

    Order matters and is fixed here: checkpoint FIRST, release after —
    unpersisting an input cache invalidates dependent CacheManager
    entries, so release-then-materialize would silently recompute the
    whole pipeline against uncached inputs.
    """
    if _LAZY_PLANS:
        return result
    if _DEFER_STACK:
        # composed-pipeline opt-out (deferred_finalize): keep the
        # stage caches live for the outer stages, skip the per-stage
        # materialization; the collector settles them at the boundary
        _DEFER_STACK[-1]._caches.extend(caches)
        return result
    out = result.localCheckpoint(eager=True)
    for c in caches:
        c.unpersist()
    return out
