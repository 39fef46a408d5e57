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
    out = result.localCheckpoint(eager=True)
    for c in caches:
        c.unpersist()
    return out
