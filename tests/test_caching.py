"""Direct unit tests for caching.release_with (round 6).

The helper ties a persisted intermediate's lifetime to the RESULT
DataFrame's Python handle (weakref.finalize -> unpersist). The plan-sweep
regression test covers the downstream symptom (no InMemoryRelation
leaking into later plans); this file asserts the mechanism itself:
the CacheManager entry disappears exactly when the result handle dies,
and the result stays executable (lineage intact) afterwards.
"""

from __future__ import annotations

import gc

from backup_repo_spark.caching import release_with


def _cache_manager_empty(spark) -> bool:
    return spark._jsparkSession.sharedState().cacheManager().isEmpty()


def test_release_with_unpersists_when_result_dropped(spark):
    spark.catalog.clearCache()
    cached = spark.range(1000).selectExpr("id", "id * 2 AS v").persist()
    cached.count()
    assert not _cache_manager_empty(spark)

    result = release_with(cached.groupBy().sum("v"), cached)
    [row] = result.collect()
    assert row[0] == 999000

    del result
    gc.collect()
    assert _cache_manager_empty(spark), (
        "release_with must unpersist the cached intermediate once the "
        "result handle is garbage-collected"
    )


def test_release_with_result_still_executable_after_release(spark):
    """Dropping the handle only evaporates the CACHE — a re-built plan
    over the same (now-uncached) input recomputes from lineage."""
    spark.catalog.clearCache()
    cached = spark.range(100).persist()
    first = release_with(cached.groupBy().count(), cached)
    assert first.collect()[0][0] == 100
    del first
    gc.collect()
    assert _cache_manager_empty(spark)
    # the intermediate is uncached but fully recomputable
    assert cached.count() == 100


def test_release_with_returns_result_for_chaining(spark):
    spark.catalog.clearCache()
    cached = spark.range(10).persist()
    out = release_with(cached.select("id"), cached)
    assert out.count() == 10
    del out
    gc.collect()
    assert _cache_manager_empty(spark)
