"""Scoped cache release: driver-path hygiene for operator persists.

Round-3 verdict: operator-internal MEMORY_AND_DISK persists accumulated
for the whole session on the driver/bench paths (release_caches() was
test-only). The registered LSH queries now run inside ``cache_scope`` +
eager localCheckpoint (operators/caching.scoped_materialize), so each
query releases its own caches before the driver's action — and ONLY its
own (a concurrent job's scope is isolated).
"""

from __future__ import annotations

from pyspark import StorageLevel

from kwage_spark.operators.caching import (cache_scope, persist_tracked,
                                           release_caches, tracked_count)

SF = "/root/testdata/sf0.001"


def _persistent_rdd_count(spark) -> int:
    return spark.sparkContext._jsc.getPersistentRDDs().size()


def test_lsh_queries_release_their_caches_back_to_back(spark):
    """3 LSH queries in one session: after each materializes, no tracked
    caches remain and the only persistent blocks added are the queries'
    own (tiny) localCheckpoint result RDDs — never the signature /
    bucketed-row corpus caches."""
    from kwage_spark import queries_pipeline  # noqa: F401 — registers
    from kwage_spark.queries import spark_queries
    cat = spark_queries()
    baseline = _persistent_rdd_count(spark)
    for name in ("minhash_lsh_near_dups", "simhash_near_dups",
                 "embedding_neardup_lsh"):
        df = cat[name](spark, SF)
        df.collect()
        assert tracked_count() == 0, f"{name} leaked tracked caches"
    grown = _persistent_rdd_count(spark) - baseline
    # one checkpointed RESULT rdd per query may linger until GC; the
    # corpus-sized operator caches (>=2 per LSH query) must be gone
    assert grown <= 3, f"{grown} persistent RDDs added by 3 scoped queries"


def test_cache_scope_releases_only_its_own(spark):
    df_outer = spark.range(100)
    persist_tracked(df_outer)
    try:
        with cache_scope():
            df_inner = spark.range(50)
            persist_tracked(df_inner)
            df_inner.count()
            assert tracked_count() == 2
        # scope exit released the inner cache only
        assert df_inner.storageLevel == StorageLevel.NONE
        assert df_outer.storageLevel != StorageLevel.NONE
        assert tracked_count() == 1
    finally:
        release_caches()
    assert df_outer.storageLevel == StorageLevel.NONE
    assert tracked_count() == 0


def test_nested_scopes_release_innermost_first(spark):
    with cache_scope():
        a = persist_tracked(spark.range(10))
        with cache_scope():
            b = persist_tracked(spark.range(20))
            b.count()
            assert tracked_count() == 2
        assert b.storageLevel == StorageLevel.NONE
        assert a.storageLevel != StorageLevel.NONE
        assert tracked_count() == 1
    assert a.storageLevel == StorageLevel.NONE
    assert tracked_count() == 0


def test_connected_components_releases_edge_cache(spark):
    """components no longer leaves its symmetrized-edge persist behind:
    the returned label table is checkpointed, the cache dies inside."""
    from kwage_spark.operators.components import connected_components
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "src long, dst long")
    before = _persistent_rdd_count(spark)
    comp = connected_components(edges)
    rows = {(r["v"], r["comp"]) for r in comp.collect()}
    assert rows == {(1, 1), (2, 1), (3, 1), (10, 10), (11, 10)}
    assert tracked_count() == 0
    # the sym persist is gone; only per-round checkpoint RDDs may linger
    # until GC, and those are label-table-sized, not edge-corpus-sized
    assert _persistent_rdd_count(spark) - before <= 4


def test_empty_inner_scope_exit_keeps_outer_scope_identity(spark):
    """Two empty scope lists compare EQUAL — exiting an empty inner scope
    must remove its own list by identity, not pop the outer one (a
    value-based remove would leak every cache registered in the outer
    scope after the inner exit)."""
    from kwage_spark.operators.caching import (cache_scope, persist_tracked,
                                               tracked_count)
    base = tracked_count()
    with cache_scope() as outer:
        with cache_scope():
            pass  # inner registers nothing: [] == [] with the outer list
        df = persist_tracked(spark.range(10))
        df.count()
        # the registration must land in the OUTER scope, still on the stack
        assert len(outer) == 1
        assert tracked_count() == base + 1
    # outer exit released it — nothing leaked to the session
    assert tracked_count() == base
    assert df.storageLevel.useMemory is False
