"""Hot-bucket guards for the LSH self-joins + operator cache hygiene.

A degenerate bucket (hundreds of boilerplate docs sharing a chunk value /
sign pattern) must not reintroduce the quadratic pair blow-up; the cap
bounds within-bucket candidates, logs the drop, and still finds planted
near-duplicates whose buckets are healthy.
"""

import logging

import pytest

from kwage_spark.operators.caching import release_caches, tracked_count
from kwage_spark.operators.dedup import (embedding_near_duplicates,
                                         minhash_lsh_pairs,
                                         simhash_near_duplicates)

BOILER = ("header license copyright notice same in every file "
          "generated do not edit the quick brown fox jumps") * 3


def _planted_docs(spark, n_boiler=300):
    rows = [(i, BOILER) for i in range(n_boiler)]
    # planted near-dup pair: identical distinctive text, ids far apart
    special = ("an entirely different document about distributed sketch "
               "engines and bloom filter containment search semantics")
    rows += [(9000, special), (9001, special)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_simhash_hot_bucket_capped_still_finds_planted(spark, caplog):
    docs = _planted_docs(spark)
    cap = 16
    with caplog.at_level(logging.WARNING, "kwage_spark.operators.dedup"):
        pairs = simhash_near_duplicates(docs, "doc_id", "text",
                                        max_hamming=3, max_bucket=cap,
                                        bucket_audit=True)
        rows = pairs.collect()
    release_caches()
    got = {(r["id_a"], r["id_b"]) for r in rows}
    assert (9000, 9001) in got
    # candidates bounded: within the hot bucket only the first `cap`
    # members can pair => <= cap*(cap-1)/2 boilerplate pairs (+ planted)
    boiler_pairs = [p for p in got if p != (9000, 9001)]
    assert 0 < len(boiler_pairs) <= cap * (cap - 1) // 2
    assert max(b for _a, b in boiler_pairs) < cap  # deterministic first-N
    assert any("capped" in r.message for r in caplog.records), \
        "hot-bucket drop was not logged"


def test_minhash_hot_bucket_capped_still_finds_planted(spark):
    docs = _planted_docs(spark, n_boiler=200)
    cap = 8
    pairs = minhash_lsh_pairs(docs, "doc_id", "text", k=5, num_perm=32,
                              bands=8, threshold=0.5, max_bucket=cap)
    rows = pairs.collect()
    release_caches()
    got = {(r["id_a"], r["id_b"]) for r in rows}
    assert (9000, 9001) in got
    boiler_pairs = [p for p in got if p != (9000, 9001)]
    assert 0 < len(boiler_pairs) <= cap * (cap - 1) // 2


def test_embedding_hot_bucket_capped_still_finds_planted(spark):
    dim = 8
    const = [1.0] + [0.0] * (dim - 1)          # 200 identical embeddings
    rows = [(i, const) for i in range(200)]
    v = [0.1, -0.9, 0.3, 0.2, -0.5, 0.4, -0.2, 0.6]
    v2 = [x + 0.01 for x in v]                  # planted near-dup pair
    rows += [(9000, v), (9001, v2)]
    emb = spark.createDataFrame(rows, f"vec_id long, embedding array<float>")
    cap = 8
    pairs = embedding_near_duplicates(emb, threshold=0.95, n_planes=6,
                                      max_bucket=cap)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    release_caches()
    assert (9000, 9001) in got
    boiler_pairs = [p for p in got if p != (9000, 9001)]
    assert 0 < len(boiler_pairs) <= cap * (cap - 1) // 2


def test_uncapped_path_unchanged(spark):
    """max_bucket=None preserves the pre-cap semantics exactly."""
    docs = _planted_docs(spark, n_boiler=30)
    capped = {(r["id_a"], r["id_b"])
              for r in simhash_near_duplicates(
                  docs, "doc_id", "text", max_bucket=None).collect()}
    # 30 identical docs => all 435 pairs + the planted one
    assert len(capped) == 30 * 29 // 2 + 1


def test_capped_construction_launches_no_audit_job(spark, monkeypatch):
    """With the audit flag off (the default on every registered query
    path), building an LSH operator's plan must not run the extra eager
    bucket-size aggregate — round-3 verdict: one collect job per capped
    call even when no bucket was hot. The dimension probe in the
    embedding op is the single allowed eager action."""
    import pyspark.sql.dataframe as dfmod

    calls = {"n": 0}
    orig = dfmod.DataFrame.collect

    def counting_collect(self):
        calls["n"] += 1
        return orig(self)

    monkeypatch.setattr(dfmod.DataFrame, "collect", counting_collect)
    docs = _planted_docs(spark, n_boiler=60)
    minhash_lsh_pairs(docs, "doc_id", "text", k=5, num_perm=16, bands=4,
                      threshold=0.5, max_bucket=8)
    simhash_near_duplicates(docs, "doc_id", "text", max_bucket=8)
    assert calls["n"] == 0, "plan construction ran eager collect jobs"
    emb = spark.createDataFrame(
        [(i, [float(i), 1.0, 0.0, 0.5]) for i in range(50)],
        "vec_id long, embedding array<float>")
    from kwage_spark.operators.dedup import embedding_near_duplicates
    embedding_near_duplicates(emb, max_bucket=8)
    # the dim probe (first()) may or may not route through collect()
    # depending on the Spark version; the audit aggregate always would
    assert calls["n"] <= 1, "audit aggregate ran despite audit=False"
    release_caches()


def test_release_caches_empties_persistent_rdds(spark):
    """Operator-internal persists must be releasable: after
    release_caches() no cached RDDs remain in the session."""
    from kwage_spark.operators.binpack import chunked_ids
    # baseline: other tests' localCheckpoint RDDs may linger until GC —
    # assert this test's ops add nothing beyond it
    baseline = spark.sparkContext._jsc.getPersistentRDDs().size()
    docs = _planted_docs(spark, n_boiler=50)
    minhash_lsh_pairs(docs, "doc_id", "text", k=5, num_perm=16,
                      bands=4, threshold=0.5, max_bucket=8).count()
    chunked_ids(docs, "doc_id", chunk_size=16).count()
    assert tracked_count() >= 2
    release_caches()
    n_cached = spark.sparkContext._jsc.getPersistentRDDs().size()
    assert n_cached <= baseline, \
        f"{n_cached - baseline} cached RDDs leaked beyond baseline"
    assert tracked_count() == 0
