"""KMV bottom-k distinct sketch: estimator accuracy, byte-identical
merge under any partitioning, set-operation estimates, serialization,
and the per-group operator vs exact distinct counts."""

from __future__ import annotations

import numpy as np
import pytest

from kwage_spark.kernels.kmv import KMVState, hash_items


def _items(prefix: str, n: int) -> list[bytes]:
    return [f"{prefix}{i}".encode() for i in range(n)]


def test_kmv_exact_below_capacity():
    st = KMVState(64).add_hashes(hash_items(_items("x", 40)))
    assert st.distinct_estimate() == 40.0
    # adding duplicates changes nothing (set semantics)
    st2 = KMVState(64).add_hashes(hash_items(_items("x", 40) * 3))
    assert st == st2


def test_kmv_estimate_accuracy_and_merge_invariance():
    items = _items("tok", 50_000)
    k = 256
    direct = KMVState(k).add_hashes(hash_items(items))
    est = direct.distinct_estimate()
    assert abs(est - 50_000) / 50_000 < 5 / np.sqrt(k)  # ~0.31 worst case
    assert abs(est - 50_000) / 50_000 < 0.12            # actual, fixed data
    # ANY split/merge order gives the byte-identical state
    for n_splits in (3, 8, 17):
        merged = KMVState(k)
        for part in np.array_split(np.arange(len(items)), n_splits):
            merged.merge(KMVState(k).add_hashes(
                hash_items([items[i] for i in part])))
        assert merged == direct
        assert merged.to_bytes() == direct.to_bytes()


def test_kmv_jaccard_and_intersection():
    k = 512
    a_items = _items("s", 30_000)                     # A = 0..30k
    b_items = _items("s", 45_000)[15_000:]            # B = 15k..45k
    a = KMVState(k).add_hashes(hash_items(a_items))
    b = KMVState(k).add_hashes(hash_items(b_items))
    true_j = 15_000 / 45_000
    est_j = KMVState.jaccard(a, b)
    assert abs(est_j - true_j) < 0.08
    est_inter = KMVState.intersection_estimate(a, b)
    assert abs(est_inter - 15_000) / 15_000 < 0.25
    # disjoint sets -> 0
    c = KMVState(k).add_hashes(hash_items(_items("zzz", 1000)))
    assert KMVState.jaccard(a, c) == 0.0


def test_kmv_serialization_roundtrip_and_crc():
    st = KMVState(64).add_hashes(hash_items(_items("q", 500)))
    blob = st.to_bytes()
    assert KMVState.from_bytes(blob) == st
    bad = blob[:20] + bytes([blob[20] ^ 0xFF]) + blob[21:]
    with pytest.raises(ValueError, match="crc32|magic"):
        KMVState.from_bytes(bad)


def test_kmv_ingest_kind_and_combine_parity(spark):
    """KMV as a first-class kinds= option in build_sketches: per-group
    distinct-k-gram estimates within bound of the exact count, and the
    partial vs raw combine paths produce BYTE-IDENTICAL states (KMV is a
    pure set function — byte-stable under any partitioning, like
    bloom/hll/cms)."""
    from pyspark.sql import functions as F

    from kwage_spark import functions as fx
    from kwage_spark.config import SketchConfig
    from kwage_spark.kernels.bloom import BloomParams
    from kwage_spark.operators.ingest import build_sketches
    from kwage_spark.queries import shingle_rel

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    cfg = SketchConfig(group_cols=("source", "lang"), content_col="text",
                       kinds=("kmv",), kmv_k=512,
                       bloom=BloomParams(k=8, log2_m=12, num_hash=2))
    sk = build_sketches(docs, cfg)
    got = {(r["source"], r["lang"]): r["est"] for r in
           sk.select("source", "lang",
                     fx.kmv_estimate("state").alias("est")).collect()}
    exact = {(r["source"], r["lang"]): r["n"] for r in
             (shingle_rel(docs, ["source", "lang"], "text", 8)
              .groupBy("source", "lang")
              .agg(F.countDistinct("gram").alias("n"))).collect()}
    assert set(got) == set(exact)
    for key, est in got.items():
        assert abs(est - exact[key]) / exact[key] < 0.2, (key, est, exact[key])

    def blobs(df):
        return sorted((r["source"], r["lang"], bytes(r["state"]))
                      for r in df.collect())
    partial = build_sketches(docs, cfg, combine="partial")
    raw = build_sketches(docs, cfg, combine="raw")
    assert blobs(partial) == blobs(raw)


def test_kmv_operator_matches_exact_distinct(spark):
    from pyspark.sql import functions as F

    from kwage_spark.operators.text import (kmv_group_overlap,
                                            kmv_token_sketches)
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    sk = kmv_token_sketches(docs, "text", "lang", k=256)
    got = {r["lang"]: r["est_distinct"] for r in sk.collect()}
    exact = {r["lang"]: r["n"] for r in
             (docs.select("lang", F.explode(F.split("text", r"\s+"))
                          .alias("tok"))
              .filter(F.length("tok") > 0)
              .groupBy("lang").agg(F.countDistinct("tok").alias("n"))
              ).collect()}
    assert set(got) == set(exact)
    for lang, est in got.items():
        assert abs(est - exact[lang]) / exact[lang] < 0.15, \
            (lang, est, exact[lang])
    # overlap: the synthetic langs share most vocabulary — estimates in
    # (0, 1], symmetric pair set, bounded count
    ov = kmv_group_overlap(sk, "lang").collect()
    n = len(got)
    assert len(ov) == n * (n - 1) // 2
    for r in ov:
        assert 0.0 < r["jaccard_est"] <= 1.0
        assert r["intersection_est"] > 0


def test_kmv_group_overlap_guards_group_explosion(spark):
    """The all-pairs join is O(G^2): past max_groups the query must
    RAISE at runtime (in-plan assert, no extra driver action), and pass
    untouched under the bound."""
    import pytest
    from pyspark.sql import functions as F

    from kwage_spark.operators.text import (kmv_group_overlap,
                                            kmv_token_sketches)
    rows = [(f"g{i:02d}", f"tok{i} tok{i+1} shared common words")
            for i in range(6)]
    df = spark.createDataFrame(rows, "grp string, text string")
    sk = kmv_token_sketches(df, "text", "grp", k=64).localCheckpoint()
    ok = kmv_group_overlap(sk, "grp", max_groups=10).collect()
    assert len(ok) == 6 * 5 // 2
    assert all(r["group_a"] < r["group_b"] for r in ok)

    with pytest.raises(Exception, match="max_groups"):
        kmv_group_overlap(sk, "grp", max_groups=3).collect()

    # NON-NULLABLE group column — the r5 advisor showed Catalyst's null
    # propagation folded the old coalesce-anchored assert away exactly
    # here (6 groups, max_groups=3, all 15 pairs emitted, no raise); the
    # r6 data-column guard must still fire
    sk_nn = sk.withColumn("grp", F.coalesce(F.col("grp"), F.lit("x")))
    assert not sk_nn.schema["grp"].nullable
    with pytest.raises(Exception, match="max_groups"):
        kmv_group_overlap(sk_nn, "grp", max_groups=3).collect()
    ok_nn = kmv_group_overlap(sk_nn, "grp", max_groups=10).collect()
    assert sorted(map(tuple, ok_nn)) == sorted(map(tuple, ok))
