"""Misra-Gries frequent-items summary: classic guarantees, mergeability
under arbitrary splits, serialization integrity, and the distributed
operator bracketing exact counts."""

from __future__ import annotations

from collections import Counter

import numpy as np
import pytest

from kwage_spark.kernels.mg import MGState


def _zipf_stream(n=20000, vocab=2000, seed=7):
    rng = np.random.default_rng(seed)
    ids = rng.zipf(1.3, size=n) % vocab
    return [f"tok{j}".encode() for j in ids]


def _fold(items, k):
    st = MGState(k)
    cnt = Counter(items)
    st.add_items(list(cnt), np.fromiter(cnt.values(), dtype=np.int64))
    return st


def test_mg_guarantees_single_stream():
    items = _zipf_stream()
    true = Counter(items)
    k = 32
    st = _fold(items, k)
    assert len(st.counters) <= k
    assert st.n_total == len(items)
    assert st.err <= len(items) // (k + 1)
    est = {it: v for it, v, _e in st.estimates()}
    # every heavy item present, every estimate a bracket of the truth
    for it, t in true.items():
        if t > len(items) / (k + 1):
            assert it in est, it
    for it, v in est.items():
        assert v <= true[it] <= v + st.err, (it, v, true[it], st.err)


@pytest.mark.parametrize("n_splits", [2, 7, 16])
def test_mg_merge_any_split_keeps_bounds(n_splits):
    items = _zipf_stream(n=12000)
    true = Counter(items)
    k = 24
    parts = np.array_split(np.arange(len(items)), n_splits)
    merged = MGState(k)
    for idx in parts:
        merged.merge(_fold([items[i] for i in idx], k))
    assert len(merged.counters) <= k
    assert merged.n_total == len(items)
    assert merged.err <= len(items) // (k + 1)
    est = {it: v for it, v, _e in merged.estimates()}
    for it, t in true.items():
        if t > len(items) / (k + 1):
            assert it in est
    for it, v in est.items():
        assert v <= true[it] <= v + merged.err


def test_mg_serialization_roundtrip_and_crc():
    st = _fold(_zipf_stream(n=3000), 16)
    blob = st.to_bytes()
    back = MGState.from_bytes(blob)
    assert back.counters == st.counters
    assert (back.k, back.n_total, back.err) == (st.k, st.n_total, st.err)
    corrupted = blob[:-6] + b"\xff" + blob[-5:]
    with pytest.raises(ValueError, match="crc32"):
        MGState.from_bytes(corrupted)


def test_frequent_tokens_operator_brackets_exact(spark):
    from pyspark.sql import functions as F

    from kwage_spark.operators.text import frequent_tokens_mg
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    k = 48
    got = {r["token"]: (r["est_count"], r["max_err"])
           for r in frequent_tokens_mg(docs, "text", k=k).collect()}
    assert 0 < len(got) <= k
    exact = {r["token"]: r["n"] for r in
             (docs.select(F.explode(F.split("text", r"\s+")).alias("token"))
              .filter(F.length("token") > 0)
              .groupBy("token").agg(F.count(F.lit(1)).alias("n"))).collect()}
    n_total = sum(exact.values())
    for tok, (est, err) in got.items():
        assert est <= exact[tok] <= est + err, (tok, est, err, exact[tok])
    # heaviest true token is guaranteed tracked and ranked first
    top_true = max(exact, key=exact.get)
    assert exact[top_true] > n_total / (k + 1)
    assert top_true in got
