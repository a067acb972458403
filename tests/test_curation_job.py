"""End-to-end curation pipeline job (jobs/curation_pipeline_job.py):
quality gate -> exact dedup -> LSH near-dedup -> leakage-safe split ->
chunking -> manifest, with planted junk/dups and determinism across
re-runs."""

from __future__ import annotations

import json

import numpy as np
from pyspark.sql import functions as F

from jobs.curation_pipeline_job import run


def _corpus(spark):
    rng = np.random.default_rng(17)
    vocab = [f"w{j}" for j in range(400)]
    rows = []
    for i in range(30):
        toks = list(rng.choice(vocab, size=150))
        text = " ".join(toks)
        rows.append((i, text))
        if i < 10:                       # exact duplicates of 0..9
            rows.append((1000 + i, text))
        if i < 8:                        # near duplicates of 0..7
            dup = toks.copy()
            for _ in range(8):
                dup[int(rng.integers(0, len(dup)))] = str(rng.choice(vocab))
            rows.append((2000 + i, " ".join(dup)))
    rows.append((9001, "short"))                      # fails min_chars
    rows.append((9002, "spam spam " * 40))            # top-bigram junk
    rows.append((9003, "same line\n" * 30))           # dup-line junk
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_curation_pipeline_end_to_end(spark, tmp_path):
    docs = _corpus(spark)
    inp = str(tmp_path / "in")
    out1 = str(tmp_path / "out1")
    docs.write.mode("overwrite").parquet(inp)

    m = run(spark, inp, out1)
    n_docs = docs.count()
    assert m["n_input_docs"] == n_docs
    # the three junk docs fail the quality gate
    assert m["n_after_quality"] == n_docs - 3
    # the 10 exact copies collapse (min doc_id survives)
    assert m["n_after_exact_dedup"] == m["n_after_quality"] - 10
    # the 8 near-dups collapse to their cluster representative
    assert m["n_after_near_dedup"] == m["n_after_exact_dedup"] - 8
    assert m["n_chunks"] == sum(m["chunks_per_split"].values())
    assert set(m["chunks_per_split"]) <= {"train", "val", "test"}

    chunks = spark.read.parquet(f"{out1}/chunks")
    ids = {r["doc_id"] for r in chunks.select("doc_id").distinct().collect()}
    # survivors are the ORIGINAL docs: every dup/junk id is gone and the
    # min-id representatives (0..29) all survived
    assert ids == set(range(30))
    # a doc's chunks all share one split (leakage safety at chunk level)
    per_doc = (chunks.groupBy("doc_id")
               .agg(F.countDistinct("split").alias("k")).collect())
    assert all(r["k"] == 1 for r in per_doc)
    # chunk sizing: every chunk <= chunk_tokens, full chunks dominate
    sizes = [r["n_chunk_tokens"] for r in
             chunks.select("n_chunk_tokens").collect()]
    assert max(sizes) <= 128
    # 150-token docs at stride 112 -> chunks of 128 and 38
    assert sorted(set(sizes)) == [38, 128]

    # manifest on disk matches the returned counters
    disk = json.load(open(f"{out1}/manifest.json"))
    assert disk == m

    # determinism: a re-run into a fresh dir reproduces EVERYTHING
    out2 = str(tmp_path / "out2")
    m2 = run(spark, inp, out2)
    assert m2 == m
    c2 = spark.read.parquet(f"{out2}/chunks")
    key = ["doc_id", "chunk_idx", "split", "chunk_text"]
    assert sorted(map(tuple, chunks.select(*key).collect())) == \
        sorted(map(tuple, c2.select(*key).collect()))
