"""Scalar sketch-function surface (kwage_spark.functions) vs kernel oracles.

Each column function must agree EXACTLY with a driver-side decode of the
same state blob — the UDF is a distribution vehicle, not a reimplementation.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from kwage_spark import functions as fx
from kwage_spark.config import SketchConfig
from kwage_spark.kernels.bloom import BloomParams
from kwage_spark.kernels.registry import merge_state_blobs, state_from_bytes
from kwage_spark.kernels.shingle import unique_query_hashes
from kwage_spark.operators.ingest import build_sketches
from kwage_spark.operators.merge import merge_states_global
from kwage_spark.sources.fixtures import make_source_files

CFG = SketchConfig(group_cols=("repo", "lang"), content_col="content",
                   kinds=("bloom", "hll", "cms", "kll", "tdigest"))


@pytest.fixture(scope="module")
def sketches(spark):
    pdf = make_source_files(n_repos=4, files_per_repo=10, seed=11)
    df = spark.createDataFrame(pdf)
    return build_sketches(df, CFG).cache()


def _decoded(sketches, kind):
    rows = sketches.filter(F.col("kind") == kind).collect()
    return {(r["repo"], r["lang"]): state_from_bytes(bytes(r["state"]))
            for r in rows}


def test_hll_estimate_matches_kernel(sketches):
    got = {(r["repo"], r["lang"]): r["est"]
           for r in sketches.filter(F.col("kind") == "hll")
           .select("repo", "lang", fx.hll_estimate("state").alias("est"))
           .collect()}
    want = {k: st.estimate() for k, st in _decoded(sketches, "hll").items()}
    assert got.keys() == want.keys()
    for k in want:
        assert got[k] == pytest.approx(want[k], rel=1e-12)


def test_cms_query_matches_kernel(sketches):
    probe = "table va"
    got = {(r["repo"], r["lang"]): r["est"]
           for r in sketches.filter(F.col("kind") == "cms")
           .select("repo", "lang",
                   fx.cms_query("state", F.lit(probe), k=CFG.k).alias("est"))
           .collect()}
    w = np.frombuffer(probe.encode()[:CFG.k].ljust(CFG.k, b"\x00"),
                      dtype=np.uint8)[None, :]
    want = {k: int(st.query_windows(w)[0])
            for k, st in _decoded(sketches, "cms").items()}
    assert got == want


@pytest.mark.parametrize("kind", ["kll", "tdigest"])
def test_quantile_functions_match_kernel(sketches, kind):
    qs = [0.25, 0.5, 0.75]
    got = {(r["repo"], r["lang"]): r["qs"]
           for r in sketches.filter(F.col("kind") == kind)
           .select("repo", "lang", fx.sketch_quantiles("state", qs).alias("qs"))
           .collect()}
    want = {k: st.quantiles(qs) for k, st in _decoded(sketches, kind).items()}
    assert got.keys() == want.keys()
    for k in want:
        assert got[k] == pytest.approx(want[k], rel=1e-12)


def test_bloom_stats_matches_kernel(sketches):
    got = {(r["repo"], r["lang"]): r["bs"].asDict()
           for r in sketches.filter(F.col("kind") == "bloom")
           .select("repo", "lang", fx.bloom_stats("state").alias("bs"))
           .collect()}
    for k, st in _decoded(sketches, "bloom").items():
        g = got[k]
        assert g["n_items"] == st.n_items
        assert g["popcount"] == st.popcount()
        assert g["fill_ratio"] == pytest.approx(st.popcount() / st.params.m)
        assert g["fp_bound"] == pytest.approx(st.params.fp_rate(st.n_items))


def test_bloom_contains_matches_kernel(sketches, spark):
    snippet = "the quick brown fox jumps over"
    H = unique_query_hashes(snippet, CFG.bloom.k, CFG.bloom.seeds)
    got = {(r["repo"], r["lang"]): r["c"].asDict()
           for r in sketches.filter(F.col("kind") == "bloom")
           .select("repo", "lang",
                   fx.bloom_contains("state", snippet, CFG.bloom).alias("c"))
           .collect()}
    for k, st in _decoded(sketches, "bloom").items():
        found = int(st.contains_hashes(H).sum())
        assert got[k]["num_kmers"] == H.shape[0]
        assert got[k]["num_kmers_found"] == found


def test_bloom_contains_param_mismatch_raises(sketches):
    other = BloomParams(k=CFG.bloom.k, log2_m=CFG.bloom.log2_m + 1,
                        num_hash=CFG.bloom.num_hash)
    df = (sketches.filter(F.col("kind") == "bloom")
          .select(fx.bloom_contains("state", "abcdefghij", other).alias("c")))
    with pytest.raises(Exception, match="param mismatch"):
        df.collect()


@pytest.mark.parametrize("kind", ["cms", "hll", "bloom"])
def test_merge_states_global_equals_driver_fold(sketches, kind):
    rows = sketches.filter(F.col("kind") == kind).collect()
    want = merge_state_blobs(bytes(r["state"]) for r in rows)
    out = merge_states_global(sketches, kind).collect()
    assert len(out) == 1
    got = out[0]
    assert bytes(got["state"]) == want  # byte-identical (A5 algebra)
    assert got["n_rows"] == sum(r["n_rows"] for r in rows)
    assert got["n_kgrams"] == sum(r["n_kgrams"] for r in rows)
