"""Merge-tool, fold-table, and checkpoint/resume semantics (A13, A4, T1-T4)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from kwage_spark.config import SketchConfig
from kwage_spark.kernels import BloomParams
from kwage_spark.kernels.registry import state_from_bytes
from kwage_spark.operators.checkpoint import (
    resume_ingest, verify_manifest, write_checkpoint, read_checkpoint)
from kwage_spark.operators.ingest import build_sketches
from kwage_spark.operators.merge import (
    fold_bloom_table, merge_sketch_tables, verify_states)
from kwage_spark.sources.fixtures import make_source_files

CFG = SketchConfig(bloom=BloomParams(k=8, log2_m=14, num_hash=3),
                   kinds=("bloom", "hll", "cms"))


@pytest.fixture(scope="module")
def corpus():
    return make_source_files(n_repos=6, files_per_repo=8)


def _states(df, gcols=("repo", "lang")):
    return {tuple(r[c] for c in gcols) + (r["kind"],):
            state_from_bytes(bytes(r["state"])) for r in df.collect()}


def test_merge_tables_equals_whole(spark, corpus):
    """merge(sketch(half1), sketch(half2)) == sketch(all) — A13/O1."""
    files = spark.createDataFrame(corpus)
    half1 = files.filter(F.crc32(F.col("path")) % 2 == 0)
    half2 = files.filter(F.crc32(F.col("path")) % 2 == 1)
    a = build_sketches(half1, CFG)
    b = build_sketches(half2, CFG)
    merged = _states(merge_sketch_tables(a, b, list(CFG.group_cols)))
    whole = _states(build_sketches(files, CFG))
    assert merged.keys() == whole.keys()
    for k in whole:
        assert merged[k] == whole[k], k


def test_fold_table_matches_direct_build(spark, corpus):
    """fold(table@2^14 -> 2^10) == build at 2^10 — A4 at table level."""
    files = spark.createDataFrame(corpus)
    big = build_sketches(files, CFG)
    folded = _states(fold_bloom_table(big, 10))
    small_cfg = SketchConfig(bloom=BloomParams(k=8, log2_m=10, num_hash=3),
                             kinds=("bloom",))
    direct = _states(build_sketches(files, small_cfg))
    for key, st in direct.items():
        assert folded[key] == st, key


def test_verify_states_counts_all(spark, corpus):
    files = spark.createDataFrame(corpus)
    sk = build_sketches(files, CFG)
    assert verify_states(sk) == sk.count()


def test_checkpoint_roundtrip_and_manifest(spark, corpus, tmp_path):
    files = spark.createDataFrame(corpus)
    sk = build_sketches(files, CFG)
    path = str(tmp_path / "ckpt")
    write_checkpoint(sk, path)
    states, manifest = read_checkpoint(spark, path)
    assert states.count() == sk.count()
    assert manifest.filter(~F.col("complete")).count() == 0
    assert set(manifest.columns) >= {"kind", "state_crc32", "complete",
                                     "n_rows", "n_kgrams"}
    # integrity sweep: no crc mismatches
    bad = verify_manifest(states, manifest, list(CFG.group_cols))
    assert bad.empty


def test_resume_equals_clean_run(spark, corpus, tmp_path):
    """Kill-after-partial-checkpoint then resume == one-shot run (T3)."""
    files = spark.createDataFrame(corpus)
    clean = _states(build_sketches(files, CFG))
    # simulate crash: checkpoint holds only 2 of the repos' groups
    partial = build_sketches(
        files.filter(F.col("repo").isin("org0/repo0", "org1/repo1")), CFG)
    path = str(tmp_path / "partial_ckpt")
    write_checkpoint(partial, path)
    resumed = _states(resume_ingest(spark, files, CFG, path))
    assert resumed.keys() == clean.keys()
    for k in clean:
        assert resumed[k] == clean[k], k
    # n_rows lineage must also match the clean run
    clean_rows = {(r["repo"], r["lang"], r["kind"]): r["n_rows"]
                  for r in build_sketches(files, CFG).collect()}
    res_rows = {(r["repo"], r["lang"], r["kind"]): r["n_rows"]
                for r in resume_ingest(spark, files, CFG, path).collect()}
    assert clean_rows == res_rows


def test_resume_cold_start_without_checkpoint(spark, corpus, tmp_path):
    files = spark.createDataFrame(corpus)
    out = resume_ingest(spark, files, CFG, str(tmp_path / "missing"))
    assert out.count() == build_sketches(files, CFG).count()


def test_attempt_lineage_across_resume(spark, corpus, tmp_path):
    """Manifest attempt counters (maestro.h:8-45 analog): groups carried
    from a complete prior checkpoint keep attempt=1; groups (re)built on
    the resume run get prior attempts + 1."""
    files = spark.createDataFrame(corpus)
    partial = build_sketches(
        files.filter(F.col("repo").isin("org0/repo0", "org1/repo1")), CFG)
    path = str(tmp_path / "attempt_ckpt")
    write_checkpoint(partial, path)
    _, manifest1 = read_checkpoint(spark, path)
    assert {r["attempt"] for r in manifest1.collect()} == {1}

    resumed = resume_ingest(spark, files, CFG, path)
    path2 = str(tmp_path / "attempt_ckpt2")
    write_checkpoint(resumed, path2, prior_manifest=manifest1)
    _, manifest2 = read_checkpoint(spark, path2)
    att = {(r["repo"], r["kind"]): r["attempt"] for r in manifest2.collect()}
    assert att[("org0/repo0", "bloom")] == 1      # carried through
    assert att[("org2/repo2", "bloom")] == 1      # first build on run 2
    # a third run rebuilding everything bumps only the incomplete ones;
    # simulate a failed group by marking it incomplete in manifest2
    m2_edit = manifest2.withColumn(
        "complete", F.when(F.col("repo") == "org2/repo2", F.lit(False))
        .otherwise(F.col("complete")))
    path3 = str(tmp_path / "attempt_ckpt3")
    write_checkpoint(resumed, path3, prior_manifest=m2_edit)
    _, manifest3 = read_checkpoint(spark, path3)
    att3 = {(r["repo"], r["kind"]): r["attempt"] for r in manifest3.collect()}
    assert att3[("org2/repo2", "bloom")] == 2     # failed once, retried
    assert att3[("org0/repo0", "bloom")] == 1


def test_config_for_corpus_meets_fp_target(spark, corpus):
    from kwage_spark.operators.ingest import config_for_corpus
    files = spark.createDataFrame(corpus)
    cfg = config_for_corpus(files, CFG, p_target=0.1)
    sk = build_sketches(files, cfg).filter(F.col("kind") == "bloom")
    for r in sk.collect():
        st = state_from_bytes(bytes(r["state"]))
        # the sizing headroom (4x mean) must hold the bound for typical
        # groups; assert the published bound at each group's actual n
        assert st.params.fp_rate(st.n_items) <= 0.1 * 4 or st.n_items == 0


def test_resume_shuffle_join_path(spark, corpus, tmp_path):
    """broadcast_limit=0 drops the explicit broadcast hints (the 10^8-group
    regime where a forced broadcast would OOM the driver); resume must
    still equal the clean run through the shuffle/AQE join path."""
    files = spark.createDataFrame(corpus)
    clean = _states(build_sketches(files, CFG))
    partial = build_sketches(
        files.filter(F.col("repo").isin("org0/repo0", "org1/repo1")), CFG)
    path = str(tmp_path / "shuffle_ckpt")
    write_checkpoint(partial, path, broadcast_limit=0)
    resumed = _states(resume_ingest(spark, files, CFG, path,
                                    broadcast_limit=0))
    assert resumed.keys() == clean.keys()
    for k in clean:
        assert resumed[k] == clean[k], k


def test_planned_worklist_records_failed_groups(spark, corpus, tmp_path):
    """With a planned work-list, groups that produced no states get
    complete=False manifest rows, so a repeatedly-failing group
    accumulates attempts instead of restarting at 1 when it finally
    succeeds (ADVICE r2: lineage previously relied on the caller
    injecting incomplete rows)."""
    files = spark.createDataFrame(corpus)
    planned = files.select("repo", "lang").distinct()
    ok = files.filter(F.col("repo") != "org3/repo3")
    partial = build_sketches(ok, CFG)

    path1 = str(tmp_path / "plan_ckpt1")
    write_checkpoint(partial, path1, planned=planned)
    _, m1 = read_checkpoint(spark, path1)
    failed1 = m1.filter(~F.col("complete"))
    assert {r["repo"] for r in failed1.collect()} == {"org3/repo3"}
    assert {r["attempt"] for r in failed1.collect()} == {1}
    assert failed1.filter(F.col("kind").isNotNull()).count() == 0

    # run 2: org3/repo3 fails AGAIN -> attempt accumulates to 2
    path2 = str(tmp_path / "plan_ckpt2")
    write_checkpoint(partial, path2, planned=planned, prior_manifest=m1)
    _, m2 = read_checkpoint(spark, path2)
    failed2 = {r["repo"]: r["attempt"]
               for r in m2.filter(~F.col("complete")).collect()}
    assert failed2 == {"org3/repo3": 2}
    # completed groups keep attempt=1
    assert {r["attempt"] for r in m2.filter(F.col("complete")).collect()} \
        == {1}

    # run 3: it finally succeeds -> attempt = prior fails + 1 = 3
    full = build_sketches(files, CFG)
    path3 = str(tmp_path / "plan_ckpt3")
    write_checkpoint(full, path3, planned=planned, prior_manifest=m2)
    _, m3 = read_checkpoint(spark, path3)
    att = {(r["repo"], r["kind"]): r["attempt"] for r in m3.collect()}
    assert att[("org3/repo3", "bloom")] == 3
    assert att[("org0/repo0", "bloom")] == 1
    assert m3.filter(~F.col("complete")).count() == 0


def test_corrupt_manifest_fails_loudly_not_cold_start(spark, corpus, tmp_path):
    """A manifest dir that EXISTS but cannot be read must raise — treating
    it as cold start would rebuild everything and double-append any
    downstream store (only the Bloom OR is idempotent; counters and
    CMS/KLL/HLL mass are not)."""
    import pytest

    from kwage_spark.operators.checkpoint import (checkpoint_exists,
                                                  resume_ingest)
    ck = str(tmp_path / "ck")
    assert not checkpoint_exists(spark, ck)  # genuinely cold
    (tmp_path / "ck" / "manifest").mkdir(parents=True)
    (tmp_path / "ck" / "manifest" / "part-00000.parquet").write_bytes(
        b"not a parquet file")
    assert checkpoint_exists(spark, ck)
    with pytest.raises(Exception) as ei:
        resume_ingest(spark, corpus, CFG, ck).collect()
    assert "cold" not in str(ei.value).lower()
