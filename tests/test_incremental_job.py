"""End-to-end incremental ingest job (jobs/incremental_ingest_job.py):
resume-from-checkpoint, append-only store growth, compaction keeping
file counts flat, and pruned-search verification — the reference's
maestro/worker production loop as one idempotent Spark job."""

from __future__ import annotations

from pyspark.sql import functions as F

from jobs.incremental_ingest_job import DEFAULT_CFG, run
from kwage_spark.sources.fixtures import make_source_files
from kwage_spark.sources.store import _bucket_file_counts, read_sketch_store


def _docs(spark, pdf):
    return spark.createDataFrame(pdf).select(
        F.col("repo").alias("source"), "lang", F.col("content").alias("text"))


def test_incremental_rounds_resume_append_compact(spark, tmp_path):
    pdf = make_source_files(n_repos=6, files_per_repo=3, seed=11)
    repos = sorted(pdf.repo.unique())
    wave1 = _docs(spark, pdf[pdf.repo.isin(repos[:4])])
    all_docs = _docs(spark, pdf)

    inp = str(tmp_path / "input")
    ck = str(tmp_path / "ck")
    store = str(tmp_path / "store")
    snippet = pdf.loc[pdf.repo == repos[0], "content"].iloc[0][:60]

    # round 1: cold start over 4 repos
    wave1.write.mode("overwrite").parquet(inp)
    r1 = run(spark, inp, ck, store, verify_group=repos[0],
             verify_snippet=snippet)
    assert r1["store_mode"] == "overwrite"
    assert r1["n_new_state_rows"] == r1["n_state_rows"] > 0
    assert r1["verify_hits"] >= 1
    files_r1 = sum(_bucket_file_counts(spark, store).values())

    # round 2: two new repos land; only THEIR groups are built/appended
    all_docs.write.mode("overwrite").parquet(inp)
    r2 = run(spark, inp, ck, store, verify_group=repos[4],
             verify_snippet=pdf.loc[pdf.repo == repos[4],
                                    "content"].iloc[0][:60])
    assert r2["store_mode"] == "append"
    assert 0 < r2["n_new_state_rows"] < r2["n_state_rows"]
    assert r2["n_state_rows"] > r1["n_state_rows"]
    assert r2["verify_hits"] >= 1
    # compaction keeps per-bucket file counts flat after the append
    files_r2 = sum(_bucket_file_counts(spark, store).values())
    assert files_r2 <= files_r1 + r2["compact_buckets_compacted"] + \
        len(_bucket_file_counts(spark, store))

    # round 3: no new data — a pure no-op (idempotence)
    r3 = run(spark, inp, ck, store)
    assert r3["store_mode"] == "noop"
    assert r3["n_new_state_rows"] == 0
    assert r3["compact_buckets_compacted"] == 0

    # the store holds exactly one row per (group, kind): no duplicates
    # accumulated across rounds
    back = read_sketch_store(spark, store)
    n_rows = back.count()
    assert n_rows == back.select("source", "lang", "kind").distinct().count()
    assert n_rows == r2["n_state_rows"]
    # and counters match a fresh single-shot build (no double counting)
    from kwage_spark.operators.ingest import build_sketches
    fresh = build_sketches(all_docs, DEFAULT_CFG)
    want = {(r["source"], r["lang"], r["kind"]): r["n_rows"]
            for r in fresh.select("source", "lang", "kind", "n_rows").collect()}
    got = {(r["source"], r["lang"], r["kind"]): r["n_rows"]
           for r in back.select("source", "lang", "kind", "n_rows").collect()}
    assert got == want


def test_crash_between_checkpoint_and_store_append_heals(
        spark, tmp_path, monkeypatch):
    """Kill the job AFTER the checkpoint manifest is complete but BEFORE
    the store append: because freshness is derived from the store's own
    (group, kind) keys (not the manifest), the next run re-appends the
    orphaned groups — no silent, unrecoverable gap."""
    import jobs.incremental_ingest_job as job

    pdf = make_source_files(n_repos=6, files_per_repo=3, seed=23)
    repos = sorted(pdf.repo.unique())
    wave1 = _docs(spark, pdf[pdf.repo.isin(repos[:3])])
    all_docs = _docs(spark, pdf)

    inp = str(tmp_path / "input")
    ck = str(tmp_path / "ck")
    store = str(tmp_path / "store")

    wave1.write.mode("overwrite").parquet(inp)
    run(spark, inp, ck, store)

    # round 2 "crashes" in the manifest-complete / store-not-appended
    # window: checkpoint sees everything done, store is missing 3 repos
    all_docs.write.mode("overwrite").parquet(inp)
    real_write = job.write_sketch_store

    def boom(*a, **kw):
        raise RuntimeError("injected crash before store append")

    monkeypatch.setattr(job, "write_sketch_store", boom)
    try:
        run(spark, inp, ck, store)
        raise AssertionError("injected crash did not fire")
    except RuntimeError as e:
        assert "injected crash" in str(e)
    monkeypatch.setattr(job, "write_sketch_store", real_write)

    # the store is now BEHIND the completed manifest — the failure mode
    # the old manifest-keyed freshness could never repair
    assert (read_sketch_store(spark, store)
            .select("source").distinct().count() == 3)

    # next run heals: the anti-join against store keys re-finds the gap
    r3 = run(spark, inp, ck, store)
    assert r3["store_mode"] == "append"
    assert r3["n_new_state_rows"] > 0

    back = read_sketch_store(spark, store)
    assert back.select("source").distinct().count() == 6
    assert back.count() == back.select("source", "lang", "kind") \
        .distinct().count()
    from kwage_spark.operators.ingest import build_sketches
    fresh = build_sketches(all_docs, DEFAULT_CFG)
    want = {(r["source"], r["lang"], r["kind"]): r["n_rows"]
            for r in fresh.select("source", "lang", "kind", "n_rows").collect()}
    got = {(r["source"], r["lang"], r["kind"]): r["n_rows"]
           for r in back.select("source", "lang", "kind", "n_rows").collect()}
    assert got == want
