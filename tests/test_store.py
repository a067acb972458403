"""Partitioned sketch store: pruning + roundtrip (SURVEY §7.1 step 6)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kwage_spark.config import SketchConfig
from kwage_spark.kernels.bloom import BloomParams
from kwage_spark.operators.ingest import build_sketches
from kwage_spark.operators.search import containment_search
from kwage_spark.plans.inspect import physical_plan
from kwage_spark.sources.fixtures import make_source_files
from kwage_spark.sources.store import (
    read_sketch_group, read_sketch_store, write_sketch_store)

CFG = SketchConfig(bloom=BloomParams(k=8, log2_m=12, num_hash=3))


@pytest.fixture(scope="module")
def store(spark, tmp_path_factory):
    pdf = make_source_files(n_repos=8, files_per_repo=4, tokens_per_file=30)
    sk = build_sketches(spark.createDataFrame(pdf), CFG)
    path = str(tmp_path_factory.mktemp("store") / "sketches")
    write_sketch_store(sk, path, "repo", buckets=16)
    return pdf, path


def test_store_roundtrip_preserves_rows(spark, store):
    pdf, path = store
    back = read_sketch_store(spark, path)
    n_groups = len(pdf.groupby(["repo", "lang"]))
    assert back.count() == n_groups * len(CFG.kinds)
    assert "_bucket" not in back.columns


def test_group_lookup_prunes_partitions(spark, store):
    pdf, path = store
    repo = sorted(pdf.repo.unique())[2]
    df = read_sketch_group(spark, path, "repo", repo, buckets=16)
    rows = df.toPandas()
    assert set(rows.repo) == {repo}
    # the bucket predicate must reach the scan as a partition filter
    plan = physical_plan(df)
    assert "PartitionFilters" in plan
    pf_lines = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert any("_bucket" in ln for ln in pf_lines), plan


def test_lookup_results_search_equivalent(spark, store):
    """Searching a pruned single-repo slice equals filtering the full
    search output — the store changes I/O, not semantics."""
    pdf, path = store
    repo = sorted(pdf.repo.unique())[1]
    snippet = pdf.loc[pdf.repo == repo, "content"].iloc[0][:60]
    full = containment_search(
        read_sketch_store(spark, path), [(0, snippet)], CFG, threshold=0.5
    ).toPandas()
    pruned = containment_search(
        read_sketch_group(spark, path, "repo", repo, buckets=16),
        [(0, snippet)], CFG, threshold=0.5).toPandas()
    want = full[full.repo == repo].reset_index(drop=True)
    assert pruned[["repo", "lang", "num_kmers_found"]].equals(
        want[["repo", "lang", "num_kmers_found"]])


def test_discover_and_union_stores(spark, tmp_path):
    """S9 recursive discovery: nested store roots found by layout, read
    back as one table."""
    from kwage_spark.sources.store import (discover_sketch_stores,
                                           read_all_sketch_stores,
                                           write_sketch_store)
    from kwage_spark.operators.ingest import build_sketches
    from kwage_spark.sources.fixtures import make_source_files
    pdf = make_source_files(n_repos=4, files_per_repo=4, seed=21)
    df = spark.createDataFrame(pdf)
    sk = build_sketches(df, CFG).cache()
    half_a = sk.filter(F.col("repo") < "org2")
    half_b = sk.filter(F.col("repo") >= "org2")
    root = tmp_path / "stores"
    write_sketch_store(half_a, str(root / "a" / "part1"), "repo", buckets=4)
    write_sketch_store(half_b, str(root / "deep" / "nested" / "part2"),
                       "repo", buckets=4)
    found = discover_sketch_stores(spark, str(root))
    assert len(found) == 2
    assert all("part" in p for p in found)
    back = read_all_sketch_stores(spark, str(root))
    assert back.count() == sk.count()


def test_compaction_binpacks_and_preserves_results(spark, tmp_path):
    """N incremental appends -> compaction -> same lookup results, fewer
    files, pruning intact, and duplicate (group, kind) rows from
    re-ingests of the same group fold through the state merge
    (merge_db.cpp:215-248 smallest-first analog). A second compaction is
    a no-op."""
    from kwage_spark.sources.store import (_bucket_file_counts,
                                           compact_sketch_store,
                                           write_sketch_store)
    pdf = make_source_files(n_repos=6, files_per_repo=3, seed=5)
    sk = build_sketches(spark.createDataFrame(pdf), CFG).cache()
    path = str(tmp_path / "store")
    # 3 incremental waves: two disjoint repo halves + a re-ingest of one
    # repo (creates duplicate group rows the merge must fold)
    write_sketch_store(sk.filter(F.col("repo") < "org3"), path, "repo",
                       buckets=4)
    write_sketch_store(sk.filter(F.col("repo") >= "org3"), path, "repo",
                       buckets=4, mode="append")
    dup_repo = sorted(pdf.repo.unique())[0]
    write_sketch_store(sk.filter(F.col("repo") == dup_repo), path, "repo",
                       buckets=4, mode="append")

    before = _bucket_file_counts(spark, path)
    assert sum(before.values()) > len(before), "appends made no small files"
    dup_rows = read_sketch_group(spark, path, "repo", dup_repo, buckets=4)
    langs = {r["lang"] for r in dup_rows.collect()}
    assert dup_rows.count() == 2 * len(langs) * len(CFG.kinds)  # duplicated

    stats = compact_sketch_store(spark, path, group_cols=["repo", "lang"])
    assert stats["buckets_compacted"] >= 1
    assert stats["files_after"] < stats["files_before"]
    after = _bucket_file_counts(spark, path)
    assert all(n == 1 for n in after.values()), after
    assert set(after) == set(before), "compaction changed the bucket set"

    # duplicate group rows folded to one mergeable row per (group, kind)
    merged = read_sketch_group(spark, path, "repo", dup_repo, buckets=4)
    assert merged.count() == len(langs) * len(CFG.kinds)
    # a search over the compacted store equals one over a fresh build
    # (merging a sketch with itself is idempotent for bloom/hll/cms)
    snippet = pdf.loc[pdf.repo == dup_repo, "content"].iloc[0][:60]
    got = containment_search(merged, [(0, snippet)], CFG,
                             threshold=0.5).toPandas()
    want = containment_search(
        build_sketches(spark.createDataFrame(pdf[pdf.repo == dup_repo]),
                       CFG), [(0, snippet)], CFG, threshold=0.5).toPandas()
    assert got[["repo", "lang", "num_kmers_found"]].equals(
        want[["repo", "lang", "num_kmers_found"]])
    # pruning still plan-asserted after the rewrite
    plan = physical_plan(merged)
    assert any("_bucket" in ln for ln in plan.splitlines()
               if "PartitionFilters" in ln), plan
    # idempotent: a compact store is left alone
    again = compact_sketch_store(spark, path, group_cols=["repo", "lang"])
    assert again["buckets_compacted"] == 0
    assert again["files_after"] == stats["files_after"]


def test_group_delta_upsert_via_append_and_compact(spark, tmp_path):
    """The store's UPSERT path for a growing group: build states for the
    group's NEW files only, append, compact — the duplicate-group merge
    folds delta + base into states BYTE-IDENTICAL to a full rebuild over
    all files (bloom OR / hll max / cms add are associative over
    disjoint file sets; KLL is order-dependent so its counters are
    compared instead)."""
    from kwage_spark.sources.store import (compact_sketch_store,
                                           write_sketch_store)
    pdf = make_source_files(n_repos=3, files_per_repo=6, seed=9)
    repo = sorted(pdf.repo.unique())[0]
    grp = pdf[pdf.repo == repo].reset_index(drop=True)
    old = pdf[(pdf.repo != repo) | (pdf.path.isin(grp.path[:3]))]
    delta = grp[~grp.path.isin(grp.path[:3])]

    path = str(tmp_path / "store")
    write_sketch_store(build_sketches(spark.createDataFrame(old), CFG),
                       path, "repo", buckets=4)
    write_sketch_store(build_sketches(spark.createDataFrame(delta), CFG),
                       path, "repo", buckets=4, mode="append")
    compact_sketch_store(spark, path, group_cols=["repo", "lang"])

    got = (read_sketch_group(spark, path, "repo", repo, buckets=4)
           .select("lang", "kind", "n_rows", "n_kgrams", "state")
           .collect())
    want = (build_sketches(spark.createDataFrame(grp), CFG)
            .filter(F.col("repo") == repo)
            .select("lang", "kind", "n_rows", "n_kgrams", "state")
            .collect())
    gmap = {(r["lang"], r["kind"]): r for r in got}
    wmap = {(r["lang"], r["kind"]): r for r in want}
    assert set(gmap) == set(wmap)
    for key, w in wmap.items():
        g = gmap[key]
        assert (g["n_rows"], g["n_kgrams"]) == (w["n_rows"], w["n_kgrams"]), key
        if key[1] != "kll":  # KLL compaction is order-dependent
            assert bytes(g["state"]) == bytes(w["state"]), key


def test_icontains_function(spark):
    from kwage_spark import functions as fx
    df = spark.createDataFrame([("Hello World",), ("goodbye",), (None,)],
                               "s string")
    got = df.select(fx.icontains("s", "WORLD").alias("m")).collect()
    assert [r["m"] for r in got] == [True, False, None]


def test_iceberg_format_contract(spark, tmp_path):
    """SURVEY §7.1 item 6: the format='iceberg' branch is a real, tested
    contract even without the runtime jar — it must raise a clear
    RuntimeError (never silently fall back to parquet), and unknown
    formats must be rejected. With an Iceberg runtime on the classpath
    (spark.jars.packages org.apache.iceberg:iceberg-spark-runtime + a
    catalog config) the same call path does createOrReplace/append on the
    table identifier with identical bucket-partitioned pruning."""
    from kwage_spark.sources.store import iceberg_available, write_sketch_store
    df = spark.range(4).selectExpr("cast(id as string) AS grp", "id AS v")
    if iceberg_available(spark):
        pytest.skip("Iceberg runtime present: error contract not reachable")
    with pytest.raises(RuntimeError, match="[Ii]ceberg"):
        write_sketch_store(df, "cat.db.t", group_col="grp", format="iceberg")
    # nothing must have been written anywhere as a side effect
    assert not (tmp_path / "cat.db.t").exists()
    with pytest.raises(ValueError, match="unknown store format"):
        write_sketch_store(df, str(tmp_path / "x"), group_col="grp",
                           format="orc2")


def test_store_roundtrip_through_scheme_uri(spark, tmp_path):
    """S10 evidence within the sandbox: the store write/discover/read path
    is URI-scheme-agnostic — it goes through the Hadoop FileSystem API, so
    an explicit file:// URI exercises the same resolution layer an
    s3a:// bucket would (minus the connector jar). The reference shells
    out `aws s3 mv` per DB file (`worker_main.cpp:182-218`); here the
    committer writes straight to the destination scheme."""
    from kwage_spark.sources.store import (discover_sketch_stores,
                                           read_sketch_group,
                                           read_sketch_store,
                                           write_sketch_store)
    df = spark.createDataFrame(
        [(f"g{i % 4}", i) for i in range(32)], "grp string, v long")
    uri = f"file://{tmp_path}/nested/store"
    write_sketch_store(df, uri, group_col="grp", buckets=8)
    found = discover_sketch_stores(spark, f"file://{tmp_path}")
    assert len(found) == 1 and found[0].endswith("/nested/store")
    back = read_sketch_store(spark, uri)
    assert back.count() == 32 and set(back.columns) == {"grp", "v"}
    one = read_sketch_group(spark, uri, "grp", "g2", buckets=8)
    assert one.count() == 8
    assert {r["grp"] for r in one.collect()} == {"g2"}
