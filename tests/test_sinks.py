"""Result sinks: CSV shape, BIGSI-JSON shape/ordering, JSON-lines sink."""

import json

import pytest

from kwage_spark.config import SketchConfig
from kwage_spark.kernels import BloomParams
from kwage_spark.operators.ingest import build_sketches
from kwage_spark.operators.search import containment_search
from kwage_spark.operators.sinks import (
    results_to_bigsi_json, write_results_csv, write_results_json)
from kwage_spark.sources.fixtures import make_query_snippets, make_source_files

CFG = SketchConfig(bloom=BloomParams(k=8, log2_m=14, num_hash=3),
                   kinds=("bloom",))


@pytest.fixture(scope="module")
def results(spark):
    corpus = make_source_files(n_repos=3, files_per_repo=8)
    sk = build_sketches(spark.createDataFrame(corpus), CFG)
    qs = make_query_snippets(corpus, CFG.k)
    qlist = [(int(r.query_id), r.snippet) for r in qs.itertuples()]
    return containment_search(sk, qlist, CFG, threshold=0.3, emit_all=True)


def test_csv_sink(spark, results, tmp_path):
    out = str(tmp_path / "res_csv")
    write_results_csv(results, out)
    back = spark.read.option("header", True).csv(out)
    assert back.columns == ["query_id", "num_kmers", "num_kmers_found",
                            "percent_kmers_found", "repo", "lang"]
    assert back.count() == results.count()


def test_bigsi_json_shape_and_order(results):
    s = results_to_bigsi_json(results, threshold=0.3)
    doc = json.loads(s)
    assert doc, "no queries in output"
    for qid, block in doc.items():
        assert block["threshold"] == "0.3"
        found = [r["num_kmers_found"] for r in block["results"]]
        assert found == sorted(found, reverse=True)
        for r in block["results"]:
            assert {"percent_kmers_found", "num_kmers",
                    "num_kmers_found", "repo", "lang"} <= set(r)


def test_json_lines_sink(spark, results, tmp_path):
    out = str(tmp_path / "res_json")
    write_results_json(results, out)
    back = spark.read.json(out)
    assert back.count() == results.count()
    assert "percent_kmers_found" in back.columns
