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
        assert block["threshold"] == 0.3
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


def test_bigsi_json_golden(spark):
    """Byte-exact golden comparison of one end-to-end BIGSI JSON document:
    floats are fixed 1-decimal numbers (threshold AND percent — the
    reference's stream manipulators persist across both, output.h:75-82),
    results keep descending num_kmers_found order, keys sorted."""
    rows = [
        ("org0/r0", "py", {"acc": "A1"}, 0, 30, 30, 100.0),
        ("org1/r1", "py", {"acc": "B2"}, 0, 30, 20, 66.66666666666667),
        ("org0/r0", "py", {"acc": "A1"}, 1, 12, 9, 75.0),
    ]
    df = spark.createDataFrame(
        rows, "repo string, lang string, sample_metadata map<string,string>, "
              "query_id long, num_kmers long, num_kmers_found long, "
              "percent_kmers_found double")
    got = results_to_bigsi_json(df, threshold=0.5)
    expected = json.dumps({
        "0": {"threshold": 0.5, "results": [
            {"repo": "org0/r0", "lang": "py",
             "sample_metadata": {"acc": "A1"},
             "percent_kmers_found": 100.0, "num_kmers": 30,
             "num_kmers_found": 30},
            {"repo": "org1/r1", "lang": "py",
             "sample_metadata": {"acc": "B2"},
             "percent_kmers_found": 66.7, "num_kmers": 30,
             "num_kmers_found": 20},
        ]},
        "1": {"threshold": 0.5, "results": [
            {"repo": "org0/r0", "lang": "py",
             "sample_metadata": {"acc": "A1"},
             "percent_kmers_found": 75.0, "num_kmers": 12,
             "num_kmers_found": 9},
        ]},
    }, sort_keys=True)
    assert got == expected
