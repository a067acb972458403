"""Benchmark harness — prints ONE JSON line with per-query seconds.

Headline queries: sketch ingest (all four families), Bloom containment
search over the built sketches, and representative relational/text/vector
queries from the catalog. Run at $SPARK_GRAFT_SF_DIR (default sf0.1) on
local[$SPARK_GRAFT_CPUS].

Throughput extras (files/sec ingest, scans/sec search) are included under
"throughput" for BENCH/BASELINE.md; tools/bench_scaling.py runs this at
two parallelism levels for the scaling-efficiency evidence.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from kwage_spark.operators.caching import release_caches         # noqa: E402
from kwage_spark.queries import FLAGSHIP_SNIPPET, spark_queries  # noqa: E402
from kwage_spark.queries_sketch import DOC_CFG                   # noqa: E402
from kwage_spark.operators.ingest import build_sketches          # noqa: E402
from kwage_spark.operators.search import containment_search      # noqa: E402
from kwage_spark.sources.session import get_spark                # noqa: E402

SQL_BENCH = [
    "q1_pricing_summary", "revenue_join_agg", "topk_per_group",
    "hourly_event_rollup", "distinct_kgram_count",
    "exact_containment_flagship", "ngram_jaccard_adjacent",
    "cosine_topk_bruteforce", "token_having_mincount", "sessionize_users",
]


def _materialize(df) -> int:
    """Force full execution without driver-side data transfer."""
    return df.count()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app="kwage_bench")
    spark.sparkContext.setLogLevel("ERROR")
    queries: dict[str, float] = {}

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_docs = docs.count()

    # Warm the JVM (codegen, shuffle machinery) and the Python worker pool
    # on the smallest SF so cold-start isn't charged to the first timed
    # query — a long-lived cluster never pays it per query.
    warm_sf = "/root/testdata/sf0.001"
    if os.path.isdir(warm_sf) and warm_sf != sf_dir:
        warm_cat = spark_queries()
        for name in SQL_BENCH:
            try:
                warm_cat[name](spark, warm_sf).count()
            except Exception:
                pass
        _materialize(build_sketches(
            spark.read.parquet(f"{warm_sf}/documents.parquet"), DOC_CFG))

    # -- ingest: build all 4 sketch families per (source, lang)
    t0 = time.perf_counter()
    sk = build_sketches(docs, DOC_CFG)
    sk = sk.persist()
    n_states = sk.count()
    t_ingest = time.perf_counter() - t0
    queries["sketch_ingest"] = round(t_ingest, 4)

    # -- search: 8 query snippets against the cached sketches
    snippets = [(i, FLAGSHIP_SNIPPET + f" q{i}") for i in range(8)]
    t0 = time.perf_counter()
    res = containment_search(sk, snippets, DOC_CFG, threshold=0.3, emit_all=True)
    n_scan_rows = _materialize(res)
    t_search = time.perf_counter() - t0
    queries["bloom_search"] = round(t_search, 4)

    cat = spark_queries()
    for name in SQL_BENCH:
        t0 = time.perf_counter()
        try:
            _materialize(cat[name](spark, sf_dir))
        finally:
            # operator-internal caches must not accumulate across the
            # suite (cache hygiene: operators/caching.py)
            release_caches()
        queries[name] = round(time.perf_counter() - t0, 4)

    total = round(sum(queries.values()), 4)
    n_groups = n_states // len(DOC_CFG.kinds)
    out = {
        "metric": "kwage_spark headline suite wall time",
        "value": total,
        "unit": "sec",
        "queries": queries,
        "sf": sf_dir,
        "throughput": {
            "ingest_files_per_sec": round(n_docs / t_ingest, 2),
            "search_scans_per_sec": round(n_scan_rows / t_search, 2)
            if n_scan_rows else None,
            "n_docs": n_docs,
            "n_sketch_groups": n_groups,
            "cores": os.environ.get("SPARK_GRAFT_CPUS", "8"),
        },
    }
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
