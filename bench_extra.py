"""Per-query isolation harness for the optimization round (guide §1).

NOT the driver bench — bench.py stays frozen. This file:
  * times each headline query with the SAME count() methodology bench.py
    uses, plus a noop-sink run (guide §1.4) so the computation is timed
    without count()'s column pruning,
  * dumps .explain("formatted") for each query to plans/<tag>/<name>.txt,
  * labels jobs via setJobDescription (guide §1.5).

Usage:
    SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 SPARK_GRAFT_CPUS=32 \
        python bench_extra.py [--tag before] [--queries a,b,c] [--reps 2]
"""

from __future__ import annotations

import argparse
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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default="probe")
    ap.add_argument("--queries", default="")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--plans", action="store_true",
                    help="dump explain('formatted') to plans/r06/<name>_<tag>.txt")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
    spark = get_spark(app=f"kwage_bench_extra_{args.tag}")
    spark.sparkContext.setLogLevel("ERROR")
    sel = [q for q in args.queries.split(",") if q] or (
        ["sketch_ingest", "bloom_search"] + SQL_BENCH)
    plans_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "plans", "r06")
    os.makedirs(plans_dir, exist_ok=True)

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    cat = spark_queries()
    out: dict[str, dict] = {}

    def build(name):
        if name == "sketch_ingest":
            return build_sketches(docs, DOC_CFG)
        if name == "bloom_search":
            sk = build_sketches(docs, DOC_CFG)
            snippets = [(i, FLAGSHIP_SNIPPET + f" q{i}") for i in range(8)]
            return containment_search(sk, snippets, DOC_CFG, threshold=0.3,
                                      emit_all=True)
        return cat[name](spark, sf_dir)

    # one warm pass over everything selected (JVM/codegen/python workers)
    warm_sf = "/root/testdata/sf0.001"
    for name in sel:
        try:
            spark.sparkContext.setJobDescription(f"warm:{name}")
            if name in ("sketch_ingest", "bloom_search"):
                build(name).count()
            else:
                cat[name](spark, warm_sf).count()
        except Exception as e:  # noqa: BLE001
            print(f"warm {name}: {e}", file=sys.stderr)
        finally:
            release_caches()

    for name in sel:
        rec: dict = {"count": [], "noop": []}
        if args.plans:
            df = build(name)
            mode_obj = (spark._jvm.org.apache.spark.sql.execution.ExplainMode
                        .fromString("formatted"))
            txt = df._jdf.queryExecution().explainString(mode_obj)
            with open(os.path.join(plans_dir, f"{name}_{args.tag}.txt"), "w") as fh:
                fh.write(txt)
            release_caches()
        for mode in ("count", "noop"):
            for _ in range(args.reps):
                spark.sparkContext.setJobDescription(f"{args.tag}:{name}:{mode}")
                df = build(name)
                t0 = time.perf_counter()
                try:
                    if mode == "count":
                        df.count()
                    else:
                        df.write.format("noop").mode("overwrite").save()
                finally:
                    release_caches()
                rec[mode].append(round(time.perf_counter() - t0, 4))
        out[name] = rec
        print(json.dumps({name: rec}), flush=True)

    print(json.dumps({"tag": args.tag, "sf": sf_dir, "results": out}))
    spark.stop()


if __name__ == "__main__":
    main()
