"""spark-submit entry: resumable incremental sketch ingest into the store.

The production shape of the reference's maestro/worker loop
(`maestro_main.cpp` status machine + `worker_main.cpp` DB writes) as one
idempotent Spark job:

  1. resume_ingest — anti-join the input against the checkpoint's
     completed-group manifest, shingle/sketch ONLY the new groups
     (restore_status/restore_bloom analog);
  2. write_checkpoint — two-phase (states, then manifest-with-crc flag):
     a crash between phases leaves an incomplete manifest row, and the
     next run redoes exactly those groups;
  3. write_sketch_store — append the fresh groups into the hash-bucketed
     store; "fresh" = checkpoint states anti-joined against the store's
     OWN (group, kind) keys, so a crash between checkpoint and append is
     healed on the next run (see run() docstring);
  4. compact_sketch_store — bin-pack the small files the append created
     and fold any duplicate group rows (merge_db smallest-first analog);
  5. a pruned containment search against the store verifies the written
     data answers queries.

Launch:
  spark-submit --master local[N] --py-files kwage_spark.zip \
      jobs/incremental_ingest_job.py --input DIR \
      --checkpoint DIR --store DIR

Run it again after new data lands in --input: completed groups are
skipped (their raw rows are pruned before shingling), the store gains
only the new groups, and compaction keeps file counts flat. Prints one
JSON line of counters.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession

from kwage_spark.config import SketchConfig
from kwage_spark.kernels.bloom import BloomParams
from kwage_spark.operators.checkpoint import resume_ingest, write_checkpoint
from kwage_spark.operators.search import containment_search
from kwage_spark.sources.store import (compact_sketch_store,
                                       read_sketch_group,
                                       write_sketch_store)

DEFAULT_CFG = SketchConfig(group_cols=("source", "lang"), content_col="text",
                           bloom=BloomParams(k=8, log2_m=16, num_hash=3))


def run(spark: SparkSession, input_path: str, checkpoint: str, store: str,
        cfg: SketchConfig = DEFAULT_CFG, group_col: str = "source",
        buckets: int = 16, verify_group: str | None = None,
        verify_snippet: str | None = None) -> dict:
    """One incremental ingest round; returns the counters main() prints.

    The store append is SELF-HEALING: freshness is derived by anti-joining
    the checkpoint states against the (group…, kind) keys ACTUALLY present
    in the store — never against the prior manifest. The manifest is
    written complete BEFORE the store append, so a crash in that window
    leaves groups checkpointed-but-unstored; keying off the store itself
    means the next run sees them missing and appends them (keying off the
    manifest would silently drop them forever). A completed group already
    in the store is never re-appended, so the compaction merge never
    double-counts its counters/CMS/KLL mass."""
    gcols = list(cfg.group_cols)
    files = spark.read.parquet(input_path)
    n_input_groups = files.select(*gcols).distinct().count()

    t0 = time.perf_counter()
    states = resume_ingest(spark, files, cfg, checkpoint)
    # two-phase checkpoint: states first, manifest (with crc + complete
    # flag) second — the resumability contract
    write_checkpoint(states, checkpoint)
    t_ingest = time.perf_counter() - t0

    states_ck = spark.read.parquet(f"{checkpoint}/states")
    store_present = _store_exists(spark, store)
    if store_present:
        # column-pruned scan of the store's own keys (group cols + kind);
        # distinct is O(groups), not O(sketch bytes)
        store_keys = (spark.read.parquet(store)
                      .select(*gcols, "kind").distinct()
                      .localCheckpoint(eager=True))
        fresh = states_ck.join(store_keys, [*gcols, "kind"], "left_anti")
    else:
        fresh = states_ck
    n_new_rows = fresh.count()

    mode = "append" if store_present else "overwrite"
    if n_new_rows:
        write_sketch_store(fresh, store, group_col=group_col,
                           buckets=buckets, mode=mode)
    stats = compact_sketch_store(spark, store, group_cols=gcols)

    result = {
        "n_input_groups": n_input_groups,
        "n_state_rows": states_ck.count(),
        "n_new_state_rows": n_new_rows,
        "ingest_sec": round(t_ingest, 3),
        "store_mode": mode if n_new_rows else "noop",
        **{f"compact_{k}": v for k, v in stats.items()},
    }
    if verify_group is not None and verify_snippet is not None:
        grp = read_sketch_group(spark, store, group_col, verify_group,
                                buckets=buckets)
        hits = containment_search(grp, [(0, verify_snippet)], cfg,
                                  threshold=0.5)
        result["verify_hits"] = hits.count()
    return result


def _store_exists(spark: SparkSession, path: str) -> bool:
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    return bool(fs.exists(p))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--store", required=True)
    ap.add_argument("--group-col", default="source")
    ap.add_argument("--buckets", type=int, default=16)
    ap.add_argument("--verify-group", default=None)
    ap.add_argument("--verify-snippet", default=None)
    args = ap.parse_args()
    spark = SparkSession.builder.appName("kwage_incremental_ingest") \
        .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    out = run(spark, args.input, args.checkpoint, args.store,
              group_col=args.group_col, buckets=args.buckets,
              verify_group=args.verify_group,
              verify_snippet=args.verify_snippet)
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
