"""Containment search — the reference's flagship read path (`kwage`,
SURVEY §3.1) as a broadcast + partition-parallel scan.

KWAGE transposes filters to bit-slices so one k-mer probe is one disk seek
(`build_db.cpp:224-231`). In Spark the same algebra runs the other way
round (SURVEY §4.2): sketches stay filter-major rows; the query's small
hash matrix is broadcast; every partition gathers + ANDs + popcounts its
own filters locally. No shuffle at query time, embarrassingly parallel,
exactly like the OpenMP loop over DB files (`kwage.cpp:76-96`).

Semantics replicated exactly:
  * query k-grams deduped before probing (Q1, `kwage.cpp:362-366`)
  * per-k-gram membership = AND over seeds (Q3, `kwage.cpp:409-423`)
  * threshold = int(t * n_unique) float->int TRUNCATION, match iff
    count >= threshold (Q5, `kwage.cpp:388,497`)
  * zero-k-gram query produces no rows (F10, `kwage.cpp:366-371`)
  * results sorted descending by num_kmers_found (Q8, `output.h:27-32`)
"""

from __future__ import annotations

from typing import Iterator, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import KIND_BLOOM, SketchConfig
from ..kernels.bloom import BloomState
from ..kernels.shingle import unique_query_hashes

RESULT_SCHEMA_TAIL = ("query_id long, num_kmers long, num_kmers_found long, "
                      "percent_kmers_found double")


def prepare_queries(queries: Sequence[tuple[int, str]], cfg: SketchConfig
                    ) -> list[tuple[int, np.ndarray]]:
    """Driver-side digest of query snippets -> unique hash matrices (Q1)."""
    return [(int(qid), unique_query_hashes(snippet, cfg.k, cfg.bloom.seeds))
            for qid, snippet in queries]


def containment_search(sketches: DataFrame, queries: Sequence[tuple[int, str]],
                       cfg: SketchConfig, threshold: float = 1.0,
                       emit_all: bool = False) -> DataFrame:
    """sketches(bloom rows) x queries -> match DataFrame.

    Output: group_cols…, query_id, num_kmers, num_kmers_found,
    percent_kmers_found — the reference's CSV/JSON result shape
    (`output.h:35-59`).
    """
    if not 0.0 < threshold <= 1.0:
        raise ValueError("threshold must be in (0, 1]")
    prepared = prepare_queries(queries, cfg)
    gcols = list(cfg.group_cols)
    sc = sketches.sparkSession.sparkContext
    bq = sc.broadcast(prepared)
    schema = ", ".join(f"{c} string" for c in gcols) + ", " + RESULT_SCHEMA_TAIL

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        qs = bq.value
        for pdf in batches:
            out: dict[str, list] = {c: [] for c in gcols}
            out.update(query_id=[], num_kmers=[], num_kmers_found=[],
                       percent_kmers_found=[])
            for row in pdf.itertuples(index=False):
                st = BloomState.from_bytes(row.state)
                for qid, hashes in qs:
                    n_unique = int(hashes.shape[0])
                    if n_unique == 0:      # F10: silent no-match
                        continue
                    hits = st.contains_hashes(hashes)
                    found = int(hits.sum())
                    q_threshold = int(threshold * n_unique)  # kwage.cpp:388
                    if not emit_all and found < q_threshold:
                        continue
                    for c in gcols:
                        out[c].append(getattr(row, c))
                    out["query_id"].append(qid)
                    out["num_kmers"].append(n_unique)
                    out["num_kmers_found"].append(found)
                    out["percent_kmers_found"].append(100.0 * found / n_unique)
            if out["query_id"]:
                yield pd.DataFrame(out)

    bloom_rows = sketches.filter(F.col("kind") == KIND_BLOOM)
    res = bloom_rows.mapInPandas(scan, schema=schema)
    # Q8/Q9: ascending query id, descending hit count within a query
    return res.orderBy("query_id", F.desc("num_kmers_found"), *gcols)


def exact_containment(files: DataFrame, queries: Sequence[tuple[int, str]],
                      cfg: SketchConfig) -> DataFrame:
    """Exact verifier ≙ SriRachA set-intersection oracle (Q11,
    `SriRachA/search_by_kmer.cpp:84-133`): true fraction of the query's
    unique k-grams present in each group's k-gram set, via pure
    DataFrame ops (sequence/substring shingling + explode + semi-count).
    """
    k = cfg.k
    gcols = list(cfg.group_cols)
    qdf = files.sparkSession.createDataFrame(
        [(int(q), s) for q, s in queries], "query_id long, snippet string")
    # k-grams of each file -> distinct per group
    grams = (files
             .select(*gcols, F.explode(F.expr(
                 f"transform(sequence(1, greatest(length({cfg.content_col}) - {k - 1}, 0)),"
                 f" i -> substring({cfg.content_col}, i, {k}))")).alias("gram"))
             .distinct())
    qgrams = (qdf
              .select("query_id", F.explode(F.expr(
                  f"transform(sequence(1, greatest(length(snippet) - {k - 1}, 0)),"
                  f" i -> substring(snippet, i, {k}))")).alias("gram"))
              .distinct())
    totals = qgrams.groupBy("query_id").agg(F.count("*").alias("num_kmers"))
    hits = (grams.join(qgrams, "gram")
            .groupBy(*gcols, "query_id")
            .agg(F.count("*").alias("num_kmers_found")))
    return (hits.join(F.broadcast(totals), "query_id")
            .withColumn("exact_fraction",
                        F.col("num_kmers_found") / F.col("num_kmers")))
