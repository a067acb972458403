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

import struct
from typing import Iterator, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import KIND_BLOOM, SketchConfig
from ..kernels.bloom import _HDR, _MAGIC as _BLOOM_MAGIC, BloomState
from ..kernels.shingle import unique_query_hashes

_ = BloomState  # re-exported for callers that parse single states

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
    # broadcast pre-masked bit indices, not raw hashes: executors do zero
    # per-query prep (≙ broadcasting the query's slice-index set, Q2)
    mask = np.uint32(cfg.bloom.m - 1)
    bq = sc.broadcast([
        (int(qid), (h.astype(np.uint32) & mask), int(h.shape[0]))
        for qid, h in prepared])
    hdr_size = _HDR.size  # BloomState header prefix before raw bits
    n_bytes = cfg.bloom.n_bytes
    num_hash = cfg.bloom.num_hash
    cfg_log2_m = cfg.bloom.log2_m
    has_meta = "meta" in sketches.columns  # FilterInfo passthrough (S11)
    schema = ", ".join(f"{c} string" for c in gcols)
    if has_meta:
        schema += ", sample_metadata map<string,string>"
    schema += ", " + RESULT_SCHEMA_TAIL

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Whole-batch matrix scan: stack the batch's filters into a
        # (rows, m/8) byte matrix once, then per query gather + AND over
        # seeds + popcount as single numpy expressions — the vectorized
        # form of the reference's per-filter count loop (Q2-Q5). CRC is
        # not re-verified here, matching the reference's read path, which
        # checksums at build/merge time only.
        qs = bq.value
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            B = np.empty((n, n_bytes), dtype=np.uint8)
            for i, s in enumerate(pdf["state"].to_numpy()):
                # validate each row's serialized header (12 cheap bytes)
                # BEFORE the fixed-offset bit read: a state written with a
                # different (log2_m, num_hash) would otherwise be scanned
                # with the wrong mask / truncated bits and return silently
                # wrong counts (heterogeneous stores must fold() first)
                # plain format string: struct.Struct objects don't pickle
                magic, _ver, row_l2m, row_nh = struct.unpack_from("<IBBB", s, 0)
                if magic != _BLOOM_MAGIC:
                    raise ValueError("containment_search: non-bloom state "
                                     f"magic 0x{magic:08x} in bloom rows")
                if row_l2m != cfg_log2_m or row_nh != num_hash:
                    raise ValueError(
                        "containment_search: state params (log2_m="
                        f"{row_l2m}, num_hash={row_nh}) != cfg ("
                        f"{cfg_log2_m}, {num_hash}); fold() the store or "
                        "search with the matching SketchConfig")
                B[i] = np.frombuffer(s, dtype=np.uint8, count=n_bytes,
                                     offset=hdr_size)
            gvals = {c: pdf[c].to_numpy() for c in gcols}
            mvals = pdf["meta"].to_numpy() if has_meta else None
            frames = []
            for qid, idx, n_unique in qs:
                if n_unique == 0:          # F10: silent no-match
                    continue
                q_threshold = int(threshold * n_unique)  # kwage.cpp:388
                flat = idx.ravel()
                byte_idx = (flat >> np.uint32(3)).astype(np.int64)
                bit_shift = (flat & np.uint32(7)).astype(np.uint8)
                found = np.empty(n, dtype=np.int64)
                # bound the gather scratch to ~16 MB per chunk
                chunk = max(1, (1 << 24) // max(flat.size, 1))
                for r0 in range(0, n, chunk):
                    sub = B[r0:r0 + chunk]
                    g = (sub[:, byte_idx] >> bit_shift) & np.uint8(1)
                    hits = g.reshape(sub.shape[0], n_unique, num_hash).all(axis=2)
                    found[r0:r0 + sub.shape[0]] = hits.sum(axis=1)
                sel = (np.arange(n) if emit_all
                       else np.nonzero(found >= q_threshold)[0])
                if sel.size == 0:
                    continue
                f = {c: gvals[c][sel] for c in gcols}
                if mvals is not None:
                    f["sample_metadata"] = mvals[sel]
                f["query_id"] = np.full(sel.size, qid, dtype=np.int64)
                f["num_kmers"] = np.full(sel.size, n_unique, dtype=np.int64)
                f["num_kmers_found"] = found[sel]
                f["percent_kmers_found"] = 100.0 * found[sel] / n_unique
                frames.append(pd.DataFrame(f))
            if frames:
                yield pd.concat(frames, ignore_index=True)

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
    qgrams = (qdf
              .select("query_id", F.explode(F.expr(
                  f"transform(sequence(1, greatest(length(snippet) - {k - 1}, 0)),"
                  f" i -> substring(snippet, i, {k}))")).alias("gram"))
              .distinct())
    totals = qgrams.groupBy("query_id").agg(F.count("*").alias("num_kmers"))
    # broadcast-join the (tiny) query gram set BEFORE the distinct: the
    # shuffle then carries only corpus grams that appear in some query,
    # not the full corpus k-gram set (same algebra, ~corpus-sized saving)
    grams = (files
             .select(*gcols, F.explode(F.expr(
                 f"transform(sequence(1, greatest(length({cfg.content_col}) - {k - 1}, 0)),"
                 f" i -> substring({cfg.content_col}, i, {k}))")).alias("gram"))
             .join(F.broadcast(qgrams), "gram")
             .distinct())
    hits = (grams
            .groupBy(*gcols, "query_id")
            .agg(F.count("*").alias("num_kmers_found")))
    return (hits.join(F.broadcast(totals), "query_id")
            .withColumn("exact_fraction",
                        F.col("num_kmers_found") / F.col("num_kmers")))
