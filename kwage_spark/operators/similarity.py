"""Similarity search over an embedding column (array<float>).

Baseline: brute-force cosine top-k — pure built-ins (zip_with/aggregate),
whole-stage-codegen'd, broadcast query vector; O(n) scan, the correct
plan when no index exists. Scale path: random-hyperplane LSH bucketing
with multi-probe (flip each plane once => n_planes+1 probe buckets), which
turns the scan into a bucket-pruned candidate re-rank; recall tested
against the brute-force oracle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import HYPERPLANE_SEED


def _cos_cols(vec_col: str, qv_col: str = "qv"):
    dot = F.expr(f"aggregate(zip_with({vec_col}, {qv_col},"
                 " (x, y) -> cast(x as double) * cast(y as double)),"
                 " cast(0.0 as double), (acc, v) -> acc + v)")
    nrm = F.expr(f"sqrt(aggregate({vec_col}, cast(0.0 as double),"
                 " (acc, x) -> acc + cast(x as double) * cast(x as double)))")
    qnrm = F.expr(f"sqrt(aggregate({qv_col}, cast(0.0 as double),"
                  " (acc, x) -> acc + cast(x as double) * cast(x as double)))")
    return dot / (nrm * qnrm)


def cosine_topk(df: DataFrame, query_vec: list[float], k: int = 10,
                id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Brute-force cosine top-k (the exact baseline)."""
    spark = df.sparkSession
    q = spark.createDataFrame([(query_vec,)], f"qv array<float>")
    return (df.crossJoin(F.broadcast(q))
            .withColumn("cosine", _cos_cols(vec_col))
            .orderBy(F.desc("cosine"), id_col)
            .select(id_col, F.round("cosine", 5).alias("cosine"))
            .limit(k))


def lsh_plan_buckets(spark, dim: int, n_planes: int = 10):
    rng = np.random.default_rng(HYPERPLANE_SEED)
    return rng.standard_normal((n_planes, dim))


def _bucket_udf(spark, planes: np.ndarray):
    bp = spark.sparkContext.broadcast(planes)

    @F.pandas_udf("long")
    def bucket_of(vecs: pd.Series) -> pd.Series:
        p = bp.value
        mat = np.stack(vecs.to_numpy())
        signs = (mat @ p.T) > 0
        return pd.Series((signs * (1 << np.arange(p.shape[0]))).sum(axis=1)
                         .astype(np.int64))
    return bucket_of


def _probe_buckets(query_vec, planes: np.ndarray) -> list[int]:
    """Multi-probe set: the query's bucket plus every 1-bit flip."""
    qv = np.asarray(query_vec, dtype=np.float64)
    qsig = int(((qv @ planes.T) > 0) @ (1 << np.arange(planes.shape[0])))
    return [qsig] + [qsig ^ (1 << i) for i in range(planes.shape[0])]


def _rerank_topk(cands: DataFrame, query_vec, k: int,
                 id_col: str, vec_col: str) -> DataFrame:
    q = cands.sparkSession.createDataFrame([(list(map(float, query_vec)),)],
                                           "qv array<float>")
    return (cands.crossJoin(F.broadcast(q))
            .withColumn("cosine", _cos_cols(vec_col))
            .orderBy(F.desc("cosine"), id_col)
            .select(id_col, F.round("cosine", 5).alias("cosine"))
            .limit(k))


def ann_topk_lsh(df: DataFrame, query_vec: list[float], k: int = 10,
                 id_col: str = "vec_id", vec_col: str = "embedding",
                 n_planes: int = 10) -> DataFrame:
    """Approximate top-k: hyperplane-bucket candidates (multi-probe: the
    query's bucket plus every 1-bit flip), exact cosine re-rank within.

    Inline form — the bucket UDF runs over the full scan. For the 100-TB
    path precompute the layout once with build_ann_index and query with
    ann_topk_indexed, which prunes partitions at the scan.
    """
    qv = np.asarray(query_vec, dtype=np.float64)
    planes = lsh_plan_buckets(df.sparkSession, qv.shape[0], n_planes)
    bucket_of = _bucket_udf(df.sparkSession, planes)
    probes = _probe_buckets(query_vec, planes)
    cands = (df.withColumn("bucket", bucket_of(F.col(vec_col)))
             .filter(F.col("bucket").isin(probes)))
    return _rerank_topk(cands, query_vec, k, id_col, vec_col)


def build_ann_index(df: DataFrame, path: str, id_col: str = "vec_id",
                    vec_col: str = "embedding", n_planes: int = 10) -> None:
    """Materialize the hyperplane-bucketed ANN layout: rows written
    partitioned by their bucket (hive layout), so a probe reads only
    n_planes+1 of 2^n_planes partition directories. The planes are a pure
    function of (HYPERPLANE_SEED, dim), so index and probe always agree."""
    first = df.select(F.size(vec_col).alias("d")).first()
    if first is None:
        raise ValueError("cannot index an empty table")
    planes = lsh_plan_buckets(df.sparkSession, first["d"], n_planes)
    bucket_of = _bucket_udf(df.sparkSession, planes)
    (df.select(id_col, vec_col)
     .withColumn("bucket", bucket_of(F.col(vec_col)))
     .write.mode("overwrite").partitionBy("bucket").parquet(path))


def ann_topk_indexed(spark, path: str, query_vec: list[float], k: int = 10,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     n_planes: int = 10) -> DataFrame:
    """Query a build_ann_index layout: the bucket .isin(probes) predicate
    is a PARTITION filter (verify PartitionFilters in the plan), so the
    scan touches (n_planes+1)/2^n_planes of the index, then re-ranks
    exactly — the Spark analog of an IVF probe."""
    df = spark.read.parquet(path)
    dim = len(query_vec)
    planes = lsh_plan_buckets(spark, dim, n_planes)
    probes = _probe_buckets(query_vec, planes)
    cands = df.filter(F.col("bucket").isin(probes))
    return _rerank_topk(cands, query_vec, k, id_col, vec_col)
