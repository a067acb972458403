"""Training-data-pipeline operators as driver queries.

token_count_bpe is SQL-checked (duckdb regexp_extract_all twin); the
LSH/signature families are rows-only (hash functions differ across
engines) with their accuracy asserted in tests/test_pipeline_ops.py.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .operators.dedup import (minhash_lsh_pairs, minhash_signatures,
                              simhash_near_duplicates)
from .operators.similarity import ann_topk_lsh
from .operators.text import (language_id, quality_scores, token_count_bpe,
                             winnowing_fingerprints)
from .queries import register


@register("token_count_bpe", r"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]'))
            AS BIGINT) AS n_bpe_tokens,
       CAST(len(regexp_split_to_array(text, '\s+')) AS BIGINT) AS n_ws_tokens
FROM documents
""")
def q_token_count_bpe(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return token_count_bpe(d, "doc_id", "text")


@register("quality_scores_full")  # rows-only: float regex ratios
def q_quality_scores(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return quality_scores(d, "doc_id", "text")


@register("language_id_heuristic")  # rows-only
def q_language_id(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return language_id(d, "doc_id", "text")


@register("minhash_lsh_near_dups")  # rows-only (murmur-based)
def q_minhash_lsh(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return (minhash_lsh_pairs(d, "doc_id", "text", k=5, num_perm=64,
                              bands=16, threshold=0.5)
            .orderBy("id_a", "id_b"))


@register("minhash_signatures_sample")  # rows-only
def q_minhash_signatures(spark, sf_dir):
    d = (spark.read.parquet(f"{sf_dir}/documents.parquet")
         .filter(F.col("doc_id") < 50))
    return minhash_signatures(d, "doc_id", "text", k=5, num_perm=32)


@register("simhash_near_dups")  # rows-only
def q_simhash(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return (simhash_near_duplicates(d, "doc_id", "text", max_hamming=3)
            .orderBy("id_a", "id_b"))


@register("ann_topk_lsh")  # rows-only (approximate by design)
def q_ann_lsh(spark, sf_dir):
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    first = e.orderBy("vec_id").first()
    qv = first["embedding"]
    return ann_topk_lsh(e.filter(F.col("vec_id") != first["vec_id"]), qv, k=10)


@register("winnowing_fingerprints_sample")  # rows-only
def q_winnowing(spark, sf_dir):
    d = (spark.read.parquet(f"{sf_dir}/documents.parquet")
         .filter(F.col("doc_id") < 50))
    return winnowing_fingerprints(d, "doc_id", "text")
