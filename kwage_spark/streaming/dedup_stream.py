"""Streaming exact-dedup with Bloom-filter state — the sketch library
as STREAM STATE.

Documents stream in; the first occurrence of each content passes
through, later duplicates are dropped (the on-ingest dedup a
training-data pipeline runs before anything touches the corpus). State
per hash-bucket is a MERGEABLE BLOOM SKETCH (kernels/bloom.py) instead
of an ever-growing seen-set: O(2^log2_m) bits per bucket forever,
regardless of stream length — the property that makes the operator
viable over an unbounded 100-TB ingest.

Direction of error: a Bloom false positive drops a NEW document as a
duplicate — the safe direction for training data (losing one novel doc
is cheap; emitting dup training text is the failure that matters).
The per-bucket FP probability follows the published bound
(`bloom.cpp:47`, `BloomParams.fp_rate`); capacity-plan ``log2_m`` with
``BloomParams.optimal(expected_docs_per_bucket, p_target)``.

The same fold works in batch mode via groupBy().applyInPandas-style
processing, but batch exact dedup should use the hash-groupBy queries
(`dedup_exact_groups`) — this operator exists for the STREAMING
contract (bounded state + per-micro-batch emission).
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..kernels.bloom import BloomParams, BloomState
from ..kernels.murmur3 import murmur3_32_multiseed

OUT_SCHEMA = "doc_id long, content_sha256 string"
_STATE_SCHEMA = "state binary"

#: 2^20 bits = 128 KiB per bucket; ~10^5 docs/bucket at p <= 2.5e-3
DEFAULT_PARAMS = BloomParams(k=32, log2_m=20, num_hash=3)


def _digest_hashes(hex_hashes: pd.Series, params: BloomParams) -> np.ndarray:
    """(n, num_hash) uint32 murmur matrix over 32-byte sha256 digests —
    one kernel call per micro-batch group (digests are fixed-length, so
    no length bucketing is needed)."""
    mat = np.frombuffer(
        b"".join(bytes.fromhex(h) for h in hex_hashes),
        dtype=np.uint8).reshape(len(hex_hashes), 32)
    return murmur3_32_multiseed(mat, params.seeds)


def _fold_bucket(key: Tuple[Any, ...], pdfs: Iterator[pd.DataFrame],
                 state: GroupState, params: BloomParams
                 ) -> Iterator[pd.DataFrame]:
    bloom = (BloomState.from_bytes(bytes(state.get[0])) if state.exists
             else BloomState(params))
    rows = pd.concat(list(pdfs), ignore_index=True)
    if not len(rows):
        return
    # deterministic winner among same-content rows of one micro-batch:
    # smallest doc_id survives (cross-batch, the earlier batch wins)
    rows = (rows.sort_values("doc_id")
            .drop_duplicates(subset="content_sha256", keep="first"))
    hashes = _digest_hashes(rows["content_sha256"], params)
    seen = bloom.contains_hashes(hashes)
    fresh = rows[~seen]
    if len(fresh):
        bloom.add_hashes(hashes[~seen])
    state.update((bloom.to_bytes(),))
    if len(fresh):
        yield fresh[["doc_id", "content_sha256"]]


def dedup_stream(docs: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text", n_buckets: int = 64,
                 params: BloomParams = DEFAULT_PARAMS) -> DataFrame:
    """docs(id, text, …) streaming DataFrame → first-seen rows
    (doc_id, content_sha256). Content is keyed by sha256; rows shard
    across ``n_buckets`` state buckets by a JVM-side hash of the digest,
    so state stays balanced and each bucket's Bloom filter is
    independent (per-bucket FP bound applies to its own cardinality)."""
    def fold(key, pdfs, state):
        return _fold_bucket(key, pdfs, state, params)

    keyed = (docs
             .select(F.col(id_col).alias("doc_id"),
                     F.sha2(F.col(text_col).cast("binary"), 256)
                     .alias("content_sha256"))
             .withColumn("bucket",
                         F.pmod(F.xxhash64("content_sha256"),
                                F.lit(n_buckets)))
             .groupBy("bucket"))
    return keyed.applyInPandasWithState(
        fold,
        outputStructType=OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout)
