"""Sketch-table merge / fold — ≙ merge_db (A13/O1) and the power-of-two
fold (A4) at DataFrame granularity.

KWAGE merges DB files pairwise smallest-first with param checks
(`merge_db.cpp:215-248,306-325`); in filter-major layout the same
operation is a unionByName + grouped state-merge, and Spark's shuffle
replaces the pairwise loop. Cross-size merges go through fold() first
(`make_bloom.cpp:344-354` semantics).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..kernels.bloom import BloomState
from ..kernels.registry import merge_state_blobs, state_from_bytes


def merge_grouped_states(partials: DataFrame, group_cols: list[str]) -> DataFrame:
    """groupBy(group_cols, kind) -> merged state rows (the UDAF merge stage)."""
    schema = partials.schema

    def merge_group(pdf: pd.DataFrame) -> pd.DataFrame:
        head = pdf.iloc[:1].copy()
        head["state"] = [merge_state_blobs(pdf["state"].tolist())]
        if "n_rows" in pdf:
            head["n_rows"] = int(pdf["n_rows"].sum())
        if "n_kgrams" in pdf:
            head["n_kgrams"] = int(pdf["n_kgrams"].sum())
        return head

    return (partials
            .groupBy(*group_cols, "kind")
            .applyInPandas(merge_group, schema=schema))


def merge_states_global(df: DataFrame, kind: str) -> DataFrame:
    """Tree-merge ALL states of one kind into a single row — the two-level
    distributed form of a global sketch union (A5 algebra): level 1 folds
    each partition's states into one partial (mapInPandas, executor-side);
    level 2 merges the ≤n_partitions partials in one tiny final task.

    Never funnels per-group blobs through the driver: at 10⁶ groups ×
    ~100 KB CMS states, level 1 reduces the final stage's input from
    ~100 GB to n_partitions rows."""
    src = (df.filter(F.col("kind") == kind)
           .select("kind", "state", "n_rows", "n_kgrams"))

    def partial(batches):
        acc, n_rows, n_kgrams = None, 0, 0
        for pdf in batches:
            if len(pdf) == 0:
                continue
            merged = merge_state_blobs(bytes(b) for b in pdf["state"])
            acc = (merged if acc is None
                   else merge_state_blobs([acc, merged]))
            n_rows += int(pdf["n_rows"].sum())
            n_kgrams += int(pdf["n_kgrams"].sum())
        if acc is not None:
            yield pd.DataFrame({"kind": [kind], "state": [acc],
                                "n_rows": [n_rows], "n_kgrams": [n_kgrams]})

    schema = "kind string, state binary, n_rows long, n_kgrams long"
    partials = src.mapInPandas(partial, schema=schema)
    return merge_grouped_states(partials, [])


def merge_sketch_tables(a: DataFrame, b: DataFrame, group_cols: list[str]) -> DataFrame:
    """Union two sketch tables and re-merge duplicate groups (A13/O1).

    Groups present in only one input pass through unchanged (empty ∪ X = X,
    `bloom.h:210-242`); groups in both get their states merged.
    """
    return merge_grouped_states(a.unionByName(b), group_cols)


def fold_bloom_table(df: DataFrame, target_log2_m: int) -> DataFrame:
    """OR-fold every Bloom state to 2^target bits (A4) — makes tables built
    at different filter sizes mergeable. Non-bloom rows pass through."""
    schema = df.schema

    def fold_batch(batches):
        for pdf in batches:
            is_bloom = pdf["kind"] == "bloom"
            if is_bloom.any():
                pdf = pdf.copy()
                pdf.loc[is_bloom, "state"] = [
                    BloomState.from_bytes(bytes(b)).fold(target_log2_m).to_bytes()
                    for b in pdf.loc[is_bloom, "state"]
                ]
            yield pdf

    return df.mapInPandas(fold_batch, schema=schema)


def verify_states(df: DataFrame) -> int:
    """Decode every state (crc32-checked) — ≙ KWAGE's build-time crc sweep
    (`build_db.cpp:144-159`). Returns number of rows verified; raises on
    corruption."""
    def check(batches):
        for pdf in batches:
            for b in pdf["state"]:
                state_from_bytes(bytes(b))
            yield pdf[[]].assign(ok=1)

    return df.mapInPandas(check, schema="ok int").count()
