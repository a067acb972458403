"""Sketch ingest — the reference's maestro/worker build path (SURVEY §3.2)
re-expressed as a two-level Spark aggregation.

Scale design (the point of the whole exercise):

  stage 1  mapInPandas over the raw table: for every (group × Arrow batch)
           build a PARTIAL sketch state. This is the map-side combine — raw
           ``content`` never crosses the network; each partition emits at
           most (groups-in-partition × kinds) small binary states.
  stage 2  groupBy(group_cols, kind).applyInPandas: merge the partial
           states (bitwise-OR / max / add / compact — all associative and
           commutative, so shuffle order is irrelevant and the result is
           partitioning-invariant).

At 100 TB this shuffles only O(n_groups × state_size) bytes instead of the
corpus. Skew needs no salting: a mega-group's rows are combined into
partials wherever they already sit — the equivalent of KWAGE's per-worker
filter construction with MPI reduce (`bloom.h:118-128` anticipates exactly
this tree-merge). An optional ``repartition`` arg pre-spreads input only
when the upstream layout is pathological (e.g. one file per group).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import KIND_BLOOM, KIND_CMS, KIND_HLL, KIND_KLL, SketchConfig
from ..kernels.bloom import BloomState
from ..kernels.cms import CMSState
from ..kernels.hll import HLLState
from ..kernels.kll import KLLState
from ..kernels.murmur3 import murmur3_32_multiseed, murmur3_64
from ..kernels.shingle import windows_of
from .merge import merge_grouped_states


def _partial_states(cfg: SketchConfig, pdf: pd.DataFrame) -> list[dict]:
    """Build one partial state per (group, kind) from a pandas batch."""
    out: list[dict] = []
    gcols = list(cfg.group_cols)
    for key, g in pdf.groupby(gcols, sort=False):
        key = key if isinstance(key, tuple) else (key,)
        states: dict[str, object] = {}
        if KIND_BLOOM in cfg.kinds:
            states[KIND_BLOOM] = BloomState(cfg.bloom)
        if KIND_HLL in cfg.kinds:
            states[KIND_HLL] = HLLState(cfg.hll_p)
        if KIND_CMS in cfg.kinds:
            states[KIND_CMS] = CMSState(cfg.cms_log2_w, cfg.cms_depth)
        if KIND_KLL in cfg.kinds:
            states[KIND_KLL] = KLLState(cfg.kll_k)
        n_kgrams = 0
        sizes = []
        for content in g[cfg.content_col].to_numpy():
            w = windows_of(content, cfg.k)
            n_kgrams += int(w.shape[0])
            sizes.append(len(content))
            if w.shape[0]:
                if KIND_BLOOM in states:
                    states[KIND_BLOOM].add_hashes(
                        murmur3_32_multiseed(w, cfg.bloom.seeds))
                if KIND_HLL in states:
                    states[KIND_HLL].add_hashes64(murmur3_64(w))
                if KIND_CMS in states:
                    states[KIND_CMS].add_windows(w)
        if KIND_KLL in states:
            vals = (g[cfg.size_col].to_numpy(dtype=np.float64)
                    if cfg.size_col else np.asarray(sizes, dtype=np.float64))
            states[KIND_KLL].add_values(vals)
        for kind, st in states.items():
            row = dict(zip(gcols, key))
            row.update(kind=kind, state=st.to_bytes(),
                       n_rows=int(len(g)), n_kgrams=n_kgrams)
            out.append(row)
    return out


def sketch_schema(cfg: SketchConfig) -> str:
    keys = ", ".join(f"{c} string" for c in cfg.group_cols)
    return f"{keys}, kind string, state binary, n_rows long, n_kgrams long"


def build_sketches(df: DataFrame, cfg: SketchConfig,
                   repartition: int | None = None) -> DataFrame:
    """df(source_files) -> DataFrame[group_cols…, kind, state, n_rows, n_kgrams].

    Column-prunes to exactly the needed inputs before the UDF so the
    parquet scan reads only those columns.
    """
    cols = list(cfg.group_cols) + [cfg.content_col]
    if cfg.size_col:
        cols.append(cfg.size_col)
    src = df.select(*cols)
    if repartition:
        src = src.repartition(repartition)
    schema = sketch_schema(cfg)

    def gen_partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = _partial_states(cfg, pdf)
            if rows:
                yield pd.DataFrame(rows)

    partials = src.mapInPandas(gen_partials, schema=schema)
    return merge_grouped_states(partials, list(cfg.group_cols))


def sketch_metrics(sketches: DataFrame) -> DataFrame:
    """Ingest accounting ≙ running totals A14 (`maestro_main.cpp:956-983`)."""
    return (sketches
            .groupBy("kind")
            .agg(F.count("*").alias("n_groups"),
                 F.sum("n_rows").alias("n_rows"),
                 F.sum("n_kgrams").alias("n_kgrams"),
                 F.sum(F.length("state")).alias("state_bytes")))
