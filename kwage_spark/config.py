"""Sketch pipeline configuration — the public 'plan' surface.

The reference has no query IR; its only plan objects are BloomParam +
option structs (SURVEY §3). Likewise our API is a small config compiled
directly into DataFrame operations, with Catalyst doing the optimization.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from .kernels.bloom import BloomParams

KIND_BLOOM = "bloom"
KIND_HLL = "hll"
KIND_CMS = "cms"
KIND_KLL = "kll"
KIND_TDIGEST = "tdigest"
KIND_KMV = "kmv"
# default build set; tdigest (tail-accurate quantiles) and kmv (bottom-k
# distinct sample enabling set-operation estimates between groups) are
# opt-in — request via kinds=(..., "tdigest") / (..., "kmv")
ALL_KINDS = (KIND_BLOOM, KIND_HLL, KIND_CMS, KIND_KLL)


@dataclass(frozen=True)
class SketchConfig:
    """Which sketches to build, over which grouping, from which column.

    Filter size is FIXED per config (not per-group adaptive like
    `bloom.cpp:10-68`) so that cross-group and cross-partition merges stay
    exact; cross-config merges go through the power-of-two fold
    (SURVEY §7.3 'Mergeability vs adaptive sizing').
    """

    group_cols: tuple[str, ...] = ("repo", "lang")
    content_col: str = "content"
    size_col: str | None = None          # numeric column for KLL (default: content length)
    # columns captured into a per-group `meta map<string,string>` at ingest
    # (FilterInfo analog, `bloom.h:474-537`): the group's FIRST row wins,
    # and merges keep the first non-null map — lineage/debug metadata, not
    # an aggregate. Empty tuple (default) omits the column entirely.
    meta_cols: tuple[str, ...] = ()
    kinds: tuple[str, ...] = ALL_KINDS
    bloom: BloomParams = field(default_factory=lambda: BloomParams(k=8, log2_m=16, num_hash=3))
    hll_p: int = 12
    cms_log2_w: int = 12
    cms_depth: int = 4
    kll_k: int = 200
    tdigest_delta: int = 100
    kmv_k: int = 256

    @property
    def k(self) -> int:
        return self.bloom.k
