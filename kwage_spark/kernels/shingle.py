"""k-gram shingling of file content (numpy, no Spark).

The reference digests DNA into 2-bit-packed canonical k-mers
(`word.h:73-104,161-168`); for source code there is no reverse complement,
so a k-gram is simply a k-byte window of the UTF-8 content and we hash the
raw bytes, mirroring the reference's string-input hash path
(`hash.cpp:114-170`). A string shorter than k yields zero k-grams — the
empty-query guard (`kwage.cpp:366-371`, F7/F10 in SURVEY §2).
"""

from __future__ import annotations

import numpy as np
from numpy.lib.stride_tricks import sliding_window_view

from .murmur3 import murmur3_32_multiseed, murmur3_64


def windows_of(content: str | bytes, k: int) -> np.ndarray:
    """All k-byte windows of content, shape (n_kgrams, k) uint8 (view)."""
    raw = content.encode("utf-8", "surrogatepass") if isinstance(content, str) else content
    arr = np.frombuffer(raw, dtype=np.uint8)
    if arr.shape[0] < k:
        return np.empty((0, k), dtype=np.uint8)
    return sliding_window_view(arr, k)


def shingle_hashes(content: str | bytes, k: int, seeds: np.ndarray) -> np.ndarray:
    """uint32 hashes of every k-gram for every seed, shape (n, len(seeds))."""
    w = windows_of(content, k)
    if w.shape[0] == 0:
        return np.empty((0, len(seeds)), dtype=np.uint32)
    return murmur3_32_multiseed(w, seeds)


def shingle_hashes64(content: str | bytes, k: int) -> np.ndarray:
    """uint64 k-gram hashes (for HLL / dedup), shape (n,)."""
    w = windows_of(content, k)
    if w.shape[0] == 0:
        return np.empty((0,), dtype=np.uint64)
    return murmur3_64(w)


def unique_query_hashes(content: str | bytes, k: int, seeds: np.ndarray) -> np.ndarray:
    """Deduplicated query k-gram hash matrix (Q1: `kwage.cpp:351-366`).

    The reference sorts + uniques query k-mers before probing so match
    counts are over *unique* query k-grams; we dedupe the windows
    (byte-wise) then hash. Shape (n_unique, len(seeds)).
    """
    w = windows_of(content, k)
    if w.shape[0] == 0:
        return np.empty((0, len(seeds)), dtype=np.uint32)
    uniq = np.unique(w, axis=0)
    return murmur3_32_multiseed(uniq, seeds)
