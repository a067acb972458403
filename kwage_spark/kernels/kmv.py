"""Mergeable KMV / bottom-k distinct sketch (numpy, no Spark).

The set-operation sketch the HLL lacks: keep the k smallest 64-bit item
hashes (a deduplicated sorted set). Because the state is a pure function
of the item SET, it is order- and partitioning-INVARIANT — merge in any
tree shape yields byte-identical states (unlike HLL register arrays only
estimates agree; here the bytes do). That gives:

  * distinct-count estimate: exact below k items, else the classic KMV
    estimator (k−1) / U(k) with U(k) = kth-min hash / 2^64
    (Bar-Yossef et al. 2002; Beyer et al., "On Synopses for
    Distinct-Value Estimation Under Multiset Operations", SIGMOD'07);
  * set operations: union = merge; Jaccard(a, b) estimated from the
    bottom-k of the union (the fraction of those minima present in both
    sketches), intersection ≈ J · |a ∪ b| — the audience-overlap /
    corpus-overlap primitive.

Relative error of the distinct estimate is O(1/√k). Hashing is the
murmur3_64 composition used by the dedup family.

Serialization: little-endian header (magic, k, n_hashes) + uint64
hashes, crc32-checked — same discipline as the other sketch states.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

from .murmur3 import murmur3_64

_MAGIC = 0x4B574B56  # "KWKV"
_HDR = struct.Struct("<III")  # magic, k, n_hashes
# hash = murmur32(seed 0) << 32 | murmur32(seed 1) — the SAME two lanes
# the ingest path's shared hash matrix carries (and HLL composes), so a
# KMV state built from hash_items and one built from add_hash_lanes
# agree on identical byte strings
_SEED_HI, _SEED_LO = 0, 1


def hash_items(items: list[bytes]) -> np.ndarray:
    """uint64 murmur of each byte string at its exact length (grouped by
    length so padding never enters the hash)."""
    out = np.empty(len(items), dtype=np.uint64)
    lens = np.fromiter((len(b) for b in items), dtype=np.int64,
                       count=len(items))
    for L in np.unique(lens):
        idx = np.nonzero(lens == L)[0]
        arr = (np.zeros((idx.size, 0), dtype=np.uint8) if L == 0 else
               np.frombuffer(b"".join(items[i] for i in idx),
                             dtype=np.uint8).reshape(idx.size, L))
        out[idx] = murmur3_64(arr, _SEED_HI, _SEED_LO)
    return out


class KMVState:
    """Bottom-k sketch of a set of uint64 hashes."""

    __slots__ = ("k", "hashes")

    def __init__(self, k: int, hashes: np.ndarray | None = None):
        if k < 2:
            raise ValueError("k must be >= 2")
        self.k = k
        self.hashes = (np.empty(0, dtype=np.uint64) if hashes is None
                       else hashes)

    def add_hashes(self, h: np.ndarray) -> "KMVState":
        self.hashes = np.unique(
            np.concatenate([self.hashes, h.astype(np.uint64)]))[: self.k]
        return self

    def add_hash_lanes(self, H: np.ndarray) -> "KMVState":
        """Ingest-path feed: compose lanes 0 and 1 of the shared
        (n, lanes) uint32 hash matrix into the 64-bit item hash —
        identical to hash_items on the same byte strings."""
        h64 = ((H[:, 0].astype(np.uint64) << np.uint64(32))
               | H[:, 1].astype(np.uint64))
        return self.add_hashes(h64)

    def merge(self, other: "KMVState") -> "KMVState":
        if other.k != self.k:
            raise ValueError("merge requires equal k")
        return self.add_hashes(other.hashes)

    # --- estimates ---
    def distinct_estimate(self) -> float:
        if self.hashes.size < self.k:
            return float(self.hashes.size)  # exact below capacity
        u_k = (float(self.hashes[self.k - 1]) + 1.0) / 2.0**64
        return (self.k - 1) / u_k

    @staticmethod
    def jaccard(a: "KMVState", b: "KMVState") -> float:
        """J(A, B) from the bottom-k of the union: the fraction of the
        union's minima present in BOTH sketches (each union minimum
        below both sketches' thresholds is guaranteed tracked by any
        sketch whose set contains it)."""
        if a.k != b.k:
            raise ValueError("jaccard requires equal k")
        union = np.unique(np.concatenate([a.hashes, b.hashes]))[: a.k]
        if union.size == 0:
            return 0.0
        both = np.intersect1d(a.hashes, b.hashes, assume_unique=True)
        return float(np.isin(union, both, assume_unique=True).sum()
                     / union.size)

    @staticmethod
    def intersection_estimate(a: "KMVState", b: "KMVState") -> float:
        union = KMVState(a.k).merge(a).merge(b)
        return KMVState.jaccard(a, b) * union.distinct_estimate()

    # --- serialization ---
    def to_bytes(self) -> bytes:
        body = np.ascontiguousarray(self.hashes.astype("<u8")).tobytes()
        hdr = _HDR.pack(_MAGIC, self.k, self.hashes.size)
        return hdr + body + struct.pack("<I", zlib.crc32(hdr + body))

    @staticmethod
    def from_bytes(data: bytes) -> "KMVState":
        magic, k, n = _HDR.unpack_from(data, 0)
        if magic != _MAGIC:
            raise ValueError("bad KMV state magic")
        if zlib.crc32(data[:-4]) != struct.unpack("<I", data[-4:])[0]:
            raise ValueError("KMV state crc32 mismatch")
        h = np.frombuffer(data, dtype="<u8", count=n,
                          offset=_HDR.size).astype(np.uint64)
        return KMVState(k, h.copy())

    def __eq__(self, other: object) -> bool:
        return (isinstance(other, KMVState) and self.k == other.k
                and bool(np.array_equal(self.hashes, other.hashes)))
