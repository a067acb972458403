"""Mergeable count-min sketch kernel (numpy, no Spark).

The reference's counting Bloom filter (`make_bloom.cpp:63-69,506-621`) is a
count-min sketch with 4-bit saturating counters used to enforce
``min_kmer_count`` (SURVEY A2); we build the proper form: a d x w uint64
counter matrix, point query = min over rows, merge = element-wise add
(associative + commutative, never underestimates).

Guarantee: overestimate <= eps * N with eps = e/w, at confidence
1 - e^-d (Cormode & Muthukrishnan 2005). Row r uses murmur seed r —
the same seed family as the Bloom filter, so the ingest path computes
ONE multi-lane hash pass shared by Bloom/HLL/CMS (cross-sketch
correlation is harmless; row-vs-row independence is what the CMS
bound needs, and each row has its own seed).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

from . import _native
from .murmur3 import murmur3_32_multiseed

_MAGIC = 0x4B57434D  # "KWCM"
_HDR = struct.Struct("<IBBBxIQI")  # magic, ver, log2_w, depth, pad, reserved, n_total, crc32

def cms_seeds(depth: int) -> np.ndarray:
    return np.arange(depth, dtype=np.uint32)


class CMSState:
    __slots__ = ("log2_w", "depth", "table", "n_total")

    def __init__(self, log2_w: int = 12, depth: int = 4,
                 table: np.ndarray | None = None, n_total: int = 0):
        if not (4 <= log2_w <= 24):
            raise ValueError("log2_w must be in [4,24]")
        if not (1 <= depth <= 8):
            raise ValueError("depth must be in [1,8]")
        self.log2_w = log2_w
        self.depth = depth
        self.table = (np.zeros((depth, 1 << log2_w), dtype=np.uint64)
                      if table is None else table)
        self.n_total = n_total

    @property
    def w(self) -> int:
        return 1 << self.log2_w

    def add_hashes(self, hashes: np.ndarray,
                   counts: np.ndarray | None = None) -> "CMSState":
        """Add pre-hashed items: (n, >=depth) uint32 lanes (seed r = r)."""
        if hashes.shape[0]:
            if (counts is None and _native.HAVE_NATIVE
                    and hashes.dtype == np.uint32 and hashes.ndim == 2
                    and hashes.strides[1] == 4 and hashes.strides[0] % 4 == 0
                    and hashes.shape[1] >= self.depth):
                _native.cms_update(self.table, self.log2_w, hashes)
                self.n_total += int(hashes.shape[0])
                return self
            idx = hashes[:, : self.depth] & np.uint32(self.w - 1)
            c = (None if counts is None else counts.astype(np.int64))
            for r in range(self.depth):
                # bincount is a vectorized histogram — far faster than the
                # scalar read-modify-write loop of np.add.at
                binc = np.bincount(idx[:, r].astype(np.int64),
                                   weights=c, minlength=self.w)
                self.table[r] += binc.astype(np.uint64)
            self.n_total += int(hashes.shape[0] if counts is None
                                else counts.sum())
        return self

    def add_windows(self, windows: np.ndarray, counts: np.ndarray | None = None) -> "CMSState":
        """Add (n, k) uint8 byte windows, each with optional multiplicity."""
        if windows.shape[0] == 0:
            return self
        return self.add_hashes(
            murmur3_32_multiseed(windows, cms_seeds(self.depth)), counts)

    def query_hashes(self, hashes: np.ndarray) -> np.ndarray:
        """Point-frequency estimates from pre-hashed lanes — min over rows."""
        if hashes.shape[0] == 0:
            return np.zeros(0, dtype=np.uint64)
        idx = (hashes[:, : self.depth] & np.uint32(self.w - 1)).astype(np.int64)
        ests = np.stack([self.table[r][idx[:, r]] for r in range(self.depth)])
        return ests.min(axis=0)

    def query_windows(self, windows: np.ndarray) -> np.ndarray:
        """Point-frequency estimates, (n,) uint64 — min over rows."""
        if windows.shape[0] == 0:
            return np.zeros(0, dtype=np.uint64)
        return self.query_hashes(
            murmur3_32_multiseed(windows, cms_seeds(self.depth)))

    def merge(self, other: "CMSState") -> "CMSState":
        if (other.log2_w, other.depth) != (self.log2_w, self.depth):
            raise ValueError("merge requires identical (w, depth)")
        self.table += other.table
        self.n_total += other.n_total
        return self

    def eps(self) -> float:
        return np.e / self.w

    def to_bytes(self) -> bytes:
        crc = zlib.crc32(self.table.tobytes())
        return (_HDR.pack(_MAGIC, 1, self.log2_w, self.depth, 0, self.n_total, crc)
                + self.table.tobytes())

    @staticmethod
    def from_bytes(data: bytes) -> "CMSState":
        magic, ver, log2_w, depth, _res, n_total, crc = _HDR.unpack_from(data, 0)
        if magic != _MAGIC:
            raise ValueError("bad cms state magic")
        flat = np.frombuffer(data, dtype=np.uint64, offset=_HDR.size).copy()
        if zlib.crc32(flat.tobytes()) != crc:
            raise ValueError("cms state crc32 mismatch")
        return CMSState(log2_w, depth, flat.reshape(depth, 1 << log2_w), n_total)

    def __eq__(self, other: object) -> bool:
        return (isinstance(other, CMSState) and self.log2_w == other.log2_w
                and self.depth == other.depth
                and bool(np.array_equal(self.table, other.table)))
