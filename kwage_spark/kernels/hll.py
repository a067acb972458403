"""Mergeable HyperLogLog kernel (numpy, no Spark).

The reference tracks an approximate distinct k-mer count (`num_kmer`,
`make_bloom.cpp:560-565`) to size its filters; we generalize that to a
proper HLL sketch (SURVEY A15). 64-bit input hashes; register index from
the top ``p`` bits, rho from the remaining 64-p bits. Merge is
element-wise max — associative, commutative, idempotent.

Standard error ~= 1.04 / sqrt(2^p); linear-counting correction applied in
the small range (Flajolet et al., HyperLogLog, AofA 2007).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

from . import _native

_MAGIC = 0x4B57484C  # "KWHL"
_HDR = struct.Struct("<IBBxxQI")  # magic, ver, p, pad2, n_items, crc32


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


class HLLState:
    __slots__ = ("p", "registers", "n_items")

    def __init__(self, p: int = 12, registers: np.ndarray | None = None, n_items: int = 0):
        if not (4 <= p <= 18):
            raise ValueError("p must be in [4,18]")
        self.p = p
        self.registers = np.zeros(1 << p, dtype=np.uint8) if registers is None else registers
        self.n_items = n_items

    @property
    def m(self) -> int:
        return 1 << self.p

    def add_hash_lanes(self, lanes: np.ndarray) -> "HLLState":
        """Update from a row-major uint32 hash-lane matrix (>=2 lanes);
        the 64-bit hash is lanes[0] << 32 | lanes[1]. Native fast path;
        falls back to composing and calling add_hashes64."""
        if lanes.shape[0] == 0:
            return self
        if (_native.HAVE_NATIVE and lanes.dtype == np.uint32
                and lanes.strides[1] == 4 and lanes.strides[0] % 4 == 0):
            _native.hll_update(self.registers, self.p, lanes)
            self.n_items += int(lanes.shape[0])
            return self
        h64 = ((lanes[:, 0].astype(np.uint64) << np.uint64(32))
               | lanes[:, 1].astype(np.uint64))
        return self.add_hashes64(h64)

    def add_hashes64(self, hashes: np.ndarray) -> "HLLState":
        """Vectorized register update for a (n,) uint64 hash array.

        rho (leading zeros of the post-index bits, +1) comes from exact
        float64 log2 on 32-bit halves (a uint32 converts to float64
        losslessly, so floor(log2(x)) truncates exactly — the same is NOT
        true for uint64). The per-register max avoids np.maximum.at (a
        scalar read-modify-write loop, ~100x slower than a histogram):
        bincount over the combined key idx*64+rho gives an (m, 64)
        presence matrix whose per-row argmax is the new register value.
        """
        if hashes.size:
            h = np.ascontiguousarray(hashes, dtype=np.uint64)
            cap = 64 - self.p + 1
            idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
            rest = h << np.uint64(self.p)  # low 64-p bits shifted to the top
            hi = (rest >> np.uint64(32)).astype(np.uint32)
            # fast path assumes hi != 0 (P[hi==0] = 2^-32); the rare
            # exceptions are patched in a tiny second pass
            bl = 32 + np.log2(np.maximum(hi, np.uint32(1))
                              .astype(np.float64)).astype(np.int64)
            zs = np.nonzero(hi == 0)[0]
            if zs.size:
                lo_z = (rest[zs] & np.uint64(0xFFFFFFFF)).astype(np.uint32)
                bl[zs] = np.where(
                    lo_z != 0,
                    np.log2(np.maximum(lo_z, np.uint32(1))
                            .astype(np.float64)).astype(np.int64),
                    np.int64(-1))
            rho = np.minimum(64 - 1 - bl + 1, cap)   # bl=-1 (rest==0) -> cap
            key = idx * np.int64(64) + rho           # rho in [1, 57] < 64
            pres = (np.bincount(key, minlength=self.m * 64)
                    .reshape(self.m, 64) != 0)
            batch_max = 63 - np.argmax(pres[:, ::-1], axis=1)
            batch_max[~pres.any(axis=1)] = 0
            np.maximum(self.registers, batch_max.astype(np.uint8),
                       out=self.registers)
        self.n_items += int(hashes.shape[0])
        return self

    def merge(self, other: "HLLState") -> "HLLState":
        if other.p != self.p:
            raise ValueError("merge requires equal precision")
        np.maximum(self.registers, other.registers, out=self.registers)
        self.n_items += other.n_items
        return self

    def estimate(self) -> float:
        m = self.m
        inv = np.ldexp(1.0, -self.registers.astype(np.int32))
        e = _alpha(m) * m * m / inv.sum()
        if e <= 2.5 * m:
            v = int((self.registers == 0).sum())
            if v:
                return m * np.log(m / v)
        return float(e)

    def rel_error(self) -> float:
        return 1.04 / np.sqrt(self.m)

    def to_bytes(self) -> bytes:
        crc = zlib.crc32(self.registers.tobytes())
        return _HDR.pack(_MAGIC, 1, self.p, self.n_items, crc) + self.registers.tobytes()

    @staticmethod
    def from_bytes(data: bytes) -> "HLLState":
        magic, ver, p, n_items, crc = _HDR.unpack_from(data, 0)
        if magic != _MAGIC:
            raise ValueError("bad hll state magic")
        regs = np.frombuffer(data, dtype=np.uint8, offset=_HDR.size).copy()
        if zlib.crc32(regs.tobytes()) != crc:
            raise ValueError("hll state crc32 mismatch")
        return HLLState(p, regs, n_items)

    def __eq__(self, other: object) -> bool:
        return (isinstance(other, HLLState) and self.p == other.p
                and bool(np.array_equal(self.registers, other.registers)))
