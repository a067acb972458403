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

    def add_hashes64(self, hashes: np.ndarray) -> "HLLState":
        """Vectorized register update for a (n,) uint64 hash array."""
        if hashes.size:
            h = hashes.astype(np.uint64)
            idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
            rest = h << np.uint64(self.p)  # low 64-p bits shifted to the top
            # rho = #leading zeros of `rest` (within 64-p bits) + 1
            # leading zeros via bit_length on the shifted value
            nz = rest != 0
            rho = np.full(h.shape, 64 - self.p + 1, dtype=np.uint8)
            if nz.any():
                # floor(log2(rest)) = highest-set-bit index, by binary descent
                v = rest[nz].copy()
                bl = np.zeros(v.shape, dtype=np.int64)
                for shift in (32, 16, 8, 4, 2, 1):
                    big = v >= (np.uint64(1) << np.uint64(shift))
                    bl[big] += shift
                    v[big] >>= np.uint64(shift)
                rho_nz = (63 - bl) + 1  # leading zeros + 1
                rho[nz] = np.minimum(rho_nz, 64 - self.p + 1).astype(np.uint8)
            np.maximum.at(self.registers, idx, rho)
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
