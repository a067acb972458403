"""Mergeable KLL quantile-sketch kernel (numpy, no Spark).

The reference only sorts accessions by size (`bloom.h:521-525`) and applies
max-size policies (`README.md:224`); SURVEY A16 generalizes that to a real
quantile sketch over file sizes. This is the KLL sketch (Karnin, Lang,
Liberty, FOCS 2016): a hierarchy of compactors where level i items carry
weight 2^i and a full level is compacted by keeping every other item (in
sorted order) and promoting the survivors.

Determinism: instead of a random coin, each level keeps a compaction
counter and alternates parity (counter & 1). The KLL error analysis holds
for any unbiased coin sequence in expectation; alternating parity keeps
the sketch reproducible for a fixed insertion/merge order, and merge-order
variation is covered by the rank-error bound (tested), not state equality.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_MAGIC = 0x4B574B4C  # "KWKL"
_C = 2.0 / 3.0


class KLLState:
    __slots__ = ("k", "levels", "coins", "n_items")

    def __init__(self, k: int = 200, levels: list[np.ndarray] | None = None,
                 coins: list[int] | None = None, n_items: int = 0):
        if k < 8:
            raise ValueError("k must be >= 8")
        self.k = k
        self.levels: list[np.ndarray] = levels if levels is not None else [np.empty(0)]
        self.coins: list[int] = coins if coins is not None else [0] * len(self.levels)
        self.n_items = n_items

    # --- capacities ---
    def _cap(self, level: int) -> int:
        depth = len(self.levels) - 1 - level
        return max(2, int(np.ceil(self.k * (_C ** depth))))

    def _total_cap(self) -> int:
        return sum(self._cap(i) for i in range(len(self.levels)))

    def _size(self) -> int:
        return sum(a.shape[0] for a in self.levels)

    # --- build ---
    def add_values(self, values: np.ndarray) -> "KLLState":
        v = np.asarray(values, dtype=np.float64).ravel()
        if v.size:
            self.levels[0] = np.concatenate([self.levels[0], v])
            self.n_items += int(v.size)
            self._compress()
        return self

    def _compress(self) -> None:
        while self._size() > self._total_cap():
            for i in range(len(self.levels)):
                if self.levels[i].shape[0] > self._cap(i):
                    self._compact(i)
                    break
            else:
                break

    def _compact(self, i: int) -> None:
        if i + 1 == len(self.levels):
            self.levels.append(np.empty(0))
            self.coins.append(0)
        arr = np.sort(self.levels[i])
        offset = self.coins[i] & 1
        self.coins[i] += 1
        keep = arr[offset::2]
        self.levels[i] = np.empty(0)
        self.levels[i + 1] = np.concatenate([self.levels[i + 1], keep])

    # --- merge ---
    def merge(self, other: "KLLState") -> "KLLState":
        if other.k != self.k:
            raise ValueError("merge requires equal k")
        while len(self.levels) < len(other.levels):
            self.levels.append(np.empty(0))
            self.coins.append(0)
        for i, arr in enumerate(other.levels):
            if arr.shape[0]:
                self.levels[i] = np.concatenate([self.levels[i], arr])
            self.coins[i] ^= other.coins[i]
        self.n_items += other.n_items
        self._compress()
        return self

    # --- query ---
    def _weighted(self) -> tuple[np.ndarray, np.ndarray]:
        vals, wts = [], []
        for i, arr in enumerate(self.levels):
            if arr.shape[0]:
                vals.append(arr)
                wts.append(np.full(arr.shape[0], 1 << i, dtype=np.float64))
        if not vals:
            return np.empty(0), np.empty(0)
        v = np.concatenate(vals)
        w = np.concatenate(wts)
        order = np.argsort(v, kind="stable")
        return v[order], w[order]

    def quantile(self, q: float) -> float:
        v, w = self._weighted()
        if v.shape[0] == 0:
            return float("nan")
        cum = np.cumsum(w)
        target = q * cum[-1]
        idx = int(np.searchsorted(cum, target, side="left"))
        return float(v[min(idx, v.shape[0] - 1)])

    def quantiles(self, qs: list[float]) -> list[float]:
        return [self.quantile(q) for q in qs]

    def rank(self, x: float) -> float:
        """Estimated fraction of items <= x."""
        v, w = self._weighted()
        if v.shape[0] == 0:
            return float("nan")
        mask = v <= x
        return float(w[mask].sum() / w.sum())

    def eps(self) -> float:
        """Rank-error guideline ~ O(1/k) with small constants."""
        return 2.0 / self.k

    # --- serialization ---
    def to_bytes(self) -> bytes:
        payload = b"".join(a.astype(np.float64).tobytes() for a in self.levels)
        lens = np.asarray([a.shape[0] for a in self.levels], dtype=np.uint32)
        coins = np.asarray(self.coins, dtype=np.uint32)
        crc = zlib.crc32(payload)
        hdr = struct.pack("<IBxxxIIQ I", _MAGIC, 1, self.k, len(self.levels),
                          self.n_items, crc)
        return hdr + lens.tobytes() + coins.tobytes() + payload

    @staticmethod
    def from_bytes(data: bytes) -> "KLLState":
        hdr = struct.Struct("<IBxxxIIQ I")
        magic, ver, k, n_levels, n_items, crc = hdr.unpack_from(data, 0)
        if magic != _MAGIC:
            raise ValueError("bad kll state magic")
        off = hdr.size
        lens = np.frombuffer(data, dtype=np.uint32, count=n_levels, offset=off)
        off += 4 * n_levels
        coins = np.frombuffer(data, dtype=np.uint32, count=n_levels, offset=off)
        off += 4 * n_levels
        payload = data[off:]
        if zlib.crc32(payload) != crc:
            raise ValueError("kll state crc32 mismatch")
        levels, pos = [], 0
        flat = np.frombuffer(payload, dtype=np.float64)
        for n in lens:
            levels.append(flat[pos:pos + int(n)].copy())
            pos += int(n)
        return KLLState(k, levels, [int(c) for c in coins], n_items)
