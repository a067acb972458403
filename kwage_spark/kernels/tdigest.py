"""Mergeable t-digest quantile-sketch kernel (numpy, no Spark).

Companion to KLL (SURVEY A16) for the same role — distribution sketches
over file sizes — with complementary strengths: t-digest has much lower
relative error in the tails (q near 0 or 1), which is what a max-size
admission policy like the reference's `--max-size` guard (`README.md:224`,
F6) actually queries.

This is the MergingDigest of Dunning & Ertl ("Computing extremely
accurate quantiles using t-digests", 2019): centroids (mean, weight)
kept sorted by mean; an insert/merge pass re-clusters greedily left to
right, capping each cluster by the scale-function budget
    k1(q) = delta/(2*pi) * asin(2q - 1)
so clusters are tiny near the extremes and O(n/delta) in the middle.
Merging two digests = merge centroid lists + one re-cluster pass; the
operation is associative/commutative up to the documented rank-error
bound (like KLL, byte-stability across partitionings is NOT guaranteed —
estimates are, and tests assert the bound, not the bytes).

Everything is vectorized numpy except the single greedy re-cluster loop,
which runs over at most O(delta) + batch centroids, not raw items.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_MAGIC = 0x4B574454  # "KWDT"


def _k1(q: np.ndarray | float, delta: float):
    return delta / (2.0 * np.pi) * np.arcsin(2.0 * np.asarray(q) - 1.0)


class TDigestState:
    __slots__ = ("delta", "means", "weights", "n_items", "_buf")

    def __init__(self, delta: int = 100,
                 means: np.ndarray | None = None,
                 weights: np.ndarray | None = None,
                 n_items: int = 0):
        if delta < 10:
            raise ValueError("delta must be >= 10")
        self.delta = int(delta)
        self.means = np.empty(0) if means is None else means
        self.weights = np.empty(0) if weights is None else weights
        self.n_items = n_items
        self._buf: list[tuple[np.ndarray, np.ndarray]] = []

    # --- build ---
    def add_values(self, values: np.ndarray) -> "TDigestState":
        v = np.asarray(values, dtype=np.float64).ravel()
        if v.size:
            self._buf.append((v, np.ones(v.shape[0])))
            self.n_items += int(v.size)
            # re-cluster lazily once the buffer outgrows the digest
            if sum(b[0].shape[0] for b in self._buf) >= 4 * self.delta:
                self._flush()
        return self

    def _flush(self) -> None:
        if not self._buf:
            return
        means = np.concatenate([self.means] + [b[0] for b in self._buf])
        weights = np.concatenate([self.weights] + [b[1] for b in self._buf])
        self._buf = []
        order = np.argsort(means, kind="stable")
        means, weights = means[order], weights[order]
        total = weights.sum()
        # greedy left-to-right clustering under the k1 budget
        out_m: list[float] = []
        out_w: list[float] = []
        acc_m, acc_w, q_left = float(means[0]), float(weights[0]), 0.0
        k_left = float(_k1(0.0, self.delta))
        for m, w in zip(means[1:].tolist(), weights[1:].tolist()):
            q_new = (q_left * total + acc_w + w) / total
            if float(_k1(min(q_new, 1.0), self.delta)) - k_left <= 1.0:
                acc_m += (m - acc_m) * (w / (acc_w + w))
                acc_w += w
            else:
                out_m.append(acc_m)
                out_w.append(acc_w)
                q_left += acc_w / total
                k_left = float(_k1(min(q_left, 1.0), self.delta))
                acc_m, acc_w = m, w
        out_m.append(acc_m)
        out_w.append(acc_w)
        self.means = np.asarray(out_m)
        self.weights = np.asarray(out_w)

    # --- merge ---
    def merge(self, other: "TDigestState") -> "TDigestState":
        if other.delta != self.delta:
            raise ValueError("merge requires equal delta")
        other._flush()
        if other.means.shape[0]:
            self._buf.append((other.means.copy(), other.weights.copy()))
            self.n_items += other.n_items
            self._flush()
        return self

    # --- query ---
    def quantile(self, q: float) -> float:
        self._flush()
        if self.means.shape[0] == 0:
            return float("nan")
        if self.means.shape[0] == 1:
            return float(self.means[0])
        cum = np.cumsum(self.weights) - self.weights / 2.0
        target = q * self.weights.sum()
        return float(np.interp(target, cum, self.means))

    def quantiles(self, qs: list[float]) -> list[float]:
        return [self.quantile(q) for q in qs]

    def rank(self, x: float) -> float:
        self._flush()
        if self.means.shape[0] == 0:
            return float("nan")
        cum = np.cumsum(self.weights) - self.weights / 2.0
        return float(np.interp(x, self.means, cum) / self.weights.sum())

    # --- serialization ---
    def to_bytes(self) -> bytes:
        self._flush()
        payload = (self.means.astype(np.float64).tobytes()
                   + self.weights.astype(np.float64).tobytes())
        crc = zlib.crc32(payload)
        hdr = struct.pack("<IBxxxIIQI", _MAGIC, 1, self.delta,
                          self.means.shape[0], self.n_items, crc)
        return hdr + payload

    @staticmethod
    def from_bytes(data: bytes) -> "TDigestState":
        hdr = struct.Struct("<IBxxxIIQI")
        magic, ver, delta, n_c, n_items, crc = hdr.unpack_from(data, 0)
        if magic != _MAGIC:
            raise ValueError("bad tdigest state magic")
        payload = data[hdr.size:]
        if zlib.crc32(payload) != crc:
            raise ValueError("tdigest state crc32 mismatch")
        flat = np.frombuffer(payload, dtype=np.float64)
        return TDigestState(delta, flat[:n_c].copy(), flat[n_c:2 * n_c].copy(),
                            n_items)
