"""Mergeable Misra-Gries frequent-items summary (numpy/dict, no Spark).

The frequent-items complement of the CMS point-query sketch (A2): a
bounded set of ``k`` counters that, after any sequence of adds and
merges, satisfies the classic guarantees (Misra & Gries 1982; merge
form per Agarwal et al., "Mergeable Summaries", PODS'12):

  * every item with true count > n_total / (k + 1) is present;
  * for every tracked item, true − err ≤ estimate ≤ true, where
    ``err = n_total − weight_sum`` is the total decremented mass,
    bounded by n_total / (k + 1) — and the bound COMPOSES under merge.

Merge = add counter maps, then decrement all by the (k+1)-th largest
value and drop non-positives — associative in its error guarantee
(counter VALUES may differ by merge order; the bounds never do), which
is what a tree-shaped distributed aggregation needs.

Serialization: little-endian header (magic, k, n_total, err, n_items) +
length-prefixed item bytes + int64 counts, crc32-checked.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_MAGIC = 0x4B574D47  # "KWMG"
_HDR = struct.Struct("<IIQQI")  # magic, k, n_total, err, n_items


class MGState:
    """One mergeable Misra-Gries summary over byte-string items."""

    __slots__ = ("k", "counters", "n_total", "err")

    def __init__(self, k: int, counters: dict[bytes, int] | None = None,
                 n_total: int = 0, err: int = 0):
        if k < 1:
            raise ValueError("k must be >= 1")
        self.k = k
        self.counters: dict[bytes, int] = counters or {}
        self.n_total = n_total
        self.err = err

    # --- build ---
    def add_items(self, items: list[bytes], counts: np.ndarray | None = None
                  ) -> "MGState":
        """Fold a batch of (item, count) pairs in — pre-aggregate the
        batch (np.unique / Counter) before calling for best throughput."""
        if counts is None:
            counts = np.ones(len(items), dtype=np.int64)
        c = self.counters
        for it, n in zip(items, counts):
            n = int(n)
            c[it] = c.get(it, 0) + n
            self.n_total += n
        self._shrink()
        return self

    def _shrink(self) -> None:
        if len(self.counters) <= self.k:
            return
        vals = np.fromiter(self.counters.values(), dtype=np.int64,
                           count=len(self.counters))
        # decrement everything by the (k+1)-th largest value; at most k
        # counters stay positive
        thr = int(np.partition(vals, -self.k - 1)[-self.k - 1])
        self.err += thr
        self.counters = {it: v - thr for it, v in self.counters.items()
                         if v - thr > 0}

    # --- merge ---
    def merge(self, other: "MGState") -> "MGState":
        if other.k != self.k:
            raise ValueError("merge requires equal k")
        c = self.counters
        for it, v in other.counters.items():
            c[it] = c.get(it, 0) + v
        self.n_total += other.n_total
        self.err += other.err
        self._shrink()
        return self

    # --- query ---
    def estimates(self) -> list[tuple[bytes, int, int]]:
        """(item, lower-bound estimate, max underestimate err) sorted by
        estimate descending then item — true count ∈ [est, est + err]."""
        return sorted(((it, v, self.err) for it, v in self.counters.items()),
                      key=lambda t: (-t[1], t[0]))

    # --- serialization ---
    def to_bytes(self) -> bytes:
        items = sorted(self.counters)  # canonical order for the crc
        body = b"".join(struct.pack("<I", len(it)) + it for it in items)
        cnts = np.asarray([self.counters[it] for it in items],
                          dtype="<i8").tobytes()
        payload = body + cnts
        hdr = _HDR.pack(_MAGIC, self.k, self.n_total, self.err, len(items))
        return hdr + payload + struct.pack("<I", zlib.crc32(hdr + payload))

    @staticmethod
    def from_bytes(data: bytes) -> "MGState":
        magic, k, n_total, err, n_items = _HDR.unpack_from(data, 0)
        if magic != _MAGIC:
            raise ValueError("bad MG state magic")
        if zlib.crc32(data[:-4]) != struct.unpack("<I", data[-4:])[0]:
            raise ValueError("MG state crc32 mismatch")
        off = _HDR.size
        items = []
        for _ in range(n_items):
            ln = struct.unpack_from("<I", data, off)[0]
            off += 4
            items.append(data[off:off + ln])
            off += ln
        cnts = np.frombuffer(data, dtype="<i8", count=n_items, offset=off)
        return MGState(k, dict(zip(items, (int(x) for x in cnts))),
                       n_total, err)
