"""Kind-tagged (de)serialization dispatch for sketch states."""

from __future__ import annotations

import struct

from .bloom import BloomState
from .cms import CMSState
from .hll import HLLState
from .kll import KLLState
from .kmv import KMVState
from .mg import MGState
from .tdigest import TDigestState

_BY_MAGIC = {
    0x4B575342: BloomState,
    0x4B57484C: HLLState,
    0x4B57434D: CMSState,
    0x4B574B4C: KLLState,
    0x4B574454: TDigestState,
    0x4B574D47: MGState,
    0x4B574B56: KMVState,
}

_BY_KIND = {"bloom": BloomState, "hll": HLLState, "cms": CMSState,
            "kll": KLLState, "tdigest": TDigestState, "mg": MGState,
            "kmv": KMVState}


def state_from_bytes(data: bytes):
    """Decode any sketch state blob by its magic (crc-verified)."""
    (magic,) = struct.unpack_from("<I", data, 0)
    cls = _BY_MAGIC.get(magic)
    if cls is None:
        raise ValueError(f"unknown sketch magic 0x{magic:08x}")
    return cls.from_bytes(data)


def merge_state_blobs(blobs) -> bytes:
    """Fold serialized states by each kind's merge — associative core."""
    it = iter(blobs)
    acc = state_from_bytes(next(it))
    for b in it:
        acc.merge(state_from_bytes(b))
    return acc.to_bytes()
