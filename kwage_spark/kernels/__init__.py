"""Pure-numpy sketch kernels — unit-testable without Spark (SURVEY §7.1.1)."""

from .bloom import BloomParams, BloomState
from .cms import CMSState
from .hll import HLLState
from .kll import KLLState
from .murmur3 import murmur3_32, murmur3_32_multiseed, murmur3_64
from .shingle import shingle_hashes, shingle_hashes64, unique_query_hashes, windows_of

__all__ = [
    "BloomParams", "BloomState", "CMSState", "HLLState", "KLLState",
    "murmur3_32", "murmur3_32_multiseed", "murmur3_64",
    "shingle_hashes", "shingle_hashes64", "unique_query_hashes", "windows_of",
]
