"""Count-Min sketch (Cormode & Muthukrishnan 2005) as a mergeable UDAF
kernel: depth x width int64 counter matrix; merge = element-wise sum.

Guarantee: ``true <= estimate <= true + eps * N`` with probability
``1 - delta`` where ``width = ceil(e / eps)`` and ``depth =
ceil(ln(1/delta))``.  Input contract: int64 hashed keys (see
``aggregate.encode_tokens``); row hashes are derived via splitmix64 with
per-row seeds.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from mgspark.sketches.base import MergeableSketch, splitmix64

__all__ = ["CountMinSketch"]


class CountMinSketch(MergeableSketch):
    name = "cms"

    def __init__(self, eps: float = 1e-4, delta: float = 1e-3):
        self.eps = eps
        self.delta = delta
        self.width = int(math.ceil(math.e / eps))
        self.depth = int(math.ceil(math.log(1 / delta)))
        # Fixed odd per-row seeds keep rows pairwise independent-ish while
        # staying deterministic across partitions (mergeability requires
        # identical hash functions everywhere).
        self._seeds = (np.arange(self.depth, dtype=np.int64) * 2 + 1) * np.int64(
            0x9E3779B97F4A7C15 & 0x7FFFFFFFFFFFFFFF
        )

    def zero(self) -> np.ndarray:
        return np.zeros((self.depth, self.width), dtype=np.int64)

    def _indices(self, keys: np.ndarray) -> np.ndarray:
        """(depth, n) bucket indices for int64 keys."""
        out = np.empty((self.depth, len(keys)), dtype=np.int64)
        for j in range(self.depth):
            out[j] = (splitmix64(keys ^ self._seeds[j]) % np.uint64(self.width)).astype(
                np.int64
            )
        return out

    def build(self, state: np.ndarray, values: pd.Series) -> np.ndarray:
        keys = values.to_numpy(dtype=np.int64, na_value=0)
        if len(keys) == 0:
            return state
        # Pre-aggregate the batch: one scatter-add per distinct key.
        uniq, counts = np.unique(keys, return_counts=True)
        idx = self._indices(uniq)
        for j in range(self.depth):
            np.add.at(state[j], idx[j], counts)
        return state

    def merge(self, a: np.ndarray, b: np.ndarray) -> np.ndarray:
        return a + b

    def serialize(self, state: np.ndarray) -> bytes:
        return state.tobytes()

    def deserialize(self, blob: bytes) -> np.ndarray:
        return (
            np.frombuffer(blob, dtype=np.int64).reshape(self.depth, self.width).copy()
        )

    def estimate(self, state: np.ndarray, keys: np.ndarray) -> np.ndarray:
        """Point-frequency estimates for int64 ``keys`` (vectorized)."""
        keys = np.asarray(keys, dtype=np.int64)
        idx = self._indices(keys)
        ests = np.stack([state[j][idx[j]] for j in range(self.depth)])
        return ests.min(axis=0)
