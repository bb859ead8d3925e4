"""KLL quantile sketch (Karnin, Lang, Liberty 2016) as a mergeable UDAF
kernel.

State: list of level buffers; level h items carry weight 2^h.  Level
capacities shrink geometrically (c^(H-h) * k); when total size exceeds
the budget, the lowest over-capacity level is compacted — sorted, then
every other item (deterministic alternating offset) promoted to the next
level.  Merge = level-wise concatenation + compaction (rank-error bound
preserved; classic mergeable-summaries result).
"""

from __future__ import annotations

import io

import numpy as np
import pandas as pd

from mgspark.sketches.base import MergeableSketch

__all__ = ["KLLSketch"]

_C = 2.0 / 3.0


class KLLSketch(MergeableSketch):
    name = "kll"

    def __init__(self, k: int = 200):
        self.k = k

    def zero(self) -> list[np.ndarray]:
        return [np.empty(0, dtype=np.float64)]

    def _capacity(self, level: int, num_levels: int) -> int:
        return max(2, int(np.ceil(self.k * _C ** (num_levels - 1 - level))))

    def _total_capacity(self, num_levels: int) -> int:
        return sum(self._capacity(h, num_levels) for h in range(num_levels))

    def _compact(self, levels: list[np.ndarray]) -> list[np.ndarray]:
        while sum(len(b) for b in levels) > self._total_capacity(len(levels)):
            for h in range(len(levels)):
                if len(levels[h]) > self._capacity(h, len(levels)):
                    buf = np.sort(levels[h])
                    # Odd count: one item stays behind so total weight is
                    # conserved exactly (2 * promoted == compacted items).
                    even = 2 * (len(buf) // 2)
                    leftover = buf[even:]
                    # Deterministic alternating offset: unbiased over many
                    # compactions, reproducible across runs.
                    offset = (len(buf) + h) % 2
                    promoted = buf[offset:even:2]
                    levels[h] = leftover.copy()
                    if h + 1 == len(levels):
                        levels.append(promoted.copy())
                    else:
                        levels[h + 1] = np.concatenate([levels[h + 1], promoted])
                    break
            else:
                break
        return levels

    def build(self, state: list[np.ndarray], values: pd.Series) -> list[np.ndarray]:
        x = values.to_numpy(dtype=np.float64, na_value=np.nan)
        x = x[~np.isnan(x)]
        if len(x) == 0:
            return state
        state = [b.copy() for b in state]
        state[0] = np.concatenate([state[0], x])
        return self._compact(state)

    def merge(self, a: list[np.ndarray], b: list[np.ndarray]) -> list[np.ndarray]:
        levels = []
        for h in range(max(len(a), len(b))):
            bufs = []
            if h < len(a):
                bufs.append(a[h])
            if h < len(b):
                bufs.append(b[h])
            levels.append(np.concatenate(bufs) if bufs else np.empty(0, dtype=np.float64))
        return self._compact(levels)

    def serialize(self, state: list[np.ndarray]) -> bytes:
        buf = io.BytesIO()
        np.savez(buf, n=np.int64(len(state)), **{f"l{h}": b for h, b in enumerate(state)})
        return buf.getvalue()

    def deserialize(self, blob: bytes) -> list[np.ndarray]:
        with np.load(io.BytesIO(blob)) as z:
            return [z[f"l{h}"].copy() for h in range(int(z["n"]))]

    def _items_weights(self, state) -> tuple[np.ndarray, np.ndarray]:
        items, weights = [], []
        for h, buf in enumerate(state):
            if len(buf):
                items.append(buf)
                weights.append(np.full(len(buf), 2.0**h))
        if not items:
            return np.empty(0), np.empty(0)
        x = np.concatenate(items)
        w = np.concatenate(weights)
        order = np.argsort(x, kind="stable")
        return x[order], w[order]

    def quantile(self, state: list[np.ndarray], q: float) -> float:
        x, w = self._items_weights(state)
        if len(x) == 0:
            return float("nan")
        cum = np.cumsum(w) - w / 2
        return float(np.interp(q * w.sum(), cum, x))

    def rank(self, state: list[np.ndarray], value: float) -> float:
        """Estimated number of items <= value."""
        x, w = self._items_weights(state)
        if len(x) == 0:
            return 0.0
        return float(w[x <= value].sum())
