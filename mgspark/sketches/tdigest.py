"""Merging t-digest (Dunning & Ertl) as a mergeable UDAF kernel.

State: centroid (mean, weight) arrays sorted by mean.  Compression uses
the k1 scale function ``k(q) = (delta / 2pi) * asin(2q - 1)``: sorted
centroids are assigned to clusters wherever ``floor(k(q_mid))`` changes,
then cluster means/weights are reduced with ``np.bincount`` — fully
vectorized, no per-centroid Python loop.  Merge = concatenate + compress
(order-insensitive within the digest's accuracy bound).
"""

from __future__ import annotations

import io

import numpy as np
import pandas as pd

from mgspark.sketches.base import MergeableSketch

__all__ = ["TDigest"]


class TDigest(MergeableSketch):
    name = "tdigest"

    def __init__(self, compression: float = 200.0):
        self.compression = compression

    def zero(self) -> tuple[np.ndarray, np.ndarray]:
        return np.empty(0, dtype=np.float64), np.empty(0, dtype=np.float64)

    def _compress(
        self, means: np.ndarray, weights: np.ndarray
    ) -> tuple[np.ndarray, np.ndarray]:
        if len(means) <= self.compression:
            order = np.argsort(means, kind="stable")
            return means[order], weights[order]
        order = np.argsort(means, kind="stable")
        means, weights = means[order], weights[order]
        total = weights.sum()
        q_mid = (np.cumsum(weights) - weights / 2) / total
        k = (self.compression / (2 * np.pi)) * np.arcsin(2 * q_mid - 1)
        cluster = np.floor(k).astype(np.int64)
        cluster -= cluster[0]  # densify from 0
        # bincount-reduce each cluster's weight and weighted mean
        w_sum = np.bincount(cluster, weights=weights)
        m_sum = np.bincount(cluster, weights=means * weights)
        keep = w_sum > 0
        return m_sum[keep] / w_sum[keep], w_sum[keep]

    def build(self, state, values: pd.Series):
        x = values.to_numpy(dtype=np.float64, na_value=np.nan)
        x = x[~np.isnan(x)]
        if len(x) == 0:
            return state
        means = np.concatenate([state[0], x])
        weights = np.concatenate([state[1], np.ones(len(x))])
        return self._compress(means, weights)

    def merge(self, a, b):
        return self._compress(
            np.concatenate([a[0], b[0]]), np.concatenate([a[1], b[1]])
        )

    def serialize(self, state) -> bytes:
        buf = io.BytesIO()
        np.savez(buf, means=state[0], weights=state[1])
        return buf.getvalue()

    def deserialize(self, blob: bytes):
        with np.load(io.BytesIO(blob)) as z:
            return z["means"].copy(), z["weights"].copy()

    def quantile(self, state, q: float) -> float:
        means, weights = state
        if len(means) == 0:
            return float("nan")
        if len(means) == 1:
            return float(means[0])
        cum = np.cumsum(weights) - weights / 2
        target = q * weights.sum()
        return float(np.interp(target, cum, means))

    def quantiles(self, state, qs) -> np.ndarray:
        means, weights = state
        if len(means) == 0:
            return np.full(len(qs), np.nan)
        cum = np.cumsum(weights) - weights / 2
        return np.interp(np.asarray(qs, dtype=np.float64) * weights.sum(), cum, means)
