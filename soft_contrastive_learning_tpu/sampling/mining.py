"""Hard-example mining cache.

Capability parity with the reference's rolling embedding cache
(reference train/train.py:1012-1068 refresh; consumed in get_tuple at
:446-484): a window of recently-seen images is re-embedded every MINING_STEP
steps, and the sampler asks for cache members sorted by embedding distance to
a given anchor.

The embedding itself happens on-device (trainer calls the jitted batch-embed);
this class only holds the resulting host-side matrix and answers
sorted-neighbor queries with one matmul + argsort — for the reference's cache
sizes (1000 x 512) this is faster than rebuilding an sklearn KDTree and keeps
numpy the only dependency.
"""

from __future__ import annotations

import threading
from typing import Optional

import numpy as np


def neighbor_order(features):
    """(C, D) float32 -> (C, C) int32: row i = cache positions sorted by
    ascending embedding distance to member i.

    Pure jax fn meant to run jitted ON DEVICE right after the mining embed:
    the (C, C) Gram matmul that dominates host-side sorted-neighbor queries
    (C x D flops PER anchor, ~40 ms at C=600, D=32768 on a 1-core host) is
    one MXU matmul here, and the sampler's per-anchor query collapses to a
    row lookup. Precision HIGHEST: the default TPU matmul truncates f32
    operands to bf16, which reshuffles near-ties in the ordering (same issue
    as the streaming top-k, docs/SPEEDLIGHT.md)."""
    import jax.numpy as jnp

    sq = jnp.sum(features * features, axis=1)
    gram = jnp.dot(features, features.T, precision="highest",
                   preferred_element_type=jnp.float32)
    dists = sq[None, :] - 2.0 * gram  # + sq[:, None] = const per row
    return jnp.argsort(dists, axis=1).astype(jnp.int32)


class MiningCache:
    def __init__(self):
        self._lock = threading.Lock()
        self._features: Optional[np.ndarray] = None  # (C, D)
        self._indices: Optional[np.ndarray] = None  # (C,) dataset indices
        self._sq_norms: Optional[np.ndarray] = None
        self._order: Optional[np.ndarray] = None  # (C, C) precomputed order

    def refresh(
        self,
        features: Optional[np.ndarray],
        indices: np.ndarray,
        order: Optional[np.ndarray] = None,
    ) -> None:
        """``order``: optional precomputed (C, C) sorted-position matrix from
        ``neighbor_order`` (device). Without it queries fall back to the
        per-anchor host matvec.

        ``features=None`` with ``order`` given is an ORDER-ONLY refresh: the
        trainer keeps the embedding window on device and ships only the int32
        sorted order across the host boundary (trainer._mining_refresh fast
        path) — the sampler consumes nothing but ``sorted_neighbors``."""
        with self._lock:
            if features is None:
                if order is None:
                    raise ValueError("refresh needs features or order")
                self._features = None
                self._sq_norms = None
            else:
                features = np.asarray(features, dtype=np.float32)
                self._features = features
                self._sq_norms = np.sum(features * features, axis=1)
            self._indices = np.asarray(indices)
            self._order = None if order is None else np.asarray(order)

    @property
    def ready(self) -> bool:
        with self._lock:
            return (
                self._indices is not None
                and len(self._indices) > 0
                and (self._features is not None or self._order is not None)
            )

    def sorted_neighbors(self, dataset_index: int) -> Optional[np.ndarray]:
        """Dataset indices of all cache members sorted by ascending embedding
        distance to ``dataset_index``'s cached embedding, or None if the index
        is not cached (reference train/train.py:447-454)."""
        with self._lock:
            if self._indices is None:
                return None
            pos = np.flatnonzero(self._indices == dataset_index)
            if len(pos) == 0:
                return None
            if self._order is not None:
                return self._indices[self._order[pos[0]]]
            if self._features is None:
                return None
            q = self._features[pos[0]]
            # ||x - q||^2 = ||x||^2 - 2 x.q + const; const drops out of argsort
            order = np.argsort(self._sq_norms - 2.0 * (self._features @ q))
            return self._indices[order]
