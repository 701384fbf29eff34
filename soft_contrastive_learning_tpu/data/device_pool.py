"""Device-resident image pool: the epoch set's decoded uint8 images live in
TPU HBM; the train step gathers its batch by indices.

Why: a training step's input batch (50 x 180x240x3 uint8 = 6.5 MB at the
flagship config, reference train/train.py:1241-1280) must cross host->device
EVERY step in a feed-style pipeline. On a direct-attached chip that is ~0.4 ms
of PCIe; through this project's relay it measured 40 MB/s => 187 ms/step —
4.7x the 39.6 ms device step, making the whole loop transfer-bound
(perf/_h2d.log, docs/TRAINBENCH.md). The reference's answer (more loader
threads feeding feed_dict, train/train.py:941-975) cannot fix a bandwidth
bound. The TPU-native answer: upload the SET once — a RobotCar epoch set is
1-4 GB uint8, comfortably inside v5e's 16 GB HBM next to the ~0.2 GB model —
and move the batch gather INTO the jitted step (`jnp.take` from the pool).
Per-step traffic collapses to (B,) int32 indices + the loss payload (~10 KB).

The pool is built from whatever the pipeline can already serve quickly
(ideally the decoded-uint8 memmap cache, data/decoded_cache.py) and keyed by
image key, so per-epoch shuffled metas (reference prepare_data/012) map onto
it with one row-lookup pass per epoch.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax
import numpy as np

ImageKey = Tuple[str, str, str]


class DeviceImagePool:
    """(N, H, W, 3) uint8 resident on device + key -> row index."""

    def __init__(self, images: np.ndarray, keys: Sequence[ImageKey],
                 mesh=None):
        assert images.dtype == np.uint8 and images.ndim == 4
        if mesh is not None:
            from soft_contrastive_learning_tpu.parallel.mesh import (
                replicated_sharding,
            )

            self.array = jax.device_put(images, replicated_sharding(mesh))
        else:
            self.array = jax.device_put(images)
        self.nbytes = images.nbytes
        self._row: Dict[ImageKey, int] = {
            tuple(k): i for i, k in enumerate(keys)
        }

    def rows_for_keys(self, keys: Sequence[ImageKey]) -> Optional[np.ndarray]:
        """(len(keys),) int32 pool rows, or None if any key is absent."""
        rows = np.empty(len(keys), np.int32)
        for i, k in enumerate(keys):
            r = self._row.get(tuple(k))
            if r is None:
                return None
            rows[i] = r
        return rows

    def rows_for_meta(self, meta: Dict[str, List[str]]) -> Optional[np.ndarray]:
        return self.rows_for_keys(
            list(zip(meta["date"], meta["folder"], meta["t"]))
        )


def build_pool(
    source,
    meta: Dict[str, List[str]],
    cfg,
    mesh=None,
    max_bytes: int = 4_000_000_000,
    chunk: int = 256,
    log=print,
) -> Optional[DeviceImagePool]:
    """Decode/fetch every image of ``meta`` at the model input geometry and
    upload it once. Returns None (caller keeps the feed path) when the set
    exceeds ``max_bytes``."""
    from soft_contrastive_learning_tpu.data.pipeline import load_images_standard

    keys = list(zip(meta["date"], meta["folder"], meta["t"]))
    h, w = cfg.model.image_height, cfg.model.image_width
    need = len(keys) * h * w * 3
    if need > max_bytes:
        log(
            f"device image pool skipped: {need/1e9:.2f} GB exceeds the "
            f"{max_bytes/1e9:.2f} GB budget"
        )
        return None
    images = np.empty((len(keys), h, w, 3), np.uint8)
    for start in range(0, len(keys), chunk):
        part = keys[start : start + chunk]
        images[start : start + len(part)] = load_images_standard(
            source, part, cfg
        )
    pool = DeviceImagePool(images, keys, mesh=mesh)
    log(
        f"device image pool resident: {len(keys)} images, "
        f"{need/1e6:.1f} MB in HBM"
    )
    return pool
