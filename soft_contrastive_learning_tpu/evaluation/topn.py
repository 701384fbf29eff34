"""Top-N retrieval evaluation with PCA whitening sweeps.

Capability parity with reference evaluation/top-n.py:23-119: fit a whitening
PCA on a held-out feature dump, sweep descriptor dims D and reference spacings
L, retrieve the top-N references per query, and dump the standard pickle

    [top_i, top_g_dists, top_f_dists, gt_i, gt_g_dist, ref_idx]

consumed by the ROC compiler (reference evaluation/roc.py:195). TPU-native:
the PCA fit is a Gram eigh (pca/whiten.py) and retrieval is an HBM-resident
matmul + top-k (ops/topk.py) instead of sklearn PCA + KDTree.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from soft_contrastive_learning_tpu.ops.topk import (
    topk_l2,
    topk_l2_sharded,
    topk_l2_streamed,
)

# Above this many reference rows, retrieval streams over HBM tiles instead of
# materializing the (Q, R) distance matrix.
_TILED_THRESHOLD = 200_000
from soft_contrastive_learning_tpu.pca.whiten import fit_pca
from soft_contrastive_learning_tpu.utils.io import save_pickle

DEFAULT_L = (0.0, 0.3, 1.0, 5.0)
DEFAULT_D = (64, 128, 256, 512, 1024, 2048, 4096)


def spatial_subsample(
    ref_xy: np.ndarray, spacing: float, strict: bool = False
) -> List[int]:
    """Keep a reference whenever it is >= ``spacing`` (or > with ``strict``)
    from the last kept one (sequential, not greedy-coverage).

    The reference uses '>=' in the top-N sweep (evaluation/top-n.py:91-94) but
    '>' in prep stage 013 (prepare_data/013_cluster_linear.py:44) — the
    ``strict`` flag captures both. NOTE: the reference top-n loop starts at
    i=0 and so duplicates index 0 when spacing == 0; starting at 1 fixes that
    quirk without changing any other selection."""
    keep = [0]
    sp2 = spacing**2
    for i in range(1, len(ref_xy)):
        d2 = np.sum((ref_xy[i] - ref_xy[keep[-1]]) ** 2)
        if (d2 > sp2) if strict else (d2 >= sp2):
            keep.append(i)
    return keep


def top_n_single(
    ref_features: np.ndarray,  # (R, d) already-reduced features
    query_features: np.ndarray,  # (Q, d)
    ref_xy: np.ndarray,
    query_xy: np.ndarray,
    spacing: float,
    n: int = 25,
    mesh=None,
    ref_idx: Optional[List[int]] = None,
    geo=None,  # optional precomputed (xy_d, gt_local) for this subsample
) -> Optional[list]:
    """One (already PCA-reduced) retrieval pass -> the 6-element pickle list."""
    if ref_idx is None:
        ref_idx = spatial_subsample(ref_xy, spacing)
    if len(ref_idx) < n:
        return None  # reference skips settings with too few refs (:96-97)
    sub_refs = np.asarray(ref_features)[ref_idx]
    sub_xy = np.asarray(ref_xy)[ref_idx]

    if mesh is not None:
        pad = (-len(sub_refs)) % mesh.shape["data"]
        if pad:
            sub_refs = np.concatenate([sub_refs, np.full((pad, sub_refs.shape[1]), 1e9, np.float32)])
        top_f, top_i = topk_l2_sharded(
            jnp.asarray(query_features), jnp.asarray(sub_refs), n, mesh
        )
    elif len(sub_refs) > _TILED_THRESHOLD:
        # Pallas streaming kernel on TPU, lax.scan tiling elsewhere.
        top_f, top_i = topk_l2_streamed(
            jnp.asarray(query_features), jnp.asarray(sub_refs), n
        )
    else:
        top_f, top_i = topk_l2(jnp.asarray(query_features), jnp.asarray(sub_refs), n)
    top_f = np.asarray(top_f)
    top_i = np.asarray(top_i)

    # geographic distances of the retrievals + ground-truth optimum.
    # The (Q, R') matrix depends only on the spatial subsample, not on the
    # descriptor dim — callers sweeping dims pass it precomputed (geo=).
    if geo is None:
        xy_d = np.linalg.norm(
            query_xy[:, None, :] - sub_xy[None, :, :], axis=-1
        )  # (Q, R')
        gt_local = np.argmin(xy_d, axis=1)
    else:
        xy_d, gt_local = geo
    top_g = np.take_along_axis(xy_d, top_i, axis=1)
    gt_g = xy_d[np.arange(len(query_xy)), gt_local]

    # translate to original reference indices (reference :115-117)
    ref_idx_arr = np.asarray(ref_idx)
    top_i_orig = ref_idx_arr[top_i]
    gt_i = ref_idx_arr[gt_local]
    return [
        top_i_orig.tolist(),
        top_g.tolist(),
        top_f,
        gt_i.tolist(),
        gt_g,
        ref_idx,
    ]


def get_top_n(
    pca_features: np.ndarray,
    ref_features: np.ndarray,
    query_features: np.ndarray,
    ref_xy: np.ndarray,
    query_xy: np.ndarray,
    out_root: str,
    name: str,
    n: int = 25,
    spacings: Sequence[float] = DEFAULT_L,
    dims: Sequence[int] = DEFAULT_D,
    mesh=None,
    skip_existing: bool = True,
) -> Dict[str, str]:
    """Full D x L sweep -> {'l{l}_dim{d}': pickle_path} (reference layout)."""
    out_paths: Dict[str, str] = {}
    usable_dims = [d for d in dims if d <= min(pca_features.shape)]
    if not usable_dims:
        return out_paths
    # PCA components nest: one fit at the largest dim, sliced per d (saves
    # |dims|-1 Gram eighs over the full held-out dump). The whitened
    # PROJECTIONS nest too — each output column is (x - mean) @ c_j / s_j,
    # independent of d — so the ref/query dumps are transformed ONCE at the
    # largest dim and column-sliced per d below, instead of re-shipping the
    # full-width dumps to the device |dims| times (at the flagship width
    # that is 7 x ~430 MB of host->HBM traffic for the reference sweep).
    full_whitener = fit_pca(jnp.asarray(pca_features), max(usable_dims))
    ref_full = np.asarray(full_whitener.transform(jnp.asarray(ref_features)))
    query_full = np.asarray(
        full_whitener.transform(jnp.asarray(query_features))
    )
    # The spatial subsample depends only on the spacing — compute each once.
    subsample_cache = {
        spacing: spatial_subsample(np.asarray(ref_xy), spacing)
        for spacing in spacings
    }
    # The geographic (Q, R') distance matrix + ground-truth argmin likewise
    # depend only on the spacing — build each once, not once per dim.
    geo_cache = {}
    for spacing, idx in subsample_cache.items():
        sub_xy = np.asarray(ref_xy)[idx]
        xy_d = np.linalg.norm(
            np.asarray(query_xy)[:, None, :] - sub_xy[None, :, :], axis=-1
        )
        geo_cache[spacing] = (xy_d, np.argmin(xy_d, axis=1))
    for d in usable_dims:
        ref_f = ref_full[:, :d]
        query_f = query_full[:, :d]
        for spacing in spacings:
            setting = f"l{spacing}_dim{d}"
            folder = os.path.join(out_root, setting)
            os.makedirs(folder, exist_ok=True)
            out_pickle = os.path.join(folder, f"{name}.pickle")
            if skip_existing and os.path.exists(out_pickle):
                out_paths[setting] = out_pickle
                continue
            result = top_n_single(
                ref_f, query_f, np.asarray(ref_xy), np.asarray(query_xy),
                spacing, n=n, mesh=mesh, ref_idx=subsample_cache[spacing],
                geo=geo_cache[spacing],
            )
            if result is None:
                continue
            save_pickle(result, out_pickle)
            out_paths[setting] = out_pickle
    return out_paths
