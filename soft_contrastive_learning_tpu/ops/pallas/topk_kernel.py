"""Streaming brute-force top-k retrieval as a Pallas TPU kernel.

TPU-native replacement for the retrieval axis (reference
evaluation/top-n.py:103-106, KDTree): the reference database stays in HBM,
tiles stream through VMEM, and a running per-query best set lives entirely
in VMEM across grid steps — the (Q, R) distance matrix never exists, and
only (Q, k) results ever reach HBM.

Why a kernel when `ops/topk.py::topk_l2_tiled` already bounds memory with a
lax.scan: on this runtime a scan iteration costs ~0.5 ms (measured —
docs/SPEEDLIGHT.md), so a 1M-row index at tile=4096 pays ~244 floors
(~120 ms) before any work; Pallas grid steps cost microseconds and the ref
tiles are double-buffered by the pipeline. The kernel is also the fusion
win: per-tile distances live and die in VMEM.

Algorithm per grid step (one reference tile):
  * score = 2 q . r - ||r||^2 on the MXU — a monotone transform of negated
    squared L2 (the per-query ||q||^2 shift is rank-invariant and applied
    by the caller when converting scores back to distances);
  * k unrolled max-extractions over the (Q, TILE_R + 128) candidate block
    (tile scores ++ running best). Indices are selected by a masked min
    over a global-id matrix — no gathers, which Mosaic lacks. Ties pick
    the smallest global index, matching lax.top_k/sklearn.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_PAD_K = 128  # running-best width (lane-aligned); k <= 128
_NEG_INF = -3.0e38  # python literals: traced jnp constants can't be captured
_BIG_I = 2**30


def _topk_kernel(
    q_ref,  # (Qp, D) queries, f32, VMEM-resident
    r_ref,  # (TILE_R, D) this tile of refs
    outd_ref,  # (Qp, _PAD_K) best scores out
    outi_ref,  # (Qp, _PAD_K) best indices out
    best_d,  # scratch (Qp, _PAD_K) f32
    best_i,  # scratch (Qp, _PAD_K) i32
    *,
    k: int,
    tile_r: int,
    n_refs: int,
):
    step = pl.program_id(0)
    qp = q_ref.shape[0]

    @pl.when(step == 0)
    def _():
        best_d[:] = jnp.full_like(best_d, _NEG_INF)
        best_i[:] = jnp.full_like(best_i, -1)

    r = r_ref[:]
    # score = 2 q.r - ||r||^2  (monotone in -||q - r||^2)
    rsq = jnp.sum(r * r, axis=1, keepdims=True)  # (TILE_R, 1)
    qr = jax.lax.dot_general(
        q_ref[:],
        r,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        # Default TPU matmul precision truncates f32 operands to bf16; the
        # resulting ~1e-2-relative error in q.r reshuffles near neighbors
        # (ops/distances.py uses 'highest' for the same reason).
        precision=jax.lax.Precision.HIGHEST,
    )  # (Qp, TILE_R)
    scores = 2.0 * qr - rsq[:, 0][None, :]

    # Global ids; rows past the true index end are masked out.
    col = jax.lax.broadcasted_iota(jnp.int32, (qp, tile_r), 1)
    gid = col + step * tile_r
    scores = jnp.where(gid < n_refs, scores, _NEG_INF)

    cand = jnp.concatenate([scores, best_d[:]], axis=1)  # (Qp, TILE_R+PAD_K)
    cand_id = jnp.concatenate([gid, best_i[:]], axis=1)
    # invalid slots (id < 0) must never win
    cand = jnp.where(cand_id < 0, _NEG_INF, cand)

    for j in range(k):
        m = jnp.max(cand, axis=1, keepdims=True)  # (Qp, 1)
        hit = cand == m
        sel = jnp.min(jnp.where(hit, cand_id, _BIG_I), axis=1, keepdims=True)
        best_d[:, j] = m[:, 0]
        best_i[:, j] = sel[:, 0]
        cand = jnp.where(cand_id == sel, _NEG_INF, cand)

    @pl.when(step == pl.num_programs(0) - 1)
    def _():
        outd_ref[:] = best_d[:]
        outi_ref[:] = best_i[:]


@functools.partial(jax.jit, static_argnames=("k", "tile", "interpret"))
def topk_l2_pallas(
    queries: jnp.ndarray,  # (Q, D)
    refs: jnp.ndarray,  # (R, D)
    k: int,
    tile: int = 2048,
    *,
    interpret: bool | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(distances, indices) of the k nearest refs per query, ascending true
    L2 — same contract as ops/topk.py::topk_l2 / sklearn KDTree."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    assert 0 < k <= _PAD_K, f"k must be in (0, {_PAD_K}], got {k}"
    q = queries.astype(jnp.float32)
    r = refs.astype(jnp.float32)
    nq, d = q.shape
    n_refs = r.shape[0]
    k_eff = min(k, n_refs)

    qp = -(-nq // 8) * 8  # sublane-align the query count
    if qp != nq:
        q = jnp.pad(q, ((0, qp - nq), (0, 0)))
    pad_r = (-n_refs) % tile
    if pad_r:
        r = jnp.pad(r, ((0, pad_r), (0, 0)))
    n_tiles = r.shape[0] // tile

    outd, outi = pl.pallas_call(
        functools.partial(
            _topk_kernel, k=k_eff, tile_r=tile, n_refs=n_refs
        ),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((qp, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((qp, _PAD_K), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((qp, _PAD_K), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((qp, _PAD_K), jnp.float32),
            jax.ShapeDtypeStruct((qp, _PAD_K), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((qp, _PAD_K), jnp.float32),
            pltpu.VMEM((qp, _PAD_K), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * qp * d * (n_refs + pad_r),
            bytes_accessed=4 * (qp * d + (n_refs + pad_r) * d + 2 * qp * _PAD_K),
            transcendentals=0,
        ),
        interpret=interpret,
    )(q, r)

    scores = outd[:nq, :k_eff]
    idx = outi[:nq, :k_eff]
    qsq = jnp.sum(q[:nq] * q[:nq], axis=1, keepdims=True)
    dists = jnp.sqrt(jnp.maximum(qsq - scores, 0.0))
    if k_eff < k:  # fewer refs than k: pad like lax.top_k would not — callers
        dists = jnp.pad(dists, ((0, 0), (0, k - k_eff)), constant_values=jnp.inf)
        idx = jnp.pad(idx, ((0, 0), (0, k - k_eff)), constant_values=-1)
    return dists, idx
