"""On-device brute-force top-k retrieval over a (shardable) descriptor index.

TPU-native replacement for every sklearn-KDTree nearest-neighbor query in the
reference (mining cache :1066, localization eval train/train.py:1181-1185,
top-N eval evaluation/top-n.py:103-106): the reference database stays resident
in HBM as a dense matrix, queries hit it with ONE MXU matmul, and
``jax.lax.top_k`` selects neighbors. Under a mesh, the index is sharded over
the data axis and per-shard top-k candidates are gathered and re-reduced —
the 'sequence-parallel' analog for the retrieval axis (SURVEY.md §5).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from soft_contrastive_learning_tpu.ops.distances import cross_sq_dists


@functools.partial(jax.jit, static_argnames=("k",))
def topk_l2(
    queries: jnp.ndarray,  # (Q, D)
    refs: jnp.ndarray,  # (R, D)
    k: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(distances, indices) of the k nearest refs per query, ascending L2.

    Returns true (non-squared) L2 distances to match sklearn KDTree output.
    """
    sq = cross_sq_dists(queries, refs)
    neg_top, idx = jax.lax.top_k(-sq, k)
    return jnp.sqrt(jnp.maximum(-neg_top, 0.0)), idx


@functools.partial(jax.jit, static_argnames=("k", "tile"))
def topk_l2_tiled(
    queries: jnp.ndarray,  # (Q, D)
    refs: jnp.ndarray,  # (R, D)
    k: int,
    tile: int = 4096,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Memory-bounded top-k: lax.scan over reference tiles with a running
    (Q, k) best set in the carry, so the (Q, R) distance matrix is never
    materialized — O(Q * tile) working set for arbitrarily large HBM-resident
    indexes (the 'long retrieval axis', SURVEY.md §5). Same results as
    topk_l2."""
    q = queries.astype(jnp.float32)
    r = refs.astype(jnp.float32)
    n_refs = r.shape[0]
    pad = (-n_refs) % tile
    if pad:
        # zero-pad and mask: inf coordinates would produce NaN distances
        r = jnp.concatenate([r, jnp.zeros((pad, r.shape[1]), jnp.float32)])
    n_tiles = r.shape[0] // tile
    r_tiles = r.reshape(n_tiles, tile, r.shape[1])
    idx_tiles = jnp.arange(n_tiles * tile, dtype=jnp.int32).reshape(n_tiles, tile)

    nq = q.shape[0]
    init = (
        jnp.full((nq, k), -jnp.inf, jnp.float32),  # negated sq dists
        jnp.full((nq, k), -1, jnp.int32),
    )

    def body(carry, tile_in):
        best_d, best_i = carry
        refs_t, idx_t = tile_in
        sq = cross_sq_dists(q, refs_t)  # (Q, tile)
        neg = jnp.where(idx_t[None, :] < n_refs, -sq, -jnp.inf)
        cand_d = jnp.concatenate([best_d, neg], axis=1)
        cand_i = jnp.concatenate(
            [best_i, jnp.broadcast_to(idx_t[None, :], (nq, tile))], axis=1
        )
        nd, pos = jax.lax.top_k(cand_d, k)
        ni = jnp.take_along_axis(cand_i, pos, axis=1)
        return (nd, ni), None

    (best_d, best_i), _ = jax.lax.scan(body, init, (r_tiles, idx_tiles))
    return jnp.sqrt(jnp.maximum(-best_d, 0.0)), best_i


def _stream_tile_fit(d: int, q_chunk: int, budget: int = 8 * 1024 * 1024) -> int:
    """Largest 512-aligned ref-tile size whose f32 working set fits VMEM:
    the resident query block (q_chunk, d), TWO ref tiles (tile, d) — Pallas
    double-buffers the BlockSpec'd input across grid steps — plus headroom
    for the HIGHEST-precision matmul's bf16 operand decompositions (measured:
    a 14 MB data budget OOMs at 16.6 MB scoped). 0 if none fits (e.g. the
    32768-D raw-descriptor index)."""
    fit = (budget - q_chunk * 4 * d) // (8 * d)
    fit = (fit // 512) * 512
    return fit if fit >= 512 else 0


def topk_l2_streamed(
    queries: jnp.ndarray,
    refs: jnp.ndarray,
    k: int,
    tile: int = 2048,
    _force_interpret: bool = False,  # tests: exercise the chunk path on CPU
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Memory-bounded top-k for large HBM-resident indexes: the fused Pallas
    streaming kernel on TPU (grid steps are ~us; a lax.scan iteration costs
    ~0.5 ms on this runtime — docs/SPEEDLIGHT.md), the lax.scan tiling
    elsewhere and whenever the kernel's VMEM working set would not fit
    (k > 128, very high-dimensional refs, or huge query batches — e.g. the
    32768-D raw-descriptor index, where a (2048, D) f32 ref tile alone is
    256 MB)."""
    if (jax.default_backend() == "tpu" or _force_interpret) and k <= 128:
        from soft_contrastive_learning_tpu.ops.pallas.topk_kernel import (
            topk_l2_pallas,
        )

        d = refs.shape[1]
        q_chunk = min(queries.shape[0], 256)
        fit_tile = _stream_tile_fit(d, q_chunk)
        if fit_tile:
            use_tile = min(tile, fit_tile)
            outs = [
                topk_l2_pallas(
                    queries[s : s + q_chunk], refs, k, tile=use_tile,
                    interpret=True if _force_interpret else None,
                )
                for s in range(0, queries.shape[0], q_chunk)
            ]
            return (
                jnp.concatenate([o[0] for o in outs]),
                jnp.concatenate([o[1] for o in outs]),
            )
    return topk_l2_tiled(queries, refs, k, tile=max(tile, 4096))


def topk_l2_sharded(
    queries: jnp.ndarray,
    refs: jnp.ndarray,
    k: int,
    mesh: Optional[Mesh] = None,
    axis: str = "data",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Sharded variant: refs row-sharded over ``axis``, queries replicated.

    Each shard computes a local top-k over its rows; XLA's all_gather of the
    (Q, shards*k) candidate set rides the ICI, and a final top-k merges.
    Implemented with shard_map so the index matrix never materializes
    unsharded.
    """
    if mesh is None or mesh.shape[axis] == 1:
        return topk_l2(queries, refs, k)

    n_shards = mesh.shape[axis]
    r = refs.shape[0]
    assert r % n_shards == 0, f"refs rows {r} must divide over {n_shards} shards"
    shard_rows = r // n_shards

    def local(q, r_shard):
        # r_shard: (R/n, D) this shard's rows
        sq = cross_sq_dists(q, r_shard)
        neg_top, idx = jax.lax.top_k(-sq, min(k, shard_rows))
        shard_id = jax.lax.axis_index(axis)
        global_idx = idx + shard_id * shard_rows
        # gather all shards' candidates: (Q, n*k)
        neg_all = jax.lax.all_gather(neg_top, axis, axis=1, tiled=True)
        idx_all = jax.lax.all_gather(global_idx, axis, axis=1, tiled=True)
        neg_best, pos = jax.lax.top_k(neg_all, k)
        best_idx = jnp.take_along_axis(idx_all, pos, axis=1)
        return jnp.sqrt(jnp.maximum(-neg_best, 0.0)), best_idx

    from jax import shard_map

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(axis)),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return fn(queries, refs)
