"""Distance computations shared across losses and retrieval.

All functions are pure, jit/vmap-friendly, and route their contractions through
``jnp.einsum`` / matmuls so XLA tiles them onto the MXU.
"""

from __future__ import annotations

import jax.numpy as jnp


def pairwise_sq_dists(features: jnp.ndarray) -> jnp.ndarray:
    """Batched pairwise squared L2 distances.

    (T, M, D) -> (T, M, M) with [t, i, j] = ||x_ti - x_tj||^2.
    Same r - 2xy + r^T expansion as reference model/losses.py:656-661.
    """
    r = jnp.einsum("tmd,tmd->tm", features, features)[:, :, None]  # (T, M, 1)
    prod = jnp.einsum(
        "tmd,tnd->tmn", features, features, preferred_element_type=jnp.float32, precision="highest"
    )
    return r - 2.0 * prod + jnp.swapaxes(r, 1, 2)


def sq_dists_to_anchor(anchor: jnp.ndarray, others: jnp.ndarray) -> jnp.ndarray:
    """Squared distances from a (T, 1, D) anchor to (T, K, D) points -> (T, K)."""
    diff = others - anchor
    return jnp.sum(jnp.square(diff), axis=-1)


def cross_sq_dists(queries: jnp.ndarray, refs: jnp.ndarray) -> jnp.ndarray:
    """(Q, D) x (R, D) -> (Q, R) squared L2 distances via one MXU matmul.

    The retrieval workhorse: replaces the reference's host-side sklearn KDTree
    queries (reference train/train.py:1181-1185, evaluation/top-n.py:103-106)
    with a brute-force matmul that lives in HBM and shards over chips.

    PRECISION: the q^2 - 2qr + r^2 expansion cancels catastrophically in fp32
    when inputs have large magnitude relative to their spread (e.g. raw UTM
    coordinates ~1e6 m). Use it for unit-scale embeddings; for raw geographic
    coordinates compute distances on host in float64 or center them first.
    """
    q2 = jnp.sum(jnp.square(queries), axis=-1)[:, None]
    r2 = jnp.sum(jnp.square(refs), axis=-1)[None, :]
    qr = jnp.einsum("qd,rd->qr", queries, refs, preferred_element_type=jnp.float32, precision="highest")
    return jnp.maximum(q2 - 2.0 * qr + r2, 0.0)
