"""Incremental-SVD losses: rank-update spectra against a running PCA state.

Capability parity with reference model/losses.py:442-609. The running PCA
state (s, v, m, seen) is maintained host-side by the streaming PCA
(pca/incremental.py) and fed into the jitted step as arrays — the TPU-native
replacement for the reference's l_s/l_v/l_m/l_seen placeholders
(reference train/train.py:658-662).

``incremental_s`` builds the classic incremental-SVD update matrix

    B = [ diag(s_old) @ v_old ;  X - mean(X) ;  sqrt(seen*n/(seen+n)) (mX - m_old) ]

and returns its singular values (reference model/losses.py:442-459), computed
here via small-side Gram eigh (ops/spectral.py).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp

from soft_contrastive_learning_tpu.ops.spectral import (
    stable_prod,
    svdvals_descending,
)


class PCAState(NamedTuple):
    """Running PCA state fed to the incremental losses; mirrors the tuple
    handled by read/write_loss_pca_globals (reference train/train.py:54-84)."""

    s: jnp.ndarray  # (L,) singular values
    v: jnp.ndarray  # (L, D) components
    m: jnp.ndarray  # (D,) mean
    seen: jnp.ndarray  # () effective samples seen


def incremental_s(
    x: jnp.ndarray,  # (T, M, D) new observations per tuple
    state: PCAState,
) -> jnp.ndarray:
    """Singular values of the incremental-SVD update matrix, (T, min(L+M+1, D)),
    descending."""
    t, m_rows, d = x.shape
    mx = jnp.mean(x, axis=1, keepdims=True)  # (T, 1, D)
    x_zero = x - mx
    sv = (state.s[:, None] * state.v)[None].repeat(t, axis=0)  # (T, L, D)
    n = jnp.asarray(m_rows, jnp.float32)
    mean_row = jnp.sqrt(state.seen * n / (state.seen + n)) * (mx - state.m[None, None, :])
    b = jnp.concatenate([sv, x_zero, mean_row], axis=1)  # (T, L+M+1, D)
    return svdvals_descending(b)


def _sliced_spectra(
    inc_pos: jnp.ndarray,
    inc_neg: jnp.ndarray,
    dimensions: int,
    scale: bool,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Top-``dimensions`` values, optionally normalized by the largest negative
    value (the ``scale`` option 'necessary for large dim',
    reference model/losses.py:488-497)."""
    num_s = inc_pos.shape[-1]
    k = min(dimensions, num_s - 1)
    pos_s = inc_pos[:, :k]
    neg_s = inc_neg[:, :k]
    if scale:
        max_neg = inc_neg[:, :1]
        pos_s = pos_s / max_neg
        neg_s = neg_s / max_neg
    return pos_s, neg_s


def incremental_residual_det_loss(
    anchor, positives, negatives, margin: float, state: PCAState,
    dimensions: int = 10, scale: bool = False,
):
    """Det-style hinge on incremental spectra of anchor-residuals; also returns
    the flattened residuals for the host PCA update
    (reference model/losses.py:463-500)."""
    pos_res = positives - anchor
    neg_res = negatives - anchor
    residuals = jnp.concatenate([pos_res, neg_res], axis=1)
    pos_s, neg_s = _sliced_spectra(
        incremental_s(pos_res, state), incremental_s(neg_res, state), dimensions, scale
    )
    loss = jnp.mean(stable_prod(pos_s) - stable_prod(neg_s) + margin)
    return loss, residuals.reshape(-1, residuals.shape[-1])


def incremental_residual_mm_loss(
    anchor, positives, negatives, margin: float, state: PCAState,
    dimensions: int = 10, scale: bool = False,
):
    """Min/max-eigenvalue-style variant (reference model/losses.py:504-541)."""
    pos_res = positives - anchor
    neg_res = negatives - anchor
    residuals = jnp.concatenate([pos_res, neg_res], axis=1)
    pos_s, neg_s = _sliced_spectra(
        incremental_s(pos_res, state), incremental_s(neg_res, state), dimensions, scale
    )
    loss = jnp.mean(jnp.max(pos_s, axis=1) - jnp.min(neg_s, axis=1) + margin)
    return loss, residuals.reshape(-1, residuals.shape[-1])


def incremental_det_loss(
    anchor, positives, negatives, margin: float, state: PCAState,
    dimensions: int = 10, scale: bool = False,
):
    """Det hinge on incremental spectra of raw {anchor, pos}/{anchor, neg} sets
    (reference model/losses.py:545-575)."""
    pos = jnp.concatenate([anchor, positives], axis=1)
    neg = jnp.concatenate([anchor, negatives], axis=1)
    pos_s, neg_s = _sliced_spectra(
        incremental_s(pos, state), incremental_s(neg, state), dimensions, scale
    )
    return jnp.mean(stable_prod(pos_s) - stable_prod(neg_s) + margin)


def incremental_mm_loss(
    anchor, positives, negatives, margin: float, state: PCAState,
    dimensions: int = 10, scale: bool = False,
):
    """Min/max variant of incremental_det (reference model/losses.py:579-609)."""
    pos = jnp.concatenate([anchor, positives], axis=1)
    neg = jnp.concatenate([anchor, negatives], axis=1)
    pos_s, neg_s = _sliced_spectra(
        incremental_s(pos, state), incremental_s(neg, state), dimensions, scale
    )
    return jnp.mean(jnp.max(pos_s, axis=1) - jnp.min(neg_s, axis=1) + margin)
