"""Eigenvalue / trace / residual-SVD losses and the paper's weighted-residual-
determinant (wrd) family.

Capability parity with reference model/losses.py:310-341 (eigenvalue/trace),
:345-357,613-624 (residual det/trace) and :359-437 (swrd/wrd/prodwrd/sumwrd —
the paper's contribution). Singular values are computed via small-side Gram
eigh (ops/spectral.py) instead of direct SVD: equal values, TPU-friendly,
finite gradients at degenerate spectra.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from soft_contrastive_learning_tpu.ops.spectral import (
    gram_trace,
    max_eigenvalues,
    min_eigenvalues,
    stable_prod,
    top_svdvals,
)


def neg_eigenvalue_loss(anchor, negatives) -> jnp.ndarray:
    """Maximize the minimal Gram eigenvalue of {anchor, negatives}
    (reference model/losses.py:310-313). Paired with pairwise_distance_loss as
    a two-op alternating objective (reference train/train.py:766-777)."""
    feats = jnp.concatenate([anchor, negatives], axis=1)
    return -jnp.mean(min_eigenvalues(feats))


def ntuplet_evmm_loss(anchor, positives, negatives, margin: float) -> jnp.ndarray:
    """Hinge between min positive-set and max negative-set eigenvalues
    (reference model/losses.py:317-327)."""
    pos = jnp.concatenate([anchor, positives], axis=1)
    neg = jnp.concatenate([anchor, negatives], axis=1)
    losses = jnp.maximum(margin + min_eigenvalues(pos) - max_eigenvalues(neg), 0.0)
    return jnp.mean(losses)


def ntuplet_trace_loss(anchor, positives, negatives, margin: float) -> jnp.ndarray:
    """Hinge between positive-set and negative-set Gram traces
    (reference model/losses.py:331-341)."""
    pos = jnp.concatenate([anchor, positives], axis=1)
    neg = jnp.concatenate([anchor, negatives], axis=1)
    losses = jnp.maximum(margin + gram_trace(pos) - gram_trace(neg), 0.0)
    return jnp.mean(losses)


def _residual_spectra(anchor, positives, negatives, dimensions: int):
    """Top singular values of the positive/negative residual matrices."""
    pos_res = positives - anchor
    neg_res = negatives - anchor
    return top_svdvals(pos_res, dimensions), top_svdvals(neg_res, dimensions)


def residual_det_loss(anchor, positives, negatives, margin: float, dimensions: int = 10):
    """prod(top-k sv of positive residuals) - prod(negatives) + margin
    (reference model/losses.py:345-357). NOTE: the reference adds the margin
    but applies no hinge — preserved."""
    pos_s, neg_s = _residual_spectra(anchor, positives, negatives, dimensions)
    return jnp.mean(stable_prod(pos_s) - stable_prod(neg_s) + margin)


def residual_trace_loss(anchor, positives, negatives, margin: float, dimensions: int = 10):
    """Sum-of-singular-values variant (reference model/losses.py:613-624)."""
    pos_s, neg_s = _residual_spectra(anchor, positives, negatives, dimensions)
    return jnp.mean(jnp.sum(pos_s, axis=1) - jnp.sum(neg_s, axis=1) + margin)


# ------------------------------------------------------------------ wrd family
def swrd_loss(
    anchor, positives, negatives, pos_weights, neg_weights, margin: float,
    dimensions: int = 10,
):
    """Separately weighted residual determinant (reference model/losses.py:359-370):
    positive residuals scaled by w+, negative residuals by w-; weights are the
    host-computed geometric sigmoids (reference train/train.py:547-550)."""
    pos_res = (positives - anchor) * pos_weights
    neg_res = (negatives - anchor) * neg_weights
    pos_s = top_svdvals(pos_res, dimensions)
    neg_s = top_svdvals(neg_res, dimensions)
    return jnp.mean(stable_prod(pos_s) - stable_prod(neg_s) + margin)


def wrd_loss(
    anchor, positives, negatives, pos_weights, neg_weights, margin: float,
    dimensions: int = 10,
):
    """Weighted residual determinant over ALL residuals (reference
    model/losses.py:373-389): every tuple member contributes to both spectra,
    weighted by its soft positive/negative geometric weight."""
    all_res = jnp.concatenate([positives - anchor, negatives - anchor], axis=1)
    pos_s = top_svdvals(all_res * pos_weights, dimensions)
    neg_s = top_svdvals(all_res * neg_weights, dimensions)
    return jnp.mean(stable_prod(pos_s) - stable_prod(neg_s) + margin)


def _feature_similarity_weights(
    anchor, others, f_alpha_p: float, f_alpha_n: float, f_lamb: float
):
    """Sigmoid weights from anchor-to-member feature similarity
    (reference model/losses.py:399-404): fw+ decays with similarity above
    f_lamb, fw- grows with it. Shapes (T, M, 1)."""
    sims = jnp.einsum(
        "tid,tmd->tm", anchor, others, preferred_element_type=jnp.float32, precision="highest"
    )  # (T, M)
    # jax.nn.sigmoid == 1/(1+exp(-x)) with gradients finite at saturation
    # (the naive form NaNs its VJP once exp overflows).
    fw_pos = jax.nn.sigmoid(-f_alpha_p * (sims - f_lamb))
    fw_neg = jax.nn.sigmoid(-f_alpha_n * (f_lamb - sims))
    return fw_pos[:, :, None], fw_neg[:, :, None]


def prodwrd_loss(
    anchor, positives, negatives, pos_weights, neg_weights, margin: float,
    dimensions: int = 10, f_alpha_p: float = 2.0, f_alpha_n: float = 50.0,
    f_lamb: float = 1.0,
):
    """wrd with geometric weights MULTIPLIED by feature-similarity weights
    (reference model/losses.py:392-413)."""
    all_others = jnp.concatenate([positives, negatives], axis=1)
    all_res = all_others - anchor
    fw_pos, fw_neg = _feature_similarity_weights(
        anchor, all_others, f_alpha_p, f_alpha_n, f_lamb
    )
    pos_s = top_svdvals(all_res * pos_weights * fw_pos, dimensions)
    neg_s = top_svdvals(all_res * neg_weights * fw_neg, dimensions)
    return jnp.mean(stable_prod(pos_s) - stable_prod(neg_s) + margin)


def sumwrd_loss(
    anchor, positives, negatives, pos_weights, neg_weights, margin: float,
    dimensions: int = 10, f_alpha_p: float = 2.0, f_alpha_n: float = 50.0,
    f_lamb: float = 1.0,
):
    """wrd with geometric + feature-similarity weights ADDED
    (reference model/losses.py:416-437)."""
    all_others = jnp.concatenate([positives, negatives], axis=1)
    all_res = all_others - anchor
    fw_pos, fw_neg = _feature_similarity_weights(
        anchor, all_others, f_alpha_p, f_alpha_n, f_lamb
    )
    pos_s = top_svdvals(all_res * (pos_weights + fw_pos), dimensions)
    neg_s = top_svdvals(all_res * (neg_weights + fw_neg), dimensions)
    return jnp.mean(stable_prod(pos_s) - stable_prod(neg_s) + margin)
