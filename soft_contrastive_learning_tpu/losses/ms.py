"""Multi-similarity losses: hard-label MS (Wang et al. CVPR'19), the paper's
soft geometrically weighted MS ('wms'), and the ms_det / ms_sum combinations.

Capability parity with reference model/losses.py:5-60 (wms), :76-122 (ms),
:139-194 (ms_det/ms_sum composition).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from soft_contrastive_learning_tpu.losses.spectral import residual_det_loss
from soft_contrastive_learning_tpu.models.vgg16 import l2_normalize


def _ms_terms(
    sim_mat: jnp.ndarray,  # (B, B) similarity, clamped >= 0
    mask_pos: jnp.ndarray,  # (B, B) soft or hard positive weights, diag zeroed
    mask_neg: jnp.ndarray,  # (B, B)
    alpha: float,
    beta: float,
    lamb: float,
    eps: float,
    ms_mining: bool,
    sumfunction: str,
) -> jnp.ndarray:
    pos_mat = sim_mat * mask_pos
    neg_mat = sim_mat * mask_neg

    if ms_mining:
        # Keep positives harder than (hardest negative - eps) and negatives
        # harder than (easiest positive + eps) (reference model/losses.py:31-37).
        max_val = jnp.max(neg_mat, axis=1, keepdims=True)
        tmp_max = jnp.max(pos_mat, axis=1, keepdims=True)
        min_val = jnp.min((sim_mat - tmp_max) * mask_pos, axis=1, keepdims=True) + tmp_max
        mask_pos = jnp.where(pos_mat < max_val + eps, mask_pos, 0.0)
        mask_neg = jnp.where(neg_mat > min_val - eps, mask_neg, 0.0)
        pos_mat = sim_mat * mask_pos
        neg_mat = sim_mat * mask_neg

    if sumfunction == "plain":
        pos_term = jnp.sum(jnp.where(mask_pos > 0.0, pos_mat, 0.0), axis=1)
        neg_term = jnp.sum(jnp.where(mask_neg > 0.0, neg_mat, 0.0), axis=1)
        return jnp.mean(neg_term - pos_term)

    pos_exp = jnp.where(mask_pos > 0.0, jnp.exp(-alpha * (pos_mat - lamb)), 0.0)
    neg_exp = jnp.where(mask_neg > 0.0, jnp.exp(beta * (neg_mat - lamb)), 0.0)
    pos_term = jnp.log1p(jnp.sum(pos_exp, axis=1)) / alpha
    neg_term = jnp.log1p(jnp.sum(neg_exp, axis=1)) / beta
    return jnp.mean(pos_term + neg_term)


def ms_loss(
    labels: jnp.ndarray,  # (B,) integer class labels
    embeddings: jnp.ndarray,  # (B, D)
    alpha: float = 2.0,
    beta: float = 50.0,
    lamb: float = 1.0,
    eps: float = 0.1,
    ms_mining: bool = True,
) -> jnp.ndarray:
    """Hard-label multi-similarity loss (reference model/losses.py:76-122)."""
    emb = l2_normalize(embeddings, axis=1)
    b = emb.shape[0]
    labels = labels.reshape(-1, 1)
    adjacency = labels == labels.T
    mask_pos = adjacency.astype(jnp.float32) - jnp.eye(b)
    mask_neg = (~adjacency).astype(jnp.float32)
    sim = jnp.maximum(
        jnp.einsum("id,jd->ij", emb, emb, preferred_element_type=jnp.float32, precision="highest"), 0.0
    )
    return _ms_terms(sim, mask_pos, mask_neg, alpha, beta, lamb, eps, ms_mining, "ms")


def wms_loss(
    geo_distances: jnp.ndarray,  # (B, B) metric distances between all batch images
    embeddings: jnp.ndarray,  # (B, D)
    d_alpha: float,
    d_beta: float,
    alpha: float = 2.0,
    beta: float = 50.0,
    lamb: float = 1.0,
    eps: float = 0.1,
    ms_mining: bool = True,
    wfunction: str = "exp",
    sumfunction: str = "ms",
) -> jnp.ndarray:
    """Soft weighted MS — the paper's headline loss (reference
    model/losses.py:5-60): the binary positive/negative masks of MS are
    replaced by geometric weights of the metric distance matrix.

    wfunction:
      * 'exp' : w+ = sigmoid(-d_alpha (d - d_beta)), w- = sigmoid(+...)
      * 'lin' : w+ = max(1 - d/d_beta, 0),           w- = min(d/d_beta, 1)
      * 'tanh': w+ = 1 - tanh(d/d_beta),             w- = tanh(d/d_beta)
    """
    emb = l2_normalize(embeddings, axis=1)
    b = emb.shape[0]
    d = geo_distances

    if wfunction == "lin":
        mask_pos = jnp.where(d < d_beta, 1.0 - d / d_beta, 0.0)
        mask_neg = jnp.where(d < d_beta, d / d_beta, 1.0)
    elif wfunction == "tanh":
        mask_pos = 1.0 - jnp.tanh(d / d_beta)
        mask_neg = jnp.tanh(d / d_beta)
    else:  # 'exp' — sigmoid form keeps gradients finite at saturation
        mask_pos = jax.nn.sigmoid(-d_alpha * (d - d_beta))
        mask_neg = jax.nn.sigmoid(-d_alpha * (d_beta - d))

    mask_pos = mask_pos.astype(jnp.float32) - jnp.eye(b)
    mask_neg = mask_neg.astype(jnp.float32)
    sim = jnp.maximum(
        jnp.einsum("id,jd->ij", emb, emb, preferred_element_type=jnp.float32, precision="highest"), 0.0
    )
    return _ms_terms(
        sim, mask_pos, mask_neg, alpha, beta, lamb, eps, ms_mining, sumfunction
    )


def ms_det_loss(labels, embeddings, alpha=2.0, beta=50.0, lamb=1.0, eps=0.1,
                ms_mining=False):
    """Alias of ms_loss with mining off by default — the reference keeps it as
    a separate function (model/losses.py:139-185) though it is never
    dispatched (train/train.py has no 'ms_det' branch)."""
    return ms_loss(labels, embeddings, alpha, beta, lamb, eps, ms_mining)


def ms_sum_loss(
    anchor,
    positives,
    negatives,
    margin: float,
    labels: jnp.ndarray,
    embeddings: jnp.ndarray,
    alpha: float = 2.0,
    beta: float = 50.0,
    lamb: float = 1.0,
    eps: float = 0.1,
    ms_mining: bool = False,
    dimensions: int = 10,
) -> jnp.ndarray:
    """5 * ms + residual_det (reference model/losses.py:188-194;
    dispatch train/train.py:829-837)."""
    ms = ms_loss(labels, embeddings, alpha, beta, lamb, eps, ms_mining)
    det = residual_det_loss(anchor, positives, negatives, margin, dimensions)
    return ms * 5.0 + det


def tuple_labels(
    tuples_per_batch: int, positives_per_tuple: int, negatives_per_tuple: int
) -> jnp.ndarray:
    """Per-image class labels for ms_loss over a tuple batch: anchor+positives
    share a class, each negative is its own class
    (reference train/train.py:822-827)."""
    one = jnp.concatenate(
        [
            jnp.zeros(1 + positives_per_tuple, jnp.int32),
            jnp.arange(negatives_per_tuple, dtype=jnp.int32) + 1,
        ]
    )
    offset = negatives_per_tuple + 1
    return jnp.concatenate(
        [one + t * offset for t in range(tuples_per_batch)]
    )
