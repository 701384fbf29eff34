"""PointNetVLAD baseline losses + the reference's 'evil' variants.

The reference imports triplet/lazy_triplet/quadruplet/lazy_quadruplet from the
external pointnetvlad dependency (reference train/train.py:25, dispatched at
train/train.py:700-716); they are reimplemented natively here from their
semantics: hinge losses on *squared* embedding distances where the positive
term is the BEST (closest) positive, summed ('sum' variants) or maxed ('lazy')
over negatives. The 'evil' variants (reference model/losses.py:63-73,197-222)
instead use the WORST (farthest) positive.

Shapes follow the reference convention: anchor (T, 1, D), positives (T, P, D),
negatives (T, N, D), other_neg (T, 1, D); scalar output.
"""

from __future__ import annotations

import jax.numpy as jnp

from soft_contrastive_learning_tpu.ops.distances import sq_dists_to_anchor


def best_pos_distance(anchor: jnp.ndarray, positives: jnp.ndarray) -> jnp.ndarray:
    """(T,) squared distance to the closest positive."""
    return jnp.min(sq_dists_to_anchor(anchor, positives), axis=1)


def worst_pos_distance(anchor: jnp.ndarray, positives: jnp.ndarray) -> jnp.ndarray:
    """(T,) squared distance to the farthest positive
    (reference model/losses.py:217-222)."""
    return jnp.max(sq_dists_to_anchor(anchor, positives), axis=1)


def _hinge_matrix(
    pos_term: jnp.ndarray,  # (T,)
    neg_sq_dists: jnp.ndarray,  # (T, N)
    margin: float,
) -> jnp.ndarray:
    return jnp.maximum(margin + pos_term[:, None] - neg_sq_dists, 0.0)


def triplet_loss(anchor, positives, negatives, margin: float) -> jnp.ndarray:
    neg_d = sq_dists_to_anchor(anchor, negatives)
    h = _hinge_matrix(best_pos_distance(anchor, positives), neg_d, margin)
    return jnp.mean(jnp.sum(h, axis=1))


def lazy_triplet_loss(anchor, positives, negatives, margin: float) -> jnp.ndarray:
    neg_d = sq_dists_to_anchor(anchor, negatives)
    h = _hinge_matrix(best_pos_distance(anchor, positives), neg_d, margin)
    return jnp.mean(jnp.max(h, axis=1))


def evil_triplet_loss(anchor, positives, negatives, margin: float) -> jnp.ndarray:
    """Triplet with the worst positive (reference model/losses.py:63-73)."""
    neg_d = sq_dists_to_anchor(anchor, negatives)
    h = _hinge_matrix(worst_pos_distance(anchor, positives), neg_d, margin)
    return jnp.mean(jnp.sum(h, axis=1))


def _second_order_term(
    pos_term: jnp.ndarray, negatives, other_neg, margin2: float, lazy: bool
) -> jnp.ndarray:
    """Hinge between the positive term and d(negatives, other_neg)."""
    neg_to_other = jnp.sum(jnp.square(negatives - other_neg), axis=-1)  # (T, N)
    h = _hinge_matrix(pos_term, neg_to_other, margin2)
    return jnp.mean(jnp.max(h, axis=1) if lazy else jnp.sum(h, axis=1))


def quadruplet_loss(
    anchor, positives, negatives, other_neg, margin1: float, margin2: float
) -> jnp.ndarray:
    trip = triplet_loss(anchor, positives, negatives, margin1)
    best = best_pos_distance(anchor, positives)
    return trip + _second_order_term(best, negatives, other_neg, margin2, lazy=False)


def lazy_quadruplet_loss(
    anchor, positives, negatives, other_neg, margin1: float, margin2: float
) -> jnp.ndarray:
    trip = lazy_triplet_loss(anchor, positives, negatives, margin1)
    best = best_pos_distance(anchor, positives)
    return trip + _second_order_term(best, negatives, other_neg, margin2, lazy=True)


def evil_quadruplet_loss(
    anchor, positives, negatives, other_neg, margin1: float, margin2: float
) -> jnp.ndarray:
    """Quadruplet with worst positives in both hinges
    (reference model/losses.py:197-214)."""
    trip = evil_triplet_loss(anchor, positives, negatives, margin1)
    worst = worst_pos_distance(anchor, positives)
    return trip + _second_order_term(worst, negatives, other_neg, margin2, lazy=False)
