"""Distance-regression hybrid losses and the log-ratio loss.

Capability parity with reference model/losses.py:225-307 (distance /
huber-distance triplet & quadruplet hybrids), :627-646 (pairwise variant) and
:125-135 (logratio).

The loss regresses *scaled squared feature distance* onto *scaled squared
geographic distance*: both are divided by their expected maxima
(d_max_squared = MAX_POS_RADIUS^2, f_max_squared = 2.0 measured empirically,
reference train/train.py:695-696).
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp

from soft_contrastive_learning_tpu.losses.pointnetvlad import (
    lazy_triplet_loss,
    triplet_loss,
)
from soft_contrastive_learning_tpu.ops.distances import (
    pairwise_sq_dists,
    sq_dists_to_anchor,
)


def huber(residual: jnp.ndarray, delta: float = 1.0) -> jnp.ndarray:
    """Elementwise Huber (tf.losses.huber_loss semantics, delta=1):
    0.5 r^2 inside the delta, linear outside."""
    abs_r = jnp.abs(residual)
    quad = jnp.minimum(abs_r, delta)
    lin = abs_r - quad
    return 0.5 * quad**2 + delta * lin


def _scale_distances(anchor, positives, sq_geo_dists, d_max_squared, f_max_squared):
    """(scaled geographic, scaled feature) squared-distance pairs, both (T, P)
    (reference model/losses.py:678-690)."""
    sq_f = sq_dists_to_anchor(anchor, positives)
    return sq_geo_dists / d_max_squared, sq_f / f_max_squared


def distance_loss(anchor, positives, sq_geo_dists, d_max_squared, f_max_squared):
    """MSE between scaled feature and geographic distances
    (reference model/losses.py:225-230)."""
    sd, sf = _scale_distances(anchor, positives, sq_geo_dists, d_max_squared, f_max_squared)
    return jnp.mean(jnp.mean(jnp.square(sf - sd), axis=1))


def huber_distance_loss(anchor, positives, sq_geo_dists, d_max_squared, f_max_squared):
    """Huber variant (reference model/losses.py:233-236; tf mean reduction)."""
    sd, sf = _scale_distances(anchor, positives, sq_geo_dists, d_max_squared, f_max_squared)
    return jnp.mean(huber(sf - sd))


def _best_distance_term(
    anchor, positives, sq_geo_dists, d_max_squared, f_max_squared, use_huber: bool
):
    """(T,) minimal per-positive regression error (reference model/losses.py:664-675)."""
    sd, sf = _scale_distances(anchor, positives, sq_geo_dists, d_max_squared, f_max_squared)
    err = huber(sf - sd) if use_huber else jnp.square(sf - sd)
    return jnp.min(err, axis=1)


def distance_triplet_loss(
    anchor,
    positives,
    negatives,
    margin: float,
    lam: float,
    sq_geo_dists,
    d_max_squared: float,
    f_max_squared: float,
    lazy: bool = False,
    use_huber: bool = True,
):
    """triplet + lam * distance regression (reference model/losses.py:239-264)."""
    trip_fn: Callable = lazy_triplet_loss if lazy else triplet_loss
    trip = trip_fn(anchor, positives, negatives, margin)
    if use_huber:
        dist = huber_distance_loss(anchor, positives, sq_geo_dists, d_max_squared, f_max_squared)
    else:
        dist = distance_loss(anchor, positives, sq_geo_dists, d_max_squared, f_max_squared)
    return trip + lam * dist


def distance_quadruplet_loss(
    anchor,
    positives,
    negatives,
    other_neg,
    margin1: float,
    margin2: float,
    lam: float,
    sq_geo_dists,
    d_max_squared: float,
    f_max_squared: float,
    lazy: bool = False,
    use_huber: bool = True,
):
    """distance_triplet + second-order hinge against the other negative, with
    the negative-to-other distance scaled by f_max (reference
    model/losses.py:267-307)."""
    trip = distance_triplet_loss(
        anchor, positives, negatives, margin1, lam, sq_geo_dists,
        d_max_squared, f_max_squared, lazy=lazy, use_huber=use_huber,
    )
    best = _best_distance_term(
        anchor, positives, sq_geo_dists, d_max_squared, f_max_squared, use_huber
    )  # (T,)
    neg_to_other = jnp.sum(jnp.square(negatives - other_neg), axis=-1) / f_max_squared
    h = jnp.maximum(margin2 + best[:, None] - neg_to_other, 0.0)
    # NOTE: the reference uses reduce_max here even in the non-lazy variant
    # (model/losses.py:301-304) — preserved.
    second = jnp.mean(jnp.max(h, axis=1))
    return trip + second


def pairwise_distance_loss(
    anchor,
    positives,
    pairwise_sq_geo_dists,  # (T, P+1, P+1)
    d_max_squared: float,
    f_max_squared: float,
    use_huber: bool = False,
):
    """Regression over ALL pairs among {anchor, positives}
    (reference model/losses.py:627-646)."""
    feats = jnp.concatenate([anchor, positives], axis=1)  # (T, P+1, D)
    sq_f = pairwise_sq_dists(feats) / f_max_squared
    sq_d = pairwise_sq_geo_dists / d_max_squared
    err = huber(sq_f - sq_d) if use_huber else jnp.square(sq_f - sq_d)
    return jnp.mean(jnp.mean(jnp.mean(err, axis=2), axis=1))


def logratio_loss(
    anchor,
    positives,
    negatives,
    sq_pos_geo_dists,  # (T, P)
    sq_neg_geo_dists,  # (T, N)
    eps: float = 1e-12,
):
    """Log-ratio loss (Kim et al. ICCV'19): match log feature-distance ratios to
    log geographic-distance ratios over all positive x negative pairs.

    The reference implementation (model/losses.py:125-135) relies on a
    perm-less tf.transpose broadcast that only evaluates under its original
    shape configuration; this implements the intended pairwise (T, P, N) ratio
    grid explicitly.
    """
    pos_res = sq_dists_to_anchor(anchor, positives)  # (T, P)
    neg_res = sq_dists_to_anchor(anchor, negatives)  # (T, N)
    feat_ratio = jnp.log(pos_res[:, :, None] + eps) - jnp.log(neg_res[:, None, :] + eps)
    dist_ratio = jnp.log(sq_pos_geo_dists[:, :, None] + eps) - jnp.log(
        sq_neg_geo_dists[:, None, :] + eps
    )
    sq = jnp.square(feat_ratio - dist_ratio)
    return jnp.mean(jnp.mean(jnp.mean(sq, axis=2), axis=1))
