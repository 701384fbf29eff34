"""Loss registry: name -> pure loss function over a TupleBatch.

Replaces the reference's 30-branch elif dispatch in build_model (reference
train/train.py:700-855) with a declarative registry. Every loss is a pure
function of

  * ``TupleBatch``: the split embeddings (anchor/positives/negatives[/other])
    plus the flat batch (reference train/train.py:654 tf.split equivalent),
  * ``payload``: host-computed geometric quantities per ``distance_type``
    (the reference's ``distances`` placeholder, train/train.py:664-691),
  * an optional ``PCAState`` for the incremental family,

returning a ``LossResult``. PN losses (two-op alternating optimization,
reference train/train.py:872-875) return separate pos/neg components.

Note on ``wms``: the published wms feed is a per-tuple (S, S) distance matrix
that is only shape-consistent with the (B, B) similarity matrix when
tuples_per_batch == 1 (reference train/train.py:684-686 vs model/losses.py:22-25);
here wms consumes a full-batch (B, B) geographic distance matrix, which is the
intended semantics and identical for tuples_per_batch == 1.
"""

from __future__ import annotations

from typing import Callable, Dict, NamedTuple, Optional, Tuple

import jax.numpy as jnp

from soft_contrastive_learning_tpu.core.config import LossConfig, TupleConfig
from soft_contrastive_learning_tpu.losses import distance as dist_losses
from soft_contrastive_learning_tpu.losses import incremental as inc_losses
from soft_contrastive_learning_tpu.losses import ms as ms_losses
from soft_contrastive_learning_tpu.losses import pointnetvlad as pnv
from soft_contrastive_learning_tpu.losses import spectral as spec
from soft_contrastive_learning_tpu.losses.incremental import PCAState


class TupleBatch(NamedTuple):
    anchor: jnp.ndarray  # (T, 1, D)
    positives: jnp.ndarray  # (T, P, D)
    negatives: jnp.ndarray  # (T, N, D)
    other: Optional[jnp.ndarray]  # (T, 1, D) or None
    embeddings: jnp.ndarray  # (T * S, D) flat batch, S = sum(tuple_shape)


class LossResult(NamedTuple):
    total: jnp.ndarray  # scalar (pos + neg for PN losses)
    pos: Optional[jnp.ndarray] = None  # PN losses only
    neg: Optional[jnp.ndarray] = None  # PN losses only
    pca_in: Optional[jnp.ndarray] = None  # incremental losses: host-PCA feed


LossFn = Callable[[TupleBatch, Dict[str, jnp.ndarray], Optional[PCAState]], LossResult]


def split_batch(
    embeddings: jnp.ndarray,
    tuples_per_batch: int,
    tuple_shape: Tuple[int, ...],
) -> TupleBatch:
    """Reshape a flat (T*S, D) embedding batch into tuple members
    (the reference's reshape+split at train/train.py:654)."""
    s = sum(tuple_shape)
    d = embeddings.shape[-1]
    grouped = embeddings.reshape(tuples_per_batch, s, d)
    offsets = [0]
    for part in tuple_shape:
        offsets.append(offsets[-1] + part)
    parts = [grouped[:, offsets[i] : offsets[i + 1]] for i in range(len(tuple_shape))]
    other = parts[3] if len(tuple_shape) == 4 else None
    return TupleBatch(parts[0], parts[1], parts[2], other, embeddings)


def build_loss(cfg: LossConfig, tuples: TupleConfig, tuples_per_batch: int) -> LossFn:
    """Compile the configured loss into a single pure function."""
    name = cfg.name
    m1, m2, lam = cfg.margin_1, cfg.margin_2, cfg.lam
    dmax, fmax = cfg.d_max_squared, cfg.f_max_squared
    dims = cfg.svd_dimensions
    lazy = "lazy" in name
    use_huber = "huber" in name

    if name == "triplet":
        return lambda b, p, st: LossResult(pnv.triplet_loss(b.anchor, b.positives, b.negatives, m1))
    if name == "lazy_triplet":
        return lambda b, p, st: LossResult(pnv.lazy_triplet_loss(b.anchor, b.positives, b.negatives, m1))
    if name == "evil_triplet":
        return lambda b, p, st: LossResult(pnv.evil_triplet_loss(b.anchor, b.positives, b.negatives, m1))
    if name == "quadruplet":
        return lambda b, p, st: LossResult(
            pnv.quadruplet_loss(b.anchor, b.positives, b.negatives, b.other, m1, m2)
        )
    if name == "lazy_quadruplet":
        return lambda b, p, st: LossResult(
            pnv.lazy_quadruplet_loss(b.anchor, b.positives, b.negatives, b.other, m1, m2)
        )
    if name == "evil_quadruplet":
        return lambda b, p, st: LossResult(
            pnv.evil_quadruplet_loss(b.anchor, b.positives, b.negatives, b.other, m1, m2)
        )

    if name in (
        "distance_triplet",
        "distance_lazy_triplet",
        "huber_distance_triplet",
        "huber_distance_lazy_triplet",
    ):
        return lambda b, p, st: LossResult(
            dist_losses.distance_triplet_loss(
                b.anchor, b.positives, b.negatives, m1, lam,
                p["sq_pos_geo_dists"], dmax, fmax, lazy=lazy, use_huber=use_huber,
            )
        )
    if name in (
        "distance_quadruplet",
        "distance_lazy_quadruplet",
        "huber_distance_quadruplet",
        "huber_distance_lazy_quadruplet",
    ):
        return lambda b, p, st: LossResult(
            dist_losses.distance_quadruplet_loss(
                b.anchor, b.positives, b.negatives, b.other, m1, m2, lam,
                p["sq_pos_geo_dists"], dmax, fmax, lazy=lazy, use_huber=use_huber,
            )
        )

    if name in ("pairwise_distance_neg_eigenvalue", "pairwise_huber_distance_neg_eigenvalue"):

        def pn_fn(b, p, st, _huber=use_huber):
            pos = dist_losses.pairwise_distance_loss(
                b.anchor, b.positives, p["pairwise_sq_geo_dists"], dmax, fmax, use_huber=_huber
            )
            neg = spec.neg_eigenvalue_loss(b.anchor, b.negatives)
            return LossResult(pos + neg, pos=pos, neg=neg)

        return pn_fn

    if name == "ntuplet_evmm":
        return lambda b, p, st: LossResult(spec.ntuplet_evmm_loss(b.anchor, b.positives, b.negatives, m1))
    if name == "ntuplet_trace":
        return lambda b, p, st: LossResult(spec.ntuplet_trace_loss(b.anchor, b.positives, b.negatives, m1))
    if name == "residual_det":
        return lambda b, p, st: LossResult(
            spec.residual_det_loss(b.anchor, b.positives, b.negatives, m1, dims)
        )
    if name == "residual_trace":
        return lambda b, p, st: LossResult(
            spec.residual_trace_loss(b.anchor, b.positives, b.negatives, m1, dims)
        )

    if name == "incremental_residual_det":
        def ird(b, p, st):
            loss, res = inc_losses.incremental_residual_det_loss(
                b.anchor, b.positives, b.negatives, m1, st, cfg.loss_dim
            )
            return LossResult(loss, pca_in=res)
        return ird
    if name == "incremental_residual_mm":
        def irm(b, p, st):
            loss, res = inc_losses.incremental_residual_mm_loss(
                b.anchor, b.positives, b.negatives, m1, st, cfg.loss_dim
            )
            return LossResult(loss, pca_in=res)
        return irm
    if name == "incremental_det":
        # loss_pca_in is the raw output batch (reference train/train.py:805).
        return lambda b, p, st: LossResult(
            inc_losses.incremental_det_loss(b.anchor, b.positives, b.negatives, m1, st, cfg.loss_dim),
            pca_in=b.embeddings,
        )
    if name == "incremental_mm":
        return lambda b, p, st: LossResult(
            inc_losses.incremental_mm_loss(b.anchor, b.positives, b.negatives, m1, st, cfg.loss_dim),
            pca_in=b.embeddings,
        )

    if name == "ms_loss":
        labels = ms_losses.tuple_labels(
            tuples_per_batch, tuples.positives_per_tuple, tuples.negatives_per_tuple
        )
        return lambda b, p, st: LossResult(
            ms_losses.ms_loss(labels, b.embeddings, ms_mining=cfg.ms_mining)
        )
    if name == "ms_det":
        # Strict-superset registration: the reference defines ms_det
        # (model/losses.py:139-186, identical body to ms_loss but with
        # ms_mining defaulting OFF) yet its train.py never dispatches it.
        # Here it dispatches with the function's own default (mining off),
        # which is the one semantic that distinguishes it from 'ms_loss'.
        labels = ms_losses.tuple_labels(
            tuples_per_batch, tuples.positives_per_tuple, tuples.negatives_per_tuple
        )
        return lambda b, p, st: LossResult(
            ms_losses.ms_det_loss(labels, b.embeddings, ms_mining=False)
        )
    if name == "ms_sum":
        labels = ms_losses.tuple_labels(
            tuples_per_batch, tuples.positives_per_tuple, tuples.negatives_per_tuple
        )
        return lambda b, p, st: LossResult(
            ms_losses.ms_sum_loss(
                b.anchor, b.positives, b.negatives, m1, labels, b.embeddings,
                ms_mining=cfg.ms_mining, dimensions=dims,
            )
        )

    if name == "swrd":
        return lambda b, p, st: LossResult(
            spec.swrd_loss(
                b.anchor, b.positives, b.negatives,
                p["pos_weights"], p["neg_weights"], m1, dims,
            )
        )
    if name == "wrd":
        return lambda b, p, st: LossResult(
            spec.wrd_loss(
                b.anchor, b.positives, b.negatives,
                p["pos_weights"], p["neg_weights"], m1, dims,
            )
        )
    if name == "prodwrd":
        return lambda b, p, st: LossResult(
            spec.prodwrd_loss(
                b.anchor, b.positives, b.negatives,
                p["pos_weights"], p["neg_weights"], m1, dims,
            )
        )
    if name == "sumwrd":
        return lambda b, p, st: LossResult(
            spec.sumwrd_loss(
                b.anchor, b.positives, b.negatives,
                p["pos_weights"], p["neg_weights"], m1, dims,
            )
        )

    if name == "wms":
        # ms_mining is always on for wms in the reference dispatch
        # (model/losses.py:5 default; train/train.py:852 passes no override).
        # The XLA formulation is the default everywhere: the fused Pallas
        # kernel measured slower at every batch size and fails to compile
        # at B>=1024 (perf/_wms_largebatch.log), so it is OPT-IN via
        # LossConfig.fused_wms (exp/ms configuration on TPU only). The
        # backend check runs at TRACE time (inside the returned fn), not
        # when build_loss runs, so a library user may build the loss before
        # jax.distributed/device init without silently baking the wrong
        # path (round-2 review finding).
        fused_eligible = (
            getattr(cfg, "fused_wms", False)
            and cfg.wfunction == "exp"
            and cfg.sumfunction == "ms"
        )

        def wms_fn(b, p, st):
            import jax as _jax

            if fused_eligible and _jax.default_backend() == "tpu":
                from soft_contrastive_learning_tpu.ops.pallas.wms_kernel import (
                    wms_loss_fused,
                )

                return LossResult(
                    wms_loss_fused(
                        p["geo_dist_matrix"], b.embeddings, cfg.alpha, cfg.beta
                    )
                )
            return LossResult(
                ms_losses.wms_loss(
                    p["geo_dist_matrix"], b.embeddings,
                    d_alpha=cfg.alpha, d_beta=cfg.beta,
                    ms_mining=True, wfunction=cfg.wfunction, sumfunction=cfg.sumfunction,
                )
            )

        return wms_fn

    if name == "logratio":
        return lambda b, p, st: LossResult(
            dist_losses.logratio_loss(
                b.anchor, b.positives, b.negatives,
                p["sq_pos_geo_dists"], p["sq_neg_geo_dists"],
            )
        )

    raise ValueError(f"unknown loss: {name!r}")


LOSS_NAMES = (
    "triplet", "lazy_triplet", "evil_triplet",
    "quadruplet", "lazy_quadruplet", "evil_quadruplet",
    "distance_triplet", "distance_lazy_triplet",
    "distance_quadruplet", "distance_lazy_quadruplet",
    "huber_distance_triplet", "huber_distance_lazy_triplet",
    "huber_distance_quadruplet", "huber_distance_lazy_quadruplet",
    "pairwise_distance_neg_eigenvalue", "pairwise_huber_distance_neg_eigenvalue",
    "ntuplet_evmm", "ntuplet_trace",
    "residual_det", "residual_trace",
    "incremental_residual_det", "incremental_det",
    "incremental_residual_mm", "incremental_mm",
    "ms_loss", "ms_det", "ms_sum",
    "swrd", "wrd", "prodwrd", "sumwrd",
    "wms", "logratio",
)
