"""Fused soft-multi-similarity (wms) loss as a Pallas TPU kernel.

Fuses the whole wms pipeline — embedding L2-normalization, the (B, B)
similarity matmul, soft geometric masks, MS mining, and the per-row
log-sum-exp reduction (reference model/losses.py:5-60) — into one
VMEM-resident kernel: one MXU matmul plus VPU elementwise work, zero HBM
round-trips for the intermediate (B, B) matrices.

Used as the forward of a custom_vjp (backward re-derives gradients from the
XLA formulation in losses/ms.py, matching the Pallas-NetVLAD pattern). Exact
for ``wfunction='exp'`` / ``sumfunction='ms'`` — the configuration of the
paper's headline results; other configurations fall back to the XLA path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS_NORM = 1e-12


def _wms_kernel(
    emb_ref,  # (B, D) embeddings
    geo_ref,  # (B, B) geographic distances
    scalars_ref,  # (1, 8) [d_alpha, d_beta, alpha, beta, lamb, eps, mining, 0]
    out_ref,  # (1, 1) loss
):
    d_alpha = scalars_ref[0, 0]
    d_beta = scalars_ref[0, 1]
    alpha = scalars_ref[0, 2]
    beta = scalars_ref[0, 3]
    lamb = scalars_ref[0, 4]
    eps = scalars_ref[0, 5]
    mining = scalars_ref[0, 6]

    x = emb_ref[:].astype(jnp.float32)
    b = x.shape[0]
    # L2-normalize rows.
    x = x * jax.lax.rsqrt(
        jnp.maximum(jnp.sum(x * x, axis=-1, keepdims=True), _EPS_NORM)
    )
    # Similarity matrix on the MXU, clamped at 0.
    sim = jax.lax.dot_general(
        x, x, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        # f32 operands at default precision truncate to bf16 on the MXU;
        # the XLA formulation (losses/ms.py) contracts at 'highest', and the
        # backward is derived from it — keep forward and backward consistent
        precision=jax.lax.Precision.HIGHEST,
    )
    sim = jnp.maximum(sim, 0.0)

    d = geo_ref[:].astype(jnp.float32)
    # Soft geometric masks (sigmoid form: finite everywhere).
    mask_pos = jax.nn.sigmoid(-d_alpha * (d - d_beta))
    mask_neg = jax.nn.sigmoid(-d_alpha * (d_beta - d))
    row = jax.lax.broadcasted_iota(jnp.int32, (b, b), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (b, b), 1)
    eye = (row == col).astype(jnp.float32)
    mask_pos = mask_pos - eye

    pos_mat = sim * mask_pos
    neg_mat = sim * mask_neg

    # MS mining (reference model/losses.py:31-37), blended by the flag so the
    # kernel stays branch-free.
    max_val = jnp.max(neg_mat, axis=1, keepdims=True)
    tmp_max = jnp.max(pos_mat, axis=1, keepdims=True)
    min_val = jnp.min((sim - tmp_max) * mask_pos, axis=1, keepdims=True) + tmp_max
    mined_pos = jnp.where(pos_mat < max_val + eps, mask_pos, 0.0)
    mined_neg = jnp.where(neg_mat > min_val - eps, mask_neg, 0.0)
    mask_pos = jnp.where(mining > 0.5, mined_pos, mask_pos)
    mask_neg = jnp.where(mining > 0.5, mined_neg, mask_neg)
    pos_mat = sim * mask_pos
    neg_mat = sim * mask_neg

    pos_exp = jnp.where(mask_pos > 0.0, jnp.exp(-alpha * (pos_mat - lamb)), 0.0)
    neg_exp = jnp.where(mask_neg > 0.0, jnp.exp(beta * (neg_mat - lamb)), 0.0)
    # Keep reductions 2-D: Mosaic's vector layouts reject 1-D intermediates.
    pos_term = jnp.log1p(jnp.sum(pos_exp, axis=1, keepdims=True)) / alpha
    neg_term = jnp.log1p(jnp.sum(neg_exp, axis=1, keepdims=True)) / beta
    out_ref[0, 0] = jnp.sum(pos_term + neg_term) / b


@functools.partial(
    jax.jit, static_argnames=("ms_mining", "interpret")
)
def wms_loss_pallas(
    geo_distances: jnp.ndarray,  # (B, B)
    embeddings: jnp.ndarray,  # (B, D)
    d_alpha: float,
    d_beta: float,
    alpha: float = 2.0,
    beta: float = 50.0,
    lamb: float = 1.0,
    eps: float = 0.1,
    ms_mining: bool = True,
    *,
    interpret: bool | None = None,
) -> jnp.ndarray:
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, d = embeddings.shape
    scalars = jnp.asarray(
        [[d_alpha, d_beta, alpha, beta, lamb, eps, 1.0 if ms_mining else 0.0, 0.0]],
        jnp.float32,
    )
    out = pl.pallas_call(
        _wms_kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * b * d,
            bytes_accessed=4 * (b * d + 2 * b * b),
            transcendentals=3 * b * b,
        ),
        interpret=interpret,
    )(embeddings, geo_distances, scalars)
    return out[0, 0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6, 7, 8))
def wms_loss_fused(
    geo_distances, embeddings, d_alpha, d_beta, alpha=2.0, beta=50.0,
    lamb=1.0, eps=0.1, ms_mining=True,
):
    """Pallas forward + XLA-formulation backward (see module docstring)."""
    return wms_loss_pallas(
        geo_distances, embeddings, d_alpha, d_beta, alpha, beta, lamb, eps,
        ms_mining,
    )


def _fused_fwd(geo, emb, d_alpha, d_beta, alpha, beta, lamb, eps, ms_mining):
    out = wms_loss_pallas(
        geo, emb, d_alpha, d_beta, alpha, beta, lamb, eps, ms_mining
    )
    return out, (geo, emb)


def _fused_bwd(d_alpha, d_beta, alpha, beta, lamb, eps, ms_mining, res, g):
    from soft_contrastive_learning_tpu.losses.ms import wms_loss

    geo, emb = res
    _, vjp = jax.vjp(
        lambda gd, e: wms_loss(
            gd, e, d_alpha, d_beta, alpha, beta, lamb, eps, ms_mining,
            wfunction="exp", sumfunction="ms",
        ),
        geo, emb,
    )
    return vjp(g)


wms_loss_fused.defvjp(_fused_fwd, _fused_bwd)
