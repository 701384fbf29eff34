"""Fused NetVLAD aggregation as a Pallas TPU kernel.

Fuses softmax(assignment) -> MXU aggregation matmul -> rank-1 center
correction -> intra-normalization -> d-major flatten -> final L2 norm into one
VMEM-resident kernel, one grid step per image. This avoids three HBM
round-trips of the (B, N, K) assignment and (B, K, D) residual tensors that
the unfused XLA path materializes.

Numerics match models/netvlad.py::vlad_aggregate (float32 accumulation),
which is the lowering used off-TPU and the reference semantics
(netvlad_tf_open layers.netVLAD called at reference model/nets.py:67).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS = 1e-12


def _netvlad_kernel(x_ref, s_ref, c_ref, out_ref):
    # x_ref: (1, N, D) features; s_ref: (1, N, K) logits; c_ref: (D, K) negated
    # centers; out_ref: (1, D, K) fully-normalized VLAD in d-major layout.
    # Everything stays in the (D, K) orientation — no transposes or flatten
    # reshapes, which Mosaic's vector-layout inference rejects; the final
    # (B, D, K) -> (B, D*K) collapse happens outside as a free XLA reshape.
    x = x_ref[0].astype(jnp.float32)  # (N, D)
    s = s_ref[0].astype(jnp.float32)  # (N, K)

    # Softmax over clusters (numerically stable).
    s_max = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - s_max)
    a = e / jnp.sum(e, axis=-1, keepdims=True)  # (N, K)

    # MXU: x^T @ a contracting N -> (D, K) soft-assigned mass.
    agg = jax.lax.dot_general(
        x,
        a,
        dimension_numbers=(((0,), (0,)), ((), ())),  # contract over N
        preferred_element_type=jnp.float32,
        # default TPU matmul precision truncates f32 operands to bf16; the
        # XLA path (models/netvlad.py) contracts at 'highest' — match it
        precision=jax.lax.Precision.HIGHEST,
    )  # (D, K)
    mass = jnp.sum(a, axis=0, keepdims=True)  # (1, K)
    v = agg + c_ref[:].astype(jnp.float32) * mass  # (D, K)

    # Intra-normalize each cluster (column) over D.
    v = v * jax.lax.rsqrt(jnp.sum(v * v, axis=0, keepdims=True) + _EPS)
    # Global L2 norm over the whole descriptor.
    v = v * jax.lax.rsqrt(jnp.sum(v * v) + _EPS)
    out_ref[0] = v


@functools.partial(jax.jit, static_argnames=("interpret",))
def vlad_aggregate_pallas(
    features: jnp.ndarray,  # (B, N, D)
    assign_logits: jnp.ndarray,  # (B, N, K)
    neg_centers: jnp.ndarray,  # (D, K)
    *,
    interpret: bool | None = None,
) -> jnp.ndarray:
    b, n, d = features.shape
    k = assign_logits.shape[-1]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    grid = (b,)
    out = pl.pallas_call(
        _netvlad_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, n, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, k), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, d, k), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, d, k), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n * k * d,
            bytes_accessed=4 * b * (n * d + n * k + d * k) + 4 * d * k,
            transcendentals=b * n * k,
        ),
        interpret=interpret,
    )(features, assign_logits, neg_centers)
    # d-major flatten (free row-major collapse in XLA).
    return out.reshape(b, d * k)


@jax.custom_vjp
def vlad_aggregate_fused(features, assign_logits, neg_centers):
    """Pallas forward + XLA-formulation VJP backward (rematerialized).

    The fused kernel is the inference/throughput path; the backward pass
    re-derives gradients from the algebraically identical XLA formulation in
    models/netvlad.py, so training with ``use_pallas=True`` is exact.
    """
    return vlad_aggregate_pallas(features, assign_logits, neg_centers)


def _fused_fwd(features, assign_logits, neg_centers):
    out = vlad_aggregate_pallas(features, assign_logits, neg_centers)
    return out, (features, assign_logits, neg_centers)


def _fused_bwd(residuals, g):
    from soft_contrastive_learning_tpu.models.netvlad import vlad_aggregate

    features, assign_logits, neg_centers = residuals
    _, vjp = jax.vjp(vlad_aggregate, features, assign_logits, neg_centers)
    return vjp(g)


vlad_aggregate_fused.defvjp(_fused_fwd, _fused_bwd)
